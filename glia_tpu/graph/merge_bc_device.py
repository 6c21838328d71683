"""Device (JAX) classifier-in-the-loop merge engine (merge_order_bc).

The reference's genMergeOrderGreedyUsingBoundaryClassifier
(code/util/struct_merge_bc.hxx:10-58) recomputes full
BoundaryClassificationFeats and a classifier probability for every
candidate pair inside a serial priority loop.  The host engine
(graph/merge_bc.py) reproduces that semantics with composable component
records but at Python speed.  This engine vectorizes those records into
arrays indexed by *component id* so that EVERY frontier candidate's
features assemble and score on device per superstep:

  - superstep = score all table candidates (full-width BC features +
    classifier) -> merge the independent set of edges that are the
    probability *maximum* of both endpoints -> commit merges, rekey and
    deduplicate edges with segment reductions (the batched analogue of
    boundary_table.hxx:122-167's pop+update, like merge_device.py's
    superstep engines but with classifier saliency and full stat state);
  - boundary-cancellation bookkeeping follows the host engine's mutual /
    non-mutual split of directed base-pair stats (code/type/region.hxx:
    66-77): per edge four stat groups [m_u, n_u, m_v, n_v]; a merge
    cancels the two mutual groups of its own edge and moves the
    non-mutual groups into the merged component's residual;
  - min/max of the *hypothetical* merged boundary (needed by the merged
    region's serialized features) uses exclude-one scatter reductions
    (min1/count/min2 per component) since subtraction is unavailable.

Everything per superstep is fixed-shape vector ops -> one XLA program.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

import numpy as np

from ..features.config import FeatureConfig
from ..features.device import DeviceFeatureSpec, bc_features_dev
from .rag import Rag

POS_INF = np.inf
NEG_INF = -np.inf

# part indices along the edge "parts" axis
P_MU, P_NU, P_MV, P_NV = 0, 1, 2, 3

# stat field names: additive vs min vs max under union
_ADD_B = ("b_cnt", "b_sum", "b_sumsq", "b_hist")
_STAT_FIELDS = ("b_cnt", "b_sum", "b_sumsq", "b_min", "b_max", "b_hist")


@dataclass
class BcDeviceStatic:
    """Static (python-level) config for the jitted superstep."""

    spec: DeviceFeatureSpec
    C: int            # component capacity
    E: int            # edge capacity
    R: int            # initial leaf regions
    feat_dim: int


def build_state(rag: Rag, cfg: FeatureConfig):
    """Host-side packing of the RAG + feature images into device arrays.

    Returns (state dict of numpy arrays, BcDeviceStatic).  Mirrors
    graph/merge_bc.DynamicRagState.__init__ exactly (leaf records,
    mutual/non-mutual directed-pair split, initial table membership).
    """
    from ..features.hierarchical import group_stats

    if rag.region_ptr is None:
        raise ValueError("build RAG with contour_only=False")
    ndim = len(rag.shape)
    spec = DeviceFeatureSpec.from_config(cfg, ndim)
    R = rag.n_regions
    C = R + max(R - 1, 1)
    nT, nR, nRL, nB = spec.n_thresh, spec.n_r, spec.n_rl, spec.n_b

    pb = np.asarray(cfg.pb_image, dtype=np.float64).ravel()

    # ---- leaf component records ----
    rid = np.repeat(np.arange(R), np.diff(rag.region_ptr))
    pix = rag.region_pixels
    area = np.zeros(C)
    np.add.at(area, rid, 1.0)
    border = np.zeros(C)
    border[:R] = np.diff(rag.border_ptr).astype(np.float64)
    coords_all = np.unravel_index(pix, rag.shape)
    coords = np.stack([coords_all[ndim - 1 - d] for d in range(ndim)],
                      axis=1).astype(np.float64)
    bbox_lo = np.full((C, ndim), POS_INF)
    bbox_hi = np.full((C, ndim), NEG_INF)
    for d in range(ndim):
        np.minimum.at(bbox_lo[:, d], rid, coords[:, d])
        np.maximum.at(bbox_hi[:, d], rid, coords[:, d])
    bbox_lo[:R] = np.where(np.isfinite(bbox_lo[:R]), bbox_lo[:R], 0.0)
    bbox_hi[:R] = np.where(np.isfinite(bbox_hi[:R]), bbox_hi[:R], 0.0)

    def _img_group(images, bins):
        cnt = np.zeros((C, len(images)))
        s = np.zeros((C, len(images)))
        ss = np.zeros((C, len(images)))
        mn = np.full((C, len(images)), POS_INF)
        mx = np.full((C, len(images)), NEG_INF)
        h = np.zeros((C, len(images), bins))
        for i, img in enumerate(images):
            v = np.asarray(img.image, np.float64).ravel()[pix]
            st = group_stats(v, rid, R, img.hist_bins, img.hist_range)
            cnt[:R, i] = st["cnt"]
            s[:R, i] = st["sum"]
            ss[:R, i] = st["sumsq"]
            mn[:R, i] = st["min"]
            mx[:R, i] = st["max"]
            h[:R, i] = st["hist"]
        return cnt, s, ss, mn, mx, h

    r_cnt, r_sum, r_sumsq, r_min, r_max, r_hist = _img_group(
        cfg.r_images, max(spec.r_bins, 1))
    rl_hist = np.zeros((C, nRL, max(spec.rl_bins, 1)))
    for i, img in enumerate(cfg.rl_images):
        v = np.asarray(img.image, np.float64).ravel()[pix]
        st = group_stats(v, rid, R, img.hist_bins, img.hist_range)
        rl_hist[:R, i] = st["hist"]

    # ---- directed base-pair stats -> per-edge part groups ----
    Ed = len(rag.dir_pairs)
    dpid = np.repeat(np.arange(Ed), np.diff(rag.dir_ptr))
    dp_cnt = np.diff(rag.dir_ptr).astype(np.float64)
    dp_pb = pb[rag.dir_pixels]
    dp_vp = np.zeros((Ed, nT))
    for t, th in enumerate(cfg.boundary_thresholds):
        np.add.at(dp_vp[:, t], dpid, (dp_pb >= th).astype(np.float64))
    dp_b = []
    for img in cfg.b_images:
        v = np.asarray(img.image, np.float64).ravel()[rag.dir_pixels]
        dp_b.append(group_stats(v, dpid, Ed, img.hist_bins, img.hist_range))

    # mutual classification of directed pairs (merge_bc.py:112-118)
    dir_code = (rag.dir_pairs[:, 0] << 32) | rag.dir_pairs[:, 1]
    rev_code = (rag.dir_pairs[:, 1] << 32) | rag.dir_pairs[:, 0]
    sc = np.sort(dir_code)
    pos = np.searchsorted(sc, rev_code)
    mutual = (pos < len(sc)) & (sc[np.minimum(pos, len(sc) - 1)] == rev_code)

    # undirected pair universe: unique (lo, hi) over directed pairs
    a_idx = rag.key_index(rag.dir_pairs[:, 0]).astype(np.int64)
    b_idx = rag.key_index(rag.dir_pairs[:, 1]).astype(np.int64)
    lo = np.minimum(a_idx, b_idx)
    hi = np.maximum(a_idx, b_idx)
    pair_code = lo * np.int64(C) + hi
    uniq, inv = np.unique(pair_code, return_inverse=True)
    E = len(uniq)
    eu = (uniq // C).astype(np.int32)
    ev = (uniq % C).astype(np.int32)
    # side: directed pair (a,b) with a==lo is the u side
    is_u_side = a_idx == eu.astype(np.int64)[inv]
    part = np.where(mutual, 0, 1) + np.where(is_u_side, 0, 2)

    p_cnt = np.zeros((E, 4))
    p_vp = np.zeros((E, 4, nT))
    np.add.at(p_cnt, (inv, part), dp_cnt)
    np.add.at(p_vp, (inv, part), dp_vp)
    p_b_cnt = np.zeros((E, 4, nB))
    p_b_sum = np.zeros((E, 4, nB))
    p_b_sumsq = np.zeros((E, 4, nB))
    p_b_min = np.full((E, 4, nB), POS_INF)
    p_b_max = np.full((E, 4, nB), NEG_INF)
    p_b_hist = np.zeros((E, 4, nB, max(spec.b_bins, 1)))
    for bi, st in enumerate(dp_b):
        np.add.at(p_b_cnt[:, :, bi], (inv, part), st["cnt"])
        np.add.at(p_b_sum[:, :, bi], (inv, part), st["sum"])
        np.add.at(p_b_sumsq[:, :, bi], (inv, part), st["sumsq"])
        nz = st["cnt"] > 0
        np.minimum.at(p_b_min[:, :, bi], (inv[nz], part[nz]), st["min"][nz])
        np.maximum.at(p_b_max[:, :, bi], (inv[nz], part[nz]), st["max"][nz])
        np.add.at(p_b_hist[:, :, bi], (inv, part), st["hist"])

    # table membership: both directions exist (boundary_table.hxx:99-103)
    has_u = np.zeros(E, bool)
    has_v = np.zeros(E, bool)
    has_u[inv[is_u_side]] = True
    has_v[inv[~is_u_side]] = True
    e_table = has_u & has_v

    state = {
        "c_alive": np.concatenate([np.ones(R, bool), np.zeros(C - R, bool)]),
        "c_area": area, "c_border": border,
        "c_bbox_lo": bbox_lo, "c_bbox_hi": bbox_hi,
        "c_r_cnt": r_cnt, "c_r_sum": r_sum, "c_r_sumsq": r_sumsq,
        "c_r_min": r_min, "c_r_max": r_max, "c_r_hist": r_hist,
        "c_rl_hist": rl_hist,
        "res_cnt": np.zeros(C), "res_vp": np.zeros((C, nT)),
        "res_b_cnt": np.zeros((C, nB)), "res_b_sum": np.zeros((C, nB)),
        "res_b_sumsq": np.zeros((C, nB)),
        "res_b_min": np.full((C, nB), POS_INF),
        "res_b_max": np.full((C, nB), NEG_INF),
        "res_b_hist": np.zeros((C, nB, max(spec.b_bins, 1))),
        "eu": eu, "ev": ev,
        "e_alive": np.ones(E, bool), "e_table": e_table,
        "p_cnt": p_cnt, "p_vp": p_vp,
        "p_b_cnt": p_b_cnt, "p_b_sum": p_b_sum, "p_b_sumsq": p_b_sumsq,
        "p_b_min": p_b_min, "p_b_max": p_b_max, "p_b_hist": p_b_hist,
        "next_id": np.int32(R),
    }
    nt_feat = bc_feat_dim(cfg, ndim)
    return state, BcDeviceStatic(spec=spec, C=C, E=E, R=R, feat_dim=nt_feat)


def bc_feat_dim(cfg: FeatureConfig, ndim: int) -> int:
    return (cfg.boundary_feat_dim(with_saliency=False)
            + 3 * cfg.region_feat_dim(ndim, with_saliency=False))


# ---------------------------------------------------------------------------
# jitted superstep
# ---------------------------------------------------------------------------

def _component_totals(state, static):
    """One-sided boundary totals per component (record_with_boundary's
    bd/vp/b fields): residual + all outgoing entry parts."""
    import jax
    import jax.numpy as jnp

    C = static.C
    eu, ev, alive = state["eu"], state["ev"], state["e_alive"]

    def seg2(vals_u, vals_v):
        z_u = jnp.where(
            alive.reshape((-1,) + (1,) * (vals_u.ndim - 1)), vals_u, 0.0)
        z_v = jnp.where(
            alive.reshape((-1,) + (1,) * (vals_v.ndim - 1)), vals_v, 0.0)
        return (jax.ops.segment_sum(z_u, eu, num_segments=C)
                + jax.ops.segment_sum(z_v, ev, num_segments=C))

    side_u_cnt = state["p_cnt"][:, P_MU] + state["p_cnt"][:, P_NU]
    side_v_cnt = state["p_cnt"][:, P_MV] + state["p_cnt"][:, P_NV]
    tot_cnt = state["res_cnt"] + seg2(side_u_cnt, side_v_cnt)
    side_u_vp = state["p_vp"][:, P_MU] + state["p_vp"][:, P_NU]
    side_v_vp = state["p_vp"][:, P_MV] + state["p_vp"][:, P_NV]
    tot_vp = state["res_vp"] + seg2(side_u_vp, side_v_vp)

    tot = {"cnt": tot_cnt, "vp": tot_vp}
    # additive boundary stat fields
    for name in ("b_cnt", "b_sum", "b_sumsq", "b_hist"):
        p = state["p_" + name]
        tot[name] = state["res_" + name] + seg2(
            p[:, P_MU] + p[:, P_NU], p[:, P_MV] + p[:, P_NV])

    # min / max via scatter reductions
    pmin = state["p_b_min"]
    pmax = state["p_b_max"]
    side_u_min = jnp.minimum(pmin[:, P_MU], pmin[:, P_NU])
    side_v_min = jnp.minimum(pmin[:, P_MV], pmin[:, P_NV])
    side_u_max = jnp.maximum(pmax[:, P_MU], pmax[:, P_NU])
    side_v_max = jnp.maximum(pmax[:, P_MV], pmax[:, P_NV])
    am = alive[:, None]
    tmin = jnp.full_like(state["res_b_min"], POS_INF)
    tmin = tmin.at[eu].min(jnp.where(am, side_u_min, POS_INF))
    tmin = tmin.at[ev].min(jnp.where(am, side_v_min, POS_INF))
    tot["b_min"] = jnp.minimum(state["res_b_min"], tmin)
    tmax = jnp.full_like(state["res_b_max"], NEG_INF)
    tmax = tmax.at[eu].max(jnp.where(am, side_u_max, NEG_INF))
    tmax = tmax.at[ev].max(jnp.where(am, side_v_max, NEG_INF))
    tot["b_max"] = jnp.maximum(state["res_b_max"], tmax)
    return tot, (side_u_min, side_v_min, side_u_max, side_v_max)


def _excl_reduce(vals_u, vals_v, eu, ev, alive, C, kind):
    """Per-edge-endpoint exclude-one reduction: for edge e and endpoint u,
    the min (or max) of the OTHER alive incident edges' side values.

    Returns (excl_u [E, nB], excl_v [E, nB]).
    """
    import jax.numpy as jnp

    if kind == "min":
        fill = POS_INF
        red_u = jnp.full((C,) + vals_u.shape[1:], fill)
        z_u = jnp.where(alive[:, None], vals_u, fill)
        z_v = jnp.where(alive[:, None], vals_v, fill)
        m1 = red_u.at[eu].min(z_u).at[ev].min(z_v)
        beats = lambda x, m: x > m  # strictly worse than best
        red2 = jnp.full((C,) + vals_u.shape[1:], fill)
        m2 = red2.at[eu].min(jnp.where(beats(z_u, m1[eu]), z_u, fill)) \
                 .at[ev].min(jnp.where(beats(z_v, m1[ev]), z_v, fill))
    else:
        fill = NEG_INF
        red_u = jnp.full((C,) + vals_u.shape[1:], fill)
        z_u = jnp.where(alive[:, None], vals_u, fill)
        z_v = jnp.where(alive[:, None], vals_v, fill)
        m1 = red_u.at[eu].max(z_u).at[ev].max(z_v)
        beats = lambda x, m: x < m
        red2 = jnp.full((C,) + vals_u.shape[1:], fill)
        m2 = red2.at[eu].max(jnp.where(beats(z_u, m1[eu]), z_u, fill)) \
                 .at[ev].max(jnp.where(beats(z_v, m1[ev]), z_v, fill))

    # achiever counts (duplicated extrema survive exclusion)
    import jax

    c1 = jax.ops.segment_sum(
        jnp.where(alive[:, None] & (z_u == m1[eu]), 1.0, 0.0), eu,
        num_segments=C)
    c1 = c1 + jax.ops.segment_sum(
        jnp.where(alive[:, None] & (z_v == m1[ev]), 1.0, 0.0), ev,
        num_segments=C)

    def excl(z, comp):
        keep_m1 = beats(z, m1[comp]) | (c1[comp] >= 2.0)
        return jnp.where(keep_m1, m1[comp], m2[comp])

    return excl(z_u, eu), excl(z_v, ev)


def candidate_features(state, static: BcDeviceStatic):
    """Full-width BC feature matrix [E, D] for every alive edge, plus the
    candidate-valid mask (alive & in-table).  Pure JAX."""
    import jax.numpy as jnp

    spec = static.spec
    eu, ev, alive = state["eu"], state["ev"], state["e_alive"]
    tot, sides = _component_totals(state, static)
    side_u_min, side_v_min, side_u_max, side_v_max = sides

    def region_rec(idx, tot):
        rec = {
            "area": state["c_area"][idx], "border": state["c_border"][idx],
            "bd": tot["cnt"][idx], "vp": tot["vp"][idx],
            "bbox_lo": state["c_bbox_lo"][idx],
            "bbox_hi": state["c_bbox_hi"][idx],
            "r_cnt": state["c_r_cnt"][idx], "r_sum": state["c_r_sum"][idx],
            "r_sumsq": state["c_r_sumsq"][idx],
            "r_min": state["c_r_min"][idx], "r_max": state["c_r_max"][idx],
            "r_hist": state["c_r_hist"][idx],
            "rl_hist": state["c_rl_hist"][idx],
            "b_cnt": tot["b_cnt"][idx], "b_sum": tot["b_sum"][idx],
            "b_sumsq": tot["b_sumsq"][idx], "b_min": tot["b_min"][idx],
            "b_max": tot["b_max"][idx], "b_hist": tot["b_hist"][idx],
        }
        return rec

    rec0 = region_rec(eu, tot)
    rec1 = region_rec(ev, tot)

    # pair boundary: all four parts (getBoundary both sides)
    pair = {
        "cnt": state["p_cnt"].sum(axis=1),
        "vp": state["p_vp"].sum(axis=1),
        "b_cnt": state["p_b_cnt"].sum(axis=1),
        "b_sum": state["p_b_sum"].sum(axis=1),
        "b_sumsq": state["p_b_sumsq"].sum(axis=1),
        "b_min": state["p_b_min"].min(axis=1),
        "b_max": state["p_b_max"].max(axis=1),
        "b_hist": state["p_b_hist"].sum(axis=1),
    }

    # merged record (the reference's scratch merge, struct_merge_bc.hxx:18-35)
    both = state["c_r_cnt"][eu] * state["c_r_cnt"][ev] > 0
    only0 = state["c_r_cnt"][eu] > 0
    rec2 = {
        "area": rec0["area"] + rec1["area"],
        "border": rec0["border"] + rec1["border"],
        "bbox_lo": jnp.minimum(rec0["bbox_lo"], rec1["bbox_lo"]),
        "bbox_hi": jnp.maximum(rec0["bbox_hi"], rec1["bbox_hi"]),
        "r_cnt": rec0["r_cnt"] + rec1["r_cnt"],
        "r_sum": rec0["r_sum"] + rec1["r_sum"],
        "r_sumsq": rec0["r_sumsq"] + rec1["r_sumsq"],
        "r_min": jnp.where(both, jnp.minimum(rec0["r_min"], rec1["r_min"]),
                           jnp.where(only0, rec0["r_min"], rec1["r_min"])),
        "r_max": jnp.where(both, jnp.maximum(rec0["r_max"], rec1["r_max"]),
                           jnp.where(only0, rec0["r_max"], rec1["r_max"])),
        "r_hist": rec0["r_hist"] + rec1["r_hist"],
        "rl_hist": rec0["rl_hist"] + rec1["rl_hist"],
    }
    # merged boundary, additive fields: tot_u + tot_v - both mutual parts
    rec2["bd"] = (tot["cnt"][eu] + tot["cnt"][ev]
                  - state["p_cnt"][:, P_MU] - state["p_cnt"][:, P_MV])
    rec2["vp"] = (tot["vp"][eu] + tot["vp"][ev]
                  - state["p_vp"][:, P_MU] - state["p_vp"][:, P_MV])
    for name in ("b_cnt", "b_sum", "b_sumsq", "b_hist"):
        p = state["p_" + name]
        rec2[name] = (tot[name][eu] + tot[name][ev]
                      - p[:, P_MU] - p[:, P_MV])
    # merged boundary min/max: exclude this edge's side values, keep its
    # non-mutual parts and residuals
    exu_min, exv_min = _excl_reduce(side_u_min, side_v_min, eu, ev, alive,
                                    static.C, "min")
    exu_max, exv_max = _excl_reduce(side_u_max, side_v_max, eu, ev, alive,
                                    static.C, "max")
    n_min = jnp.minimum(state["p_b_min"][:, P_NU], state["p_b_min"][:, P_NV])
    n_max = jnp.maximum(state["p_b_max"][:, P_NU], state["p_b_max"][:, P_NV])
    rec2["b_min"] = jnp.minimum(
        jnp.minimum(state["res_b_min"][eu], state["res_b_min"][ev]),
        jnp.minimum(jnp.minimum(exu_min, exv_min), n_min))
    rec2["b_max"] = jnp.maximum(
        jnp.maximum(state["res_b_max"][eu], state["res_b_max"][ev]),
        jnp.maximum(jnp.maximum(exu_max, exv_max), n_max))

    feats = bc_features_dev(rec0, rec1, rec2, pair, spec)
    valid = alive & state["e_table"]
    return feats, valid


def _select_independent_max(probs, valid, eu, ev, C):
    """Edges that are the strict probability maximum of BOTH endpoints
    (ties broken by lowest edge index) -- a conflict-free merge set."""
    import jax
    import jax.numpy as jnp

    E = probs.shape[0]
    idx = jnp.arange(E, dtype=jnp.int32)
    p32 = jnp.maximum(probs.astype(jnp.float32), 0.0)
    bits = jax.lax.bitcast_convert_type(p32, jnp.int32)
    neg1 = jnp.int32(-1)
    bits = jnp.where(valid, bits, neg1)
    rbits = jnp.full(C, neg1, jnp.int32)
    rbits = rbits.at[eu].max(bits)
    rbits = rbits.at[ev].max(bits)
    cand = valid & (rbits[eu] == bits) & (rbits[ev] == bits)
    ridx = jnp.full(C, E, jnp.int32)
    ridx = ridx.at[eu].min(jnp.where(cand, idx, E))
    ridx = ridx.at[ev].min(jnp.where(cand, idx, E))
    return cand & (ridx[eu] == idx) & (ridx[ev] == idx)


def _make_step_fn(static: BcDeviceStatic, predict_fn: Callable,
                  forced: bool = False, with_consts: bool = False):
    """The raw (untraced) superstep function shared by the one-step and
    full-loop builders.  ``with_consts``: predict_fn takes (feats,
    consts) with consts threaded through as program arguments (classifier
    node tables must not be closed-over constants -- they would inline as
    dense MLIR literals; see models/forest.make_label_scorer)."""
    import jax
    import jax.numpy as jnp

    C, E, R = static.C, static.E, static.R

    def step(state, consts=None, force_mask=None):
        feats, valid = candidate_features(state, static)
        if forced:
            probs = jnp.zeros(E, feats.dtype)
            ok = force_mask & valid
        else:
            probs = (predict_fn(feats, consts) if with_consts
                     else predict_fn(feats))
            probs = probs.astype(feats.dtype)
            ok = _select_independent_max(probs, valid, state["eu"],
                                         state["ev"], C)

        eu, ev = state["eu"], state["ev"]
        rank = jnp.cumsum(ok.astype(jnp.int32)) - 1
        r2 = state["next_id"] + rank
        rows = jnp.stack([eu, ev, r2], axis=1)
        n_new = ok.sum().astype(jnp.int32)

        dump = jnp.int32(C)  # scatter dump slot
        tgt = jnp.where(ok, r2, dump)

        def scat_set(arr, new_vals):
            pad = jnp.concatenate(
                [arr, jnp.zeros((1,) + arr.shape[1:], arr.dtype)], axis=0)
            return pad.at[tgt].set(
                jnp.where(ok.reshape((-1,) + (1,) * (arr.ndim - 1)),
                          new_vals, pad[tgt]))[:C]

        # --- new component records (union of endpoints) ---
        st = dict(state)
        g = lambda a: (a[eu], a[ev])
        for name in ("c_area", "c_border", "c_r_cnt", "c_r_sum",
                     "c_r_sumsq", "c_r_hist", "c_rl_hist"):
            a0, a1 = g(state[name])
            st[name] = scat_set(state[name], a0 + a1)
        lo0, lo1 = g(state["c_bbox_lo"])
        st["c_bbox_lo"] = scat_set(state["c_bbox_lo"], jnp.minimum(lo0, lo1))
        hi0, hi1 = g(state["c_bbox_hi"])
        st["c_bbox_hi"] = scat_set(state["c_bbox_hi"], jnp.maximum(hi0, hi1))
        both = state["c_r_cnt"][eu] * state["c_r_cnt"][ev] > 0
        only0 = state["c_r_cnt"][eu] > 0
        mn0, mn1 = g(state["c_r_min"])
        st["c_r_min"] = scat_set(
            state["c_r_min"],
            jnp.where(both, jnp.minimum(mn0, mn1),
                      jnp.where(only0, mn0, mn1)))
        mx0, mx1 = g(state["c_r_max"])
        st["c_r_max"] = scat_set(
            state["c_r_max"],
            jnp.where(both, jnp.maximum(mx0, mx1),
                      jnp.where(only0, mx0, mx1)))

        # residual: res_u + res_v + this edge's non-mutual parts (the
        # mutual parts cancel, region.hxx:68-77)
        st["res_cnt"] = scat_set(
            state["res_cnt"],
            state["res_cnt"][eu] + state["res_cnt"][ev]
            + state["p_cnt"][:, P_NU] + state["p_cnt"][:, P_NV])
        st["res_vp"] = scat_set(
            state["res_vp"],
            state["res_vp"][eu] + state["res_vp"][ev]
            + state["p_vp"][:, P_NU] + state["p_vp"][:, P_NV])
        for name in ("b_cnt", "b_sum", "b_sumsq", "b_hist"):
            st["res_" + name] = scat_set(
                state["res_" + name],
                state["res_" + name][eu] + state["res_" + name][ev]
                + state["p_" + name][:, P_NU] + state["p_" + name][:, P_NV])
        st["res_b_min"] = scat_set(
            state["res_b_min"],
            jnp.minimum(
                jnp.minimum(state["res_b_min"][eu], state["res_b_min"][ev]),
                jnp.minimum(state["p_b_min"][:, P_NU],
                            state["p_b_min"][:, P_NV])))
        st["res_b_max"] = scat_set(
            state["res_b_max"],
            jnp.maximum(
                jnp.maximum(state["res_b_max"][eu], state["res_b_max"][ev]),
                jnp.maximum(state["p_b_max"][:, P_NU],
                            state["p_b_max"][:, P_NV])))

        alive_c = state["c_alive"]
        src_u = jnp.where(ok, eu, dump)
        src_v = jnp.where(ok, ev, dump)
        alive_pad = jnp.concatenate([alive_c, jnp.zeros(1, bool)])
        alive_pad = alive_pad.at[src_u].set(False).at[src_v].set(False)
        alive_pad = alive_pad.at[tgt].set(
            jnp.where(ok, True, alive_pad[tgt]))
        st["c_alive"] = alive_pad[:C]

        # --- rekey edges ---
        lut = jnp.arange(C + 1, dtype=jnp.int32)
        lut = lut.at[src_u].set(jnp.where(ok, r2, dump))
        lut = lut.at[src_v].set(jnp.where(ok, r2, dump))
        eu2 = lut[eu]
        ev2 = lut[ev]
        alive2 = state["e_alive"] & ~ok & (eu2 != ev2)

        # orientation normalize: keep eu < ev; swapping endpoints swaps
        # the (m_u, n_u) and (m_v, n_v) part groups
        swap = eu2 > ev2
        eu3 = jnp.where(swap, ev2, eu2)
        ev3 = jnp.where(swap, eu2, ev2)
        perm = jnp.asarray([P_MV, P_NV, P_MU, P_NU])
        for name in ("p_cnt", "p_vp", "p_b_cnt", "p_b_sum", "p_b_sumsq",
                     "p_b_min", "p_b_max", "p_b_hist"):
            p = state[name]
            sw = swap.reshape((-1,) + (1,) * (p.ndim - 1))
            st[name] = jnp.where(sw, p[:, perm], p)

        # --- dedupe duplicate pairs: 3-operand key sort + gathers ---
        idx = jnp.arange(E, dtype=jnp.int32)
        lo_k = jnp.where(alive2, eu3, jnp.int32(C))
        hi_k = jnp.where(alive2, ev3, idx)
        lo_s, hi_s, permE = jax.lax.sort((lo_k, hi_k, idx), num_keys=2)
        take = lambda a: jnp.take(a, permE, axis=0)
        eu4 = take(eu3)
        ev4 = take(ev3)
        alive_s = take(alive2)
        table_s = take(state["e_table"])
        first = jnp.concatenate(
            [jnp.ones(1, bool),
             (lo_s[1:] != lo_s[:-1]) | (hi_s[1:] != hi_s[:-1])])
        seg_id = jnp.cumsum(first.astype(jnp.int32)) - 1
        keep = first & alive_s

        def seg_add(p):
            pz = jnp.where(alive_s.reshape((-1,) + (1,) * (p.ndim - 1)),
                           p, 0.0)
            ps = jax.ops.segment_sum(pz, seg_id, num_segments=E)
            return jnp.where(keep.reshape((-1,) + (1,) * (p.ndim - 1)),
                             ps[seg_id], p)

        def seg_red(p, kind):
            fill = POS_INF if kind == "min" else NEG_INF
            pz = jnp.where(alive_s.reshape((-1,) + (1,) * (p.ndim - 1)),
                           p, fill)
            f = jax.ops.segment_min if kind == "min" else jax.ops.segment_max
            ps = f(pz, seg_id, num_segments=E)
            return jnp.where(keep.reshape((-1,) + (1,) * (p.ndim - 1)),
                             ps[seg_id], p)

        for name in ("p_cnt", "p_vp", "p_b_cnt", "p_b_sum", "p_b_sumsq",
                     "p_b_hist"):
            st[name] = seg_add(take(st[name]))
        st["p_b_min"] = seg_red(take(st["p_b_min"]), "min")
        st["p_b_max"] = seg_red(take(st["p_b_max"]), "max")
        # table: any duplicate in table keeps the pair a candidate
        # (boundary_table update() rekeys existing entries)
        tbl = jax.ops.segment_max(
            jnp.where(alive_s, table_s.astype(jnp.int32), 0), seg_id,
            num_segments=E)
        st["e_table"] = jnp.where(keep, tbl[seg_id] > 0, table_s)
        st["eu"] = eu4
        st["ev"] = ev4
        st["e_alive"] = alive_s & keep
        st["next_id"] = state["next_id"] + n_new

        n_scored = valid.sum()
        n_left = (st["e_alive"] & st["e_table"]).sum()
        return st, rows, probs, ok, n_left, n_scored

    return step


def make_superstep(static: BcDeviceStatic,
                   predict_fn: Callable,
                   forced: bool = False):
    """Build the jitted single superstep.

    predict_fn: feats [E, D] -> probs [E] (device classifier; traced into
    the same XLA program).  When ``forced`` is True the superstep takes an
    explicit boolean merge mask instead of running selection (used by the
    replay-parity tests).

    The step returns (state, order_rows [E, 3], sal [E], merge_mask [E],
    n_table_left, n_scored).
    """
    import jax

    step = _make_step_fn(static, predict_fn, forced)
    if forced:
        return jax.jit(lambda state, mask: step(state, force_mask=mask))
    return jax.jit(lambda state: step(state))


def make_merge_loop(static: BcDeviceStatic, predict_fn: Callable,
                    max_supersteps: int, with_consts: bool = False):
    """The full classifier-in-the-loop merge as ONE device program: a
    ``lax.while_loop`` over supersteps carrying the order/saliency buffers,
    so no host round-trip happens between supersteps (the remote-execute
    latency otherwise dominates, ~0.8s/step through the TPU tunnel).

    Returns jitted fn(state) -> (order [max_m, 3] dense-id rows, sal,
    n_merges, n_scored_total, n_steps).
    """
    import jax
    import jax.numpy as jnp

    C, E, R = static.C, static.E, static.R
    max_m = max(R - 1, 1)
    step = _make_step_fn(static, predict_fn, with_consts=with_consts)

    def cond(carry):
        state, consts, order, sal, n_scored, n_steps, n_left = carry
        return (n_left > 0) & (n_steps < max_supersteps)

    def body(carry):
        state, consts, order, sal, n_scored, n_steps, n_left = carry
        st, rows, probs, ok, n_left2, scored = step(state, consts)
        slot = jnp.where(ok, rows[:, 2] - R, max_m)
        order_pad = jnp.concatenate(
            [order, jnp.full((1, 3), -1, jnp.int32)], axis=0)
        order = order_pad.at[slot].set(
            jnp.where(ok[:, None], rows, -1))[:max_m]
        sal_pad = jnp.concatenate([sal, jnp.zeros(1, sal.dtype)])
        sal = sal_pad.at[slot].set(
            jnp.where(ok, probs.astype(sal.dtype), 0.0))[:max_m]
        return (st, consts, order, sal,
                n_scored + scored.astype(n_scored.dtype),
                n_steps + 1, n_left2)

    @jax.jit
    def run(state, consts=None):
        order0 = jnp.full((max_m, 3), -1, jnp.int32)
        sal0 = jnp.zeros(max_m)
        n_left0 = (state["e_alive"] & state["e_table"]).sum()
        carry = (state, consts, order0, sal0, jnp.int32(0), jnp.int32(0),
                 n_left0)
        state, _, order, sal, n_scored, n_steps, _ = jax.lax.while_loop(
            cond, body, carry)
        n_m = state["next_id"] - R
        return order, sal, n_m, n_scored, n_steps

    return run


def merge_order_bc_device(rag: Rag, cfg: FeatureConfig, predict_fn,
                          max_supersteps: Optional[int] = None,
                          stats: Optional[dict] = None,
                          predict_consts=None):
    """Batched classifier-in-the-loop merge on device.

    predict_fn: jittable feats [E, D] -> merge probabilities [E]; or,
    when ``predict_consts`` is given, (feats, consts) -> probabilities
    with the classifier's node tables threaded through as program
    arguments (use models/forest.make_label_scorer(embed=True) -- a
    closed-over table would inline as a huge MLIR literal).
    Returns (order [n, 3] int64 label keys, probabilities [n]).  Like the
    host greedy_merge_bc but merging the per-superstep independent set of
    probability maxima instead of one pop per iteration.

    When a ``stats`` dict is passed it is filled with superstep counters
    (n_supersteps, candidates scored).
    """
    import jax
    import jax.numpy as jnp

    state_np, static = build_state(rag, cfg)
    state = {k: jnp.asarray(v) for k, v in state_np.items()}
    if max_supersteps is None:
        max_supersteps = 4 * int(np.ceil(np.log2(max(static.R, 2)))) + 16
    # the whole merge runs as ONE device program (no per-superstep host
    # sync -- remote-execute latency would dominate otherwise)
    key = (static.C, static.E, static.R, predict_fn, max_supersteps)
    run = _LOOP_CACHE.get(key)
    if run is None:
        run = make_merge_loop(static, predict_fn, max_supersteps,
                              with_consts=predict_consts is not None)
        _LOOP_CACHE[key] = run
    consts = jax.tree.map(jnp.asarray, predict_consts)
    order_buf, sal_buf, n_m, n_scored, n_steps = run(state, consts)
    n_m = int(n_m)
    if stats is not None:
        stats["n_supersteps"] = int(n_steps)
        stats["n_scored"] = int(n_scored)
        stats["E"] = static.E
        stats["feat_dim"] = static.feat_dim

    order_dense = np.asarray(order_buf)[:n_m].astype(np.int64)
    sals = np.asarray(sal_buf)[:n_m].astype(np.float64)

    # dense ids -> label keys (same scheme as merge_device.order_to_keys)
    R = static.R
    max_key = int(rag.keys.max()) if R else 0
    out = np.empty_like(order_dense)
    for j in range(2):
        col = order_dense[:, j]
        out[:, j] = np.where(col < R, rag.keys[np.minimum(col, R - 1)],
                             max_key + 1 + (col - R))
    out[:, 2] = max_key + 1 + order_dense[:, 2] - R
    out[:, :2] = np.sort(out[:, :2], axis=1)
    return out, sals


_LOOP_CACHE = {}
