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

State layout: ALL per-component stats pack into three matrices
(additive / min / max) and all per-edge directed-part stats into three
[E, 4, *] tensors.  The packing matters: a while-loop carry of ~25
separately-shaped arrays made XLA's TPU loop layout assignment take
~9.5 minutes for a program whose body alone compiles in 25 s; with the
packed carry the whole merge loop compiles in well under a minute, and
the per-superstep scatters/segment-sums run once per pack instead of
once per field.  Additive region fields merge by +, min/max fields by
min/max with +-inf empty fills (exactly group_stats' conventions, so
empty-stat serialization semantics are preserved: count<=0 rows
serialize to zeros, feat.hxx:703).

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


class _Pack:
    """Named slices of a flat trailing feature axis."""

    def __init__(self):
        self.slices = {}
        self.width = 0

    def add(self, name, shape=()):
        k = int(np.prod(shape)) if shape else 1
        self.slices[name] = (self.width, self.width + k, tuple(shape))
        self.width += k
        return self

    def get(self, mat, name):
        a, b, shape = self.slices[name]
        col = mat[..., a:b]
        return col.reshape(col.shape[:-1] + shape) if shape else col[..., 0]

    def put_np(self, mat, name, val):
        a, b, _ = self.slices[name]
        mat[..., a:b] = np.asarray(val).reshape(mat.shape[:-1] + (b - a,))


def _make_packs(spec: DeviceFeatureSpec):
    """(component add/min/max packs, edge-part add pack).

    The component add pack ends with a residual block laid out exactly
    like the edge-part pack so residual += part-slice is one vector op;
    same for the min/max packs' trailing residual-boundary block.
    """
    nR, nRL, nB, nT, D = (spec.n_r, spec.n_rl, spec.n_b, spec.n_thresh,
                          spec.ndim)
    rB = max(spec.r_bins_max, 1)
    rlB = max(spec.rl_bins_max, 1)
    bB = max(spec.b_bins_max, 1)
    ea = _Pack()
    ea.add("cnt").add("vp", (nT,)).add("b_cnt", (nB,)).add("b_sum", (nB,))
    ea.add("b_sumsq", (nB,)).add("b_hist", (nB, bB))
    if spec.median_as_feats:
        ea.add("b_medh", (nB, spec.b_med_v))
    ca = _Pack()
    ca.add("area").add("border").add("r_cnt", (nR,)).add("r_sum", (nR,))
    ca.add("r_sumsq", (nR,)).add("r_hist", (nR, rB))
    ca.add("rl_hist", (nRL, rlB))
    if spec.median_as_feats:
        ca.add("r_medh", (nR, spec.r_med_v))
    res_off = ca.width
    for name, (a, b, shape) in ea.slices.items():
        ca.add("res_" + name, shape if shape else ())
    cm = _Pack()
    cm.add("bbox_lo", (D,)).add("r_min", (nR,))
    rmin_off = cm.width
    cm.add("res_b_min", (nB,))
    cx = _Pack()
    cx.add("bbox_hi", (D,)).add("r_max", (nR,))
    cx.add("res_b_max", (nB,))
    return ca, cm, cx, ea, res_off, rmin_off


@dataclass
class BcDeviceStatic:
    """Static (python-level) config for the jitted superstep."""

    spec: DeviceFeatureSpec
    C: int            # component capacity
    E: int            # edge capacity
    R: int            # initial leaf regions
    feat_dim: int
    ca: _Pack = None
    cm: _Pack = None
    cx: _Pack = None
    ea: _Pack = None
    res_off: int = 0
    rmin_off: int = 0


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
    ca, cm, cx, ea, res_off, rmin_off = _make_packs(spec)

    pb = np.asarray(cfg.pb_image, dtype=np.float64).ravel()

    # ---- leaf component records ----
    rid = np.repeat(np.arange(R), np.diff(rag.region_ptr))
    pix = rag.region_pixels
    c_add = np.zeros((C, ca.width))
    c_min = np.full((C, cm.width), POS_INF)
    c_max = np.full((C, cx.width), NEG_INF)

    area = np.zeros(C)
    np.add.at(area, rid, 1.0)
    ca.put_np(c_add, "area", area)
    border = np.zeros(C)
    border[:R] = np.diff(rag.border_ptr).astype(np.float64)
    ca.put_np(c_add, "border", border)
    # residual blocks start zeroed (additive) and stay +-inf (min/max)
    a, b, _ = ca.slices["res_cnt"]
    c_add[:, a:] = 0.0

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
    cm.put_np(c_min, "bbox_lo", bbox_lo)
    cx.put_np(c_max, "bbox_hi", bbox_hi)

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
            h[:R, i, :img.hist_bins] = st["hist"]
        return cnt, s, ss, mn, mx, h

    r_cnt, r_sum, r_sumsq, r_min, r_max, r_hist = _img_group(
        cfg.r_images, max(spec.r_bins_max, 1))
    ca.put_np(c_add, "r_cnt", r_cnt)
    ca.put_np(c_add, "r_sum", r_sum)
    ca.put_np(c_add, "r_sumsq", r_sumsq)
    ca.put_np(c_add, "r_hist", r_hist)
    cm.put_np(c_min, "r_min", r_min)
    cx.put_np(c_max, "r_max", r_max)
    rl_hist = np.zeros((C, nRL, max(spec.rl_bins_max, 1)))
    for i, img in enumerate(cfg.rl_images):
        v = np.asarray(img.image, np.float64).ravel()[pix]
        st = group_stats(v, rid, R, img.hist_bins, img.hist_range)
        rl_hist[:R, i, :img.hist_bins] = st["hist"]
    ca.put_np(c_add, "rl_hist", rl_hist)
    if spec.median_as_feats:
        from ..features.device import counting_hist

        r_medh = np.zeros((C, nR, spec.r_med_v))
        for i, img in enumerate(cfg.r_images):
            v = np.asarray(img.image, np.float64).ravel()[pix]
            r_medh[:R, i, :len(spec.r_med_vals[i])] = counting_hist(
                v, rid, R, spec.r_med_vals[i], len(spec.r_med_vals[i]))
        ca.put_np(c_add, "r_medh", r_medh)

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

    e_add = np.zeros((E, 4, ea.width))
    e_min = np.full((E, 4, max(nB, 0)), POS_INF)
    e_max = np.full((E, 4, max(nB, 0)), NEG_INF)
    dp_rows = np.zeros((Ed, ea.width))
    ea.put_np(dp_rows, "cnt", dp_cnt)
    ea.put_np(dp_rows, "vp", dp_vp)
    if nB:
        ea.put_np(dp_rows, "b_cnt", np.stack([s["cnt"] for s in dp_b], 1))
        ea.put_np(dp_rows, "b_sum", np.stack([s["sum"] for s in dp_b], 1))
        ea.put_np(dp_rows, "b_sumsq",
                  np.stack([s["sumsq"] for s in dp_b], 1))
        bh = np.zeros((Ed, nB, max(spec.b_bins_max, 1)))
        for i, s in enumerate(dp_b):
            bh[:, i, :s["hist"].shape[1]] = s["hist"]
        ea.put_np(dp_rows, "b_hist", bh)
        if spec.median_as_feats:
            from ..features.device import counting_hist

            bmh = np.zeros((Ed, nB, spec.b_med_v))
            for i, img in enumerate(cfg.b_images):
                v = np.asarray(img.image, np.float64).ravel()[rag.dir_pixels]
                bmh[:, i, :len(spec.b_med_vals[i])] = counting_hist(
                    v, dpid, Ed, spec.b_med_vals[i],
                    len(spec.b_med_vals[i]))
            ea.put_np(dp_rows, "b_medh", bmh)
    np.add.at(e_add, (inv, part), dp_rows)
    for bi, st in enumerate(dp_b):
        nz = st["cnt"] > 0
        np.minimum.at(e_min[:, :, bi], (inv[nz], part[nz]), st["min"][nz])
        np.maximum.at(e_max[:, :, bi], (inv[nz], part[nz]), st["max"][nz])

    # table membership: both directions exist (boundary_table.hxx:99-103)
    has_u = np.zeros(E, bool)
    has_v = np.zeros(E, bool)
    has_u[inv[is_u_side]] = True
    has_v[inv[~is_u_side]] = True
    e_table = has_u & has_v

    state = {
        "c_alive": np.concatenate([np.ones(R, bool), np.zeros(C - R, bool)]),
        "c_add": c_add, "c_min": c_min, "c_max": c_max,
        "eu": eu, "ev": ev,
        "e_alive": np.ones(E, bool), "e_table": e_table,
        "e_add": e_add, "e_min": e_min, "e_max": e_max,
        "next_id": np.int32(R),
    }
    nt_feat = bc_feat_dim(cfg, ndim)
    return state, BcDeviceStatic(
        spec=spec, C=C, E=E, R=R, feat_dim=nt_feat, ca=ca, cm=cm, cx=cx,
        ea=ea, res_off=res_off, rmin_off=rmin_off)


def bc_feat_dim(cfg: FeatureConfig, ndim: int) -> int:
    return (cfg.boundary_feat_dim(with_saliency=False)
            + 3 * cfg.region_feat_dim(ndim, with_saliency=False))


# ---------------------------------------------------------------------------
# jitted superstep
# ---------------------------------------------------------------------------

def _component_totals(state, static):
    """One-sided boundary totals per component (record_with_boundary's
    bd/vp/b fields): residual + all outgoing entry parts.

    Returns (tot_badd [C, PA], tot_bmin [C, nB], tot_bmax [C, nB],
    (side mins/maxes per edge))."""
    import jax
    import jax.numpy as jnp

    C = static.C
    eu, ev, alive = state["eu"], state["ev"], state["e_alive"]
    e_add, e_min, e_max = state["e_add"], state["e_min"], state["e_max"]

    side_u = e_add[:, P_MU] + e_add[:, P_NU]       # [E, PA]
    side_v = e_add[:, P_MV] + e_add[:, P_NV]
    am = alive[:, None]
    tot_badd = state["c_add"][:, static.res_off:]
    tot_badd = tot_badd + jax.ops.segment_sum(
        jnp.where(am, side_u, 0.0), eu, num_segments=C)
    tot_badd = tot_badd + jax.ops.segment_sum(
        jnp.where(am, side_v, 0.0), ev, num_segments=C)

    side_u_min = jnp.minimum(e_min[:, P_MU], e_min[:, P_NU])
    side_v_min = jnp.minimum(e_min[:, P_MV], e_min[:, P_NV])
    side_u_max = jnp.maximum(e_max[:, P_MU], e_max[:, P_NU])
    side_v_max = jnp.maximum(e_max[:, P_MV], e_max[:, P_NV])
    res_min = state["c_min"][:, static.rmin_off:]
    tmin = jnp.full_like(res_min, POS_INF)
    tmin = tmin.at[eu].min(jnp.where(am, side_u_min, POS_INF))
    tmin = tmin.at[ev].min(jnp.where(am, side_v_min, POS_INF))
    tot_bmin = jnp.minimum(res_min, tmin)
    res_max = state["c_max"][:, static.rmin_off:]
    tmax = jnp.full_like(res_max, NEG_INF)
    tmax = tmax.at[eu].max(jnp.where(am, side_u_max, NEG_INF))
    tmax = tmax.at[ev].max(jnp.where(am, side_v_max, NEG_INF))
    tot_bmax = jnp.maximum(res_max, tmax)
    return (tot_badd, tot_bmin, tot_bmax,
            (side_u_min, side_v_min, side_u_max, side_v_max))


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


def _region_rec(static, add_rows, min_rows, max_rows, badd_rows,
                bmin_rows, bmax_rows):
    """Unpack gathered rows into the bc_features_dev record dict."""
    ca, cm, cx, ea = static.ca, static.cm, static.cx, static.ea
    rec = {
        "area": ca.get(add_rows, "area"),
        "border": ca.get(add_rows, "border"),
        "r_cnt": ca.get(add_rows, "r_cnt"),
        "r_sum": ca.get(add_rows, "r_sum"),
        "r_sumsq": ca.get(add_rows, "r_sumsq"),
        "r_hist": ca.get(add_rows, "r_hist"),
        "rl_hist": ca.get(add_rows, "rl_hist"),
        "bbox_lo": cm.get(min_rows, "bbox_lo"),
        "r_min": cm.get(min_rows, "r_min"),
        "bbox_hi": cx.get(max_rows, "bbox_hi"),
        "r_max": cx.get(max_rows, "r_max"),
        "bd": ea.get(badd_rows, "cnt"),
        "vp": ea.get(badd_rows, "vp"),
        "b_cnt": ea.get(badd_rows, "b_cnt"),
        "b_sum": ea.get(badd_rows, "b_sum"),
        "b_sumsq": ea.get(badd_rows, "b_sumsq"),
        "b_hist": ea.get(badd_rows, "b_hist"),
        "b_min": bmin_rows,
        "b_max": bmax_rows,
    }
    if static.spec.median_as_feats:
        rec["r_medh"] = ca.get(add_rows, "r_medh")
        rec["b_medh"] = ea.get(badd_rows, "b_medh")
    return rec


def candidate_features(state, static: BcDeviceStatic):
    """Full-width BC feature matrix [E, D] for every alive edge, plus the
    candidate-valid mask (alive & in-table).  Pure JAX."""
    import jax.numpy as jnp

    spec, ea = static.spec, static.ea
    eu, ev, alive = state["eu"], state["ev"], state["e_alive"]
    e_add, e_min, e_max = state["e_add"], state["e_min"], state["e_max"]
    tot_badd, tot_bmin, tot_bmax, sides = _component_totals(state, static)
    side_u_min, side_v_min, side_u_max, side_v_max = sides

    rec0 = _region_rec(static, state["c_add"][eu], state["c_min"][eu],
                       state["c_max"][eu], tot_badd[eu], tot_bmin[eu],
                       tot_bmax[eu])
    rec1 = _region_rec(static, state["c_add"][ev], state["c_min"][ev],
                       state["c_max"][ev], tot_badd[ev], tot_bmin[ev],
                       tot_bmax[ev])

    # pair boundary: all four parts (getBoundary both sides)
    pair_add = e_add.sum(axis=1)
    pair = {
        "cnt": ea.get(pair_add, "cnt"),
        "vp": ea.get(pair_add, "vp"),
        "b_cnt": ea.get(pair_add, "b_cnt"),
        "b_sum": ea.get(pair_add, "b_sum"),
        "b_sumsq": ea.get(pair_add, "b_sumsq"),
        "b_hist": ea.get(pair_add, "b_hist"),
        "b_min": e_min.min(axis=1),
        "b_max": e_max.max(axis=1),
    }
    if spec.median_as_feats:
        pair["b_medh"] = ea.get(pair_add, "b_medh")

    # merged record (the reference's scratch merge, struct_merge_bc.hxx:
    # 18-35): additive = sum, min/max = elementwise (+-inf empty fills
    # preserve the host's both/only0 semantics exactly)
    add2 = state["c_add"][eu] + state["c_add"][ev]
    min2 = jnp.minimum(state["c_min"][eu], state["c_min"][ev])
    max2 = jnp.maximum(state["c_max"][eu], state["c_max"][ev])
    # merged boundary, additive block: tot_u + tot_v - both mutual parts
    badd2 = (tot_badd[eu] + tot_badd[ev]
             - e_add[:, P_MU] - e_add[:, P_MV])
    # merged boundary min/max: exclude this edge's side values, keep its
    # non-mutual parts and residuals
    exu_min, exv_min = _excl_reduce(side_u_min, side_v_min, eu, ev, alive,
                                    static.C, "min")
    exu_max, exv_max = _excl_reduce(side_u_max, side_v_max, eu, ev, alive,
                                    static.C, "max")
    res_min = state["c_min"][:, static.rmin_off:]
    res_max = state["c_max"][:, static.rmin_off:]
    n_min = jnp.minimum(e_min[:, P_NU], e_min[:, P_NV])
    n_max = jnp.maximum(e_max[:, P_NU], e_max[:, P_NV])
    bmin2 = jnp.minimum(
        jnp.minimum(res_min[eu], res_min[ev]),
        jnp.minimum(jnp.minimum(exu_min, exv_min), n_min))
    bmax2 = jnp.maximum(
        jnp.maximum(res_max[eu], res_max[ev]),
        jnp.maximum(jnp.maximum(exu_max, exv_max), n_max))
    rec2 = _region_rec(static, add2, min2, max2, badd2, bmin2, bmax2)

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
    res_off, rmin_off = static.res_off, static.rmin_off

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
        e_add, e_min, e_max = (state["e_add"], state["e_min"],
                               state["e_max"])
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

        # --- new component records (union of endpoints); the residual
        # block additionally absorbs this edge's non-mutual parts (the
        # mutual parts cancel, region.hxx:68-77) ---
        st = dict(state)
        add2 = state["c_add"][eu] + state["c_add"][ev]
        add2 = jnp.concatenate(
            [add2[:, :res_off],
             add2[:, res_off:] + e_add[:, P_NU] + e_add[:, P_NV]], axis=1)
        st["c_add"] = scat_set(state["c_add"], add2)
        min2 = jnp.minimum(state["c_min"][eu], state["c_min"][ev])
        min2 = jnp.concatenate(
            [min2[:, :rmin_off],
             jnp.minimum(min2[:, rmin_off:],
                         jnp.minimum(e_min[:, P_NU], e_min[:, P_NV]))],
            axis=1)
        st["c_min"] = scat_set(state["c_min"], min2)
        max2 = jnp.maximum(state["c_max"][eu], state["c_max"][ev])
        max2 = jnp.concatenate(
            [max2[:, :rmin_off],
             jnp.maximum(max2[:, rmin_off:],
                         jnp.maximum(e_max[:, P_NU], e_max[:, P_NV]))],
            axis=1)
        st["c_max"] = scat_set(state["c_max"], max2)

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
        sw = swap[:, None, None]
        e_add = jnp.where(sw, e_add[:, perm], e_add)
        e_min = jnp.where(sw, e_min[:, perm], e_min)
        e_max = jnp.where(sw, e_max[:, perm], e_max)

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

        am3 = alive_s[:, None, None]
        k3 = keep[:, None, None]
        ea_s = take(e_add)
        ps = jax.ops.segment_sum(jnp.where(am3, ea_s, 0.0), seg_id,
                                 num_segments=E)
        st["e_add"] = jnp.where(k3, ps[seg_id], ea_s)
        em_s = take(e_min)
        pm = jax.ops.segment_min(jnp.where(am3, em_s, POS_INF), seg_id,
                                 num_segments=E)
        st["e_min"] = jnp.where(k3, pm[seg_id], em_s)
        ex_s = take(e_max)
        px = jax.ops.segment_max(jnp.where(am3, ex_s, NEG_INF), seg_id,
                                 num_segments=E)
        st["e_max"] = jnp.where(k3, px[seg_id], ex_s)

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

    Returns jitted fn(state[, consts]) -> (order [max_m, 3] dense-id rows,
    sal, n_merges, n_scored_total, n_steps).
    """
    import jax
    import jax.numpy as jnp

    C, E, R = static.C, static.E, static.R
    max_m = max(R - 1, 1)
    step = _make_step_fn(static, predict_fn, with_consts=with_consts)

    @jax.jit
    def run(state, consts=None):
        # consts (classifier node tables) are a free variable of the loop
        # body, NOT part of the carry: threading a tens-of-MB table
        # through the while carry made XLA's loop layout assignment take
        # minutes (292s vs 8s for this same program)
        def cond(carry):
            state, order, sal, n_scored, n_steps, n_left = carry
            return (n_left > 0) & (n_steps < max_supersteps)

        def body(carry):
            state, order, sal, n_scored, n_steps, n_left = carry
            st, rows, probs, ok, n_left2, scored = step(state, consts)
            slot = jnp.where(ok, rows[:, 2] - R, max_m)
            order_pad = jnp.concatenate(
                [order, jnp.full((1, 3), -1, jnp.int32)], axis=0)
            order = order_pad.at[slot].set(
                jnp.where(ok[:, None], rows, -1))[:max_m]
            sal_pad = jnp.concatenate([sal, jnp.zeros(1, sal.dtype)])
            sal = sal_pad.at[slot].set(
                jnp.where(ok, probs.astype(sal.dtype), 0.0))[:max_m]
            return (st, order, sal,
                    n_scored + scored.astype(n_scored.dtype),
                    n_steps + 1, n_left2)

        order0 = jnp.full((max_m, 3), -1, jnp.int32)
        sal0 = jnp.zeros(max_m)
        n_left0 = (state["e_alive"] & state["e_table"]).sum()
        carry = (state, order0, sal0, jnp.int32(0), jnp.int32(0), n_left0)
        state, order, sal, n_scored, n_steps = jax.lax.while_loop(
            cond, body, carry)[:5]
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
