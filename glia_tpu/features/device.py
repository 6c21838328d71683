"""Device (JAX) full-width BC feature assembly.

The exact on-device counterpart of features/serialize.py: given *stacked*
per-candidate stat records (arrays instead of python dicts), produce the
serialized RegionFeats / BoundaryFeats / BoundaryClassificationFeats
matrices in the reference's order (code/hmt/bc_feat.hxx:71-243,
code/type/feat.hxx:594-811), fully vectorized so every frontier candidate
of a merge superstep assembles in one fused XLA program.

Record layout (a dict of jnp arrays, N = number of rows):
  area [N], border [N], bd [N]                  scalars
  bbox_lo [N, D], bbox_hi [N, D]                ITK coords
  vp [N, nT]                                    pb>=thresh boundary counts
  r_cnt/r_sum/r_sumsq/r_min/r_max [N, nR]       per r_image region stats
  r_hist [N, nR, B]
  rl_hist [N, nRL, BL]                          per rl_image label hists
  b_cnt/b_sum/b_sumsq/b_min/b_max [N, nB]       per b_image boundary stats
  b_hist [N, nB, B]

Pair-boundary record: cnt [N], vp [N, nT], b_* as above.

Empty stats follow the reference's conventions: count<=0 serializes to
zeros (feat.hxx:703), safe division via sdivide (glia_base.hxx:77-79).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Tuple

import numpy as np

from ..constants import FEPS
from .config import FeatureConfig


@dataclass(frozen=True)
class DeviceFeatureSpec:
    """Static shape/flag info for the device feature assembler."""

    ndim: int
    n_thresh: int
    n_r: int
    n_rl: int
    n_b: int
    r_bins: int
    rl_bins: int
    b_bins: int
    normalizing_area: float
    normalizing_length: float
    use_log_shape: bool
    histogram_as_feats: bool

    @classmethod
    def from_config(cls, cfg: FeatureConfig, ndim: int) -> "DeviceFeatureSpec":
        if cfg.median_as_feats:
            raise NotImplementedError(
                "median_as_feats needs pixel multisets; use the host "
                "hierarchical extractor (features/hierarchical.py)")

        def _uniform_bins(images, what):
            if not images:
                return 0
            bins = {img.hist_bins for img in images}
            rngs = {tuple(img.hist_range) for img in images}
            if len(bins) > 1 or len(rngs) > 1:
                raise NotImplementedError(
                    f"device feature path needs uniform hist bins/range "
                    f"across {what} images")
            return images[0].hist_bins

        return cls(
            ndim=ndim,
            n_thresh=len(cfg.boundary_thresholds),
            n_r=len(cfg.r_images),
            n_rl=len(cfg.rl_images),
            n_b=len(cfg.b_images),
            r_bins=_uniform_bins(cfg.r_images, "r"),
            rl_bins=_uniform_bins(cfg.rl_images, "rl"),
            b_bins=_uniform_bins(cfg.b_images, "b"),
            normalizing_area=float(cfg.normalizing_area),
            normalizing_length=float(cfg.normalizing_length),
            use_log_shape=bool(cfg.use_log_shape),
            histogram_as_feats=bool(cfg.histogram_as_feats),
        )


# -- jnp analogues of constants.sdivide / slog / entropy ---------------------

def _sdivide(lhs, rhs, dummy=0.0):
    import jax.numpy as jnp

    safe = jnp.abs(rhs) >= FEPS
    return jnp.where(safe, lhs / jnp.where(safe, rhs, 1.0), dummy)


def _slog(x, dummy=0.0):
    import jax.numpy as jnp

    safe = x >= FEPS
    return jnp.where(safe, jnp.log(jnp.where(safe, x, 1.0)), dummy)


def _entropy(hist, cnt):
    """stats::entropy rows (stats.hxx:144-151): hist [..., B], cnt [...]."""
    import jax.numpy as jnp

    ok = cnt > 0
    p = hist / jnp.where(ok, cnt, 1.0)[..., None]
    mask = p > FEPS
    lg = jnp.where(mask, jnp.log2(jnp.where(mask, p, 1.0)), 0.0)
    return jnp.where(ok, -(p * lg).sum(axis=-1), 0.0)


def _img_feats_block(cnt, s, ss, mn, mx, hist, spec):
    """ImageFeats serialize (feat.hxx:846-855): [hist?] entropy, mean, std,
    min, max.  Inputs [..., K]; returns [..., K, width]."""
    import jax.numpy as jnp

    ok = cnt > 0
    mean = jnp.where(ok, s / jnp.where(ok, cnt, 1.0), 0.0)
    var = jnp.where(ok, ss / jnp.where(ok, cnt, 1.0) - mean * mean, 0.0)
    std = jnp.sqrt(jnp.maximum(var, 0.0))
    mn = jnp.where(ok, mn, 0.0)
    mx = jnp.where(ok, mx, 0.0)
    ent = _entropy(hist, cnt)
    cols = []
    if spec.histogram_as_feats:
        h = hist / jnp.where(ok, cnt, 1.0)[..., None]
        h = jnp.where(ok[..., None], h, 0.0)
        cols.append(h)
    cols.append(jnp.stack([ent, mean, std, mn, mx], axis=-1))
    return jnp.concatenate(cols, axis=-1)


def _label_feats_block(hist, cnt, spec):
    """ImageLabelFeats (feat.hxx:601-612): [hist?] entropy."""
    import jax.numpy as jnp

    ok = cnt > 0
    ent = _entropy(hist, cnt)
    if spec.histogram_as_feats:
        h = hist / jnp.where(ok, cnt, 1.0)[..., None]
        h = jnp.where(ok[..., None], h, 0.0)
        return jnp.concatenate([h, ent[..., None]], axis=-1)
    return ent[..., None]


def region_features_dev(rec, spec: DeviceFeatureSpec):
    """RegionFeats matrix [N, Dr] (bc_feat.hxx:71-80 serialize order)."""
    import jax.numpy as jnp

    nA, nL = spec.normalizing_area, spec.normalizing_length
    D = spec.ndim
    area_raw = rec["area"]
    perim_raw = rec["bd"] + rec["border"]
    compact = _sdivide(perim_raw ** (D / (D - 1.0)), area_raw, 0.0)
    area = area_raw / nA
    perim = perim_raw / nL
    bsz = jnp.maximum(rec["bbox_hi"] - rec["bbox_lo"], 0.0)
    bbox_area = jnp.prod(bsz, axis=-1) / nA
    vp = rec["vp"]
    bsz_n = bsz / nL
    vps = vp / nL
    rvps = _sdivide(vp, rec["bd"][..., None], 0.0)
    head = jnp.stack([area, perim, compact, bbox_area], axis=-1)
    if spec.use_log_shape:
        head = jnp.stack(
            [_slog(area, 0.0), _slog(perim, 0.0), compact,
             _slog(bbox_area, 0.0)], axis=-1)
        bsz_n = _slog(bsz_n, 0.0)
        vps = _slog(vps, 0.0)
    cols = [head, bsz_n, vps, rvps]
    if spec.n_r:
        blk = _img_feats_block(rec["r_cnt"], rec["r_sum"], rec["r_sumsq"],
                               rec["r_min"], rec["r_max"], rec["r_hist"],
                               spec)                      # [N, nR, w]
        cols.append(blk.reshape(blk.shape[:-2] + (-1,)))
    if spec.n_rl:
        blk = _label_feats_block(
            rec["rl_hist"], rec["area"][..., None] * jnp.ones(spec.n_rl),
            spec)
        cols.append(blk.reshape(blk.shape[:-2] + (-1,)))
    if spec.n_b:
        blk = _img_feats_block(rec["b_cnt"], rec["b_sum"], rec["b_sumsq"],
                               rec["b_min"], rec["b_max"], rec["b_hist"],
                               spec)
        cols.append(blk.reshape(blk.shape[:-2] + (-1,)))
    return jnp.concatenate(cols, axis=-1)


def boundary_features_dev(rec0, rec1, rec2, pair, spec: DeviceFeatureSpec):
    """BoundaryFeats matrix [N, Db] (bc_feat.hxx:183-215); rec0 must
    already be the smaller-area region (area ordering applied upstream)."""
    import jax.numpy as jnp

    nA, nL = spec.normalizing_area, spec.normalizing_length
    area0 = rec0["area"] / nA
    area1 = rec1["area"] / nA
    perim0 = (rec0["bd"] + rec0["border"]) / nL
    perim1 = (rec1["bd"] + rec1["border"]) / nL
    area_diff = jnp.abs(area0 - area1)
    perim_diff = jnp.abs(perim0 - perim1)
    blen = jnp.ceil(pair["cnt"] / 2.0) / nL
    c0 = area_diff
    c3 = perim_diff
    c6 = blen
    if spec.use_log_shape:
        c0 = _slog(area_diff, 0.0)
        c3 = _slog(perim_diff, 0.0)
        c6 = _slog(blen, 0.0)
    head = jnp.stack([
        c0, _sdivide(area_diff, area0, 0.0), _sdivide(area_diff, area1, 0.0),
        c3, _sdivide(perim_diff, perim0, 0.0),
        _sdivide(perim_diff, perim1, 0.0),
        c6, _sdivide(blen, area0, 0.0), _sdivide(blen, area1, 0.0),
        _sdivide(blen, perim0, 0.0), _sdivide(blen, perim1, 0.0),
    ], axis=-1)
    vbl = jnp.ceil(pair["vp"] / 2.0) / nL
    vbl_ser = _slog(vbl, 0.0) if spec.use_log_shape else vbl
    cols = [head, vbl_ser,
            _sdivide(vbl, blen[..., None], 0.0),
            _sdivide(vbl, perim0[..., None], 0.0),
            _sdivide(vbl, perim1[..., None], 0.0)]
    if spec.n_r:
        f0 = _img_feats_block(rec0["r_cnt"], rec0["r_sum"], rec0["r_sumsq"],
                              rec0["r_min"], rec0["r_max"], rec0["r_hist"],
                              spec)                        # [N, nR, w]
        f1 = _img_feats_block(rec1["r_cnt"], rec1["r_sum"], rec1["r_sumsq"],
                              rec1["r_min"], rec1["r_max"], rec1["r_hist"],
                              spec)
        h0 = rec0["r_hist"] / jnp.maximum(rec0["r_cnt"], 1.0)[..., None]
        h1 = rec1["r_hist"] / jnp.maximum(rec1["r_cnt"], 1.0)[..., None]
        l1 = jnp.abs(h0 - h1).sum(axis=-1)                  # [N, nR]
        x2 = (jnp.square(h0 - h1) / (h0 + h1 + FEPS)).sum(axis=-1)
        off = spec.r_bins if spec.histogram_as_feats else 0
        d = jnp.abs(f0[..., off:] - f1[..., off:])          # [N, nR, 5]
        blk = jnp.concatenate(
            [jnp.stack([l1, x2], axis=-1), d], axis=-1)     # [N, nR, 7]
        cols.append(blk.reshape(blk.shape[:-2] + (-1,)))
    if spec.n_rl:
        c0a = jnp.maximum(rec0["area"], 1.0)[..., None, None]
        c1a = jnp.maximum(rec1["area"], 1.0)[..., None, None]
        h0 = rec0["rl_hist"] / c0a
        h1 = rec1["rl_hist"] / c1a
        l1 = jnp.abs(h0 - h1).sum(axis=-1)
        x2 = (jnp.square(h0 - h1) / (h0 + h1 + FEPS)).sum(axis=-1)
        e0 = _entropy(rec0["rl_hist"],
                      rec0["area"][..., None] * jnp.ones(spec.n_rl))
        e1 = _entropy(rec1["rl_hist"],
                      rec1["area"][..., None] * jnp.ones(spec.n_rl))
        blk = jnp.stack([l1, x2, jnp.abs(e0 - e1)], axis=-1)
        cols.append(blk.reshape(blk.shape[:-2] + (-1,)))
    if spec.n_b:
        blk = _img_feats_block(pair["b_cnt"], pair["b_sum"], pair["b_sumsq"],
                               pair["b_min"], pair["b_max"], pair["b_hist"],
                               spec)
        cols.append(blk.reshape(blk.shape[:-2] + (-1,)))
    return jnp.concatenate(cols, axis=-1)


_REGION_FIELDS = ("area", "border", "bd", "bbox_lo", "bbox_hi", "vp",
                  "r_cnt", "r_sum", "r_sumsq", "r_min", "r_max", "r_hist",
                  "rl_hist", "b_cnt", "b_sum", "b_sumsq", "b_min", "b_max",
                  "b_hist")


def swap_records(rec0, rec1, swap):
    """Elementwise-swap two stacked records where ``swap`` [N] is True."""
    import jax.numpy as jnp

    out0, out1 = {}, {}
    for k in rec0:
        a, b = rec0[k], rec1[k]
        m = swap.reshape(swap.shape + (1,) * (a.ndim - swap.ndim))
        out0[k] = jnp.where(m, b, a)
        out1[k] = jnp.where(m, a, b)
    return out0, out1


def bc_features_dev(rec0, rec1, rec2, pair, spec: DeviceFeatureSpec):
    """BoundaryClassificationFeats [N, Db + 3*Dr] with area ordering
    (bc_feat.hxx:219-243 + main_bc_feat.cxx:86-89)."""
    import jax.numpy as jnp

    nA = spec.normalizing_area
    swap = rec0["area"] / nA > rec1["area"] / nA
    rec0, rec1 = swap_records(rec0, rec1, swap)
    bf = boundary_features_dev(rec0, rec1, rec2, pair, spec)
    return jnp.concatenate(
        [bf, region_features_dev(rec0, spec), region_features_dev(rec1, spec),
         region_features_dev(rec2, spec)], axis=-1)
