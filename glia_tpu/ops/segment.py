"""JAX segment primitives for CSR graph data.

These are the on-device equivalents of the reference's per-region /
per-boundary pixel traversals (code/util/mp.hxx parfor loops): data lives in
flat value arrays with segment ids, and statistics are segment reductions
that XLA lowers to efficient scatter/one-hot-matmul code on TPU.

All shapes are static; ragged segments are handled by padding with an
out-of-range segment id (== num_segments), whose contributions fall into a
dropped overflow slot.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def segment_sum(values, seg_ids, num_segments):
    return jax.ops.segment_sum(values, seg_ids, num_segments=num_segments)


def segment_mean(values, seg_ids, num_segments, eps=0.0):
    s = segment_sum(values, seg_ids, num_segments)
    c = segment_sum(jnp.ones_like(values), seg_ids, num_segments)
    return s / jnp.maximum(c, 1.0), c


def segment_min(values, seg_ids, num_segments):
    return jax.ops.segment_min(values, seg_ids, num_segments=num_segments)


def segment_max(values, seg_ids, num_segments):
    return jax.ops.segment_max(values, seg_ids, num_segments=num_segments)


def segment_stats(values, seg_ids, num_segments):
    """(count, sum, sumsq, min, max) in one pass."""
    ones = jnp.ones_like(values)
    cnt = segment_sum(ones, seg_ids, num_segments)
    s = segment_sum(values, seg_ids, num_segments)
    ss = segment_sum(values * values, seg_ids, num_segments)
    mn = segment_min(values, seg_ids, num_segments)
    mx = segment_max(values, seg_ids, num_segments)
    ok = cnt > 0
    mn = jnp.where(ok, mn, 0.0)
    mx = jnp.where(ok, mx, 0.0)
    return cnt, s, ss, mn, mx


def segment_histogram(values, seg_ids, num_segments, n_bins,
                      lo=0.0, hi=1.0):
    """Per-segment histogram with the reference's binning semantics
    (see features/hierarchical._hist_bin_index).

    Implemented as one-hot matmul-friendly scatter: XLA turns the
    segment_sum of one-hot rows into an MXU-shaped contraction for large
    inputs.
    """
    interval = (hi - lo) / n_bins
    b = jnp.floor(values / interval).astype(jnp.int32)
    b = jnp.clip(b, 0, n_bins - 1)
    inside = (values > lo) & (values < hi) & (values < interval * n_bins)
    b = jnp.where(inside, b, jnp.where(values <= lo, 0, n_bins - 1))
    dropped = (values > lo) & (values < hi) & ~(values < interval * n_bins)
    onehot = jax.nn.one_hot(b, n_bins, dtype=values.dtype)
    onehot = jnp.where(dropped[:, None], 0.0, onehot)
    return segment_sum(onehot, seg_ids, num_segments)


def segment_median_sorted(values_sorted_by_segment, seg_ptr):
    """Upper median per segment from segment-sorted values + CSR offsets.

    seg_ptr: [S+1].  Returns sorted[ptr + len//2] per segment -- exactly
    stats::amedian (code/util/stats.hxx:83-91).  Empty segments -> DUMMY -1.
    """
    lens = seg_ptr[1:] - seg_ptr[:-1]
    idx = seg_ptr[:-1] + lens // 2
    idx = jnp.clip(idx, 0, values_sorted_by_segment.shape[0] - 1)
    med = values_sorted_by_segment[idx]
    return jnp.where(lens > 0, med, -1.0)
