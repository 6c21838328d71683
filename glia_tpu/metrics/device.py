"""On-device (jittable) VI / Rand metrics.

For eval-in-the-training-loop on TPU: labels are densified to [0, S) /
[0, T) ids on the host once, then the contingency matrix and scores
compute under jit with segment sums.

Numerics note: these use correct float math (no integer-division quirk)
and float accumulation of pair counts -- exact to ~2^53 on CPU (x64) and
approximate in f32 on TPU.  The canonical exact metrics remain the host
big-int implementations (metrics/vi.py, metrics/rand.py).
"""

from __future__ import annotations

import numpy as np


def densify_labels(arr, exclude=()):
    """Host: labels -> dense ids [0, n); excluded labels -> -1.

    Returns (ids int32, n)."""
    arr = np.asarray(arr)
    uniq = np.unique(arr)
    uniq = uniq[~np.isin(uniq, list(exclude))] if exclude else uniq
    lut = np.full(int(arr.max()) + 2, -1, dtype=np.int32)
    lut[uniq] = np.arange(len(uniq), dtype=np.int32)
    return lut[arr], len(uniq)


def contingency_device(seg_ids, truth_ids, S, T):
    """[S, T] float counts; pixels with either id < 0 are dropped."""
    import jax
    import jax.numpy as jnp

    dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    seg_ids = jnp.asarray(seg_ids).ravel()
    truth_ids = jnp.asarray(truth_ids).ravel()
    keep = (seg_ids >= 0) & (truth_ids >= 0)
    code = jnp.where(keep, seg_ids * T + truth_ids, S * T)
    flat = jax.ops.segment_sum(
        keep.astype(dtype), code, num_segments=S * T + 1)
    return flat[: S * T].reshape(S, T)


def vi_device(seg_ids, truth_ids, S, T):
    """(false_split, false_merge, total) = H(seg|truth), H(truth|seg)."""
    import jax.numpy as jnp

    c = contingency_device(seg_ids, truth_ids, S, T)
    n = c.sum()
    ps = c.sum(axis=1)
    pt = c.sum(axis=0)

    def _h(joint, marg):
        # sum c * log2(marg/c) / n over nonzero cells
        safe_c = jnp.maximum(joint, 1e-30)
        ratio = jnp.where(joint > 0, marg / safe_c, 1.0)
        return (joint * jnp.log2(ratio)).sum() / jnp.maximum(n, 1.0)

    fs = _h(c, pt[None, :])   # H(seg | truth)
    fm = _h(c, ps[:, None])   # H(truth | seg)
    return fs, fm, fs + fm


def vi_from_pairs_device(seg_ids, truth_ids, counts, S, T,
                         itk_quirk=True):
    """eval_vi printer math from a SPARSE exact contingency table, under
    jit (segment sums; no dense [S, T] materialization -- usable at
    SNEMI scale where S is millions).

    (seg_ids, truth_ids, counts): the K non-empty cells (exclusions --
    truth BG, masks -- applied by the caller, as in metrics.vi.eval_vi).
    itk_quirk reproduces the reference's unsigned-integer division
    (image_stats.hxx:152) exactly: counts are integers and f64 holds
    them exactly to 2^53.  Returns (false_split, false_merge, total).
    """
    import jax
    import jax.numpy as jnp

    c = jnp.asarray(counts, jnp.float64 if jax.config.jax_enable_x64
                    else jnp.float32)
    seg_ids = jnp.asarray(seg_ids)
    truth_ids = jnp.asarray(truth_ids)
    n = c.sum()
    row = jax.ops.segment_sum(c, seg_ids, num_segments=S)
    col = jax.ops.segment_sum(c, truth_ids, num_segments=T)

    def _centropy(c0):
        # H(image1 | image0) where c0 = per-cell image0-marginal counts
        if itk_quirk:
            ratio = jnp.floor(c0 / jnp.maximum(c, 1.0))
        else:
            ratio = c0 / jnp.maximum(c, 1.0)
        return (c * jnp.log2(jnp.maximum(ratio, 1e-300))).sum() \
            / jnp.maximum(n, 1.0)

    fs = _centropy(col[truth_ids])   # centropy(truth, seg)
    fm = _centropy(row[seg_ids])     # centropy(seg, truth)
    return fs, fm, fs + fm


def adapted_rand_from_pairs_device(seg_ids, truth_ids, counts, S, T):
    """(precision, recall, error) from a SPARSE contingency table under
    jit.  Caveat vs the host big-int path (metrics.rand): pair counts
    accumulate in f64, exact only below 2^53 pairs (~9e15; a 105M-voxel
    volume has ~5.5e15 total pairs, inside the bound)."""
    import jax
    import jax.numpy as jnp

    c = jnp.asarray(counts, jnp.float64 if jax.config.jax_enable_x64
                    else jnp.float32)
    seg_ids = jnp.asarray(seg_ids)
    truth_ids = jnp.asarray(truth_ids)

    def c2(x):
        return x * (x - 1.0) / 2.0

    tp = c2(c).sum()
    row = jax.ops.segment_sum(c, seg_ids, num_segments=S)
    col = jax.ops.segment_sum(c, truth_ids, num_segments=T)
    pairs_seg = c2(row).sum()      # tp + fp
    pairs_truth = c2(col).sum()    # tp + fn
    prec = tp / jnp.maximum(pairs_seg, 1.0)
    rec = tp / jnp.maximum(pairs_truth, 1.0)
    f = 2.0 * prec * rec / jnp.maximum(prec + rec, 1e-30)
    return prec, rec, 1.0 - f


def adapted_rand_device(seg_ids, truth_ids, S, T):
    """(precision, recall, error) from float pair counts."""
    import jax.numpy as jnp

    c = contingency_device(seg_ids, truth_ids, S, T)
    n = c.sum()

    def c2(x):
        return x * (x - 1.0) / 2.0

    tp = c2(c).sum()
    pairs0 = c2(c.sum(axis=1)).sum()
    pairs1 = c2(c.sum(axis=0)).sum()
    prec = tp / jnp.maximum(pairs0, 1.0)
    rec = tp / jnp.maximum(pairs1, 1.0)
    f = 2.0 * prec * rec / jnp.maximum(prec + rec, 1e-30)
    return prec, rec, 1.0 - f
