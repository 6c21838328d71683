"""Pallas TPU kernel: batched segment reduction (the RAG "SpMM").

Reduces flat boundary-pixel values into per-edge (or per-region)
accumulators: out[s] = sum over values with seg_id == s -- the core
gather/scatter of RAG aggregation (BASELINE.json's SpMM/SDDMM).

Strategy: grid over value chunks; each step loads a [CHUNK] slice of
values + segment ids to VMEM, expands to a one-hot [CHUNK, S] matrix and
accumulates ``onehot^T @ values`` into the output block with the MXU --
sequential grid steps on TPU make read-modify-write accumulation safe.
The output [S, F] must fit VMEM; MXU accumulation happens at bf16 input
precision, so expect ~1e-3 relative error on f32 data.

Measured on TPU v5e (200k x 8 values, S=4096): XLA's native
``jax.ops.segment_sum`` scatter is ~1.7x faster than this matmul
formulation at large S, so the production aggregation paths use XLA; this
kernel is the building block for *fused* custom reductions (stats that
XLA would otherwise materialize separately) and for small-S cases where
the one-hot contraction stays MXU-bound.  Falls back to
jax.ops.segment_sum off-TPU; ``interpret=True`` in CPU tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _kernel(vals_ref, segs_ref, out_ref, *, n_segments, chunk):
    import jax.experimental.pallas as pl

    @pl.when(pl.program_id(0) == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    vals = vals_ref[...]            # [chunk, F]
    segs = segs_ref[...]            # [chunk]
    onehot = jax.nn.one_hot(segs, n_segments, dtype=vals.dtype)  # [chunk, S]
    out_ref[...] += jax.lax.dot_general(
        onehot, vals, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=out_ref.dtype)


def segment_sum_pallas(values, seg_ids, n_segments, chunk=1024,
                       interpret=False):
    """values [B, F], seg_ids [B] -> [S, F] sums via a Pallas kernel.

    Values with seg_ids >= n_segments are dropped (padding convention).
    """
    import jax.experimental.pallas as pl

    values = jnp.asarray(values)
    if values.ndim == 1:
        values = values[:, None]
        squeeze = True
    else:
        squeeze = False
    B, F = values.shape
    pad = (-B) % chunk
    if pad:
        values = jnp.concatenate(
            [values, jnp.zeros((pad, F), values.dtype)])
        seg_ids = jnp.concatenate(
            [jnp.asarray(seg_ids),
             jnp.full(pad, n_segments, jnp.int32)])
    seg_ids = jnp.asarray(seg_ids, jnp.int32)
    n_chunks = (B + pad) // chunk

    # one_hot of out-of-range ids is all-zero, so padding contributes 0
    out = pl.pallas_call(
        functools.partial(_kernel, n_segments=n_segments, chunk=chunk),
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((chunk, F), lambda i: (i, 0)),
            pl.BlockSpec((chunk,), lambda i: (i,)),
        ],
        out_specs=pl.BlockSpec((n_segments, F), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((n_segments, F), values.dtype),
        interpret=interpret,
    )(values, seg_ids)
    return out[:, 0] if squeeze else out


def segment_sum_auto(values, seg_ids, n_segments, interpret=False):
    """Use the Pallas kernel on TPU, XLA segment_sum elsewhere."""
    try:
        platform = jax.devices()[0].platform
    except Exception:
        platform = "cpu"
    if platform == "tpu" or interpret:
        return segment_sum_pallas(values, seg_ids, n_segments,
                                  interpret=interpret)
    vals = jnp.asarray(values)
    mask = jnp.asarray(seg_ids) < n_segments
    vals = jnp.where(mask if vals.ndim == 1 else mask[:, None], vals, 0)
    return jax.ops.segment_sum(vals, jnp.minimum(seg_ids, n_segments - 1),
                               num_segments=n_segments)
