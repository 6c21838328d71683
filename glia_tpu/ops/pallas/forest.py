"""Pallas TPU kernel: random-forest lock-step evaluation.

The XLA formulation of the forest walk (models/forest.py) is gather-bound:
every level issues dynamic gathers of [B, T] indices into HBM-resident
node tables, and TPU dynamic-gather throughput (~1e8 rows/s) makes a
120-tree x 10k-sample call cost ~1s -- it dominates the classifier-in-
the-loop merge superstep (the framework's real hot path).

This kernel removes the gathers entirely:

  - grid = (sample blocks, trees); each instance walks ONE tree for ONE
    block of samples with the tree's node table resident in VMEM;
  - the per-level "gather" of (feature, threshold, left, right, leaf)
    rows becomes ``one_hot(node) @ table`` -- an MXU matmul against the
    [N_pad, 8] packed table (node counts are padded to 128 lanes);
  - the per-sample feature-value lookup X[b, f[b]] becomes a one-hot
    masked row reduction over the VMEM-resident X block (VPU);
  - votes accumulate into the output block across the tree-major grid
    dimension (sequential on TPU, so read-modify-write is safe).

Semantics match ml::rf::Model::predict / classForest exactly (vote
fraction per class, descend left iff x[bestvar] <= split;
reference: code/ml/rf/rf.hxx:362-372, ml_rf_model.cxx classForest).
"""

from __future__ import annotations

import numpy as np


def _pack_tables(model, n_pad):
    """[T, N_pad, 128] f32 (lane-padded): feature, threshold, left,
    right, leaf_class in slots 0-4."""
    T, N = model.feature.shape
    tab = np.zeros((T, n_pad, 128), np.float32)
    tab[:, :N, 0] = model.feature.astype(np.float32)
    tab[:, :N, 1] = model.threshold.astype(np.float32)
    tab[:, :N, 2] = model.left.astype(np.float32)
    tab[:, :N, 3] = model.right.astype(np.float32)
    tab[:, :N, 4] = model.leaf_class.astype(np.float32)
    tab[:, N:, 0] = -1.0  # padding nodes behave as leaves (class 0 unused:
    tab[:, N:, 4] = 0.0   # the walk never reaches them)
    return tab


def make_forest_votes_pallas(model, block_b=256, interpret=False):
    """Build fn(X [B, D]) -> vote fractions [B, C] running as one Pallas
    kernel.  B is padded to block_b internally; D is padded to 128 lanes.
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    T = model.n_trees
    C = model.n_classes
    depth = int(model.max_depth)
    N = model.feature.shape[1]
    n_pad = max(128, ((N + 127) // 128) * 128)
    d_model = None  # resolved at call time
    tab_np = _pack_tables(model, n_pad)
    c_pad = max(128, ((C + 127) // 128) * 128)

    def kernel(x_ref, tab_ref, out_ref):
        t = pl.program_id(1)
        x = x_ref[:]                      # [Bb, D_pad]
        tab = tab_ref[0]                  # [N_pad, 128]
        Bb = x.shape[0]
        D_pad = x.shape[1]

        node = jnp.zeros((Bb,), jnp.int32)
        node_iota = jax.lax.broadcasted_iota(jnp.int32, (Bb, n_pad), 1)
        feat_iota = jax.lax.broadcasted_iota(jnp.int32, (Bb, D_pad), 1)

        # Row extraction is a one-hot masked VPU reduction, NOT an MXU
        # matmul: the MXU truncates f32 operands to bf16 passes, which
        # corrupts child indices (>256 is not bf16-exact) and perturbs
        # split thresholds -- exact equality in "x <= split" matters for
        # classForest parity.  The masked sum is exact in f32 and also
        # ~25x less arithmetic than a 128-lane matmul.
        def sel(oh, col):
            return jnp.where(oh, tab[:, col][None, :], 0.0).sum(axis=1)

        for _ in range(depth + 1):
            oh = node_iota == node[:, None]
            f = sel(oh, 0)
            thr = sel(oh, 1)
            l = sel(oh, 2)
            r = sel(oh, 3)
            fsel = jnp.maximum(f, 0.0).astype(jnp.int32)
            ohf = (feat_iota == fsel[:, None]).astype(jnp.float32)
            fv = (ohf * x).sum(axis=1)
            nxt = jnp.where(fv <= thr, l, r).astype(jnp.int32)
            node = jnp.where(f < 0, node, nxt)

        oh = node_iota == node[:, None]
        cls = sel(oh, 4).astype(jnp.int32)
        cls_iota = jax.lax.broadcasted_iota(jnp.int32, (Bb, c_pad), 1)
        votes = (cls_iota == cls[:, None]).astype(jnp.float32)

        @pl.when(t == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        out_ref[:] += votes

    def predict(X):
        X = jnp.asarray(X, jnp.float32)
        B, D = X.shape
        d_pad = max(128, ((D + 127) // 128) * 128)
        b_pad = ((B + block_b - 1) // block_b) * block_b
        Xp = jnp.zeros((b_pad, d_pad), jnp.float32)
        Xp = Xp.at[:B, :D].set(X)
        n_blocks = b_pad // block_b
        out = pl.pallas_call(
            kernel,
            grid=(n_blocks, T),
            in_specs=[
                pl.BlockSpec((block_b, d_pad), lambda i, t: (i, 0)),
                pl.BlockSpec((1, n_pad, 128), lambda i, t: (t, 0, 0)),
            ],
            out_specs=pl.BlockSpec((block_b, c_pad), lambda i, t: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((b_pad, c_pad), jnp.float32),
            interpret=interpret,
        )(Xp, jnp.asarray(tab_np))
        return out[:B, :C] / T

    return jax.jit(predict)
