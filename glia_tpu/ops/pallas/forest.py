"""Pallas TPU kernel: random-forest lock-step evaluation.

The XLA formulation of the forest walk (models/forest.py) is gather-bound:
every level issues dynamic gathers of [B, T] indices into HBM-resident
node tables, and TPU dynamic-gather throughput (~1e8 rows/s) makes a
120-tree x 10k-sample call cost ~1s -- it dominates the classifier-in-
the-loop merge superstep (the framework's real hot path).

This kernel removes the gathers AND keeps both the arithmetic and the
compile time small:

  - every tree is BFS-renumbered so that level ``l``'s nodes occupy a
    contiguous range, all levels padded to ONE width W (the widest level
    across trees, lane-aligned); the per-level "gather" of (feature,
    threshold, left, right, leaf, class) rows becomes a one-hot masked
    VPU reduction over W columns instead of over all padded nodes --
    typically 4-8x less arithmetic than the whole-table walk, since
    CART level widths are far below total node counts;
  - the level loop is a ``fori_loop`` with a dynamically sliced VMEM
    table block, so the kernel body is traced ONCE regardless of depth
    (a python-unrolled depth-33 body took >10 minutes of Mosaic compile;
    this form compiles in seconds);
  - a sample that reaches a leaf early records its class and goes
    inactive (masked out of later levels);
  - grid = (sample blocks, trees); each instance walks ONE tree for ONE
    block of samples with the tree's level-packed table resident in
    VMEM; votes accumulate into the output block across the tree-major
    grid dimension (sequential on TPU, so read-modify-write is safe).

Row extraction stays a masked VPU reduction, NOT an MXU matmul: the MXU
truncates f32 operands to bf16 passes, which corrupts child indices and
perturbs split thresholds -- exact equality in "x <= split" matters for
classForest parity.

Semantics match ml::rf::Model::predict / classForest exactly (vote
fraction per class, descend left iff x[bestvar] <= split;
reference: code/ml/rf/rf.hxx:362-372, ml_rf_model.cxx classForest).
"""

from __future__ import annotations

import numpy as np


def _round_up(x, m):
    return ((x + m - 1) // m) * m


# table column slots (lane-padded to 128)
_C_FEAT, _C_THR, _C_LEFT, _C_RIGHT, _C_LEAF, _C_CLS = 0, 1, 2, 3, 4, 5


def _level_pack(model):
    """BFS-renumber every tree so each level's nodes are contiguous and
    all levels share one padded width W.

    Returns (table [T, 8, L*W] f32, W, L): column-major so each of the 6
    used attribute rows is a [L*W] lane vector (the 8-row sublane dim
    satisfies the f32 (8, 128) tile minimum without the 21x padding a
    128-lane row layout would cost); within level ``l`` the LEFT/RIGHT
    rows hold the child's position within level ``l+1``.
    """
    T, N = model.feature.shape
    feature = model.feature
    left = model.left
    right = model.right
    leaf = feature < 0
    depth = int(model.max_depth)

    # per-node level via frontier propagation over [T, N]
    lvl = np.full((T, N), -1, np.int32)
    lvl[:, 0] = 0
    for l in range(depth):
        t_idx, n_idx = np.nonzero((lvl == l) & ~leaf)
        lvl[t_idx, left[t_idx, n_idx]] = l + 1
        lvl[t_idx, right[t_idx, n_idx]] = l + 1

    L = depth + 1
    # position of each node within its level (stable order by node index)
    pos = np.zeros((T, N), np.int64)
    width = 0
    for l in range(L):
        m = lvl == l
        pos[m] = (np.cumsum(m, axis=1) - 1)[m]
        if m.any():
            width = max(width, int(m.sum(axis=1).max()))
    W = max(128, _round_up(width, 128))

    tab = np.zeros((T, 8, L * W), np.float32)
    tab[:, _C_LEAF, :] = 1.0  # padding slots behave as leaves (never hit)
    t_idx, n_idx = np.nonzero(lvl >= 0)
    col = lvl[t_idx, n_idx].astype(np.int64) * W + pos[t_idx, n_idx]
    tab[t_idx, _C_FEAT, col] = np.maximum(
        feature[t_idx, n_idx], 0).astype(np.float32)
    tab[t_idx, _C_THR, col] = model.threshold[t_idx, n_idx]
    is_leaf = leaf[t_idx, n_idx]
    lc = left[t_idx, n_idx]
    rc = right[t_idx, n_idx]
    tab[t_idx, _C_LEFT, col] = np.where(
        is_leaf, 0, pos[t_idx, lc]).astype(np.float32)
    tab[t_idx, _C_RIGHT, col] = np.where(
        is_leaf, 0, pos[t_idx, rc]).astype(np.float32)
    tab[t_idx, _C_LEAF, col] = is_leaf.astype(np.float32)
    tab[t_idx, _C_CLS, col] = model.leaf_class[t_idx, n_idx]
    return tab, W, L


def forest_votes_pallas_fn(model, block_b=256, interpret=False):
    """Low-level builder: (fn(X [B, D], tab) -> vote fractions [B, C],
    tab_np).  The level-packed table is a CALL ARGUMENT, never a
    closed-over constant: a closed-over table gets inlined into the
    lowered module as a dense literal (hundreds of MB of MLIR at 255
    trees), which the remote TPU compile tunnel then ships and parses
    for minutes.  Callers embedding the classifier inside larger jitted
    programs (the device BC merge loop) must thread ``tab`` through as a
    program argument themselves.
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu  # noqa: F401

    T = model.n_trees
    C = model.n_classes
    tab_np, W, L = _level_pack(model)
    c_pad = max(128, _round_up(C, 128))

    def kernel(x_ref, tab_ref, out_ref):
        t = pl.program_id(1)
        x = x_ref[:]                      # [Bb, D_pad]
        Bb = x.shape[0]
        D_pad = x.shape[1]
        feat_iota = jax.lax.broadcasted_iota(jnp.int32, (Bb, D_pad), 1)
        lvl_iota = jax.lax.broadcasted_iota(jnp.int32, (Bb, W), 1)

        def level(l, carry):
            # done is int32: Mosaic cannot insert a minor dim on i1 masks
            rel, done, cls = carry
            tab = tab_ref[0, :, pl.ds(l * W, W)]        # [8, W]
            oh = (lvl_iota == rel[:, None]) & (done[:, None] == 0)

            def sel(col):
                return jnp.where(oh, tab[col, :][None, :], 0.0).sum(axis=1)

            f = sel(_C_FEAT).astype(jnp.int32)
            thr = sel(_C_THR)
            lrel = sel(_C_LEFT)
            rrel = sel(_C_RIGHT)
            leaf = (sel(_C_LEAF) > 0.5).astype(jnp.int32)
            leafcls = sel(_C_CLS).astype(jnp.int32)

            ohf = (feat_iota == f[:, None]).astype(jnp.float32)
            fv = (ohf * x).sum(axis=1)
            nxt = jnp.where(fv <= thr, lrel, rrel).astype(jnp.int32)

            newly = (done == 0) & (leaf == 1)
            cls = jnp.where(newly, leafcls, cls)
            done = jnp.maximum(done, leaf)
            rel = jnp.where(done == 1, 0, nxt)
            return rel, done, cls

        rel0 = jnp.zeros((Bb,), jnp.int32)
        done0 = jnp.zeros((Bb,), jnp.int32)
        cls0 = jnp.zeros((Bb,), jnp.int32)
        _, _, cls = jax.lax.fori_loop(0, L, level, (rel0, done0, cls0))

        cls_iota = jax.lax.broadcasted_iota(jnp.int32, (Bb, c_pad), 1)
        votes = (cls_iota == cls[:, None]).astype(jnp.float32)

        @pl.when(t == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        out_ref[:] += votes

    def votes_fn(X, tab):
        X = jnp.asarray(X, jnp.float32)
        B, D = X.shape
        d_pad = max(128, _round_up(D, 128))
        b_pad = _round_up(max(B, 1), block_b)
        Xp = jnp.zeros((b_pad, d_pad), jnp.float32)
        Xp = Xp.at[:B, :D].set(X)
        n_blocks = b_pad // block_b
        out = pl.pallas_call(
            kernel,
            grid=(n_blocks, T),
            in_specs=[
                pl.BlockSpec((block_b, d_pad), lambda i, t: (i, 0)),
                pl.BlockSpec((1, 8, L * W), lambda i, t: (t, 0, 0)),
            ],
            out_specs=pl.BlockSpec((block_b, c_pad), lambda i, t: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((b_pad, c_pad), jnp.float32),
            interpret=interpret,
        )(Xp, tab)
        return out[:B, :C] / T

    return votes_fn, tab_np


def make_forest_votes_pallas(model, block_b=256, interpret=False):
    """Build fn(X [B, D]) -> vote fractions [B, C] running as one Pallas
    kernel.  B is padded to block_b internally; D is padded to 128 lanes.
    """
    import jax

    votes_fn, tab_np = forest_votes_pallas_fn(model, block_b=block_b,
                                              interpret=interpret)
    tab_dev = jax.device_put(tab_np)
    jfn = jax.jit(votes_fn)
    return lambda X: jfn(X, tab_dev)


def make_forest_label_pallas(model, label=-1, block_b=256, interpret=False):
    """fn(X [B, D]) -> vote fraction of ``label`` [B] (Model::predict
    semantics, rf.hxx:362-372).  For embedding inside larger traced
    programs use ``forest_votes_pallas_fn`` and thread the table as an
    argument instead."""
    li = int(np.nonzero(model.classes == label)[0][0])
    votes = make_forest_votes_pallas(model, block_b=block_b,
                                     interpret=interpret)
    return lambda X: votes(X)[:, li]
