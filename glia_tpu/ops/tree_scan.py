"""Device-side merge-tree aggregation (bottom-up "tree SpMM").

The hierarchical feature pass needs, for every one of the 2N-1 tree nodes,
reductions over its leaf set (region stats) and over "dying" edge groups
(boundary stats).  Key structural fact: if leaves are laid out in DFS
order, every node's leaf set is one contiguous interval [lo, hi), so

  - additive stats for ALL nodes = two gathers into an exclusive prefix sum
    (O(N) work, perfectly vectorized -- no sequential tree walk at all);
  - min/max stats for ALL nodes = range-min/max queries answered with a
    log2(N)-level sparse table (pairwise mins), again pure gathers.

This is the TPU-native replacement for the reference's per-region pixel
re-traversals (code/hmt/main_bc_feat.cxx:59-69) and for the host scan in
features/hierarchical.py; parity is tested against the host oracle.
"""

from __future__ import annotations

import numpy as np

from ..graph.tree import MergeTree


def dfs_intervals(tree: MergeTree):
    """Host preprocessing: leaf DFS positions + per-node [lo, hi) intervals.

    Returns (leaf_pos [M] with -1 for internal, lo [M], hi [M],
    leaf_order [n_leaves] = node index of the leaf at each DFS slot).
    """
    M = tree.n_nodes
    lo = np.zeros(M, dtype=np.int64)
    hi = np.zeros(M, dtype=np.int64)
    leaf_pos = np.full(M, -1, dtype=np.int64)
    leaf_order = []
    # iterative DFS from every root (tree may be a forest with extra leaves)
    roots = [i for i in range(M) if tree.parent[i] < 0]
    counter = 0
    for root in roots:
        stack = [(root, False)]
        while stack:
            node, done = stack.pop()
            if done:
                hi[node] = counter
                continue
            if tree.left[node] < 0:
                lo[node] = counter
                leaf_pos[node] = counter
                leaf_order.append(node)
                counter += 1
                hi[node] = counter
            else:
                lo[node] = counter
                stack.append((node, True))
                stack.append((int(tree.right[node]), False))
                stack.append((int(tree.left[node]), False))
    return leaf_pos, lo, hi, np.asarray(leaf_order, dtype=np.int64)


def interval_sums(leaf_values, lo, hi):
    """Additive stats for all nodes: leaf_values [L, F] in DFS order ->
    [M, F] interval sums via exclusive prefix sum + two gathers."""
    import jax.numpy as jnp

    P = jnp.concatenate(
        [jnp.zeros((1,) + leaf_values.shape[1:], leaf_values.dtype),
         jnp.cumsum(leaf_values, axis=0)], axis=0)
    return P[hi] - P[lo]


def _sparse_table(values, combine):
    """log2 sparse table rows for range queries; values [L, F]."""
    import jax.numpy as jnp

    L = values.shape[0]
    tables = [values]
    k = 1
    while (1 << k) <= L:
        prev = tables[-1]
        half = 1 << (k - 1)
        nxt = combine(prev[: L - (1 << k) + 1], prev[half: L - half + 1])
        tables.append(nxt)
        k += 1
    return tables


def interval_reduce(leaf_values, lo, hi, kind="min"):
    """Range min/max for all nodes via sparse table (O(L log L) build,
    O(1) per query).  Empty intervals -> +inf/-inf."""
    import jax.numpy as jnp

    combine = jnp.minimum if kind == "min" else jnp.maximum
    tables = _sparse_table(jnp.asarray(leaf_values), combine)
    lo = jnp.asarray(lo)
    hi = jnp.asarray(hi)
    length = jnp.maximum(hi - lo, 1)
    k = jnp.floor(jnp.log2(length.astype(jnp.float32))).astype(jnp.int32)
    L = leaf_values.shape[0]
    # gather the k-th table rows at lo and hi - 2^k
    fill = jnp.inf if kind == "min" else -jnp.inf
    out = jnp.full((lo.shape[0],) + leaf_values.shape[1:], fill,
                   dtype=leaf_values.dtype)
    for ki, tab in enumerate(tables):
        sel = k == ki
        a = jnp.clip(lo, 0, tab.shape[0] - 1)
        b = jnp.clip(hi - (1 << ki), 0, tab.shape[0] - 1)
        cand = combine(tab[a], tab[b])
        out = jnp.where(sel[:, None] if cand.ndim > 1 else sel, cand, out)
    empty = hi <= lo
    out = jnp.where(empty[:, None] if out.ndim > 1 else empty, fill, out)
    return out


def node_region_stats_device(tree: MergeTree, leaf_stats):
    """All-node region stats from per-leaf stats.

    leaf_stats: dict with additive ("sum"-like, [n_leaves, F]) and
    reduce ("min"/"max", [n_leaves, F]) entries keyed by
    ("add", name) / ("min", name) / ("max", name), leaf rows indexed by
    tree LEAF NODE index order (tree.keys order restricted to leaves).

    Returns dict name -> [M, F] arrays over all nodes.
    """
    import jax.numpy as jnp

    leaf_pos, lo, hi, leaf_order = dfs_intervals(tree)
    # leaf_stats rows are indexed by leaf-node order of np.nonzero(is_leaf);
    # reorder to DFS slots
    leaf_nodes = np.nonzero(tree.is_leaf)[0]
    node_to_row = {int(n): i for i, n in enumerate(leaf_nodes)}
    perm = np.asarray([node_to_row[int(n)] for n in leaf_order])
    out = {}
    for (kind, name), vals in leaf_stats.items():
        vals = jnp.asarray(np.asarray(vals)[perm])
        if kind == "add":
            out[name] = interval_sums(vals, lo, hi)
        else:
            out[name] = interval_reduce(vals, lo, hi, kind)
    return out
