"""CCM (conditional model) tree inference: bottom-up DP + top-down picks.

Reference: code/hmt/tree_ccm.hxx and code/hmt/main_segment_ccm.cxx:29-51.
Node energies from merge probabilities p (one per internal node, merge
order): Em = -log p (FMAX if p ~ 0), Es = -log(1-p) (FMAX if p ~ 1);
leaves get Em = 0, Es = FMAX.  Saturating addition mirrors
stats::plusEqual (code/util/stats.hxx:9-17).
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

from ..constants import FEPS
from ..graph.tree import FMAX, MergeTree


def _plus_equal(a: float, b: float) -> float:
    """Saturating add (stats.hxx:9-17)."""
    if (a == FMAX and b >= 0.0) or (a >= 0.0 and b == FMAX):
        return FMAX
    if (a == -FMAX and b <= 0.0) or (a <= 0.0 and b == -FMAX):
        return -FMAX
    return a + b


def node_energies(tree: MergeTree, merge_probs) -> Tuple[np.ndarray, np.ndarray]:
    """Per-node (Em, Es) from merge probabilities (main_segment_ccm.cxx:39-51)."""
    p = np.asarray(merge_probs, dtype=np.float64)
    em = np.zeros(tree.n_nodes, dtype=np.float64)
    es = np.full(tree.n_nodes, FMAX, dtype=np.float64)
    internal = np.nonzero(~tree.is_leaf)[0]
    pi = p[: len(internal)]
    em[internal] = np.where(np.abs(pi) < FEPS, FMAX, -np.log(np.maximum(pi, 1e-300)))
    q = 1.0 - pi
    es[internal] = np.where(np.abs(q) < FEPS, FMAX, -np.log(np.maximum(q, 1e-300)))
    return em, es


def compute_energy_tuples(tree: MergeTree, em, es) -> Tuple[np.ndarray, np.ndarray]:
    """Bottom-up DP (tree_ccm.hxx:13-27).

    EM[i] = em[i] + sum_children EM[child]
    ES[i] = es[i] + sum_children min(EM[child], ES[child])
    Forward scan works: children precede parents in creation order.
    """
    EM = np.array(em, dtype=np.float64)
    ES = np.array(es, dtype=np.float64)
    for i in range(tree.n_nodes):
        for c in (int(tree.left[i]), int(tree.right[i])):
            if c >= 0:
                EM[i] = _plus_equal(EM[i], EM[c])
                ES[i] = _plus_equal(ES[i], min(EM[c], ES[c]))
    return EM, ES


def resolve_factor_tree(tree: MergeTree, EM, ES) -> List[int]:
    """Top-down picks (tree_ccm.hxx:31-47): BFS from root; pick node iff
    EM < ES else recurse into children."""
    picks = []
    queue = [tree.root]
    while queue:
        i = queue.pop(0)
        if EM[i] < ES[i]:
            picks.append(i)
        else:
            l, r = int(tree.left[i]), int(tree.right[i])
            if l >= 0:
                queue.append(l)
                queue.append(r)
    return picks


def segment_ccm_picks(tree: MergeTree, merge_probs) -> List[int]:
    em, es = node_energies(tree, merge_probs)
    EM, ES = compute_energy_tuples(tree, em, es)
    return resolve_factor_tree(tree, EM, ES)


def node_energy_positive(tree: MergeTree, i: int, EM, ES, em, es) -> float:
    """Best labeling energy with node i labeled as a segment
    (tree_ccm.hxx:62-83)."""
    ret = EM[i]
    prev = i
    j = int(tree.parent[i])
    while j >= 0:
        ret = _plus_equal(ret, es[j])
        for c in (int(tree.left[j]), int(tree.right[j])):
            if c != prev:
                ret = _plus_equal(ret, min(EM[c], ES[c]))
        prev = j
        j = int(tree.parent[j])
    return ret


def node_energy_negative(tree: MergeTree, i: int, EM, ES, em, es) -> float:
    """Best labeling energy with node i NOT a segment (tree_ccm.hxx:87-115)."""
    ret = es[i]
    queue = [int(tree.left[i]), int(tree.right[i])] if tree.left[i] >= 0 else []
    while queue:
        j = queue.pop(0)
        if EM[j] < ES[j]:
            ret = _plus_equal(ret, EM[j])
        else:
            if tree.left[j] >= 0:
                queue.append(int(tree.left[j]))
                queue.append(int(tree.right[j]))
    prev = i
    j = int(tree.parent[i])
    while j >= 0:
        ret = _plus_equal(ret, es[j])
        for c in (int(tree.left[j]), int(tree.right[j])):
            if c != prev:
                ret = _plus_equal(ret, min(EM[c], ES[c]))
        prev = j
        j = int(tree.parent[j])
    return ret
