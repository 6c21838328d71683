"""Merge-vs-split training labels for the boundary classifier.

Reference: code/hmt/bc_label.hxx.  For every merge (r0, r1 -> r2) the truth
image decides whether merging improves the segmentation:

  - VI rule   (bc_label.hxx:17-39):  merge iff VI({r2}) <  VI({r0, r1})
  - F1 rule   (bc_label.hxx:44-85):  merge iff pairF1({r2}) > pairF1({r0,r1}),
    with the "tweak" special cases and a max-precision-drop guard
  - RI rule   (bc_label.hxx:89-122): merge iff RI({r2}) > RI({r0, r1})

Labels: MERGE = -1, SPLIT = +1, UNKNOWN = 0 (bc_label.hxx:9-14).

All rules need per-region truth-overlap counts; those compose up the merge
tree (disjoint unions), so one segment-count pass + one tree scan covers all
2N-1 regions -- no per-region pixel re-traversals.  Pair counts use exact
Python integers (reference uses BigInt, code/type/big_num.hxx).
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

from ..constants import BG_VAL, FEPS
from ..graph.tree import MergeTree, build_tree

BC_LABEL_UNKNOWN = 0
BC_LABEL_SPLIT = 1
BC_LABEL_MERGE = -1


def node_truth_counts(labels, truth, order, exclude_truth=(BG_VAL,)):
    """Per-tree-node truth-label histogram + full sizes.

    Returns (tree, node_sizes [M], counts [M, T] int64, truth_values [T]).
    counts excludes ``exclude_truth`` pixels; node_sizes does NOT (the
    region-set VI normalizer uses full sizes, image_stats.hxx:79).
    """
    labels = np.asarray(labels).ravel().astype(np.int64)
    truth = np.asarray(truth).ravel().astype(np.int64)
    tree = build_tree(order)
    key2node = {int(k): i for i, k in enumerate(tree.keys)}
    M = tree.n_nodes

    # leaf counts
    node_of_pixel = np.array([key2node.get(int(l), -1) for l in labels])
    sizes = np.zeros(M, dtype=np.int64)
    np.add.at(sizes, node_of_pixel[node_of_pixel >= 0],
              1)
    keep = node_of_pixel >= 0
    for v in exclude_truth:
        keep &= truth != v
    tv, tinv = np.unique(truth[keep], return_inverse=True)
    T = len(tv)
    counts = np.zeros((M, T), dtype=np.int64)
    np.add.at(counts, (node_of_pixel[keep], tinv), 1)

    # bottom-up accumulation
    for i in range(M):
        l, r = int(tree.left[i]), int(tree.right[i])
        if l >= 0:
            sizes[i] += sizes[l] + sizes[r]
            counts[i] += counts[l] + counts[r]
    return tree, sizes, counts, tv


def _pair_stats_rows(rows: List[np.ndarray]) -> Tuple[int, int, int, int]:
    """Exact TP/TN/FP/FN for a region set given truth-count rows
    (stats.hxx:189-229 semantics; each row is one region)."""

    def c2(x):
        return x * (x - 1) // 2

    n = 0
    tp = 0
    pairs0 = 0
    col = None
    for row in rows:
        row = [int(x) for x in row]
        s = sum(row)
        n += s
        pairs0 += c2(s)
        tp += sum(c2(x) for x in row)
        if col is None:
            col = row
        else:
            col = [a + b for a, b in zip(col, row)]
    pairs1 = sum(c2(x) for x in col) if col else 0
    npair = c2(n)
    tn = npair - pairs1 + tp - pairs0
    fp = pairs0 - tp
    fn = pairs1 - tp
    return tp, tn, fp, fn


def _prf(tp, tn, fp, fn):
    prec = tp / (tp + fp) if tp + fp else tp / FEPS if tp else 0.0
    rec = tp / (tp + fn) if tp + fn else tp / FEPS if tp else 0.0
    f = 2.0 * prec * rec / (prec + rec) if (prec + rec) else 0.0
    return f, prec, rec


def _ri(tp, tn, fp, fn):
    den = tp + tn + fp + fn
    return (tp + tn) / den if den else 0.0


def _vi_rows(rows: List[np.ndarray], n_point: int) -> float:
    """Region-set VI (image_stats.hxx:69-118): normalizer n_point includes
    excluded pixels."""
    if n_point == 0:
        return 0.0
    col: Dict[int, float] = {}
    tot = []
    for row in rows:
        tot.append(float(np.sum(row)))
        for t, c in enumerate(row):
            if c:
                col[t] = col.get(t, 0.0) + float(c)
    ret = 0.0
    for ri_, row in enumerate(rows):
        if tot[ri_] < FEPS:
            continue
        lr = np.log2(tot[ri_])
        for t, c in enumerate(row):
            c = float(c)
            if c >= FEPS and col[t] >= FEPS:
                ret += c * (np.log2(col[t]) + lr - 2.0 * np.log2(c))
    return ret / n_point


def bc_labels(labels, truth, order, rule="f1", tweak=False,
              max_prec_drop=1.0, exclude_truth=(BG_VAL,)):
    """Labels for every merge in ``order``: -1 merge / +1 split.

    rule: "vi" | "f1" | "ri"; ``tweak``/``max_prec_drop`` apply to "f1"
    (main_bc_label_ri.cxx uses the F1 rule with tweak).
    Returns (labels [n_merges] int, merge_scores, split_scores).
    """
    tree, sizes, counts, tv = node_truth_counts(
        labels, truth, order, exclude_truth)
    internal = np.nonzero(~tree.is_leaf)[0]
    n = len(internal)
    out = np.zeros(n, dtype=np.int64)
    mscore = np.zeros(n)
    sscore = np.zeros(n)
    for mi, ni in enumerate(internal):
        l, r = int(tree.left[ni]), int(tree.right[ni])
        split_rows = [counts[l], counts[r]]
        merge_rows = [counts[ni]]
        if rule == "vi":
            m = _vi_rows(merge_rows, int(sizes[ni]))
            s = _vi_rows(split_rows, int(sizes[l]) + int(sizes[r]))
            out[mi] = BC_LABEL_MERGE if m < s else BC_LABEL_SPLIT
        elif rule == "f1":
            stp = _pair_stats_rows(split_rows)
            mtp = _pair_stats_rows(merge_rows)
            s, sprec, srec = _prf(*stp)
            m, mprec, mrec = _prf(*mtp)
            if max_prec_drop < 1.0 and sprec - mprec > max_prec_drop:
                out[mi] = BC_LABEL_SPLIT
            elif tweak:
                out[mi] = BC_LABEL_MERGE if (
                    m > s
                    or (sprec < FEPS and srec < FEPS
                        and mprec < FEPS and mrec < FEPS)
                    or (s == m and sprec > 0.9 and mprec > 0.9)
                ) else BC_LABEL_SPLIT
            else:
                out[mi] = BC_LABEL_MERGE if m > s else BC_LABEL_SPLIT
        elif rule == "ri":
            s = _ri(*_pair_stats_rows(split_rows))
            m = _ri(*_pair_stats_rows(merge_rows))
            out[mi] = BC_LABEL_MERGE if m > s else BC_LABEL_SPLIT
        else:
            raise ValueError(rule)
        mscore[mi] = m
        sscore[mi] = s
    return out, mscore, sscore
