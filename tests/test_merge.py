"""Greedy merge engine tests.

The heap-based engine is validated against an independent brute-force
incremental implementation (no heap, no adjacency index: scan every live
edge each step) that transcribes the reference's update rule directly.
"""

import numpy as np
import pytest

from glia_tpu.graph.merge import (
    _upper_median,
    apply_merge_order,
    greedy_merge_order,
)
from glia_tpu.graph.rag import build_rag


def brute_force_merge(rag, pb, policy="median"):
    """Reference semantics, written independently: dict of edge pixel-value
    lists; each step pick min stat (ties: latest-created edge first),
    merge, splice neighbor data."""
    pb = pb.ravel().astype(np.float64)
    table = {}
    created = {}
    seq = 0
    for eid in range(rag.n_edges):
        u, v = (int(x) for x in rag.edges[eid])
        vals = list(pb[rag.edge_pixels[rag.edge_ptr[eid]:rag.edge_ptr[eid + 1]]])
        table[(u, v)] = vals
        created[(u, v)] = seq
        seq += 1

    def stat(vals):
        if policy == "median":
            return sorted(vals)[len(vals) // 2]
        return sum(vals) / len(vals) if vals else 0.0

    next_key = int(rag.keys.max()) + 1
    order, sals = [], []
    while table:
        best = None
        for key, vals in table.items():
            s = stat(vals)
            cand = (s, -created[key], key)
            if best is None or cand < best:
                best = cand
        s, _, (r0, r1) = best
        r2 = next_key
        next_key += 1
        order.append((r0, r1, r2))
        sals.append(-s)
        del table[(r0, r1)]
        neighbors = set()
        for (a, b) in list(table):
            if a in (r0, r1):
                neighbors.add(b)
            elif b in (r0, r1):
                neighbors.add(a)
        for rs in neighbors:
            merged = []
            for rr in (r0, r1):
                k = (min(rr, rs), max(rr, rs))
                if k in table:
                    merged += table.pop(k)
                    created.pop(k)
            table[(rs, r2)] = merged
            created[(rs, r2)] = seq
            seq += 1
    return np.array(order), np.array(sals)


@pytest.fixture
def random_case(rng):
    lab = np.repeat(
        np.repeat(np.arange(1, 17).reshape(4, 4), 3, axis=0), 3, axis=1
    ).astype(np.int32)
    pb = rng.random(lab.shape).astype(np.float64)
    return lab, pb


@pytest.mark.parametrize("policy", ["median", "mean"])
def test_engine_matches_bruteforce(random_case, policy):
    lab, pb = random_case
    rag = build_rag(lab)
    o1, s1 = greedy_merge_order(rag, pb, policy=policy)
    o2, s2 = brute_force_merge(rag, pb, policy=policy)
    np.testing.assert_array_equal(o1, o2)
    np.testing.assert_allclose(s1, s2, rtol=1e-12)


def test_merge_count(random_case):
    lab, pb = random_case
    rag = build_rag(lab)
    order, sals = greedy_merge_order(rag, pb)
    # connected 4x4 grid: exactly n-1 merges
    assert len(order) == rag.n_regions - 1
    assert len(sals) == len(order)
    # new keys increment from max+1
    assert order[0, 2] == rag.keys.max() + 1
    assert (np.diff(order[:, 2]) == 1).all()


def test_upper_median():
    assert _upper_median(np.array([3.0, 1.0, 2.0])) == 2.0
    # even count: upper median, NOT the average (stats.hxx:83-91)
    assert _upper_median(np.array([1.0, 2.0, 3.0, 4.0])) == 3.0
    assert _upper_median(np.array([])) == -1.0


def test_apply_merge_order_full(random_case):
    lab, pb = random_case
    rag = build_rag(lab)
    order, _ = greedy_merge_order(rag, pb)
    out = apply_merge_order(lab, order)
    # all merges applied -> single label
    assert len(np.unique(out)) == 1
    assert np.unique(out)[0] == order[-1, 2]


def test_apply_merge_order_partial(random_case):
    lab, pb = random_case
    rag = build_rag(lab)
    order, _ = greedy_merge_order(rag, pb)
    k = 5
    out = apply_merge_order(lab, order, threshold_index=k)
    assert len(np.unique(out)) == rag.n_regions - k


def test_median_minsize_runs(random_case):
    lab, pb = random_case
    rag = build_rag(lab, contour_only=False)
    order, sals = greedy_merge_order(rag, pb, policy="median_minsize")
    assert len(order) == rag.n_regions - 1
