"""bc_label tests vs direct per-merge pixel-set computation."""

import numpy as np
import pytest

from glia_tpu.data.synthetic import synthetic_em_slice
from glia_tpu.features.labels import (
    BC_LABEL_MERGE,
    BC_LABEL_SPLIT,
    bc_labels,
    node_truth_counts,
)
from glia_tpu.graph.merge import greedy_merge_order
from glia_tpu.graph.rag import build_rag
from glia_tpu.metrics.rand import pair_f1_from_pairs
from glia_tpu.metrics.contingency import pair_stats_from_counts
from glia_tpu.native import watershed_native


@pytest.fixture(scope="module")
def case():
    import scipy.ndimage as ndi

    data = synthetic_em_slice(shape=(48, 48), n_cells=8, seed=21)
    # pre-blur like the real pipeline so the watershed has no 1-px
    # fragments (which would fall outside the merge tree)
    seg = watershed_native(ndi.gaussian_filter(data["pb"], 1.0), level=0.02)
    rag = build_rag(seg, contour_only=False)
    order, _ = greedy_merge_order(rag, data["pb"], policy="median")
    return data, seg, order


def brute_f1_label(seg, truth, order, mi):
    """Recompute the F1 rule from raw pixel sets for merge mi."""
    from glia_tpu.graph.merge import apply_merge_order

    # leaf sets of r0 and r1 at merge mi: pixels currently labeled with any
    # base key under them -- replay merges up to mi
    partial = apply_merge_order(seg, order, threshold_index=mi)
    r0, r1, r2 = order[mi]
    truth = truth.ravel()
    m0 = partial.ravel() == r0
    m1 = partial.ravel() == r1
    keep0 = m0 & (truth != 0)
    keep1 = m1 & (truth != 0)

    def rows_stats(masks):
        rows = []
        for m in masks:
            tv, c = np.unique(truth[m], return_counts=True)
            rows.append(dict(zip(tv.tolist(), c.tolist())))
        all_t = sorted({t for r in rows for t in r})
        mat = [[r.get(t, 0) for t in all_t] for r in rows]
        # build flat (seg,truth,count) lists
        s, t, c = [], [], []
        for i, row in enumerate(mat):
            for j, cc in enumerate(row):
                if cc:
                    s.append(i)
                    t.append(all_t[j])
                    c.append(cc)
        return pair_stats_from_counts(np.array(s), np.array(t), np.array(c))

    split = rows_stats([keep0, keep1])
    merge = rows_stats([keep0 | keep1])
    fs, _, _ = pair_f1_from_pairs(*split)
    fm, _, _ = pair_f1_from_pairs(*merge)
    return BC_LABEL_MERGE if fm > fs else BC_LABEL_SPLIT


def test_f1_labels_match_bruteforce(case):
    data, seg, order = case
    labels, ms, ss = bc_labels(seg, data["truth"], order, rule="f1")
    for mi in range(min(len(order), 15)):
        want = brute_f1_label(seg, data["truth"], order, mi)
        assert labels[mi] == want, f"merge {mi}"


def test_labels_sensible_on_synthetic(case):
    # early merges (inside true cells) should lean MERGE; the last merge
    # (whole image) should be SPLIT
    data, seg, order = case
    labels, _, _ = bc_labels(seg, data["truth"], order, rule="f1")
    assert labels[-1] == BC_LABEL_SPLIT
    # oversegmented start: a sizable share of merges are true merges
    assert (labels == BC_LABEL_MERGE).mean() > 0.3


@pytest.mark.parametrize("rule", ["vi", "ri"])
def test_other_rules_run(case, rule):
    data, seg, order = case
    labels, ms, ss = bc_labels(seg, data["truth"], order, rule=rule)
    assert set(np.unique(labels)).issubset({-1, 1})
    assert labels[-1] == BC_LABEL_SPLIT


@pytest.mark.parametrize("rule", ["f1", "vi", "ri"])
@pytest.mark.parametrize("tweak", [False, True])
def test_vectorized_matches_loop(case, rule, tweak):
    from glia_tpu.features.labels import bc_labels_loop

    if tweak and rule != "f1":
        pytest.skip("tweak applies to f1 only")
    data, seg, order = case
    lv, mv, sv = bc_labels(seg, data["truth"], order, rule=rule,
                           tweak=tweak)
    ll, ml, sl = bc_labels_loop(seg, data["truth"], order, rule=rule,
                                tweak=tweak)
    np.testing.assert_array_equal(lv, ll)
    np.testing.assert_allclose(mv, ml, rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(sv, sl, rtol=1e-9, atol=1e-12)


def test_node_truth_counts_consistency(case):
    data, seg, order = case
    tree, sizes, counts, tv = node_truth_counts(seg, data["truth"], order)
    # root size = whole image; root counts = non-BG truth histogram
    assert sizes[tree.root] == seg.size
    truth = data["truth"].ravel()
    want = [(truth == t).sum() for t in tv]
    np.testing.assert_array_equal(counts[tree.root], want)
