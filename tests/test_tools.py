"""Tests for evaluation/matching/sample utilities."""

import numpy as np
import pytest

from glia_tpu.data.synthetic import synthetic_em_slice
from glia_tpu.tools import (
    distribute_samples,
    eval_init_seg,
    eval_ri_threshold,
    match_seg_to_truth,
    normalize_samples,
    remove_single_profile_regions,
    seg_stats,
    select_hard_samples,
    unique_samples,
)


def test_eval_init_seg_perfect():
    truth = np.array([[1, 1, 2], [1, 1, 2]], dtype=np.int32)
    seg = truth * 7  # same partition, different labels
    prec, rec, err, mapped = eval_init_seg(seg, truth)
    assert err == pytest.approx(0.0)
    np.testing.assert_array_equal(mapped, truth)


def test_eval_init_seg_oversegmented():
    truth = np.array([[1, 1, 1, 1]], dtype=np.int32)
    seg = np.array([[5, 5, 6, 6]], dtype=np.int32)
    prec, rec, err, mapped = eval_init_seg(seg, truth)
    # both regions map to truth 1 -> perfect after mapping
    assert err == pytest.approx(0.0)
    assert (mapped == 1).all()


def test_match_seg_to_truth():
    truth = np.array([[1, 1, 2, 2]], dtype=np.int32)
    seg = np.array([[7, 7, 7, 8]], dtype=np.int32)
    m = match_seg_to_truth(seg, truth)
    assert m[1] == (7, pytest.approx(2 / 3))
    assert m[2][0] in (7, 8)


def test_seg_stats():
    seg = np.array([[0, 1, 1], [2, 2, 2]], dtype=np.int32)
    st = seg_stats(seg)
    assert st == {1: 2, 2: 3}
    st = seg_stats(seg, include_bg=True)
    assert st[0] == 1


def test_normalize_samples_roundtrip():
    f1 = np.array([[0.0, 10.0], [1.0, 20.0]])
    f2 = np.array([[0.5, 15.0]])
    (r1, r2), mm = normalize_samples([f1, f2])
    assert r1.min() >= -1.0 - 1e-9 and r1.max() <= 1.0 + 1e-9
    # reuse minmax on new data
    (r3,), _ = normalize_samples([f1], minmax=mm)
    np.testing.assert_allclose(r3, r1)


def test_unique_and_distribute_and_hard():
    f = np.array([[1.0, 2.0], [1.0, 2.0], [3.0, 0.1]])
    l = np.array([1, 1, -1])
    fu, lu = unique_samples(f, l)
    assert len(fu) == 2
    groups = distribute_samples(f, l, 0, 1, 1.0)
    assert len(groups[0][0]) == 1  # f[dim1]<1 -> row [3.0, 0.1]
    fh, lh = select_hard_samples(
        f, l, preds=np.array([0.9, 0.1, 0.2]))
    # label +1 with pred>0.5 is hard; label -1 with pred<0.5 is hard
    assert len(fh) == 2


def test_eval_ri_threshold_runs():
    data = synthetic_em_slice((48, 48), n_cells=6, seed=2)
    rows = eval_ri_threshold(1.0 - data["pb"], data["truth"],
                             n_thresholds=4, use_watershed=True)
    assert len(rows) == 4
    for th, prec, rec, err in rows:
        assert 0 <= err <= 1


def test_remove_single_profile_regions():
    s0 = np.array([[1, 2]], dtype=np.int32)
    s1 = np.array([[1, 3]], dtype=np.int32)
    out = remove_single_profile_regions(
        [s0, s1], [0, 1], [((0, 1), (1, 1))])
    assert out[0].tolist() == [[1, 0]]
    assert out[1].tolist() == [[1, 0]]
