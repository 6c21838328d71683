"""Metric parity tests against brute-force oracles.

The reference ships no tests; its metric binaries are the oracles
(SURVEY.md section 4).  Here every metric is checked against an independent
O(n^2)-style brute-force implementation on small random label images, which
pins the exact semantics (exclusion rules, integer-division quirk, pair
formulas) the reference binaries implement.
"""

import itertools
import math

import numpy as np
import pytest

from glia_tpu.metrics import (
    centropy,
    contingency_table,
    eval_ri,
    eval_vi,
    pair_stats,
    vi_image,
)


def brute_pair_stats(seg, truth, exclude_truth=(0,)):
    """O(n^2) pixel-pair counting, the definition the reference implements."""
    seg = seg.ravel()
    truth = truth.ravel()
    keep = ~np.isin(truth, list(exclude_truth))
    seg, truth = seg[keep], truth[keep]
    tp = tn = fp = fn = 0
    n = len(seg)
    for i in range(n):
        for j in range(i + 1, n):
            same_s = seg[i] == seg[j]
            same_t = truth[i] == truth[j]
            if same_s and same_t:
                tp += 1
            elif same_s and not same_t:
                fp += 1
            elif not same_s and same_t:
                fn += 1
            else:
                tn += 1
    return tp, tn, fp, fn


def brute_centropy(im0, im1, excluded0=(), excluded1=(), itk_quirk=True):
    im0, im1 = im0.ravel(), im1.ravel()
    keep = ~np.isin(im0, list(excluded0)) & ~np.isin(im1, list(excluded1))
    im0, im1 = im0[keep], im1[keep]
    n = len(im0)
    pairs = {}
    singles = {}
    for a, b in zip(im0, im1):
        pairs[(a, b)] = pairs.get((a, b), 0) + 1
        singles[a] = singles.get(a, 0) + 1
    ret = 0.0
    for (a, b), c in pairs.items():
        ratio = singles[a] // c if itk_quirk else singles[a] / c
        ret += c * math.log2(ratio)
    return ret / n


@pytest.fixture
def random_labels(rng):
    seg = rng.integers(0, 6, size=(12, 13)).astype(np.int32)
    truth = rng.integers(0, 5, size=(12, 13)).astype(np.int32)
    return seg, truth


def test_contingency_counts(random_labels):
    seg, truth = random_labels
    s, t, c = contingency_table(seg, truth)
    assert int(c.sum()) == seg.size
    # spot-check one cell
    s0, t0 = int(s[0]), int(t[0])
    assert int(c[0]) == int(np.sum((seg == s0) & (truth == t0)))


def test_pair_stats_vs_bruteforce(random_labels):
    seg, truth = random_labels
    got = pair_stats(seg, truth, exclude_truth=(0,))
    want = brute_pair_stats(seg, truth, exclude_truth=(0,))
    assert got == want


def test_pair_stats_mask(random_labels):
    seg, truth = random_labels
    mask = (np.arange(seg.size).reshape(seg.shape) % 3 != 0).astype(np.int32)
    got = pair_stats(seg, truth, mask=mask, exclude_truth=())
    want = brute_pair_stats(seg[mask != 0], truth[mask != 0], exclude_truth=())
    assert got == want


@pytest.mark.parametrize("quirk", [True, False])
def test_centropy_vs_bruteforce(random_labels, quirk):
    seg, truth = random_labels
    got = centropy(truth, seg, excluded0=(0,), itk_quirk=quirk)
    want = brute_centropy(truth, seg, excluded0=(0,), itk_quirk=quirk)
    assert got == pytest.approx(want, rel=1e-12)


def test_vi_perfect_is_zero(random_labels):
    seg, _ = random_labels
    # identical segmentations => VI == 0 regardless of label names
    relabeled = seg + 100
    assert vi_image(seg, relabeled, itk_quirk=False) == pytest.approx(0.0)


def test_eval_vi_shapes(random_labels):
    seg, truth = random_labels
    fs, fm, tot = eval_vi(seg, truth)
    assert tot == pytest.approx(fs + fm)
    fs2, fm2, _ = eval_vi([seg, seg], [truth, truth])
    assert fs2 == pytest.approx(fs)
    assert fm2 == pytest.approx(fm)


def test_eval_ri_accumulates(random_labels):
    seg, truth = random_labels
    p1, r1, e1 = eval_ri(seg, truth)
    p2, r2, e2 = eval_ri([seg, seg], [truth, truth])
    # same image twice: counts double, score identical
    assert (p1, r1, e1) == pytest.approx((p2, r2, e2))
    assert 0.0 <= e1 <= 1.0


def test_eval_ri_perfect(random_labels):
    seg, truth = random_labels
    prec, rec, err = eval_ri(truth, truth)
    assert prec == pytest.approx(1.0)
    assert rec == pytest.approx(1.0)
    assert err == pytest.approx(0.0)


def test_bigint_no_overflow():
    # A flat image large enough that n*(n-1)/2 exceeds float64's exact range;
    # exact Python-int arithmetic must not lose precision (reference uses
    # Boost int512, code/type/big_num.hxx:10).
    n = 1 << 27
    seg = np.zeros(4, np.int32)  # tiny stand-in; test the formula path directly
    from glia_tpu.metrics.contingency import pair_stats_from_counts

    tp, tn, fp, fn = pair_stats_from_counts(
        np.array([1, 2]), np.array([1, 1]), np.array([n, n])
    )
    assert tp == 2 * (n * (n - 1) // 2)
    assert fn == n * n
    assert tn == 0 and fp == 0
    total = tp + tn + fp + fn
    assert total == (2 * n) * (2 * n - 1) // 2
