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


def _ref_stats_hist(data, n_bins, rng):
    """Literal transcription of stats::hist (reference stats.hxx:94-142)."""
    lo, hi = rng
    hc = np.zeros(n_bins)
    if len(data) == 0:
        return hc
    interval = (hi - lo) / n_bins
    bounds = [interval * (i + 1) for i in range(n_bins)]
    for x in data:
        if lo < x < hi:
            for i, b in enumerate(bounds):
                if x < b:
                    hc[i] += 1
                    break
        elif x <= lo:
            hc[0] += 1
        else:
            hc[n_bins - 1] += 1
    return hc / len(data)


def test_label_image_stats_matches_reference_main():
    """label_image_stats == brute-force transcription of
    main_label_image_stats.cxx:6-37 (BG excluded, stats::hist quirks)."""
    from glia_tpu.tools import label_image_stats

    rng = np.random.default_rng(3)
    lab = rng.integers(0, 9, (40, 50)).astype(np.int32)  # incl. BG=0
    st = label_image_stats(lab)
    sizes = np.bincount(lab.ravel())
    labels = [k for k in range(len(sizes)) if sizes[k] > 0 and k != 0]
    assert st["unique_labels"] == len(labels)
    assert st["min_size"] == min(sizes[k] for k in labels)
    assert st["max_size"] == max(sizes[k] for k in labels)
    want = _ref_stats_hist([float(sizes[k]) for k in labels], 20,
                           (0.0, 40 * 50 / 10.0))
    np.testing.assert_allclose(st["size_hist"], want)


def _img_with_regions(sizes_over_threshold, side=32, thr=10):
    """Label image with a given number of regions larger than thr px."""
    img = np.zeros((side, side), np.int32)
    lab = 1
    for i in range(sizes_over_threshold):
        r = (i * 5) % (side - 4)
        img[r:r + 4, 0:4] = lab  # 16 px > thr
        lab += 1
    img[side - 2, side - 2] = lab  # one tiny region
    return img


def test_distribute_label_images_semantics():
    """distribute_label_images == main_distribute_label_images.cxx live
    path: cascading-threshold sort, keep-first/last, duplicate-last."""
    from glia_tpu.tools import distribute_label_images

    imgs = [_img_with_regions(3), _img_with_regions(1),
            _img_with_regions(5), _img_with_regions(2)]
    # equal counts: ascending by #regions > threshold
    idx = distribute_label_images(imgs, 4, 10)
    assert idx == [1, 3, 0, 2]
    # n_input > n_output: keep best-first and best-last, middle in order
    idx = distribute_label_images(imgs, 3, 10)
    assert idx[0] == 1 and idx[-1] == 2
    assert idx[1] == 3  # first middle entry in sort order
    # n_input < n_output: keep all, duplicate the last (most regions)
    idx = distribute_label_images(imgs, 6, 10)
    assert idx[:4] == [1, 3, 0, 2] and idx[4:] == [2, 2]


def test_resample_rgb_linear_exact_on_ramp():
    """Per-channel linear resample reproduces a linear ramp exactly --
    the artifact equivalence behind the resample_rgb_image substitute
    (main_resample_rgb_image.cxx uses ITK linear interpolation)."""
    from glia_tpu.ops.image import resample_image

    H, W = 20, 30
    y, x = np.mgrid[0:H, 0:W].astype(np.float64)
    rgb = np.stack([x, y, x + y], axis=-1)
    out = np.stack([resample_image(rgb[..., c], 2.0, order=1)
                    for c in range(3)], axis=-1)
    Ho, Wo = out.shape[:2]
    yo, xo = np.mgrid[0:Ho, 0:Wo].astype(np.float64)
    # ndi.zoom maps output coords to input as i*(H-1)/(Ho-1)
    ys = yo * (H - 1) / (Ho - 1)
    xs = xo * (W - 1) / (Wo - 1)
    np.testing.assert_allclose(out[..., 0], xs, atol=1e-9)
    np.testing.assert_allclose(out[..., 1], ys, atol=1e-9)
    np.testing.assert_allclose(out[..., 2], xs + ys, atol=1e-9)
