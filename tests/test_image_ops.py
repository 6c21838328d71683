"""Image op tests."""

import numpy as np
import pytest

from glia_tpu.ops.image import (
    accumulate_images,
    blur_image,
    boundary_image_2d,
    crop_image,
    dilate_background,
    image_patches,
    max_pool_image,
    overlay_image,
    resample_image,
    stack_images,
    threshold_image,
)


def test_threshold():
    im = np.array([[0.1, 0.5, 0.9]])
    out = threshold_image(im, 0.3, 0.7, 1, 0)
    assert out.tolist() == [[0, 1, 0]]


def test_max_pool_odd_sizes():
    im = np.arange(15).reshape(3, 5).astype(np.float32)
    out = max_pool_image(im)
    assert out.shape == (2, 3)
    assert out[0, 0] == 6  # max of [[0,1],[5,6]]
    assert out[1, 2] == 14


def test_max_pool_skip_dim():
    im = np.arange(12).reshape(3, 4).astype(np.float32)
    out = max_pool_image(im, skip_dims=(0,))
    assert out.shape == (3, 2)


def test_dilate_background_fills_with_smallest():
    lab = np.zeros((5, 5), dtype=np.int32)
    lab[0, 0] = 1          # tiny region (1 px)
    lab[:, 4] = 2          # big region (5 px)
    out = dilate_background(lab)
    assert (out != 0).all()
    # pixel adjacent to both should prefer the smaller region (label 1)
    assert out[0, 1] == 1


def test_boundary_image_2d():
    lab = np.array([[1, 2], [1, 2]], dtype=np.int32)
    out = boundary_image_2d(lab)
    assert out.shape == (4, 4)
    assert out[0, 1] == 1  # vertical boundary between columns
    assert out[0, 0] == 0


def test_accumulate():
    a = np.ones((2, 2))
    out = accumulate_images([a, 3 * a], average=True)
    np.testing.assert_allclose(out, 2 * a)


def test_patches_and_stack():
    im = np.arange(16).reshape(4, 4)
    p = image_patches(im, (2, 2), (2, 2))
    assert p.shape == (4, 2, 2)
    vol = stack_images([im, im])
    assert vol.shape == (2, 4, 4)


def test_crop_resample_blur_overlay():
    im = np.random.default_rng(0).random((8, 8)).astype(np.float32)
    assert crop_image(im, (2, 2), (4, 4)).shape == (4, 4)
    assert resample_image(im, 0.5).shape == (4, 4)
    assert blur_image(im, 1.0).shape == im.shape
    lab = (im > 0.5).astype(np.int32)
    assert overlay_image(im, lab).shape == (8, 8, 3)


def test_skeletonize_rectangle_to_line():
    from glia_tpu.ops.image import skeletonize_image

    img = np.zeros((20, 40), np.uint8)
    img[8:13, 5:35] = 1  # 5-wide horizontal bar
    sk = skeletonize_image(img)
    # skeleton is a subset of the foreground and ~1px wide
    assert set(zip(*np.nonzero(sk))) <= set(zip(*np.nonzero(img)))
    assert (sk.sum(axis=0)[8:32] <= 1).all()
    assert sk.sum() >= 20  # a line survives


def test_skeletonize_preserves_connectivity():
    import scipy.ndimage as ndi

    from glia_tpu.ops.image import skeletonize_image

    rng = np.random.default_rng(5)
    img = np.zeros((48, 48), np.uint8)
    # one connected blob: union of overlapping rectangles
    r, c = 10, 10
    for _ in range(6):
        dr, dc = rng.integers(-6, 7, 2)
        r = int(np.clip(r + dr, 4, 36))
        c = int(np.clip(c + dc, 4, 36))
        img[r:r + 8, c:c + 8] = 1
    n_before = ndi.label(img, structure=np.ones((3, 3)))[1]
    sk = skeletonize_image(img)
    n_after = ndi.label(sk, structure=np.ones((3, 3)))[1]
    assert n_before == n_after == 1
    assert sk.sum() < img.sum()


def test_skeletonize_idempotent_on_thin_line():
    from glia_tpu.ops.image import skeletonize_image

    img = np.zeros((10, 30), np.uint8)
    img[5, 2:28] = 1
    sk = skeletonize_image(img)
    np.testing.assert_array_equal(sk, img)
