"""Native C++ runtime tests: merge parity vs Python engine, watershed sanity."""

import numpy as np
import pytest

from glia_tpu.graph.merge import greedy_merge_order
from glia_tpu.graph.rag import build_rag
from glia_tpu.native import (
    connected_components_native,
    greedy_merge_native,
    watershed_native,
)


@pytest.fixture(scope="module")
def case():
    rng = np.random.default_rng(7)
    lab = np.repeat(
        np.repeat(np.arange(1, 26).reshape(5, 5), 4, axis=0), 4, axis=1
    ).astype(np.int32)
    pb = rng.random(lab.shape).astype(np.float64)
    return lab, pb


@pytest.mark.parametrize("policy", ["median", "mean", "median_minsize"])
def test_native_matches_python(case, policy):
    lab, pb = case
    rag = build_rag(lab, contour_only=False)
    o_py, s_py = greedy_merge_order(rag, pb, policy=policy)
    o_cc, s_cc = greedy_merge_native(rag, pb, policy=policy)
    np.testing.assert_array_equal(o_py, o_cc)
    np.testing.assert_allclose(s_py, s_cc, rtol=1e-12)


def test_watershed_two_basins():
    # two clear minima separated by a ridge
    x = np.linspace(-1, 1, 32)
    xx, yy = np.meshgrid(x, x)
    img = (np.abs(xx) - 0.5) ** 2 + 0.1 * yy**2  # minima at x=+-0.5
    seg = watershed_native(img.astype(np.float32), level=0.0)
    labs = np.unique(seg)
    assert (labs >= 1).all()
    assert len(labs) == 2
    # left half and right half differ
    assert seg[16, 4] != seg[16, 28]


def test_watershed_level_merges_shallow_minima():
    rng = np.random.default_rng(3)
    img = rng.random((48, 48)).astype(np.float32)
    seg0 = watershed_native(img, level=0.0)
    seg1 = watershed_native(img, level=0.5)
    assert len(np.unique(seg1)) < len(np.unique(seg0))
    # full coverage, labels start at 1
    assert seg0.min() >= 1 and seg1.min() >= 1


def test_watershed_labels_every_pixel():
    rng = np.random.default_rng(5)
    img = rng.random((20, 30)).astype(np.float32)
    seg = watershed_native(img, 0.1)
    assert (seg > 0).all()


def test_connected_components():
    lab = np.array(
        [
            [1, 1, 0, 1],
            [0, 1, 0, 1],
            [1, 1, 0, 1],
        ],
        dtype=np.int32,
    )
    cc = connected_components_native(lab)
    # left "C" of 1s is one component; right column of 1s another; the 0s
    # form components too (label value is irrelevant, equality is)
    assert cc[0, 0] == cc[2, 0] == cc[1, 1]
    assert cc[0, 3] == cc[2, 3]
    assert cc[0, 0] != cc[0, 3]
    assert cc[0, 2] != cc[1, 0]  # 0-pixels: separate components


def test_connected_components_3d():
    lab = np.zeros((3, 4, 4), dtype=np.int32)
    lab[0, 0, 0] = 1
    lab[2, 3, 3] = 1
    cc = connected_components_native(lab)
    assert cc[0, 0, 0] != cc[2, 3, 3]
    n = len(np.unique(cc))
    assert n == 3  # background + two isolated voxels
