"""LINK3D tests: pair generation, features, labels, linking, grouping."""

import numpy as np
import pytest

from glia_tpu.data.synthetic import synthetic_em_stack
from glia_tpu.features.adv_shape import adv_shape_2d, region_centroids
from glia_tpu.features.config import FeatureConfig
from glia_tpu.graph.rag import build_rag
from glia_tpu.link3d.link import (
    SC_LABEL_TRUE,
    gen_region_pairs,
    group_region_profiles,
    link_by_threshold,
    sc_features,
    sc_labels,
)
from glia_tpu.metrics import eval_ri


@pytest.fixture(scope="module")
def stack():
    return synthetic_em_stack(shape=(4, 48, 48), n_cells=8, seed=5)


def test_gen_region_pairs_overlap(stack):
    s0 = stack["slices"][0]["truth"]
    s1 = stack["slices"][1]["truth"]
    pairs, overlaps = gen_region_pairs(s0, s1, 0, 1)
    # every region should overlap its own continuation (3D-coherent cells)
    same = [(a[1], b[1]) for a, b in pairs if a[1] == b[1]]
    assert len(same) >= len(np.unique(s0)) * 0.5
    for (k0, k1) in list(overlaps)[:5]:
        assert ((s0 == k0) & (s1 == k1)).sum() == overlaps[(k0, k1)]


def test_adv_shape_square_vs_bar():
    lab = np.zeros((20, 30), dtype=np.int32)
    lab[2:12, 2:12] = 1    # square
    lab[14:16, 2:28] = 2   # elongated bar
    rag = build_rag(lab, contour_only=False)
    # region 0 (background block) + 1 + 2
    cents = region_centroids(lab, rag.keys, rag.region_ptr,
                             rag.region_pixels, rag.shape)
    f = adv_shape_2d(rag.shape, rag.keys, rag.region_ptr,
                     rag.region_pixels, cents)
    i_sq = list(rag.keys).index(1)
    i_bar = list(rag.keys).index(2)
    # eccentricity (last column): bar >> square
    assert f[i_bar, -1] > f[i_sq, -1] * 2
    # square central moments symmetric: m20 ~ m02
    assert f[i_sq, 4] == pytest.approx(f[i_sq, 0], rel=1e-6)


def test_sc_features_shapes(stack):
    s0 = stack["slices"][0]["truth"]
    s1 = stack["slices"][1]["truth"]
    cfg = FeatureConfig.standard(stack["slices"][0]["pb"],
                                 stack["slices"][0]["intensity"], n_bins=8)
    pairs, _ = gen_region_pairs(s0, s1, 0, 1)
    rows = sc_features(s0, s1, cfg, pairs)
    assert rows.shape[0] == len(pairs)
    assert np.isfinite(rows).all()
    # pair block (6+1+8+15) + image diffs + two region blocks
    d_pair = 30 + 7 * len(cfg.r_images) + 7 * len(cfg.rl_images)
    d_region = cfg.region_feat_dim(ndim=2, with_saliency=False) + 15
    assert rows.shape[1] == d_pair + 2 * d_region


def test_sc_labels_same_cell(stack):
    s0 = stack["slices"][0]["truth"]
    s1 = stack["slices"][1]["truth"]
    pairs, _ = gen_region_pairs(s0, s1, 0, 1)
    labels, tf1, ff1 = sc_labels(s0, s0, s1, s1, pairs)
    same = np.array([a[1] == b[1] for a, b in pairs])
    # identical truth used as both seg and truth: same-key pairs are TRUE
    assert (labels[same] == SC_LABEL_TRUE).all()
    acc = (labels[~same] == -1).mean() if (~same).any() else 1.0
    assert acc > 0.8


def test_link_by_threshold_force():
    pairs = [((0, 1), (1, 1)), ((0, 2), (1, 2)), ((0, 3), (1, 3))]
    scores = [0.9, 0.2, 0.1]
    links = link_by_threshold(pairs, scores, min_score=0.5, force_link=False)
    assert links == [((0, 1), (1, 1))]
    links = link_by_threshold(pairs, scores, min_score=0.5, force_link=True)
    # singletons forced to their best weak link
    assert ((0, 2), (1, 2)) in links and ((0, 3), (1, 3)) in links


def test_group_region_profiles_reconstructs_3d(stack):
    # perfect links (same truth label across slices) must reconstruct the
    # 3D truth volume up to relabeling
    slices = [s["truth"] for s in stack["slices"]]
    ids = list(range(len(slices)))
    links = []
    for z in range(len(slices) - 1):
        ks = set(np.unique(slices[z])) & set(np.unique(slices[z + 1]))
        links += [((z, int(k)), (z + 1, int(k))) for k in ks]
    vol = group_region_profiles(slices, ids, links)
    truth3d = np.stack(slices)
    prec, rec, err = eval_ri([vol[i] for i in range(len(slices))],
                             [truth3d[i] for i in range(len(slices))])
    assert err == pytest.approx(0.0, abs=1e-12)
    # grouping is cross-slice consistent: one global label per truth cell
    for k in np.unique(truth3d):
        labs = np.unique(vol[truth3d == k])
        assert len(labs) == 1
