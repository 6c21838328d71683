"""3D HMT: the whole stack (watershed/RAG/merge/features/labels/segment)
must work on volumes -- dimension is a runtime property (the reference
needs a GLIA_3D recompile, glia_base.hxx:49-53)."""

import numpy as np
import pytest

from glia_tpu.data.synthetic import synthetic_em_stack
from glia_tpu.features.config import FeatureConfig
from glia_tpu.features.hierarchical import TreeFeatures
from glia_tpu.features.labels import bc_labels
from glia_tpu.graph.merge import greedy_merge_order
from glia_tpu.graph.rag import build_rag
from glia_tpu.graph.tree import build_tree, node_potentials
from glia_tpu.infer.greedy import resolve_tree_greedy
from glia_tpu.infer.segment import final_segmentation
from glia_tpu.metrics import eval_vi
from glia_tpu.native import greedy_merge_native, watershed_native


@pytest.fixture(scope="module")
def volume():
    stack = synthetic_em_stack(shape=(6, 40, 40), n_cells=10, seed=9)
    truth = stack["truth3d"]
    pb = np.stack([s["pb"] for s in stack["slices"]])
    return truth, pb


def test_3d_watershed_and_rag(volume):
    truth, pb = volume
    seg = watershed_native(pb, level=0.1)
    assert seg.shape == pb.shape
    assert (seg > 0).all()
    rag = build_rag(seg, contour_only=False)
    assert rag.n_edges > 0
    # 6-connectivity: boundary pixels from z-neighbors exist
    assert rag.n_regions > 10


def test_3d_merge_parity(volume):
    truth, pb = volume
    seg = watershed_native(pb, level=0.1)
    rag = build_rag(seg, contour_only=False)
    o1, s1 = greedy_merge_order(rag, pb, policy="median")
    o2, s2 = greedy_merge_native(rag, pb, policy="median")
    np.testing.assert_array_equal(o1, o2)
    np.testing.assert_allclose(s1, s2)


def test_3d_features_and_segment(volume):
    truth, pb = volume
    seg = watershed_native(pb, level=0.1)
    rag = build_rag(seg, contour_only=False)
    order, sals = greedy_merge_native(rag, pb, policy="median")
    cfg = FeatureConfig.standard(pb, n_bins=8)
    tf = TreeFeatures(rag, order, cfg, saliencies=sals)
    feats = tf.bc_features()
    assert feats.shape[0] == len(order)
    assert feats.shape[1] == cfg.boundary_feat_dim() \
        + 3 * cfg.region_feat_dim(ndim=3)
    assert np.isfinite(feats).all()
    labels, _, _ = bc_labels(seg, truth, order, rule="f1")
    assert labels[-1] == 1  # whole-volume merge must be split
    # supervoxel oracle segmentation: use labels as perfect probs
    probs = np.where(labels < 0, 0.9, 0.1)
    tree = build_tree(order)
    pot = node_potentials(tree, probs)
    picks = resolve_tree_greedy(tree, pot)
    seg3 = final_segmentation(seg, tree, picks)
    _, _, vi_after = eval_vi(seg3, truth)
    _, _, vi_before = eval_vi(seg, truth)
    assert vi_after < vi_before
