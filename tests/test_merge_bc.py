"""Classifier-in-the-loop merge engine tests.

Two independent consistency checks:
  1. with a classifier that scores 1 - mean(pair pb), the produced order
     must equal the plain pooled-mean policy engine's order;
  2. candidate feature vectors produced by the dynamic engine during replay
     must match the (already oracle-verified) hierarchical TreeFeatures
     rows for the same merges.
"""

import numpy as np
import pytest

from glia_tpu.data.synthetic import synthetic_em_slice
from glia_tpu.features.config import FeatureConfig
from glia_tpu.features.hierarchical import TreeFeatures
from glia_tpu.graph.merge import greedy_merge_order
from glia_tpu.graph.merge_bc import DynamicRagState, greedy_merge_bc
from glia_tpu.graph.rag import build_rag
from glia_tpu.native import watershed_native


@pytest.fixture(scope="module")
def case():
    data = synthetic_em_slice(shape=(48, 48), n_cells=10, seed=11)
    seg = watershed_native(data["pb"], level=0.12)
    rag = build_rag(seg, contour_only=False)
    cfg = FeatureConfig.standard(data["pb"], data["intensity"], n_bins=8)
    return data, seg, rag, cfg


def pair_mean_col(cfg):
    nT = len(cfg.boundary_thresholds)
    return (11 + 4 * nT + 7 * len(cfg.r_images) + 3 * len(cfg.rl_images)
            + 1)  # mean inside first b_image block [entropy, mean, ...]


def test_bc_mean_classifier_matches_mean_policy(rng):
    # NOTE: equivalence requires all boundaries mutual.  The table-driven
    # mean policy pools only mutual pair data (boundary_table entries),
    # while the BC feature path's pair boundary (getBoundary semantics)
    # also sees non-mutual one-sided entries.  A block grid has perfectly
    # mutual boundaries, so there the two engines must agree exactly.
    lab = np.repeat(
        np.repeat(np.arange(1, 17).reshape(4, 4), 5, axis=0), 5, axis=1
    ).astype(np.int32)
    pb = rng.random(lab.shape)
    rag = build_rag(lab, contour_only=False)
    cfg = FeatureConfig.standard(pb, n_bins=8)
    col = pair_mean_col(cfg)
    order_bc, sals_bc = greedy_merge_bc(
        rag, cfg, predict=lambda f: -f[col])
    order_mean, sals_mean = greedy_merge_order(rag, pb, policy="mean")
    np.testing.assert_array_equal(order_bc, order_mean)
    np.testing.assert_allclose(sals_bc, sals_mean, rtol=1e-9)


def test_candidate_features_match_tree_features(case):
    data, seg, rag, cfg = case
    order, _ = greedy_merge_order(rag, data["pb"], policy="median")
    tf = TreeFeatures(rag, order, cfg, saliencies=None)
    bc_rows = tf.bc_features()

    state = DynamicRagState(rag, cfg)
    for mi, (r0, r1, r2) in enumerate(order):
        got = state.candidate_features(int(r0), int(r1))
        np.testing.assert_allclose(
            got, bc_rows[mi], rtol=1e-9, atol=1e-12,
            err_msg=f"merge {mi} ({r0},{r1})->{r2}")
        state.merge(int(r0), int(r1), int(r2))


def test_bc_merge_count(case):
    data, seg, rag, cfg = case
    order, sals = greedy_merge_bc(rag, cfg, predict=lambda f: 0.5)
    assert len(order) == rag.n_regions - 1 or len(order) > 0
    assert ((sals >= 0) & (sals <= 1)).all()


def test_batched_predict_matches_sequential(case):
    data, seg, rag, cfg = case
    col = pair_mean_col(cfg)
    o1, s1 = greedy_merge_bc(rag, cfg, predict=lambda f: -f[col])
    o2, s2 = greedy_merge_bc(rag, cfg, predict=lambda f: -f[col],
                             predict_batch=lambda F: -F[:, col])
    np.testing.assert_array_equal(o1, o2)
    np.testing.assert_allclose(s1, s2, rtol=1e-12)


def test_candidate_features_match_tree_features_median(case):
    """median_as_feats (GLIA_HMT_MEDIAN_FEAT) through the dynamic engine:
    candidate rows must still match the hierarchical extractor, whose
    exact medians are themselves oracle-verified (tests/test_features)."""
    data, seg, rag, _ = case
    cfg = FeatureConfig.standard(data["pb"], data["intensity"], n_bins=8)
    cfg.median_as_feats = True
    order, _ = greedy_merge_order(rag, data["pb"], policy="median")
    tf = TreeFeatures(rag, order, cfg, saliencies=None)
    bc_rows = tf.bc_features()

    state = DynamicRagState(rag, cfg)
    for mi, (r0, r1, r2) in enumerate(order):
        got = state.candidate_features(int(r0), int(r1))
        np.testing.assert_allclose(
            got, bc_rows[mi], rtol=1e-9, atol=1e-12,
            err_msg=f"merge {mi} ({r0},{r1})->{r2}")
        state.merge(int(r0), int(r1), int(r2))


def test_native_bc_engine_matches_python_oracle():
    """VERDICT r5 item #2: the C++ classifier-in-the-loop engine
    (glia_bc.cc) must reproduce the Python oracle BIT-FOR-BIT -- same
    order rows AND same probabilities (canonical accumulation order,
    numpy pairwise sums, heapq tie rule)."""
    import scipy.ndimage as ndi

    from glia_tpu.data.synthetic import synthetic_em_slice
    from glia_tpu.features import FeatureConfig, TreeFeatures, bc_labels
    from glia_tpu.graph.merge_bc import greedy_merge_bc
    from glia_tpu.graph.rag import build_rag
    from glia_tpu.models.forest import (predict_label_fraction,
                                        train_forest)
    from glia_tpu.native import (greedy_merge_bc_native,
                                 greedy_merge_native, watershed_native)

    tr = synthetic_em_slice((128, 128), n_cells=25, seed=1)
    seg_t = watershed_native(ndi.gaussian_filter(tr["pb"], 1.0),
                             level=0.004)
    rag_t = build_rag(seg_t, contour_only=False)
    cfg_t = FeatureConfig.standard(tr["pb"], tr["intensity"], n_bins=16)
    order_t, _ = greedy_merge_native(rag_t, tr["pb"], policy="median")
    X = TreeFeatures(rag_t, order_t, cfg_t, saliencies=None).bc_features()
    y = bc_labels(seg_t, tr["truth"], order_t, rule="f1")[0]
    model = train_forest(X, y, n_trees=30, seed=0)

    te = synthetic_em_slice((192, 192), n_cells=50, seed=5)
    seg0 = watershed_native(ndi.gaussian_filter(te["pb"], 1.0),
                            level=0.004)
    rag = build_rag(seg0, contour_only=False)
    cfg = FeatureConfig.standard(te["pb"], te["intensity"], n_bins=16)

    def predict_batch(F):
        return predict_label_fraction(model, F, label=-1)

    order_py, probs_py = greedy_merge_bc(
        rag, cfg, lambda f: float(predict_batch(f[None, :])[0]),
        predict_batch=predict_batch)
    order_n, probs_n = greedy_merge_bc_native(rag, cfg, model)
    assert len(order_n) == len(order_py)
    np.testing.assert_array_equal(order_n, order_py)
    np.testing.assert_array_equal(probs_n, probs_py)
