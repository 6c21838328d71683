"""Learned end-to-end HMT pipeline: train on some slices, segment others.

This is the full reference workflow (watershed -> pre_merge ->
merge_order_pb -> bc_feat/bc_label -> train_rf -> merge probs ->
segment_greedy/ccm -> eval_vi/eval_ri) as one in-memory pipeline.
"""

import numpy as np
import pytest

from glia_tpu.data.synthetic import synthetic_em_slice
from glia_tpu.pipeline import evaluate, hmt_segment, hmt_train, pre_merge, watershed


@pytest.fixture(scope="module")
def model_and_test_slice():
    train_slices = [synthetic_em_slice((96, 96), n_cells=16, seed=s)
                    for s in (1, 2)]
    test = synthetic_em_slice((96, 96), n_cells=16, seed=99)
    model = hmt_train(train_slices, n_trees=60, pre_merge_size=20,
                      watershed_level=0.06)
    return model, test


def test_pre_merge_removes_small_regions():
    from glia_tpu.graph.rag import build_rag

    import scipy.ndimage as ndi

    data = synthetic_em_slice((64, 64), n_cells=10, seed=4)
    seg = watershed(ndi.gaussian_filter(data["pb"], 1.0), 0.02)
    merged = pre_merge(seg, data["pb"], (30,))
    uniq, counts = np.unique(merged, return_counts=True)
    assert len(uniq) < len(np.unique(seg))
    # every small survivor must be one the boundary table could never
    # merge: a fragment with no *mutual* boundary in the original RAG
    # (first-differing-neighbor stealing; boundary_table.hxx:99-103) --
    # the reference's pre_merge leaves exactly these too.
    rag = build_rag(seg, contour_only=False)
    mutual = set(rag.edges.ravel().tolist())
    survivors_small = uniq[counts < 30]
    original_keys = set(rag.keys.tolist())
    for k in survivors_small:
        if int(k) in original_keys:
            # an unmerged small survivor must have had no mutual edge
            assert int(k) not in mutual
        # merged-but-still-small survivors ran out of table entries --
        # possible when their only mutual edges were to each other
    assert (counts < 30).sum() < 0.2 * len(uniq)


@pytest.mark.parametrize("thresholds", [(30,), (20, 120)])
def test_pre_merge_native_matches_python(thresholds):
    """The C++ pre_merge engine (glia_greedy_merge_premerge) must produce
    the identical segmentation as the Python fcond oracle engine,
    including the two-threshold mean-pb admission rule
    (gadget/main_pre_merge.cxx:27-77)."""
    import scipy.ndimage as ndi

    for seed in (4, 9):
        data = synthetic_em_slice((96, 96), n_cells=14, seed=seed)
        seg = watershed(ndi.gaussian_filter(data["pb"], 1.0), 0.02)
        a = pre_merge(seg, data["pb"], thresholds, engine="native")
        b = pre_merge(seg, data["pb"], thresholds, engine="py")
        assert np.array_equal(a, b)


@pytest.mark.parametrize("mode", ["greedy", "ccm"])
def test_learned_segmentation_beats_watershed(model_and_test_slice, mode):
    model, test = model_and_test_slice
    seg, aux = hmt_segment(test["pb"], test["intensity"], model,
                           watershed_level=0.06, pre_merge_size=20,
                           mode=mode)
    base = evaluate(aux["seg0"], test["truth"])
    ours = evaluate(seg, test["truth"])
    assert ours["vi"] < base["vi"]
    assert ours["rand_error"] < base["rand_error"]
    assert ours["rand_error"] < 0.25


def test_probs_are_probabilities(model_and_test_slice):
    model, test = model_and_test_slice
    _, aux = hmt_segment(test["pb"], test["intensity"], model,
                         watershed_level=0.06, pre_merge_size=20)
    assert ((aux["probs"] >= 0) & (aux["probs"] <= 1)).all()


@pytest.mark.parametrize("classifier", ["rf_ensemble", "mlp"])
def test_other_classifiers(classifier):
    train_slices = [synthetic_em_slice((64, 64), n_cells=10, seed=s)
                    for s in (5, 6)]
    test = synthetic_em_slice((64, 64), n_cells=10, seed=55)
    model = hmt_train(train_slices, n_trees=30, pre_merge_size=15,
                      watershed_level=0.05, classifier=classifier)
    seg, aux = hmt_segment(test["pb"], test["intensity"], model,
                           watershed_level=0.05, pre_merge_size=15)
    base = evaluate(aux["seg0"], test["truth"])
    ours = evaluate(seg, test["truth"])
    assert ours["vi"] < base["vi"]


def test_sshmt_pipeline_sparse_labels():
    from glia_tpu.pipeline import hmt_train_sshmt

    labeled = [synthetic_em_slice((64, 64), n_cells=10, seed=8)]
    unlabeled = [synthetic_em_slice((64, 64), n_cells=10, seed=9)]
    test = synthetic_em_slice((64, 64), n_cells=10, seed=88)
    model = hmt_train_sshmt(labeled, unlabeled, watershed_level=0.05,
                            pre_merge_size=15, label_fraction=0.4,
                            n_sigma_update=3, inner_steps=120)
    seg, aux = hmt_segment(test["pb"], test["intensity"], model,
                           watershed_level=0.05, pre_merge_size=15)
    base = evaluate(aux["seg0"], test["truth"])
    ours = evaluate(seg, test["truth"])
    assert ours["vi"] < base["vi"]
    assert len(model.extra["history"]) == 3
