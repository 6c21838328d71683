"""End-to-end 2D HMT slice: watershed -> RAG -> greedy merge -> tree ->
resolve -> segmentation -> metrics.  The SURVEY.md section 7 step-3 milestone.
"""

import numpy as np
import pytest

from glia_tpu.data.synthetic import synthetic_em_slice
from glia_tpu.graph.merge import apply_merge_order
from glia_tpu.graph.rag import build_rag
from glia_tpu.graph.tree import build_tree, node_potentials
from glia_tpu.infer.greedy import resolve_tree_greedy
from glia_tpu.infer.segment import final_segmentation
from glia_tpu.metrics import eval_ri, eval_vi
from glia_tpu.native import greedy_merge_native, watershed_native


@pytest.fixture(scope="module")
def pipeline_artifacts():
    data = synthetic_em_slice(shape=(128, 128), n_cells=25, seed=42)
    seg0 = watershed_native(data["pb"], level=0.08)
    rag = build_rag(seg0, contour_only=False)
    order, sals = greedy_merge_native(rag, data["pb"], policy="median")
    return data, seg0, rag, order, sals


def test_watershed_oversegments(pipeline_artifacts):
    data, seg0, rag, order, sals = pipeline_artifacts
    assert rag.n_regions > 25  # oversegmentation vs 25 true cells
    assert len(order) == rag.n_regions - len(np.unique(
        apply_merge_order(seg0, order)))  # merges reduce region count 1:1


def test_merge_tree_improves_vi(pipeline_artifacts):
    data, seg0, rag, order, sals = pipeline_artifacts
    tree = build_tree(order)
    # pseudo merge probabilities from recorded saliencies: saliency = -median
    # pb, so weak boundaries (low pb) -> high merge probability.
    stat = -np.asarray(sals)  # median pb per merge
    probs = 1.0 - np.clip(stat, 0, 1)
    pot = node_potentials(tree, probs)
    picks = resolve_tree_greedy(tree, pot)
    seg = final_segmentation(seg0, tree, picks)
    _, _, vi0 = eval_vi(seg0, data["truth"])
    _, _, vi1 = eval_vi(seg, data["truth"])
    assert vi1 < vi0  # merging must improve over raw watershed
    # and the adapted Rand error should be low on easy synthetic data
    _, _, err = eval_ri(seg, data["truth"])
    assert err < 0.35


def test_threshold_segmentation_matches_tree_route(pipeline_artifacts):
    data, seg0, rag, order, sals = pipeline_artifacts
    # merging everything gives one region
    seg_all = apply_merge_order(seg0, order)
    assert len(np.unique(seg_all)) == (rag.n_regions - len(order))
