"""Sharded tree feature pipeline vs the host hierarchical oracle.

The north-star parity clause: per-level merge-tree activations (node stat
tables AND full-width BC feature rows + forest scores) must be allclose
between the 8-way sharded pipeline and the single-process host extractor.
"""

import numpy as np
import pytest

from glia_tpu.data.synthetic import synthetic_em_slice
from glia_tpu.features import FeatureConfig, TreeFeatures
from glia_tpu.graph import build_rag
from glia_tpu.graph.merge import greedy_merge_order
from glia_tpu.models.forest import make_label_scorer, train_forest
from glia_tpu.native import watershed_native
from glia_tpu.parallel.bc_tree_shard import TreeShardPlan, \
    sharded_level_features
from glia_tpu.parallel.mesh import make_mesh
from glia_tpu.parallel.partition import partition_rag


@pytest.fixture(scope="module")
def case():
    import scipy.ndimage as ndi

    data = synthetic_em_slice((96, 96), n_cells=18, seed=7)
    seg = watershed_native(ndi.gaussian_filter(data["pb"], 1.0), 0.01)
    rag = build_rag(seg, contour_only=False)
    cfg = FeatureConfig.standard(data["pb"], data["intensity"], n_bins=8)
    order, _ = greedy_merge_order(rag, data["pb"], policy="mean")
    host = TreeFeatures(rag, order, cfg, saliencies=None)
    part = partition_rag(rag, 8)
    plan = TreeShardPlan(rag, order, cfg, part)
    return rag, cfg, order, host, plan


def test_sharded_levels_match_host(case):
    rag, cfg, order, host, plan = case
    mesh = make_mesh(8)
    want = host.bc_features()

    # train a small forest on the host features so scores are non-trivial
    y = (want[:, 0] > np.median(want[:, 0])).astype(int) * 2 - 1
    model = train_forest(want, y, n_trees=16, seed=0)
    scorer, consts = make_label_scorer(model, label=-1, backend="xla",
                                       embed=True)
    from glia_tpu.models.forest import predict_votes_np

    li = int(np.nonzero(model.classes == -1)[0][0])

    levels = sorted(set(plan.merge_level.tolist()))
    checked_levels = 0
    checked_rows = 0
    for l in [levels[0], levels[len(levels) // 2], levels[-1]]:
        records, feats, scores, order_idx = sharded_level_features(
            mesh, plan, l, scorer=scorer, scorer_consts=consts)
        assert len(order_idx) == int((plan.merge_level == l).sum())
        np.testing.assert_allclose(feats, want[order_idx], rtol=1e-9,
                                   atol=1e-9)
        want_scores = predict_votes_np(model, want[order_idx])[:, li]
        np.testing.assert_allclose(scores, want_scores, atol=1e-6)
        # per-level node activations: area / one-sided boundary count /
        # bbox of every alive node vs the host accumulators
        ids = records["node_ids"]
        st = host.stats
        area = plan.leaf_add_pack.unpack(records["add"], "area")
        np.testing.assert_allclose(area, st.area[ids], rtol=1e-12)
        bd = plan.dp_add_pack.unpack(records["b_add"], "cnt")
        np.testing.assert_allclose(bd, st.bd[ids], rtol=1e-12)
        lo = plan.leaf_min_pack.unpack(records["min"], "bbox_lo")
        np.testing.assert_allclose(lo, st.bbox_lo[ids], rtol=1e-12)
        checked_levels += 1
        checked_rows += len(order_idx)
    assert checked_levels == 3 and checked_rows >= 3


def test_sharded_levels_median_per_image_bins(case):
    """Widest host-accepted config through the sharded path: exact device
    medians + per-image hist bins/ranges."""
    from glia_tpu.features.config import HistImage

    rag, cfg0, order, _, _ = case
    pb = np.asarray(cfg0.pb_image)
    inten = np.asarray(cfg0.r_images[1].image)
    q = lambda a, k: np.round(a * k) / k
    cfg = FeatureConfig(
        pb_image=pb,
        r_images=[HistImage(q(pb, 32), 6, (0.0, 1.0), "pb"),
                  HistImage(q(inten, 24), 10, (0.0, 1.0), "in")],
        rl_images=[],
        b_images=[HistImage(q(inten, 24), 9, (0.0, 1.0), "in")],
        boundary_thresholds=[0.3, 0.6],
        normalizing_area=4.0, normalizing_length=2.0,
        histogram_as_feats=True, median_as_feats=True,
    )
    from glia_tpu.features import TreeFeatures
    from glia_tpu.parallel.partition import partition_rag

    host = TreeFeatures(rag, order, cfg, saliencies=None)
    want = host.bc_features()
    part = partition_rag(rag, 8)
    plan = TreeShardPlan(rag, order, cfg, part)
    mesh = make_mesh(8)
    levels = sorted(set(plan.merge_level.tolist()))
    for l in [levels[0], levels[-1]]:
        _, feats, _, order_idx = sharded_level_features(mesh, plan, l)
        np.testing.assert_allclose(feats, want[order_idx], rtol=1e-9,
                                   atol=1e-9)
