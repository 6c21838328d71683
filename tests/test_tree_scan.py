"""Device tree aggregation vs host hierarchical oracle."""

import numpy as np
import pytest

from glia_tpu.data.synthetic import synthetic_em_slice
from glia_tpu.features.config import FeatureConfig
from glia_tpu.features.hierarchical import TreeFeatures
from glia_tpu.graph.merge import greedy_merge_order
from glia_tpu.graph.rag import build_rag
from glia_tpu.graph.tree import build_tree
from glia_tpu.native import watershed_native
from glia_tpu.ops.tree_scan import (
    dfs_intervals,
    interval_reduce,
    interval_sums,
    node_region_stats_device,
)


@pytest.fixture(scope="module")
def case():
    data = synthetic_em_slice((48, 48), n_cells=8, seed=13)
    seg = watershed_native(data["pb"], 0.1)
    rag = build_rag(seg, contour_only=False)
    order, sals = greedy_merge_order(rag, data["pb"], policy="median")
    return data, seg, rag, order


def test_dfs_intervals_cover(case):
    data, seg, rag, order = case
    tree = build_tree(order)
    leaf_pos, lo, hi, leaf_order = dfs_intervals(tree)
    n_leaves = tree.n_leaves
    assert len(leaf_order) == n_leaves
    # root interval covers all leaves
    assert lo[tree.root] == 0 and hi[tree.root] == n_leaves
    # each node's interval length equals its leaf count
    for i in range(tree.n_nodes):
        assert hi[i] - lo[i] == len(tree.leaves_under(i))


def test_interval_sums_match_host(case):
    import jax.numpy as jnp

    data, seg, rag, order = case
    cfg = FeatureConfig.standard(data["pb"], n_bins=8)
    tf = TreeFeatures(rag, order, cfg)
    tree = tf.tree
    leaf_nodes = np.nonzero(tree.is_leaf)[0]
    st = tf.stats.r_stats[0]
    leaf_stats = {
        ("add", "sum"): st["sum"][leaf_nodes][:, None],
        ("add", "cnt"): st["cnt"][leaf_nodes][:, None],
        ("min", "min"): st["min"][leaf_nodes][:, None],
        ("max", "max"): st["max"][leaf_nodes][:, None],
    }
    out = node_region_stats_device(tree, leaf_stats)
    M = tree.n_nodes
    np.testing.assert_allclose(np.asarray(out["sum"])[:, 0],
                               st["sum"][:M], rtol=1e-12)
    np.testing.assert_allclose(np.asarray(out["cnt"])[:, 0],
                               st["cnt"][:M], rtol=1e-12)
    np.testing.assert_allclose(np.asarray(out["min"])[:, 0],
                               st["min"][:M])
    np.testing.assert_allclose(np.asarray(out["max"])[:, 0],
                               st["max"][:M])


def test_interval_reduce_random(rng):
    import jax.numpy as jnp

    vals = rng.random((37, 2))
    lo = np.array([0, 5, 10, 36, 0])
    hi = np.array([37, 6, 20, 37, 1])
    out = np.asarray(interval_reduce(jnp.asarray(vals), lo, hi, "min"))
    for i in range(len(lo)):
        np.testing.assert_allclose(out[i], vals[lo[i]:hi[i]].min(axis=0))
    out = np.asarray(interval_reduce(jnp.asarray(vals), lo, hi, "max"))
    for i in range(len(lo)):
        np.testing.assert_allclose(out[i], vals[lo[i]:hi[i]].max(axis=0))
