"""Hardware parity: Pallas kernels compiled (non-interpret) + the fused
merge engine on the real chip."""

import numpy as np


def _small_forest(n_trees=24, dim=16, seed=0):
    from glia_tpu.models.forest import train_forest

    rng = np.random.default_rng(seed)
    X = rng.random((600, dim)).astype(np.float32)
    y = (X[:, 0] + 0.5 * X[:, 1] > 0.8).astype(np.int32)
    return train_forest(X, y, n_trees=n_trees, seed=seed)


def test_pallas_forest_votes_compiled_parity():
    """Vote fractions from the compiled Pallas kernel match the numpy
    oracle (Model::predict semantics, rf.hxx:362-372)."""
    import jax

    from glia_tpu.models.forest import predict_votes_np
    from glia_tpu.ops.pallas.forest import make_forest_votes_pallas

    model = _small_forest()
    rng = np.random.default_rng(1)
    X = rng.random((512, 16)).astype(np.float32)
    want = predict_votes_np(model, X)
    fn = make_forest_votes_pallas(model, block_b=128, interpret=False)
    got = np.asarray(fn(jax.numpy.asarray(X)))
    np.testing.assert_allclose(got[:, : want.shape[1]], want, atol=1e-5)


def test_label_scorer_auto_picks_pallas_on_tpu():
    from glia_tpu.models.forest import (
        make_label_scorer, predict_label_fraction)

    model = _small_forest()
    rng = np.random.default_rng(2)
    X = rng.random((256, 16)).astype(np.float32)
    fn = make_label_scorer(model, label=1, backend="auto")
    got = np.asarray(fn(X))
    want = predict_label_fraction(model, X, label=1)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_fused_merge_on_chip_threshold_cut_parity():
    """The fused batched merge engine compiled for the real chip retains
    threshold-cut VI parity with the host serial loop."""
    import scipy.ndimage as ndi

    from glia_tpu.data.synthetic import synthetic_em_slice
    from glia_tpu.graph.merge import apply_merge_order
    from glia_tpu.graph.merge_device import (
        edge_mean_arrays, merge_batched_device, order_to_keys,
        threshold_cut)
    from glia_tpu.graph.rag import build_rag
    from glia_tpu.metrics import eval_vi
    from glia_tpu.native import greedy_merge_native, watershed_native

    n_cells = 60
    data = synthetic_em_slice((128, 128), n_cells=n_cells, seed=5,
                              blur=1.2, noise=0.12)
    seg = watershed_native(ndi.gaussian_filter(data["pb"], 1.0),
                           level=0.004)
    rag = build_rag(seg, contour_only=False)
    order_h, sal_h = greedy_merge_native(rag, data["pb"], policy="mean")
    u, v, s, c = edge_mean_arrays(rag, data["pb"])
    order_b, sal_b, n_m = merge_batched_device(u, v, s, c, rag.n_regions)
    assert n_m == len(order_h)
    k = rag.n_regions - n_cells
    tau = -sal_h[k - 1]
    okeys = order_to_keys(order_b, n_m, rag)
    mask = threshold_cut(okeys, -np.asarray(sal_b)[:n_m], tau)
    seg_b = apply_merge_order(seg, okeys[mask])
    seg_h = apply_merge_order(seg, order_h, threshold_index=k)
    _, _, vi_b = eval_vi(seg_b, data["truth"])
    _, _, vi_h = eval_vi(seg_h, data["truth"])
    assert abs(vi_b - vi_h) < 0.15, (vi_b, vi_h)


def test_exact_replay_cut_parity_on_chip():
    """Threshold cut on exact replayed saliencies (the production parity
    path, bench.py) tracks the serial VI tightly on the chip-produced
    order (round-4 drift fix; VERDICT r3 weak #1)."""
    import scipy.ndimage as ndi

    from glia_tpu.data.synthetic import synthetic_em_slice
    from glia_tpu.graph.merge import apply_merge_order
    from glia_tpu.graph.merge_device import (
        edge_mean_arrays, merge_batched_device, order_to_keys,
        replay_exact_saliency, threshold_cut)
    from glia_tpu.graph.rag import build_rag
    from glia_tpu.metrics import eval_vi
    from glia_tpu.native import greedy_merge_native, watershed_native

    n_cells = 60
    data = synthetic_em_slice((128, 128), n_cells=n_cells, seed=5,
                              blur=1.2, noise=0.12)
    seg = watershed_native(ndi.gaussian_filter(data["pb"], 1.0),
                           level=0.004)
    rag = build_rag(seg, contour_only=False)
    order_h, sal_h = greedy_merge_native(rag, data["pb"], policy="mean")
    u, v, s, c = edge_mean_arrays(rag, data["pb"])
    order_b, sal_b, n_m = merge_batched_device(u, v, s, c, rag.n_regions)
    k = rag.n_regions - n_cells
    tau = -sal_h[k - 1]
    okeys = order_to_keys(order_b, n_m, rag)
    ex = replay_exact_saliency(u, v, s, c, np.asarray(order_b)[:n_m])
    assert not np.isnan(ex).any()
    mask = threshold_cut(okeys, ex, tau)
    seg_b = apply_merge_order(seg, okeys[mask])
    seg_h = apply_merge_order(seg, order_h, threshold_index=k)
    _, _, vi_b = eval_vi(seg_b, data["truth"])
    _, _, vi_h = eval_vi(seg_h, data["truth"])
    assert abs(vi_b - vi_h) < 0.05, (vi_b, vi_h)


def test_hist_median_fused_on_chip():
    """Approx-median (histogram sketch) fused merge compiled on the chip:
    complete hierarchy + threshold-cut VI comparable to the host exact-
    median serial engine (struct_merge.hxx:90-136 semantics)."""
    import scipy.ndimage as ndi

    from glia_tpu.data.synthetic import synthetic_em_slice
    from glia_tpu.graph.merge import apply_merge_order
    from glia_tpu.graph.merge_device import (
        edge_hist_arrays, merge_batched_device_hist, order_to_keys,
        threshold_cut)
    from glia_tpu.graph.rag import build_rag
    from glia_tpu.metrics import eval_vi
    from glia_tpu.native import greedy_merge_native, watershed_native

    n_cells = 60
    data = synthetic_em_slice((128, 128), n_cells=n_cells, seed=7,
                              blur=1.2, noise=0.12)
    seg = watershed_native(ndi.gaussian_filter(data["pb"], 1.0),
                           level=0.004)
    rag = build_rag(seg, contour_only=False)
    order_h, sal_h = greedy_merge_native(rag, data["pb"], policy="median")
    u, v, h = edge_hist_arrays(rag, data["pb"], n_bins=32)
    order_b, sal_b, n_m = merge_batched_device_hist(u, v, h,
                                                    rag.n_regions)
    assert n_m == len(order_h)
    k = rag.n_regions - n_cells
    tau = -sal_h[k - 1]
    okeys = order_to_keys(order_b, n_m, rag)
    mask = threshold_cut(okeys, -np.asarray(sal_b)[:n_m], tau + 1e-9)
    seg_b = apply_merge_order(seg, okeys[mask])
    seg_h = apply_merge_order(seg, order_h, threshold_index=k)
    _, _, vi_b = eval_vi(seg_b, data["truth"])
    _, _, vi_h = eval_vi(seg_h, data["truth"])
    assert abs(vi_b - vi_h) < 0.3, (vi_b, vi_h)


def test_tree_scan_on_chip():
    """Per-level merge-tree activations (DFS-interval prefix sums)
    compiled on the chip match the host hierarchical oracle: cnt/min/max
    exactly, additive sums to float32 prefix-sum tolerance (the chip
    path runs f32; the CPU suite checks the f64 path bit-exactly)."""
    from glia_tpu.data.synthetic import synthetic_em_slice
    from glia_tpu.features.config import FeatureConfig
    from glia_tpu.features.hierarchical import TreeFeatures
    from glia_tpu.graph.merge import greedy_merge_order
    from glia_tpu.graph.rag import build_rag
    from glia_tpu.native import watershed_native
    from glia_tpu.ops.tree_scan import node_region_stats_device

    data = synthetic_em_slice((96, 96), n_cells=16, seed=13)
    seg = watershed_native(data["pb"], 0.1)
    rag = build_rag(seg, contour_only=False)
    order, _ = greedy_merge_order(rag, data["pb"], policy="median")
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
    # TreeFeatures appends isolated regions (never merged, not tree
    # nodes) AFTER the tree's nodes in node_keys; rows [:n_nodes] of its
    # stats align 1:1 with tree node ids (features/hierarchical.py:176)
    n = tree.n_nodes
    np.testing.assert_allclose(np.asarray(out["sum"])[:, 0],
                               st["sum"][:n], rtol=5e-4)
    np.testing.assert_allclose(np.asarray(out["cnt"])[:, 0],
                               st["cnt"][:n], rtol=1e-6)
    np.testing.assert_allclose(np.asarray(out["min"])[:, 0],
                               st["min"][:n], rtol=1e-6)
    np.testing.assert_allclose(np.asarray(out["max"])[:, 0],
                               st["max"][:n], rtol=1e-6)


def test_device_metrics_on_chip():
    """VI + adapted-Rand compiled on the chip match the host printers
    (gadget/main_eval_vi.cxx, main_eval_ri.cxx semantics)."""
    from glia_tpu.metrics import centropy, eval_ri
    from glia_tpu.metrics.device import (
        adapted_rand_device, densify_labels, vi_device)

    rng = np.random.default_rng(3)
    seg = rng.integers(1, 9, (64, 64)).astype(np.int32)
    truth = rng.integers(0, 7, (64, 64)).astype(np.int32)
    sid, S = densify_labels(seg)
    tid, T = densify_labels(truth, exclude=(0,))
    fs, fm, tot = (float(x) for x in vi_device(sid, tid, S, T))
    want_fs = centropy(truth, seg, excluded0=(0,), itk_quirk=False)
    want_fm = centropy(seg, truth, excluded1=(0,), itk_quirk=False)
    assert abs(fs - want_fs) < 1e-4 and abs(fm - want_fm) < 1e-4
    prec, rec, err = (float(x) for x in
                      adapted_rand_device(sid, tid, S, T))
    wp, wr, we = eval_ri(seg, truth)
    assert abs(prec - wp) < 1e-4 and abs(rec - wr) < 1e-4
    assert abs(err - we) < 1e-4


def test_bc_device_engine_compiled_on_chip():
    """The classifier-in-the-loop device engine (merge_order_bc_device:
    full-width feature assembly + Pallas forest + superstep merge, the
    production inference mode, struct_merge_bc.hxx:10-58) compiled on
    the real chip: complete hierarchy, valid probabilities, mid-cut VI
    tracking the host serial BC order."""
    import os
    import sys

    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tools"))
    from bench_bc_midcut import bc_midcut_compare

    rows = bc_midcut_compare(side=96, n_cells=40, n_trees=24,
                             taus=(0.8, 0.5))
    dvis = [abs(r["dvi"]) for r in rows]
    assert max(dvis) <= 0.12, rows


def test_median_sketch_from_counts_on_chip():
    """Counting-histogram median (device feature assembler core) compiled
    on the chip: exact-mode bit parity + sketch-mode one-grid-step bound
    vs the host exact median."""
    import warnings

    import jax
    import jax.numpy as jnp

    from glia_tpu.features.device import (
        _med_tables, _median_from_counts, counting_hist)

    rng = np.random.default_rng(9)

    class _I:
        def __init__(self, v):
            self.image = v

    v = rng.standard_normal(8000).astype(np.float32)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        tab = np.asarray(_med_tables([_I(v)], 256)[0])
    h = counting_hist(v, np.zeros(len(v), np.int64), 1, tab, len(tab))[0]
    med = float(jax.jit(_median_from_counts)(
        jnp.asarray(h)[None, :], jnp.asarray(tab))[0])
    true = float(np.partition(v, len(v) // 2)[len(v) // 2])
    step = tab[1] - tab[0]
    assert abs(med - true) <= step + 1e-6


def test_one_dispatch_merge_exact_on_chip():
    """Round-5 production path: merge + exact merge-time saliencies as
    ONE device program (merge_batched_device_exact) -- saliencies must
    match the serial host replay on the chip-produced order, and the
    memoized steady-state call must reproduce the discovery call."""
    import scipy.ndimage as ndi

    from glia_tpu.data.synthetic import synthetic_em_slice
    from glia_tpu.graph.merge_device import (
        edge_mean_arrays, merge_batched_device_exact,
        replay_exact_saliency)
    from glia_tpu.graph.rag import build_rag
    from glia_tpu.native import watershed_native

    data = synthetic_em_slice((160, 160), n_cells=70, seed=9,
                              blur=1.2, noise=0.12)
    seg = watershed_native(ndi.gaussian_filter(data["pb"], 1.0),
                           level=0.004)
    rag = build_rag(seg, contour_only=False)
    u, v, s, c = edge_mean_arrays(rag, data["pb"])
    o1, s1, n1 = merge_batched_device_exact(u, v, s, c, rag.n_regions)
    o2, s2, n2 = merge_batched_device_exact(u, v, s, c, rag.n_regions)
    assert n2 == n1 > 0
    np.testing.assert_array_equal(np.asarray(o2)[:n2],
                                  np.asarray(o1)[:n1])
    ex_host = replay_exact_saliency(u, v, s, c, np.asarray(o2)[:n2])
    ok = np.isfinite(ex_host)
    np.testing.assert_allclose(-np.asarray(s2)[:n2][ok], ex_host[ok],
                               rtol=1e-4, atol=1e-6)
