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
