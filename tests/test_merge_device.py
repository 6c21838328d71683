"""Device merge engines vs the host oracle."""

import numpy as np
import pytest

from glia_tpu.data.synthetic import synthetic_em_slice
from glia_tpu.graph.merge import apply_merge_order, greedy_merge_order
from glia_tpu.graph.merge_device import (
    edge_mean_arrays,
    merge_batched_device,
    merge_serial_device,
    order_to_keys,
)
from glia_tpu.graph.rag import build_rag
from glia_tpu.metrics import eval_vi
from glia_tpu.native import watershed_native


@pytest.fixture(scope="module")
def case():
    data = synthetic_em_slice(shape=(64, 64), n_cells=12, seed=33)
    seg = watershed_native(data["pb"], level=0.08)
    rag = build_rag(seg, contour_only=False)
    return data, seg, rag


def test_serial_device_matches_host_mean(case):
    data, seg, rag = case
    u, v, s, c = edge_mean_arrays(rag, data["pb"])
    order_d, sal_d, n = merge_serial_device(u, v, s, c, rag.n_regions)
    order_keys = order_to_keys(order_d, n, rag)
    order_h, sal_h = greedy_merge_order(rag, data["pb"], policy="mean")
    assert n == len(order_h)
    np.testing.assert_array_equal(order_keys, order_h)
    np.testing.assert_allclose(np.asarray(sal_d)[:n], sal_h, rtol=1e-12)


def test_batched_device_valid_and_complete(case):
    data, seg, rag = case
    u, v, s, c = edge_mean_arrays(rag, data["pb"])
    order_d, sal_d, n = merge_batched_device(u, v, s, c, rag.n_regions)
    order = np.asarray(order_d)[:n]
    # validity: every row well-formed, new ids strictly increasing
    assert (order[:, 2] == rag.n_regions + np.arange(n)).all()
    assert (order[:, 0] != order[:, 1]).all()
    # each id is merged at most once
    used = np.concatenate([order[:, 0], order[:, 1]])
    assert len(np.unique(used)) == len(used)
    # applying the full order merges every connected component
    okeys = order_to_keys(order_d, n, rag)
    seg_m = apply_merge_order(seg, okeys)
    # number of remaining labels == number of RAG connected components
    h_order, _ = greedy_merge_order(rag, data["pb"], policy="mean")
    seg_h = apply_merge_order(seg, h_order)
    assert len(np.unique(seg_m)) == len(np.unique(seg_h))


def test_batched_vs_serial_quality(case):
    """Speed-mode merges must track serial quality: compare VI against
    truth when cutting both orders at the same region count."""
    data, seg, rag = case
    u, v, s, c = edge_mean_arrays(rag, data["pb"])
    order_b, _, nb = merge_batched_device(u, v, s, c, rag.n_regions)
    order_h, _ = greedy_merge_order(rag, data["pb"], policy="mean")
    target_regions = 12
    kb = rag.n_regions - target_regions
    seg_b = apply_merge_order(seg, order_to_keys(order_b, nb, rag),
                              threshold_index=kb)
    seg_h = apply_merge_order(seg, order_h, threshold_index=kb)
    _, _, vi_b = eval_vi(seg_b, data["truth"])
    _, _, vi_h = eval_vi(seg_h, data["truth"])
    # batched order is not identical but must be comparable quality
    assert vi_b < vi_h + 0.35


def test_threshold_cut_quality_parity():
    """SURVEY hard-part #1: the batched superstep order, consumed via
    monotonized threshold cuts, must match serial greedy VI/Rand."""
    import scipy.ndimage as ndi

    from glia_tpu.graph.merge_device import threshold_cut
    from glia_tpu.metrics import eval_vi

    deltas = []
    for seed in (201, 202, 203):
        data = synthetic_em_slice((96, 96), n_cells=20, seed=seed)
        seg = watershed_native(ndi.gaussian_filter(data["pb"], 1.0), 0.01)
        rag = build_rag(seg, contour_only=False)
        oh, sh = greedy_merge_order(rag, data["pb"], policy="mean")
        u, v, s, c = edge_mean_arrays(rag, data["pb"])
        ob, sb, nb = merge_batched_device(u, v, s, c, rag.n_regions)
        okeys = order_to_keys(ob, nb, rag)
        k = rag.n_regions - 20
        tau = -sh[k - 1]
        segh = apply_merge_order(seg, oh, threshold_index=k)
        mask = threshold_cut(okeys, -np.asarray(sb)[:nb], tau)
        segb = apply_merge_order(seg, okeys[mask])
        _, _, vih = eval_vi(segh, data["truth"])
        _, _, vib = eval_vi(segb, data["truth"])
        deltas.append(vib - vih)
    assert abs(np.mean(deltas)) < 0.1


def test_hist_median_batched_quality():
    """Approx-median (histogram sketch) batched mode vs exact-median
    serial greedy: threshold cuts must give comparable VI."""
    import scipy.ndimage as ndi

    from glia_tpu.graph.merge_device import (
        edge_hist_arrays,
        merge_batched_device_hist,
        threshold_cut,
    )
    from glia_tpu.metrics import eval_vi

    deltas = []
    for seed in (301, 302):
        data = synthetic_em_slice((96, 96), n_cells=20, seed=seed)
        seg = watershed_native(ndi.gaussian_filter(data["pb"], 1.0), 0.01)
        rag = build_rag(seg, contour_only=False)
        oh, sh = greedy_merge_order(rag, data["pb"], policy="median")
        u, v, h = edge_hist_arrays(rag, data["pb"], n_bins=64)
        ob, sb, nb = merge_batched_device_hist(u, v, h, rag.n_regions)
        okeys = order_to_keys(ob, nb, rag)
        k = rag.n_regions - 20
        tau = -sh[k - 1] + 1.0 / 64  # bin-resolution slack
        segh = apply_merge_order(seg, oh, threshold_index=k)
        mask = threshold_cut(okeys, -np.asarray(sb)[:nb], tau)
        segb = apply_merge_order(seg, okeys[mask])
        _, _, vih = eval_vi(segh, data["truth"])
        _, _, vib = eval_vi(segb, data["truth"])
        deltas.append(vib - vih)
    assert np.mean(deltas) < 0.3


def test_fused_engine_chain_validity_and_quality(case):
    """The fused single-program engine (depth-limited Boruvka chains)
    must emit a valid binary merge hierarchy with O(log R) supersteps
    and match the matching-engine's threshold-cut quality."""
    import scipy.ndimage as ndi

    from glia_tpu.graph.merge_device import threshold_cut

    for seed in (201, 202):
        data = synthetic_em_slice((96, 96), n_cells=20, seed=seed)
        seg = watershed_native(ndi.gaussian_filter(data["pb"], 1.0), 0.01)
        rag = build_rag(seg, contour_only=False)
        u, v, s, c = edge_mean_arrays(rag, data["pb"])
        stats = {}
        ob, sb, nm = merge_batched_device(u, v, s, c, rag.n_regions,
                                          stats=stats, mode="fused")
        # O(log R) supersteps (the matching engine needed ~16-18 here)
        assert stats["n_supersteps"] <= 8
        order = np.asarray(ob)[:nm]
        assert (order[:, 2] == rag.n_regions + np.arange(nm)).all()
        used = np.concatenate([order[:, 0], order[:, 1]])
        assert len(np.unique(used)) == len(used)
        # chain references only already-created ids
        assert (order[:, 0] < order[:, 2]).all()
        assert (order[:, 1] < order[:, 2]).all()
        sb_np = np.asarray(sb)[:nm]
        # quality parity vs serial greedy via monotonized threshold cut
        oh, sh = greedy_merge_order(rag, data["pb"], policy="mean")
        k = rag.n_regions - 20
        tau = -sh[k - 1]
        segh = apply_merge_order(seg, oh, threshold_index=k)
        okeys = order_to_keys(ob, nm, rag)
        mask = threshold_cut(okeys, -sb_np, tau)
        segb = apply_merge_order(seg, okeys[mask])
        _, _, vih = eval_vi(segh, data["truth"])
        _, _, vib = eval_vi(segb, data["truth"])
        assert vib - vih < 0.05


def test_hist_median_stat():
    import jax.numpy as jnp

    from glia_tpu.graph.merge_device import hist_median_stat

    # 5 values in bins [0,0,1,3,3] of 4 bins over [0,1): median idx bin 3?
    # values sorted -> k = 5//2 = 2 -> third value -> bin 1
    h = jnp.asarray([[2.0, 1.0, 0.0, 2.0]])
    med = float(hist_median_stat(h, 0.0, 1.0)[0])
    assert med == pytest.approx(0.375)  # bin 1 center


def test_replay_exact_saliency_matches_serial_engine():
    """Replaying the HOST serial order through replay_exact_saliency must
    reproduce the serial engine's own pop-time saliencies (same algorithm,
    fixed order): the replay is the serial boundary-table quantity."""
    import scipy.ndimage as ndi

    from glia_tpu.graph.merge_device import replay_exact_saliency

    data = synthetic_em_slice((96, 96), n_cells=20, seed=77)
    seg = watershed_native(ndi.gaussian_filter(data["pb"], 1.0), 0.01)
    rag = build_rag(seg, contour_only=False)
    order_h, sal_h = greedy_merge_order(rag, data["pb"], policy="mean")
    # convert label-key order to dense-index order for the replay
    key_to_dense = {int(k): i for i, k in enumerate(rag.keys)}
    R = rag.n_regions
    max_key = int(rag.keys.max())
    dense = np.empty_like(order_h)
    for i, (a, b, r2) in enumerate(order_h):
        dense[i, 0] = key_to_dense.get(int(a), R + int(a) - max_key - 1)
        dense[i, 1] = key_to_dense.get(int(b), R + int(b) - max_key - 1)
        dense[i, 2] = R + int(r2) - max_key - 1
    u, v, s, c = edge_mean_arrays(rag, data["pb"])
    ex = replay_exact_saliency(u, v, s, c, dense)
    assert not np.isnan(ex).any()
    np.testing.assert_allclose(ex, -np.asarray(sal_h), rtol=1e-9, atol=1e-12)


def test_threshold_cut_drift_bounded_at_1024():
    """VERDICT r4 item #2: the matched-threshold-cut VI drift of the fused
    batched engine, cut on exact replayed saliencies, must stay <= 0.005
    at >= 1024^2 scale (round-3 stale-saliency drift was +0.0164 here and
    +0.0154 at 2048^2)."""
    import scipy.ndimage as ndi

    from glia_tpu.graph.merge import apply_merge_order
    from glia_tpu.graph.merge_device import (
        replay_exact_saliency, threshold_cut)
    from glia_tpu.metrics import eval_vi
    from glia_tpu.native import greedy_merge_native

    side = 1024
    n_cells = (side // 14) ** 2
    data = synthetic_em_slice((side, side), n_cells=n_cells, seed=11,
                              blur=1.2, noise=0.12)
    seg = watershed_native(ndi.gaussian_filter(data["pb"], 1.0),
                           level=0.004)
    rag = build_rag(seg, contour_only=False)
    order_h, sal_h = greedy_merge_native(rag, data["pb"], policy="mean")
    k = rag.n_regions - n_cells
    tau = -sal_h[k - 1]
    seg_h = apply_merge_order(seg, order_h, threshold_index=k)
    _, _, vi_h = eval_vi(seg_h, data["truth"])

    u, v, s, c = edge_mean_arrays(rag, data["pb"])
    order_b, sal_b, n_m = merge_batched_device(u, v, s, c, rag.n_regions,
                                               dmax=4)
    order_d = np.asarray(order_b)[:n_m]
    ex = replay_exact_saliency(u, v, s, c, order_d)
    assert not np.isnan(ex).any()
    okeys = order_to_keys(order_b, n_m, rag)
    mask = threshold_cut(okeys, ex, tau)
    seg_b = apply_merge_order(seg, okeys[mask])
    _, _, vi_b = eval_vi(seg_b, data["truth"])
    assert abs(vi_b - vi_h) <= 0.005, (vi_b, vi_h)


def test_multiphase_engine_matches_fused():
    """mode="fused_ms" (device-side capacity-shrinking phases) must build
    the same hierarchy as mode="fused": same merge count, no fallback,
    and identical threshold-cut components on exact replayed saliencies."""
    import scipy.ndimage as ndi

    from glia_tpu.graph.merge import apply_merge_order
    from glia_tpu.graph.merge_device import (
        replay_exact_saliency, threshold_cut)
    from glia_tpu.metrics import eval_vi
    from glia_tpu.native import greedy_merge_native

    data = synthetic_em_slice((192, 192), n_cells=100, seed=31,
                              blur=1.2, noise=0.12)
    seg = watershed_native(ndi.gaussian_filter(data["pb"], 1.0),
                           level=0.004)
    rag = build_rag(seg, contour_only=False)
    u, v, s, c = edge_mean_arrays(rag, data["pb"])
    R = rag.n_regions
    o1, _, n1 = merge_batched_device(u, v, s, c, R, mode="fused")
    st = {}
    o2, _, n2 = merge_batched_device(u, v, s, c, R, mode="fused_ms",
                                     stats=st)
    assert n2 == n1
    assert st.get("fallback") is False
    order_h, sal_h = greedy_merge_native(rag, data["pb"], policy="mean")
    k = R - 100
    tau = -sal_h[k - 1]
    ok1 = order_to_keys(o1, n1, rag)
    ok2 = order_to_keys(o2, n2, rag)
    ex1 = replay_exact_saliency(u, v, s, c, np.asarray(o1)[:n1])
    ex2 = replay_exact_saliency(u, v, s, c, np.asarray(o2)[:n2])
    assert not np.isnan(ex2).any()
    sa = apply_merge_order(seg, ok1[threshold_cut(ok1, ex1, tau)])
    sb = apply_merge_order(seg, ok2[threshold_cut(ok2, ex2, tau)])
    _, _, vi_cross = eval_vi(sa, sb)
    assert vi_cross == 0.0


def test_multiphase_fallback_on_tight_plan():
    """An over-tight capacity plan must FALL BACK to the single-phase
    engine (correctness is never capacity-dependent), flagged in stats."""
    import scipy.ndimage as ndi

    from glia_tpu.graph.merge_device import _fused_multiphase_core, _mean_stat_packed
    import jax.numpy as jnp

    data = synthetic_em_slice((256, 256), n_cells=160, seed=31,
                              blur=1.2, noise=0.12)
    seg = watershed_native(ndi.gaussian_filter(data["pb"], 1.0), 0.004)
    rag = build_rag(seg, contour_only=False)
    u, v, s, c = edge_mean_arrays(rag, data["pb"])
    R = rag.n_regions
    assert rag.n_edges > 2048  # caps below floor at the 256-row minimum
    dtype = jnp.float64
    sc = jnp.stack([jnp.asarray(s, dtype), jnp.asarray(c, dtype)], axis=1)
    st = {}
    # edge/vertex caps at the 256/128-row floor after ONE superstep
    # cannot hold the survivors -> overflow -> fallback
    o, sal, n_m = _fused_multiphase_core(
        u, v, (sc,), _mean_stat_packed, R, 256, dtype,
        plan=[(1, 1.0, 1.0), (None, 0.002, 0.002)], stats=st)
    assert st.get("fallback") is True
    o1, _, n1 = merge_batched_device(u, v, s, c, R, mode="fused")
    assert n_m == n1


def test_replay_native_matches_python():
    """The C++ replay engine equals the Python oracle replay."""
    import scipy.ndimage as ndi

    from glia_tpu.graph.merge_device import replay_exact_saliency

    data = synthetic_em_slice((96, 96), n_cells=20, seed=41)
    seg = watershed_native(ndi.gaussian_filter(data["pb"], 1.0), 0.01)
    rag = build_rag(seg, contour_only=False)
    u, v, s, c = edge_mean_arrays(rag, data["pb"])
    ob, sb, nb = merge_batched_device(u, v, s, c, rag.n_regions)
    order = np.asarray(ob)[:nb]
    got_n = replay_exact_saliency(u, v, s, c, order, engine="native")
    got_p = replay_exact_saliency(u, v, s, c, order, engine="py")
    assert not np.isnan(got_n).any()
    np.testing.assert_allclose(got_n, got_p, rtol=1e-12, atol=1e-12)


def test_exact_saliency_device_matches_host_replay(case):
    """VERDICT r5 item #1: the LCA-keyed device segment reduction must
    reproduce the serial host replay's exact merge-time pooled means --
    row for row, including NaN (empty popped boundary) rows."""
    from glia_tpu.graph.merge_device import (exact_saliency_device,
                                             replay_exact_saliency)

    data, seg, rag = case
    u, v, s, c = edge_mean_arrays(rag, data["pb"])
    order, sal, n_m = merge_batched_device(u, v, s, c, rag.n_regions,
                                           mode="fused_ms")
    order = np.asarray(order)[:n_m]
    host = replay_exact_saliency(u, v, s, c, order)
    dev = np.asarray(exact_saliency_device(u, v, s, c, order,
                                           rag.n_regions))
    np.testing.assert_array_equal(np.isnan(host), np.isnan(dev))
    ok = np.isfinite(host)
    np.testing.assert_allclose(dev[ok], host[ok], rtol=1e-9, atol=1e-12)


def test_exact_saliency_device_on_serial_order():
    """On the HOST serial order the device LCA reduction must reproduce
    the serial engine's own pop-time saliencies (transitively via the
    replay identity, but asserted directly here)."""
    import scipy.ndimage as ndi

    from glia_tpu.graph.merge_device import exact_saliency_device

    data = synthetic_em_slice((96, 96), n_cells=20, seed=77)
    seg = watershed_native(ndi.gaussian_filter(data["pb"], 1.0), 0.01)
    rag = build_rag(seg, contour_only=False)
    order_h, sal_h = greedy_merge_order(rag, data["pb"], policy="mean")
    key_to_dense = {int(k): i for i, k in enumerate(rag.keys)}
    R = rag.n_regions
    max_key = int(rag.keys.max())
    dense = np.empty_like(order_h)
    for i, (a, b, r2) in enumerate(order_h):
        dense[i, 0] = key_to_dense.get(int(a), R + int(a) - max_key - 1)
        dense[i, 1] = key_to_dense.get(int(b), R + int(b) - max_key - 1)
        dense[i, 2] = R + int(r2) - max_key - 1
    u, v, s, c = edge_mean_arrays(rag, data["pb"])
    ex = np.asarray(exact_saliency_device(u, v, s, c, dense, R))
    assert not np.isnan(ex).any()
    np.testing.assert_allclose(ex, -np.asarray(sal_h), rtol=1e-9,
                               atol=1e-12)


def test_replay_median_native_matches_python():
    """C++ multiset median replay == Python dict oracle, on a fused
    device order (VERDICT r5 item #3a)."""
    import scipy.ndimage as ndi

    from glia_tpu.graph.merge_device import (edge_hist_arrays,
                                             merge_batched_device_hist,
                                             replay_exact_saliency_median)

    data = synthetic_em_slice((128, 128), n_cells=40, seed=13)
    seg = watershed_native(ndi.gaussian_filter(data["pb"], 1.0), 0.004)
    rag = build_rag(seg, contour_only=False)
    u, v, h = edge_hist_arrays(rag, data["pb"], n_bins=16)
    order, sal, n_m = merge_batched_device_hist(u, v, h, rag.n_regions,
                                                mode="fused_ms")
    order = np.asarray(order)[:n_m]
    pb = np.asarray(data["pb"], np.float64).ravel()
    vals = pb[rag.edge_pixels]
    ex_n = replay_exact_saliency_median(u, v, rag.edge_ptr, vals, order,
                                        engine="native")
    ex_p = replay_exact_saliency_median(u, v, rag.edge_ptr, vals, order,
                                        engine="py")
    np.testing.assert_array_equal(np.isnan(ex_n), np.isnan(ex_p))
    ok = np.isfinite(ex_n)
    np.testing.assert_allclose(ex_n[ok], ex_p[ok], rtol=0, atol=0)


def test_replay_median_matches_serial_engine():
    """Replaying the HOST serial median order must reproduce the serial
    engine's own pop-time upper medians (same multiset, fixed order)."""
    import scipy.ndimage as ndi

    from glia_tpu.graph.merge_device import replay_exact_saliency_median

    data = synthetic_em_slice((96, 96), n_cells=20, seed=77)
    seg = watershed_native(ndi.gaussian_filter(data["pb"], 1.0), 0.01)
    rag = build_rag(seg, contour_only=False)
    from glia_tpu.native import greedy_merge_native

    order_h, sal_h = greedy_merge_native(rag, data["pb"], policy="median")
    key_to_dense = {int(k): i for i, k in enumerate(rag.keys)}
    R = rag.n_regions
    max_key = int(rag.keys.max())
    dense = np.empty_like(order_h)
    for i, (a, b, r2) in enumerate(order_h):
        dense[i, 0] = key_to_dense.get(int(a), R + int(a) - max_key - 1)
        dense[i, 1] = key_to_dense.get(int(b), R + int(b) - max_key - 1)
        dense[i, 2] = R + int(r2) - max_key - 1
    u, v, s, c = edge_mean_arrays(rag, data["pb"])
    pb = np.asarray(data["pb"], np.float64).ravel()
    ex = replay_exact_saliency_median(u, v, rag.edge_ptr,
                                      pb[rag.edge_pixels], dense)
    assert not np.isnan(ex).any()
    np.testing.assert_allclose(ex, -np.asarray(sal_h), rtol=0, atol=0)


def test_replay_median_minsize_matches_serial_engine():
    """Sized median replay reproduces the serial median_minsize engine's
    own pop-time statistics on its own order (VERDICT r5 item #3c)."""
    import scipy.ndimage as ndi

    from glia_tpu.graph.merge_device import replay_exact_saliency_median

    data = synthetic_em_slice((96, 96), n_cells=20, seed=77)
    seg = watershed_native(ndi.gaussian_filter(data["pb"], 1.0), 0.01)
    rag = build_rag(seg, contour_only=False)
    from glia_tpu.native import greedy_merge_native

    order_h, sal_h = greedy_merge_native(rag, data["pb"],
                                         policy="median_minsize")
    key_to_dense = {int(k): i for i, k in enumerate(rag.keys)}
    R = rag.n_regions
    max_key = int(rag.keys.max())
    dense = np.empty_like(order_h)
    for i, (a, b, r2) in enumerate(order_h):
        dense[i, 0] = key_to_dense.get(int(a), R + int(a) - max_key - 1)
        dense[i, 1] = key_to_dense.get(int(b), R + int(b) - max_key - 1)
        dense[i, 2] = R + int(r2) - max_key - 1
    u, v, s, c = edge_mean_arrays(rag, data["pb"])
    pb = np.asarray(data["pb"], np.float64).ravel()
    for eng in ("native", "py"):
        ex = replay_exact_saliency_median(u, v, rag.edge_ptr,
                                          pb[rag.edge_pixels], dense,
                                          engine=eng,
                                          region_sizes=rag.sizes)
        assert not np.isnan(ex).any()
        np.testing.assert_allclose(ex, -np.asarray(sal_h), rtol=0,
                                   atol=0)


@pytest.mark.parametrize("mode", ["fused", "fused_ms"])
def test_device_median_minsize_engine(mode):
    """Device median*minsize policy: complete hierarchy; threshold-cut
    quality close to the serial engine's cut at a matched point."""
    import scipy.ndimage as ndi

    from glia_tpu.graph.merge_device import (
        edge_hist_arrays, greedy_merge_device,
        merge_batched_device_hist_minsize)
    from glia_tpu.native import greedy_merge_native

    data = synthetic_em_slice((192, 192), n_cells=80, seed=21,
                              blur=1.2, noise=0.12)
    seg = watershed_native(ndi.gaussian_filter(data["pb"], 1.0), 0.004)
    rag = build_rag(seg, contour_only=False)
    u, v, h = edge_hist_arrays(rag, data["pb"], n_bins=32)
    order, sal, n_m = merge_batched_device_hist_minsize(
        u, v, h, rag.sizes, rag.n_regions, mode=mode)
    assert n_m > 0
    # fresh ids allocated contiguously in merge order
    order = np.asarray(order)[:n_m]
    assert (order[:, 2] == np.arange(rag.n_regions,
                                     rag.n_regions + n_m)).all()

    # quality: matched-count cut vs the serial engine (statistical)
    order_hk, sal_hk = greedy_merge_native(rag, data["pb"],
                                           policy="median_minsize")
    k = rag.n_regions - 80
    okeys, sals = greedy_merge_device(rag, data["pb"],
                                      policy="median_minsize", mode=mode)
    from glia_tpu.graph.merge_device import threshold_cut

    tau = -sal_hk[k - 1]
    mask = threshold_cut(okeys, -np.asarray(sals), tau)
    seg_d = apply_merge_order(seg, okeys[mask])
    seg_h = apply_merge_order(seg, order_hk, threshold_index=k)
    _, _, vi_d = eval_vi(seg_d, data["truth"])
    _, _, vi_h = eval_vi(seg_h, data["truth"])
    assert abs(vi_d - vi_h) < 0.25


def test_median_exact_cut_drift_bounded():
    """Regression: at suite scale the hist-median device order cut on
    EXACT replay medians stays within dVI 0.06 of the serial median
    engine's matched cut (and improves on the stale-sketch cut at scale;
    the 1024^2/2048^2 table lives in docs/RESULTS.md)."""
    import scipy.ndimage as ndi

    from glia_tpu.graph.merge_device import (
        edge_hist_arrays, merge_batched_device_hist, order_to_keys,
        replay_exact_saliency_median, threshold_cut)

    n_cells = 250
    data = synthetic_em_slice((256, 256), n_cells=n_cells, seed=11,
                              blur=1.2, noise=0.12)
    seg = watershed_native(ndi.gaussian_filter(data["pb"], 1.0), 0.004)
    rag = build_rag(seg, contour_only=False)
    from glia_tpu.native import greedy_merge_native

    order_h, sal_h = greedy_merge_native(rag, data["pb"],
                                         policy="median")
    u, v, h = edge_hist_arrays(rag, data["pb"], n_bins=32)
    order_d, sal_d, n_m = merge_batched_device_hist(
        u, v, h, rag.n_regions, mode="fused_ms")
    order_np = np.asarray(order_d)[:n_m]
    okeys = order_to_keys(order_d, n_m, rag)
    pb = np.asarray(data["pb"], np.float64).ravel()
    ex = replay_exact_saliency_median(u, v, rag.edge_ptr,
                                      pb[rag.edge_pixels], order_np)
    stale = -np.asarray(sal_d)[:n_m]
    ex = np.where(np.isnan(ex), stale, ex)
    k = rag.n_regions - n_cells
    tau = -sal_h[k - 1]
    seg_h = apply_merge_order(seg, order_h, threshold_index=k)
    seg_e = apply_merge_order(seg, okeys[threshold_cut(okeys, ex, tau)])
    _, _, vi_h = eval_vi(seg_h, data["truth"])
    _, _, vi_e = eval_vi(seg_e, data["truth"])
    assert abs(vi_e - vi_h) < 0.06


def test_adaptive_plan_engages_on_3d_rag():
    """VERDICT r5 item #7: the adaptive capacity plan must engage (no
    single-phase fallback) on a 3D supervoxel RAG -- a shape family the
    old hand-tuned 2048^2 plan was never measured on."""
    from glia_tpu.data.synthetic import synthetic_em_stack

    stack = synthetic_em_stack(shape=(12, 64, 64), n_cells=30, seed=7)
    seg = watershed_native(stack["pb3d"], level=0.01)
    rag = build_rag(seg, contour_only=False)
    u, v, s, c = edge_mean_arrays(rag, stack["pb3d"])
    stats = {}
    order, sal, n_m = merge_batched_device(u, v, s, c, rag.n_regions,
                                           mode="fused_ms", stats=stats)
    assert stats["fallback"] is False
    assert n_m > 0
    # steady-state replay of the memoized plan also stays on-plan
    stats2 = {}
    order2, sal2, n_m2 = merge_batched_device(u, v, s, c, rag.n_regions,
                                              mode="fused_ms",
                                              stats=stats2)
    assert stats2["fallback"] is False
    assert n_m2 == n_m
    np.testing.assert_array_equal(np.asarray(order2)[:n_m2],
                                  np.asarray(order)[:n_m])
