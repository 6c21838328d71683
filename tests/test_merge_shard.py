"""Sharded fused-merge parity (VERDICT r4 item #1): the edge-partitioned
superstep merge over the 8-way CPU mesh must reproduce the single-chip
fused engine's hierarchy -- same selection rule (global per-vertex min
incident edge, f32-bit stat + global-id tie-break), owner-arbitrated
duplicate pooling at superstep barriers."""

import numpy as np
import pytest
import scipy.ndimage as ndi

from glia_tpu.data.synthetic import synthetic_em_slice
from glia_tpu.graph.merge import apply_merge_order
from glia_tpu.graph.merge_device import (
    edge_mean_arrays, merge_batched_device, order_to_keys,
    replay_exact_saliency, threshold_cut)
from glia_tpu.graph.rag import build_rag
from glia_tpu.metrics import eval_vi
from glia_tpu.native import greedy_merge_native, watershed_native


@pytest.fixture(scope="module")
def case():
    data = synthetic_em_slice((192, 192), n_cells=80, seed=21,
                              blur=1.2, noise=0.12)
    seg = watershed_native(ndi.gaussian_filter(data["pb"], 1.0),
                           level=0.004)
    rag = build_rag(seg, contour_only=False)
    return data, seg, rag


def _mesh(n):
    from glia_tpu.parallel.mesh import make_mesh

    return make_mesh(n)


@pytest.mark.parametrize("n_shards", [2, 8])
def test_sharded_merge_matches_single_chip(case, n_shards):
    from glia_tpu.parallel.merge_shard import merge_batched_sharded

    data, seg, rag = case
    u, v, s, c = edge_mean_arrays(rag, data["pb"])
    o1, s1, n1 = merge_batched_device(u, v, s, c, rag.n_regions, dmax=4)
    stats = {}
    o8, s8, n8 = merge_batched_sharded(u, v, s, c, rag.n_regions,
                                       _mesh(n_shards), dmax=4,
                                       stats=stats)
    assert n8 == n1
    # identical order rows: both engines select each region's globally
    # minimal incident edge with deterministic tie-breaks; on continuous
    # boundary data the f32 stat bits have no cross-pair ties, so the
    # replicated emission is row-for-row the single-chip one
    np.testing.assert_array_equal(np.asarray(o8)[:n8], np.asarray(o1)[:n1])
    np.testing.assert_allclose(np.asarray(s8)[:n8], np.asarray(s1)[:n1],
                               rtol=1e-6, atol=1e-9)
    assert stats["n_supersteps"] >= 1
    assert stats["routed_rows"] > 0
    assert not np.isnan(np.asarray(s8)[:n8]).any()


def test_sharded_merge_threshold_cut_components(case):
    """North-star clause: threshold-cut components of the sharded engine
    match the single-chip engine's at the serial engine's matched tau."""
    from glia_tpu.parallel.merge_shard import merge_batched_sharded

    data, seg, rag = case
    u, v, s, c = edge_mean_arrays(rag, data["pb"])
    order_h, sal_h = greedy_merge_native(rag, data["pb"], policy="mean")
    k = rag.n_regions - 80
    tau = -sal_h[k - 1]

    o8, s8, n8 = merge_batched_sharded(u, v, s, c, rag.n_regions,
                                       _mesh(8), dmax=4)
    okeys = order_to_keys(o8, n8, rag)
    ex = replay_exact_saliency(u, v, s, c, np.asarray(o8)[:n8])
    mask = threshold_cut(okeys, ex, tau)
    seg_8 = apply_merge_order(seg, okeys[mask])

    o1, s1, n1 = merge_batched_device(u, v, s, c, rag.n_regions, dmax=4)
    okeys1 = order_to_keys(o1, n1, rag)
    ex1 = replay_exact_saliency(u, v, s, c, np.asarray(o1)[:n1])
    seg_1 = apply_merge_order(seg, okeys1[threshold_cut(okeys1, ex1, tau)])

    # identical components: VI between the two cuts is exactly zero
    _, _, vi_cross = eval_vi(seg_8, seg_1)
    assert vi_cross == 0.0

    # and quality parity vs the serial engine's cut
    seg_ser = apply_merge_order(seg, order_h, threshold_index=k)
    _, _, vi_8 = eval_vi(seg_8, data["truth"])
    _, _, vi_ser = eval_vi(seg_ser, data["truth"])
    assert abs(vi_8 - vi_ser) < 0.05


def test_sharded_merge_comm_counters(case):
    """Counters must be self-consistent: every routed row is an alive
    edge; moved <= routed; all-reduce bytes follow the formula."""
    from glia_tpu.parallel.merge_shard import merge_batched_sharded

    data, seg, rag = case
    u, v, s, c = edge_mean_arrays(rag, data["pb"])
    stats = {}
    o, sal, n_m = merge_batched_sharded(u, v, s, c, rag.n_regions,
                                        _mesh(8), dmax=4, stats=stats)
    assert 0 < stats["moved_rows"] <= stats["routed_rows"]
    # only TOUCHED edges cross the wire (round 5): bounded by the rows a
    # superstep can touch, far under steps * E
    assert stats["routed_rows"] <= stats["n_supersteps"] * rag.n_edges
    n_ids = rag.n_regions + max(rag.n_regions - 1, 1)
    assert stats["allreduce_bytes"] == stats["n_supersteps"] * 4 * n_ids * 4
    # padded-wire accounting identities (VERDICT r4 weak #5: the model
    # must use what the wire physically moves)
    D = 8
    assert stats["a2a_padded_rows"] == (
        stats["n_supersteps"] * D * stats["route_cap"])
    row_bytes = 4 * 4 + 2 * 8  # 4 int32 + (s, c) float64 on CPU x64
    assert stats["a2a_wire_bytes"] == stats["a2a_padded_rows"] * row_bytes


def test_exact_saliency_sharded_matches_host_replay(case):
    """The edge-partitioned LCA replay over the 8-way mesh equals the
    serial host replay row-for-row (VERDICT r5 item #1, SNEMI path)."""
    from glia_tpu.parallel.merge_shard import (exact_saliency_sharded,
                                               merge_batched_sharded)

    data, seg, rag = case
    u, v, s, c = edge_mean_arrays(rag, data["pb"])
    o8, s8, n8 = merge_batched_sharded(u, v, s, c, rag.n_regions,
                                       _mesh(8), dmax=4)
    order = np.asarray(o8)[:n8]
    host = replay_exact_saliency(u, v, s, c, order)
    shd = exact_saliency_sharded(u, v, s, c, order, rag.n_regions,
                                 _mesh(8))
    np.testing.assert_array_equal(np.isnan(host), np.isnan(shd))
    ok = np.isfinite(host)
    np.testing.assert_allclose(shd[ok], host[ok], rtol=1e-9, atol=1e-12)
