"""Routing-planned halo exchange vs dense aggregation."""

import numpy as np
import pytest

import jax

from glia_tpu.data.synthetic import synthetic_em_slice
from glia_tpu.graph.rag import build_rag
from glia_tpu.native import watershed_native
from glia_tpu.parallel.halo import HaloPlan, make_halo_aggregate, shard_halo_inputs
from glia_tpu.parallel.mesh import make_mesh
from glia_tpu.parallel.partition import partition_rag

needs_8 = pytest.mark.skipif(len(jax.devices()) < 8,
                             reason="needs 8 virtual devices")


@pytest.fixture(scope="module")
def setup():
    import scipy.ndimage as ndi

    data = synthetic_em_slice((96, 96), n_cells=24, seed=44)
    seg = watershed_native(ndi.gaussian_filter(data["pb"], 1.0), 0.01)
    rag = build_rag(seg, contour_only=False)
    part = partition_rag(rag, 8)
    plan = HaloPlan(part, rag)
    rng = np.random.default_rng(0)
    ev = rng.random((rag.n_edges, 3)).astype(np.float32)
    return rag, part, plan, ev


@needs_8
def test_halo_aggregation_matches_dense(setup):
    rag, part, plan, ev = setup
    mesh = make_mesh(8)
    inputs = shard_halo_inputs(mesh, plan, part, rag, ev)
    agg = make_halo_aggregate(mesh, plan, rag.n_regions, ev.shape[1])
    own, halo = agg(inputs["u"], inputs["v"], inputs["ev"],
                    inputs["send_ids"], inputs["recv_local"],
                    inputs["own_ids"], inputs["halo_ids"],
                    inputs["fetch_local"])
    own = np.asarray(own)      # [8 * R_own_max, F] stacked per shard
    # dense oracle
    key_index = {int(k): i for i, k in enumerate(rag.keys)}
    ui = np.array([key_index[int(a)] for a in rag.edges[:, 0]])
    vi = np.array([key_index[int(b)] for b in rag.edges[:, 1]])
    want = np.zeros((rag.n_regions, ev.shape[1]))
    np.add.at(want, ui, ev)
    np.add.at(want, vi, ev)
    R_max = plan.R_own_max
    for s in range(8):
        ids = plan.own_ids[s]
        for j, r in enumerate(ids):
            if r < 0:
                continue
            np.testing.assert_allclose(
                own[s * R_max + j], want[r], rtol=1e-5,
                err_msg=f"shard {s} region {r}")


@needs_8
def test_halo_rows_are_authoritative(setup):
    rag, part, plan, ev = setup
    mesh = make_mesh(8)
    inputs = shard_halo_inputs(mesh, plan, part, rag, ev)
    agg = make_halo_aggregate(mesh, plan, rag.n_regions, ev.shape[1])
    own, halo = agg(inputs["u"], inputs["v"], inputs["ev"],
                    inputs["send_ids"], inputs["recv_local"],
                    inputs["own_ids"], inputs["halo_ids"],
                    inputs["fetch_local"])
    halo = np.asarray(halo)    # [8 * n * H, F]: per shard, per owner, H rows
    key_index = {int(k): i for i, k in enumerate(rag.keys)}
    ui = np.array([key_index[int(a)] for a in rag.edges[:, 0]])
    vi = np.array([key_index[int(b)] for b in rag.edges[:, 1]])
    want = np.zeros((rag.n_regions, ev.shape[1]))
    np.add.at(want, ui, ev)
    np.add.at(want, vi, ev)
    n, H = plan.n, plan.H
    halo = halo.reshape(n, n, H, -1)   # [shard, owner, slot, F]
    checked = 0
    for s in range(n):
        for t in range(n):
            for j in range(H):
                r = plan.send_ids[s, t, j]  # shard s's halo region owned by t
                if r < 0:
                    continue
                np.testing.assert_allclose(halo[s, t, j], want[r],
                                           rtol=1e-5)
                checked += 1
    assert checked == plan.comm_rows
    assert checked > 0


def test_comm_volume_smaller_than_dense(setup):
    rag, part, plan, ev = setup
    dense_rows = rag.n_regions * 8  # all_gather volume
    assert plan.comm_rows * 2 < dense_rows


@needs_8
def test_halo_edge_forward_matches_dense(setup):
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from glia_tpu.models.mlp import mlp2_init
    from glia_tpu.ops.pack import pack_edge_pixels
    from glia_tpu.parallel.halo import (
        local_endpoint_indices,
        make_halo_edge_forward,
        shard_halo_inputs,
    )
    from glia_tpu.parallel.train import MLP_DIMS, edge_forward

    rag, part, plan, _ = setup
    data_pb = np.random.default_rng(3).random(rag.shape).astype(np.float32)
    u, v, px, mask = pack_edge_pixels(rag, data_pb, 8)
    D, N1, N2 = MLP_DIMS
    w = jnp.asarray(mlp2_init(D, N1, N2, 0), dtype=jnp.float32)

    # single-device reference over the original edge order
    single = np.asarray(edge_forward(
        w, jnp.asarray(u), jnp.asarray(v), jnp.asarray(px),
        jnp.asarray(mask), jnp.ones(len(u), jnp.float32),
        rag.n_regions + 1, axis_name=None))

    mesh = make_mesh(8)
    # group edges by shard with padding, reusing shard_halo_inputs layout
    dummy_ev = np.zeros((rag.n_edges, 1), np.float32)
    inp = shard_halo_inputs(mesh, plan, part, rag, dummy_ev)
    groups, E_max = inp["groups"], inp["E_max"]
    n = plan.n
    u_p = np.full((n, E_max), rag.n_regions, np.int32)
    v_p = np.full((n, E_max), rag.n_regions, np.int32)
    px_p = np.zeros((n, E_max, px.shape[1]), np.float32)
    mask_p = np.zeros((n, E_max, px.shape[1]), np.float32)
    valid_p = np.zeros((n, E_max), np.float32)
    for s, g in enumerate(groups):
        u_p[s, : len(g)] = u[g]
        v_p[s, : len(g)] = v[g]
        px_p[s, : len(g)] = px[g]
        mask_p[s, : len(g)] = mask[g]
        valid_p[s, : len(g)] = 1.0
    u_loc, v_loc = local_endpoint_indices(plan, part, rag, groups, E_max)

    shard = NamedSharding(mesh, P("edge"))
    dev = lambda x: __import__("jax").device_put(jnp.asarray(x), shard)
    score = make_halo_edge_forward(mesh, plan, rag.n_regions)
    out = score(w, dev(u_p.reshape(-1)), dev(v_p.reshape(-1)),
                dev(px_p.reshape(-1, px.shape[1])),
                dev(mask_p.reshape(-1, px.shape[1])),
                dev(valid_p.reshape(-1)),
                dev(u_loc.reshape(-1)), dev(v_loc.reshape(-1)),
                dev(plan.send_ids), dev(plan.recv_local),
                dev(plan.own_ids.reshape(-1)), dev(plan.fetch_local))
    out = np.asarray(out).reshape(n, E_max)
    for s, g in enumerate(groups):
        np.testing.assert_allclose(out[s, : len(g)], single[g], rtol=2e-5,
                                   err_msg=f"shard {s}")
