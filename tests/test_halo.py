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
