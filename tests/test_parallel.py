"""Sharded RAG aggregation + training step on the virtual 8-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from glia_tpu.parallel.mesh import EDGE_AXIS, make_mesh
from glia_tpu.parallel.rag_shard import make_region_aggregate, shard_edges
from glia_tpu.parallel.train import edge_forward, make_train_step
from glia_tpu.models.mlp import mlp2_init
from glia_tpu.parallel.train import MLP_DIMS


needs_8 = pytest.mark.skipif(len(jax.devices()) < 8,
                             reason="needs 8 virtual devices")


@needs_8
def test_region_aggregate_matches_dense():
    mesh = make_mesh(8)
    rng = np.random.default_rng(0)
    E, R, F = 64, 16, 3
    u = rng.integers(0, R, E).astype(np.int32)
    v = rng.integers(0, R, E).astype(np.int32)
    ev = rng.random((E, F)).astype(np.float32)
    shard = NamedSharding(mesh, P(EDGE_AXIS))
    agg = make_region_aggregate(mesh, R)
    out = agg(jax.device_put(jnp.asarray(u), shard),
              jax.device_put(jnp.asarray(v), shard),
              jax.device_put(jnp.asarray(ev), shard))
    out = np.asarray(out)
    want = np.zeros((R, F))
    np.add.at(want, u, ev)
    np.add.at(want, v, ev)
    np.testing.assert_allclose(out, want, rtol=1e-5)


@needs_8
def test_sharded_forward_matches_single_device():
    mesh = make_mesh(8)
    from __graft_entry__ import _toy_rag_batch

    R = 16
    u, v, px, mask, valid, labels = _toy_rag_batch(n_edges=64, n_regions=R)
    D, N1, N2 = MLP_DIMS
    w = jnp.asarray(mlp2_init(D, N1, N2, 0), dtype=jnp.float32)
    single = edge_forward(w, jnp.asarray(u), jnp.asarray(v),
                          jnp.asarray(px), jnp.asarray(mask),
                          jnp.asarray(valid), R, axis_name=None)

    from functools import partial

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(P(), P(EDGE_AXIS), P(EDGE_AXIS), P(EDGE_AXIS, None),
                       P(EDGE_AXIS, None), P(EDGE_AXIS)),
             out_specs=P(EDGE_AXIS))
    def sharded(w, u, v, px, mask, valid):
        return edge_forward(w, u, v, px, mask, valid, R,
                            axis_name=EDGE_AXIS)

    shard = NamedSharding(mesh, P(EDGE_AXIS))
    dev = lambda x: jax.device_put(jnp.asarray(x), shard)
    got = sharded(w, dev(u), dev(v), dev(px), dev(mask), dev(valid))
    np.testing.assert_allclose(np.asarray(got), np.asarray(single),
                               rtol=1e-5)


@needs_8
def test_train_step_decreases_loss():
    from __graft_entry__ import _toy_rag_batch

    mesh = make_mesh(8)
    R = 16
    u, v, px, mask, valid, labels = _toy_rag_batch(n_edges=128, n_regions=R)
    shard = NamedSharding(mesh, P(EDGE_AXIS))
    dev = lambda x: jax.device_put(jnp.asarray(x), shard)
    batch = {"u": dev(u), "v": dev(v), "px": dev(px), "px_mask": dev(mask),
             "edge_valid": dev(valid), "labels": dev(labels)}
    init, step = make_train_step(mesh, R, lr=5e-2)
    w, st = init()
    losses = []
    for _ in range(30):
        w, st, loss = step(w, st, batch)
        losses.append(float(loss))
    assert losses[-1] < losses[0]
    assert np.isfinite(losses).all()


def test_dryrun_multichip_entry():
    from __graft_entry__ import dryrun_multichip

    n = min(len(jax.devices()), 8)
    dryrun_multichip(n)


def test_entry_compiles():
    from __graft_entry__ import entry

    fn, args = entry()
    out = jax.jit(fn)(*args)
    # entry() runs the flagship forward on a real 512^2 watershed RAG;
    # one probability per RAG edge (exact count varies with the RAG)
    n_edges = np.asarray(args[1]).shape[0]
    assert np.asarray(out).shape == (n_edges,)
    assert n_edges > 5000
    assert np.isfinite(np.asarray(out)).all()


def test_shard_edges_real_rag():
    from glia_tpu.data.synthetic import synthetic_em_slice
    from glia_tpu.graph.rag import build_rag
    from glia_tpu.native import watershed_native

    data = synthetic_em_slice(shape=(64, 64), n_cells=12, seed=1)
    seg = watershed_native(data["pb"], 0.1)
    rag = build_rag(seg)
    mesh = make_mesh(min(len(jax.devices()), 8))
    batch = shard_edges(rag, data["pb"], mesh, max_pixels_per_edge=16)
    assert batch["px"].shape[0] % mesh.devices.size == 0
    assert batch["n_edges"] == rag.n_edges
