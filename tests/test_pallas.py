"""Pallas kernel tests (interpret mode on CPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from glia_tpu.ops.pallas.segment_csr import segment_sum_auto, segment_sum_pallas


def test_segment_sum_pallas_matches_xla(rng):
    B, F, S = 1000, 4, 37
    vals = rng.random((B, F)).astype(np.float32)
    segs = rng.integers(0, S, B).astype(np.int32)
    got = np.asarray(segment_sum_pallas(jnp.asarray(vals),
                                        jnp.asarray(segs), S,
                                        chunk=256, interpret=True))
    want = np.zeros((S, F), np.float32)
    np.add.at(want, segs, vals)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_segment_sum_pallas_1d(rng):
    vals = rng.random(500).astype(np.float32)
    segs = rng.integers(0, 10, 500).astype(np.int32)
    got = np.asarray(segment_sum_pallas(jnp.asarray(vals),
                                        jnp.asarray(segs), 10,
                                        chunk=128, interpret=True))
    want = np.bincount(segs, weights=vals, minlength=10)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_segment_sum_drops_padding(rng):
    vals = np.ones(10, np.float32)
    segs = np.array([0, 1, 2, 3, 4, 5, 5, 5, 9, 9], np.int32)
    segs_pad = segs.copy()
    segs_pad[5:] = 10  # out of range -> dropped
    got = np.asarray(segment_sum_pallas(jnp.asarray(vals),
                                        jnp.asarray(segs_pad), 10,
                                        chunk=8, interpret=True))
    assert got.sum() == 5


def test_segment_sum_auto_cpu(rng):
    vals = rng.random(100).astype(np.float32)
    segs = rng.integers(0, 7, 100).astype(np.int32)
    got = np.asarray(segment_sum_auto(jnp.asarray(vals),
                                      jnp.asarray(segs), 7))
    want = np.bincount(segs, weights=vals, minlength=7)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_forest_pallas_matches_host(rng):
    """Pallas lock-step forest walk == host classForest-semantics oracle
    (vote fractions, descend left iff x <= split; rf.hxx:362-372)."""
    from glia_tpu.models.forest import predict_votes_np, train_forest
    from glia_tpu.ops.pallas.forest import make_forest_votes_pallas

    X = rng.random((300, 7)).astype(np.float32)
    y = ((X[:, 0] + 0.3 * X[:, 3] > 0.6) | (X[:, 5] > 0.9)).astype(np.int32)
    model = train_forest(X, y, n_trees=11, seed=3)

    want = predict_votes_np(model, X)
    fn = make_forest_votes_pallas(model, block_b=128, interpret=True)
    got = np.asarray(fn(jnp.asarray(X)))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_forest_pallas_blocked_batch(rng):
    """Batch not a multiple of block_b; multi-block grid accumulation."""
    from glia_tpu.models.forest import predict_votes_np, train_forest
    from glia_tpu.ops.pallas.forest import make_forest_votes_pallas

    X = rng.random((333, 5)).astype(np.float32)
    y = (X.sum(axis=1) > 2.5).astype(np.int32)
    model = train_forest(X, y, n_trees=5, seed=1)

    want = predict_votes_np(model, X)
    fn = make_forest_votes_pallas(model, block_b=128, interpret=True)
    got = np.asarray(fn(jnp.asarray(X)))
    np.testing.assert_allclose(got, want, atol=1e-6)
