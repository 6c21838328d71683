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
