"""Device classifier-in-the-loop merge engine vs the host oracle.

Parity strategy:
  1. initial candidate features (full BC width) match the host
     DynamicRagState row-for-row over every initial table pair;
  2. along the device engine's OWN merge trajectory, each emitted merge's
     probability equals the probability the host records computes for the
     same pair at the same state -- replaying the device order serially
     through DynamicRagState (features are invariant to the other merges
     of a superstep, since supersteps are conflict-free independent sets);
  3. the device engine completes the same number of merges as the host
     engine (same table-connectivity semantics).
"""

import numpy as np
import pytest
import scipy.ndimage as ndi

from glia_tpu.data.synthetic import synthetic_em_slice
from glia_tpu.features.config import FeatureConfig
from glia_tpu.graph.merge_bc import DynamicRagState, greedy_merge_bc
from glia_tpu.graph.merge_bc_device import (
    build_state,
    candidate_features,
    merge_order_bc_device,
)
from glia_tpu.graph.rag import build_rag
from glia_tpu.native import watershed_native


@pytest.fixture(scope="module")
def case():
    data = synthetic_em_slice(shape=(48, 48), n_cells=8, seed=77)
    seg = watershed_native(ndi.gaussian_filter(data["pb"], 1.0), level=0.02)
    rag = build_rag(seg, contour_only=False)
    cfg = FeatureConfig.standard(data["pb"], data["intensity"],
                                 n_bins=8, boundary_thresholds=(0.3, 0.6))
    return data, seg, rag, cfg


def _linear_predict_np(W):
    def f(X):
        X = np.atleast_2d(np.asarray(X, dtype=np.float64))
        z = X @ W[:-1] + W[-1]
        return 1.0 / (1.0 + np.exp(-z))
    return f


def _linear_predict_jax(W):
    import jax.numpy as jnp

    Wd = jnp.asarray(W)

    def f(X):
        z = X @ Wd[:-1] + Wd[-1]
        return 1.0 / (1.0 + jnp.exp(-z))
    return f


def test_initial_candidate_features_match_host(case):
    data, seg, rag, cfg = case
    state_np, static = build_state(rag, cfg)
    import jax.numpy as jnp

    state = {k: jnp.asarray(v) for k, v in state_np.items()}
    feats, valid = candidate_features(state, static)
    feats = np.asarray(feats)
    valid = np.asarray(valid)

    host = DynamicRagState(rag, cfg)
    eu = np.asarray(state_np["eu"])
    ev = np.asarray(state_np["ev"])
    n_checked = 0
    for e in np.nonzero(valid)[0]:
        k0 = int(rag.keys[eu[e]])
        k1 = int(rag.keys[ev[e]])
        hf = host.candidate_features(k0, k1)
        np.testing.assert_allclose(
            feats[e], hf, rtol=1e-9, atol=1e-9,
            err_msg=f"edge {e} = ({k0},{k1})")
        n_checked += 1
    assert n_checked == int(valid.sum()) and n_checked > 10
    # table membership matches the host's initial table
    host_pairs = {(min(a, b), max(a, b))
                  for (a, b) in host.entries
                  if (b, a) in host.entries}
    dev_pairs = {(int(rag.keys[eu[e]]), int(rag.keys[ev[e]]))
                 for e in np.nonzero(valid)[0]}
    assert dev_pairs == host_pairs


def test_device_trajectory_probabilities_match_host(case):
    data, seg, rag, cfg = case
    state_np, static = build_state(rag, cfg)
    rng = np.random.default_rng(5)
    W = rng.normal(0, 0.05, static.feat_dim + 1)

    order, probs = merge_order_bc_device(
        rag, cfg, _linear_predict_jax(W))
    assert len(order) > 0

    # serial replay through the host state: each merge's features at its
    # merge time must reproduce the recorded probability
    host = DynamicRagState(rag, cfg)
    pred = _linear_predict_np(W)
    for i, (c0, c1, c2) in enumerate(order):
        hf = host.candidate_features(int(c0), int(c1))
        hp = float(pred(hf)[0])
        np.testing.assert_allclose(probs[i], hp, rtol=1e-6, atol=1e-9,
                                   err_msg=f"merge {i}: {(c0, c1, c2)}")
        host.merge(int(c0), int(c1), int(c2))

    # completes exactly as many merges as the host engine
    h_order, h_sals = greedy_merge_bc(rag, cfg, pred)
    assert len(order) == len(h_order)


def test_device_engine_median_and_per_image_bins(case):
    """Engine parity under the widest feature config the host accepts:
    median_as_feats (exact device medians via counting hists over the
    quantized images' distinct values) + independent hist bins/ranges per
    image (main_bc_feat.cxx:125-186 quadruples)."""
    from glia_tpu.features.config import HistImage

    data, seg, rag, _ = case
    # quantize so device medians are exact (<=33 distinct values)
    q = lambda a, k: np.round(np.asarray(a) * k) / k
    pb_q = q(data["pb"], 32)
    in_q = q(data["intensity"], 24)
    cfg = FeatureConfig(
        pb_image=data["pb"],
        r_images=[HistImage(pb_q, 6, (0.0, 1.0), "pb"),
                  HistImage(in_q, 10, (0.0, 1.0), "in")],
        rl_images=[],
        b_images=[HistImage(in_q, 9, (0.0, 1.0), "in"),
                  HistImage(pb_q, 5, (0.0, 1.0), "pb")],
        boundary_thresholds=[0.3, 0.6],
        normalizing_area=4.0, normalizing_length=2.0,
        histogram_as_feats=True, median_as_feats=True,
    )
    state_np, static = build_state(rag, cfg)
    import jax.numpy as jnp

    state = {k: jnp.asarray(v) for k, v in state_np.items()}
    feats, valid = candidate_features(state, static)
    feats = np.asarray(feats)
    host = DynamicRagState(rag, cfg)
    eu = np.asarray(state_np["eu"])
    ev = np.asarray(state_np["ev"])
    for e in np.nonzero(np.asarray(valid))[0][:40]:
        k0 = int(rag.keys[eu[e]])
        k1 = int(rag.keys[ev[e]])
        hf = host.candidate_features(k0, k1)
        np.testing.assert_allclose(feats[e], hf, rtol=1e-9, atol=1e-9,
                                   err_msg=f"edge ({k0},{k1})")

    # trajectory parity: replay device merges through the host state
    rng = np.random.default_rng(11)
    W = rng.normal(0, 0.05, static.feat_dim + 1)
    order, probs = merge_order_bc_device(rag, cfg, _linear_predict_jax(W))
    assert len(order) > 0
    pred = _linear_predict_np(W)
    for i, (c0, c1, c2) in enumerate(order[:60]):
        hf = host.candidate_features(int(c0), int(c1))
        np.testing.assert_allclose(probs[i], float(pred(hf)[0]),
                                   rtol=1e-6, atol=1e-9)
        host.merge(int(c0), int(c1), int(c2))


def test_device_vs_host_full_merge_structure(case):
    """Both engines fully merge each table-connected component; the final
    partitions agree."""
    data, seg, rag, cfg = case
    rng = np.random.default_rng(9)
    W = rng.normal(0, 0.05, 1 + __import__(
        "glia_tpu.graph.merge_bc_device", fromlist=["bc_feat_dim"]
    ).bc_feat_dim(cfg, 2))

    order_d, _ = merge_order_bc_device(rag, cfg, _linear_predict_jax(W))
    order_h, _ = greedy_merge_bc(rag, cfg, _linear_predict_np(W))

    from glia_tpu.graph.merge import apply_merge_order

    seg_d = apply_merge_order(seg, order_d)
    seg_h = apply_merge_order(seg, order_h)
    # same partition => identical label-to-label contingency
    _, inv_d = np.unique(seg_d, return_inverse=True)
    _, inv_h = np.unique(seg_h, return_inverse=True)
    assert (inv_d == inv_h).all()
