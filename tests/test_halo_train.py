"""Full-width halo train step: routing-planned exchange vs dense oracle."""

import numpy as np
import pytest

import jax

from glia_tpu.data.synthetic import synthetic_em_slice
from glia_tpu.graph.rag import build_rag
from glia_tpu.native import watershed_native
from glia_tpu.parallel.halo import HaloPlan
from glia_tpu.parallel.mesh import make_mesh
from glia_tpu.parallel.partition import partition_rag
from glia_tpu.parallel.train import (
    halo_feat_dims,
    make_halo_train_step,
    shard_halo_train_inputs,
)

needs_8 = pytest.mark.skipif(len(jax.devices()) < 8,
                             reason="needs 8 virtual devices")

K, BINS = 16, 8


@pytest.fixture(scope="module")
def setup():
    import scipy.ndimage as ndi

    data = synthetic_em_slice((96, 96), n_cells=24, seed=44)
    seg = watershed_native(ndi.gaussian_filter(data["pb"], 1.0), 0.01)
    rag = build_rag(seg, contour_only=False)
    part = partition_rag(rag, 8)
    plan = HaloPlan(part, rag)
    rng = np.random.default_rng(0)
    labels = rng.integers(0, 2, rag.n_edges).astype(np.float32)
    images = [data["pb"], data["intensity"]]
    return data, rag, part, plan, images, labels


def _oracle_loss(rag, images, labels, w, n1, n2):
    """Single-host numpy re-computation of the halo step's forward+CE."""
    from glia_tpu.models.mlp import mlp2_forward
    from glia_tpu.ops.pack import pack_csr_values

    import jax.numpy as jnp

    E = rag.n_edges
    px = np.stack([pack_csr_values(
        np.asarray(img, np.float32).ravel()[rag.edge_pixels],
        rag.edge_ptr, K)[0] for img in images], axis=1)
    mask = pack_csr_values(np.ones(len(rag.edge_pixels), np.float32),
                           rag.edge_ptr, K)[1]
    cnt = mask.sum(axis=1)
    den = np.maximum(cnt, 1.0)
    m = mask[:, None, :]
    mean = (px * m).sum(2) / den[:, None]
    var = np.maximum((px * px * m).sum(2) / den[:, None] - mean ** 2, 0.0)
    std = np.sqrt(var)
    mn = np.where(m > 0, px, np.inf).min(2)
    mn = np.where(cnt[:, None] > 0, mn, 0.0)
    mx = np.where(m > 0, px, -np.inf).max(2)
    mx = np.where(cnt[:, None] > 0, mx, 0.0)
    bins = np.clip((px * BINS).astype(np.int64), 0, BINS - 1)
    hist = np.zeros((E, len(images), BINS), np.float64)
    for i in range(len(images)):
        for b in range(BINS):
            hist[:, i, b] = ((bins[:, i, :] == b) * mask).sum(1)
    hist /= den[:, None, None]
    per_img = np.concatenate(
        [np.stack([mean, std, mn, mx], axis=2), hist], axis=2)
    feats_e = np.concatenate([per_img.reshape(E, -1), cnt[:, None]], axis=1)
    msgs = np.concatenate([np.ones((E, 1)), feats_e], axis=1)
    ui = rag.key_index(rag.edges[:, 0])
    vi = rag.key_index(rag.edges[:, 1])
    table = np.zeros((rag.n_regions, msgs.shape[1]))
    np.add.at(table, ui, msgs)
    np.add.at(table, vi, msgs)
    # signed log1p on the context sums (parallel/train._log_compress)
    table = np.sign(table) * np.log1p(np.abs(table))
    feats = np.concatenate([feats_e, table[ui], table[vi]], axis=1)
    edge_w, D = halo_feat_dims(len(images), BINS)
    assert feats.shape[1] == D
    p = np.asarray(mlp2_forward(jnp.asarray(w),
                                jnp.asarray(feats, jnp.float32), D, n1, n2))
    p = np.clip(p, 1e-7, 1 - 1e-7)
    ce = -(labels * np.log(p) + (1 - labels) * np.log(1 - p))
    return float(ce.mean())


@needs_8
def test_halo_train_step_matches_dense_oracle(setup):
    data, rag, part, plan, images, labels = setup
    mesh = make_mesh(8)
    init, step, (edge_w, D) = make_halo_train_step(
        mesh, plan, rag.n_regions, n_images=2, k_pixels=K, n_bins=BINS,
        n1=16, n2=8)
    batch = shard_halo_train_inputs(mesh, plan, part, rag, images, labels,
                                    k_pixels=K, n_bins=BINS)
    w, opt_state = init()
    w0 = np.asarray(w).copy()
    w, opt_state, loss = step(w, opt_state, batch)
    loss = float(loss)
    want = _oracle_loss(rag, images, labels, w0, 16, 8)
    np.testing.assert_allclose(loss, want, rtol=1e-4)

    # a few more steps decrease the loss (gradients flow through the halo)
    for _ in range(10):
        w, opt_state, loss2 = step(w, opt_state, batch)
    assert float(loss2) < loss


@needs_8
def test_halo_comm_volume_below_dense(setup):
    data, rag, part, plan, images, labels = setup
    # ragged halo moves comm_rows rows per phase; dense all_gather moves
    # R rows per device -> 8R total
    dense_rows = 8 * rag.n_regions
    assert plan.comm_rows < dense_rows
