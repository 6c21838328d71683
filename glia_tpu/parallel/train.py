"""Sharded boundary-classifier training step.

The full train step runs under one jit over the device mesh:
  - edge data (boundary pixel blocks, endpoints, labels) is sharded over the
    ``edge`` axis (data/graph parallelism);
  - MLP parameters are replicated; GSPMD inserts the gradient psum;
  - the forward pass includes the edge->region psum_scatter aggregation and
    the all_gather halo (see rag_shard.py), so gradients flow through real
    cross-device collectives -- this is the multi-chip path the driver
    dry-runs.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.mlp import mlp2_dim, mlp2_forward, mlp2_init
from .mesh import EDGE_AXIS


MLP_DIMS = (8, 16, 8)  # D (edge feature width), N1, N2


def edge_forward(w, u, v, px, px_mask, edge_valid, n_regions_padded,
                 axis_name=None):
    """Edge scoring forward; works single-device (axis_name=None) and under
    shard_map (axis_name=EDGE_AXIS)."""
    D, N1, N2 = MLP_DIMS
    cnt = px_mask.sum(axis=1)
    s = (px * px_mask).sum(axis=1)
    mean = s / jnp.maximum(cnt, 1.0)
    mn = jnp.where(px_mask > 0, px, jnp.inf).min(axis=1)
    mn = jnp.where(cnt > 0, mn, 0.0)
    mx = jnp.where(px_mask > 0, px, -jnp.inf).max(axis=1)
    mx = jnp.where(cnt > 0, mx, 0.0)
    msgs = jnp.stack([jnp.ones_like(mean), mean, mn, mx], axis=1)
    part = jax.ops.segment_sum(
        msgs * edge_valid[:, None], u, num_segments=n_regions_padded)
    part += jax.ops.segment_sum(
        msgs * edge_valid[:, None], v, num_segments=n_regions_padded)
    if axis_name is not None:
        rblock = jax.lax.psum_scatter(part, axis_name, scatter_dimension=0,
                                      tiled=True)
        rfull = jax.lax.all_gather(rblock, axis_name, axis=0, tiled=True)
    else:
        rfull = part
    ru = rfull[u]
    rv = rfull[v]
    feats = jnp.concatenate(
        [jnp.stack([mean, mn, mx, cnt], axis=1), ru[:, :2], rv[:, :2]],
        axis=1).astype(jnp.float32)
    return mlp2_forward(w, feats, D, N1, N2)


def make_train_step(mesh: Mesh, n_regions_padded: int, lr=1e-3):
    """Returns (init_params_fn, step_fn).

    step_fn(w, opt_state, batch) -> (w, opt_state, loss); batch dict holds
    u, v, px, px_mask, edge_valid, labels, all edge-sharded.
    """
    import optax

    opt = optax.adam(lr)
    D, N1, N2 = MLP_DIMS

    def init(seed=0):
        w = jnp.asarray(mlp2_init(D, N1, N2, seed), dtype=jnp.float32)
        return w, opt.init(w)

    def loss_fn(w, u, v, px, px_mask, edge_valid, labels):
        p = edge_forward(w, u, v, px, px_mask, edge_valid,
                         n_regions_padded, axis_name=EDGE_AXIS)
        p = jnp.clip(p, 1e-7, 1 - 1e-7)
        ce = -(labels * jnp.log(p) + (1 - labels) * jnp.log(1 - p))
        ce = ce * edge_valid
        # global (cross-shard) normalized mean
        num = jax.lax.psum(ce.sum(), EDGE_AXIS)
        den = jax.lax.psum(edge_valid.sum(), EDGE_AXIS)
        return num / jnp.maximum(den, 1.0)

    @partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(), P(EDGE_AXIS), P(EDGE_AXIS), P(EDGE_AXIS, None),
                  P(EDGE_AXIS, None), P(EDGE_AXIS), P(EDGE_AXIS)),
        out_specs=(P(), P()),
    )
    def loss_and_grad(w, u, v, px, px_mask, edge_valid, labels):
        loss, g = jax.value_and_grad(loss_fn)(
            w, u, v, px, px_mask, edge_valid, labels)
        # loss/grad already psum-reduced inside loss_fn (global mean); the
        # per-shard grads differ only by local contributions -> psum them.
        g = jax.lax.psum(g, EDGE_AXIS)
        return loss, g

    @jax.jit
    def step(w, opt_state, batch):
        loss, g = loss_and_grad(
            w, batch["u"], batch["v"], batch["px"], batch["px_mask"],
            batch["edge_valid"], batch["labels"])
        updates, opt_state = opt.update(g, opt_state, w)
        w = optax.apply_updates(w, updates)
        return w, opt_state, loss

    return init, step
