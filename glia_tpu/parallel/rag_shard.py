"""Edge-partitioned RAG aggregation across a device mesh.

BASELINE.json's scaling mandate: partition RAG *edges* across chips and
aggregate per-region boundary statistics with collectives riding ICI.  The
pattern (SPMD, under shard_map):

  1. each shard segment-reduces its local edges into a full-width region
     accumulator [R_pad, F]  (local gather/scatter = the SpMM half);
  2. a single ``psum_scatter`` over the mesh axis both sums the partial
     accumulators and leaves each device with its own region block --
     the communication-optimal reduce for edge cuts (replaces a naive
     all-reduce; moves R_pad/n per device instead of R_pad);
  3. region-level results needed back at the edges (e.g. region context
     features for the boundary classifier) return via ``all_gather`` of the
     region blocks (the halo exchange; only cut regions are strictly needed,
     the dense block exchange is the simple correct superset).

The reference has no distributed backend at all (SURVEY.md section 2.8);
this module is the designed-fresh equivalent of its OpenMP parfor over
boundaries (code/util/mp.hxx:25-44).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import EDGE_AXIS, pad_to_multiple


def shard_edges(rag, pb_image, mesh: Mesh, max_pixels_per_edge=32):
    """Host-side prep: pack per-edge boundary-pixel values into a dense
    [E_pad, K] tensor (+mask) and shard over the mesh's edge axis.

    Returns dict of device arrays: u, v (int32 [E_pad]), px ([E_pad, K]),
    px_mask ([E_pad, K]), edge_valid ([E_pad]), n_edges, n_regions.
    """
    from ..ops.pack import pack_edge_pixels

    n_dev = mesh.devices.size
    E = rag.n_edges
    u, v, px, mask = pack_edge_pixels(rag, pb_image, max_pixels_per_edge)

    u, _ = pad_to_multiple(u, n_dev)
    v, _ = pad_to_multiple(v, n_dev)
    px, _ = pad_to_multiple(px, n_dev)
    mask, _ = pad_to_multiple(mask, n_dev)
    valid = np.zeros(len(u), dtype=np.float32)
    valid[:E] = 1.0

    shard = NamedSharding(mesh, P(EDGE_AXIS))
    dev = lambda x: jax.device_put(x, shard)
    return {
        "u": dev(u), "v": dev(v), "px": dev(px), "px_mask": dev(mask),
        "edge_valid": dev(valid), "n_edges": E, "n_regions": rag.n_regions,
    }


def make_region_aggregate(mesh: Mesh, n_regions_padded: int):
    """Build the SPMD edge->region aggregation function.

    f(u, v, edge_vals [E_loc, F]) -> region block [R_pad/n_dev, F] per device
    (region-sharded sums over incident edges, both endpoints).
    """
    n_dev = mesh.devices.size
    assert n_regions_padded % n_dev == 0

    @partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(EDGE_AXIS), P(EDGE_AXIS), P(EDGE_AXIS, None)),
        out_specs=P(EDGE_AXIS, None),
    )
    def agg(u, v, ev):
        part = jax.ops.segment_sum(ev, u, num_segments=n_regions_padded)
        part += jax.ops.segment_sum(ev, v, num_segments=n_regions_padded)
        # sum partials across shards; each device keeps its region block
        return jax.lax.psum_scatter(part, EDGE_AXIS, scatter_dimension=0,
                                    tiled=True)

    return agg


def make_edge_scoring_step(mesh: Mesh, n_regions_padded: int,
                           mlp_dims=(8, 16, 8)):
    """Full edge-scoring forward (the flagship inference step):

    boundary-pixel segment stats -> edge features -> region context via
    psum_scatter aggregation -> all_gather halo -> gather back to edges ->
    MLP2 merge probabilities.  Everything jit/shard_map under the mesh.
    """
    from ..models.mlp import mlp2_forward

    D, N1, N2 = mlp_dims
    n_dev = mesh.devices.size
    agg_inner_dims = 4  # features aggregated to regions

    @partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(EDGE_AXIS), P(EDGE_AXIS), P(EDGE_AXIS, None),
                  P(EDGE_AXIS, None), P(EDGE_AXIS), P()),
        out_specs=P(EDGE_AXIS),
    )
    def score(u, v, px, px_mask, edge_valid, w):
        # per-edge boundary stats (mean/min/max/count) from padded pixels
        cnt = px_mask.sum(axis=1)
        s = (px * px_mask).sum(axis=1)
        mean = s / jnp.maximum(cnt, 1.0)
        big = jnp.where(px_mask > 0, px, jnp.inf).min(axis=1)
        mn = jnp.where(cnt > 0, big, 0.0)
        mx = jnp.where(px_mask > 0, px, -jnp.inf).max(axis=1)
        mx = jnp.where(cnt > 0, mx, 0.0)
        # edge messages -> region context (degree, sum-mean, min, max)
        msgs = jnp.stack([jnp.ones_like(mean), mean, mn, mx], axis=1)
        part = jax.ops.segment_sum(
            msgs * edge_valid[:, None], u, num_segments=n_regions_padded)
        part += jax.ops.segment_sum(
            msgs * edge_valid[:, None], v, num_segments=n_regions_padded)
        rblock = jax.lax.psum_scatter(part, EDGE_AXIS,
                                      scatter_dimension=0, tiled=True)
        # halo: bring full region table back to every device
        rfull = jax.lax.all_gather(rblock, EDGE_AXIS, axis=0, tiled=True)
        ru = rfull[u]
        rv = rfull[v]
        feats = jnp.concatenate(
            [jnp.stack([mean, mn, mx, cnt], axis=1), ru[:, :2], rv[:, :2]],
            axis=1)  # D = 8
        return mlp2_forward(w, feats.astype(jnp.float32), D, N1, N2)

    return score
