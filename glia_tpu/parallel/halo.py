"""Halo exchange for edge-partitioned RAG aggregation.

The dense path (rag_shard.py) all_gathers the whole region table; here the
partition plan (partition.py) drives a *routing-planned* exchange that
moves only cut-region rows over the mesh -- the all-to-all halo of
BASELINE.json:

  phase 1 (reduce): each shard segment-sums its local edges into per-region
    partials, then sends the partial rows of *foreign-owned* regions to
    their owner with one ``all_to_all`` (slabs padded to the plan's max
    pair size); owners scatter-add them into their authoritative block.
  phase 2 (halo fetch): owners send authoritative rows back to every shard
    that listed them as halo, with a second ``all_to_all``.

All routing indices are computed on host from the Partition and passed as
edge-axis-sharded operands, so the device program is fully static.
"""

from __future__ import annotations

from functools import partial as _partial

import numpy as np

from .mesh import EDGE_AXIS
from .partition import Partition


class HaloPlan:
    """Host-side routing tables for one Partition."""

    def __init__(self, part: Partition, rag):
        n = part.n_shards
        R = rag.n_regions
        owner = part.region_shard
        key_index = {int(k): i for i, k in enumerate(rag.keys)}
        ui = np.array([key_index[int(a)] for a in rag.edges[:, 0]])
        vi = np.array([key_index[int(b)] for b in rag.edges[:, 1]])

        # regions each shard touches with its edges, grouped by owner
        touch = [set() for _ in range(n)]
        for e in range(rag.n_edges):
            s = part.edge_shard[e]
            touch[s].add(int(ui[e]))
            touch[s].add(int(vi[e]))
        send = [[sorted(r for r in touch[s] if owner[r] == t and t != s)
                 for t in range(n)] for s in range(n)]
        H = max((len(lst) for row in send for lst in row), default=0)
        H = max(H, 1)
        self.H = H
        self.n = n
        # send_ids[s, t, :]: global region ids shard s sends to owner t
        self.send_ids = np.full((n, n, H), -1, dtype=np.int32)
        for s in range(n):
            for t in range(n):
                ids = send[s][t]
                self.send_ids[s, t, : len(ids)] = ids
        # recv rows at owner t from source s are send_ids[s, t]; owner must
        # scatter-add them into its own block at local positions
        own_lists = [np.nonzero(owner == s)[0] for s in range(n)]
        self.R_own_max = max(max((len(o) for o in own_lists), default=1), 1)
        self.own_ids = np.full((n, self.R_own_max), -1, dtype=np.int32)
        self.local_of_global = np.full(R, -1, dtype=np.int32)
        for s in range(n):
            self.own_ids[s, : len(own_lists[s])] = own_lists[s]
            self.local_of_global[own_lists[s]] = np.arange(len(own_lists[s]))
        # recv_local[t, s, :]: local row in t's block for each recv slot
        self.recv_local = np.full((n, n, H), -1, dtype=np.int32)
        for t in range(n):
            for s in range(n):
                ids = self.send_ids[s, t]
                ok = ids >= 0
                self.recv_local[t, s, ok] = self.local_of_global[ids[ok]]
        # phase 2: shard s needs halo rows (foreign regions it touches);
        # owner t sends them -- same id sets reversed
        self.halo_ids = self.send_ids          # [s, t, H]: s wants these
        # fetch_local[t, s, :]: local rows in owner t's block to send to s
        self.fetch_local = np.full((n, n, H), -1, dtype=np.int32)
        for t in range(n):
            for s in range(n):
                ids = self.send_ids[s, t]
                ok = ids >= 0
                self.fetch_local[t, s, ok] = self.local_of_global[ids[ok]]

    @property
    def comm_rows(self) -> int:
        """Rows moved per all_to_all (both phases equal)."""
        return int((self.send_ids >= 0).sum())


def make_halo_aggregate(mesh, plan: HaloPlan, n_regions: int, n_feat: int):
    """SPMD aggregation with halo exchange.

    f(u, v, ev, send_ids, recv_local, own_ids, halo_ids, fetch_local)
      -> (own_block [R_own_max, F], halo_rows [n*H, F])
    where inputs are edge-sharded / shard-sharded as set up by
    ``shard_halo_inputs``.
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    n = plan.n
    H = plan.H

    @_partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(EDGE_AXIS), P(EDGE_AXIS), P(EDGE_AXIS, None),
                  P(EDGE_AXIS, None), P(EDGE_AXIS, None),
                  P(EDGE_AXIS), P(EDGE_AXIS, None), P(EDGE_AXIS, None)),
        out_specs=(P(EDGE_AXIS, None), P(EDGE_AXIS, None)),
    )
    def agg(u, v, ev, send_ids, recv_local, own_ids, halo_ids, fetch_local):
        send_ids = send_ids[0]      # [n, H]
        recv_local = recv_local[0]  # [n, H]
        own_ids = own_ids           # [R_own_max]
        halo_ids = halo_ids[0]
        fetch_local = fetch_local[0]
        # local partials over the global region universe
        part = jax.ops.segment_sum(ev, u, num_segments=n_regions + 1)
        part += jax.ops.segment_sum(ev, v, num_segments=n_regions + 1)
        # phase 1: send foreign partial rows to owners
        send_rows = part[jnp.maximum(send_ids.reshape(-1), 0)]
        send_rows = jnp.where((send_ids.reshape(-1) >= 0)[:, None],
                              send_rows, 0.0)
        recv_rows = jax.lax.all_to_all(
            send_rows.reshape(n, H, -1), EDGE_AXIS, split_axis=0,
            concat_axis=0, tiled=False).reshape(n * H, -1)
        # own block: own partials + received foreign partials
        own = part[jnp.maximum(own_ids, 0)]
        own = jnp.where((own_ids >= 0)[:, None], own, 0.0)
        rl = recv_local.reshape(-1)
        own = own.at[jnp.maximum(rl, 0)].add(
            jnp.where((rl >= 0)[:, None], recv_rows, 0.0))
        # phase 2: owners send authoritative rows back to halo requesters
        fl = fetch_local.reshape(-1)
        out_rows = own[jnp.maximum(fl, 0)]
        out_rows = jnp.where((fl >= 0)[:, None], out_rows, 0.0)
        halo_rows = jax.lax.all_to_all(
            out_rows.reshape(n, H, -1), EDGE_AXIS, split_axis=0,
            concat_axis=0, tiled=False).reshape(n * H, -1)
        return own, halo_rows

    return agg


def local_endpoint_indices(plan: HaloPlan, part: Partition, rag,
                           groups, E_max):
    """Per-shard local row index (into [own_block; halo_rows]) for each
    edge endpoint.  Rows 0..R_own_max-1 are the shard's own regions;
    rows R_own_max + t*H + j are halo slot j from owner t."""
    n, H, R_own = plan.n, plan.H, plan.R_own_max
    key_index = {int(k): i for i, k in enumerate(rag.keys)}
    ui = np.array([key_index[int(a)] for a in rag.edges[:, 0]], np.int64)
    vi = np.array([key_index[int(b)] for b in rag.edges[:, 1]], np.int64)
    owner = part.region_shard
    # halo slot lookup per (shard, region)
    halo_slot = [dict() for _ in range(n)]
    for s in range(n):
        for t in range(n):
            for j, r in enumerate(plan.send_ids[s, t]):
                if r >= 0:
                    halo_slot[s][int(r)] = t * H + j
    u_loc = np.zeros((n, E_max), np.int32)
    v_loc = np.zeros((n, E_max), np.int32)
    for s, g in enumerate(groups):
        for k, e in enumerate(g):
            for arr, r in ((u_loc, int(ui[e])), (v_loc, int(vi[e]))):
                if owner[r] == s:
                    arr[s, k] = plan.local_of_global[r]
                else:
                    arr[s, k] = R_own + halo_slot[s][r]
    return u_loc, v_loc


def make_halo_edge_forward(mesh, plan: HaloPlan, n_regions: int,
                           mlp_dims=(8, 16, 8)):
    """Edge scoring with the routing-planned halo instead of a dense
    all_gather (compare parallel/train.edge_forward): same math, comm
    volume ~ cut size."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    from ..models.mlp import mlp2_forward

    D, N1, N2 = mlp_dims
    n, H, R_own = plan.n, plan.H, plan.R_own_max

    @_partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(), P(EDGE_AXIS), P(EDGE_AXIS), P(EDGE_AXIS, None),
                  P(EDGE_AXIS, None), P(EDGE_AXIS),
                  P(EDGE_AXIS), P(EDGE_AXIS),
                  P(EDGE_AXIS, None), P(EDGE_AXIS, None),
                  P(EDGE_AXIS), P(EDGE_AXIS, None)),
        out_specs=P(EDGE_AXIS),
    )
    def score(w, u, v, px, px_mask, edge_valid, u_loc, v_loc,
              send_ids, recv_local, own_ids, fetch_local):
        send_ids = send_ids[0]
        recv_local = recv_local[0]
        fetch_local = fetch_local[0]
        cnt = px_mask.sum(axis=1)
        s = (px * px_mask).sum(axis=1)
        mean = s / jnp.maximum(cnt, 1.0)
        mn = jnp.where(px_mask > 0, px, jnp.inf).min(axis=1)
        mn = jnp.where(cnt > 0, mn, 0.0)
        mx = jnp.where(px_mask > 0, px, -jnp.inf).max(axis=1)
        mx = jnp.where(cnt > 0, mx, 0.0)
        msgs = jnp.stack([jnp.ones_like(mean), mean, mn, mx], axis=1)
        msgs = msgs * edge_valid[:, None]
        part_sums = jax.ops.segment_sum(msgs, u,
                                        num_segments=n_regions + 1)
        part_sums += jax.ops.segment_sum(msgs, v,
                                         num_segments=n_regions + 1)
        # reduce partials to owners
        send_rows = part_sums[jnp.maximum(send_ids.reshape(-1), 0)]
        send_rows = jnp.where((send_ids.reshape(-1) >= 0)[:, None],
                              send_rows, 0.0)
        recv_rows = jax.lax.all_to_all(
            send_rows.reshape(n, H, -1), EDGE_AXIS, split_axis=0,
            concat_axis=0, tiled=False).reshape(n * H, -1)
        own = part_sums[jnp.maximum(own_ids, 0)]
        own = jnp.where((own_ids >= 0)[:, None], own, 0.0)
        rl = recv_local.reshape(-1)
        own = own.at[jnp.maximum(rl, 0)].add(
            jnp.where((rl >= 0)[:, None], recv_rows, 0.0))
        # halo fetch
        fl = fetch_local.reshape(-1)
        out_rows = own[jnp.maximum(fl, 0)]
        out_rows = jnp.where((fl >= 0)[:, None], out_rows, 0.0)
        halo_rows = jax.lax.all_to_all(
            out_rows.reshape(n, H, -1), EDGE_AXIS, split_axis=0,
            concat_axis=0, tiled=False).reshape(n * H, -1)
        table = jnp.concatenate([own, halo_rows], axis=0)
        ru = table[u_loc]
        rv = table[v_loc]
        feats = jnp.concatenate(
            [jnp.stack([mean, mn, mx, cnt], axis=1), ru[:, :2], rv[:, :2]],
            axis=1).astype(jnp.float32)
        return mlp2_forward(w, feats, D, N1, N2)

    return score


def shard_halo_inputs(mesh, plan: HaloPlan, part: Partition, rag, ev):
    """Device-put the edge data reordered by owning shard + routing tables.

    Returns dict of sharded arrays for make_halo_aggregate, plus the edge
    permutation used (edges grouped by shard, padded per shard).
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    n = plan.n
    key_index = {int(k): i for i, k in enumerate(rag.keys)}
    ui = np.array([key_index[int(a)] for a in rag.edges[:, 0]], np.int32)
    vi = np.array([key_index[int(b)] for b in rag.edges[:, 1]], np.int32)
    ev = np.asarray(ev, np.float32)
    # group edges by shard, pad each group to E_max
    groups = [np.nonzero(part.edge_shard == s)[0] for s in range(n)]
    E_max = max(max((len(g) for g in groups), default=1), 1)
    u_p = np.full((n, E_max), rag.n_regions, np.int32)  # pad -> overflow seg
    v_p = np.full((n, E_max), rag.n_regions, np.int32)
    ev_p = np.zeros((n, E_max, ev.shape[1]), np.float32)
    for s, g in enumerate(groups):
        u_p[s, : len(g)] = ui[g]
        v_p[s, : len(g)] = vi[g]
        ev_p[s, : len(g)] = ev[g]
    shard = NamedSharding(mesh, P(EDGE_AXIS))

    def dev(x):
        return jax.device_put(jnp.asarray(x), shard)

    return {
        "u": dev(u_p.reshape(-1)),
        "v": dev(v_p.reshape(-1)),
        "ev": dev(ev_p.reshape(-1, ev.shape[1])),
        "send_ids": dev(plan.send_ids),
        "recv_local": dev(plan.recv_local),
        "own_ids": dev(plan.own_ids.reshape(-1)),
        "halo_ids": dev(plan.halo_ids),
        "fetch_local": dev(plan.fetch_local),
        "groups": groups,
        "E_max": E_max,
    }
