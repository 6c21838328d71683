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
    """Host-side routing tables for one Partition.

    Fully vectorized construction (sort/unique over (shard, region) codes)
    -- O((E + R) log) host work, no per-edge python loops, so planning
    scales to pod-sized RAGs.
    """

    def __init__(self, part: Partition, rag):
        n = part.n_shards
        R = rag.n_regions
        owner = part.region_shard.astype(np.int64)
        ui = rag.key_index(rag.edges[:, 0]).astype(np.int64)
        vi = rag.key_index(rag.edges[:, 1]).astype(np.int64)
        es = part.edge_shard.astype(np.int64)

        # unique (shard, region) touch pairs over both endpoints
        codes = np.unique(np.concatenate([es * R + ui, es * R + vi]))
        ts = codes // R           # touching shard
        tr = codes % R            # touched region
        to = owner[tr]            # region owner
        foreign = to != ts
        fs, fr, ft = ts[foreign], tr[foreign], to[foreign]
        # group by (source shard, owner shard); sorted region within group
        grp = fs * n + ft
        order = np.argsort(grp * np.int64(R) + fr, kind="stable")
        fs, fr, ft, grp = fs[order], fr[order], ft[order], grp[order]
        # slot index within each (s, t) group
        if len(grp):
            first = np.concatenate([[True], grp[1:] != grp[:-1]])
            gidx = np.cumsum(first) - 1
            starts = np.nonzero(first)[0]
            slot = np.arange(len(grp)) - starts[gidx]
            H = int(slot.max()) + 1
        else:
            slot = np.zeros(0, np.int64)
            H = 1
        H = max(H, 1)
        self.H = H
        self.n = n
        # send_ids[s, t, :]: global region ids shard s sends to owner t
        self.send_ids = np.full((n, n, H), -1, dtype=np.int32)
        self.send_ids[fs, ft, slot] = fr
        # owners' local numbering
        own_counts = np.bincount(owner, minlength=n)
        self.R_own_max = max(int(own_counts.max()) if R else 1, 1)
        oorder = np.argsort(owner, kind="stable")
        ostart = np.zeros(n + 1, np.int64)
        np.cumsum(own_counts, out=ostart[1:])
        self.own_ids = np.full((n, self.R_own_max), -1, dtype=np.int32)
        self.local_of_global = np.full(R, -1, dtype=np.int32)
        rows = owner[oorder]
        cols = np.arange(R) - ostart[rows]
        self.own_ids[rows, cols] = oorder
        self.local_of_global[oorder] = cols.astype(np.int32)
        # recv_local[t, s, :]: local row in owner t's block per recv slot;
        # phase 2 fetch uses the same id sets reversed
        self.recv_local = np.full((n, n, H), -1, dtype=np.int32)
        self.recv_local[ft, fs, slot] = self.local_of_global[fr]
        self.halo_ids = self.send_ids          # [s, t, H]: s wants these
        self.fetch_local = self.recv_local

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
    rows R_own_max + t*H + j are halo slot j from owner t.

    Vectorized via a dense [n, R] slot lookup -- fine up to millions of
    regions x tens of shards; a per-shard sorted searchsorted lookup
    replaces it beyond that.
    """
    n, H, R_own = plan.n, plan.H, plan.R_own_max
    R = rag.n_regions
    ui = rag.key_index(rag.edges[:, 0]).astype(np.int64)
    vi = rag.key_index(rag.edges[:, 1]).astype(np.int64)
    owner = part.region_shard
    slot_lut = np.full((n, R), -1, np.int64)
    s_i, t_i, j_i = np.nonzero(plan.send_ids >= 0)
    slot_lut[s_i, plan.send_ids[s_i, t_i, j_i]] = t_i * H + j_i
    u_loc = np.zeros((n, E_max), np.int32)
    v_loc = np.zeros((n, E_max), np.int32)
    for s, g in enumerate(groups):
        for arr, ridx in ((u_loc, ui[g]), (v_loc, vi[g])):
            own = owner[ridx] == s
            arr[s, : len(g)] = np.where(
                own, plan.local_of_global[ridx],
                R_own + slot_lut[s, ridx])
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
