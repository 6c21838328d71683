"""On-device greedy merge engines (JAX, TPU-native).

The reference's hot loop is a serial priority queue
(code/type/boundary_table.hxx:122-167).  Two device formulations:

  - ``merge_serial_device`` (exact mode): a ``lax.while_loop`` whose body is
    argmin + masked rekey + scatter-combine, all fixed-shape vector ops over
    the edge arrays.  For the pooled-mean policy this reproduces the host
    engine's merge order bit-for-bit (each combine adds exactly two f64
    operands; addition is commutative) apart from saliency *ties*, where the
    device breaks ties by lowest edge index instead of the reference
    multimap's latest-inserted-first.

  - ``merge_batched_device`` (speed mode): supersteps that merge every edge
    which is the strict minimum of BOTH its endpoints' incident edges -- a
    conflict-free independent set, found and applied with segment
    reductions; all remaining edges are rekeyed and deduplicated by one
    sort per superstep.  O(log) supersteps on typical RAGs instead of N-1
    serial pops; the order differs from serial greedy but merges the same
    weak-boundary structure (VI parity is checked statistically in tests).

Both operate on dense region indices [0, R); merged regions get fresh ids
R, R+1, ... so the emitted order aligns with the reference's key scheme
when composed with the RAG's key table.
"""

from __future__ import annotations

import os

import numpy as np


def _env_flag(name):
    """Parse an env toggle as a boolean ('', '0', 'false', 'no' = off)."""
    return os.environ.get(name, "").strip().lower() not in (
        "", "0", "false", "no", "off")


def _pack64_enabled():
    """Packed emission-sort key (hop, vid) -> one i32 operand (round-5
    roofline lever; i64 packing is NOT available on TPU where x64 is
    disabled, so only i32-safe packs are used).  Default ON;
    GLIA_MERGE_NOPACK64=1 restores the round-4 4-operand sort for A/B."""
    return not _env_flag("GLIA_MERGE_NOPACK64")


def edge_mean_arrays(rag, pb_image):
    """Per-edge (sum, count) of boundary pb + dense endpoint indices."""
    pb = np.asarray(pb_image, dtype=np.float64).ravel()
    E = rag.n_edges
    eid = np.repeat(np.arange(E), np.diff(rag.edge_ptr))
    s = np.bincount(eid, weights=pb[rag.edge_pixels], minlength=E)
    c = np.diff(rag.edge_ptr).astype(np.float64)
    u = rag.key_index(rag.edges[:, 0]).astype(np.int32)
    v = rag.key_index(rag.edges[:, 1]).astype(np.int32)
    return u, v, s, c


def merge_serial_device(u, v, s, c, n_regions, dtype=None):
    """Exact serial greedy mean-policy merge on device.

    Returns (order [n_merges, 3] int32 dense-index triples, saliencies,
    n_merges).  order rows beyond n_merges are -1.
    """
    import jax
    import jax.numpy as jnp

    E = len(u)
    R = int(n_regions)
    max_m = max(R - 1, 1)
    n_ids = R + max_m
    if dtype is None:
        dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32

    u0 = jnp.asarray(u, jnp.int32)
    v0 = jnp.asarray(v, jnp.int32)
    s0 = jnp.asarray(s, dtype)
    c0 = jnp.asarray(c, dtype)
    alive0 = jnp.ones(E, bool)
    order0 = jnp.full((max_m, 3), -1, jnp.int32)
    sal0 = jnp.zeros(max_m, dtype)
    idx = jnp.arange(E, dtype=jnp.int32)

    def cond(state):
        i, u, v, s, c, alive, order, sal = state
        return (i < max_m) & alive.any()

    def body(state):
        i, u, v, s, c, alive, order, sal = state
        stat = jnp.where(alive, s / jnp.maximum(c, 1.0),
                         jnp.asarray(jnp.inf, s.dtype))
        e = jnp.argmin(stat).astype(jnp.int32)
        a = u[e]
        b = v[e]
        r2 = (R + i).astype(jnp.int32)
        order = order.at[i].set(jnp.stack([a, b, r2]))
        sal = sal.at[i].set(-stat[e])
        alive = alive & (idx != e)
        touch = alive & ((u == a) | (u == b) | (v == a) | (v == b))
        u = jnp.where(touch & ((u == a) | (u == b)), r2, u)
        v = jnp.where(touch & ((v == a) | (v == b)), r2, v)
        # normalize so partner is the non-r2 endpoint
        partner = jnp.where(u == r2, v, u)
        # combine duplicates: canonical edge = lowest index per partner
        can = jnp.full(n_ids, E, jnp.int32)
        can = can.at[partner].min(jnp.where(touch, idx, E))
        is_can = touch & (can[partner] == idx)
        s_tot = jax.ops.segment_sum(jnp.where(touch, s, 0.0), partner,
                                    num_segments=n_ids)
        c_tot = jax.ops.segment_sum(jnp.where(touch, c, 0.0), partner,
                                    num_segments=n_ids)
        s = jnp.where(is_can, s_tot[partner], s)
        c = jnp.where(is_can, c_tot[partner], c)
        alive = alive & (~touch | is_can)
        return i + 1, u, v, s, c, alive, order, sal

    @jax.jit
    def run(u0, v0, s0, c0):
        return jax.lax.while_loop(
            cond, body,
            (jnp.int32(0), u0, v0, s0, c0, alive0, order0, sal0))

    i, *_, order, sal = run(u0, v0, s0, c0)
    return order, sal, int(i)


def edge_hist_arrays(rag, pb_image, n_bins=32, lo=0.0, hi=1.0):
    """Per-edge boundary-pb histogram sketch [E, n_bins] + endpoints.

    The histogram is the mergeable sketch for the approx-median policy
    (SURVEY hard part #2): histograms add under splicing, and the upper
    median is read off the cumulative counts to bin resolution.
    """
    pb = np.asarray(pb_image, dtype=np.float64).ravel()
    E = rag.n_edges
    eid = np.repeat(np.arange(E), np.diff(rag.edge_ptr))
    vals = pb[rag.edge_pixels]
    bins = np.clip(((vals - lo) / (hi - lo) * n_bins).astype(np.int64),
                   0, n_bins - 1)
    h = np.zeros((E, n_bins))
    np.add.at(h, (eid, bins), 1.0)
    u = rag.key_index(rag.edges[:, 0]).astype(np.int32)
    v = rag.key_index(rag.edges[:, 1]).astype(np.int32)
    return u, v, h


def hist_median_stat(h, lo=0.0, hi=1.0):
    """Approx upper median from histogram rows: bin center of the first
    bin whose cumulative count exceeds n//2 (amedian = sorted[n//2])."""
    import jax.numpy as jnp

    n_bins = h.shape[-1]
    cnt = h.sum(axis=-1)
    k = cnt // 2.0
    cum = jnp.cumsum(h, axis=-1)
    idx = jnp.argmax(cum > k[..., None], axis=-1)
    width = (hi - lo) / n_bins
    return lo + (idx + 0.5) * width


def _build_chunk_fn(stat_fn, E, R, chunk, select_rounds, dtype,
                    payload_struct):
    """Compile (and cache) a ``chunk``-superstep merge program for edge
    capacity E.  State threads through so the host driver can compact the
    alive edges into a smaller capacity between chunks."""
    import jax
    import jax.numpy as jnp

    key = (stat_fn, E, R, chunk, select_rounds, str(dtype), payload_struct)
    fn = _JIT_CACHE.get(key)
    if fn is not None:
        return fn

    max_m = max(R - 1, 1)
    n_ids = R + max_m
    idx = jnp.arange(E, dtype=jnp.int32)
    BIG = jnp.asarray(jnp.inf, dtype)

    def cond(state):
        step, n_m, u, v, payload, alive, order, sal = state
        return (step < chunk) & alive.any() & (n_m < max_m)

    def body(state):
        step, n_m, u, v, payload, alive, order, sal = state
        stat = jnp.where(alive, stat_fn(payload), BIG)
        # per-region minimum incident edge, ties by lowest edge index.
        # Two-stage int32 scatter-min (no int64 needed on TPU): first the
        # min stat bits per region (IEEE bits are monotonic for floats>=0),
        # then min edge index among the min-stat edges.
        bits = jax.lax.bitcast_convert_type(
            stat.astype(jnp.float32), jnp.int32)
        big32 = jnp.int32(2 ** 31 - 1)
        bits = jnp.where(alive, bits, big32)
        # Optional multi-round maximal matching (select_rounds > 1) merges
        # more edges per superstep but lets non-locally-minimal edges jump
        # the queue, which degrades monotonized threshold-cut parity --
        # keep 1 for parity-grade hierarchies.
        is_merge = jnp.zeros(E, bool)
        free = jnp.ones(n_ids, bool)
        for _ in range(select_rounds):
            eligible = alive & ~is_merge & free[u] & free[v]
            b = jnp.where(eligible, bits, big32)
            rbits = jnp.full(n_ids, big32, jnp.int32)
            rbits = rbits.at[u].min(b)
            rbits = rbits.at[v].min(b)
            cand = eligible & (rbits[u] == b) & (rbits[v] == b)
            ridx = jnp.full(n_ids, E, jnp.int32)
            ridx = ridx.at[u].min(jnp.where(cand, idx, E))
            ridx = ridx.at[v].min(jnp.where(cand, idx, E))
            new = cand & (ridx[u] == idx) & (ridx[v] == idx)
            is_merge = is_merge | new
            if select_rounds > 1:
                occ = jnp.zeros(n_ids, jnp.int32)
                occ = occ.at[u].max(new.astype(jnp.int32))
                occ = occ.at[v].max(new.astype(jnp.int32))
                free = free & (occ == 0)
        # assign fresh ids in edge order
        rank = jnp.cumsum(is_merge.astype(jnp.int32)) - 1
        ok = is_merge & (n_m + rank < max_m)
        n_new = ok.sum().astype(jnp.int32)
        r2 = (R + n_m + rank).astype(jnp.int32)
        # record into a padded buffer (overflow slot = max_m, dropped)
        rows = jnp.stack([u, v, r2], axis=1)
        slot = jnp.where(ok, n_m + rank, max_m)
        order_pad = jnp.concatenate(
            [order, jnp.full((1, 3), -1, jnp.int32)], axis=0)
        order = order_pad.at[slot].set(
            jnp.where(ok[:, None], rows, -1))[:max_m]
        sal_pad = jnp.concatenate([sal, jnp.zeros(1, sal.dtype)])
        sal = sal_pad.at[slot].set(jnp.where(ok, -stat, 0.0))[:max_m]
        # relabel: lut over region ids (padded sentinel slot n_ids)
        lut = jnp.arange(n_ids + 1, dtype=jnp.int32)
        src_u = jnp.where(ok, u, n_ids)
        src_v = jnp.where(ok, v, n_ids)
        lut = lut.at[src_u].set(jnp.where(ok, r2, n_ids))
        lut = lut.at[src_v].set(jnp.where(ok, r2, n_ids))
        u = lut[u]
        v = lut[v]
        alive = alive & ~ok & (u != v)
        # dedupe duplicate pairs: sort only (lo, hi, iota) and permute all
        # payloads by gather; then segment-combine runs of equal pairs
        lo_k = jnp.where(alive, jnp.minimum(u, v), jnp.int32(n_ids))
        hi_k = jnp.where(alive, jnp.maximum(u, v), idx)
        lo_s, hi_s, perm = jax.lax.sort((lo_k, hi_k, idx), num_keys=2)
        u = jnp.take(u, perm)
        v = jnp.take(v, perm)
        alive_s = jnp.take(alive, perm)
        payload = tuple(jnp.take(p, perm, axis=0) for p in payload)
        first = jnp.concatenate(
            [jnp.ones(1, bool),
             (lo_s[1:] != lo_s[:-1]) | (hi_s[1:] != hi_s[:-1])])
        seg_id = jnp.cumsum(first.astype(jnp.int32)) - 1
        keep = first & alive_s
        combined = []
        for p in payload:
            pz = jnp.where(
                alive_s[:, None] if p.ndim == 2 else alive_s, p, 0.0)
            p_seg = jax.ops.segment_sum(pz, seg_id, num_segments=E)
            combined.append(jnp.where(
                keep[:, None] if p.ndim == 2 else keep, p_seg[seg_id], p))
        payload = tuple(combined)
        alive = alive_s & keep
        n_m = jnp.minimum(n_m + n_new, max_m)
        return step + 1, n_m, u, v, payload, alive, order, sal

    def run(u0, v0, payload0, alive_in, n_m0, order_in, sal_in):
        return jax.lax.while_loop(
            cond, body,
            (jnp.int32(0), n_m0, u0, v0, payload0, alive_in, order_in,
             sal_in))

    fn = jax.jit(run)
    _JIT_CACHE[key] = fn
    return fn


def _superstep_merge_core(u, v, payload, stat_fn, n_regions,
                          max_supersteps, dtype, select_rounds=1,
                          chunk=6, stats=None):
    """Shared batched-superstep merge loop (speed mode).

    Each superstep merges all edges that are the (index-tiebroken) minimum
    of BOTH endpoints' incident edges -- a conflict-free independent set --
    then relabels endpoints and combines duplicate pairs.  ``payload`` is a
    tuple of per-edge arrays ([E] or [E, W]) that combine ADDITIVELY under
    edge splicing (boundary_table.hxx:122-167's pixel-list splice becomes a
    segment-sum of mergeable sketches); ``stat_fn(payload) -> stat [E]``
    maps the sketch to the (non-negative) merge statistic.

    Two cost controls for the TPU remote-compile tunnel:
      - the dedupe sorts ONLY (lo, hi, iota) -- three int32 operands --
        and moves payloads by gathers (wide variadic sorts blow up compile
        time; round-1 lesson, RESULTS.md);
      - supersteps run in ``chunk``-sized compiled pieces, and between
        chunks the host COMPACTS the surviving edges into the next
        power-of-two capacity: alive counts shrink geometrically with
        merges, so tail supersteps run on tiny arrays instead of paying
        full-E sorts ~R/4 times.  Each capacity compiles once per process.

    Returns (order [max_m, 3] int32, saliencies=-stat, n_merges).
    """
    import jax
    import jax.numpy as jnp

    E = len(u)
    R = int(n_regions)
    max_m = max(R - 1, 1)

    payload0 = tuple(jnp.asarray(p, dtype) for p in payload)
    struct = tuple((len(p.shape), str(p.dtype)) for p in payload0)
    u_d = jnp.asarray(u, jnp.int32)
    v_d = jnp.asarray(v, jnp.int32)
    alive_d = jnp.ones(E, bool)
    order_d = jnp.full((max_m, 3), -1, jnp.int32)
    sal_d = jnp.zeros(max_m, dtype)
    payload_d = payload0
    n_m = jnp.int32(0)
    total_steps = 0
    cap = E
    buckets = [E]

    while total_steps < max_supersteps:
        fn = _build_chunk_fn(stat_fn, cap, R,
                             min(chunk, max_supersteps - total_steps),
                             select_rounds, dtype, struct)
        st = fn(u_d, v_d, payload_d, alive_d, n_m, order_d, sal_d)
        step_done, n_m, u_d, v_d, payload_d, alive_d, order_d, sal_d = st
        total_steps += int(step_done)
        if int(n_m) >= max_m:
            break
        alive_h = np.asarray(alive_d)
        n_alive = int(alive_h.sum())
        if n_alive == 0:
            break
        # compact: stable-partition alive edges to the front, shrink to
        # the next power-of-two capacity (>= 256 to bound compile count)
        new_cap = max(256, 1 << int(np.ceil(np.log2(max(n_alive, 1)))))
        if new_cap < cap:
            perm = np.argsort(~alive_h, kind="stable")[:new_cap]
            u_d = jnp.asarray(np.asarray(u_d)[perm])
            v_d = jnp.asarray(np.asarray(v_d)[perm])
            payload_d = tuple(jnp.asarray(np.asarray(p)[perm])
                              for p in payload_d)
            alive_d = jnp.asarray(alive_h[perm])
            cap = new_cap
            buckets.append(cap)

    if stats is not None:
        stats["n_supersteps"] = total_steps
        stats["buckets"] = buckets
    return order_d, sal_d, int(n_m)


_JIT_CACHE = {}
_EXACT_SAL_L = {}


def _build_fused_fn(stat_fn, E, R, dmax, max_supersteps, dtype,
                    payload_struct, with_vsz=False):
    """ONE jitted device program for the whole batched merge: a
    ``lax.while_loop`` over supersteps at full edge capacity.  No host
    round-trips between supersteps (each costs ~0.8s through the remote
    TPU tunnel) and no per-bucket recompiles (the chunk/compaction engine
    paid 5 bucket compilations, ~200s).

    Each superstep runs depth-limited Boruvka star/chain contraction
    instead of the mutual-minimum matching: every region selects its
    minimum incident edge (ties by lowest edge index); the selection
    forest's components each contain exactly one mutual-minimum 2-cycle
    (its root); every vertex within ``dmax`` parent-hops of its root
    attaches this superstep, emitted as a chain of binary (r0, r1, r2)
    triples in hop order (parents attach before children, so every
    merge's boundary exists).  A matching merges <= R/2 edges and decays
    into an O(R)-round tail on chain-structured RAGs; chain contraction
    keeps the round count O(log R) while each attach still uses its own
    edge's start-of-round statistic as saliency (exactly like the
    matching engine, where non-mutual edges also keep their start-of-
    round stats until the next round's recompute).

    The serial reference semantics being approximated: one pop+update of
    code/type/boundary_table.hxx:122-167 per merge; parity with it is
    checked via monotonized threshold cuts (tests/test_merge_device.py).
    """
    import jax
    import jax.numpy as jnp

    key = ("fused", stat_fn, E, R, dmax, max_supersteps, str(dtype),
           payload_struct, with_vsz, _pack64_enabled())
    fn = _JIT_CACHE.get(key)
    if fn is not None:
        return fn

    max_m = max(R - 1, 1)
    n_ids = R + max_m
    idx = jnp.arange(E, dtype=jnp.int32)
    vid = jnp.arange(n_ids, dtype=jnp.int32)
    BIG = jnp.asarray(jnp.inf, dtype)
    big32 = jnp.int32(2 ** 31 - 1)
    # hop/root propagation packs (h, rt) into ONE int32 per vertex --
    # code = h*(n_ids+1) + rt -- halving the gathers in the dmax loop
    # (measured 10% whole-merge win at 2048^2, RESULTS.md).  Needs
    # (dmax+2)*(n_ids+1) < 2^31; fall back to two gathers/hop otherwise.
    pack_hr = (dmax + 2) * (n_ids + 1) < 2 ** 31
    INF_H = jnp.int32(dmax + 1) if pack_hr else jnp.int32(n_ids + 7)
    _PK = _pack64_enabled()

    def cond(state):
        step, n_m, u, v, payload, vstate, alive, order, sal = state
        return (step < max_supersteps) & alive.any() & (n_m < max_m)

    def body(state):
        step, n_m, u, v, payload, vstate, alive, order, sal = state
        if with_vsz:
            stat = jnp.where(alive, stat_fn(payload, u, v, vstate[0]),
                             BIG)
        else:
            stat = jnp.where(alive, stat_fn(payload), BIG)
        bits = jax.lax.bitcast_convert_type(
            stat.astype(jnp.float32), jnp.int32)
        bits = jnp.where(alive, bits, big32)

        # --- per-vertex minimum incident edge m(v), ties by edge index ---
        rbits = jnp.full(n_ids, big32, jnp.int32)
        rbits = rbits.at[u].min(bits).at[v].min(bits)
        at_min_u = alive & (rbits[u] == bits)
        at_min_v = alive & (rbits[v] == bits)
        ridx = jnp.full(n_ids, E, jnp.int32)
        ridx = ridx.at[u].min(jnp.where(at_min_u, idx, E))
        ridx = ridx.at[v].min(jnp.where(at_min_v, idx, E))
        m = ridx                                   # [n_ids]; E = none
        # one gather for both endpoints (each random-index pass costs ~1
        # superstep-millisecond; see RESULTS.md roofline)
        uv_pad = jnp.concatenate(
            [jnp.stack([u, v], axis=1),
             jnp.full((1, 2), n_ids, jnp.int32)], axis=0)
        muv = uv_pad[jnp.minimum(m, E)]
        mu = muv[:, 0]
        mv = muv[:, 1]
        parent = jnp.where(m < E, jnp.where(mu == vid, mv, mu), vid)

        # --- roots: canonical vertex of each mutual-minimum 2-cycle ---
        is_root = (parent[parent] == vid) & (vid < parent)

        # --- depth-limited hop counts + root propagation ---
        if pack_hr:
            W = jnp.int32(n_ids + 1)
            known_lim = INF_H * W
            code = jnp.where(is_root, vid, known_lim + jnp.int32(n_ids))
            for _ in range(dmax):
                cp = code[parent]
                code = jnp.where(code < known_lim, code,
                                 jnp.where(cp < known_lim, cp + W, code))
            h = code // W
            rt = jnp.where(code < known_lim, code % W, jnp.int32(n_ids))
        else:
            h = jnp.where(is_root, 0, INF_H)
            rt = jnp.where(is_root, vid, n_ids)
            for _ in range(dmax):
                hp = h[parent]
                h = jnp.minimum(h, jnp.where(hp < INF_H, hp + 1, INF_H))
                rt = jnp.where(rt < n_ids, rt, rt[parent])
        attach = (h >= 1) & (h <= dmax) & (m < E)

        # --- order vertices by (component, edge stat, hop, id) ---
        # stat(m(child)) >= stat(m(parent)) always (m(v) is incident to
        # parent(v), whose m is ITS minimum incident edge), so stat-major
        # order still attaches parents before children (hop breaks stat
        # ties) AND makes each chain monotone non-decreasing in stat --
        # the monotonized threshold cut then judges every attach by
        # exactly its own edge's statistic, like the serial order.
        bits_pad = jnp.concatenate([bits, jnp.full(1, big32, jnp.int32)])
        mbits = bits_pad[jnp.minimum(m, E)]
        rt_key = jnp.where(attach | is_root, rt, n_ids)
        b_key = jnp.where(attach, mbits, jnp.int32(-2 ** 31))  # roots first
        h_key = jnp.where(attach | is_root, h, INF_H)
        if _PK and pack_hr:
            hvid = h_key * jnp.int32(n_ids + 1) + vid
            rt_s, _, hvid_s = jax.lax.sort(
                (rt_key, b_key, hvid), num_keys=3)
            h_s = hvid_s // jnp.int32(n_ids + 1)
            vs = hvid_s % jnp.int32(n_ids + 1)
        else:
            rt_s, _, h_s, vs = jax.lax.sort(
                (rt_key, b_key, h_key, vid), num_keys=4)
        is_merge = (rt_s < n_ids) & (h_s >= 1)     # attached rows
        grank = jnp.cumsum(is_merge.astype(jnp.int32)) - 1
        first = jnp.concatenate(
            [jnp.ones(1, bool), rt_s[1:] != rt_s[:-1]])
        first_in_run = is_merge & (
            jnp.concatenate([jnp.ones(1, bool), ~is_merge[:-1]]) | first)
        r2 = R + n_m + grank
        r0 = jnp.where(first_in_run, rt_s, r2 - 1)
        ok = is_merge & (n_m + grank < max_m)
        n_new = ok.sum().astype(jnp.int32)

        # saliency: the attached vertex's own selected edge's statistic
        m_s = m[vs]
        stat_pad = jnp.concatenate([stat, jnp.zeros(1, stat.dtype)])
        sal_rows = -stat_pad[jnp.minimum(m_s, E)]

        rows = jnp.stack(
            [r0.astype(jnp.int32), vs, r2.astype(jnp.int32)], axis=1)
        slot = jnp.where(ok, n_m + grank, max_m)
        order_pad = jnp.concatenate(
            [order, jnp.full((1, 3), -1, jnp.int32)], axis=0)
        order = order_pad.at[slot].set(
            jnp.where(ok[:, None], rows, -1))[:max_m]
        sal_pad = jnp.concatenate([sal, jnp.zeros(1, sal.dtype)])
        sal = sal_pad.at[slot].set(
            jnp.where(ok, sal_rows.astype(sal.dtype), 0.0))[:max_m]

        # --- component final id lut (last merge of each run) ---
        run_id = jnp.cumsum(first.astype(jnp.int32)) - 1
        last_rank = jnp.full(n_ids + 1, -1, jnp.int32)
        last_rank = last_rank.at[run_id].max(jnp.where(ok, grank, -1))
        fin = R + n_m + last_rank[run_id]          # [n_sort]
        # only vertices whose own attach was RECORDED (ok is a prefix of
        # the global merge ranks, hence of each run's hop-ordered chain)
        # plus the run root are contracted; overflowed attaches stay put
        contracted = ((rt_s < n_ids) & (last_rank[run_id] >= 0)
                      & (ok | (h_s == 0)))
        lut = vid.at[jnp.where(contracted, vs, n_ids - 1)].set(
            jnp.where(contracted, fin.astype(jnp.int32),
                      jnp.int32(n_ids - 1)))
        # (id n_ids-1 is a safe dump slot: ids allocated so far are
        # < R + n_m < n_ids - 1 while the loop still runs)

        # consumed edges: each attached-and-recorded vertex's m edge
        used = jnp.zeros(E + 1, bool)
        used = used.at[jnp.where(ok, jnp.minimum(m_s, E), E)].set(
            jnp.where(ok, True, used[E]))
        u2 = lut[u]
        v2 = lut[v]
        alive2 = alive & ~used[:E] & (u2 != v2)

        # --- dedupe duplicate pairs: 3-operand key sort + gathers ---
        lo_k = jnp.where(alive2, jnp.minimum(u2, v2), jnp.int32(n_ids))
        hi_k = jnp.where(alive2, jnp.maximum(u2, v2), idx)
        lo_s, hi_s, perm = jax.lax.sort((lo_k, hi_k, idx), num_keys=2)
        uv3 = jnp.take(jnp.stack([u2, v2], axis=1), perm, axis=0)
        u3 = uv3[:, 0]
        v3 = uv3[:, 1]
        alive_s = jnp.take(alive2, perm)
        pfirst = jnp.concatenate(
            [jnp.ones(1, bool),
             (lo_s[1:] != lo_s[:-1]) | (hi_s[1:] != hi_s[:-1])])
        seg_id = jnp.cumsum(pfirst.astype(jnp.int32)) - 1
        keep = pfirst & alive_s
        combined = []
        for p in payload:
            ps = jnp.take(p, perm, axis=0)
            pz = jnp.where(
                alive_s[:, None] if ps.ndim == 2 else alive_s, ps, 0.0)
            pseg = jax.ops.segment_sum(pz, seg_id, num_segments=E)
            combined.append(jnp.where(
                keep[:, None] if ps.ndim == 2 else keep, pseg[seg_id], ps))
        payload = tuple(combined)
        if with_vsz:
            # vertex payload (region sizes) pools additively through the
            # component lut: one scatter-add per superstep
            vstate = tuple(
                jnp.zeros(n_ids, z.dtype).at[lut].add(z) for z in vstate)
        return (step + 1, n_m + n_new, u3, v3, payload, vstate,
                alive_s & keep, order, sal)

    def run(u0, v0, payload0, vstate0):
        alive0 = jnp.ones(E, bool)
        order0 = jnp.full((max_m, 3), -1, jnp.int32)
        sal0 = jnp.zeros(max_m, dtype)
        st = jax.lax.while_loop(
            cond, body,
            (jnp.int32(0), jnp.int32(0), u0, v0, payload0, vstate0,
             alive0, order0, sal0))
        step, n_m, _, _, _, _, _, order, sal = st
        return order, sal, n_m, step

    fn = jax.jit(run)
    _JIT_CACHE[key] = fn
    return fn


def _fused_merge_core(u, v, payload, stat_fn, n_regions, max_supersteps,
                      dtype, dmax=4, stats=None, vsizes=None):
    """Single-program batched merge (see _build_fused_fn).  vsizes
    (optional [R]): additive per-vertex payload (region sizes) made
    available to ``stat_fn(payload, u, v, vsz)`` -- the median*minsize
    policy's carrier."""
    import jax.numpy as jnp

    E = len(u)
    R = int(n_regions)
    max_m = max(R - 1, 1)
    payload0 = tuple(jnp.asarray(p, dtype) for p in payload)
    struct = tuple((len(p.shape), str(p.dtype)) for p in payload0)
    with_vsz = vsizes is not None
    vstate0 = ()
    if with_vsz:
        vsz = jnp.zeros(R + max_m, dtype)
        vstate0 = (vsz.at[:R].set(jnp.asarray(vsizes, dtype)),)
    fn = _build_fused_fn(stat_fn, E, R, dmax, max_supersteps, dtype,
                         struct, with_vsz=with_vsz)
    order, sal, n_m, steps = fn(jnp.asarray(u, jnp.int32),
                                jnp.asarray(v, jnp.int32), payload0,
                                vstate0)
    if stats is not None:
        stats["n_supersteps"] = int(steps)
        stats["buckets"] = [E]
    return order, sal, int(n_m)


def _mean_stat(payload):
    import jax.numpy as jnp

    s, c = payload
    return s / jnp.maximum(c, 1.0)


def _mean_stat_packed(payload):
    """Mean over a single packed [E, 2] (sum, count) payload: one gather/
    scatter pass per superstep for the payload instead of two."""
    import jax.numpy as jnp

    (sc,) = payload
    return sc[:, 0] / jnp.maximum(sc[:, 1], 1.0)


def merge_batched_device(u, v, s, c, n_regions, max_supersteps=256,
                         dtype=None, select_rounds=1, stats=None,
                         mode="fused", dmax=4):
    """Batched superstep merge, pooled-mean policy (speed mode).

    Per-edge data (s, c) = (sum, count) of boundary pb; statistic = s/c
    (util/struct_merge.hxx:38-85 semantics under splice-as-sum).
    ``mode="fused_ms"`` (the user-surface and bench configuration) adds
    device-side capacity-shrinking tail phases to ``mode="fused"``, which
    runs the whole merge as one device program with depth-``dmax`` chain
    contraction per superstep (O(log R) supersteps); ``mode="chunked"``
    is the older host-compacted mutual-matching engine.  This function's
    own default stays "fused" (the single-phase program some callers pin
    for its one-program compile); greedy_merge_device passes "fused_ms".
    Returns (order, saliencies, n_merges)."""
    import jax
    import jax.numpy as jnp

    if dtype is None:
        dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32

    if mode in ("fused", "fused_ms"):
        import jax.numpy as jnp

        sc = jnp.stack([jnp.asarray(s, dtype), jnp.asarray(c, dtype)],
                       axis=1)
        if mode == "fused_ms":
            return _fused_multiphase_core(
                u, v, (sc,), _mean_stat_packed, n_regions,
                max_supersteps, dtype, dmax=dmax, stats=stats)
        return _fused_merge_core(u, v, (sc,), _mean_stat_packed, n_regions,
                                 max_supersteps, dtype, dmax=dmax,
                                 stats=stats)
    return _superstep_merge_core(u, v, (s, c), _mean_stat, n_regions,
                                 max_supersteps, dtype,
                                 select_rounds=select_rounds, stats=stats)


def merge_batched_device_exact(u, v, s, c, n_regions, dmax=4,
                               max_supersteps=256, dtype=None,
                               stats=None):
    """Pooled-mean fused_ms merge AND exact merge-time saliencies as ONE
    device program / ONE tunnel dispatch (the production matched-VI
    path, VERDICT r5 items #1 + #6): the memoized multi-phase plan plus
    the LCA exact-saliency reduction trace into a single jit call.  The
    first call per shape runs the adaptive plan discovery and the
    saliency depth-capacity probe (separate dispatches, memoized);
    steady-state calls are one dispatch + one batched scalar readback.

    Returns (order [max_m, 3] dense triples, saliencies with exact
    merge-time pooled means where defined, n_merges)."""
    import jax
    import jax.numpy as jnp

    if dtype is None:
        dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    E = len(u)
    R = int(n_regions)
    max_m = max(R - 1, 1)
    sc = jnp.stack([jnp.asarray(s, dtype), jnp.asarray(c, dtype)],
                   axis=1)
    struct = ((2, str(sc.dtype)),)
    memo_key = (E, R, _mean_stat_packed, struct, dmax, str(dtype), False)
    sal_key = (E, max_m, R, str(dtype))
    _plan_store_load()
    plan = _PLAN_MEMO.get(memo_key)
    L = _EXACT_SAL_L.get(sal_key)
    u_d = jnp.asarray(u, jnp.int32)
    v_d = jnp.asarray(v, jnp.int32)
    if plan is None or L is None:
        # discovery path: adaptive plan + saliency depth probe
        order, sal, n_m = merge_batched_device(
            u_d, v_d, sc[:, 0], sc[:, 1], R, dmax=dmax,
            max_supersteps=max_supersteps, dtype=dtype, stats=stats,
            mode="fused_ms")
        ex = exact_saliency_device(u_d, v_d, sc[:, 0], sc[:, 1],
                                   order, R, dtype=dtype)
        ex = jnp.asarray(ex)
        sal = jnp.where(jnp.isnan(ex), jnp.asarray(sal), -ex)
        return order, sal, n_m
    fn = _build_plan_pipeline_fn(
        tuple((s0, e0, r0) for s0, e0, r0 in plan), _mean_stat_packed,
        R, dmax, max_supersteps, dtype, struct, False, sal_L=L)
    order, sal, n_m_d, steps_d, bad, conv = fn(u_d, v_d, (sc,), ())
    vals = np.asarray(jnp.stack(
        [n_m_d, steps_d, bad.astype(jnp.int32), conv.astype(jnp.int32)]))
    if vals[2] or not vals[3]:
        # plan overflowed or saliency depth capacity too small for this
        # data: drop the memos and take the discovery path
        _PLAN_MEMO.pop(memo_key, None)
        _EXACT_SAL_L.pop(sal_key, None)
        if stats is not None:
            stats["fallback"] = True
        return merge_batched_device_exact(
            u, v, s, c, n_regions, dmax=dmax,
            max_supersteps=max_supersteps, dtype=dtype, stats=stats)
    if stats is not None:
        stats["n_supersteps"] = int(vals[1])
        stats["buckets"] = [e for _, e, _ in plan]
        stats["fallback"] = False
    return order, sal, int(vals[0])


_HIST_STATS = {}
_MINSIZE_STATS = {}


def merge_batched_device_hist_minsize(u, v, h, sizes, n_regions,
                                      max_supersteps=256, lo=0.0, hi=1.0,
                                      dtype=None, stats=None,
                                      mode="fused_ms", dmax=4):
    """Batched superstep merge, median*minsize policy
    (util/struct_merge.hxx:141-185): statistic = (approx) boundary median
    from the additive histogram sketch TIMES the smaller endpoint
    region's size -- sizes ride as an additive per-VERTEX payload pooled
    through the component lut each superstep (start-of-superstep values,
    like every other statistic input in the batched engine).  sizes: [R]
    leaf region sizes.  Returns (order, saliencies=-stat, n_merges)."""
    import jax
    import jax.numpy as jnp

    if dtype is None:
        dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32

    stat_fn = _MINSIZE_STATS.get((lo, hi))
    if stat_fn is None:
        def stat_fn(payload, uu, vv, vsz, _lo=lo, _hi=hi):
            (hh,) = payload
            med = hist_median_stat(hh, _lo, _hi)
            return med * jnp.minimum(vsz[uu], vsz[vv])
        _MINSIZE_STATS[(lo, hi)] = stat_fn

    if mode == "fused_ms":
        return _fused_multiphase_core(u, v, (h,), stat_fn, n_regions,
                                      max_supersteps, dtype, dmax=dmax,
                                      stats=stats, vsizes=sizes)
    if mode == "fused":
        return _fused_merge_core(u, v, (h,), stat_fn, n_regions,
                                 max_supersteps, dtype, dmax=dmax,
                                 stats=stats, vsizes=sizes)
    raise ValueError(f"median_minsize device mode {mode!r} "
                     "(fused|fused_ms)")


def merge_batched_device_hist(u, v, h, n_regions, max_supersteps=256,
                              lo=0.0, hi=1.0, dtype=None, select_rounds=1,
                              stats=None, mode="fused", dmax=4):
    """Batched superstep merge on histogram sketches (approx-median policy,
    SURVEY hard part #2).  h: [E, n_bins] per-edge boundary histograms,
    which splice additively; the statistic is the sketch's upper median.
    Returns (order, saliencies=-stat, n_merges)."""
    import jax
    import jax.numpy as jnp

    if dtype is None:
        dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32

    stat_fn = _HIST_STATS.get((lo, hi))
    if stat_fn is None:
        def stat_fn(payload, _lo=lo, _hi=hi):
            (h,) = payload
            return hist_median_stat(h, _lo, _hi)
        _HIST_STATS[(lo, hi)] = stat_fn

    if mode == "fused_ms":
        return _fused_multiphase_core(u, v, (h,), stat_fn, n_regions,
                                      max_supersteps, dtype, dmax=dmax,
                                      stats=stats)
    if mode == "fused":
        return _fused_merge_core(u, v, (h,), stat_fn, n_regions,
                                 max_supersteps, dtype, dmax=dmax,
                                 stats=stats)
    return _superstep_merge_core(u, v, (h,), stat_fn, n_regions,
                                 max_supersteps, dtype,
                                 select_rounds=select_rounds, stats=stats)


def threshold_cut(order, stats, tau):
    """Consistent threshold cut of a (possibly non-monotone) merge
    hierarchy: select merge m iff its *monotonized* statistic
    max(stat[m], stats of the merges that built its inputs) <= tau.

    The batched superstep engine emits merges grouped by rounds, so its
    sequence is not sorted by statistic; cutting by count mixes weak and
    strong boundaries.  The monotonized-threshold cut is the correct way
    to extract "merge everything weaker than tau" from any merge
    hierarchy (equals the prefix cut for a serial sorted order).
    Returns a boolean mask over merges (prefix-closed by construction).

    The monotonized statistic is the max over each merge's subtree of
    merge rows; fused-engine trees are shallow (depth <= dmax *
    supersteps), so a vectorized level-propagation loop converges in
    ~depth sweeps -- at SNEMI scale this replaced a 1.1M-iteration
    Python dict loop that dominated the e2e eval stage.  Deep (serial)
    hierarchies fall back to the exact sequential pass.
    """
    order = np.asarray(order).reshape(-1, 3)
    stats = np.asarray(stats, dtype=np.float64)
    n = len(order)
    if n == 0:
        return np.zeros(0, dtype=bool)
    hi = int(max(order[:, 2].max(), order[:, :2].max())) + 2
    lut = np.full(hi, -1, dtype=np.int64)
    lut[order[:, 2]] = np.arange(n)
    c0 = lut[order[:, 0]]
    c1 = lut[order[:, 1]]
    # subtree-max by pointer jumping: parent[j] = row that consumed
    # r2_j; max is idempotent, so scatter-max along 2^k links for
    # k = 0..log2(depth) covers every descendant -- O(n log depth)
    # regardless of chain length (a serial order is one n-deep chain)
    rows = np.arange(n, dtype=np.int64)
    parent = np.full(n, -1, dtype=np.int64)
    parent[c0[c0 >= 0]] = rows[c0 >= 0]
    parent[c1[c1 >= 0]] = rows[c1 >= 0]
    mono = stats.copy()
    par = parent
    while (par >= 0).any():
        valid = par >= 0
        np.maximum.at(mono, par[valid], mono[valid])
        par = np.where(valid, np.take(par, np.maximum(par, 0)), -1)
    return mono <= tau


def replay_exact_saliency(u, v, s, c, order, engine="native"):
    """Serial host replay of a merge order recomputing each merge's EXACT
    pooled-mean boundary statistic at merge time.

    The batched superstep engine records each attach's start-of-superstep
    statistic, which goes stale once earlier merges in the same superstep
    re-pool the boundary (the reference's serial engine re-pools after
    EVERY pop, boundary_table.hxx:122-167).  Replaying the emitted order
    through a host boundary table restores the serial quantity --
    measured to shrink the matched-threshold-cut VI drift ~25x at 1024^2+
    (tests/test_merge_device.py bounds it; docs/RESULTS.md).

    order rows are dense-index triples (r0, r1, r2).  Returns stat [n]
    (pooled mean of each merge's boundary at merge time; saliency = -stat).
    O(E + sum degree) with hash tables; engine="native" (default) runs
    the C++ replay (~50x the Python dicts at 1M+ edges), engine="py" the
    Python oracle (tests assert they agree).
    """
    s = np.asarray(s, dtype=np.float64)
    c = np.asarray(c, dtype=np.float64)
    order_a = np.asarray(order, dtype=np.int64).reshape(-1, 3)
    if engine == "native":
        from ..native import replay_saliency_native

        hi = int(max(np.max(order_a, initial=0),
                     np.max(u, initial=0), np.max(v, initial=0))) + 1
        return replay_saliency_native(u, v, s, c, order_a, hi)
    tbl = {}
    nbrs = {}
    for ui, vi, si, ci in zip(np.asarray(u).tolist(),
                              np.asarray(v).tolist(),
                              s.tolist(), c.tolist()):
        a, b = (ui, vi) if ui < vi else (vi, ui)
        k = (a, b)
        if k in tbl:
            e = tbl[k]
            e[0] += si
            e[1] += ci
        else:
            tbl[k] = [si, ci]
            nbrs.setdefault(a, set()).add(b)
            nbrs.setdefault(b, set()).add(a)
    order = np.asarray(order, dtype=np.int64).reshape(-1, 3)
    out = np.full(len(order), np.nan)
    for i, (a, b, r2) in enumerate(order):
        a, b, r2 = int(a), int(b), int(r2)
        k = (a, b) if a < b else (b, a)
        e = tbl.pop(k, None)
        if e is None:
            continue  # non-adjacent pair: keep NaN, caller decides
        out[i] = e[0] / max(e[1], 1.0)
        na = nbrs.pop(a, set())
        nb = nbrs.pop(b, set())
        na.discard(b)
        nb.discard(a)
        merged = set()
        for src, rest in ((a, na), (b, nb)):
            for x in rest:
                kk = (src, x) if src < x else (x, src)
                ee = tbl.pop(kk)
                k2 = (r2, x) if r2 < x else (x, r2)
                if k2 in tbl:
                    t = tbl[k2]
                    t[0] += ee[0]
                    t[1] += ee[1]
                else:
                    tbl[k2] = ee
                nx = nbrs[x]
                nx.discard(a)
                nx.discard(b)
                nx.add(r2)
                merged.add(x)
        nbrs[r2] = merged
    return out


def replay_exact_saliency_median(u, v, edge_ptr, edge_vals, order,
                                 engine="native", region_sizes=None):
    """Serial host replay of a merge order recomputing each merge's EXACT
    upper-median boundary statistic at merge time (policy-0 counterpart
    of replay_exact_saliency; util/stats.hxx:83-91 amedian under the
    boundary_table splice).  Medians are not additive, so the replay
    carries full per-pair value multisets (small-to-large splicing);
    engine="native" (default) runs the C++ engine, "py" the dict oracle
    (tests assert they agree).  Returns stat [n] (saliency = -stat)."""
    order_a = np.asarray(order, dtype=np.int64).reshape(-1, 3)
    hi = int(max(order_a.max(initial=0), np.max(u, initial=0),
                 np.max(v, initial=0))) + 1
    if engine == "native":
        from ..native import replay_saliency_median_native

        return replay_saliency_median_native(u, v, edge_ptr, edge_vals,
                                             order_a, hi,
                                             region_sizes=region_sizes)
    sizes = None
    if region_sizes is not None:
        sizes = np.zeros(hi, dtype=np.int64)
        sizes[: len(region_sizes)] = np.asarray(region_sizes,
                                                dtype=np.int64)
    edge_ptr = np.asarray(edge_ptr)
    edge_vals = np.asarray(edge_vals, dtype=np.float64)
    tbl = {}
    nbrs = {}
    for e, (ui, vi) in enumerate(zip(np.asarray(u).tolist(),
                                     np.asarray(v).tolist())):
        a, b = (ui, vi) if ui < vi else (vi, ui)
        vals = edge_vals[int(edge_ptr[e]):int(edge_ptr[e + 1])].tolist()
        if (a, b) in tbl:
            tbl[(a, b)].extend(vals)
        else:
            tbl[(a, b)] = list(vals)
            nbrs.setdefault(a, set()).add(b)
            nbrs.setdefault(b, set()).add(a)
    out = np.full(len(order_a), np.nan)
    for i, (a, b, r2) in enumerate(order_a):
        a, b, r2 = int(a), int(b), int(r2)
        if sizes is not None:
            sizes[r2] = sizes[a] + sizes[b]
        k = (a, b) if a < b else (b, a)
        vals = tbl.pop(k, None)
        if vals is None:
            continue
        arr = np.asarray(vals)
        out[i] = float(np.partition(arr, len(arr) // 2)[len(arr) // 2])
        if sizes is not None:
            out[i] *= float(min(sizes[a], sizes[b]))
        na = nbrs.pop(a, set())
        nb = nbrs.pop(b, set())
        na.discard(b)
        nb.discard(a)
        merged = set()
        for src, rest in ((a, na), (b, nb)):
            for x in rest:
                kk = (src, x) if src < x else (x, src)
                ee = tbl.pop(kk)
                k2 = (r2, x) if r2 < x else (x, r2)
                if k2 in tbl:
                    tbl[k2].extend(ee)
                else:
                    tbl[k2] = ee
                nx = nbrs[x]
                nx.discard(a)
                nx.discard(b)
                nx.add(r2)
                merged.add(x)
        nbrs[r2] = merged
    return out


def _build_exact_saliency_fn(E, M, R, L, dtype):
    """Jitted device program for exact_saliency_device (fixed shapes).

    Binary lifting over the merge forest: ``anc[k][x]`` is x's 2^k-th
    ancestor (saturating at roots), built by L doubling rounds; depths
    come from the same doubling.  Each base edge then finds the LCA of
    its endpoints with the classic lift-to-equal-depth + descend walk --
    all fixed-shape gathers, no data-dependent control flow -- and the
    per-merge exact pooled (s, c) is a segment-sum keyed by LCA.

    L is a DEPTH CAPACITY, not derived from n_ids: fused-engine trees
    are shallow (depth <= dmax * supersteps; measured 51 at 2048^2), so
    the driver starts at a small L and escalates on the returned
    ``converged`` flag (False iff some 2^(L-1)-ancestor is not yet a
    root) -- the superstep passes are dispatch-overhead-bound at RAG
    sizes, so halving the round count nearly halves the wall.
    """
    import jax
    import jax.numpy as jnp

    key = ("exact_sal", E, M, R, L, str(dtype))
    fn = _JIT_CACHE.get(key)
    if fn is not None:
        return fn

    # table slot n_ids is a dummy: padded order rows (r2 < 0, the fused
    # engine's unfilled buffer tail) scatter there and self-loop
    n_ids = R + M
    vid = jnp.arange(n_ids + 1, dtype=jnp.int32)

    def run(u, v, s, c, order):
        ok_row = order[:, 2] >= 0
        r0 = jnp.where(ok_row, order[:, 0], n_ids)
        r1 = jnp.where(ok_row, order[:, 1], n_ids)
        r2 = jnp.where(ok_row, order[:, 2], n_ids)
        parent = vid
        parent = parent.at[r0].set(r2)
        parent = parent.at[r1].set(r2)
        # --- doubling: anc[k] = 2^k-th ancestor, depth = steps to root ---
        anc = [parent]
        depth = (parent != vid).astype(jnp.int32)
        p = parent
        for _ in range(L - 1):
            depth = depth + depth[p]
            p = p[p]
            anc.append(p)
        root = anc[-1]
        converged = (parent[root] == root).all()

        # --- per-edge LCA (endpoints stacked [2E]: one gather/round) ---
        duv = depth[jnp.concatenate([u, v])]
        da = duv[:E]
        db = duv[E:]
        swap = db > da
        a = jnp.where(swap, v, u)
        b = jnp.where(swap, u, v)
        diff = jnp.abs(da - db)
        for k in range(L - 1, -1, -1):
            lift = (diff >> k) & 1 > 0
            a = jnp.where(lift, anc[k][a], a)
        same = a == b
        ab = jnp.concatenate([a, b])
        for k in range(L - 1, -1, -1):
            kab = anc[k][ab]
            ka = kab[:E]
            kb = kab[E:]
            go = ~same & (ka != kb)
            ab = jnp.where(jnp.concatenate([go, go]), kab, ab)
        a = ab[:E]
        lca = jnp.where(same, a, anc[0][a])
        valid = root[u] == root[v]

        # --- exact pooled (s, c) per merge node = LCA-keyed segment sum ---
        seg = jnp.where(valid, lca, n_ids)
        s_tot = jax.ops.segment_sum(jnp.where(valid, s, 0.0), seg,
                                    num_segments=n_ids + 1)
        c_tot = jax.ops.segment_sum(jnp.where(valid, c, 0.0), seg,
                                    num_segments=n_ids + 1)
        cm = c_tot[r2]
        sm = s_tot[r2]
        return jnp.where(ok_row & (cm > 0), sm / jnp.maximum(cm, 1.0),
                         jnp.asarray(jnp.nan, dtype)), converged

    fn = jax.jit(run)
    _JIT_CACHE[key] = fn
    return fn


def exact_saliency_device(u, v, s, c, order, n_regions, dtype=None):
    """Exact merge-time pooled-mean statistics of a merge order, computed
    ON DEVICE (the all-chip replacement for the serial host replay,
    ``replay_exact_saliency``).

    The identity: the boundary the serial engine pops at merge m
    (boundary_table.hxx:122-167) is exactly the base edges whose
    endpoints' merge-TREE LowestCommonAncestor is m -- the same
    dying-pair structure features/hierarchical.py exploits for boundary
    feature cancellation.  So the exact merge-time pooled (s, c) of every
    merge is ONE segment-sum of base-edge payloads keyed by tree LCA; the
    LCA itself comes from binary lifting (O(E log R) fixed-shape gathers,
    one XLA program, no serial pass).

    order: [M, 3] dense-index triples (r0, r1, r2); rows with r2 < 0
    (the fused engine's unfilled padded buffer tail) are ignored and
    return NaN, so the engine's device-resident order buffer can be
    passed WITHOUT a host round-trip.  A merge whose popped boundary is
    empty (non-adjacent pair row) also gets NaN, matching the host
    replay's semantics.  Returns stat [M] (saliency = -stat).
    """
    import jax
    import jax.numpy as jnp

    if dtype is None:
        dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    order = jnp.asarray(order, jnp.int32).reshape(-1, 3)
    M = int(order.shape[0])
    R = int(n_regions)
    if M == 0:
        return np.zeros(0)
    n_ids = R + M
    L_full = max(1, int(np.ceil(np.log2(max(n_ids, 2)))))
    # depth-capacity escalation: start from the last L that converged for
    # this shape (fused trees are ~dmax*supersteps deep, L=8 covers depth
    # 128), retry with doubled rounds on a False converged flag
    shape_key = (len(u), M, R, str(dtype))
    _plan_store_load()
    L = _EXACT_SAL_L.get(shape_key, min(8, L_full))
    u_d = jnp.asarray(u, jnp.int32)
    v_d = jnp.asarray(v, jnp.int32)
    s_d = jnp.asarray(s, dtype)
    c_d = jnp.asarray(c, dtype)
    while True:
        fn = _build_exact_saliency_fn(len(u), M, R, L, dtype)
        stat, converged = fn(u_d, v_d, s_d, c_d, order)
        if bool(converged) or L >= L_full:
            break
        L = min(2 * L, L_full)
    if _EXACT_SAL_L.get(shape_key) != L:
        _EXACT_SAL_L[shape_key] = L
        _plan_store_save()
    return stat


def greedy_merge_device(rag, pb_image, policy="mean", n_bins=32,
                        mode="fused_ms", dmax=4, stats=None,
                        exact_saliency=True, saliency_engine="device"):
    """User-surface device merge: same (order_keys, saliencies) contract as
    ``glia_tpu.native.greedy_merge_native`` but run as one batched XLA
    program on the accelerator (the TPU counterpart of the reference's
    serial ``genMergeOrderGreedy``, util/struct_merge.hxx:13-33).

    policy: "mean" (pooled boundary mean, struct_merge.hxx:38-85),
    "median" (approx-median over an additive n_bins histogram sketch,
    struct_merge.hxx:90-136 semantics to bin resolution), or
    "median_minsize" (median * smaller endpoint region size,
    struct_merge.hxx:141-185; sizes pooled as an additive vertex
    payload) -- all three of the reference's saliency policies.

    mode: "fused_ms" (default; multi-phase fused engine -- the bench
    configuration; falls back to single-phase automatically if the RAG
    overflows the capacity plan), "fused", or "chunked".

    exact_saliency (default True, policy "mean"): replace the engine's
    start-of-superstep saliencies with the exact merge-time pooled means
    -- the serial-engine quantity (threshold cuts on these match the
    serial cut's VI ~25x closer at scale).  saliency_engine selects how:
    "device" (default) runs the LCA-keyed segment reduction as a second
    XLA program on the accelerator (exact_saliency_device) so the
    matched-VI path is all-chip; "native"/"py" run the serial host
    replay (replay_exact_saliency).
    Returns (order [n, 3] int64 label keys, saliencies [n]).
    """
    if policy == "mean":
        u, v, s, c = edge_mean_arrays(rag, pb_image)
        if (exact_saliency and saliency_engine == "device"
                and mode == "fused_ms"):
            # merge + exact saliencies as ONE device program (one
            # dispatch; merge_batched_device_exact)
            order, sal, n_m = merge_batched_device_exact(
                u, v, s, c, rag.n_regions, dmax=dmax, stats=stats)
            sal = np.asarray(sal)[:n_m]
            return order_to_keys(order, n_m, rag), sal
        order, sal, n_m = merge_batched_device(
            u, v, s, c, rag.n_regions, mode=mode, dmax=dmax, stats=stats)
        sal = np.asarray(sal)[:n_m]
        if exact_saliency:
            if saliency_engine == "device":
                ex = np.asarray(exact_saliency_device(
                    u, v, s, c, np.asarray(order)[:n_m], rag.n_regions))
            else:
                ex = replay_exact_saliency(u, v, s, c,
                                           np.asarray(order)[:n_m],
                                           engine=saliency_engine)
            sal = np.where(np.isnan(ex), sal, -ex)
    elif policy == "median_minsize":
        if rag.sizes is None:
            raise ValueError("median_minsize needs region sizes; build "
                             "the RAG with contour_only=False")
        u, v, h = edge_hist_arrays(rag, pb_image, n_bins=n_bins)
        order, sal, n_m = merge_batched_device_hist_minsize(
            u, v, h, rag.sizes, rag.n_regions, mode=mode, dmax=dmax,
            stats=stats)
        sal = np.asarray(sal)[:n_m]
        if exact_saliency:
            pb = np.asarray(pb_image, dtype=np.float64).ravel()
            ex = replay_exact_saliency_median(
                u, v, rag.edge_ptr, pb[rag.edge_pixels],
                np.asarray(order)[:n_m], region_sizes=rag.sizes)
            sal = np.where(np.isnan(ex), sal, -ex)
    elif policy == "median":
        u, v, h = edge_hist_arrays(rag, pb_image, n_bins=n_bins)
        order, sal, n_m = merge_batched_device_hist(
            u, v, h, rag.n_regions, mode=mode, dmax=dmax, stats=stats)
        sal = np.asarray(sal)[:n_m]
        if exact_saliency:
            # exact upper medians at merge time (host replay: medians
            # are not additive, so there is no device segment-reduction
            # form; the C++ multiset replay is the exact oracle)
            pb = np.asarray(pb_image, dtype=np.float64).ravel()
            ex = replay_exact_saliency_median(
                u, v, rag.edge_ptr, pb[rag.edge_pixels],
                np.asarray(order)[:n_m])
            sal = np.where(np.isnan(ex), sal, -ex)
    else:
        raise ValueError(
            f"device policy {policy!r} (mean|median|median_minsize)")
    return order_to_keys(order, n_m, rag), sal


def order_to_keys(order, n_merges, rag):
    """Convert dense-index order rows to the RAG's label key space."""
    order = np.asarray(order)[:n_merges]
    R = rag.n_regions
    max_key = int(rag.keys.max())
    out = np.empty_like(order, dtype=np.int64)
    for i in range(len(order)):
        for j in range(2):
            x = int(order[i, j])
            out[i, j] = int(rag.keys[x]) if x < R else max_key + 1 + (x - R)
        out[i, 2] = max_key + 1 + int(order[i, 2]) - R
    # host engine records sorted (r0 < r1) table keys (boundary_table.hxx)
    out[:, :2] = np.sort(out[:, :2], axis=1)
    return out


def _pow2ceil(x, lo=256):
    return max(lo, 1 << int(np.ceil(np.log2(max(int(x), 1)))))


def _tile_ceil(x, lo=256, tile=256):
    """Round a phase capacity up to a lane-tile multiple (2x128 lanes).

    Static shapes only need to be fixed, not powers of two; pow2 rounding
    wasted up to 2x on the multi-phase tail (0.45*149084 -> 131072 where
    67328 suffices), and every superstep pass scales with the capacity.
    """
    return max(lo, ((max(int(x), 1) + tile - 1) // tile) * tile)


def _build_phase_fn(stat_fn, E, R_loc, R_glob, max_m_glob, dmax,
                    max_steps, dtype, payload_struct, identity_g,
                    with_vsz=False):
    """One PHASE of the multi-phase fused merge: the chain-contraction
    superstep loop of _build_fused_fn, generalized to run in a COMPACT
    local id space (edge capacity E, local vertex space R_loc +
    max(R_loc-1, 1)) while emitting order rows in GLOBAL ids via the
    ``g_of`` local->global table (fresh locals map affinely:
    g(R_loc + t) = R_glob + n_m_base + t, because both spaces allocate
    fresh ids contiguously in merge order).

    Tail supersteps of the merge run on arrays ~alive-sized instead of
    full-E/full-R (alive counts collapse fast, measured 2048^2: 149,084
    alive edges -> 13,889 after 2 supersteps -> 882 after 4; the default
    plan's lane-tile-rounded capacities are 149,084 -> 29,952 -> 3,072
    edge rows, docs/RESULTS.md), buying back the sort/scatter cost that
    dominated the roofline gap -- with NO host round-trips: phases hand
    device-resident state to a jitted transition program
    (_build_trans_fn).
    """
    import jax
    import jax.numpy as jnp

    key = ("phase", stat_fn, E, R_loc, R_glob, max_m_glob, dmax,
           max_steps, str(dtype), payload_struct, identity_g, with_vsz,
           _pack64_enabled(), _env_flag("GLIA_MERGE_UNROLL"))
    fn = _JIT_CACHE.get(key)
    if fn is not None:
        return fn

    max_m_loc = max(R_loc - 1, 1)
    n_ids = R_loc + max_m_loc
    idx = jnp.arange(E, dtype=jnp.int32)
    vid = jnp.arange(n_ids, dtype=jnp.int32)
    BIG = jnp.asarray(jnp.inf, dtype)
    big32 = jnp.int32(2 ** 31 - 1)
    pack_hr = (dmax + 2) * (n_ids + 1) < 2 ** 31
    INF_H = jnp.int32(dmax + 1) if pack_hr else jnp.int32(n_ids + 7)
    _PK = _pack64_enabled()

    def run(u0, v0, payload0, vstate0, alive0, g_of, n_m_base, order0,
            sal0):
        Rb = (jnp.int32(R_glob) + n_m_base).astype(jnp.int32)

        def gfun(x):
            if identity_g:
                return x
            base = g_of[jnp.clip(x, 0, R_loc - 1)]
            return jnp.where(x < R_loc, base, Rb + (x - R_loc))

        def cond(state):
            (step, n_loc, u, v, payload, vstate, alive, order,
             sal) = state
            return ((step < max_steps) & alive.any()
                    & (n_loc < max_m_loc)
                    & (n_m_base + n_loc < max_m_glob))

        def body(state):
            (step, n_loc, u, v, payload, vstate, alive, order,
             sal) = state
            if with_vsz:
                stat = jnp.where(alive,
                                 stat_fn(payload, u, v, vstate[0]), BIG)
            else:
                stat = jnp.where(alive, stat_fn(payload), BIG)
            bits = jax.lax.bitcast_convert_type(
                stat.astype(jnp.float32), jnp.int32)
            bits = jnp.where(alive, bits, big32)

            rbits = jnp.full(n_ids, big32, jnp.int32)
            rbits = rbits.at[u].min(bits).at[v].min(bits)
            at_min_u = alive & (rbits[u] == bits)
            at_min_v = alive & (rbits[v] == bits)
            ridx = jnp.full(n_ids, E, jnp.int32)
            ridx = ridx.at[u].min(jnp.where(at_min_u, idx, E))
            ridx = ridx.at[v].min(jnp.where(at_min_v, idx, E))
            m = ridx
            uv_pad = jnp.concatenate(
                [jnp.stack([u, v], axis=1),
                 jnp.full((1, 2), n_ids, jnp.int32)], axis=0)
            muv = uv_pad[jnp.minimum(m, E)]
            mu = muv[:, 0]
            mv = muv[:, 1]
            parent = jnp.where(m < E, jnp.where(mu == vid, mv, mu), vid)
            is_root = (parent[parent] == vid) & (vid < parent)

            if pack_hr:
                W = jnp.int32(n_ids + 1)
                known_lim = INF_H * W
                code = jnp.where(is_root, vid,
                                 known_lim + jnp.int32(n_ids))
                for _ in range(dmax):
                    cp = code[parent]
                    code = jnp.where(
                        code < known_lim, code,
                        jnp.where(cp < known_lim, cp + W, code))
                h = code // W
                rt = jnp.where(code < known_lim, code % W,
                               jnp.int32(n_ids))
            else:
                h = jnp.where(is_root, 0, INF_H)
                rt = jnp.where(is_root, vid, jnp.int32(n_ids))
                for _ in range(dmax):
                    hp = h[parent]
                    h = jnp.minimum(
                        h, jnp.where(hp < INF_H, hp + 1, INF_H))
                    rt = jnp.where(rt < n_ids, rt, rt[parent])
            attach = (h >= 1) & (h <= dmax) & (m < E)

            bits_pad = jnp.concatenate(
                [bits, jnp.full(1, big32, jnp.int32)])
            mbits = bits_pad[jnp.minimum(m, E)]
            rt_key = jnp.where(attach | is_root, rt, jnp.int32(n_ids))
            b_key = jnp.where(attach, mbits, jnp.int32(-2 ** 31))
            h_key = jnp.where(attach | is_root, h, INF_H)
            if _PK and pack_hr:
                # 3-operand sort: (hop, vertex id) packed into one i32
                # (the pack_hr bound guarantees the product fits) --
                # same lexicographic order as the 4-key sort
                hvid = h_key * jnp.int32(n_ids + 1) + vid
                rt_s, _, hvid_s = jax.lax.sort(
                    (rt_key, b_key, hvid), num_keys=3)
                h_s = hvid_s // jnp.int32(n_ids + 1)
                vs = hvid_s % jnp.int32(n_ids + 1)
            else:
                rt_s, _, h_s, vs = jax.lax.sort(
                    (rt_key, b_key, h_key, vid), num_keys=4)
            is_merge = (rt_s < n_ids) & (h_s >= 1)
            grank = jnp.cumsum(is_merge.astype(jnp.int32)) - 1
            first = jnp.concatenate(
                [jnp.ones(1, bool), rt_s[1:] != rt_s[:-1]])
            first_in_run = is_merge & (
                jnp.concatenate([jnp.ones(1, bool), ~is_merge[:-1]])
                | first)
            r2g = Rb + n_loc + grank
            ok = (is_merge & (n_loc + grank < max_m_loc)
                  & (n_m_base + n_loc + grank < max_m_glob))
            n_new = ok.sum().astype(jnp.int32)

            m_s = m[vs]
            stat_pad = jnp.concatenate([stat, jnp.zeros(1, stat.dtype)])
            sal_rows = -stat_pad[jnp.minimum(m_s, E)]

            r0g = jnp.where(first_in_run, gfun(rt_s), r2g - 1)
            rows = jnp.stack(
                [r0g.astype(jnp.int32), gfun(vs).astype(jnp.int32),
                 r2g.astype(jnp.int32)], axis=1)
            slot = jnp.where(ok, n_m_base + n_loc + grank, max_m_glob)
            order_pad = jnp.concatenate(
                [order, jnp.full((1, 3), -1, jnp.int32)], axis=0)
            order = order_pad.at[slot].set(
                jnp.where(ok[:, None], rows, -1))[:max_m_glob]
            sal_pad = jnp.concatenate([sal, jnp.zeros(1, sal.dtype)])
            sal = sal_pad.at[slot].set(
                jnp.where(ok, sal_rows.astype(sal.dtype),
                          0.0))[:max_m_glob]

            run_id = jnp.cumsum(first.astype(jnp.int32)) - 1
            last_rank = jnp.full(n_ids + 1, -1, jnp.int32)
            last_rank = last_rank.at[run_id].max(
                jnp.where(ok, grank, -1))
            fin = R_loc + n_loc + last_rank[run_id]
            contracted = ((rt_s < n_ids) & (last_rank[run_id] >= 0)
                          & (ok | (h_s == 0)))
            lut = vid.at[jnp.where(contracted, vs, n_ids - 1)].set(
                jnp.where(contracted, fin.astype(jnp.int32),
                          jnp.int32(n_ids - 1)))

            used = jnp.zeros(E + 1, bool)
            used = used.at[jnp.where(ok, jnp.minimum(m_s, E), E)].set(
                jnp.where(ok, True, used[E]))
            u2 = lut[u]
            v2 = lut[v]
            alive2 = alive & ~used[:E] & (u2 != v2)

            lo_k = jnp.where(alive2, jnp.minimum(u2, v2),
                             jnp.int32(n_ids))
            hi_k = jnp.where(alive2, jnp.maximum(u2, v2), idx)
            lo_s, hi_s, perm = jax.lax.sort((lo_k, hi_k, idx),
                                            num_keys=2)
            uv3 = jnp.take(jnp.stack([u2, v2], axis=1), perm, axis=0)
            u3 = uv3[:, 0]
            v3 = uv3[:, 1]
            alive_s = jnp.take(alive2, perm)
            pfirst = jnp.concatenate(
                [jnp.ones(1, bool),
                 (lo_s[1:] != lo_s[:-1]) | (hi_s[1:] != hi_s[:-1])])
            seg_id = jnp.cumsum(pfirst.astype(jnp.int32)) - 1
            keep = pfirst & alive_s
            combined = []
            for p in payload:
                ps = jnp.take(p, perm, axis=0)
                pz = jnp.where(
                    alive_s[:, None] if ps.ndim == 2 else alive_s,
                    ps, 0.0)
                pseg = jax.ops.segment_sum(pz, seg_id, num_segments=E)
                combined.append(jnp.where(
                    keep[:, None] if ps.ndim == 2 else keep,
                    pseg[seg_id], ps))
            payload = tuple(combined)
            if with_vsz:
                vstate = tuple(
                    jnp.zeros(n_ids, z.dtype).at[lut].add(z)
                    for z in vstate)
            return (step + 1, n_loc + n_new, u3, v3, payload, vstate,
                    alive_s & keep, order, sal)

        st = (jnp.int32(0), jnp.int32(0), u0, v0, payload0, vstate0,
              alive0, order0, sal0)
        if max_steps <= 2 and _env_flag("GLIA_MERGE_UNROLL"):
            # experimental: straight-line the fixed-count phases --
            # while_loop pays per-iteration carry layout copies; the
            # body is a no-op on an empty frontier, so unconditional
            # unrolling is safe.  Off by default so the shipped primed
            # compile-cache entries stay valid (measured slower anyway:
            # 0.189s vs 0.160s, docs/RESULTS.md).  The step counter only
            # advances while the frontier is non-empty so superstep
            # stats match the while_loop engine.
            def body_counted(st):
                alive_now = st[6].any()
                st2 = body(st)
                return (jnp.where(alive_now, st2[0], st[0]),) + st2[1:]

            for _ in range(max_steps):
                st = body_counted(st)
        else:
            st = jax.lax.while_loop(cond, body, st)
        step, n_loc, u, v, payload, vstate, alive, order, sal = st
        return u, v, payload, vstate, alive, order, sal, n_loc, step

    fn = jax.jit(run)
    _JIT_CACHE[key] = fn
    return fn


def _build_trans_fn(E_prev, R_loc_prev, R_glob, E2, R2_cap, dtype,
                    payload_struct, with_vsz=False):
    """Phase transition: compact alive edges to capacity E2 and remap the
    active vertex set into [0, R2_cap), composing the local->global id
    table.  All device-side; returns an overflow flag instead of ever
    dropping data (the caller falls back to the full-capacity engine)."""
    import jax
    import jax.numpy as jnp

    key = ("trans", E_prev, R_loc_prev, R_glob, E2, R2_cap, str(dtype),
           payload_struct, with_vsz)
    fn = _JIT_CACHE.get(key)
    if fn is not None:
        return fn

    max_m_prev = max(R_loc_prev - 1, 1)
    n_vert_prev = R_loc_prev + max_m_prev

    def run(u, v, payload, vstate, alive, g_of_prev, n_m_base_prev):
        lid = jnp.arange(n_vert_prev, dtype=jnp.int32)
        Rb = (jnp.int32(R_glob) + n_m_base_prev).astype(jnp.int32)
        gl = jnp.where(
            lid < R_loc_prev,
            g_of_prev[jnp.clip(lid, 0, R_loc_prev - 1)],
            Rb + (lid - R_loc_prev))
        pres = jnp.zeros(n_vert_prev + 1, bool)
        dump = jnp.int32(n_vert_prev)
        pres = pres.at[jnp.where(alive, u, dump)].set(
            jnp.where(alive, True, pres[dump]))
        pres = pres.at[jnp.where(alive, v, dump)].set(
            jnp.where(alive, True, pres[dump]))
        pres = pres[:n_vert_prev]
        new_id = (jnp.cumsum(pres.astype(jnp.int32)) - 1)
        R2 = pres.sum().astype(jnp.int32)
        ovf_v = R2 > R2_cap
        g2 = jnp.zeros(R2_cap + 1, jnp.int32)
        g2 = g2.at[jnp.where(pres, jnp.clip(new_id, 0, R2_cap - 1),
                             R2_cap)].set(
            jnp.where(pres, gl, 0))[:R2_cap]
        rank = jnp.cumsum(alive.astype(jnp.int32)) - 1
        n_alive = alive.sum().astype(jnp.int32)
        ovf_e = n_alive > E2
        sl = jnp.where(alive, jnp.clip(rank, 0, E2 - 1), E2)
        u2 = jnp.zeros(E2 + 1, jnp.int32).at[sl].set(
            jnp.where(alive, new_id[u], 0))[:E2]
        v2 = jnp.zeros(E2 + 1, jnp.int32).at[sl].set(
            jnp.where(alive, new_id[v], 0))[:E2]
        a2 = jnp.zeros(E2 + 1, bool).at[sl].set(alive)[:E2]
        p2 = []
        for p in payload:
            if p.ndim == 2:
                buf = jnp.zeros((E2 + 1, p.shape[1]), p.dtype)
                p2.append(buf.at[sl].set(
                    jnp.where(alive[:, None], p, 0.0))[:E2])
            else:
                buf = jnp.zeros(E2 + 1, p.dtype)
                p2.append(buf.at[sl].set(
                    jnp.where(alive, p, 0.0))[:E2])
        vstate2 = vstate
        if with_vsz:
            # vertex payload follows the present-vertex remap into the
            # next phase's compact vertex space
            n_vert2 = R2_cap + max(R2_cap - 1, 1)
            vsl = jnp.where(pres, jnp.clip(new_id, 0, n_vert2 - 1),
                            n_vert2)
            vstate2 = tuple(
                jnp.zeros(n_vert2 + 1, z.dtype).at[vsl].set(
                    jnp.where(pres, z[:n_vert_prev], 0.0))[:n_vert2]
                for z in vstate)
        return u2, v2, tuple(p2), vstate2, a2, g2, ovf_v | ovf_e

    fn = jax.jit(run)
    _JIT_CACHE[key] = fn
    return fn


_PLAN_MEMO = {}
_PLAN_STORE_LOADED = [False]


def _plan_store_path():
    d = os.environ.get("JAX_COMPILATION_CACHE_DIR")
    return os.path.join(d, "glia_plan_memo.json") if d else None


def _plan_store_load():
    """Load persisted adaptive plans / saliency depth capacities (only
    entries keyed by NAMED stat functions are persisted; closures from
    the hist factories rediscover per process).  Persisting next to the
    XLA compile cache means a fresh process skips the discovery
    dispatches AND deserializes the already-compiled one-shot pipeline:
    measured driver first call 80 s -> seconds."""
    if _PLAN_STORE_LOADED[0]:
        return
    _PLAN_STORE_LOADED[0] = True
    path = _plan_store_path()
    if not path or not os.path.exists(path):
        return
    try:
        import json

        with open(path) as f:
            d = json.load(f)
        for k, plan in d.get("plans", {}).items():
            E, R, dmax, dt_key, dt_struct, with_vsz = json.loads(k)
            key = (E, R, _mean_stat_packed,
                   ((2, dt_struct),), dmax, dt_key, bool(with_vsz))
            _PLAN_MEMO.setdefault(
                key, [tuple(e) for e in plan])
        for k, L in d.get("sal_L", {}).items():
            _EXACT_SAL_L.setdefault(tuple(json.loads(k)), int(L))
    except Exception:
        pass  # stale/corrupt store: rediscover


def _plan_store_save():
    path = _plan_store_path()
    if not path:
        return
    try:
        import json

        plans = {}
        for key, plan in _PLAN_MEMO.items():
            E, R, stat_fn, struct, dmax, dtype, with_vsz = key
            if stat_fn is not _mean_stat_packed:
                continue
            if len(struct) != 1 or struct[0][0] != 2:
                continue
            plans[json.dumps(
                [E, R, dmax, dtype, struct[0][1], with_vsz])] = [
                list(e) for e in plan]
        sal = {json.dumps(list(k)): v for k, v in _EXACT_SAL_L.items()}
        with open(path + ".tmp", "w") as f:
            json.dump({"plans": plans, "sal_L": sal}, f)
        os.replace(path + ".tmp", path)
    except Exception:
        pass


def _build_plan_pipeline_fn(plan, stat_fn, R, dmax, max_supersteps,
                            dtype, struct, with_vsz, sal_L=None):
    """ONE jitted program for a memoized multi-phase plan: every phase
    and transition (and optionally the exact-saliency LCA replay) traced
    inline.  Motivation (round-5 roofline): a jit CALL through the
    remote TPU tunnel costs ~25 ms regardless of content (measured:
    one 149k-row sort per call = 25 ms, twenty sorts in one jit =
    29 ms), so the round-4 structure of 3 phase + 2 transition + 1
    saliency dispatches paid ~150 ms of pure dispatch.  This collapses
    the steady-state merge to a single dispatch.

    sal_L: when set, the program also computes exact merge-time pooled
    means from the MEAN-policy packed payload (payload[0][:, 0:2]) via
    the LCA reduction with depth capacity 2^(sal_L-1), returning
    (order, sal_exact, n_m, steps, bad, converged); otherwise
    (order, sal, n_m, steps, bad).  ``bad`` = capacity overflow OR
    unfinished frontier (caller falls back to the single-phase engine).
    """
    import jax
    import jax.numpy as jnp

    key = ("pipeline", tuple(plan), stat_fn, R, dmax, max_supersteps,
           str(dtype), struct, with_vsz, sal_L, _pack64_enabled(),
           _env_flag("GLIA_MERGE_UNROLL"))
    fn = _JIT_CACHE.get(key)
    if fn is not None:
        return fn

    E0 = plan[0][1]
    max_m = max(R - 1, 1)
    phase_fns = []
    trans_fns = []
    for pi, (steps, Ei, Ri) in enumerate(plan):
        last = pi == len(plan) - 1
        steps_k = max_supersteps if steps is None or last else steps
        phase_fns.append(_build_phase_fn(
            stat_fn, Ei, Ri, R, max_m, dmax, steps_k, dtype, struct,
            identity_g=(pi == 0), with_vsz=with_vsz))
        if not last:
            trans_fns.append(_build_trans_fn(
                Ei, Ri, R, plan[pi + 1][1], plan[pi + 1][2], dtype,
                struct, with_vsz=with_vsz))
    sal_fn = None
    if sal_L is not None:
        sal_fn = _build_exact_saliency_fn(E0, max_m, R, sal_L, dtype)

    def run(u0, v0, payload0, vstate0):
        g_of = jnp.arange(R, dtype=jnp.int32)
        order = jnp.full((max_m, 3), -1, jnp.int32)
        sal = jnp.zeros(max_m, dtype)
        alive = jnp.ones(E0, bool)
        u, v, payload, vstate = u0, v0, payload0, vstate0
        n_base = jnp.int32(0)
        total = jnp.int32(0)
        ovf = jnp.asarray(False)
        for pi in range(len(plan)):
            (u, v, payload, vstate, alive, order, sal, n_loc,
             step) = phase_fns[pi](u, v, payload, vstate, alive, g_of,
                                   n_base, order, sal)
            total = total + step
            if pi < len(trans_fns):
                u, v, payload, vstate, alive, g_of, o = trans_fns[pi](
                    u, v, payload, vstate, alive, g_of, n_base)
                ovf = ovf | o
            n_base = n_base + n_loc
        bad = ovf | alive.any()
        if sal_fn is None:
            return order, sal, n_base, total, bad
        (sc0,) = (payload0[0],)
        ex, conv = sal_fn(u0, v0, sc0[:, 0], sc0[:, 1], order)
        sal_exact = jnp.where(jnp.isnan(ex), sal, -ex)
        return order, sal_exact, n_base, total, bad, conv

    fn = jax.jit(run)
    _JIT_CACHE[key] = fn
    return fn


def _cap_quantize(x, lo=256, tile=256):
    """Round a measured capacity UP to ~1/8-of-pow2 steps (tile-aligned):
    at most 8 distinct compiled capacities per power-of-two bucket while
    staying within 12.5% of the measured need."""
    x = max(int(x), 1)
    step = max((1 << max(x.bit_length() - 1, 0)) // 8, tile)
    return max(lo, ((x + step - 1) // step) * step)


def _fused_multiphase_core(u, v, payload, stat_fn, n_regions,
                           max_supersteps, dtype, dmax=4, plan=None,
                           stats=None, vsizes=None):
    """Multi-phase fused merge: full-capacity supersteps first, then
    device-side transitions into geometrically smaller edge/vertex
    capacities for the tail (alive counts roughly halve per superstep).
    Same hierarchy semantics as mode="fused" (selection rule and chain
    emission identical; tie-breaks differ only through array positions,
    which both engines already reshuffle every superstep).

    plan=None (default) is ADAPTIVE (VERDICT r5 item #7): the first call
    on a given (E, R, policy) shape runs 2-step phases and reads the
    alive count after each (one scalar D2H sync apiece), shrinking the
    next phase's edge capacity to the quantized measured frontier (alive
    counts never grow, so the measured bound is safe) and the vertex
    capacity to 2*alive; the realized (steps, E_cap, R_cap) sequence is
    MEMOIZED per shape so steady-state calls replay it with zero
    readbacks.  An explicit plan is a list of (steps, edge_cap,
    vert_cap) with caps as fractions of E/R (<= 1.0) or absolute rows;
    the final entry runs to completion.  Any capacity overflow or
    unfinished frontier falls back to the single-phase engine
    (correctness is never capacity-dependent).
    """
    import jax
    import jax.numpy as jnp

    E = len(u)
    R = int(n_regions)
    max_m = max(R - 1, 1)
    debug = stats is not None and os.environ.get("GLIA_MERGE_DEBUG")
    if debug:
        # debug lists accumulate via setdefault into a caller-owned dict
        # that benches reuse across calls; reset so each call's printout
        # reflects only itself
        for k in ("phase_s", "phase_steps", "trans_s",
                  "alive_at_transition"):
            stats.pop(k, None)

    payload0 = tuple(jnp.asarray(p, dtype) for p in payload)
    struct = tuple((len(p.shape), str(p.dtype)) for p in payload0)
    with_vsz = vsizes is not None
    memo_key = (E, R, stat_fn, struct, dmax, str(dtype), with_vsz)

    entries = None  # resolved [(steps|None, E_cap, R_cap)] to execute
    if plan is not None:
        entries = []
        for i, (steps, ef, vf) in enumerate(plan):
            Ei = E if i == 0 else _tile_ceil(
                E * ef if ef <= 1.0 else ef)
            Ri = R if i == 0 else _tile_ceil(
                R * vf if vf <= 1.0 else vf, lo=128, tile=128)
            entries.append((steps, Ei, Ri))
    else:
        _plan_store_load()
        entries = _PLAN_MEMO.get(memo_key)
    adaptive = entries is None

    vstate_d = ()
    if with_vsz:
        vsz0 = jnp.zeros(R + max_m, dtype)
        vstate_d = (vsz0.at[:R].set(jnp.asarray(vsizes, dtype)),)
    u_d = jnp.asarray(u, jnp.int32)
    v_d = jnp.asarray(v, jnp.int32)

    if not adaptive and not debug:
        # steady state: the whole plan as ONE device program (one
        # tunnel dispatch, ~25 ms saved per avoided call) + one batched
        # scalar readback
        fn = _build_plan_pipeline_fn(
            tuple((s0, e0, r0) for s0, e0, r0 in entries), stat_fn, R,
            dmax, max_supersteps, dtype, struct, with_vsz)
        order_d, sal_d, n_base_d, total_d, bad = fn(
            u_d, v_d, payload0, vstate_d)
        vals = np.asarray(jnp.stack(
            [n_base_d, total_d, bad.astype(jnp.int32)]))
        if vals[2]:
            _PLAN_MEMO.pop(memo_key, None)
            if stats is not None:
                stats["fallback"] = True
            return _fused_merge_core(u, v, payload, stat_fn, n_regions,
                                     max_supersteps, dtype, dmax=dmax,
                                     stats=stats, vsizes=vsizes)
        if stats is not None:
            stats["n_supersteps"] = int(vals[1])
            stats["buckets"] = [e for _, e, _ in entries]
            stats["fallback"] = False
        return order_d, sal_d, int(vals[0])

    alive_d = jnp.ones(E, bool)
    order_d = jnp.full((max_m, 3), -1, jnp.int32)
    sal_d = jnp.zeros(max_m, dtype)
    g_of = jnp.arange(R, dtype=jnp.int32)
    E_cur, R_cur = E, R
    n_base = jnp.int32(0)
    total_steps = 0
    ovf_any = jnp.asarray(False)
    payload_d = payload0
    realized = []
    force_final = False
    pi = 0
    while True:
        if not adaptive:
            steps = entries[pi][0]
            last = pi == len(entries) - 1
        else:
            # 1-step phases while the frontier is large (the first
            # superstep kills ~half the edges, so shrinking immediately
            # after it saves most of superstep 2's full-E cost; measured
            # -11% at 2048^2), then 2-step phases for the mid tail
            last = force_final or E_cur <= 4096 or pi >= 6
            steps = None if last else (1 if pi < 2 else 2)
        steps_k = max_supersteps if steps is None or last else steps
        fn = _build_phase_fn(stat_fn, E_cur, R_cur, R, max_m, dmax,
                             steps_k, dtype, struct,
                             identity_g=(pi == 0), with_vsz=with_vsz)
        base_start = n_base  # fresh locals of THIS phase map with the
        # base at phase START (affine rule); pass the same value to the
        # following transition when it composes the id table
        if debug:
            import time as _time

            import jax as _jax

            _jax.block_until_ready((u_d, v_d, payload_d, alive_d))
            _t0 = _time.time()
        (u_d, v_d, payload_d, vstate_d, alive_d, order_d, sal_d, n_loc,
         step_done) = fn(u_d, v_d, payload_d, vstate_d, alive_d, g_of,
                         base_start, order_d, sal_d)
        if debug:
            _jax.block_until_ready((u_d, alive_d, order_d))
            stats.setdefault("phase_s", []).append(
                round(_time.time() - _t0, 4))
            stats.setdefault("phase_steps", []).append(int(step_done))
        n_base = base_start + n_loc
        total_steps = total_steps + step_done  # device scalar; one host
        # readback at the end (adaptive DISCOVERY pays one alive-count
        # sync per transition, memoized replays pay none)
        realized.append((None if last else steps, E_cur, R_cur))
        if last:
            break
        if not adaptive:
            E2, R2_cap = entries[pi + 1][1], entries[pi + 1][2]
        else:
            n_alive = int(alive_d.sum())
            if n_alive == 0:
                realized[-1] = (None, E_cur, R_cur)
                break
            E2 = _cap_quantize(n_alive)
            R2_cap = _cap_quantize(min(2 * n_alive, R_cur), lo=128,
                                   tile=128)
            if E2 >= E_cur:
                # frontier not shrinking: finish at the current capacity
                force_final = True
                pi += 1
                continue
        tf = _build_trans_fn(E_cur, R_cur, R, E2, R2_cap, dtype, struct,
                             with_vsz=with_vsz)
        if debug:
            _t0 = _time.time()
        u_d, v_d, payload_d, vstate_d, alive_d, g_of, ovf = tf(
            u_d, v_d, payload_d, vstate_d, alive_d, g_of, base_start)
        ovf_any = ovf_any | ovf
        if debug:
            _jax.block_until_ready(alive_d)
            stats.setdefault("trans_s", []).append(
                round(_time.time() - _t0, 4))
            stats.setdefault("alive_at_transition", []).append(
                int(alive_d.sum()))
        E_cur, R_cur = E2, R2_cap
        pi += 1

    n_m_total = int(n_base)
    leftover = bool(alive_d.any())
    if bool(ovf_any) or leftover:
        # capacity plan too tight for this RAG: fall back to the
        # single-phase engine (slower, never wrong); drop a stale memo
        # so the next call re-measures
        _PLAN_MEMO.pop(memo_key, None)
        if stats is not None:
            stats["fallback"] = True
        return _fused_merge_core(u, v, payload, stat_fn, n_regions,
                                 max_supersteps, dtype, dmax=dmax,
                                 stats=stats, vsizes=vsizes)
    if adaptive:
        _PLAN_MEMO[memo_key] = realized
        _plan_store_save()
    if stats is not None:
        stats["n_supersteps"] = int(total_steps)
        stats["buckets"] = [e for _, e, _ in realized]
        stats["fallback"] = False
    return order_d, sal_d, n_m_total
