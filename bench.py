"""Benchmark: RAG aggregation edges/s/chip (BASELINE.json headline metric).

Pipeline measured on-device: per-edge boundary-pixel segment stats ->
edge->region scatter aggregation -> region context gather -> MLP2 merge
scoring, jitted as one XLA program (glia_tpu.parallel.train.edge_forward).
This is the framework's hot path: one "edge" processed = one boundary
scored against its region context, the unit the reference's serial
boundary-table loop processes one at a time
(reference: code/type/boundary_table.hxx:122-167).

vs_baseline = device edges/s divided by the host-side exact serial greedy
merge engine's edges/s on the same RAG (the reference's algorithm, our C++
implementation -- the reference itself does not compile here: it needs ITK;
SURVEY.md section 6 records that it also publishes no numbers).

Prints exactly ONE JSON line on stdout; diagnostics go to stderr.
"""

import json
import os
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import scipy.ndimage as ndi

    from glia_tpu.data.synthetic import synthetic_em_slice
    from glia_tpu.graph.rag import build_rag
    from glia_tpu.native import greedy_merge_native, watershed_native

    # ---- build four 512x512 ISBI-like slices (one RAG each) ----
    rags, pbs = [], []
    t0 = time.time()
    for si in range(4):
        data = synthetic_em_slice(shape=(512, 512), n_cells=900,
                                  seed=7 + si, blur=1.2, noise=0.12)
        pb = data["pb"]
        seg = watershed_native(ndi.gaussian_filter(pb, 1.0), level=0.004)
        rags.append(build_rag(seg, contour_only=False))
        pbs.append(pb)
    n_regions = sum(r.n_regions for r in rags)
    n_edges = sum(r.n_edges for r in rags)
    log(f"setup: {n_regions} regions, {n_edges} edges over {len(rags)} "
        f"slices ({time.time()-t0:.2f}s)")
    rag, pb = rags[0], pbs[0]

    # ---- host baseline: exact serial greedy merge (reference hot loop) ----
    t0 = time.time()
    n_merges = 0
    for r, p in zip(rags, pbs):
        order, sals = greedy_merge_native(r, p, policy="median")
        n_merges += len(order)
    host_dt = time.time() - t0
    # edges/s for the serial loop: edges retired (popped+rekeyed) per sec.
    # Each merge retires >= 1 edge; total edge events ~ E + merges.
    host_edges_s = (n_edges + n_merges) / host_dt
    log(f"host exact greedy: {n_merges} merges in {host_dt:.3f}s "
        f"-> {host_edges_s:,.0f} edges/s")

    # ---- device: jitted edge scoring over the full RAG ----
    import jax
    import jax.numpy as jnp

    from glia_tpu.models.mlp import mlp2_init
    from glia_tpu.parallel.train import MLP_DIMS, edge_forward

    dev = jax.devices()[0]
    log(f"device: {dev}")

    # pack all slices' edges into one batch (regions offset per slice)
    from glia_tpu.ops.pack import pack_edge_pixels

    K = 32
    px_l, mask_l, u_l, v_l = [], [], [], []
    r_off = 0
    for r, p in zip(rags, pbs):
        ui, vi, px_i, mask_i = pack_edge_pixels(r, p, K)
        u_l.append(ui + r_off)
        v_l.append(vi + r_off)
        px_l.append(px_i)
        mask_l.append(mask_i)
        r_off += r.n_regions
    u = np.concatenate(u_l)
    v = np.concatenate(v_l)
    px = np.concatenate(px_l)
    mask = np.concatenate(mask_l)
    E = len(u)
    valid = np.ones(E, np.float32)
    R = r_off
    D, N1, N2 = MLP_DIMS
    w = jnp.asarray(mlp2_init(D, N1, N2, 0), dtype=jnp.float32)

    fn = jax.jit(lambda w, u, v, px, m, val: edge_forward(
        w, u, v, px, m, val, R, axis_name=None))
    args = tuple(jax.device_put(jnp.asarray(x), dev)
                 for x in (u, v, px, mask, valid))
    out = fn(w, *args)
    out.block_until_ready()  # compile
    n_iter = 50
    t0 = time.time()
    for _ in range(n_iter):
        out = fn(w, *args)
    out.block_until_ready()
    dev_dt = (time.time() - t0) / n_iter
    dev_edges_s = E / dev_dt
    log(f"device edge scoring: {E} edges in {dev_dt*1e3:.3f}ms/iter "
        f"-> {dev_edges_s:,.0f} edges/s/chip")

    result = {
        "metric": "rag_aggregation_edges_per_s_per_chip",
        "value": round(dev_edges_s, 1),
        "unit": "edges/s",
        "vs_baseline": round(dev_edges_s / host_edges_s, 3),
    }
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    try:
        main()
    finally:
        sys.stdout.flush()
        sys.stderr.flush()
        os._exit(0)  # background accelerator threads block normal exit
