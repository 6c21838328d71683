"""BASELINE config #5 at stated scale: SNEMI3D-scale synthetic volume
(100x1024x1024, ~105M voxels), supervoxel RAG edge-partitioned over an
8-device mesh, running the production full-width ragged-halo train step.

On this host the mesh is 8 virtual CPU devices (multi-chip TPU hardware is
not available), so the recorded numbers are the ALGORITHMIC scaling
quantities -- partition balance, cut fraction, halo rows/bytes vs dense
replication -- plus wall-clock/peak-RSS capacity proof.  The analytic ICI
model over these counters lives in docs/RESULTS.md.

Usage: python tools/run_snemi_sharded.py [Z] [side] [n_cells] [shards]
"""

import os
import resource
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# persistent XLA compilation cache (repeat runs skip the one-time compile)
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "5")

# env vars are too late when sitecustomize pre-imports jax; the runtime
# config update below is what actually enables the persistent cache
import sys as _sys  # noqa: E402
_sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from glia_tpu.utils.cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()

os.environ.setdefault("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in os.environ["XLA_FLAGS"]:
    os.environ["XLA_FLAGS"] += " --xla_force_host_platform_device_count=8"

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def peak_gb():
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6


def main():
    Z = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    side = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    n_cells = int(sys.argv[3]) if len(sys.argv) > 3 else 400
    n_shards = int(sys.argv[4]) if len(sys.argv) > 4 else 8

    import json

    import jax

    jax.config.update("jax_platforms", "cpu")


    from glia_tpu.data.synthetic import synthetic_em_stack
    from glia_tpu.graph.rag import build_rag
    from glia_tpu.native import watershed_native
    from glia_tpu.parallel.halo import HaloPlan
    from glia_tpu.parallel.mesh import make_mesh
    from glia_tpu.parallel.partition import partition_rag
    from glia_tpu.parallel.train import (
        make_halo_train_step, shard_halo_train_inputs)

    stages = {}
    t0 = time.time()
    stack = synthetic_em_stack(shape=(Z, side, side), n_cells=n_cells,
                               seed=23)
    pb = stack["pb3d"]
    intensity = np.stack([s["intensity"] for s in stack["slices"]])
    stages["generate"] = round(time.time() - t0, 1)
    log(f"volume: {Z}x{side}x{side} = {pb.size/1e6:.0f}M voxels "
        f"({stages['generate']}s, peak {peak_gb():.1f}GB)")

    t0 = time.time()
    level = float(os.environ.get("GLIA_WS_LEVEL", "0.01"))
    seg = watershed_native(pb, level=level)
    stages["watershed"] = round(time.time() - t0, 1)
    t0 = time.time()
    rag = build_rag(seg, contour_only=False)
    stages["build_rag"] = round(time.time() - t0, 1)
    E, R = rag.n_edges, rag.n_regions
    log(f"supervoxel RAG: {R} regions, {E} edges (watershed "
        f"{stages['watershed']}s, rag {stages['build_rag']}s, "
        f"peak {peak_gb():.1f}GB)")

    # edge partition + ragged halo plan (capacity-padded CSR: each shard's
    # edge rows padded to E_max, halo tables to H; SURVEY hard part #4)
    t0 = time.time()
    part = partition_rag(rag, n_shards)
    plan = HaloPlan(part, rag)
    stages["partition_plan"] = round(time.time() - t0, 1)
    mesh = make_mesh(n_shards)
    rng = np.random.default_rng(0)
    labels = rng.integers(0, 2, E).astype(np.float32)
    t0 = time.time()
    batch = shard_halo_train_inputs(mesh, plan, part, rag,
                                    [pb, intensity], labels,
                                    k_pixels=32, n_bins=16)
    stages["shard_inputs"] = round(time.time() - t0, 1)
    E_max = batch["E_max"]
    log(f"sharded: E_max {E_max}/shard, halo H {plan.H}, "
        f"comm rows {plan.comm_rows} ({stages['shard_inputs']}s, "
        f"peak {peak_gb():.1f}GB)")

    init, step, (edge_w, D) = make_halo_train_step(
        mesh, plan, R, n_images=2, k_pixels=32, n_bins=16)
    w, opt_state = init()
    t0 = time.time()
    w, opt_state, loss = step(w, opt_state, batch)
    l0 = float(loss)
    stages["compile_first_step"] = round(time.time() - t0, 1)
    t0 = time.time()
    iters = 3
    for _ in range(iters):
        w, opt_state, loss = step(w, opt_state, batch)
    l1 = float(loss)
    step_s = (time.time() - t0) / iters
    stages["steady_step"] = round(step_s, 2)

    dense_rows = n_shards * R
    row_bytes = 4 * (1 + edge_w)
    out = {
        "config": f"SNEMI-scale sharded {Z}x{side}x{side} @ {n_shards}",
        "voxels": int(pb.size),
        "regions": int(R),
        "edges": int(E),
        "shards": n_shards,
        "feat_dim": int(D),
        "edge_feat_w": int(edge_w),
        "cut_fraction": round(part.cut_fraction, 4),
        "balance": round(part.balance(), 3),
        "halo_rows": int(plan.comm_rows),
        "dense_rows": int(dense_rows),
        "comm_ratio_vs_dense": round(plan.comm_rows / max(dense_rows, 1), 5),
        "halo_bytes_per_step": int(2 * plan.comm_rows * row_bytes),
        "step_s": round(step_s, 2),
        "edges_per_s": round(E / step_s),
        "loss_first": round(l0, 4),
        "loss_after": round(l1, 4),
        "stages_s": stages,
        "wall_s": round(sum(v for v in stages.values()), 1),
        "peak_rss_gb": round(peak_gb(), 2),
    }
    log(json.dumps(out, indent=2))
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    rc = 0
    try:
        main()
    except BaseException:
        import traceback

        traceback.print_exc()
        rc = 1
    finally:
        sys.stdout.flush()
        sys.stderr.flush()
        os._exit(rc)
