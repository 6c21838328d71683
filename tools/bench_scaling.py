"""CPU-mesh scaling of the full-width halo train step (VERDICT item #4).

Measures the production sharded train step (full feature width, routing-
planned ragged halo) at 1/2/4/8 shards on a virtual CPU mesh -- the
algorithmic-overhead scaling curve (real ICI can't be measured on one
chip; this isolates partition balance + comm volume + collective count).

Usage: python tools/bench_scaling.py [side] [n_cells]
"""

import os
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


def main():
    side = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    n_cells = int(sys.argv[2]) if len(sys.argv) > 2 else 900

    import jax

    jax.config.update("jax_platforms", "cpu")

    import scipy.ndimage as ndi

    from glia_tpu.data.synthetic import synthetic_em_slice
    from glia_tpu.graph.rag import build_rag
    from glia_tpu.native import watershed_native
    from glia_tpu.parallel.halo import HaloPlan
    from glia_tpu.parallel.mesh import make_mesh
    from glia_tpu.parallel.partition import partition_rag
    from glia_tpu.parallel.train import (
        make_halo_train_step, shard_halo_train_inputs)

    data = synthetic_em_slice((side, side), n_cells=n_cells, seed=9,
                              blur=1.2, noise=0.12)
    seg = watershed_native(ndi.gaussian_filter(data["pb"], 1.0), level=0.004)
    rag = build_rag(seg, contour_only=False)
    rng = np.random.default_rng(0)
    labels = rng.integers(0, 2, rag.n_edges).astype(np.float32)
    images = [data["pb"], data["intensity"]]
    log(f"RAG: {rag.n_regions} regions, {rag.n_edges} edges")

    results = []
    for n in (1, 2, 4, 8):
        part = partition_rag(rag, n)
        plan = HaloPlan(part, rag)
        mesh = make_mesh(n)
        init, step, (edge_w, D) = make_halo_train_step(
            mesh, plan, rag.n_regions, n_images=2, k_pixels=32, n_bins=16)
        batch = shard_halo_train_inputs(mesh, plan, part, rag, images,
                                        labels, k_pixels=32, n_bins=16)
        w, opt_state = init()
        w, opt_state, loss = step(w, opt_state, batch)  # compile
        float(loss)
        t0 = time.time()
        iters = 10
        for _ in range(iters):
            w, opt_state, loss = step(w, opt_state, batch)
        float(loss)
        dt = (time.time() - t0) / iters
        dense_rows = n * rag.n_regions
        results.append({
            "shards": n,
            "step_ms": round(dt * 1e3, 2),
            "edges_per_s": round(rag.n_edges / dt),
            "cut_fraction": round(part.cut_fraction, 4),
            "balance": round(part.balance(), 3),
            "halo_rows": plan.comm_rows,
            "dense_rows": dense_rows,
            "comm_ratio_vs_dense": round(
                plan.comm_rows / max(dense_rows, 1), 4),
            "feat_dim": D,
        })
        log(results[-1])

    base = results[0]["edges_per_s"]
    for r in results:
        r["efficiency_vs_1shard"] = round(
            r["edges_per_s"] / (base * r["shards"]), 3)
        # per-shard work scales 1/n; on one host the CPU pool is shared, so
        # also report speedup vs 1 shard (wall-clock)
        r["speedup"] = round(r["edges_per_s"] / base, 3)
    import json

    print(json.dumps(results))


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
