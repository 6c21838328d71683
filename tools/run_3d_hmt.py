"""BASELINE config #2 at stated scale: 3D HMT on a 100x512x512 EM volume.

End-to-end: synthetic EM volume -> 3D watershed supervoxels -> pre-merge ->
supervoxel RAG -> greedy 3D merge tree (median policy) -> full-width BC
features -> forest merge probabilities -> greedy tree resolution -> VI /
adapted-Rand vs the 3D truth, with stage wall-clocks and peak RSS.
(Reference capability: GLIA_3D compile switch, glia_base.hxx:49-53; all
templates dimension-generic.  Here dimension is a runtime parameter.)

Usage: python tools/run_3d_hmt.py [Z] [side] [n_cells]
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

import numpy as np

if os.environ.get("GLIA_FORCE_CPU"):
    import jax

    jax.config.update("jax_platforms", "cpu")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def peak_gb():
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6


def main():
    Z = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    side = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    n_cells = int(sys.argv[3]) if len(sys.argv) > 3 else 400

    import json

    from glia_tpu.data.synthetic import synthetic_em_slice, synthetic_em_stack
    from glia_tpu.pipeline import evaluate, hmt_train
    from glia_tpu.pipeline3d import hmt3d_segment

    stages = {}
    t0 = time.time()
    stack = synthetic_em_stack(shape=(Z, side, side), n_cells=n_cells,
                               seed=17)
    pb_vol = stack["pb3d"]
    int_vol = np.stack([s["intensity"] for s in stack["slices"]])
    truth = stack["truth3d"]
    stages["generate"] = round(time.time() - t0, 1)
    log(f"volume: {Z}x{side}x{side} = {pb_vol.size/1e6:.0f}M voxels, "
        f"{n_cells} true cells ({stages['generate']}s, "
        f"peak {peak_gb():.1f}GB)")

    # train the boundary classifier on an independent small 3D subvolume:
    # 3D supervoxel shape/stat distributions differ from 2D slices, and a
    # 2D-trained forest miscalibrates the merge probabilities (measured:
    # VI 0.73 -> 1.45 over-merge with 2D training at this scale)
    t0 = time.time()
    tz, tside = max(Z // 4, 8), max(side // 2, 64)
    tcells = max(n_cells * (tz * tside * tside)
                 // (Z * side * side), 8)
    tr = synthetic_em_stack(shape=(tz, tside, tside), n_cells=tcells,
                            seed=31)
    tr_vol = {"pb": tr["pb3d"],
              "intensity": np.stack([s["intensity"]
                                     for s in tr["slices"]]),
              "truth": tr["truth3d"]}
    model = hmt_train([tr_vol], n_trees=80, pre_merge_size=50,
                      watershed_level=0.04)
    stages["train"] = round(time.time() - t0, 1)
    log(f"trained forest on {tz}x{tside}x{tside} subvolume "
        f"({stages['train']}s)")

    t0 = time.time()
    seg, aux = hmt3d_segment(pb_vol, int_vol, model, watershed_level=0.04,
                             pre_merge_size=50)
    stages["segment"] = round(time.time() - t0, 1)
    n_sv = int(len(np.unique(aux["seg0"])))
    log(f"3D HMT: {n_sv} supervoxels, {len(aux['order'])} merges "
        f"({stages['segment']}s, peak {peak_gb():.1f}GB)")

    t0 = time.time()
    base = evaluate(aux["seg0"], truth)
    ours = evaluate(seg, truth)
    stages["evaluate"] = round(time.time() - t0, 1)

    out = {
        "config": f"3D HMT {Z}x{side}x{side}",
        "voxels": int(pb_vol.size),
        "supervoxels": n_sv,
        "merges": int(len(aux["order"])),
        "vi_watershed": round(base["vi"], 4),
        "vi_hmt": round(ours["vi"], 4),
        "rand_error_watershed": round(base["rand_error"], 4),
        "rand_error_hmt": round(ours["rand_error"], 4),
        "stages_s": stages,
        "wall_s": round(sum(stages.values()), 1),
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
