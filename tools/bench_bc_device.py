"""Real-TPU benchmark of the device classifier-in-the-loop merge pipeline.

This is the framework's REAL hot path (VERDICT round-1 item #1): full-width
BoundaryClassificationFeats assembly (~reference width, bc_feat.hxx:219-243)
feeding the vectorized RF forest walk for EVERY frontier candidate, plus the
batched superstep merge itself, all on device.

Usage: python tools/bench_bc_device.py [side] [n_cells] [n_trees]
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

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    side = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    n_cells = int(sys.argv[2]) if len(sys.argv) > 2 else (side // 17) ** 2
    n_trees = int(sys.argv[3]) if len(sys.argv) > 3 else 120

    import scipy.ndimage as ndi

    from glia_tpu.data.synthetic import synthetic_em_slice
    from glia_tpu.features import FeatureConfig, TreeFeatures, bc_labels
    from glia_tpu.graph import build_rag, build_tree, node_potentials
    from glia_tpu.graph.merge_bc_device import merge_order_bc_device
    from glia_tpu.infer.greedy import resolve_tree_greedy
    from glia_tpu.infer.segment import final_segmentation
    from glia_tpu.metrics import eval_vi
    from glia_tpu.models.forest import (
        make_label_scorer, make_predict_votes_jax, train_forest)
    from glia_tpu.native import greedy_merge_native, watershed_native

    # ---- train a forest on one slice (no-saliency features = the
    #      merge_order_bc feature width) ----
    t0 = time.time()
    tr = synthetic_em_slice((min(side, 256),) * 2,
                            n_cells=max(n_cells // max(side // 256, 1) ** 2,
                                        20), seed=1)
    seg_t = watershed_native(ndi.gaussian_filter(tr["pb"], 1.0), level=0.004)
    rag_t = build_rag(seg_t, contour_only=False)
    cfg_t = FeatureConfig.standard(tr["pb"], tr["intensity"], n_bins=16)
    order_t, _ = greedy_merge_native(rag_t, tr["pb"], policy="median")
    X = TreeFeatures(rag_t, order_t, cfg_t, saliencies=None).bc_features()
    y = bc_labels(seg_t, tr["truth"], order_t, rule="f1")[0]
    model = train_forest(X, y, n_trees=n_trees, seed=0)
    li = int(np.nonzero(model.classes == -1)[0][0])
    log(f"train: {len(X)} samples x {X.shape[1]} feats, {n_trees} trees, "
        f"depth {model.max_depth} ({time.time()-t0:.1f}s)")

    which = sys.argv[4] if len(sys.argv) > 4 else "pallas"
    predict_dev, consts = make_label_scorer(model, label=-1, backend=which,
                                            embed=True)
    log(f"classifier backend: {which}")

    # ---- test RAG at target scale ----
    t0 = time.time()
    te = synthetic_em_slice((side, side), n_cells=n_cells, seed=9,
                            blur=1.2, noise=0.12)
    seg0 = watershed_native(ndi.gaussian_filter(te["pb"], 1.0), level=0.004)
    rag = build_rag(seg0, contour_only=False)
    cfg = FeatureConfig.standard(te["pb"], te["intensity"], n_bins=16)
    log(f"test RAG: {rag.n_regions} regions, {rag.n_edges} edges "
        f"({time.time()-t0:.1f}s)")

    # host baseline: the reference's serial greedy hot loop (C++), same RAG
    t0 = time.time()
    order_h, _ = greedy_merge_native(rag, te["pb"], policy="median")
    host_dt = time.time() - t0
    host_edges_s = (rag.n_edges + len(order_h)) / host_dt
    log(f"host serial greedy (median): {host_edges_s:,.0f} edges/s")

    import jax
    log(f"device: {jax.devices()[0]}")

    # ---- device BC pipeline: compile + steady state ----
    stats = {}
    t0 = time.time()
    order, probs = merge_order_bc_device(rag, cfg, predict_dev, stats=stats, predict_consts=consts)
    first_dt = time.time() - t0
    log(f"first run (compile+run): {first_dt:.1f}s, {len(order)} merges, "
        f"{stats['n_supersteps']} supersteps, {stats['n_scored']} scored")
    t0 = time.time()
    order, probs = merge_order_bc_device(rag, cfg, predict_dev, stats=stats, predict_consts=consts)
    run_dt = time.time() - t0
    scores_s = stats["n_scored"] / run_dt
    merges_s = len(order) / run_dt
    log(f"steady run: {run_dt:.2f}s -> {scores_s:,.0f} full-width candidate "
        f"scores/s, {merges_s:,.0f} merges/s "
        f"({stats['n_supersteps']} supersteps, E={stats['E']}, "
        f"D={stats['feat_dim']})")

    # ---- quality: resolve the device BC tree, compare to pb-order path ----
    tree = build_tree(order)
    picks = resolve_tree_greedy(tree, node_potentials(tree, probs))
    seg = final_segmentation(seg0, tree, picks)
    _, _, vi0 = eval_vi(seg0, te["truth"])
    _, _, vi = eval_vi(seg, te["truth"])
    log(f"quality: watershed VI {vi0:.3f} -> device BC-HMT VI {vi:.3f}")

    print(f"{{\"edges\": {rag.n_edges}, \"feat_dim\": {stats['feat_dim']},"
          f" \"compile_s\": {first_dt-run_dt:.1f},"
          f" \"scores_per_s\": {scores_s:.0f},"
          f" \"merges_per_s\": {merges_s:.0f},"
          f" \"host_serial_edges_s\": {host_edges_s:.0f},"
          f" \"vi_watershed\": {vi0:.4f}, \"vi_bc\": {vi:.4f}}}")


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
