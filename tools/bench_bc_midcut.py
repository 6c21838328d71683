"""Mid-cut quality: device BC superstep order vs host serial BC order.

VERDICT round-2 item #7: full merges are structurally identical for any
order (same connected components), so quality parity of the device
classifier-in-the-loop engine must be shown at MID-CUT operating points --
the BC analogue of the threshold-cut VI parity that legitimized the
pb-policy superstep engine.  At matched probability thresholds tau, both
hierarchies are resolved with the monotonized threshold cut (merge a
candidate iff its whole build chain had P(merge) >= tau) and scored (VI
vs truth).  Reference semantics approximated: one pop of the max-
probability candidate per step, util/struct_merge_bc.hxx:10-58.

Usage: python tools/bench_bc_midcut.py [side] [n_cells] [n_trees]
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

if os.environ.get("GLIA_FORCE_CPU"):
    # the JAX_PLATFORMS env var is frozen by sitecustomize's early import;
    # the config knob still works
    import jax

    jax.config.update("jax_platforms", "cpu")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def bc_midcut_compare(side=512, n_cells=None, n_trees=60, seed=9,
                      taus=(0.9, 0.8, 0.7, 0.6, 0.5)):
    """Returns list of rows {tau, vi_serial, vi_device, regions_*}."""
    import scipy.ndimage as ndi

    from glia_tpu.data.synthetic import synthetic_em_slice
    from glia_tpu.features import FeatureConfig, TreeFeatures, bc_labels
    from glia_tpu.graph.merge import apply_merge_order
    from glia_tpu.graph.merge_bc import greedy_merge_bc
    from glia_tpu.graph.merge_bc_device import merge_order_bc_device
    from glia_tpu.graph.merge_device import threshold_cut
    from glia_tpu.graph.rag import build_rag
    from glia_tpu.metrics import eval_vi
    from glia_tpu.models.forest import (
        make_label_scorer, predict_label_fraction, train_forest)
    from glia_tpu.native import greedy_merge_native, watershed_native

    if n_cells is None:
        n_cells = (side // 17) ** 2

    # train on an independent slice
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
    log(f"train: {len(X)}x{X.shape[1]}, {n_trees} trees "
        f"({time.time()-t0:.1f}s)")

    te = synthetic_em_slice((side, side), n_cells=n_cells, seed=seed,
                            blur=1.2, noise=0.12)
    seg0 = watershed_native(ndi.gaussian_filter(te["pb"], 1.0), level=0.004)
    rag = build_rag(seg0, contour_only=False)
    cfg = FeatureConfig.standard(te["pb"], te["intensity"], n_bins=16)
    log(f"test RAG: {rag.n_regions} regions, {rag.n_edges} edges")

    # host serial classifier-in-the-loop order.  Hours-long at 2048^2, so
    # it is disk-cached: a serial-only pass (GLIA_MIDCUT_SERIAL_ONLY=1,
    # typically with GLIA_FORCE_CPU=1 so no TPU session is held) can run
    # detached, and a later chip pass reuses the order.
    def predict_batch(F):
        return predict_label_fraction(model, F, label=-1)

    # v2 version token: bump whenever greedy_merge_bc, the feature
    # config, or the training recipe above changes -- a stale cached
    # order would silently skew the serial-vs-device table
    SERIAL_CACHE_VERSION = "v2"
    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))),
        f".cache_midcut_{SERIAL_CACHE_VERSION}_"
        f"{side}_{n_cells}_{n_trees}_{seed}.npz")
    use_cache = rag.n_edges > 30000  # suite-scale runs stay uncached
    if use_cache and os.path.exists(cache):
        d = np.load(cache)
        order_h, probs_h = d["order"], d["probs"]
        log(f"host serial BC order: {len(order_h)} merges (cached: "
            f"{cache}, mtime {time.ctime(os.path.getmtime(cache))}; "
            f"delete the file to invalidate)")
    else:
        t0 = time.time()
        if os.environ.get("GLIA_MIDCUT_PY_SERIAL"):
            # the Python oracle (hours at 1024^2+); kept for cross-checks
            order_h, probs_h = greedy_merge_bc(
                rag, cfg, lambda f: float(predict_batch(f[None, :])[0]),
                predict_batch=predict_batch)
        else:
            # native C++ serial BC engine -- bit-identical to the Python
            # oracle (tests/test_merge_bc.py) at ~100x the speed, which
            # is what finally extends this table past 512^2 (VERDICT r4
            # weak #3)
            from glia_tpu.native import greedy_merge_bc_native

            order_h, probs_h = greedy_merge_bc_native(rag, cfg, model)
        log(f"host serial BC order: {len(order_h)} merges "
            f"({time.time()-t0:.1f}s)")
        if use_cache:
            np.savez(cache, order=np.asarray(order_h),
                     probs=np.asarray(probs_h))
    if os.environ.get("GLIA_MIDCUT_SERIAL_ONLY"):
        log("serial-only pass done; rerun without the flag for the table")
        return []

    # device superstep order
    predict_dev, consts = make_label_scorer(model, label=-1, embed=True)
    t0 = time.time()
    order_d, probs_d = merge_order_bc_device(rag, cfg, predict_dev,
                                             predict_consts=consts)
    log(f"device BC order: {len(order_d)} merges ({time.time()-t0:.1f}s)")

    rows = []
    for tau in taus:
        out = {"tau": tau}
        for name, order, probs in [("serial", order_h, probs_h),
                                   ("device", order_d, probs_d)]:
            mask = threshold_cut(np.asarray(order),
                                 -np.asarray(probs, np.float64), -tau)
            seg = apply_merge_order(seg0, np.asarray(order)[mask])
            _, _, vi = eval_vi(seg, te["truth"])
            out[f"vi_{name}"] = round(float(vi), 4)
            out[f"regions_{name}"] = int(len(np.unique(seg)))
        out["dvi"] = round(out["vi_device"] - out["vi_serial"], 4)
        rows.append(out)
        log(f"tau={tau}: serial VI {out['vi_serial']:.4f} "
            f"({out['regions_serial']} regions) vs device "
            f"{out['vi_device']:.4f} ({out['regions_device']}) "
            f"dVI {out['dvi']:+.4f}")
    return rows


def main():
    import json

    side = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    n_cells = int(sys.argv[2]) if len(sys.argv) > 2 else None
    n_trees = int(sys.argv[3]) if len(sys.argv) > 3 else 60
    rows = bc_midcut_compare(side, n_cells, n_trees)
    print(json.dumps(rows), flush=True)


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
