"""Median-policy threshold-cut drift at scale (VERDICT r5 item #3b):
the device hist-median order cut on (a) the engine's stale start-of-
superstep sketch medians and (b) EXACT merge-time upper medians from the
multiset replay (replay_exact_saliency_median), both scored against the
serial median engine's cut at the matched threshold.

The drift is algorithmic, not hardware: run anywhere.
  JAX_PLATFORMS=cpu python tools/bench_median_drift.py [side] [policy]
policy: median (default) or median_minsize.
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import scipy.ndimage as ndi

if os.environ.get("GLIA_FORCE_CPU"):
    # sitecustomize's early jax import freezes JAX_PLATFORMS; the config
    # knob still works
    import jax

    jax.config.update("jax_platforms", "cpu")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def median_drift(side=1024, policy="median", n_bins=32, seed=11):
    from glia_tpu.data.synthetic import synthetic_em_slice
    from glia_tpu.graph.merge import apply_merge_order
    from glia_tpu.graph.merge_device import (
        edge_hist_arrays, merge_batched_device_hist,
        merge_batched_device_hist_minsize, order_to_keys,
        replay_exact_saliency_median, threshold_cut)
    from glia_tpu.graph.rag import build_rag
    from glia_tpu.metrics import eval_vi
    from glia_tpu.native import greedy_merge_native, watershed_native

    n_cells = (side // 14) ** 2
    data = synthetic_em_slice((side, side), n_cells=n_cells, seed=seed,
                              blur=1.2, noise=0.12)
    seg = watershed_native(ndi.gaussian_filter(data["pb"], 1.0),
                           level=0.004)
    rag = build_rag(seg, contour_only=False)
    R = rag.n_regions
    log(f"{side}^2: {R} regions, {rag.n_edges} edges, policy={policy}")

    t0 = time.time()
    order_h, sal_h = greedy_merge_native(rag, data["pb"], policy=policy)
    log(f"serial {policy} engine: {len(order_h)} merges "
        f"({time.time()-t0:.1f}s)")

    u, v, h = edge_hist_arrays(rag, data["pb"], n_bins=n_bins)
    t0 = time.time()
    sizes = None
    if policy == "median_minsize":
        sizes = rag.sizes
        order_d, sal_d, n_m = merge_batched_device_hist_minsize(
            u, v, h, sizes, R, mode="fused_ms")
    else:
        order_d, sal_d, n_m = merge_batched_device_hist(
            u, v, h, R, mode="fused_ms")
    log(f"device hist-{policy} fused_ms: {n_m} merges "
        f"({time.time()-t0:.1f}s)")
    order_np = np.asarray(order_d)[:n_m]
    okeys = order_to_keys(order_d, n_m, rag)

    t0 = time.time()
    pb = np.asarray(data["pb"], np.float64).ravel()
    ex = replay_exact_saliency_median(u, v, rag.edge_ptr,
                                      pb[rag.edge_pixels], order_np,
                                      region_sizes=sizes)
    log(f"exact median replay: {time.time()-t0:.1f}s")
    stale = -np.asarray(sal_d)[:n_m]
    ex = np.where(np.isnan(ex), stale, ex)

    k = R - n_cells
    tau = -sal_h[k - 1]
    seg_h = apply_merge_order(seg, order_h, threshold_index=k)
    _, _, vi_h = eval_vi(seg_h, data["truth"])
    out = {"side": side, "policy": policy, "n_bins": n_bins,
           "edges": int(rag.n_edges),
           "vi_serial": round(float(vi_h), 4)}
    for name, stats in (("stale", stale), ("exact", ex)):
        mask = threshold_cut(okeys, stats, tau)
        seg_d = apply_merge_order(seg, okeys[mask])
        _, _, vi_d = eval_vi(seg_d, data["truth"])
        out[f"vi_{name}"] = round(float(vi_d), 4)
        out[f"dvi_{name}"] = round(float(vi_d - vi_h), 4)
        log(f"{name} cut: VI {vi_d:.4f} (dVI {vi_d - vi_h:+.4f})")
    return out


def main():
    side = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    policy = sys.argv[2] if len(sys.argv) > 2 else "median"
    n_bins = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    print(json.dumps(median_drift(side, policy, n_bins=n_bins)),
          flush=True)


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
