"""Experiment: quantify + shrink the batched-merge threshold-cut VI
drift at scale (VERDICT r3 weak #1 / next #2).

Hypothesis: the drift comes from STALE saliencies -- each attach records
its start-of-superstep pooled-mean statistic, while the serial engine
re-pools after every merge; near the cut threshold these stale values
misclassify merges.  Fix candidate: replay the batched order serially on
the host, recomputing each merge's EXACT pooled boundary mean at merge
time, and cut on those.

Run on CPU (the drift is algorithmic, not hardware):
  JAX_PLATFORMS=cpu python tools/exp_drift.py [side]
"""

import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np
import scipy.ndimage as ndi

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from glia_tpu.data.synthetic import synthetic_em_slice
from glia_tpu.graph.merge import apply_merge_order
from glia_tpu.graph.merge_device import (
    edge_mean_arrays, merge_batched_device, order_to_keys, threshold_cut)
from glia_tpu.graph.rag import build_rag
from glia_tpu.metrics import eval_vi
from glia_tpu.native import greedy_merge_native, watershed_native


def replay_exact_stats(u, v, s, c, order):
    """Serial replay of a merge order recomputing each merge's exact
    pooled-mean boundary statistic at merge time (what the reference's
    serial engine uses as saliency at its pop)."""
    tbl = {}
    nbrs = {}
    for ui, vi, si, ci in zip(u.tolist(), v.tolist(), s.tolist(),
                              c.tolist()):
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
    out = np.full(len(order), np.nan)
    for i, (a, b, r2) in enumerate(np.asarray(order, dtype=np.int64)):
        a, b, r2 = int(a), int(b), int(r2)
        k = (a, b) if a < b else (b, a)
        e = tbl.pop(k, None)
        if e is None:
            continue  # non-adjacent merge (shouldn't happen)
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
                nbrs[x].discard(a)
                nbrs[x].discard(b)
                nbrs[x].add(r2)
                merged.add(x)
        nbrs[r2] = merged
    return out


def main():
    side = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    n_cells = (side // 14) ** 2
    t0 = time.time()
    data = synthetic_em_slice(shape=(side, side), n_cells=n_cells, seed=11,
                              blur=1.2, noise=0.12)
    pb = data["pb"]
    seg = watershed_native(ndi.gaussian_filter(pb, 1.0), level=0.004)
    rag = build_rag(seg, contour_only=False)
    E, R = rag.n_edges, rag.n_regions
    print(f"setup {side}^2: {R} regions {E} edges ({time.time()-t0:.1f}s)")

    order_h, sal_h = greedy_merge_native(rag, pb, policy="mean")
    k = R - n_cells
    tau = -sal_h[k - 1]
    seg_h = apply_merge_order(seg, order_h, threshold_index=k)
    _, _, vi_h = eval_vi(seg_h, data["truth"])
    print(f"serial: VI {vi_h:.4f} at tau {tau:.5f} (k={k})")

    u, v, s, c = edge_mean_arrays(rag, pb)
    for dmax in (2, 4):
        t0 = time.time()
        order_b, sal_b, n_m = merge_batched_device(u, v, s, c, R, dmax=dmax)
        dt = time.time() - t0
        okeys = order_to_keys(order_b, n_m, rag)
        order_d = np.asarray(order_b)[:n_m]

        # (a) stale recorded saliencies (round-3 behavior)
        mask = threshold_cut(okeys, -np.asarray(sal_b)[:n_m], tau)
        seg_b = apply_merge_order(seg, okeys[mask])
        _, _, vi_b = eval_vi(seg_b, data["truth"])

        # (b) exact replayed saliencies
        t1 = time.time()
        ex = replay_exact_stats(u, v, s, c, order_d)
        rt = time.time() - t1
        mask2 = threshold_cut(okeys, ex, tau)
        seg_b2 = apply_merge_order(seg, okeys[mask2])
        _, _, vi_b2 = eval_vi(seg_b2, data["truth"])
        print(f"dmax={dmax}: dVI stale {vi_b-vi_h:+.4f} "
              f"(cut {mask.sum()}) | exact-replay {vi_b2-vi_h:+.4f} "
              f"(cut {mask2.sum()}) [merge {dt:.1f}s, replay {rt:.1f}s]")


if __name__ == "__main__":
    main()
