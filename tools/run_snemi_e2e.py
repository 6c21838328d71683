"""BASELINE config #5 END-TO-END at stated scale (VERDICT r4 item #6):
SNEMI3D-scale synthetic volume (100x1024x1024, ~105M voxels) through the
FULL sharded pipeline to a scored segmentation:

  generate -> watershed supervoxels -> RAG (~1.2M regions / 1.4M edges)
  -> truth-derived edge labels -> sharded halo TRAINING of the edge
  classifier (8-way mesh, ragged halo) -> full-width edge scoring ->
  classifier-guided SHARDED merge-tree construction (the round-4
  edge-partitioned superstep engine, parallel/merge_shard.py) ->
  exact-replay threshold cuts -> VI / adapted-Rand vs truth.

The merge statistic is the boundary-pixel-weighted mean of (1 - p_merge)
over the spliced boundary (additive payload s = (1-p)*cnt, c = cnt), the
classifier-guided analogue of the pb pooled-mean policy
(util/struct_merge.hxx:38-85); the cut at tau merges everything the
classifier scores above 1-tau after exact saliency replay.

On this host the mesh is 8 virtual CPU devices (one physical TPU chip);
recorded numbers are quality (VI/ARE), wall, peak RSS, and the merge
engine's comm counters at 1.4M-edge scale for the ICI model
(docs/RESULTS.md section 5).

Usage: python tools/run_snemi_e2e.py [Z] [side] [n_cells] [shards] [steps]
"""

import os
import resource
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from glia_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

os.environ.setdefault("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in os.environ["XLA_FLAGS"]:
    os.environ["XLA_FLAGS"] += " --xla_force_host_platform_device_count=8"

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def peak_gb():
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6


def region_majority_truth(rag, truth):
    """Majority truth label per region (packed-key unique counts).

    Also returns the full (region, truth-label, count) sparse pair table
    -- the ONE voxel pass all downstream metrics aggregate from: every
    threshold-cut segmentation is a merge of watershed regions, so its
    voxel-level contingency vs truth is exactly this table grouped by
    merged component (no per-tau 105M-voxel rescan)."""
    t = np.asarray(truth).ravel().astype(np.int64)
    rl = np.diff(rag.region_ptr)
    rid = np.repeat(np.arange(rag.n_regions, dtype=np.int64), rl)
    tmax = int(t.max()) + 1
    key = rid * tmax + t[rag.region_pixels]
    uk, cnt = np.unique(key, return_counts=True)
    regs = uk // tmax
    labs = uk % tmax
    maj = np.zeros(rag.n_regions, dtype=np.int64)
    best = np.zeros(rag.n_regions, dtype=np.int64)
    order = np.argsort(cnt, kind="stable")
    maj[regs[order]] = labs[order]
    best[regs[order]] = cnt[order]
    return maj, (regs, labs, cnt.astype(np.int64))


def resolve_components(okeys, mask, keys, n_keys):
    """Final component key per leaf key under the cut ``mask`` (the
    monotonized cut is prefix-closed, so selected rows form a consistent
    forest); vectorized pointer doubling."""
    parent = np.arange(n_keys, dtype=np.int64)
    sel = np.asarray(okeys)[mask]
    parent[sel[:, 0]] = sel[:, 2]
    parent[sel[:, 1]] = sel[:, 2]
    while True:
        p2 = parent[parent]
        if np.array_equal(p2, parent):
            break
        parent = p2
    return parent[keys]


def main():
    Z = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    side = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    n_cells = int(sys.argv[3]) if len(sys.argv) > 3 else 400
    n_shards = int(sys.argv[4]) if len(sys.argv) > 4 else 8
    n_steps = int(sys.argv[5]) if len(sys.argv) > 5 else 40

    import json

    import jax

    jax.config.update("jax_platforms", "cpu")
    # exact integer pair counts in the device metric path (the CPU test
    # environment runs x64 too, conftest.py)
    jax.config.update("jax_enable_x64", True)

    import jax.numpy as jnp

    from glia_tpu.data.synthetic import synthetic_em_stack
    from glia_tpu.graph.merge import apply_merge_order
    from glia_tpu.graph.merge_device import order_to_keys, threshold_cut
    from glia_tpu.graph.rag import build_rag
    from glia_tpu.metrics import eval_ri, eval_vi
    from glia_tpu.native import watershed_native
    from glia_tpu.ops.pack import pack_csr_values
    from glia_tpu.parallel.halo import HaloPlan
    from glia_tpu.parallel.merge_shard import merge_batched_sharded
    from glia_tpu.parallel.mesh import make_mesh
    from glia_tpu.parallel.partition import partition_rag
    from glia_tpu.parallel.train import (
        edge_forward_full, halo_feat_dims, make_halo_train_step,
        shard_halo_train_inputs)

    stages = {}
    t0 = time.time()
    stack = synthetic_em_stack(shape=(Z, side, side), n_cells=n_cells,
                               seed=23)
    pb = stack["pb3d"]
    truth = stack["truth3d"]
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
    log(f"supervoxel RAG: {R} regions, {E} edges "
        f"(ws {stages['watershed']}s, rag {stages['build_rag']}s)")

    # ---- truth-derived edge labels (merge iff same majority body) ----
    t0 = time.time()
    maj, (rt_regs, rt_labs, rt_cnt) = region_majority_truth(rag, truth)
    ui = rag.key_index(rag.edges[:, 0]).astype(np.int32)
    vi = rag.key_index(rag.edges[:, 1]).astype(np.int32)
    labels = (maj[ui] == maj[vi]).astype(np.float32)
    stages["labels"] = round(time.time() - t0, 1)
    log(f"edge labels: {labels.mean():.3f} merge fraction "
        f"({stages['labels']}s)")

    # ---- sharded training ----
    t0 = time.time()
    part = partition_rag(rag, n_shards)
    plan = HaloPlan(part, rag)
    mesh = make_mesh(n_shards)
    batch = shard_halo_train_inputs(mesh, plan, part, rag,
                                    [pb, intensity], labels,
                                    k_pixels=32, n_bins=16)
    stages["partition_shard"] = round(time.time() - t0, 1)
    init, step, (edge_w, D) = make_halo_train_step(
        mesh, plan, R, n_images=2, k_pixels=32, n_bins=16, lr=3e-3)
    w, opt_state = init()
    t0 = time.time()
    losses = []
    for i in range(n_steps):
        w, opt_state, loss = step(w, opt_state, batch)
        if i % 10 == 0 or i == n_steps - 1:
            losses.append(round(float(loss), 4))
    stages["train"] = round(time.time() - t0, 1)
    log(f"sharded training {n_steps} steps: loss {losses} "
        f"({stages['train']}s, peak {peak_gb():.1f}GB)")

    # ---- full-width edge scoring (same features as the halo step) ----
    t0 = time.time()
    px_imgs = []
    mask = None
    for img in (pb, intensity):
        flat = np.asarray(img, np.float32).ravel()
        vals, mask = pack_csr_values(flat[rag.edge_pixels], rag.edge_ptr,
                                     32)
        px_imgs.append(vals)
    px = np.stack(px_imgs, axis=1)
    probs = np.asarray(jax.jit(
        lambda w, u, v, px, m, val: edge_forward_full(
            w, u, v, px, m, val, R, n_bins=16))(
        w, jnp.asarray(ui), jnp.asarray(vi), jnp.asarray(px),
        jnp.asarray(mask.astype(np.float32)),
        jnp.ones(E, np.float32)))
    auc_acc = float(((probs > 0.5) == (labels > 0.5)).mean())
    stages["score"] = round(time.time() - t0, 1)
    log(f"edge scoring: acc@0.5 {auc_acc:.3f} ({stages['score']}s)")
    del px, px_imgs, batch

    # ---- classifier-guided SHARDED merge-tree construction ----
    t0 = time.time()
    cnt = np.diff(rag.edge_ptr).astype(np.float64)
    s_arr = (1.0 - probs.astype(np.float64)) * cnt
    mstats = {}
    order_d, sal_d, n_m = merge_batched_sharded(
        ui, vi, s_arr, cnt, R, mesh, dmax=4, max_supersteps=64,
        stats=mstats)
    stages["sharded_merge"] = round(time.time() - t0, 1)
    log(f"sharded merge: {n_m} merges, {mstats['n_supersteps']} "
        f"supersteps, routed {mstats['routed_rows']} "
        f"(moved {mstats['moved_rows']}), C={mstats['capacity']} "
        f"({stages['sharded_merge']}s, peak {peak_gb():.1f}GB)")

    # ---- exact replay (SHARDED, VERDICT r5 #1) + threshold cuts ----
    t0 = time.time()
    from glia_tpu.parallel.merge_shard import exact_saliency_sharded

    order_np = np.asarray(order_d)[:n_m]
    ex = exact_saliency_sharded(ui, vi, s_arr, cnt, order_np, R, mesh)
    okeys = order_to_keys(order_d, n_m, rag)
    stages["replay"] = round(time.time() - t0, 1)
    log(f"sharded exact-saliency replay: {stages['replay']}s")

    # ---- evaluation from the ONE region-truth pair table (r5 #5):
    # device sparse-pair metrics (metrics/device.py), counts asserted
    # exactly equal to the host int64 aggregation ----
    t0 = time.time()
    from glia_tpu.metrics.device import (adapted_rand_from_pairs_device,
                                         vi_from_pairs_device)

    assert int(rt_cnt.sum()) == int(truth.size)  # table covers all voxels
    keep = rt_labs != 0                          # truth BG excluded
    n_keys = int(okeys[:, 2].max(initial=int(rag.keys.max()))) + 1
    T = int(rt_labs.max()) + 1

    def eval_pairs(comp_of_region):
        comp = comp_of_region[rt_regs[keep]]
        lab = rt_labs[keep]
        c_host = rt_cnt[keep]
        uc, sid = np.unique(comp, return_inverse=True)
        S = len(uc)
        # host exact aggregation (int64) as the assert oracle
        code = sid * T + lab
        agg_host = np.bincount(code, weights=c_host,
                               minlength=S * T).astype(np.int64)
        nz = np.nonzero(agg_host)[0]
        sidn = (nz // T).astype(np.int32)
        tidn = (nz % T).astype(np.int32)
        cn = agg_host[nz]
        # device aggregation cross-check: identical integer counts
        agg_dev = np.asarray(jax.jit(
            lambda cd, code: jax.ops.segment_sum(
                cd, code, num_segments=S * T))(
            jnp.asarray(c_host, jnp.float64), jnp.asarray(code)))
        assert (agg_dev.astype(np.int64) == agg_host).all(), \
            "device pair counts != host ints"
        fs, fm, vi_t = (float(x) for x in vi_from_pairs_device(
            sidn, tidn, cn, S, T, itk_quirk=True))
        pr, rc, er = (float(x) for x in
                      adapted_rand_from_pairs_device(
                          sidn, tidn, cn, S, T))
        return fs, fm, vi_t, pr, rc, er, S

    ws_comp = rag.keys.astype(np.int64)          # identity cut
    fs0, fm0, vi0, p0, r0, e0, S0 = eval_pairs(ws_comp)
    rows = []
    for tau in (0.3, 0.5, 0.7):
        m = threshold_cut(okeys, ex, tau)
        comp = resolve_components(okeys, m, rag.keys.astype(np.int64),
                                  n_keys)
        fs, fm, vi_t, pr, rc, er, S_t = eval_pairs(comp)
        rows.append({"tau": tau, "n_merged": int(m.sum()),
                     "vi": round(vi_t, 4), "vi_split": round(fs, 4),
                     "vi_merge": round(fm, 4), "rand_error": round(er, 4)})
        log(f"tau {tau}: VI {vi_t:.4f} (ws {vi0:.4f}), ARE {er:.4f} "
            f"(ws {e0:.4f}), {int(m.sum())} merges, {S_t} regions")
    if os.environ.get("GLIA_E2E_HOST_CHECK"):
        # full voxel-level host oracle at one tau (slow; validation only)
        m = threshold_cut(okeys, ex, 0.7)
        seg_t = apply_merge_order(seg, okeys[m])
        hfs, hfm, hvi = eval_vi(seg_t, truth)
        _, _, her = eval_ri(seg_t, truth)
        log(f"HOST CHECK tau 0.7: VI {hvi:.6f} vs pairs {rows[-1]['vi']}"
            f", ARE {her:.6f} vs {rows[-1]['rand_error']}")
        assert abs(hvi - rows[-1]["vi"]) < 1e-3
    stages["cut_eval"] = round(time.time() - t0, 1)
    log(f"pair-table eval (device sparse metrics): "
        f"{stages['cut_eval']}s for watershed + 3 taus")

    out = {
        "config": f"SNEMI-scale e2e {Z}x{side}x{side} @ {n_shards}",
        "voxels": int(pb.size), "regions": int(R), "edges": int(E),
        "shards": n_shards,
        "train_steps": n_steps, "loss_trace": losses,
        "edge_acc": round(auc_acc, 4),
        "watershed_vi": round(vi0, 4), "watershed_rand_error": round(e0, 4),
        "cuts": rows,
        "merge_stats": {k: int(v) for k, v in mstats.items()},
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
