"""Bisect the TPU compile time of the device BC merge while-loop.

Variants (each lower+compile timed separately):
  full     : real candidate_features (D=143) -> pallas forest (d_pad=256)
  lanes128 : real features sliced to 120 cols -> pallas (d_pad=128)
  noasm    : dummy [E, D] feats (no assembly)  -> pallas (d_pad=256)
  nopallas : real features -> mean reduction (no pallas call)

Usage: python tools/bisect_compile.py [side] [variant ...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    side = int(sys.argv[1]) if len(sys.argv) > 1 else 96
    variants = sys.argv[2:] or ["nopallas", "noasm", "lanes128", "full"]

    import scipy.ndimage as ndi

    from glia_tpu.data.synthetic import synthetic_em_slice
    from glia_tpu.features import FeatureConfig, TreeFeatures, bc_labels
    from glia_tpu.graph import build_rag
    from glia_tpu.graph import merge_bc_device as mbd
    from glia_tpu.models.forest import make_label_scorer, train_forest
    from glia_tpu.native import greedy_merge_native, watershed_native

    import jax
    import jax.numpy as jnp

    tr = synthetic_em_slice((side, side), n_cells=max((side // 17) ** 2, 16),
                            seed=1)
    seg = watershed_native(ndi.gaussian_filter(tr["pb"], 1.0), level=0.004)
    rag = build_rag(seg, contour_only=False)
    cfg = FeatureConfig.standard(tr["pb"], tr["intensity"], n_bins=16)
    order, _ = greedy_merge_native(rag, tr["pb"], policy="median")
    X = TreeFeatures(rag, order, cfg, saliencies=None).bc_features()
    y = bc_labels(seg, tr["truth"], order, rule="f1")[0]
    log(f"RAG: {rag.n_regions} regions {rag.n_edges} edges, D={X.shape[1]}")

    model = train_forest(X, y, n_trees=120, seed=0)
    model128 = train_forest(X[:, :120], y, n_trees=120, seed=0)
    pf, consts = make_label_scorer(model, label=-1, backend="pallas",
                                   embed=True)
    pf128, consts128 = make_label_scorer(model128, label=-1, backend="pallas",
                                         embed=True)

    state_np, static = mbd.build_state(rag, cfg)
    state = {k: jnp.asarray(v) for k, v in state_np.items()}
    ms = 4 * int(np.ceil(np.log2(max(static.R, 2)))) + 16

    real_cf = mbd.candidate_features

    def dummy_cf(state, static):
        f = (state["c_add"][0, 0] *
             jnp.ones((static.E, static.feat_dim)))
        return f, state["e_alive"] & state["e_table"]

    def build(variant):
        if variant == "full":
            mbd.candidate_features = real_cf
            return mbd.make_merge_loop(static, pf, ms,
                                       with_consts=True), consts
        if variant == "lanes128":
            mbd.candidate_features = real_cf
            fn = lambda f, c: pf128(f[:, :120], c)
            return mbd.make_merge_loop(static, fn, ms,
                                       with_consts=True), consts128
        if variant == "noasm":
            mbd.candidate_features = dummy_cf
            return mbd.make_merge_loop(static, pf, ms,
                                       with_consts=True), consts
        if variant == "nopallas":
            mbd.candidate_features = real_cf
            fn = lambda f, c: f.mean(axis=1) + c
            return mbd.make_merge_loop(static, fn, ms,
                                       with_consts=True), np.float32(0.0)
        if variant == "xlawalk":
            from glia_tpu.models.forest import forest_votes_jax_fn

            mbd.candidate_features = real_cf
            wfn, wtables = forest_votes_jax_fn(model)
            li = int(np.nonzero(model.classes == -1)[0][0])
            fn = lambda f, c: wfn(f, c)[:, li]
            return mbd.make_merge_loop(static, fn, ms,
                                       with_consts=True), wtables
        if variant == "bigblock":
            mbd.candidate_features = real_cf
            pfb, cstb = make_label_scorer(model, label=-1, backend="pallas",
                                          embed=True, block_b=1024)
            return mbd.make_merge_loop(static, pfb, ms,
                                       with_consts=True), cstb
        if variant == "step":
            # single superstep, no while loop
            mbd.candidate_features = real_cf
            raw = mbd._make_step_fn(static, pf, with_consts=True)
            import jax as _jax

            return _jax.jit(lambda st, c: raw(st, c)), consts
        raise ValueError(variant)

    for v in variants:
        run, cst = build(v)
        cst = jax.tree.map(jnp.asarray, cst)
        t0 = time.time()
        lowered = run.lower(state, cst)
        t_lower = time.time() - t0
        t0 = time.time()
        compiled = lowered.compile()
        t_comp = time.time() - t0
        t0 = time.time()
        out = compiled(state, cst)
        jax.block_until_ready(out)
        t_run = time.time() - t0
        log(f"{v:10s} lower {t_lower:6.1f}s  compile {t_comp:6.1f}s  "
            f"run {t_run:6.2f}s  (steps={int(out[4])})")
    mbd.candidate_features = real_cf


if __name__ == "__main__":
    try:
        main()
    finally:
        sys.stdout.flush()
        sys.stderr.flush()
        os._exit(0)
