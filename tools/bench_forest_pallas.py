"""TPU A/B: Pallas forest kernel vs XLA gather-walk forest.

VERDICT round-1 item #6: a Pallas kernel must earn its place with a
measured win on the real device at production sizes.  The forest walk is
the inner classifier of the merge_order_bc hot loop
(reference: code/ml/rf/rf.hxx:362-372 vote-fraction semantics).

Usage: python tools/bench_forest_pallas.py [n_samples] [n_trees] [dim]
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
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    T = int(sys.argv[2]) if len(sys.argv) > 2 else 120
    D = int(sys.argv[3]) if len(sys.argv) > 3 else 96
    which = sys.argv[4] if len(sys.argv) > 4 else "both"

    import jax
    import jax.numpy as jnp

    from glia_tpu.models.forest import (
        make_predict_votes_jax, predict_votes_np, train_forest)
    from glia_tpu.ops.pallas.forest import make_forest_votes_pallas

    rng = np.random.default_rng(0)
    Xtr = rng.random((4000, D)).astype(np.float32)
    ytr = (Xtr[:, 0] + 0.5 * Xtr[:, 1] - 0.2 * Xtr[:, 2]
           + 0.1 * rng.standard_normal(4000) > 0.65).astype(np.int32)
    t0 = time.time()
    model = train_forest(Xtr, ytr, n_trees=T, seed=0)
    log(f"forest: {T} trees, {model.feature.shape[1]} max nodes, "
        f"depth {model.max_depth} (trained {time.time()-t0:.1f}s)")

    X = rng.random((B, D)).astype(np.float32)
    want = predict_votes_np(model, X[:256])

    dev = jax.devices()[0]
    log(f"device: {dev}")
    Xd = jax.device_put(jnp.asarray(X), dev)

    results = {}
    for name, make in [
        ("xla", lambda: jax.jit(make_predict_votes_jax(model))),
        ("pallas", lambda: make_forest_votes_pallas(model, block_b=512)),
    ]:
        if which != "both" and name != which:
            continue
        fn = make()
        t0 = time.time()
        out = fn(Xd)
        out.block_until_ready()
        compile_s = time.time() - t0
        np.testing.assert_allclose(np.asarray(out)[:256, : want.shape[1]],
                                   want, atol=1e-5)
        n_iter = 20
        t0 = time.time()
        for _ in range(n_iter):
            out = fn(Xd)
        out.block_until_ready()
        dt = (time.time() - t0) / n_iter
        rate = B / dt
        results[name] = rate
        log(f"{name:8s}: compile {compile_s:6.1f}s, {dt*1e3:8.3f} ms/iter, "
            f"{rate:,.0f} samples/s ({rate*T:,.0f} tree-walks/s)")

    if "pallas" in results and "xla" in results:
        log(f"pallas/xla speedup: {results['pallas']/results['xla']:.2f}x")


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
