"""StageStore + orbax param checkpoint round trips."""

import numpy as np
import pytest

from glia_tpu.utils.checkpoint import StageStore, restore_params, save_params


def test_stage_store_roundtrip(tmp_path):
    store = StageStore(str(tmp_path / "stages"))
    assert not store.has("merge")
    store.save("merge", order=np.arange(12).reshape(4, 3),
               saliencies=np.linspace(0, 1, 4), policy="median")
    assert store.has("merge")
    out = store.load("merge")
    np.testing.assert_array_equal(out["order"], np.arange(12).reshape(4, 3))
    assert out["policy"] == "median"


def test_stage_store_memoized_run(tmp_path):
    store = StageStore(str(tmp_path / "s"))
    calls = []

    def fn():
        calls.append(1)
        return {"x": np.ones(3)}

    a = store.run("stage1", fn)
    b = store.run("stage1", fn)
    assert len(calls) == 1  # second call loaded from disk
    np.testing.assert_array_equal(a["x"], b["x"])


def test_orbax_params_roundtrip(tmp_path):
    import jax.numpy as jnp

    params = {"w": jnp.arange(6.0).reshape(2, 3), "b": jnp.ones(3)}
    path = str(tmp_path / "ckpt")
    save_params(path, params)
    restored = restore_params(path, params)
    np.testing.assert_allclose(np.asarray(restored["w"]),
                               np.asarray(params["w"]))
    np.testing.assert_allclose(np.asarray(restored["b"]), 1.0)
