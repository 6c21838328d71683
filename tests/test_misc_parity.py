"""Small parity pieces: gen_order round-trip, node paths, tree encoding,
base keys, adaptive GD, CE energy, job runner, slice CC, tiling."""

import numpy as np
import pytest

from glia_tpu.graph.tree import (
    build_tree,
    encode_tree,
    gen_node_paths,
    gen_order,
    get_base_keys,
)
from glia_tpu.learn.optim import adaptive_gd
from glia_tpu.ops.image import (
    sample_image,
    slicewise_connected_components,
    tile_images,
)
from glia_tpu.utils.jobs import execute


ORDER = np.array([[1, 2, 5], [3, 4, 6], [5, 6, 7]])


def test_gen_order_roundtrip():
    t = build_tree(ORDER)
    np.testing.assert_array_equal(gen_order(t), ORDER)


def test_gen_node_paths():
    t = build_tree(ORDER)
    paths = gen_node_paths(t)
    assert len(paths) == 4
    for p in paths:
        assert p[-1] == t.root


def test_encode_tree_invariance():
    t1 = build_tree(ORDER)
    # same topology, different merge sequence / internal keys
    t2 = build_tree(np.array([[3, 4, 9], [1, 2, 8], [8, 9, 11]]))
    assert encode_tree(t1) == encode_tree(t2)
    t3 = build_tree(np.array([[1, 3, 5], [2, 4, 6], [5, 6, 7]]))
    assert encode_tree(t1) != encode_tree(t3)


def test_get_base_keys():
    assert get_base_keys(ORDER) == {1, 2, 3, 4}


def test_adaptive_gd_quadratic():
    def vg(w):
        return float(np.sum((w - 3.0) ** 2)), 2 * (w - 3.0)

    w, f, hist = adaptive_gd(vg, np.zeros(4), max_iters=200, step0=10.0)
    np.testing.assert_allclose(w, 3.0, atol=1e-4)
    assert hist[-1] < hist[0]
    # monotone energies (rollback guarantees non-increase)
    assert all(b <= a + 1e-12 for a, b in zip(hist, hist[1:]))


def test_ce_energy_variant():
    import jax.numpy as jnp

    from glia_tpu.learn.sshmt import build_supervised, make_energy, SshmtDefaults

    sup = build_supervised(np.array([[0.1], [0.9]]), np.array([1, -1]),
                           SshmtDefaults())
    clf = lambda w, X: 1 / (1 + jnp.exp(-(X @ w)))
    e, uns, ss, nu, ns = make_energy(clf, [], sup, sup_loss="ce")
    val = float(e(jnp.zeros(2), 1.0, 1.0))
    assert np.isfinite(val) and val > 0


def test_job_runner(tmp_path):
    f = tmp_path / "a.txt"
    codes = execute([f"echo hi > {f}", "true", "true"], nproc=2)
    assert codes == [0, 0, 0]
    assert f.read_text().strip() == "hi"
    with pytest.raises(RuntimeError):
        execute(["false"], nproc=1)


def test_slicewise_cc_and_sampling():
    vol = np.zeros((2, 4, 4), dtype=np.int32)
    vol[0, :2] = 1
    vol[1, 2:] = 1
    cc = slicewise_connected_components(vol)
    # same value across slices gets distinct global labels
    assert set(np.unique(cc[0])) != set(np.unique(cc[1])) or \
        (cc[0].max() != cc[1].max())
    s = sample_image(np.arange(16).reshape(4, 4), 2)
    assert s.shape == (2, 2)
    t = tile_images([np.ones((2, 2)), np.zeros((2, 2))], cols=2)
    assert t.shape == (2, 4)
