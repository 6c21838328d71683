"""DNF energies and SSHMT training tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from glia_tpu.learn.dnf import monotonic_dnf, relaxed_monotonic_dnf, unique_dnf
from glia_tpu.learn.sshmt import (
    SshmtDefaults,
    build_path_groups,
    build_supervised,
    train_sshmt,
)


def brute_monotonic(f, target):
    """Direct transcription of the dnf.hxx:173-201 documentation."""
    n = len(f)
    ret = 1.0
    for j in range(n + 1):
        colprod = 1.0
        for i in range(n):
            colprod *= f[i] if i < j else (1.0 - f[i])
        ret *= target ** n - colprod
    return 1.0 - ret


def brute_relaxed(f):
    n = len(f)
    s = 0.0
    for j in range(n + 1):
        colprod = 1.0
        for i in range(n):
            colprod *= f[i] if i < j else (1.0 - f[i])
        s += colprod
    return s


def brute_unique(f, target):
    n = len(f)
    ret = 1.0
    for j in range(n):
        colprod = f[j]
        for i in range(n):
            if i != j:
                colprod *= 1.0 - f[i]
        ret *= target ** n - colprod
    return 1.0 - ret


@pytest.mark.parametrize("n", [1, 2, 3, 5])
def test_monotonic_dnf_vs_brute(rng, n):
    f = rng.random(n)
    got = float(monotonic_dnf(jnp.asarray(f), 0.95))
    assert got == pytest.approx(brute_monotonic(f, 0.95), rel=1e-12)


@pytest.mark.parametrize("n", [1, 2, 4])
def test_relaxed_dnf_vs_brute(rng, n):
    f = rng.random(n)
    got = float(relaxed_monotonic_dnf(jnp.asarray(f)))
    assert got == pytest.approx(brute_relaxed(f), rel=1e-12)


@pytest.mark.parametrize("n", [1, 2, 4])
def test_unique_dnf_vs_brute(rng, n):
    f = rng.random(n)
    got = float(unique_dnf(jnp.asarray(f), 0.9))
    assert got == pytest.approx(brute_unique(f, 0.9), rel=1e-12)


def test_monotonic_consistent_path_scores_high():
    # perfectly monotonic (boundary persists then vanishes): f = [1,1,0]
    # -> one column product is 1 -> value = 1 - (t^n - 1) * ... ~ high
    hi = float(monotonic_dnf(jnp.asarray([0.95, 0.9, 0.1]), 0.95))
    lo = float(monotonic_dnf(jnp.asarray([0.05, 0.9, 0.05]), 0.95))
    assert hi > lo  # inconsistent (off-on-off) path scores lower


def test_dnf_grad_finite_difference(rng):
    f = rng.random(3)

    def fn(f):
        return monotonic_dnf(f, 0.95)

    g = np.asarray(jax.grad(fn)(jnp.asarray(f)))
    eps = 1e-6
    for i in range(3):
        fp = f.copy()
        fp[i] += eps
        fm = f.copy()
        fm[i] -= eps
        fd = (brute_monotonic(fp, 0.95) - brute_monotonic(fm, 0.95)) / (2 * eps)
        assert g[i] == pytest.approx(fd, rel=1e-5)


def test_build_path_groups():
    order = np.array([[1, 2, 5], [3, 4, 6], [5, 6, 7]])
    feats = np.arange(9.0).reshape(3, 3)
    d = SshmtDefaults()
    groups = build_path_groups(order, feats, d)
    # paths of length 2: [0,2] and [1,2] (leaf-leaf starts)
    assert len(groups) == 1
    g = groups[0]
    assert g["x"].shape == (2, 2, 4)  # bias appended
    assert (g["y"] == d.path_target ** 2).all()
    np.testing.assert_allclose(g["x"][0, 0, :3], feats[0])
    np.testing.assert_allclose(g["x"][0, 1, :3], feats[2])


def test_build_supervised_targets():
    d = SshmtDefaults()
    s = build_supervised(np.zeros((3, 2)), np.array([1, -1, 1]), d)
    np.testing.assert_allclose(s["y"], [0.05, 0.95, 0.05])
    assert s["x"].shape == (3, 3)


def test_train_sshmt_learns(rng):
    # synthetic: boundary feature x in R^2; true merge prob = sigmoid(3 - 6x0)
    n = 60
    X = rng.random((n, 2))
    true_p = 1 / (1 + np.exp(-(3 - 6 * X[:, 0])))
    labels = np.where(true_p > 0.5, -1, 1)  # merge where prob high
    # fake merge order: chain merges so paths exist
    order = np.array([[i + 1, n + 10 + i, n + 11 + i] for i in range(n - 1)])
    # order has n-1 merges; features per merge
    feats = X[: n - 1]
    out = train_sshmt(
        [feats], [order], X, labels, classifier="logsig",
        n_sigma_update=3, inner_steps=200, lr=0.2, ws=1.0, wu=0.5)
    assert np.isfinite(out["w"]).all()
    # the learned logsig should separate by x0
    from glia_tpu.models.mlp import append_bias, logsig_forward

    p = np.asarray(logsig_forward(jnp.asarray(out["w"]),
                                  jnp.asarray(append_bias(X))))
    acc = ((p > 0.5) == (labels == -1)).mean()
    assert acc > 0.8
    # sigma history recorded per EM round
    assert len(out["history"]) == 3


def test_train_sshmt_minibatch(rng):
    n = 60
    X = rng.random((n, 2))
    labels = np.where(X[:, 0] > 0.5, 1, -1)
    order = np.array([[i + 1, n + 10 + i, n + 11 + i] for i in range(n - 1)])
    out = train_sshmt(
        [X[: n - 1]], [order], X, labels, classifier="logsig",
        n_sigma_update=2, inner_steps=150, lr=0.2, sup_batch=16,
        balance_sup_batch=True, wu=0.0)
    from glia_tpu.models.mlp import append_bias, logsig_forward

    p = np.asarray(logsig_forward(jnp.asarray(out["w"]),
                                  jnp.asarray(append_bias(X))))
    acc = ((p > 0.5) == (labels == -1)).mean()
    assert acc > 0.75


def test_train_sshmt_ce_loss(rng):
    n = 40
    X = rng.random((n, 2))
    labels = np.where(X[:, 1] > 0.5, 1, -1)
    order = np.array([[i + 1, n + 10 + i, n + 11 + i] for i in range(n - 1)])
    out = train_sshmt(
        [X[: n - 1]], [order], X, labels, classifier="logsig",
        n_sigma_update=2, inner_steps=150, lr=0.3, sup_loss="ce", wu=0.2)
    assert np.isfinite(out["w"]).all()
