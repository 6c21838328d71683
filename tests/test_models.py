"""Classifier tests: forest jax==numpy==sklearn-votes, MLP2 parity checks."""

import numpy as np
import pytest

from glia_tpu.models import (
    MLP2,
    ForestModel,
    ThresholdEnsemble,
    append_bias,
    distribute,
    logsig_forward,
    make_predict_votes_jax,
    mlp2_forward,
    mlp2_init,
    predict_votes_np,
    train_forest,
)


@pytest.fixture(scope="module")
def dataset():
    rng = np.random.default_rng(0)
    X = rng.normal(size=(400, 6))
    y = ((X[:, 0] + X[:, 1] * X[:, 2]) > 0).astype(int)
    return X, y


@pytest.fixture(scope="module")
def forest(dataset):
    X, y = dataset
    return train_forest(X, y, n_trees=31, seed=1)


def test_forest_np_matches_sklearn_votes(dataset, forest):
    """Our node-array walk must reproduce per-tree argmax voting."""
    from sklearn.ensemble import RandomForestClassifier

    X, y = dataset
    rf = RandomForestClassifier(
        n_estimators=31, max_features="sqrt", bootstrap=True,
        max_samples=0.7, class_weight="balanced", random_state=1, n_jobs=1)
    rf.fit(X, y)
    model = ForestModel.from_sklearn(rf)
    got = predict_votes_np(model, X[:50])
    # sklearn vote fractions via per-estimator predictions
    votes = np.zeros((50, 2))
    for est in rf.estimators_:
        pred = est.predict(X[:50]).astype(int)
        votes[np.arange(50), pred] += 1
    votes /= len(rf.estimators_)
    np.testing.assert_allclose(got, votes, atol=1e-12)


def test_forest_jax_matches_np(dataset, forest):
    X, _ = dataset
    f = make_predict_votes_jax(forest)
    got = np.asarray(f(X[:64].astype(np.float32)))
    want = predict_votes_np(forest, X[:64].astype(np.float32))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_forest_accuracy(dataset, forest):
    X, y = dataset
    votes = predict_votes_np(forest, X)
    acc = ((votes[:, 1] > 0.5).astype(int) == y).mean()
    assert acc > 0.9


def test_forest_save_load(tmp_path, forest, dataset):
    X, _ = dataset
    p = tmp_path / "model.npz"
    forest.save(p)
    loaded = ForestModel.load(p)
    np.testing.assert_allclose(
        predict_votes_np(loaded, X[:10]), predict_votes_np(forest, X[:10]))


def test_mlp2_forward_manual():
    import jax.numpy as jnp

    # tiny net D=2, N1=2, N2=1, hand-computed
    D, N1, N2 = 2, 2, 1
    # W0 = [[1,0],[0,1]] col-major -> [1,0,0,1]; W1 = [[1],[1],[0.5]] -> w1
    w = np.array([1.0, 0.0, 0.0, 1.0,   # W0 cols
                  1.0, 1.0, 0.5,        # W1 (N1+1)xN2 col-major
                  2.0, -1.0])           # w2 (N2+1)
    x = np.array([[0.5, -0.3]])
    h1 = np.maximum([0.5, -0.3], 0)            # [0.5, 0]
    h2 = np.maximum(0.5 * 1 + 0 * 1 + 0.5, 0)  # 1.0
    h3 = 2.0 * 1.0 - 1.0                        # 1.0
    want = 1 / (1 + np.exp(-h3))
    got = np.asarray(mlp2_forward(jnp.asarray(w), jnp.asarray(x), D, N1, N2))
    np.testing.assert_allclose(got, [want], rtol=1e-12)


def test_mlp2_grad_matches_finite_difference():
    import jax
    import jax.numpy as jnp

    D, N1, N2 = 4, 5, 3
    w = mlp2_init(D, N1, N2, seed=3)
    x = np.random.default_rng(4).normal(size=(1, D))

    def f(w):
        return mlp2_forward(w, jnp.asarray(x), D, N1, N2)[0]

    g = np.asarray(jax.grad(f)(jnp.asarray(w)))
    eps = 1e-6
    for i in [0, 7, len(w) - 1]:
        wp = w.copy()
        wp[i] += eps
        wm = w.copy()
        wm[i] -= eps
        fd = (float(f(jnp.asarray(wp))) - float(f(jnp.asarray(wm)))) / (2 * eps)
        np.testing.assert_allclose(g[i], fd, rtol=1e-4, atol=1e-8)


def test_logsig():
    import jax.numpy as jnp

    X = append_bias(np.array([[1.0, 2.0]]))
    w = jnp.asarray([0.5, -0.25, 0.1])
    got = np.asarray(logsig_forward(w, jnp.asarray(X)))
    want = 1 / (1 + np.exp(-(0.5 - 0.5 + 0.1)))
    np.testing.assert_allclose(got, [want], rtol=1e-12)


def test_distributor():
    X = np.array([
        [0.1, 0.2],   # both below t -> model 0 (dim1 < t)
        [0.1, 0.9],   # dim1 >= t, dim0 < t -> model 1
        [0.9, 0.9],   # both >= t -> model 2
    ])
    idx = distribute(X, dim0=0, dim1=1, threshold=0.5)
    assert idx.tolist() == [0, 1, 2]


def test_threshold_ensemble():
    models = [lambda X, k=k: np.full(X.shape[0], k, float) for k in range(3)]
    ens = ThresholdEnsemble(models, 0, 1, 0.5)
    X = np.array([[0.1, 0.2], [0.1, 0.9], [0.9, 0.9]])
    np.testing.assert_allclose(ens(X), [0.0, 1.0, 2.0])
