"""Ensemble + supervised-MLP training tests."""

import numpy as np
import pytest

from glia_tpu.learn.predict import predict_mlp2
from glia_tpu.models.train_ensemble import (
    train_forest_ensemble,
    train_mlp_supervised,
)


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(1)
    X = rng.random((300, 4))
    y = np.where(X[:, 2] + 0.3 * X[:, 3] > 0.6, 1, -1)
    return X, y


def test_forest_ensemble(data):
    X, y = data
    ens = train_forest_ensemble(X, y, dim0=0, dim1=1, threshold=0.5,
                                n_trees=31)
    p = ens(X)
    acc = ((p > 0.5) == (y == -1)).mean()
    assert acc > 0.85
    assert len(ens.forests) == 3


def test_mlp_supervised(data):
    X, y = data
    model = train_mlp_supervised(X, y, hidden=(8, 4), steps=300, lr=0.05)
    p = predict_mlp2(model["w"], X, model["minmax"], model["n1"],
                     model["n2"])
    acc = ((p > 0.5) == (y == -1)).mean()
    assert acc > 0.85
