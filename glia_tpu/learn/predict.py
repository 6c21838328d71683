"""Merge-probability prediction (pred_logsig / pred_mlp / pred_rf).

Reference semantics:
  - pred_logsig (code/sshmt/main_pred_logsig.cxx:23): append bias 1.0, then
    sigmoid(w . x);
  - pred_mlp (code/sshmt/main_pred_mlp.cxx:40-43): min-max rescale features
    to [-1, 1] using the training min/max table (stats::rescale,
    code/util/stats.hxx:264-283: (x-min)/(max-min+FEPS)), append bias;
  - pred_rf (code/ml/rf/main_pred_rf.cxx): vote fraction for the merge
    label (-1).
"""

from __future__ import annotations

import numpy as np

from ..constants import FEPS
from ..models.forest import ForestModel, predict_label_fraction
from ..models.mlp import append_bias, logsig_forward, mlp2_forward


def rescale_features(feats, minmax, out_min=-1.0, out_max=1.0):
    """stats::rescale (stats.hxx:264-283): out = (x-min)*(oMax-oMin)/
    (max-min+FEPS) + oMin.  minmax: [2, D] (row 0 min, row 1 max)."""
    feats = np.asarray(feats, dtype=np.float64)
    mn = np.asarray(minmax[0], dtype=np.float64)
    mx = np.asarray(minmax[1], dtype=np.float64)
    return (out_max - out_min) * (feats - mn) / (mx - mn + FEPS) + out_min


def feature_minmax(feats):
    feats = np.asarray(feats, dtype=np.float64)
    return np.stack([feats.min(axis=0), feats.max(axis=0)])


def predict_logsig(w, feats):
    import jax.numpy as jnp

    X = append_bias(np.atleast_2d(feats))
    return np.asarray(logsig_forward(jnp.asarray(w), jnp.asarray(X)))


def predict_mlp2(w, feats, minmax, N1, N2):
    import jax.numpy as jnp

    X = append_bias(rescale_features(np.atleast_2d(feats), minmax))
    D = X.shape[1]
    return np.asarray(mlp2_forward(jnp.asarray(w), jnp.asarray(X),
                                   D, N1, N2))


def predict_rf(model: ForestModel, feats, merge_label=-1, backend="np"):
    return predict_label_fraction(model, np.atleast_2d(feats),
                                  label=merge_label, backend=backend)
