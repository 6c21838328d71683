"""Logistic unit and 2-hidden-layer MLP in JAX.

Exact functional parity with the reference's hand-written Eigen nets:
  - Logsig (code/alg/function.hxx:12-50): f = sigmoid(w . x); callers append
    the bias 1.0 to x themselves (main_pred_logsig.cxx:23).
  - MLP2 (code/alg/nn.hxx:14-134): h1 = relu(x^T W0); h2 = relu([h1,1] W1);
    f = sigmoid([h2,1] . w2).  Flat weight layout [W0 (D x N1, col-major),
    W1 ((N1+1) x N2, col-major), w2 (N2+1)] (nn.hxx:33,118-124), kept
    identical so weight vectors interchange with the reference.
  - ReLU subgradient at 0 is 0 (nn.hxx:100-106 zeroes dh where h <= 0),
    which matches JAX's relu VJP convention.

Everything is expressed on batches; ``jax.grad`` provides the training
gradients (replacing the 200-line manual backward, verified against finite
differences in tests).
"""

from __future__ import annotations

import numpy as np


def mlp2_unpack(w, D, N1, N2):
    import jax.numpy as jnp

    w0 = w[: D * N1].reshape(N1, D).T          # col-major D x N1
    o = D * N1
    w1 = w[o: o + (N1 + 1) * N2].reshape(N2, N1 + 1).T
    o += (N1 + 1) * N2
    w2 = w[o: o + N2 + 1]
    return w0, w1, w2


def mlp2_forward(w, X, D, N1, N2):
    """Batched MLP2 forward: X [B, D] -> probabilities [B]."""
    import jax.numpy as jnp

    w0, w1, w2 = mlp2_unpack(w, D, N1, N2)
    h1 = jnp.maximum(X @ w0, 0.0)
    h1a = jnp.concatenate([h1, jnp.ones((X.shape[0], 1), X.dtype)], axis=1)
    h2 = jnp.maximum(h1a @ w1, 0.0)
    h2a = jnp.concatenate([h2, jnp.ones((X.shape[0], 1), X.dtype)], axis=1)
    h3 = h2a @ w2
    # jax.nn.sigmoid == 1/(1+exp(-x)) in value but with a safe gradient:
    # the naive form backprops 0*inf=NaN once exp(-x) overflows (seen at
    # init on large-count region-context features, 105M-voxel config)
    import jax

    return jax.nn.sigmoid(h3)


def mlp2_init(D, N1, N2, seed=0, scale=None):
    """Random init; the reference trains from externally-supplied inits, so
    any scheme works -- default He-style."""
    rng = np.random.default_rng(seed)
    if scale is None:
        scale = np.sqrt(2.0 / max(D, 1))
    w0 = rng.normal(0, scale, D * N1)
    w1 = rng.normal(0, np.sqrt(2.0 / (N1 + 1)), (N1 + 1) * N2)
    w2 = rng.normal(0, np.sqrt(2.0 / (N2 + 1)), N2 + 1)
    return np.concatenate([w0, w1, w2])


def mlp2_dim(D, N1, N2):
    return D * N1 + (N1 + 1) * N2 + N2 + 1


def logsig_forward(w, X):
    """Batched Logsig: X [B, D] (bias already appended) -> [B].
    (Kept in the naive 1/(1+exp) form: Logsig consumes min-max rescaled
    inputs, pred_logsig/pred_mlp semantics, so overflow cannot occur.)"""
    import jax.numpy as jnp

    return 1.0 / (1.0 + jnp.exp(-(X @ w)))


def append_bias(X):
    X = np.asarray(X)
    return np.concatenate([X, np.ones((X.shape[0], 1), X.dtype)], axis=1)


class MLP2:
    """Convenience wrapper holding (w, D, N1, N2) with numpy/jax predict."""

    def __init__(self, D, N1, N2, w=None, seed=0):
        self.D, self.N1, self.N2 = D, N1, N2
        self.w = np.asarray(w) if w is not None else mlp2_init(D, N1, N2, seed)

    def __call__(self, X):
        import jax.numpy as jnp

        return np.asarray(mlp2_forward(jnp.asarray(self.w),
                                       jnp.asarray(np.atleast_2d(X)),
                                       self.D, self.N1, self.N2))

    def save(self, path):
        np.savetxt(path, self.w)

    @classmethod
    def load(cls, path, D, N1, N2):
        return cls(D, N1, N2, w=np.loadtxt(path))
