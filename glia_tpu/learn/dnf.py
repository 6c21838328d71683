"""DNF path-consistency energies (the SSHMT core) in JAX.

Reference: code/alg/dnf.hxx.  For a root-path of n boundary predictions
f1..fn (f = classifier merge probability at each level), build the
n x (n+1) matrix whose column j is [f1..fj, ~f(j+1)..~fn] -- each column is
one *monotonically consistent* labeling (a boundary persists up to level j
then disappears):

  - MonotonicDNF (dnf.hxx:127-326):
      value = 1 - prod_j (target^n - colprod_j)
  - RelaxedMonotonicDNF (dnf.hxx:11-123):
      value = sum_j colprod_j
  - UniqueDNF (dnf.hxx:330-492): n x n, column j = [~f.., f_j, ..~f]:
      value = 1 - prod_j (target^n - f_j * prod_{i!=j} ~f_i)

The reference implements 200 lines of hand-written gradients
(dnf.hxx:235-311); here values are pure jnp expressions and ``jax.grad``
provides derivatives (verified against finite differences in tests).
"""

from __future__ import annotations

import jax.numpy as jnp


def _col_prods(f):
    """colprod_j = prod_{i<j} f_i * prod_{i>=j} (1-f_i), j = 0..n.

    f: [..., n] -> [..., n+1]."""
    n = f.shape[-1]
    ones = jnp.ones(f.shape[:-1] + (1,), f.dtype)
    cum_f = jnp.concatenate([ones, jnp.cumprod(f, axis=-1)], axis=-1)
    nf = 1.0 - f
    rev = jnp.flip(jnp.cumprod(jnp.flip(nf, -1), axis=-1), -1)
    cum_nf = jnp.concatenate([rev, ones], axis=-1)
    return cum_f * cum_nf


def monotonic_dnf(f, target):
    """f: [..., n] classifier outputs along path -> [...] DNF value."""
    n = f.shape[-1]
    cp = _col_prods(f)
    return 1.0 - jnp.prod(target ** n - cp, axis=-1)


def relaxed_monotonic_dnf(f):
    return _col_prods(f).sum(axis=-1)


def unique_dnf(f, target):
    """Column j = f_j * prod_{i != j} (1 - f_i)."""
    n = f.shape[-1]
    nf = 1.0 - f
    prod_all = jnp.prod(nf, axis=-1, keepdims=True)
    # prod_{i != j} (1-f_i): safe divide-free via cumprods
    ones = jnp.ones(f.shape[:-1] + (1,), f.dtype)
    left = jnp.concatenate(
        [ones, jnp.cumprod(nf, axis=-1)[..., :-1]], axis=-1)
    right = jnp.concatenate(
        [jnp.flip(jnp.cumprod(jnp.flip(nf, -1), -1), -1)[..., 1:], ones],
        axis=-1)
    excl = left * right
    col = f * excl
    return 1.0 - jnp.prod(target ** n - col, axis=-1)
