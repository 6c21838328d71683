"""SSHMT semi-supervised training.

Reference pipeline (code/sshmt/main_train_sshmt_logsig.cxx,
code/sshmt/sshmt_util.hxx, code/sshmt/energy_function.hxx):

  E(w) = wr * ||w||^2 / 2
       + wu * ( ||Yu - DNF_w(paths)||^2 / (2 su^2) + Nu * log(su^2) / 2 )
       + ws * ( ||Ys - f_w(Xs)||^2   / (2 ss^2) + Ns * log(ss^2) / 2 )

with f = Logsig or MLP2 (merge probability), DNF = MonotonicDNF over
root-path samples (target = mergeTarget), Yu = pathTarget^len, and Ys from
the label->target map {+1 (split): 0.05, -1 (merge): 0.95}
(main_train_sshmt_logsig.cxx:37-45 defaults).

Training (main_train_sshmt_logsig.cxx:134-156): nSigmaUpdate outer EM
rounds; each round runs the inner optimizer then re-estimates the noise
variances as sigma^2 = ||Y-F||^2 / N, floored at minSigma2
(sshmt_util.hxx:140-145).

Paths of different lengths are grouped so each group is one dense
[P, len, D] tensor -- the whole energy is a single jittable function.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional

import numpy as np

from ..graph.tree import gen_merge_paths
from ..models.mlp import logsig_forward, mlp2_forward
from .dnf import monotonic_dnf, relaxed_monotonic_dnf, unique_dnf


@dataclass
class SshmtDefaults:
    """Hyper-parameters (main_train_sshmt_logsig.cxx:37-45)."""

    min_sigma2: float = 1e-6
    path_target: float = 1.0
    merge_target: float = 0.95
    max_path_length: int = 3
    min_path_length: int = 2
    pos_label_target: float = 0.05   # label +1 (split)
    neg_label_target: float = 0.95   # label -1 (merge)


def build_path_groups(order, merge_feats, defaults: SshmtDefaults,
                      append_bias=True):
    """PathInput equivalent (code/sshmt/input.hxx:11-60).

    merge_feats: [n_merges, D] boundary features per merge (order-aligned).
    Returns list of dicts {x: [P, len, D'], y: [P]} grouped by path length.
    """
    merge_feats = np.asarray(merge_feats, dtype=np.float64)
    if append_bias:
        merge_feats = np.concatenate(
            [merge_feats, np.ones((len(merge_feats), 1))], axis=1)
    paths = gen_merge_paths(order, defaults.max_path_length,
                            defaults.min_path_length)
    groups: Dict[int, List] = {}
    for p in paths:
        groups.setdefault(len(p), []).append(p)
    out = []
    for length, plist in sorted(groups.items()):
        x = np.stack([merge_feats[p] for p in plist])  # [P, len, D']
        y = np.full(len(plist), defaults.path_target ** length)
        out.append({"x": x, "y": y, "len": length})
    return out


def build_supervised(feats, labels, defaults: SshmtDefaults,
                     append_bias=True):
    """SampleInput equivalent (input.hxx:63-104): features + targets from
    the label map."""
    feats = np.asarray(feats, dtype=np.float64)
    if append_bias:
        feats = np.concatenate([feats, np.ones((len(feats), 1))], axis=1)
    labels = np.asarray(labels)
    y = np.where(labels > 0, defaults.pos_label_target,
                 defaults.neg_label_target)
    return {"x": feats, "y": y.astype(np.float64)}


def make_classifier(kind="logsig", D=None, N1=None, N2=None):
    """Batched classifier fn(w, X [B, D]) -> [B]."""
    if kind == "logsig":
        return lambda w, X: logsig_forward(w, X)
    if kind == "mlp2":
        return lambda w, X: mlp2_forward(w, X, D, N1, N2)
    raise ValueError(kind)


DNF_KINDS = {
    "monotonic": lambda f, target: monotonic_dnf(f, target),
    "relaxed": lambda f, target: relaxed_monotonic_dnf(f),
    "unique": lambda f, target: unique_dnf(f, target),
}


def make_energy(classifier, path_groups, supervised, wr=1.0, wu=1.0,
                ws=1.0, merge_target=0.95, dnf="monotonic",
                sup_loss="gaussian"):
    """Build E(w, su2, ss2) and its parts, all jittable.

    sup_loss: "gaussian" -> MonotonicDnfGaussian (energy_function.hxx:77-137)
              "ce"       -> MonotonicDnfGaussianCrossEntropy (:12-72),
                            binary CE on the supervised term (sigma_s
                            ignored; targets clipped into (0,1))
    Returns (energy_fn, unsup_sq_loss_fn, sup_sq_loss_fn, n_unsup, n_sup).
    The *_sq_loss functions return ||Y-F||^2 (for the sigma EM updates).
    """
    import jax.numpy as jnp

    dnf_fn = DNF_KINDS[dnf]
    groups = [
        {"x": jnp.asarray(g["x"]), "y": jnp.asarray(g["y"]),
         "len": g["len"]} for g in path_groups
    ]
    sup = ({"x": jnp.asarray(supervised["x"]),
            "y": jnp.asarray(supervised["y"])}
           if supervised is not None else None)
    n_unsup = sum(len(g["y"]) for g in groups)
    n_sup = len(sup["y"]) if sup is not None else 0

    def unsup_sq_loss(w):
        total = 0.0
        for g in groups:
            P, L, D = g["x"].shape
            f = classifier(w, g["x"].reshape(P * L, D)).reshape(P, L)
            v = dnf_fn(f, merge_target)
            total = total + jnp.sum((g["y"] - v) ** 2)
        return total

    def sup_sq_loss(w):
        if sup is None:
            return jnp.asarray(0.0)
        p = classifier(w, sup["x"])
        return jnp.sum((sup["y"] - p) ** 2)

    def sup_ce_loss(w):
        p = jnp.clip(classifier(w, sup["x"]), 1e-12, 1 - 1e-12)
        y = jnp.clip(sup["y"], 1e-12, 1 - 1e-12)
        return -jnp.sum(y * jnp.log(p) + (1 - y) * jnp.log(1 - p))

    def energy(w, su2, ss2):
        e = wr * 0.5 * jnp.sum(w * w)
        if n_unsup and wu:
            e = e + wu * (0.5 * unsup_sq_loss(w) / su2
                          + n_unsup * jnp.log(su2) / 2.0)
        if n_sup and ws:
            if sup_loss == "ce":
                e = e + ws * sup_ce_loss(w)
            else:
                e = e + ws * (0.5 * sup_sq_loss(w) / ss2
                              + n_sup * jnp.log(ss2) / 2.0)
        return e

    return energy, unsup_sq_loss, sup_sq_loss, n_unsup, n_sup


def train_sshmt(merge_feats_per_image, orders, sup_feats, sup_labels,
                classifier="logsig", mlp_hidden=(10, 5), wr=1.0, wu=1.0,
                ws=1.0, n_sigma_update=10, inner_steps=100,
                optimizer="adam", lr=0.1, seed=0,
                defaults: Optional[SshmtDefaults] = None, verbose=False,
                sup_batch=0, balance_sup_batch=False, sup_loss="gaussian"):
    """Full SSHMT training loop (EM over sigmas, optax inner optimizer).

    merge_feats_per_image: list of [n_merges_i, D] arrays; orders: matching
    merge orders.  sup_feats/sup_labels: labeled boundary samples (+1 split
    / -1 merge).  sup_batch > 0 enables minibatch supervised epochs
    (UniformBatchSampler / ClassBatchSampler per alg/gd.hxx:86-157 +
    type/sampler.hxx).  Returns dict with weights and training history.
    """
    import jax
    import jax.numpy as jnp
    import optax

    defaults = defaults or SshmtDefaults()
    groups: List[dict] = []
    for feats, order in zip(merge_feats_per_image, orders):
        groups += build_path_groups(order, feats, defaults)
    # merge groups of equal length across images
    merged: Dict[int, dict] = {}
    for g in groups:
        if g["len"] in merged:
            m = merged[g["len"]]
            m["x"] = np.concatenate([m["x"], g["x"]])
            m["y"] = np.concatenate([m["y"], g["y"]])
        else:
            merged[g["len"]] = dict(g)
    path_groups = [merged[k] for k in sorted(merged)]
    supervised = build_supervised(sup_feats, sup_labels, defaults) \
        if sup_feats is not None and len(sup_feats) else None

    D = (path_groups[0]["x"].shape[-1] if path_groups
         else supervised["x"].shape[-1])
    if classifier == "logsig":
        w0 = np.zeros(D)
        clf = make_classifier("logsig")
    else:
        from ..models.mlp import mlp2_init

        N1, N2 = mlp_hidden
        w0 = mlp2_init(D, N1, N2, seed)
        clf = make_classifier("mlp2", D, N1, N2)

    energy, unsup_sq, sup_sq, n_u, n_s = make_energy(
        clf, path_groups, supervised, wr, wu, ws, defaults.merge_target,
        sup_loss=sup_loss)

    # optional supervised minibatching: rebuild a per-step energy over the
    # sampled batch (paths stay full-batch as in the reference default)
    sampler = None
    if sup_batch and supervised is not None and sup_batch < n_s:
        from .samplers import ClassBatchSampler, UniformBatchSampler

        if balance_sup_batch:
            sampler = ClassBatchSampler(
                np.where(np.asarray(sup_labels) > 0, 1, -1), sup_batch,
                seed)
        else:
            sampler = UniformBatchSampler(n_s, sup_batch, seed)

    if optimizer == "adam":
        opt = optax.adam(lr)
    elif optimizer == "momentum":
        opt = optax.sgd(lr, momentum=0.9)
    else:
        opt = optax.sgd(lr)

    w = jnp.asarray(w0)
    su2 = 1.0
    ss2 = 1.0

    jit_grad = jax.jit(jax.value_and_grad(energy))
    jit_unsup = jax.jit(unsup_sq)
    jit_sup = jax.jit(sup_sq)

    batch_grad = None
    if sampler is not None:
        def batch_energy(w, su2, ss2, bx, by):
            be, _, _, _, _ = make_energy(
                clf, path_groups, {"x": bx, "y": by}, wr, wu, ws,
                defaults.merge_target, sup_loss=sup_loss)
            return be(w, su2, ss2)

        batch_grad = jax.jit(jax.value_and_grad(batch_energy))
        sup_x_np = np.asarray(supervised["x"])
        sup_y_np = np.asarray(supervised["y"])

    def update_sigmas(w, su2, ss2):
        # sigma^2 = ||Y-F||^2 / N, floored (sshmt_util.hxx:140-145)
        if n_u:
            su2 = max(defaults.min_sigma2, float(jit_unsup(w)) / n_u)
        if n_s:
            ss2 = max(defaults.min_sigma2, float(jit_sup(w)) / n_s)
        return su2, ss2

    su2, ss2 = update_sigmas(w, su2, ss2)
    history = []
    for round_i in range(n_sigma_update):
        state = opt.init(w)
        for _ in range(inner_steps):
            if batch_grad is not None:
                bi = sampler.next_batch()
                e, g = batch_grad(w, su2, ss2,
                                  jnp.asarray(sup_x_np[bi]),
                                  jnp.asarray(sup_y_np[bi]))
            else:
                e, g = jit_grad(w, su2, ss2)
            updates, state = opt.update(g, state, w)
            w = optax.apply_updates(w, updates)
        su2, ss2 = update_sigmas(w, su2, ss2)
        history.append({"round": round_i, "energy": float(e),
                        "sigma_u": float(np.sqrt(su2)),
                        "sigma_s": float(np.sqrt(ss2))})
        if verbose:
            print(f"learn-{round_i + 1}: su={np.sqrt(su2):.4g} "
                  f"ss={np.sqrt(ss2):.4g} E={float(e):.4g}")
    return {"w": np.asarray(w), "sigma_u2": su2, "sigma_s2": ss2,
            "history": history, "classifier": classifier, "dim": D}
