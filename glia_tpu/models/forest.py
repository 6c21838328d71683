"""Random forest: vectorized TPU inference + host training.

The reference links Breiman-Cutler Fortran/C random forest code (external to
its repo, code/CMakeLists.txt:252-257) and exposes vote-fraction prediction:
``predict(x, label) = votes[label] / ntree`` where each tree votes its leaf
class (code/ml/rf/rf.hxx:362-372).  Training RNG there is irreproducible
(SURVEY.md section 7 "hard parts"); the strategy is *inference parity*: any
forest expressed in node-array form evaluates here exactly as classForest
would.

TPU-native design: all trees are packed into dense [n_trees, max_nodes]
tensors and every (sample, tree) pair descends in lock-step for ``max_depth``
iterations -- a fully vectorized gather walk with no data-dependent control
flow, so XLA maps it onto wide vector ops (and batches stay resident in
VMEM).  Host training uses sklearn CART with the reference's hyperparameter
defaults (code/ml/rf/main_train_rf.cxx:18-70: 255 trees, mtry=sqrt(D),
0.7 sampling, class-balanced weights).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import numpy as np


@dataclass
class ForestModel:
    """Dense node-array forest (all trees padded to max_nodes)."""

    feature: np.ndarray     # int32 [T, N]; -1 at leaves
    threshold: np.ndarray   # float32 [T, N]
    left: np.ndarray        # int32 [T, N]
    right: np.ndarray       # int32 [T, N]
    leaf_class: np.ndarray  # int32 [T, N] (argmax class at node; valid at leaves)
    n_classes: int
    max_depth: int
    classes: np.ndarray     # original class labels [n_classes]

    @property
    def n_trees(self) -> int:
        return self.feature.shape[0]

    def save(self, path):
        np.savez_compressed(
            path, feature=self.feature, threshold=self.threshold,
            left=self.left, right=self.right, leaf_class=self.leaf_class,
            n_classes=self.n_classes, max_depth=self.max_depth,
            classes=self.classes)

    @classmethod
    def load(cls, path):
        z = np.load(path)
        return cls(
            feature=z["feature"], threshold=z["threshold"], left=z["left"],
            right=z["right"], leaf_class=z["leaf_class"],
            n_classes=int(z["n_classes"]), max_depth=int(z["max_depth"]),
            classes=z["classes"])

    @classmethod
    def from_sklearn(cls, rf):
        """Pack a fitted sklearn RandomForestClassifier."""
        trees = [e.tree_ for e in rf.estimators_]
        n = max(t.node_count for t in trees)
        T = len(trees)
        feature = np.full((T, n), -1, dtype=np.int32)
        threshold = np.zeros((T, n), dtype=np.float32)
        left = np.zeros((T, n), dtype=np.int32)
        right = np.zeros((T, n), dtype=np.int32)
        leaf_class = np.zeros((T, n), dtype=np.int32)
        depth = 0
        for i, t in enumerate(trees):
            c = t.node_count
            feature[i, :c] = t.feature
            threshold[i, :c] = t.threshold
            left[i, :c] = np.maximum(t.children_left, 0)
            right[i, :c] = np.maximum(t.children_right, 0)
            leaf_class[i, :c] = np.argmax(t.value[:, 0, :], axis=1)
            depth = max(depth, int(t.max_depth))
        return cls(feature=feature, threshold=threshold, left=left,
                   right=right, leaf_class=leaf_class,
                   n_classes=len(rf.classes_), max_depth=depth,
                   classes=np.asarray(rf.classes_))


def predict_votes_np(model: ForestModel, X) -> np.ndarray:
    """Host reference evaluation: vote fraction per class [B, n_classes].

    Standard Breiman descent: go left iff x[bestvar] <= split
    (classForest semantics)."""
    X = np.asarray(X, dtype=np.float64)
    B = X.shape[0]
    T = model.n_trees
    votes = np.zeros((B, model.n_classes), dtype=np.float64)
    for t in range(T):
        node = np.zeros(B, dtype=np.int64)
        for _ in range(model.max_depth + 1):
            f = model.feature[t, node]
            leaf = f < 0
            if leaf.all():
                break
            fv = X[np.arange(B), np.maximum(f, 0)]
            go_left = fv <= model.threshold[t, node]
            nxt = np.where(go_left, model.left[t, node],
                           model.right[t, node])
            node = np.where(leaf, node, nxt)
        cls = model.leaf_class[t, node]
        votes[np.arange(B), cls] += 1.0
    return votes / T


def forest_votes_jax_fn(model: ForestModel):
    """Low-level XLA gather-walk builder: (fn(X, tables) -> vote
    fractions [B, C], tables dict of numpy arrays).  Tables are CALL
    ARGUMENTS so that embedding the walk inside larger jitted programs
    does not inline megabytes of node tables as MLIR literals (which the
    remote TPU compile tunnel ships and parses for minutes).

    Lock-step gather walk: node state [B, T], max_depth iterations of pure
    gathers/selects (no data-dependent control flow -> one XLA fusion).

    Layout: all per-node tables are FLATTENED to [T*N] and indexed with
    ``t*N + node`` so each level is one plain 1-D gather per table -- the
    axis-2 ``take_along_axis`` formulation broadcast [1,T,N] against
    [B,T,1] indices and lowered to a catastrophically slow gather on TPU
    (~1.5 s/level-set at B=10k; this form runs the whole walk in ms)."""
    import jax
    import jax.numpy as jnp

    T = model.n_trees
    N = model.feature.shape[1]
    C = model.n_classes
    depth = model.max_depth
    tables = {
        "feature": model.feature.reshape(-1),
        "threshold": model.threshold.reshape(-1),
        "left": model.left.reshape(-1).astype(np.int32),
        "right": model.right.reshape(-1).astype(np.int32),
        "leaf_class": model.leaf_class.reshape(-1),
    }

    def predict(X, tb):
        X = X.astype(jnp.float32)
        B, D = X.shape
        Xf = X.reshape(-1)
        # derive the carry init from X so its varying-manual-axes match
        # the loop body's under shard_map (scan/fori vma rule)
        node = jnp.zeros((B, T), dtype=jnp.int32) + (
            X[:, :1] * 0.0).astype(jnp.int32)
        tree_base = jnp.arange(T, dtype=jnp.int32)[None, :] * N   # [1, T]
        row_base = (jnp.arange(B, dtype=jnp.int32) * D)[:, None]  # [B, 1]

        def body(_, node):
            flat = tree_base + node                           # [B, T]
            f = jnp.take(tb["feature"], flat)
            thr = jnp.take(tb["threshold"], flat)
            l = jnp.take(tb["left"], flat)
            r = jnp.take(tb["right"], flat)
            fv = jnp.take(Xf, row_base + jnp.maximum(f, 0))   # [B, T]
            nxt = jnp.where(fv <= thr, l, r)
            return jnp.where(f < 0, node, nxt)

        node = jax.lax.fori_loop(0, depth + 1, body, node)
        cls = jnp.take(tb["leaf_class"], tree_base + node)    # [B, T]
        votes = jax.nn.one_hot(cls, C, dtype=jnp.float32).sum(axis=1)
        return votes / T

    return predict, tables


def make_predict_votes_jax(model: ForestModel):
    """Build a jitted TPU evaluator: X [B, D] -> vote fractions [B, C]
    (see forest_votes_jax_fn)."""
    import jax
    import jax.numpy as jnp

    fn, tables = forest_votes_jax_fn(model)
    tb_dev = {k: jax.device_put(jnp.asarray(v)) for k, v in tables.items()}
    jfn = jax.jit(fn)
    return lambda X: jfn(X, tb_dev)


def make_label_scorer(model: ForestModel, label=-1, backend="auto",
                      block_b=256, embed=False, interpret=False):
    """Vote-fraction scorer for one label (Model::predict semantics,
    rf.hxx:362-372), picking the Pallas level-packed kernel on TPU
    (measured ~17x over the XLA gather walk on v5e) and the XLA walk
    elsewhere.

    embed=False: returns fn(X [B, D]) -> fraction [B] (standalone use).
    embed=True: returns (fn(X, consts) -> fraction [B], consts pytree of
    numpy arrays).  Use this form when tracing the scorer into a larger
    jitted program (the device BC merge loop) and thread ``consts``
    through as program arguments -- closed-over node tables otherwise
    inline as dense MLIR literals that the remote TPU compile tunnel
    ships and parses for minutes."""
    if backend == "auto":
        import jax

        backend = ("pallas"
                   if jax.devices()[0].platform == "tpu" else "xla")
    li = int(np.nonzero(model.classes == label)[0][0])
    if backend == "pallas":
        from ..ops.pallas.forest import (
            forest_votes_pallas_fn, make_forest_label_pallas)

        if not embed:
            return make_forest_label_pallas(model, label=label,
                                            block_b=block_b,
                                            interpret=interpret)
        votes_fn, tab = forest_votes_pallas_fn(model, block_b=block_b,
                                               interpret=interpret)
        return (lambda X, consts: votes_fn(X, consts)[:, li]), tab
    if not embed:
        votes = make_predict_votes_jax(model)
        return lambda X: votes(X)[:, li]
    fn, tables = forest_votes_jax_fn(model)
    return (lambda X, consts: fn(X, consts)[:, li]), tables


def predict_label_fraction(model: ForestModel, X, label=1, backend="np"):
    """Vote fraction for one label: Model::predict semantics
    (rf.hxx:362-372).  ``label`` is an original class label."""
    li = int(np.nonzero(model.classes == label)[0][0])
    if backend == "np":
        return predict_votes_np(model, X)[:, li]
    return np.asarray(make_predict_votes_jax(model)(np.asarray(X)))[:, li]


def train_forest(X, y, n_trees=255, mtry=None, sample_ratio=0.7,
                 balance_classes=True, seed=0, max_depth=None,
                 n_jobs=1) -> ForestModel:
    """Host CART training with reference defaults
    (main_train_rf.cxx:18-70: nTree=255, mtry=sqrt(D), sampsize=0.7,
    class-balancing weights).

    n_jobs defaults to 1: worker processes inherit the environment, and in
    TPU-attached environments every spawned Python process may dial the
    accelerator runtime (expensive and serialized).
    """
    from sklearn.ensemble import RandomForestClassifier

    X = np.asarray(X, dtype=np.float64)
    y = np.asarray(y).astype(np.int64)
    rf = RandomForestClassifier(
        n_estimators=n_trees,
        max_features="sqrt" if mtry is None else mtry,
        bootstrap=True,
        max_samples=sample_ratio,
        class_weight="balanced" if balance_classes else None,
        random_state=seed,
        max_depth=max_depth,
        n_jobs=n_jobs,
    )
    rf.fit(X, y)
    return ForestModel.from_sklearn(rf)
