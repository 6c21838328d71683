"""High-level HMT pipeline API.

Replaces the reference's file bus of CLI binaries (SURVEY.md section 3.5)
with in-memory array stages:

  watershed -> pre_merge -> merge_order (pb or classifier) -> features +
  labels -> train (RF / MLP / SSHMT) -> merge probs -> segment (greedy/CCM)
  -> eval (VI / adapted Rand)

Each function mirrors one reference executable; dimension (2D/3D) is a
runtime property of the arrays, not a compile flag.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence

import numpy as np

from .constants import BG_VAL, sdivide
from .features.config import FeatureConfig
from .features.hierarchical import TreeFeatures
from .features.labels import bc_labels
from .graph.merge import apply_merge_order, greedy_merge_order
from .graph.rag import build_rag
from .graph.tree import build_tree, node_potentials
from .infer.ccm import segment_ccm_picks
from .infer.greedy import resolve_tree_greedy
from .infer.segment import final_segmentation
from .metrics import eval_ri, eval_vi
from .models.forest import ForestModel, predict_label_fraction, train_forest
from .native import greedy_merge_native, watershed_native


def watershed(pb, level=0.0, relabel=False):
    """gadget/main_watershed.cxx equivalent."""
    seg = watershed_native(np.asarray(pb, dtype=np.float32), level)
    if relabel:
        from .infer.segment import relabel_image

        seg = relabel_image(seg, 1)
    return seg


def pre_merge(labels, pb, size_thresholds=(50,), rpb_threshold=0.5,
              engine="native"):
    """gadget/main_pre_merge.cxx: greedily merge regions that are small
    (< thresholds[0]) or medium (< thresholds[1]) with high mean pb
    (mostly-membrane fragments), using pooled-mean saliency.

    engine="native" runs the C++ serial loop (the Python heap engine was
    the 3D-pipeline wall-clock hog: 17 of 19s at 24x256x256);
    engine="py" keeps the original fcond engine as the parity oracle.
    Returns the relabeled image after all permitted merges.
    """
    labels = np.asarray(labels)
    rag = build_rag(labels, contour_only=False)
    if engine == "native":
        from .native import pre_merge_native

        order, _ = pre_merge_native(rag, pb, size_thresholds, rpb_threshold)
        return apply_merge_order(labels, order)
    pbf = np.asarray(pb, dtype=np.float64).ravel()

    # per-region pb sums for the mean-pb condition, maintained over merges
    pb_sum = {}
    for i, k in enumerate(rag.keys):
        s, e = int(rag.region_ptr[i]), int(rag.region_ptr[i + 1])
        pb_sum[int(k)] = float(pbf[rag.region_pixels[s:e]].sum())

    t0 = size_thresholds[0]
    t1 = size_thresholds[1] if len(size_thresholds) > 1 else None

    def fcond(u, v, sizes, _cache):
        su, sv = sizes[u], sizes[v]
        k0, k1 = (u, v) if su <= sv else (v, u)
        s0, s1 = min(su, sv), max(su, sv)
        if s0 < t0:
            return True
        if t1 is not None:
            if s0 < t1 and sdivide(pb_sum[k0], s0, 0.0) > rpb_threshold:
                return True
            if s1 < t1 and sdivide(pb_sum[k1], s1, 0.0) > rpb_threshold:
                return True
        return False

    def on_merge(r0, r1, r2):
        pb_sum[r2] = pb_sum[r0] + pb_sum[r1]

    order, _ = greedy_merge_order(
        rag, pb, policy="mean", fcond=fcond, track_sizes=True,
        on_merge=on_merge)
    return apply_merge_order(labels, order)


@dataclass
class HmtModel:
    """Trained boundary classifier + feature configuration knobs.

    kind: "rf" (single forest), "rf_ensemble" (3 forests routed by region
    areas, main_merge_order_bc.cxx ensemble path), or "mlp" (MLP2 with
    minmax rescale, pred_mlp semantics).
    """

    forest: ForestModel
    n_bins: int = 16
    boundary_thresholds: tuple = (0.2, 0.5, 0.8)
    policy: str = "median"
    kind: str = "rf"
    extra: dict = None
    feature_set: str = "full"   # "full" BC vector | "simple" selectFeatures

    def predict_merge_prob(self, feats, backend="np"):
        if self.kind == "rf":
            return predict_label_fraction(self.forest, feats, label=-1,
                                          backend=backend)
        if self.kind == "rf_ensemble":
            return self.extra["ensemble"](feats)
        if self.kind == "mlp":
            from .learn.predict import predict_mlp2

            m = self.extra
            return predict_mlp2(m["w"], feats, m["minmax"], m["n1"],
                                m["n2"])
        if self.kind == "logsig":
            from .learn.predict import predict_logsig, rescale_features

            m = self.extra
            if m.get("minmax") is not None:
                feats = rescale_features(feats, m["minmax"])
            return predict_logsig(m["w"], feats)
        raise ValueError(self.kind)


def _features_for(seg, pb, intensity, model_cfg, order, sals):
    cfg = FeatureConfig.standard(
        pb, intensity, n_bins=model_cfg.n_bins,
        boundary_thresholds=model_cfg.boundary_thresholds)
    rag = build_rag(seg, contour_only=False)
    tf = TreeFeatures(rag, order, cfg, saliencies=sals)
    if getattr(model_cfg, "feature_set", "full") == "simple":
        return tf.simple_features()
    return tf.bc_features()


def hmt_train(slices, policy="median", rule="f1", n_trees=100, seed=0,
              watershed_level=0.05, pre_merge_size=30,
              n_bins=16, classifier="rf",
              ensemble_threshold=None, mlp_hidden=(16, 8)) -> HmtModel:
    """Train the boundary classifier over (pb, intensity, truth) slices.

    slices: sequence of dicts with keys pb, intensity, truth.
    Pipeline per slice: watershed -> pre_merge -> merge_order_pb ->
    bc_feat + bc_label -> pooled classifier training.
    classifier: "rf" | "rf_ensemble" | "mlp".
    """
    cfg0 = HmtModel(forest=None, n_bins=n_bins)  # type: ignore
    X, y = [], []
    for s in slices:
        seg = watershed(s["pb"], watershed_level)
        if pre_merge_size:
            seg = pre_merge(seg, s["pb"], (pre_merge_size,))
        rag = build_rag(seg, contour_only=False)
        order, sals = greedy_merge_native(rag, s["pb"], policy=policy)
        feats = _features_for(seg, s["pb"], s.get("intensity"), cfg0,
                              order, sals)
        labels, _, _ = bc_labels(seg, s["truth"], order, rule=rule)
        X.append(feats)
        y.append(labels)
    X = np.concatenate(X)
    y = np.concatenate(y)
    if classifier == "rf":
        forest = train_forest(X, y, n_trees=n_trees, seed=seed)
        return HmtModel(forest=forest, n_bins=n_bins, policy=policy)
    if classifier == "rf_ensemble":
        from .features.config import FeatureConfig
        from .models.train_ensemble import (
            bc_area_feature_indices,
            train_forest_ensemble,
        )

        cfg = FeatureConfig.standard(
            slices[0]["pb"], slices[0].get("intensity"), n_bins=n_bins)
        dim0, dim1 = bc_area_feature_indices(cfg)
        if ensemble_threshold is None:
            ensemble_threshold = float(np.median(X[:, dim1]))
        ens = train_forest_ensemble(X, y, dim0, dim1, ensemble_threshold,
                                    n_trees=n_trees, seed=seed)
        return HmtModel(forest=None, n_bins=n_bins, policy=policy,
                        kind="rf_ensemble", extra={"ensemble": ens})
    if classifier == "mlp":
        from .models.train_ensemble import train_mlp_supervised

        m = train_mlp_supervised(X, y, hidden=mlp_hidden, seed=seed)
        return HmtModel(forest=None, n_bins=n_bins, policy=policy,
                        kind="mlp", extra=m)
    raise ValueError(classifier)


def hmt_train_sshmt(labeled_slices, unlabeled_slices, policy="median",
                    rule="f1", watershed_level=0.05, pre_merge_size=30,
                    n_bins=16, label_fraction=1.0, wr=1.0, wu=1.0, ws=1.0,
                    n_sigma_update=5, inner_steps=150, lr=0.2,
                    seed=0) -> HmtModel:
    """Semi-supervised SSHMT training pipeline (BASELINE config #3).

    labeled_slices contribute (sparse) merge/split labels; unlabeled ones
    contribute root-path consistency constraints only.  The classifier is
    a Logsig over min-max rescaled selectFeatures "simple" features
    (the reference's SSHMT setup, main_train_sshmt_logsig.cxx).
    ``label_fraction`` subsamples the labeled merges to emulate sparse
    supervision.
    """
    from .learn.predict import feature_minmax, rescale_features
    from .learn.sshmt import train_sshmt

    cfg0 = HmtModel(forest=None, n_bins=n_bins,
                    feature_set="simple")  # type: ignore
    sup_X, sup_y = [], []
    uns_feats, uns_orders = [], []
    rng = np.random.default_rng(seed)

    def stage(s):
        seg = watershed(s["pb"], watershed_level)
        if pre_merge_size:
            seg = pre_merge(seg, s["pb"], (pre_merge_size,))
        rag = build_rag(seg, contour_only=False)
        order, sals = greedy_merge_native(rag, s["pb"], policy=policy)
        feats = _features_for(seg, s["pb"], s.get("intensity"), cfg0,
                              order, sals)
        return seg, order, feats

    for s in labeled_slices:
        seg, order, feats = stage(s)
        labels, _, _ = bc_labels(seg, s["truth"], order, rule=rule)
        keep = rng.random(len(labels)) < label_fraction
        sup_X.append(feats[keep])
        sup_y.append(labels[keep])
        uns_feats.append(feats)
        uns_orders.append(order)
    for s in unlabeled_slices:
        seg, order, feats = stage(s)
        uns_feats.append(feats)
        uns_orders.append(order)

    sup_X = np.concatenate(sup_X) if sup_X else None
    sup_y = np.concatenate(sup_y) if sup_y else None
    allf = np.concatenate(uns_feats)
    minmax = feature_minmax(allf)
    uns_feats = [rescale_features(f, minmax) for f in uns_feats]
    sup_Xr = rescale_features(sup_X, minmax) if sup_X is not None else None
    out = train_sshmt(uns_feats, uns_orders, sup_Xr, sup_y,
                      classifier="logsig", wr=wr, wu=wu, ws=ws,
                      n_sigma_update=n_sigma_update,
                      inner_steps=inner_steps, lr=lr, seed=seed)
    return HmtModel(forest=None, n_bins=n_bins, policy=policy,
                    kind="logsig", feature_set="simple",
                    extra={"w": out["w"], "minmax": minmax,
                           "history": out["history"]})


def hmt_segment(pb, intensity, model: HmtModel, watershed_level=0.05,
                pre_merge_size=30, mode="greedy", backend="np",
                engine="host"):
    """Inference: watershed -> pre_merge -> merge order -> merge probs from
    the classifier -> tree resolution -> final label image.

    engine="host" runs the exact serial C++ merge loop + host feature
    extraction.  engine="device" runs the SAME algorithm with the merge
    hot loop on the accelerator: batched fused pb-policy merge order,
    then host feature extraction + batched classifier scoring (so host
    and device hierarchies are structurally comparable).
    engine="device_bc" (forest models only) runs the on-device
    classifier-in-the-loop pipeline (merge_bc_device: device feature
    assembly + forest scoring inside the merge loop) -- the counterpart
    of the reference's merge_order_bc (util/struct_merge_bc.hxx:10-58),
    which orders merges by classifier probability and therefore builds a
    structurally DIFFERENT hierarchy than the pb-policy engines."""
    seg = watershed(pb, watershed_level)
    if pre_merge_size:
        seg = pre_merge(seg, pb, (pre_merge_size,))
    rag = build_rag(seg, contour_only=False)
    if engine == "device_bc":
        if model.kind != "rf":
            raise ValueError(
                "engine='device_bc' needs a forest model (kind='rf'); "
                f"got kind={model.kind!r}")
        if getattr(model, "feature_set", "full") != "full":
            raise ValueError(
                "engine='device_bc' assembles the full BC feature vector "
                "on device; model.feature_set="
                f"{model.feature_set!r} is not supported -- use "
                "engine='host' or retrain with feature_set='full'")
        from .features.config import FeatureConfig
        from .graph.merge_bc_device import merge_order_bc_device
        from .models.forest import make_label_scorer

        cfg = FeatureConfig.standard(
            pb, intensity, n_bins=model.n_bins,
            boundary_thresholds=model.boundary_thresholds)
        predict_dev, consts = make_label_scorer(model.forest, label=-1,
                                                embed=True)
        order, probs = merge_order_bc_device(rag, cfg, predict_dev,
                                             predict_consts=consts)
        tree = build_tree(order)
        if mode == "greedy":
            picks = resolve_tree_greedy(tree, node_potentials(tree, probs))
        elif mode == "ccm":
            picks = segment_ccm_picks(tree, probs)
        else:
            raise ValueError(mode)
        return final_segmentation(seg, tree, picks), {
            "seg0": seg, "order": order, "probs": probs,
            "n_picks": len(picks)}
    if engine == "device":
        from .graph.merge_device import greedy_merge_device

        if model.policy not in ("mean", "median", "median_minsize"):
            raise ValueError(
                f"device merge engine supports policies "
                f"'mean'|'median'|'median_minsize'; "
                f"model.policy={model.policy!r}")
        order, sals = greedy_merge_device(rag, pb, policy=model.policy)
    elif engine == "host":
        order, sals = greedy_merge_native(rag, pb, policy=model.policy)
    else:
        raise ValueError(engine)
    feats = _features_for(seg, pb, intensity, model, order, sals)
    # merge probability = vote fraction for label -1 (BC_LABEL_MERGE)
    probs = model.predict_merge_prob(feats, backend=backend)
    tree = build_tree(order)
    if mode == "greedy":
        pot = node_potentials(tree, probs)
        picks = resolve_tree_greedy(tree, pot)
    elif mode == "ccm":
        picks = segment_ccm_picks(tree, probs)
    else:
        raise ValueError(mode)
    return final_segmentation(seg, tree, picks), {
        "seg0": seg, "order": order, "probs": probs, "n_picks": len(picks)}


def evaluate(seg, truth):
    fs, fm, vi = eval_vi(seg, truth)
    prec, rec, err = eval_ri(seg, truth)
    return {"vi_split": fs, "vi_merge": fm, "vi": vi,
            "rand_precision": prec, "rand_recall": rec, "rand_error": err}
