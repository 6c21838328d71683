"""Stack pipelines: 3D HMT (supervoxels) and LINK3D (per-slice 2D + linking).

Reference configs (BASELINE.json):
  - "3D HMT": one watershed/RAG/merge-tree over the whole volume
    (6-connectivity supervoxels);
  - "LINK3D": per-slice 2D HMT segmentations, cross-section region pairs
    scored by a link classifier, thresholded links grouped into 3D neurons.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

from .features.config import FeatureConfig
from .link3d.link import (
    gen_region_pairs,
    group_region_profiles,
    link_by_threshold,
    sc_features,
    sc_labels,
)
from .models.forest import predict_label_fraction, train_forest
from .pipeline import HmtModel, hmt_segment, hmt_train


def hmt3d_segment(pb_volume, intensity_volume, model: HmtModel,
                  watershed_level=0.05, pre_merge_size=30, mode="greedy"):
    """3D HMT: the 2D pipeline applied to a volume (dimension is runtime)."""
    return hmt_segment(pb_volume, intensity_volume, model,
                       watershed_level=watershed_level,
                       pre_merge_size=pre_merge_size, mode=mode)


def link3d_train(slices, seg_slices, n_trees=100, seed=0, n_bins=8):
    """Train the section-link classifier from consecutive slice pairs.

    slices: dicts with pb / intensity / truth; seg_slices: 2D segmentations
    (e.g. hmt_segment outputs) aligned with them.
    """
    X, y = [], []
    for z in range(len(slices) - 1):
        s0, s1 = seg_slices[z], seg_slices[z + 1]
        cfg = FeatureConfig.standard(slices[z]["pb"],
                                     slices[z].get("intensity"),
                                     n_bins=n_bins)
        pairs, _ = gen_region_pairs(s0, s1, z, z + 1)
        if not pairs:
            continue
        X.append(sc_features(s0, s1, cfg, pairs))
        labels, _, _ = sc_labels(s0, slices[z]["truth"], s1,
                                 slices[z + 1]["truth"], pairs)
        y.append(labels)
    X = np.concatenate(X)
    y = np.concatenate(y)
    return train_forest(X, y, n_trees=n_trees, seed=seed)


def link3d_segment(slices, seg_slices, link_model, min_score=0.5,
                   force_link=True, n_bins=8):
    """Score consecutive-slice pairs, link, group into a 3D volume."""
    all_pairs = []
    all_scores = []
    for z in range(len(slices) - 1):
        s0, s1 = seg_slices[z], seg_slices[z + 1]
        cfg = FeatureConfig.standard(slices[z]["pb"],
                                     slices[z].get("intensity"),
                                     n_bins=n_bins)
        pairs, _ = gen_region_pairs(s0, s1, z, z + 1)
        if not pairs:
            continue
        feats = sc_features(s0, s1, cfg, pairs)
        scores = predict_label_fraction(link_model, feats, label=1)
        all_pairs += pairs
        all_scores.append(scores)
    scores = np.concatenate(all_scores) if all_scores else np.zeros(0)
    links = link_by_threshold(all_pairs, scores, min_score, force_link)
    return group_region_profiles(seg_slices, list(range(len(slices))),
                                 links)
