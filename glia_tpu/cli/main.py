"""Command-line interface mirroring the reference's executables.

Usage: python -m glia_tpu.cli <command> [options]

Each subcommand corresponds to one reference binary (SURVEY.md section 2.7)
and exchanges the same artifacts: label/real images (PNG/TIF) and
whitespace text files (merge orders ``r0 r1 r2`` per line, saliency /
probability / feature matrices), so stages remain individually runnable and
inspectable.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np


def _read_label(path):
    from ..io.image import read_label_image

    return read_label_image(path)


def _read_real(path):
    from ..io.image import read_real_image

    return read_real_image(path, normalize=True)


def _write_label(path, arr):
    from ..io.image import write_image

    arr = np.asarray(arr)
    if arr.max() < 2 ** 16:
        arr = arr.astype(np.uint16)
    else:
        arr = arr.astype(np.int32)
    write_image(path, arr)


def cmd_watershed(a):
    from ..pipeline import watershed

    seg = watershed(_read_real(a.input), a.level, relabel=a.relabel)
    _write_label(a.output, seg)


def cmd_pre_merge(a):
    from ..pipeline import pre_merge

    seg = _read_label(a.segImage)
    pb = _read_real(a.pbImage)
    out = pre_merge(seg, pb, tuple(a.sizeThresholds), a.rpbThreshold)
    _write_label(a.output, out)


def cmd_merge_order_pb(a):
    from ..graph.rag import build_rag
    from ..io.text import write_merge_order, write_vector
    from ..native import greedy_merge_native

    seg = _read_label(a.segImage)
    pb = _read_real(a.pbImage)
    rag = build_rag(seg, contour_only=(a.type != "median_minsize"))
    order, sals = greedy_merge_native(rag, pb, policy=a.type)
    if a.mergeOrder:
        write_merge_order(a.mergeOrder, order)
    if a.saliency:
        write_vector(a.saliency, sals)


def cmd_bc_feat(a):
    from ..features.config import FeatureConfig
    from ..features.hierarchical import TreeFeatures
    from ..graph.rag import build_rag
    from ..io.text import read_merge_order, read_vector, write_matrix

    seg = _read_label(a.segImage)
    pb = _read_real(a.pbImage)
    intensity = _read_real(a.rawImage) if a.rawImage else None
    order = read_merge_order(a.mergeOrder)
    sals = read_vector(a.saliency) if a.saliency else None
    cfg = FeatureConfig.standard(pb, intensity, n_bins=a.bins,
                                 boundary_thresholds=tuple(a.bt),
                                 normalize_shape=a.normalizeShape)
    cfg.use_log_shape = a.logShape
    rag = build_rag(seg, contour_only=False)
    tf = TreeFeatures(rag, order, cfg, saliencies=sals)
    feats = tf.simple_features() if a.simple else tf.bc_features()
    write_matrix(a.bfeat, feats)


def cmd_bc_label(a):
    from ..features.labels import bc_labels
    from ..io.text import read_merge_order, write_vector

    seg = _read_label(a.segImage)
    truth = _read_label(a.truthImage)
    order = read_merge_order(a.mergeOrder)
    labels, m, s = bc_labels(seg, truth, order, rule=a.rule,
                             tweak=a.tweak, max_prec_drop=a.maxPrecDrop)
    write_vector(a.output, labels, fmt="%d")


def cmd_train_rf(a):
    from ..io.text import read_matrix, read_vector
    from ..models.forest import train_forest

    X = np.concatenate([read_matrix(f) for f in a.feat])
    y = np.concatenate([read_vector(f, dtype=np.int64) for f in a.label])
    model = train_forest(X, y, n_trees=a.nTree, sample_ratio=a.sampleRatio,
                         seed=a.seed)
    model.save(a.model)


def cmd_pred_rf(a):
    from ..io.text import read_matrix, write_vector
    from ..models.forest import ForestModel, predict_label_fraction

    model = ForestModel.load(a.model)
    X = read_matrix(a.feat)
    p = predict_label_fraction(model, X, label=a.label)
    write_vector(a.output, p)


def cmd_segment(a, mode):
    from ..graph.tree import build_tree, node_potentials
    from ..infer.ccm import segment_ccm_picks
    from ..infer.greedy import resolve_tree_greedy
    from ..infer.segment import final_segmentation, relabel_image
    from ..io.text import read_merge_order, read_vector

    seg = _read_label(a.segImage)
    order = read_merge_order(a.mergeOrder)
    probs = read_vector(a.mergeProbs)
    tree = build_tree(order)
    if mode == "greedy":
        pot = node_potentials(tree, probs)
        picks = resolve_tree_greedy(tree, pot)
    else:
        picks = segment_ccm_picks(tree, probs)
    out = final_segmentation(seg, tree, picks)
    if a.relabel:
        out = relabel_image(out, 0)
    _write_label(a.output, out)


def cmd_apply_merges(a):
    from ..graph.merge import apply_merge_order
    from ..io.text import read_merge_order, read_vector

    seg = _read_label(a.segImage)
    order = read_merge_order(a.mergeOrder)
    sals = read_vector(a.saliency) if a.saliency else None
    out = apply_merge_order(seg, order, threshold_index=a.n,
                            saliencies=sals,
                            saliency_threshold=a.saliencyThreshold)
    _write_label(a.output, out)


def cmd_eval_vi(a):
    from ..metrics import eval_vi

    segs = [_read_label(f) for f in a.resImage]
    refs = [_read_label(f) for f in a.refImage]
    fs, fm, tot = eval_vi(segs, refs)
    print(f"{fs:.6g} {fm:.6g} {tot:.6g}")


def cmd_eval_ri(a):
    from ..metrics import eval_ri

    segs = [_read_label(f) for f in a.resImage]
    refs = [_read_label(f) for f in a.refImage]
    if a.adapted:
        prec, rec, err = eval_ri(segs, refs, adapted=True)
        print(f"{prec:.6g} {rec:.6g} {err:.6g}")
    else:
        print(f"{eval_ri(segs, refs, adapted=False):.6g}")


def cmd_relabel(a):
    from ..infer.segment import relabel_image

    _write_label(a.output, relabel_image(_read_label(a.input), a.start))


def cmd_labelcc(a):
    from ..native import connected_components_native

    _write_label(a.output, connected_components_native(_read_label(a.input)))


def build_parser():
    p = argparse.ArgumentParser(prog="glia_tpu",
                                description=__doc__,
                                formatter_class=argparse.RawDescriptionHelpFormatter)
    sub = p.add_subparsers(dest="command", required=True)

    q = sub.add_parser("watershed", help="initial superpixels")
    q.add_argument("-i", "--input", required=True)
    q.add_argument("-l", "--level", type=float, default=0.0)
    q.add_argument("-r", "--relabel", action="store_true")
    q.add_argument("-o", "--output", required=True)
    q.set_defaults(fn=cmd_watershed)

    q = sub.add_parser("pre_merge", help="merge small/dark fragments")
    q.add_argument("-s", "--segImage", required=True)
    q.add_argument("-p", "--pbImage", required=True)
    q.add_argument("-t", "--sizeThresholds", type=int, nargs="+",
                   default=[50])
    q.add_argument("-b", "--rpbThreshold", type=float, default=0.5)
    q.add_argument("-o", "--output", required=True)
    q.set_defaults(fn=cmd_pre_merge)

    q = sub.add_parser("merge_order_pb", help="greedy merge order from pb")
    q.add_argument("-s", "--segImage", required=True)
    q.add_argument("-p", "--pbImage", required=True)
    q.add_argument("-t", "--type", default="median",
                   choices=["median", "mean", "median_minsize"])
    q.add_argument("-o", "--mergeOrder")
    q.add_argument("-y", "--saliency")
    q.set_defaults(fn=cmd_merge_order_pb)

    q = sub.add_parser("bc_feat", help="boundary classifier features")
    q.add_argument("-s", "--segImage", required=True)
    q.add_argument("-p", "--pbImage", required=True)
    q.add_argument("--rawImage")
    q.add_argument("-o", "--mergeOrder", required=True)
    q.add_argument("-y", "--saliency")
    q.add_argument("--bins", type=int, default=16)
    q.add_argument("--bt", type=float, nargs="+", default=[0.2, 0.5, 0.8])
    q.add_argument("--normalizeShape", action="store_true")
    q.add_argument("--logShape", action="store_true")
    q.add_argument("--simple", action="store_true")
    q.add_argument("-b", "--bfeat", required=True)
    q.set_defaults(fn=cmd_bc_feat)

    q = sub.add_parser("bc_label", help="merge/split training labels")
    q.add_argument("-s", "--segImage", required=True)
    q.add_argument("-t", "--truthImage", required=True)
    q.add_argument("-o", "--mergeOrder", required=True)
    q.add_argument("--rule", default="f1", choices=["f1", "vi", "ri"])
    q.add_argument("--tweak", action="store_true")
    q.add_argument("--maxPrecDrop", type=float, default=1.0)
    q.add_argument("-l", "--output", required=True)
    q.set_defaults(fn=cmd_bc_label)

    q = sub.add_parser("train_rf", help="train random forest")
    q.add_argument("-f", "--feat", nargs="+", required=True)
    q.add_argument("-l", "--label", nargs="+", required=True)
    q.add_argument("--nTree", type=int, default=255)
    q.add_argument("--sampleRatio", type=float, default=0.7)
    q.add_argument("--seed", type=int, default=0)
    q.add_argument("-m", "--model", required=True)
    q.set_defaults(fn=cmd_train_rf)

    q = sub.add_parser("pred_rf", help="predict merge probabilities")
    q.add_argument("-m", "--model", required=True)
    q.add_argument("-f", "--feat", required=True)
    q.add_argument("--label", type=int, default=-1)
    q.add_argument("-o", "--output", required=True)
    q.set_defaults(fn=cmd_pred_rf)

    for name in ("segment_greedy", "segment_ccm"):
        q = sub.add_parser(name, help=f"{name} final segmentation")
        q.add_argument("-s", "--segImage", required=True)
        q.add_argument("-o", "--mergeOrder", required=True)
        q.add_argument("-p", "--mergeProbs", required=True)
        q.add_argument("-r", "--relabel", action="store_true")
        q.add_argument("-f", "--output", required=True)
        mode = "greedy" if name.endswith("greedy") else "ccm"
        q.set_defaults(fn=lambda a, m=mode: cmd_segment(a, m))

    q = sub.add_parser("apply_merges", help="replay merge order")
    q.add_argument("-s", "--segImage", required=True)
    q.add_argument("-o", "--mergeOrder", required=True)
    q.add_argument("-y", "--saliency")
    q.add_argument("-n", type=int, default=None,
                   help="number of merges to apply")
    q.add_argument("--saliencyThreshold", type=float, default=None)
    q.add_argument("-f", "--output", required=True)
    q.set_defaults(fn=cmd_apply_merges)

    q = sub.add_parser("eval_vi", help="VI: falseSplit falseMerge total")
    q.add_argument("-p", "--resImage", nargs="+", required=True)
    q.add_argument("-r", "--refImage", nargs="+", required=True)
    q.set_defaults(fn=cmd_eval_vi)

    q = sub.add_parser("eval_ri", help="adapted Rand: prec rec error")
    q.add_argument("-p", "--resImage", nargs="+", required=True)
    q.add_argument("-r", "--refImage", nargs="+", required=True)
    q.add_argument("-a", "--adapted", type=lambda s: s != "0",
                   default=True)
    q.set_defaults(fn=cmd_eval_ri)

    q = sub.add_parser("relabel_image", help="relabel by size")
    q.add_argument("-i", "--input", required=True)
    q.add_argument("--start", type=int, default=0)
    q.add_argument("-o", "--output", required=True)
    q.set_defaults(fn=cmd_relabel)

    q = sub.add_parser("labelcc_image", help="connected components")
    q.add_argument("-i", "--input", required=True)
    q.add_argument("-o", "--output", required=True)
    q.set_defaults(fn=cmd_labelcc)

    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
