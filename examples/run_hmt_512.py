"""End-to-end 512x512 HMT demo + quality/timing record.

Runs the learned pipeline at the BASELINE 2D-HMT config scale on synthetic
EM slices and prints a JSON summary (quality vs the watershed baseline and
per-stage timings).  Usage:

    python examples/run_hmt_512.py [--mode greedy|ccm]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="greedy", choices=["greedy", "ccm"])
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--cells", type=int, default=900)
    ap.add_argument("--trees", type=int, default=120)
    args = ap.parse_args()

    from glia_tpu.data.synthetic import synthetic_em_slice
    from glia_tpu.pipeline import evaluate, hmt_segment, hmt_train
    from glia_tpu.utils.profiling import StageTimer

    timer = StageTimer()
    shape = (args.size, args.size)
    with timer.stage("data"):
        train = [synthetic_em_slice(shape, n_cells=args.cells, seed=s)
                 for s in (1, 2)]
        test = synthetic_em_slice(shape, n_cells=args.cells, seed=77)
    with timer.stage("train"):
        model = hmt_train(train, n_trees=args.trees, pre_merge_size=30,
                          watershed_level=0.01)
    with timer.stage("segment"):
        seg, aux = hmt_segment(test["pb"], test["intensity"], model,
                               watershed_level=0.01, pre_merge_size=30,
                               mode=args.mode)
    with timer.stage("evaluate"):
        base = evaluate(aux["seg0"], test["truth"])
        ours = evaluate(seg, test["truth"])
    timer.report()
    print(json.dumps({
        "mode": args.mode,
        "n_superpixels": int(len(np.unique(aux["seg0"]))),
        "n_final": int(len(np.unique(seg))),
        "watershed": {k: round(v, 4) for k, v in base.items()},
        "hmt": {k: round(v, 4) for k, v in ours.items()},
        "timings": json.loads(timer.json()),
    }, indent=2))


if __name__ == "__main__":
    try:
        main()
    finally:
        sys.stdout.flush()
        os._exit(0)
