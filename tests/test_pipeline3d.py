"""Stack pipelines: 3D HMT and full LINK3D train/segment round trip."""

import numpy as np
import pytest

from glia_tpu.data.synthetic import synthetic_em_slice, synthetic_em_stack
from glia_tpu.metrics import eval_ri, eval_vi
from glia_tpu.pipeline import evaluate, hmt_train
from glia_tpu.pipeline3d import hmt3d_segment, link3d_segment, link3d_train


@pytest.fixture(scope="module")
def stack():
    return synthetic_em_stack(shape=(4, 64, 64), n_cells=10, seed=17)


def test_hmt3d(stack):
    # train on 2D slices (same feature semantics), then segment a volume
    train_slices = [synthetic_em_slice((64, 64), n_cells=10, seed=s)
                    for s in (31, 32)]
    model = hmt_train(train_slices, n_trees=40, pre_merge_size=15,
                      watershed_level=0.04)
    pb_vol = np.stack([s["pb"] for s in stack["slices"]])
    int_vol = np.stack([s["intensity"] for s in stack["slices"]])
    seg, aux = hmt3d_segment(pb_vol, int_vol, model, watershed_level=0.04,
                             pre_merge_size=15)
    truth = stack["truth3d"]
    base = evaluate(aux["seg0"], truth)
    ours = evaluate(seg, truth)
    assert ours["vi"] < base["vi"]


def test_link3d_pipeline(stack):
    slices = stack["slices"]
    # perfect per-slice segs (truth) -> linking should reconstruct 3D truth
    segs = [s["truth"] for s in slices]
    model = link3d_train(slices, segs, n_trees=30)
    vol = link3d_segment(slices, segs, model, min_score=0.5)
    truth = stack["truth3d"]
    prec, rec, err = eval_ri([vol[z] for z in range(len(slices))],
                             [truth[z] for z in range(len(slices))])
    assert err < 0.1
