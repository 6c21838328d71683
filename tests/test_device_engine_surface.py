"""User-surface plumbing for the device engines (VERDICT r2 item #9):
the CLI --engine device flag and pipeline.hmt_segment(engine="device")
must reach the batched TPU merge paths without importing internals."""

import numpy as np
import pytest

from glia_tpu.data.synthetic import synthetic_em_slice
from glia_tpu.io.image import write_image
from glia_tpu.io.text import read_merge_order, read_vector


def run_cli(*args):
    from glia_tpu.cli.main import main

    main(list(args))


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    d = tmp_path_factory.mktemp("dev_engine")
    data = synthetic_em_slice((64, 64), n_cells=10, seed=6)
    write_image(str(d / "pb.png"), (data["pb"] * 255).astype(np.uint8))
    write_image(str(d / "truth.png"), data["truth"].astype(np.uint16))
    run_cli("watershed", "-i", f"{d}/pb.png", "-l", "0.05",
            "-o", f"{d}/ws.png")
    run_cli("pre_merge", "-s", f"{d}/ws.png", "-p", f"{d}/pb.png",
            "-t", "20", "-o", f"{d}/seg0.png")
    return d, data


@pytest.mark.parametrize("policy", ["mean", "median"])
def test_cli_merge_order_pb_device(workdir, policy):
    d, data = workdir
    dd = str(d)
    run_cli("merge_order_pb", "-s", f"{dd}/seg0.png", "-p", f"{dd}/pb.png",
            "-t", policy, "--engine", "device",
            "-o", f"{dd}/order_dev_{policy}.txt",
            "-y", f"{dd}/sal_dev_{policy}.txt")
    order = read_merge_order(f"{dd}/order_dev_{policy}.txt")
    sals = read_vector(f"{dd}/sal_dev_{policy}.txt")
    # complete hierarchy: same merge count as the host serial engine
    # (R - #RAG-components merges; the RAG may be disconnected)
    run_cli("merge_order_pb", "-s", f"{dd}/seg0.png", "-p", f"{dd}/pb.png",
            "-t", policy, "-o", f"{dd}/order_host_{policy}.txt")
    order_h = read_merge_order(f"{dd}/order_host_{policy}.txt")
    assert len(order) == len(order_h)
    assert len(sals) == len(order)
    from glia_tpu.graph.tree import build_tree

    tree = build_tree(order)
    assert tree.n_leaves >= len(order) + 1


def test_cli_merge_order_bc_device(workdir):
    d, data = workdir
    dd = str(d)
    # train a small forest through the CLI file bus
    run_cli("merge_order_pb", "-s", f"{dd}/seg0.png", "-p", f"{dd}/pb.png",
            "-o", f"{dd}/order.txt", "-y", f"{dd}/sal.txt")
    run_cli("bc_feat", "-s", f"{dd}/seg0.png", "-p", f"{dd}/pb.png",
            "-o", f"{dd}/order.txt", "--bins", "8", "-b", f"{dd}/feat.txt")
    run_cli("bc_label", "-s", f"{dd}/seg0.png", "-t", f"{dd}/truth.png",
            "-o", f"{dd}/order.txt", "-l", f"{dd}/labels.txt")
    run_cli("train_rf", "-f", f"{dd}/feat.txt", "-l", f"{dd}/labels.txt",
            "--nTree", "15", "-m", f"{dd}/rf.npz")
    run_cli("merge_order_bc", "-s", f"{dd}/seg0.png", "-p", f"{dd}/pb.png",
            "-m", f"{dd}/rf.npz", "--bins", "8", "--engine", "device",
            "-o", f"{dd}/order_bc_dev.txt", "-y", f"{dd}/probs_dev.txt")
    order = read_merge_order(f"{dd}/order_bc_dev.txt")
    probs = read_vector(f"{dd}/probs_dev.txt")
    order_h = read_merge_order(f"{dd}/order.txt")
    assert len(order) == len(order_h)
    assert ((probs >= 0) & (probs <= 1)).all()


def test_pipeline_hmt_segment_device_rf():
    from glia_tpu.metrics import eval_vi
    from glia_tpu.pipeline import hmt_segment, hmt_train

    tr = synthetic_em_slice((64, 64), n_cells=10, seed=3)
    te = synthetic_em_slice((64, 64), n_cells=10, seed=4)
    model = hmt_train([tr], n_trees=15, n_bins=8, watershed_level=0.05)
    # engine="device_bc": classifier-in-the-loop on device (a different
    # hierarchy than the pb-policy engines -- struct_merge_bc semantics)
    seg_d, info_d = hmt_segment(te["pb"], te["intensity"], model,
                                engine="device_bc")
    # engine="device": SAME algorithm as host (pb-policy order + batched
    # scoring), merge loop on the accelerator
    seg_p, info_p = hmt_segment(te["pb"], te["intensity"], model,
                                engine="device")
    seg_h, info_h = hmt_segment(te["pb"], te["intensity"], model,
                                engine="host")
    assert seg_d.shape == te["pb"].shape
    # device classifier-in-the-loop produces a full hierarchy + sane VI
    assert len(info_d["order"]) == len(info_h["order"])
    assert len(info_p["order"]) == len(info_h["order"])
    _, _, vi_d = eval_vi(seg_d, te["truth"])
    _, _, vi_p = eval_vi(seg_p, te["truth"])
    _, _, vi_h = eval_vi(seg_h, te["truth"])
    assert vi_d < 3.0 and vi_p < 3.0 and vi_h < 3.0


def test_pipeline_hmt_segment_device_bc_rejects_simple_features():
    from glia_tpu.pipeline import hmt_segment, hmt_train

    tr = synthetic_em_slice((64, 64), n_cells=10, seed=3)
    te = synthetic_em_slice((64, 64), n_cells=10, seed=4)
    model = hmt_train([tr], n_trees=15, n_bins=8, watershed_level=0.05)
    model.feature_set = "simple"
    with pytest.raises(ValueError, match="feature_set"):
        hmt_segment(te["pb"], te["intensity"], model, engine="device_bc")


def test_pipeline_hmt_segment_device_policies():
    # round 5: all THREE reference policies run on the device engine
    # (median_minsize via the additive vertex-size payload); an unknown
    # policy still raises loudly
    from glia_tpu.pipeline import hmt_segment, hmt_train

    tr = synthetic_em_slice((64, 64), n_cells=10, seed=3)
    te = synthetic_em_slice((64, 64), n_cells=10, seed=4)
    model = hmt_train([tr], n_trees=15, n_bins=8, watershed_level=0.05)
    model.policy = "median_minsize"
    seg_d, info = hmt_segment(te["pb"], te["intensity"], model,
                              engine="device")
    assert seg_d.shape == te["pb"].shape
    assert len(np.unique(seg_d)) > 1
    model.policy = "geometric_mean"
    with pytest.raises(ValueError, match="geometric_mean"):
        hmt_segment(te["pb"], te["intensity"], model, engine="device")


def test_pipeline_hmt_segment_device_mlp():
    # non-forest models route through the device pb-policy merge engine
    from glia_tpu.pipeline import hmt_segment, hmt_train

    tr = synthetic_em_slice((64, 64), n_cells=10, seed=3)
    te = synthetic_em_slice((64, 64), n_cells=10, seed=4)
    model = hmt_train([tr], classifier="mlp", n_bins=8,
                      watershed_level=0.05)
    seg_d, info = hmt_segment(te["pb"], te["intensity"], model,
                              engine="device")
    seg_h, info_h = hmt_segment(te["pb"], te["intensity"], model,
                                engine="host")
    assert seg_d.shape == te["pb"].shape
    assert len(info["order"]) == len(info_h["order"])
