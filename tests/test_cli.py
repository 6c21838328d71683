"""CLI end-to-end: the file-bus pipeline through the command interface."""

import os
import subprocess
import sys

import numpy as np
import pytest

from glia_tpu.data.synthetic import synthetic_em_slice
from glia_tpu.io.image import write_image
from glia_tpu.io.text import read_matrix, read_merge_order, read_vector


def run_cli(*args):
    from glia_tpu.cli.main import main

    main(list(args))


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    d = tmp_path_factory.mktemp("cli")
    data = synthetic_em_slice((64, 64), n_cells=10, seed=6)
    pb8 = (data["pb"] * 255).astype(np.uint8)
    write_image(str(d / "pb.png"), pb8)
    write_image(str(d / "truth.png"), data["truth"].astype(np.uint16))
    return d, data


def test_cli_full_pipeline(workdir):
    d, data = workdir
    dd = str(d)
    run_cli("watershed", "-i", f"{dd}/pb.png", "-l", "0.05",
            "-o", f"{dd}/ws.png")
    run_cli("pre_merge", "-s", f"{dd}/ws.png", "-p", f"{dd}/pb.png",
            "-t", "20", "-o", f"{dd}/seg0.png")
    run_cli("merge_order_pb", "-s", f"{dd}/seg0.png", "-p", f"{dd}/pb.png",
            "-o", f"{dd}/order.txt", "-y", f"{dd}/sal.txt")
    order = read_merge_order(f"{dd}/order.txt")
    assert len(order) > 5
    run_cli("bc_feat", "-s", f"{dd}/seg0.png", "-p", f"{dd}/pb.png",
            "-o", f"{dd}/order.txt", "-y", f"{dd}/sal.txt",
            "--bins", "8", "-b", f"{dd}/feat.txt")
    feats = read_matrix(f"{dd}/feat.txt")
    assert feats.shape[0] == len(order)
    run_cli("bc_label", "-s", f"{dd}/seg0.png", "-t", f"{dd}/truth.png",
            "-o", f"{dd}/order.txt", "-l", f"{dd}/labels.txt")
    labels = read_vector(f"{dd}/labels.txt", dtype=np.int64)
    assert set(np.unique(labels)).issubset({-1, 1})
    run_cli("train_rf", "-f", f"{dd}/feat.txt", "-l", f"{dd}/labels.txt",
            "--nTree", "31", "-m", f"{dd}/rf.npz")
    run_cli("pred_rf", "-m", f"{dd}/rf.npz", "-f", f"{dd}/feat.txt",
            "-o", f"{dd}/probs.txt")
    probs = read_vector(f"{dd}/probs.txt")
    assert ((probs >= 0) & (probs <= 1)).all()
    run_cli("segment_greedy", "-s", f"{dd}/seg0.png",
            "-o", f"{dd}/order.txt", "-p", f"{dd}/probs.txt",
            "-f", f"{dd}/final.png")
    assert os.path.exists(f"{dd}/final.png")


def test_cli_eval(workdir, capsys):
    d, data = workdir
    dd = str(d)
    run_cli("eval_vi", "-p", f"{dd}/truth.png", "-r", f"{dd}/truth.png")
    out = capsys.readouterr().out.split()
    assert [float(x) for x in out] == [0.0, 0.0, 0.0]
    run_cli("eval_ri", "-p", f"{dd}/truth.png", "-r", f"{dd}/truth.png")
    out = capsys.readouterr().out.split()
    assert float(out[2]) == 0.0


def test_cli_apply_and_relabel(workdir):
    d, data = workdir
    dd = str(d)
    run_cli("apply_merges", "-s", f"{dd}/seg0.png", "-o", f"{dd}/order.txt",
            "-n", "5", "-f", f"{dd}/merged5.png")
    from glia_tpu.io.image import read_label_image

    seg0 = read_label_image(f"{dd}/seg0.png")
    m5 = read_label_image(f"{dd}/merged5.png")
    assert len(np.unique(m5)) == len(np.unique(seg0)) - 5
    run_cli("relabel_image", "-i", f"{dd}/merged5.png",
            "-o", f"{dd}/relab.png")
    run_cli("labelcc_image", "-i", f"{dd}/merged5.png",
            "-o", f"{dd}/cc.png")


def test_cli_masked_eval(workdir):
    d, data = workdir
    dd = str(d)
    mask = np.ones(data["truth"].shape, dtype=np.uint8)
    mask[:, :8] = 0
    write_image(f"{dd}/mask.png", mask)
    run_cli("eval_ri", "-p", f"{dd}/truth.png", "-r", f"{dd}/truth.png",
            "-m", f"{dd}/mask.png")
    run_cli("merge_order_pb", "-s", f"{dd}/seg0.png", "-p", f"{dd}/pb.png",
            "-m", f"{dd}/mask.png", "-o", f"{dd}/order_m.txt")
    from glia_tpu.io.text import read_merge_order

    order = read_merge_order(f"{dd}/order_m.txt")
    assert len(order) > 0
