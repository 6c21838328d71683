"""Extra CLI commands: LINK3D chain, SSHMT train/pred, tools."""

import numpy as np
import pytest

from glia_tpu.data.synthetic import synthetic_em_stack
from glia_tpu.io.image import write_image
from glia_tpu.io.text import read_matrix, read_vector, write_matrix, write_vector


def run_cli(*args):
    from glia_tpu.cli.main import main

    main(list(args))


@pytest.fixture(scope="module")
def linkdir(tmp_path_factory):
    d = tmp_path_factory.mktemp("link")
    stack = synthetic_em_stack(shape=(2, 48, 48), n_cells=8, seed=2)
    for z in (0, 1):
        write_image(str(d / f"s{z}.png"),
                    stack["slices"][z]["truth"].astype(np.uint16))
        write_image(str(d / f"pb{z}.png"),
                    (stack["slices"][z]["pb"] * 255).astype(np.uint8))
    return d, stack


def test_cli_link3d_chain(linkdir):
    d, stack = linkdir
    dd = str(d)
    run_cli("gen_region_pairs", "--s0", f"{dd}/s0.png", "--s1",
            f"{dd}/s1.png", "--id0", "0", "--id1", "1",
            "-o", f"{dd}/pairs.txt")
    pairs = np.loadtxt(f"{dd}/pairs.txt", dtype=np.int64, ndmin=2)
    assert pairs.shape[1] == 4
    run_cli("sc_feat", "--s0", f"{dd}/s0.png", "--s1", f"{dd}/s1.png",
            "-p", f"{dd}/pb0.png", "--pairs", f"{dd}/pairs.txt",
            "--bins", "8", "-o", f"{dd}/scfeat.txt")
    feats = read_matrix(f"{dd}/scfeat.txt")
    assert feats.shape[0] == len(pairs)
    run_cli("sc_label", "--s0", f"{dd}/s0.png", "--s1", f"{dd}/s1.png",
            "--t0", f"{dd}/s0.png", "--t1", f"{dd}/s1.png",
            "--pairs", f"{dd}/pairs.txt", "-o", f"{dd}/sclab.txt")
    labels = read_vector(f"{dd}/sclab.txt", dtype=np.int64)
    scores = (labels == 1).astype(float)
    write_vector(f"{dd}/scores.txt", scores)
    run_cli("link_by_threshold", "--pairs", f"{dd}/pairs.txt",
            "--scores", f"{dd}/scores.txt", "--minScore", "0.5",
            "-o", f"{dd}/links.txt")
    run_cli("group_region_profiles", "-s", f"{dd}/s0.png", f"{dd}/s1.png",
            "--ids", "0", "1", "-l", f"{dd}/links.txt",
            "-o", f"{dd}/vol%d.png")
    from glia_tpu.io.image import read_label_image

    v0 = read_label_image(f"{dd}/vol0.png")
    v1 = read_label_image(f"{dd}/vol1.png")
    # same truth cell across slices gets one global label
    t0 = stack["slices"][0]["truth"]
    t1 = stack["slices"][1]["truth"]
    shared = set(np.unique(t0)) & set(np.unique(t1))
    for k in list(shared)[:5]:
        a = np.unique(v0[t0 == k])
        b = np.unique(v1[t1 == k])
        assert len(a) == 1 and a[0] == b[0]


def test_cli_sshmt(tmp_path):
    dd = str(tmp_path)
    rng = np.random.default_rng(0)
    n = 40
    X = rng.random((n - 1, 2))
    order = np.array([[i + 1, n + 10 + i, n + 11 + i]
                      for i in range(n - 1)])
    from glia_tpu.io.text import write_merge_order

    write_matrix(f"{dd}/feat.txt", X)
    write_merge_order(f"{dd}/order.txt", order)
    labels = np.where(X[:, 0] > 0.5, 1, -1)
    write_matrix(f"{dd}/supfeat.txt", X)
    write_vector(f"{dd}/suplab.txt", labels, fmt="%d")
    run_cli("train_sshmt", "--unsFeat", f"{dd}/feat.txt",
            "--unsOrder", f"{dd}/order.txt",
            "--supFeat", f"{dd}/supfeat.txt",
            "--supLabel", f"{dd}/suplab.txt",
            "--nSigmaUpdate", "2", "--innerSteps", "50",
            "-m", f"{dd}/w.txt")
    w = np.loadtxt(f"{dd}/w.txt")
    assert w.shape == (3,)  # 2 features + bias
    run_cli("pred_logsig", "-m", f"{dd}/w.txt", "-f", f"{dd}/feat.txt",
            "-o", f"{dd}/probs.txt")
    p = read_vector(f"{dd}/probs.txt")
    assert ((p >= 0) & (p <= 1)).all()


def test_cli_tools(tmp_path, capsys):
    dd = str(tmp_path)
    truth = np.zeros((16, 16), dtype=np.uint16)
    truth[:8] = 1
    truth[8:] = 2
    seg = truth.copy() * 3
    write_image(f"{dd}/seg.png", seg)
    write_image(f"{dd}/truth.png", truth)
    run_cli("eval_init_seg", "-s", f"{dd}/seg.png",
            "-t", f"{dd}/truth.png")
    out = capsys.readouterr().out.split()
    assert float(out[2]) == 0.0
    run_cli("seg_stats", "-s", f"{dd}/seg.png")
    out = capsys.readouterr().out.strip().split("\n")
    assert len(out) == 2
    write_matrix(f"{dd}/f.txt", np.array([[0.0, 4.0], [2.0, 8.0]]))
    run_cli("normalize_sample", "-i", f"{dd}/f.txt", "-o", f"{dd}/fn.txt",
            "--outputMinMax", f"{dd}/mm.txt")
    fn = read_matrix(f"{dd}/fn.txt")
    assert fn.min() >= -1.0 - 1e-9 and fn.max() <= 1.0 + 1e-9


def test_cli_image_tools(tmp_path, capsys):
    dd = str(tmp_path)
    rng = np.random.default_rng(0)
    img = (rng.random((16, 16)) * 255).astype(np.uint8)
    truth = np.zeros((16, 16), dtype=np.uint16)
    truth[:8] = 1
    truth[8:] = 2
    write_image(f"{dd}/img.png", img)
    write_image(f"{dd}/truth.png", truth)
    run_cli("maxpool_image", "-i", f"{dd}/img.png", "-o", f"{dd}/mp.png")
    run_cli("crop_image", "-i", f"{dd}/img.png", "--origin", "2", "2",
            "--size", "8", "8", "-o", f"{dd}/crop.png")
    run_cli("resample_image", "-i", f"{dd}/img.png", "--factor", "0.5",
            "-o", f"{dd}/rs.png")
    run_cli("acc_images", "-i", f"{dd}/img.png", f"{dd}/img.png",
            "--average", "-o", f"{dd}/acc.png")
    run_cli("match_seg_to_truth", "-s", f"{dd}/truth.png",
            "-t", f"{dd}/truth.png")
    out = capsys.readouterr().out
    assert "1: 1 [1]" in out
    run_cli("eval_ri_threshold", "-p", f"{dd}/img.png",
            "-r", f"{dd}/truth.png", "-n", "3")
    out = capsys.readouterr().out.strip().split("\n")
    assert len(out) == 3
    from glia_tpu.io.image import read_image

    assert read_image(f"{dd}/mp.png").shape == (8, 8)
    assert read_image(f"{dd}/crop.png").shape == (8, 8)


def test_cli_image_compression_roundtrip(tmp_path):
    """image_compression substitute: rewrite + 16-bit cast preserves
    every pixel value (main_image_compression.cxx capability)."""
    d = str(tmp_path)
    rng = np.random.default_rng(0)
    lab = rng.integers(0, 40000, (32, 32)).astype(np.uint16)
    write_image(f"{d}/in.png", lab)
    run_cli("image_compression", "-i", f"{d}/in.png", "--write16",
            "-o", f"{d}/out.png")
    from glia_tpu.io.image import read_image

    out = read_image(f"{d}/out.png")
    np.testing.assert_array_equal(out, lab)


def test_cli_label_image_stats_and_distribute(tmp_path, capsys):
    d = str(tmp_path)
    rng = np.random.default_rng(1)
    for i, n in enumerate((3, 8)):
        lab = np.zeros((24, 24), np.uint16)
        for k in range(n):
            lab[(3 * k) % 20:(3 * k) % 20 + 3, :4] = k + 1
        write_image(f"{d}/lab{i}.png", lab)
    run_cli("label_image_stats", "-i", f"{d}/lab0.png")
    out = capsys.readouterr().out
    assert "unique labels:" in out and "size hist:" in out
    run_cli("distribute_label_images", "-i", f"{d}/lab0.png",
            f"{d}/lab1.png", "-n", "3", "-t", "4",
            "-o", f"{d}/out%d.png")
    from glia_tpu.io.image import read_image

    outs = [read_image(f"{d}/out{i}.png") for i in range(3)]
    # fewer inputs than outputs: last (most regions) duplicated
    np.testing.assert_array_equal(outs[1], outs[2])


def test_cli_resample_rgb(tmp_path):
    d = str(tmp_path)
    rgb = np.zeros((16, 16, 3), np.uint8)
    rgb[..., 0] = np.arange(16, dtype=np.uint8)[None, :] * 10
    write_image(f"{d}/in.png", rgb)
    run_cli("resample_rgb_image", "-i", f"{d}/in.png", "-f", "2.0",
            "-o", f"{d}/out.png")
    from glia_tpu.io.image import read_image

    out = read_image(f"{d}/out.png")
    assert out.shape[:2] == (32, 32)
    assert out.shape[2] in (3, 4)
