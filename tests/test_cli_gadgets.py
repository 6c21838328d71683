"""The 8 round-5-registered gadget subcommands (VERDICT r4 missing #3):
overlay_image, gen_image_patches, unique_sample, distribute_samples,
select_hard_samples, match_truth_to_seg, labelscc_image, labelicc_image
-- one CLI test each, closing the L6 "one command per pipeline stage"
contract (SURVEY.md section 2.7)."""

import numpy as np
import pytest

from glia_tpu.io.image import read_image, read_label_image, write_image
from glia_tpu.io.text import read_matrix, read_vector, write_matrix, \
    write_vector


def run_cli(*args):
    from glia_tpu.cli.main import main

    main(list(args))


@pytest.fixture(scope="module")
def gdir(tmp_path_factory):
    d = tmp_path_factory.mktemp("gadget")
    rng = np.random.default_rng(3)
    labels = np.zeros((24, 24), np.uint16)
    labels[2:12, 2:12] = 1
    labels[2:12, 14:22] = 2
    labels[14:22, 2:22] = 3
    write_image(str(d / "labels.png"), labels)
    write_image(str(d / "img.png"),
                (rng.random((24, 24)) * 255).astype(np.uint8))
    return d, labels


def test_overlay_image(gdir):
    d, labels = gdir
    run_cli("overlay_image", "-l", f"{d}/labels.png", "-i", f"{d}/img.png",
            "-p", "0.5", "-o", f"{d}/overlay.png")
    out = read_image(f"{d}/overlay.png")
    assert out.shape == (24, 24, 3)
    # distinct labels get distinct mean colors
    m1 = out[labels == 1].mean(axis=0)
    m2 = out[labels == 2].mean(axis=0)
    assert np.abs(m1 - m2).max() > 1.0


def test_gen_image_patches(gdir):
    d, _ = gdir
    run_cli("gen_image_patches", "-i", f"{d}/img.png", "-r", "2",
            "-o", f"{d}/patches.txt")
    patches = read_matrix(f"{d}/patches.txt")
    assert patches.shape == ((24 - 4) ** 2, 25)
    img = read_image(f"{d}/img.png").astype(np.float64) / 255.0
    np.testing.assert_allclose(patches[0], img[:5, :5].ravel(), atol=1e-6)


def test_unique_sample(gdir):
    d, _ = gdir
    feats = np.array([[1.0, 2.0], [3.0, 4.0], [1.0, 2.0], [5.0, 6.0]])
    labels = np.array([1, -1, 1, -1])
    write_matrix(f"{d}/f.txt", feats)
    write_vector(f"{d}/l.txt", labels, fmt="%d")
    run_cli("unique_sample", "-f", f"{d}/f.txt", "-l", f"{d}/l.txt",
            "-u", f"{d}/uf.txt", "-o", f"{d}/ul.txt")
    uf = read_matrix(f"{d}/uf.txt")
    ul = read_vector(f"{d}/ul.txt", dtype=np.int64)
    assert uf.shape == (3, 2)
    assert len(ul) == 3


def test_distribute_samples(gdir):
    d, _ = gdir
    feats = np.array([[0.1, 0.1], [0.1, 9.0], [9.0, 9.0], [9.0, 0.2]])
    labels = np.array([1, -1, 1, -1])
    write_matrix(f"{d}/df.txt", feats)
    write_vector(f"{d}/dl.txt", labels, fmt="%d")
    outs = [f"{d}/g{k}f.txt" for k in range(3)]
    outl = [f"{d}/g{k}l.txt" for k in range(3)]
    run_cli("distribute_samples", "-f", f"{d}/df.txt", "-l", f"{d}/dl.txt",
            "--i0", "0", "--i1", "1", "-t", "1.0",
            "--outFeat", *outs, "--outLabel", *outl)
    sizes = [len(read_matrix(f)) for f in outs]
    # group 0: f[i1] < t; group 1: f[i0] < t; group 2: rest
    assert sizes == [2, 1, 1]
    assert sum(len(read_vector(f, dtype=np.int64)) for f in outl) == 4


def test_select_hard_samples(gdir):
    d, _ = gdir
    feats = np.arange(8, dtype=np.float64).reshape(4, 2)
    labels = np.array([1, 1, -1, -1])
    preds = np.array([0.9, 0.1, 0.2, 0.8])
    write_matrix(f"{d}/hf.txt", feats)
    write_vector(f"{d}/hl.txt", labels, fmt="%d")
    write_vector(f"{d}/hp.txt", preds)
    run_cli("select_hard_samples", "-f", f"{d}/hf.txt", "-l", f"{d}/hl.txt",
            "-p", f"{d}/hp.txt", "--outFeat", f"{d}/of.txt",
            "--outLabel", f"{d}/ol.txt")
    of = read_matrix(f"{d}/of.txt")
    ol = read_vector(f"{d}/ol.txt", dtype=np.int64)
    # kept: label 1 with pred > 0.5 (row 0), label -1 with pred < 0.5 (row 2)
    assert of.shape == (2, 2)
    assert list(ol) == [1, -1]


def test_match_truth_to_seg(gdir, capsys):
    d, labels = gdir
    run_cli("match_truth_to_seg", "-s", f"{d}/labels.png",
            "-t", f"{d}/labels.png")
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 3          # three foreground regions
    for line in out:
        s, rest = line.split(":")
        t = rest.split()[0]
        assert s.strip() == t.strip()       # identity matches itself
        assert "[1]" in line                # with Jaccard 1


def test_labelscc_image(gdir, tmp_path):
    d = tmp_path
    img = np.zeros((10, 10), np.uint16)
    img[:, 5:] = 7
    img[0, 0] = 6            # within diff=1 of the 0 side? no: |6-0|>1
    write_image(str(d / "scc.png"), img)
    run_cli("labelscc_image", "-i", f"{d}/scc.png", "-d", "0",
            "-o", f"{d}/scc_out.png")
    out = read_label_image(f"{d}/scc_out.png")
    # three exact-value components, every pixel labeled
    assert len(np.unique(out)) == 3
    assert out.min() >= 1
    assert len(np.unique(out[img == 7])) == 1
    run_cli("labelscc_image", "-i", f"{d}/scc.png", "-d", "1",
            "-o", f"{d}/scc_out1.png")
    out1 = read_label_image(f"{d}/scc_out1.png")
    # diff=1 joins the 6-pixel with... nothing adjacent within 1 -> still 3
    assert len(np.unique(out1)) == 3


def test_labelicc_image(gdir, tmp_path):
    d = tmp_path
    img = np.zeros((12, 12), np.uint16)
    img[1:4, 1:4] = 5
    img[8:11, 8:11] = 5      # same label, disconnected
    img[1:4, 8:11] = 9
    write_image(str(d / "icc.png"), img)
    run_cli("labelicc_image", "-i", f"{d}/icc.png",
            "-o", f"{d}/icc_out.png")
    out = read_label_image(f"{d}/icc_out.png")
    assert (out[img == 0] == 0).all()       # background stays background
    fg = np.unique(out[img > 0])
    assert len(fg) == 3                     # two 5-components split
    assert 0 not in fg
