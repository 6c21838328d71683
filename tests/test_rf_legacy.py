"""Legacy RF binary model interchange vs the reference's own IO code.

tools/ref_golden/rf_io_golden.cc links the reference's actual
readModelFromBinaryFile/writeModelToBinaryFile (ml_rf_model.cxx); these
tests prove:
  1. a model written by the REFERENCE writer loads here (read path),
  2. a model written HERE loads in the reference reader with identical
     arrays (write path),
  3. a sklearn-trained ForestModel survives the legacy round trip with
     identical vote fractions (inference parity through the format).
"""

import subprocess
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent
SRC = REPO / "tools" / "ref_golden" / "rf_io_golden.cc"
REF_IO = Path("/root/reference/code/ml/rf/ml_rf_model.cxx")
BIN = REPO / ".build" / "rf_io_golden"


@pytest.fixture(scope="session")
def rf_tool(tmp_path_factory):
    if not REF_IO.exists():
        pytest.skip("reference tree not available")
    if not BIN.exists() or BIN.stat().st_mtime < SRC.stat().st_mtime:
        BIN.parent.mkdir(exist_ok=True)
        subprocess.run(
            ["g++", "-std=c++14", "-O2", f"-I{REF_IO.parents[2]}",
             str(SRC), str(REF_IO), "-o", str(BIN)],
            check=True, capture_output=True, text=True)
    return BIN


def ref_dump(rf_tool, path):
    out = subprocess.run([str(rf_tool), "dump", str(path)],
                         capture_output=True, text=True, check=True,
                         timeout=60)
    fields = {}
    for line in out.stdout.splitlines():
        toks = line.split()
        if len(toks) == 2 and toks[0] in ("nrnodes", "ntree", "mtry",
                                          "nclass"):
            fields[toks[0]] = int(toks[1])
        else:
            name, d0, d1 = toks[0], int(toks[1]), int(toks[2])
            fields[name] = np.array([float(t) for t in toks[3:]])
            assert len(fields[name]) == d0 * d1
            fields[name + "_dims"] = (d0, d1)
    return fields


def test_read_reference_written_model(rf_tool, tmp_path):
    from glia_tpu.models.rf_legacy import legacy_to_forest, read_legacy_model

    path = tmp_path / "ref.bin"
    subprocess.run([str(rf_tool), "make", str(path)], check=True,
                   capture_output=True, timeout=60)
    raw = read_legacy_model(path)
    ref = ref_dump(rf_tool, path)
    assert raw["nrnodes"] == ref["nrnodes"]
    assert raw["ntree"] == ref["ntree"]
    assert raw["mtry"] == ref["mtry"]
    assert raw["nclass"] == ref["nclass"]
    for k in ("treemap", "nodestatus", "nodeclass", "bestvar",
              "xbestsplit", "ndbigtree", "orig_labels", "new_labels",
              "classwt", "cutoff", "errtr"):
        np.testing.assert_array_equal(
            raw[k].astype(np.float64), ref[k], err_msg=k)
    model = legacy_to_forest(raw)
    assert model.n_trees == 3
    assert model.max_depth == 4
    np.testing.assert_array_equal(model.classes, [-1, 1])


def test_write_reference_readable_model(rf_tool, tmp_path):
    from glia_tpu.models.forest import train_forest
    from glia_tpu.models.rf_legacy import forest_to_legacy, write_legacy_model

    rng = np.random.default_rng(0)
    X = rng.random((300, 7))
    y = (X[:, 0] + 0.5 * X[:, 3] > 0.7).astype(int)
    y = np.where(y > 0, 1, -1)
    model = train_forest(X, y, n_trees=11, seed=3)
    raw = forest_to_legacy(model)
    path = tmp_path / "ours.bin"
    write_legacy_model(path, raw)
    ref = ref_dump(rf_tool, path)  # read back with the REFERENCE reader
    assert ref["nrnodes"] == raw["nrnodes"]
    assert ref["ntree"] == 11
    assert ref["nclass"] == 2
    for k in ("treemap", "nodestatus", "nodeclass", "bestvar",
              "xbestsplit", "ndbigtree", "orig_labels", "new_labels"):
        np.testing.assert_array_equal(
            np.asarray(raw[k], dtype=np.float64), ref[k], err_msg=k)


def test_inference_parity_through_format(rf_tool, tmp_path):
    """Vote fractions identical before/after the legacy round trip, and
    classForest descent on the reference-written synthetic model matches
    the dumped arrays evaluated by our evaluator."""
    from glia_tpu.models.forest import (predict_label_fraction, train_forest)
    from glia_tpu.models.rf_legacy import (load_legacy_forest,
                                           save_legacy_forest)

    rng = np.random.default_rng(1)
    X = rng.random((250, 6))
    y = np.where(X[:, 1] > X[:, 2], 1, -1)
    model = train_forest(X, y, n_trees=15, seed=7)
    path = tmp_path / "rt.bin"
    save_legacy_forest(path, model)
    model2 = load_legacy_forest(path)
    Xt = rng.random((40, 6))
    p1 = predict_label_fraction(model, Xt, label=1)
    p2 = predict_label_fraction(model2, Xt, label=1)
    np.testing.assert_array_equal(p1, p2)
    # also via the jax evaluator
    p3 = predict_label_fraction(model2, Xt, label=1, backend="jax")
    np.testing.assert_allclose(p3, p1, atol=1e-6)


def test_reject_categorical_models(tmp_path):
    """Files with categorical uniques are not self-consistent (reference
    reader reads into writer heap pointers); we refuse them loudly."""
    from glia_tpu.models.rf_legacy import read_legacy_model

    blob = bytearray(520)
    import struct

    # fake a non-empty orig_uniques vector header (begin=0, end=8)
    struct.pack_into("<qq", blob, 0, 0, 8)
    path = tmp_path / "cat.bin"
    path.write_bytes(bytes(blob))
    with pytest.raises(ValueError, match="categorical"):
        read_legacy_model(path)
