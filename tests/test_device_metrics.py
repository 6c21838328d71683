"""Device metrics + samplers + packing tests."""

import numpy as np
import pytest

from glia_tpu.learn.samplers import ClassBatchSampler, UniformBatchSampler
from glia_tpu.metrics import centropy, eval_ri
from glia_tpu.metrics.device import (
    adapted_rand_device,
    contingency_device,
    densify_labels,
    vi_device,
)
from glia_tpu.ops.pack import pack_csr_values


def test_device_vi_matches_host(rng):
    seg = rng.integers(1, 6, (20, 20)).astype(np.int32)
    truth = rng.integers(0, 5, (20, 20)).astype(np.int32)
    sid, S = densify_labels(seg)
    tid, T = densify_labels(truth, exclude=(0,))
    fs, fm, tot = (float(x) for x in vi_device(sid, tid, S, T))
    want_fs = centropy(truth, seg, excluded0=(0,), itk_quirk=False)
    want_fm = centropy(seg, truth, excluded1=(0,), itk_quirk=False)
    assert fs == pytest.approx(want_fs, rel=1e-9)
    assert fm == pytest.approx(want_fm, rel=1e-9)


def test_device_rand_matches_host(rng):
    seg = rng.integers(1, 6, (16, 16)).astype(np.int32)
    truth = rng.integers(0, 5, (16, 16)).astype(np.int32)
    sid, S = densify_labels(seg)
    tid, T = densify_labels(truth, exclude=(0,))
    prec, rec, err = (float(x) for x in
                      adapted_rand_device(sid, tid, S, T))
    wp, wr, we = eval_ri(seg, truth)
    assert prec == pytest.approx(wp, rel=1e-9)
    assert rec == pytest.approx(wr, rel=1e-9)
    assert err == pytest.approx(we, rel=1e-9)


def test_contingency_device(rng):
    seg = np.array([0, 0, 1, 1, -1])
    truth = np.array([0, 1, 1, 1, 0])
    c = np.asarray(contingency_device(seg, truth, 2, 2))
    np.testing.assert_allclose(c, [[1, 1], [0, 2]])


def test_uniform_sampler_covers_epoch():
    s = UniformBatchSampler(10, 3, seed=1)
    seen = set()
    for _ in range(4):
        b = s.next_batch()
        assert len(b) == 3
        seen.update(b.tolist())
    assert len(seen) >= 9  # one epoch covered (last partial reshuffles)


def test_class_sampler_balanced():
    labels = np.array([1] * 90 + [-1] * 10)
    s = ClassBatchSampler(labels, batch_size=10, seed=0)
    b = s.next_batch()
    vals, counts = np.unique(labels[b], return_counts=True)
    assert set(vals) == {-1, 1}
    assert counts.min() == counts.max()  # equal share per class


def test_pack_csr():
    vals = np.arange(10.0)
    ptr = np.array([0, 3, 3, 10])
    v, m = pack_csr_values(vals, ptr, 4)
    assert v.shape == (3, 4)
    np.testing.assert_allclose(v[0], [0, 1, 2, 0])
    np.testing.assert_allclose(m[0], [1, 1, 1, 0])
    np.testing.assert_allclose(m[1], [0, 0, 0, 0])
    np.testing.assert_allclose(v[2], [3, 4, 5, 6])  # truncated to 4


def test_sparse_pair_vi_matches_eval_vi_printer(rng):
    """vi_from_pairs_device must equal the eval_vi PRINTER exactly --
    including the itk uint-division quirk -- from the same sparse exact
    pair counts (VERDICT r5 item #5: SNEMI eval path)."""
    from glia_tpu.metrics import contingency_table, eval_vi
    from glia_tpu.metrics.device import vi_from_pairs_device

    seg = rng.integers(1, 9, (24, 24)).astype(np.int32)
    truth = rng.integers(0, 6, (24, 24)).astype(np.int32)
    # one table with truth-BG dropped serves both directions
    l0, l1, c = contingency_table(seg, truth, exclude_truth=(0,))
    sid, S = densify_labels(l0)
    tid, T = densify_labels(l1)
    fs, fm, tot = (float(x) for x in
                   vi_from_pairs_device(sid, tid, c, S, T,
                                        itk_quirk=True))
    want_fs, want_fm, want_tot = eval_vi(seg, truth)
    assert fs == pytest.approx(want_fs, rel=1e-12, abs=1e-12)
    assert fm == pytest.approx(want_fm, rel=1e-12, abs=1e-12)
    assert tot == pytest.approx(want_tot, rel=1e-12, abs=1e-12)


def test_sparse_pair_rand_matches_eval_ri(rng):
    from glia_tpu.metrics import contingency_table
    from glia_tpu.metrics.device import adapted_rand_from_pairs_device

    seg = rng.integers(1, 9, (24, 24)).astype(np.int32)
    truth = rng.integers(0, 6, (24, 24)).astype(np.int32)
    l0, l1, c = contingency_table(seg, truth, exclude_truth=(0,))
    sid, S = densify_labels(l0)
    tid, T = densify_labels(l1)
    prec, rec, err = (float(x) for x in
                      adapted_rand_from_pairs_device(sid, tid, c, S, T))
    wp, wr, we = eval_ri(seg, truth)
    assert prec == pytest.approx(wp, rel=1e-12)
    assert rec == pytest.approx(wr, rel=1e-12)
    assert err == pytest.approx(we, rel=1e-12)
