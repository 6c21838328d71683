"""Hierarchical feature extraction vs a direct reference-semantics oracle.

The oracle transcribes the reference's TRegion data structures literally
(pixel sets, base-directed-pair boundary maps with mutual cancellation on
merge, code/type/region.hxx:68-77) and recomputes every node's stats from
scratch; the incremental extractor must match exactly.
"""

import numpy as np
import pytest

from glia_tpu.data.synthetic import synthetic_em_slice
from glia_tpu.features.config import FeatureConfig, HistImage
from glia_tpu.features.hierarchical import TreeFeatures, _hist_bin_index
from glia_tpu.graph.merge import greedy_merge_order
from glia_tpu.graph.rag import build_rag
from glia_tpu.native import watershed_native
from glia_tpu.ops.neighbors import contour_traits


class OracleRegion:
    def __init__(self):
        self.pixels = []
        self.border = []
        self.boundary = {}  # (a,b) base pair -> pixel list

    def merge(self, other):
        self.pixels += other.pixels
        self.border += other.border
        for key, pix in other.boundary.items():
            rev = (key[1], key[0])
            if rev in self.boundary:
                del self.boundary[rev]
            else:
                self.boundary[key] = pix


def oracle_regions(labels, order):
    flat = labels.ravel()
    other, is_b, is_brd = contour_traits(labels)
    other = other.ravel()
    is_b = is_b.ravel()
    is_brd = is_brd.ravel()
    regions = {}
    for p in range(flat.size):
        k = int(flat[p])
        r = regions.setdefault(k, OracleRegion())
        r.pixels.append(p)
        if is_b[p]:
            r.boundary.setdefault((k, int(other[p])), []).append(p)
        elif is_brd[p]:
            r.border.append(p)
    for r0, r1, r2 in order:
        reg = OracleRegion()
        reg.merge(regions[int(r0)])
        reg.merge(regions[int(r1)])
        regions[int(r2)] = reg
    return regions


@pytest.fixture(scope="module")
def case():
    data = synthetic_em_slice(shape=(40, 40), n_cells=8, seed=3)
    seg = watershed_native(data["pb"], level=0.15)
    rag = build_rag(seg, contour_only=False)
    order, sals = greedy_merge_order(rag, data["pb"], policy="median")
    cfg = FeatureConfig.standard(data["pb"], data["intensity"], n_bins=8)
    tf = TreeFeatures(rag, order, cfg, saliencies=sals)
    oracle = oracle_regions(seg, order)
    return data, seg, rag, order, cfg, tf, oracle


def test_node_areas(case):
    data, seg, rag, order, cfg, tf, oracle = case
    for i, key in enumerate(tf.node_keys):
        assert tf.stats.area[i] == len(oracle[int(key)].pixels), key


def test_node_boundary_counts(case):
    data, seg, rag, order, cfg, tf, oracle = case
    for i, key in enumerate(tf.node_keys):
        want = sum(len(v) for v in oracle[int(key)].boundary.values())
        assert tf.stats.bd[i] == want, f"node {key}"


def test_node_border_counts(case):
    data, seg, rag, order, cfg, tf, oracle = case
    for i, key in enumerate(tf.node_keys):
        assert tf.stats.border[i] == len(oracle[int(key)].border), key


def test_region_intensity_stats(case):
    data, seg, rag, order, cfg, tf, oracle = case
    img = data["pb"].astype(np.float64).ravel()
    st = tf.stats.r_stats[0]  # pb is r_images[0]
    for i, key in enumerate(tf.node_keys):
        vals = img[np.array(oracle[int(key)].pixels)]
        assert st["cnt"][i] == len(vals)
        np.testing.assert_allclose(st["sum"][i], vals.sum(), rtol=1e-9)
        assert st["min"][i] == vals.min()
        assert st["max"][i] == vals.max()


def test_boundary_minmax_stats(case):
    data, seg, rag, order, cfg, tf, oracle = case
    img = data["pb"].astype(np.float64).ravel()
    st = tf.stats.b_stats[0]
    for i, key in enumerate(tf.node_keys):
        bpix = [p for v in oracle[int(key)].boundary.values() for p in v]
        if not bpix:
            continue
        vals = img[np.array(bpix)]
        assert st["cnt"][i] == len(vals), f"node {key}"
        np.testing.assert_allclose(st["sum"][i], vals.sum(), rtol=1e-9)
        np.testing.assert_allclose(st["min"][i], vals.min(), rtol=0)
        np.testing.assert_allclose(st["max"][i], vals.max(), rtol=0)


def test_merge_pair_boundary_counts(case):
    data, seg, rag, order, cfg, tf, oracle = case
    cnt, vp, bst = tf._merge_boundary_stats()
    # replay merges: before each merge, compute getBoundary(r0, r1) on oracle
    regions = oracle_regions(seg, order[:0])  # leaves only
    for mi, (r0, r1, r2) in enumerate(order):
        r0, r1, r2 = int(r0), int(r1), int(r2)
        reg0, reg1 = regions[r0], regions[r1]
        first1 = {k[0] for k in reg1.boundary}
        first0 = {k[0] for k in reg0.boundary}
        want = 0
        for (a, b), pix in reg0.boundary.items():
            if b in first1:
                want += len(pix)
        for (a, b), pix in reg1.boundary.items():
            if b in first0:
                want += len(pix)
        assert cnt[mi] == want, f"merge {mi}"
        reg = OracleRegion()
        reg.merge(reg0)
        reg.merge(reg1)
        regions[r2] = reg


def test_feature_matrix_shapes(case):
    data, seg, rag, order, cfg, tf, oracle = case
    rf = tf.region_features()
    assert rf.shape == (tf.M, cfg.region_feat_dim(ndim=2))
    bf = tf.boundary_features()
    assert bf.shape == (len(order), cfg.boundary_feat_dim())
    bc = tf.bc_features()
    assert bc.shape[1] == bf.shape[1] + 3 * rf.shape[1]
    sf = tf.simple_features()
    assert sf.shape == (len(order),
                        5 + len(cfg.b_images) + 4 * len(cfg.r_images)
                        + 2 * len(cfg.rl_images))
    assert np.isfinite(rf).all()
    assert np.isfinite(bf).all()
    assert np.isfinite(sf).all()


def test_area_ordering_in_bc(case):
    data, seg, rag, order, cfg, tf, oracle = case
    tf.boundary_features()
    a0 = tf.stats.area[tf._bc_n0]
    a1 = tf.stats.area[tf._bc_n1]
    assert (a0 <= a1).all()


def test_hist_bin_quirk():
    # reference bounds ignore range.first (image_stats.hxx:19-22)
    idx = _hist_bin_index(np.array([0.05, 0.15, 0.95, -1.0, 2.0]), 10, (0.0, 1.0))
    assert idx.tolist() == [0, 1, 9, 0, 9]
    # with lo>0, values in (lo,hi) above bin coverage are dropped (-1)
    idx2 = _hist_bin_index(np.array([0.6]), 2, (0.5, 0.7))
    # interval=0.1, bounds=[0.1,0.2]; 0.6 in (0.5,0.7) but >= 0.2 -> dropped
    assert idx2.tolist() == [-1]


def test_median_features_exact(case):
    """median_as_feats mode: medians must equal direct per-node computation."""
    data, seg, rag, order, cfg0, tf0, oracle = case
    from glia_tpu.features.config import FeatureConfig

    cfg = FeatureConfig.standard(data["pb"], data["intensity"], n_bins=8)
    cfg.median_as_feats = True
    tf = TreeFeatures(rag, order, cfg)
    img = data["pb"].astype(np.float64).ravel()
    for i, key in enumerate(tf.node_keys):
        pix = np.array(oracle[int(key)].pixels)
        vals = img[pix]
        want = np.partition(vals, len(vals) // 2)[len(vals) // 2]
        assert tf._r_median[0][i] == want, f"region median node {key}"
        bpix = [p for v in oracle[int(key)].boundary.values() for p in v]
        if bpix:
            bv = img[np.array(bpix)]
            wantb = np.partition(bv, len(bv) // 2)[len(bv) // 2]
            assert tf._b_median[0][i] == wantb, f"boundary median {key}"
    # shapes with median enabled
    rf = tf.region_features()
    assert rf.shape[1] == cfg.region_feat_dim(ndim=2, with_saliency=False)
    bfm = tf.boundary_features()
    assert bfm.shape[1] == cfg.boundary_feat_dim(with_saliency=False)
    sf = tf.simple_features()
    assert sf.shape[1] == (5 + 2 * len(cfg.b_images) + 4 * len(cfg.r_images)
                           + 2 * len(cfg.rl_images))
    assert np.isfinite(rf).all() and np.isfinite(bfm).all()
