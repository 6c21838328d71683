"""Boundary-confidence map vs direct replay oracle."""

import numpy as np
import pytest

from glia_tpu.data.synthetic import synthetic_em_slice
from glia_tpu.graph.merge import greedy_merge_order
from glia_tpu.graph.rag import build_rag
from glia_tpu.graph.tree import build_tree, node_potentials
from glia_tpu.infer.confidence import boundary_confidence
from glia_tpu.native import watershed_native
from tests.test_features import oracle_regions


@pytest.fixture(scope="module")
def case():
    import scipy.ndimage as ndi

    data = synthetic_em_slice((40, 40), n_cells=6, seed=8)
    seg = watershed_native(ndi.gaussian_filter(data["pb"], 1.0), 0.02)
    rag = build_rag(seg, contour_only=False)
    order, sals = greedy_merge_order(rag, data["pb"], policy="median")
    tree = build_tree(order)
    probs = 1.0 - np.clip(-np.asarray(sals), 0, 1)
    pot = node_potentials(tree, probs)
    return seg, rag, order, tree, pot


def test_confidence_matches_oracle(case):
    seg, rag, order, tree, pot = case
    img = boundary_confidence(rag, tree, pot)
    # oracle: replay regions in creation order; every node's surviving
    # boundary entries take the max of the node potentials seen
    regions = oracle_regions(seg, order[:0])
    created = {}
    for i in range(tree.n_nodes):
        key = int(tree.keys[i])
        if tree.left[i] < 0:
            created[key] = regions[key]
    vals = {}

    def add_node(node_idx, reg):
        v = pot[node_idx]
        for (a, b) in reg.boundary:
            k = (min(a, b), max(a, b))
            if k not in vals or vals[k] < v:
                vals[k] = v

    for i in range(tree.n_nodes):
        key = int(tree.keys[i])
        if tree.left[i] < 0:
            add_node(i, created[key])
        else:
            r0 = int(tree.keys[tree.left[i]])
            r1 = int(tree.keys[tree.right[i]])
            from tests.test_features import OracleRegion

            reg = OracleRegion()
            reg.merge(created[r0])
            reg.merge(created[r1])
            created[key] = reg
            add_node(i, reg)
    want = np.zeros(seg.size, dtype=np.float64)
    # paint: iterate ALL base pairs' pixels from the leaf regions
    base = oracle_regions(seg, order[:0])
    for key, reg in base.items():
        for (a, b), pix in reg.boundary.items():
            k = (min(a, b), max(a, b))
            if k in vals:
                for p in pix:
                    want[p] = vals[k]
    np.testing.assert_allclose(img.ravel(), want, rtol=1e-6)
