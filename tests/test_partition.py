"""RAG partition planning tests."""

import numpy as np
import pytest

from glia_tpu.data.synthetic import synthetic_em_slice
from glia_tpu.graph.rag import build_rag
from glia_tpu.native import watershed_native
from glia_tpu.parallel.partition import partition_rag


@pytest.fixture(scope="module")
def rag():
    import scipy.ndimage as ndi

    data = synthetic_em_slice((128, 128), n_cells=40, seed=10)
    seg = watershed_native(ndi.gaussian_filter(data["pb"], 1.0), 0.005)
    return build_rag(seg, contour_only=False)


@pytest.mark.parametrize("n_shards", [2, 4, 8])
def test_partition_properties(rag, n_shards):
    part = partition_rag(rag, n_shards)
    # every region and edge assigned
    assert part.region_shard.min() >= 0
    assert part.region_shard.max() == n_shards - 1
    counts = np.bincount(part.region_shard, minlength=n_shards)
    assert counts.min() > 0
    # spatial partition keeps the cut small (vs random ~ 1 - 1/n)
    random_cut = 1.0 - 1.0 / n_shards
    assert part.cut_fraction < 0.75 * random_cut
    # edge balance within 2x of perfect
    assert part.balance() < 2.0
    # halo regions are exactly the cut-edge remote endpoints
    for s, halo in enumerate(part.halo_regions):
        assert (part.region_shard[halo] != s).all()


def test_cut_consistency(rag):
    part = partition_rag(rag, 4)
    key_index = {int(k): i for i, k in enumerate(rag.keys)}
    ui = np.array([key_index[int(a)] for a in rag.edges[:, 0]])
    vi = np.array([key_index[int(b)] for b in rag.edges[:, 1]])
    want_cut = part.region_shard[ui] != part.region_shard[vi]
    np.testing.assert_array_equal(part.cut_mask, want_cut)
