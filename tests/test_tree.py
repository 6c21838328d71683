"""Merge-tree construction, potentials, paths, and inference tests."""

import numpy as np
import pytest

from glia_tpu.graph.tree import (
    build_tree,
    collect_sub_keys,
    gen_merge_paths,
    node_potentials,
)
from glia_tpu.infer.ccm import (
    compute_energy_tuples,
    node_energies,
    resolve_factor_tree,
    segment_ccm_picks,
)
from glia_tpu.infer.greedy import resolve_tree_greedy, resolve_trees_greedy
from glia_tpu.infer.segment import final_segmentation, transform_image


# order: 4 leaves 1,2,3,4 -> (1,2)->5, (3,4)->6, (5,6)->7
ORDER = np.array([[1, 2, 5], [3, 4, 6], [5, 6, 7]])


def test_build_tree_structure():
    t = build_tree(ORDER)
    assert t.n_nodes == 7
    assert t.n_leaves == 4
    # creation order: leaves 1,2 then node 5, leaves 3,4 then node 6, then 7
    assert t.keys.tolist() == [1, 2, 5, 3, 4, 6, 7]
    assert t.root == 6  # index of key 7
    assert t.parent[t.root] == -1
    assert t.keys[t.left[t.root]] == 5
    assert t.keys[t.right[t.root]] == 6
    assert t.ancestors(0) == [2, 6]
    assert set(t.leaves_under(2)) == {0, 1}
    assert set(t.descendants(6)) == {0, 1, 2, 3, 4, 5}


def test_node_potentials():
    t = build_tree(ORDER)
    p = [0.8, 0.6, 0.3]  # merge probs for nodes 5, 6, 7
    pot = node_potentials(t, p)
    # internal node keyed 5 (index 2): 0.8 then * (1-0.3) from parent
    assert pot[2] == pytest.approx(0.8 * 0.7)
    # leaf 1 (index 0): (1-0.8)^2
    assert pot[0] == pytest.approx(0.04)
    # root: 0.3 then squared (tree_build.hxx:61)
    assert pot[6] == pytest.approx(0.09)


def test_resolve_greedy_picks_partition():
    t = build_tree(ORDER)
    pot = node_potentials(t, [0.9, 0.2, 0.5])
    picks = resolve_tree_greedy(t, pot)
    # picks must cover each leaf exactly once
    covered = []
    for p in picks:
        covered += t.leaves_under(p)
    assert sorted(covered) == [0, 1, 3, 4]


def test_resolve_greedy_max_first():
    t = build_tree(ORDER)
    pot = np.array([0.1, 0.1, 0.95, 0.1, 0.1, 0.9, 0.2])
    picks = resolve_tree_greedy(t, pot)
    assert picks[0] == 2  # highest potential first
    assert picks[1] == 5


def test_ccm_all_merge():
    t = build_tree(ORDER)
    picks = segment_ccm_picks(t, [0.99, 0.99, 0.99])
    assert picks == [t.root]


def test_ccm_all_split():
    t = build_tree(ORDER)
    picks = segment_ccm_picks(t, [0.01, 0.01, 0.01])
    assert sorted(picks) == [0, 1, 3, 4]  # all leaves


def test_ccm_mixed():
    t = build_tree(ORDER)
    # strong merge of (1,2), strong split elsewhere
    picks = segment_ccm_picks(t, [0.95, 0.05, 0.05])
    assert 2 in picks  # node keyed 5
    assert 3 in picks and 4 in picks  # leaves 3,4


def test_gen_merge_paths_root_paths():
    paths = gen_merge_paths(ORDER)
    # merges 0 and 1 are leaf-leaf merges; both paths climb to merge 2
    assert paths == [[0, 2], [1, 2]]


def test_gen_merge_paths_bounded():
    paths = gen_merge_paths(ORDER, path_length=2, min_path_length=1)
    # every merge starts a path: [0,2], [1,2], [2]
    assert [0, 2] in paths and [1, 2] in paths
    # [2] starts at merge 2 whose inputs 5,6 are internal -> kept only if
    # length==path_length; len 1 != 2 -> dropped
    assert [2] not in paths


def test_collect_sub_keys():
    t = build_tree(ORDER)
    sk = collect_sub_keys(t)
    assert sk[t.root].tolist() == [1, 2, 3, 4]
    assert sk[2].tolist() == [1, 2]


def test_final_segmentation():
    t = build_tree(ORDER)
    labels = np.array([[1, 2], [3, 4]], dtype=np.int32)
    seg = final_segmentation(labels, t, [2, 5])  # nodes keyed 5 and 6
    assert seg[0, 0] == seg[0, 1]
    assert seg[1, 0] == seg[1, 1]
    assert seg[0, 0] != seg[1, 0]
    assert seg[0, 0] == 1 and seg[1, 0] == 2  # keys assigned from 1


def test_transform_image_missing_to_bg():
    labels = np.array([[1, 2]], dtype=np.int32)
    out = transform_image(labels, {1: 7})
    assert out.tolist() == [[7, 0]]
    with pytest.raises(KeyError):
        transform_image(labels, {1: 7}, ignore_missing=False)


def test_multi_tree_consensus():
    t1 = build_tree(ORDER)
    t2 = build_tree(ORDER)
    pot1 = node_potentials(t1, [0.9, 0.9, 0.1])
    pot2 = node_potentials(t2, [0.2, 0.2, 0.2])
    picks = resolve_trees_greedy([t1, t2], [pot1, pot2])
    assert picks[0][0] == 0  # strongest node comes from tree 0
    labels = np.array([[1, 2], [3, 4]], dtype=np.int32)
    seg = final_segmentation(labels, [t1, t2], picks)
    assert (seg > 0).all()
