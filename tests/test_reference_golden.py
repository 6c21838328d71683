"""Non-circular parity: glia_tpu vs goldens from the COMPILED reference.

tools/ref_golden/ref_golden.cc #includes the actual reference headers
(util/stats.hxx, type/tree.hxx, hmt/tree_build.hxx, hmt/tree_greedy.hxx,
hmt/tree_ccm.hxx -- all std+omp only) and drives them over random inputs;
these tests compare glia_tpu's reimplementations against that binary's
output, so parity here is checked against reference *behavior*, not
against our own oracles.
"""

import subprocess
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent
SRC = REPO / "tools" / "ref_golden" / "ref_golden.cc"
BIN = REPO / ".build" / "ref_golden"
REF_INCLUDE = Path("/root/reference/code")


@pytest.fixture(scope="session")
def golden():
    """Build (cached) and return a runner: text in -> token list out."""
    if not REF_INCLUDE.exists():
        pytest.skip("reference tree not available")
    if not BIN.exists() or BIN.stat().st_mtime < SRC.stat().st_mtime:
        BIN.parent.mkdir(exist_ok=True)
        subprocess.run(
            ["g++", "-std=c++14", "-O2", "-fopenmp",
             f"-I{REF_INCLUDE}", str(SRC), "-o", str(BIN)],
            check=True, capture_output=True, text=True)

    def run(text):
        out = subprocess.run([str(BIN)], input=text + "\nend\n",
                             capture_output=True, text=True, check=True,
                             timeout=120)
        return out.stdout.split()

    return run


def fmt(vals):
    return " ".join(repr(float(v)) if isinstance(v, float) else str(int(v))
                    for v in vals)


def random_order(rng, n_leaves, key_base=1):
    """Random merge order over labels key_base..key_base+n_leaves-1, fresh
    keys continue upward; returns [n_leaves-1, 3] int array."""
    alive = list(range(key_base, key_base + n_leaves))
    nxt = key_base + n_leaves
    rows = []
    while len(alive) > 1:
        i, j = rng.choice(len(alive), 2, replace=False)
        a, b = alive[int(i)], alive[int(j)]
        alive = [x for x in alive if x not in (a, b)]
        rows.append((a, b, nxt))
        alive.append(nxt)
        nxt += 1
    return np.asarray(rows, dtype=np.int64)


def order_text(order):
    return f"{len(order)} " + " ".join(
        str(int(x)) for x in np.asarray(order).ravel())


# ---------------------------------------------------------------- stats


def test_amedian_golden(golden):
    from glia_tpu.graph.merge import _upper_median as amedian

    rng = np.random.default_rng(0)
    lines, expect = [], []
    for n in [1, 2, 3, 4, 5, 10, 11, 100, 101]:
        v = np.round(rng.random(n) * 10, 3)
        lines.append(f"amedian {n} " + fmt(v.tolist()))
        expect.append(v)
    toks = golden("\n".join(lines))
    assert len(toks) == len(expect)
    for t, v in zip(toks, expect):
        assert float(t) == amedian(v)


def test_histc_golden(golden):
    from glia_tpu._histutil import hist_counts

    rng = np.random.default_rng(1)
    cases = []
    for n, bins, lo, hi in [(50, 8, 0.0, 1.0), (100, 16, 0.0, 1.0),
                            (30, 4, 0.2, 0.8), (20, 5, -1.0, 1.0),
                            (1, 3, 0.0, 1.0)]:
        v = np.round(rng.random(n) * (hi - lo) * 1.2 + lo - 0.1 * (hi - lo),
                     4)
        cases.append((v, bins, lo, hi))
    text = "\n".join(
        f"histc {len(v)} {bins} {lo!r} {hi!r} " + fmt(v.tolist())
        for v, bins, lo, hi in cases)
    toks = golden(text)
    pos = 0
    for v, bins, lo, hi in cases:
        ref = np.array([int(t) for t in toks[pos:pos + bins]])
        pos += bins
        ours = hist_counts(v, bins, (lo, hi))
        np.testing.assert_array_equal(ours.astype(np.int64), ref,
                                      err_msg=f"{bins=}, {lo=}, {hi=}")


def test_entropy_golden(golden):
    rng = np.random.default_rng(2)
    from glia_tpu.constants import FEPS

    def entropy(p):
        p = np.asarray(p, dtype=np.float64)
        m = np.abs(p) >= FEPS  # reference isfeq uses FEPS tolerance
        return float(-(p[m] * np.log2(p[m])).sum()) if m.any() else 0.0

    cases = []
    for n in [1, 4, 16]:
        p = rng.random(n)
        p = np.round(p / p.sum(), 6)
        p[0] = 0.0
        cases.append(p)
    toks = golden("\n".join(
        f"entropy {len(p)} " + fmt(p.tolist()) for p in cases))
    for t, p in zip(toks, cases):
        assert abs(float(t) - entropy(p)) < 1e-12


def test_pairstats_golden(golden):
    from glia_tpu.metrics.contingency import pair_stats_from_counts
    from glia_tpu.metrics.rand import (adapted_rand_from_pairs,
                                       rand_index_from_pairs)

    rng = np.random.default_rng(3)
    lines, cases = [], []
    for _ in range(10):
        ns, nt = rng.integers(2, 6, 2)
        cells = []
        for s in range(1, ns + 1):
            for t in range(1, nt + 1):
                if rng.random() < 0.7:
                    cells.append((s, t, int(rng.integers(1, 50))))
        if not cells:
            cells = [(1, 1, 3)]
        body = " ".join(f"{s} {t} {c}" for s, t, c in cells)
        # mains filter excluded pixels from the cmap BEFORE calling
        # pairStats (image_stats.hxx:248-273), so exclusion sets are
        # empty here -- matching our pipeline's pixel-level exclusion
        lines.append(f"pairstats {len(cells)} {body} 0 0")
        cases.append(cells)
    toks = golden("\n".join(lines))
    pos = 0
    for cells in cases:
        ref = toks[pos:pos + 8]
        pos += 8
        s = [c[0] for c in cells]
        t = [c[1] for c in cells]
        n = [c[2] for c in cells]
        tp, tn, fp, fn = pair_stats_from_counts(s, t, n)
        assert [tp, tn, fp, fn] == [int(x) for x in ref[:4]]
        ri = rand_index_from_pairs(tp, tn, fp, fn)
        prec, rec, err = adapted_rand_from_pairs(tp, tn, fp, fn)
        assert abs(ri - float(ref[4])) < 1e-12
        assert abs(prec - float(ref[5])) < 1e-12
        assert abs(rec - float(ref[6])) < 1e-12
        assert abs((1.0 - err) - float(ref[7])) < 1e-12


# ---------------------------------------------------------------- trees


def parse_tree_block(toks, pos):
    m = int(toks[pos]); pos += 1
    nodes = []
    for _ in range(m):
        self_, parent, label = int(toks[pos]), int(toks[pos + 1]), int(toks[pos + 2])
        nc = int(toks[pos + 3]); pos += 4
        children = [int(toks[pos + k]) for k in range(nc)]
        pos += nc
        nodes.append((self_, parent, label, children))
    assert toks[pos] == "root"
    root = int(toks[pos + 1]); pos += 2
    return nodes, root, pos


def test_tree_build_golden(golden):
    from glia_tpu.graph.tree import build_tree, collect_sub_keys, gen_order

    rng = np.random.default_rng(4)
    for trial in range(5):
        order = random_order(rng, int(rng.integers(2, 30)))
        toks = golden("tree " + order_text(order))
        nodes, root, pos = parse_tree_block(toks, 0)
        tree = build_tree(order)
        assert tree.n_nodes == len(nodes)
        assert tree.root == root
        for self_, parent, label, children in nodes:
            assert int(tree.parent[self_]) == parent
            assert int(tree.keys[self_]) == label
            if children:
                assert [int(tree.left[self_]), int(tree.right[self_])] == children
            else:
                assert tree.left[self_] < 0
        # genOrder round-trip
        assert toks[pos] == "order"
        no = int(toks[pos + 1]); pos += 2
        ref_order = np.array([int(t) for t in toks[pos:pos + no * 3]]
                             ).reshape(-1, 3)
        pos += no * 3
        np.testing.assert_array_equal(gen_order(tree), ref_order)
        # collectSubKeys
        assert toks[pos] == "subkeys"
        nsk = int(toks[pos + 1]); pos += 2
        ours = collect_sub_keys(tree, sort=True)
        assert nsk == len(ours)
        for i in range(nsk):
            k = int(toks[pos]); pos += 1
            ref_sk = [int(toks[pos + j]) for j in range(k)]
            pos += k
            assert list(map(int, ours[i])) == ref_sk


def test_node_potentials_golden(golden):
    from glia_tpu.graph.tree import build_tree, node_potentials

    rng = np.random.default_rng(5)
    for trial in range(5):
        order = random_order(rng, int(rng.integers(2, 25)))
        probs = np.round(rng.random(len(order)), 6)
        toks = golden(f"potentials {order_text(order)} " + fmt(probs.tolist()))
        m = int(toks[0])
        tree = build_tree(order)
        pots = node_potentials(tree, probs)
        assert m == tree.n_nodes
        for i in range(m):
            label, pot = int(toks[1 + 2 * i]), float(toks[2 + 2 * i])
            assert int(tree.keys[i]) == label
            assert abs(pots[i] - pot) < 1e-15


def parse_paths(toks, pos):
    n = int(toks[pos]); pos += 1
    paths = []
    for _ in range(n):
        k = int(toks[pos]); pos += 1
        paths.append([int(toks[pos + j]) for j in range(k)])
        pos += k
    return paths, pos


def test_merge_paths_golden(golden):
    from glia_tpu.graph.tree import gen_merge_paths

    rng = np.random.default_rng(6)
    for trial in range(4):
        order = random_order(rng, int(rng.integers(3, 25)))
        # unbounded variant
        toks = golden(f"mergepaths {order_text(order)} -1 1")
        ref, _ = parse_paths(toks, 0)
        assert gen_merge_paths(order) == ref
        # bounded variants
        for pl, mpl in [(3, 1), (2, 2), (4, 2), (1, 1)]:
            toks = golden(f"mergepaths {order_text(order)} {pl} {mpl}")
            ref, _ = parse_paths(toks, 0)
            assert gen_merge_paths(order, path_length=pl,
                                   min_path_length=mpl) == ref, \
                f"{pl=} {mpl=}"


def test_node_paths_golden(golden):
    from glia_tpu.graph.tree import build_tree, gen_node_paths

    rng = np.random.default_rng(7)
    for trial in range(4):
        order = random_order(rng, int(rng.integers(2, 25)))
        toks = golden(f"nodepaths {order_text(order)}")
        ref, _ = parse_paths(toks, 0)
        assert gen_node_paths(build_tree(order)) == ref


# ---------------------------------------------------------------- greedy


def test_greedy_single_golden(golden):
    from glia_tpu.graph.tree import build_tree
    from glia_tpu.infer.greedy import resolve_tree_greedy

    rng = np.random.default_rng(8)
    for trial in range(5):
        order = random_order(rng, int(rng.integers(2, 20)))
        tree = build_tree(order)
        pots = np.round(rng.random(tree.n_nodes), 6)
        toks = golden(f"greedy1 {order_text(order)} {tree.n_nodes} "
                      + fmt(pots.tolist()))
        k = int(toks[0])
        ref = [int(t) for t in toks[1:1 + k]]
        assert resolve_tree_greedy(tree, pots) == ref


def _random_trees(rng, n_tree, n_leaves):
    """Trees over the SAME leaf label set (like multiple merge orders of one
    oversegmentation, the reference's use case)."""
    from glia_tpu.graph.tree import build_tree

    trees, orders, pots = [], [], []
    for _ in range(n_tree):
        order = random_order(rng, n_leaves)
        t = build_tree(order)
        trees.append(t)
        orders.append(order)
        pots.append(np.round(rng.random(t.n_nodes), 6))
    return trees, orders, pots


def test_greedy_multi_golden(golden):
    from glia_tpu.infer.greedy import resolve_trees_greedy

    rng = np.random.default_rng(9)
    for trial in range(4):
        n_tree = int(rng.integers(2, 4))
        trees, orders, pots = _random_trees(rng, n_tree,
                                            int(rng.integers(3, 15)))
        text = f"greedyN {n_tree} " + " ".join(
            f"{order_text(o)} {t.n_nodes} " + fmt(p.tolist())
            for o, t, p in zip(orders, trees, pots))
        toks = golden(text)
        k = int(toks[0])
        ref = [(int(toks[1 + 2 * i]), int(toks[2 + 2 * i]))
               for i in range(k)]
        assert resolve_trees_greedy(trees, pots) == ref


def test_greedy_subset_golden(golden):
    from glia_tpu.infer.greedy import resolve_trees_greedy_subset

    rng = np.random.default_rng(10)
    for trial in range(4):
        n_tree = int(rng.integers(2, 4))
        trees, orders, pots = _random_trees(rng, n_tree,
                                            int(rng.integers(3, 15)))
        text = f"greedyS {n_tree} " + " ".join(
            f"{order_text(o)} {t.n_nodes} " + fmt(p.tolist())
            for o, t, p in zip(orders, trees, pots))
        toks = golden(text)
        ref, _ = parse_paths(toks, 0)
        assert resolve_trees_greedy_subset(trees, pots) == ref


# ---------------------------------------------------------------- ccm


def test_ccm_golden(golden):
    from glia_tpu.graph.tree import FMAX, build_tree
    from glia_tpu.infer.ccm import (compute_energy_tuples,
                                    node_energy_negative,
                                    node_energy_positive,
                                    resolve_factor_tree)

    rng = np.random.default_rng(11)
    for trial in range(5):
        order = random_order(rng, int(rng.integers(2, 20)))
        tree = build_tree(order)
        m = tree.n_nodes
        em = np.round(rng.random(m) * 3, 6)
        es = np.round(rng.random(m) * 3, 6)
        # exercise the saturating-add path: leaves get Es = FMAX like
        # main_segment_ccm.cxx:42-43
        es[tree.is_leaf] = FMAX
        pairs = " ".join(f"{float(em[i])!r} {float(es[i])!r}"
                         for i in range(m))
        toks = golden(f"ccm {order_text(order)} {m} {pairs}")
        nm = int(toks[0])
        assert nm == m
        EM, ES = compute_energy_tuples(tree, em, es)
        pos = 1
        for i in range(m):
            assert float(toks[pos]) == EM[i], f"EM[{i}]"
            assert float(toks[pos + 1]) == ES[i], f"ES[{i}]"
            pos += 2
        k = int(toks[pos]); pos += 1
        ref_picks = [int(toks[pos + j]) for j in range(k)]
        pos += k
        assert resolve_factor_tree(tree, EM, ES) == ref_picks
        for i in range(m):
            rp, rn = float(toks[pos]), float(toks[pos + 1])
            pos += 2
            assert node_energy_positive(tree, i, EM, ES, em, es) == rp, i
            assert node_energy_negative(tree, i, EM, ES, em, es) == rn, i


def test_hist_dist_golden(golden):
    """distL1/distL2/distX2 (stats.hxx:155-185) vs the numpy expressions
    used by the feature extractors (hierarchical.py histL1/histX2 columns,
    serialize.py)."""
    from glia_tpu.constants import FEPS

    rng = np.random.default_rng(31)
    for n in [1, 2, 8, 16, 33, 256]:
        a = np.round(rng.random(n) * 50, 3)
        b = np.round(rng.random(n) * 50, 3)
        toks = golden(f"dist {n} " + fmt(a.tolist()) + " " + fmt(b.tolist()))
        l1_ref, l2_ref, x2_ref = (float(t) for t in toks[:3])
        l1 = np.abs(a - b).sum()
        l2 = np.square(a - b).sum()
        x2 = (np.square(a - b) / (a + b + FEPS)).sum()
        # C++ accumulates strictly left-to-right; numpy uses pairwise
        # blocks -- identical up to ULP-level reassociation
        assert np.isclose(l1, l1_ref, rtol=1e-12, atol=0)
        assert np.isclose(l2, l2_ref, rtol=1e-12, atol=0)
        assert np.isclose(x2, x2_ref, rtol=1e-12, atol=0)


def test_ccm_full_label_marginal_golden(golden):
    """Exponential full-label enumeration + per-node marginal energies
    (tree_ccm.hxx:124-190) -- enumeration ORDER and saturating-add values
    both checked against the compiled reference.  Tiny trees (the
    reference keeps this out of its main path; capability parity)."""
    from glia_tpu.graph.tree import FMAX, build_tree
    from glia_tpu.infer.ccm import (ccm_full_label_energies,
                                    ccm_node_marginal_energy)

    rng = np.random.default_rng(23)
    for trial in range(5):
        order = random_order(rng, int(rng.integers(2, 9)))
        tree = build_tree(order)
        m = tree.n_nodes
        em = np.round(rng.random(m) * 3, 6)
        es = np.round(rng.random(m) * 3, 6)
        es[tree.is_leaf] = FMAX
        pairs = " ".join(f"{float(em[i])!r} {float(es[i])!r}"
                         for i in range(m))
        toks = golden(f"ccmfull {order_text(order)} {m} {pairs}")
        assert int(toks[0]) == m
        em_full, es_lists = ccm_full_label_energies(tree, em, es)
        pos = 1
        for i in range(m):
            assert float(toks[pos]) == em_full[i], f"Em_full[{i}]"
            k = int(toks[pos + 1])
            pos += 2
            ref = [float(toks[pos + j]) for j in range(k)]
            pos += k
            assert es_lists[i] == ref, f"Es list @ node {i}"
        full = (em_full, es_lists)
        for i in range(m):
            k = int(toks[pos]); pos += 1
            ref = [float(toks[pos + j]) for j in range(k)]
            pos += k
            marg = ccm_node_marginal_energy(tree, i, em, es, full=full)
            assert marg.tolist() == ref, f"marginal @ node {i}"


def test_rescale_golden(golden):
    """Feature min-max rescale (stats.hxx:264-318): minmax discovery +
    the FEPS-guarded transform, vs the compiled reference."""
    from glia_tpu.learn.predict import feature_minmax, rescale_features

    rng = np.random.default_rng(12)
    for trial in range(4):
        n = int(rng.integers(2, 12))
        d = int(rng.integers(1, 6))
        X = np.round(rng.standard_normal((n, d)) * 10, 6)
        if trial == 3:
            X[:, 0] = 2.5  # constant column: denominator = FEPS only
        omin, omax = (-1.0, 1.0) if trial % 2 == 0 else (0.0, 1.0)
        body = " ".join(repr(float(x)) for x in X.ravel())
        toks = golden(f"rescale {n} {d} {omin!r} {omax!r} {body}")
        vals = np.array([float(t) for t in toks])
        ref_min, ref_max = vals[:d], vals[d:2 * d]
        ref_scaled = vals[2 * d:].reshape(n, d)
        mm = feature_minmax(X)
        np.testing.assert_array_equal(mm[0], ref_min)
        np.testing.assert_array_equal(mm[1], ref_max)
        got = rescale_features(X, mm, out_min=omin, out_max=omax)
        np.testing.assert_array_equal(got, ref_scaled)


def test_writedata_golden(golden, tmp_path):
    """Text matrix file written by the reference's writeData (the mains'
    feature-file convention, main_bc_feat.cxx:108) parses with glia_tpu's
    reader to the same values at FLT_PREC precision."""
    from glia_tpu.io.text import read_matrix, write_matrix

    rng = np.random.default_rng(13)
    n, d = 5, 4
    X = rng.standard_normal((n, d)) * np.logspace(-3, 3, d)
    path = tmp_path / "ref_mat.txt"
    body = " ".join(repr(float(x)) for x in X.ravel())
    toks = golden(f"writedata {n} {d} {path} {body}")
    assert toks[0] == "ok"
    got = read_matrix(str(path))
    assert got.shape == (n, d)
    np.testing.assert_allclose(got, X, rtol=1e-7)  # FLT_PREC = 8 digits
    # and our writer's output round-trips through our reader identically
    path2 = tmp_path / "our_mat.txt"
    write_matrix(str(path2), got)
    np.testing.assert_array_equal(read_matrix(str(path2)), got)
