"""ctypes bindings for the C++ native runtime (watershed, exact merge, CC).

The shared library is compiled on first use with g++ -O3 and cached next to
the source; rebuilds happen automatically when the source changes.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "src", "glia_native.cc")
_LIB = os.path.join(_HERE, "_glia_native.so")
_lock = threading.Lock()
_lib = None


_SRC_BC = os.path.join(_HERE, "src", "glia_bc.cc")


def _build():
    cmd = [
        "g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
        _SRC, _SRC_BC, "-o", _LIB,
    ]
    subprocess.run(cmd, check=True, capture_output=True)


def get_lib():
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if (not os.path.exists(_LIB)
                or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)
                or os.path.getmtime(_LIB) < os.path.getmtime(_SRC_BC)):
            _build()
        lib = ctypes.CDLL(_LIB)
        i64 = ctypes.c_int64
        p_i64 = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
        p_i32 = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        p_f32 = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        p_f64 = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")

        lib.glia_greedy_merge.restype = i64
        lib.glia_greedy_merge.argtypes = [
            i64, p_i64, p_i64, p_i64, p_f64, ctypes.c_int,
            i64, p_i64, p_i64, p_i64, p_f64, i64,
        ]
        lib.glia_greedy_merge_premerge.restype = i64
        lib.glia_greedy_merge_premerge.argtypes = [
            i64, p_i64, p_i64, p_i64, p_f64,
            i64, p_i64, p_i64, p_f64,
            ctypes.c_double, ctypes.c_double, ctypes.c_double,
            p_i64, p_f64, i64,
        ]
        lib.glia_watershed.restype = i64
        lib.glia_watershed.argtypes = [p_f32, p_i64, ctypes.c_int,
                                       ctypes.c_double, p_i32]
        lib.glia_connected_components.restype = i64
        lib.glia_connected_components.argtypes = [
            p_i32, ctypes.c_void_p, p_i64, ctypes.c_int, p_i32,
        ]
        lib.glia_replay_saliency.restype = None
        lib.glia_replay_saliency.argtypes = [
            i64, p_i32, p_i32, p_f64, p_f64, i64, i64, p_i32, p_f64,
        ]
        lib.glia_bc_greedy_merge.restype = i64
        lib.glia_bc_greedy_merge.argtypes = [
            i64, p_i64, p_i64, p_i64, p_i64,          # regions
            i64, p_i64, p_i64, p_i64, p_i64,          # directed pairs
            i64, p_i64, i64, p_f64, i64,              # ndim/shape/images
            i64, ctypes.c_double, ctypes.c_double,    # bins/range
            p_f64, i64, p_f64,                        # pb/thresholds
            i64, i64, p_i32, p_f32, p_i32, p_i32, p_i32,
            ctypes.c_int,                             # forest
            p_i64, p_f64, i64, p_i64,                 # outputs
        ]
        lib.glia_replay_saliency_median.restype = None
        lib.glia_replay_saliency_median.argtypes = [
            i64, p_i32, p_i32, p_i64, p_f64, i64, i64, p_i32,
            ctypes.c_void_p, p_f64,
        ]
        _lib = lib
        return _lib


_POLICY_IDS = {"median": 0, "mean": 1, "median_minsize": 2}


def greedy_merge_native(rag, pb_image, policy="median"):
    """Exact greedy merge via the C++ engine; same outputs as
    glia_tpu.graph.merge.greedy_merge_order (no fcond support)."""
    lib = get_lib()
    pb = np.ascontiguousarray(np.asarray(pb_image).ravel(), dtype=np.float64)
    edge_vals = pb[rag.edge_pixels]
    u = np.ascontiguousarray(rag.edges[:, 0], dtype=np.int64)
    v = np.ascontiguousarray(rag.edges[:, 1], dtype=np.int64)
    ptr = np.ascontiguousarray(rag.edge_ptr, dtype=np.int64)
    keys = np.ascontiguousarray(rag.keys, dtype=np.int64)
    sizes = np.ascontiguousarray(
        rag.sizes if rag.sizes is not None else np.zeros_like(keys),
        dtype=np.int64,
    )
    max_merges = max(rag.n_regions - 1, 0)
    order = np.zeros(max(max_merges * 3, 1), dtype=np.int64)
    sals = np.zeros(max(max_merges, 1), dtype=np.float64)
    n = lib.glia_greedy_merge(
        rag.n_edges, u, v, ptr, np.ascontiguousarray(edge_vals),
        _POLICY_IDS[policy], len(keys), keys, sizes, order, sals, max_merges,
    )
    return order[: n * 3].reshape(-1, 3).copy(), sals[:n].copy()


def pre_merge_native(rag, pb_image, size_thresholds=(50,),
                     rpb_threshold=0.5):
    """Serial pre-merge via the C++ engine (gadget/main_pre_merge.cxx
    semantics): pooled-mean greedy merges admitted only while the smaller
    region is tiny (< thresholds[0]) or either region is medium
    (< thresholds[1]) with mean pb above rpb_threshold.  Same outputs as
    glia_tpu.pipeline.pre_merge's Python fcond engine."""
    lib = get_lib()
    pb = np.ascontiguousarray(np.asarray(pb_image).ravel(), dtype=np.float64)
    edge_vals = pb[rag.edge_pixels]
    u = np.ascontiguousarray(rag.edges[:, 0], dtype=np.int64)
    v = np.ascontiguousarray(rag.edges[:, 1], dtype=np.int64)
    ptr = np.ascontiguousarray(rag.edge_ptr, dtype=np.int64)
    keys = np.ascontiguousarray(rag.keys, dtype=np.int64)
    if (rag.sizes is None or len(rag.sizes) == 0
            or rag.region_ptr is None or rag.region_pixels is None):
        raise ValueError("RAG has no region sizes/pixels (contour-only "
                         "build); pre_merge needs build_rag(contour_only="
                         "False)")
    sizes = np.ascontiguousarray(rag.sizes, dtype=np.int64)
    # per-region summed pb for the mean-pb condition
    rl = np.diff(rag.region_ptr)
    rid = np.repeat(np.arange(rag.n_regions), rl)
    pb_sums = np.ascontiguousarray(
        np.bincount(rid, weights=pb[rag.region_pixels],
                    minlength=rag.n_regions))
    t0 = float(size_thresholds[0])
    t1 = float(size_thresholds[1]) if len(size_thresholds) > 1 else -1.0
    max_merges = max(rag.n_regions - 1, 0)
    order = np.zeros(max(max_merges * 3, 1), dtype=np.int64)
    sals = np.zeros(max(max_merges, 1), dtype=np.float64)
    n = lib.glia_greedy_merge_premerge(
        rag.n_edges, u, v, ptr, np.ascontiguousarray(edge_vals),
        len(keys), keys, sizes, pb_sums, t0, t1, float(rpb_threshold),
        order, sals, max_merges,
    )
    return order[: n * 3].reshape(-1, 3).copy(), sals[:n].copy()


def replay_saliency_native(u, v, s, c, order, n_ids):
    """Serial replay of a fixed merge order recomputing each merge's exact
    pooled-mean boundary statistic (see graph/merge_device.
    replay_exact_saliency; this is its C++ engine -- ~50x the Python dict
    replay at 1M+ edges)."""
    lib = get_lib()
    u = np.ascontiguousarray(u, dtype=np.int32)
    v = np.ascontiguousarray(v, dtype=np.int32)
    s = np.ascontiguousarray(s, dtype=np.float64)
    c = np.ascontiguousarray(c, dtype=np.float64)
    order = np.ascontiguousarray(order, dtype=np.int32).reshape(-1, 3)
    n = len(order)
    out = np.empty(max(n, 1), dtype=np.float64)
    lib.glia_replay_saliency(len(u), u, v, s, c, int(n_ids), n,
                             np.ascontiguousarray(order.ravel()), out)
    return out[:n]


def greedy_merge_bc_native(rag, cfg, model, label=-1, max_merges=None):
    """Serial classifier-in-the-loop greedy merge via the C++ engine
    (glia_bc.cc): the same algorithm as graph.merge_bc.greedy_merge_bc,
    BIT-FOR-BIT (canonical sorted-neighbor accumulation, numpy pairwise
    sums, heapq tie rule) but ~100x faster -- the serial oracle that
    extends device-vs-serial midcut parity tables past 512^2
    (util/struct_merge_bc.hxx:10-58 semantics).

    Supports the FeatureConfig.standard subset: r_images == b_images,
    no rl_images, shared hist bins/range, normalizing 1.0, no log-shape
    and no histogram/median extra feats.  Returns (order [n, 3] int64
    label-key triples, probs [n])."""
    lib = get_lib()
    if (cfg.rl_images or cfg.use_log_shape or cfg.histogram_as_feats
            or cfg.median_as_feats or cfg.normalizing_area != 1.0
            or cfg.normalizing_length != 1.0):
        raise ValueError("native BC engine supports the standard "
                         "feature-config subset only")
    if len(cfg.r_images) != len(cfg.b_images) or any(
            ri.image is not bi.image or ri.hist_bins != bi.hist_bins
            or ri.hist_range != bi.hist_range
            for ri, bi in zip(cfg.r_images, cfg.b_images)):
        raise ValueError("native BC engine needs r_images == b_images "
                         "(FeatureConfig.standard)")
    bins = {i.hist_bins for i in cfg.r_images}
    ranges = {i.hist_range for i in cfg.r_images}
    if len(bins) != 1 or len(ranges) != 1:
        raise ValueError("native BC engine needs one shared hist config")
    n_bins = bins.pop()
    lo, hi = ranges.pop()
    if rag.region_ptr is None or rag.dir_pairs is None:
        raise ValueError("build RAG with contour_only=False")

    shape = np.asarray(rag.shape, dtype=np.int64)
    n_pixels = int(np.prod(shape))
    images = np.ascontiguousarray(np.stack(
        [np.asarray(im.image, dtype=np.float64).ravel()
         for im in cfg.r_images]))
    pb = np.ascontiguousarray(np.asarray(cfg.pb_image,
                                         dtype=np.float64).ravel())
    thresholds = np.ascontiguousarray(cfg.boundary_thresholds,
                                      dtype=np.float64)
    border_counts = np.ascontiguousarray(np.diff(rag.border_ptr),
                                         dtype=np.int64)
    li = int(np.nonzero(model.classes == label)[0][0])
    if max_merges is None:
        max_merges = max(rag.n_regions - 1, 0)
    order = np.zeros(max(max_merges * 3, 1), dtype=np.int64)
    probs = np.zeros(max(max_merges, 1), dtype=np.float64)
    feat_dim = np.zeros(1, dtype=np.int64)
    n = lib.glia_bc_greedy_merge(
        rag.n_regions,
        np.ascontiguousarray(rag.keys, dtype=np.int64),
        np.ascontiguousarray(rag.region_ptr, dtype=np.int64),
        np.ascontiguousarray(rag.region_pixels, dtype=np.int64),
        border_counts,
        len(rag.dir_pairs),
        np.ascontiguousarray(rag.dir_pairs[:, 0], dtype=np.int64),
        np.ascontiguousarray(rag.dir_pairs[:, 1], dtype=np.int64),
        np.ascontiguousarray(rag.dir_ptr, dtype=np.int64),
        np.ascontiguousarray(rag.dir_pixels, dtype=np.int64),
        len(shape), shape, len(cfg.r_images), images, n_pixels,
        int(n_bins), float(lo), float(hi),
        pb, len(thresholds), thresholds,
        model.n_trees, model.feature.shape[1],
        np.ascontiguousarray(model.feature, dtype=np.int32),
        np.ascontiguousarray(model.threshold, dtype=np.float32),
        np.ascontiguousarray(model.left, dtype=np.int32),
        np.ascontiguousarray(model.right, dtype=np.int32),
        np.ascontiguousarray(model.leaf_class, dtype=np.int32),
        li, order, probs, max_merges, feat_dim)
    return order[: n * 3].reshape(-1, 3).copy(), probs[:n].copy()


def replay_saliency_median_native(u, v, edge_ptr, edge_vals, order,
                                  n_ids, region_sizes=None):
    """Serial replay of a fixed merge order recomputing each merge's
    exact UPPER-MEDIAN boundary statistic at merge time (the reference's
    policy-0 quantity, util/stats.hxx:83-91, under splice-as-concat of
    boundary_table.hxx:122-167).  (u, v): dense endpoint indices per
    base edge; (edge_ptr, edge_vals): CSR pixel values per base edge;
    order: [M, 3] dense-index triples.  NaN where the pair has no
    boundary at its turn.  region_sizes (optional, leaf sizes indexed by
    dense region id): statistic becomes median * min(size) -- the
    median_minsize policy (struct_merge.hxx:141-185)."""
    lib = get_lib()
    u = np.ascontiguousarray(u, dtype=np.int32)
    v = np.ascontiguousarray(v, dtype=np.int32)
    edge_ptr = np.ascontiguousarray(edge_ptr, dtype=np.int64)
    edge_vals = np.ascontiguousarray(edge_vals, dtype=np.float64)
    order = np.ascontiguousarray(order, dtype=np.int32).reshape(-1, 3)
    n = len(order)
    out = np.empty(max(n, 1), dtype=np.float64)
    sz_ptr = None
    if region_sizes is not None:
        sz = np.zeros(int(n_ids), dtype=np.int64)
        region_sizes = np.asarray(region_sizes, dtype=np.int64)
        sz[: len(region_sizes)] = region_sizes
        sz_ptr = sz.ctypes.data_as(ctypes.c_void_p)
    lib.glia_replay_saliency_median(
        len(u), u, v, edge_ptr, edge_vals, int(n_ids), n,
        np.ascontiguousarray(order.ravel()), sz_ptr, out)
    return out[:n]


def watershed_native(image, level=0.0):
    """Priority-flood watershed with h-minima `level`; labels from 1."""
    lib = get_lib()
    img = np.ascontiguousarray(np.asarray(image), dtype=np.float32)
    dims = np.asarray(img.shape, dtype=np.int64)
    out = np.zeros(img.size, dtype=np.int32)
    lib.glia_watershed(img.ravel(), dims, img.ndim, float(level), out)
    return out.reshape(img.shape)


def connected_components_native(labels, mask=None):
    """Connected components of equal-valued pixels (4/6-connectivity)."""
    lib = get_lib()
    lab = np.ascontiguousarray(np.asarray(labels), dtype=np.int32)
    dims = np.asarray(lab.shape, dtype=np.int64)
    out = np.zeros(lab.size, dtype=np.int32)
    mask_ptr = None
    if mask is not None:
        mask_arr = np.ascontiguousarray(np.asarray(mask), dtype=np.int32)
        mask_ptr = mask_arr.ctypes.data_as(ctypes.c_void_p)
    lib.glia_connected_components(lab.ravel(), mask_ptr, dims, lab.ndim, out)
    return out.reshape(lab.shape)
