"""Region-adjacency graph (RAG) construction from a label image.

TPU-native data model replacing the reference's pointer-based
``TRegionMap``/``TRegion``/``TPointPairMap`` (code/type/region_map.hxx,
code/type/region.hxx, code/type/point_map.hxx): everything is flat arrays +
CSR offsets so downstream stages are pure gathers/segment-reductions.

Semantics parity:
  - contour classification per code/type/neighbor.hxx:111-131 (first
    differing neighbor in -x,+x,-y,+y[,-z,+z] order);
  - an undirected edge exists only if the boundary is *mutual*, i.e. both
    directed pairs (a,b) and (b,a) have pixels (the boundary-table "Bugfix",
    code/type/boundary_table.hxx:99-103);
  - an edge's pixel list is the union of both sides, lower-key side first
    (getBoundary, code/util/struct.hxx:11-16), raster order within a side.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import numpy as np

from ..constants import MASK_OUT_VAL
from ..ops.neighbors import contour_traits


def _expand_ranges(starts, lengths):
    """Concatenate [s, s+len) ranges into one index array, vectorized."""
    total = int(lengths.sum())
    if total == 0:
        return np.zeros(0, dtype=np.int64)
    out_off = np.zeros(len(starts), dtype=np.int64)
    np.cumsum(lengths[:-1], out=out_off[1:])
    idx = np.repeat(starts - out_off, lengths)
    return idx + np.arange(total, dtype=np.int64)


@dataclass
class Rag:
    """Flat-array region adjacency graph.

    Pixel indices are flat C-order offsets into the label image.
    ``edges`` holds raw region *labels* (u < v), matching the reference's
    key-based merge records so merge orders interchange 1:1.
    """

    shape: Tuple[int, ...]
    keys: np.ndarray          # int64 [R] region labels, sorted ascending
    sizes: np.ndarray         # int64 [R] pixel counts (0s if contour-only build)
    edges: np.ndarray         # int64 [E, 2], u < v, mutual boundaries only
    edge_ptr: np.ndarray      # int64 [E+1] CSR into edge_pixels
    edge_pixels: np.ndarray   # int64 [B] flat pixel indices (both sides)
    # one-sided (directed) boundaries, (own, other) ordered pairs:
    dir_pairs: np.ndarray     # int64 [Ed, 2]
    dir_ptr: np.ndarray       # int64 [Ed+1]
    dir_pixels: np.ndarray    # int64 [Bd]
    # per-region border (image-frame) pixels, CSR aligned with ``keys``:
    border_ptr: np.ndarray    # int64 [R+1]
    border_pixels: np.ndarray
    # per-region full pixel lists (empty when contour_only):
    region_ptr: Optional[np.ndarray] = None   # int64 [R+1]
    region_pixels: Optional[np.ndarray] = None

    @property
    def n_regions(self) -> int:
        return len(self.keys)

    @property
    def n_edges(self) -> int:
        return len(self.edges)

    def edge_values(self, image) -> Tuple[np.ndarray, np.ndarray]:
        """Gather a real image's values over every edge's boundary pixels.

        Returns (values[B], edge_ids[B]) -- the inputs to segment stats.
        """
        vals = np.asarray(image).ravel()[self.edge_pixels]
        eids = np.repeat(np.arange(self.n_edges), np.diff(self.edge_ptr))
        return vals, eids

    def key_index(self, keys) -> np.ndarray:
        """Map region labels -> dense indices into ``keys`` (must exist)."""
        idx = np.searchsorted(self.keys, keys)
        return idx


def build_rag(labels, mask=None, contour_only=True) -> Rag:
    """Build the RAG from a label image (+ optional mask).

    Equivalent of ``TRegionMap(image, mask, onlyContour)``
    (code/type/region_map.hxx:52-66): classifies every pixel, groups boundary
    pixels by directed pair, keeps mutual pairs as edges, and (when not
    ``contour_only``) also stores full per-region pixel lists.
    """
    labels = np.asarray(labels)
    flat = labels.ravel().astype(np.int64)
    npix = flat.size

    other, is_boundary, is_border = contour_traits(labels, mask, np)
    other = np.asarray(other).ravel().astype(np.int64)
    is_boundary = np.asarray(is_boundary).ravel()
    is_border = np.asarray(is_border).ravel()

    if mask is not None:
        inside = np.asarray(mask).ravel() != MASK_OUT_VAL
    else:
        inside = np.ones(npix, dtype=bool)

    # --- directed boundary pixel groups ---------------------------------
    bidx = np.nonzero(is_boundary)[0]
    own_b = flat[bidx]
    oth_b = other[bidx]
    dir_code = (own_b << 32) | oth_b
    sorter = np.argsort(dir_code, kind="stable")  # raster order within pair
    dir_code_sorted = dir_code[sorter]
    dir_pixels = bidx[sorter]
    uniq_dir, dir_counts = np.unique(dir_code_sorted, return_counts=True)
    dir_ptr = np.zeros(len(uniq_dir) + 1, dtype=np.int64)
    np.cumsum(dir_counts, out=dir_ptr[1:])
    dir_pairs = np.stack([uniq_dir >> 32, uniq_dir & 0xFFFFFFFF], axis=1)

    # --- mutual (undirected) edges --------------------------------------
    rev_code = (dir_pairs[:, 1] << 32) | dir_pairs[:, 0]
    has_rev = np.isin(rev_code, uniq_dir, assume_unique=True)
    fwd = has_rev & (dir_pairs[:, 0] < dir_pairs[:, 1])
    edges = dir_pairs[fwd]  # u < v, mutual

    # edge pixel list: u-side pixels then v-side pixels
    fwd_idx = np.nonzero(fwd)[0]
    rev_idx = np.searchsorted(uniq_dir, rev_code[fwd_idx])
    sizes_u = dir_ptr[fwd_idx + 1] - dir_ptr[fwd_idx]
    sizes_v = dir_ptr[rev_idx + 1] - dir_ptr[rev_idx]
    n_e = len(fwd_idx)
    edge_ptr = np.zeros(n_e + 1, dtype=np.int64)
    np.cumsum(sizes_u + sizes_v, out=edge_ptr[1:])
    # gather u-side then v-side pixel runs per edge, fully vectorized:
    # interleave (start, length) of both sides, expand ranges to indices.
    starts2 = np.empty(2 * n_e, dtype=np.int64)
    lens2 = np.empty(2 * n_e, dtype=np.int64)
    starts2[0::2] = dir_ptr[fwd_idx]
    starts2[1::2] = dir_ptr[rev_idx]
    lens2[0::2] = sizes_u
    lens2[1::2] = sizes_v
    edge_pixels = dir_pixels[_expand_ranges(starts2, lens2)]

    # --- region keys / sizes --------------------------------------------
    keys_all, counts_all = np.unique(flat[inside], return_counts=True)
    keys = keys_all
    sizes = counts_all.astype(np.int64)

    # --- border pixels per region ---------------------------------------
    br_idx = np.nonzero(is_border)[0]
    br_lab = flat[br_idx]
    s2 = np.argsort(br_lab, kind="stable")
    border_pixels = br_idx[s2]
    br_sorted = br_lab[s2]
    starts = np.searchsorted(br_sorted, keys, side="left")
    ends = np.searchsorted(br_sorted, keys, side="right")
    border_ptr = np.zeros(len(keys) + 1, dtype=np.int64)
    np.cumsum(ends - starts, out=border_ptr[1:])
    # compact (borders of all regions are contiguous runs in br_sorted order)
    border_pixels = border_pixels[_expand_ranges(starts, ends - starts)]

    region_ptr = region_pixels = None
    if not contour_only:
        pix_idx = np.nonzero(inside)[0]
        lab_in = flat[pix_idx]
        s3 = np.argsort(lab_in, kind="stable")
        region_pixels = pix_idx[s3]
        lab_sorted = lab_in[s3]
        st = np.searchsorted(lab_sorted, keys, side="left")
        en = np.searchsorted(lab_sorted, keys, side="right")
        region_ptr = np.zeros(len(keys) + 1, dtype=np.int64)
        np.cumsum(en - st, out=region_ptr[1:])

    return Rag(
        shape=labels.shape,
        keys=keys,
        sizes=sizes,
        edges=edges.astype(np.int64),
        edge_ptr=edge_ptr,
        edge_pixels=edge_pixels,
        dir_pairs=dir_pairs.astype(np.int64),
        dir_ptr=dir_ptr,
        dir_pixels=dir_pixels,
        border_ptr=border_ptr,
        border_pixels=border_pixels,
        region_ptr=region_ptr,
        region_pixels=region_pixels,
    )
