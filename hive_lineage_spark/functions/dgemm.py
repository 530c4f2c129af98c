"""Shared blocked-dgemm kernel for the Arrow/BLAS similarity operators.

Three operators run the same math — pack vectors into bounded blocks,
multiply ``A @ B.T`` with one BLAS call per tile/chunk, post-filter the
score matrix — and previously each carried its own copy:

- ``dedup.dd06_embed_cosine_dup``: two-level tile self-join, threshold
  filter, unordered-pair dedup.
- ``similarity.ss05_ann_bruteforce_arrow``: one query block x B corpus
  blocks, per-query partial top-K.
- ``similarity.dd13_semdedup_arrow``: per-cell chunked self-product,
  threshold filter, one-directional pairs.

This module is that kernel, once. Memory bound (SCALE.md): a task holds
at most ``len(B-side) x dim`` doubles plus one ``chunk x len(B-side)``
score slab — callers size their blocks (dd06/ss05 via TILE_ROWS, dd13
via the quantizer cell count) so both fit executor memory, and the
``chunk`` parameter caps the slab even when a caller's block is the
whole cell. All functions are driver-free numpy; they run inside
``mapInPandas`` / ``applyInPandas`` workers on Arrow batches.
"""

from __future__ import annotations

import numpy as np

_EMPTY_I64 = np.array([], dtype=np.int64)
_EMPTY_F64 = np.array([], dtype=np.float64)


def unpack_block(rows, normalize: bool = True):
    """Struct-list block column -> (int64 id vector, float64 matrix),
    rows L2-normalized unless the caller pre-normalized (dd13 reuses the
    engine-side ``nrm`` column so its cosines stay bit-identical to the
    HOF twin dd12)."""
    ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
    mat = np.array([r["v"] for r in rows], dtype=np.float64)
    if normalize:
        mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    return ids, mat


def threshold_pairs(
    ida: np.ndarray,
    mata: np.ndarray,
    idb: np.ndarray,
    matb: np.ndarray,
    threshold: float,
    same_block: bool,
    chunk: int = 2048,
):
    """All pairs with ``cosine >= threshold`` from one A x B tile, as
    (id_lo, id_hi, cosine-rounded-6dp) arrays.

    ``same_block=True`` means A and B hold the SAME vectors (diagonal
    tile / within-cell search): keep only ``id_a < id_b`` so each
    unordered pair is emitted exactly once. Off-diagonal tiles keep
    everything and order each pair as (min, max). The A side is chunked
    so the score slab never exceeds ``chunk x len(idb)`` doubles."""
    if len(ida) <= chunk:
        # single-chunk fast path (dd06's TILE_ROWS == default chunk):
        # one matmul, no per-chunk list/concatenate copies
        sims = mata @ matb.T
        ia, ib = np.where(sims >= threshold)
        if same_block:
            keep = ida[ia] < idb[ib]
            ia, ib = ia[keep], ib[keep]
            lo, hi = ida[ia], idb[ib]
        else:
            lo = np.minimum(ida[ia], idb[ib])
            hi = np.maximum(ida[ia], idb[ib])
        return lo, hi, np.round(sims[ia, ib], 6)
    los, his, cs = [], [], []
    for s in range(0, len(ida), chunk):
        sims = mata[s : s + chunk] @ matb.T
        ia, ib = np.where(sims >= threshold)
        ga = ia + s
        if same_block:
            keep = ida[ga] < idb[ib]
            ia, ib, ga = ia[keep], ib[keep], ga[keep]
            lo, hi = ida[ga], idb[ib]
        else:
            lo = np.minimum(ida[ga], idb[ib])
            hi = np.maximum(ida[ga], idb[ib])
        los.append(lo)
        his.append(hi)
        cs.append(np.round(sims[ia, ib], 6))
    if not los:
        return _EMPTY_I64, _EMPTY_I64, _EMPTY_F64
    return np.concatenate(los), np.concatenate(his), np.concatenate(cs)


def partial_topk(
    idq: np.ndarray,
    matq: np.ndarray,
    idc: np.ndarray,
    matc: np.ndarray,
    k: int,
):
    """Per-query top-K of one query-block x corpus-block tile: yields
    (query_id, neighbor_ids, scores) with self-matches excluded,
    ranked cosine desc then id asc on UNROUNDED scores (rounding is the
    caller's output projection, matching the oracle's ORDER BY)."""
    sims = matq @ matc.T
    for qi in range(len(idq)):
        mask = idc != idq[qi]
        s, ids = sims[qi][mask], idc[mask]
        order = np.lexsort((ids, -s))[:k]
        yield idq[qi], ids[order], s[order]
