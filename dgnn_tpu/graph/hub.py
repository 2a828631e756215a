"""Dense hub-block planning: route the hub-heavy core of a power-law graph
through the MXU instead of rate-bound gathers.

On this TPU, per-edge random access costs ~13ns per row regardless of row
size, while dense masked matmuls stream at memory/MXU speed
(docs/PERF_NOTES.md; scripts/microbench_dense.py).  Power-law graphs
concentrate edges: on the Reddit-scale R-MAT, the top-64K x top-64K
degree-ranked block holds ~92% of all edges at 2.5% density.  This module
selects such a block [R rows x C cols] by degree rank, packs its adjacency
as bit-plane bitmaps for the Pallas kernels (ops/pallas_dense.py), and
returns the residual edges for the binned gather path.

Reference analogue: none — this replaces the tile-balance scheduling story
(fused_gatconv_kernel.cu:1082-1272) for hub rows entirely.

All functions are one-time host-side numpy.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ..ops.pallas_dense import DENSE_CT

__all__ = ["DensePlan", "plan_dense", "build_dense_numpy", "DENSE_RT",
           "pack_mask_bits"]

# Row-chunk granularity of the kernels; R is padded to a multiple.
DENSE_RT = 256

# Measured machine constants (scripts/microbench_dense.py on v5e):
# the fwd kernel measured 4.3e10 masked pairs/s at H=4, F=64 incl. the
# sign-split aggregation matmuls; gathers run at ~75e6 rows/s.
DENSE_PAIRS_PER_S = 4.0e10
GATHER_ROWS_PER_S = 75e6
# Estimated padding overhead of the binned path on residual edges.
SPARSE_PAD = 1.25


@dataclasses.dataclass(frozen=True)
class DensePlan:
    """Host-side dense block: padded id lists + bit-plane packed mask."""

    row_ids: np.ndarray   # [Rpad] int32 (real rows first, 0-padded)
    col_ids: np.ndarray   # [Cpad] int32 in kernel slot order (0-padded)
    mask: np.ndarray      # [Rpad, Cpad//8] uint8, bit-plane packed
    num_rows: int         # real (unpadded) row count


def pack_mask_bits(mask01: np.ndarray, ct: int = DENSE_CT) -> np.ndarray:
    """[R, C] bool (C % ct == 0) -> [R, C//8] uint8 bit-plane packed.

    Within each ct-column tile, the bit of the column at kernel lane j
    lives in byte j % (ct//8), bit j // (ct//8) — the layout
    ops/pallas_dense.unpack_mask inverts with shift-and-concat only.
    """
    R, C = mask01.shape
    assert C % ct == 0
    cb = ct // 8
    j = np.arange(ct)
    # packed position p = 8q+k (np.packbits little: byte q bit k <- col 8q+k)
    # must hold logical slot j = k*cb + q  =>  col p of the packbits input is
    # logical slot (p % 8) * cb + p // 8
    perm = (j % 8) * cb + j // 8
    tiles = mask01.reshape(R, C // ct, ct)[:, :, perm]
    return np.packbits(tiles.reshape(R, C), axis=1,
                       bitorder="little")


def _pad_to(x: np.ndarray, m: int) -> np.ndarray:
    pad = (-len(x)) % m
    return np.concatenate([x, np.zeros(pad, x.dtype)]) if pad else x


def plan_dense(row_ptr: np.ndarray, col_ind: np.ndarray,
               out_deg: np.ndarray, *,
               mask_budget_bytes: int = 1 << 30,
               min_saving: float = 1.3,
               heads: int = 4):
    """Choose the (R, C) degree-ranked block minimizing estimated pass time.

    Returns (row_rank_count, col_rank_count, rows_by_rank, cols_by_rank) or
    None when no block beats the all-binned path by ``min_saving``x.

    Cost model (per pass): dense = R*C / DENSE_PAIRS_PER_S + (R + C) rows of
    setup gathers; sparse = residual_edges * SPARSE_PAD / GATHER_ROWS_PER_S.
    """
    row_ptr = np.asarray(row_ptr, np.int64)
    deg_in = np.diff(row_ptr)
    n = len(deg_in)
    E = int(col_ind.shape[0])
    rows_by_rank = np.argsort(deg_in, kind="stable")[::-1].astype(np.int64)
    cols_by_rank = np.argsort(out_deg, kind="stable")[::-1].astype(np.int64)
    rank_in = np.empty(n, np.int64)
    rank_in[rows_by_rank] = np.arange(n)
    rank_out = np.empty(n, np.int64)
    rank_out[cols_by_rank] = np.arange(n)

    grid = [g for g in (4096, 8192, 16384, 32768, 65536, 131072, 262144)
            if g <= max(n, 4096)]
    if not grid:
        return None
    # 2-D histogram of edges over (dst-rank bucket, src-rank bucket)
    dst_rank = np.repeat(rank_in, deg_in)
    src_rank = rank_out[col_ind]
    bounds = np.asarray(grid + [1 << 62])
    bi = np.searchsorted(bounds, dst_rank, side="right")
    bj = np.searchsorted(bounds, src_rank, side="right")
    nb = len(bounds)
    hist = np.bincount(bi * nb + bj, minlength=nb * nb).reshape(nb, nb)
    cum = hist.cumsum(0).cumsum(1)  # cum[i, j] = edges with rank bucket <=

    base = E * SPARSE_PAD / GATHER_ROWS_PER_S
    best = None
    best_cost = base / min_saving
    for i, R in enumerate(grid):
        if R > n:
            continue
        for j, C in enumerate(grid):
            if C > n or R * C // 8 > mask_budget_bytes:
                continue
            covered = int(cum[i, j])
            dense_t = R * C / DENSE_PAIRS_PER_S + (R + C) / GATHER_ROWS_PER_S
            sparse_t = (E - covered) * SPARSE_PAD / GATHER_ROWS_PER_S
            cost = dense_t + sparse_t
            if cost < best_cost:
                best = (R, C)
                best_cost = cost
    if best is None:
        return None
    R, C = best
    return R, C, rows_by_rank[:R], cols_by_rank[:C]


def build_dense_numpy(row_ptr: np.ndarray, col_ind: np.ndarray,
                      row_sel: np.ndarray, col_sel: np.ndarray):
    """Materialize the dense block + residual CSR.

    Args:
      row_ptr/col_ind: the adjacency (any direction).
      row_sel: node ids whose rows go dense; col_sel: node ids whose columns
        participate.  An edge is dense iff (row in row_sel) and (col in
        col_sel); everything else is residual.
    Returns (DensePlan, residual_row_ptr, residual_col_ind,
             residual_edge_ids) where residual_edge_ids are positions into
      the original col_ind (for callers carrying per-edge data).
    """
    row_ptr = np.asarray(row_ptr, np.int64)
    col_ind = np.asarray(col_ind, np.int64)
    n = len(row_ptr) - 1
    deg = np.diff(row_ptr)

    in_rows = np.zeros(n, bool)
    in_rows[row_sel] = True
    col_slot = np.full(n, -1, np.int64)  # node id -> dense col slot
    # kernel slot order IS the given col_sel order (the bit-plane perm is
    # applied to the mask only, via pack_mask_bits)
    col_slot[col_sel] = np.arange(len(col_sel))

    rows_per_edge = np.repeat(np.arange(n), deg)
    e_dense = in_rows[rows_per_edge] & (col_slot[col_ind] >= 0)

    # --- residual CSR (row ids unchanged) ---
    keep = ~e_dense
    res_counts = np.bincount(rows_per_edge[keep], minlength=n)
    res_row_ptr = np.zeros(n + 1, np.int64)
    np.cumsum(res_counts, out=res_row_ptr[1:])
    res_col_ind = col_ind[keep]
    res_edge_ids = np.nonzero(keep)[0]

    # --- dense mask ---
    Rp = len(_pad_to(np.asarray(row_sel, np.int64), DENSE_RT))
    col_ids = _pad_to(np.asarray(col_sel, np.int64), DENSE_CT)
    Cp = len(col_ids)
    row_local = np.full(n, -1, np.int64)
    row_local[row_sel] = np.arange(len(row_sel))
    er = row_local[rows_per_edge[e_dense]]
    ec = col_slot[col_ind[e_dense]]
    try:
        from .. import native
        assert native.available()
        mask = native.dense_mask_fill(er, ec, Rp, Cp, DENSE_CT)
    except Exception:
        mask01 = np.zeros((Rp, Cp), bool)
        mask01[er, ec] = True
        mask = pack_mask_bits(mask01)
    plan = DensePlan(
        row_ids=_pad_to(np.asarray(row_sel, np.int64), DENSE_RT).astype(
            np.int32),
        col_ids=col_ids.astype(np.int32),
        mask=mask,
        num_rows=len(row_sel),
    )
    return plan, res_row_ptr, res_col_ind, res_edge_ids
