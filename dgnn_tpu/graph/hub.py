"""Tile-sparse dense hub planning: route the dense core of a power-law graph
through the MXU instead of rate-bound gathers.

On this TPU, per-edge random access costs ~13ns per row regardless of row
size, while dense masked matmuls stream at memory/MXU speed
(docs/PERF_NOTES.md; scripts/microbench_dense.py).  Power-law graphs
concentrate edges: on the Reddit-scale R-MAT, the top-64K x top-64K
degree-ranked block holds ~92% of all edges at 2.5% density.

Round-1 design used one degree-ranked [R x C] rectangle.  The density decays
from the top-left corner along a deg_row*deg_col ~ const hyperbola, which a
rectangle approximates badly: tiles near the far corner are below dense
break-even (wasting MXU pairs) while tiles outside the rectangle along the
axes are above it (stranding edges on the gather path).  This version keeps
the decomposition at [DENSE_RT x DENSE_CT] *tile* granularity instead: every
tile of the degree-ranked plane whose edge count beats the measured
break-even (~tile_pairs * gather_rate / dense_rate ~ 800 edges) is routed to
the Pallas kernels via a per-tile (row-chunk, col-tile) schedule (scalar
prefetch); everything else stays on the binned gather path.

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

# Planner constants.  These are EMPIRICAL, not the bare primitive rates:
# round 5 re-measured the machine (dense kernels ~49e9 pairs/s; small-table
# fused bin passes 180-340M slots/s compound) and re-planned reddit with
# (48e9, 220e6) — break-even ~1700 edges/tile, dense hub 4238 tiles instead
# of 11341 — and the result measured STRICTLY WORSE, paired in one window
# (train 0.48-0.69s vs 0.28-0.49s, infer 0.35 vs 0.23s).  Two reasons the
# aggressive-gather plan loses at Reddit scale:
#   1. Residual gathers there hit the BIG-table rate (~104-124M rows/s at
#      242MB tables), not the 220-450M small-table rate.
#   2. A smaller hub returns mid-degree rows (deg 64-2000) to the bins,
#      whose widths then exceed pallas_bins.PALLAS_MAX_W — those bins fall
#      off the fused-kernel path onto the ~45M slots/s XLA formulation
#      (the d7 experiment put 4.6M of 9.5M residual slots there).
# The low gather figure keeps the hub big enough that every residual bin
# stays on the fused path (reddit residual dmax 64).  Small graphs are
# insensitive: their plans saturate at "every profitable tile kept" well
# before the ratio matters (cora keeps its 10-tile hub at either setting,
# measured faster WITH it: 0.96 vs 1.20 ms paired).
DENSE_PAIRS_PER_S = 6.5e10
GATHER_ROWS_PER_S = 45e6
# Estimated padding overhead of the binned path on residual edges.
SPARSE_PAD = 1.25
# A dense block must save at least this much per pass to pay for its op
# dispatch + combine-table slot.  Measured floor of the whole fused op on a
# tiny graph is ~13us (scripts/exp_overhead.py); 50us measured strictly
# better than 300us on cora (fullfwd 434us vs 593us, exp_small_dense.py) —
# round-3's 300us was a stale guess that kept small graphs off the MXU.
MIN_SAVE_S = 50e-6


@dataclasses.dataclass(frozen=True)
class DensePlan:
    """Host-side tile-sparse dense block (see module docstring).

    ``row_ids``/``col_ids`` are the kept row-chunks'/col-tiles' node ids
    concatenated in degree-rank order (0-padded to DENSE_RT/DENSE_CT
    multiples); ``mask[t]`` is the bit-plane packed adjacency of schedule
    entry t, whose rows are ``row_ids[rc[t]*RT:(rc[t]+1)*RT]`` and columns
    ``col_ids[ct[t]*CT:(ct[t]+1)*CT]``.  The schedule is sorted by (rc, ct)
    so each output row-chunk is visited consecutively; ``first[t]`` marks
    the first tile of its row chunk (kernel accumulator init)."""

    row_ids: np.ndarray   # [Rpad] int32 (kept chunks, rank order, 0-padded)
    col_ids: np.ndarray   # [Cpad] int32 (kept col tiles, rank order)
    mask: np.ndarray      # [T, DENSE_RT, DENSE_CT//8] uint8 bit-plane packed
    rc: np.ndarray        # [T] int32 row-chunk index per schedule entry
    ct: np.ndarray        # [T] int32 col-tile index per schedule entry
    first: np.ndarray     # [T] int32 1 iff first entry of its row chunk
    num_rows: int         # real (unpadded) row count

    def half_schedule(self):
        """Schedule at half row granularity over the SAME mask bytes.

        VMEM-constrained kernels (GMM backward) run [RT/2, CT] blocks; the
        mask array viewed as [2T, RT/2, CT//8] already contains each tile's
        top/bottom halves at indices 2t/2t+1, so only the schedule arrays
        change: entry (t, sub) processes row chunk rc[t]*2+sub with mask
        tile mt=2t+sub, ordered so each half-chunk is visited consecutively.
        Returns (rc2, ct2, first2, mt) int32 arrays of length 2T."""
        T = len(self.rc)
        rc = np.asarray(self.rc, np.int64)
        ct = np.asarray(self.ct, np.int64)
        big = np.repeat(np.arange(T), 2)
        sub = np.tile(np.arange(2), T)
        order = np.lexsort((ct[big], sub, rc[big]))
        big, sub = big[order], sub[order]
        rc2 = (rc[big] * 2 + sub).astype(np.int32)
        first2 = np.ones(len(big), np.int32)
        first2[1:] = (rc2[1:] != rc2[:-1]).astype(np.int32)
        return (rc2, ct[big].astype(np.int32), first2,
                (big * 2 + sub).astype(np.int32))


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
               heads: int = 4):
    """Select the degree-ranked tiles worth routing through the MXU.

    Returns (rows_by_rank, cols_by_rank, keep[nrc, nct] bool) or None when
    no tile beats the gather path.  ``keep[i, j]`` covers rank rows
    [i*RT, (i+1)*RT) x rank cols [j*CT, (j+1)*CT).

    Cost model (per pass, measured rates above): a kept tile costs
    RT*CT / DENSE_PAIRS_PER_S and saves its edges off the rate-bound gather
    path (SPARSE_PAD / GATHER_ROWS_PER_S each); a used col tile additionally
    costs CT setup-gather rows (source features), a used row chunk RT rows
    (destination scalars) — amortized over the tiles that share them, which
    the greedy drop loop below accounts for.

    The adjacency may be rectangular: the column index space is
    ``len(out_deg)`` (e.g. a graph shard's extended local+halo space,
    parallel/partition.py), which need not equal the row count.
    """
    row_ptr = np.asarray(row_ptr, np.int64)
    deg_in = np.diff(row_ptr)
    n = len(deg_in)
    n_cols = len(out_deg)
    rows_by_rank = np.argsort(deg_in, kind="stable")[::-1].astype(np.int64)
    cols_by_rank = np.argsort(out_deg, kind="stable")[::-1].astype(np.int64)
    rank_in = np.empty(n, np.int64)
    rank_in[rows_by_rank] = np.arange(n)
    rank_out = np.empty(n_cols, np.int64)
    rank_out[cols_by_rank] = np.arange(n_cols)

    nrc = -(-n // DENSE_RT)
    nct = -(-n_cols // DENSE_CT)
    ti = (np.repeat(rank_in, deg_in) // DENSE_RT).astype(np.int64)
    tj = (rank_out[col_ind] // DENSE_CT).astype(np.int64)
    hist = np.bincount(ti * nct + tj, minlength=nrc * nct).reshape(nrc, nct)

    eg = SPARSE_PAD / GATHER_ROWS_PER_S              # s saved per edge
    tile_s = DENSE_RT * DENSE_CT / DENSE_PAIRS_PER_S  # s per kept tile
    save = hist * eg - tile_s                        # [nrc, nct] float
    keep = save > 0
    # amortize setup gathers: drop whole col tiles / row chunks whose summed
    # tile savings don't cover their per-pass setup gather
    col_setup = DENSE_CT / GATHER_ROWS_PER_S
    row_setup = DENSE_RT / GATHER_ROWS_PER_S
    for _ in range(3):
        col_sav = np.where(keep, save, 0.0).sum(axis=0) - col_setup
        keep &= (col_sav > 0)[None, :]
        row_sav = np.where(keep, save, 0.0).sum(axis=1) - row_setup
        keep &= (row_sav > 0)[:, None]
    if not keep.any():
        return None
    total = (np.where(keep, save, 0.0).sum()
             - col_setup * keep.any(axis=0).sum()
             - row_setup * keep.any(axis=1).sum())
    if total < MIN_SAVE_S:
        return None
    # mask budget: keep the highest-saving tiles
    t_bytes = DENSE_RT * DENSE_CT // 8
    max_tiles = max(1, mask_budget_bytes // t_bytes)
    if keep.sum() > max_tiles:
        flat = np.where(keep, save, -np.inf).ravel()
        cutoff = np.partition(flat, -max_tiles)[-max_tiles]
        keep &= (save >= cutoff)
    return rows_by_rank, cols_by_rank, keep


def build_dense_numpy(row_ptr: np.ndarray, col_ind: np.ndarray,
                      row_sel: np.ndarray, col_sel: np.ndarray,
                      keep: np.ndarray | None = None,
                      num_cols: int | None = None):
    """Materialize the tile-sparse dense block + residual CSR.

    Args:
      row_ptr/col_ind: the adjacency (any direction; may be rectangular —
        pass ``num_cols`` when the column id space differs from the row
        count, e.g. a shard's extended local+halo space).
      row_sel: node ids whose rank-rows participate (rank order = position);
        col_sel: node ids whose rank-columns participate.  ``keep[i, j]``
        selects tile (row chunk i of row_sel, col tile j of col_sel); None
        keeps every tile (the forced-rectangle path).  An edge is dense iff
        its (row, col) lands in a kept tile; everything else is residual.
    Returns (DensePlan, residual_row_ptr, residual_col_ind,
             residual_edge_ids) where residual_edge_ids are positions into
      the original col_ind (for callers carrying per-edge data).
    """
    row_ptr = np.asarray(row_ptr, np.int64)
    col_ind = np.asarray(col_ind, np.int64)
    n = len(row_ptr) - 1
    nc = n if num_cols is None else int(num_cols)
    deg = np.diff(row_ptr)
    row_sel = np.asarray(row_sel, np.int64)
    col_sel = np.asarray(col_sel, np.int64)

    nrc = -(-len(row_sel) // DENSE_RT)
    nct = -(-len(col_sel) // DENSE_CT)
    if keep is None:
        keep = np.ones((nrc, nct), bool)
    keep = np.asarray(keep, bool)
    assert keep.shape == (nrc, nct), (keep.shape, nrc, nct)

    # rank position (or -1) per node id, in each axis
    row_rank = np.full(n, -1, np.int64)
    row_rank[row_sel] = np.arange(len(row_sel))
    col_rank = np.full(nc, -1, np.int64)
    col_rank[col_sel] = np.arange(len(col_sel))

    # compact kept chunks / col tiles
    kept_rc = np.nonzero(keep.any(axis=1))[0]       # original chunk index
    kept_ct = np.nonzero(keep.any(axis=0))[0]
    rc_pos = np.full(nrc, -1, np.int64)
    rc_pos[kept_rc] = np.arange(len(kept_rc))
    ct_pos = np.full(nct, -1, np.int64)
    ct_pos[kept_ct] = np.arange(len(kept_ct))
    # schedule: kept tiles sorted by (compacted rc, compacted ct)
    t_i, t_j = np.nonzero(keep)
    order = np.lexsort((ct_pos[t_j], rc_pos[t_i]))
    t_i, t_j = t_i[order], t_j[order]
    rc_arr = rc_pos[t_i].astype(np.int32)
    ct_arr = ct_pos[t_j].astype(np.int32)
    first = np.ones(len(rc_arr), np.int32)
    first[1:] = (rc_arr[1:] != rc_arr[:-1]).astype(np.int32)
    tile_id = np.full((nrc, nct), -1, np.int64)
    tile_id[t_i, t_j] = np.arange(len(t_i))
    T = len(t_i)

    # per-edge tile membership
    rows_per_edge = np.repeat(np.arange(n), deg)
    er_rank = row_rank[rows_per_edge]
    ec_rank = col_rank[col_ind]
    inside = (er_rank >= 0) & (ec_rank >= 0)
    et = np.full(len(col_ind), -1, np.int64)
    et[inside] = tile_id[er_rank[inside] // DENSE_RT,
                         ec_rank[inside] // DENSE_CT]
    e_dense = et >= 0

    # --- residual CSR (row ids unchanged) ---
    keep_e = ~e_dense
    res_counts = np.bincount(rows_per_edge[keep_e], minlength=n)
    res_row_ptr = np.zeros(n + 1, np.int64)
    np.cumsum(res_counts, out=res_row_ptr[1:])
    res_col_ind = col_ind[keep_e]
    res_edge_ids = np.nonzero(keep_e)[0]

    # --- per-tile masks, filled as one [T*RT, CT//8] bit-plane image ---
    er = et[e_dense] * DENSE_RT + er_rank[e_dense] % DENSE_RT
    ec = ec_rank[e_dense] % DENSE_CT
    try:
        from .. import native
        assert native.available()
        mask = native.dense_mask_fill(er, ec, T * DENSE_RT, DENSE_CT,
                                      DENSE_CT)
    except Exception:
        mask01 = np.zeros((T * DENSE_RT, DENSE_CT), bool)
        mask01[er, ec] = True
        mask = pack_mask_bits(mask01)
    mask = mask.reshape(T, DENSE_RT, DENSE_CT // 8)

    # compacted id lists (kept chunks'/tiles' ranks, 0-padded)
    row_chunks = _pad_to(row_sel, DENSE_RT).reshape(-1, DENSE_RT)
    col_tiles = _pad_to(col_sel, DENSE_CT).reshape(-1, DENSE_CT)
    row_ids = row_chunks[kept_rc].reshape(-1)
    col_ids = col_tiles[kept_ct].reshape(-1)
    # real (unpadded) rows among the kept chunks: all but the possibly
    # part-padded last chunk of row_sel
    real = np.zeros(nrc * DENSE_RT, bool)
    real[:len(row_sel)] = True
    num_real = int(real.reshape(nrc, DENSE_RT)[kept_rc].sum())

    plan = DensePlan(
        row_ids=row_ids.astype(np.int32),
        col_ids=col_ids.astype(np.int32),
        mask=mask,
        rc=rc_arr,
        ct=ct_arr,
        first=first,
        num_rows=num_real,
    )
    return plan, res_row_ptr, res_col_ind, res_edge_ids
