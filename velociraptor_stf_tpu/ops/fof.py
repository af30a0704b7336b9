"""Friends-of-Friends as min-label propagation over a flat candidate list.

TPU-native replacement for NBodylib's ``KDTree::FOF`` / ``FOFCriterion``
engines (missing submodule; call sites at /root/reference/src/search.cxx:110,
414,575) and for the reference's ``Head/Next/Tail/Len`` linked-list group
bookkeeping (/root/reference/src/buildandsortarrays.cxx).

Algorithm (cf. PAPERS.md: hybrid union-find FOF, jFoF):
  1. bin particles into cells with width >= linking radius (ops/cells.py);
  2. build a **flat CSR candidate list**: for every sorted particle, the
     particles of its 27-cell stencil as one contiguous run of "flat slots"
     (row = particle, col = candidate).  The per-cell windows are contiguous
     slices of the cell-sorted array, so the whole table is built with
     cumsums + searchsorted — no padding waste on a clustered distribution
     (the dominant cost on TPU is gather bandwidth, which scales with the
     number of *actual* candidate pairs, not paddedcell capacity);
  3. evaluate the pair criterion once per flat slot -> edge mask, then
     compact the surviving edges (optional second pass);
  4. label fixed point over edges inside one jit (``lax.while_loop``):
       a. ``nmin[i] = min(labels[i], min_{(i,j) in E} labels[j])``
          (flat gather + scatter-min);
       b. hook: ``labels[labels[i]] <- min(..., nmin[i])``;
       c. bounded path compression ``labels <- labels[labels]``;
  5. renumber components 1..ngroups by decreasing size (reference
     ``ReorderGroupIDs`` semantics, pfof=0 for below-min-size).

The criterion is pluggable: 3DFOF is ``d2 <= b^2``; 6DFOF and the
phase-space stream criteria (reference fofalgo.cxx) receive extra
per-particle fields gathered per flat slot.  Everything is statically
shaped; the only host decisions are the padded flat-slot / edge counts
(single scalar fetches, rounded to powers of two to bound recompiles).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .cells import Binning, CellGrid, INT32_MAX, bin_particles, build_grid, \
    pack_cells, unpack_cells

PairPredicate = Callable[[jnp.ndarray, Dict[str, jnp.ndarray],
                          Dict[str, jnp.ndarray]], jnp.ndarray]

_SENTINEL = np.int32(np.iinfo(np.int32).max)


def _pair_d2_bcast(own_pos, nbr_pos, grid: CellGrid):
    """Squared distances with periodic minimum image (broadcasting)."""
    d = own_pos - nbr_pos
    if grid.periodic:
        box = jnp.asarray(grid.boxsize, d.dtype)
        d = d - box * jnp.round(d / box)
    return jnp.sum(d * d, axis=-1)


# 9 (dx,dy) column offsets; each covers dz in {-1,0,1} as one contiguous
# window of the cell-sorted particle array (packed ids of a z-run are
# consecutive integers, so their particles are one contiguous slice).
_OFFSETS_XY = np.stack(
    np.meshgrid(np.arange(-1, 2), np.arange(-1, 2), indexing="ij"), -1
).reshape(-1, 2).astype(np.int32)


def neighbor_windows(binning: Binning, grid: CellGrid, tile_cells: int):
    """Per occupied cell, the 9 contiguous candidate windows (+ wrap cells).

    Returns (awin_start, awin_cnt, bwin_start, bwin_cnt):
      awin_*: (9, C) particle-range windows covering cells
              (x+dx, y+dy, z-1..z+1) — each a single contiguous slice;
      bwin_*: (9, C) single-cell windows for the periodic z-wrap remainder
              (z-1 or z+1 wrapping around the box); all-zero when the grid
              is non-periodic or nz < 3.
    Label-independent; computed once per FOF call.
    """
    n = binning.order.shape[0]
    C = tile_cells
    nx, ny, nz = grid.ncells
    ucid = binning.ucid[:C]
    is_pad = ucid == INT32_MAX
    coords = unpack_cells(jnp.where(is_pad, 0, ucid), grid)       # (C,3)
    x, y, z = coords[:, 0], coords[:, 1], coords[:, 2]
    start_ext = jnp.concatenate(
        [binning.cell_start[:C], jnp.full((1,), n, jnp.int32)])

    a_starts, a_cnts, b_starts, b_cnts = [], [], [], []
    zero = jnp.zeros_like(x)
    for dx, dy in _OFFSETS_XY:
        if grid.periodic:
            xq = jnp.mod(x + dx, nx)
            yq = jnp.mod(y + dy, ny)
            ok = ~is_pad
        else:
            xq, yq = x + dx, y + dy
            ok = (~is_pad) & (xq >= 0) & (xq < nx) & (yq >= 0) & (yq < ny)
            xq = jnp.clip(xq, 0, nx - 1)
            yq = jnp.clip(yq, 0, ny - 1)
        base = (xq * ny + yq) * nz
        if grid.periodic and nz >= 3:
            zlo = jnp.where(z == 0, 0, z - 1)
            zhi = jnp.where(z == nz - 1, nz - 1, z + 1)
            wrap = (z == 0) | (z == nz - 1)
            zb = jnp.where(z == 0, nz - 1, zero)
        elif grid.periodic:  # nz < 3: whole column
            zlo, zhi = zero, jnp.full_like(z, nz - 1)
            wrap = jnp.zeros_like(x, bool)
            zb = zero
        else:
            zlo = jnp.maximum(z - 1, 0)
            zhi = jnp.minimum(z + 1, nz - 1)
            wrap = jnp.zeros_like(x, bool)
            zb = zero
        idlo, idhi = base + zlo, base + zhi
        clo = jnp.searchsorted(ucid, idlo, side="left").astype(jnp.int32)
        chi = jnp.searchsorted(ucid, idhi, side="right").astype(jnp.int32)
        ps, pe = start_ext[clo], start_ext[chi]
        a_starts.append(ps)
        a_cnts.append(jnp.where(ok, pe - ps, 0))
        # wrap remainder: single cell
        idb = base + zb
        cb = jnp.searchsorted(ucid, idb, side="left").astype(jnp.int32)
        cbc = jnp.minimum(cb, C - 1)
        found = ok & wrap & (ucid[cbc] == idb)
        b_starts.append(binning.cell_start[cbc])
        b_cnts.append(jnp.where(found, binning.cell_count[cbc], 0))
    return (jnp.stack(a_starts), jnp.stack(a_cnts),
            jnp.stack(b_starts), jnp.stack(b_cnts))


# ---------------------------------------------------------------------------
# Flat candidate table (particle-major CSR over the 27-cell stencil)
# ---------------------------------------------------------------------------

# Above this many grid cells the dense per-cell prefix table (int32 per
# cell + 1) is too large; fall back to searchsorted over occupied cells.
_DENSE_TABLE_MAX_CELLS = 1 << 28


@partial(jax.jit, static_argnames=("grid",))
def candidate_counts(binning: Binning, grid: CellGrid):
    """Per-particle stencil windows + total candidate count.

    Returns (pst, pcn, T): ``pst``/``pcn`` are (N, 18) int32 window starts /
    counts per *sorted particle* (its cell's 9 column windows + 9 periodic
    z-wrap cells); ``T`` is the scalar total number of candidate slots
    (device value — fetch once to pick the static padded size).

    Fast path: a dense per-cell particle-offset prefix table (histogram +
    cumsum) turns every window lookup into two direct table reads —
    searchsorted's 20+ binary-search rounds of gathers are ~10x slower on
    TPU.
    """
    if grid.total_cells <= _DENSE_TABLE_MAX_CELLS:
        return _candidate_counts_dense(binning, grid)
    n = binning.order.shape[0]
    a_s, a_c, b_s, b_c = neighbor_windows(binning, grid, n)
    starts = jnp.concatenate([a_s, b_s], 0).T        # (C,18)
    cnts = jnp.concatenate([a_c, b_c], 0).T
    pst = starts[binning.pcell]                      # (N,18)
    pcn = cnts[binning.pcell]
    # int32 total: fine up to ~2^31 candidate slots (~256^3 particles at
    # FOF densities); larger runs must chunk the build over the flat axis.
    return pst, pcn, jnp.sum(pcn.sum(axis=1))


def _candidate_counts_dense(binning: Binning, grid: CellGrid):
    """Window lookups via a dense global prefix table.

    ``pstart[c]`` = index of the first sorted particle whose packed cell id
    is >= c, so the particles of the contiguous cell-id run [lo, hi] are
    exactly sorted indices [pstart[lo], pstart[hi+1]).
    """
    n = binning.order.shape[0]
    nx, ny, nz = grid.ncells
    total = grid.total_cells
    cid_s = binning.cid_sorted
    hist = jnp.zeros(total + 1, jnp.int32).at[cid_s + 1].add(1)
    pstart = jnp.cumsum(hist)                        # (total+1,)
    coords = unpack_cells(cid_s, grid)               # (N,3)
    x, y, z = coords[:, 0], coords[:, 1], coords[:, 2]
    zero = jnp.zeros_like(x)

    if grid.periodic and nz >= 3:
        zlo = jnp.where(z == 0, 0, z - 1)
        zhi = jnp.where(z == nz - 1, nz - 1, z + 1)
        wrap = (z == 0) | (z == nz - 1)
        zb = jnp.where(z == 0, nz - 1, zero)
    elif grid.periodic:  # nz < 3: whole column
        zlo, zhi = zero, jnp.full_like(z, nz - 1)
        wrap = jnp.zeros_like(x, bool)
        zb = zero
    else:
        zlo = jnp.maximum(z - 1, 0)
        zhi = jnp.minimum(z + 1, nz - 1)
        wrap = jnp.zeros_like(x, bool)
        zb = zero

    psts, pcns = [], []
    bsts, bcns = [], []
    for dx, dy in _OFFSETS_XY:
        if grid.periodic:
            xq = jnp.mod(x + dx, nx)
            yq = jnp.mod(y + dy, ny)
            ok = None
        else:
            xq, yq = x + dx, y + dy
            ok = (xq >= 0) & (xq < nx) & (yq >= 0) & (yq < ny)
            xq = jnp.clip(xq, 0, nx - 1)
            yq = jnp.clip(yq, 0, ny - 1)
        base = (xq * ny + yq) * nz
        s = pstart[base + zlo]
        e = pstart[base + zhi + 1]
        cnt = e - s
        if ok is not None:
            cnt = jnp.where(ok, cnt, 0)
        psts.append(s)
        pcns.append(cnt)
        idb = base + zb
        sb = pstart[idb]
        cb = pstart[idb + 1] - sb
        cb = jnp.where(wrap, cb, 0)
        if ok is not None:
            cb = jnp.where(ok, cb, 0)
        bsts.append(sb)
        bcns.append(cb)
    pst = jnp.stack(psts + bsts, axis=1)             # (N,18)
    pcn = jnp.stack(pcns + bcns, axis=1)
    return pst, pcn, jnp.sum(pcn.sum(axis=1))


# Half stencil: each unordered pair of distinct cells appears exactly once
# ((dx,dy) lexicographically positive columns; the own column is covered by a
# forward window starting at the particle's own sorted index + 1, which also
# yields each same-cell pair once).  Halves the candidate table and the edge
# list vs the full 27-cell stencil; requires symmetric pair criteria and the
# symmetric (two-scatter) label sweep.
_OFFSETS_XY_HALF = np.array([(0, 1), (1, -1), (1, 0), (1, 1)], np.int32)


@partial(jax.jit, static_argnames=("grid",))
def candidate_counts_half(binning: Binning, grid: CellGrid):
    """Per-sorted-particle half-stencil windows (N, 10) + total count.

    Columns 0-4: forward a-windows (own column [i+1 .. end of z+1 cell],
    then full z-runs of the 4 forward (dx,dy) columns); columns 5-9: the
    periodic z-wrap single-cell remainders.  Every unordered candidate pair
    appears exactly once (duplicates only on degenerate periodic grids with
    < 3 cells per dim, where they are harmless for min propagation).
    Requires the dense prefix table (grid.total_cells bounded).
    """
    n = binning.order.shape[0]
    nx, ny, nz = grid.ncells
    total = grid.total_cells
    cid_s = binning.cid_sorted
    hist = jnp.zeros(total + 1, jnp.int32).at[cid_s + 1].add(1)
    pstart = jnp.cumsum(hist)
    coords = unpack_cells(cid_s, grid)
    x, y, z = coords[:, 0], coords[:, 1], coords[:, 2]
    zero = jnp.zeros_like(x)
    i_sorted = jnp.arange(n, dtype=jnp.int32)

    if grid.periodic and nz >= 3:
        zlo = jnp.where(z == 0, 0, z - 1)
        zhi = jnp.where(z == nz - 1, nz - 1, z + 1)
        wrap_lo = z == 0
        wrap_hi = z == nz - 1
    else:
        zlo = jnp.maximum(z - 1, 0)
        zhi = jnp.minimum(z + 1, nz - 1)
        wrap_lo = jnp.zeros_like(x, bool)
        wrap_hi = jnp.zeros_like(x, bool)

    psts, pcns = [], []
    bsts, bcns = [], []

    # own column: [i+1, end of z+1 cell] (+ z-wrap cell when z == nz-1)
    base0 = (x * ny + y) * nz
    e0 = pstart[base0 + zhi + 1]
    psts.append(i_sorted + 1)
    pcns.append(jnp.maximum(e0 - (i_sorted + 1), 0))
    sb0 = pstart[base0]
    cb0 = jnp.where(wrap_hi, pstart[base0 + 1] - sb0, 0)
    bsts.append(sb0)
    bcns.append(cb0)

    for dx, dy in _OFFSETS_XY_HALF:
        if grid.periodic:
            xq = jnp.mod(x + dx, nx)
            yq = jnp.mod(y + dy, ny)
            ok = None
        else:
            xq, yq = x + dx, y + dy
            ok = (xq >= 0) & (xq < nx) & (yq >= 0) & (yq < ny)
            xq = jnp.clip(xq, 0, nx - 1)
            yq = jnp.clip(yq, 0, ny - 1)
        base = (xq * ny + yq) * nz
        s = pstart[base + zlo]
        e = pstart[base + zhi + 1]
        cnt = e - s
        if ok is not None:
            cnt = jnp.where(ok, cnt, 0)
        psts.append(s)
        pcns.append(cnt)
        # z-wrap remainder: the single cell on the other side of the box
        zb = jnp.where(wrap_lo, nz - 1, zero)
        idb = base + zb
        sb = pstart[idb]
        cb = pstart[idb + 1] - sb
        cb = jnp.where(wrap_lo | wrap_hi, cb, 0)
        if ok is not None:
            cb = jnp.where(ok, cb, 0)
        bsts.append(sb)
        bcns.append(cb)

    pst = jnp.stack(psts + bsts, axis=1)             # (N,10)
    pcn = jnp.stack(pcns + bcns, axis=1)
    return pst, pcn, jnp.sum(pcn.sum(axis=1))


@partial(jax.jit, static_argnames=("grid", "predicate", "t_pad"))
def _edges_fused(pos_s, fields_s, pst, pcn, grid: CellGrid,
                 predicate: PairPredicate, t_pad: int):
    """Expand windows -> evaluate criterion -> compact, in one dispatch.

    Returns (erow, ecol, nedges) with erow/ecol length t_pad (slice to the
    padded edge count on the host).  Keeping the three stages in one jit
    avoids materialising the (row, col, valid) candidate table to HBM
    between dispatches.
    """
    row, col, valid = flat_candidates(pst, pcn, t_pad)
    mask = flat_links(pos_s, fields_s, row, col, valid, grid, predicate)
    return compact_edges(row, col, mask, t_pad)


# ---------------------------------------------------------------------------
# Slab-chunked half-stencil edge build for grids beyond int32 packed ids
# (cell width stays = linking length; a coarser grid would inflate the
# candidate count 8x).  Particles are keyed by (x-plane, within-plane id)
# int32 pairs; x-slabs small enough for a local dense prefix table are
# processed one dispatch-bounded chunk at a time.
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("grid",))
def _xplane_binning(pos, grid: CellGrid):
    """Sort particles by (x-plane, y*nz+z); returns (order, x_s, lo_s)."""
    from .cells import cell_coords
    coords = cell_coords(pos, grid)
    _, ny, nz = grid.ncells
    x = coords[..., 0]
    lo = coords[..., 1] * nz + coords[..., 2]
    order = jnp.lexsort((lo, x)).astype(jnp.int32)
    return order, x[order], lo[order]


@partial(jax.jit, static_argnames=("grid", "x_wpl", "ext_cap", "rpad"))
def _slab_windows(x_s, lo_s, p_lo, p_hi, p_ext, x0, grid: CellGrid,
                  x_wpl: int, ext_cap: int, rpad: int):
    """Half-stencil windows for one x-slab via a local dense prefix table.

    Core particles: sorted range [p_lo, p_hi); candidates come from the
    extended range [p_lo, p_ext) covering planes [x0, x0+x_wpl].  Window
    starts are GLOBAL sorted indices.  The periodic x-wrap (x = nx-1 ->
    x = 0) is handled by a separate wrap pass, not here.
    Returns (pst, pcn, T) with shapes (rpad, 10).
    """
    n = x_s.shape[0]
    nx, ny, nz = grid.ncells
    plane = ny * nz
    tbl = (x_wpl + 1) * plane
    # local prefix table over the extended range
    eids = p_lo + jnp.arange(ext_cap, dtype=jnp.int32)
    evalid = eids < p_ext
    eidc = jnp.minimum(eids, n - 1)
    lcid = (x_s[eidc] - x0) * plane + lo_s[eidc]
    lcid = jnp.where(evalid & (lcid >= 0) & (lcid < tbl), lcid, tbl)
    hist = jnp.zeros(tbl + 2, jnp.int32).at[lcid + 1].add(1, mode="drop")
    pstart = jnp.cumsum(hist[: tbl + 1])        # local ext-range offsets

    rows = jnp.arange(rpad, dtype=jnp.int32)
    rids = p_lo + rows
    rvalid = rids < p_hi
    ridc = jnp.minimum(rids, n - 1)
    x = x_s[ridc]
    lo = lo_s[ridc]
    y = lo // nz
    z = lo % nz
    zero = jnp.zeros_like(x)

    if grid.periodic and nz >= 3:
        zlo = jnp.where(z == 0, 0, z - 1)
        zhi = jnp.where(z == nz - 1, nz - 1, z + 1)
        wrap_lo = z == 0
        wrap_hi = z == nz - 1
    else:
        zlo = jnp.maximum(z - 1, 0)
        zhi = jnp.minimum(z + 1, nz - 1)
        wrap_lo = jnp.zeros_like(x, bool)
        wrap_hi = jnp.zeros_like(x, bool)

    psts, pcns, bsts, bcns = [], [], [], []
    # own column forward window [i+1, end of z+1 cell]
    base0 = (x - x0) * plane + y * nz
    e0 = p_lo + pstart[jnp.clip(base0 + zhi + 1, 0, tbl)]
    psts.append(rids + 1)
    pcns.append(jnp.where(rvalid, jnp.maximum(e0 - (rids + 1), 0), 0))
    sb0 = p_lo + pstart[jnp.clip(base0, 0, tbl)]
    cb0 = pstart[jnp.clip(base0 + 1, 0, tbl)] - pstart[jnp.clip(base0, 0, tbl)]
    bsts.append(sb0)
    bcns.append(jnp.where(rvalid & wrap_hi, cb0, 0))

    for dx, dy in _OFFSETS_XY_HALF:
        xq = x + dx
        if grid.periodic:
            # xq == nx is the x-wrap (handled by the wrap pass) -> drop
            ok = xq < nx
            yq = jnp.mod(y + dy, ny)
        else:
            ok = (xq < nx)
            yq = y + dy
            ok = ok & (yq >= 0) & (yq < ny)
            yq = jnp.clip(yq, 0, ny - 1)
        ok = ok & rvalid
        base = (xq - x0) * plane + yq * nz
        s = pstart[jnp.clip(base + zlo, 0, tbl)]
        e = pstart[jnp.clip(base + zhi + 1, 0, tbl)]
        psts.append(p_lo + s)
        pcns.append(jnp.where(ok, e - s, 0))
        zb = jnp.where(wrap_lo, nz - 1, zero)
        idb = base + zb
        sb = pstart[jnp.clip(idb, 0, tbl)]
        cb = pstart[jnp.clip(idb + 1, 0, tbl)] - sb
        cb = jnp.where(ok & (wrap_lo | wrap_hi), cb, 0)
        bsts.append(p_lo + sb)
        bcns.append(cb)

    pst = jnp.stack(psts + bsts, axis=1)
    pcn = jnp.stack(pcns + bcns, axis=1)
    return pst, pcn, jnp.sum(pcn.sum(axis=1))


@partial(jax.jit, static_argnames=("grid", "wpad", "q_cap"))
def _wrap_windows(x_s, lo_s, wstart, q1, grid: CellGrid, wpad: int,
                  q_cap: int):
    """Periodic x-wrap windows: particles in plane x = nx-1 against the
    particles of plane x = 0 (sorted indices [0, q1)).  (wpad, 6) windows:
    3 (dy) z-run a-windows + 3 z-wrap cells, global indices."""
    n = x_s.shape[0]
    nx, ny, nz = grid.ncells
    plane = ny * nz
    qids = jnp.arange(q_cap, dtype=jnp.int32)
    qvalid = qids < q1
    lq = jnp.where(qvalid, lo_s[jnp.minimum(qids, n - 1)], plane)
    hist = jnp.zeros(plane + 2, jnp.int32).at[
        jnp.clip(lq, 0, plane) + 1].add(qvalid.astype(jnp.int32),
                                        mode="drop")
    pstart = jnp.cumsum(hist[: plane + 1])

    rows = jnp.arange(wpad, dtype=jnp.int32)
    rids = wstart + rows
    rvalid = rids < n
    ridc = jnp.minimum(rids, n - 1)
    lo = lo_s[ridc]
    y = lo // nz
    z = lo % nz
    zero = jnp.zeros_like(y)
    if nz >= 3:
        zlo = jnp.where(z == 0, 0, z - 1)
        zhi = jnp.where(z == nz - 1, nz - 1, z + 1)
        wrap_lo = z == 0
        wrap_hi = z == nz - 1
    else:
        zlo, zhi = zero, jnp.full_like(z, nz - 1)
        wrap_lo = jnp.zeros_like(y, bool)
        wrap_hi = jnp.zeros_like(y, bool)
    psts, pcns, bsts, bcns = [], [], [], []
    for dy in (-1, 0, 1):
        yq = jnp.mod(y + dy, ny)
        base = yq * nz
        s = pstart[jnp.clip(base + zlo, 0, plane)]
        e = pstart[jnp.clip(base + zhi + 1, 0, plane)]
        psts.append(s)
        pcns.append(jnp.where(rvalid, e - s, 0))
        zb = jnp.where(wrap_lo, nz - 1, zero)
        idb = base + zb
        sb = pstart[jnp.clip(idb, 0, plane)]
        cb = pstart[jnp.clip(idb + 1, 0, plane)] - sb
        bsts.append(sb)
        bcns.append(jnp.where(rvalid & (wrap_lo | wrap_hi), cb, 0))
    pst = jnp.stack(psts + bsts, axis=1)
    pcn = jnp.stack(pcns + bcns, axis=1)
    return pst, pcn, jnp.sum(pcn.sum(axis=1))


@partial(jax.jit, static_argnames=("grid", "predicate", "t_pad", "rchunk"))
def _edges_fused_offset(pos_s, fields_s, pst, pcn, r0, r1, row_offset,
                        grid: CellGrid, predicate: PairPredicate,
                        t_pad: int, rchunk: int):
    """Expand + evaluate + compact for window rows [r0, r1) of a (R, W)
    window table whose row r corresponds to global sorted particle
    row_offset + r.  ``rchunk`` >= r1 - r0 is the static slice length; the
    table is zero-padded so the dynamic slice never clamps (a clamped
    start would silently mis-map rows).  Returns (erow, ecol, ne) with
    global indices."""
    W = pst.shape[1]
    pstp = jnp.pad(pst, ((0, rchunk), (0, 0)))
    pcnp = jnp.pad(pcn, ((0, rchunk), (0, 0)))
    pstc = jax.lax.dynamic_slice(pstp, (r0, 0), (rchunk, W))
    pcnc = jax.lax.dynamic_slice(pcnp, (r0, 0), (rchunk, W))
    rvalid = (r0 + jnp.arange(rchunk, dtype=jnp.int32)) < r1
    pcnc = jnp.where(rvalid[:, None], pcnc, 0)
    row, col, valid = flat_candidates(pstc, pcnc, t_pad,
                                      ncols=pos_s.shape[0])
    grow = jnp.clip(row_offset + r0 + row, 0, pos_s.shape[0] - 1)
    mask = flat_links(pos_s, fields_s, grow, col, valid, grid, predicate)
    return compact_edges(grow, col, mask, t_pad)


def _pad_class(x: int, lo: int = 1024) -> int:
    return _pad_pow2(max(int(x), 1), lo)


_SLAB_T_BUDGET = 1 << 25   # flat candidate slots per expansion dispatch


def build_edges_slabbed(pos, linking_length: float, boxsize: float,
                        fields: Optional[Dict[str, jnp.ndarray]],
                        predicate: PairPredicate,
                        grid: CellGrid,
                        t_budget: Optional[int] = None):
    """Half-stencil undirected edge list for grids too large for packed
    int32 cell ids (the 256^3+ path): x-slab local tables + dispatch-bounded
    expansion chunks.  Returns (FlatEdges, grid)."""
    if t_budget is None:
        t_budget = _SLAB_T_BUDGET
    pos = jnp.asarray(pos)
    n = pos.shape[0]
    nx, ny, nz = grid.ncells
    plane = ny * nz
    order, x_s, lo_s = _xplane_binning(pos, grid)
    pos_s = pos[order]
    fields_s = {k: jnp.asarray(v)[order] for k, v in (fields or {}).items()}

    wx = max(1, min(nx, _DENSE_TABLE_MAX_CELLS // plane - 1))
    nslab = -(-nx // wx)
    xbounds = np.minimum(np.arange(nslab + 1) * wx, nx)
    # particle index of each slab boundary plane (+ x=1 and x=nx-1 for the
    # wrap pass) in one device searchsorted
    queries = np.concatenate([xbounds, [1, nx - 1]]).astype(np.int32)
    qpos = np.asarray(jax.device_get(
        jnp.searchsorted(x_s, jnp.asarray(queries), side="left")))
    pbounds, q1, wstart = qpos[:nslab + 1], int(qpos[-2]), int(qpos[-1])

    erows, ecols = [], []

    def _expand_rows(pst, pcn, T, row_offset):
        """Chunk the (R, W) window table into t_budget expansions."""
        R = pst.shape[0]
        rowsum = jnp.sum(pcn, axis=1)
        cum = jnp.cumsum(rowsum)
        nchunk = max(1, -(-int(T) // t_budget))
        marks = np.asarray(jax.device_get(jnp.searchsorted(
            cum, jnp.asarray([(k + 1) * t_budget for k in range(nchunk)],
                             jnp.int32), side="left")))
        starts = np.concatenate([[0], np.minimum(marks[:-1] + 1, R)])
        ends = np.concatenate([np.minimum(marks[:-1] + 1, R), [R]])
        # per-chunk slot totals (cumulative row sums at the chunk ends)
        cum_ends = np.asarray(jax.device_get(
            cum[jnp.asarray(np.maximum(ends - 1, 0), jnp.int32)]))
        cum_starts = np.asarray(jax.device_get(
            cum[jnp.asarray(np.maximum(starts - 1, 0), jnp.int32)]))
        totals = cum_ends - np.where(starts > 0, cum_starts, 0)
        for r0, r1, tot in zip(starts, ends, totals):
            if r1 <= r0 or tot <= 0:
                continue
            rchunk = _pad_class(r1 - r0)
            t_pad = _pad_class(int(tot), lo=1 << 16)
            erow, ecol, ne = _edges_fused_offset(
                pos_s, fields_s, pst, pcn, int(r0), int(r1), row_offset,
                grid, predicate, t_pad, rchunk)
            nev = int(jax.device_get(ne))
            keep = _pad_class(nev)
            erows.append(erow[:keep])
            ecols.append(ecol[:keep])

    # extended range of slab i ends at the particle boundary of plane
    # x0 + wx + 1 (one plane beyond the core, for the forward dx=+1 windows)
    ext_queries = np.minimum(xbounds[:-1] + wx + 1, nx).astype(np.int32)
    ext_pos = np.asarray(jax.device_get(
        jnp.searchsorted(x_s, jnp.asarray(ext_queries), side="left")))
    for i in range(nslab):
        p_lo, p_hi = int(pbounds[i]), int(pbounds[i + 1])
        p_ext = int(ext_pos[i])
        if p_hi <= p_lo:
            continue
        rpad = _pad_class(p_hi - p_lo)
        ext_cap = _pad_class(p_ext - p_lo)
        pst, pcn, T = _slab_windows(
            x_s, lo_s, jnp.int32(p_lo), jnp.int32(p_hi), jnp.int32(p_ext),
            jnp.int32(int(xbounds[i])), grid, wx, ext_cap, rpad)
        Tv = int(jax.device_get(T))
        if Tv == 0:
            continue
        _expand_rows(pst[: rpad], pcn[: rpad], Tv, p_lo)

    if grid.periodic and nx >= 2 and wstart < n and q1 > 0:
        wpad = _pad_class(n - wstart)
        q_cap = _pad_class(q1)
        pstw, pcnw, Tw = _wrap_windows(x_s, lo_s, jnp.int32(wstart),
                                       jnp.int32(q1), grid, wpad, q_cap)
        Twv = int(jax.device_get(Tw))
        if Twv > 0:
            _expand_rows(pstw, pcnw, Twv, wstart)

    if not erows:
        erow = jnp.zeros(1024, jnp.int32)
        ecol = jnp.zeros(1024, jnp.int32)
    else:
        # concatenate chunk buffers; padded tails hold (0,0) self-edges,
        # which are no-ops for min-label propagation
        erow = jnp.concatenate(erows)
        ecol = jnp.concatenate(ecols)
    return FlatEdges(erow, ecol, n, order, pos_s, fields_s,
                     undirected=True)


@partial(jax.jit, static_argnames=("grid", "radius"))
def candidate_counts_radius(binning: Binning, grid: CellGrid, radius: int):
    """Non-periodic stencil windows of radius r ((2r+1)^3 cells) per sorted
    particle, via the dense prefix table.  Used by the gravity near-field
    (reference tree-walk acceptance analog, unbind.cxx:24-45).

    Returns (pst, pcn, T) with (N, (2r+1)^2) window columns.
    """
    nx, ny, nz = grid.ncells
    total = grid.total_cells
    cid_s = binning.cid_sorted
    hist = jnp.zeros(total + 1, jnp.int32).at[cid_s + 1].add(1)
    pstart = jnp.cumsum(hist)
    coords = unpack_cells(cid_s, grid)
    x, y, z = coords[:, 0], coords[:, 1], coords[:, 2]
    zlo = jnp.maximum(z - radius, 0)
    zhi = jnp.minimum(z + radius, nz - 1)
    psts, pcns = [], []
    for dx in range(-radius, radius + 1):
        for dy in range(-radius, radius + 1):
            xq, yq = x + dx, y + dy
            ok = (xq >= 0) & (xq < nx) & (yq >= 0) & (yq < ny)
            xq = jnp.clip(xq, 0, nx - 1)
            yq = jnp.clip(yq, 0, ny - 1)
            base = (xq * ny + yq) * nz
            s = pstart[base + zlo]
            e = pstart[base + zhi + 1]
            psts.append(s)
            pcns.append(jnp.where(ok, e - s, 0))
    pst = jnp.stack(psts, axis=1)
    pcn = jnp.stack(pcns, axis=1)
    return pst, pcn, jnp.sum(pcn.sum(axis=1))


@partial(jax.jit, static_argnames=("t_pad", "ncols"))
def flat_candidates(pst: jnp.ndarray, pcn: jnp.ndarray, t_pad: int,
                    ncols: Optional[int] = None):
    """Expand per-row windows into flat (row, col) candidate slots.

    Returns (row, col, valid), each (t_pad,): ``row`` is the index of the
    window-owning entity (sorted particle for FOF; halo for SO search),
    ``col`` the candidate's sorted-particle index (< ``ncols``, default =
    number of rows — the FOF case where rows are particles too).  Slots
    beyond the true total are invalid (row/col clipped, valid=False).

    Built with the marks + cumsum segment-expansion trick (one scatter-add
    of segment starts, one cumsum over flat slots, two flat gathers) —
    gathers and searchsorted are ~10x slower per element than cumsum on
    TPU, so this formulation is gather-minimal.
    """
    n = pst.shape[0] if ncols is None else ncols
    nwin = pst.shape[1]
    seg_start = pst.reshape(-1)                       # (nwin*N,) window starts
    seg_len = pcn.reshape(-1)                         # (nwin*N,) window counts
    csum = jnp.cumsum(seg_len)
    total = csum[-1]
    seg_off = csum - seg_len                          # flat offset per segment
    nseg = seg_len.shape[0]
    segidx1 = jnp.where(seg_len > 0,
                        jnp.arange(1, nseg + 1, dtype=jnp.int32), 0)
    marks = jnp.zeros(t_pad, jnp.int32).at[seg_off].max(segidx1, mode="drop")
    seg = jax.lax.cummax(marks) - 1                   # (t_pad,) segment index
    segc = jnp.clip(seg, 0, nseg - 1)
    t = jnp.arange(t_pad, dtype=jnp.int32)
    col = seg_start[segc] + (t - seg_off[segc])
    row = segc // nwin
    valid = t < total
    return row.astype(jnp.int32), jnp.clip(col, 0, n - 1), valid


# Below this source-table size, gather 2D arrays component-wise: XLA's TPU
# gather of (T, 3) rows from a small table can pick a (8, 128)-tiled result
# layout that pads the minor dim 3 -> 128 (~42x memory blowup -> OOM).
# Component gathers are ~4x slower per element but layout-safe; large tables
# get the fast row-gather layout.
_COLS_GATHER_MAX = 1 << 18


def _gather2(v: jnp.ndarray, idx: jnp.ndarray):
    if v.ndim == 2 and v.shape[0] < _COLS_GATHER_MAX:
        return jnp.stack([v[:, j][idx] for j in range(v.shape[1])], axis=-1)
    return v[idx]


def _gather_fields(fields: Dict[str, jnp.ndarray], idx: jnp.ndarray):
    return {k: _gather2(v, idx) for k, v in fields.items()}


@partial(jax.jit, static_argnames=("grid", "predicate"))
def flat_links(pos_s, fields_s, row, col, valid, grid: CellGrid,
               predicate: PairPredicate):
    """Evaluate the pair criterion once per flat slot -> edge mask (t_pad,).

    Criteria are static (positions + per-particle fields only), so the mask
    is computed once per FOF invocation; label sweeps then only gather
    labels.  Self-pairs are kept (they are no-ops for min propagation).
    """
    d2 = _pair_d2_bcast(_gather2(pos_s, row), _gather2(pos_s, col), grid)
    own = _gather_fields(fields_s, row)
    nbr = _gather_fields(fields_s, col)
    return predicate(d2, own, nbr) & valid


@partial(jax.jit, static_argnames=("e_pad",))
def compact_edges(row, col, mask, e_pad: int):
    """Compact masked flat slots into dense (e_pad,) edge arrays.

    Padded edge slots become (0, 0) self-edges — harmless for min
    propagation.  Returns (erow, ecol, nedges).
    """
    dest = jnp.cumsum(mask) - 1
    dest = jnp.where(mask, dest, e_pad)
    erow = jnp.zeros(e_pad, jnp.int32).at[dest].set(row, mode="drop")
    ecol = jnp.zeros(e_pad, jnp.int32).at[dest].set(col, mode="drop")
    return erow, ecol, jnp.sum(mask)


@partial(jax.jit, static_argnames=("n", "nsweeps"))
def _fof_sweeps(labels, erow, ecol, n: int, nsweeps: int):
    """Up to nsweeps hook+compress rounds; returns (labels, changed)."""

    def sweep(l):
        nmin = l.at[erow].min(l[ecol])
        hooked = l.at[l].min(nmin)
        x = hooked
        for _ in range(4):
            x = x[x]
        return x

    def body(state):
        l, _, it = state
        new = sweep(l)
        return new, jnp.any(new != l), it + 1

    def cond(state):
        _, changed, it = state
        return changed & (it < nsweeps)

    labels, changed, _ = jax.lax.while_loop(
        cond, body, (labels, jnp.bool_(True), jnp.int32(0)))
    return labels, changed


def _compress(labels: jnp.ndarray) -> jnp.ndarray:
    """Full path compression: labels <- labels[labels] to fixpoint."""

    def cond(l):
        return jnp.any(l != l[l])

    def body(l):
        return l[l[l]]  # double jump per iteration

    return jax.lax.while_loop(cond, body, labels)


@partial(jax.jit, static_argnames=("n", "nsweeps"))
def _fof_sweeps_sym(labels, erow, ecol, n: int, nsweeps: int):
    """Symmetric hook+compress rounds for an *undirected* edge list (each
    pair present once); propagates the min label both ways per edge."""

    def sweep(l):
        lr = l[erow]
        lc = l[ecol]
        nmin = l.at[erow].min(lc)
        nmin = nmin.at[ecol].min(lr)
        hooked = l.at[l].min(nmin)
        x = hooked
        for _ in range(4):
            x = x[x]
        return x

    def body(state):
        l, _, it = state
        new = sweep(l)
        return new, jnp.any(new != l), it + 1

    def cond(state):
        _, changed, it = state
        return changed & (it < nsweeps)

    labels, changed, _ = jax.lax.while_loop(
        cond, body, (labels, jnp.bool_(True), jnp.int32(0)))
    return labels, changed


@jax.jit
def _active_edge_mask(labels, erow, ecol):
    """Edges whose endpoints already share a label carry no further
    information (labels only ever merge) and can be dropped mid-fixpoint."""
    return labels[erow] != labels[ecol]


@partial(jax.jit, static_argnames=("n", "nsweeps", "undirected"))
def _sweeps_then_shrink(labels, erow, ecol, n: int, nsweeps: int,
                        undirected: bool):
    """nsweeps hook+compress rounds, then compact the still-active edges
    (endpoints with different labels) to the front — one dispatch, one
    (changed, n_active) fetch.  Dropped edges are final: labels only ever
    merge, so equal-label endpoints stay equal."""
    sweeps = _fof_sweeps_sym if undirected else _fof_sweeps
    labels, changed = sweeps(labels, erow, ecol, n, nsweeps)
    mask = _active_edge_mask(labels, erow, ecol)
    erow2, ecol2, ne = compact_edges(erow, ecol, mask, erow.shape[0])
    return labels, changed, erow2, ecol2, ne


def fof_labels_from_edges(erow, ecol, n: int, max_sweeps: int = 64,
                          sweeps_per_call: int = 16,
                          undirected: bool = False,
                          shrink: bool = True) -> jnp.ndarray:
    """Label fixed point over an edge list; chunked host-side so a single
    device dispatch stays bounded (the axon TPU tunnel kills long-running
    programs).

    ``undirected``: edge list holds each pair once (half-stencil build);
    sweeps then scatter the min label in both directions.

    ``shrink``: after the first sweep, compact the edge list to the
    still-active edges — on clustered FOF inputs ~75% of edges are
    intra-clump and converge immediately, so the remaining sweeps run on a
    fraction of the list.  Host syncs: one (changed, count) fetch per
    shrink + one convergence fetch per chunk of sweeps.
    """
    sweeps = _fof_sweeps_sym if undirected else _fof_sweeps
    labels = jnp.arange(n, dtype=jnp.int32)
    done = 0
    # two shrink rounds: ~75% of edges converge in sweep 1 and ~95% within
    # three sweeps on clustered inputs, so the tail sweeps run on a tiny
    # list; each round costs one compaction + one (changed, count) fetch
    for k in (1, 2):
        if not (shrink and erow.shape[0] > (1 << 18) and done < max_sweeps):
            break
        labels, changed, erow2, ecol2, ne = _sweeps_then_shrink(
            labels, erow, ecol, n, k, undirected)
        done += k
        changed, ne = jax.device_get((changed, ne))
        if not bool(changed):
            return _compress(labels)
        keep = _pad_pow2(max(int(ne), 1))
        if keep <= erow.shape[0] // 2:
            erow, ecol = erow2[:keep], ecol2[:keep]
    while done < max_sweeps:
        labels, changed = sweeps(labels, erow, ecol, n, sweeps_per_call)
        done += sweeps_per_call
        if not bool(jax.device_get(changed)):
            break
    return _compress(labels)


@partial(jax.jit, static_argnames=("grid", "predicate", "t_pad",
                                   "max_sweeps"))
def fof_labels_flat(pos_sorted, fields, binning, grid: CellGrid,
                    predicate: PairPredicate, t_pad: int,
                    max_sweeps: int = 64) -> jnp.ndarray:
    """Single-dispatch FOF: candidate build + links + label fixed point.

    Pure jittable path (used by the driver entry / multichip dryrun and by
    small per-structure searches).  ``t_pad`` must be >= the true total
    candidate count (overestimate freely; invalid slots are masked).
    """
    pst, pcn, _ = candidate_counts(binning, grid)
    row, col, valid = flat_candidates(pst, pcn, t_pad)
    mask = flat_links(pos_sorted, fields, row, col, valid, grid, predicate)
    n = pos_sorted.shape[0]
    erow = jnp.where(mask, row, 0)
    ecol = jnp.where(mask, col, 0)
    labels, _ = _fof_sweeps(jnp.arange(n, dtype=jnp.int32), erow, ecol, n,
                            max_sweeps)
    return _compress(labels)


@jax.jit
def renumber_by_size(labels: jnp.ndarray, min_size,
                     orig_index: Optional[jnp.ndarray] = None
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Renumber root labels to 1..ngroups by decreasing size; 0 = untagged.

    Mirrors the reference's group numbering convention
    (``MPICompileGroups``/``ReorderGroupIDs``: groups sorted by size, ids
    start at 1, particles in groups below min_size get pfof=0).
    Tie-break: smaller minimum original particle index first (deterministic).
    Returns (pfof, ngroups) in the same (sorted) order as ``labels``.

    ``min_size`` is TRACED (value-only, no shape dependence): the
    substructure recursion calls this with per-structure thresholds and
    a static argument would recompile per distinct value.
    """
    n = labels.shape[0]
    sizes = jnp.zeros(n, jnp.int32).at[labels].add(1)            # per root id
    if orig_index is None:
        orig_index = jnp.arange(n, dtype=jnp.int32)
    min_id = jnp.full(n, np.iinfo(np.int32).max, jnp.int32)
    min_id = min_id.at[labels].min(orig_index)
    eligible = sizes >= min_size
    # sort roots by (-size, min_id); ineligible roots sink to the end
    key_size = jnp.where(eligible, sizes, 0)
    rank_order = jnp.lexsort((min_id, -key_size))                # (n,) root ids
    ngroups = jnp.sum(eligible & (sizes > 0)).astype(jnp.int32)
    gid_of_root = jnp.zeros(n, jnp.int32)
    ranks = jnp.arange(n, dtype=jnp.int32)
    gid_of_root = gid_of_root.at[rank_order].set(
        jnp.where(ranks < ngroups, ranks + 1, 0))
    pfof = gid_of_root[labels]
    return pfof, ngroups


# ---------------------------------------------------------------------------
# Pair criteria (reference fofalgo.h / NBodylib FOF3d/FOF6d)
# ---------------------------------------------------------------------------

import dataclasses


@dataclasses.dataclass(frozen=True)
class Pred3D:
    """Plain 3DFOF: physical separation within linking length.

    Frozen dataclass so equal parameters hash equal -> stable jit cache
    (criteria are static arguments of the compiled FOF kernels).
    """

    symmetric = True

    b2: float

    def __call__(self, d2, own, nbr):
        return d2 <= self.b2


@dataclasses.dataclass(frozen=True)
class Pred3DTypes:
    """FOF3dDM (fofalgo.cxx): both particles must be of the given type for a
    link (baryons may not form links; used when iBaryonSearch>1)."""

    symmetric = True

    b2: float
    dark_type: int = 1

    def __call__(self, d2, own, nbr):
        ok = (own["ptype"] == self.dark_type) & (nbr["ptype"] == self.dark_type)
        return (d2 <= self.b2) & ok


@dataclasses.dataclass(frozen=True)
class Pred6D:
    """FOF6d: dx^2/ellx^2 + dv^2/ellv^2 <= 1, optionally restricted to pairs
    in the same parent (3DFOF) group (reference search.cxx:552-576 runs the
    6D search per 3DFOF group)."""

    symmetric = True

    b2: float
    v2: float
    same_group: bool = True

    def __call__(self, d2, own, nbr):
        dv2 = jnp.sum((own["vel"] - nbr["vel"]) ** 2, axis=-1)
        ok = d2 / self.b2 + dv2 / self.v2 <= 1.0
        if self.same_group:
            ok = ok & (own["group"] == nbr["group"])
        return ok


@dataclasses.dataclass(frozen=True)
class Pred6DScaled:
    """6DFOF on pre-scaled phase coordinates (unit ball), with the velocity
    scale baked into a per-particle field (adaptive variant)."""

    symmetric = True

    same_group: bool = True

    def __call__(self, d2, own, nbr):
        dv2 = jnp.sum((own["vel"] - nbr["vel"]) ** 2, axis=-1)
        ok = d2 + dv2 / own["vscale2"] <= 1.0
        if self.same_group:
            ok = ok & (own["group"] == nbr["group"])
        return ok


# backwards-compatible constructors
def make_pred_3d(b2: float) -> PairPredicate:
    return Pred3D(float(b2))


def make_pred_3d_types(b2: float, dark_type: int = 1) -> PairPredicate:
    return Pred3DTypes(float(b2), dark_type)


def make_pred_6d(b2: float, v2: float, same_group: bool = True) -> PairPredicate:
    return Pred6D(float(b2), float(v2), same_group)


def make_pred_6d_scaled(same_group: bool = True) -> PairPredicate:
    return Pred6DScaled(same_group)


# ---------------------------------------------------------------------------
# High-level drivers
# ---------------------------------------------------------------------------

def _pad_pow2(x: int, lo: int = 1024) -> int:
    k = lo
    while k < x:
        k *= 2
    return k


class FlatEdges:
    """Edge list between sorted particles under a static pair criterion.

    Built once per search; reused by label fixed points, attach/expansion
    passes and nearest-assignment sweeps (the varying per-iteration state
    only ever gathers along the fixed edges).  ``undirected``: each pair
    appears once (half-stencil build) — label fixed points must then use
    the symmetric sweep.
    """

    def __init__(self, erow, ecol, n: int, order, pos_s=None, fields_s=None,
                 undirected: bool = False):
        self.erow = erow          # (E_pad,) sorted-particle index
        self.ecol = ecol          # (E_pad,)
        self.n = n                # particle count
        self.order = order        # sorted -> original index map
        self.pos_s = pos_s        # (N,3) sorted positions
        self.fields_s = fields_s  # sorted per-particle fields
        self.undirected = undirected


def build_edges(pos, linking_length: float,
                boxsize: Optional[float] = None,
                fields: Optional[Dict[str, jnp.ndarray]] = None,
                predicate: Optional[PairPredicate] = None,
                bounds: Optional[Tuple[np.ndarray, np.ndarray]] = None,
                target_cells_per_dim: Optional[int] = None,
                compact: Optional[bool] = None,
                half: Optional[bool] = None) -> Tuple[FlatEdges, Binning,
                                                      CellGrid]:
    """Bin + candidate table + criterion pass -> compacted edge list.

    Host syncs: bounds (unless periodic or given), the total candidate
    count, and (when compacting) the edge count — each a single scalar
    fetch.

    ``half``: build the undirected half-stencil edge list (each pair once;
    half the table, half the edges).  Default: on when the criterion is
    symmetric (all shipped criteria are; a custom predicate opts in by
    defining ``symmetric = True``) and the dense prefix table fits.
    """
    pos = jnp.asarray(pos)
    n = pos.shape[0]
    periodic = boxsize is not None and boxsize > 0
    if periodic:
        lo = np.zeros(3)
        hi = np.full(3, boxsize)
    elif bounds is not None:
        lo, hi = bounds
    else:
        lo, hi = jax.device_get((jnp.min(pos, 0), jnp.max(pos, 0)))
    if predicate is None:
        predicate = Pred3D(float(linking_length) ** 2)
    symmetric = bool(getattr(predicate, "symmetric", False))
    # grids beyond the dense-table budget: keep cell width = linking length
    # and use the slab-chunked builder (a coarser grid would inflate the
    # candidate count ~8x per halving)
    grid_full = build_grid(np.asarray(lo), np.asarray(hi), linking_length,
                           periodic=periodic, boxsize=boxsize or 0.0,
                           max_total_cells=1 << 62,
                           target_cells_per_dim=target_cells_per_dim)
    if symmetric and half is not False and \
            grid_full.total_cells > _DENSE_TABLE_MAX_CELLS:
        edges = build_edges_slabbed(pos, linking_length, boxsize or 0.0,
                                    fields, predicate, grid_full)
        return edges, None, grid_full
    grid = build_grid(np.asarray(lo), np.asarray(hi), linking_length,
                      periodic=periodic, boxsize=boxsize or 0.0,
                      target_cells_per_dim=target_cells_per_dim)
    if half is None:
        half = symmetric and grid.total_cells <= _DENSE_TABLE_MAX_CELLS
    # dense-prefix-table candidate paths never touch the occupied-cell
    # index; skip building it (unique + searchsorted cost ~20x the sort)
    lean = grid.total_cells <= _DENSE_TABLE_MAX_CELLS
    binning = bin_particles(pos, grid, lean=lean)
    if half:
        pst, pcn, T = candidate_counts_half(binning, grid)
    else:
        pst, pcn, T = candidate_counts(binning, grid)
    T = int(jax.device_get(T))
    t_pad = _pad_pow2(max(T, 1))
    order = binning.order
    pos_s = pos[order]
    fields_s = {k: jnp.asarray(v)[order] for k, v in (fields or {}).items()}
    if compact is None:
        compact = T > (1 << 22)
    if compact:
        erow, ecol, ne = _edges_fused(pos_s, fields_s, pst, pcn, grid,
                                      predicate, t_pad)
        e_pad = _pad_pow2(max(int(jax.device_get(ne)), 1))
        if e_pad < t_pad:
            erow, ecol = erow[:e_pad], ecol[:e_pad]
    else:
        row, col, valid = flat_candidates(pst, pcn, t_pad)
        mask = flat_links(pos_s, fields_s, row, col, valid, grid, predicate)
        erow = jnp.where(mask, row, 0)
        ecol = jnp.where(mask, col, 0)
    return FlatEdges(erow, ecol, n, order, pos_s, fields_s,
                     undirected=half), binning, grid


def fof3d(
    pos,
    linking_length: float,
    boxsize: Optional[float] = None,
    min_size: int = 8,
    vel=None,
    extra_fields: Optional[Dict[str, jnp.ndarray]] = None,
    predicate: Optional[PairPredicate] = None,
    capacity: Optional[int] = None,           # legacy, ignored
    target_cells_per_dim: Optional[int] = None,
    return_order: bool = False,
    bounds: Optional[Tuple[np.ndarray, np.ndarray]] = None,
):
    """3DFOF over positions (optionally with a custom criterion).

    Mirrors reference SearchFullSet's 3DFOF stage (search.cxx:24-213).
    Returns (pfof, ngroups) with pfof in *original* particle order, group ids
    1..ngroups sorted by decreasing size, 0 = untagged.
    """
    pos = jnp.asarray(pos)
    n = pos.shape[0]
    fields = {}
    if vel is not None:
        fields["vel"] = jnp.asarray(vel)
    if extra_fields:
        for k, v in extra_fields.items():
            fields[k] = jnp.asarray(v)
    edges, binning, grid = build_edges(
        pos, linking_length, boxsize=boxsize, fields=fields,
        predicate=predicate, target_cells_per_dim=target_cells_per_dim,
        bounds=bounds)
    labels = fof_labels_from_edges(edges.erow, edges.ecol, n,
                                   undirected=edges.undirected)
    order = edges.order
    pfof_sorted, ngroups = renumber_by_size(labels, min_size,
                                            orig_index=order)
    pfof = jnp.zeros(n, jnp.int32).at[order].set(pfof_sorted)
    if return_order:
        return pfof, ngroups, order
    return pfof, ngroups


# ---------------------------------------------------------------------------
# Edge-based auxiliary sweeps (attach / nearest-assign)
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("nrounds",))
def attach_rounds(labels, erow, ecol, nrounds: int):
    """Untagged particles adopt the min group id among linked tagged
    neighbours; repeated until exhaustion (or nrounds).

    ``labels``: group ids in sorted order (0 = untagged).  Used for the
    iterative-search expansion (reference FOFStreamwithprobIterative,
    fofalgo.cxx:36-50) — the edges already encode the static geometric
    criterion; the tagged/untagged gating varies per round.
    """
    big = jnp.int32(np.iinfo(np.int32).max)
    n = labels.shape[0]

    def body(state):
        l, _, it = state
        lc = l[ecol]
        cand = jnp.where(lc > 0, lc, big)
        nmin = jnp.full(n, big, jnp.int32).at[erow].min(cand)
        new = jnp.where((l == 0) & (nmin != big), nmin, l)
        return new, jnp.any(new != l), it + 1

    def cond(state):
        _, changed, it = state
        return changed & (it < nrounds)

    labels, _, _ = jax.lax.while_loop(
        cond, body, (labels, jnp.bool_(True), jnp.int32(0)))
    return labels


@partial(jax.jit, static_argnames=("grid", "predicate"))
def refine_edge_mask(pos_s, fields_s, erow, ecol, grid: CellGrid,
                     predicate: PairPredicate):
    """Re-evaluate a (tighter) pair criterion along an existing edge list.

    Valid when the new criterion implies the old one spatially (e.g. 6DFOF
    with ``ell6d <= ell3d``: every 6D-linked pair is already a 3D edge,
    reference search.cxx:552-576) — the expensive candidate build is reused.
    """
    d2 = _pair_d2_bcast(_gather2(pos_s, erow), _gather2(pos_s, ecol), grid)
    own = _gather_fields(fields_s, erow)
    nbr = _gather_fields(fields_s, ecol)
    return predicate(d2, own, nbr)


@partial(jax.jit, static_argnames=("metric", "grid"))
def nearest_assign_edges(groups_s, pos_s, fields_s, erow, ecol,
                         grid: CellGrid, metric):
    """Assign each untagged particle the group of its generalized-nearest
    tagged neighbour along the edge list.

    ``metric(d2, own, nbr) -> (dist, eligible)`` per edge.  Returns
    (best_group, best_dist) per sorted particle, (0, +inf) where no
    eligible neighbour.  Reference: SearchBaryons phase-space association
    (search.cxx:3201+).
    """
    n = groups_s.shape[0]
    d2 = _pair_d2_bcast(_gather2(pos_s, erow), _gather2(pos_s, ecol), grid)
    own = _gather_fields(fields_s, erow)
    nbr = _gather_fields(fields_s, ecol)
    dist, elig = metric(d2, own, nbr)
    g = groups_s[ecol]
    ok = elig & (g > 0) & (erow != ecol)
    dist = jnp.where(ok, dist, jnp.inf)
    dmin = jnp.full(n, jnp.inf, dist.dtype).at[erow].min(dist)
    winner = jnp.isfinite(dist) & (dist <= dmin[erow])
    big = jnp.int32(np.iinfo(np.int32).max)
    gmin = jnp.full(n, big, jnp.int32).at[erow].min(
        jnp.where(winner, g, big))
    grp = jnp.where(gmin == big, 0, gmin)
    return grp, dmin
