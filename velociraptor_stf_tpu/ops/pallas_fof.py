"""Pallas TPU FOF: block-range sweep kernels + fused label fixed point.

TPU-native replacement for the gather/scatter edge pipeline in ops/fof.py on
the hot metric path (the reference work being replaced is NBodylib's
``KDTree::FOF`` / per-group 6D phase trees, call sites
/root/reference/src/search.cxx:110,414,552-576).

Design
------
Particles are sorted by packed cell id (cell width >= the linking reach).
For a block of ``R`` consecutive sorted particles spanning cells
``[c0, c1]``, every true neighbour of every row lies — for each x-offset
``dx in {-1,0,+1}`` — inside ONE contiguous sorted-index range::

    [ searchsorted(cid, c0 + dx*ny*nz - nz - 1),
      searchsorted(cid, c1 + dx*ny*nz + nz + 1) )

because the (dy, dz) stencil offsets are bounded by ``nz + 1`` in packed-id
units.  The kernel DMAs those ranges chunk-by-chunk from HBM (double
buffered) and evaluates the pair criterion densely on the VPU: candidate
superset + exact criterion = exact FOF links with zero per-particle window
tables, zero flat-slot expansion and zero edge materialisation.

Periodic boundaries are handled by ghost images: particles within ``reach``
of a box face are replicated (shifted by ±L per axis, three sequential
passes so corners compose), so the grid itself is non-periodic and the
kernel needs no wrap logic.  Ghost slots mirror their source's label each
sweep and fold their neighbour-min back into the source row (compact
ghost-slot lists, not full-array scatters).

The full min-label fixed point (kernel sweep -> ghost fold -> hook ->
pointer jumps -> convergence test) runs inside ONE ``lax.while_loop`` under
jit — zero host syncs through the axon tunnel until the final label fetch.

Mosaic layout rules this module obeys (learned empirically on v5e):
  * HBM arrays are DMA-sliced only along the minor (lane) dim, with
    CH-aligned offsets; all other dims are copied whole -> column data is
    stored transposed ((8, Ns) positions+velocities, (k, Ns) int payloads).
  * 1D arrays tile at (1024,) -> all kernel operands are >= 2D.
  * SMEM whole-array inputs are lane-padded to 128 and capped ~1 MB ->
    block ranges ship as (8, 128) pipelined SMEM windows.
  * No in-kernel transposes: row operands are sublane-major ((R, 4) /
    (R, 1) blocks), column operands lane-major -> (R,1)x(1,CH) broadcasts.
  * d^2 uses coordinate differences, not the norm expansion (f32
    cancellation at box-scale coordinates flips links near d = b).
"""

from __future__ import annotations

import os
from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .cells import CellGrid, build_grid, cell_coords, pack_cells

BIG_I32 = np.int32(2**31 - 1)
SENTINEL = np.float32(1e15)

R_BLOCK = 512      # rows per kernel program
CH = 512           # candidate columns per DMA chunk


def _pad_pow2(x: int, lo: int = 1024) -> int:
    k = lo
    while k < x:
        k *= 2
    return k


# ---------------------------------------------------------------------------
# Ghost images (periodic wrap -> non-periodic extended domain)
# ---------------------------------------------------------------------------

def _ghost_pass(pos, vel, src, axis: int, boxsize: float, reach: float,
                cap: int):
    """One axis of ghost replication.  Particles (including ghosts from
    earlier passes) within ``reach`` of the two faces get an image shifted
    by ±boxsize.  Invalid (padding) slots keep pos=SENTINEL / src=-1.
    Returns (pos, vel, src, count) with ``cap`` appended slots."""
    x = pos[:, axis]
    valid_in = src >= 0
    m_lo = (x < reach) & valid_in
    m_hi = (x >= boxsize - reach) & valid_in
    m = m_lo | m_hi
    dest = jnp.cumsum(m) - 1
    dest = jnp.where(m, dest, cap)
    idx = jnp.zeros(cap, jnp.int32).at[dest].set(
        jnp.arange(pos.shape[0], dtype=jnp.int32), mode="drop")
    count = jnp.sum(m)
    gvalid = jnp.arange(cap) < count
    idx = jnp.where(gvalid, idx, 0)
    shift = jnp.where(m_lo[idx], boxsize, -boxsize).astype(pos.dtype)
    gpos = pos[idx].at[:, axis].add(shift)
    gpos = jnp.where(gvalid[:, None], gpos, SENTINEL)
    gvel = jnp.where(gvalid[:, None], vel[idx], 0.0)
    gsrc = jnp.where(gvalid, src[idx], -1)
    return (jnp.concatenate([pos, gpos]), jnp.concatenate([vel, gvel]),
            jnp.concatenate([src, gsrc]), count)


# ---------------------------------------------------------------------------
# Sorted context: ghosts + binning + block coverage ranges
# ---------------------------------------------------------------------------

class FofSortCtx(NamedTuple):
    """Device arrays shared by the 3D and 6D sweeps (built once)."""

    rows_pos: jnp.ndarray    # (Ns_pad, 4) f32 sorted positions (row layout)
    rows_vel: jnp.ndarray    # (Ns_pad, 4) f32 sorted velocities
    cols_pv: jnp.ndarray     # (8, Ns_pad + CH) f32 [x y z 0 vx vy vz 0]
    ranges: jnp.ndarray      # (nb8, 128) i32 chunk-aligned coverage windows
    src: jnp.ndarray         # (Ns_pad,) i32 original index, -1 = padding
    is_real: jnp.ndarray     # (Ns_pad,) bool (not ghost, not padding)
    real_slot: jnp.ndarray   # (N,) i32 sorted slot of each original particle
    gslots: jnp.ndarray      # (Gcap,) i32 ghost slot list (0-padded no-ops)
    grs: jnp.ndarray         # (Gcap,) i32 matching real (source) slots
    overflow: jnp.ndarray    # () bool ghost capacity exceeded
    n: int                   # original particle count
    ns_pad: int              # padded slot count (nblocks * R_BLOCK)


@partial(jax.jit, static_argnames=("grid", "cap_total", "ns_pad", "caps",
                                   "boxsize", "reach"))
def _build_ctx(pos, vel, grid: CellGrid, caps: Tuple[int, int, int],
               cap_total: int, ns_pad: int, boxsize: float, reach: float):
    n = pos.shape[0]
    src = jnp.arange(n, dtype=jnp.int32)
    overflow = jnp.bool_(False)
    if boxsize > 0:
        for axis in range(3):
            pos, vel, src, cnt = _ghost_pass(pos, vel, src, axis, boxsize,
                                             reach, caps[axis])
            overflow = overflow | (cnt > caps[axis])
    ntot = pos.shape[0]
    assert ntot == cap_total
    cid = pack_cells(cell_coords(pos, grid), grid)
    cid = jnp.where(src >= 0, cid, BIG_I32 // 2)     # padding sorts last
    order = jnp.argsort(cid).astype(jnp.int32)
    cid_s = cid[order]
    pos_s = pos[order]
    vel_s = vel[order]
    src_s = src[order]

    pad = ns_pad - ntot
    rows_pos = jnp.zeros((ns_pad, 4), jnp.float32)
    rows_pos = rows_pos.at[:ntot, :3].set(pos_s)
    rows_pos = rows_pos.at[ntot:, :3].set(SENTINEL)
    rows_vel = jnp.zeros((ns_pad, 4), jnp.float32)
    rows_vel = rows_vel.at[:ntot, :3].set(vel_s)
    cols_pv = jnp.full((8, ns_pad + CH), SENTINEL, jnp.float32)
    cols_pv = cols_pv.at[0:3, :ntot].set(pos_s.T)
    cols_pv = cols_pv.at[3, :].set(0.0)
    cols_pv = cols_pv.at[4:7, :ntot].set(vel_s.T)
    cols_pv = cols_pv.at[7, :].set(0.0)

    src_pad = jnp.concatenate([src_s, jnp.full(pad, -1, jnp.int32)])
    # a slot is a ghost iff its pre-sort index >= n
    is_ghost_s = (order >= n) & (src_s >= 0)
    is_real = jnp.concatenate([(order < n) & (src_s >= 0),
                               jnp.zeros(pad, bool)])
    slot_ids = jnp.arange(ns_pad, dtype=jnp.int32)
    real_slot = jnp.zeros(n, jnp.int32).at[
        jnp.where(is_real[:ntot], src_s, n)].set(slot_ids[:ntot],
                                                 mode="drop")
    # compact ghost slot list: refresh/fold touch only these slots
    g_cap = max(sum(caps), 1)
    gdest = jnp.cumsum(is_ghost_s) - 1
    gdest = jnp.where(is_ghost_s, gdest, g_cap)
    gslots = jnp.zeros(g_cap, jnp.int32).at[gdest].set(
        slot_ids[:ntot], mode="drop")
    gcount = jnp.sum(is_ghost_s)
    gvalid = jnp.arange(g_cap) < gcount
    gslots = jnp.where(gvalid, gslots, 0)
    gsrc = src_pad[gslots]
    grs = jnp.where(gvalid, real_slot[jnp.where(gsrc >= 0, gsrc, 0)], 0)
    gslots = jnp.where(gvalid, gslots, 0)

    # block coverage ranges (chunk-aligned)
    nblocks = ns_pad // R_BLOCK
    nx, ny, nz = grid.ncells
    total = grid.total_cells
    cid_pad = jnp.concatenate(
        [cid_s, jnp.full(pad, BIG_I32 // 2, jnp.int32)])
    bidx = jnp.arange(nblocks, dtype=jnp.int32)
    c0 = jnp.minimum(cid_pad[bidx * R_BLOCK], total - 1)
    c1 = jnp.minimum(cid_pad[jnp.minimum((bidx + 1) * R_BLOCK, ns_pad) - 1],
                     total - 1)
    cols = []
    for dx in (-1, 0, 1):
        delta = dx * ny * nz
        lo_q = c0 + (delta - nz - 1)
        hi_q = c1 + (delta + nz + 1)
        s = jnp.searchsorted(cid_pad, lo_q, side="left").astype(jnp.int32)
        e = jnp.searchsorted(cid_pad, hi_q, side="right").astype(jnp.int32)
        c0ch = s // CH
        nch = jnp.maximum(-(-(e - c0ch * CH) // CH), 0)
        nch = jnp.where(e > s, nch, 0)
        cols.extend([c0ch, nch])
    # SMEM arrays are lane-padded to 128 and capped at ~1 MB; ship ranges
    # as (8, 128) pipelined blocks instead of one whole-array allocation
    nb8 = -(-nblocks // 8) * 8
    ranges = jnp.zeros((nb8, 128), jnp.int32)
    ranges = ranges.at[:nblocks, : len(cols)].set(jnp.stack(cols, axis=1))
    return FofSortCtx(rows_pos, rows_vel, cols_pv, ranges, src_pad, is_real,
                      real_slot, gslots, grs, overflow, n, ns_pad)


def build_fof_ctx(pos, vel, boxsize: Optional[float], reach: float,
                  ghost_fac: float = 3.0) -> FofSortCtx:
    """Host wrapper: pick static capacities / grid, build the device ctx.

    ``reach`` must be >= every linking length later swept on this ctx.
    """
    pos = jnp.asarray(pos, jnp.float32)
    vel = jnp.asarray(vel, jnp.float32)
    n = pos.shape[0]
    periodic = boxsize is not None and boxsize > 0
    if periodic:
        lo = np.full(3, -reach)
        hi = np.full(3, boxsize + reach)
        frac = min(2.0 * reach / boxsize * ghost_fac, 1.0)
        c1 = _pad_pow2(int(n * frac) + 1024, lo=1024)
        c2 = _pad_pow2(int((n + c1) * frac) + 1024, lo=1024)
        c3 = _pad_pow2(int((n + c1 + c2) * frac) + 1024, lo=1024)
        caps = (c1, c2, c3)
        cap_total = n + c1 + c2 + c3
        box = float(boxsize)
    else:
        lo, hi = jax.device_get((jnp.min(pos, 0), jnp.max(pos, 0)))
        caps = (0, 0, 0)
        cap_total = n
        box = 0.0
    grid = build_grid(np.asarray(lo, np.float64), np.asarray(hi, np.float64),
                      reach, periodic=False, boxsize=0.0)
    # packed-id headroom so block queries c1 + ny*nz + nz + 1 cannot
    # overflow int32
    _, ny, nz = grid.ncells
    assert grid.total_cells <= 2**31 - 2 * (ny * nz + nz + 2), \
        "grid too large for the pallas FOF path"
    ns_pad = -(-cap_total // R_BLOCK) * R_BLOCK
    ctx = _build_ctx(pos, vel, grid, caps, cap_total, ns_pad,
                     box, float(reach))
    # jit turns the int fields into device scalars; restore host ints so
    # they can serve as static jit arguments downstream
    return ctx._replace(n=n, ns_pad=ns_pad)


# ---------------------------------------------------------------------------
# Sweep kernels (double-buffered unified chunk loop)
# ---------------------------------------------------------------------------

def _run_chunks(rng_ref, br, nm0, get_dmas, compute):
    """Iterate the 3 coverage windows as one flat double-buffered chunk
    stream.  ``get_dmas(off, slot)`` returns the DMA descriptor pair for a
    chunk; ``compute(nm, slot)`` consumes a filled slot."""
    c00 = rng_ref[br, 0]
    nch0 = rng_ref[br, 1]
    c01 = rng_ref[br, 2]
    nch1 = rng_ref[br, 3]
    c02 = rng_ref[br, 4]
    nch2 = rng_ref[br, 5]
    t1 = nch0 + nch1
    ntot = t1 + nch2

    def off_of(t):
        j1 = t >= nch0
        j2 = t >= t1
        i = t - jnp.where(j2, t1, jnp.where(j1, nch0, 0))
        c0 = jnp.where(j2, c02, jnp.where(j1, c01, c00))
        return (c0 + i) * CH

    @pl.when(ntot > 0)
    def _():
        for dma in get_dmas(off_of(0), 0):
            dma.start()

    def body(t, nm):
        slot = jax.lax.rem(t, 2)

        @pl.when(t + 1 < ntot)
        def _():
            for dma in get_dmas(off_of(t + 1), 1 - slot):
                dma.start()

        for dma in get_dmas(off_of(t), slot):
            dma.wait()
        return compute(nm, slot)

    return jax.lax.fori_loop(0, ntot, body, nm0)


def _sweep_kernel_3d(b2, rng_ref, rpos_ref, rlab_ref, pv_hbm, lab_hbm,
                     out_ref, cpv, clab, sem_pv, sem_int):
    b = pl.program_id(0)
    br = jax.lax.rem(b, 8)
    nm0 = rlab_ref[:]                              # (R,1)

    def get_dmas(off, slot):
        return (
            pltpu.make_async_copy(pv_hbm.at[:, pl.ds(off, CH)],
                                  cpv.at[slot], sem_pv.at[slot]),
            pltpu.make_async_copy(lab_hbm.at[:, pl.ds(off, CH)],
                                  clab.at[slot], sem_int.at[slot]),
        )

    def compute(nm, slot):
        cp = cpv[slot]                             # (8,CH)
        cl = clab[slot]                            # (1,CH)
        dx = rpos_ref[:, 0:1] - cp[0:1, :]
        d2 = dx * dx
        dy = rpos_ref[:, 1:2] - cp[1:2, :]
        d2 += dy * dy
        dz = rpos_ref[:, 2:3] - cp[2:3, :]
        d2 += dz * dz
        cand = jnp.where(d2 <= b2, cl, BIG_I32)
        return jnp.minimum(nm, jnp.min(cand, axis=1, keepdims=True))

    out_ref[:] = _run_chunks(rng_ref, br, nm0, get_dmas, compute)


def _sweep_kernel_6d(inv_b2, rng_ref, rpos_ref, rvel_ref, rivs_ref, rgrp_ref,
                     rlab_ref, pv_hbm, gl_hbm, out_ref, cpv, cgl,
                     sem_pv, sem_int):
    """6D criterion: d2/b6^2 + dv2/vscale2_row <= 1, same nonzero 3D group
    (reference search.cxx:552-576 per-group TPHS-tree FOF)."""
    b = pl.program_id(0)
    br = jax.lax.rem(b, 8)
    nm0 = rlab_ref[:]

    def get_dmas(off, slot):
        return (
            pltpu.make_async_copy(pv_hbm.at[:, pl.ds(off, CH)],
                                  cpv.at[slot], sem_pv.at[slot]),
            pltpu.make_async_copy(gl_hbm.at[:, pl.ds(off, CH)],
                                  cgl.at[slot], sem_int.at[slot]),
        )

    def compute(nm, slot):
        cp = cpv[slot]                             # (8,CH)
        cg = cgl[slot]                             # (2,CH) [group, label]
        dx = rpos_ref[:, 0:1] - cp[0:1, :]
        d2 = dx * dx
        dy = rpos_ref[:, 1:2] - cp[1:2, :]
        d2 += dy * dy
        dz = rpos_ref[:, 2:3] - cp[2:3, :]
        d2 += dz * dz
        du = rvel_ref[:, 0:1] - cp[4:5, :]
        dv2 = du * du
        du = rvel_ref[:, 1:2] - cp[5:6, :]
        dv2 += du * du
        du = rvel_ref[:, 2:3] - cp[6:7, :]
        dv2 += du * du
        phase = d2 * inv_b2 + dv2 * rivs_ref[:]
        ok = (phase <= 1.0) & (rgrp_ref[:] == cg[0:1, :]) & \
            (rgrp_ref[:] > 0)
        cand = jnp.where(ok, cg[1:2, :], BIG_I32)
        return jnp.minimum(nm, jnp.min(cand, axis=1, keepdims=True))

    out_ref[:] = _run_chunks(rng_ref, br, nm0, get_dmas, compute)


def _row_spec(w):
    return pl.BlockSpec((R_BLOCK, w), lambda b: (b, 0),
                        memory_space=pltpu.VMEM)


_RANGE_SPEC_KW = dict(memory_space=pltpu.SMEM)


def _make_sweep_3d(ns_pad: int, b2: float):
    nblocks = ns_pad // R_BLOCK
    return pl.pallas_call(
        partial(_sweep_kernel_3d, np.float32(b2)),
        out_shape=jax.ShapeDtypeStruct((ns_pad, 1), jnp.int32),
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((8, 128), lambda b: (b // 8, 0),
                         memory_space=pltpu.SMEM),
            _row_spec(4),
            _row_spec(1),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=_row_spec(1),
        scratch_shapes=[
            pltpu.VMEM((2, 8, CH), jnp.float32),
            pltpu.VMEM((2, 1, CH), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )


def _make_sweep_6d(ns_pad: int, inv_b2: float):
    nblocks = ns_pad // R_BLOCK
    return pl.pallas_call(
        partial(_sweep_kernel_6d, np.float32(inv_b2)),
        out_shape=jax.ShapeDtypeStruct((ns_pad, 1), jnp.int32),
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((8, 128), lambda b: (b // 8, 0),
                         memory_space=pltpu.SMEM),
            _row_spec(4),
            _row_spec(4),
            _row_spec(1),
            _row_spec(1),
            _row_spec(1),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=_row_spec(1),
        scratch_shapes=[
            pltpu.VMEM((2, 8, CH), jnp.float32),
            pltpu.VMEM((2, 2, CH), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )


# ---------------------------------------------------------------------------
# Label fixed points
# ---------------------------------------------------------------------------

def _fixpoint(sweep_fn, ctx: FofSortCtx, max_sweeps: int, jumps: int = 2):
    """Shared while_loop: ghost refresh -> sweep -> ghost fold -> hook ->
    pointer jumps.  ``sweep_fn(labels) -> nmin`` (both (Ns_pad,) i32).
    Converges when a round changes nothing (min-label updates are monotone,
    so no-change is a valid stopping rule; cf. ops/fof.py::_fof_sweeps)."""
    ns_pad = ctx.src.shape[0]      # static (shape-derived, jit-safe)
    labels0 = jnp.arange(ns_pad, dtype=jnp.int32)

    def body(state):
        l, _, it = state
        # ghosts mirror their source before the sweep (compact list;
        # padded entries are (0, 0) self-copies)
        l = l.at[ctx.gslots].set(l[ctx.grs])
        nm = sweep_fn(l)
        # fold ghost rows' minima back into their real slot
        nm = nm.at[ctx.grs].min(nm[ctx.gslots])
        hooked = l.at[l].min(nm)
        x = hooked
        for _ in range(jumps):
            x = x[x]
        return x, jnp.any(x != l), it + 1

    def cond(state):
        _, changed, it = state
        return changed & (it < max_sweeps)

    labels, _, nit = jax.lax.while_loop(
        cond, body, (labels0, jnp.bool_(True), jnp.int32(0)))

    # final full path compression
    def ccond(l):
        return jnp.any(l != l[l])

    def cbody(l):
        return l[l[l]]

    return jax.lax.while_loop(ccond, cbody, labels), nit


@partial(jax.jit, static_argnames=("ns_pad", "b2", "max_sweeps"))
def _fof3d_labels(ctx: FofSortCtx, ns_pad: int, b2: float,
                  max_sweeps: int = 64):
    sweep = _make_sweep_3d(ns_pad, b2)

    def sweep_fn(labels):
        lab_col = jnp.concatenate(
            [labels, jnp.full(CH, BIG_I32, jnp.int32)])[None, :]
        nm = sweep(ctx.ranges, ctx.rows_pos, labels[:, None],
                   ctx.cols_pv, lab_col)
        return nm[:, 0]

    return _fixpoint(sweep_fn, ctx, max_sweeps)


@partial(jax.jit, static_argnames=("ns_pad", "b2", "max_sweeps"))
def _fof6d_labels(ctx: FofSortCtx, groups_orig, vscale2_orig, ns_pad: int,
                  b2: float, max_sweeps: int = 64):
    """``groups_orig``/``vscale2_orig`` indexed by ORIGINAL particle id."""
    sweep = _make_sweep_6d(ns_pad, 1.0 / b2)
    safe_src = jnp.where(ctx.src >= 0, ctx.src, 0)
    grp_s = jnp.where(ctx.src >= 0, groups_orig[safe_src], 0)
    ivs_s = jnp.where(
        ctx.src >= 0,
        1.0 / jnp.maximum(vscale2_orig[safe_src], 1e-30), 1.0
    ).astype(jnp.float32)

    def sweep_fn(labels):
        gl_col = jnp.stack([
            jnp.concatenate([grp_s, jnp.zeros(CH, jnp.int32)]),
            jnp.concatenate([labels, jnp.full(CH, BIG_I32, jnp.int32)]),
        ])
        nm = sweep(ctx.ranges, ctx.rows_pos, ctx.rows_vel, ivs_s[:, None],
                   grp_s[:, None], labels[:, None], ctx.cols_pv, gl_col)
        return nm[:, 0]

    return _fixpoint(sweep_fn, ctx, max_sweeps)


@partial(jax.jit, static_argnames=("min_size", "n"))
def _renumber_masked(labels, ctx: FofSortCtx, n: int, min_size: int):
    """Size-ordered renumbering over real slots only (ghosts/padding are
    excluded from sizes); returns pfof in ORIGINAL particle order.
    Mirrors ops/fof.py::renumber_by_size semantics (ids 1..ngroups by
    decreasing size, min-original-index tie-break, 0 below min_size)."""
    ns_pad = labels.shape[0]
    w = ctx.is_real.astype(jnp.int32)
    sizes = jnp.zeros(ns_pad, jnp.int32).at[labels].add(w)
    orig = jnp.where(ctx.is_real, ctx.src, BIG_I32)
    min_id = jnp.full(ns_pad, BIG_I32, jnp.int32)
    min_id = min_id.at[labels].min(orig)
    eligible = sizes >= min_size
    key_size = jnp.where(eligible, sizes, 0)
    rank_order = jnp.lexsort((min_id, -key_size))
    ngroups = jnp.sum(eligible & (sizes > 0)).astype(jnp.int32)
    gid_of_root = jnp.zeros(ns_pad, jnp.int32)
    ranks = jnp.arange(ns_pad, dtype=jnp.int32)
    gid_of_root = gid_of_root.at[rank_order].set(
        jnp.where(ranks < ngroups, ranks + 1, 0))
    pfof_slots = gid_of_root[labels]
    pfof = jnp.zeros(n, jnp.int32).at[
        jnp.where(ctx.is_real, ctx.src, n)].set(pfof_slots, mode="drop")
    return pfof, ngroups


# ---------------------------------------------------------------------------
# Public driver
# ---------------------------------------------------------------------------

def pallas_fof_available(n: int, boxsize: Optional[float],
                         reach: float) -> bool:
    """Host check: TPU backend + grid fits packed int32 with headroom."""
    env = os.environ.get("VR_FOF_PALLAS")
    if env == "0":
        return False
    if env != "1" and jax.default_backend() != "tpu":
        return False
    if n < (1 << 14):
        return False
    if boxsize is not None and boxsize > 0:
        ncell = int(np.floor((boxsize + 2 * reach) / reach))
    else:
        return env == "1"  # non-periodic: only when forced (rarely hot)
    nynz = ncell * ncell
    return ncell ** 3 <= 2**31 - 2 * (nynz + ncell + 2)


class PallasFof:
    """Per-snapshot FOF context: build once, sweep 3D and 6D criteria."""

    def __init__(self, pos, vel, boxsize: Optional[float], reach: float):
        self.ctx = build_fof_ctx(pos, vel, boxsize, reach)

    def fof3d(self, linking_length: float, min_size: int):
        labels, _ = _fof3d_labels(self.ctx, self.ctx.ns_pad,
                                  float(linking_length) ** 2)
        return _renumber_masked(labels, self.ctx, self.ctx.n, min_size)

    def fof6d(self, ell6d: float, groups_orig, vscale2_orig, min_size: int):
        labels, _ = _fof6d_labels(self.ctx, jnp.asarray(groups_orig),
                                  jnp.asarray(vscale2_orig, jnp.float32),
                                  self.ctx.ns_pad, float(ell6d) ** 2)
        return _renumber_masked(labels, self.ctx, self.ctx.n, min_size)

    def check_overflow(self):
        return bool(jax.device_get(self.ctx.overflow))
