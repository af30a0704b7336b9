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
    stored transposed ((k, Ns) lane-major).
  * 1D arrays tile at (1024,) -> all kernel operands are >= 2D.
  * SMEM whole-array inputs are lane-padded to 128 and capped ~1 MB ->
    block ranges ship as (8, 128) pipelined SMEM windows.
  * EVERY HBM operand/result is lane-major (k, Ns): a row-major (Ns, k<128)
    operand is tile-padded k -> 128 by the (8,128) layout (a 32-128x HBM
    blowup that OOMs 256^3 boxes).  Row blocks are (k, R_BLOCK) slices of
    the same lane-major arrays the chunk DMA streams, transposed to
    sublane-major ONCE per block inside the kernel.
  * d^2 uses coordinate differences, not the norm expansion (f32
    cancellation at box-scale coordinates flips links near d = b).
  * ONE merged int32 array per sweep (position bits + label row; 6D adds
    velocity/vscale/group rows), so each chunk is ONE DMA descriptor.
    Measured on v5e at 256^3: the sweep runs at the VPU compute roofline
    (~3.1 us per 512-column chunk) plus a fixed ~2.7 us per-chunk issue
    overhead at two descriptors per chunk — descriptor count, not DMA
    latency or bandwidth, is the overhead (buffer depth NBUF=4 changes
    nothing).  Positions travel as raw bits (bitcast, never arithmetic),
    so int32 labels never round-trip through f32 denormals.

Negative results (measured, v5e, 256^3 — kept so they are not retried):
  * Gauss-Seidel label propagation (aliasing the sweep output onto the
    label columns so later grid blocks read earlier blocks' minima) does
    NOT reduce the fixed point's sweep count (6 with or without) — the
    hook + pointer jumps between sweeps already propagate in O(log
    diameter) — and the aliased output costs ~10% per sweep.
  * Extra pointer jumps per round (4 vs 2) slow the fixed point down.
  * DMA buffer depth NBUF=4 (vs 2) changes nothing (not latency-bound).
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

from .cells import CellGrid, build_grid, cell_coords
from ..utils import telemetry

BIG_I32 = np.int32(2**31 - 1)
SENTINEL = np.float32(1e15)
SENT_BITS = np.int32(np.float32(1e15).view(np.int32))   # pos-padding bits

# Rows per kernel program / candidate columns per DMA chunk.  Per-sweep
# pair evaluations scale ~linearly with R_BLOCK (each block's coverage
# window is ~R_BLOCK particles per x-offset at any occupancy), so smaller
# blocks trade VPU work for DMA/program overhead.  CH trades chunk-issue
# overhead against CH-quantisation waste of the ~(R + stripe-occupancy)
# coverage windows; 512/1024 measured best on v5e at 256^3.
R_BLOCK = int(os.environ.get("VR_FOF_RBLOCK", "512"))
CH = int(os.environ.get("VR_FOF_CH", "1024"))
# Double buffering is fixed at depth 2 with STATIC slot indices (the
# chunk loop is pair-unrolled); deeper buffering measured as a no-op.


def _pad_pow2(x: int, lo: int = 1024) -> int:
    k = lo
    while k < x:
        k *= 2
    return k


def _pad_class(x: int, lo: int = 1024) -> int:
    """Smallest quarter-octave capacity class >= x, R_BLOCK-aligned:
    2^k x {1, 1.25, 1.5, 1.75}.  Sweep fixed costs (hook/jump/dirty-map
    passes + empty-block programs) scale with the PADDED slot count, so
    pow2-only classes waste up to 2x on them; quarter-octave bounds the
    waste to 1.19x at 4x the compile-variant count (amortised by the
    persistent compile cache).  VR_FOF_PAD=pow2 restores pow2 classes."""
    if os.environ.get("VR_FOF_PAD") == "pow2":
        return _pad_pow2(x, lo)
    k = _pad_pow2(x, lo)
    if k <= lo:
        return k
    h = k // 2
    for frac in (5, 6, 7):
        cand = -(-(h * frac // 4) // R_BLOCK) * R_BLOCK
        if cand >= x:
            return cand
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
    """Device arrays shared by the 3D and 6D sweeps (built once).

    Cell ids use a two-level (cx, r) pair representation
    (r = cy*nz + cz) so grids beyond 2^31 cells — 256^3+ boxes at FOF
    linking lengths — need no int64: the sort is lexicographic on the
    pair and coverage ranges come from a per-stripe binary search.
    The velocity array is built lazily (``cols_v`` is a zero-size
    placeholder until a 6D sweep needs it) — 3D-only contexts at 512^3
    scale would otherwise double HBM use.
    """

    ccx: jnp.ndarray         # (Ns_pad,) i32 x-cell index (pad = nx)
    ccr: jnp.ndarray         # (Ns_pad,) i32 within-stripe id cy*nz+cz
    # ALL particle data is lane-major (k, Ns_pad [+ CH]): row blocks are
    # (k, R_BLOCK) slices of the same arrays the chunk DMA reads, and the
    # kernels transpose them in VMEM.  Row-major (Ns_pad, k) operands
    # would be tile-padded k -> 128 by Mosaic's (8,128) layout (a 32x HBM
    # blowup that OOMs 256^3 boxes).  cols_p is int32: rows 0-2 carry the
    # f32 position BITS (bitcast; positions only ever move by copy, so
    # labels and positions share one array and each sweep chunk is a
    # single DMA descriptor), row 3 is overwritten with the current label
    # array every sweep.
    cols_p: jnp.ndarray      # (4, Ns_pad + CH) i32 [xb yb zb label]
    cols_v: jnp.ndarray      # (4, Ns_pad + CH) f32 [vx vy vz 0] (lazy)
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
                                   "boxsize", "reach", "with_vel"))
def _build_ctx(pos, vel, grid: CellGrid, caps: Tuple[int, int, int],
               cap_total: int, ns_pad: int, boxsize: float, reach: float,
               with_vel: bool):
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
    nx, ny, nz = grid.ncells
    c = cell_coords(pos, grid)
    ccx = jnp.where(src >= 0, c[:, 0], nx)          # padding sorts last
    ccr = jnp.where(src >= 0, c[:, 1] * nz + c[:, 2], 0)
    if grid.total_cells <= 2**31 - 2:
        # flat key fits int32: one sort
        order = jnp.argsort(ccx * (ny * nz) + ccr).astype(jnp.int32)
    else:
        # lexicographic (cx, r) in ONE variadic sort (int64-free); the
        # index operand is a third key, making the order fully
        # deterministic (equivalent to two stable argsorts, at half the
        # cost — the sort dominates the 512^3 ctx build)
        _, _, order = jax.lax.sort(
            (ccx, ccr, jnp.arange(ntot, dtype=jnp.int32)), num_keys=3)
    # NOTE: a fused (6, ntot) stack + one multi-row take measured 4.4x
    # faster per element here, but its two 3.4 GB transients OOM a 16 GB
    # v5e at 512^3 (the build is the peak-memory moment) — the base ctx
    # keeps per-array gathers; the subset build (parent ctx already
    # shrunk) uses the fused takes
    cx_s = ccx[order]
    cr_s = ccr[order]
    pos_s = pos[order]
    src_s = src[order]

    pad = ns_pad - ntot
    cols_p = jnp.full((4, ns_pad + CH), SENT_BITS, jnp.int32)
    cols_p = cols_p.at[0:3, :ntot].set(
        jax.lax.bitcast_convert_type(pos_s.T.astype(jnp.float32),
                                     jnp.int32))
    cols_p = cols_p.at[3, :].set(BIG_I32)
    if with_vel:
        vel_s = vel[order]
        cols_v = jnp.zeros((4, ns_pad + CH), jnp.float32)
        cols_v = cols_v.at[0:3, :ntot].set(vel_s.T)
    else:
        # lazy: 3D-only sweeps never touch velocities; _fill_vel
        # materialises them on the first 6D use
        cols_v = jnp.zeros((4, 0), jnp.float32)

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

    cx_pad = jnp.concatenate([cx_s, jnp.full(pad, nx, jnp.int32)])
    cr_pad = jnp.concatenate([cr_s, jnp.zeros(pad, jnp.int32)])
    ranges = _block_ranges(cx_pad, cr_pad, grid)
    return FofSortCtx(cx_pad, cr_pad, cols_p, cols_v,
                      ranges, src_pad, is_real, real_slot, gslots, grs,
                      overflow, n, ns_pad)


def _locate_pair(cx_pad, cr_pad, stripe_start, qx, qr, nx: int, right: bool):
    """Vectorised lexicographic searchsorted over the (cx, r) pair arrays:
    position of (qx, qr) in the sorted real data (padding excluded).
    ``stripe_start[k]`` = first slot with cx >= k (size nx+1; [nx] = end of
    real data).  Per-stripe branchless binary search on ``cr_pad``."""
    ns_pad = cr_pad.shape[0]
    qxc = jnp.clip(qx, 0, nx - 1)
    lo = stripe_start[qxc]
    hi = stripe_start[qxc + 1]
    for _ in range(max(int(ns_pad).bit_length(), 1)):
        mid = jnp.minimum((lo + hi) // 2, ns_pad - 1)
        v = cr_pad[mid]
        go = (v <= qr) if right else (v < qr)
        active = lo < hi
        lo = jnp.where(active & go, mid + 1, lo)
        hi = jnp.where(active & ~go, mid, hi)
    return jnp.where(qx < 0, 0,
                     jnp.where(qx >= nx, stripe_start[nx], lo))


def _block_ranges(cx_pad, cr_pad, grid: CellGrid):
    """(nb8, 128) chunk-aligned coverage windows per R_BLOCK of sorted
    (cx, r) cell pairs: NINE windows, one per (dx, dy) stencil offset
    (cols 0-17 = [c0ch, nch] pairs, dx-major).

    Window(dx, dy) = [locate(cx0+dx, r0 + dy*nz - 1),
                      locate(cx1+dx, r1 + dy*nz + 1))  — an exact
    superset: a member particle at (cy, cz) has its own r in [r0, r1],
    so its (cy+dy, cz±1) stencil cells land inside window dy.  The
    per-dy split replaces the single ±(nz+1) window per dx, whose span
    covered THREE FULL y-rows of z — in clustered regions (occupancy
    >> 1 in halos) that superset scanned thousands of never-matching
    columns per block and dominated the sweep cost at 512^3.  For
    blocks spanning multiple y-rows the three dy windows may overlap;
    the sweeps' min-label updates are idempotent so overlap only costs
    the (rare, sparse-region) double scan.

    Pair representation + per-stripe binary search instead of a flat
    packed id keeps everything int32 for grids beyond 2^31 cells."""
    ns_pad = cr_pad.shape[0]
    nblocks = ns_pad // R_BLOCK
    nx, ny, nz = grid.ncells
    nynz = ny * nz
    stripe_start = jnp.searchsorted(
        cx_pad, jnp.arange(nx + 1, dtype=jnp.int32),
        side="left").astype(jnp.int32)
    bidx = jnp.arange(nblocks, dtype=jnp.int32)
    x0 = cx_pad[bidx * R_BLOCK]
    r0 = cr_pad[bidx * R_BLOCK]
    last = jnp.minimum((bidx + 1) * R_BLOCK, ns_pad) - 1
    x1 = cx_pad[last]
    r1 = cr_pad[last]
    # queries per (dx, dy): lo (x0+dx, r0 + dy*nz - 1), hi (x1+dx,
    # r1 + dy*nz + 1); normalise the mixed radix (|offset| < nynz so one
    # borrow/carry suffices)
    dxs = jnp.repeat(jnp.array([-1, 0, 1], jnp.int32), 3)[:, None]  # (9,1)
    dys = jnp.tile(jnp.array([-1, 0, 1], jnp.int32), 3)[:, None]
    qr_lo = r0[None, :] + dys * nz - 1
    borrow = (qr_lo < 0).astype(jnp.int32)
    qx_lo = x0[None, :] + dxs - borrow
    qr_lo = qr_lo + borrow * nynz
    qr_hi = r1[None, :] + dys * nz + 1
    carry = (qr_hi >= nynz).astype(jnp.int32)
    qx_hi = x1[None, :] + dxs + carry
    qr_hi = qr_hi - carry * nynz
    s = _locate_pair(cx_pad, cr_pad, stripe_start, qx_lo, qr_lo, nx, False)
    e = _locate_pair(cx_pad, cr_pad, stripe_start, qx_hi, qr_hi, nx, True)
    # Blocks spanning several cells/stripes have OVERLAPPING windows (the
    # shifted copies of a wide r-span intersect, both across dy and —
    # for blocks crossing x-stripes — across dx).  Scanning a column
    # twice breaks the detect pass (self counted twice => every particle
    # "linked" => the 512^3 prune kept the whole box) and multiplies the
    # sweep cost.  Exact fix: merge the 9 chunk-ranges into their
    # DISJOINT interval union per block — sort by start, then clamp each
    # window's start past the running covered end (exact once sorted:
    # any clamped-away region lies below the running end, which only
    # earlier-starting windows produced).
    nch_total = -(-ns_pad // CH)
    valid_w = (e > s) & (x0[None, :] < nx)
    c0 = s // CH
    length = jnp.where(valid_w, -(-e // CH) - c0, 0)
    start = jnp.where(length > 0, c0, nch_total)     # empty sorts last
    order = jnp.argsort(start, axis=0)
    st_s = jnp.take_along_axis(start, order, 0)
    ln_s = jnp.take_along_axis(length, order, 0)
    run = st_s[0] + ln_s[0]
    c0s = [st_s[0]]
    nchs = [ln_s[0]]
    for w in range(1, 9):
        stw = jnp.maximum(st_s[w], run)
        lnw = jnp.maximum(st_s[w] + ln_s[w] - stw, 0)
        c0s.append(stw)
        nchs.append(lnw)
        run = jnp.maximum(run, stw + lnw)
    cols = []
    for w in range(9):
        cols.extend([c0s[w], nchs[w]])
    # SMEM arrays are lane-padded to 128 and capped at ~1 MB; ship ranges
    # as (8, 128) pipelined blocks instead of one whole-array allocation
    nb8 = -(-nblocks // 8) * 8
    ranges = jnp.zeros((nb8, 128), jnp.int32)
    ranges = ranges.at[:nblocks, : len(cols)].set(jnp.stack(cols, axis=1))
    return ranges


def build_fof_ctx(pos, vel, boxsize: Optional[float], reach: float,
                  ghost_fac: float = 3.0, return_grid: bool = False,
                  with_vel: bool = False):
    """Host wrapper: pick static capacities / grid, build the device ctx.

    ``reach`` must be >= every linking length later swept on this ctx.
    """
    pos = jnp.asarray(pos, jnp.float32)
    vel = jnp.asarray(vel, jnp.float32)
    n = pos.shape[0]
    if not with_vel:
        # position-only ctx: ghost passes would otherwise replicate and
        # concatenate velocities too (~2x vel HBM at 512^3 for nothing —
        # 6D subsets gather from the ORIGINAL velocity array instead)
        vel = jnp.zeros((n, 0), jnp.float32)
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
                      reach, periodic=False, boxsize=0.0,
                      max_total_cells=2**62)
    # the (cx, r) pair representation only needs r = cy*nz + cz and the
    # query offset nz+1 to fit int32 (grids beyond 2^31 TOTAL cells are fine)
    _, ny, nz = grid.ncells
    assert ny * nz + nz + 2 <= 2**31 - 1, \
        "grid stripe too large for the pallas FOF path"
    ns_pad = -(-cap_total // R_BLOCK) * R_BLOCK
    ctx = _build_ctx(pos, vel, grid, caps, cap_total, ns_pad,
                     box, float(reach), with_vel)
    # jit turns the int fields into device scalars; restore host ints so
    # they can serve as static jit arguments downstream
    ctx = ctx._replace(n=n, ns_pad=ns_pad)
    if return_grid:
        return ctx, grid
    return ctx


@jax.jit
def _fill_vel(ctx: FofSortCtx, vel_orig):
    """Materialise the lazy velocity array on an existing ctx (ghost slots
    take their source particle's velocity — ghost shifts are position-only)."""
    ns_pad = ctx.src.shape[0]
    valid = ctx.src >= 0
    safe_src = jnp.clip(ctx.src, 0, vel_orig.shape[0] - 1)
    vel_s = jnp.where(valid[:, None], vel_orig[safe_src], 0.0).astype(
        jnp.float32)
    cols_v = jnp.zeros((4, ns_pad + CH), jnp.float32)
    cols_v = cols_v.at[0:3, :ns_pad].set(vel_s.T)
    return ctx._replace(cols_v=cols_v)


@partial(jax.jit, static_argnames=("ns_pad_new", "grid"))
def _subset_ctx(ctx: FofSortCtx, keep_orig, ns_pad_new: int,
                grid: CellGrid):
    """Compact the ctx to the slots whose ORIGINAL particle is in
    ``keep_orig`` (ghost slots follow their source), preserving cell-sort
    order.  Valid when the criterion swept on the subset can only link kept
    particles (e.g. 6DFOF within 3DFOF groups: all members are tagged).
    Velocities stay lazy (``_fill_vel`` materialises them on first 6D
    use), so the subset build costs no velocity traffic."""
    ns_pad = ctx.src.shape[0]
    n = keep_orig.shape[0]
    safe_src = jnp.clip(ctx.src, 0, n - 1)
    keep = jnp.where(ctx.src >= 0, keep_orig[safe_src], False)
    dest = jnp.cumsum(keep) - 1
    dest = jnp.where(keep, dest, ns_pad_new)
    slot_ids = jnp.arange(ns_pad, dtype=jnp.int32)
    sub_idx = jnp.zeros(ns_pad_new, jnp.int32).at[dest].set(
        slot_ids, mode="drop")
    count = jnp.sum(keep)
    svalid = jnp.arange(ns_pad_new) < count
    overflow = ctx.overflow | (count > ns_pad_new)
    # padding tail takes the LAST index, keeping sub_idx non-decreasing:
    # the fused takes below declare indices_are_sorted=True, and XLA:TPU
    # actually exploits the hint — a zero-filled tail (descending) is
    # undefined behavior that produced garbage coverage ranges and a
    # watchdog-killed sweep at 512^3
    sub_idx = jnp.where(svalid, sub_idx, ns_pad - 1)

    nx = grid.ncells[0]
    # Fused multi-row takes instead of six per-row gathers: each index
    # fetches a whole column, amortising the per-index cost (measured
    # 4.4x per element at 512^3 subset scale — the subset build was
    # gather-bound).  Positions come straight out of the parent's
    # (4, Ns) cols_p with NO staging copy; the four metadata rows stack
    # into one transient (peak-memory safe here: the subset runs after
    # the build's transients die).
    pos_sub = jnp.take(ctx.cols_p[:, :ns_pad], sub_idx, axis=1,
                       indices_are_sorted=True)[0:3]
    meta = jnp.stack([ctx.ccx, ctx.ccr, ctx.src,
                      ctx.is_real.astype(jnp.int32)])
    sub = jnp.take(meta, sub_idx, axis=1, indices_are_sorted=True)
    ccx = jnp.where(svalid, sub[0], nx)
    ccr = jnp.where(svalid, sub[1], 0)
    src = jnp.where(svalid, sub[2], -1)
    is_real = jnp.where(svalid, sub[3] != 0, False)
    # positions move as raw bits (cols_p rows 0-2 are bitcast f32)
    cols_p = jnp.full((4, ns_pad_new + CH), SENT_BITS, jnp.int32)
    cols_p = cols_p.at[0:3, :ns_pad_new].set(
        jnp.where(svalid[None, :], pos_sub, SENT_BITS))
    cols_p = cols_p.at[3, :].set(BIG_I32)
    # velocities stay lazy (zero-size placeholder): 3D-phase subsets (the
    # linked-particle prune) never touch them, and fof6d materialises them
    # through _fill_vel on first use — the eager (4, ns_pad_new) build +
    # gather cost several seconds and ~1 GB HBM at 512^3 for nothing
    cols_v = jnp.zeros((4, 0), jnp.float32)
    new_slots = jnp.arange(ns_pad_new, dtype=jnp.int32)
    real_slot = jnp.zeros(n, jnp.int32).at[
        jnp.where(is_real, src, n)].set(new_slots, mode="drop")
    is_ghost = svalid & ~is_real & (src >= 0)
    g_cap = ctx.gslots.shape[0]
    gdest = jnp.cumsum(is_ghost) - 1
    gdest = jnp.where(is_ghost, gdest, g_cap)
    gslots = jnp.zeros(g_cap, jnp.int32).at[gdest].set(
        new_slots, mode="drop")
    gcount = jnp.sum(is_ghost)
    gvalid = jnp.arange(g_cap) < gcount
    gslots = jnp.where(gvalid, gslots, 0)
    gsrc = src[gslots]
    grs = jnp.where(gvalid, real_slot[jnp.clip(gsrc, 0, n - 1)], 0)
    ranges = _block_ranges(ccx, ccr, grid)
    return FofSortCtx(ccx, ccr, cols_p, cols_v, ranges,
                      src, is_real, real_slot, gslots, grs, overflow,
                      ctx.n, ns_pad_new)


# ---------------------------------------------------------------------------
# Sweep kernels (double-buffered unified chunk loop)
# ---------------------------------------------------------------------------

def _run_chunks(rng_ref, br, nm0, get_dmas, compute):
    """Iterate the 9 coverage windows as one flat double-buffered chunk
    stream.  ``get_dmas(off, slot)`` returns the DMA descriptors for a
    chunk; ``compute(nm, slot)`` consumes a filled slot.

    This shape measured best on v5e at 256^3 (5.8 us per 512-col chunk =
    ~3.1 us VPU compute + ~2.7 us fixed).  Measured NON-improvements,
    kept out: pair-unrolled static buffer slots + a (R,128) scratch min
    accumulator with the cross-lane reduction hoisted out of the chunk
    loop (10.02 s vs 7.23 s fixpoint — the (R,CH)->(R,CH/128,128)
    reshape relayouts every chunk); NBUF=4 deep buffering (no change);
    one-vs-two DMA descriptors per chunk (no change)."""
    c0s = [rng_ref[br, 2 * w] for w in range(9)]
    nchs = [rng_ref[br, 2 * w + 1] for w in range(9)]
    cum = [nchs[0]]
    for w in range(1, 9):
        cum.append(cum[-1] + nchs[w])
    ntot = cum[-1]

    def off_of(t):
        # window of flat chunk t: smallest w with t < cum[w]
        i = t
        c0 = c0s[0]
        for w in range(1, 9):
            past = t >= cum[w - 1]
            i = jnp.where(past, t - cum[w - 1], i)
            c0 = jnp.where(past, c0s[w], c0)
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


def _sweep_kernel_3d(b2, rng_ref, rm_ref, m_hbm, out_ref, cm_, sem):
    """3D criterion over ONE merged int32 stream per chunk:
    rows 0-2 = position bits (bitcast f32), row 3 = labels."""
    b = pl.program_id(0)
    br = jax.lax.rem(b, 8)
    # row operands arrive lane-major ((k, R) blocks of the same array the
    # chunk DMA streams) and are transposed to sublane-major ONCE per
    # block — row-major HBM operands would be tile-padded k -> 128
    rm = rm_ref[:].T                               # (R,4) i32
    rp = jax.lax.bitcast_convert_type(rm[:, 0:3], jnp.float32)
    nm0 = rm[:, 3:4]                               # (R,1)

    def get_dmas(off, slot):
        return (
            pltpu.make_async_copy(m_hbm.at[:, pl.ds(off, CH)],
                                  cm_.at[slot], sem.at[slot]),
        )

    def compute(nm, slot):
        cm = cm_[slot]                             # (4,CH) i32
        cp = jax.lax.bitcast_convert_type(cm[0:3, :], jnp.float32)
        cl = cm[3:4, :]
        dx = rp[:, 0:1] - cp[0:1, :]
        d2 = dx * dx
        dy = rp[:, 1:2] - cp[1:2, :]
        d2 += dy * dy
        dz = rp[:, 2:3] - cp[2:3, :]
        d2 += dz * dz
        cand = jnp.where(d2 <= b2, cl, BIG_I32)
        return jnp.minimum(nm, jnp.min(cand, axis=1, keepdims=True))

    nm = _run_chunks(rng_ref, br, nm0, get_dmas, compute)
    out_ref[:] = nm.T                              # (1,R)


def _detect_kernel_3d(b2, rng_ref, rm_ref, m_hbm, out_ref, cm_, sem):
    """Link-detection pass: per row, the number of candidates within the
    linking length (self included, so isolated rows count exactly 1).
    Same chunk stream as the 3D sweep; the count feeds the linked-subset
    prune (most particles at FOF linking lengths have NO neighbour, so
    the label fixed point can run on a compacted context)."""
    b = pl.program_id(0)
    br = jax.lax.rem(b, 8)
    rm = rm_ref[:].T                               # (R,4) i32
    rp = jax.lax.bitcast_convert_type(rm[:, 0:3], jnp.float32)
    cnt0 = jnp.zeros_like(rm[:, 3:4])              # (R,1) i32

    def get_dmas(off, slot):
        return (
            pltpu.make_async_copy(m_hbm.at[:, pl.ds(off, CH)],
                                  cm_.at[slot], sem.at[slot]),
        )

    def compute(cnt, slot):
        cm = cm_[slot]                             # (4,CH) i32
        cp = jax.lax.bitcast_convert_type(cm[0:3, :], jnp.float32)
        dx = rp[:, 0:1] - cp[0:1, :]
        d2 = dx * dx
        dy = rp[:, 1:2] - cp[1:2, :]
        d2 += dy * dy
        dz = rp[:, 2:3] - cp[2:3, :]
        d2 += dz * dz
        ok = (d2 <= b2).astype(jnp.int32)
        return cnt + jnp.sum(ok, axis=1, keepdims=True)

    cnt = _run_chunks(rng_ref, br, cnt0, get_dmas, compute)
    out_ref[:] = cnt.T                             # (1,R)


def _make_detect_3d(ns_pad: int, b2: float):
    nblocks = ns_pad // R_BLOCK
    return pl.pallas_call(
        partial(_detect_kernel_3d, np.float32(b2)),
        out_shape=jax.ShapeDtypeStruct((1, ns_pad), jnp.int32),
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((8, 128), lambda b: (b // 8, 0),
                         memory_space=pltpu.SMEM),
            _lane_spec(4),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=_lane_spec(1),
        scratch_shapes=[
            pltpu.VMEM((2, 4, CH), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )


@partial(jax.jit, static_argnames=("ns_pad", "b2"))
def _linked_mask(ctx: FofSortCtx, ns_pad: int, b2: float):
    """(n,) bool: particle has >= 1 neighbour within sqrt(b2) (any image
    counts — ghost rows fold into their source particle)."""
    detect = _make_detect_3d(ns_pad, b2)
    cnt = detect(ctx.ranges, ctx.cols_p, ctx.cols_p)[0]
    has = (cnt >= 2) & (ctx.src >= 0)
    n = ctx.real_slot.shape[0]
    keep = jnp.zeros(n, bool).at[
        jnp.where(ctx.src >= 0, ctx.src, n)].max(has, mode="drop")
    return keep, jnp.sum(keep)


def _sweep_kernel_6d(inv_b2, rng_ref, rm_ref, rlab_ref, m_hbm, lab_hbm,
                     out_ref, cm_, clab_, sem_m, sem_l):
    """6D criterion: d2/b6^2 + dv2/vscale2_row <= 1, same nonzero 3D group
    (reference search.cxx:552-576 per-group TPHS-tree FOF).  A STATIC
    8-row int32 stream (rows 0-2 pos bits, 3-5 vel bits, 6 = 1/vscale2
    bits, 7 = 3D group id) plus a separate label stream: 9 rows in one
    array fails Mosaic's 8-tile row-slice alignment, a 16-row pad costs
    ~2 GB extra HBM per sweep at 512^3 subset sizes, and two DMA
    descriptors per chunk measure identical to one — so the per-sweep
    label refresh touches only the small label array."""
    b = pl.program_id(0)
    br = jax.lax.rem(b, 8)
    rm = rm_ref[:].T                               # (R,8) i32
    rp = jax.lax.bitcast_convert_type(rm[:, 0:3], jnp.float32)
    rv = jax.lax.bitcast_convert_type(rm[:, 3:6], jnp.float32)
    rivs = jax.lax.bitcast_convert_type(rm[:, 6:7], jnp.float32)
    rgrp = rm[:, 7:8]
    nm0 = rlab_ref[:].T                            # (R,1)

    def get_dmas(off, slot):
        return (
            pltpu.make_async_copy(m_hbm.at[:, pl.ds(off, CH)],
                                  cm_.at[slot], sem_m.at[slot]),
            pltpu.make_async_copy(lab_hbm.at[:, pl.ds(off, CH)],
                                  clab_.at[slot], sem_l.at[slot]),
        )

    def compute(nm, slot):
        cm = cm_[slot]                             # (8,CH) i32
        cp = jax.lax.bitcast_convert_type(cm[0:3, :], jnp.float32)
        cv = jax.lax.bitcast_convert_type(cm[3:6, :], jnp.float32)
        dx = rp[:, 0:1] - cp[0:1, :]
        d2 = dx * dx
        dy = rp[:, 1:2] - cp[1:2, :]
        d2 += dy * dy
        dz = rp[:, 2:3] - cp[2:3, :]
        d2 += dz * dz
        du = rv[:, 0:1] - cv[0:1, :]
        dv2 = du * du
        du = rv[:, 1:2] - cv[1:2, :]
        dv2 += du * du
        du = rv[:, 2:3] - cv[2:3, :]
        dv2 += du * du
        phase = d2 * inv_b2 + dv2 * rivs
        ok = (phase <= 1.0) & (rgrp == cm[7:8, :]) & (rgrp > 0)
        cand = jnp.where(ok, clab_[slot], BIG_I32)
        return jnp.minimum(nm, jnp.min(cand, axis=1, keepdims=True))

    nm = _run_chunks(rng_ref, br, nm0, get_dmas, compute)
    out_ref[:] = nm.T                              # (1,R)


def _lane_spec(k):
    """Lane-major row block: (k, R_BLOCK) slice at column offset b*R."""
    return pl.BlockSpec((k, R_BLOCK), lambda b: (0, b),
                        memory_space=pltpu.VMEM)


def _make_sweep_3d(ns_pad: int, b2: float):
    nblocks = ns_pad // R_BLOCK
    return pl.pallas_call(
        partial(_sweep_kernel_3d, np.float32(b2)),
        out_shape=jax.ShapeDtypeStruct((1, ns_pad), jnp.int32),
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((8, 128), lambda b: (b // 8, 0),
                         memory_space=pltpu.SMEM),
            _lane_spec(4),                      # merged row block
            pl.BlockSpec(memory_space=pl.ANY),  # merged columns (same array)
        ],
        out_specs=_lane_spec(1),
        scratch_shapes=[
            pltpu.VMEM((2, 4, CH), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )


def _make_sweep_6d(ns_pad: int, inv_b2: float):
    nblocks = ns_pad // R_BLOCK
    return pl.pallas_call(
        partial(_sweep_kernel_6d, np.float32(inv_b2)),
        out_shape=jax.ShapeDtypeStruct((1, ns_pad), jnp.int32),
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((8, 128), lambda b: (b // 8, 0),
                         memory_space=pltpu.SMEM),
            _lane_spec(8),                      # static row block
            _lane_spec(1),                      # row labels
            pl.BlockSpec(memory_space=pl.ANY),  # static columns (same array)
            pl.BlockSpec(memory_space=pl.ANY),  # label columns
        ],
        out_specs=_lane_spec(1),
        scratch_shapes=[
            pltpu.VMEM((2, 8, CH), jnp.int32),
            pltpu.VMEM((2, 1, CH), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )


# ---------------------------------------------------------------------------
# Label fixed points
# ---------------------------------------------------------------------------

def _fixpoint(sweep_fn, ctx: FofSortCtx, max_sweeps: int, jumps: int = 2,
              labels0=None, aux0=None):
    """Shared while_loop: ghost refresh -> sweep -> ghost fold -> hook ->
    pointer jumps.  ``sweep_fn(labels, ranges) -> nmin`` (labels/nmin are
    (Ns_pad,) i32; ``ranges`` the per-round coverage windows).  Converges
    when a round changes nothing (min-label updates are monotone, so
    no-change is a valid stopping rule; cf. ops/fof.py::_fof_sweeps).

    Dirty-block tracking: a block whose coverage windows saw NO label
    change since its last sweep must reproduce its cached neighbour-min
    (the candidates it would scan are bit-identical), so its windows are
    zeroed for the round and its cached ``nm`` reused — an EXACT skip,
    not an approximation.  Label changes localise to a few merge frontiers
    after the first sweeps, so late rounds touch a tiny fraction of the
    box.  Cost: two (Ns_pad,) i32 carries + a per-round chunk-change
    prefix sum (trivial next to a sweep).

    Resumable: returns (labels, changed, nsweeps, work, aux) where
    ``changed`` is True iff the LAST executed sweep still changed labels
    (i.e. the loop stopped on ``max_sweeps``, not on convergence) —
    callers re-invoke with the returned labels AND ``aux`` (the dirty
    -tracking carries) until False.  ``work`` counts chunk DMAs actually
    issued (f32; telemetry).  The axon tunnel (and production TPU
    runtimes generally) kill device programs running for minutes, so
    512^3-scale fixed points must span several bounded dispatches."""
    ns_pad = ctx.src.shape[0]      # static (shape-derived, jit-safe)
    nch_total = -(-ns_pad // CH)
    pad_cols = nch_total * CH - ns_pad
    if labels0 is None:
        labels0 = jnp.arange(ns_pad, dtype=jnp.int32)
    if aux0 is None:
        # all-dirty first round: prev_ref cannot equal any real label
        aux0 = (jnp.full(ns_pad, -1, jnp.int32),
                jnp.full(ns_pad, BIG_I32, jnp.int32))
    prev0, nm0 = aux0

    nb8 = ctx.ranges.shape[0]
    win_c0 = ctx.ranges[:, 0:18:2]                      # (nb8, 9)
    win_nch = ctx.ranges[:, 1:18:2]                     # (nb8, 9)

    def body(state):
        l, prev_ref, nm_cache, _, it, work = state
        # ghosts mirror their source before the sweep (compact list;
        # padded entries are (0, 0) self-copies)
        l = l.at[ctx.gslots].set(l[ctx.grs])
        # chunk-level change map vs the labels each block last swept
        ch_dirty = jnp.any(jnp.pad(l != prev_ref, (0, pad_cols)).reshape(
            nch_total, CH), axis=1)
        cum = jnp.concatenate([jnp.zeros(1, jnp.int32),
                               jnp.cumsum(ch_dirty.astype(jnp.int32))])
        wd = (cum[jnp.minimum(win_c0 + win_nch, nch_total)] -
              cum[jnp.minimum(win_c0, nch_total)]) > 0   # (nb8, 9)
        blk_dirty = jnp.any(wd, axis=1)
        nch_round = win_nch * blk_dirty[:, None].astype(jnp.int32)
        ranges = ctx.ranges.at[:, 1:18:2].set(nch_round)
        nm = jnp.minimum(nm_cache, sweep_fn(l, ranges))
        # fold ghost rows' minima back into their real slot
        nm = nm.at[ctx.grs].min(nm[ctx.gslots])
        hooked = l.at[l].min(nm)

        # pointer jumps accelerate propagation along long label chains —
        # worth 2 full-array random gathers (~1.1 s each at 42M slots)
        # only while the merge frontier is wide.  Late rounds touch a few
        # chunks and the hook alone usually advances convergence, BUT the
        # hook-only stopping rule is unsound: hook-stable states with
        # unmerged multi-hop label chains exist (e.g. chains 5->4->0 and
        # 3->1 over edges (0,4),(4,5),(5,3),(3,1) — each slot's parent
        # already holds the min over its neighbours' labels, yet path
        # compression yields TWO roots for one component).  So jumps are
        # also forced on any round where the hook reports no change:
        # termination is then jump-validated.  Exit requires labels
        # stable under hook AND jump; labels are min-monotone with
        # l[j] <= j, so jump-stability implies chain-freeness (l == l[l])
        # and chain-free + hook-stable over the symmetric edge relation
        # means one label per connected component — exact.
        def jump(h):
            x = h
            for _ in range(jumps):
                x = x[x]
            return x

        if os.environ.get("VR_FOF_ADAPTIVE_JUMPS", "1") == "0":
            x = jump(hooked)
        else:
            wide = jnp.sum(ch_dirty.astype(jnp.int32)) * 64 > nch_total
            hook_quiet = jnp.all(hooked == l)
            # quiet rounds need only ONE validation jump (exit requires
            # h[h] == h, i.e. chain-freeness — see the soundness note
            # above); the deeper acceleration jumps stay on wide rounds
            x = jax.lax.cond(
                wide, jump,
                lambda h: jax.lax.cond(hook_quiet, lambda y: y[y],
                                       lambda y: y, h),
                hooked)
        return (x, l, nm, jnp.any(x != l), it + 1,
                work + jnp.sum(nch_round).astype(jnp.float32))

    def cond(state):
        _, _, _, changed, it, _ = state
        return changed & (it < max_sweeps)

    labels, prev_ref, nm_cache, changed, nsweeps, work = jax.lax.while_loop(
        cond, body, (labels0, prev0, nm0, jnp.bool_(True), jnp.int32(0),
                     jnp.float32(0)))

    # full path compression (idempotent; also run on intermediate chunks
    # so a resumed fixed point starts from compressed labels)
    def ccond(l):
        return jnp.any(l != l[l])

    def cbody(l):
        return l[l[l]]

    labels = jax.lax.while_loop(ccond, cbody, labels)
    return labels, changed, nsweeps, work, (prev_ref, nm_cache)


@partial(jax.jit, static_argnames=("ns_pad", "b2", "jumps"))
def _fof3d_labels(ctx: FofSortCtx, ns_pad: int, b2: float,
                  max_sweeps=64, labels0=None, jumps: int = 2,
                  aux0=None):
    sweep = _make_sweep_3d(ns_pad, b2)

    def sweep_fn(labels, ranges):
        # refresh the label row of the merged array (one full-array copy
        # per sweep, ~0.4 ms/GB — noise next to the sweep itself)
        merged = ctx.cols_p.at[3, :ns_pad].set(labels)
        nm = sweep(ranges, merged, merged)
        return nm[0]

    return _fixpoint(sweep_fn, ctx, max_sweeps, labels0=labels0,
                     jumps=jumps, aux0=aux0)


@partial(jax.jit, static_argnames=("ns_pad", "b2", "jumps"))
def _fof6d_labels(ctx: FofSortCtx, groups_orig, vscale2_orig, ns_pad: int,
                  b2: float, max_sweeps=64, labels0=None,
                  jumps: int = 2, aux0=None):
    """``groups_orig``/``vscale2_orig`` indexed by ORIGINAL particle id."""
    sweep = _make_sweep_6d(ns_pad, 1.0 / b2)
    safe_src = jnp.where(ctx.src >= 0, ctx.src, 0)
    grp_s = jnp.where(ctx.src >= 0, groups_orig[safe_src], 0)
    ivs_s = jnp.where(
        ctx.src >= 0,
        1.0 / jnp.maximum(vscale2_orig[safe_src], 1e-30), 1.0
    ).astype(jnp.float32)

    ivs_pad = jnp.concatenate([ivs_s, jnp.ones(CH, jnp.float32)])
    grp_pad = jnp.concatenate([grp_s, jnp.zeros(CH, jnp.int32)])
    base = jnp.concatenate([
        ctx.cols_p[0:3],                           # pos bits (+ sentinels)
        jax.lax.bitcast_convert_type(ctx.cols_v[0:3], jnp.int32),
        jax.lax.bitcast_convert_type(ivs_pad, jnp.int32)[None, :],
        grp_pad[None, :],
    ], axis=0)                                     # (8, ns_pad + CH)

    def sweep_fn(labels, ranges):
        lab_col = jnp.concatenate(
            [labels, jnp.full(CH, BIG_I32, jnp.int32)])[None, :]
        rlab = labels[None, :]
        nm = sweep(ranges, base, rlab, base, lab_col)
        return nm[0]

    return _fixpoint(sweep_fn, ctx, max_sweeps, labels0=labels0,
                     jumps=jumps, aux0=aux0)


@partial(jax.jit, static_argnames=("n", "min_size"))
def _renumber_masked(labels, ctx: FofSortCtx, n: int, min_size: int):
    """Size-ordered renumbering over real slots only (ghosts/padding are
    excluded from sizes); returns pfof in ORIGINAL particle order.
    Mirrors ops/fof.py::renumber_by_size semantics (ids 1..ngroups by
    decreasing size, min-original-index tie-break, 0 below min_size).

    The size-rank sort runs over the COMPACTED eligible roots (at most
    n // min_size of them) instead of all ns_pad slots — the full-array
    lexsort costs ~0.85 s at 256^3 for ~10^3 actual groups."""
    ns_pad = labels.shape[0]
    w = ctx.is_real.astype(jnp.int32)
    sizes = jnp.zeros(ns_pad, jnp.int32).at[labels].add(w)
    orig = jnp.where(ctx.is_real, ctx.src, BIG_I32)
    min_id = jnp.full(ns_pad, BIG_I32, jnp.int32)
    min_id = min_id.at[labels].min(orig)
    eligible = sizes >= max(min_size, 1)
    cap = _pad_pow2(n // max(min_size, 2) + 2, lo=1024)
    if min_size >= 2 and cap < ns_pad:
        # sizes sum to n over roots, so eligible roots <= n // min_size
        slot_ids = jnp.arange(ns_pad, dtype=jnp.int32)
        dest = jnp.cumsum(eligible) - 1
        dest = jnp.where(eligible, dest, cap)
        roots = jnp.zeros(cap, jnp.int32).at[dest].set(slot_ids,
                                                       mode="drop")
        ngroups = jnp.sum(eligible).astype(jnp.int32)
        cvalid = jnp.arange(cap) < ngroups
        roots = jnp.where(cvalid, roots, 0)
        csize = jnp.where(cvalid, sizes[roots], 0)
        cmin = jnp.where(cvalid, min_id[roots], BIG_I32)
        rank_order = jnp.lexsort((cmin, -csize))
        ranks = jnp.arange(cap, dtype=jnp.int32)
        gid_c = jnp.zeros(cap, jnp.int32).at[rank_order].set(
            jnp.where(ranks < ngroups, ranks + 1, 0))
        gid_of_root = jnp.zeros(ns_pad, jnp.int32).at[
            jnp.where(cvalid, roots, ns_pad)].set(gid_c, mode="drop")
    else:
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

_COMPILE_FAILED = False


def mark_compile_failed() -> None:
    """Latch set by callers when a kernel fails to lower/compile on the
    local backend; availability then reports False so every subsequent
    sweep takes the XLA edge pipeline instead of re-raising."""
    global _COMPILE_FAILED
    _COMPILE_FAILED = True
    from ..utils import telemetry

    telemetry.count("pallas_fof_compile_fallbacks")


def pallas_fof_available(n: int, boxsize: Optional[float],
                         reach: float) -> bool:
    """Host check: TPU backend + one grid stripe fits int32 (the (cx, r)
    pair keys need ny*nz + nz + 2 < 2^31 — i.e. up to ~46000 cells/dim,
    far beyond any single-chip HBM anyway)."""
    env = os.environ.get("VR_FOF_PALLAS")
    if env == "0":
        return False
    if env != "1" and _COMPILE_FAILED:
        return False
    if env != "1" and jax.default_backend() != "tpu":
        return False
    if n < (1 << 14):
        return False
    if boxsize is not None and boxsize > 0:
        ncell = int(np.floor((boxsize + 2 * reach) / reach))
    else:
        return env == "1"  # non-periodic: only when forced (rarely hot)
    return ncell * (ncell + 1) + 2 <= 2**31 - 1


class PallasFof:
    """Per-snapshot FOF context: build once, sweep 3D and 6D criteria.

    The context is built position-only; velocity arrays are materialised
    on the first 6D sweep (or gathered into a subset context), halving
    steady HBM for the dominant 3D phase at 512^3 scale."""

    def __init__(self, pos, vel, boxsize: Optional[float], reach: float):
        self._vel = jnp.asarray(vel, jnp.float32)
        self.ctx, self.grid = build_fof_ctx(pos, vel, boxsize, reach,
                                            return_grid=True)

    def subset_pad(self, keep_orig) -> int:
        """Padded slot capacity a subset over ``keep_orig`` would need
        (kept particle slots + their surviving ghost images, padded to a
        quarter-octave capacity class — see segments.pad_class).
        Sweep cost scales with this, so callers compare it against
        ``ctx.ns_pad`` to decide whether compaction pays for itself."""
        keep_orig = jnp.asarray(keep_orig)
        safe_src = jnp.clip(self.ctx.src, 0,
                            keep_orig.shape[0] - 1)
        keep_slots = jnp.where(self.ctx.src >= 0, keep_orig[safe_src],
                               False)
        count = int(jax.device_get(jnp.sum(keep_slots)))
        return _pad_class(max(count, R_BLOCK), lo=R_BLOCK)

    def subset(self, keep_orig, ns_pad_new: Optional[int] = None
               ) -> "PallasFof":
        """Compacted context over the kept particles (e.g. 3DFOF-tagged
        before the 6D sweep); ~(N/ntag)x cheaper per sweep.

        Capacity is sized from the kept SLOT count — ghost images of kept
        particles survive the compaction too, so sizing from the original
        count alone would overflow (and silently drop tagged particles)
        whenever the tagged count sits at a power of two."""
        keep_orig = jnp.asarray(keep_orig)
        if ns_pad_new is None:
            ns_pad_new = self.subset_pad(keep_orig)
        sub = object.__new__(PallasFof)
        sub._vel = self._vel
        sub.ctx = _subset_ctx(self.ctx, keep_orig,
                              ns_pad_new,
                              self.grid)._replace(n=self.ctx.n,
                                                  ns_pad=ns_pad_new)
        sub.grid = self.grid
        return sub

    def linked_mask(self, linking_length: float):
        """(keep, nkept): particles with >= 1 neighbour within the linking
        length (one detect pass; the prune that lets the label fixed point
        run on the linked subset only — at FOF linking lengths most
        particles are isolated and their labels never change)."""
        keep, cnt = _linked_mask(self.ctx, self.ctx.ns_pad,
                                 float(linking_length) ** 2)
        return keep, int(jax.device_get(cnt))

    def _sweeps_per_dispatch(self) -> int:
        # bound single-dispatch wall time: ~1.4 s per sweep per 17M slots
        # on v5e, and dispatches beyond ~1 min get killed by the axon
        # tunnel (production runtimes also preempt long programs)
        return max(1, min(64, int(3e8) // max(self.ctx.ns_pad, 1)))

    def fof3d(self, linking_length: float, min_size: int):
        k = self._sweeps_per_dispatch()
        jumps = int(os.environ.get("VR_FOF_JUMPS", "2"))
        labels = aux = None
        while True:
            labels, changed, nsw, work, aux = _fof3d_labels(
                self.ctx, self.ctx.ns_pad, float(linking_length) ** 2,
                max_sweeps=k, labels0=labels, jumps=jumps, aux0=aux)
            telemetry.count("fof3d_dispatches")
            telemetry.count("fof3d_sweeps", int(jax.device_get(nsw)))
            telemetry.count("fof3d_chunks", int(jax.device_get(work)))
            if not bool(jax.device_get(changed)):
                break
            # later dispatches carry the dirty-block state: their sweeps
            # touch only merge frontiers, so a longer leash stays well
            # under the tunnel's dispatch-time limit
            k = min(64, k * 4)
        return _renumber_masked(labels, self.ctx, self.ctx.n, min_size)

    def fof6d(self, ell6d: float, groups_orig, vscale2_orig, min_size: int):
        if self.ctx.cols_v.shape[1] == 0:
            self.ctx = _fill_vel(self.ctx, self._vel)._replace(
                n=self.ctx.n, ns_pad=self.ctx.ns_pad)
        groups_orig = jnp.asarray(groups_orig)
        vscale2_orig = jnp.asarray(vscale2_orig, jnp.float32)
        k = self._sweeps_per_dispatch()
        jumps = int(os.environ.get("VR_FOF_JUMPS", "2"))
        labels = aux = None
        while True:
            labels, changed, nsw, work, aux = _fof6d_labels(
                self.ctx, groups_orig, vscale2_orig, self.ctx.ns_pad,
                float(ell6d) ** 2, max_sweeps=k, labels0=labels,
                jumps=jumps, aux0=aux)
            telemetry.count("fof6d_dispatches")
            telemetry.count("fof6d_sweeps", int(jax.device_get(nsw)))
            telemetry.count("fof6d_chunks", int(jax.device_get(work)))
            if not bool(jax.device_get(changed)):
                break
            k = min(64, k * 4)   # see fof3d: dirty-skip makes resumed
            # dispatches cheap, so fewer tunnel round-trips
        return _renumber_masked(labels, self.ctx, self.ctx.n, min_size)

    def check_overflow(self):
        return bool(jax.device_get(self.ctx.overflow))
