"""Friends-of-Friends as min-label propagation with union-find hooking.

TPU-native replacement for NBodylib's ``KDTree::FOF`` / ``FOFCriterion``
engines (missing submodule; call sites at /root/reference/src/search.cxx:110,
414,575) and for the reference's ``Head/Next/Tail/Len`` linked-list group
bookkeeping (/root/reference/src/buildandsortarrays.cxx).

Algorithm (cf. PAPERS.md: hybrid union-find FOF, jFoF):
  1. bin particles into cells with width >= linking radius (ops/cells.py);
  2. repeat until fixed point (``lax.while_loop``):
       a. neighbour-min sweep: for every particle, the min label among all
          particles within the linking criterion, computed as dense K x K
          tiles between each cell and its 27-cell stencil;
       b. hook: ``labels[labels[i]] <- min(..., nbr_min[i])`` (scatter-min);
       c. full path compression: ``labels <- labels[labels]`` to fixpoint.
  3. renumber components 1..ngroups by decreasing size (reference
     ``ReorderGroupIDs`` semantics, pfof=0 for below-min-size).

The criterion is pluggable: 3DFOF is ``d2 <= b^2``; 6DFOF and the
phase-space stream criteria (reference fofalgo.cxx) pass extra per-particle
fields and a predicate over K x K tiles.  Everything is statically shaped;
the per-cell particle capacity K is chosen host-side from the actual max
cell occupancy.
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

# 27-cell stencil offsets, static
_OFFSETS = np.stack(
    np.meshgrid(*([np.arange(-1, 2)] * 3), indexing="ij"), -1
).reshape(-1, 3).astype(np.int32)

PairPredicate = Callable[[jnp.ndarray, Dict[str, jnp.ndarray],
                          Dict[str, jnp.ndarray]], jnp.ndarray]


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


def _slice_tile(flat, starts, width):
    """(C, width, ...) contiguous-slice gather (DMA-friendly row fetches)."""
    if flat.ndim == 1:
        return jax.vmap(
            lambda s: jax.lax.dynamic_slice(flat, (s,), (width,)))(starts)
    return jax.vmap(
        lambda s: jax.lax.dynamic_slice(
            flat, (s, 0), (width, flat.shape[1])))(starts)


def _pad_flat(arr, width, fill):
    pad_shape = (width,) + arr.shape[1:]
    return jnp.concatenate([arr, jnp.full(pad_shape, fill, arr.dtype)])


def neighbor_min_sweep(
    labels: jnp.ndarray,
    pos_pad: jnp.ndarray,
    fields_pad: Dict[str, jnp.ndarray],
    own_start: jnp.ndarray,
    own_cnt: jnp.ndarray,
    windows,
    grid: CellGrid,
    predicate: PairPredicate,
    capacity: int,
) -> jnp.ndarray:
    """One sweep: per sorted particle, min label over linked neighbours.

    Cell-tile formulation: per occupied cell, an own tile of K particles is
    checked against 9 contiguous candidate windows of width 3K (plus the
    periodic z-wrap cells).  All loads are contiguous-slice gathers; the
    compare is a fori_loop of fused (C, K) vector ops.  Returns the (N,)
    neighbour-min in sorted particle order.
    """
    n = labels.shape[0]
    K = capacity
    W = 3 * K
    sentinel = jnp.int32(np.iinfo(np.int32).max)
    awin_s, awin_c, bwin_s, bwin_c = windows
    labels_pad = _pad_flat(labels, W, sentinel)

    karange = jnp.arange(K, dtype=jnp.int32)
    own_pos = _slice_tile(pos_pad, own_start, K)               # (C,K,3)
    own_valid = karange[None, :] < own_cnt[:, None]
    own_fields = {k: _slice_tile(v, own_start, K)
                  for k, v in fields_pad.items()}
    best = jnp.where(own_valid, _slice_tile(labels_pad, own_start, K),
                     sentinel)

    def scan_window(best, sw):
        s, cnt, width = sw

        nbr_pos = _slice_tile(pos_pad, s, width)               # (C,W,3)
        nbr_lab = _slice_tile(labels_pad, s, width)            # (C,W)
        nbr_fields = {k: _slice_tile(v, s, width)
                      for k, v in fields_pad.items()}

        def body(w, best):
            d2 = _pair_d2_bcast(own_pos, nbr_pos[:, w][:, None, :], grid)
            nbr_w = {k: v[:, w][:, None] if v.ndim == 2
                     else v[:, w][:, None, :] for k, v in nbr_fields.items()}
            link = predicate(d2, own_fields, nbr_w)
            link = link & own_valid & (w < cnt)[:, None]
            cand = jnp.where(link, nbr_lab[:, w][:, None], sentinel)
            return jnp.minimum(best, cand)

        return jax.lax.fori_loop(0, width, body, best), None

    for o in range(9):
        best, _ = scan_window(best, (awin_s[o], awin_c[o], W))
    if grid.periodic and grid.ncells[2] >= 3:
        for o in range(9):
            best, _ = scan_window(best, (bwin_s[o], bwin_c[o], K))

    # scatter tile results back to flat sorted order
    out_idx = jnp.where(own_valid,
                        own_start[:, None] + karange[None, :], n)
    nmin = jnp.full((n,), sentinel, labels.dtype)
    nmin = nmin.at[out_idx.reshape(-1)].min(best.reshape(-1), mode="drop")
    return jnp.where(nmin == sentinel, labels, nmin)


def _compress(labels: jnp.ndarray) -> jnp.ndarray:
    """Full path compression: labels <- labels[labels] to fixpoint."""

    def cond(l):
        return jnp.any(l != l[l])

    def body(l):
        return l[l[l]]  # double jump per iteration

    return jax.lax.while_loop(cond, body, labels)


@partial(jax.jit, static_argnames=("grid", "predicate", "capacity",
                                   "tile_cells", "max_sweeps"))
def fof_labels_sorted(
    pos_sorted: jnp.ndarray,
    fields: Dict[str, jnp.ndarray],
    binning: Binning,
    grid: CellGrid,
    predicate: PairPredicate,
    capacity: int,
    tile_cells: int,
    max_sweeps: int = 64,
) -> jnp.ndarray:
    """Run the FOF fixed point; returns per-sorted-particle root labels.

    ``capacity``: max particles per cell (static, host-measured).
    ``tile_cells``: static padded count of occupied cells (>= the true
    number of occupied cells).
    """
    n = pos_sorted.shape[0]
    C = tile_cells
    W = 3 * capacity
    labels0 = jnp.arange(n, dtype=jnp.int32)

    pos_pad = _pad_flat(pos_sorted, W, 0)
    fields_pad = {k: _pad_flat(v, W, 0) for k, v in fields.items()}
    own_start = binning.cell_start[:C]
    own_cnt = jnp.where(binning.ucid[:C] == INT32_MAX, 0,
                        binning.cell_count[:C])
    windows = neighbor_windows(binning, grid, C)

    def sweep(labels):
        nmin = neighbor_min_sweep(labels, pos_pad, fields_pad, own_start,
                                  own_cnt, windows, grid, predicate,
                                  capacity)
        hooked = labels.at[labels].min(nmin)
        l = hooked
        for _ in range(3):  # bounded path compression per sweep
            l = l[l]
        return l

    def cond(state):
        labels, prev_changed, it = state
        return prev_changed & (it < max_sweeps)

    def body(state):
        labels, _, it = state
        new = sweep(labels)
        return new, jnp.any(new != labels), it + 1

    labels, _, _ = jax.lax.while_loop(
        cond, body, (sweep(labels0), jnp.bool_(True), jnp.int32(1)))
    return _compress(labels)


@partial(jax.jit, static_argnames=("min_size",))
def renumber_by_size(labels: jnp.ndarray, min_size: int,
                     orig_index: Optional[jnp.ndarray] = None
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Renumber root labels to 1..ngroups by decreasing size; 0 = untagged.

    Mirrors the reference's group numbering convention
    (``MPICompileGroups``/``ReorderGroupIDs``: groups sorted by size, ids
    start at 1, particles in groups below min_size get pfof=0).
    Tie-break: smaller minimum original particle index first (deterministic).
    Returns (pfof, ngroups) in the same (sorted) order as ``labels``.
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

    b2: float

    def __call__(self, d2, own, nbr):
        return d2 <= self.b2


@dataclasses.dataclass(frozen=True)
class Pred3DTypes:
    """FOF3dDM (fofalgo.cxx): both particles must be of the given type for a
    link (baryons may not form links; used when iBaryonSearch>1)."""

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

def _round_capacity(kmax: int) -> int:
    """Round max occupancy up to a tame set of static capacities to bound
    recompilation count."""
    for k in (8, 16, 32, 48, 64, 96, 128, 192, 256, 384, 512, 768, 1024):
        if kmax <= k:
            return k
    return int(2 ** math.ceil(math.log2(max(kmax, 1))))


def fof3d(
    pos,
    linking_length: float,
    boxsize: Optional[float] = None,
    min_size: int = 8,
    vel=None,
    extra_fields: Optional[Dict[str, jnp.ndarray]] = None,
    predicate: Optional[PairPredicate] = None,
    capacity: Optional[int] = None,
    target_cells_per_dim: Optional[int] = None,
    return_order: bool = False,
):
    """3DFOF over positions (optionally with a custom criterion).

    Mirrors reference SearchFullSet's 3DFOF stage (search.cxx:24-213).
    Returns (pfof, ngroups) with pfof in *original* particle order, group ids
    1..ngroups sorted by decreasing size, 0 = untagged.
    """
    pos = jnp.asarray(pos)
    n = pos.shape[0]
    lo = np.asarray(jax.device_get(jnp.min(pos, axis=0)))
    hi = np.asarray(jax.device_get(jnp.max(pos, axis=0)))
    periodic = boxsize is not None and boxsize > 0
    grid = build_grid(lo, hi, linking_length, periodic=periodic,
                      boxsize=boxsize or 0.0,
                      target_cells_per_dim=target_cells_per_dim)
    binning = bin_particles(pos, grid)
    kmax, ncocc = jax.device_get(
        (jnp.max(binning.cell_count), binning.num_cells))
    if capacity is None:
        capacity = _round_capacity(int(kmax))
    tile_cells = 16
    while tile_cells < int(ncocc):
        tile_cells *= 2
    tile_cells = min(tile_cells, n)
    order = binning.order
    pos_s = pos[order]
    fields = {}
    if vel is not None:
        fields["vel"] = jnp.asarray(vel)[order]
    if extra_fields:
        for k, v in extra_fields.items():
            fields[k] = jnp.asarray(v)[order]
    if predicate is None:
        predicate = Pred3D(float(linking_length) ** 2)
    labels = fof_labels_hostloop(pos_s, fields, binning, grid, predicate,
                                 capacity, tile_cells)
    pfof_sorted, ngroups = renumber_by_size(labels, min_size, orig_index=order)
    pfof = jnp.zeros(n, jnp.int32).at[order].set(pfof_sorted)
    if return_order:
        return pfof, ngroups, order
    return pfof, ngroups


def nearest_assign_sweep(
    groups: jnp.ndarray,
    dist_pad: jnp.ndarray,
    pos_pad: jnp.ndarray,
    fields_pad: Dict[str, jnp.ndarray],
    own_start: jnp.ndarray,
    own_cnt: jnp.ndarray,
    windows,
    grid: CellGrid,
    capacity: int,
    metric,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Assign each particle to the group of its nearest *tagged* neighbour.

    ``metric(d2, own, nbr) -> (dist, eligible)``: generalised distance and a
    bool gate per pair.  Returns (best_group, best_dist) per sorted
    particle; untouched slots keep (0, +inf).  Used for the baryon
    phase-space association (reference SearchBaryons, search.cxx:3201+)
    where every baryon adopts the group of the phase-space-nearest tagged
    DM particle.
    """
    n = groups.shape[0]
    K = capacity
    W = 3 * K
    awin_s, awin_c, bwin_s, bwin_c = windows
    groups_pad = _pad_flat(groups, W, 0)

    karange = jnp.arange(K, dtype=jnp.int32)
    own_pos = _slice_tile(pos_pad, own_start, K)
    own_valid = karange[None, :] < own_cnt[:, None]
    own_fields = {k: _slice_tile(v, own_start, K)
                  for k, v in fields_pad.items()}
    best_d = _slice_tile(dist_pad, own_start, K)
    best_g = jnp.zeros_like(own_valid, jnp.int32)

    def scan_window(carry, sw):
        best_d, best_g = carry
        s, cnt, width = sw
        nbr_pos = _slice_tile(pos_pad, s, width)
        nbr_grp = _slice_tile(groups_pad, s, width)
        nbr_fields = {k: _slice_tile(v, s, width)
                      for k, v in fields_pad.items()}

        def body(w, carry):
            best_d, best_g = carry
            d2 = _pair_d2_bcast(own_pos, nbr_pos[:, w][:, None, :], grid)
            nbr_w = {k: v[:, w][:, None] if v.ndim == 2
                     else v[:, w][:, None, :] for k, v in nbr_fields.items()}
            dist, elig = metric(d2, own_fields, nbr_w)
            g_w = nbr_grp[:, w][:, None]
            ok = elig & (g_w > 0) & own_valid & (w < cnt)[:, None] & \
                (dist < best_d)
            return (jnp.where(ok, dist, best_d),
                    jnp.where(ok, g_w, best_g))

        return jax.lax.fori_loop(0, width, body, (best_d, best_g)), None

    for o in range(9):
        (best_d, best_g), _ = scan_window((best_d, best_g),
                                          (awin_s[o], awin_c[o], W))
    if grid.periodic and grid.ncells[2] >= 3:
        for o in range(9):
            (best_d, best_g), _ = scan_window((best_d, best_g),
                                              (bwin_s[o], bwin_c[o], K))

    out_idx = jnp.where(own_valid, own_start[:, None] + karange[None, :], n)
    dist_out = jnp.full((n,), jnp.inf, pos_pad.dtype).at[
        out_idx.reshape(-1)].min(best_d.reshape(-1), mode="drop")
    grp_out = jnp.zeros((n,), jnp.int32)
    # scatter group of the min: use set (each particle written exactly once
    # since it belongs to exactly one cell tile slot)
    grp_out = grp_out.at[out_idx.reshape(-1)].set(best_g.reshape(-1),
                                                  mode="drop")
    return grp_out, dist_out


@partial(jax.jit, static_argnames=("grid", "predicate", "capacity",
                                   "tile_cells", "nsweeps"))
def _sweep_block(labels, pos_pad, fields_pad, own_start, own_cnt, windows,
                 binning_unused, grid, predicate, capacity: int,
                 tile_cells: int, nsweeps: int):
    """Run up to ``nsweeps`` hook+compress sweeps; returns (labels, changed).

    Bounded work per device dispatch: the axon TPU tunnel kills kernels
    that run for minutes, so the FOF fixed point is chunked host-side
    instead of a single unbounded ``lax.while_loop``.
    """
    def sweep(labels):
        nmin = neighbor_min_sweep(labels, pos_pad, fields_pad, own_start,
                                  own_cnt, windows, grid, predicate,
                                  capacity)
        hooked = labels.at[labels].min(nmin)
        l = hooked
        for _ in range(3):
            l = l[l]
        return l

    def body(state):
        labels, _, it = state
        new = sweep(labels)
        return new, jnp.any(new != labels), it + 1

    def cond(state):
        _, changed, it = state
        return changed & (it < nsweeps)

    labels2, changed, _ = jax.lax.while_loop(
        cond, body, (labels, jnp.bool_(True), jnp.int32(0)))
    return labels2, changed


def fof_labels_hostloop(pos_sorted, fields, binning, grid, predicate,
                        capacity: int, tile_cells: int,
                        sweeps_per_call: int = 4,
                        max_calls: int = 64) -> jnp.ndarray:
    """FOF fixed point with host-side chunking (production driver path)."""
    n = pos_sorted.shape[0]
    W = 3 * capacity
    pos_pad = _pad_flat(pos_sorted, W, 0)
    fields_pad = {k: _pad_flat(v, W, 0) for k, v in fields.items()}
    own_start = binning.cell_start[:tile_cells]
    own_cnt = jnp.where(binning.ucid[:tile_cells] == INT32_MAX, 0,
                        binning.cell_count[:tile_cells])
    windows = neighbor_windows(binning, grid, tile_cells)
    labels = jnp.arange(n, dtype=jnp.int32)
    for _ in range(max_calls):
        labels, changed = _sweep_block(
            labels, pos_pad, fields_pad, own_start, own_cnt, windows, None,
            grid, predicate, capacity, tile_cells, sweeps_per_call)
        if not bool(jax.device_get(changed)):
            break
    return _compress(labels)
