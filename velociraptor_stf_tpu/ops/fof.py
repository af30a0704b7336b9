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


def _slice_fields(fields: Dict[str, jnp.ndarray], idx: jnp.ndarray,
                  valid: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    out = {}
    for k, v in fields.items():
        out[k] = v[idx]
    out["_valid"] = valid
    return out


def _pair_d2(own_pos, nbr_pos, grid: CellGrid):
    """(B,K,K) squared distances with periodic minimum image."""
    d = own_pos[:, :, None, :] - nbr_pos[:, None, :, :]
    if grid.periodic:
        box = jnp.asarray(grid.boxsize, d.dtype)
        d = d - box * jnp.round(d / box)
    return jnp.sum(d * d, axis=-1)


def neighbor_min_sweep(
    labels: jnp.ndarray,
    pos_sorted: jnp.ndarray,
    fields: Dict[str, jnp.ndarray],
    binning: Binning,
    grid: CellGrid,
    predicate: PairPredicate,
    capacity: int,
    batch_cells: int,
) -> jnp.ndarray:
    """One sweep: per sorted particle, min label over linked neighbours.

    labels/pos_sorted/fields are in sorted order.  Returns (N,) min labels
    (>= own label is possible only for padding; real particles include self).
    """
    n = labels.shape[0]
    k = capacity
    nc = jnp.asarray(grid.ncells, jnp.int32)
    ucid = binning.ucid
    start, count = binning.cell_start, binning.cell_count
    sentinel = jnp.int32(np.iinfo(np.int32).max)
    karange = jnp.arange(k, dtype=jnp.int32)

    num_batches = -(-n // batch_cells)
    pad_cells = num_batches * batch_cells
    cell_idx = jnp.arange(pad_cells, dtype=jnp.int32).reshape(num_batches,
                                                              batch_cells)

    coords_all = unpack_cells(ucid, grid)  # (N,3)

    def do_batch(cells):
        c = jnp.minimum(cells, n - 1)
        cell_ok = (cells < n) & (ucid[c] != INT32_MAX)
        own_start, own_cnt = start[c], jnp.where(cell_ok, count[c], 0)
        own_idx = own_start[:, None] + karange[None, :]          # (B,K)
        own_valid = karange[None, :] < own_cnt[:, None]
        own_idx_c = jnp.minimum(own_idx, n - 1)
        own_pos = pos_sorted[own_idx_c]                           # (B,K,3)
        own_lab = jnp.where(own_valid, labels[own_idx_c], sentinel)
        own_f = _slice_fields(fields, own_idx_c, own_valid)

        best = own_lab                                            # self term
        coords = coords_all[c]                                    # (B,3)

        for off in _OFFSETS:
            ncoord = coords + jnp.asarray(off, jnp.int32)[None, :]
            if grid.periodic:
                ncoord = jnp.mod(ncoord, nc)
                in_range = cell_ok
            else:
                in_range = cell_ok & jnp.all((ncoord >= 0) & (ncoord < nc),
                                             axis=-1)
                ncoord = jnp.clip(ncoord, 0, nc - 1)
            nid = pack_cells(ncoord, grid)
            j = jnp.searchsorted(ucid, nid, side="left").astype(jnp.int32)
            j = jnp.minimum(j, n - 1)
            found = in_range & (ucid[j] == nid)
            nbr_cnt = jnp.where(found, count[j], 0)
            nbr_idx = start[j][:, None] + karange[None, :]
            nbr_valid = karange[None, :] < nbr_cnt[:, None]
            nbr_idx_c = jnp.minimum(nbr_idx, n - 1)
            nbr_pos = pos_sorted[nbr_idx_c]
            nbr_lab = jnp.where(nbr_valid, labels[nbr_idx_c], sentinel)
            nbr_f = _slice_fields(fields, nbr_idx_c, nbr_valid)

            d2 = _pair_d2(own_pos, nbr_pos, grid)                 # (B,K,K)
            link = predicate(d2, own_f, nbr_f)
            link = link & own_valid[:, :, None] & nbr_valid[:, None, :]
            cand = jnp.where(link, nbr_lab[:, None, :], sentinel)
            best = jnp.minimum(best, jnp.min(cand, axis=2))

        out_idx = jnp.where(own_valid, own_idx, n)                # n -> drop
        return out_idx.reshape(-1), best.reshape(-1)

    idxs, bests = jax.lax.map(do_batch, cell_idx)
    nmin = jnp.full((n,), sentinel, labels.dtype)
    nmin = nmin.at[idxs.reshape(-1)].min(bests.reshape(-1), mode="drop")
    # padding slots keep sentinel; real particles always see themselves
    return jnp.where(nmin == sentinel, labels, nmin)


def _compress(labels: jnp.ndarray) -> jnp.ndarray:
    """Full path compression: labels <- labels[labels] to fixpoint."""

    def cond(l):
        return jnp.any(l != l[l])

    def body(l):
        return l[l[l]]  # double jump per iteration

    return jax.lax.while_loop(cond, body, labels)


@partial(jax.jit, static_argnames=("grid", "predicate", "capacity",
                                   "batch_cells", "max_sweeps"))
def fof_labels_sorted(
    pos_sorted: jnp.ndarray,
    fields: Dict[str, jnp.ndarray],
    binning: Binning,
    grid: CellGrid,
    predicate: PairPredicate,
    capacity: int,
    batch_cells: int = 256,
    max_sweeps: int = 64,
) -> jnp.ndarray:
    """Run the FOF fixed point; returns per-sorted-particle root labels."""
    n = pos_sorted.shape[0]
    labels0 = jnp.arange(n, dtype=jnp.int32)

    def sweep(labels):
        nmin = neighbor_min_sweep(labels, pos_sorted, fields, binning, grid,
                                  predicate, capacity, batch_cells)
        hooked = labels.at[labels].min(nmin)
        return _compress(hooked)

    def cond(state):
        labels, prev_changed, it = state
        return prev_changed & (it < max_sweeps)

    def body(state):
        labels, _, it = state
        new = sweep(labels)
        return new, jnp.any(new != labels), it + 1

    labels, _, _ = jax.lax.while_loop(
        cond, body, (sweep(labels0), jnp.bool_(True), jnp.int32(1)))
    return labels


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

def make_pred_3d(b2: float) -> PairPredicate:
    """Plain 3DFOF: physical separation within linking length."""

    def pred(d2, own, nbr):
        return d2 <= b2

    return pred


def make_pred_3d_types(b2: float, dark_type: int = 1) -> PairPredicate:
    """FOF3dDM (fofalgo.cxx): both particles must be of the given type for a
    link (baryons may not form links; used when iBaryonSearch>1)."""

    def pred(d2, own, nbr):
        ok = (own["ptype"][:, :, None] == dark_type) & \
             (nbr["ptype"][:, None, :] == dark_type)
        return (d2 <= b2) & ok

    return pred


def make_pred_6d(b2: float, v2: float, same_group: bool = True) -> PairPredicate:
    """FOF6d: dx^2/ellx^2 + dv^2/ellv^2 <= 1, optionally restricted to pairs
    in the same parent (3DFOF) group (reference search.cxx:552-576 runs the
    6D search per 3DFOF group)."""

    def pred(d2, own, nbr):
        dv = own["vel"][:, :, None, :] - nbr["vel"][:, None, :, :]
        dv2 = jnp.sum(dv * dv, axis=-1)
        ok = d2 / b2 + dv2 / v2 <= 1.0
        if same_group:
            ok = ok & (own["group"][:, :, None] == nbr["group"][:, None, :])
        return ok

    return pred


def make_pred_6d_scaled(same_group: bool = True) -> PairPredicate:
    """6DFOF with per-particle velocity scale: dx^2/b^2 + dv^2/vscale2 <= 1
    where b is baked into pre-scaled positions (unit radius) and vscale2 is a
    per-particle field (adaptive per-group scale, FOF6DADAPTIVE)."""

    def pred(d2, own, nbr):
        dv = own["vel"][:, :, None, :] - nbr["vel"][:, None, :, :]
        dv2 = jnp.sum(dv * dv, axis=-1)
        ok = d2 + dv2 / own["vscale2"][:, :, None] <= 1.0
        if same_group:
            ok = ok & (own["group"][:, :, None] == nbr["group"][:, None, :])
        return ok

    return pred


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
    batch_cells: Optional[int] = None,
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
    if capacity is None:
        kmax = int(jax.device_get(jnp.max(binning.cell_count)))
        capacity = _round_capacity(kmax)
    if batch_cells is None:
        batch_cells = max(8, min(512, (1 << 21) // (capacity * capacity)))
    order = binning.order
    pos_s = pos[order]
    fields = {}
    if vel is not None:
        fields["vel"] = jnp.asarray(vel)[order]
    if extra_fields:
        for k, v in extra_fields.items():
            fields[k] = jnp.asarray(v)[order]
    if predicate is None:
        predicate = make_pred_3d(float(linking_length) ** 2)
    labels = fof_labels_sorted(pos_s, fields, binning, grid, predicate,
                               capacity, batch_cells)
    pfof_sorted, ngroups = renumber_by_size(labels, min_size, orig_index=order)
    pfof = jnp.zeros(n, jnp.int32).at[order].set(pfof_sorted)
    if return_order:
        return pfof, ngroups, order
    return pfof, ngroups
