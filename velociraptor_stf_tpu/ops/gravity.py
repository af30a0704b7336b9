"""Gravitational potential kernels.

TPU-native replacement for the reference's KD-tree monopole potential walk
(/root/reference/src/unbind.cxx:1480 ``Potential``, tree acceptance
``GetNodeList``/``MarkCell``:13-45).  Instead of per-particle tree walks:

* groups are bucketed by size class; each class runs dense, statically
  shaped tiled O(K^2) direct sums (the same all-pairs work a tree does for
  small groups, but laid out as MXU/VPU-friendly tiles);
* very large groups use a cell-monopole far field: particles are binned on
  a per-group uniform grid, near-field (own + 26 neighbour cells) is summed
  directly, far cells contribute monopoles -G M_c / |x - cm_c|.  This is
  the reference's Barnes-Hut monopole acceptance with a uniform one-level
  decomposition (opening angle ~ cell/distance <= 0.5 beyond the 27-cell
  neighbourhood).

Softening: Phi = -G m / sqrt(r^2 + eps^2) (Plummer), matching the
reference's sqrtdist2eps2 usage.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import cells as C


def _pair_potential_rows(row_pos, row_idx, all_pos, all_mass, all_valid,
                         eps2, G):
    """Potential of row particles due to all (valid) particles, excluding
    self-interaction by index equality.  Shapes: row (R,3)/(R,), all (K,3)."""
    d = row_pos[:, None, :] - all_pos[None, :, :]
    d2 = jnp.sum(d * d, axis=-1) + eps2
    inv = jax.lax.rsqrt(d2)
    notself = row_idx[:, None] != jnp.arange(all_pos.shape[0])[None, :]
    w = jnp.where(notself & all_valid[None, :], all_mass[None, :] * inv, 0.0)
    return -G * jnp.sum(w, axis=1)


@partial(jax.jit, static_argnames=("row_chunk",))
def direct_potential_group(pos, mass, valid, eps2, G, row_chunk: int = 512):
    """(K,) potential for one padded group via row-chunked direct sum."""
    k = pos.shape[0]
    nchunk = -(-k // row_chunk)
    padk = nchunk * row_chunk
    idx = jnp.arange(padk, dtype=jnp.int32).reshape(nchunk, row_chunk)

    def do_rows(ridx):
        r = jnp.minimum(ridx, k - 1)
        return _pair_potential_rows(pos[r], r, pos, mass, valid, eps2, G)

    out = jax.lax.map(do_rows, idx).reshape(-1)[:k]
    return jnp.where(valid, out, 0.0)


@partial(jax.jit, static_argnames=("capacity", "row_chunk"))
def potential_class(pos_s, mass_s, starts, counts, capacity: int, eps2, G,
                    row_chunk: int = 256):
    """Direct potential for a batch of groups padded to ``capacity``.

    pos_s/mass_s: group-sorted particle arrays (N,3)/(N,).
    starts/counts: (Gc,) group slices in the sorted arrays.
    Returns (Gc, capacity) potentials (0 on padding).
    """
    n = pos_s.shape[0]
    karange = jnp.arange(capacity, dtype=jnp.int32)

    def one_group(sc):
        s, cnt = sc
        idx = jnp.minimum(s + karange, n - 1)
        valid = karange < cnt
        p = pos_s[idx]
        m = jnp.where(valid, mass_s[idx], 0.0)
        return direct_potential_group(p, m, valid, eps2, G,
                                      row_chunk=min(row_chunk, capacity))

    return jax.lax.map(one_group, (starts, counts))


@partial(jax.jit, static_argnames=("row_chunk",))
def _monopole_far_potential(pos, cell_of_particle, cell_coords, cell_cm,
                            cell_mass, eps2, G, row_chunk: int = 1024):
    """Far-field: sum of -G M_c / |x - cm_c| over all cells outside the
    particle's 27-cell neighbourhood, masked elementwise via integer cell
    coordinates (Chebyshev distance > 1) -- the exact complement of the
    near-field direct sum, with no cancellation."""
    k = pos.shape[0]
    nchunk = -(-k // row_chunk)
    idxs = jnp.arange(nchunk * row_chunk, dtype=jnp.int32).reshape(
        nchunk, row_chunk)

    def do_rows(ridx):
        r = jnp.minimum(ridx, k - 1)
        p = pos[r]
        own = cell_coords[cell_of_particle[r]]             # (R,3)
        dcell = jnp.abs(own[:, None, :] - cell_coords[None, :, :])
        far = jnp.max(dcell, axis=-1) > 1                  # (R,C)
        d = p[:, None, :] - cell_cm[None, :, :]
        d2 = jnp.sum(d * d, axis=-1) + eps2
        inv = jax.lax.rsqrt(d2)
        w = jnp.where(far & (cell_mass[None, :] > 0),
                      cell_mass[None, :] * inv, 0.0)
        return -G * jnp.sum(w, axis=1)

    return jax.lax.map(do_rows, idxs).reshape(-1)[:k]


def grid_monopole_potential(pos: np.ndarray, mass: np.ndarray, eps2: float,
                            G: float, target_occupancy: int = 512
                            ) -> jnp.ndarray:
    """Potential for one large group via near-direct + far-monopole.

    Host-orchestrated: picks a grid so max cell occupancy is bounded, then
    runs jitted near/far passes.  Used for groups too large for the direct
    O(K^2) classes.
    """
    pos = jnp.asarray(pos)
    mass = jnp.asarray(mass)
    npart = pos.shape[0]
    lo = np.asarray(jax.device_get(jnp.min(pos, 0)))
    hi = np.asarray(jax.device_get(jnp.max(pos, 0)))
    extent = float(np.max(hi - lo))
    # start with ~cube-root cells and refine until occupancy bounded
    ncdim = max(4, int(math.ceil((npart / target_occupancy) ** (1 / 3))))
    for _ in range(6):
        grid = C.build_grid(lo, hi, extent / ncdim)
        binning = C.bin_particles(pos, grid)
        kmax = int(jax.device_get(jnp.max(binning.cell_count)))
        if kmax <= 4 * target_occupancy:
            break
        ncdim *= 2
    cap = 1
    while cap < kmax:
        cap *= 2

    order = binning.order
    pos_s, mass_s = pos[order], mass[order]
    # compact occupied cells to a host-known (padded) count: unique cell ids
    # sort ascending so all real cells precede the INT32_MAX padding
    ncocc = int(jax.device_get(binning.num_cells))
    csize = 1
    while csize < max(ncocc, 2):
        csize *= 2
    csize = min(csize, npart)
    # per-cell monopoles over compacted cells
    csum = jax.ops.segment_sum(mass_s, binning.pcell, num_segments=csize)
    ccm = jax.ops.segment_sum(pos_s * mass_s[:, None], binning.pcell,
                              num_segments=csize)
    ccm = ccm / jnp.maximum(csum, 1e-30)[:, None]
    nbr_table = C.neighbor_cell_table(binning, grid)[:csize]
    cell_coords = C.unpack_cells(binning.ucid[:csize], grid)

    # near field: particles in own + neighbour cells, direct
    w_near = _near_field_potential(
        pos_s, mass_s, binning.ucid[:csize], binning.cell_start[:csize],
        binning.cell_count[:csize], nbr_table, cap, eps2, G)
    w_far = _monopole_far_potential(pos_s, binning.pcell, cell_coords,
                                    ccm, csum, eps2, G)
    w_sorted = w_near + w_far
    out = jnp.zeros(npart, pos.dtype).at[order].set(w_sorted)
    return out


@partial(jax.jit, static_argnames=("capacity",))
def _near_field_potential(pos_s, mass_s, ucid, start, count, nbr_table,
                          capacity: int, eps2, G):
    """Direct potential from own + 26 neighbour cells, batched over cells."""
    n = pos_s.shape[0]
    ncell = ucid.shape[0]
    karange = jnp.arange(capacity, dtype=jnp.int32)
    batch = max(1, (1 << 18) // (capacity * capacity))
    nbatch = -(-ncell // batch)
    cell_idx = jnp.arange(nbatch * batch, dtype=jnp.int32).reshape(
        nbatch, batch)

    def do_batch(cbatch):
        c = jnp.minimum(cbatch, ncell - 1)
        ok = (cbatch < ncell) & (ucid[c] != C.INT32_MAX)
        s, cnt = start[c], jnp.where(ok, count[c], 0)
        oidx = jnp.minimum(s[:, None] + karange[None, :], n - 1)
        ovalid = karange[None, :] < cnt[:, None]
        opos = pos_s[oidx]
        acc = jnp.zeros((c.shape[0], capacity), pos_s.dtype)
        for o in range(27):
            j = nbr_table[c, o]
            jok = j >= 0
            jc = jnp.maximum(j, 0)
            ns, ncnt = start[jc], jnp.where(jok, count[jc], 0)
            nidx = jnp.minimum(ns[:, None] + karange[None, :], n - 1)
            nvalid = karange[None, :] < ncnt[:, None]
            npos = pos_s[nidx]
            nmass = jnp.where(nvalid, mass_s[nidx], 0.0)
            d = opos[:, :, None, :] - npos[:, None, :, :]
            d2 = jnp.sum(d * d, -1) + eps2
            inv = jax.lax.rsqrt(d2)
            notself = oidx[:, :, None] != nidx[:, None, :]
            acc = acc - G * jnp.sum(
                jnp.where(notself, nmass[:, None, :] * inv, 0.0), axis=2)
        out_idx = jnp.where(ovalid, oidx, n)
        return out_idx.reshape(-1), jnp.where(ovalid, acc, 0.0).reshape(-1)

    idxs, vals = jax.lax.map(do_batch, cell_idx)
    return jnp.zeros(n, pos_s.dtype).at[idxs.reshape(-1)].add(
        vals.reshape(-1), mode="drop")
