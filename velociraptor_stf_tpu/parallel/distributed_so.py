"""Distributed spherical-overdensity masses over a device mesh.

The sharded analog of the reference's halo-region import for SO searches
(/root/reference/src/mpiroutines.cxx:1723-2165 MPIGetHaloSearchExportNum /
MPIBuildHaloSearchImportList: ranks ship every particle inside a remote
halo's search ball to the halo's owner, which then radius-sorts and finds
the overdensity crossings).

TPU-native design: no particle import at all.  Halo centers/search radii
are tiny (H << N) and live replicated; particle shards stay where they
are.  Every device bins ITS OWN shard on the same host-static class grid
(ops/cells.py geometry is shard-independent), evaluates the same
27-stencil candidate windows against all halo centers, and accumulates a
partial per-(halo, log-radius-bin) mass/count histogram
(ops/so.py::_class_histogram).  One ``psum`` over the mesh replaces the
entire import dance — communication is O(H * nbins) on ICI instead of
O(particles-in-overlap) point-to-point.  The crossing interpolation
(ops/so.py::_so_crossings) runs replicated on the reduced histograms.

Shard padding uses mass-0 sentinels; the histogram kernel excludes
zero-mass candidates from both mass and count accumulation.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import fof, so
from ..ops.cells import CellGrid, bin_particles, build_grid, cell_coords
from . import collectives as coll
from .mesh import PARTS_AXIS


@partial(jax.jit, static_argnames=("grid", "mesh"))
def _candidate_total_mapped(pos_b, centers, grid: CellGrid, mesh: Mesh):
    """Max over devices of the per-shard candidate-window total (the static
    flat-table pad must hold the largest shard's windows)."""

    def body(pos_blk, ctr):
        p = pos_blk[0]
        binning = bin_particles(p, grid, lean=True)
        qc = cell_coords(ctr, grid)
        _, pcn = so.point_windows_dense(qc, binning.cid_sorted, grid)
        t = jnp.sum(pcn.sum(axis=1))
        return coll.pmax(t, PARTS_AXIS)

    return jax.shard_map(body, mesh=mesh, in_specs=(P(PARTS_AXIS), P()),
                         out_specs=P())(pos_b, centers)


@partial(jax.jit, static_argnames=("grid", "t_pad", "nbins", "lnumin",
                                   "mesh"))
def _class_histogram_mapped(pos_b, mass_b, centers, rsearch,
                            grid: CellGrid, t_pad: int, nbins: int,
                            lnumin: float, mesh: Mesh):
    """psum-reduced (H, nbins) mass/count histograms for one radius class."""

    def body(pos_blk, mass_blk, ctr, rs):
        p = pos_blk[0]
        m = mass_blk[0]
        binning = bin_particles(p, grid, lean=True)
        Mh, Nh = so._class_histogram(p[binning.order], m[binning.order],
                                     ctr, rs, binning.cid_sorted, grid,
                                     t_pad, nbins, lnumin)
        return (coll.psum(Mh, PARTS_AXIS),
                coll.psum(Nh, PARTS_AXIS))

    return jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(PARTS_AXIS), P(PARTS_AXIS), P(), P()),
        out_specs=(P(), P()))(pos_b, mass_b, centers, rsearch)


@coll.staged("so")
def distributed_so_masses(pos, mass, centers, rsearch, lnrho_thresholds,
                          mesh: Mesh, boxsize: Optional[float] = None,
                          nbins: int = 128, umin: float = 3e-3,
                          minnum=None, first_mass=None
                          ) -> Tuple[np.ndarray, np.ndarray]:
    """SO masses/radii from ALL (mesh-sharded) particles for H halos.

    Same contract as ops/so.py::so_masses_all_particles; the particle
    arrays stay DEVICE-RESIDENT, sharded over ``mesh``, and are never
    gathered — the host sees only per-halo metadata (H-sized).
    """
    from ..utils.transfer import fetch_small

    ndev = mesh.devices.size
    pos = jnp.asarray(pos, jnp.float32)
    mass = jnp.asarray(mass, jnp.float32)
    centers = np.asarray(centers)
    rsearch = np.asarray(rsearch, np.float64)
    H = centers.shape[0]
    nthr = len(lnrho_thresholds)
    M_out = np.zeros((H, nthr), np.float64)
    R_out = np.zeros((H, nthr), np.float64)
    if H == 0:
        return M_out, R_out
    if minnum is None:
        minnum = np.full(H, 1, np.int32)
    if first_mass is None:
        first_mass = np.zeros(H, np.float64)
    lnthr = jnp.asarray(np.asarray(lnrho_thresholds, np.float64),
                        jnp.float32)

    n = pos.shape[0]
    npad = -(-n // ndev) * ndev
    pad = npad - n
    if boxsize:
        glo, ghi = np.zeros(3), np.full(3, float(boxsize))
    else:
        glo = np.asarray(fetch_small(jnp.min(pos, 0)), np.float64)
        ghi = np.asarray(fetch_small(jnp.max(pos, 0)), np.float64)
    if pad:
        # mass-0 sentinels at an in-range point: the histogram kernel's
        # zero-mass guard keeps them out of both mass and count sums
        pos = jnp.concatenate([pos, jnp.broadcast_to(pos[:1], (pad, 3))])
        mass = jnp.concatenate([mass, jnp.zeros(pad, jnp.float32)])
    sh = NamedSharding(mesh, P(PARTS_AXIS))
    pos_b = jax.device_put(pos.reshape(ndev, npad // ndev, 3), sh)
    mass_b = jax.device_put(mass.reshape(ndev, npad // ndev), sh)

    # octave classes by search radius (host decision, as single-device)
    rs_max = float(rsearch.max())
    cls_of = np.maximum(0, np.ceil(np.log2(
        np.maximum(rs_max / np.maximum(rsearch, 1e-30), 1.0))).astype(int))
    lnumin = float(math.log(umin))
    for c in np.unique(cls_of):
        sel = np.where(cls_of == c)[0]
        w = rs_max / (1 << int(c))
        grid = build_grid(glo, ghi, w, periodic=bool(boxsize),
                          boxsize=boxsize or 0.0)
        ctr = jnp.asarray(centers[sel], jnp.float32)
        rs = jnp.asarray(rsearch[sel], jnp.float32)
        T = int(fetch_small(_candidate_total_mapped(
            pos_b, ctr, grid, mesh)))
        t_pad = fof._pad_pow2(max(T, 1))
        Mh, Nh = _class_histogram_mapped(pos_b, mass_b, ctr, rs, grid,
                                         t_pad, nbins, lnumin, mesh)
        M, R = so._so_crossings(
            Mh, Nh, rs, lnthr,
            jnp.asarray(minnum[sel], jnp.int32),
            jnp.asarray(first_mass[sel], jnp.float32),
            nbins, lnumin, nthr)
        M_out[sel] = np.asarray(fetch_small(M), np.float64)
        R_out[sel] = np.asarray(fetch_small(R), np.float64)
    return M_out, R_out
