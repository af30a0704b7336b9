"""Baryon association with dark-matter structures.

TPU-native equivalent of the reference ``SearchBaryons``
(/root/reference/src/search.cxx:3053-3588): after the DM-only structure
search, every gas/star/BH particle is assigned to the group of its
phase-space-nearest tagged DM particle, provided that DM particle lies
within the scaled linking length (:3201+).  The reference then re-runs
unbinding with baryons included; the caller does the same here.

The MPI baryon export/exchange machinery (mpiroutines.cxx:2170-3031)
disappears: the assignment is one global nearest-tagged-neighbour sweep
over the combined particle set (ops/fof.py::nearest_assign_sweep).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import fof
from ..utils import config as C


@dataclasses.dataclass(frozen=True)
class PhaseMetric:
    """Phase-space distance dx^2/ellx^2 + dv^2/ellv^2; eligible pairs are
    (baryon assignee, tagged DM candidate)."""

    ellx2: float
    ellv2: float

    def __call__(self, d2, own, nbr):
        dv2 = jnp.sum((own["vel"] - nbr["vel"]) ** 2, axis=-1)
        dist = d2 / self.ellx2 + dv2 / self.ellv2
        elig = (own["isb"] > 0) & (nbr["isb"] == 0) & (dist <= 1.0)
        return dist, elig


def search_baryons(opt: C.Options, pos_dm, vel_dm, pfof_dm,
                   pos_b, vel_b,
                   boxsize: Optional[float] = None,
                   vscale2: Optional[float] = None,
                   mesh=None) -> jnp.ndarray:
    """Assign baryons to DM groups; returns (Nb,) group ids (0=unassigned).

    Linking length: the halo linking length scaled like the reference's
    baryon search (physical ell * ellhalophysfac); velocity scale: the
    global halo dispersion (opt.HaloVelDispScale or measured here).
    """
    pos_dm = jnp.asarray(pos_dm)
    vel_dm = jnp.asarray(vel_dm)
    pos_b = jnp.asarray(pos_b)
    vel_b = jnp.asarray(vel_b)
    pfof_dm = jnp.asarray(pfof_dm)
    nb = pos_b.shape[0]

    ellx = opt.ellphys * opt.ellxscale * opt.ellhalophysfac
    if vscale2 is None:
        if opt.HaloVelDispScale > 0:
            vscale2 = opt.HaloVelDispScale
        else:
            sel = pfof_dm > 0
            w = sel.astype(pos_dm.dtype)
            mt = jnp.maximum(jnp.sum(w), 1.0)
            vm = jnp.sum(vel_dm * w[:, None], 0) / mt
            vscale2 = float(jax.device_get(
                jnp.sum(jnp.sum((vel_dm - vm) ** 2, -1) * w) / mt))
    ellv2 = max(vscale2, 1e-30) * opt.ellhalovelfac ** 2

    # the reference builds its search tree over ONLY the DM particles in
    # groups (search.cxx:3150 "sort particles so that tree only uses
    # particles in groups", :3196 KDTree over npartingroups) — untagged DM
    # can never win the assignment, so compact it away before the edge
    # build: the combined set shrinks from N_dm + N_b to ~0.15 N_dm + N_b
    # and the candidate-window build (the dominant cost) shrinks with it
    tag = pfof_dm > 0
    ntag = int(jax.device_get(jnp.sum(tag)))
    if ntag == 0:
        return jnp.zeros(nb, jnp.int32)
    didx = jnp.nonzero(tag, size=ntag)[0]
    pos_d, vel_d = pos_dm[didx], vel_dm[didx]
    grp_d = pfof_dm[didx].astype(jnp.int32)
    nd = ntag

    if mesh is not None and boxsize:
        # sharded assignment: slab decomposition + ghost DM exchange (the
        # analog of the reference's MPI baryon export machinery,
        # mpiroutines.cxx:2170-3031); same metric and tie-break as below
        from ..parallel.distributed_baryons import distributed_baryon_assign

        pos_c = jnp.concatenate([pos_d, jnp.asarray(pos_b)])
        vel_c = jnp.concatenate([vel_d, jnp.asarray(vel_b)])
        grp_c = jnp.concatenate([grp_d, jnp.zeros(nb, jnp.int32)])
        return jnp.asarray(distributed_baryon_assign(
            pos_c, vel_c, grp_c, nd, float(ellx * ellx), float(ellv2),
            mesh, float(boxsize)))

    pos = jnp.concatenate([pos_d, pos_b])
    vel = jnp.concatenate([vel_d, vel_b])
    isb = jnp.concatenate([jnp.zeros(nd, jnp.int32),
                           jnp.ones(nb, jnp.int32)])
    groups = jnp.concatenate([grp_d, jnp.zeros(nb, jnp.int32)])
    n = nd + nb

    metric = PhaseMetric(float(ellx * ellx), float(ellv2))
    # the edge ELIGIBILITY is orientation-free (one baryon, one DM, inside
    # the phase ellipse), so the symmetric half-stencil builders apply —
    # including the slab-chunked path at 256^3+ grids (the directed table
    # would otherwise fall back to a coarsened grid); the directional
    # (baryon -> DM) metric is then evaluated on both orientations
    edges, _, grid = fof.build_edges(
        pos, ellx, boxsize=boxsize,
        fields={"vel": vel, "isb": isb},
        predicate=_PairInRange(float(ellx * ellx), float(ellv2)))
    order = edges.order
    groups_s = groups[order]
    erow, ecol = edges.erow, edges.ecol
    if edges.undirected:
        erow, ecol = (jnp.concatenate([erow, ecol]),
                      jnp.concatenate([ecol, erow]))
    grp_s, _ = fof.nearest_assign_edges(groups_s, edges.pos_s,
                                        edges.fields_s, erow,
                                        ecol, grid, metric)
    # keep existing DM assignments
    grp_s = jnp.where(edges.fields_s["isb"] > 0, grp_s, groups_s)
    grp = jnp.zeros(n, jnp.int32).at[order].set(grp_s)
    return grp[nd:]


@dataclasses.dataclass(frozen=True)
class _PairInRange:
    """Symmetric edge eligibility: exactly one of the pair is a baryon and
    the pair lies inside the phase-space ellipse (reference candidate
    gathering for the baryon association, search.cxx:3201+)."""

    ellx2: float
    ellv2: float
    symmetric = True

    def __call__(self, d2, own, nbr):
        dv2 = jnp.sum((own["vel"] - nbr["vel"]) ** 2, axis=-1)
        dist = d2 / self.ellx2 + dv2 / self.ellv2
        return (own["isb"] != nbr["isb"]) & (dist <= 1.0)
