"""Substructure search: phase-space outlier stream FOF + recursion.

TPU-native equivalent of the reference substructure pipeline:

* ``SearchSubset`` (/root/reference/src/search.cxx:910-1816): FOFSTPROB
  stream criterion (/root/reference/src/fofalgo.cxx ``FOFStreamwithprob``):
  a pair links when both particles are phase-space outliers
  (ell >= threshold), their separation is within the substructure linking
  length, their speed ratio is within [1/Vratio, Vratio] and the angle
  between their velocity vectors is below thetaopen.  With
  ``Iterative_searchflag`` the initial search uses tightened thresholds
  (ellfac/vfac/thetafac/nminfac, search.cxx:965-972), after which groups
  are expanded by attaching untagged particles that link to tagged ones
  under the base thresholds (``FOFStreamwithprobIterative`` semantics) and
  groups connected by enough relaxed links are merged
  (``MergeGroups``/``fmerge``, search.cxx:1088-1400).
* ``CheckSignificance`` (search.cxx:2947): groups must exceed the expected
  mean outlier value of a Gaussian tail by ``siglevel`` sigma; low-ell
  members are shed (lowest first) until significant, else dissolved.
* ``SearchSubSub`` (search.cxx:2480): recursion over structures with
  >= MINSUBSIZE particles — per structure, re-centre, rebuild the
  background grid + local velocity density + outlier values on the
  structure's own particles, run SearchSubset, unbind, splice new group
  ids, and recurse to MAXSUBLEVEL while tracking the parent hierarchy.

TPU design: each structure is padded to a power-of-two particle count so
the jitted per-structure pipeline compiles once per size class; padded
slots carry zero mass / -inf outlier values and cannot link or contribute.
"""

from __future__ import annotations

import dataclasses
import math
import os
from functools import partial
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from scipy.special import erf

from ..ops import fof, segments as seg
from ..ops.cells import bin_particles, build_grid
from ..utils import config as C
from ..utils import telemetry
from ..utils.transfer import fetch_bulk, fetch_small
from . import bgfield, localfield, unbind as unbind_mod


class _SubsubProf:
    """Per-phase wall-clock attribution for search_sub_sub, reported via
    the telemetry counters (``subsub_<phase>_ms``).  VR_SUBSUB_PROF=1
    additionally blocks on a device array at each phase end so async
    dispatch doesn't shift time into the next phase."""

    def __init__(self):
        import time as _t
        self._time = _t.time
        self._t0 = self._time()
        self.sync = os.environ.get("VR_SUBSUB_PROF") == "1"

    def lap(self, phase: str, wait=None):
        if self.sync and wait is not None:
            try:
                jax.block_until_ready(wait)
            except Exception:
                pass
        t = self._time()
        telemetry.count(f"subsub_{phase}_ms", int((t - self._t0) * 1000))
        self._t0 = t


@dataclasses.dataclass(frozen=True)
class StreamPred:
    """FOFStreamwithprob criterion (reference fofalgo.cxx:21-34)."""

    symmetric = True

    b2: float          # param[6]: physical linking length^2
    vratio: float      # param[7]
    costheta: float    # param[8] = cos(thetaopen * pi)
    ellthr: float      # param[9]

    def __call__(self, d2, own, nbr):
        v_own, v_nbr = own["vel"], nbr["vel"]
        v1 = jnp.sqrt(jnp.sum(v_own * v_own, -1))
        v2 = jnp.sqrt(jnp.sum(v_nbr * v_nbr, -1))
        vdot = jnp.sum(v_own * v_nbr, -1) / jnp.maximum(v1 * v2, 1e-30)
        ratio = v1 / jnp.maximum(v2, 1e-30)
        ok = (d2 < self.b2) & (vdot > self.costheta)
        ok = ok & (ratio < self.vratio) & (ratio > 1.0 / self.vratio)
        return ok & (own["ell"] >= self.ellthr) & (nbr["ell"] >= self.ellthr)


@dataclasses.dataclass(frozen=True)
class StreamPredAttach:
    """FOFStreamwithprobIterative semantics for group expansion: only ONE of
    the pair needs to be an outlier (the tagged side), used to attach
    untagged particles to existing groups (fofalgo.cxx:36-50)."""

    b2: float
    vratio: float
    costheta: float
    ellthr: float

    def __call__(self, d2, own, nbr):
        v_own, v_nbr = own["vel"], nbr["vel"]
        v1 = jnp.sqrt(jnp.sum(v_own * v_own, -1))
        v2 = jnp.sqrt(jnp.sum(v_nbr * v_nbr, -1))
        vdot = jnp.sum(v_own * v_nbr, -1) / jnp.maximum(v1 * v2, 1e-30)
        ratio = v1 / jnp.maximum(v2, 1e-30)
        ok = (d2 < self.b2) & (vdot > self.costheta)
        ok = ok & (ratio < self.vratio) & (ratio > 1.0 / self.vratio)
        return ok & ((own["ell"] >= self.ellthr) | (nbr["ell"] >= self.ellthr))


@dataclasses.dataclass(frozen=True)
class StreamPredNoProb:
    """FOFStream (fofalgo.cxx:7-19): stream criterion without the outlier
    gate."""

    symmetric = True

    b2: float
    vratio: float
    costheta: float

    def __call__(self, d2, own, nbr):
        v_own, v_nbr = own["vel"], nbr["vel"]
        v1 = jnp.sqrt(jnp.sum(v_own * v_own, -1))
        v2 = jnp.sqrt(jnp.sum(v_nbr * v_nbr, -1))
        vdot = jnp.sum(v_own * v_nbr, -1) / jnp.maximum(v1 * v2, 1e-30)
        ratio = v1 / jnp.maximum(v2, 1e-30)
        ok = (d2 < self.b2) & (vdot > self.costheta)
        return ok & (ratio < self.vratio) & (ratio > 1.0 / self.vratio)


@dataclasses.dataclass(frozen=True)
class StreamPredNoDist:
    """FOFStreamwithprobNNNODIST (fofalgo.cxx:68-81): no explicit linking
    length — any pair within the candidate stencil (the NN analog) links if
    the velocity angle/ratio and outlier gates pass."""

    symmetric = True

    vratio: float
    costheta: float
    ellthr: float

    def __call__(self, d2, own, nbr):
        v_own, v_nbr = own["vel"], nbr["vel"]
        v1 = jnp.sqrt(jnp.sum(v_own * v_own, -1))
        v2 = jnp.sqrt(jnp.sum(v_nbr * v_nbr, -1))
        vdot = jnp.sum(v_own * v_nbr, -1) / jnp.maximum(v1 * v2, 1e-30)
        ratio = v1 / jnp.maximum(v2, 1e-30)
        ok = (vdot > self.costheta)
        ok = ok & (ratio < self.vratio) & (ratio > 1.0 / self.vratio)
        return ok & (own["ell"] >= self.ellthr) & (nbr["ell"] >= self.ellthr)


@dataclasses.dataclass(frozen=True)
class StreamPredLX:
    """FOFStreamwithprobLX (fofalgo.cxx:83-101): per-axis linking lengths
    shrunk along each particle's velocity direction; the pair links if
    either particle's scaled distance is within 1."""

    symmetric = True

    b2: float
    vratio: float
    costheta: float
    ellthr: float

    def __call__(self, d2, own, nbr):
        v_own, v_nbr = own["vel"], nbr["vel"]
        dx = own["pos"] - nbr["pos"]
        v1sq = jnp.maximum(jnp.sum(v_own * v_own, -1), 1e-30)
        v2sq = jnp.maximum(jnp.sum(v_nbr * v_nbr, -1), 1e-30)

        def scaled(v, vsq):
            f = 0.25 * (1.0 + v * v / vsq[..., None]) ** 2
            return jnp.sum(dx * dx / (self.b2 * f), -1)

        total = jnp.minimum(scaled(v_own, v1sq), scaled(v_nbr, v2sq))
        v1 = jnp.sqrt(v1sq)
        v2 = jnp.sqrt(v2sq)
        vdot = jnp.sum(v_own * v_nbr, -1) / jnp.maximum(v1 * v2, 1e-30)
        ratio = v1 / v2
        ok = (total <= 1.0) & (vdot > self.costheta)
        ok = ok & (ratio < self.vratio) & (ratio > 1.0 / self.vratio)
        return ok & (own["ell"] >= self.ellthr) & (nbr["ell"] >= self.ellthr)


@dataclasses.dataclass(frozen=True)
class StreamPredScaleEll:
    """FOFStreamwithprobscaleell (fofalgo.cxx:120-137): linking length
    scaled by (min pair mass / reference mass)^(2/3) — multi-resolution
    (zoom/AMR) inputs where heavier particles get longer links."""

    symmetric = True

    b2: float
    vratio: float
    costheta: float
    ellthr: float
    mref: float

    def __call__(self, d2, own, nbr):
        mmin = jnp.minimum(own["mass"], nbr["mass"])
        ellscale = self.b2 * jnp.power(
            jnp.maximum(mmin / self.mref, 1e-30), 2.0 / 3.0)
        v_own, v_nbr = own["vel"], nbr["vel"]
        v1 = jnp.sqrt(jnp.sum(v_own * v_own, -1))
        v2 = jnp.sqrt(jnp.sum(v_nbr * v_nbr, -1))
        vdot = jnp.sum(v_own * v_nbr, -1) / jnp.maximum(v1 * v2, 1e-30)
        ratio = v1 / jnp.maximum(v2, 1e-30)
        ok = (d2 < ellscale) & (vdot > self.costheta)
        ok = ok & (ratio < self.vratio) & (ratio > 1.0 / self.vratio)
        return ok & (own["ell"] >= self.ellthr) & (nbr["ell"] >= self.ellthr)


@dataclasses.dataclass(frozen=True)
class Pred6DOutlier:
    """FOF6dbgup (fofalgo.cxx:166-174): 6D metric, both particles above the
    outlier threshold (FOFcheckbg precheck inverse); used by FOF6DSUBSET."""

    symmetric = True

    b2: float
    v2: float
    ellthr: float

    def __call__(self, d2, own, nbr):
        dv2 = jnp.sum((own["vel"] - nbr["vel"]) ** 2, axis=-1)
        ok = d2 / self.b2 + dv2 / self.v2 < 1.0
        return ok & (own["ell"] >= self.ellthr) & (nbr["ell"] >= self.ellthr)


@dataclasses.dataclass(frozen=True)
class StreamPredScaleEllB:
    """StreamPredScaleEll for the vmapped class batches: the per-structure
    reference mass rides the per-lane broadcast field ``scal`` instead of
    a static attribute (same math as fofalgo.cxx:120-137)."""

    symmetric = True

    b2: float
    vratio: float
    costheta: float
    ellthr: float

    def __call__(self, d2, own, nbr):
        mmin = jnp.minimum(own["mass"], nbr["mass"])
        mref = jnp.maximum(own["scal"], 1e-30)
        ellscale = self.b2 * jnp.power(
            jnp.maximum(mmin / mref, 1e-30), 2.0 / 3.0)
        v_own, v_nbr = own["vel"], nbr["vel"]
        v1 = jnp.sqrt(jnp.sum(v_own * v_own, -1))
        v2 = jnp.sqrt(jnp.sum(v_nbr * v_nbr, -1))
        vdot = jnp.sum(v_own * v_nbr, -1) / jnp.maximum(v1 * v2, 1e-30)
        ratio = v1 / jnp.maximum(v2, 1e-30)
        ok = (d2 < ellscale) & (vdot > self.costheta)
        ok = ok & (ratio < self.vratio) & (ratio > 1.0 / self.vratio)
        return ok & (own["ell"] >= self.ellthr) & (nbr["ell"] >= self.ellthr)


@dataclasses.dataclass(frozen=True)
class Pred6DOutlierB:
    """Pred6DOutlier for the vmapped class batches: the per-structure
    velocity-scale ellv^2 rides the per-lane broadcast field ``scal``
    (fofalgo.cxx:166-174 with param[2] from the parent's dispersion)."""

    symmetric = True

    b2: float
    ellthr: float

    def __call__(self, d2, own, nbr):
        dv2 = jnp.sum((own["vel"] - nbr["vel"]) ** 2, axis=-1)
        ok = d2 / self.b2 + dv2 / jnp.maximum(own["scal"], 1e-30) < 1.0
        return ok & (own["ell"] >= self.ellthr) & (nbr["ell"] >= self.ellthr)


@dataclasses.dataclass(frozen=True)
class Pred6DBackground:
    """FOF6dbg (fofalgo.cxx:156-164): 6D metric restricted to particles
    BELOW the outlier threshold (background linking, FOFchecksub
    precheck)."""

    symmetric = True

    b2: float
    v2: float
    ellthr: float

    def __call__(self, d2, own, nbr):
        dv2 = jnp.sum((own["vel"] - nbr["vel"]) ** 2, axis=-1)
        ok = d2 / self.b2 + dv2 / self.v2 < 1.0
        return ok & (own["ell"] < self.ellthr) & (nbr["ell"] < self.ellthr)


def subset_predicate(opt: C.Options, ellx2: float, vratio: float,
                     costheta: float, ellthr: float,
                     mref: float = 1.0, sigmav2: float = 1.0):
    """FoF_search_type -> pair criterion (reference foftype dispatch,
    search.cxx:910-1010 + fofalgo.h).  The NN variants map to the same
    criteria — the flat candidate stencil is the TPU analog of the NN
    candidate set.  ``sigmav2``: per-axis velocity variance of the subset,
    used to scale the 6D metric for FOF6DSUBSET (the reference fills
    param[2] from the parent halo's dispersion, search.cxx:938-963)."""
    ft = opt.foftype
    if ft in (C.FOFSTPROB, C.FOFSTPROBNN, C.FOFSTNOSUBSET):
        return StreamPred(ellx2, vratio, costheta, ellthr)
    if ft in (C.FOFSTPROBLX, C.FOFSTPROBNNLX):
        return StreamPredLX(ellx2, vratio, costheta, ellthr)
    if ft == C.FOFSTPROBNNNODIST:
        return StreamPredNoDist(vratio, costheta, ellthr)
    if ft in (C.FOFSTPROBSCALEELL, C.FOFSTPROBSCALEELLNN):
        return StreamPredScaleEll(ellx2, vratio, costheta, ellthr, mref)
    if ft == C.FOF6DSUBSET:
        ellv2 = sigmav2 * opt.ellvel ** 2
        return Pred6DOutlier(ellx2, ellv2, ellthr)
    return StreamPred(ellx2, vratio, costheta, ellthr)


def significance_filter(ell, pfof, num_groups: int, ellthreshold: float,
                        siglevel: float, min_size: int):
    """Reference CheckSignificance (search.cxx:2947), vectorised.

    Keep the largest top-k (by ell) prefix of each group whose
    beta = (mean_ell/E[ell|ell>thr] - 1) * sqrt(k) >= siglevel; below
    min_size the group dissolves.  Equivalent to the reference's
    remove-lowest-ell-one-at-a-time loop.
    """
    n = ell.shape[0]
    ng1 = num_groups + 1
    thr = ellthreshold
    ellaveexp = math.sqrt(2.0 / math.pi) * math.exp(-0.5 * thr * thr) / \
        max(1.0 - erf(thr / math.sqrt(2.0)), 1e-300)

    order = jnp.lexsort((-ell, pfof)).astype(jnp.int32)
    g_s = pfof[order]
    # zero out untagged/padded entries: segment_cumsum is a global-cumsum
    # difference, so +-inf outside the groups would poison later segments
    e_s = jnp.where((g_s > 0) & jnp.isfinite(ell[order]), ell[order], 0.0)
    offsets = seg.group_offsets(g_s, num_groups)
    rank = seg.segment_rank(g_s, offsets)
    cume = seg.segment_cumsum(e_s, g_s, offsets)
    k = (rank + 1).astype(ell.dtype)
    beta = (cume / k / ellaveexp - 1.0) * jnp.sqrt(k)
    okk = (beta >= siglevel) & (g_s > 0)
    kstar = seg.segment_max(jnp.where(okk, rank + 1, 0), g_s, ng1)
    kstar = jnp.where(kstar >= min_size, kstar, 0)
    keep_sorted = (rank < kstar[g_s]) & (g_s > 0)
    keep = jnp.zeros(n, bool).at[order].set(keep_sorted)
    return jnp.where(keep, pfof, 0)


def search_subset(opt: C.Options, pos, vel, mass, ell,
                  active: Optional[jnp.ndarray] = None,
                  bounds=None) -> Tuple[jnp.ndarray, int]:
    """Find substructure candidates in one (re-centred) particle set.

    ``ell``: outlier values (set -inf on padded/inactive slots).
    ``bounds``: optional host (lo, hi) position bounds — the recursion
    knows them from the padding construction, saving one device fetch
    per structure through the tunnel.
    Returns (pfof, ngroups) in the set's order; ids 1..ng by size.
    Mirrors SearchSubset with foftype FOFSTPROB (+ iterative expansion).
    """
    n = pos.shape[0]
    ellx2 = (opt.ellxscale * opt.ellphys) ** 2
    costh = math.cos(opt.thetaopen * math.pi)
    minsize = opt.MinSize

    needs_mass = opt.foftype in (C.FOFSTPROBSCALEELL, C.FOFSTPROBSCALEELLNN)
    needs_pos = opt.foftype in (C.FOFSTPROBLX, C.FOFSTPROBNNLX)
    mref = 1.0
    if needs_mass:
        mv = float(np.mean(np.asarray(jax.device_get(mass))))
        mref = mv if np.isfinite(mv) and mv > 0 else 1.0
    sigmav2 = 1.0
    if opt.foftype == C.FOF6DSUBSET:
        v_np = np.asarray(jax.device_get(vel))
        w = None if active is None else np.asarray(jax.device_get(active))
        vv = v_np if w is None else v_np[w]
        sv = float(np.mean(np.var(vv, axis=0))) if len(vv) else float("nan")
        sigmav2 = sv if np.isfinite(sv) and sv > 0 else 1.0
    if opt.iiterflag:
        pred0 = subset_predicate(
            opt, ellx2, opt.Vratio * opt.vfac,
            math.cos(opt.thetaopen * math.pi * opt.thetafac),
            opt.ellthreshold * opt.ellfac, mref=mref, sigmav2=sigmav2)
        minsize0 = max(2, int(opt.MinSize * opt.nminfac))
    else:
        pred0 = subset_predicate(opt, ellx2, opt.Vratio, costh,
                                 opt.ellthreshold, mref=mref,
                                 sigmav2=sigmav2)
        minsize0 = opt.MinSize

    b = math.sqrt(ellx2)
    # only the criteria that read them pay for the extra per-slot gathers
    extra = {"ell": ell}
    if needs_mass:
        extra["mass"] = jnp.asarray(mass)
    if needs_pos:
        extra["pos"] = jnp.asarray(pos)

    # shared edge table: the initial search, both attach expansions and
    # the link-merge all test pairs within b * max(1, ellxfac) and every
    # shipped criterion embeds its own spatial cut, so ONE spatial build
    # at the widest reach serves all four passes via refine_edge_mask
    # (the reference rebuilds its KD tree per pass, search.cxx:1088-1400).
    # FOFSTPROBNNNODIST has no spatial cut (stencil-reach semantics) and
    # keeps the per-pass builds.
    share = opt.iiterflag and opt.foftype != C.FOFSTPROBNNNODIST
    if share:
        b_build = b * max(1.0, opt.ellxfac)
        fields = dict(extra)
        fields["vel"] = jnp.asarray(vel)
        edges, _, grid = fof.build_edges(
            jnp.asarray(pos), b_build, boxsize=None, fields=fields,
            predicate=fof.Pred3D(b_build * b_build), bounds=bounds)
        n_set = edges.n

        def masked_labels(pred, minsize_loc):
            mask = fof.refine_edge_mask(edges.pos_s, edges.fields_s,
                                        edges.erow, edges.ecol, grid, pred)
            labels = fof.fof_labels_from_edges(
                jnp.where(mask, edges.erow, 0),
                jnp.where(mask, edges.ecol, 0), n_set,
                undirected=edges.undirected)
            pfof_sorted, ngd = fof.renumber_by_size(
                labels, minsize_loc, orig_index=edges.order)
            return (jnp.zeros(n_set, jnp.int32).at[edges.order].set(
                pfof_sorted), ngd)

        def attach_masked(pred, pfof_cur, nrounds=16):
            # directed attach semantics on the undirected table: evaluate
            # the (asymmetric) criterion on both orientations
            mf = fof.refine_edge_mask(edges.pos_s, edges.fields_s,
                                      edges.erow, edges.ecol, grid, pred)
            er = jnp.where(mf, edges.erow, 0)
            ec = jnp.where(mf, edges.ecol, 0)
            if edges.undirected:
                mb = fof.refine_edge_mask(edges.pos_s, edges.fields_s,
                                          edges.ecol, edges.erow, grid,
                                          pred)
                er = jnp.concatenate([er, jnp.where(mb, edges.ecol, 0)])
                ec = jnp.concatenate([ec, jnp.where(mb, edges.erow, 0)])
            labels0 = jnp.asarray(pfof_cur)[edges.order]
            labels = fof.attach_rounds(labels0, er, ec, nrounds)
            return jnp.zeros(n_set, jnp.int32).at[edges.order].set(labels)

        pfof, ng_d = masked_labels(pred0, minsize0)
        ng = int(jax.device_get(ng_d))
    else:
        pfof, ng = fof.fof3d(pos, b, boxsize=None, min_size=minsize0,
                             vel=vel, extra_fields=extra, predicate=pred0,
                             bounds=bounds)
        ng = int(jax.device_get(ng))
    if ng == 0:
        return pfof, 0

    if opt.iiterflag:
        # expansion: attach untagged particles under the base thresholds
        pred_att = StreamPredAttach(ellx2, opt.Vratio * opt.vfac,
                                    math.cos(opt.thetaopen * math.pi *
                                             opt.thetafac),
                                    opt.ellthreshold)
        if share:
            pfof = attach_masked(pred_att, pfof)
        else:
            pfof = attach_expand(pos, vel, ell, pfof, b, pred_att)
        # intergroup-link merging (reference MergeGroups / fmerge,
        # search.cxx:1200-1224): sizes before further expansion
        # device-side histogram: fetching (ng+1) counts beats shipping the
        # full pfof through the tunnel (13 MB/s D2H) per structure
        sizes_old = np.asarray(jax.device_get(seg.group_sizes(pfof, ng)))
        pfof, ng = merge_linked_groups(
            pos, vel, ell, pfof, ng, opt, sizes_old=sizes_old,
            edges=(edges, grid) if share else None)
        # relaxed second expansion with larger linking length (ellxfac)
        ellx2b = ellx2 * opt.ellxfac ** 2
        pred_att2 = StreamPredAttach(
            ellx2b, opt.Vratio * opt.vfac,
            math.cos(opt.thetaopen * math.pi * opt.thetafac),
            opt.ellthreshold * opt.ellfac)
        if share:
            pfof = attach_masked(pred_att2, pfof)
        else:
            pfof = attach_expand(pos, vel, ell, pfof, math.sqrt(ellx2b),
                                 pred_att2)

    # significance + final min size, renumber by size
    ngpad = 1
    while ngpad < ng + 1:
        ngpad *= 2
    pfof = significance_filter(ell, pfof, ngpad, opt.ellthreshold,
                               opt.siglevel, minsize)
    sizes = seg.group_sizes(pfof, ngpad)
    # renumber by size
    labels = pfof  # group ids already; reuse renumber via sizes
    eligible = (sizes >= minsize) & (jnp.arange(ngpad + 1) > 0)
    order = jnp.lexsort((jnp.arange(ngpad + 1),
                         -jnp.where(eligible, sizes, 0)))
    ngnew = jnp.sum(eligible).astype(jnp.int32)
    gid_map = jnp.zeros(ngpad + 1, jnp.int32)
    ranks = jnp.arange(ngpad + 1, dtype=jnp.int32)
    gid_map = gid_map.at[order].set(
        jnp.where(ranks < ngnew, ranks + 1, 0))
    pfof = gid_map[jnp.clip(pfof, 0, ngpad)]
    return pfof, int(jax.device_get(ngnew))


def merge_linked_groups(pos, vel, ell, pfof, ng: int, opt: C.Options,
                        sizes_old: Optional[np.ndarray] = None,
                        edges=None) -> Tuple[jnp.ndarray, int]:
    """Merge groups connected by enough relaxed-criterion links.

    Reference iterative-search merge stage (search.cxx:1200-1224 +
    MergeGroups:3894): group j joins group i when the number of cross links
    between them exceeds ``fmerge x (size of j before expansion)``.  Links
    use the FOFStreamwithprob criterion with the expanded thresholds
    (Vratio*vfac, thetaopen*thetafac, ellthreshold*ellfac).

    Returns (pfof, ng) with merged groups relabelled to the absorbing
    group's id (ids NOT renumbered — caller renumbers by size afterwards).
    """
    pfof = jnp.asarray(pfof)
    if ng <= 1:
        return pfof, ng
    if sizes_old is None:
        sizes_old = np.asarray(jax.device_get(
            seg.group_sizes(pfof, ng)))
    ellx2 = (opt.ellxscale * opt.ellphys) ** 2
    pred = StreamPred(ellx2, opt.Vratio * opt.vfac,
                      math.cos(opt.thetaopen * math.pi * opt.thetafac),
                      opt.ellthreshold * opt.ellfac)
    # the fmerge test counts links from group i into group j separately
    # from j into i (reference MergeGroups i-loop), but the stream
    # criterion is symmetric, so count(i->j) == count(j->i) == the number
    # of passing cross pairs: an undirected half-stencil edge list counted
    # in both orientations reproduces the directed table at half the cost
    # (and with no coarsened-grid fallback at any scale).
    # ``edges``: optional prebuilt (FlatEdges, grid) spanning at least the
    # linking length (search_subset's shared table) — the criterion is
    # re-evaluated along it instead of rebuilding candidates.
    if edges is not None:
        etab, grid = edges
        emask = fof.refine_edge_mask(etab.pos_s, etab.fields_s, etab.erow,
                                     etab.ecol, grid, pred)
        erow = jnp.where(emask, etab.erow, 0)
        ecol = jnp.where(emask, etab.ecol, 0)
        undirected = etab.undirected
        order = etab.order
    else:
        etab, _, _ = fof.build_edges(
            pos, math.sqrt(ellx2),
            fields={"vel": jnp.asarray(vel), "ell": jnp.asarray(ell)},
            predicate=pred)
        erow, ecol = etab.erow, etab.ecol
        undirected = etab.undirected
        order = etab.order
    gs = pfof[order]
    gi = gs[erow]
    gj = gs[ecol]
    if undirected:
        gi, gj = jnp.concatenate([gi, gj]), jnp.concatenate([gj, gi])
    mask = (gi > 0) & (gj > 0) & (gi != gj)
    # sparse distinct-pair link counts (device sort + run-length count):
    # a dense (ng+1)^2 matrix at thousands of candidates would not fit
    pi, pj, counts = seg.pair_counts_sparse(gi, gj, mask)
    # sequential host merge mirroring MergeGroups' (i, j) loop ordering;
    # pairs arrive lexicographically sorted, so walking the sparse list
    # reproduces the dense double loop exactly (absorbed flags only ever
    # suppress later pairs)
    absorbed = np.zeros(ng + 1, bool)
    target = np.arange(ng + 1)
    merged_any = False
    thresh = opt.fmerge * sizes_old
    for i, j, c in zip(pi, pj, counts):
        if absorbed[i] or absorbed[j] or c <= thresh[j]:
            continue
        absorbed[j] = True
        target[target == j] = i
        merged_any = True
    if not merged_any:
        return pfof, ng
    # relabel on device: the target map is (ng+1,) tiny, the pfof array is
    # the big one and never crosses the tunnel
    return jnp.asarray(target.astype(np.int32))[pfof], ng


def _group_phase_stats(pos, vel, mass, pfof_np, ng: int):
    """Per-group mass-weighted phase centres and scalar dispersions
    (reference MergeSubstructures* preamble, search.cxx:2171-2235)."""
    m = np.asarray(mass, np.float64)
    w = np.where(pfof_np > 0, m, 0.0)
    msum = np.zeros(ng + 1)
    np.add.at(msum, pfof_np, w)
    msum = np.maximum(msum, 1e-30)
    mu_x = np.zeros((ng + 1, 3))
    mu_v = np.zeros((ng + 1, 3))
    np.add.at(mu_x, pfof_np, np.asarray(pos, np.float64) * w[:, None])
    np.add.at(mu_v, pfof_np, np.asarray(vel, np.float64) * w[:, None])
    mu_x /= msum[:, None]
    mu_v /= msum[:, None]
    sigX = np.zeros(ng + 1)
    sigV = np.zeros(ng + 1)
    np.add.at(sigX, pfof_np,
              np.sum((pos - mu_x[pfof_np]) ** 2, axis=1) * w)
    np.add.at(sigV, pfof_np,
              np.sum((vel - mu_v[pfof_np]) ** 2, axis=1) * w)
    sigX = np.maximum(sigX / msum, 1e-30)
    sigV = np.maximum(sigV / msum, 1e-30)
    return mu_x, mu_v, sigX, sigV


def merge_substructures_cores_phase(pos, vel, mass, pfof, numsubs: int,
                                    numcores: int, fdist: float
                                    ) -> Tuple[np.ndarray, int]:
    """Merge 6DFOF cores into phase-overlapping substructures.

    Reference MergeSubstructuresCoresPhase (search.cxx:2146-2289): group ids
    1..numsubs are substructures, numsubs+1..numsubs+numcores are cores; a
    core merges into the phase-nearest substructure when the normalized
    phase distance (dx^2/sigX_core + dv^2/sigV_core) < fdist^2.  Returns
    (pfof, new_numcores) with surviving cores renumbered to stay contiguous
    after the substructures.
    """
    pfof_np = np.asarray(pfof).copy()
    ng = numsubs + numcores
    if numsubs == 0 or numcores == 0 or fdist <= 0:
        return pfof_np, numcores
    mu_x, mu_v, sigX, sigV = _group_phase_stats(pos, vel, mass, pfof_np, ng)
    f2 = fdist * fdist
    newid = np.arange(ng + 1)
    kept = []
    for c in range(numsubs + 1, ng + 1):
        dx2 = np.sum((mu_x[1:numsubs + 1] - mu_x[c]) ** 2, axis=1)
        dv2 = np.sum((mu_v[1:numsubs + 1] - mu_v[c]) ** 2, axis=1)
        d2 = dx2 / sigX[c] + dv2 / sigV[c]
        j = int(np.argmin(d2))
        if d2[j] < f2 and dx2[j] < sigX[c] * f2:
            newid[c] = j + 1
        else:
            kept.append(c)
    for rank, c in enumerate(kept):
        newid[c] = numsubs + 1 + rank
    return newid[pfof_np].astype(np.int32), len(kept)


def merge_substructures_phase(pos, vel, mass, pfof, numsubs: int,
                              numcores: int, fdist: float
                              ) -> Tuple[np.ndarray, int, int]:
    """Merge phase-overlapping substructures with each other.

    Reference MergeSubstructuresPhase (search.cxx:2289-2480): substructure j
    merges into i when their mutual normalized phase distances (each
    normalized by its own dispersions) are both < fdist^2.  Cores (ids >
    numsubs) are never absorbed into by substructures but may absorb.
    Returns (pfof, numsubs, numcores) with ids compacted.
    """
    pfof_np = np.asarray(pfof).copy()
    ng = numsubs + numcores
    if ng <= 1 or fdist <= 0:
        return pfof_np, numsubs, numcores
    mu_x, mu_v, sigX, sigV = _group_phase_stats(pos, vel, mass, pfof_np, ng)
    f2 = fdist * fdist
    absorbed = np.zeros(ng + 1, bool)
    target = np.arange(ng + 1)
    isig_x, isig_v = 1.0 / sigX, 1.0 / sigV
    for i in range(1, numsubs + 1):      # subs iterate; cores don't absorb
        if absorbed[i]:
            continue
        # vectorised inner loop (the reference's j-scan, search.cxx:2289+):
        # O(ng) numpy per surviving sub instead of O(ng) Python
        dx2 = np.einsum("jd,jd->j", mu_x - mu_x[i], mu_x - mu_x[i])
        dv2 = np.einsum("jd,jd->j", mu_v - mu_v[i], mu_v - mu_v[i])
        d1 = dx2 * isig_x[i] + dv2 * isig_v[i]
        d2 = dx2 * isig_x + dv2 * isig_v
        ok = (d1 < f2) & (d2 < f2) & ~absorbed
        ok[0] = ok[i] = False
        if not ok.any():
            continue
        d = np.where(ok, 0.5 * (d1 + d2), np.inf)
        best = int(np.argmin(d))
        absorbed[best] = True
        target[target == best] = i
    if not absorbed.any():
        return pfof_np, numsubs, numcores
    # compact ids: surviving subs first, then surviving cores
    surv = [g for g in range(1, ng + 1) if not absorbed[g]]
    remap = np.zeros(ng + 1, np.int64)
    nsub_new = 0
    for rank, g in enumerate(surv):
        remap[g] = rank + 1
        if g <= numsubs:
            nsub_new += 1
    pfof_np = remap[target[pfof_np]].astype(np.int32)
    return pfof_np, nsub_new, len(surv) - nsub_new


def attach_expand(pos, vel, ell, pfof, linking_length, pred,
                  max_rounds: int = 16):
    """Expansion pass: untagged particles adopt the min group id among
    linked tagged neighbours; iterate to exhaustion.

    The geometric criterion is static, so the edge list is built once and
    only the tagged/untagged gating iterates (fof.attach_rounds)."""
    pos = jnp.asarray(pos)
    n = pos.shape[0]
    edges, _, _ = fof.build_edges(
        pos, linking_length,
        fields={"vel": jnp.asarray(vel), "ell": jnp.asarray(ell)},
        predicate=pred)
    labels0 = jnp.asarray(pfof)[edges.order]
    labels = fof.attach_rounds(labels0, edges.erow, edges.ecol, max_rounds)
    return jnp.zeros(n, jnp.int32).at[edges.order].set(labels)


def _next_pow2(x: int, lo: int = 1024) -> int:
    k = lo
    while k < x:
        k *= 2
    return k


def _pad_structure(pos, vel, mass, npad, spacing):
    """Pad a structure's arrays to npad particles.

    Padded slots are placed on a compact cubic lattice of pitch ``spacing``
    just outside the structure's bounding box: mutually farther apart than
    any linking length (so they are isolated singletons) without inflating
    the domain extent (which would degrade the FOF cell grid).  Zero
    velocity and mass.
    """
    nsub = pos.shape[0]
    extra = npad - nsub
    if extra == 0:
        return pos, vel, mass, np.ones(nsub, bool)
    side = int(np.ceil(extra ** (1 / 3)))
    ii = np.arange(extra)
    lattice = np.stack([ii % side, (ii // side) % side,
                        ii // (side * side)], axis=1).astype(pos.dtype)
    corner = pos.min(0) - 10.0 * spacing
    ppos = np.concatenate([pos, (corner - lattice * spacing).astype(pos.dtype)])
    pvel = np.concatenate([vel, np.zeros((extra, 3), vel.dtype)])
    pmass = np.concatenate([mass, np.zeros(extra, mass.dtype)])
    valid = np.concatenate([np.ones(nsub, bool), np.zeros(extra, bool)])
    return ppos, pvel, pmass, valid


def structure_outliers(opt: C.Options, pos, vel, mass, valid,
                       dens: Optional[jnp.ndarray] = None):
    """Background grid + local velocity density + outlier values for one
    (padded) structure; the per-structure preamble of SearchSubSub
    (search.cxx:2631-2649).  ``dens`` short-circuits the velocity-density
    estimate (cache replay, reference ReadLocalVelocityDensity)."""
    nsub = int(valid.sum()) if hasattr(valid, "sum") else pos.shape[0]
    if dens is None:
        exact = opt.iLocalVelDenApproxCalcFlag == 0
        dens = localfield.velocity_density(
            jnp.asarray(pos), jnp.asarray(vel), nvel=opt.Nvel,
            nsearch=opt.Nsearch, active=jnp.asarray(valid),
            exact=exact, chunk=256 if exact else 2048)
    else:
        dens = jnp.asarray(dens)
    cellsize = int(max(C.MINCELLSIZE, opt.Ncellfac * nsub))
    cellsize = min(cellsize, max(32, nsub // 2))
    cellpos, gvel, gdispinv, cok = bgfield.background_grid(
        jnp.asarray(pos), jnp.asarray(vel), jnp.asarray(mass), cellsize,
        gridtype=opt.gridtype)
    R = bgfield.denv_ratio(jnp.asarray(pos), jnp.asarray(vel), dens,
                           cellpos, gvel, gdispinv, opt.Nsearch)
    ell, stats = bgfield.outlier_values(R, jnp.asarray(mass),
                                        active=jnp.asarray(valid))
    ell = jnp.where(jnp.asarray(valid), ell, -jnp.inf)
    return ell, dens, stats


def _grid_levels(npad: int, cellsize: int) -> int:
    """Static grid depth implied by (npad, cellsize) — the only way
    cellsize enters background_grid's computation."""
    levels = 0
    while (npad >> (levels + 1)) >= max(cellsize, 1):
        levels += 1
    return levels


@partial(jax.jit, static_argnames=("opt_key",))
def _outliers_rest_batch(ppos_b, pvel_b, pmass_b, valid_b, dens_b,
                         opt_key):
    """vmapped grid + 7-NN interpolation + outlier normalisation over a
    batch of same-class structures (padded to one npad, one grid depth).

    ``opt_key``: (cellsize_repr, gridtype, nsearch) — static config.
    """
    cellsize_repr, gridtype, nsearch = opt_key

    def one(pos, vel, mass, valid, dens):
        cellpos, gvel, gdispinv, _ = bgfield.background_grid(
            pos, vel, mass, cellsize_repr, gridtype=gridtype)
        R = bgfield.denv_ratio(pos, vel, dens, cellpos, gvel, gdispinv,
                               nsearch)
        ell, _ = bgfield.outlier_values(R, mass, active=valid)
        return jnp.where(valid, ell, -jnp.inf)

    return jax.vmap(one)(ppos_b, pvel_b, pmass_b, valid_b, dens_b)


def structure_outliers_batch(opt: C.Options, ppos_b, pvel_b, pmass_b,
                             valid_b, cellsize_repr: int, dens_b=None):
    """Batched ``structure_outliers`` over same-(npad, grid-depth)
    structures: ONE dispatch per batch instead of one per structure
    (the vmap analog of the reference's OpenMP loop over structures,
    search.cxx:2480-2946).  Returns (ell_b, dens_b)."""
    if dens_b is None:
        exact = opt.iLocalVelDenApproxCalcFlag == 0

        def dens_one(pos, vel, valid):
            return localfield.velocity_density(
                pos, vel, nvel=opt.Nvel, nsearch=opt.Nsearch,
                active=valid, exact=exact, chunk=256 if exact else 2048)

        dens_b = jax.vmap(dens_one)(ppos_b, pvel_b, valid_b)
    ell_b = _outliers_rest_batch(
        ppos_b, pvel_b, pmass_b, valid_b, dens_b,
        (int(cellsize_repr), int(opt.gridtype), int(opt.Nsearch)))
    return ell_b, dens_b


# ---------------------------------------------------------------------------
# Batched subset search: vmap over same-size structure classes
# ---------------------------------------------------------------------------

_BATCH_SLOT_BUDGET = 1 << 23   # B * t_pad candidate slots per dispatch
_BATCH_PAIR_CAP = 2048         # distinct cross-group link pairs / structure


def _batchable_subset(opt: C.Options) -> bool:
    """The vmapped class search covers every iterative foftype whose
    criterion is a pair predicate over (pos, vel, ell) plus at most one
    per-structure normalisation (mref for ScaleEll, sigmav2 for
    FOF6DSUBSET — threaded as per-lane broadcast fields); only the
    stencil-reach FOFSTPROBNNNODIST (no spatial cut, so the candidate
    window IS the semantics) keeps the sequential path."""
    if os.environ.get("VR_SUBSET_BATCH") == "0":
        return False
    return bool(opt.iiterflag) and opt.foftype in (
        C.FOFSTPROB, C.FOFSTPROBNN, C.FOFSTNOSUBSET,
        C.FOFSTPROBLX, C.FOFSTPROBNNLX,
        C.FOFSTPROBSCALEELL, C.FOFSTPROBSCALEELLNN, C.FOF6DSUBSET)


@partial(jax.jit, static_argnames=("grid",))
def _subset_batch_totals(pos_b, grid):
    def one(pos):
        binning = bin_particles(pos, grid, lean=True)
        return fof.candidate_counts_half(binning, grid)[2]

    return jax.vmap(one)(pos_b)


@partial(jax.jit, static_argnames=("grid", "t_pad", "reach2"))
def _subset_batch_prefilter(pos_b, grid, t_pad, reach2):
    """Geometry phase A: bin, expand candidate windows, evaluate ONLY the
    spatial reach (position gathers) and compact the in-reach pairs to
    the front.  The 27-cell candidate stencil is ~6x the linking sphere,
    so ~80% of slots die here BEFORE the velocity/ell field gathers —
    XLA:TPU gathers are the near-serial cost (~40M elem/s) that
    dominated the recursion variant, and a fused multi-row take is not
    an option (its gather result is lane-padded minor-dim-k, an 18x HBM
    blowup that OOM'd).  Returns per lane (order, erow, ecol, d2, nkeep)
    padded to t_pad; the caller slices to the fetched max count."""

    def one(pos):
        binning = bin_particles(pos, grid, lean=True)
        order = binning.order
        pos_s = pos[order]
        pst, pcn, _ = fof.candidate_counts_half(binning, grid)
        row, col, valid = fof.flat_candidates(pst, pcn, t_pad)
        d2 = fof._pair_d2_bcast(fof._gather2(pos_s, row),
                                fof._gather2(pos_s, col), grid)
        keep = valid & (d2 <= reach2)
        dest = jnp.cumsum(keep.astype(jnp.int32)) - 1
        dest = jnp.where(keep, dest, t_pad)
        erow = jnp.zeros(t_pad, jnp.int32).at[dest].set(row, mode="drop")
        ecol = jnp.zeros(t_pad, jnp.int32).at[dest].set(col, mode="drop")
        d2c = jnp.full(t_pad, jnp.inf, d2.dtype).at[dest].set(
            d2, mode="drop")
        return order, erow, ecol, d2c, jnp.sum(keep.astype(jnp.int32))

    return jax.vmap(one)(pos_b)


@partial(jax.jit, static_argnames=("pred0", "pred_att", "pred_att2",
                                   "pred_merge"))
def _subset_batch_criteria(order_b, row_b, col_b, d2_b, nk_b, pos_b,
                           vel_b, ell_b, mass_b, scal_b, pred0, pred_att,
                           pred_att2, pred_merge):
    """Geometry phase B on the in-reach pairs only: gather the per-pair
    fields, evaluate all four criteria (both orientations of the
    asymmetric ones) and compact every edge list to the front."""
    need_pos = isinstance(pred0, StreamPredLX)
    need_mass = isinstance(pred0, StreamPredScaleEllB)
    need_scal = isinstance(pred0, (StreamPredScaleEllB, Pred6DOutlierB))

    def one(order, row, col, d2, nk, pos, vel, ell, mass, scal):
        tk = row.shape[0]
        valid = jnp.arange(tk) < nk
        fields_s = {"ell": ell[order], "vel": vel[order]}
        if need_pos:
            # LX re-derives per-axis scalings from raw pair separations
            fields_s["pos"] = pos[order]
        if need_mass:
            fields_s["mass"] = mass[order]
        if need_scal:
            fields_s["scal"] = jnp.full(order.shape[0], scal,
                                        dtype=d2.dtype)
        own = fof._gather_fields(fields_s, row)
        nbr = fof._gather_fields(fields_s, col)
        m0 = pred0(d2, own, nbr) & valid
        maf = pred_att(d2, own, nbr) & valid
        mab = pred_att(d2, nbr, own) & valid
        m2f = pred_att2(d2, own, nbr) & valid
        m2b = pred_att2(d2, nbr, own) & valid
        mm = pred_merge(d2, own, nbr) & valid
        er0, ec0, n0 = fof.compact_edges(row, col, m0, tk)
        era, eca, na = fof.compact_edges(
            jnp.concatenate([row, col]), jnp.concatenate([col, row]),
            jnp.concatenate([maf, mab]), 2 * tk)
        era2, eca2, na2 = fof.compact_edges(
            jnp.concatenate([row, col]), jnp.concatenate([col, row]),
            jnp.concatenate([m2f, m2b]), 2 * tk)
        erm, ecm, nm = fof.compact_edges(row, col, mm, tk)
        return (er0, ec0, n0, era, eca, na, era2, eca2, na2,
                erm, ecm, nm)

    return jax.vmap(one)(order_b, row_b, col_b, d2_b, nk_b, pos_b,
                         vel_b, ell_b, mass_b, scal_b)


@partial(jax.jit, static_argnames=("pair_cap",))
def _subset_batch_graph(order_b, er0_b, ec0_b, era_b, eca_b, erm_b, ecm_b,
                        minsize0, pair_cap):
    """Graph dispatch: label fixed point over the compacted base edges,
    by-size renumbering, attach expansion 1 and sparse cross-group link
    counting (one vmapped dispatch, no geometry).

    Returns per structure: pfof after attach 1 (set order), group count,
    the lexicographic distinct (i, j) link pairs with counts and the
    absorbee sizes (for the host-side fmerge loop), and the distinct-pair
    total (> pair_cap signals overflow -> sequential fallback)."""

    def one(order, er0, ec0, era, eca, erm, ecm):
        npad = order.shape[0]
        labels, _ = fof._fof_sweeps_sym(
            jnp.arange(npad, dtype=jnp.int32), er0, ec0, npad, 64)
        labels = fof._compress(labels)
        pfof_sorted, ng0 = fof.renumber_by_size(labels, minsize0,
                                                orig_index=order)
        gs = fof.attach_rounds(pfof_sorted, era, eca, 16)
        pfof1 = jnp.zeros(npad, jnp.int32).at[order].set(gs)
        # cross-group link counts under the relaxed criterion (both
        # orientations, mirroring merge_linked_groups)
        gi = jnp.concatenate([gs[erm], gs[ecm]])
        gj = jnp.concatenate([gs[ecm], gs[erm]])
        mmask = (gi > 0) & (gj > 0) & (gi != gj)
        a_s, b_s, first, n_uni, n_val = seg._pair_sort_boundaries(
            gi, gj, mmask)
        pi, pj, cnt = seg._pair_compact(a_s, b_s, first, n_val, pair_cap)
        sizes1 = jnp.zeros(npad + 1, jnp.int32).at[
            jnp.clip(pfof1, 0, npad)].add(1)
        szj = sizes1[jnp.clip(pj, 0, npad)]
        return pfof1, ng0, pi, pj, cnt, szj, n_uni

    return jax.vmap(one)(order_b, er0_b, ec0_b, era_b, eca_b, erm_b,
                         ecm_b)


@partial(jax.jit, static_argnames=("ellthreshold", "siglevel", "minsize"))
def _subset_batch_final(ell_b, order_b, era2_b, eca2_b, pfof1_b, target_b,
                        ellthreshold, siglevel, minsize):
    """Final dispatch: apply the host merge maps, run the relaxed second
    attach over the precompacted edges, the significance filter and the
    by-size renumbering.  Returns (pfof_final, ngroups) per structure."""

    def one(ell, order, era2, eca2, pfof1, target):
        npad = order.shape[0]
        pfof2 = target[jnp.clip(pfof1, 0, target.shape[0] - 1)]
        gs = fof.attach_rounds(pfof2[order], era2, eca2, 16)
        pfof3 = jnp.zeros(npad, jnp.int32).at[order].set(gs)
        pfof4 = significance_filter(ell, pfof3, npad, ellthreshold,
                                    siglevel, minsize)
        # by-size renumbering (identical to the search_subset tail; the
        # pad count only changes array lengths, never the mapping)
        sizes = seg.group_sizes(pfof4, npad)
        eligible = (sizes >= minsize) & (jnp.arange(npad + 1) > 0)
        order_g = jnp.lexsort((jnp.arange(npad + 1),
                               -jnp.where(eligible, sizes, 0)))
        ngnew = jnp.sum(eligible).astype(jnp.int32)
        ranks = jnp.arange(npad + 1, dtype=jnp.int32)
        gid_map = jnp.zeros(npad + 1, jnp.int32).at[order_g].set(
            jnp.where(ranks < ngnew, ranks + 1, 0))
        return gid_map[jnp.clip(pfof4, 0, npad)], ngnew

    return jax.vmap(one)(ell_b, order_b, era2_b, eca2_b, pfof1_b,
                         target_b)


def _subset_batch_run(opt: C.Options, entries: List[dict], pos_b, vel_b,
                      ell_b, grid, t_pad: int, mass_b=None) -> None:
    """Shared phase driver: geometry -> count fetch -> graph -> host
    fmerge loops -> final.  Fills ``e["sub_np"]``/``e["ng_sub"]`` (see
    _search_subset_batch).  The stacked arrays may be mesh-sharded on the
    batch axis (parallel/distributed_substructure.py) — every dispatch is
    lane-independent, so GSPMD partitions them unchanged."""
    B = len(entries)
    npad = int(entries[0]["npad"])
    pair_cap = int(min(_BATCH_PAIR_CAP, max(16, npad)))
    minsize0 = max(2, int(opt.MinSize * opt.nminfac))
    if mass_b is None:
        mass_b = jnp.stack([jnp.asarray(e["pmass"]) for e in entries])
    # per-structure normalisations as per-lane scalars (the sequential
    # path's mref / sigmav2 computation, search_subset:333-345, over the
    # same padded arrays — zero-mass padding included, quirk preserved)
    if opt.foftype == C.FOF6DSUBSET:
        sv = jnp.mean(jnp.var(vel_b, axis=1), axis=-1)
        scal_b = jnp.where(jnp.isfinite(sv) & (sv > 0), sv, 1.0) * \
            jnp.asarray(opt.ellvel ** 2, vel_b.dtype)
    elif opt.foftype in (C.FOFSTPROBSCALEELL, C.FOFSTPROBSCALEELLNN):
        mv = jnp.mean(mass_b, axis=1)
        scal_b = jnp.where(jnp.isfinite(mv) & (mv > 0), mv, 1.0)
    else:
        scal_b = jnp.ones(pos_b.shape[0], pos_b.dtype)
    b = opt.ellxscale * opt.ellphys
    reach2 = float((b * max(1.0, opt.ellxfac)) ** 2)
    order_b, row_b, col_b, d2_b, nk_b = _subset_batch_prefilter(
        pos_b, grid, t_pad, reach2)
    tk = fof._pad_pow2(int(max(int(np.max(np.asarray(
        fetch_small(nk_b)))), 1)), lo=256)
    tk = min(tk, t_pad)
    (er0_b, ec0_b, n0_b, era_b, eca_b, na_b, era2_b, eca2_b,
     na2_b, erm_b, ecm_b, nm_b) = _subset_batch_criteria(
        order_b, row_b[:, :tk], col_b[:, :tk], d2_b[:, :tk],
        jnp.minimum(nk_b, tk), pos_b, vel_b, ell_b, mass_b, scal_b,
        *_subset_preds(opt))
    n0_h, na_h, na2_h, nm_h = fetch_small((n0_b, na_b, na2_b, nm_b))
    e0 = fof._pad_pow2(int(max(int(n0_h.max()), 1)), lo=256)
    ea = fof._pad_pow2(int(max(int(na_h.max()), 1)), lo=256)
    ea2 = fof._pad_pow2(int(max(int(na2_h.max()), 1)), lo=256)
    em = fof._pad_pow2(int(max(int(nm_h.max()), 1)), lo=256)
    pfof1_b, ng_b, pi_b, pj_b, cnt_b, szj_b, nuni_b = _subset_batch_graph(
        order_b, er0_b[:, :e0], ec0_b[:, :e0], era_b[:, :ea],
        eca_b[:, :ea], erm_b[:, :em], ecm_b[:, :em],
        jnp.int32(minsize0), pair_cap)
    # per-group link-pair metadata (the MergeGroups inputs) — audited
    ng_h, pi_h, pj_h, cnt_h, szj_h, nuni_h = fetch_small(
        (ng_b, pi_b, pj_b, cnt_b, szj_b, nuni_b))
    ngmax = max(int(ng_h.max()), 1)
    targets = np.tile(np.arange(ngmax + 1, dtype=np.int32), (B, 1))
    handled = np.ones(B, bool)
    for k in range(B):
        ngk = int(ng_h[k])
        if ngk == 0:
            continue
        if int(nuni_h[k]) > pair_cap:
            # sparse pair table overflowed: this lane de-batches to the
            # sequential path (surfaced — a pathological box can quietly
            # lose the whole batching win otherwise)
            telemetry.count("subset_pair_cap_overflows")
            handled[k] = False
            continue
        # sequential host merge mirroring MergeGroups' lexicographic
        # (i, j) loop; float64 threshold exactly as merge_linked_groups
        absorbed = np.zeros(ngk + 1, bool)
        tgt = targets[k]
        for i, j, c, sj in zip(pi_h[k], pj_h[k], cnt_h[k], szj_h[k]):
            if i <= 0 or j <= 0 or c <= 0:
                continue
            if absorbed[i] or absorbed[j] or c <= opt.fmerge * float(sj):
                continue
            absorbed[j] = True
            tgt[tgt == j] = i
    pfof_b, ngnew_b = _subset_batch_final(
        ell_b, order_b, era2_b[:, :ea2], eca2_b[:, :ea2], pfof1_b,
        jnp.asarray(targets), float(opt.ellthreshold),
        float(opt.siglevel), int(opt.MinSize))
    # labels stay on device (rows of the batched result); only the
    # per-structure group counts come to host
    ngnew_h = np.asarray(fetch_small(ngnew_b))
    for k, e in enumerate(entries):
        if not handled[k]:
            continue
        e["sub_np"] = pfof_b[k]
        e["ng_sub"] = int(ngnew_h[k])


def _subset_preds(opt: C.Options):
    """(pred0, pred_att, pred_att2, pred_merge) for the iterative subset
    search — the same parameterisation search_subset uses.  foftypes with
    per-structure normalisations map to the field-parameterised predicate
    variants (the scalar rides the per-lane ``scal`` field)."""
    b = opt.ellxscale * opt.ellphys
    ellx2 = b * b
    costh_it = math.cos(opt.thetaopen * math.pi * opt.thetafac)
    if opt.foftype in (C.FOFSTPROBSCALEELL, C.FOFSTPROBSCALEELLNN):
        pred0 = StreamPredScaleEllB(ellx2, opt.Vratio * opt.vfac, costh_it,
                                    opt.ellthreshold * opt.ellfac)
    elif opt.foftype == C.FOF6DSUBSET:
        pred0 = Pred6DOutlierB(ellx2, opt.ellthreshold * opt.ellfac)
    else:
        pred0 = subset_predicate(opt, ellx2, opt.Vratio * opt.vfac,
                                 costh_it, opt.ellthreshold * opt.ellfac)
    pred_att = StreamPredAttach(ellx2, opt.Vratio * opt.vfac, costh_it,
                                opt.ellthreshold)
    pred_att2 = StreamPredAttach(ellx2 * opt.ellxfac ** 2,
                                 opt.Vratio * opt.vfac, costh_it,
                                 opt.ellthreshold * opt.ellfac)
    pred_merge = StreamPred(ellx2, opt.Vratio * opt.vfac, costh_it,
                            opt.ellthreshold * opt.ellfac)
    return pred0, pred_att, pred_att2, pred_merge


def _search_subset_batch(opt: C.Options, entries: List[dict],
                         _totals: Optional[np.ndarray] = None) -> None:
    """Batched ``search_subset`` over same-npad structures (the vmap
    analog of the reference's OpenMP loop over SearchSubset calls,
    search.cxx:2480-2946).

    Fills ``e["sub_np"]``/``e["ng_sub"]`` for every handled entry; entries
    whose sparse pair table overflows are left unfilled (sequential
    fallback).  Bit-exact with the sequential path: raw positions are
    shared (the union grid only changes the candidate superset), the
    predicates are evaluated exactly per pair, label propagation is a
    min fixed point and the renumbering is deterministic."""
    b = opt.ellxscale * opt.ellphys
    b_build = b * max(1.0, opt.ellxfac)
    lo = np.asarray(fetch_small(jnp.min(jnp.stack(
        [jnp.min(jnp.asarray(e["ppos"]), 0) for e in entries]), 0)))
    hi = np.asarray(fetch_small(jnp.max(jnp.stack(
        [jnp.max(jnp.asarray(e["ppos"]), 0) for e in entries]), 0)))
    grid = build_grid(lo.astype(np.float64), hi.astype(np.float64),
                      b_build, periodic=False, boxsize=0.0)
    if grid.total_cells > fof._DENSE_TABLE_MAX_CELLS:
        telemetry.count("subset_dense_table_bailouts")
        return
    pos_b = jnp.stack([jnp.asarray(e["ppos"]) for e in entries])
    vel_b = jnp.stack([jnp.asarray(e["pvel"]) for e in entries])
    ell_b = jnp.stack([jnp.asarray(e["ell"]) for e in entries])
    if _totals is None:
        Ts = np.asarray(jax.device_get(_subset_batch_totals(pos_b, grid)))
    else:
        Ts = _totals
    # group lanes by candidate-total pad class: one shared t_pad set by
    # the densest structure would make every lane pay its cost (the pow2
    # classes bound the within-class waste to 2x)
    classes: Dict[int, List[int]] = {}
    for k in range(len(entries)):
        classes.setdefault(fof._pad_pow2(int(max(int(Ts[k]), 1))),
                           []).append(k)
    if len(classes) > 1:
        for idxs in classes.values():
            _search_subset_batch(opt, [entries[i] for i in idxs],
                                 _totals=Ts[np.asarray(idxs)])
        return
    t_pad = next(iter(classes))
    B = len(entries)
    if B * t_pad > _BATCH_SLOT_BUDGET and B > 1:
        mid = B // 2
        _search_subset_batch(opt, entries[:mid], _totals=Ts[:mid])
        _search_subset_batch(opt, entries[mid:], _totals=Ts[mid:])
        return
    _subset_batch_run(opt, entries, pos_b, vel_b, ell_b, grid, t_pad)



@jax.jit
def _rank_remap(ids):
    """Map each positive id to its 1-based rank among the array's distinct
    positive ids (ascending), 0 elsewhere; also returns the distinct count.
    Device replacement for the np.unique remap in the recursion's unbind
    splice (ids keep their relative size order under the global by-size
    renumber, so ranking reproduces the per-structure numbering)."""
    s = jnp.sort(ids)
    first = jnp.concatenate([s[:1] > 0, (s[1:] != s[:-1]) & (s[1:] > 0)])
    ranks = jnp.cumsum(first.astype(jnp.int32))
    pos_ = jnp.searchsorted(s, ids, side="left")
    return jnp.where(ids > 0, ranks[pos_], 0).astype(jnp.int32), ranks[-1]


@partial(jax.jit, static_argnames=("spacing",))
def _compact_pad_lattice(pos, vel, aidx, avalid, nact, side,
                         spacing: float):
    """Compacted (pos, vel) with invalid slots parked on an isolated
    cubic lattice outside the bounding box (device analog of
    _pad_structure for the global-density subset)."""
    npadg = aidx.shape[0]
    safe = jnp.where(avalid, aidx, 0)
    gpos = seg.gather_rows(pos, safe)
    gvel = jnp.where(avalid[:, None], seg.gather_rows(vel, safe), 0.0)
    ii = jnp.maximum(jnp.arange(npadg, dtype=jnp.int32) - nact, 0)
    sd = jnp.maximum(side, 1)
    lat = jnp.stack([ii % sd, (ii // sd) % sd, ii // (sd * sd)],
                    axis=-1).astype(gpos.dtype)
    corner = jnp.min(jnp.where(avalid[:, None], gpos, jnp.inf),
                     axis=0) - 10.0 * spacing
    gpos = jnp.where(avalid[:, None], gpos, corner - lat * spacing)
    return gpos, gvel


@partial(jax.jit, static_argnames=("npad", "boxsize", "spacing",
                                   "cmadjust", "with_dens"))
def _prep_class_device(pos, vel, mass, dens, order, starts, nsubs, sides,
                       npad: int, boxsize: float, spacing: float,
                       cmadjust: bool, with_dens: bool):
    """Batched device build of per-structure padded contexts straight
    from the group-sorted order — the device-resident replacement for the
    host per-structure prep loop (the reference keeps particles
    rank-resident through SearchSubSub, mpiroutines.cxx:2548,2170-3031).
    Mirrors _pad_structure + the unwrap/CM-centering of search.cxx:
    2568-2625.  Returns (idx_b, ppos_b, pvel_b, pmass_b, valid_b,
    dens_b)."""
    n = pos.shape[0]
    ar = jnp.arange(npad, dtype=jnp.int32)
    valid_b = ar[None, :] < nsubs[:, None]                    # (B, npad)
    slot = jnp.minimum(starts[:, None] + ar[None, :],
                       starts[:, None] + nsubs[:, None] - 1)
    idx_b = order[jnp.clip(slot, 0, n - 1)]                   # (B, npad)
    gpos = jnp.stack([pos[:, j][idx_b] for j in range(3)], axis=-1)
    gvel = jnp.stack([vel[:, j][idx_b] for j in range(3)], axis=-1)
    gmass = jnp.where(valid_b, mass[idx_b], 0.0)
    if boxsize:
        ref = gpos[:, 0:1]
        d = gpos - ref
        gpos = ref + d - boxsize * jnp.round(d / boxsize)
    if cmadjust:
        w = gmass / jnp.maximum(
            jnp.sum(gmass, axis=1, keepdims=True), 1e-30)
        gpos = gpos - jnp.sum(gpos * w[..., None], axis=1, keepdims=True)
        gvel = gvel - jnp.sum(gvel * w[..., None], axis=1, keepdims=True)
    gvel = jnp.where(valid_b[..., None], gvel, 0.0)
    ii = jnp.maximum(ar[None, :] - nsubs[:, None], 0)
    sd = jnp.maximum(sides[:, None], 1)
    lat = jnp.stack([ii % sd, (ii // sd) % sd, ii // (sd * sd)],
                    axis=-1).astype(gpos.dtype)
    corner = jnp.min(jnp.where(valid_b[..., None], gpos, jnp.inf),
                     axis=1, keepdims=True) - 10.0 * spacing
    gpos = jnp.where(valid_b[..., None], gpos, corner - lat * spacing)
    dens_b = None
    if with_dens:
        dens_b = jnp.where(valid_b, dens[idx_b], 1.0)
    return idx_b, gpos, gvel, gmass, valid_b, dens_b


def search_sub_sub(opt: C.Options, pos, vel, mass, pfof, ngroups: int,
                   boxsize: Optional[float] = None, mesh=None):
    """Recursive substructure search (reference SearchSubSub,
    search.cxx:2480-2946).

    Returns (pfof, ngroups_total, hostid, parentgid, level) where the per-
    group arrays are indexed by group id (entry 0 unused; hostid=-1 for
    field objects, reference GetHierarchy semantics).

    With ``mesh``, the same-size structure-class batches are sharded over
    the device mesh (whole structures per device,
    parallel/distributed_substructure.py — the analog of the reference's
    per-rank SearchSubSub over locally-owned halos); results are
    bit-exact vs the single-device batch by construction.
    """
    prof = _SubsubProf()
    pos_d = jnp.asarray(pos, jnp.float32)
    vel_d = jnp.asarray(vel, jnp.float32)
    mass_d = jnp.asarray(mass, jnp.float32)
    pfof_d = jnp.asarray(pfof).astype(jnp.int32)
    n = int(pos_d.shape[0])
    ng_total = int(ngroups)
    parent = np.zeros(ng_total + 1, np.int64)   # 0 = field
    level_of = np.zeros(ng_total + 1, np.int32)
    # pad-lattice pitch: safely beyond every linking length used in the
    # subsearch (base and ellxfac-expanded)
    pad_spacing = 3.0 * opt.ellxscale * opt.ellphys * max(1.0, opt.ellxfac)

    # per-group sizes: audited small fetch (the TPU analog of the
    # reference's allreduced group counts)
    sizes0 = np.asarray(fetch_small(seg.group_sizes(pfof_d, ng_total)))
    queue = [g for g in range(1, ng_total + 1)
             if sizes0[g] >= C.MINSUBSIZE]

    # GLOBAL velocity density, computed ONCE over the particles in
    # MINSUBSIZE+ groups (reference search.cxx:214-240: GetVelocityDensity
    # at the full-set level; every recursion level's GetDenVRatio reads
    # the STORED density — recomputing per structure is the reference's
    # non-default HALOONLYDEN compile mode, kept behind
    # opt.iHaloLocalDensity).  Also the checkpoint unit (Output_den ->
    # opt.smname; reference Write/ReadLocalVelocityDensity,
    # io.cxx:178-251).
    dens_global = None     # device (n,) f32, or None
    halo_local = bool(getattr(opt, "iHaloLocalDensity", 0))
    if opt.iSubSearch and queue and not halo_local:
        from ..io import cache as cache_io

        act_d = (pfof_d > 0) & (jnp.asarray(sizes0)[pfof_d]
                                >= C.MINSUBSIZE)
        nact = int(fetch_small(jnp.sum(act_d.astype(jnp.int32))))
        loaded = aidx_h = None
        if opt.smname and nact:
            # checkpoint read/write is this stage's one legitimate host
            # round-trip (reference Read/WriteLocalVelocityDensity,
            # io.cxx:178-251) — audited + counted
            aidx_h = np.nonzero(np.asarray(fetch_bulk(
                act_d, "density_cache_index")))[0]
            loaded = cache_io.read_local_velocity_density(opt.smname,
                                                          aidx_h)
        if loaded is not None and len(loaded) == len(aidx_h):
            dens_global = jnp.zeros(n, jnp.float32).at[
                jnp.asarray(aidx_h)].set(jnp.asarray(loaded, jnp.float32))
        elif nact:
            exact = opt.iLocalVelDenApproxCalcFlag == 0
            # mesh path: shard the kNN density over devices (the analog of
            # the reference's kNN import machinery,
            # mpiroutines.cxx:1203-1722) once the active set is too big
            # for one device; below the threshold the single-device
            # evaluation is exact (slab-local leaf splits perturb the
            # approximative candidate sets near slab boundaries, so small
            # runs keep bit-identical catalogs either way)
            dist_min = int(os.environ.get("VR_DIST_DENSITY_MIN", 1 << 23))
            npadg = _next_pow2(nact)
            aidx_d, avalid, _ = seg.compact_mask(act_d, npadg)
            side = int(np.ceil(max(npadg - nact, 1) ** (1 / 3)))
            gpos, gvel_ = _compact_pad_lattice(
                pos_d, vel_d, aidx_d, avalid, jnp.int32(nact),
                jnp.int32(side), float(pad_spacing))
            if mesh is not None and not exact and nact >= dist_min:
                from ..parallel.distributed_localfield import \
                    distributed_velocity_density

                # the sharded density's slab packing is a host prepass
                # (audited staging; device-side packing is future work)
                d = jnp.asarray(distributed_velocity_density(
                    np.asarray(fetch_bulk(gpos, "density_slab_prepass")),
                    np.asarray(fetch_bulk(gvel_, "density_slab_prepass")),
                    mesh, nvel=opt.Nvel, nsearch=opt.Nsearch,
                    boxsize=boxsize,
                    active=np.asarray(fetch_bulk(
                        avalid, "density_slab_prepass"))))
            else:
                d = localfield.velocity_density(
                    gpos, gvel_, nvel=opt.Nvel, nsearch=opt.Nsearch,
                    active=avalid, exact=exact,
                    chunk=256 if exact else 2048)
            dens_global = jnp.zeros(n, jnp.float32).at[
                jnp.where(avalid, aidx_d, n)].set(
                jnp.asarray(d, jnp.float32)[:npadg], mode="drop")
            if opt.smname:
                if aidx_h is None:
                    aidx_h = np.nonzero(np.asarray(fetch_bulk(
                        act_d, "density_cache_index")))[0]
                cache_io.write_local_velocity_density(
                    opt.smname,
                    np.asarray(fetch_bulk(dens_global,
                                          "density_cache"))[aidx_h],
                    aidx_h)
    prof.lap("density", wait=dens_global)
    for level in range(1, C.MAXSUBLEVEL + 1):
        if not queue or not opt.iSubSearch:
            break
        # one group-sort per level instead of an O(N) scan per structure
        # (the reference's PID-sort, search.cxx:2513); slice boundaries
        # are per-group metadata (audited small fetch)
        lvl_order_d = jnp.argsort(pfof_d, stable=True).astype(jnp.int32)
        lvl_offs = np.asarray(fetch_small(jnp.searchsorted(
            pfof_d[lvl_order_d],
            jnp.arange(ng_total + 2, dtype=jnp.int32)))).astype(np.int64)
        new_queue = []
        # pass 1: class-batched DEVICE prep — padded per-structure
        # contexts gathered straight from the group-sorted order (no host
        # staging; reference particles stay rank-resident through
        # SearchSubSub, mpiroutines.cxx:2548)
        prep = []
        for g in queue:
            nsub = int(lvl_offs[g + 1] - lvl_offs[g])
            if nsub < C.MINSUBSIZE:
                continue
            cellsize = int(max(C.MINCELLSIZE, opt.Ncellfac * nsub))
            cellsize = min(cellsize, max(32, nsub // 2))
            npad = _next_pow2(nsub)
            side = int(np.ceil(max(npad - nsub, 1) ** (1 / 3)))
            prep.append({"g": g, "start": int(lvl_offs[g]), "nsub": nsub,
                         "npad": npad, "cellsize": cellsize,
                         "side": side})
        by_npad: Dict[int, List[dict]] = {}
        for e in prep:
            by_npad.setdefault(e["npad"], []).append(e)
        for npad_k, grp_p in by_npad.items():
            idx_b, ppos_b, pvel_b, pmass_b, valid_b, dens_b = \
                _prep_class_device(
                    pos_d, vel_d, mass_d,
                    dens_global if dens_global is not None
                    else jnp.zeros(0, jnp.float32),
                    lvl_order_d,
                    jnp.asarray([e["start"] for e in grp_p], jnp.int32),
                    jnp.asarray([e["nsub"] for e in grp_p], jnp.int32),
                    jnp.asarray([e["side"] for e in grp_p], jnp.int32),
                    npad_k, float(boxsize or 0.0), float(pad_spacing),
                    bool(opt.icmrefadjust), dens_global is not None)
            for j, e in enumerate(grp_p):
                e["idx"] = idx_b[j]
                e["ppos"], e["pvel"], e["pmass"] = (ppos_b[j], pvel_b[j],
                                                    pmass_b[j])
                e["valid"] = valid_b[j]
                e["cached"] = dens_b[j] if dens_b is not None else None

        prof.lap("prep", wait=[e.get("ppos") for e in prep])
        # pass 2: batched outliers — same-(npad, grid depth, cached?)
        # structures share ONE vmapped dispatch (the analog of the
        # reference's OpenMP loop over structures, search.cxx:2480)
        buckets: dict = {}
        for e in prep:
            key = (e["npad"], _grid_levels(e["npad"], e["cellsize"]),
                   e["cached"] is not None)
            buckets.setdefault(key, []).append(e)
        _B_ELEMS = 1 << 22   # batch cap: B*npad elements per dispatch
        for (npad_k, _lv, has_cache), entries in buckets.items():
            bmax = max(1, _B_ELEMS // npad_k)
            for lo in range(0, len(entries), bmax):
                grp = entries[lo:lo + bmax]
                if len(grp) == 1:
                    e = grp[0]
                    ell, dens, _ = structure_outliers(
                        opt, e["ppos"], e["pvel"], e["pmass"], e["valid"],
                        dens=e["cached"])
                    e["ell"], e["dens"] = ell, dens
                    continue
                ppos_b = jnp.stack([e["ppos"] for e in grp])
                pvel_b = jnp.stack([e["pvel"] for e in grp])
                pmass_b = jnp.stack([e["pmass"] for e in grp])
                valid_b = jnp.stack([e["valid"] for e in grp])
                dens_b = jnp.stack(
                    [jnp.asarray(e["cached"]) for e in grp]) \
                    if has_cache else None
                ell_b, dens_b = structure_outliers_batch(
                    opt, ppos_b, pvel_b, pmass_b, valid_b,
                    grp[0]["cellsize"], dens_b=dens_b)
                for j, e in enumerate(grp):
                    e["ell"] = ell_b[j]
                    e["dens"] = dens_b[j]

        prof.lap("outliers", wait=[e.get("ell") for e in prep])
        # pass 2.5: batched candidate search over same-npad classes (one
        # vmapped dispatch chain instead of a per-structure pipeline)
        if _batchable_subset(opt):
            byn: dict = {}
            for e in prep:
                byn.setdefault(e["npad"], []).append(e)
            for entries in byn.values():
                # singleton classes (the handful of BIGGEST structures —
                # each lands alone in its pow2 class) take the batched
                # machinery too: its 3 fused dispatches beat the
                # sequential path's edge-table pass chain even at B=1,
                # and the biggest structures are exactly where the
                # sequential per-pass overhead hurt (r3: 0.05x DM-only)
                if mesh is not None and len(entries) >= 2:
                    from ..parallel.distributed_substructure import \
                        distributed_subset_batch

                    distributed_subset_batch(opt, entries, mesh)
                else:
                    _search_subset_batch(opt, entries)

        prof.lap("subset", wait=[e.get("sub_np") for e in prep])
        # pass 3a: per-structure search / cores / merges (unbind deferred).
        # The default (batched, no core search) flow stays device-resident;
        # the sequential-search fallback and the host-side core/phase
        # merges stage their structure through AUDITED bulk fetches
        # (fetch_bulk), so the residency telemetry counts them.
        host_paths = (opt.iHaloCoreSearch > 0
                      and level <= opt.maxnlevelcoresearch) or \
            opt.coresubmergemindist > 0
        pend = []
        for e in prep:
            valid, ell = e["valid"], e["ell"]
            ppos = pvel = pmass = None     # host mirrors, fetched lazily

            def _host_arrays(e=e):
                return (np.asarray(fetch_bulk(e["ppos"], "subsub_host")),
                        np.asarray(fetch_bulk(e["pvel"], "subsub_host")),
                        np.asarray(fetch_bulk(e["pmass"], "subsub_host")))

            if "sub_np" in e:
                telemetry.count("subset_batched_structures")
                telemetry.count("subset_batched_particles", e["npad"])
                sub_pfof, ng_sub = e["sub_np"], e["ng_sub"]
            else:
                telemetry.count("subset_sequential_structures")
                telemetry.count("subset_sequential_particles", e["npad"])
                ppos, pvel, pmass = _host_arrays()
                sub_pfof, ng_sub = search_subset(
                    opt, jnp.asarray(ppos), jnp.asarray(pvel),
                    jnp.asarray(pmass), ell,
                    bounds=(ppos.min(0).astype(np.float64),
                            ppos.max(0).astype(np.float64)))
            sub_host = None
            # merger-remnant core search (reference search.cxx:1530,
            # HaloCoreGrowth): cores beyond the main one become substructures
            if opt.iHaloCoreSearch > 0 and level <= opt.maxnlevelcoresearch:
                if ppos is None:
                    ppos, pvel, pmass = _host_arrays()
                core, ncores = halo_core_search(
                    opt, ppos, pvel, pmass, valid, sub_pfof,
                    sublevel=level,
                    bounds=(ppos.min(0).astype(np.float64),
                            ppos.max(0).astype(np.float64)))
                if ncores >= 2:
                    core_np = np.asarray(core)
                    sub_host = np.asarray(fetch_bulk(jnp.asarray(sub_pfof),
                                                     "subsub_host"))
                    extra = (core_np > 1) & (sub_host == 0)
                    sub_host = np.where(extra, core_np - 1 + ng_sub,
                                        sub_host).astype(np.int32)
                    ncore_extra = ncores - 1
                    if opt.coresubmergemindist > 0 and ng_sub > 0:
                        # phase-overlap merge of promoted cores into subs
                        # (reference MergeSubstructuresCoresPhase,
                        # search.cxx:2146)
                        sub_host, ncore_extra = \
                            merge_substructures_cores_phase(
                                ppos, pvel, pmass, sub_host, ng_sub,
                                ncore_extra, opt.coresubmergemindist)
                    ng_sub += ncore_extra
            if opt.coresubmergemindist > 0 and ng_sub > 1:
                # substructure-substructure phase merge (reference
                # MergeSubstructuresPhase, search.cxx:1701,2289)
                if ppos is None:
                    ppos, pvel, pmass = _host_arrays()
                if sub_host is None:
                    sub_host = np.asarray(fetch_bulk(jnp.asarray(sub_pfof),
                                                     "subsub_host"))
                sub_host, ns_new, nc_new = merge_substructures_phase(
                    ppos, pvel, pmass, sub_host, ng_sub, 0,
                    opt.coresubmergemindist)
                ng_sub = ns_new + nc_new
            e["sub_np3"] = (jnp.asarray(sub_pfof).astype(jnp.int32)
                            if sub_host is None
                            else jnp.asarray(sub_host, jnp.int32))
            e["ng_sub3"] = int(ng_sub)
            if ng_sub > 0:
                pend.append(e)

        # pass 3b: ONE unbind over every candidate of the level (unbinding
        # is per-group local, so the structures' padded arrays concatenate
        # into a single group-relabelled problem — the per-structure
        # unbind dispatch chain was the recursion's wall once the searches
        # batched; the reference's analog is the per-rank OpenMP loop,
        # search.cxx:2480).  Per-structure ids are recovered afterwards:
        # a structure's groups keep their relative size order under the
        # global by-size renumber, so the rank of its distinct ids
        # reproduces check_unbound_groups' per-structure numbering.
        prof.lap("cores")
        if pend and opt.uinfo.unbindflag:
            base = 0
            cat_pos, cat_vel, cat_mass, cat_gid = [], [], [], []
            for e in pend:
                sub3 = e["sub_np3"]
                cat_pos.append(e["ppos"])
                cat_vel.append(e["pvel"])
                cat_mass.append(e["pmass"])
                cat_gid.append(jnp.where(sub3 > 0, sub3 + base, 0)
                               .astype(jnp.int32))
                base += e["ng_sub3"]
            ures = unbind_mod.check_unbound_groups(
                jnp.concatenate(cat_pos),
                jnp.concatenate(cat_vel),
                jnp.concatenate(cat_mass),
                jnp.concatenate(cat_gid),
                _next_pow2(base, 16), opt.uinfo, opt.G,
                min_size=opt.MinSize)
            # per-structure id recovery on device: rank each slice's
            # distinct surviving ids (device replacement for the
            # np.unique remap; one small (P,) count fetch)
            off = 0
            ks = []
            for e in pend:
                npad_e = e["ppos"].shape[0]
                seg_ids = jax.lax.dynamic_slice_in_dim(
                    ures.pfof, off, npad_e)
                off += npad_e
                e["sub_np3"], k = _rank_remap(seg_ids)
                ks.append(k)
            for e, k in zip(pend, np.asarray(fetch_small(jnp.stack(ks)))):
                e["ng_sub3"] = int(k)

        prof.lap("unbind")
        # pass 3c: splice results into the global bookkeeping (device
        # scatter per structure; group sizes for the next-level queue are
        # per-group metadata, fetched in one batch)
        pend = [e for e in pend if e["ng_sub3"] > 0]
        if pend:
            ngmax_lvl = max(e["ng_sub3"] for e in pend)
            size_rows = []
            for e in pend:
                sel = (e["sub_np3"] > 0) & e["valid"]
                size_rows.append(seg.group_sizes(
                    jnp.where(sel, e["sub_np3"], 0), ngmax_lvl))
            sizes_h = np.asarray(fetch_small(jnp.stack(size_rows)))
        for j, e in enumerate(pend):
            g, ng_sub = e["g"], e["ng_sub3"]
            sel = (e["sub_np3"] > 0) & e["valid"]
            tgt = jnp.where(sel, e["idx"], n)
            pfof_d = pfof_d.at[tgt].set(ng_total + e["sub_np3"],
                                        mode="drop")
            parent = np.concatenate([parent, np.full(ng_sub, g, np.int64)])
            level_of = np.concatenate(
                [level_of, np.full(ng_sub, level, np.int32)])
            sub_sizes = sizes_h[j]
            new_queue.extend(ng_total + s for s in range(1, ng_sub + 1)
                             if sub_sizes[s] >= C.MINSUBSIZE)
            ng_total += ng_sub
        queue = new_queue
        prof.lap("splice")

    # hostid: top-level ancestor (reference GetHierarchy /
    # PropData.hostid: -1 for field objects) — vectorised pointer jumping
    # (<= MAXSUBLEVEL compositions; the per-group Python walk was O(ng *
    # depth) host time at genesis-scale group counts)
    anc = np.arange(ng_total + 1, dtype=np.int64)
    for _ in range(C.MAXSUBLEVEL + 2):
        nxt = parent[anc]
        stepped = nxt > 0
        if not stepped.any():
            break
        anc = np.where(stepped, nxt, anc)
    hostid = np.where(anc == np.arange(ng_total + 1), -1, anc)
    hostid[0] = -1
    return pfof_d, ng_total, hostid, parent, level_of


# ---------------------------------------------------------------------------
# Halo core search (merger remnants)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class Pred6DCore:
    """FOF6d criterion restricted to eligible (untagged) particles
    (reference FOF6d + FOFcheckbg gating, search.cxx:1596-1600)."""

    b2: float
    v2: float

    def __call__(self, d2, own, nbr):
        dv2 = jnp.sum((own["vel"] - nbr["vel"]) ** 2, axis=-1)
        ok = d2 / self.b2 + dv2 / self.v2 <= 1.0
        return ok & (own["elig"] > 0) & (nbr["elig"] > 0)


def halo_core_search(opt: C.Options, pos, vel, mass, valid, pfof_sub,
                     sublevel: int = 1, bounds=None):
    """6DFOF core search with shrinking linking lengths + phase-tensor core
    growth (reference search.cxx:1530-1816 and HaloCoreGrowth:1817).

    ``pfof_sub``: existing substructure ids (those particles are ignored).
    Returns (core_id (N,), ncores) where core 1 is the halo's main core and
    cores 2..ncores are merger-remnant candidates to be promoted to
    substructures (reference iHaloCoreSearch==2 semantics).
    """
    pos = jnp.asarray(pos)
    vel = jnp.asarray(vel)
    mass = jnp.asarray(mass)
    n = pos.shape[0]
    valid = jnp.asarray(valid)
    nvalid = int(np.asarray(jax.device_get(jnp.sum(valid))))

    # halo velocity dispersion (1D average), reference HaloSigmaV
    w = jnp.where(valid, mass, 0.0)
    mtot = jnp.maximum(jnp.sum(w), 1e-30)
    vmean = jnp.sum(vel * w[:, None], 0) / mtot
    sigv2 = jnp.sum(jnp.sum((vel - vmean) ** 2, -1) * w) / mtot / 3.0
    sigv2 = float(np.asarray(jax.device_get(sigv2)))

    ellx = opt.ellxscale * opt.ellphys * opt.ellhalophysfac * \
        opt.halocorexfac * opt.halocorexfac ** (sublevel - 1)
    ellx2 = ellx * ellx
    ellv2 = sigv2 * opt.halocorevfac ** 2
    minsize = max(int(nvalid * opt.halocorenfac *
                      opt.halocorenumfaciter ** (sublevel - 1)), opt.MinSize)

    core = jnp.zeros(n, jnp.int32)
    ncores = 0
    # the linking length shrinks every loop (halocorexfaciter <= 1), so the
    # loop-0 edge table (spatial-only prefilter) contains every later
    # loop's pairs: build it ONCE and re-evaluate the shrinking 6D
    # criterion + eligibility along it (fof.refine_edge_mask), instead of
    # rebuilding candidates per loop (reference rebuilds the KD tree per
    # loop, search.cxx:1609; the edge list is the reusable analog)
    reuse_edges = opt.halocorexfaciter <= 1.0
    edges = grid0 = None
    if reuse_edges:
        edges, _, grid0 = fof.build_edges(
            pos, math.sqrt(ellx2), fields={"vel": vel},
            predicate=fof.Pred3D(float(ellx2)), bounds=bounds)
    for loop in range(max(1, opt.halocorenumloops)):
        # eligible: untagged by substructure search and (first loop) any
        # particle, later loops only the current main core's particles
        if loop == 0:
            elig = valid & (jnp.asarray(pfof_sub) == 0)
        else:
            elig = valid & (jnp.asarray(pfof_sub) == 0) & (core == 1)
        pred = Pred6DCore(float(ellx2), float(max(ellv2, 1e-30)))
        if reuse_edges:
            fields_s = dict(edges.fields_s)
            fields_s["elig"] = elig.astype(jnp.int32)[edges.order]
            mask = fof.refine_edge_mask(edges.pos_s, fields_s, edges.erow,
                                        edges.ecol, grid0, pred)
            labels = fof.fof_labels_from_edges(
                jnp.where(mask, edges.erow, 0),
                jnp.where(mask, edges.ecol, 0), n,
                undirected=edges.undirected)
            pfc_sorted, ngc_d = fof.renumber_by_size(
                labels, minsize, orig_index=edges.order)
            pfc = jnp.zeros(n, jnp.int32).at[edges.order].set(pfc_sorted)
            ngc = int(jax.device_get(ngc_d))
        else:
            pfc, ngc = fof.fof3d(
                pos, math.sqrt(ellx2), min_size=minsize, vel=vel,
                extra_fields={"elig": elig.astype(jnp.int32)},
                predicate=pred, bounds=bounds)
            ngc = int(jax.device_get(ngc))
        if ngc == 0:
            break
        pfc = jnp.asarray(pfc)
        if loop == 0:
            core = pfc
            ncores = ngc
        else:
            # refined main core replaces core 1; extra groups appended
            core = jnp.where((core == 1) & (pfc == 0), 0, core)
            core = jnp.where(pfc == 1, 1, core)
            if ngc > 1:
                core = jnp.where(pfc > 1, pfc - 1 + ncores, core)
                ncores += ngc - 1
        ellx2 *= opt.halocorexfaciter ** 2
        ellv2 *= opt.halocorevfaciter ** 2
        minsize = max(int(minsize * opt.halocorenumfaciter), opt.MinSize)
        if minsize * opt.halocorenumfaciter >= nvalid:
            break
    if ncores < 2:
        return jnp.zeros(n, jnp.int32), 0

    # phase-tensor core growth (reference HaloCoreGrowth with
    # iPhaseCoreGrowth: Mahalanobis assignment using per-core 6D phase
    # dispersion tensors, iterated)
    if opt.iHaloCoreSearch >= 2 and opt.iPhaseCoreGrowth:
        core = _phase_tensor_growth(pos, vel, mass, valid,
                                    jnp.asarray(pfof_sub), core, ncores)
    return core, ncores


@partial(jax.jit, static_argnames=("ncores", "iters"))
def _phase_tensor_growth(pos, vel, mass, valid, pfof_sub, core,
                         ncores: int, iters: int = 4):
    """Assign untagged halo particles to the phase-space-nearest core."""
    n = pos.shape[0]
    nc1 = ncores + 1
    phase = jnp.concatenate([pos, vel], axis=1)              # (N,6)
    assignable = valid & (pfof_sub == 0)

    def step(core, _):
        w = jnp.where((core > 0) & valid, mass, 0.0)
        msum = jnp.maximum(
            jax.ops.segment_sum(w, core, num_segments=nc1), 1e-30)
        mu = jax.ops.segment_sum(phase * w[:, None], core,
                                 num_segments=nc1) / msum[:, None]
        d = phase - mu[core]
        cov = jax.ops.segment_sum(
            d[:, :, None] * d[:, None, :] * w[:, None, None], core,
            num_segments=nc1) / msum[:, None, None]
        tr = jnp.trace(cov, axis1=1, axis2=2) / 6.0
        cov = cov + (1e-6 * jnp.maximum(tr, 1e-20))[:, None, None] * \
            jnp.eye(6, dtype=pos.dtype)[None]
        icov = jnp.linalg.inv(cov)                           # (nc1,6,6)
        # Mahalanobis distance of every particle to every core
        dd = phase[:, None, :] - mu[None, 1:, :]             # (N,nc,6)
        md = jnp.einsum("nci,cij,ncj->nc", dd, icov[1:], dd)
        best = jnp.argmin(md, axis=1).astype(jnp.int32) + 1
        newcore = jnp.where(assignable, best, core)
        return newcore, None

    core, _ = jax.lax.scan(step, core, None, length=iters)
    return core
