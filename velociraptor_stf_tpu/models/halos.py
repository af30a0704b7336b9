"""Field halo search: 3DFOF + 6DFOF refinement.

TPU-native equivalent of the reference ``SearchFullSet``
(/root/reference/src/search.cxx:24-855):

* 3DFOF with linking length ``ellphys * ellxscale * ellhalophysfac``
  (search.cxx:77) over the periodic box — here: cell-list min-label FOF
  (ops/fof.py) instead of KD-tree + MPI link-across;
* optional 6DFOF refinement (search.cxx:400-580): particles already in 3DFOF
  groups are re-linked with the criterion
  ``dx^2/ellx6d^2 + dv^2/vscale^2 <= 1`` where ``ellx6d`` is the 3DFOF
  linking length scaled by ``ellhalo6dxfac`` and ``vscale^2`` is the
  mass-weighted velocity dispersion of the largest 3DFOF group (FOF6D) or of
  each group individually (FOF6DADAPTIVE), times ``ellhalo6dvfac^2``.
  Implemented by pre-scaling phase coordinates to a unit 6D ball, exactly as
  the reference scales particles before a TPHS-tree FOF (search.cxx:552-576),
  but as one global sharded pass restricted to same-group pairs instead of an
  OpenMP loop over per-group trees;
* ``iKeepFOF`` keeps the 3DFOF envelopes as parents of the 6D structures
  (search.cxx:581-649) — the 3DFOF labels are returned alongside.

Note: the reference's single-velocity-scale accumulation contains a stray
statement that makes ``mtotregion`` sum only one particle
(search.cxx:445-450); we implement the evidently intended mass-weighted
dispersion of the largest group.
"""

from __future__ import annotations

import os
import warnings
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import fof, pallas_fof, segments
from ..utils import config as C
from ..utils import telemetry


def _pred_unit6d_samegroup(d2, own, nbr):
    """Unit-ball 6D criterion restricted to same (nonzero) parent group."""
    dv2 = jnp.sum((own["vel"] - nbr["vel"]) ** 2, axis=-1)
    return (d2 + dv2 <= 1.0) & (own["group"] == nbr["group"]) & \
        (own["group"] > 0)


@dataclass
class FieldSearchResult:
    pfof: jnp.ndarray           # final group ids, original particle order
    ngroups: int                # number of final groups (host int)
    pfof3d: Optional[jnp.ndarray] = None   # 3DFOF labels if 6D ran
    ngroups3d: int = 0
    vscale2: Optional[jnp.ndarray] = None  # velocity scale(s) used for 6D
    # iKeepFOF (reference search.cxx:582-655): ids 1..num3dfof are the kept
    # 3DFOF envelopes; ids num3dfof+1.. are 6DFOF structures whose envelope
    # id is parent3d[gid] (0 = envelope fully decomposed)
    num3dfof: int = 0
    parent3d: Optional[np.ndarray] = None


def velocity_scale_largest_group(vel, mass, pfof, num_segments: int,
                                 ellhalo6dvfac: float,
                                 bug_compat: bool = False) -> jnp.ndarray:
    """Mass-weighted velocity dispersion^2 of group 1 x ellhalo6dvfac^2.

    (Group ids are size-ordered, so group 1 is the largest 3DFOF halo —
    matching the reference's use of the first group after its size sort.)

    ``bug_compat`` reproduces the reference's stray-statement accumulation
    (search.cxx:450: ``mtotregion`` picks up only the particle one past
    the largest group in sorted order) for catalog-compatibility tests;
    otherwise the evidently intended mass sum is used.
    """
    sel = (pfof == 1)
    w = jnp.where(sel, mass, 0.0)
    sv = jnp.sum(vel * w[:, None], axis=0)
    if bug_compat:
        n = pfof.shape[0]
        ari = jnp.arange(n, dtype=jnp.int32)
        # sorted order would place group 2 right after group 1, untagged
        # last; the stray statement reads the first post-group-1 particle
        cand2 = jnp.min(jnp.where(pfof == 2, ari, n))
        cand0 = jnp.min(jnp.where(pfof == 0, ari, n))
        candL = jnp.max(jnp.where(sel, ari, -1))
        idx = jnp.where(cand2 < n, cand2,
                        jnp.where(cand0 < n, cand0, candL))
        mtot = jnp.maximum(mass[jnp.clip(idx, 0, n - 1)], 1e-30)
    else:
        mtot = jnp.maximum(jnp.sum(w), 1e-30)
    vmean = sv / mtot
    dv2 = jnp.sum((vel - vmean) ** 2, axis=-1)
    vscale2 = jnp.sum(dv2 * w) / mtot
    return vscale2 * ellhalo6dvfac ** 2


def velocity_scale_per_group(vel, mass, pfof, num_segments: int,
                             ellhalo6dvfac: float) -> jnp.ndarray:
    """(num_segments,) per-group mass-weighted velocity dispersion^2 x fac^2
    (FOF6DADAPTIVE, reference search.cxx:472-499)."""
    vmean = segments.segment_mean(vel, mass, pfof, num_segments)
    dv2 = jnp.sum((vel - segments.gather_rows(vmean, pfof)) ** 2, axis=-1)
    vscale2 = segments.segment_mean(dv2, mass, pfof, num_segments)
    return vscale2 * ellhalo6dvfac ** 2


import dataclasses


@dataclasses.dataclass(frozen=True)
class Pred6DRefine:
    """6DFOF criterion over an existing 3D edge list:
    dx^2/ell6d^2 + dv^2/vscale2 <= 1 within the same nonzero parent group
    (reference search.cxx:552-576; vscale2 is a per-particle field so both
    the single-scale and adaptive variants share the kernel)."""

    b2: float

    def __call__(self, d2, own, nbr):
        dv2 = jnp.sum((own["vel"] - nbr["vel"]) ** 2, axis=-1)
        ok = d2 / self.b2 + dv2 / own["vscale2"] <= 1.0
        return ok & (own["group"] == nbr["group"]) & (own["group"] > 0)


def _search_full_set_pallas(opt: C.Options, pos, vel, mass, boxsize,
                            b3d: float, reach: float, run6d: bool,
                            minsize: int) -> Optional[FieldSearchResult]:
    """Field search on the Pallas block-range sweep; None when a ghost
    capacity overflow demands the XLA edge pipeline instead."""
    n = pos.shape[0]
    pf = pallas_fof.PallasFof(pos, vel, boxsize, reach)
    if pf.check_overflow():
        telemetry.count("pallas_fof_overflow_fallbacks")
        return None   # ghost capacity exceeded: XLA path
    # linked-subset prune: one detect pass flags particles with >= 1
    # neighbour within b3d; at FOF linking lengths that is typically
    # ~20-30% of the box, so the label fixed point (the dominant cost,
    # ~6 full sweeps) runs on a ~4x smaller compacted context.  Isolated
    # particles can never join a group (pairs need BOTH ends kept, and
    # the detect criterion is exactly the link criterion).
    pf3 = pf
    if os.environ.get("VR_FOF_PRUNE", "1") != "0":
        keep, nkeep = pf.linked_mask(b3d)
        if nkeep < 0.45 * n:
            cand = pf.subset(keep)
            if cand.check_overflow():
                telemetry.count("pallas_fof_overflow_fallbacks")
            else:
                pf3 = cand
                pf.ctx = None   # the full ctx is not needed again
    pfof3, ng3_d = pf3.fof3d(b3d, minsize)
    ng3 = int(jax.device_get(ng3_d))
    if not (run6d and ng3 > 0):
        return FieldSearchResult(pfof=pfof3, ngroups=ng3)
    ell6d = b3d * opt.ellhalo6dxfac
    nseg = ng3 + 1
    if opt.fofbgtype == C.FOF6D and not opt.iKeepFOF:
        vscale2 = velocity_scale_largest_group(
            vel, mass, pfof3, nseg, opt.ellhalo6dvfac,
            bug_compat=bool(opt.iVscaleReferenceBugCompat))
        vs_per_particle = jnp.where(pfof3 > 0, vscale2, 1.0)
    else:
        vs_group = velocity_scale_per_group(vel, mass, pfof3, nseg,
                                            opt.ellhalo6dvfac)
        vs_per_particle = jnp.where(
            pfof3 > 0,
            jnp.maximum(vs_group[jnp.clip(pfof3, 0, nseg - 1)], 1e-30),
            1.0)
    # 6D links only connect 3DFOF-tagged particles (tagged implies
    # b3d-linked, so the pruned ctx still covers them); sweep a compacted
    # subset context whenever compaction halves the padded slot count —
    # sweep cost scales with slots, the build costs ~1 sweep-equivalent,
    # and the fixed point runs >= 3 sweeps (512^3 measured: subset build
    # ~5 s vs fof6d 55 s on the uncompacted 67M-slot ctx)
    tag = pfof3 > 0
    ntag = int(jax.device_get(jnp.sum(tag)))
    nbase = pf3.ctx.ns_pad
    pf6 = pf3
    if ntag > 0:
        sub_pad = pf3.subset_pad(tag)
        if sub_pad <= nbase // 2:
            pf6 = pf3.subset(tag, ns_pad_new=sub_pad)
    if pf6 is not pf3 and pf6.check_overflow():
        telemetry.count("pallas_fof_overflow_fallbacks")
        pf6 = pf3   # subset capacity miscount: sweep the base ctx
    if pf6 is not pf3:
        # the 6D sweep only touches the subset ctx: release the parent's
        # slot arrays (~4.5 GB at 512^3) before the sweep allocates
        pf3.ctx = None
        pf.ctx = None
    pfof6, ng6_d = pf6.fof6d(ell6d, pfof3, vs_per_particle, minsize)
    ng6 = int(jax.device_get(ng6_d))
    return _finish_6d(opt, pfof3, ng3, pfof6, ng6, vs_per_particle,
                      minsize)


def search_full_set(opt: C.Options, pos, vel, mass,
                    boxsize: Optional[float] = None) -> FieldSearchResult:
    """Find field halos.  Returns final labels in original particle order."""
    pos = jnp.asarray(pos)
    vel = jnp.asarray(vel)
    mass = jnp.asarray(mass)
    n = pos.shape[0]
    minsize = opt.HaloMinSize if opt.HaloMinSize > 0 else opt.MinSize

    b3d = opt.ellphys * opt.ellxscale * opt.ellhalophysfac
    run6d = opt.fofbgtype in (C.FOF6D, C.FOF6DADAPTIVE)
    reuse_edges = run6d and opt.ellhalo6dxfac <= 1.0

    # Pallas block-range sweep path (TPU): same criteria, same renumbering
    # semantics, ~3x faster than the edge pipeline at bench scales.
    # Ghost/subset capacity overflows (ctx.overflow) are CHECKED and fall
    # back to the XLA edge pipeline — silent capacity loss would produce
    # boundary-split groups with no error.  A Mosaic lowering/compile
    # failure (kernel not supported by the local toolchain) also falls
    # back — once, via the module latch — unless VR_FOF_PALLAS=1 forces
    # the kernel path (then errors surface).
    reach = b3d * max(1.0, opt.ellhalo6dxfac if run6d else 1.0)
    if pallas_fof.pallas_fof_available(n, boxsize, reach):
        try:
            res = _search_full_set_pallas(opt, pos, vel, mass, boxsize,
                                          b3d, reach, run6d, minsize)
        except Exception:
            if os.environ.get("VR_FOF_PALLAS") == "1":
                raise
            warnings.warn("Pallas FOF kernels failed to compile on this "
                          "backend; using the XLA edge pipeline",
                          RuntimeWarning)
            pallas_fof.mark_compile_failed()
            res = None
        if res is not None:
            return res

    fields = {"vel": vel} if reuse_edges else None
    edges, binning, grid = fof.build_edges(pos, b3d, boxsize=boxsize,
                                           fields=fields)
    labels3 = fof.fof_labels_from_edges(edges.erow, edges.ecol, n,
                                        undirected=edges.undirected)
    pfof3_s, ng3 = fof.renumber_by_size(labels3, minsize,
                                        orig_index=edges.order)
    pfof3 = jnp.zeros(n, jnp.int32).at[edges.order].set(pfof3_s)
    ng3 = int(jax.device_get(ng3))

    if not (run6d and ng3 > 0):
        return FieldSearchResult(pfof=pfof3, ngroups=ng3)

    ell6d = b3d * opt.ellhalo6dxfac
    nseg = ng3 + 1
    if opt.fofbgtype == C.FOF6D and not opt.iKeepFOF:
        vscale2 = velocity_scale_largest_group(
            vel, mass, pfof3, nseg, opt.ellhalo6dvfac,
            bug_compat=bool(opt.iVscaleReferenceBugCompat))
        vs_per_particle = jnp.where(pfof3 > 0, vscale2, 1.0)
    else:  # FOF6DADAPTIVE (or iKeepFOF: per-group scales, search.cxx:472)
        vs_group = velocity_scale_per_group(vel, mass, pfof3, nseg,
                                            opt.ellhalo6dvfac)
        vs_per_particle = jnp.where(pfof3 > 0,
                                    jnp.maximum(vs_group[jnp.clip(pfof3, 0, nseg - 1)], 1e-30),
                                    1.0)

    if reuse_edges:
        # 6D links are a subset of the 3D edges (ell6d <= ell3d): filter the
        # existing edge list instead of rebuilding the candidate table, and
        # run the label fixed point on the 3DFOF-tagged subset only (6D can
        # only link within a 3D group, so labels of untagged particles
        # never change)
        fields6 = dict(edges.fields_s)
        fields6["vscale2"] = vs_per_particle[edges.order]
        fields6["group"] = pfof3_s
        mask6 = fof.refine_edge_mask(edges.pos_s, fields6, edges.erow,
                                     edges.ecol, grid,
                                     Pred6DRefine(float(ell6d) ** 2))
        tag = pfof3_s > 0
        ntag = int(jax.device_get(jnp.sum(tag)))
        tpad = 1024
        while tpad < max(ntag, 1):
            tpad *= 2
        if 0 < ntag < n // 2:
            # sorted-index -> subset-index map; remap the masked edges
            inv = jnp.where(tag, jnp.cumsum(tag) - 1, 0).astype(jnp.int32)
            sub_idx, svalid, _ = segments.compact_mask(tag, tpad)
            erow6 = jnp.where(mask6, inv[edges.erow], 0)
            ecol6 = jnp.where(mask6, inv[edges.ecol], 0)
            labels6_t = fof.fof_labels_from_edges(
                erow6, ecol6, tpad, undirected=edges.undirected)
            orig_t = jnp.where(svalid, edges.order[
                jnp.where(svalid, sub_idx, 0)], n)
            pfof6_t, ng6 = fof.renumber_by_size(
                jnp.where(svalid, labels6_t, jnp.arange(tpad)), minsize,
                orig_index=orig_t)
            scatter_to = jnp.where(
                svalid, edges.order[jnp.where(svalid, sub_idx, 0)], n)
            pfof6 = jnp.zeros(n, jnp.int32).at[scatter_to].set(
                pfof6_t, mode="drop")
        else:
            erow6 = jnp.where(mask6, edges.erow, 0)
            ecol6 = jnp.where(mask6, edges.ecol, 0)
            labels6 = fof.fof_labels_from_edges(erow6, ecol6, n,
                                                undirected=edges.undirected)
            pfof6_s, ng6 = fof.renumber_by_size(labels6, minsize,
                                                orig_index=edges.order)
            pfof6 = jnp.zeros(n, jnp.int32).at[edges.order].set(pfof6_s)
    else:
        spos = pos / ell6d
        svel = vel / jnp.sqrt(vs_per_particle)[:, None]
        sbox = boxsize / ell6d if boxsize else None
        pfof6, ng6 = fof.fof3d(
            spos, 1.0, boxsize=sbox, min_size=minsize, vel=svel,
            extra_fields={"group": pfof3}, predicate=_pred_unit6d_samegroup)
    ng6 = int(jax.device_get(ng6))
    return _finish_6d(opt, pfof3, ng3, pfof6, ng6, vs_per_particle, minsize)


def search_full_set_sharded(opt: C.Options, pos, vel, mass, boxsize: float,
                            mesh) -> FieldSearchResult:
    """Field halo search over a device mesh (the integrated sharded analog
    of ``search_full_set``): SlabPlan slab decomposition + ppermute ghost
    exchange for the 3DFOF and 6DFOF label fixed points
    (parallel/distributed_fof.py), with per-group velocity scales reduced
    across the mesh (the analog of the reference's MPI_Allreduce over
    group bulk quantities, search.cxx:443-499).

    Matches ``search_full_set`` semantics: same criteria, same
    renumber-by-size group ids, same iKeepFOF envelope handling.
    """
    from ..parallel.distributed_fof import (SlabPlan, distributed_fof3d,
                                            _velocity_scales_sharded)
    from ..utils.transfer import fetch_small

    pos = jnp.asarray(pos)          # device-resident across all stages
    vel = jnp.asarray(vel)
    mass = jnp.asarray(mass)
    minsize = opt.HaloMinSize if opt.HaloMinSize > 0 else opt.MinSize
    b3d = opt.ellphys * opt.ellxscale * opt.ellhalophysfac
    run6d = opt.fofbgtype in (C.FOF6D, C.FOF6DADAPTIVE)
    # one plan serves both passes: cells must span the larger reach
    reach = b3d * max(1.0, opt.ellhalo6dxfac if run6d else 1.0)
    plan = SlabPlan(pos, reach, float(boxsize), mesh)
    pfof3, ng3 = distributed_fof3d(pos, b3d, float(boxsize), mesh,
                                   min_size=minsize, plan=plan)
    if not (run6d and ng3 > 0):
        return FieldSearchResult(pfof=pfof3, ngroups=ng3)

    if (opt.fofbgtype == C.FOF6D and not opt.iKeepFOF
            and opt.iVscaleReferenceBugCompat):
        # the stray-statement accumulation depends on one specific particle
        # (search.cxx:450) — no meaningful sharded reduction exists, so the
        # single-device formula runs replicated
        vscale2 = velocity_scale_largest_group(
            vel, mass, pfof3, ng3 + 1,
            opt.ellhalo6dvfac, bug_compat=True)
        vs_pp = jnp.where(pfof3 > 0, vscale2.astype(jnp.float32), 1.0)
    else:
        sig2 = _velocity_scales_sharded(plan, vel, mass, pfof3, ng3)
        fac2 = opt.ellhalo6dvfac ** 2
        if opt.fofbgtype == C.FOF6D and not opt.iKeepFOF:
            # single scale from the largest group (group 1 after the size
            # renumber, matching velocity_scale_largest_group)
            vs_pp = jnp.where(pfof3 > 0,
                              jnp.maximum(sig2[1] * fac2, 1e-30), 1.0)
        else:  # FOF6DADAPTIVE / iKeepFOF: per-group scales
            vs_pp = jnp.where(
                pfof3 > 0,
                jnp.maximum(sig2[jnp.clip(pfof3, 0, ng3)] * fac2, 1e-30),
                1.0)
    vs_pp = vs_pp.astype(jnp.float32)

    pfof6, ng6 = distributed_fof3d(
        pos, b3d * opt.ellhalo6dxfac, float(boxsize), mesh,
        min_size=minsize, vel=vel, vscale2=vs_pp, group=pfof3,
        plan=plan)
    return _finish_6d(opt, pfof3, ng3, pfof6, ng6, vs_pp, minsize)


def _finish_6d(opt: C.Options, pfof3, ng3: int, pfof6, ng6: int,
               vs_per_particle, minsize: int) -> FieldSearchResult:
    if opt.iKeepFOF:
        # keep 3DFOF envelopes as parents of the 6DFOF structures
        # (reference search.cxx:582-655): an envelope survives when it has
        # at least one particle outside every 6D group; its final members
        # are exactly those particles.
        p3 = np.asarray(jax.device_get(pfof3))
        p6 = np.asarray(jax.device_get(pfof6))
        in6 = p6 > 0
        has_free = np.zeros(ng3 + 1, bool)
        free = (~in6) & (p3 > 0)
        has_free[p3[free]] = True
        remap3 = np.zeros(ng3 + 1, np.int64)
        remap3[1:][has_free[1:]] = np.arange(1, int(has_free[1:].sum()) + 1)
        num3dfof = int(has_free[1:].sum())
        pfof_out = np.where(in6, num3dfof + p6, remap3[p3]).astype(np.int32)
        # envelope of each 6D group: its members' common 3D group
        parent3d = np.zeros(num3dfof + ng6 + 1, np.int64)
        if ng6 > 0:
            first6 = np.zeros(ng6 + 1, np.int64)
            np.maximum.at(first6, p6[in6], remap3[p3[in6]])
            parent3d[num3dfof + 1:] = first6[1:]
        return FieldSearchResult(
            pfof=jnp.asarray(pfof_out), ngroups=num3dfof + ng6,
            pfof3d=pfof3, ngroups3d=ng3, vscale2=vs_per_particle,
            num3dfof=num3dfof, parent3d=parent3d)

    return FieldSearchResult(pfof=pfof6, ngroups=ng6, pfof3d=pfof3,
                             ngroups3d=ng3, vscale2=vs_per_particle)
