"""End-to-end structure-finding pipeline.

TPU-native equivalent of the reference driver sequence in
/root/reference/src/main.cxx:20-544: config/cosmology setup, field halo
search (``SearchFullSet``), unbinding (``CheckUnboundGroups``), property
calculation (``GetCM``/``GetProperties``/``SortAccordingtoBindingEnergy``).
Substructure search (``SearchSubSub``) and baryon assignment
(``SearchBaryons``) plug in as additional stages (models/substructure.py).

Host code orchestrates only static decisions (grid geometry, capacity
classes, group-count padding); all per-particle work is jitted.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import config as C
from ..utils import units
from ..utils.transfer import fetch_bulk, fetch_small
from . import halos, properties as props_mod, unbind as unbind_mod


def _pad_pow2(n: int, lo: int = 16) -> int:
    k = lo
    while k < n:
        k *= 2
    return k


@dataclass
class CatalogResult:
    pfof: np.ndarray           # final group id per particle (original order)
    ngroups: int
    props: Dict[str, np.ndarray]
    W: Optional[np.ndarray] = None       # potential energies
    pfof3d: Optional[np.ndarray] = None  # parent 3DFOF ids when 6D ran
    timings: Dict[str, float] = field(default_factory=dict)
    # substructure outputs (filled when iSubSearch)
    hostid: Optional[np.ndarray] = None  # top host per group (-1 = field)
    parent: Optional[np.ndarray] = None  # direct parent gid (0 = field)
    hierarchy_level: Optional[np.ndarray] = None
    # SO particle lists (filled when iSphericalOverdensityPartList):
    # CSR over groups 1..ngroups of original particle indices in SO spheres
    so_offsets: Optional[np.ndarray] = None
    so_indices: Optional[np.ndarray] = None
    # explicit structure types (iKeepFOF: FOF3DTYPE envelopes), else derived
    stype: Optional[np.ndarray] = None


def _map_gids(gid_map: np.ndarray, ids, absent):
    """Vectorised old->new gid lookup: ids outside (0, len(gid_map)) map to
    ``absent`` (genesis-scale boxes carry 10^6+ groups, so every per-group
    epilogue here must be a numpy scatter/gather, not a Python loop)."""
    ids = np.asarray(ids)
    ok = (ids > 0) & (ids < len(gid_map))
    return np.where(ok, gid_map[np.clip(ids, 0, len(gid_map) - 1)], absent)


def _remap_hierarchy(gid_map: np.ndarray, ng_new: int, hostid, parent,
                     level):
    """Re-index per-group hierarchy arrays through an old->new gid map
    (used after a renumbering unbind pass dissolves/reorders groups)."""
    gid_map = np.asarray(gid_map)
    new_host = np.full(ng_new + 1, -1, np.int64)
    new_parent = np.zeros(ng_new + 1, np.int64)
    new_level = np.zeros(ng_new + 1, np.int32)
    old = np.arange(1, len(parent))
    newg = _map_gids(gid_map, old, 0)
    keep = (newg > 0) & (newg <= ng_new)
    old, newg = old[keep], newg[keep]
    new_parent[newg] = _map_gids(gid_map, parent[old], 0)
    if hostid is not None:
        new_host[newg] = _map_gids(gid_map, hostid[old], -1)
    if level is not None:
        new_level[newg] = level[old]
    return new_host, new_parent, new_level


def _check_unbound(opt: C.Options, mesh, spos, svel, smass, pfof,
                   ngpad: int, minsize: int, boxsize):
    """Unbind dispatch: the mesh-sharded whole-groups-per-device path
    (parallel/distributed_unbind.py, the analog of MPIGroupExchange +
    per-rank CheckUnboundGroups) when a mesh is given, else the
    single-device path.  Both share _finalize_unbind semantics."""
    if mesh is not None:
        from ..parallel.distributed_unbind import distributed_unbind

        return distributed_unbind(
            spos, svel, smass, pfof, ngpad, opt.uinfo, opt.G,
            mesh, boxsize=boxsize, min_size=minsize)
    return unbind_mod.check_unbound_groups(
        spos, svel, smass, pfof, ngpad, opt.uinfo, opt.G,
        boxsize=boxsize, min_size=minsize)


def find_structures(opt: C.Options, pos, vel, mass,
                    boxsize: Optional[float] = None,
                    ptype=None, extras: Optional[Dict] = None,
                    mesh=None) -> CatalogResult:
    """Run field search [+ unbinding] [+ substructure] [+ baryons]
    [+ properties]; the ``main()`` path (reference main.cxx:20-544).

    With ``ptype`` given and ``Baryon_searchflag>0``, the structure search
    runs on the dark matter subset and gas/star/BH particles are then
    associated in phase space and included in a combined unbinding pass
    (reference SearchBaryons, search.cxx:3053; main.cxx:397).

    With ``mesh`` (a jax.sharding.Mesh), the pipeline runs SHARDED — the
    integrated analog of the reference's MPI ``main()`` path
    (main.cxx:33-540 + mpiroutines.cxx): slab-decomposed FOF/6DFOF with
    ppermute ghost exchange, mesh-reduced velocity scales, whole-groups-
    per-device unbinding, structure-batch-sharded recursion, and psum'd SO
    histograms.  Catalogs match the single-device run (the property stage
    runs on the group-compacted subset, which is group-local work).
    """
    timings: Dict[str, float] = {}
    units.calc_cosmo_params(opt, opt.a)

    pos = jnp.asarray(pos)
    vel = jnp.asarray(vel)
    mass = jnp.asarray(mass)
    ptype_np = None if ptype is None else np.asarray(ptype)
    baryon_mode = (ptype_np is not None and opt.iBaryonSearch > 0
                   and bool((ptype_np != C.DARKTYPE).any())
                   and bool((ptype_np == C.DARKTYPE).any()))
    if baryon_mode:
        dmi = np.where(ptype_np == C.DARKTYPE)[0]
        bi = np.where(ptype_np != C.DARKTYPE)[0]
        spos, svel, smass = pos[dmi], vel[dmi], mass[dmi]
    else:
        spos, svel, smass = pos, vel, mass

    t0 = time.time()
    if opt.iSingleHalo:
        # Singlehalo_search (reference main.cxx:285, ui.cxx semantics):
        # the input IS one halo — skip the field search entirely and feed
        # the whole set as group 1 to the substructure machinery
        if opt.iScaleLengths:
            # rescale ellxscale/ellvscale from the halo's bulk properties
            # (reference ScaleLinkingLengths, main.cxx:333)
            from . import haloprops

            haloprops.scale_linking_lengths(
                opt, np.asarray(spos), np.asarray(svel), np.asarray(smass))
        pfof = jnp.ones(spos.shape[0], jnp.int32)
        ng = 1
        pfof3d_np = None
        num3dfof_host, parent3d_host = 0, None
    else:
        if mesh is not None and boxsize:
            fres = halos.search_full_set_sharded(opt, spos, svel, smass,
                                                 boxsize, mesh)
        else:
            fres = halos.search_full_set(opt, spos, svel, smass,
                                         boxsize=boxsize)
        pfof, ng = fres.pfof, fres.ngroups
        jax.block_until_ready(pfof)
    timings["fof"] = time.time() - t0
    if not opt.iSingleHalo:
        # free the field-search device intermediates before the
        # memory-heavy stages (at 256^3 every extra live (N,)/(N,3) buffer
        # counts toward the per-program HBM budget); only host copies are
        # needed downstream.  The copy sits OUTSIDE the timed fof phase:
        # pfof3d is a catalog-output payload (CatalogResult.pfof3d), not
        # an input to any metric stage, and through the axon tunnel the
        # host copy costs ~1.3 s at 256^3 that no real deployment pays
        # inside the search.
        pfof3d_np = None if fres.pfof3d is None else \
            np.asarray(fetch_bulk(fres.pfof3d, "pfof3d"))
        num3dfof_host, parent3d_host = fres.num3dfof, fres.parent3d
        fres = None

    # iKeepFOF: split off the 3DFOF envelopes — the halo pipeline
    # (unbinding / substructure) runs on the 6DFOF structures only and the
    # envelopes are re-attached before properties (reference
    # search.cxx:582-655, envelopes are never unbound)
    keepfof = num3dfof_host
    env_pfof = None
    if keepfof > 0:
        p_np = np.asarray(jax.device_get(pfof))
        env_pfof = np.where(p_np <= keepfof, p_np, 0).astype(np.int32)
        pfof = jnp.asarray(
            np.where(p_np > keepfof, p_np - keepfof, 0).astype(np.int32))
        ng = ng - keepfof

    # keep pre-unbinding FOF labels for inclusive halo masses
    # (reference GetInclusiveMasses, substructureproperties.cxx:1946)
    pfof_fof, ng_fof = (pfof, ng) if opt.iInclusiveHalo in (1, 2) else (None, 0)
    gid_map = None

    W = None
    # Bound_halos gates the FIELD-halo unbind (reference search.cxx:702:
    # substructure candidates are always unbound individually inside the
    # recursion; the halos themselves only when iBoundHalos >= 1)
    if opt.uinfo.unbindflag and ng > 0 and opt.iBoundHalos >= 1:
        t0 = time.time()
        minsize = opt.HaloMinSize if opt.HaloMinSize > 0 else opt.MinSize
        ures = _check_unbound(opt, mesh, spos, svel, smass, pfof,
                              _pad_pow2(ng), minsize, boxsize)
        pfof, ng, W = ures.pfof, ures.ngroups, ures.W
        gid_map = ures.gid_map
        jax.block_until_ready(pfof)
        timings["unbind"] = time.time() - t0

    hostid = parent = level = None
    if opt.iSubSearch and ng > 0:
        t0 = time.time()
        from . import substructure as sub_mod

        pfof, ng, hostid, parent, level = sub_mod.search_sub_sub(
            opt, spos, svel, smass, pfof, ng, boxsize=boxsize,
            mesh=mesh)
        pfof = jnp.asarray(pfof)
        timings["substructure"] = time.time() - t0

        # Bound_halos=2: re-check field-halo self-boundness AFTER the
        # substructures (cores) have been carved out (reference
        # search.cxx:2841 — "with all the cores removed, the FOF halo is
        # actually an unbound structure"); skipped in baryon mode, which
        # runs its own combined re-unbind (reference gates !iBaryonSearch)
        if (opt.iBoundHalos > 1 and opt.uinfo.unbindflag and ng > 0
                and not baryon_mode):
            pfof_np_ = np.asarray(jax.device_get(pfof))
            is_halo_g = parent[:ng + 1] == 0
            halo_of_p = (pfof_np_ > 0) & is_halo_g[pfof_np_]
            pfof_h = np.where(halo_of_p, pfof_np_, 0).astype(np.int32)
            minsize = opt.HaloMinSize if opt.HaloMinSize > 0 \
                else opt.MinSize
            ures = _check_unbound(opt, mesh, spos, svel, smass,
                                  jnp.asarray(pfof_h), _pad_pow2(ng),
                                  minsize, boxsize)
            gm_h = np.asarray(jax.device_get(ures.gid_map))[:ng + 1]
            ng_h = ures.ngroups
            # combined old->new id map: surviving halos 1..ng_h, then the
            # substructures in their existing order
            remap = np.zeros(ng + 1, np.int64)
            remap[is_halo_g] = gm_h[is_halo_g]
            sub_ids = np.nonzero(~is_halo_g[1:])[0] + 1
            remap[sub_ids] = ng_h + 1 + np.arange(len(sub_ids))
            pfof_new = np.where(
                halo_of_p, gm_h[pfof_np_] *
                np.asarray(jax.device_get(ures.bound), bool),
                remap[pfof_np_])
            pfof = jnp.asarray(pfof_new.astype(np.int32))
            ng_new = ng_h + len(sub_ids)
            new_parent = np.zeros(ng_new + 1, np.int64)
            new_host = np.full(ng_new + 1, -1, np.int64)
            new_level = np.zeros(ng_new + 1, np.int32)
            olds = np.arange(1, ng + 1)
            newg = remap[olds]
            keep = newg > 0
            olds, newg = olds[keep], newg[keep]
            new_parent[newg] = _map_gids(remap, parent[olds], 0)
            hv = _map_gids(remap, hostid[olds], 0)
            new_host[newg] = np.where(hv > 0, hv, -1)
            new_level[newg] = level[olds]
            hostid, parent, level = new_host, new_parent, new_level
            ng = ng_new
            if W is not None:
                # overlay the recomputed halo potentials
                W_h = np.asarray(jax.device_get(ures.W))
                W_np_ = np.asarray(jax.device_get(W))
                W = jnp.asarray(np.where(halo_of_p, W_h, W_np_))

    if baryon_mode:
        t0 = time.time()
        from . import baryons as baryons_mod

        grp_b = baryons_mod.search_baryons(
            opt, spos, svel, pfof, pos[bi], vel[bi], boxsize=boxsize,
            mesh=mesh)
        # splice DM + baryon labels into full-set order ON DEVICE (dmi/bi
        # are host-born ptype index lists, not device fetches)
        pfof = (jnp.zeros(pos.shape[0], jnp.int32)
                .at[jnp.asarray(dmi)].set(jnp.asarray(pfof, jnp.int32))
                .at[jnp.asarray(bi)].set(jnp.asarray(grp_b, jnp.int32)))
        if W is not None:
            # field-unbind potentials live on the DM subset; expand to the
            # full set (overwritten when the combined re-unbind runs, but
            # it is skipped when every group dissolved)
            W = jnp.zeros(pos.shape[0], jnp.asarray(W).dtype).at[
                jnp.asarray(dmi)].set(jnp.asarray(W))
        # combined unbinding with baryons attached (reference search.cxx:
        # 3500+: SearchBaryons re-runs CheckUnboundGroups on the full set)
        if opt.uinfo.unbindflag and ng > 0:
            ures = _check_unbound(opt, mesh, pos, vel, mass, pfof,
                                  _pad_pow2(ng), opt.MinSize, boxsize)
            pfof, W = ures.pfof, ures.W
            gm = np.asarray(ures.gid_map)
            if parent is not None:
                hostid, parent, level = _remap_hierarchy(
                    gm, ures.ngroups, hostid, parent, level)
            ng = ures.ngroups
            # the pre-unbind FOF labels for inclusive masses live on the DM
            # subset; map them onto the full set (baryons untagged there)
            if pfof_fof is not None:
                pfof_fof = jnp.zeros(pos.shape[0], jnp.int32).at[
                    jnp.asarray(dmi)].set(jnp.asarray(pfof_fof, jnp.int32))
            # compose old-FOF-gid -> final-gid through both renumber passes
            # (field halo ids pass unchanged through substructure splicing)
            if gid_map is not None:
                gm1 = np.asarray(gid_map)
                gid_map = jnp.asarray(gm[np.clip(gm1, 0, len(gm) - 1)])
            else:
                gid_map = ures.gid_map
        jax.block_until_ready(pfof)
        timings["baryons"] = time.time() - t0

    stype = None
    if keepfof > 0:
        # re-attach the 3DFOF envelopes: ids 1..keepfof, halos/substructure
        # shifted up; hierarchy gains envelope parents for top-level halos
        p_np = np.asarray(jax.device_get(pfof))
        pfof = jnp.asarray(np.where(p_np > 0, p_np + keepfof,
                                    env_pfof).astype(np.int32))
        # map old 6DFOF ids -> post-unbind halo ids to place parent3d
        gm = (np.asarray(gid_map) if gid_map is not None
              else np.arange(ng + 1))
        ng_final = keepfof + ng
        new_parent = np.zeros(ng_final + 1, np.int64)
        new_host = np.full(ng_final + 1, -1, np.int64)
        new_level = np.zeros(ng_final + 1, np.int32)
        gm = np.asarray(gm)
        old6 = np.arange(1, len(parent3d_host) - keepfof)
        newid = _map_gids(gm, old6, 0)
        sel6 = (newid > 0) & (newid <= ng)
        env = np.asarray(parent3d_host)[keepfof + old6[sel6]]
        dest = keepfof + newid[sel6]
        new_parent[dest] = env
        new_host[dest] = np.where(env > 0, env, -1)
        new_level[dest] = 1
        if parent is not None:
            g = np.arange(1, len(parent))
            hasp = g[parent[g] > 0]
            new_parent[keepfof + hasp] = keepfof + parent[hasp]
            new_level[keepfof + hasp] = level[hasp] + 1
            if hostid is not None:
                hash_ = g[hostid[g] > 0]
                new_host[keepfof + hash_] = keepfof + hostid[hash_]
        hostid, parent, level = new_host, new_parent, new_level
        ng = ng_final
        # structure types: envelopes FOF3DTYPE, the rest HALOSTYPE+10*level
        stype = np.full(ng + 1, C.HALOSTYPE, np.int32)
        stype[1:keepfof + 1] = C.FOF3DTYPE
        stype[keepfof + 1:] = C.HALOSTYPE + 10 * np.maximum(
            level[keepfof + 1:] - 1, 0)

    t0 = time.time()
    ngpad = _pad_pow2(max(ng, 1))
    # property stages run on the tagged subset: all their sorts / segment
    # reductions scale with the group population, not the box
    pfof_d = jnp.asarray(pfof)
    tag = pfof_d > 0
    ntag = int(fetch_small(jnp.sum(tag)))
    n_all = pfof_d.shape[0]
    if 0 < ntag < n_all // 2:
        from ..ops import segments as seg_ops
        tpad = _pad_pow2(max(ntag, 16), 1024)
        sub_idx, svalid, _ = seg_ops.compact_mask(tag, tpad)
        p_pos = jnp.asarray(pos)[sub_idx]
        p_vel = jnp.asarray(vel)[sub_idx]
        p_mass = jnp.where(svalid, jnp.asarray(mass)[sub_idx], 0.0)
        p_pfof = jnp.where(svalid, pfof_d[sub_idx], 0)
        p_W = None if W is None else jnp.asarray(W)[sub_idx]
        # the tagged-subset index map is fetched only when a host-side
        # per-particle payload (ptype / extras) must be sliced with it
        p_sub = (np.asarray(fetch_bulk(sub_idx, "tagged_subset_index"))
                 if (ptype_np is not None or extras) else None)
        p_ptype = None if ptype_np is None else ptype_np[p_sub]
    else:
        p_pos, p_vel = jnp.asarray(pos), jnp.asarray(vel)
        p_mass, p_pfof = jnp.asarray(mass), pfof_d
        p_W = None if W is None else jnp.asarray(W)
        p_ptype = ptype_np
        p_sub = None
    pertype = ptype_np is not None and len(np.unique(ptype_np)) > 1
    ex = extras or {}

    def _exf2(key):
        v = ex.get(key)
        if v is None:
            return None
        v = np.asarray(v)
        if p_sub is not None:
            v = v[p_sub]
        return jnp.asarray(v)

    ex_kw = {k: _exf2(k) for k in ("u", "sfr", "zmet", "tage", "bhmdot")}
    if mesh is not None and ng > 0:
        # whole-groups-per-device property stage: no device ever holds the
        # full tagged subset (the reference computes properties per rank
        # after MPIGroupExchange localises groups,
        # substructureproperties.cxx:266 + mpiroutines.cxx:2548)
        from ..parallel.distributed_props import distributed_properties

        pr = distributed_properties(
            opt, p_pos, p_vel, p_mass, p_pfof, ng, mesh,
            W=p_W, ptype=p_ptype, boxsize=boxsize, pertype=pertype,
            **ex_kw)
    else:
        pr = props_mod.property_bundle(
            opt, p_pos, p_vel, p_mass, p_pfof, ngpad,
            W=p_W,
            ptype=None if p_ptype is None else jnp.asarray(p_ptype),
            boxsize=boxsize, pertype=pertype, **ex_kw)
        jax.block_until_ready(pr["gmass"])
    timings["properties"] = time.time() - t0

    props_np = {k: np.asarray(v if isinstance(v, np.ndarray)
                              else fetch_small(v))[: ng + 1]
                for k, v in pr.items()}

    so_offsets = so_indices = None
    if opt.iInclusiveHalo > 0 and ng > 0:
        t0 = time.time()
        so_offsets, so_indices = _so_stage(
            opt, pos, vel, mass, props_np, ng, hostid, boxsize,
            pfof_fof=pfof_fof, ng_fof=ng_fof, gid_map=gid_map, W=W,
            pfof=pfof, mesh=mesh)
        timings["so"] = time.time() - t0

    # the ONE full-array gather of the mesh path: catalog payloads leave
    # the device only here (reference analog: particles stay on ranks
    # until the catalog write, mpiroutines.cxx:49-230)
    return CatalogResult(
        pfof=np.asarray(pfof if isinstance(pfof, np.ndarray)
                        else fetch_bulk(pfof, "catalog_pfof")),
        ngroups=ng, props=props_np,
        W=None if W is None else np.asarray(
            W if isinstance(W, np.ndarray) else fetch_bulk(W, "catalog_W")),
        pfof3d=pfof3d_np,
        timings=timings, hostid=hostid,
        hierarchy_level=level, parent=parent,
        so_offsets=so_offsets, so_indices=so_indices, stype=stype)


_SO_KEYS = ("gMvir", "gRvir", "gM200c", "gR200c", "gM200m", "gR200m",
            "gM500c", "gR500c", "gMBN98", "gRBN98")


def _so_stage(opt: C.Options, pos, vel, mass, props_np, ng: int,
              hostid, boxsize, *, pfof_fof=None, ng_fof=0, gid_map=None,
              W=None, pfof=None, mesh=None):
    """Inclusive / all-particle spherical-overdensity masses for field halos.

    ``Inclusive_halo_masses`` semantics (reference allvars.h:520 + main.cxx
    318/4323):
      1/2 -> SO masses from the halo's own pre-unbinding FOF particles
             (GetInclusiveMasses, substructureproperties.cxx:1946);
      3   -> SO masses from ALL particles within the search sphere
             (GetSOMasses, substructureproperties.cxx:2731).
    Member-only values are preserved as ``*_excl`` (reference
    Mass_200crit_excl etc.).  Returns (so_offsets, so_indices) CSR particle
    lists when ``Spherical_overdensity_halo_particle_list_output`` is set.
    """
    import math as _math

    from ..ops import so as so_ops

    # exclusive copies before overwriting (np.asarray over device arrays is
    # read-only -> the working copy must be writable)
    for k in _SO_KEYS + ("SO_mass", "SO_radius"):
        if k in props_np:
            props_np[k + "_excl"] = props_np[k]
            props_np[k] = np.array(props_np[k])

    field_sel = np.arange(1, ng + 1)
    if hostid is not None:
        field_sel = field_sel[np.asarray(hostid[1:ng + 1]) == -1]
    if len(field_sel) == 0:
        return None, None

    so_offsets = so_indices = None
    lnthr = [
        _math.log(max(opt.virlevel * opt.rhobg, 1e-30)),
        _math.log(opt.rhocrit * 200.0),
        _math.log(opt.rhobg * 200.0),
        _math.log(opt.rhocrit * 500.0),
        _math.log(opt.virBN98 * opt.rhocrit),
    ] + [_math.log(opt.rhocrit * t) for t in opt.SOthresholds_values_crit]
    key_of = list(zip(_SO_KEYS[::2], _SO_KEYS[1::2]))  # (M,R) name pairs

    if opt.iInclusiveHalo == 3:
        gmass = props_np["gmass"][field_sel]
        gsize = props_np["gsize"][field_sel]
        num = props_np["num"][field_sel]
        centers = props_np["gcm"][field_sel]
        rsearch = so_ops.so_search_radii(
            gmass, gsize, min(lnthr) - _math.log(2.0),
            opt.SphericalOverdensitySeachFac)
        minsize = opt.HaloMinSize if opt.HaloMinSize > 0 else opt.MinSize
        minnum = np.maximum(
            (opt.SphericalOverdensityMinHaloFac * num + 1).astype(np.int32),
            int(minsize * opt.SphericalOverdensityMinHaloFac + 1))
        mmin = float(fetch_small(jnp.min(jnp.asarray(mass))))
        if mesh is not None:
            # psum'd per-(halo, radius-bin) histograms over the mesh (the
            # analog of the reference's halo-region import,
            # mpiroutines.cxx:1723-2165); same crossing semantics —
            # particle arrays stay device-resident, only (H,) metadata
            # crosses to the host
            from ..parallel.distributed_so import distributed_so_masses

            M, R = distributed_so_masses(
                pos, mass, centers, rsearch, lnthr,
                mesh, boxsize=boxsize, minnum=minnum,
                first_mass=np.full(len(field_sel), mmin))
        else:
            M, R = so_ops.so_masses_all_particles(
                pos, mass, centers, rsearch, lnthr, boxsize=boxsize,
                minnum=minnum, first_mass=np.full(len(field_sel), mmin))
        for i, (mk, rk) in enumerate(key_of):
            props_np[mk][field_sel] = M[:, i]
            props_np[rk][field_sel] = R[:, i]
        nso = len(opt.SOthresholds_values_crit)
        for i in range(nso):
            props_np["SO_mass"][field_sel, i] = M[:, 5 + i]
            props_np["SO_radius"][field_sel, i] = R[:, 5 + i]
        if opt.iSphericalOverdensityPartList:
            rmax_fields = np.maximum(R.max(axis=1), 1e-10)
            offs_f, idx = so_ops.so_particle_list(pos, centers, rmax_fields,
                                                  boxsize=boxsize)
            # scatter the field-halo CSR into a full 1..ng CSR:
            # group g occupies so_indices[so_offsets[g-1]:so_offsets[g]]
            counts = np.zeros(ng + 1, np.int64)
            counts[field_sel] = np.diff(offs_f)
            so_offsets = np.concatenate([[0], np.cumsum(counts[1:])])
            # field_sel ascends and only its groups have particles, so the
            # group-ordered concatenation of per-halo segments IS idx
            so_indices = np.asarray(idx, np.int64)
    elif pfof_fof is not None and ng_fof > 0:
        # inclusive FOF masses: member-only SO on the pre-unbinding labels
        ngpad = _pad_pow2(max(ng_fof, 1))
        pr_fof = props_mod.compute_properties(
            jnp.asarray(pos), jnp.asarray(vel), jnp.asarray(mass),
            jnp.asarray(pfof_fof), ngpad, G=opt.G, boxsize=boxsize,
            rhocrit=opt.rhocrit, rhobg=opt.rhobg,
            virlevel=opt.virlevel if opt.virlevel > 0 else 200.0,
            virBN98=opt.virBN98,
            so_thresholds=tuple(opt.SOthresholds_values_crit),
            min_size=opt.MinSize, calc_shape=False)
        gm = np.asarray(gid_map)[:ng_fof + 1] if gid_map is not None \
            else np.arange(ng_fof + 1)
        # old fof gid -> final gid; keep only surviving field halos
        fieldmask = np.zeros(ng + 1, bool)
        fieldmask[field_sel] = True
        old = np.arange(1, ng_fof + 1)
        new = gm[1:ng_fof + 1]
        sel = (new > 0) & (new <= ng) & fieldmask[np.clip(new, 0, ng)]
        old, new = old[sel], new[sel]
        for k in _SO_KEYS:
            props_np[k][new] = np.asarray(pr_fof[k])[old]
        if "SO_mass" in props_np and props_np["SO_mass"].shape[-1] > 0:
            props_np["SO_mass"][new] = np.asarray(pr_fof["SO_mass"])[old]
            props_np["SO_radius"][new] = np.asarray(pr_fof["SO_radius"])[old]
    return so_offsets, so_indices
