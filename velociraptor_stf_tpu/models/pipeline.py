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


def find_structures(opt: C.Options, pos, vel, mass,
                    boxsize: Optional[float] = None) -> CatalogResult:
    """Run field search [+ unbinding] [+ properties]; the ``main()`` path."""
    timings: Dict[str, float] = {}
    units.calc_cosmo_params(opt, opt.a)

    t0 = time.time()
    fres = halos.search_full_set(opt, pos, vel, mass, boxsize=boxsize)
    pfof, ng = fres.pfof, fres.ngroups
    jax.block_until_ready(pfof)
    timings["fof"] = time.time() - t0

    W = None
    if opt.uinfo.unbindflag and ng > 0:
        t0 = time.time()
        minsize = opt.HaloMinSize if opt.HaloMinSize > 0 else opt.MinSize
        ures = unbind_mod.check_unbound_groups(
            pos, vel, mass, pfof, _pad_pow2(ng), opt.uinfo, opt.G,
            boxsize=boxsize, min_size=minsize)
        pfof, ng, W = ures.pfof, ures.ngroups, ures.W
        jax.block_until_ready(pfof)
        timings["unbind"] = time.time() - t0

    hostid = parent = level = None
    if opt.iSubSearch and ng > 0:
        t0 = time.time()
        from . import substructure as sub_mod

        pfof, ng, hostid, parent, level = sub_mod.search_sub_sub(
            opt, pos, vel, mass, np.asarray(pfof), ng, boxsize=boxsize)
        pfof = jnp.asarray(pfof)
        timings["substructure"] = time.time() - t0

    t0 = time.time()
    ngpad = _pad_pow2(max(ng, 1))
    pr = props_mod.compute_properties(
        jnp.asarray(pos), jnp.asarray(vel), jnp.asarray(mass),
        jnp.asarray(pfof), ngpad,
        G=opt.G, boxsize=boxsize,
        rhocrit=opt.rhocrit, rhobg=opt.rhobg,
        virlevel=opt.virlevel if opt.virlevel > 0 else 200.0,
        virBN98=opt.virBN98,
        so_thresholds=tuple(opt.SOthresholds_values_crit),
        min_size=opt.MinSize,
        iIterateCM=bool(opt.iIterateCM),
        cmfrac=opt.pinfo.cmfrac, cmadjustfac=opt.pinfo.cmadjustfac)
    # extended properties: apertures / profiles / RVmax / energies
    if opt.iaperturecalc or opt.iprofilecalc:
        to_int = 1.0 / opt.lengthtokpc if opt.lengthtokpc > 0 else 1.0
        aps = tuple(a * to_int for a in opt.aperture_values_kpc) \
            if opt.iaperturecalc else ()
        aps_proj = tuple(a * to_int for a in opt.aperture_proj_values_kpc) \
            if opt.iaperturecalc else ()
        edges = tuple(opt.profile_bin_edges) if opt.iprofilecalc else ()
        extra = props_mod.compute_aperture_properties(
            jnp.asarray(pos), jnp.asarray(vel), jnp.asarray(mass),
            jnp.asarray(pfof), ngpad, refpos=pr["gcm"], refvel=pr["gcmvel"],
            apertures=aps, apertures_proj=aps_proj, profile_edges=edges,
            iprofilenorm=opt.iprofilenorm, R200c=pr["gR200c"])
        pr.update(extra)
    if opt.iextrahalooutput:
        pr.update(props_mod.compute_rvmax_properties(
            jnp.asarray(pos), jnp.asarray(vel), jnp.asarray(mass),
            jnp.asarray(pfof), ngpad, refpos=pr["gcm"],
            refvel=pr["gcmvel"], rmax=pr["gRmaxvel"]))
    if W is not None:
        pr.update(props_mod.compute_energies(
            jnp.asarray(vel), jnp.asarray(mass), jnp.asarray(pfof),
            jnp.asarray(W), ngpad, pr["gcmvel"],
            jnp.asarray(opt.uinfo.Eratio, jnp.float32)))
    jax.block_until_ready(pr["gmass"])
    timings["properties"] = time.time() - t0

    props_np = {k: np.asarray(v)[: ng + 1] for k, v in pr.items()}
    return CatalogResult(
        pfof=np.asarray(pfof), ngroups=ng, props=props_np,
        W=None if W is None else np.asarray(W),
        pfof3d=None if fres.pfof3d is None else np.asarray(fres.pfof3d),
        timings=timings, hostid=hostid,
        hierarchy_level=level, parent=parent)
