"""Bulk (sub)structure properties via segment reductions.

TPU-native equivalent of the reference property pipeline
(/root/reference/src/substructureproperties.cxx): ``GetCM``:14 (bulk +
shrinking-sphere iterative centre), ``GetProperties``:266 (mass, size, Vmax,
velocity dispersion tensor, angular momentum, half-mass radii),
``CalculateSphericalOverdensity``:5203 (log-log interpolated overdensity
masses/radii with total-mass fallback, :5523), concentration root-find
(``mycNFW``:4449, ``GetConcentration``:3656) and shape tensors (:3163).

Everything that the reference computes with per-group OpenMP loops over
radius-heapsorted particles becomes, on TPU, one global
``lexsort((radius, group))`` + segmented cumulative sums + masked
first-crossing searches — a handful of fused passes over the particle axis
independent of the group-size distribution.

Group arrays are indexed by group id (row 0 = untagged; rows beyond the real
group count are zero-padded so the static shape can be rounded up).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import segments as seg

PROPCMMINNUM = 10  # reference allvars.h:253


def _first_crossing(cond: jnp.ndarray, g_s: jnp.ndarray, ng1: int,
                    n: int) -> jnp.ndarray:
    """Per group: smallest sorted index where cond holds, else n."""
    idx = jnp.where(cond, jnp.arange(n, dtype=jnp.int32), n)
    return seg.segment_min(idx, g_s, ng1)


def compute_properties(pos, vel, mass, pfof, num_groups, **kw):
    """Two-dispatch wrapper: geometry (CM/sort/SO/Vmax/half-mass) then
    kinematics (dispersion/J/Krot/shape/cNFW).  One fused program at
    256^3 scale holds both phases' transients live simultaneously and
    exceeds HBM; splitting halves the peak."""
    props, ref, vref, posu, gsize = _props_geom(pos, vel, mass, pfof,
                                                num_groups, **kw)
    calc_shape = kw.get("calc_shape", True)
    G = kw.get("G", 43.0211349)
    return _props_kin(posu, vel, mass, pfof, num_groups,
                      props, ref, vref, gsize, G=G, calc_shape=calc_shape)


@partial(jax.jit, static_argnames=(
    "num_groups", "so_thresholds", "iIterateCM", "boxsize", "min_size",
    "so_minhalofac", "cmfrac", "cmadjustfac", "calc_shape"))
def _props_geom(
    pos: jnp.ndarray,
    vel: jnp.ndarray,
    mass: jnp.ndarray,
    pfof: jnp.ndarray,
    num_groups: int,
    *,
    G: float = 43.0211349,
    boxsize: Optional[float] = None,
    rhocrit: float = 1.0,
    rhobg: float = 1.0,
    virlevel: float = 200.0,
    virBN98: float = 97.0,
    so_thresholds: Tuple[float, ...] = (),
    min_size: int = 20,
    so_minhalofac: float = 0.05,
    iIterateCM: bool = False,
    cmfrac: float = 0.1,
    cmadjustfac: float = 0.7,
    calc_shape: bool = True,
    refpos: Optional[jnp.ndarray] = None,
    refvel: Optional[jnp.ndarray] = None,
) -> Dict[str, jnp.ndarray]:
    """Compute bulk properties for groups 1..num_groups.

    Returns dict of (num_groups+1, ...) arrays keyed by reference
    ``PropData`` field names (gcm, gcmvel, gmass, gsize, gMvir, gRvir,
    gM200c, gR200c, gM200m, gR200m, gM500c, gR500c, gMBN98, gRBN98,
    gmaxvel, gRmaxvel, gMmaxvel, gRhalfmass, gveldisp, gsigma_v, gJ, gq,
    gs, geigvec, cNFW, Ekin, Krot, SO_mass, SO_radius, num).
    """
    n = pos.shape[0]
    ng1 = num_groups + 1
    m = mass if mass.ndim == 1 else jnp.full((n,), mass)

    if boxsize:
        pos = seg.unwrap_positions(pos, pfof, boxsize, num_groups)

    num = seg.group_sizes(pfof, num_groups)
    gmass = seg.segment_sum(m, pfof, ng1)
    gcm = seg.segment_mean(pos, m, pfof, ng1)
    gcmvel = seg.segment_mean(vel, m, pfof, ng1)

    # --- iterative shrinking-sphere CM (reference GetCM:60-116) -----------
    r2_all = jnp.sum((pos - seg.gather_rows(gcm, pfof)) ** 2, axis=-1)
    gsize2 = seg.segment_max(jnp.where(pfof > 0, r2_all, 0.0), pfof, ng1)
    if iIterateCM:
        fac2 = cmadjustfac ** 2

        def cond_fn(state):
            _, _, _, active = state
            return jnp.any(active)

        def body_fn(state):
            cmold, ri2, rcmv2, active = state
            ri2 = ri2 * fac2
            d2 = jnp.sum((pos - seg.gather_rows(cmold, pfof)) ** 2, axis=-1)
            inside = (d2 <= ri2[pfof]) & (pfof > 0) & active[pfof]
            w = jnp.where(inside, m, 0.0)
            enc = seg.segment_sum(w, pfof, ng1)
            nin = seg.segment_sum(inside.astype(jnp.int32), pfof, ng1)
            cmnew = seg.segment_sum(pos * w[:, None], pfof, ng1) / \
                jnp.maximum(enc, 1e-30)[:, None]
            ok = (nin >= jnp.maximum(cmfrac * num, PROPCMMINNUM)) & active
            cmold = jnp.where(ok[:, None], cmnew, cmold)
            rcmv2 = jnp.where(ok, ri2, rcmv2)
            return cmold, ri2, rcmv2, ok

        active0 = (num * cmadjustfac >= PROPCMMINNUM) & \
            (jnp.arange(ng1) > 0)
        gcm, _, rcmv2, _ = jax.lax.while_loop(
            cond_fn, body_fn, (gcm, gsize2, gsize2, active0))
        # cm velocity from particles inside the final sphere
        d2 = jnp.sum((pos - seg.gather_rows(gcm, pfof)) ** 2, axis=-1)
        inside = (d2 <= rcmv2[pfof]) & (pfof > 0)
        w = jnp.where(inside, m, 0.0)
        enc = jnp.maximum(seg.segment_sum(w, pfof, ng1), 1e-30)
        gcmvel_it = seg.segment_sum(vel * w[:, None], pfof, ng1) / enc[:, None]
        it_ok = (num * cmadjustfac >= PROPCMMINNUM)
        gcmvel = jnp.where(it_ok[:, None], gcmvel_it, gcmvel)

    ref = refpos if refpos is not None else gcm
    vref = refvel if refvel is not None else gcmvel

    # --- radius sort + segmented cumulative mass --------------------------
    dx = pos - seg.gather_rows(ref, pfof)
    r2 = jnp.sum(dx * dx, axis=-1)
    perm = jnp.lexsort((r2, pfof)).astype(jnp.int32)
    g_s = pfof[perm]
    r_s = jnp.sqrt(jnp.maximum(r2[perm], 1e-30))
    m_s = m[perm]
    offsets = seg.group_offsets(g_s, num_groups)
    rank = seg.segment_rank(g_s, offsets)
    Mcum = seg.segment_cumsum(m_s, g_s, offsets)

    gsize = seg.segment_max(jnp.where(g_s > 0, r_s, 0.0), g_s, ng1)
    num_f = num.astype(pos.dtype)

    # --- spherical overdensity masses (reference :5203) -------------------
    fac = jnp.log(3.0 / (4.0 * math.pi))
    lnrho = jnp.log(jnp.maximum(Mcum, 1e-30)) - 3.0 * jnp.log(r_s) + fac
    minnum = jnp.maximum((so_minhalofac * num_f + 1).astype(jnp.int32),
                         int(min_size * so_minhalofac + 1))
    def _lnthr(x):
        return jnp.log(jnp.maximum(jnp.asarray(x, pos.dtype), 1e-30))

    thresholds = [
        ("Mvir", "Rvir", _lnthr(virlevel * rhobg)),
        ("M200c", "R200c", _lnthr(rhocrit * 200.0)),
        ("M200m", "R200m", _lnthr(rhobg * 200.0)),
        ("M500c", "R500c", _lnthr(rhocrit * 500.0)),
        ("MBN98", "RBN98", _lnthr(virBN98 * rhocrit)),
    ] + [(f"SO{i}", f"SOr{i}", _lnthr(rhocrit * t))
         for i, t in enumerate(so_thresholds)]

    props: Dict[str, jnp.ndarray] = {}
    first_mass = jnp.full(ng1, jnp.inf, m.dtype).at[g_s].min(
        jnp.where(rank == 0, m_s, jnp.inf), mode="drop")
    so_out = {}
    for mname, rname, thr in thresholds:
        cond = (lnrho < thr) & (rank >= minnum[g_s]) & (g_s > 0)
        k = _first_crossing(cond, g_s, ng1, n)
        found = k < n
        kc = jnp.minimum(k, n - 1)
        # previous sample in the same group (or same index at group start)
        kp = jnp.maximum(kc - 1, offsets[g_s[kc]])
        rho_k, rho_p = lnrho[kc], lnrho[kp]
        drho = rho_k - rho_p
        safe = jnp.abs(drho) > 1e-12
        gamma1 = jnp.where(safe, jnp.log(r_s[kc] / r_s[kp]) / drho, 0.0)
        gamma2 = jnp.where(safe, jnp.log(Mcum[kc] / Mcum[kp]) / drho, 0.0)
        delta = thr - rho_k
        Rso = r_s[kc] * jnp.exp(gamma1 * delta)
        Mso = Mcum[kc] * jnp.exp(gamma2 * delta)
        Rso = jnp.where(found, Rso, gsize)
        Mso = jnp.where(found, Mso, gmass)
        # zero out when below a single particle mass (reference :5305)
        bad = Mso < first_mass
        so_out[mname] = jnp.where(bad, 0.0, Mso)
        so_out[rname] = jnp.where(bad, 0.0, Rso)
    for k_, v in so_out.items():
        if k_.startswith("SO"):
            continue
        props["g" + k_] = v
    props["SO_mass"] = jnp.stack(
        [so_out[f"SO{i}"] for i in range(len(so_thresholds))], axis=-1) \
        if so_thresholds else jnp.zeros((ng1, 0), pos.dtype)
    props["SO_radius"] = jnp.stack(
        [so_out[f"SOr{i}"] for i in range(len(so_thresholds))], axis=-1) \
        if so_thresholds else jnp.zeros((ng1, 0), pos.dtype)

    # --- Vmax / Rmax / half-mass (reference :370-420) ---------------------
    vc2 = G * Mcum / r_s
    eligible = (Mcum >= gmass[g_s] / jnp.sqrt(jnp.maximum(num_f[g_s], 1.0))) \
        & (g_s > 0)
    vc2m = jnp.where(eligible, vc2, -jnp.inf)
    gvmax2 = seg.segment_max(vc2m, g_s, ng1)
    kmax = _first_crossing(vc2m == gvmax2[g_s], g_s, ng1, n)
    kmaxc = jnp.minimum(kmax, n - 1)
    props["gmaxvel"] = jnp.sqrt(jnp.maximum(gvmax2, 0.0))
    props["gRmaxvel"] = jnp.where(kmax < n, r_s[kmaxc], 0.0)
    props["gMmaxvel"] = jnp.where(kmax < n, Mcum[kmaxc], 0.0)

    khalf = _first_crossing((Mcum > 0.5 * gmass[g_s]) & (g_s > 0),
                            g_s, ng1, n)
    khc = jnp.minimum(khalf, n - 1)
    props["gRhalfmass"] = jnp.where(khalf < n, r_s[khc], 0.0)
    # mass within 2 x Rhalfmass (see docstring note)
    k2h = _first_crossing(
        (r_s > 2.0 * props["gRhalfmass"][g_s]) & (g_s > 0), g_s, ng1, n)
    k2c = jnp.minimum(jnp.maximum(k2h - 1, 0), n - 1)
    props["gMassTwiceRhalfmass"] = jnp.where(k2h < n, Mcum[k2c], gmass)

    props["num"] = num
    props["gmass"] = gmass
    props["gcm"] = gcm
    props["gcmvel"] = gcmvel
    return props, ref, vref, pos, gsize


@partial(jax.jit, static_argnames=("num_groups", "G", "calc_shape"))
def _props_kin(pos, vel, mass, pfof, num_groups: int, props, ref, vref,
               gsize, *, G: float, calc_shape: bool = True):
    """Kinematics / shape / concentration phase on unwrapped positions."""
    n = pos.shape[0]
    ng1 = num_groups + 1
    m = mass if mass.ndim == 1 else jnp.full((n,), mass)
    props = dict(props)
    num = props["num"]
    gmass = props["gmass"]
    gcm = props["gcm"]
    gcmvel = props["gcmvel"]
    dx = pos - seg.gather_rows(ref, pfof)
    r2 = jnp.sum(dx * dx, axis=-1)
    dv = vel - seg.gather_rows(vref, pfof)
    w = m
    gveldisp = seg.segment_outer(dv, dv, jnp.where(pfof > 0, w, 0.0),
                                 pfof, ng1)
    gveldisp = gveldisp / jnp.maximum(gmass, 1e-30)[:, None, None]
    props["gveldisp"] = gveldisp
    props["gsigma_v"] = jnp.power(
        jnp.maximum(jnp.linalg.det(gveldisp), 1e-30), 1.0 / 6.0)
    J = jnp.cross(dx, dv) * w[:, None]
    props["gJ"] = seg.segment_sum(
        jnp.where((pfof > 0)[:, None], J, 0.0), pfof, ng1)
    props["Ekin"] = 0.5 * seg.segment_sum(
        jnp.where(pfof > 0, w * jnp.sum(dv * dv, -1), 0.0), pfof, ng1)

    # rotational support: Krot = sum 0.5 m (j_z/R)^2 about gJ axis (ref :430)
    jhat = props["gJ"] / jnp.maximum(
        jnp.linalg.norm(props["gJ"], axis=-1, keepdims=True), 1e-30)
    zdist = jnp.sum(dx * seg.gather_rows(jhat, pfof), axis=-1)
    Rdist2 = jnp.maximum(r2 - zdist ** 2, 1e-30)
    jz = jnp.sum(jnp.cross(dx, dv) * seg.gather_rows(jhat, pfof), axis=-1)
    krot_i = 0.5 * w * jz ** 2 / Rdist2
    props["Krot"] = seg.segment_sum(
        jnp.where(pfof > 0, krot_i, 0.0), pfof, ng1) / \
        jnp.maximum(props["Ekin"], 1e-30)

    # --- shape (one-shot mass distribution tensor eigenvalues) ------------
    if calc_shape:
        iten = seg.segment_outer(dx, dx, jnp.where(pfof > 0, w, 0.0),
                                 pfof, ng1) / \
            jnp.maximum(gmass, 1e-30)[:, None, None]
        evals, evecs = jnp.linalg.eigh(iten)  # ascending
        lam_a = jnp.maximum(evals[:, 2], 1e-30)
        props["gq"] = jnp.sqrt(evals[:, 1] / lam_a)
        props["gs"] = jnp.sqrt(jnp.maximum(evals[:, 0], 0.0) / lam_a)
        props["geigvec"] = evecs

    # --- NFW concentration (reference :3656, mycNFW Newton) ---------------
    R200c, M200c = props["gR200c"], props["gM200c"]
    vvir2 = G * M200c / jnp.maximum(R200c, 1e-30)
    VmaxVvir2 = props["gmaxvel"] ** 2 / jnp.maximum(vvir2, 1e-30)

    def nfw_f(c):
        return 0.216 * c / (jnp.log1p(c) - c / (1.0 + c))

    c = jnp.full(ng1, 10.0, pos.dtype)
    for _ in range(30):  # Newton on f(c) - VmaxVvir2 = 0
        conec = c / (1.0 + c)
        y = VmaxVvir2 - nfw_f(c)
        dy = 0.216 * conec * conec / jnp.maximum(c, 1e-6)
        c = jnp.clip(c + y / jnp.maximum(dy, 1e-12), 1.0, 1000.0)
    ratio_fallback = jnp.where(
        M200c > 0, R200c / jnp.maximum(props["gRmaxvel"], 1e-30),
        gsize / jnp.maximum(props["gRmaxvel"], 1e-30))
    use_newton = (VmaxVvir2 > 1.05) & (VmaxVvir2 <= 36.0)
    props["cNFW"] = jnp.where(R200c <= 0, -1.0,
                              jnp.where(use_newton, c, ratio_fallback))
    props["VmaxVvir2"] = VmaxVvir2

    props["gsize"] = gsize
    # zero out the untagged row
    for k_, v in props.items():
        props[k_] = v.at[0].set(jnp.zeros_like(v[0]))
    return props


@partial(jax.jit, static_argnames=("num_groups", "apertures",
                                   "apertures_proj", "profile_edges",
                                   "iprofilenorm"))
def compute_aperture_properties(
    pos, vel, mass, pfof, num_groups: int, *,
    refpos, refvel,
    apertures: Tuple[float, ...] = (),
    apertures_proj: Tuple[float, ...] = (),
    profile_edges: Tuple[float, ...] = (),
    iprofilenorm: int = 0,
    R200c=None,
) -> Dict[str, jnp.ndarray]:
    """Aperture masses/counts/dispersions, projected aperture masses and
    radial mass profiles.

    Reference: ``CalculateApertureQuantities``
    (/root/reference/src/substructureproperties.cxx:4539) and the radial-bin
    accumulation ``AddParticleToRadialBin`` (:941-951); aperture values are
    in internal length units (converted from kpc by the caller), profile
    bins are log10 radius normalised by R200c (``Radial_profile_norm=0``) or
    physical.
    """
    n = pos.shape[0]
    ng1 = num_groups + 1
    out: Dict[str, jnp.ndarray] = {}
    dx = pos - seg.gather_rows(refpos, pfof)
    dv = vel - seg.gather_rows(refvel, pfof)
    r2 = jnp.sum(dx * dx, -1)
    ing = pfof > 0

    # one shared radius sort serves every aperture's half-mass radius
    # (reference per-group loop at substructureproperties.cxx:4629+)
    if apertures:
        perm_r = jnp.lexsort((r2, pfof)).astype(jnp.int32)
        g_sr = pfof[perm_r]
        r_sr = jnp.sqrt(jnp.maximum(r2[perm_r], 1e-30))
        offs_r = seg.group_offsets(g_sr, num_groups)
        Mcum_r = seg.segment_cumsum(
            jnp.where(g_sr > 0, mass[perm_r], 0.0), g_sr, offs_r)

    for ai, a in enumerate(apertures):
        sel = ing & (r2 < a * a)
        w = jnp.where(sel, mass, 0.0)
        m_ap = seg.segment_sum(w, pfof, ng1)
        n_ap = seg.segment_sum(sel.astype(jnp.int32), pfof, ng1)
        vm = seg.segment_mean(vel, w, pfof, ng1)
        dv2 = jnp.sum((vel - seg.gather_rows(vm, pfof)) ** 2, -1)
        sig = jnp.sqrt(jnp.maximum(
            seg.segment_sum(jnp.where(sel, dv2 * mass, 0.0), pfof, ng1) /
            jnp.maximum(m_ap, 1e-30) / 3.0, 0.0))
        out[f"Aperture_mass_{ai}"] = m_ap
        out[f"Aperture_npart_{ai}"] = n_ap
        out[f"Aperture_veldisp_{ai}"] = sig
        # half-mass radius within the aperture: first sorted radius where
        # the cumulative mass crosses half the aperture mass (reference
        # aperture_rhalfmass, substructureproperties.cxx:4639)
        half = 0.5 * m_ap
        kh = _first_crossing(
            (Mcum_r >= half[g_sr]) & (g_sr > 0) & (r_sr < a), g_sr, ng1, n)
        khc = jnp.clip(kh, 0, n - 1)
        out[f"Aperture_rhalfmass_{ai}"] = jnp.where(kh < n, r_sr[khc], 0.0)

    # projected apertures over the 3 coordinate projections (reference
    # aperture_proj x/y/z)
    for ai, a in enumerate(apertures_proj):
        for pi, (i0, i1) in enumerate(((0, 1), (0, 2), (1, 2))):
            rp2 = dx[:, i0] ** 2 + dx[:, i1] ** 2
            sel = ing & (rp2 < a * a)
            m_ap = seg.segment_sum(jnp.where(sel, mass, 0.0), pfof, ng1)
            out[f"Projected_aperture_{ai}_mass_proj{pi}"] = m_ap

    if profile_edges:
        edges = jnp.asarray(profile_edges, pos.dtype)   # log10 bin edges
        r = jnp.sqrt(jnp.maximum(r2, 1e-30))
        if iprofilenorm == 0 and R200c is not None:
            rn = r / jnp.maximum(R200c[pfof], 1e-30)
        else:
            rn = r
        ib = jnp.searchsorted(edges, jnp.log10(jnp.maximum(rn, 1e-30))
                              ).astype(jnp.int32)
        nb = len(profile_edges) + 1
        flat = jnp.where(ing, pfof * nb + ib, ng1 * nb)
        prof = jnp.zeros(ng1 * nb + 1, pos.dtype).at[flat].add(mass)
        npart = jnp.zeros(ng1 * nb + 1, jnp.int32).at[flat].add(1)
        out["Mass_profile"] = prof[:ng1 * nb].reshape(ng1, nb)
        out["Npart_profile"] = npart[:ng1 * nb].reshape(ng1, nb)
    return out


@partial(jax.jit, static_argnames=("num_groups",))
def compute_rvmax_properties(pos, vel, mass, pfof, num_groups: int, *,
                             refpos, refvel, rmax) -> Dict[str, jnp.ndarray]:
    """Kinematics within R_Vmax (reference RVmax_* fields,
    substructureproperties.cxx:430-520): dispersion tensor, sigV, angular
    momentum, shape within the radius of maximum circular velocity."""
    n = pos.shape[0]
    ng1 = num_groups + 1
    dx = pos - seg.gather_rows(refpos, pfof)
    dv = vel - seg.gather_rows(refvel, pfof)
    r2 = jnp.sum(dx * dx, -1)
    sel = (pfof > 0) & (r2 < rmax[pfof] ** 2)
    w = jnp.where(sel, mass, 0.0)
    msum = jnp.maximum(seg.segment_sum(w, pfof, ng1), 1e-30)
    vd = seg.segment_outer(dv, dv, w, pfof, ng1) / msum[:, None, None]
    J = seg.segment_sum(jnp.cross(dx, dv) * w[:, None], pfof, ng1)
    iten = seg.segment_outer(dx, dx, w, pfof, ng1) / msum[:, None, None]
    evals, evecs = jnp.linalg.eigh(iten)
    lam = jnp.maximum(evals[:, 2], 1e-30)
    return {
        "RVmax_veldisp": vd,
        "RVmax_sigV": jnp.power(jnp.maximum(jnp.linalg.det(vd), 1e-30),
                                1.0 / 6.0),
        "RVmax_L": J,
        "RVmax_q": jnp.sqrt(evals[:, 1] / lam),
        "RVmax_s": jnp.sqrt(jnp.maximum(evals[:, 0], 0.0) / lam),
        "RVmax_eigvec": evecs,
        "RVmax_npart": seg.segment_sum(sel.astype(jnp.int32), pfof, ng1),
    }


GASTYPE, DARKTYPE, STARTYPE, BHTYPE = 0, 1, 4, 5


LOWRESTYPES = (2, 3)  # zoom low-res DM ("interloper", reference HIGHRES)


@partial(jax.jit, static_argnames=("num_groups", "types", "full",
                                   "r30", "r50", "zoomlowmassdm"))
def compute_pertype_properties(
    pos, vel, mass, ptype, pfof, num_groups: int, *,
    refpos, refvel,
    types: Tuple[Tuple[str, int], ...] = (("gas", GASTYPE),
                                          ("star", STARTYPE),
                                          ("bh", BHTYPE)),
    u=None, sfr=None, zmet=None, tage=None, bhmdot=None,
    rvmax=None, r200c=None, r200m=None, r500c=None, rBN98=None,
    r30: float = 0.0, r50: float = 0.0,
    zoomlowmassdm: float = 0.0,
    full: bool = True,
) -> Dict[str, jnp.ndarray]:
    """Per-particle-type bulk properties (gas/star/BH sub-properties).

    Reference: the GASON/STARON/BHON blocks of ``GetProperties``
    (/root/reference/src/substructureproperties.cxx:266+, fields
    ``PropData.n_gas/M_gas/.../L_200crit_gas/q_gas/Krot_star/...``,
    allvars.h:1322-1528).  All quantities are segment reductions keyed by
    (group, type); the half-mass radii reuse one global (group, radius)
    sort.  ``full``: also compute the velocity-dispersion tensor, shape
    (q/s/eigvec), Krot, 2x-half-mass masses, the fixed-aperture masses
    (``r30``/``r50`` = 30/50 kpc in internal units) and the SO-scoped
    masses / angular momenta (M_200crit_gas, L_200mean_star, ...) for
    whichever SO radii are provided.  The star-forming / non-star-forming
    gas split (gas_sf/gas_nsf, SFR > 0) and the zoom low-res "interloper"
    block are included when the relevant inputs exist.
    """
    n = pos.shape[0]
    ng1 = num_groups + 1
    dx = pos - seg.gather_rows(refpos, pfof)
    dv = vel - seg.gather_rows(refvel, pfof)
    r2 = jnp.sum(dx * dx, -1)
    perm = jnp.lexsort((r2, pfof)).astype(jnp.int32)
    g_s = pfof[perm]
    offsets = seg.group_offsets(g_s, num_groups)
    r_s = jnp.sqrt(jnp.maximum(r2[perm], 1e-30))
    m_s = mass[perm]

    # SO scopes available for M_<scope>_<type> / L_<scope>_<type>
    scopes = []
    for sname, rad in (("200crit", r200c), ("200mean", r200m),
                       ("500c", r500c), ("BN98", rBN98)):
        if rad is not None:
            scopes.append((sname, rad))

    out: Dict[str, jnp.ndarray] = {}

    def _block(tname, sel, with_temp_sfr=False, with_age=False):
        w = jnp.where(sel, mass, 0.0)
        msum = seg.segment_sum(w, pfof, ng1)
        msafe = jnp.maximum(msum, 1e-30)
        out[f"n_{tname}"] = seg.segment_sum(sel.astype(jnp.int32), pfof, ng1)
        out[f"M_{tname}"] = msum
        cm = seg.segment_sum(pos * w[:, None], pfof, ng1) / msafe[:, None]
        cmv = seg.segment_sum(vel * w[:, None], pfof, ng1) / msafe[:, None]
        out[f"cm_{tname}"] = cm
        out[f"cmvel_{tname}"] = cmv
        dv2 = jnp.sum((vel - seg.gather_rows(cmv, pfof)) ** 2, -1)
        out[f"sigV_{tname}"] = jnp.sqrt(
            seg.segment_sum(jnp.where(sel, dv2 * mass, 0.0), pfof, ng1) /
            msafe / 3.0)
        L = seg.segment_sum(jnp.cross(dx, dv) * w[:, None], pfof, ng1)
        out[f"L_{tname}"] = L
        # half-mass radius of this type (radius-sorted masked cumsum)
        sel_s = sel[perm]
        m_t_s = jnp.where(sel_s, m_s, 0.0)
        Mcum_t = seg.segment_cumsum(m_t_s, g_s, offsets)
        khalf = _first_crossing(
            (Mcum_t > 0.5 * msum[g_s]) & (g_s > 0), g_s, ng1, n)
        khc = jnp.minimum(khalf, n - 1)
        rhalf = jnp.where(khalf < n, r_s[khc], 0.0)
        out[f"R_HalfMass_{tname}"] = rhalf
        if full:
            # mass within twice the half-mass radius
            k2h = _first_crossing(
                (r_s > 2.0 * rhalf[g_s]) & (g_s > 0), g_s, ng1, n)
            k2c = jnp.minimum(jnp.maximum(k2h - 1, 0), n - 1)
            # msum == 0 guard: with no particles of the type rhalf is 0,
            # the crossing lands on the group's FIRST sorted slot and
            # Mcum_t[k2h-1] would read the PREVIOUS group's cumsum —
            # junk that differs between the global and the packed
            # per-device sort orders (reference: zero-member types
            # report 0)
            out[f"MassTwiceRhalfmass_{tname}"] = jnp.where(
                msum > 0, jnp.where(k2h < n, Mcum_t[k2c], msum), 0.0)
            # velocity dispersion tensor (3x3) about the type CM velocity
            dvt = vel - seg.gather_rows(cmv, pfof)
            out[f"veldisp_{tname}"] = seg.segment_outer(
                dvt, dvt, w, pfof, ng1) / msafe[:, None, None]
            # shape from the mass-weighted inertia tensor about the halo CM
            itens = seg.segment_outer(dx, dx, w, pfof, ng1) / \
                msafe[:, None, None]
            evals, evecs = jnp.linalg.eigh(itens)
            lam_a = jnp.maximum(evals[:, 2], 1e-30)
            out[f"q_{tname}"] = jnp.sqrt(jnp.maximum(evals[:, 1], 0.0)
                                         / lam_a)
            out[f"s_{tname}"] = jnp.sqrt(jnp.maximum(evals[:, 0], 0.0)
                                         / lam_a)
            out[f"eigvec_{tname}"] = evecs
            # Krot: rotational kinetic-energy fraction about the type L axis
            jhat = L / jnp.maximum(
                jnp.linalg.norm(L, axis=-1, keepdims=True), 1e-30)
            jz = jnp.sum(jnp.cross(dx, dvt) * seg.gather_rows(jhat, pfof), -1)
            Rperp2 = jnp.maximum(
                r2 - jnp.sum(dx * seg.gather_rows(jhat, pfof), -1) ** 2, 1e-30)
            ek_rot = seg.segment_sum(
                jnp.where(sel, 0.5 * mass * jz * jz / Rperp2, 0.0),
                pfof, ng1)
            ek_tot = seg.segment_sum(
                jnp.where(sel, 0.5 * mass * jnp.sum(dvt * dvt, -1), 0.0),
                pfof, ng1)
            out[f"Krot_{tname}"] = ek_rot / jnp.maximum(ek_tot, 1e-30)
            # radius-scoped masses: RVmax / fixed apertures / SO radii
            if rvmax is not None:
                out[f"M_{tname}_rvmax"] = seg.segment_sum(
                    jnp.where(sel & (r2 < rvmax[pfof] ** 2), mass, 0.0),
                    pfof, ng1)
            if r30 > 0.0:
                out[f"M_{tname}_30kpc"] = seg.segment_sum(
                    jnp.where(sel & (r2 < r30 * r30), mass, 0.0), pfof, ng1)
            if r50 > 0.0:
                out[f"M_{tname}_50kpc"] = seg.segment_sum(
                    jnp.where(sel & (r2 < r50 * r50), mass, 0.0), pfof, ng1)
            for sname, rad in scopes:
                insph = sel & (r2 < rad[pfof] ** 2)
                out[f"M_{sname}_{tname}"] = seg.segment_sum(
                    jnp.where(insph, mass, 0.0), pfof, ng1)
                out[f"L_{sname}_{tname}"] = seg.segment_sum(
                    jnp.cross(dx, dv) * jnp.where(insph, mass, 0.0)[:, None],
                    pfof, ng1)
        if with_temp_sfr:
            if u is not None:
                # reference semantics (substructureproperties.cxx:527-528,
                # 592): Temp_* is the UNWEIGHTED sum of internal energies,
                # Temp_mean_* the mass-weighted mean (sum(m*u)/M); no unit
                # conversion is applied in either
                out[f"Temp_{tname}"] = seg.segment_sum(
                    jnp.where(sel, u, 0.0), pfof, ng1)
                out[f"Temp_mean_{tname}"] = seg.segment_sum(
                    jnp.where(sel, u * mass, 0.0), pfof, ng1) / msafe
            if sfr is not None and not tname.endswith("nsf"):
                out[f"SFR_{tname}"] = seg.segment_sum(
                    jnp.where(sel, sfr, 0.0), pfof, ng1)
                out[f"SFR_mean_{tname}"] = out[f"SFR_{tname}"] / msafe
            if zmet is not None:
                out[f"Zmet_{tname}"] = seg.segment_sum(
                    jnp.where(sel, zmet * mass, 0.0), pfof, ng1) / msafe
        if with_age and tage is not None:
            out["t_mean_star"] = seg.segment_sum(
                jnp.where(sel, tage * mass, 0.0), pfof, ng1) / msafe
        return msum

    for tname, tval in types:
        sel = (ptype == tval) & (pfof > 0)
        msum_t = _block(tname, sel, with_temp_sfr=(tname == "gas"),
                        with_age=(tname == "star"))
        if tname == "star" and zmet is not None:
            out["Zmet_star"] = seg.segment_sum(
                jnp.where(sel, zmet * mass, 0.0), pfof, ng1) / \
                jnp.maximum(msum_t, 1e-30)
        if tname == "gas" and sfr is not None and full:
            # star-forming / non-star-forming gas split (reference
            # gas_sf/gas_nsf blocks, allvars.h:1385-1460)
            _block("gas_sf", sel & (sfr > 0), with_temp_sfr=True)
            _block("gas_nsf", sel & (sfr <= 0), with_temp_sfr=True)
        if tname == "bh":
            out["M_bh_mostmassive"] = seg.segment_max(
                jnp.where(sel, mass, 0.0), pfof, ng1)
            if bhmdot is not None:
                out["acc_bh"] = seg.segment_sum(
                    jnp.where(sel, bhmdot, 0.0), pfof, ng1)
                # accretion rate of the most massive BH in the group
                ismax = sel & (mass >= out["M_bh_mostmassive"][pfof]) & \
                    (out["M_bh_mostmassive"][pfof] > 0)
                out["acc_bh_mostmassive"] = seg.segment_max(
                    jnp.where(ismax, bhmdot, 0.0), pfof, ng1)
    # zoom low-res "interloper" block (reference n_interloper fields;
    # heavier-than-zoomlowmassdm DM also counts,
    # substructureproperties.cxx:931)
    if full:
        sel_lr = ((ptype == LOWRESTYPES[0]) | (ptype == LOWRESTYPES[1])) & \
            (pfof > 0)
        if zoomlowmassdm > 0.0:
            sel_lr = sel_lr | ((ptype == DARKTYPE) &
                               (mass > zoomlowmassdm) & (pfof > 0))
        out["n_interloper"] = seg.segment_sum(sel_lr.astype(jnp.int32),
                                              pfof, ng1)
        out["M_interloper"] = seg.segment_sum(
            jnp.where(sel_lr, mass, 0.0), pfof, ng1)
        for sname, rad in scopes:
            out[f"M_{sname}_interloper"] = seg.segment_sum(
                jnp.where(sel_lr & (r2 < rad[pfof] ** 2), mass, 0.0),
                pfof, ng1)
    for k, v in out.items():
        out[k] = v.at[0].set(jnp.zeros_like(v[0]))
    return out


@partial(jax.jit, static_argnames=("num_groups",))
def compute_energies(vel, mass, pfof, W, num_groups: int, gcmvel,
                     Eratio) -> Dict[str, jnp.ndarray]:
    """Efrac (bound mass fraction) and Epot/Ekin totals per group
    (reference GetBindingEnergy, substructureproperties.cxx:3884)."""
    ng1 = num_groups + 1
    dv = vel - seg.gather_rows(gcmvel, pfof)
    T = 0.5 * mass * jnp.sum(dv * dv, -1)
    E = Eratio * T + W
    ing = pfof > 0
    mtot = jnp.maximum(
        seg.segment_sum(jnp.where(ing, mass, 0.0), pfof, ng1), 1e-30)
    mbound = seg.segment_sum(jnp.where(ing & (E < 0), mass, 0.0), pfof, ng1)
    return {
        "Efrac": mbound / mtot,
        "Epot": 0.5 * seg.segment_sum(jnp.where(ing, W, 0.0), pfof, ng1),
        "Ekin_unbind": seg.segment_sum(jnp.where(ing, T, 0.0), pfof, ng1),
    }


def property_bundle(opt, pos, vel, mass, pfof, num_groups: int, *,
                    W=None, ptype=None, boxsize=None, pertype: bool = False,
                    u=None, sfr=None, zmet=None, tage=None, bhmdot=None
                    ) -> Dict[str, jnp.ndarray]:
    """The full property-stage orchestration: reference frame selection,
    core properties, per-type blocks, apertures/profiles, RVmax extras and
    binding energies, exactly as the reference sequences them inside
    ``GetProperties`` (/root/reference/src/substructureproperties.cxx:266+,
    frame selection :327-340, GASON/STARON/BHON blocks, apertures :4539).

    Pure given static ``opt`` fields and array-presence flags, so the SAME
    function serves the single-device pipeline (models/pipeline.py) and
    each device's shard of the mesh path
    (parallel/distributed_props.py::distributed_properties).
    """
    from ..utils import config as C

    refpos = refvel = None
    if opt.iPropertyReferencePosition != C.PROPREFCM and W is not None:
        # Reference_frame_for_properties (iPropertyReferencePosition):
        # most-bound / potential-minimum particle instead of the CM;
        # Particle_type_for_reference_frames restricts the candidate set
        npp = pos.shape[0]
        ng1 = num_groups + 1
        if opt.iPropertyReferencePosition == C.PROPREFMINPOT:
            key = W
        else:  # PROPREFMBP
            wm = jnp.where(pfof > 0, mass, 0.0)
            vmean = seg.segment_mean(vel, wm, pfof, ng1)
            dvv = vel - seg.gather_rows(vmean, pfof)
            key = 0.5 * mass * jnp.sum(dvv * dvv, axis=-1) + W
        key = jnp.where(pfof > 0, key, jnp.inf)
        if opt.ParticleTypeForRefenceFrame != -1 and ptype is not None:
            key = jnp.where(
                jnp.asarray(ptype) == opt.ParticleTypeForRefenceFrame,
                key, jnp.inf)
        ridx = seg.segment_argmin(key, pfof, ng1)
        safe = jnp.clip(ridx, 0, npp - 1)
        refpos = seg.gather_rows(pos, safe)
        refvel = seg.gather_rows(vel, safe)

    pr = compute_properties(
        pos, vel, mass, pfof, num_groups,
        G=opt.G, boxsize=boxsize,
        rhocrit=opt.rhocrit, rhobg=opt.rhobg,
        virlevel=opt.virlevel if opt.virlevel > 0 else 200.0,
        virBN98=opt.virBN98,
        so_thresholds=tuple(opt.SOthresholds_values_crit),
        min_size=opt.MinSize,
        iIterateCM=bool(opt.iIterateCM),
        cmfrac=opt.pinfo.cmfrac, cmadjustfac=opt.pinfo.cmadjustfac,
        refpos=refpos)
    # centre used by every radius-dependent stage below (the reference
    # re-references ALL particle positions to cmref up front, :320-340)
    ref_c = refpos if refpos is not None else pr["gcm"]

    if pertype and ptype is not None:
        to_int = 1.0 / opt.lengthtokpc if opt.lengthtokpc > 0 else 0.0
        pr.update(compute_pertype_properties(
            pos, vel, mass, jnp.asarray(ptype), pfof, num_groups,
            refpos=ref_c, refvel=pr["gcmvel"],
            u=u, sfr=sfr, zmet=zmet, tage=tage, bhmdot=bhmdot,
            rvmax=pr.get("gRmaxvel"), r200c=pr.get("gR200c"),
            r200m=pr.get("gR200m"), r500c=pr.get("gR500c"),
            rBN98=pr.get("gRBN98"),
            r30=30.0 * to_int, r50=50.0 * to_int,
            zoomlowmassdm=float(opt.zoomlowmassdm)))

    if opt.iaperturecalc or opt.iprofilecalc:
        to_int = 1.0 / opt.lengthtokpc if opt.lengthtokpc > 0 else 1.0
        aps = tuple(a * to_int for a in opt.aperture_values_kpc) \
            if opt.iaperturecalc else ()
        aps_proj = tuple(a * to_int for a in opt.aperture_proj_values_kpc) \
            if opt.iaperturecalc else ()
        edges = tuple(opt.profile_bin_edges) if opt.iprofilecalc else ()
        pr.update(compute_aperture_properties(
            pos, vel, mass, pfof, num_groups, refpos=ref_c,
            refvel=pr["gcmvel"], apertures=aps, apertures_proj=aps_proj,
            profile_edges=edges, iprofilenorm=opt.iprofilenorm,
            R200c=pr["gR200c"]))
    if opt.iextrahalooutput:
        pr.update(compute_rvmax_properties(
            pos, vel, mass, pfof, num_groups, refpos=ref_c,
            refvel=pr["gcmvel"], rmax=pr["gRmaxvel"]))
    if W is not None:
        pr.update(compute_energies(
            vel, mass, pfof, W, num_groups, pr["gcmvel"],
            jnp.asarray(opt.uinfo.Eratio, jnp.float32)))
    return pr
