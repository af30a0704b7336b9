"""Float64 NumPy oracles for the reference's contested numerics.

The reference cannot be built here (NBodylib absent), so these sequential
double-precision reimplementations of the three numerically delicate
algorithms serve as the validation targets for the f32 JAX pipeline:

* ``so_oracle`` — spherical-overdensity log-log crossing interpolation
  (/root/reference/src/substructureproperties.cxx:5203-5308
  ``CalculateSphericalOverdensity``);
* ``unbind_oracle`` — the per-group sequential ejection loop
  (/root/reference/src/unbind.cxx:732-1199 ``Unbind`` +
  ``FillUnboundArrays``:63-100);
* ``vscale_oracle`` — the 6DFOF velocity scales
  (/root/reference/src/search.cxx:443-499), including the verbatim
  ``mtotregion`` accumulation bug of the uniform-scale branch for
  catalog-compatibility checks.

These are *independent reimplementations from the algorithm*, kept
deliberately scalar/sequential so they share no code path with the
vectorised JAX implementations they validate.
"""

from __future__ import annotations

import math
from typing import Sequence, Tuple

import numpy as np


def so_oracle(radii: np.ndarray, masses: np.ndarray,
              lgrhovals: Sequence[float],
              minnum: int) -> Tuple[np.ndarray, np.ndarray]:
    """(R, M) per log-density threshold for ONE group's member radii.

    ``radii``/``masses``: the group's particle radii about the chosen
    centre and masses (any order).  ``lgrhovals``: ln(rho) thresholds
    (e.g. ln(200 * rhocrit)).  ``minnum``: first particle index from
    which crossings are searched (reference ``minnum``).
    Mirrors CalculateSphericalOverdensity's walk: enclosed ln-density
    after each particle, log-log slope interpolation to the crossing,
    skipping non-decreasing-density steps; masses below the smallest
    particle mass zero out.
    """
    order = np.argsort(radii, kind="stable")
    r = np.asarray(radii, np.float64)[order]
    m = np.asarray(masses, np.float64)[order]
    n = len(r)
    nth = len(lgrhovals)
    R = np.zeros(nth)
    M = np.zeros(nth)
    if n == 0:
        return R, M
    fac = -math.log(4.0 * math.pi / 3.0)
    minnum = max(1, min(minnum, n))
    enc = float(np.sum(m[:minnum]))
    minmass = float(m[0])
    rc2 = max(float(r[minnum - 1]), 1e-300)
    enc2 = enc
    rho2 = math.log(enc2) - 3.0 * math.log(rc2) + fac
    found = np.zeros(nth, bool)
    for j in range(minnum, n):
        rc = max(float(r[j]), 1e-300)
        enc += float(m[j])
        rho = math.log(enc) - 3.0 * math.log(rc) + fac
        drho = rho - rho2
        if drho == 0.0:
            continue
        gamma1 = math.log(rc / rc2) / drho
        gamma2 = math.log(enc / enc2) / drho
        if gamma1 > 0:
            # density not decreasing: skip without interpolating
            rho2, rc2, enc2 = rho, rc, enc
            continue
        for t in range(nth):
            if not found[t] and rho < lgrhovals[t]:
                delta = lgrhovals[t] - rho
                R[t] = rc * math.exp(gamma1 * delta)
                M[t] = enc * math.exp(gamma2 * delta)
                found[t] = True
        if found.all():
            break
        rho2, rc2, enc2 = rho, rc, enc
    for t in range(nth):
        if M[t] < minmass:
            M[t] = R[t] = 0.0
    return R, M


def unbind_oracle(pos: np.ndarray, vel: np.ndarray, mass: np.ndarray,
                  eps: float, G: float, Eratio: float = 1.0,
                  maxunbindfrac: float = 0.05, min_size: int = 20,
                  bgpot: int = 1, max_iters: int = 1000) -> np.ndarray:
    """Bound mask for ONE group, reference-sequential in float64.

    Mirrors the per-group Unbind loop (unbind.cxx:1100-1199, UPART
    semantics): exact direct-sum potential with Plummer softening;
    kinetic frame = CM velocity of the current members, updated
    incrementally as particles are removed; per iteration at most
    ``maxunbindfrac * ning`` particles (the least bound first, only while
    E > 0) are ejected; with ``bgpot == 0`` ejected particles' potential
    contributions are removed; the group dissolves below ``min_size``.
    """
    pos = np.asarray(pos, np.float64)
    vel = np.asarray(vel, np.float64)
    m = np.asarray(mass, np.float64)
    n = len(m)
    eps2 = float(eps) * float(eps)
    alive = np.ones(n, bool)

    # pairwise potential energies W_i = -G m_i sum_j m_j / sqrt(d^2+eps^2)
    d2 = np.sum((pos[:, None, :] - pos[None, :, :]) ** 2, -1) + eps2
    np.fill_diagonal(d2, np.inf)
    inv = 1.0 / np.sqrt(d2)
    W = -G * m * (inv @ m)

    for _ in range(max_iters):
        idx = np.nonzero(alive)[0]
        ning = len(idx)
        if ning < min_size:
            alive[:] = False
            break
        mtot = float(np.sum(m[idx]))
        cmvel = np.sum(vel[idx] * m[idx, None], 0) / mtot
        dv = vel[idx] - cmvel
        T = 0.5 * m[idx] * np.sum(dv * dv, -1)
        E = Eratio * T + W[idx]
        if np.max(E) <= 0:
            break
        pqsize = max(int(maxunbindfrac * ning), 1)
        order = np.argsort(-E, kind="stable")      # least bound first
        remove = [idx[j] for j in order[:pqsize] if E[j] > 0]
        if not remove:
            break
        alive[remove] = False
        if bgpot == 0:
            rest = np.nonzero(alive)[0]
            for k in remove:
                W[rest] += G * m[rest] * m[k] * inv[rest, k]
    return alive


def vscale_oracle(vel: np.ndarray, mass: np.ndarray, pfof: np.ndarray,
                  ngroups: int, ellhalo6dvfac: float,
                  adaptive: bool = True,
                  reproduce_reference_bug: bool = False) -> np.ndarray:
    """(ngroups+1,) 6DFOF velocity scales sigma_v^2 * fac^2 in float64.

    ``adaptive``: per-group dispersions (FOF6DADAPTIVE,
    search.cxx:472-499).  Otherwise the uniform scale from the largest
    group (search.cxx:443-463); with ``reproduce_reference_bug`` the
    verbatim stray-statement accumulation is reproduced — ``mtotregion``
    picks up ONLY the particle one past the largest group (the first
    member of the next group in sorted order), search.cxx:450.
    """
    vel = np.asarray(vel, np.float64)
    m = np.asarray(mass, np.float64)
    pfof = np.asarray(pfof)
    fac2 = float(ellhalo6dvfac) ** 2
    out = np.zeros(ngroups + 1)
    if adaptive:
        for g in range(1, ngroups + 1):
            sel = pfof == g
            if not sel.any():
                continue
            mt = np.sum(m[sel])
            vm = np.sum(vel[sel] * m[sel, None], 0) / mt
            out[g] = np.sum(np.sum((vel[sel] - vm) ** 2, -1) * m[sel]) \
                / mt * fac2
        return out
    sel = pfof == 1
    if not sel.any():
        return out
    sv = np.sum(vel[sel] * m[sel, None], 0)          # Sigma m v
    if reproduce_reference_bug:
        # sorted order: group 1 first, then group 2, ...; the stray
        # mtotregion statement runs once with i == iend = |group 1|
        nxt = pfof == 2
        if nxt.any():
            mtot = float(m[np.nonzero(nxt)[0][0]])
        elif (pfof == 0).any():
            mtot = float(m[np.nonzero(pfof == 0)[0][0]])
        else:
            mtot = float(m[np.nonzero(sel)[0][-1]])
    else:
        mtot = float(np.sum(m[sel]))
    vm = sv / mtot
    out[1:] = np.sum(np.sum((vel[sel] - vm) ** 2, -1) * m[sel]) \
        / mtot * fac2
    return out
