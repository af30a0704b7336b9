"""Background velocity field grid and phase-space outlier values.

TPU-native equivalent of the reference's coarse-grained background
machinery:

* grid construction ``InitializeTreeGrid``/``FillTreeGrid`` + per-cell
  statistics ``GetCellVel``/``GetCellVelDisp``
  (/root/reference/src/bgfield.cxx:21-197): the reference uses KD-tree
  leaves of ~``Ncellfac * N`` particles as grid cells; here cells are
  equal-count chunks of the Morton-sorted particle array (same adaptive
  "equal mass" character, dense reshape instead of tree pointers);
* ``GetDenVRatio`` (/root/reference/src/localbgcomp.cxx:14): per particle,
  interpolate the cell mean velocity and *inverse* dispersion tensor with
  Shepard weights over the MAXNGRID+1=7 nearest cells, and compute
  ``R = log(rho_vel/Nsearch) - log((2pi)^{-3/2} |S^-1|^{1/2}
  e^{-dv S^-1 dv/2})``;
* ``DetermineDenVRatioDistribution`` + ``GetOutliersValues``
  (/root/reference/src/localbgcomp.cxx:134,471): histogram the R values
  (modified Sturges binning), find the most probable value and the
  two-sided e^{-1/2}-crossing dispersions, and normalise
  ``ell = (R - mode)/sd`` (sdhigh above the mode, sdlow below).  The
  reference optionally refines with a Newton skew-Gaussian fit
  (stf-fitting.h); the mode/two-sided-sigma estimate is its
  initialisation and is used as-is for small sets (< 2*MINSUBSIZE).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.kdgrid import median_partition
from ..utils.config import MINSUBSIZE

MAXNGRID = 6  # reference allvars.h:185 (interpolation uses MAXNGRID+1 cells)


@partial(jax.jit, static_argnames=("cellsize", "gridtype"))
def background_grid(pos, vel, mass, cellsize: int, gridtype: int = 1):
    """Equal-count background cells from the Morton-sorted particle array.

    Returns (cellpos (C,3), gvel (C,3), gveldisp_inv (C,3,3), cell_ok (C,)).
    ``cellsize`` = particles per cell (reference Ncell = max(MINCELLSIZE,
    Ncellfac*N), bgfield.cxx:21).

    ``gridtype`` (reference Grid_type, allvars.h:170-172): 1/3 =
    physical-space cells (PHYSENGRID/PHYSGRID — both equal-count here);
    2 = PHASEENGRID, cells split in 6D phase space with velocities scaled
    to the positional extent (the reference's phase-space tree grid).
    """
    n = pos.shape[0]
    npad = 1
    while npad < n:
        npad *= 2
    levels = 0
    while (npad >> (levels + 1)) >= max(cellsize, 1):
        levels += 1
    C = 1 << levels
    chunk = npad // C
    lo, hi = jnp.min(pos, 0), jnp.max(pos, 0)
    extra = npad - n
    farpos = hi[None, :] + (jnp.max(hi - lo) + 1.0) * \
        (2.0 + jnp.arange(extra, dtype=pos.dtype))[:, None]
    pos_ext = jnp.concatenate([pos, farpos])
    vel_ext = jnp.concatenate([vel, jnp.zeros((extra, 3), vel.dtype)])
    mass_ext = jnp.concatenate([mass, jnp.zeros(extra, mass.dtype)])
    if gridtype == 2:  # PHASEENGRID: split on scaled 6D phase coordinates
        vext = jnp.maximum(jnp.max(vel, 0) - jnp.min(vel, 0), 1e-30)
        xext = jnp.maximum(hi - lo, 1e-30)
        scale = jnp.max(xext) / jnp.maximum(jnp.max(vext), 1e-30)
        phase_ext = jnp.concatenate([pos_ext, vel_ext * scale], axis=1)
        pad_idx = median_partition(phase_ext, levels)
    else:
        pad_idx = median_partition(pos_ext, levels)
    valid = (pad_idx < n).reshape(C, chunk)
    P = pos_ext[pad_idx].reshape(C, chunk, 3)
    V = vel_ext[pad_idx].reshape(C, chunk, 3)
    M = jnp.where(valid, mass_ext[pad_idx].reshape(C, chunk), 0.0)
    mtot = jnp.maximum(jnp.sum(M, 1), 1e-30)
    cell_ok = jnp.sum(M, 1) > 0
    cellpos = jnp.sum(P * M[..., None], 1) / mtot[:, None]
    # park massless cells (padding-only chunks) far away so they are never
    # among any particle's 7 nearest interpolation cells
    far = hi + (jnp.max(hi - lo) + 1.0) * \
        (2.0 + jnp.arange(C, dtype=pos.dtype))[:, None]
    cellpos = jnp.where(cell_ok[:, None], cellpos, far)
    gvel = jnp.sum(V * M[..., None], 1) / mtot[:, None]
    dv = V - gvel[:, None, :]
    disp = jnp.einsum("cki,ckj,ck->cij", dv, dv, M) / mtot[:, None, None]
    # regularise and invert (reference inverts before interpolation,
    # localbgcomp.cxx:40)
    tr = jnp.trace(disp, axis1=1, axis2=2) / 3.0
    disp = disp + (1e-8 * jnp.maximum(tr, 1e-20))[:, None, None] * \
        jnp.eye(3, dtype=pos.dtype)[None]
    disp_inv = jnp.linalg.inv(disp)
    return cellpos, gvel, disp_inv, cell_ok


def _ratio_from_neighbours(vel, density, gvel, gveldisp_inv, nn, negd2,
                           nsearch: int):
    """R values given each particle's k nearest cells (ids + -dist^2)."""
    norm = (2.0 * math.pi) ** -1.5
    dist = jnp.sqrt(-negd2 + 1e-16)
    maxdist = jnp.max(dist, axis=1, keepdims=True)
    w = ((maxdist - dist) / (maxdist * dist)) ** 2
    wsum = jnp.maximum(jnp.sum(w, 1), 1e-30)
    vm = jnp.sum(gvel[nn] * w[..., None], 1) / wsum[:, None]
    isv = jnp.sum(gveldisp_inv[nn] * w[..., None, None], 1) / \
        wsum[:, None, None]
    sv = jnp.sqrt(jnp.abs(jnp.linalg.det(isv)))
    vp = vel - vm
    vsv = jnp.einsum("ni,nij,nj->n", vp, isv, vp)
    fbg = jnp.log(jnp.maximum(sv, 1e-30)) - 0.5 * vsv
    tempdenv = jnp.maximum(density / nsearch, 1e-30)
    return jnp.log(tempdenv) - math.log(norm) - fbg


@partial(jax.jit, static_argnames=("nsearch",))
def _denv_ratio_dense(pos, vel, density, cellpos, gvel, gveldisp_inv,
                      nsearch: int):
    k = MAXNGRID + 1
    C = cellpos.shape[0]
    kq = min(k, C)
    d2 = jnp.sum((pos[:, None, :] - cellpos[None, :, :]) ** 2, -1)  # (N,C)
    negd2, nn = jax.lax.top_k(-d2, kq)                               # (N,k)
    return _ratio_from_neighbours(vel, density, gvel, gveldisp_inv, nn,
                                  negd2, nsearch)


_BUCKET = 32      # cells per KD bucket
_NBOX = 4         # nearest buckets searched per particle
_PCHUNK = 1 << 16


@partial(jax.jit, static_argnames=("nsearch",))
def _denv_ratio_bucketed(pos, vel, density, cellpos, gvel, gveldisp_inv,
                         nsearch: int):
    """Two-level 7-NN: cells are equal-count KD chunks (median_partition
    order), so contiguous runs of ``_BUCKET`` cells are KD subtrees with
    compact bounding boxes.  Each particle ranks buckets by point-to-AABB
    distance, then searches the ``_NBOX`` nearest buckets' cells exactly
    (the TPU replacement for the reference's tree 7-NN,
    localbgcomp.cxx:95-120 — near-exact: the true 7th-nearest cell lies
    outside the 4 nearest subtree boxes only in pathological geometries,
    and the Shepard interpolation is smoothing anyway).  Memory is
    O(chunk x candidates), not O(N x C)."""
    k = MAXNGRID + 1
    n = pos.shape[0]
    C = cellpos.shape[0]
    nb = C // _BUCKET
    boxes = cellpos.reshape(nb, _BUCKET, 3)
    blo = jnp.min(boxes, axis=1)                       # (nb,3)
    bhi = jnp.max(boxes, axis=1)

    npadded = -(-n // _PCHUNK) * _PCHUNK
    pad = npadded - n
    pos_p = jnp.concatenate([pos, jnp.zeros((pad, 3), pos.dtype)])
    vel_p = jnp.concatenate([vel, jnp.zeros((pad, 3), vel.dtype)])
    den_p = jnp.concatenate([density, jnp.ones(pad, density.dtype)])

    def chunk_fn(args):
        p, v, dn = args                                 # (chunk, ...)
        # point-to-AABB distance^2 per bucket
        d_lo = jnp.maximum(blo[None] - p[:, None, :], 0.0)
        d_hi = jnp.maximum(p[:, None, :] - bhi[None], 0.0)
        d2b = jnp.sum((d_lo + d_hi) ** 2, -1)           # (chunk, nb)
        _, bb = jax.lax.top_k(-d2b, _NBOX)              # (chunk, B)
        cand = (bb[:, :, None] * _BUCKET +
                jnp.arange(_BUCKET, dtype=jnp.int32)[None, None, :]
                ).reshape(p.shape[0], _NBOX * _BUCKET)
        cp = cellpos[cand]                              # (chunk, BM, 3)
        d2 = jnp.sum((p[:, None, :] - cp) ** 2, -1)
        negd2, sel = jax.lax.top_k(-d2, k)
        nn = jnp.take_along_axis(cand, sel, axis=1)
        return _ratio_from_neighbours(v, dn, gvel, gveldisp_inv, nn,
                                      negd2, nsearch)

    R = jax.lax.map(chunk_fn,
                    (pos_p.reshape(-1, _PCHUNK, 3),
                     vel_p.reshape(-1, _PCHUNK, 3),
                     den_p.reshape(-1, _PCHUNK)))
    return R.reshape(-1)[:n]


def denv_ratio(pos, vel, density, cellpos, gvel, gveldisp_inv, nsearch: int):
    """(N,) R values (reference GetDenVRatio, localbgcomp.cxx:14).

    Dense (N, C) nearest-cell search for small grids; the two-level KD
    bucket search above it (a 10^7-particle halo with C ~ N*Ncellfac cells
    would need an O(N^2*Ncellfac) dense matrix)."""
    n = pos.shape[0]
    C = cellpos.shape[0]
    if C <= 4 * _BUCKET or n * C <= (1 << 28):
        return _denv_ratio_dense(pos, vel, density, cellpos, gvel,
                                 gveldisp_inv, nsearch)
    return _denv_ratio_bucketed(pos, vel, density, cellpos, gvel,
                                gveldisp_inv, nsearch)


@partial(jax.jit, static_argnames=("nbins", "nbins2"))
def _ratio_distribution(R, mass, active, nbins: int, nbins2: int):
    """Mode and two-sided dispersions of the R distribution.

    Mirrors the reference DetermineDenVRatioDistribution
    (localbgcomp.cxx:134): histogram R, locate the most probable value,
    estimate the two-sided widths from the e^{-1/2} crossing points either
    side of the peak (linear interpolation between bins).  The reference's
    dynamic Scott's-rule rebinning is replaced by a static-width second
    pass: a refined histogram over a window of +-3 robust sigma around the
    coarse mode, which resolves narrow peaks regardless of the global
    range.  Peak-crossing widths are tail-insensitive -- outlier
    substructure does not inflate them (unlike moment/MAD estimates).
    """
    big = jnp.asarray(np.inf, R.dtype)
    rmin = jnp.min(jnp.where(active, R, big))
    rmax = jnp.max(jnp.where(active, R, -big))

    def hist(lo, hi, nb):
        width = jnp.maximum((hi - lo) / nb, 1e-12)
        ir = jnp.clip(((R - lo) / width).astype(jnp.int32), 0, nb)
        w = jnp.where(active & (R >= lo) & (R < hi), mass, 0.0)
        return jnp.zeros(nb + 1, R.dtype).at[ir].add(w)[:nb], width

    # coarse mode
    h0, w0 = hist(rmin, rmax, nbins)
    m0 = rmin + (jnp.argmax(h0) + 0.5) * w0
    # robust window scale
    med = jnp.nanmedian(jnp.where(active, R, jnp.nan))
    sg = 1.4826 * jnp.nanmedian(jnp.where(active, jnp.abs(R - med), jnp.nan))
    sg = jnp.maximum(sg, 1e-6)
    # refined histogram around the peak; bin count follows Scott's rule
    # (~2 n^(1/3) bins over +-3 sigma), like the reference's rebin pass
    nb2 = nbins2
    lo2, hi2 = m0 - 3 * sg, m0 + 3 * sg
    h1, w1 = hist(lo2, hi2, nb2)
    ip = jnp.argmax(h1)
    peak = h1[ip]
    mode = lo2 + (ip + 0.5) * w1
    thresh = jnp.exp(-0.5) * peak
    bins = jnp.arange(nb2)

    # crossing below the mode
    cond_lo = (h1 <= thresh) & (bins <= ip)
    jlo = jnp.max(jnp.where(cond_lo, bins, -1))
    ok_lo = jlo >= 0
    jl = jnp.clip(jlo, 0, nb2 - 2)
    frac = (thresh - h1[jl]) / jnp.maximum(h1[jl + 1] - h1[jl], 1e-30)
    frac = jnp.clip(frac, 0.0, 1.0)
    xlo = lo2 + (jl + 0.5 + frac) * w1
    sdlow = jnp.where(ok_lo, mode - xlo, sg)

    # crossing above the mode
    cond_hi = (h1 <= thresh) & (bins >= ip)
    jhi = jnp.min(jnp.where(cond_hi, bins, nb2))
    ok_hi = jhi < nb2
    jh = jnp.clip(jhi, 1, nb2 - 1)
    frac = (thresh - h1[jh - 1]) / jnp.maximum(h1[jh] - h1[jh - 1], -1e-30)
    frac = jnp.clip(frac, 0.0, 1.0)
    xhi = lo2 + (jh - 0.5 + frac) * w1
    sdhigh = jnp.where(ok_hi, xhi - mode, sg)

    sdlow = jnp.maximum(sdlow, 1e-6)
    sdhigh = jnp.maximum(sdhigh, 1e-6)
    return mode, sdlow, sdhigh


# parameter-freezing schedules of the reference's skew-Gaussian fit
# (localbgcomp.cxx:424-433): 1 = frozen, 0 = free; columns (A, mu, var, s2)
_SKEW_FIX = np.array([
    [1, 1, 0, 1],
    [1, 0, 0, 1],
    [0, 0, 0, 1],
    [1, 1, 1, 0],
    [0, 1, 1, 1],
    [1, 0, 0, 1],
    [1, 0, 0, 0],
    [0, 0, 0, 0],
], np.float32)


@partial(jax.jit, static_argnames=("nbins",))
def _skewgauss_refine(R, mass, active, mode, sdlow, sdhigh, nbins: int):
    """Weighted nonlinear LS fit of a skew-Gaussian to the R histogram.

    Mirrors the reference refinement (stf-fitting.h:11-48 SkewGauss +
    analytic derivatives; localbgcomp.cxx:399-460 FitNonLinLS over 8
    parameter-freezing schedules, best chi^2 wins, fall back to the
    histogram estimates when a fit goes invalid).  params = (A, mu, var,
    s2) with sdlow = sqrt(var*s2), sdhigh = sqrt(var).
    """
    dt = R.dtype
    lo = mode - 4.0 * sdlow
    hi = mode + 4.0 * sdhigh
    width = jnp.maximum((hi - lo) / nbins, 1e-12)
    ir = jnp.clip(((R - lo) / width).astype(jnp.int32), 0, nbins)
    inwin = active & (R >= lo) & (R < hi)
    w = jnp.where(inwin, mass, 0.0)
    rbin = jnp.zeros(nbins + 1, dt).at[ir].add(w)[:nbins]
    w2 = jnp.zeros(nbins + 1, dt).at[ir].add(w * w)[:nbins]
    minw2 = jnp.min(jnp.where(rbin > 0, w2, jnp.inf))
    minw2 = jnp.where(jnp.isfinite(minw2), minw2, 1.0)
    Wd = jnp.where(rbin > 0, 1.0 / jnp.maximum(w2, 1e-30), 1.0 / minw2)
    xbin = lo + (jnp.arange(nbins, dtype=dt) + 0.5) * width

    def model_and_jac(p):
        A, mu, var, s2 = p[0], p[1], p[2], p[3]
        var = jnp.maximum(var, 1e-12)
        s2 = jnp.maximum(s2, 1e-12)
        dx = xbin - mu
        below = xbin <= mu
        e_lo = jnp.exp(-0.5 * dx * dx / (var * s2))
        e_hi = jnp.exp(-0.5 * dx * dx / var)
        e = jnp.where(below, e_lo, e_hi)
        m = A * e
        dA = e
        dmu = jnp.where(below, A * e_lo * dx / (var * s2),
                        A * e_hi * dx / var)
        dvar = jnp.where(below, A * e_lo * dx * dx / (var * var * s2) * 0.5,
                         A * e_hi * dx * dx / (var * var) * 0.5)
        ds2 = jnp.where(below, A * e_lo * dx * dx / (var * s2 * s2) * 0.5,
                        0.0)
        J = jnp.stack([dA, dmu, dvar, ds2], axis=1)   # (nbins, 4)
        return m, J

    def chi2_of(p):
        m, _ = model_and_jac(p)
        r = rbin - m
        return jnp.sum(Wd * r * r)

    A0 = jnp.max(rbin)
    p_init = jnp.stack([A0, mode, sdhigh * sdhigh * 0.8,
                        jnp.asarray(1.0, dt)])

    def run_schedule(carry, fix):
        best_p, best_chi2 = carry
        free = 1.0 - fix                                 # (4,)

        def lm_step(state, _):
            p, lam, c_cur = state
            m, J = model_and_jac(p)
            r = rbin - m
            JW = J * Wd[:, None]
            H = JW.T @ J
            g = JW.T @ r
            # Levenberg-Marquardt damping on the free-parameter block;
            # frozen params: identity rows/cols, zero gradient
            H = H + lam * jnp.diag(jnp.maximum(jnp.diag(H), 1e-12))
            H = H * (free[:, None] * free[None, :]) + \
                jnp.diag(fix).astype(dt)
            g = g * free
            step = jnp.linalg.solve(H, g)
            p_new = p + step
            c_new = chi2_of(p_new)
            valid = jnp.all(jnp.isfinite(p_new)) & (p_new[2] > 0) & \
                (p_new[3] > 0) & jnp.isfinite(c_new)
            accept = valid & (c_new < c_cur)
            p = jnp.where(accept, p_new, p)
            c_cur = jnp.where(accept, c_new, c_cur)
            lam = jnp.where(accept, lam * 0.5, lam * 4.0)
            lam = jnp.clip(lam, 1e-8, 1e8)
            return (p, lam, c_cur), None

        # start each schedule from the current best (reference restarts
        # from the running estimates on failure)
        (p_fit, _, c), _ = jax.lax.scan(
            lm_step, (best_p, jnp.asarray(1e-2, dt), chi2_of(best_p)),
            None, length=30)
        ok = jnp.all(jnp.isfinite(p_fit)) & (p_fit[2] > 0) & \
            (p_fit[3] > 0) & jnp.isfinite(c) & (c < best_chi2)
        best_p = jnp.where(ok, p_fit, best_p)
        best_chi2 = jnp.where(ok, c, best_chi2)
        return (best_p, best_chi2), None

    (p_best, _), _ = jax.lax.scan(run_schedule, (p_init, chi2_of(p_init)),
                                  jnp.asarray(_SKEW_FIX, dt))
    mu = p_best[1]
    var = jnp.maximum(p_best[2], 1e-12)
    s2 = jnp.maximum(p_best[3], 1e-12)
    return mu, jnp.sqrt(var * s2), jnp.sqrt(var)


def outlier_values(R, mass, active=None, skewfit: bool = True
                   ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Normalised outlier values (reference GetOutliersValues,
    localbgcomp.cxx:471).  Returns (ell, (mode, sdlow, sdhigh))."""
    n = R.shape[0]
    if active is None:
        active = jnp.ones(n, bool)
    nbins = int(math.ceil(math.log2(max(n, 2)) + 1) * 4)
    nbins2 = int(min(max(2 * n ** (1 / 3), 16), 256))
    mode, sdlow, sdhigh = _ratio_distribution(R, mass, active, nbins, nbins2)
    if skewfit:
        # skew-Gaussian refinement, applied only with enough statistics
        # (reference gate: nbodies >= 16*MINSUBSIZE, localbgcomp.cxx:397)
        mu_f, sdl_f, sdh_f = _skewgauss_refine(R, mass, active, mode,
                                               sdlow, sdhigh, nbins2)
        enough = jnp.sum(active.astype(jnp.int32)) >= 16 * MINSUBSIZE
        mode = jnp.where(enough, mu_f, mode)
        sdlow = jnp.where(enough, sdl_f, sdlow)
        sdhigh = jnp.where(enough, sdh_f, sdhigh)
    d = R - mode
    ell = jnp.where(d > 0, d / sdhigh, d / sdlow)
    return ell, (mode, sdlow, sdhigh)
