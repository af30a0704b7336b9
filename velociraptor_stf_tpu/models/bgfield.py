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

from ..ops.cells import morton_keys

MAXNGRID = 6  # reference allvars.h:185 (interpolation uses MAXNGRID+1 cells)


@partial(jax.jit, static_argnames=("cellsize",))
def background_grid(pos, vel, mass, cellsize: int):
    """Equal-count background cells from the Morton-sorted particle array.

    Returns (cellpos (C,3), gvel (C,3), gveldisp_inv (C,3,3), cell_ok (C,)).
    ``cellsize`` = particles per cell (reference Ncell = max(MINCELLSIZE,
    Ncellfac*N), bgfield.cxx:21).
    """
    n = pos.shape[0]
    C = max(1, -(-n // cellsize))
    npad = C * cellsize
    lo, hi = jnp.min(pos, 0), jnp.max(pos, 0)
    order = jnp.argsort(morton_keys(pos, lo, hi)).astype(jnp.int32)
    pad_idx = jnp.concatenate([order, jnp.full((npad - n,), n - 1, jnp.int32)])
    valid = (jnp.arange(npad) < n).reshape(C, cellsize)
    P = pos[pad_idx].reshape(C, cellsize, 3)
    V = vel[pad_idx].reshape(C, cellsize, 3)
    M = jnp.where(valid, mass[pad_idx].reshape(C, cellsize), 0.0)
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


@partial(jax.jit, static_argnames=("nsearch",))
def denv_ratio(pos, vel, density, cellpos, gvel, gveldisp_inv, nsearch: int):
    """(N,) R values (reference GetDenVRatio, localbgcomp.cxx:14)."""
    norm = (2.0 * math.pi) ** -1.5
    k = MAXNGRID + 1
    C = cellpos.shape[0]
    kq = min(k, C)

    d2 = jnp.sum((pos[:, None, :] - cellpos[None, :, :]) ** 2, -1)  # (N,C)
    negd2, nn = jax.lax.top_k(-d2, kq)                               # (N,k)
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


@partial(jax.jit, static_argnames=("nbins",))
def _ratio_distribution(R, mass, active, nbins: int):
    """Mode and two-sided dispersions of the R distribution.

    The reference (DetermineDenVRatioDistribution, localbgcomp.cxx:134)
    histograms R, locates the most probable value, estimates the two-sided
    e^{-1/2}-crossing widths, rebins with Scott's rule around the peak and
    optionally Newton-fits a skew-Gaussian (stf-fitting.h).  Here the same
    quantities come from a two-pass histogram mode (coarse then refined
    around the peak, replacing the dynamic rebin with a static-width second
    pass) and robust one-sided MAD widths (Gaussian-consistent, playing the
    skew-Gaussian's two variances).
    """
    big = jnp.asarray(np.inf, R.dtype)
    Ra = jnp.where(active, R, big)
    Rb = jnp.where(active, R, -big)
    rmin, rmax = jnp.min(Ra), jnp.max(Rb)

    def hist_mode(lo, hi, nb):
        width = jnp.maximum((hi - lo) / nb, 1e-12)
        ir = jnp.clip(((R - lo) / width).astype(jnp.int32), 0, nb)
        w = jnp.where(active & (R >= lo) & (R < hi), mass, 0.0)
        rbin = jnp.zeros(nb + 1, R.dtype).at[ir].add(w)[:nb]
        ip = jnp.argmax(rbin)
        return lo + (ip + 0.5) * width

    m0 = hist_mode(rmin, rmax, nbins)
    # global robust scale to size the refinement window
    med = jnp.nanmedian(jnp.where(active, R, jnp.nan))
    sg = 1.4826 * jnp.nanmedian(jnp.where(active, jnp.abs(R - med), jnp.nan))
    sg = jnp.maximum(sg, 1e-6)
    m1 = hist_mode(m0 - 3 * sg, m0 + 3 * sg, 4 * nbins)

    d = R - m1
    in_win = active & (jnp.abs(d) < 6 * sg)
    sdlow = 1.4826 * jnp.nanmedian(
        jnp.where(in_win & (d < 0), -d, jnp.nan))
    sdhigh = 1.4826 * jnp.nanmedian(
        jnp.where(in_win & (d > 0), d, jnp.nan))
    sdlow = jnp.maximum(jnp.nan_to_num(sdlow, nan=sg), 1e-6)
    sdhigh = jnp.maximum(jnp.nan_to_num(sdhigh, nan=sg), 1e-6)
    return m1, sdlow, sdhigh


def outlier_values(R, mass, active=None) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Normalised outlier values (reference GetOutliersValues,
    localbgcomp.cxx:471).  Returns (ell, (mode, sdlow, sdhigh))."""
    n = R.shape[0]
    if active is None:
        active = jnp.ones(n, bool)
    nbins = int(math.ceil(math.log2(max(n, 2)) + 1) * 4)
    mode, sdlow, sdhigh = _ratio_distribution(R, mass, active, nbins)
    d = R - mode
    ell = jnp.where(d > 0, d / sdhigh, d / sdlow)
    return ell, (mode, sdlow, sdhigh)
