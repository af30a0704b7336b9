"""Local phase-space (velocity) density estimation.

TPU-native equivalent of the reference's ``GetVelocityDensity``
(/root/reference/src/localfield.cxx:18) in its *approximative* mode (:726),
which is the production default (``Local_velocity_density_approximate_
calculation`` >= 1): instead of a per-particle kNN, the reference finds one
shared candidate set of ``Nsearch`` physical neighbours per KD-tree leaf
(around the leaf centre-of-mass) and each leaf particle then takes its
``Nvel`` nearest *velocity* neighbours from that shared set, summing an
SPH (Epanechnikov) kernel over velocity distances.

TPU design: KD-tree leaves become equal-size chunks of the Morton-sorted
particle array ("leaves" of ``leaf_size`` particles with KD-leaf-like
spatial locality).  Candidate gathering is leaf-to-leaf: the M nearest
leaves by centre distance supply M*leaf_size candidates, from which the
Nsearch nearest to the leaf centre are kept — all dense top_k over
statically shaped tiles, no priority queues (SURVEY.md §7.1).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.kdgrid import median_partition


def _leaf_densities(P_q, V_q, valid_q, cm_q, P_pool, V_pool, valid_pool,
                    cm_pool, nvel: int, nsearch: int, m: int, chunk: int,
                    exact: bool):
    """SPH velocity densities for query leaves against a candidate leaf
    pool (pool == queries for the single-device path; pool = local +
    ghost-exchanged neighbour leaves for the distributed path).

    Query/pool leaf arrays: (Lq|Lp, K, 3) positions/velocities, (.., K)
    validity, (Lq|Lp, 3) selection centres (empty leaves parked far).
    Returns (ceil(Lq/chunk)*chunk // chunk, chunk, K) leaf densities whose
    flat order matches the query leaf order.
    """
    nleaf_q, leaf_size = P_q.shape[0], P_q.shape[1]
    nchunk = -(-nleaf_q // chunk)
    lpad = nchunk * chunk
    leaf_ids = jnp.arange(lpad, dtype=jnp.int32).reshape(nchunk, chunk)

    def do_chunk(lids):
        l = jnp.minimum(lids, nleaf_q - 1)
        c = cm_q[l]                                           # (B,3)
        d2leaf = jnp.sum((c[:, None, :] - cm_pool[None, :, :]) ** 2, -1)
        _, cand_l = jax.lax.top_k(-d2leaf, m)                 # (B,M)
        cand_pos = P_pool[cand_l].reshape(l.shape[0], m * leaf_size, 3)
        cand_vel = V_pool[cand_l].reshape(l.shape[0], m * leaf_size, 3)
        cand_valid = valid_pool[cand_l].reshape(l.shape[0], m * leaf_size)
        if exact:
            # per-particle Nsearch nearest physical candidates
            d2p = jnp.sum((P_q[l][:, :, None, :] -
                           cand_pos[:, None, :, :]) ** 2, -1)  # (B,K,MC)
            d2p = jnp.where(cand_valid[:, None, :], d2p, jnp.inf)
            _, selp = jax.lax.top_k(-d2p, nsearch)             # (B,K,Ns)
            sel_vel = jnp.take_along_axis(
                cand_vel[:, None, :, :].repeat(leaf_size, 1),
                selp[..., None], axis=2)                       # (B,K,Ns,3)
            sel_valid = jnp.take_along_axis(
                cand_valid[:, None, :].repeat(leaf_size, 1), selp, axis=2)
            dv2 = jnp.sum((V_q[l][:, :, None, :] - sel_vel) ** 2, -1)
            dv2 = jnp.where(sel_valid, dv2, jnp.inf)
        else:
            # Nsearch nearest candidates to the leaf centre
            d2cm = jnp.sum((cand_pos - c[:, None, :]) ** 2, -1)
            d2cm = jnp.where(cand_valid, d2cm, jnp.inf)
            _, sel = jax.lax.top_k(-d2cm, nsearch)            # (B,Nsearch)
            sel_vel = jnp.take_along_axis(cand_vel, sel[..., None], axis=1)
            sel_valid = jnp.take_along_axis(cand_valid, sel, axis=1)
            # per particle: Nvel nearest velocity neighbours of shared set
            dv2 = jnp.sum((V_q[l][:, :, None, :] -
                           sel_vel[:, None, :, :]) ** 2, -1)   # (B,K,Ns)
            dv2 = jnp.where(sel_valid[:, None, :], dv2, jnp.inf)
        # exclude the self match (zero distance appears once for the particle
        # itself when it is within its own leaf's candidate set)
        topneg, _ = jax.lax.top_k(-dv2, nvel + 1)
        dvk = -topneg                                          # ascending
        is_self = dvk[..., :1] <= 0.0
        dsel = jnp.where(is_self, dvk[..., 1:nvel + 1], dvk[..., 0:nvel])
        # bandwidth from the largest FINITE selected distance: sparse
        # candidate pools (a leaf with < nvel+1 valid candidates, e.g. a
        # low-occupancy boundary leaf in the distributed slab path) would
        # otherwise set h2 = inf and zero the density
        h2 = jnp.maximum(jnp.max(
            jnp.where(jnp.isfinite(dsel), dsel, 0.0), axis=-1), 1e-30)
        u2 = dsel / h2[..., None]
        kern = jnp.maximum(1.0 - u2, 0.0)
        h3 = h2 * jnp.sqrt(h2)
        dens = 15.0 / (8.0 * jnp.pi) / h3 * jnp.sum(
            jnp.where(jnp.isfinite(dsel), kern, 0.0), axis=-1)
        return dens                                            # (B,K)

    return jax.lax.map(do_chunk, leaf_ids)                     # (nc,B,K)


@partial(jax.jit, static_argnames=("nvel", "nsearch", "leaf_size",
                                   "cand_leaves", "chunk", "exact"))
def velocity_density(
    pos: jnp.ndarray,
    vel: jnp.ndarray,
    nvel: int = 32,
    nsearch: int = 256,
    leaf_size: int = 32,
    cand_leaves: Optional[int] = None,
    chunk: int = 2048,
    active: Optional[jnp.ndarray] = None,
    exact: bool = False,
) -> jnp.ndarray:
    """(N,) local velocity density for each particle.

    ``active``: optional bool mask; inactive particles get density 0 and are
    excluded from candidate sets (reference STRUCDEN Type==0 skip,
    localfield.cxx:806).

    ``exact``: per-particle Nsearch physical neighbours instead of the
    leaf-shared candidate set (reference GetVelocityDensityExact,
    localfield.cxx:485, ``Local_velocity_density_approximate_calculation=0``)
    — candidates still come from the nearest leaves, but each particle
    ranks them by its OWN distance.
    """
    n = pos.shape[0]
    npad = 1
    while npad < n:
        npad *= 2
    nleaf = npad // leaf_size
    if cand_leaves is None:
        cand_leaves = max(2, int(np.ceil(1.5 * nsearch / leaf_size)))
    m = min(cand_leaves, nleaf)
    nsearch = min(nsearch, m * leaf_size)
    nvel = min(nvel, nsearch - 1)

    lo = jnp.min(pos, axis=0)
    hi = jnp.max(pos, axis=0)
    # pow2 padding: park extra slots far away so KD leaves stay pure
    extra = npad - n
    far = hi[None, :] + (jnp.max(hi - lo) + 1.0) * \
        (2.0 + jnp.arange(extra, dtype=pos.dtype))[:, None]
    pos_ext = jnp.concatenate([pos, far])
    vel_ext = jnp.concatenate([vel, jnp.zeros((extra, 3), vel.dtype)])
    act_ext = jnp.concatenate(
        [active if active is not None else jnp.ones(n, bool),
         jnp.zeros(extra, bool)])
    levels = int(np.log2(nleaf)) if nleaf > 1 else 0
    pad_idx = median_partition(pos_ext, levels, active=act_ext)
    P = pos_ext[pad_idx].reshape(nleaf, leaf_size, 3)
    V = vel_ext[pad_idx].reshape(nleaf, leaf_size, 3)
    valid = (act_ext[pad_idx] & (pad_idx < n)).reshape(nleaf, leaf_size)

    wsum = jnp.maximum(jnp.sum(valid, axis=1), 1)[:, None]
    cm = jnp.sum(jnp.where(valid[..., None], P, 0.0), axis=1) / wsum  # (L,3)
    leaf_ok = jnp.any(valid, axis=1)
    # park empty leaves far away so they are never selected as candidates
    big = jnp.max(hi - lo) * 1e3
    cm_sel = jnp.where(leaf_ok[:, None], cm,
                       hi[None, :] + big * (1 + jnp.arange(nleaf,
                                                           dtype=pos.dtype))[:, None])

    dens_leaf = _leaf_densities(P, V, valid, cm_sel, P, V, valid, cm_sel,
                                nvel, nsearch, m, chunk, exact)
    dens_flat = dens_leaf.reshape(-1)[:npad]
    scatter_idx = jnp.where(valid.reshape(-1), pad_idx, npad)  # -> dropped
    out = jnp.zeros(n, pos.dtype)
    out = out.at[scatter_idx].set(dens_flat, mode="drop")
    return out
