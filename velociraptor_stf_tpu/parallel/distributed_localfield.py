"""Distributed local velocity density over a device mesh.

The sharded analog of the reference's kNN-import machinery for
``GetVelocityDensity`` (/root/reference/src/mpiroutines.cxx:1203-1722:
ranks compute which remote particles fall inside local particles' kNN
search balls and import them point-to-point before the tree walk).

TPU-native design: particles are binned into ``ndev`` x-slabs (one per
device).  Each device builds its own KD-leaf decomposition
(models/localfield.py leaf machinery) of its slab, then exchanges its
ENTIRE leaf blocks with the two ring neighbours via ``lax.ppermute`` —
the candidate pool for every local leaf is (local + left + right) slabs.
Candidate selection and the SPH velocity-kernel evaluation are the same
``_leaf_densities`` kernel the single-device path uses, so the physics
matches by construction; only the leaf decomposition differs (slab-local
KD splits instead of global ones), which perturbs the *approximative*
candidate sets at slab boundaries by less than the approximation's own
leaf-shared-candidate error (tested statistically in
tests/test_distributed.py).

Validity of the one-neighbour reach requires each slab to be wider than
the Nsearch-neighbour ball — always true at production scale (a slab
holds N/ndev >> Nsearch particles); enforced loosely by requiring
npad_local >= nsearch.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.localfield import _leaf_densities
from ..ops.kdgrid import median_partition
from . import collectives as coll
from .mesh import PARTS_AXIS


@partial(jax.jit, static_argnames=("nvel", "nsearch", "leaf_size", "m",
                                   "chunk", "exact", "mesh", "boxsize"))
def _density_mapped(pos_b, vel_b, valid_b, nvel: int, nsearch: int,
                    leaf_size: int, m: int, chunk: int, exact: bool,
                    mesh: Mesh, boxsize: float):
    ndev = mesh.devices.size

    def body(pos_blk, vel_blk, valid_blk):
        p = pos_blk[0]
        v = vel_blk[0]
        ok = valid_blk[0]
        npad = p.shape[0]
        nleaf = npad // leaf_size
        lo = jnp.min(jnp.where(ok[:, None], p, jnp.inf), axis=0)
        hi = jnp.max(jnp.where(ok[:, None], p, -jnp.inf), axis=0)
        lo = jnp.where(jnp.isfinite(lo), lo, 0.0)
        hi = jnp.where(jnp.isfinite(hi), hi, 1.0)
        span = jnp.maximum(jnp.max(hi - lo), 1.0)
        # park invalid slots far away (distinct offsets keep leaves pure)
        far = hi[None, :] + span * \
            (2.0 + jnp.arange(npad, dtype=p.dtype))[:, None]
        p = jnp.where(ok[:, None], p, far)
        levels = int(math.log2(nleaf)) if nleaf > 1 else 0
        pad_idx = median_partition(p, levels, active=ok)
        P_l = p[pad_idx].reshape(nleaf, leaf_size, 3)
        V_l = v[pad_idx].reshape(nleaf, leaf_size, 3)
        ok_l = ok[pad_idx].reshape(nleaf, leaf_size)
        wsum = jnp.maximum(jnp.sum(ok_l, axis=1), 1)[:, None]
        cm = jnp.sum(jnp.where(ok_l[..., None], P_l, 0.0), axis=1) / wsum
        leaf_ok = jnp.any(ok_l, axis=1)
        big = span * 1e3
        cm_sel = jnp.where(
            leaf_ok[:, None], cm,
            hi[None, :] + big * (1 + jnp.arange(nleaf,
                                                dtype=p.dtype))[:, None])

        # ghost exchange: full leaf blocks from the two ring neighbours
        # (the analog of the reference's kNN import; communication is the
        # slab payload once, on ICI, instead of per-ball point-to-point)
        idx = jax.lax.axis_index(PARTS_AXIS)
        right = [(i, (i + 1) % ndev) for i in range(ndev)]
        left = [(i, (i - 1) % ndev) for i in range(ndev)]

        def ghosts(perm, from_left):
            Pg = coll.ppermute(P_l, PARTS_AXIS, perm)
            Vg = coll.ppermute(V_l, PARTS_AXIS, perm)
            og = coll.ppermute(ok_l, PARTS_AXIS, perm)
            cg = coll.ppermute(cm_sel, PARTS_AXIS, perm)
            # crossing the ring wrap: periodic -> shift x by +-boxsize so
            # ghosts are minimum-image adjacent; non-periodic -> park far
            wrap = (idx == 0) if from_left else (idx == ndev - 1)
            if boxsize > 0:
                shift = jnp.where(wrap,
                                  jnp.asarray(-boxsize if from_left
                                              else boxsize, p.dtype), 0.0)
                Pg = Pg.at[:, :, 0].add(
                    jnp.where(og, shift, 0.0))
                cg = cg.at[:, 0].add(shift)
            else:
                og = og & ~wrap
                cg = jnp.where(
                    wrap, hi[None, :] + big * (nleaf + 1 + jnp.arange(
                        nleaf, dtype=p.dtype))[:, None] * (2.0 if from_left
                                                           else 3.0), cg)
            return Pg, Vg, og, cg

        if ndev > 1:
            Pl, Vl, ol, cl = ghosts(right, from_left=True)
            Pr, Vr, orr, cr = ghosts(left, from_left=False)
            P_pool = jnp.concatenate([P_l, Pl, Pr])
            V_pool = jnp.concatenate([V_l, Vl, Vr])
            ok_pool = jnp.concatenate([ok_l, ol, orr])
            cm_pool = jnp.concatenate([cm_sel, cl, cr])
        else:
            P_pool, V_pool, ok_pool, cm_pool = P_l, V_l, ok_l, cm_sel

        dens_leaf = _leaf_densities(P_l, V_l, ok_l, cm_sel, P_pool, V_pool,
                                    ok_pool, cm_pool, nvel, nsearch, m,
                                    chunk, exact)
        dens_flat = dens_leaf.reshape(-1)[:npad]
        # back to local slot order (invalid slots read 0)
        scatter_idx = jnp.where(ok_l.reshape(-1), pad_idx, npad)
        out = jnp.zeros(npad, p.dtype).at[scatter_idx].set(
            dens_flat, mode="drop")
        return out[None, :]

    return jax.shard_map(body, mesh=mesh, in_specs=(P(PARTS_AXIS),) * 3,
                         out_specs=P(PARTS_AXIS))(pos_b, vel_b, valid_b)


@coll.staged("density")
def distributed_velocity_density(pos, vel, mesh: Mesh, nvel: int = 32,
                                 nsearch: int = 256, leaf_size: int = 32,
                                 chunk: int = 2048, exact: bool = False,
                                 active: Optional[np.ndarray] = None,
                                 boxsize: Optional[float] = None
                                 ) -> np.ndarray:
    """(N,) local velocity density with particles sharded as x-slabs.

    Same contract as models/localfield.py::velocity_density; the full
    particle set is never materialised on one device.
    """
    ndev = mesh.devices.size
    pos = np.asarray(pos, np.float32)
    vel = np.asarray(vel, np.float32)
    n = pos.shape[0]
    act = np.ones(n, bool) if active is None else np.asarray(active, bool)

    # x-slab binning (host prepass; O(N) numpy)
    x = pos[:, 0]
    if boxsize:
        dev = np.clip((x / boxsize * ndev).astype(np.int64), 0, ndev - 1)
    else:
        lo, hi = float(x.min()), float(x.max())
        w = max(hi - lo, 1e-30)
        dev = np.clip(((x - lo) / w * ndev).astype(np.int64), 0, ndev - 1)
    counts = np.bincount(dev, minlength=ndev)
    npad = max(int(counts.max()), leaf_size, nsearch)
    npad = 1 << int(math.ceil(math.log2(npad)))
    order = np.argsort(dev, kind="stable")
    slot = np.arange(n, dtype=np.int64) - np.concatenate(
        [[0], np.cumsum(counts)[:-1]])[dev[order]]
    dest = dev[order] * npad + slot

    def pack(a, fill=0.0, dtype=None):
        flat = np.full((ndev * npad,) + a.shape[1:], fill,
                       dtype or a.dtype)
        flat[dest] = a[order]
        return flat.reshape(ndev, npad, *a.shape[1:])

    sh = NamedSharding(mesh, P(PARTS_AXIS))
    pos_b = jax.device_put(pack(pos), sh)
    vel_b = jax.device_put(pack(vel), sh)
    valid_b = jax.device_put(pack(act, fill=False), sh)

    nleaf = npad // leaf_size
    m = max(2, int(np.ceil(1.5 * nsearch / leaf_size)))
    m = min(m, nleaf * (3 if ndev > 1 else 1))
    nsearch = min(nsearch, m * leaf_size)
    nvel = min(nvel, nsearch - 1)

    out_b = _density_mapped(pos_b, vel_b, valid_b, nvel, nsearch,
                            leaf_size, m, chunk, exact, mesh,
                            float(boxsize or 0.0))
    flat = np.asarray(jax.device_get(out_b)).reshape(-1)
    out = np.zeros(n, np.float32)
    out[order] = flat[dest]
    return out
