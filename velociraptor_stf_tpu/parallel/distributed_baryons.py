"""Distributed baryon association over a device mesh.

The SPMD analog of the reference's dedicated MPI baryon machinery
(/root/reference/src/mpiroutines.cxx:2170 ``MPIGetExportNum``/:2675
``MPIBaryonGroupExchange``/:2873/:3031 — tagged DM near rank boundaries is
exported so each rank can assign its baryons in phase space,
search.cxx:3201+): the combined (tagged DM + baryon) set rides the SAME
x-slab decomposition + ``ppermute`` ghost exchange the distributed FOF
uses (parallel/distributed_fof.py::SlabPlan — the ghost width equals the
association's spatial reach), and each device assigns its local baryons
to the group of their generalized-nearest tagged DM with one candidate
sweep — no fixed point, no particle migration.

Distances match models/baryons.py exactly (dist = dx^2/ellx^2 +
dv^2/ellv^2, minimum image, min-group-id tie-break), so the assignment is
bit-identical to the single-device path wherever f32 candidate windows
coincide — asserted end-to-end by tests/test_sharded_pipeline.py.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import fof
from .distributed_fof import SlabPlan, _take_first_k, _windows_dense_xclip
from . import collectives as coll
from .mesh import PARTS_AXIS

_BIG_I32 = np.int32(np.iinfo(np.int32).max)


@coll.staged("baryons")
def distributed_baryon_assign(pos, vel, groups, nt: int, ellx2: float,
                              ellv2: float, mesh: Mesh,
                              boxsize: float) -> np.ndarray:
    """Assign each baryon the group of its phase-nearest tagged DM.

    ``pos``/``vel``: combined arrays ordered [tagged DM (nt) | baryons];
    ``groups``: (n,) with DM group ids in the first nt entries (>0).
    Returns (n - nt,) baryon group ids on DEVICE (0 = unassigned),
    matching
    models/baryons.py::search_baryons semantics.
    """
    pos = jnp.asarray(pos, jnp.float32)       # device-resident throughout
    vel = jnp.asarray(vel, jnp.float32)
    groups = jnp.asarray(groups, jnp.int32)
    n = pos.shape[0]
    ellx = float(np.sqrt(ellx2))
    plan = SlabPlan(pos, ellx, float(boxsize), mesh)
    assert boxsize / plan.nx >= ellx * (1 - 1e-9)
    ndev, W, nx, ny, nz = plan.ndev, plan.W, plan.nx, plan.ny, plan.nz
    wx, wy, wz = boxsize / nx, boxsize / ny, boxsize / nz
    npad, B, t_pad = plan.npad, plan.B, plan.t_pad
    pay_b, grp_b = plan.pack_payload(vel, jnp.ones(n, jnp.float32),
                                     groups)
    pos_b, gid_b, valid_b = plan.pos_b, plan.gid_b, plan.valid_b
    dims = (W + 2, ny, nz)
    nslot = npad + 2 * B
    box = jnp.asarray(boxsize, jnp.float32)
    inv_x2 = np.float32(1.0 / ellx2)
    inv_v2 = np.float32(1.0 / max(ellv2, 1e-30))

    def shard_body(pos_blk, gid_blk, valid_blk, pay_blk, grp_blk):
        pos_l, gid_l = pos_blk[0], gid_blk[0]
        valid_l, pay_l, grp_l = valid_blk[0], pay_blk[0], grp_blk[0]
        d = jax.lax.axis_index(PARTS_AXIS)
        x0 = d * W

        xcell = jnp.floor(pos_l[:, 0] / wx).astype(jnp.int32) % nx
        # only tagged DM needs to travel: baryons never serve as candidates
        is_dm = valid_l & (grp_l > 0)
        isL = is_dm & (xcell == x0)
        isR = is_dm & (xcell == x0 + W - 1)
        idxL, okL = _take_first_k(isL, B)
        idxR, okR = _take_first_k(isR, B)
        fwd = [(i, (i + 1) % ndev) for i in range(ndev)]
        bwd = [(i, (i - 1) % ndev) for i in range(ndev)]

        def send(idx, ok, perm):
            p = coll.ppermute(pos_l[idx], PARTS_AXIS, perm)
            g = coll.ppermute(jnp.where(ok, gid_l[idx], n), PARTS_AXIS,
                                 perm)
            o = coll.ppermute(ok, PARTS_AXIS, perm)
            y = coll.ppermute(pay_l[idx], PARTS_AXIS, perm)
            r = coll.ppermute(grp_l[idx], PARTS_AXIS, perm)
            return p, g, o, y, r

        gLp, gLg, gLo, gLy, gLr = send(idxR, okR, fwd)
        gRp, gRg, gRo, gRy, gRr = send(idxL, okL, bwd)

        cpos = jnp.concatenate([pos_l, gLp, gRp])
        cgid = jnp.concatenate([gid_l, gLg, gRg])
        cvalid = jnp.concatenate([valid_l, gLo, gRo])
        cpay = jnp.concatenate([pay_l, gLy, gRy])
        cgrp = jnp.concatenate([grp_l, gLr, gRr])

        cx = jnp.floor(cpos[:, 0] / wx).astype(jnp.int32) % nx
        xrel = jnp.mod(cx - x0 + 1, nx)
        cy = jnp.floor(cpos[:, 1] / wy).astype(jnp.int32) % ny
        cz = jnp.floor(cpos[:, 2] / wz).astype(jnp.int32) % nz
        cid = (xrel * ny + cy) * nz + cz
        cid = jnp.where(cvalid, cid, (W + 2) * ny * nz)
        sorder = jnp.argsort(cid).astype(jnp.int32)
        cid_s = cid[sorder]
        pos_s = cpos[sorder]
        valid_s = cvalid[sorder]
        coords_s = jnp.stack([xrel[sorder], cy[sorder], cz[sorder]], axis=1)
        vel_s = cpay[sorder, :3]
        grp_s = cgrp[sorder]
        # baryon slots: combined order puts baryons at global ids >= nt
        isb_s = (cgid[sorder] >= nt) & (cgid[sorder] < n) & valid_s

        pst, pcn = _windows_dense_xclip(cid_s, coords_s, dims,
                                        valid_sorted=valid_s)
        row, col, vslot = fof.flat_candidates(pst, pcn, t_pad, ncols=nslot)
        dvec = pos_s[row] - pos_s[col]
        dvec = dvec - box * jnp.round(dvec / box)
        d2 = jnp.sum(dvec * dvec, axis=-1)
        dv = vel_s[row] - vel_s[col]
        dv2 = jnp.sum(dv * dv, axis=-1)
        dist = d2 * inv_x2 + dv2 * inv_v2
        ok = vslot & valid_s[row] & valid_s[col] & isb_s[row] & \
            (grp_s[col] > 0) & (dist <= 1.0)
        dist = jnp.where(ok, dist, jnp.inf)
        dmin = jnp.full(nslot, jnp.inf, dist.dtype).at[row].min(dist)
        winner = jnp.isfinite(dist) & (dist <= dmin[row])
        gmin = jnp.full(nslot, _BIG_I32, jnp.int32).at[row].min(
            jnp.where(winner, grp_s[col], _BIG_I32))
        grp_out_s = jnp.where(gmin == _BIG_I32, 0, gmin)
        # back to block order; only local (non-ghost) slots are reported
        inv = jnp.zeros(nslot, jnp.int32).at[sorder].set(
            jnp.arange(nslot, dtype=jnp.int32))
        loc = grp_out_s[inv[jnp.arange(npad)]]
        return loc[None], gid_blk

    mapped = jax.shard_map(
        shard_body, mesh=mesh,
        in_specs=(P(PARTS_AXIS),) * 5,
        out_specs=(P(PARTS_AXIS), P(PARTS_AXIS)))
    grp_blk, gid_out = jax.jit(mapped)(pos_b, gid_b, valid_b, pay_b, grp_b)

    # scatter back to original order ON DEVICE (the round-4 host
    # re-materialisation of the combined set is gone; reference analog:
    # particles never leave their ranks, mpiroutines.cxx:2873)
    grp_flat = grp_blk.reshape(-1)
    gid_flat = gid_out.reshape(-1)
    out = jnp.zeros(n, jnp.int32).at[
        jnp.where(gid_flat < n, gid_flat, n)].set(grp_flat, mode="drop")
    return out[nt:]
