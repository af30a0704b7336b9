"""Distributed bulk group properties over a device mesh.

The sharded analog of the property reductions the reference distributes
with MPI group-bulk allreduces (/root/reference/src/mpiroutines.cxx:3240
grid allgather + the per-rank GetProperties partial sums): particle
arrays stay sharded over the mesh in arbitrary order; every device
computes partial mass-weighted segment sums over its shard and a single
``psum`` combines them.  Two rounds (sums, then centred second moments)
produce the bulk PropData core: mass, CM, CM velocity, size, velocity
dispersion tensor and angular momentum per group.

Radius-ordered quantities (SO masses, Vmax, half-mass radii) need the
per-group radial sort and run on the gathered per-group segments
(models/properties.py) — the reference does the same (groups are
localised before GetProperties).  This module covers the reductions that
scale with the FULL particle count.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from . import collectives as coll
from .mesh import PARTS_AXIS


@coll.staged("props")
def distributed_bulk_properties(pos, vel, mass, pfof, num_groups: int,
                                mesh: Mesh,
                                boxsize: Optional[float] = None
                                ) -> Dict[str, np.ndarray]:
    """(ng+1,)-indexed bulk properties via sharded partial reductions.

    Returns host numpy: num, gmass, gcm, gcmvel, gsize, gveldisp (3x3),
    gJ (about the CM, CM-velocity frame), gsigma_v.
    """
    ndev = mesh.devices.size
    pos = np.asarray(pos, np.float32)
    vel = np.asarray(vel, np.float32)
    mass = np.asarray(mass, np.float32)
    pfof = np.asarray(pfof, np.int32)
    n = pos.shape[0]
    ng1 = num_groups + 1
    npad = -(-n // ndev) * ndev
    pad = npad - n

    def shard(a, fill=0):
        if a.ndim == 1:
            a = np.concatenate([a, np.full(pad, fill, a.dtype)])
        else:
            a = np.concatenate([a, np.full((pad,) + a.shape[1:], fill,
                                           a.dtype)])
        return jax.device_put(a.reshape(ndev, npad // ndev, *a.shape[1:]),
                              NamedSharding(mesh, P(PARTS_AXIS)))

    pos_b = shard(pos)
    vel_b = shard(vel)
    mass_b = shard(mass)
    pfof_b = shard(pfof)   # padding pfof 0 -> accumulates into bin 0

    out = _bulk_props_mapped(pos_b, vel_b, mass_b, pfof_b, ng1, mesh,
                             0.0 if boxsize is None else float(boxsize))
    return {k: np.asarray(jax.device_get(v)) for k, v in out.items()}


@partial(jax.jit, static_argnames=("ng1", "mesh", "boxsize"))
def _bulk_props_mapped(pos_b, vel_b, mass_b, pfof_b, ng1: int, mesh: Mesh,
                      boxsize: float):
    def body(pos_blk, vel_blk, mass_blk, pfof_blk):
        p = pos_blk[0]
        v = vel_blk[0]
        m = mass_blk[0]
        g = pfof_blk[0]
        w = jnp.where(g > 0, m, 0.0)

        def seg(vals):
            return jnp.zeros(ng1, jnp.float32).at[g].add(vals)

        # exact integer counts: a float32 accumulator stops incrementing
        # past 2^24 members (the largest group exceeds that at 1024^3)
        num = coll.psum(
            jnp.zeros(ng1, jnp.int32).at[g].add(
                (g > 0).astype(jnp.int32)), PARTS_AXIS)
        gmass = coll.psum(seg(w), PARTS_AXIS)
        # periodic unwrap about each group's first-seen position: use the
        # minimum-image offset to a reference particle reduced globally
        # (min original index per group)
        if boxsize > 0:
            # reference position: global min over (index-tagged positions)
            # — encode by taking the position of the globally smallest
            # particle index per group via min-reduction on an index key
            idx = jax.lax.axis_index(PARTS_AXIS) * p.shape[0] + \
                jnp.arange(p.shape[0])
            key = jnp.where(g > 0, idx, jnp.iinfo(jnp.int32).max)
            kmin = coll.pmin(
                jnp.full(ng1, jnp.iinfo(jnp.int32).max).at[g].min(key),
                PARTS_AXIS)
            is_ref = (key == kmin[g]) & (g > 0)
            ref = coll.psum(
                jnp.stack([jnp.zeros(ng1, jnp.float32).at[g].add(
                    jnp.where(is_ref, p[:, k], 0.0)) for k in range(3)],
                    axis=-1), PARTS_AXIS)
            d = p - ref[g]
            p = jnp.where((g > 0)[:, None],
                          ref[g] + d - boxsize * jnp.round(d / boxsize), p)
        csum = coll.psum(
            jnp.stack([seg(w * p[:, k]) for k in range(3)], -1), PARTS_AXIS)
        vsum = coll.psum(
            jnp.stack([seg(w * v[:, k]) for k in range(3)], -1), PARTS_AXIS)
        msafe = jnp.maximum(gmass, 1e-30)[:, None]
        gcm = csum / msafe
        gcmvel = vsum / msafe
        dx = p - gcm[g]
        dv = v - gcmvel[g]
        r2 = jnp.sum(dx * dx, -1)
        gsize = jnp.sqrt(coll.pmax(
            jnp.zeros(ng1, jnp.float32).at[g].max(
                jnp.where(g > 0, r2, 0.0)), PARTS_AXIS))
        disp = coll.psum(
            jnp.stack([jnp.stack([seg(w * dv[:, i] * dv[:, j])
                                  for j in range(3)], -1)
                       for i in range(3)], -2), PARTS_AXIS)
        disp = disp / msafe[..., None]
        J = coll.psum(
            jnp.stack([seg(w * (dx[:, 1] * dv[:, 2] - dx[:, 2] * dv[:, 1])),
                       seg(w * (dx[:, 2] * dv[:, 0] - dx[:, 0] * dv[:, 2])),
                       seg(w * (dx[:, 0] * dv[:, 1] - dx[:, 1] * dv[:, 0]))],
                      axis=-1), PARTS_AXIS)
        sig = jnp.sqrt(jnp.maximum(
            jnp.trace(disp, axis1=-2, axis2=-1) / 3.0, 0.0))
        return dict(num=num, gmass=gmass, gcm=gcm, gcmvel=gcmvel,
                    gsize=gsize, gveldisp=disp, gJ=J, gsigma_v=sig)

    mapped = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(PARTS_AXIS),) * 4,
        out_specs={k: P() for k in ("num", "gmass", "gcm", "gcmvel",
                                    "gsize", "gveldisp", "gJ",
                                    "gsigma_v")})
    return mapped(pos_b, vel_b, mass_b, pfof_b)


@coll.staged("props")
def distributed_properties(opt, pos, vel, mass, pfof, num_groups: int,
                           mesh: Mesh, *, W=None, ptype=None,
                           boxsize: Optional[float] = None,
                           pertype: bool = False,
                           u=None, sfr=None, zmet=None, tage=None,
                           bhmdot=None) -> Dict[str, np.ndarray]:
    """The FULL property stage sharded whole-groups-per-device.

    The analog of the reference's per-rank ``GetProperties`` after
    ``MPIGroupExchange`` localises every group on one rank
    (/root/reference/src/substructureproperties.cxx:266,
    mpiroutines.cxx:2548): groups are dealt to devices by serpentine-LPT
    (the same placement the sharded unbind uses), each device runs the
    IDENTICAL ``models.properties.property_bundle`` on its local block,
    and the per-device rows are re-indexed to global group ids on the
    host.  No device ever materialises the full tagged subset.

    Inputs are indexed by particle (any order); returns host numpy arrays
    indexed by global group id, same keys as ``property_bundle``.
    """
    from ..models.properties import property_bundle
    from ..utils.transfer import fetch_small
    from .grouppack import plan_group_blocks

    pos = jnp.asarray(pos, jnp.float32)
    vel = jnp.asarray(vel, jnp.float32)
    mass = jnp.asarray(mass, jnp.float32)
    pfof_d = jnp.asarray(pfof, jnp.int32)

    plan = plan_group_blocks(pfof_d, num_groups, mesh, min_npad=1024)
    if plan is None:
        return {}
    ng_loc = plan.ng_loc

    blocks = [plan.pack(pos), plan.pack(vel), plan.pack(mass),
              plan.pack_local_gids(pfof_d)]
    names = ["pos", "vel", "mass", "gid"]
    opt_arrays = {"W": W, "ptype": ptype, "u": u, "sfr": sfr,
                  "zmet": zmet, "tage": tage, "bhmdot": bhmdot}
    for k, v in opt_arrays.items():
        if v is not None:
            dt = jnp.int32 if k == "ptype" else jnp.float32
            blocks.append(plan.pack(jnp.asarray(v, dt)))
            names.append(k)

    def body(*blks):
        d = {nm: b[0] for nm, b in zip(names, blks)}
        pr = property_bundle(
            opt, d["pos"], d["vel"], d["mass"], d["gid"], ng_loc,
            W=d.get("W"), ptype=d.get("ptype"), boxsize=boxsize,
            pertype=pertype, u=d.get("u"), sfr=d.get("sfr"),
            zmet=d.get("zmet"), tage=d.get("tage"),
            bhmdot=d.get("bhmdot"))
        return {k: v[None] for k, v in pr.items()}

    mapped = jax.jit(jax.shard_map(
        body, mesh=mesh, in_specs=(P(PARTS_AXIS),) * len(blocks),
        out_specs=P(PARTS_AXIS)))
    out_b = mapped(*blocks)

    # host reassembly of per-GROUP rows (ng-sized — the mesh path's only
    # host traffic here): global row g <- device dev_of[g], row gid_local[g]
    gsel = np.nonzero(plan.gid_local)[0]
    d_idx = plan.dev_of[gsel]
    l_idx = plan.gid_local[gsel]
    res: Dict[str, np.ndarray] = {}
    for k, v in out_b.items():
        v = np.asarray(fetch_small(v))
        full = np.zeros((num_groups + 1,) + v.shape[2:], v.dtype)
        if len(gsel):
            full[gsel] = v[d_idx, l_idx]
        res[k] = full
    return res
