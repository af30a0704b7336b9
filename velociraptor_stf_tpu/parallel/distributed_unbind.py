"""Distributed unbinding over a device mesh: whole groups per device.

The SPMD analog of the reference's MPI group exchange + per-task unbinding
(/root/reference/src/mpiroutines.cxx:2548 ``MPIGroupExchange`` +
unbind.cxx:196 ``CheckUnboundGroups``): unbinding is embarrassingly
parallel over groups, so instead of the reference's particle migration +
per-rank OpenMP loops, groups are assigned to devices by greedy
largest-first bin packing, each device's block holds its groups' particles
contiguously (group-sorted), and a single ``shard_map`` runs the potential
+ iterative-ejection fixed point entirely locally per device — zero
collectives inside the loop, one gather/scatter at the edges.

The per-device physics is the same as models/unbind.py: the Pallas dense
direct-sum potential on TPU (ops/pallas_gravity.py) or a chunked masked
direct sum elsewhere (the CPU dryrun path), the CMVELREF/POTREF reference
frames, ``maxunbindfrac`` capped least-bound-first ejection, and the
``Keep_background_potential=0`` bulk potential recompute between ejection
chunks (unbind.cxx:583-586).
"""

from __future__ import annotations

import os
import warnings
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..ops import pallas_gravity, segments as seg
from ..models.unbind import UnbindResult, _finalize_unbind, _unbind_loop
from ..utils.config import POTREF, UnbindInfo
from .grouppack import assign_groups_lpt, plan_group_blocks
from .mesh import PARTS_AXIS

_CHUNK = 512


def _potential_block_direct(pos_l, mass_l, gid_l, eps2):
    """Masked chunked direct sum: Phi_i = sum_{j in group(i), j!=i}
    m_j / sqrt(d^2 + eps^2).  Traceable fallback with the same group-sorted
    layout as the Pallas kernel (used on CPU meshes / dryrun)."""
    npad = pos_l.shape[0]
    nch = npad // _CHUNK
    rows = jnp.arange(npad, dtype=jnp.int32)[:, None]

    def body(i, acc):
        off = i * _CHUNK
        pc = jax.lax.dynamic_slice_in_dim(pos_l, off, _CHUNK, 0)   # (CH,3)
        mc = jax.lax.dynamic_slice_in_dim(mass_l, off, _CHUNK, 0)
        gc = jax.lax.dynamic_slice_in_dim(gid_l, off, _CHUNK, 0)
        d2 = jnp.zeros((npad, _CHUNK), pos_l.dtype)
        for k in range(3):
            dk = pos_l[:, k:k + 1] - pc[None, :, k]
            d2 = d2 + dk * dk
        cols = off + jnp.arange(_CHUNK, dtype=jnp.int32)[None, :]
        ok = (gid_l[:, None] == gc[None, :]) & (gid_l[:, None] > 0) & \
            (rows != cols)
        contrib = jnp.where(ok, mc[None, :] * jax.lax.rsqrt(d2 + eps2), 0.0)
        return acc + jnp.sum(contrib, axis=1)

    # init derived from mass_l so the carry's varying-axes type is stable
    # under jax.shard_map
    return jax.lax.fori_loop(0, nch, body, mass_l * 0.0)


def _potential_block(pos_l, mass_l, gid_l, offsets, eps2: float, G: float,
                     use_pallas: bool):
    """(npad,) potential ENERGY W = m * Phi over a group-sorted block."""
    if use_pallas:
        phi = pallas_gravity.potential_group_sorted(
            pos_l, mass_l, gid_l, offsets, pos_l.shape[0], float(eps2))
    else:
        phi = _potential_block_direct(pos_l, mass_l, gid_l,
                                      jnp.asarray(eps2, pos_l.dtype))
    return (-G) * phi.astype(pos_l.dtype) * mass_l


def _make_unbind_body(npad: int, ng_loc: int, uinfo: UnbindInfo, G: float,
                      min_size: int, boxsize: Optional[float],
                      use_pallas: bool):
    """Build the per-device shard_map body (all config static)."""
    eps2 = float(uinfo.eps) ** 2
    ng1 = ng_loc + 1

    def body(pos_b, vel_b, mass_b, gid_b):
        pos_l, vel_l = pos_b[0], vel_b[0]
        mass_l, gid_l = mass_b[0], gid_b[0]
        if boxsize:
            pos_l = seg.unwrap_positions(pos_l, gid_l, boxsize, ng_loc)
        # blocks are [group 1..k particles | padding(gid 0, mass 0)]:
        # offsets come from counts (order-independent), and the Pallas
        # row-coverage needs padding to carry the LAST gid (a trailing 0
        # would empty the final mixed block's range; padding columns have
        # mass 0 so they contribute nothing either way)
        valid = gid_l > 0
        cnt = jnp.zeros(ng1 + 1, jnp.int32).at[
            jnp.clip(gid_l, 0, ng1)].add(valid.astype(jnp.int32))
        offsets = jnp.concatenate(
            [jnp.zeros(1, jnp.int32),
             jnp.cumsum(cnt[:ng1]).astype(jnp.int32)])
        kmax = jnp.max(gid_l)
        gid_pot = jnp.where(valid, gid_l, kmax)
        W0 = _potential_block(pos_l, mass_l, gid_pot, offsets, eps2, G,
                              use_pallas)
        W0 = jnp.where(valid, W0, 0.0)

        # POTREF frame: mean velocity near the potential minimum, fixed
        # during the iteration (unbind.cxx Npotref/fracpotref semantics)
        if uinfo.cmvelreftype == POTREF:
            perm = jnp.lexsort((W0, gid_l)).astype(jnp.int32)
            g_s = gid_l[perm]
            offs = seg.group_offsets(g_s, ng_loc)
            rank = seg.segment_rank(g_s, offs)
            counts = offs[1:] - offs[:-1]
            npot = jnp.maximum(
                (uinfo.fracpotref * counts[g_s]).astype(jnp.int32),
                uinfo.Npotref)
            selq = (rank < npot) & (g_s > 0)
            w = jnp.where(selq, mass_l[perm], 0.0)
            potref_vel = seg.segment_mean(vel_l[perm], w, g_s, ng1)
        else:
            potref_vel = jnp.zeros((ng1, 3), pos_l.dtype)

        Eratio = jnp.asarray(uinfo.Eratio, pos_l.dtype)
        mfrac = jnp.asarray(uinfo.maxunbindfrac, pos_l.dtype)

        if uinfo.bgpot == 0:
            # ejected particles stop contributing: alternate short ejection
            # chunks with bulk potential recomputes from bound survivors
            def cond(state):
                _, _, changed, it = state
                return changed & (it < 64)

            def outer(state):
                bound, W_cur, _, it = state
                bound2, _, changed = _unbind_loop(
                    vel_l, mass_l, gid_l, W_cur, potref_vel, ng_loc,
                    Eratio, mfrac, min_size, uinfo.cmvelreftype,
                    max_iters=4, bound0=bound)
                W_new = _potential_block(
                    pos_l, jnp.where(bound2, mass_l, 0.0), gid_pot,
                    offsets, eps2, G, use_pallas)
                W_cur = jnp.where(changed, W_new, W_cur)
                return bound2, W_cur, changed, it + 1

            bound0 = gid_l > 0
            changed0 = jnp.any(bound0 | jnp.bool_(True))
            it0 = jnp.max(jnp.zeros_like(gid_l))
            bound, W_fin, _, _ = jax.lax.while_loop(
                cond, outer, (bound0, W0, changed0, it0))
        else:
            bound, _, _ = _unbind_loop(
                vel_l, mass_l, gid_l, W0, potref_vel, ng_loc,
                Eratio, mfrac, min_size, uinfo.cmvelreftype,
                max_iters=256, bound0=None)
        return bound[None], W0[None]

    return body


def distributed_unbind(pos, vel, mass, pfof, num_groups: int,
                       uinfo: UnbindInfo, G: float, mesh: Mesh,
                       boxsize: Optional[float] = None,
                       min_size: int = 20) -> UnbindResult:
    """Unbind all groups, sharded over the mesh; matches the single-device
    ``check_unbound_groups`` semantics (bound sets, dissolution, renumber).

    Arrays stay DEVICE-RESIDENT end to end: the deal/packing prepass is
    jitted (parallel/grouppack.py) and the host sees only (ng+1,) group
    sizes and per-device loads — the reference keeps particles on their
    ranks the same way (mpiroutines.cxx:49-230)."""
    pos = jnp.asarray(pos, jnp.float32)
    vel = jnp.asarray(vel, jnp.float32)
    mass = jnp.asarray(mass, jnp.float32)
    pfof_d = jnp.asarray(pfof, jnp.int32)
    n = pos.shape[0]

    plan = (plan_group_blocks(pfof_d, num_groups, mesh, min_npad=_CHUNK)
            if num_groups > 0 else None)
    if plan is None:
        return _finalize_unbind(mass, pfof_d,
                                jnp.zeros(n, bool), jnp.zeros(n, pos.dtype),
                                num_groups, uinfo, min_size)
    npad, ng_loc = plan.npad, plan.ng_loc

    pos_b = plan.pack(pos)
    vel_b = plan.pack(vel)
    mass_b = plan.pack(mass)
    gidl_b = plan.pack_local_gids(pfof_d)

    use_pallas = (jax.default_backend() == "tpu" and
                  pallas_gravity.pallas_potential_available())

    def _run(with_pallas: bool):
        body = _make_unbind_body(npad, ng_loc, uinfo, G, min_size, boxsize,
                                 with_pallas)
        mapped = jax.shard_map(
            body, mesh=mesh,
            in_specs=(P(PARTS_AXIS),) * 4,
            out_specs=(P(PARTS_AXIS), P(PARTS_AXIS)))
        return jax.jit(mapped)(pos_b, vel_b, mass_b, gidl_b)

    if use_pallas:
        try:
            bound_b, W_b = _run(True)
        except Exception:
            if os.environ.get("VR_POT_PALLAS") == "1":
                raise
            warnings.warn("Pallas potential kernel failed to compile in "
                          "the sharded unbind; using the XLA direct sum",
                          RuntimeWarning)
            pallas_gravity.mark_compile_failed()
            bound_b, W_b = _run(False)
    else:
        bound_b, W_b = _run(False)

    bound = plan.unpack(bound_b, fill=False)
    W = plan.unpack(W_b, fill=0.0)
    return _finalize_unbind(mass, pfof_d, bound, W,
                            num_groups, uinfo, min_size)
