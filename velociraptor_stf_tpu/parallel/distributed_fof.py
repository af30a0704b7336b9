"""Distributed FOF over a device mesh: slab decomposition + halo exchange.

Explicit SPMD design (``jax.shard_map``) replacing the reference's MPI
distributed FOF (/root/reference/src/mpiroutines.cxx:49-2968 and the
link-across fixed point at /root/reference/src/search.cxx:292-347):

* the periodic box is cut into ``ndev`` slabs of ``W`` x-columns of the
  global FOF cell grid (the analog of ``MPIInitialDomainDecomposition``'s
  AABB slabs); particles are assigned to devices by x-cell;
* each device bins its particles on a local (W+2, ny, nz) grid — columns 0
  and W+1 hold **ghost copies** of the neighbouring slabs' boundary
  columns, exchanged once with ``lax.ppermute`` over the ring (the analog of
  ``MPIBuildParticleExportList`` / ghost import);
* each device runs the flat-CSR FOF label fixed point **once** on its
  local+ghost particle set (slot-space union-find, ops/fof.py machinery),
  producing static local components;
* the cross-slab fixed point then iterates only on **component labels**:
  every round each component takes the min global id over its members
  (segment-min), boundary labels ride ``ppermute`` to refresh the ghost
  copies, and ``psum`` of the change count terminates the loop — this is
  the reference's ``MPILinkAcross`` + ``MPI_Allreduce`` loop
  (search.cxx:301-313) with labels instead of particle re-exports;
* group ids are finally renumbered globally by size (the logical equivalent
  of ``MPIGroupExchange``+``MPICompileGroups``; no particle migration is
  needed on TPU — downstream per-group kernels re-sort by group id).

Distances always use real (global) positions with full-box minimum image;
the slab-relative coordinates exist only to make local cell ids contiguous
(x-major packing ⇒ each slab owns a contiguous cell-id range).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import fof
from . import collectives as coll
from .mesh import PARTS_AXIS

_BIG_I32 = np.int32(np.iinfo(np.int32).max)


def _windows_dense_xclip(cid_sorted, coords, dims: Tuple[int, int, int],
                         valid_sorted=None):
    """Stencil windows over a local grid: x clipped (ghost columns pad the
    slab), y and z periodic (each slab spans the full box in y,z).

    Variant of fof._candidate_counts_dense with per-axis boundary handling;
    returns (pst, pcn) of shape (N, 18).

    Invalid slots (padding / unfilled ghost-buffer entries) must carry
    cell id ``total`` (a virtual cell no stencil ever targets) and, via
    ``valid_sorted``, scan nothing — otherwise they inflate the candidate
    table beyond the SlabPlan's exact prepass total.
    """
    nx, ny, nz = dims
    total = nx * ny * nz
    hist = jnp.zeros(total + 2, jnp.int32).at[cid_sorted + 1].add(1)
    pstart = jnp.cumsum(hist)
    x, y, z = coords[:, 0], coords[:, 1], coords[:, 2]
    zero = jnp.zeros_like(x)

    if nz >= 3:
        zlo = jnp.where(z == 0, 0, z - 1)
        zhi = jnp.where(z == nz - 1, nz - 1, z + 1)
        wrap = (z == 0) | (z == nz - 1)
        zb = jnp.where(z == 0, nz - 1, zero)
    else:
        zlo, zhi = zero, jnp.full_like(z, nz - 1)
        wrap = jnp.zeros_like(x, bool)
        zb = zero

    psts, pcns, bsts, bcns = [], [], [], []
    for dx, dy in fof._OFFSETS_XY:
        xq = x + dx
        okx = (xq >= 0) & (xq < nx)
        xq = jnp.clip(xq, 0, nx - 1)
        yq = jnp.mod(y + dy, ny)
        base = (xq * ny + yq) * nz
        s = pstart[base + zlo]
        cnt = jnp.where(okx, pstart[base + zhi + 1] - s, 0)
        psts.append(s)
        pcns.append(cnt)
        idb = base + zb
        sb = pstart[idb]
        cb = jnp.where(okx & wrap, pstart[idb + 1] - sb, 0)
        bsts.append(sb)
        bcns.append(cb)
    pst = jnp.stack(psts + bsts, axis=1)
    pcn = jnp.stack(pcns + bcns, axis=1)
    if valid_sorted is not None:
        pcn = jnp.where(valid_sorted[:, None], pcn, 0)
    return pst, pcn


def _take_first_k(mask: jnp.ndarray, k: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Indices of the first k True entries (padded with 0, validity mask)."""
    n = mask.shape[0]
    pos = jnp.cumsum(mask) - 1
    dest = jnp.where(mask, pos, k)
    idx = jnp.zeros(k, jnp.int32).at[dest].set(
        jnp.arange(n, dtype=jnp.int32), mode="drop")
    ok = jnp.arange(k) < jnp.sum(mask)
    return idx, ok


class SlabPlan:
    """Reusable slab decomposition: packed device blocks + static sizes.

    Built once per snapshot+grid on DEVICE (the host numpy prepass of the
    round-1 design is gone: binning, packing and the candidate-total
    stencil run as jnp programs; only three scalars — max shard load, max
    boundary-column count, max candidate total — are fetched to size the
    static shapes, the analog of the reference's
    ``MPINumInDomain``/export-count prepass, mpiroutines.cxx:1203+).
    """

    def __init__(self, pos, linking_length: float, boxsize: float,
                 mesh: Mesh):
        ndev = mesh.devices.size
        pos = jnp.asarray(pos)          # device-resident throughout
        n = pos.shape[0]
        assert n < 2 ** 31, "int32 global particle ids"
        self.n = n
        self.mesh = mesh
        self.ndev = ndev
        self.dtype = pos.dtype

        # global grid: nx divisible by ndev, cell width >= linking length
        # (cells-per-dim capped so the per-device dense prefix table stays
        # small; wider cells are always correct, just more candidates)
        nx_max = max(3, int(boxsize / max(linking_length, 1e-30)))
        nxt = min(nx_max, 256)
        W = max(3, nxt // ndev)
        self.W = W
        self.nx = nx = W * ndev
        self.ny = ny = min(nx_max, 256)
        self.nz = nz = ny
        self.boxsize = float(boxsize)

        dev_j, xc_j, scal = _plan_stats(pos, n, ndev, W,
                                        nx, ny, nz, float(boxsize))
        # f32 device sums: apply the 1e-4 safety margin (see _plan_stats)
        from ..utils.transfer import fetch_small
        cmax, bmax, t_max = (int(float(v) * 1.0001) + 1
                             for v in fetch_small(scal))
        self.npad = int(1 << math.ceil(math.log2(max(cmax, 1))))
        self.B = 1 << math.ceil(math.log2(max(bmax, 1)))
        self.t_pad = 1 << math.ceil(math.log2(max(t_max, 1024)))
        self._dev = dev_j                     # (n,) device of each particle
        self._order = jnp.argsort(dev_j).astype(jnp.int32)
        self._counts = jnp.zeros(ndev, jnp.int32).at[dev_j].add(1)
        # slot index within the destination block, per ORIGINAL particle
        starts = jnp.concatenate(
            [jnp.zeros(1, jnp.int32), jnp.cumsum(self._counts)[:-1]])
        rank_sorted = jnp.arange(n, dtype=jnp.int32) - \
            starts[dev_j[self._order]]
        self._dest = jnp.zeros(n, jnp.int32).at[self._order].set(
            dev_j[self._order] * self.npad + rank_sorted)
        sh = NamedSharding(mesh, P(PARTS_AXIS))
        coll.count_reshard("slabplan", pos)
        self.pos_b = jax.device_put(
            _pack3(pos, self._dest, ndev, self.npad), sh)
        gid_flat = jnp.full(ndev * self.npad, n, jnp.int32).at[
            self._dest].set(jnp.arange(n, dtype=jnp.int32))
        self.gid_b = jax.device_put(gid_flat.reshape(ndev, self.npad), sh)
        self.valid_b = jax.device_put(self.gid_b < n, sh)

    def pack_payload(self, vel, vscale2, group):
        """(vel, vscale2) float payload + int parent ids packed into the
        plan's block layout (for the 6D criterion pass)."""
        sh = NamedSharding(self.mesh, P(PARTS_AXIS))
        pay = jnp.concatenate(
            [jnp.asarray(vel, jnp.float32),
             jnp.maximum(jnp.asarray(vscale2, jnp.float32), 1e-30)[:, None]],
            axis=1)
        pay_b = _pack_cols(pay, self._dest, self.ndev, self.npad)
        grp_flat = jnp.zeros(self.ndev * self.npad, jnp.int32).at[
            self._dest].set(jnp.asarray(group, jnp.int32))
        return (jax.device_put(pay_b, sh),
                jax.device_put(grp_flat.reshape(self.ndev, self.npad), sh))


@partial(jax.jit, static_argnames=("ndev", "npad"))
def _pack3(arr, dest, ndev: int, npad: int):
    """(n,3) -> (ndev, npad, 3) scatter by block-slot (column-wise: (N,3)
    row scatters hit the XLA:TPU lane-padded layout)."""
    cols = [jnp.zeros(ndev * npad, arr.dtype).at[dest].set(arr[:, k])
            for k in range(3)]
    return jnp.stack(cols, axis=-1).reshape(ndev, npad, 3)


@partial(jax.jit, static_argnames=("ndev", "npad"))
def _pack_cols(arr, dest, ndev: int, npad: int):
    k = arr.shape[1]
    cols = [jnp.zeros(ndev * npad, arr.dtype).at[dest].set(arr[:, j])
            for j in range(k)]
    return jnp.stack(cols, axis=-1).reshape(ndev, npad, k)


@partial(jax.jit, static_argnames=("n", "ndev", "W", "nx", "ny", "nz"))
def _plan_stats(pos, n: int, ndev: int, W: int, nx: int, ny: int, nz: int,
                boxsize: float):
    """Device prepass: per-particle device id + the three sizing scalars
    (max shard load, max boundary-column count, max candidate total)."""
    wx, wy, wz = boxsize / nx, boxsize / ny, boxsize / nz
    xc = jnp.floor(pos[:, 0] / wx).astype(jnp.int32) % nx
    yc = jnp.floor(pos[:, 1] / wy).astype(jnp.int32) % ny
    zc = jnp.floor(pos[:, 2] / wz).astype(jnp.int32) % nz
    dev = xc // W
    counts = jnp.zeros(ndev, jnp.int32).at[dev].add(1)
    colcount = jnp.zeros(nx, jnp.int32).at[xc].add(1)
    bmax = jnp.maximum(jnp.max(colcount[0:nx:W]),
                       jnp.max(colcount[W - 1:nx:W]))
    # candidate-total stencil on the global count grid
    cid = (xc * ny + yc) * nz + zc
    cnt3 = jnp.zeros(nx * ny * nz, jnp.int32).at[cid].add(1).reshape(
        nx, ny, nz)
    sten = jnp.zeros_like(cnt3)
    for dyo in (-1, 0, 1):
        for dzo in (-1, 0, 1):
            sten = sten + jnp.roll(jnp.roll(cnt3, dyo, axis=1), dzo, axis=2)
    lc = cnt3.reshape(ndev, W, ny, nz)
    # ghost x-columns from the neighbouring slabs (periodic)
    lsL = jnp.roll(sten, 1, axis=0).reshape(ndev, W, ny, nz)   # x-1 rows
    lsR = jnp.roll(sten, -1, axis=0).reshape(ndev, W, ny, nz)  # x+1 rows
    ls = sten.reshape(ndev, W, ny, nz)
    # candidate totals can pass 2^31 at 1024^3 scale and int64 is
    # unavailable without x64 (it silently truncates); f32 sums carry a
    # ~1e-6 relative error which the HOST absorbs with a 1e-4 margin
    # before the pow2 capacity round-up — over-provisioning only
    lcf = lc.astype(jnp.float32)
    tot = jnp.sum(lcf * ls, axis=(1, 2, 3))
    tot += jnp.sum(lcf * lsL, axis=(1, 2, 3))
    tot += jnp.sum(lcf * lsR, axis=(1, 2, 3))
    # ghost-row candidates: ghosts also scan their own stencils locally
    gL = jnp.roll(cnt3, 1, axis=0).reshape(ndev, W, ny, nz)[:, 0]
    gR = jnp.roll(cnt3, -1, axis=0).reshape(ndev, W, ny, nz)[:, -1]
    sL0 = ls[:, 0] + lsL[:, 0]
    sR0 = ls[:, -1] + lsR[:, -1]
    tot += jnp.sum(gL.astype(jnp.float32) * sL0, axis=(1, 2))
    tot += jnp.sum(gR.astype(jnp.float32) * sR0, axis=(1, 2))
    t_max = jnp.max(tot)
    return dev, xc, jnp.stack([jnp.max(counts).astype(jnp.float32),
                               bmax.astype(jnp.float32), t_max])


@coll.staged("fof3d")
def distributed_fof3d(pos, linking_length: float, boxsize: float,
                      mesh: Mesh, min_size: int = 8,
                      max_outer: int = 64,
                      vel=None, vscale2=None, group=None,
                      plan: Optional[SlabPlan] = None):
    """FOF over a periodic box, sharded by x-slab over the mesh.

    Returns (pfof, ngroups): pfof a DEVICE array in the ORIGINAL particle
    order, group ids 1..ngroups by decreasing size (matching fof.fof3d);
    ngroups a host int (the only device->host traffic).

    With ``vel``/``vscale2``/``group`` given, pairs link under the 6D
    phase-space criterion  d2/ell^2 + dv2/vscale2 <= 1  restricted to the
    same nonzero parent ``group`` (the distributed analog of the 6DFOF
    refinement, reference search.cxx:552-576) — the velocity and parent-id
    payloads ride the same ppermute ghost exchange as the positions.

    ``plan``: reuse a SlabPlan built with cell width >= this linking
    length (the 6DFOF pass reuses the 3D pass's binning/packing).
    """
    if plan is None:
        plan = SlabPlan(pos, linking_length, boxsize, mesh)
    # ±1-cell stencil correctness: plan cells must span the linking length
    assert boxsize / plan.nx >= linking_length * (1 - 1e-9), \
        "SlabPlan cells narrower than the linking length"
    ndev = plan.ndev
    n = plan.n
    dt = plan.dtype
    W, nx, ny, nz = plan.W, plan.nx, plan.ny, plan.nz
    wx, wy, wz = boxsize / nx, boxsize / ny, boxsize / nz
    npad, B, t_pad = plan.npad, plan.B, plan.t_pad

    sixd = vel is not None
    pos_b, gid_b, valid_b = plan.pos_b, plan.gid_b, plan.valid_b
    if sixd:
        pay_b, grp_b = plan.pack_payload(vel, vscale2, group)
    else:
        sh = NamedSharding(mesh, P(PARTS_AXIS))
        pay_b = jax.device_put(jnp.zeros((ndev, npad, 0), dt), sh)
        grp_b = jax.device_put(jnp.zeros((ndev, npad), jnp.int32), sh)

    dims = (W + 2, ny, nz)
    b2 = float(linking_length) ** 2
    box = jnp.asarray(boxsize, dt)
    nslot = npad + 2 * B

    def shard_body(pos_blk, gid_blk, valid_blk, pay_blk, grp_blk):
        # pos_blk (1, npad, 3) etc. — leading mesh axis of size 1 per device
        pos_l = pos_blk[0]
        gid_l = gid_blk[0]
        valid_l = valid_blk[0]
        pay_l = pay_blk[0]
        grp_l = grp_blk[0]
        d = jax.lax.axis_index(PARTS_AXIS)
        x0 = d * W

        xcell = jnp.floor(pos_l[:, 0] / wx).astype(jnp.int32) % nx
        isL = valid_l & (xcell == x0)
        isR = valid_l & (xcell == x0 + W - 1)
        idxL, okL = _take_first_k(isL, B)
        idxR, okR = _take_first_k(isR, B)

        fwd = [(i, (i + 1) % ndev) for i in range(ndev)]   # receive from d-1
        bwd = [(i, (i - 1) % ndev) for i in range(ndev)]   # receive from d+1

        def send(idx, ok, perm):
            p = coll.ppermute(pos_l[idx], PARTS_AXIS, perm)
            g = coll.ppermute(jnp.where(ok, gid_l[idx], n), PARTS_AXIS,
                                 perm)
            o = coll.ppermute(ok, PARTS_AXIS, perm)
            if sixd:
                y = coll.ppermute(pay_l[idx], PARTS_AXIS, perm)
                r = coll.ppermute(grp_l[idx], PARTS_AXIS, perm)
            else:
                y = pay_l[idx]
                r = grp_l[idx]
            return p, g, o, y, r

        gLp, gLg, gLo, gLy, gLr = send(idxR, okR, fwd)  # left = nbr's R
        gRp, gRg, gRo, gRy, gRr = send(idxL, okL, bwd)  # right = nbr's L

        cpos = jnp.concatenate([pos_l, gLp, gRp])
        cgid = jnp.concatenate([gid_l, gLg, gRg])
        cvalid = jnp.concatenate([valid_l, gLo, gRo])
        cpay = jnp.concatenate([pay_l, gLy, gRy])
        cgrp = jnp.concatenate([grp_l, gLr, gRr])

        # slab-relative cell coords: local x-columns 1..W, ghosts 0 / W+1
        cx = jnp.floor(cpos[:, 0] / wx).astype(jnp.int32) % nx
        xrel = jnp.mod(cx - x0 + 1, nx)
        cy = jnp.floor(cpos[:, 1] / wy).astype(jnp.int32) % ny
        cz = jnp.floor(cpos[:, 2] / wz).astype(jnp.int32) % nz
        cid = (xrel * ny + cy) * nz + cz
        # invalid slots go to the VIRTUAL cell past the grid: no stencil
        # targets it and their own windows are zeroed below, so they
        # contribute zero candidate slots (the SlabPlan t_pad is exact)
        cid = jnp.where(cvalid, cid, (W + 2) * ny * nz)
        sorder = jnp.argsort(cid).astype(jnp.int32)
        cid_s = cid[sorder]
        pos_s = cpos[sorder]
        gid_s = cgid[sorder]
        valid_s = cvalid[sorder]
        coords_s = jnp.stack([xrel[sorder], cy[sorder], cz[sorder]], axis=1)

        pay_s = cpay[sorder]
        grp_s = cgrp[sorder]

        pst, pcn = _windows_dense_xclip(cid_s, coords_s, dims,
                                        valid_sorted=valid_s)
        row, col, vslot = fof.flat_candidates(pst, pcn, t_pad, ncols=nslot)
        dvec = pos_s[row] - pos_s[col]
        dvec = dvec - box * jnp.round(dvec / box)
        d2 = jnp.sum(dvec * dvec, axis=-1)
        if sixd:
            dv = pay_s[row, :3] - pay_s[col, :3]
            dv2 = jnp.sum(dv * dv, axis=-1)
            ok6 = (d2 / b2 + dv2 / pay_s[row, 3] <= 1.0) & \
                (grp_s[row] == grp_s[col]) & (grp_s[row] > 0)
            mask = vslot & ok6 & valid_s[row] & valid_s[col]
        else:
            mask = vslot & (d2 <= b2) & valid_s[row] & valid_s[col]
        erow = jnp.where(mask, row, 0)
        ecol = jnp.where(mask, col, 0)

        # local slot-space components (static: computed once).  Initial
        # carries are pvary'd: inside shard_map, while_loop carries must
        # keep a consistent device-varying type.
        def sweep_body(state):
            l, _, it = state
            nmin = l.at[erow].min(l[ecol])
            x = l.at[l].min(nmin)
            for _ in range(4):
                x = x[x]
            return x, jnp.any(x != l), it + 1

        def sweep_cond(state):
            _, changed, it = state
            return jnp.any(changed) & (it < 256)

        def _pv(x):
            return jax.lax.pcast(x, (PARTS_AXIS,), to="varying")

        init = (_pv(jnp.arange(nslot, dtype=jnp.int32)),
                _pv(jnp.bool_(True)), _pv(jnp.int32(0)))
        slot_labels, _, _ = jax.lax.while_loop(sweep_cond, sweep_body, init)

        def comp_cond(l):
            return jnp.any(l != l[l])

        def comp_body(l):
            return l[l[l]]

        slot_labels = jax.lax.while_loop(comp_cond, comp_body, slot_labels)

        # cross-slab fixed point on global labels (min global id, int32)
        glab0 = jnp.where(valid_s, gid_s, jnp.int32(n)).astype(jnp.int32)

        # ghost slots (pre-sort space npad..npad+2B) in sorted space:
        inv = jnp.zeros(nslot, jnp.int32).at[sorder].set(
            jnp.arange(nslot, dtype=jnp.int32))
        # my boundary particles' sorted slots (for outgoing labels)
        sL = inv[idxL]
        sR = inv[idxR]
        ghostL_slots = inv[npad + jnp.arange(B)]
        ghostR_slots = inv[npad + B + jnp.arange(B)]

        def outer(state):
            glab, _, it = state
            comp = jnp.full(nslot, jnp.int32(n)).at[slot_labels].min(glab)
            newglab = jnp.minimum(glab, comp[slot_labels])
            # refresh ghosts with the owners' current labels (invalid
            # boundary-buffer entries send the sentinel, a min no-op)
            outR = coll.ppermute(
                jnp.where(okR, newglab[sR], jnp.int32(n)), PARTS_AXIS, fwd)
            outL = coll.ppermute(
                jnp.where(okL, newglab[sL], jnp.int32(n)), PARTS_AXIS, bwd)
            newglab = newglab.at[ghostL_slots].min(outR)
            newglab = newglab.at[ghostR_slots].min(outL)
            changed = jnp.sum((newglab != glab).astype(jnp.int32))
            changed = coll.psum(changed, PARTS_AXIS)
            return newglab, changed, it + 1

        def cond(state):
            _, changed, it = state
            return (changed > 0) & (it < max_outer)

        glab, _, _ = jax.lax.while_loop(
            cond, outer, (glab0, jnp.int32(1), _pv(jnp.int32(0))))
        # one more component-min so local members agree with ghosts' news
        comp = jnp.full(nslot, jnp.int32(n)).at[slot_labels].min(glab)
        glab = jnp.minimum(glab, comp[slot_labels])

        # return labels for LOCAL particles in block order
        loc = glab[inv[jnp.arange(npad)]]
        return loc[None], gid_blk

    mapped = jax.shard_map(
        shard_body, mesh=mesh,
        in_specs=(P(PARTS_AXIS), P(PARTS_AXIS), P(PARTS_AXIS),
                  P(PARTS_AXIS), P(PARTS_AXIS)),
        out_specs=(P(PARTS_AXIS), P(PARTS_AXIS)))
    labels_b, gid_out = jax.jit(mapped)(pos_b, gid_b, valid_b, pay_b, grp_b)

    # DEVICE-SIDE epilogue (round-2 weakness: a Python root-walk + host
    # scatter here cost minutes at 10^9 scale): scatter the converged min-
    # global-id labels to original particle order and renumber by size with
    # the shared fof.renumber_by_size program — raw labels ARE root indices
    # (every member carries its component's min global id), exactly the
    # label form renumber_by_size consumes.
    pfof_d, ng_d = _fof_epilogue(labels_b, gid_out, n, min_size)
    from ..utils.transfer import fetch_small
    return pfof_d, int(fetch_small(ng_d))


@partial(jax.jit, static_argnames=("n",))
def _fof_epilogue(labels_b, gid_out, n: int, min_size):
    """Scatter block labels to original order + size renumber, on device
    (the analog of MPICompileGroups, mpiroutines.cxx:2818)."""
    labels_flat = labels_b.reshape(-1)
    gid_flat = gid_out.reshape(-1)
    raw = jnp.zeros(n, jnp.int32).at[gid_flat].set(labels_flat,
                                                   mode="drop")
    return fof.renumber_by_size(raw, min_size)


@coll.staged("fof6d")
def distributed_fof6d(pos, vel, mass, linking_length: float,
                      ell6dxfac: float, ell6dvfac: float,
                      boxsize: float, mesh: Mesh,
                      min_size: int = 8,
                      adaptive: bool = True):
    """Distributed 3DFOF + 6DFOF refinement (the sharded analog of
    SearchFullSet with FoF_search_type FOF6D/FOF6DADAPTIVE,
    reference search.cxx:24-580).

    Phase 1 finds 3DFOF parents with the slab halo-exchange fixed point;
    the per-group velocity dispersion scales are then reduced globally and
    phase 2 re-links each parent's particles under the 6D criterion with
    the same machinery (velocities riding the ghost exchange).
    Returns (pfof6, ng6, pfof3, ng3), labels as DEVICE arrays in original
    particle order.
    """
    vel = jnp.asarray(vel)
    # ONE plan serves both passes: cell width >= max(ell3, ell6) (wider
    # cells are always correct), so the binning / packing / ghost-buffer
    # sizing is not rebuilt for the 6D criterion pass
    plan = SlabPlan(pos, linking_length * max(1.0, ell6dxfac), boxsize,
                    mesh)
    pfof3, ng3 = distributed_fof3d(pos, linking_length, boxsize, mesh,
                                   min_size=min_size, plan=plan)
    if ng3 == 0:
        return pfof3, 0, pfof3, 0
    sig2 = _velocity_scales_sharded(plan, vel, mass, pfof3, ng3)
    if not adaptive:
        sig2 = jnp.full_like(sig2, sig2[1])   # largest group's scale
    vscale2 = jnp.where(
        pfof3 > 0,
        jnp.maximum(sig2[jnp.clip(pfof3, 0, ng3)] * ell6dvfac ** 2,
                    1e-30), 1.0)
    pfof6, ng6 = distributed_fof3d(
        pos, linking_length * ell6dxfac, boxsize, mesh, min_size=min_size,
        vel=vel, vscale2=vscale2, group=pfof3, plan=plan)
    return pfof6, ng6, pfof3, ng3


def _velocity_scales_sharded(plan: SlabPlan, vel, mass, pfof3,
                             ng3: int) -> jnp.ndarray:
    """(ng3+1,) per-group velocity dispersions sigma_v^2 (DEVICE array),
    reduced over the mesh: each device computes partial mass-weighted
    segment sums over its block and ``psum`` combines them (the analog of
    the reference's MPI_Allreduce over group bulk quantities,
    search.cxx:443-499)."""
    ng1 = ng3 + 1
    sh = NamedSharding(plan.mesh, P(PARTS_AXIS))
    w = jnp.where(jnp.asarray(pfof3) > 0,
                  jnp.asarray(mass, jnp.float32), 0.0)
    pay = jnp.concatenate([jnp.asarray(vel, jnp.float32), w[:, None]], 1)
    pay_b = jax.device_put(
        _pack_cols(pay, plan._dest, plan.ndev, plan.npad), sh)
    grp_flat = jnp.zeros(plan.ndev * plan.npad, jnp.int32).at[
        plan._dest].set(jnp.asarray(pfof3, jnp.int32))
    grp_b = jax.device_put(grp_flat.reshape(plan.ndev, plan.npad), sh)

    def body(pay_blk, grp_blk):
        v = pay_blk[0, :, :3]
        w_l = pay_blk[0, :, 3]
        g = grp_blk[0]
        msum = jnp.zeros(ng1, jnp.float32).at[g].add(w_l)
        vsum = jnp.stack(
            [jnp.zeros(ng1, jnp.float32).at[g].add(w_l * v[:, j])
             for j in range(3)], axis=-1)
        msum = coll.psum(msum, PARTS_AXIS)
        vsum = coll.psum(vsum, PARTS_AXIS)
        vmean = vsum / jnp.maximum(msum, 1e-30)[:, None]
        dv2 = jnp.sum((v - vmean[g]) ** 2, axis=-1)
        s2 = jnp.zeros(ng1, jnp.float32).at[g].add(w_l * dv2)
        s2 = coll.psum(s2, PARTS_AXIS)
        return s2 / jnp.maximum(msum, 1e-30)

    mapped = jax.shard_map(body, mesh=plan.mesh,
                           in_specs=(P(PARTS_AXIS), P(PARTS_AXIS)),
                           out_specs=P())
    return jax.jit(mapped)(pay_b, grp_b)
