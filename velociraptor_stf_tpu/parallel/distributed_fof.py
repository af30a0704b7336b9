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
from .mesh import PARTS_AXIS

_BIG_I32 = np.int32(np.iinfo(np.int32).max)


def _windows_dense_xclip(cid_sorted, coords, dims: Tuple[int, int, int]):
    """Stencil windows over a local grid: x clipped (ghost columns pad the
    slab), y and z periodic (each slab spans the full box in y,z).

    Variant of fof._candidate_counts_dense with per-axis boundary handling;
    returns (pst, pcn) of shape (N, 18).
    """
    nx, ny, nz = dims
    total = nx * ny * nz
    hist = jnp.zeros(total + 1, jnp.int32).at[cid_sorted + 1].add(1)
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
    return jnp.stack(psts + bsts, axis=1), jnp.stack(pcns + bcns, axis=1)


def _take_first_k(mask: jnp.ndarray, k: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Indices of the first k True entries (padded with 0, validity mask)."""
    n = mask.shape[0]
    pos = jnp.cumsum(mask) - 1
    dest = jnp.where(mask, pos, k)
    idx = jnp.zeros(k, jnp.int32).at[dest].set(
        jnp.arange(n, dtype=jnp.int32), mode="drop")
    ok = jnp.arange(k) < jnp.sum(mask)
    return idx, ok


def distributed_fof3d(pos, linking_length: float, boxsize: float,
                      mesh: Mesh, min_size: int = 8,
                      max_outer: int = 64,
                      vel=None, vscale2=None, group=None):
    """FOF over a periodic box, sharded by x-slab over the mesh.

    Returns (pfof, ngroups): pfof in the ORIGINAL particle order (host
    numpy), group ids 1..ngroups by decreasing size (matching fof.fof3d).

    With ``vel``/``vscale2``/``group`` given, pairs link under the 6D
    phase-space criterion  d2/ell^2 + dv2/vscale2 <= 1  restricted to the
    same nonzero parent ``group`` (the distributed analog of the 6DFOF
    refinement, reference search.cxx:552-576) — the velocity and parent-id
    payloads ride the same ppermute ghost exchange as the positions.
    """
    ndev = mesh.devices.size
    pos = np.asarray(pos)
    n = pos.shape[0]
    assert n < 2 ** 31, "int32 global particle ids"
    dt = pos.dtype

    # --- global grid: nx divisible by ndev, cell width >= linking length --
    # (cells-per-dim capped so the per-device dense prefix table stays
    # small; wider cells are always correct, just more candidates)
    nx_max = max(3, int(boxsize / max(linking_length, 1e-30)))
    nxt = min(nx_max, 256)
    W = max(3, nxt // ndev)
    nx = W * ndev
    ny = nz = min(nx_max, 256)
    wx, wy, wz = boxsize / nx, boxsize / ny, boxsize / nz

    # --- host: assign particles to slabs, pad each shard ------------------
    xc = np.floor(pos[:, 0] / wx).astype(np.int64) % nx
    yc = np.floor(pos[:, 1] / wy).astype(np.int64) % ny
    zc = np.floor(pos[:, 2] / wz).astype(np.int64) % nz
    dev = (xc // W).astype(np.int64)
    order = np.argsort(dev, kind="stable")
    counts = np.bincount(dev, minlength=ndev)
    npad = int(1 << math.ceil(math.log2(max(counts.max(), 1))))
    sixd = vel is not None
    pos_b = np.zeros((ndev, npad, 3), dt)
    gid_b = np.full((ndev, npad), n, np.int32)   # n = invalid sentinel
    # 6D payloads: float vel(3)+vscale2, parent ids as int32 (a float
    # payload would collapse distinct ids above 2^24); zero-width when the
    # plain 3D criterion runs so no payload rides the ghost exchange
    pay_b = np.zeros((ndev, npad, 4 if sixd else 0), dt)
    grp_b = np.zeros((ndev, npad), np.int32)
    off = 0
    for d in range(ndev):
        c = counts[d]
        sel = order[off:off + c]
        pos_b[d, :c] = pos[sel]
        gid_b[d, :c] = sel
        if sixd:
            pay_b[d, :c, :3] = np.asarray(vel)[sel]
            pay_b[d, :c, 3] = np.maximum(np.asarray(vscale2)[sel], 1e-30)
            grp_b[d, :c] = np.asarray(group)[sel]
        off += c
    valid_b = gid_b < n

    # boundary buffer size: max particles in any single boundary x-column
    colcount = np.bincount(xc, minlength=nx)
    bmax = int(max(colcount[0:nx:W].max(), colcount[W - 1:nx:W].max(), 1))
    B = 1 << math.ceil(math.log2(bmax))

    # exact per-device candidate-slot totals: sum over cells of
    # n_c * (stencil-sum of counts), computed on the global count grid
    # (production note: at >1e9 particles this host prepass moves on-device)
    cnt3 = np.bincount((xc * ny + yc) * nz + zc,
                       minlength=nx * ny * nz).reshape(nx, ny, nz)
    sten = np.zeros_like(cnt3)
    for dyo in (-1, 0, 1):
        for dzo in (-1, 0, 1):
            sten += np.roll(np.roll(cnt3, dyo, axis=1), dzo, axis=2)
    t_max = 0
    for d in range(ndev):
        xs = np.arange(d * W - 1, (d + 1) * W + 1) % nx
        lc = cnt3[xs]                       # (W+2, ny, nz) incl. ghosts
        ls = sten[xs]
        # x-stencil with clipping at the local grid edges
        tot = int(np.sum(lc * ls))          # dxo = 0
        tot += int(np.sum(lc[1:] * ls[:-1]))   # dxo = -1
        tot += int(np.sum(lc[:-1] * ls[1:]))   # dxo = +1
        t_max = max(t_max, tot)
    t_pad = 1 << math.ceil(math.log2(max(t_max, 1024)))

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
            p = jax.lax.ppermute(pos_l[idx], PARTS_AXIS, perm)
            g = jax.lax.ppermute(jnp.where(ok, gid_l[idx], n), PARTS_AXIS,
                                 perm)
            o = jax.lax.ppermute(ok, PARTS_AXIS, perm)
            if sixd:
                y = jax.lax.ppermute(pay_l[idx], PARTS_AXIS, perm)
                r = jax.lax.ppermute(grp_l[idx], PARTS_AXIS, perm)
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
        cid = jnp.where(cvalid, cid, (W + 2) * ny * nz - 1)
        sorder = jnp.argsort(cid).astype(jnp.int32)
        cid_s = cid[sorder]
        pos_s = cpos[sorder]
        gid_s = cgid[sorder]
        valid_s = cvalid[sorder]
        coords_s = jnp.stack([xrel[sorder], cy[sorder], cz[sorder]], axis=1)

        pay_s = cpay[sorder]
        grp_s = cgrp[sorder]

        pst, pcn = _windows_dense_xclip(cid_s, coords_s, dims)
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
            outR = jax.lax.ppermute(
                jnp.where(okR, newglab[sR], jnp.int32(n)), PARTS_AXIS, fwd)
            outL = jax.lax.ppermute(
                jnp.where(okL, newglab[sL], jnp.int32(n)), PARTS_AXIS, bwd)
            newglab = newglab.at[ghostL_slots].min(outR)
            newglab = newglab.at[ghostR_slots].min(outL)
            changed = jnp.sum((newglab != glab).astype(jnp.int32))
            changed = jax.lax.psum(changed, PARTS_AXIS)
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

    sh = NamedSharding(mesh, P(PARTS_AXIS))
    pos_d = jax.device_put(pos_b, sh)
    gid_d = jax.device_put(gid_b, sh)
    val_d = jax.device_put(valid_b, sh)
    pay_d = jax.device_put(pay_b, sh)
    grp_d = jax.device_put(grp_b, sh)

    mapped = jax.shard_map(
        shard_body, mesh=mesh,
        in_specs=(P(PARTS_AXIS), P(PARTS_AXIS), P(PARTS_AXIS),
                  P(PARTS_AXIS), P(PARTS_AXIS)),
        out_specs=(P(PARTS_AXIS), P(PARTS_AXIS)))
    labels_b, gid_out = jax.jit(mapped)(pos_d, gid_d, val_d, pay_d, grp_d)

    labels_flat = np.asarray(jax.device_get(labels_b)).reshape(-1)
    gid_flat = np.asarray(jax.device_get(gid_out)).reshape(-1)
    ok = gid_flat < n
    # scatter to original particle order; labels are min global ids
    raw = np.zeros(n, np.int64)
    raw[gid_flat[ok]] = labels_flat[ok]
    # renumber by size (same semantics as fof.renumber_by_size)
    roots, counts_r = np.unique(raw, return_counts=True)
    eligible = counts_r >= min_size
    sel = np.argsort(np.where(eligible, -counts_r, 0), kind="stable")
    gid_of_root = np.zeros(len(roots), np.int64)
    ngroups = int(eligible.sum())
    rank = 0
    for s in sel:
        if eligible[s]:
            rank += 1
            gid_of_root[s] = rank
    pfof = gid_of_root[np.searchsorted(roots, raw)]
    return pfof.astype(np.int32), ngroups


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
    Returns (pfof6, ng6, pfof3, ng3) in original particle order.
    """
    pos = np.asarray(pos)
    vel = np.asarray(vel)
    mass = np.asarray(mass)
    pfof3, ng3 = distributed_fof3d(pos, linking_length, boxsize, mesh,
                                   min_size=min_size)
    if ng3 == 0:
        return pfof3, 0, pfof3, 0
    ng1 = ng3 + 1
    w = np.where(pfof3 > 0, mass, 0.0)
    msum = np.maximum(np.bincount(pfof3, weights=w, minlength=ng1), 1e-30)
    vmean = np.stack([np.bincount(pfof3, weights=w * vel[:, j],
                                  minlength=ng1) for j in range(3)], -1) \
        / msum[:, None]
    dv2 = np.sum((vel - vmean[pfof3]) ** 2, -1)
    sig2 = np.bincount(pfof3, weights=w * dv2, minlength=ng1) / msum
    if not adaptive:
        sig2 = np.full_like(sig2, sig2[1])   # largest group's scale
    vscale2 = np.where(pfof3 > 0,
                       np.maximum(sig2[pfof3] * ell6dvfac ** 2, 1e-30), 1.0)
    pfof6, ng6 = distributed_fof3d(
        pos, linking_length * ell6dxfac, boxsize, mesh, min_size=min_size,
        vel=vel, vscale2=vscale2, group=pfof3)
    return pfof6, ng6, pfof3, ng3
