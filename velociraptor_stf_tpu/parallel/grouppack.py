"""Device-side whole-groups-per-device packing for the mesh pipeline.

Shared by the sharded unbind and property stages (the analog of the
reference's ``MPIGroupExchange`` particle migration,
/root/reference/src/mpiroutines.cxx:2548): groups are dealt to devices by
serpentine-LPT and each device's block holds its groups' particles
contiguously (group-sorted).

Unlike the round-3 host-numpy prepass (bincount/argsort/scatter over the
FULL particle set on the host), every O(N) step here is a jitted device
program on the already-device-resident arrays; the host only sees the
per-GROUP metadata it needs for static decisions — the (ng+1,) size
histogram feeding the LPT deal and the per-device loads sizing the block
padding.  At 1024^3 scale that is the difference between shipping ~30 GB
through the host per stage boundary and shipping a few MB of group sizes
(the reference's design goal too: particles never congregate on one rank,
mpiroutines.cxx:49-230).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..utils.transfer import fetch_small
from . import collectives as col
from .mesh import PARTS_AXIS


def assign_groups_lpt(sizes: np.ndarray, ndev: int) -> np.ndarray:
    """Size-balanced group -> device assignment, fully vectorised.

    Groups sorted largest-first are dealt in SERPENTINE rounds
    (0..ndev-1, ndev-1..0, ...), the closed-form cousin of greedy LPT:
    each device receives one group per round, and the direction flip
    pairs every round's largest remainder with the previous round's
    lightest device.  O(ng log ng) host work on per-GROUP arrays only.
    Results are assignment-independent — per-group stages are local —
    so only balance matters.  ``sizes``: (ng+1,) counts (entry 0
    ignored)."""
    ng = len(sizes) - 1
    order = np.argsort(-sizes[1:], kind="stable") + 1
    k = np.arange(ng, dtype=np.int64)
    pos = k % ndev
    dev = np.where((k // ndev) % 2 == 0, pos, ndev - 1 - pos)
    dev_of = np.zeros(ng + 1, np.int32)
    dev_of[order] = dev.astype(np.int32)
    return dev_of


@dataclass
class GroupBlocks:
    """Static plan + device scatter maps for one group->device deal."""

    mesh: Mesh
    ndev: int
    npad: int                 # slots per device block
    ng_loc: int               # max groups on any device
    dev_of: np.ndarray        # (ng+1,) host: device of each global gid
    gid_local: np.ndarray     # (ng+1,) host: 1..k_d local id per global gid
    dest: jnp.ndarray         # (n,) device: flat block slot (sink = ndev*npad)
    src_b: jnp.ndarray        # (ndev, npad) device: original index (n = pad)
    n: int

    def pack(self, arr, fill=0.0):
        """Scatter a per-particle device array into the sharded block
        layout (untagged particles drop)."""
        return _pack_blocks(jnp.asarray(arr), self.dest, self.ndev,
                            self.npad, fill,
                            NamedSharding(self.mesh, P(PARTS_AXIS)))

    def pack_local_gids(self, pfof):
        """Block of LOCAL group ids (1..k_d per device, 0 = padding)."""
        gl = jnp.asarray(self.gid_local)
        return _pack_blocks(gl[jnp.clip(jnp.asarray(pfof), 0,
                                        len(self.gid_local) - 1)],
                            self.dest, self.ndev, self.npad, 0,
                            NamedSharding(self.mesh, P(PARTS_AXIS)))

    def unpack(self, blk, fill=0, dtype=None):
        """Scatter a (ndev, npad[, k]) block back to original particle
        order on device (padding slots drop)."""
        return _unpack_blocks(blk, self.src_b, self.n, fill, dtype)


@partial(jax.jit, static_argnames=("ndev", "npad", "fill", "sh"))
def _pack_blocks(arr, dest, ndev: int, npad: int, fill, sh):
    # column-wise scatters for (n, k<128) arrays: a row scatter's update
    # operand is lane-padded k -> 128 by the XLA:TPU layout (the ~43x
    # HBM blowup; same rule as SlabPlan._pack3)
    if arr.ndim == 2:
        cols = [jnp.full(ndev * npad, fill, arr.dtype).at[dest].set(
            arr[:, k], mode="drop") for k in range(arr.shape[1])]
        out = jnp.stack(cols, axis=-1)
    else:
        out = jnp.full((ndev * npad,), fill, arr.dtype).at[dest].set(
            arr, mode="drop")
    blocks = out.reshape((ndev, npad) + arr.shape[1:])
    col.count_reshard("grouppack", blocks)
    return jax.device_put(blocks, sh)


@partial(jax.jit, static_argnames=("n", "fill", "dtype"))
def _unpack_blocks(blk, src_b, n: int, fill, dtype):
    flat = blk.reshape((-1,) + blk.shape[2:])
    dt = flat.dtype if dtype is None else dtype
    src = src_b.reshape(-1)
    if flat.ndim == 2:
        cols = [jnp.full(n, fill, dt).at[src].set(
            flat[:, k].astype(dt), mode="drop")
            for k in range(flat.shape[1])]
        return jnp.stack(cols, axis=-1)
    return jnp.full(n, fill, dt).at[src].set(flat.astype(dt), mode="drop")


@partial(jax.jit, static_argnames=("ng1",))
def _group_sizes_dev(pfof, ng1: int):
    g = jnp.clip(pfof, 0, ng1 - 1)
    return jnp.zeros(ng1, jnp.int32).at[g].add(
        (pfof > 0).astype(jnp.int32))


@partial(jax.jit, static_argnames=("ndev", "ng1"))
def _dest_and_load(pfof, dev_of, gid_local, ndev: int, ng1: int):
    """Per-particle (device, local-gid) sort -> flat slot rank within the
    destination device; also the per-device tagged loads."""
    n = pfof.shape[0]
    g = jnp.clip(pfof, 0, ng1 - 1)
    tagged = pfof > 0
    dev_p = jnp.where(tagged, dev_of[g], ndev)
    key = dev_p * jnp.int32(ng1 + 1) + jnp.where(tagged, gid_local[g], 0)
    order = jnp.argsort(key, stable=True).astype(jnp.int32)
    dev_sorted = dev_p[order]
    load = jnp.zeros(ndev + 1, jnp.int32).at[
        jnp.clip(dev_sorted, 0, ndev)].add(
        (dev_sorted < ndev).astype(jnp.int32))[:ndev]
    start = jnp.concatenate([jnp.zeros(1, jnp.int32),
                             jnp.cumsum(load)])
    slot_sorted = jnp.arange(n, dtype=jnp.int32) - start[
        jnp.clip(dev_sorted, 0, ndev)]
    return order, dev_sorted, slot_sorted, load


def plan_group_blocks(pfof, num_groups: int, mesh: Mesh,
                      sizes: Optional[np.ndarray] = None,
                      min_npad: int = 512) -> Optional[GroupBlocks]:
    """Build the deal for a device-resident ``pfof``.

    Host sees only (ng+1,) sizes and (ndev,) loads; the O(N) argsort and
    the scatter maps stay on device.  Returns None when no particle is
    tagged."""
    pfof = jnp.asarray(pfof)
    n = pfof.shape[0]
    ndev = mesh.devices.size
    ng1 = num_groups + 1
    assert ndev * (ng1 + 1) < 2 ** 31, "device/gid sort key needs int64"
    if sizes is None:
        sizes = np.asarray(fetch_small(_group_sizes_dev(pfof, ng1)))
    sizes = np.asarray(sizes).copy()
    sizes[0] = 0
    if sizes.sum() == 0:
        return None

    dev_of = assign_groups_lpt(sizes, ndev)
    # local gids 1..k_d in ascending global-id order (deterministic:
    # ejection/property order matches the single-device run)
    gsel = np.nonzero(sizes)[0]
    d_of = dev_of[gsel]
    k_of_dev = np.bincount(d_of, minlength=ndev).astype(np.int64)
    dstart = np.zeros(ndev, np.int64)
    dstart[1:] = np.cumsum(k_of_dev)[:-1]
    gorder = np.argsort(d_of, kind="stable")
    rank_in_dev = np.empty(len(gsel), np.int64)
    rank_in_dev[gorder] = np.arange(len(gsel)) - dstart[d_of[gorder]]
    gid_local = np.zeros(ng1, np.int32)
    gid_local[gsel] = (rank_in_dev + 1).astype(np.int32)
    ng_loc = int(k_of_dev.max()) if len(gsel) else 0

    dev_of_d = jnp.asarray(dev_of)
    gid_local_d = jnp.asarray(gid_local)
    order, dev_sorted, slot_sorted, load = _dest_and_load(
        pfof, dev_of_d, gid_local_d, ndev, ng1)
    load_h = np.asarray(fetch_small(load))
    npad = max(int(load_h.max()), min_npad, 1)
    npad = 1 << int(math.ceil(math.log2(npad)))

    dest = _scatter_dest(order, dev_sorted, slot_sorted, ndev, npad)
    sh = NamedSharding(mesh, P(PARTS_AXIS))
    src_b = _pack_blocks(jnp.arange(n, dtype=jnp.int32), dest, ndev, npad,
                         n, sh)
    return GroupBlocks(mesh=mesh, ndev=ndev, npad=npad, ng_loc=ng_loc,
                       dev_of=dev_of, gid_local=gid_local, dest=dest,
                       src_b=src_b, n=n)


@partial(jax.jit, static_argnames=("ndev", "npad"))
def _scatter_dest(order, dev_sorted, slot_sorted, ndev: int, npad: int):
    n = order.shape[0]
    sink = jnp.int32(ndev * npad)
    flat = jnp.where(dev_sorted < ndev,
                     dev_sorted * npad + slot_sorted, sink)
    return jnp.full(n, sink, jnp.int32).at[order].set(flat)
