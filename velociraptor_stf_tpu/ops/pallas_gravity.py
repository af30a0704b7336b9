"""Pallas TPU direct-sum gravitational potential over group-sorted arrays.

Replaces the bucketed direct / Barnes-Hut classes of ops/gravity.py on the
unbinding hot path (reference KD-tree monopole walk,
/root/reference/src/unbind.cxx:1480,1607 + MarkCell:24-45) for groups up to
``MAX_DIRECT`` particles: at halo-finder group sizes (up to ~1e6) a dense
tiled direct sum on the VPU beats any tree — the streaming kernel sustains
~1.2e11 pairs/s while tree construction alone is gather-bound.

Layout/structure mirrors ops/pallas_fof.py: particles sorted by group id,
each 512-row block interacts with ONE contiguous sorted-index coverage
range (first to last group overlapping the block), chunk-DMA'd double
buffered, criterion = same nonzero group id and i != j.  d^2 uses
coordinate differences (exact f32; see pallas_fof.py layout notes).
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R_BLOCK = 512
CH = 512

# Groups larger than this keep the bucket-tree path.  Measured on v5e at
# 512^3 (29 groups of 131k-503k particles): the streaming kernel sustains
# ~1.2e11 pairs/s, so a direct group costs ~8.3e-12*s^2 s, while the
# vmapped bucket tree costs ~10.7e-6*s s (HBM-bound (q,q) tiles + cross
# -lane pair padding) — break-even ~1.3e6 particles.  Below the cut the
# exact direct sum is both faster AND exact (no monopole error).
MAX_DIRECT = 1 << 20


def _pot_kernel(eps2, rng_ref, rm_ref, m_hbm, out_ref, cm_, sem):
    """Merged int32 stream (one DMA descriptor per chunk — descriptor
    issue, not bandwidth, is the per-chunk overhead; see pallas_fof.py):
    rows 0-2 position bits (bitcast f32), row 3 mass bits, row 4 gid,
    rows 5-7 unused (Mosaic DMA row-slices must align to the 8-row tile;
    see pallas_fof.py's 6D kernel note)."""
    b = pl.program_id(0)
    br = jax.lax.rem(b, 8)
    c0 = rng_ref[br, 0]
    nch = rng_ref[br, 1]
    # lane-major row operands ((k, R) slices of the chunk-DMA array)
    # transposed once per block — row-major HBM operands would be
    # tile-padded k -> 128 by the (8,128) layout (see pallas_fof.py)
    rm = rm_ref[:].T                                # (R,8) i32
    rp = jax.lax.bitcast_convert_type(rm[:, 0:3], jnp.float32)
    rg = rm[:, 4:5]                                 # (R,1)
    row_ids = (b * R_BLOCK +
               jax.lax.broadcasted_iota(jnp.int32, (R_BLOCK, 1), 0))

    def get_dmas(off, slot):
        return (
            pltpu.make_async_copy(m_hbm.at[:, pl.ds(off, CH)],
                                  cm_.at[slot], sem.at[slot]),
        )

    @pl.when(nch > 0)
    def _():
        for dma in get_dmas(c0 * CH, 0):
            dma.start()

    def body(i, acc):
        slot = jax.lax.rem(i, 2)
        off = (c0 + i) * CH

        @pl.when(i + 1 < nch)
        def _():
            for dma in get_dmas((c0 + i + 1) * CH, 1 - slot):
                dma.start()

        for dma in get_dmas(off, slot):
            dma.wait()
        cm = cm_[slot]                              # (8,CH) i32
        cp = jax.lax.bitcast_convert_type(cm[0:3, :], jnp.float32)
        cmass = jax.lax.bitcast_convert_type(cm[3:4, :], jnp.float32)
        cg = cm[4:5, :]
        dx = rp[:, 0:1] - cp[0:1, :]
        d2 = dx * dx
        dy = rp[:, 1:2] - cp[1:2, :]
        d2 += dy * dy
        dz = rp[:, 2:3] - cp[2:3, :]
        d2 += dz * dz
        col_ids = off + jax.lax.broadcasted_iota(jnp.int32, (1, CH), 1)
        ok = (rg == cg) & (rg > 0) & (row_ids != col_ids)
        contrib = jnp.where(ok, cmass * jax.lax.rsqrt(d2 + eps2), 0.0)
        return acc + jnp.sum(contrib, axis=1, keepdims=True)

    phi = jax.lax.fori_loop(
        0, nch, body, jnp.zeros((R_BLOCK, 1), jnp.float32))
    out_ref[:] = phi.T                              # (1,R)


def _make_pot(ns_pad: int, eps2: float):
    nblocks = ns_pad // R_BLOCK
    return pl.pallas_call(
        partial(_pot_kernel, np.float32(eps2)),
        out_shape=jax.ShapeDtypeStruct((1, ns_pad), jnp.float32),
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((8, 128), lambda b: (b // 8, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((8, R_BLOCK), lambda b: (0, b),
                         memory_space=pltpu.VMEM),   # rows = merged slice
            pl.BlockSpec(memory_space=pl.ANY),       # merged columns
        ],
        out_specs=pl.BlockSpec((1, R_BLOCK), lambda b: (0, b),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, 8, CH), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )


@partial(jax.jit, static_argnames=("ns_pad", "eps2"))
def potential_group_sorted(pos_s, mass_s, gid_s, offsets, ns_pad: int,
                           eps2: float):
    """Phi_i = sum_{j in group(i), j != i} m_j / sqrt(d^2 + eps^2) for
    group-sorted arrays (group 0 = untagged/padding, skipped).

    ``offsets``: (ng+2,) group slice boundaries into the sorted arrays
    (group g occupies [offsets[g], offsets[g+1])).  Groups larger than
    MAX_DIRECT must be handled by the caller (tree path) — their blocks
    still compute here, so exclude them from ``gid_s`` (set to 0) first.
    Returns (ns,) Phi (unscaled; multiply by -G outside).
    """
    ns = pos_s.shape[0]
    pad = ns_pad - ns
    # lane-major only: rows are (k, R_BLOCK) slices of the same array the
    # chunk DMA streams (row-major operands would be tile-padded k -> 128).
    # Merged int32: pos/mass travel as raw bits (pure copies, bitcast in
    # the kernel), gid as int — one DMA descriptor per chunk.
    gid_pad = jnp.concatenate([gid_s, jnp.zeros(pad, jnp.int32)])
    sent_bits = np.int32(np.float32(1e15).view(np.int32))
    merged = jnp.full((8, ns_pad + CH), sent_bits, jnp.int32)
    merged = merged.at[0:3, :ns].set(jax.lax.bitcast_convert_type(
        pos_s.T.astype(jnp.float32), jnp.int32))
    merged = merged.at[3, :].set(0)                 # mass 0.0 bits
    merged = merged.at[3, :ns].set(jax.lax.bitcast_convert_type(
        mass_s.astype(jnp.float32), jnp.int32))
    merged = merged.at[4:8, :].set(0)
    merged = merged.at[4, :ns].set(gid_s)

    # per-block coverage [offsets[gmin], offsets[gmax+1]) from the MIN and
    # MAX NONZERO gid in each block: zeroed runs (untagged particles,
    # padding, or callers masking >MAX_DIRECT groups to 0 anywhere in the
    # order) neither empty a mixed block's range nor drag its start down
    # to offsets[1]
    nblocks = ns_pad // R_BLOCK
    gblk = gid_pad.reshape(nblocks, R_BLOCK)
    big = jnp.int32(np.iinfo(np.int32).max)
    gmin = jnp.min(jnp.where(gblk > 0, gblk, big), axis=1)
    gmax = jnp.max(gblk, axis=1)
    ng1 = offsets.shape[0] - 1
    s = offsets[jnp.clip(gmin, 0, ng1)]
    e = offsets[jnp.clip(gmax + 1, 0, ng1)]
    has_rows = (gmax > 0) & (gmin != big)
    s = jnp.where(has_rows, s, 0)
    e = jnp.where(has_rows, e, 0)
    c0ch = s // CH
    nch = jnp.maximum(-(-(e - c0ch * CH) // CH), 0)
    nch = jnp.where(e > s, nch, 0)
    nb8 = -(-nblocks // 8) * 8
    ranges = jnp.zeros((nb8, 128), jnp.int32)
    ranges = ranges.at[:nblocks, 0].set(c0ch)
    ranges = ranges.at[:nblocks, 1].set(nch)

    phi = _make_pot(ns_pad, float(eps2))(ranges, merged, merged)
    return phi[0, :ns]


_COMPILE_FAILED = False


def mark_compile_failed() -> None:
    """Latch set by callers when the kernel fails to lower/compile on the
    local backend; every subsequent availability check routes to the XLA
    fallback instead of re-raising per call."""
    global _COMPILE_FAILED
    _COMPILE_FAILED = True
    from ..utils import telemetry

    telemetry.count("pallas_gravity_compile_fallbacks")


def pallas_potential_available() -> bool:
    env = os.environ.get("VR_POT_PALLAS")
    if env == "0":
        return False
    if env == "1":
        return True   # forced: let compile errors surface
    return not _COMPILE_FAILED and jax.default_backend() == "tpu"
