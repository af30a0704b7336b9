"""Probe: verify the Pallas FOF sweep kernel building blocks on this
JAX/Mosaic version.

Layout rules learned (axon TPU v5e, jax 0.9):
 - HBM arrays DMA-sliced at dynamic offsets must slice ONLY the lane
   (last) dim, with 128-aligned offsets/sizes; other dims full.
 - 1D arrays tile at (1024,) -> use 2D (1, N) instead.
 - No cheap transposes in-kernel: rows need sublane-major layout (R, 4)
   and cols lane-major (4, CH) so (R,1)x(1,CH) broadcasts work directly.
 - d^2 must be computed from coordinate differences (norm expansion
   cancels catastrophically at box-scale coordinates).
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("VR_JAX_CACHE", "/tmp/vr_jax_cache"))
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    R, CH = 256, 256
    N = 4096
    b2 = 0.01
    rng = np.random.default_rng(0)
    pos = (rng.random((N, 3), np.float32) * 100).astype(np.float32)
    lab = np.arange(N, dtype=np.int32)
    nblocks = N // R
    S = rng.integers(0, N // 2, nblocks).astype(np.int32)
    E = (S + rng.integers(1, N // 2, nblocks)).astype(np.int32)
    S_ch = (S // CH).astype(np.int32)
    NCH = (-(-(E - S_ch * CH) // CH)).astype(np.int32)

    BIG = np.int32(2**31 - 1)
    SENT = np.float32(1e15)

    def kernel(rng_ref, rpos_ref, rlab_ref, pos_hbm, lab_hbm, out_ref,
               cpos, clab, sem1, sem2):
        b = pl.program_id(0)
        c0 = rng_ref[b, 0]
        nch = rng_ref[b, 1]
        nmin0 = rlab_ref[:]                       # (R,1) own labels

        def body(i, nm):
            off = (c0 + i) * CH
            dma1 = pltpu.make_async_copy(
                pos_hbm.at[:, pl.ds(off, CH)], cpos, sem1)
            dma2 = pltpu.make_async_copy(
                lab_hbm.at[:, pl.ds(off, CH)], clab, sem2)
            dma1.start()
            dma2.start()
            dma1.wait()
            dma2.wait()
            dx = rpos_ref[:, 0:1] - cpos[0:1, :]   # (R,CH)
            d2 = dx * dx
            dy = rpos_ref[:, 1:2] - cpos[1:2, :]
            d2 += dy * dy
            dz = rpos_ref[:, 2:3] - cpos[2:3, :]
            d2 += dz * dz
            ok = d2 <= b2
            cand = jnp.where(ok, clab[:], BIG)     # (1,CH) -> (R,CH)
            return jnp.minimum(nm, jnp.min(cand, axis=1, keepdims=True))

        out_ref[:] = jax.lax.fori_loop(0, nch, body, nmin0)

    fn = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((N, 1), jnp.int32),
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((R, 4), lambda b: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, 1), lambda b: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((R, 1), lambda b: (b, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((4, CH), jnp.float32),
            pltpu.VMEM((1, CH), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
    )

    ranges = np.stack([S_ch, NCH], axis=1)        # (nblocks, 2)
    rows4 = np.zeros((N, 4), np.float32)
    rows4[:, :3] = pos
    pos4 = np.zeros((4, N), np.float32)
    pos4[:3] = pos.T
    posT = np.concatenate([pos4, np.full((4, CH), SENT, np.float32)], 1)
    lab_pad = np.concatenate([lab, np.full(CH, BIG, np.int32)])[None, :]

    t0 = time.time()
    out = np.asarray(jax.device_get(
        fn(jnp.asarray(ranges), jnp.asarray(rows4),
           jnp.asarray(lab[:, None]), jnp.asarray(posT),
           jnp.asarray(lab_pad))))[:, 0]
    print(f"compile+run: {time.time()-t0:.1f}s")

    ref = lab.copy()
    for b in range(nblocks):
        rows = slice(b * R, (b + 1) * R)
        lo = S_ch[b] * CH
        hi = min(lo + NCH[b] * CH, N)
        cols = np.arange(lo, hi)
        d2 = ((pos[rows, None, :] - pos[None, cols, :]) ** 2).sum(-1)
        ok = d2 <= b2
        cand = np.where(ok, lab[cols][None, :], BIG)
        ref[rows] = np.minimum(ref[rows], cand.min(axis=1))
    match = np.array_equal(out, ref)
    if not match:
        bad = np.nonzero(out != ref)[0]
        print(f"{bad.size} mismatches; first at {bad[:10]}")
    print("MATCH" if match else "MISMATCH")
    assert match


if __name__ == "__main__":
    main()
