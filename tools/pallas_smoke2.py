"""Smoke-test 2: layout details for the FOF merge kernel.

  4. DMA a (3, K) window from a (3, NP) HBM array at an UNALIGNED dynamic
     lane offset, plus a (1, K) int32 label window.
  5. broadcast pairwise distance tile (Q,1)-(1,K) + masked min-reduce.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("VR_JAX_CACHE", "/tmp/vr_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Q, K = 128, 512
NP = 1 << 14


def main():
    rng = np.random.default_rng(0)
    posw = jnp.asarray(rng.normal(size=(3, NP)).astype(np.float32))
    labw = jnp.asarray(rng.integers(0, 1 << 20, size=(1, NP)).astype(np.int32))
    posq = jnp.asarray(rng.normal(size=(NP, 3)).astype(np.float32))
    nb = NP // Q
    # odd, unaligned window starts
    starts = jnp.asarray((rng.integers(0, NP - K, size=(nb,)) | 1)
                         .astype(np.int32))
    lens = jnp.asarray(rng.integers(1, K + 1, size=(nb,)).astype(np.int32))
    b2 = np.float32(0.5)

    def kernel(starts_ref, lens_ref, posq_ref, posw_ref, labw_ref, o_ref,
               wpos, wlab, sem1, sem2):
        b = pl.program_id(0)
        s = starts_ref[b]
        ln = lens_ref[b]
        d1 = pltpu.make_async_copy(posw_ref.at[:, pl.ds(s, K)], wpos, sem1)
        d2_ = pltpu.make_async_copy(labw_ref.at[:, pl.ds(s, K)], wlab, sem2)
        d1.start()
        d2_.start()
        d1.wait()
        d2_.wait()
        qx = posq_ref[:, 0:1]
        qy = posq_ref[:, 1:2]
        qz = posq_ref[:, 2:3]
        dx = qx - wpos[0:1, :]
        dy = qy - wpos[1:2, :]
        dz = qz - wpos[2:3, :]
        d2 = dx * dx + dy * dy + dz * dz
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, K), 1)
        ok = (d2 <= b2) & (lane < ln)
        cand = jnp.where(ok, wlab[:], np.int32(2**31 - 1))
        o_ref[:] = jnp.min(cand, axis=1, keepdims=True)

    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((Q, 3), lambda b, s, l: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec((Q, 1), lambda b, s, l: (b, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((3, K), jnp.float32),
                        pltpu.VMEM((1, K), jnp.int32),
                        pltpu.SemaphoreType.DMA(()),
                        pltpu.SemaphoreType.DMA(())],
    )
    f = jax.jit(lambda s, l, q, w, lw: pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct((NP, 1), jnp.int32),
        grid_spec=gs)(s, l, q, w, lw))
    t0 = time.time()
    out = np.asarray(jax.device_get(f(starts, lens, posq, posw, labw)))
    t1 = time.time()

    # reference
    pw = np.asarray(posw)
    lw_ = np.asarray(labw)[0]
    pq = np.asarray(posq)
    sn = np.asarray(starts)
    ln_ = np.asarray(lens)
    want = np.full(NP, 2**31 - 1, np.int64)
    for b in range(nb):
        w = pw[:, sn[b]:sn[b] + ln_[b]]
        lab = lw_[sn[b]:sn[b] + ln_[b]]
        for i in range(Q):
            qi = pq[b * Q + i]
            d2 = ((qi[:, None] - w) ** 2).sum(0)
            sel = lab[d2 <= b2]
            if sel.size:
                want[b * Q + i] = sel.min()
    ok = np.array_equal(out[:, 0].astype(np.int64), want)
    print(f"4+5. unaligned DMA + pair tile: ok={ok}  ({t1-t0:.1f}s)")


if __name__ == "__main__":
    main()
