"""Smoke-test Pallas TPU support through the axon tunnel.

Tests, in order of increasing trust requirement:
  1. trivial VMEM elementwise kernel
  2. scalar-prefetch grid spec + manual HBM->VMEM DMA with dynamic offset
  3. pallas_call inside a lax.while_loop (the FOF sweep structure)
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


def sync(x):
    jax.device_get(x.ravel()[:1])


def main():
    print("devices:", jax.devices())

    # --- 1. trivial kernel ---
    def k1(x_ref, o_ref):
        o_ref[:] = x_ref[:] * 2.0

    x = jnp.arange(8 * 128, dtype=jnp.float32).reshape(8, 128)
    f1 = jax.jit(lambda x: pl.pallas_call(
        k1,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x))
    t0 = time.time()
    y = f1(x)
    sync(y)
    ok = np.allclose(np.asarray(jax.device_get(y)), np.asarray(x) * 2)
    print(f"1. trivial kernel: ok={ok}  ({time.time()-t0:.1f}s)")

    # --- 2. scalar prefetch + dynamic-offset DMA from HBM ---
    N, K = 1 << 16, 512

    KR = K // 128

    def k2(starts_ref, big_ref, o_ref, scratch, sem):
        b = pl.program_id(0)
        s = starts_ref[b]          # row-aligned window start
        dma = pltpu.make_async_copy(big_ref.at[pl.ds(s, KR), :], scratch,
                                    sem)
        dma.start()
        dma.wait()
        o_ref[b, :] = jnp.sum(scratch[:], axis=0)

    big = jnp.arange(N, dtype=jnp.float32).reshape(N // 128, 128)
    starts = jnp.array([0, 8, 248, N // 128 - KR], dtype=jnp.int32)
    nb = starts.shape[0]
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((KR, 128), jnp.float32),
                        pltpu.SemaphoreType.DMA(())],
    )
    f2 = jax.jit(lambda s, b: pl.pallas_call(
        k2, out_shape=jax.ShapeDtypeStruct((nb, 128), jnp.float32),
        grid_spec=gs)(s, b))
    t0 = time.time()
    y2 = np.asarray(jax.device_get(f2(starts, big)))
    bign = np.asarray(big)
    want = np.stack([bign[int(s):int(s) + KR].sum(0)
                     for s in np.asarray(starts)])
    print(f"2. prefetch+DMA: ok={np.allclose(y2, want)}  "
          f"({time.time()-t0:.1f}s)")

    # --- 3. pallas inside while_loop ---
    def k3(x_ref, o_ref):
        o_ref[:] = x_ref[:] + 1.0

    def step(x):
        return pl.pallas_call(
            k3, out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(x)

    @jax.jit
    def loop(x):
        def cond(c):
            x, it = c
            return it < 10
        def body(c):
            x, it = c
            return step(x), it + 1
        x, _ = jax.lax.while_loop(cond, body, (x, jnp.int32(0)))
        return x

    t0 = time.time()
    y3 = np.asarray(jax.device_get(loop(x)))
    print(f"3. pallas-in-while: ok={np.allclose(y3, np.asarray(x)+10)}  "
          f"({time.time()-t0:.1f}s)")


if __name__ == "__main__":
    main()
