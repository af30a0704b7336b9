"""Microbenchmark TPU gather variants at 512^3-subset scale: plain
vs indices_are_sorted/unique hints, single-row vs multi-row take, and
the pointer-jump gather — to decide how to attack the gather-bound
subset build (~10 s) and the per-sweep jump cost (~1.1 s).

Usage: python tools/micro_gather.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("VR_JAX_CACHE", "/tmp/vr_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp


def sync(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    while leaf.ndim > 1:
        leaf = leaf[-1]
    jax.device_get(leaf[-1:])


def timeit(name, fn, *args, reps=5):
    out = fn(*args)
    sync(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    sync(out)
    print(f"{name}: {(time.time() - t0) / reps * 1e3:.1f} ms", flush=True)


def main():
    NS = 140 * (1 << 20)          # source slots (~141M, full-ctx scale)
    NK = 42 * (1 << 20)           # kept slots (~42M, pruned scale)
    key = jax.random.PRNGKey(0)
    src = jax.random.normal(key, (NS,), jnp.float32)
    srci = jax.random.randint(key, (NS,), 0, 1 << 30, jnp.int32)
    # sorted subset indices (the compaction pattern)
    idx_sorted = jnp.sort(jax.random.randint(key, (NK,), 0, NS, jnp.int32))
    # random indices (the pointer-jump pattern)
    idx_rand = jax.random.randint(key, (NK,), 0, NK, jnp.int32)
    sub_rand = src[:NK]
    sync((src, idx_sorted, idx_rand))

    timeit("gather 42M<-141M plain", jax.jit(lambda a, i: a[i]),
           src, idx_sorted)
    timeit("gather 42M<-141M sorted-hint",
           jax.jit(lambda a, i: a.at[i].get(indices_are_sorted=True)),
           src, idx_sorted)
    timeit("gather 42M<-141M sorted+unique",
           jax.jit(lambda a, i: a.at[i].get(indices_are_sorted=True,
                                            unique_indices=True)),
           src, idx_sorted)
    m4 = jnp.stack([srci] * 4)
    timeit("take (4,141M) axis=1 sorted-hint",
           jax.jit(lambda a, i: jnp.take(a, i, axis=1,
                                         indices_are_sorted=True)),
           m4, idx_sorted)
    timeit("4x row gather sorted-hint",
           jax.jit(lambda a, i: [a[k].at[i].get(indices_are_sorted=True)
                                 for k in range(4)]),
           m4, idx_sorted)
    timeit("jump gather 42M random plain",
           jax.jit(lambda a, i: a[i]), sub_rand, idx_rand)
    timeit("jump gather 42M random unique-lie",
           jax.jit(lambda a, i: a.at[i].get(unique_indices=True)),
           sub_rand, idx_rand)

    # ---- segment ops at unbind-ejection scale: 32M particles, 17k groups
    NT = 32 * (1 << 20)
    NG = 1 << 15
    gid_rand = jax.random.randint(key, (NT,), 0, NG, jnp.int32)
    gid_sorted = jnp.sort(gid_rand)
    vals = jax.random.normal(key, (NT,), jnp.float32)
    sync((gid_sorted, vals))

    timeit("scatter-add 32M unsorted gid",
           jax.jit(lambda v, g: jnp.zeros(NG, jnp.float32).at[g].add(v)),
           vals, gid_rand)
    timeit("scatter-add 32M sorted gid",
           jax.jit(lambda v, g: jnp.zeros(NG, jnp.float32).at[g].add(v)),
           vals, gid_sorted)
    timeit("segment_sum 32M sorted hint",
           jax.jit(lambda v, g: jax.ops.segment_sum(
               v, g, NG, indices_are_sorted=True)),
           vals, gid_sorted)
    gv = jax.random.normal(key, (NG,), jnp.float32)
    timeit("broadcast gather 32M unsorted gid",
           jax.jit(lambda a, g: a[g]), gv, gid_rand)
    timeit("broadcast gather 32M sorted hint",
           jax.jit(lambda a, g: a.at[g].get(indices_are_sorted=True)),
           gv, gid_sorted)
    timeit("cumsum 32M f32", jax.jit(jnp.cumsum), vals)
    timeit("lexsort 32M (f32, i32)",
           jax.jit(lambda e, g: jnp.lexsort((e, g))), vals, gid_rand)


if __name__ == "__main__":
    main()
