"""Microbench TPU primitive costs through the axon tunnel."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("VR_JAX_CACHE", "/tmp/vr_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    def sync(x):
        jax.device_get(x.ravel()[:1])

    def timeit(label, fn, reps=3):
        out = fn()
        leaves = [l for l in jax.tree_util.tree_leaves(out)
                  if hasattr(l, "ravel")]
        sync(leaves[0])
        ts = []
        for _ in range(reps):
            t0 = time.time()
            out = fn()
            sync(jax.tree_util.tree_leaves(out)[0])
            ts.append(time.time() - t0)
        print(f"{label:44s} {min(ts)*1000:9.1f} ms")

    key = jax.random.PRNGKey(0)

    # cumsum over large int32 arrays
    for sz in (1 << 24, 1 << 28):
        x = jnp.ones(sz, jnp.int32)
        f = jax.jit(lambda a: jnp.cumsum(a))
        timeit(f"cumsum int32 n={sz:.1e}", lambda: f(x))

        def two_level(a):
            B = 1 << 12
            m = a.shape[0] // B
            a2 = a.reshape(m, B)
            inner = jnp.cumsum(a2, axis=1)
            tails = inner[:, -1]
            offs = jnp.cumsum(tails) - tails
            return (inner + offs[:, None]).reshape(-1)
        g = jax.jit(two_level)
        timeit(f"cumsum2lv int32 n={sz:.1e}", lambda: g(x))

    # scatter-add histogram: 2.1M indices into 261M table
    n, tbl = 1 << 21, (1 << 28)
    idx = jax.random.randint(key, (n,), 0, tbl, jnp.int32)
    f = jax.jit(lambda i: jnp.zeros(tbl, jnp.int32).at[i].add(1))
    timeit(f"hist scatter {n:.0e} into {tbl:.0e}", lambda: f(idx))

    # gather from large table
    big = jnp.ones(tbl, jnp.int32)
    q = jax.random.randint(key, (21 * n,), 0, tbl, jnp.int32)
    f = jax.jit(lambda t, i: t[i])
    timeit(f"gather {21*n:.1e} from {tbl:.0e} table", lambda: f(big, q))

    # gather rows (N,3) from 2.1M table, 16M queries
    t3 = jax.random.normal(key, (n, 3), jnp.float32)
    q16 = jax.random.randint(key, (1 << 24,), 0, n, jnp.int32)
    f = jax.jit(lambda t, i: t[i])
    timeit("row-gather (2.1M,3) x 16.7M", lambda: f(t3, q16))

    # flat scatter-min into 2.1M, from 16M
    v16 = jax.random.randint(key, (1 << 24,), 0, n, jnp.int32)
    f = jax.jit(lambda i, v: jnp.full(n, 2**31 - 1, jnp.int32).at[i].min(v))
    timeit("scatter-min 16.7M into 2.1M", lambda: f(q16, v16))

    # label gather x=x[x] over 2.1M
    lab = jax.random.randint(key, (n,), 0, n, jnp.int32)
    f = jax.jit(lambda l: l[l])
    timeit("label gather l[l] 2.1M", lambda: f(lab))

    # sort / argsort 2.1M and 23M int32
    for sz in (n, 23 * (1 << 20)):
        xs = jax.random.randint(key, (sz,), 0, 1 << 30, jnp.int32)
        f = jax.jit(lambda a: jnp.sort(a))
        timeit(f"sort int32 n={sz:.1e}", lambda: f(xs))
        g = jax.jit(lambda a: jnp.argsort(a))
        timeit(f"argsort int32 n={sz:.1e}", lambda: g(xs))

    # cumsum over 16M (flat_candidates cost model)
    x16 = jnp.ones(1 << 24, jnp.int32)
    f = jax.jit(lambda a: jnp.cumsum(a))
    timeit("cumsum int32 n=16.7M", lambda: f(x16))
    f = jax.jit(lambda a: jax.lax.cummax(a))
    timeit("cummax int32 n=16.7M", lambda: f(x16))


if __name__ == "__main__":
    main()
