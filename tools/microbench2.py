"""Microbench: sorted vs random gathers from giant tables."""
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
        sync(jax.tree_util.tree_leaves(out)[0])
        ts = []
        for _ in range(reps):
            t0 = time.time()
            out = fn()
            sync(jax.tree_util.tree_leaves(out)[0])
            ts.append(time.time() - t0)
        print(f"{label:52s} {min(ts)*1000:9.1f} ms")

    key = jax.random.PRNGKey(0)
    tbl = 1 << 28
    nq = 44 * (1 << 20)
    big = jnp.ones(tbl, jnp.int32)

    qr = jax.random.randint(key, (nq,), 0, tbl, jnp.int32)
    qs = jnp.sort(qr)
    sync(qs)

    f = jax.jit(lambda t, i: t[i])
    timeit("gather 44M random from 268M", lambda: f(big, qr))
    timeit("gather 44M sorted from 268M", lambda: f(big, qs))

    g = jax.jit(lambda t, i: t.at[i].get(indices_are_sorted=True))
    timeit("gather 44M sorted hint from 268M", lambda: g(big, qs))

    # queries with strong locality but not sorted: 20 interleaved streams
    qi = qs.reshape(20, nq // 20).T.reshape(-1)
    sync(qi)
    timeit("gather 44M 20-stream-interleaved", lambda: f(big, qi))

    # memory-bound reference: elementwise over the table
    h = jax.jit(lambda t: t + 1)
    timeit("elementwise +1 over 268M", lambda: h(big))

    # small sorted gather, per-stream: 2.1M sorted queries x 20 calls fused
    q1 = jnp.sort(jax.random.randint(key, (1 << 21,), 0, tbl, jnp.int32))

    def multi(t, q):
        outs = [t[jnp.minimum(q + k, tbl - 1)] for k in range(20)]
        return sum(outs)
    m = jax.jit(multi)
    timeit("20x gather 2.1M sorted (+k offsets)", lambda: m(big, q1))


if __name__ == "__main__":
    main()
