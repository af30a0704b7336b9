"""Microbench the primitive ops that dominate the FOF edge build.

Measures at 128^3-like sizes:
  - 1D cumsum over 260M int32 (the dense cell table) vs a manual
    two-level (reshape + axis-0 scan + offset) formulation
  - 1D cummax over 16M (flat_candidates' segment-index propagation)
  - scatter .at[].max of 21M marks into a 16M table
  - gather 16M rows from a 2M table
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
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    def sync(x):
        jax.device_get(jax.tree_util.tree_leaves(x)[0].ravel()[:1])

    def timeit(label, fn, reps=3):
        out = fn()
        sync(out)
        ts = []
        for _ in range(reps):
            t0 = time.time()
            out = fn()
            sync(out)
            ts.append(time.time() - t0)
        print(f"{label:44s} {min(ts)*1000:9.1f} ms")
        return out

    key = jax.random.PRNGKey(0)

    # ---- giant cumsum (dense cell prefix table) ----
    TOTAL = 260_917_120  # ~639^3
    N = 2_097_152
    idx = jax.random.randint(key, (N,), 0, TOTAL, dtype=jnp.int32)

    @jax.jit
    def hist_only(idx):
        return jnp.zeros(TOTAL + 1, jnp.int32).at[idx].add(1)

    @jax.jit
    def cumsum_1d(h):
        return jnp.cumsum(h)

    def _cumsum2(h, ncols):
        # two-level: scan down axis 0 (lane-parallel), then add column
        # offsets from a small second-level scan
        nrows = (h.shape[0] + ncols - 1) // ncols
        pad = nrows * ncols - h.shape[0]
        h2 = jnp.pad(h, (0, pad)).reshape(ncols, nrows).T  # column-major fill
        # we need cumsum in original (flattened) order: elements laid out
        # column-by-column -> reshape (ncols, nrows) then transpose is an
        # expensive permute; instead lay out row-major and scan rows:
        h2 = jnp.pad(h, (0, pad)).reshape(nrows, ncols)
        colsum = jnp.cumsum(h2, axis=1)          # within-row scan (short rows)
        rowtot = colsum[:, -1]
        rowoff = jnp.cumsum(rowtot) - rowtot      # 1D scan over nrows
        out = colsum + rowoff[:, None]
        return out.reshape(-1)[: h.shape[0]]

    @jax.jit
    def cumsum_2lvl_r4096(h):
        return _cumsum2(h, 4096)

    @jax.jit
    def cumsum_2lvl_r512(h):
        return _cumsum2(h, 512)

    h = timeit("hist scatter 2M -> 260M", lambda: hist_only(idx))
    timeit("cumsum 1D 260M", lambda: cumsum_1d(h))
    timeit("cumsum 2-level 260M (rows of 4096)", lambda: cumsum_2lvl_r4096(h))
    timeit("cumsum 2-level 260M (rows of 512)", lambda: cumsum_2lvl_r512(h))

    # correctness
    small = jax.random.randint(key, (100_000,), 0, 7, dtype=jnp.int32)
    a = np.asarray(jax.device_get(cumsum_1d(small)))
    b = np.asarray(jax.device_get(jax.jit(lambda x: _cumsum2(x, 512))(small)))
    assert np.array_equal(a, b), "two-level cumsum mismatch"

    # ---- flat_candidates primitives ----
    TPAD = 1 << 24
    NSEG = 21_000_000
    seg_off = jnp.sort(jax.random.randint(key, (NSEG,), 0, TPAD, jnp.int32))
    segidx = jnp.arange(1, NSEG + 1, dtype=jnp.int32)

    @jax.jit
    def marks_scatter(seg_off, segidx):
        return jnp.zeros(TPAD, jnp.int32).at[seg_off].max(segidx, mode="drop")

    marks = timeit("scatter-max 21M marks -> 16M", lambda: marks_scatter(
        seg_off, segidx))

    @jax.jit
    def cummax_1d(m):
        return jax.lax.cummax(m)

    @jax.jit
    def cummax_2lvl(m):
        nrows = TPAD // 512
        m2 = m.reshape(nrows, 512)
        c = jax.lax.cummax(m2, axis=1)
        rowmax = jax.lax.cummax(c[:, -1])
        off = jnp.concatenate([jnp.full((1,), -2**31, jnp.int32),
                               rowmax[:-1]])
        return jnp.maximum(c, off[:, None]).reshape(-1)

    timeit("cummax 1D 16M", lambda: cummax_1d(marks))
    timeit("cummax 2-level 16M (rows of 512)", lambda: cummax_2lvl(marks))
    a = np.asarray(jax.device_get(cummax_1d(marks[:1 << 20])))

    # ---- gathers ----
    tbl = jax.random.normal(key, (N, 3), jnp.float32)
    gidx = jax.random.randint(key, (TPAD,), 0, N, jnp.int32)

    @jax.jit
    def gather_rows(tbl, gidx):
        return tbl[gidx]

    @jax.jit
    def gather_cols(tbl, gidx):
        return jnp.stack([tbl[:, j][gidx] for j in range(3)], -1)

    timeit("gather 16M x (N,3) rows", lambda: gather_rows(tbl, gidx))
    timeit("gather 16M x 3 col-wise", lambda: gather_cols(tbl, gidx))

    i32 = jax.random.randint(key, (TPAD,), 0, N, jnp.int32)
    tbl1 = jnp.arange(N, dtype=jnp.int32)

    @jax.jit
    def gather_1d(tbl1, i32):
        return tbl1[i32]

    timeit("gather 16M x (N,) int32", lambda: gather_1d(tbl1, i32))

    # ---- cumsum at 16M/21M (row-offset prefix) ----
    w = jax.random.randint(key, (NSEG,), 0, 3, jnp.int32)

    @jax.jit
    def cumsum_21m(w):
        return jnp.cumsum(w)

    timeit("cumsum 1D 21M", lambda: cumsum_21m(w))

    @jax.jit
    def cumsum_21m_2lvl(w):
        pad = (-NSEG) % 512
        h2 = jnp.pad(w, (0, pad)).reshape(-1, 512)
        c = jnp.cumsum(h2, axis=1)
        rt = c[:, -1]
        ro = jnp.cumsum(rt) - rt
        return (c + ro[:, None]).reshape(-1)[:NSEG]

    timeit("cumsum 2-level 21M", lambda: cumsum_21m_2lvl(w))


if __name__ == "__main__":
    main()
