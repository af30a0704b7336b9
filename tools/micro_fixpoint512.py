"""Microbenchmark the non-kernel pieces of the FOF label fixed point at
512^3 scale: hook scatter-min, pointer-jump gathers, label-row refresh,
dirty-map reduction, and one full sweep dispatch — to locate the gap
between fof3d wall time (~50 s) and the chunk-kernel work (~13 s).

Usage: VR_BENCH_N=$((512**3)) python tools/micro_fixpoint512.py
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

from velociraptor_stf_tpu.ops import pallas_fof
from velociraptor_stf_tpu.utils import config as C
from velociraptor_stf_tpu.io.synthetic import make_cosmo_mock


def sync(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    # never ravel an (N,3) array: the copy tile-pads the minor dim to 128
    # lanes (64 GB at 512^3)
    while leaf.ndim > 1:
        leaf = leaf[-1]
    jax.device_get(leaf[-1:])


def timeit(name, fn, *args, reps=3):
    out = fn(*args)
    sync(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    sync(out)
    print(f"{name}: {(time.time() - t0) / reps * 1e3:.1f} ms", flush=True)
    return out


def main():
    n = int(os.environ.get("VR_BENCH_N", 512 ** 3))
    boxsize = 100.0
    cache = f"/tmp/vr_mock_{n}_s7.npz"
    if os.path.exists(cache):
        with np.load(cache) as z:
            pos, vel, mass = z["pos"], z["vel"], z["mass"]
    else:
        pos, vel, mass = make_cosmo_mock(n, boxsize=boxsize,
                                         nhalos=max(64, n // 16384), seed=7)
    pos = jnp.asarray(pos); vel = jnp.asarray(vel)
    sync(pos)

    opt = C.Options()
    opt.ellphys = 0.2
    opt.ellxscale = boxsize / n ** (1 / 3)
    b3d = opt.ellphys * opt.ellxscale
    t0 = time.time()
    pf = pallas_fof.PallasFof(pos, vel, boxsize, b3d)
    sync(pf.ctx.cols_p)
    print(f"ctx build: {time.time()-t0:.2f} s", flush=True)
    t0 = time.time()
    keep, nkeep = pf.linked_mask(b3d)
    print(f"linked_mask(detect): {time.time()-t0:.2f} s nkeep={nkeep}",
          flush=True)
    t0 = time.time()
    sub_pad = pf.subset_pad(keep)
    print(f"subset_pad prepass: {time.time()-t0:.2f} s -> {sub_pad}",
          flush=True)
    for r in range(3):
        t0 = time.time()
        pf3 = pf.subset(keep, ns_pad_new=sub_pad)
        sync(pf3.ctx.cols_p)
        print(f"subset build[{r}]: {time.time()-t0:.2f} s", flush=True)
    pf.ctx = None
    ctx = pf3.ctx
    ns_pad = ctx.ns_pad
    print(f"pruned ns_pad={ns_pad}", flush=True)

    lab = jnp.arange(ns_pad, dtype=jnp.int32)
    nm = jnp.maximum(lab - 7, 0)

    hook = jax.jit(lambda l, m: l.at[l].min(m))
    timeit("hook scatter-min (random-ish)", hook, lab, nm)
    jump = jax.jit(lambda l: l[l])
    timeit("pointer jump gather", jump, lab)
    refresh = jax.jit(lambda c, l: c.at[3, :ns_pad].set(l))
    timeit("label-row refresh (cols_p copy)", refresh, ctx.cols_p, lab)

    pad_cols = (-(-ns_pad // pallas_fof.CH)) * pallas_fof.CH - ns_pad
    nch_total = -(-ns_pad // pallas_fof.CH)
    dirty = jax.jit(lambda l, p: jnp.any(
        jnp.pad(l != p, (0, pad_cols)).reshape(nch_total, pallas_fof.CH),
        axis=1))
    timeit("dirty chunk map", dirty, lab, nm)

    ghost = jax.jit(lambda l: l.at[ctx.gslots].set(l[ctx.grs]))
    timeit("ghost refresh", ghost, lab)

    # one full fixed point (max_sweeps=1) — includes ONE sweep + hook +
    # jumps + final path compression
    t0 = time.time()
    out = pallas_fof._fof3d_labels(ctx, ns_pad, float(b3d) ** 2,
                                   max_sweeps=1)
    sync(out[0])
    print(f"fixpoint(max_sweeps=1) incl compile: {time.time()-t0:.2f} s",
          flush=True)
    for r in range(2):
        t0 = time.time()
        out = pallas_fof._fof3d_labels(ctx, ns_pad, float(b3d) ** 2,
                                       max_sweeps=1)
        sync(out[0])
        print(f"fixpoint(max_sweeps=1) warm: {time.time()-t0:.2f} s",
              flush=True)
    # full convergence from scratch, one dispatch
    t0 = time.time()
    out = pallas_fof._fof3d_labels(ctx, ns_pad, float(b3d) ** 2,
                                   max_sweeps=64)
    sync(out[0])
    nsw = int(jax.device_get(out[2]))
    print(f"fixpoint(converge, {nsw} sweeps): {time.time()-t0:.2f} s",
          flush=True)


if __name__ == "__main__":
    main()
