"""Decompose one _unbind_loop iteration at 512^3-subset scale: time the
loop at max_iters 1/2/4 (marginal per-iteration cost) and the body's
pieces standalone.  Uses the cached 512^3 pfof (tools/profile_unbind512
writes it).

Usage: VR_BENCH_N=$((512**3)) python tools/micro_unbind_iter.py
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

from velociraptor_stf_tpu.models import unbind as U
from velociraptor_stf_tpu.ops import segments as seg
from velociraptor_stf_tpu.utils import config as C


def sync(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
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
    with np.load(f"/tmp/vr_mock_{n}_s7.npz") as z:
        pos, vel, mass = z["pos"], z["vel"], z["mass"]
    with np.load(f"/tmp/vr_pfof_{n}_s7.npz") as z:
        pfof_h, ng = z["pfof"], int(z["ng"])
    print("ng:", ng, flush=True)
    pfof = jnp.asarray(pfof_h)
    pos = jnp.asarray(pos); vel = jnp.asarray(vel); mass = jnp.asarray(mass)
    sync(mass)

    tag = pfof > 0
    ntag = int(jax.device_get(jnp.sum(tag)))
    tpad = seg.pad_class(ntag)
    sub_idx, svalid, scatter_to = seg.compact_mask(tag, tpad)
    vel_t = vel[sub_idx]
    mass_t = jnp.where(svalid, mass[sub_idx], 0.0)
    pfof_t = jnp.where(svalid, pfof[sub_idx], 0)
    pos_t = pos[sub_idx]
    uinfo = C.UnbindInfo(unbindflag=1, Eratio=1.0)
    G = 43.0211349
    W_t = U.compute_potential(pos_t, mass_t, pfof_t, ng, uinfo.eps, G,
                              boxsize=boxsize)
    sync(W_t)
    ng1 = ng + 1
    potref = jnp.zeros((ng1, 3), pos.dtype)
    Er = jnp.asarray(1.0, pos.dtype)
    mf = jnp.asarray(uinfo.maxunbindfrac, pos.dtype)

    for iters in (1, 2, 4):
        t0 = time.time()
        b, _, ch = U._unbind_loop(vel_t, mass_t, pfof_t, W_t, potref, ng,
                               Er, mf, 20, uinfo.cmvelreftype,
                               max_iters=iters, bound0=None)
        sync(b)
        print(f"_unbind_loop(max_iters={iters}) cold-ish: "
              f"{time.time()-t0:.2f} s", flush=True)
        t0 = time.time()
        b, _, ch = U._unbind_loop(vel_t, mass_t, pfof_t, W_t, potref, ng,
                               Er, mf, 20, uinfo.cmvelreftype,
                               max_iters=iters, bound0=None)
        sync(b)
        print(f"_unbind_loop(max_iters={iters}) warm: "
              f"{time.time()-t0:.2f} s", flush=True)

    # body pieces standalone (arrays passed as ARGUMENTS — a closure
    # capture embeds them as program constants and the axon
    # remote_compile request blows its size limit)
    bound = pfof_t > 0
    timeit("segment_mean vel (ref_vel)",
           jax.jit(lambda v, b, m, g: seg.segment_mean(
               v, jnp.where(b, m, 0.0), g, ng1)),
           vel_t, bound, mass_t, pfof_t)
    vref = seg.segment_mean(vel_t, mass_t, pfof_t, ng1)
    timeit("gather_rows vref", jax.jit(seg.gather_rows), vref, pfof_t)
    dv = vel_t - seg.gather_rows(vref, pfof_t)
    E = Er * (0.5 * mass_t * jnp.sum(dv * dv, -1)) + W_t
    unbound = (E > 0) & bound
    timeit("segment_sum bound",
           jax.jit(lambda b, g: seg.segment_sum(
               b.astype(jnp.int32), g, ng1)), bound, pfof_t)
    timeit("lexsort (-E, key)",
           jax.jit(lambda e, u, g: jnp.lexsort(
               (-e, jnp.where(u, g, ng1)))), E, unbound, pfof_t)


if __name__ == "__main__":
    main()
