"""Stage-level profile of the production Pallas FOF path at scale.

Usage: VR_BENCH_N=$((512**3)) python tools/profile_fof_pallas.py
Decomposes models/halos._search_full_set_pallas into: ctx build
(bin+sort), linked-mask prune, subset compaction, 3D label fixed
point, velocity scale, 6D subset + sweep, and the finish/renumber.
Loads the cached /tmp mock for n >= 2^24 (same file bench.py writes).
"""
import os, sys, time
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("VR_JAX_CACHE", "/tmp/vr_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

from velociraptor_stf_tpu.models import halos
from velociraptor_stf_tpu.ops import pallas_fof
from velociraptor_stf_tpu.utils import config as C
from velociraptor_stf_tpu.io.synthetic import make_cosmo_mock


def sync(x):
    jax.device_get(jax.tree_util.tree_leaves(x)[0].ravel()[-1:])


def main():
    n = int(os.environ.get("VR_BENCH_N", 256 ** 3))
    boxsize = 100.0
    cache = f"/tmp/vr_mock_{n}_s7.npz"
    if n >= 1 << 24 and os.path.exists(cache):
        with np.load(cache) as z:
            pos, vel, mass = z["pos"], z["vel"], z["mass"]
    else:
        pos, vel, mass = make_cosmo_mock(n, boxsize=boxsize,
                                         nhalos=max(64, n // 16384), seed=7)
    pos = jnp.asarray(pos); vel = jnp.asarray(vel); mass = jnp.asarray(mass)
    sync(mass)

    opt = C.Options()
    opt.ellphys = 0.2
    opt.ellxscale = boxsize / n ** (1 / 3)
    opt.fofbgtype = C.FOF6D
    opt.MinSize = 20
    opt.HaloMinSize = 32
    minsize = opt.HaloMinSize
    b3d = opt.ellphys * opt.ellxscale * opt.ellhalophysfac
    reach = b3d * max(1.0, opt.ellhalo6dxfac)

    import gc

    def one_rep(rep):
        t0 = time.time()
        pf = pallas_fof.PallasFof(pos, vel, boxsize, reach)
        ov = pf.check_overflow()
        t1 = time.time()
        keep, nkeep = pf.linked_mask(b3d)
        t2 = time.time()
        pf3 = pf
        if nkeep < 0.45 * n:
            cand = pf.subset(keep)
            if not cand.check_overflow():
                pf3 = cand
                pf.ctx = None
        t3 = time.time()
        pfof3, ng3_d = pf3.fof3d(b3d, minsize)
        ng3 = int(jax.device_get(ng3_d))
        t4 = time.time()
        nseg = ng3 + 1
        vscale2 = halos.velocity_scale_largest_group(
            vel, mass, pfof3, nseg, opt.ellhalo6dvfac, bug_compat=False)
        vs_per_particle = jnp.where(pfof3 > 0, vscale2, 1.0)
        sync(vs_per_particle)
        t5 = time.time()
        tag = pfof3 > 0
        ntag = int(jax.device_get(jnp.sum(tag)))
        nbase = pf3.ctx.ns_pad
        pf6 = pf3.subset(tag) if 0 < ntag <= nbase // 4 else pf3
        if pf6 is not pf3 and pf6.check_overflow():
            pf6 = pf3
        if pf6 is not pf3:
            pf3.ctx = None
            pf.ctx = None
        t6 = time.time()
        ell6d = b3d * opt.ellhalo6dxfac
        pfof6, ng6_d = pf6.fof6d(ell6d, pfof3, vs_per_particle, minsize)
        ng6 = int(jax.device_get(ng6_d))
        t7 = time.time()
        res = halos._finish_6d(opt, pfof3, ng3, pfof6, ng6,
                               vs_per_particle, minsize)
        sync(res.pfof)
        t8 = time.time()
        print(f"rep{rep}: ctx={t1-t0:.2f} prune_mask={t2-t1:.2f} "
              f"prune_subset={t3-t2:.2f} (nkeep={nkeep}) "
              f"fof3d={t4-t3:.2f} vscale={t5-t4:.2f} "
              f"subset6={t6-t5:.2f} (ntag={ntag}) fof6d={t7-t6:.2f} "
              f"finish={t8-t7:.2f} total={t8-t0:.2f} "
              f"ng3={ng3} ng6={ng6}", flush=True)

    # run reps as calls so each rep's contexts die before the next builds
    # (two live 512^3 contexts OOM the chip)
    for rep in range(2):
        one_rep(rep)
        gc.collect()
    from velociraptor_stf_tpu.utils import telemetry
    print(telemetry.report(), flush=True)


if __name__ == "__main__":
    main()
