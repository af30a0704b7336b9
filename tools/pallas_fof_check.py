"""Check + time the Pallas block-range FOF against the XLA edge pipeline.

Usage: python tools/pallas_fof_check.py [N]
Compares 3DFOF partitions (exact) and times both paths.
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

    from velociraptor_stf_tpu.io.synthetic import make_cosmo_mock
    from velociraptor_stf_tpu.ops import fof, pallas_fof

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 18
    boxsize = 100.0
    pos, vel, mass = make_cosmo_mock(n, boxsize=boxsize,
                                     nhalos=max(64, n // 16384), seed=7)
    pos, vel = jnp.asarray(pos), jnp.asarray(vel)
    jax.device_get(pos[-1:])
    b3d = 0.2 * boxsize / n ** (1 / 3)
    minsize = 32

    # --- pallas path ---
    t0 = time.time()
    pf = pallas_fof.PallasFof(pos, vel, boxsize, b3d)
    jax.device_get(pf.ctx.ranges[-1:])
    t_build = time.time() - t0
    t0 = time.time()
    pfof_p, ng_p = pf.fof3d(b3d, minsize)
    ng_p = int(jax.device_get(ng_p))
    t_fof = time.time() - t0
    print(f"pallas: build {t_build:.2f}s (cold) fof {t_fof:.2f}s (cold) "
          f"ngroups={ng_p} overflow={pf.check_overflow()}")

    # warm timing
    for rep in range(2):
        t0 = time.time()
        pf2 = pallas_fof.PallasFof(pos, vel, boxsize, b3d)
        jax.device_get(pf2.ctx.ranges[-1:, :1])
        t1 = time.time()
        labels, _, nit, work, _aux = pallas_fof._fof3d_labels(
            pf2.ctx, pf2.ctx.ns_pad, b3d ** 2)
        nit = int(jax.device_get(nit))
        t2 = time.time()
        pfof_p, ng_p2 = pallas_fof._renumber_masked(
            labels, pf2.ctx, pf2.ctx.n, minsize)
        jax.device_get(ng_p2)
        t3 = time.time()
        print(f"pallas warm: build {t1-t0:.3f}s fixpoint {t2-t1:.3f}s "
              f"({nit} sweeps, {int(jax.device_get(work))} chunks) "
              f"renumber {t3-t2:.3f}s total {t3-t0:.3f}s")

    # --- reference XLA path ---
    pfof_x, ng_x = fof.fof3d(pos, b3d, boxsize=boxsize, min_size=minsize)
    ng_x = int(jax.device_get(ng_x))
    for rep in range(2):
        t0 = time.time()
        pfof_x, _ng = fof.fof3d(pos, b3d, boxsize=boxsize, min_size=minsize)
        jax.device_get(_ng)
        print(f"xla warm total: {time.time()-t0:.3f}s")

    a = np.asarray(jax.device_get(pfof_p))
    b = np.asarray(jax.device_get(pfof_x))
    same = np.array_equal(a, b)
    print(f"ngroups: pallas={ng_p} xla={ng_x}  exact_match={same}")
    if not same:
        bad = np.nonzero(a != b)[0]
        print(f"  {bad.size} differing particles; first {bad[:10]}")
        for i in bad[:5]:
            print(f"   i={i} pallas={a[i]} xla={b[i]}")
    assert ng_p == ng_x and (same or bad.size < n * 1e-5)


if __name__ == "__main__":
    main()
