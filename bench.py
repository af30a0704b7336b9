"""Benchmark: FOF + 6DFOF + unbind throughput (particles/sec/chip).

Target metric from BASELINE.json: particles/sec/chip for FOF+6DFOF+unbind;
north star = 1024^3 end-to-end < 60 s on v5p-16, i.e. ~1.12e6
particles/sec/chip.  ``vs_baseline`` is measured throughput / that target.

Env overrides: VR_BENCH_N (particle count, default 256^3 — the LOW end
of the metric's stated range 256^3-1024^3; 128^3 measures ~4% faster
but sits outside the range),
VR_BENCH_REPS (timed repetitions, default 3),
VR_BENCH_BARYONS=1 (multi-type variant: 5/6 DM + 1/6 gas, baryon
association + combined re-unbind counted in the metric time),
VR_BENCH_SUBSTRUCTURE=1 (recursion variant: the class-batched
SearchSubSub joins the metric; timings in VR_BENCH_VERBOSE show the
substructure-vs-FOF phase balance).
"""

import json
import os
import time

import numpy as np


def main():
    import jax

    # persistent compile cache: axon compiles are slow and the tunnel worker
    # occasionally dies mid-compile; caching lets a retry resume quickly
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("VR_JAX_CACHE", "/tmp/vr_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from velociraptor_stf_tpu.io.synthetic import make_cosmo_mock
    from velociraptor_stf_tpu.models.pipeline import find_structures
    from velociraptor_stf_tpu.utils import config as C

    n = int(os.environ.get("VR_BENCH_N", 256 ** 3))
    reps = int(os.environ.get("VR_BENCH_REPS", 2 if n >= 1 << 20 else 3))
    boxsize = 100.0
    # host-side mock cache: the 512^3 mock costs ~7 min of RNG; repeat
    # bench invocations load it from /tmp in seconds
    cache = f"/tmp/vr_mock_{n}_s7.npz"
    if n >= 1 << 24 and os.path.exists(cache):
        with np.load(cache) as z:
            pos, vel, mass = z["pos"], z["vel"], z["mass"]
    else:
        pos, vel, mass = make_cosmo_mock(n, boxsize=boxsize, nhalos=max(
            64, n // 16384), seed=7)
        if n >= 1 << 24:
            np.savez(cache, pos=pos, vel=vel, mass=mass)

    # move the snapshot to device up front: the metric times the compute
    # phases (FOF+6DFOF+unbind, BASELINE.md), not host->device transfer
    # (the axon tunnel moves ~50 MB/s; real hosts stage via PCIe/DMA)
    import jax.numpy as jnp
    pos, vel, mass = jnp.asarray(pos), jnp.asarray(vel), jnp.asarray(mass)
    jax.device_get(mass[-1:])

    opt = C.Options()
    opt.ellphys = 0.2
    opt.ellxscale = boxsize / n ** (1 / 3)
    opt.fofbgtype = C.FOF6D
    opt.MinSize = 20
    opt.HaloMinSize = 32
    opt.uinfo.unbindflag = 1
    # the metric includes the field-halo unbind; the reference default is
    # Bound_halos=0 (allvars.h:747), so request it explicitly
    opt.iBoundHalos = 1
    opt.uinfo.Eratio = 1.0
    opt.G = 43.0211349
    opt.Omega_m, opt.Omega_Lambda = 0.3, 0.7
    # the BASELINE.json metric is FOF + 6DFOF + unbind; the substructure
    # recursion is benchmarked separately (it is not part of the target)
    opt.iSubSearch = 0
    subsearch = os.environ.get("VR_BENCH_SUBSTRUCTURE") == "1"
    if subsearch:
        # recursion variant: the vmapped class-batched SearchSubSub joins
        # the metric time (reports substructure-vs-FOF phase balance)
        opt.iSubSearch = 1
        opt.iiterflag = 1
    ptype = None
    baryons = os.environ.get("VR_BENCH_BARYONS") == "1"
    if baryons:
        # multi-type variant: every 6th particle is gas; the baryon
        # association + combined re-unbind join the metric time
        opt.iBaryonSearch = 1
        opt.partsearchtype = C.PSTALL
        ptype = np.where(np.arange(n) % 6 == 5, 0, 1).astype(np.int32)
    C.config_check(opt)

    # multi-chip: shard the metric path over all local devices (VR_MESH
    # overrides; single-chip benches keep mesh=None and its zero overhead)
    mesh = None
    nchips = 1
    want = os.environ.get("VR_MESH")
    ndev = jax.device_count() if want is None else min(int(want),
                                                       jax.device_count())
    if ndev > 1:
        from velociraptor_stf_tpu.parallel.mesh import make_mesh
        mesh = make_mesh(ndev)
        nchips = ndev

    def run_once():
        return find_structures(opt, pos, vel, mass, boxsize=boxsize,
                               ptype=ptype, mesh=mesh)

    # warmup (compile; run twice so every data-dependent shape branch is
    # compiled before timing)
    res = run_once()
    res = run_once()
    # telemetry from here on covers the TIMED reps only: the warmup runs
    # fold compile time into the per-phase counters (subsub_*_ms), which
    # would swamp the steady-state attribution
    from velociraptor_stf_tpu.utils import telemetry as _telemetry
    _telemetry.reset()
    times = []
    metric_times = []
    for _ in range(reps):
        t0 = time.time()
        res = run_once()
        times.append(time.time() - t0)
        # the metric phases (BASELINE.md): FOF+6DFOF ("fof") + unbind
        # (+ baryon association in the multi-type variant); property
        # computation is a separate product stage
        metric_times.append(res.timings.get("fof", 0.0) +
                            res.timings.get("unbind", 0.0) +
                            res.timings.get("baryons", 0.0) +
                            (res.timings.get("substructure", 0.0)
                             if subsearch else 0.0))
    # best rep: a rep polluted by residual jit compiles (cold persistent
    # cache) misstates steady-state throughput
    dt = float(np.min(metric_times))
    value = n / dt / nchips
    target = 1024 ** 3 / 16 / 60.0  # north-star particles/sec/chip
    print(json.dumps({
        "metric": "fof6d_unbind_particles_per_sec_per_chip",
        "value": round(value, 1),
        "unit": "particles/s/chip",
        "vs_baseline": round(value / target, 4),
    }))
    if os.environ.get("VR_BENCH_VERBOSE"):
        from velociraptor_stf_tpu.utils import telemetry

        print(json.dumps({"n": n, "ngroups": res.ngroups,
                          "times": times, "timings": res.timings}))
        # silent-fallback counters: batched-vs-sequential recursion work,
        # Pallas compile/capacity fallbacks (round-2 weakness #4)
        print(telemetry.report())


if __name__ == "__main__":
    main()
