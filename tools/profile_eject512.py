"""Profile the PRODUCTION unbind path at scale: FOF once (pfof cached to
/tmp), then time check_unbound_groups end-to-end with the per-chunk
EJECT:: telemetry (VR_PROFILE_EJECT=1) separating potential / loop /
recompute / compaction costs.

Usage: VR_BENCH_N=$((512**3)) python tools/profile_eject512.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("VR_PROFILE_EJECT", "1")
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/vr_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

from velociraptor_stf_tpu.models.pipeline import find_structures
from velociraptor_stf_tpu.models import unbind as U
from velociraptor_stf_tpu.utils import config as C

n = int(os.environ.get("VR_BENCH_N", 512 ** 3))
boxsize = 100.0
with np.load(f"/tmp/vr_mock_{n}_s7.npz") as z:
    pos, vel, mass = z["pos"], z["vel"], z["mass"]

fofcache = f"/tmp/vr_pfof6d_{n}_s7.npz"
if os.path.exists(fofcache):
    with np.load(fofcache) as z:
        pfof_h, ng = z["pfof"], int(z["ng"])
    pos = jnp.asarray(pos); vel = jnp.asarray(vel); mass = jnp.asarray(mass)
else:
    opt = C.Options()
    opt.ellphys = 0.2
    opt.ellxscale = boxsize / n ** (1 / 3)
    opt.fofbgtype = C.FOF6D
    opt.MinSize = 20
    opt.HaloMinSize = 32
    opt.uinfo.unbindflag = 0
    opt.iBoundHalos = 0
    opt.G = 43.0211349
    opt.iSubSearch = 0
    pos = jnp.asarray(pos); vel = jnp.asarray(vel); mass = jnp.asarray(mass)
    res = find_structures(opt, pos, vel, mass, boxsize=boxsize)
    pfof_h, ng = np.asarray(res.pfof), res.ngroups
    np.savez(fofcache, pfof=pfof_h, ng=ng)
    print("fof timings:", res.timings, "ng:", ng, flush=True)

pfof = jnp.asarray(pfof_h)
uinfo = C.UnbindInfo(unbindflag=1, Eratio=1.0)
G = 43.0211349
print("ng:", ng, "ntag:", int((pfof_h > 0).sum()), flush=True)

reps = int(os.environ.get("VR_PROF_REPS", "2"))
for r in range(reps):
    t0 = time.time()
    res = U.check_unbound_groups(pos, vel, mass, pfof, ng, uinfo, G,
                                 boxsize=boxsize, min_size=20)
    jax.block_until_ready(res.bound)
    print(f"rep {r}: check_unbound_groups total {time.time()-t0:.2f}s "
          f"ngroups={res.ngroups}", flush=True)
