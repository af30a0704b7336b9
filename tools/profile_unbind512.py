"""Profile the unbind phase at 512^3: FOF once (cached to /tmp), then
time compute_potential vs the ejection chunks."""
import os, time, sys
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/vr_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

from velociraptor_stf_tpu.models.pipeline import find_structures
from velociraptor_stf_tpu.models import unbind as U
from velociraptor_stf_tpu.ops import segments as seg, pallas_gravity
from velociraptor_stf_tpu.utils import config as C

n = int(os.environ.get("VR_BENCH_N", 512 ** 3))
boxsize = 100.0
with np.load(f"/tmp/vr_mock_{n}_s7.npz") as z:
    pos, vel, mass = z["pos"], z["vel"], z["mass"]

fofcache = f"/tmp/vr_pfof_{n}_s7.npz"
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

# --- mirror check_unbound_groups' subset path with instrumentation
tag = pfof > 0
ntag = int(jax.device_get(jnp.sum(tag)))
tpad = seg.pad_class(ntag)
t0 = time.time()
sub_idx, svalid, scatter_to = seg.compact_mask(tag, tpad)
pos_t, vel_t, mass_t = pos[sub_idx], vel[sub_idx], mass[sub_idx]
pfof_t = jnp.where(svalid, pfof[sub_idx], 0)
jax.block_until_ready(pfof_t)
print(f"compact: {time.time()-t0:.2f}s tpad={tpad}", flush=True)

# group size histogram (host)
sizes = np.bincount(pfof_h[pfof_h > 0], minlength=ng + 1)
cut = pallas_gravity.MAX_DIRECT
big = np.where(sizes > cut)[0]
print("max group:", sizes.max(), "groups >MAX_DIRECT:", len(big),
      "their sizes:", sorted(sizes[big])[-8:], flush=True)

t0 = time.time()
mw = jnp.where(svalid, mass_t, 0.0)
W_t = U.compute_potential(pos_t, mw, pfof_t, ng, uinfo.eps, G,
                          boxsize=boxsize)
jax.block_until_ready(W_t)
print(f"compute_potential(warm0): {time.time()-t0:.2f}s", flush=True)
t0 = time.time()
W_t2 = U.compute_potential(pos_t, mw, pfof_t, ng, uinfo.eps, G,
                           boxsize=boxsize)
jax.block_until_ready(W_t2)
print(f"compute_potential(warm1): {time.time()-t0:.2f}s", flush=True)

# ejection loop, chunk by chunk
ng1 = ng + 1
potref_vel = jnp.zeros((ng1, 3), pos.dtype)
bound = None
chunk_iters = 16
for k in range(64):
    t0 = time.time()
    bound, _, changed = U._unbind_loop(
        vel_t, mass_t, pfof_t, W_t, potref_vel, ng,
        jnp.asarray(uinfo.Eratio, pos.dtype),
        jnp.asarray(uinfo.maxunbindfrac, pos.dtype),
        20, uinfo.cmvelreftype, max_iters=chunk_iters, bound0=bound)
    ch = bool(jax.device_get(changed))
    nb = int(jax.device_get(jnp.sum(bound)))
    print(f"chunk {k}: {time.time()-t0:.2f}s changed={ch} nbound={nb}",
          flush=True)
    if not ch:
        break
print("done", flush=True)
