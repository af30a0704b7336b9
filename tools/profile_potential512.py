"""Decompose compute_potential at 512^3 into its stages: group sort,
Pallas direct pass, and the per-class bucket-tree path (reads the FOF
labels cached by tools/profile_unbind512.py).

Every stage is wrapped in jit: eager ops on the axon tunnel compile
one-op programs whose (N,3) layout copies pad the minor dim to 128
lanes (42.7x HBM expansion -> OOM at 512^3).
"""
import os, time, sys
from functools import partial
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/vr_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

from velociraptor_stf_tpu.ops import gravity, pallas_gravity, segments as seg

n = int(os.environ.get("VR_BENCH_N", 512 ** 3))
boxsize = 100.0
with np.load(f"/tmp/vr_mock_{n}_s7.npz") as z:
    pos_h, mass_h = z["pos"], z["mass"]
with np.load(f"/tmp/vr_pfof_{n}_s7.npz") as z:
    pfof_h, ng = z["pfof"], int(z["ng"])

eps, G = 0.0, 43.0211349

# tagged-subset compaction exactly as check_unbound_groups does
tag_h = pfof_h > 0
ntag = int(tag_h.sum())
tpad = 1024
while tpad < ntag:
    tpad *= 2


@jax.jit
def _compact(pos, mass, pfof):
    sub_idx, svalid, _ = seg.compact_mask(pfof > 0, tpad)
    pos_t = pos[sub_idx]
    mass_t = jnp.where(svalid, mass[sub_idx], 0.0)
    pfof_t = jnp.where(svalid, pfof[sub_idx], 0)
    return pos_t, mass_t, pfof_t


@partial(jax.jit, static_argnames=("ngroups",))
def _stage_unwrap(pos_t, pfof_t, ngroups):
    return seg.unwrap_positions(pos_t, pfof_t, boxsize, ngroups)


@partial(jax.jit, static_argnames=("ngroups",))
def _stage_sort(posu, mass_t, pfof_t, ngroups):
    perm = seg.sort_by_group(pfof_t)
    g_s = pfof_t[perm]
    return g_s, posu[perm], mass_t[perm], seg.group_offsets(g_s, ngroups)


@partial(jax.jit, static_argnames=("ns_pad",))
def _stage_direct(pos_s, mass_s, g_s, offsets, big_mask, ns_pad):
    gid_direct = jnp.where(big_mask[g_s], 0, g_s)
    return (-G) * pallas_gravity.potential_group_sorted(
        pos_s, mass_s, gid_direct, offsets, ns_pad, 0.0)


@partial(jax.jit, static_argnames=("cpad",))
def _stage_bucket(pos_s, mass_s, st, cnt, cpad):
    kar = jnp.arange(cpad, dtype=jnp.int32)
    idx = jnp.minimum(st[:, None] + kar[None, :], (st + cnt - 1)[:, None])
    valid = kar[None, :] < cnt[:, None]
    pg = pos_s[idx]
    mg = jnp.where(valid, mass_s[idx], 0.0)
    return gravity.bucket_tree_potential_batch(pg, mg, 0.0, G)


pos = jnp.asarray(pos_h); mass = jnp.asarray(mass_h)
pfof = jnp.asarray(pfof_h)
pos_t, mass_t, pfof_t = _compact(pos, mass, pfof)
jax.device_get(pfof_t[-1:])
print(f"ntag={ntag} tpad={tpad}", flush=True)


def sync(x):
    # block_until_ready, NOT device_get of a slice: an eager ravel/slice
    # compiles a one-op program whose (N,3) layout copy pads to 128 lanes
    for leaf in jax.tree_util.tree_leaves(x):
        jax.block_until_ready(leaf)


for rep in range(2):
    t0 = time.time()
    posu = _stage_unwrap(pos_t, pfof_t, ng)
    sync(posu); t1 = time.time()
    g_s, pos_s, mass_s, offsets = _stage_sort(posu, mass_t, pfof_t, ng)
    sync(offsets); t2 = time.time()
    offs_hh = np.asarray(jax.device_get(offsets))
    sizes = offs_hh[1:] - offs_hh[:-1]
    t3 = time.time()
    direct_cut = pallas_gravity.MAX_DIRECT
    big_mask = jnp.asarray(sizes > direct_cut)
    ns_pad = -(-tpad // pallas_gravity.R_BLOCK) * pallas_gravity.R_BLOCK
    w_s = _stage_direct(pos_s, mass_s, g_s, offsets, big_mask, ns_pad)
    sync(w_s); t4 = time.time()
    gids = np.arange(ng + 1)
    starts = offs_hh[:-1]
    big = gids[(gids > 0) & (sizes > direct_cut)]
    by_class = {}
    for g in big:
        cpad = 1 << int(np.ceil(np.log2(sizes[g])))
        by_class.setdefault(cpad, []).append(g)
    for cpad, gs in sorted(by_class.items()):
        tc = time.time()
        st = jnp.asarray(starts[gs], jnp.int32)
        cnt = jnp.asarray(sizes[gs], jnp.int32)
        wg = _stage_bucket(pos_s, mass_s, st, cnt, cpad)
        sync(wg)
        print(f"  class cpad={cpad} B={len(gs)}: {time.time()-tc:.2f}s",
              flush=True)
    t5 = time.time()
    print(f"rep{rep}: unwrap={t1-t0:.2f} sort={t2-t1:.2f} "
          f"offsets_host={t3-t2:.2f} pallas_direct={t4-t3:.2f} "
          f"bucket_total={t5-t4:.2f} total={t5-t0:.2f}", flush=True)
