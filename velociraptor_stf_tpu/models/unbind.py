"""Gravitational unbinding.

TPU-native equivalent of the reference unbinding subsystem
(/root/reference/src/unbind.cxx): ``CheckUnboundGroups``:196, ``Unbind``:320
/732, iterative ejection helpers ``CheckGroupForBoundness``/
``FillUnboundArrays``:49-100, with the KD-tree potential replaced by the
bucketed direct / cell-monopole kernels in ops/gravity.py.

Semantics mirrored:
* a particle is bound when  Eratio * T + W < 0  with T the kinetic energy in
  the group's reference frame and W its gravitational potential energy;
* per iteration at most ``maxunbindfrac`` of the group's current particles
  are removed, least-bound first, and the reference frame (CM velocity) is
  re-estimated from the survivors (reference cmdelta re-evaluation);
* reference frame: ``CMVELREF`` = bound-particle CM velocity;  ``POTREF`` =
  mean velocity of the ``Npotref`` (or ``fracpotref`` fraction) particles at
  the potential minimum, held fixed during the iteration;
* groups dropping below MinSize are dissolved; with ``unbindtype ==
  USYSANDPART`` groups whose bound mass fraction falls below ``minEfrac``
  are dissolved (Min_bound_mass_frac);
* group ids are renumbered by decreasing size afterwards
  (ReorderGroupIDs semantics).

* ``Keep_background_potential=0``: ejected particles stop contributing to
  the group potential — implemented as the reference's bulk-recompute path
  (unbind.cxx:583-586,1199), re-evaluating the potential from bound
  survivors between ejection chunks.
"""

from __future__ import annotations

import os
import warnings
from dataclasses import dataclass
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import gravity, pallas_gravity, segments as seg
from ..utils.config import CMVELREF, POTREF, UPART, USYSANDPART, UnbindInfo
from ..utils.transfer import fetch_small

_DIRECT_CLASSES = (64, 256, 1024, 4096)


def compute_potential(pos, mass, pfof, num_groups: int, eps: float,
                      G: float, boxsize: Optional[float] = None
                      ) -> jnp.ndarray:
    """(N,) gravitational potential energy W_i = m_i * Phi_i within each
    particle's group (0 for untagged).  Size-bucketed direct sums; very
    large groups use the cell-monopole approximation."""
    pos = jnp.asarray(pos)
    mass = jnp.asarray(mass)
    n = pos.shape[0]
    if boxsize:
        pos = seg.unwrap_positions(pos, pfof, boxsize, num_groups)
    eps2 = jnp.asarray(eps * eps, pos.dtype)

    perm = seg.sort_by_group(pfof)
    g_s = pfof[perm]
    pos_s, mass_s = pos[perm], mass[perm]
    offsets = seg.group_offsets(g_s, num_groups)
    offs_h = np.asarray(jax.device_get(offsets))     # one tunnel sync
    sizes = offs_h[1:] - offs_h[:-1]                 # per gid
    starts = offs_h[:-1]
    gids = np.arange(num_groups + 1)

    w_s = None
    if pallas_gravity.pallas_potential_available():
        # single Pallas dense-tile pass over every group up to MAX_DIRECT;
        # only larger ones fall through to the bucket-tree classes.  A
        # Mosaic lowering failure latches the XLA bucket fallback (unless
        # VR_POT_PALLAS=1 forces the kernel, surfacing the error).
        try:
            direct_cut = pallas_gravity.MAX_DIRECT
            gid_direct = g_s
            if np.any(sizes[1:] > direct_cut):
                big_mask = jnp.asarray(sizes > direct_cut)
                gid_direct = jnp.where(big_mask[g_s], 0, g_s)
            ns_pad = -(-n // pallas_gravity.R_BLOCK) * pallas_gravity.R_BLOCK
            # kernel returns Sigma m_j / sqrt(d^2+eps^2); Phi = -G * that
            w_s = (-G) * pallas_gravity.potential_group_sorted(
                pos_s, mass_s, gid_direct, offsets, ns_pad,
                float(eps * eps)).astype(pos.dtype)
            big = gids[(gids > 0) & (sizes > direct_cut)]
        except Exception:
            if os.environ.get("VR_POT_PALLAS") == "1":
                raise
            warnings.warn("Pallas potential kernel failed to compile on "
                          "this backend; using the XLA bucket classes",
                          RuntimeWarning)
            pallas_gravity.mark_compile_failed()
            w_s = None
    if w_s is None:
        w_s = jnp.zeros(n, pos.dtype)
        prev_cap = 0
        for cap in _DIRECT_CLASSES:
            sel = gids[(gids > 0) & (sizes > prev_cap) & (sizes <= cap)]
            prev_cap = cap
            if len(sel) == 0:
                continue
            st = jnp.asarray(starts[sel], jnp.int32)
            cnt = jnp.asarray(sizes[sel], jnp.int32)
            wb = gravity.potential_class(pos_s, mass_s, st, cnt, cap, eps2, G)
            karange = jnp.arange(cap, dtype=jnp.int32)
            idx = jnp.minimum(st[:, None] + karange[None, :], n - 1)
            valid = karange[None, :] < cnt[:, None]
            w_s = w_s.at[jnp.where(valid, idx, n).reshape(-1)].add(
                wb.reshape(-1), mode="drop")
        big = gids[(gids > 0) & (sizes > _DIRECT_CLASSES[-1])]
    # very large groups: bucket-tree approximation, batched per pow2 size
    # class (zero-mass padding) so the tree kernels run once per class
    by_class: dict = {}
    for g in big:
        cpad = 1 << int(np.ceil(np.log2(sizes[g])))
        by_class.setdefault(cpad, []).append(g)
    for cpad, gs in sorted(by_class.items()):
        st = jnp.asarray(starts[gs], jnp.int32)
        cnt = jnp.asarray(sizes[gs], jnp.int32)
        karange = jnp.arange(cpad, dtype=jnp.int32)
        idx = jnp.minimum(st[:, None] + karange[None, :],
                          (st + cnt - 1)[:, None])        # clamp inside group
        valid = karange[None, :] < cnt[:, None]
        pg = pos_s[idx]                                   # (B,cpad,3)
        mg = jnp.where(valid, mass_s[idx], 0.0)
        wg = gravity.bucket_tree_potential_batch(pg, mg, float(eps * eps), G)
        out_idx = jnp.where(valid, idx, n)
        w_s = w_s.at[out_idx.reshape(-1)].add(
            jnp.where(valid, wg, 0.0).reshape(-1).astype(w_s.dtype),
            mode="drop")
    # scale by particle mass: stored W is potential ENERGY (refs multiply in)
    w_s = w_s * mass_s
    return jnp.zeros(n, pos.dtype).at[perm].set(w_s)


@partial(jax.jit, static_argnames=("num_groups", "cmvelreftype",
                                   "min_size", "max_iters",
                                   "sorted_layout"))
def _unbind_loop(vel, mass, pfof, W, potref_vel, num_groups: int,
                 Eratio, maxunbindfrac, min_size: int,
                 cmvelreftype: int, max_iters: int = 100,
                 bound0=None, sorted_layout: bool = False,
                 stats0=None):
    """Iterative ejection; returns (bound, stats, changed).

    ``max_iters`` bounds the device-side while_loop so a single dispatch
    stays short; the caller re-invokes until converged (the axon tunnel
    kills long-running kernels), threading the returned ``stats`` back
    in via ``stats0`` so the chunked sequence is bit-identical to one
    uninterrupted loop and the full-n stats init runs once.

    ``sorted_layout``: arrays are group-sorted (group 0 / padding first;
    stable order within groups, pfof non-decreasing).  Per-iteration
    per-group<->per-particle traffic then avoids the near-serial
    XLA:TPU table gathers/scatters (~40-140M elem/s — they dominated
    the 512^3 ejection): group sums become int32 cumsum+boundary-diffs
    (exact) and table->particle broadcasts become boundary-delta int32
    cumsums over the f32 bit patterns (``bcast_f32``) — modular
    cancellation is exact, so every broadcast value is bit-identical
    to the gather it replaces.
    """
    n = vel.shape[0]
    ng1 = num_groups + 1
    in_group = pfof > 0

    if sorted_layout:
        # segment geometry (static across iterations: pfof never changes)
        offsets = jnp.searchsorted(
            pfof, jnp.arange(ng1 + 1, dtype=pfof.dtype)).astype(jnp.int32)

        def bcast_flags(flags):
            """(ng1,) int flags -> per-particle flag of the containing
            group, as +flag at each group's start / -flag at its end and
            one native int cumsum — EXACT, and compile-lean (an
            associative_scan formulation OOM-killed the XLA compile at
            512^3 scale).  Empty groups add and subtract at the same
            slot (net 0)."""
            f = flags.astype(jnp.int32)
            d = jnp.zeros(n + 1, jnp.int32)
            d = d.at[offsets[:-1]].add(f)
            d = d.at[offsets[1:]].add(-f)
            return jnp.cumsum(d[:-1])

        def segsum_int(x):
            cum = jnp.concatenate([jnp.zeros(1, jnp.int32),
                                   jnp.cumsum(x.astype(jnp.int32))])
            return cum[offsets[1:]] - cum[offsets[:-1]]

        def bcast_f32(vals):
            """(ng1,) f32 table -> per-particle value of the containing
            group, BIT-EXACT, without a table gather (XLA:TPU gathers run
            ~40M elem/s — three of these dominated the 512^3 ejection
            iteration).  The int boundary-delta cumsum trick of
            ``bcast_flags`` applied to the f32 BIT PATTERNS: +bits at each
            group's start, -bits at its end, one int32 cumsum.  Modular
            int32 cancellation is exact, so every position inside group g
            reads exactly bits[g] — a pure SELECTION, bit-identical to
            the vals[pfof] gather it replaces."""
            bits = jax.lax.bitcast_convert_type(vals.astype(jnp.float32),
                                                jnp.int32)
            d = jnp.zeros(n + 1, jnp.int32)
            d = d.at[offsets[:-1]].add(bits)
            d = d.at[offsets[1:]].add(-bits)
            s = jnp.cumsum(d[:-1], dtype=jnp.int32)
            return jax.lax.bitcast_convert_type(s, jnp.float32)

    # Per-group stats ride the while_loop carry as a LANE-MAJOR (5, ng1)
    # table [m*vx, m*vy, m*vz, m, count], updated INCREMENTALLY by
    # subtracting the dropped particles' contributions each iteration —
    # the per-iteration cost is then ~4 n-sized gather/scatter passes
    # instead of ~10 (XLA:TPU gathers/scatters run near-serial, ~0.25 s
    # per 32M pass — they, not the rank sort, dominated the 512^3
    # ejection loop).  The update operand is (5, n) lane-major: an
    # (n, 5) minor-dim stack would be lane-padded 5 -> 128 by the
    # XLA:TPU layout (a 16 GB HBM blowup at 32M — the compile OOM'd).
    # Counts are f32 inside the table (exact to 2^24 members; the cap is
    # a 5% fraction so beyond that the rounding is immaterial and both
    # the single-device and sharded paths share this code).
    def _stats_delta_full(sel):
        # five separate 1D scatter-adds: a windowed scatter's (n, 5)
        # update operand is lane-padded 5 -> 128 by the XLA:TPU layout
        # (12 GB at 24M — the fused form OOM'd at runtime)
        w = jnp.where(sel, mass, 0.0)
        gidx = jnp.where(sel, pfof, ng1)
        rows = [w * vel[:, 0], w * vel[:, 1], w * vel[:, 2], w,
                sel.astype(w.dtype)]
        return jnp.stack([
            jnp.zeros(ng1, w.dtype).at[gidx].add(r, mode="drop")
            for r in rows])                                    # (5, ng1)

    # per-iteration deltas come from FEW particles (<= the per-group caps
    # + dissolutions): compact them first so the five scatters and the
    # vel/mass gathers run at budget size, not n
    delta_budget = max(1024, n // 8)

    def _stats_delta_compact(sel):
        dest = jnp.cumsum(sel.astype(jnp.int32)) - 1
        dest = jnp.where(sel, dest, delta_budget)
        idx = jnp.zeros(delta_budget, jnp.int32).at[dest].set(
            jnp.arange(n, dtype=jnp.int32), mode="drop")
        cnt = jnp.sum(sel.astype(jnp.int32))
        cvalid = jnp.arange(delta_budget) < cnt
        w = jnp.where(cvalid, mass[idx], 0.0)
        v = vel[idx]
        gidx = jnp.where(cvalid, pfof[idx], ng1)
        rows = [w * v[:, 0], w * v[:, 1], w * v[:, 2], w,
                cvalid.astype(w.dtype)]
        return jnp.stack([
            jnp.zeros(ng1, w.dtype).at[gidx].add(r, mode="drop")
            for r in rows])

    def _stats_delta(sel):
        cnt = jnp.sum(sel.astype(jnp.int32))
        return jax.lax.cond(cnt <= delta_budget, _stats_delta_compact,
                            _stats_delta_full, sel)

    group_stats = _stats_delta_full

    def cond_fn(state):
        bound, _, changed, it = state
        return changed & (it < max_iters)

    # ranked-path candidate budget: particles in cap-EXCEEDING groups are
    # compacted before the rank sort, so the per-iteration lexsort runs
    # over <= n // 8 slots instead of all n; the full sort only runs if
    # the compaction budget overflows (pathological: most of the box
    # over-cap at once)
    rank_budget = max(1024, n // 8)

    def body_fn(state):
        bound, stats, _, it = state
        if cmvelreftype == POTREF:
            vref = potref_vel
        else:
            vref = (stats[0:3] / jnp.maximum(stats[3:4], 1e-30)).T
        if sorted_layout:
            # three boundary-delta cumsum broadcasts (bit-identical to
            # the vref[:, c][pfof] gathers they replace, ~20x faster on
            # XLA:TPU; a fused (3, n) take would also be lane-padded
            # 3 -> 128 — a 16 GB HBM blowup at 512^3)
            dvx = vel[:, 0] - bcast_f32(vref[:, 0])
            dvy = vel[:, 1] - bcast_f32(vref[:, 1])
            dvz = vel[:, 2] - bcast_f32(vref[:, 2])
            T = 0.5 * mass * (dvx * dvx + dvy * dvy + dvz * dvz)
        else:
            dv = vel - seg.gather_rows(vref, pfof)
            T = 0.5 * mass * jnp.sum(dv * dv, axis=-1)
        E = Eratio * T + W
        unbound = (E > 0) & bound
        # cap removals per group: least-bound (highest E) first
        nb = stats[4].astype(jnp.int32)
        cap = jnp.maximum((maxunbindfrac * nb).astype(jnp.int32), 1)
        if sorted_layout:
            nu = segsum_int(unbound)
        else:
            nu = seg.segment_sum(unbound.astype(jnp.int32), pfof, ng1)
        exceed = nu > cap                        # (ng1,) groups over cap

        def rank_mask(keys_g, keys_e, length):
            """Removal mask for candidates with group keys ``keys_g``
            (ng1 = invalid, sorts last) and energies ``keys_e``: the
            cap[g] highest-E candidates of each group."""
            order = jnp.lexsort((-keys_e, keys_g))
            gseq = keys_g[order]
            offs = jnp.searchsorted(gseq,
                                    jnp.arange(ng1 + 1, dtype=jnp.int32),
                                    side="left").astype(jnp.int32)
            rank_sorted = jnp.arange(length, dtype=jnp.int32) - \
                offs[jnp.clip(gseq, 0, ng1)]
            remove_sorted = (gseq < ng1) & (rank_sorted < cap[
                jnp.clip(gseq, 0, num_groups)])
            return jnp.zeros(length, bool).at[order].set(remove_sorted)

        if sorted_layout:
            exceed_p = bcast_flags(exceed) > 0
        else:
            exceed_p = None

        def ranked_compact(_):
            # compact the exceeding-group unbound candidates, rank only
            # them; non-exceeding groups drop all their unbound
            cand = unbound & (exceed_p if sorted_layout
                              else exceed[pfof])
            dest = jnp.cumsum(cand.astype(jnp.int32)) - 1
            dest = jnp.where(cand, dest, rank_budget)
            idx = jnp.zeros(rank_budget, jnp.int32).at[dest].set(
                jnp.arange(n, dtype=jnp.int32), mode="drop")
            cnt = jnp.sum(cand.astype(jnp.int32))
            cvalid = jnp.arange(rank_budget) < cnt
            g_c = jnp.where(cvalid, pfof[idx], ng1)
            e_c = jnp.where(cvalid, E[idx], -jnp.inf)
            rm_c = rank_mask(g_c, e_c, rank_budget)
            keep_removed = jnp.zeros(n, bool).at[
                jnp.where(cvalid, idx, n)].set(rm_c, mode="drop")
            return keep_removed | (unbound & ~(
                exceed_p if sorted_layout else exceed[pfof]))

        def ranked_full(_):
            return rank_mask(jnp.where(unbound, pfof, ng1), E, n)

        def ranked(_):
            total = jnp.sum((unbound & (exceed_p if sorted_layout
                                        else exceed[pfof])
                             ).astype(jnp.int32))
            return jax.lax.cond(total <= rank_budget, ranked_compact,
                                ranked_full, None)

        def plain(_):
            return unbound

        # when every group's unbound count fits its cap, the ranked
        # removal keeps nothing back — removing all unbound is identical,
        # and the per-iteration rank sort is skipped entirely
        remove = jax.lax.cond(jnp.any(exceed), ranked, plain, None)
        remove = remove & bound
        # dissolve groups below min size (counts via the removal deltas,
        # not a fresh full segment sum)
        if sorted_layout:
            nrm = segsum_int(remove)
        else:
            nrm = seg.segment_sum(remove.astype(jnp.int32), pfof, ng1)
        nb2 = nb - nrm
        dissolved = nb2 < min_size
        if sorted_layout:
            bound2 = bound & ~remove & (bcast_flags(dissolved) == 0)
        else:
            bound2 = bound & ~remove & ~dissolved[pfof]
        # subtract every dropped particle's contribution from the carry
        dropped = bound & ~bound2
        stats2 = stats - _stats_delta(dropped)
        changed = jnp.any(dropped)
        return bound2, stats2, changed, it + 1

    if bound0 is None:
        bound0 = in_group
    # scalar carries derived from bound0 so their varying-axes type matches
    # bound0's under jax.shard_map (no-op values: True and 0)
    changed0 = jnp.any(bound0 | jnp.bool_(True))
    it0 = jnp.max(jnp.zeros_like(pfof))
    if stats0 is None:
        # host-chunked callers thread the returned stats back in: the
        # resulting iteration sequence is then bit-identical to ONE
        # uninterrupted while_loop (the incremental carry just keeps
        # evolving), and the full-n 5-row scatter-add init was the
        # single most expensive op of a late-chunk dispatch
        stats0 = group_stats(bound0)
    bound, stats, changed, iters = jax.lax.while_loop(
        cond_fn, body_fn, (bound0, stats0, changed0, it0))
    return bound, stats, changed


@dataclass
class UnbindResult:
    pfof: jnp.ndarray          # renumbered bound-group ids (original order)
    ngroups: int
    W: jnp.ndarray             # potential energy per particle
    Efrac: jnp.ndarray         # bound mass fraction per (old) group id
    bound: jnp.ndarray         # bool mask of particles kept in groups
    gid_map: Optional[jnp.ndarray] = None  # old gid -> new gid (0 dissolved)


def check_unbound_groups(pos, vel, mass, pfof, num_groups: int,
                         uinfo: UnbindInfo, G: float,
                         boxsize: Optional[float] = None,
                         min_size: int = 20,
                         W: Optional[jnp.ndarray] = None) -> UnbindResult:
    """Reference CheckUnboundGroups (unbind.cxx:196): compute potentials,
    iteratively eject unbound particles, dissolve / renumber groups."""
    pos = jnp.asarray(pos)
    vel = jnp.asarray(vel)
    mass = jnp.asarray(mass)
    pfof = jnp.asarray(pfof)
    n = pos.shape[0]
    ng1 = num_groups + 1

    # run potentials AND the ejection iteration on the tagged subset only:
    # every sort / segment / scatter then scales with the group population
    # (typically 10-20% of the box), not the full particle count
    tag = pfof > 0
    ntag = int(jax.device_get(jnp.sum(tag)))
    if 0 < ntag < n // 2:
        tpad = seg.pad_class(ntag)
        # subset built ALREADY group-sorted (stable: within-group order =
        # original order): the sorted-layout ejection then needs no
        # second sorted copy of the subset — at 512^3 those copies
        # (~1.7 GB) pushed the run over the v5e's HBM
        # padding slots must sort like group 0 (an all-zero TAIL would
        # break the non-decreasing pfof the scan machinery assumes), so
        # the subset is the LAST tpad entries of the full group-sorted
        # order: [(tpad-ntag) untagged pad | tagged sorted by group]
        order = jnp.argsort(jnp.where(tag, pfof, 0),
                            stable=True).astype(jnp.int32)
        sub_idx = order[n - tpad:]
        svalid = jnp.arange(tpad) >= (tpad - ntag)
        scatter_to = jnp.where(svalid, sub_idx, n)
        pos_t, vel_t, mass_t = pos[sub_idx], vel[sub_idx], mass[sub_idx]
        pfof_t = jnp.where(svalid, pfof[sub_idx], 0)
        if W is None:
            W_t = compute_potential(pos_t, jnp.where(svalid, mass_t, 0.0),
                                    pfof_t, num_groups, uinfo.eps, G,
                                    boxsize=boxsize)
            W = jnp.zeros(n, pos.dtype).at[scatter_to].set(
                W_t, mode="drop")
        else:
            W_t = W[sub_idx]
        bound_sub = _check_unbound_subset(
            pos_t, vel_t, mass_t, pfof_t, W_t,
            num_groups, uinfo, min_size, G, boxsize)
        bound = jnp.zeros(n, bool).at[scatter_to].set(bound_sub,
                                                      mode="drop")
        return _finalize_unbind(mass, pfof, bound, W, num_groups, uinfo,
                                min_size,
                                subset=(mass_t, pfof_t, bound_sub))

    if W is None:
        W = compute_potential(pos, mass, pfof, num_groups, uinfo.eps, G,
                              boxsize=boxsize)
    bound = _run_ejection(pos, vel, mass, pfof, W, num_groups, uinfo, G,
                          boxsize, min_size)
    return _finalize_unbind(mass, pfof, bound, W, num_groups, uinfo,
                            min_size)


def _run_ejection(pos, vel, mass, pfof, W, num_groups: int,
                  uinfo: UnbindInfo, G: float, boxsize, min_size: int,
                  presorted: bool = False):
    """POTREF frame + host-chunked iterative ejection -> bound mask."""
    ng1 = num_groups + 1

    # POTREF frame: mean velocity of particles near the potential minimum
    if uinfo.cmvelreftype == POTREF:
        perm = jnp.lexsort((W, pfof)).astype(jnp.int32)
        g_s = pfof[perm]
        offsets = seg.group_offsets(g_s, num_groups)
        rank = seg.segment_rank(g_s, offsets)
        counts = offsets[1:] - offsets[:-1]
        npot = jnp.maximum(
            (uinfo.fracpotref * counts[g_s]).astype(jnp.int32),
            uinfo.Npotref)
        selq = (rank < npot) & (g_s > 0)
        w = jnp.where(selq, mass[perm], 0.0)
        potref_vel = seg.segment_mean(vel[perm], w, g_s, ng1)
    else:
        potref_vel = jnp.zeros((ng1, 3), pos.dtype)

    # Keep_background_potential=0: ejected particles stop contributing to
    # the potential.  The reference recomputes the group potential wholesale
    # when many particles are removed (unbind.cxx:583-586,1199 — "more
    # computationally effective to simply recalculate"); here the potential
    # is recomputed from the bound survivors between device chunks (<= 4
    # ejection rounds per recompute), and ONLY for groups that ejected a
    # particle since their last recompute — an unchanged bound set yields an
    # identical potential, so the gating is exact.  This matters at scale:
    # the multi-million-particle bucket-tree groups usually stabilise after
    # the first round, and re-treeing them dominated unbind at 512^3.
    #
    # Shrinking working set: ejection is group-local (per-group vref, cap,
    # dissolution), and a group's reference frame changes ONLY when it
    # drops a particle — so a group that ejects nothing across a whole
    # chunk is at its fixed point and can never eject again (EXACT, not a
    # heuristic).  After each chunk the particles of still-active groups
    # are compacted to a padded class and later chunks run on that subset
    # only: most groups settle within the first chunk, so the 10-20
    # iteration tail (the reference's maxunbindfrac cap stretching big
    # halos over many rounds, unbind.cxx:63-100) runs on a small fraction
    # of the box instead of all of it.
    n_full = pfof.shape[0]
    bound_full = pfof > 0
    # group-sorted layout for the ejection (the scan/cumsum machinery in
    # _unbind_loop needs it).  ``presorted`` callers (the tagged-subset
    # path) built their arrays group-sorted already — no copies; the
    # stable sort otherwise preserves within-group order, so every
    # ranked tie-break matches the unsorted path bit-for-bit.
    if presorted:
        cur_vel, cur_mass, cur_pfof, cur_pos = vel, mass, pfof, pos
        W_cur = W
        cur_to_full = None          # identity
    else:
        perm0 = seg.sort_by_group(pfof)
        cur_vel, cur_mass = vel[perm0], mass[perm0]
        cur_pfof, cur_pos = pfof[perm0], pos[perm0]
        W_cur = W[perm0]
        cur_to_full = perm0
    bound = None
    stats = None
    prev_bound = cur_pfof > 0
    chunk_iters = 4
    prof = os.environ.get("VR_PROFILE_EJECT") == "1"
    if prof:
        import time as _time
        jax.block_until_ready(W_cur)
        _t0 = _time.time()
    for _ in range(64):  # host-chunked: bounded device time per dispatch
        bound, stats, changed = _unbind_loop(
            cur_vel, cur_mass, cur_pfof, W_cur, potref_vel, num_groups,
            jnp.asarray(uinfo.Eratio, pos.dtype),
            jnp.asarray(uinfo.maxunbindfrac, pos.dtype),
            min_size, uinfo.cmvelreftype, max_iters=chunk_iters,
            bound0=bound, sorted_layout=True, stats0=stats)
        if cur_to_full is None:
            bound_full = bound
        else:
            bound_full = bound_full.at[cur_to_full].set(bound,
                                                        mode="drop")
        if prof:
            jax.block_until_ready(bound)
            print(f"EJECT:: chunk loop {_time.time()-_t0:.2f}s "
                  f"ncur={cur_pfof.shape[0]}", flush=True)
            _t0 = _time.time()
        if not bool(fetch_small(changed)):
            break
        lost = seg.segment_sum(
            (prev_bound & ~bound).astype(jnp.int32), cur_pfof, ng1)
        grp_active = lost > 0
        if uinfo.bgpot == 0:
            pfof_rec = jnp.where(grp_active[cur_pfof], cur_pfof, 0)
            W_new = compute_potential(
                cur_pos, jnp.where(bound, cur_mass, 0.0), pfof_rec,
                num_groups, uinfo.eps, G, boxsize=boxsize)
            W_cur = jnp.where(grp_active[cur_pfof], W_new, W_cur)
        if prof:
            jax.block_until_ready(W_cur)
            print(f"EJECT:: recompute {_time.time()-_t0:.2f}s", flush=True)
            _t0 = _time.time()
        # compact to the active groups' bound particles when it pays
        sel = bound & grp_active[cur_pfof]
        nsel = int(fetch_small(jnp.sum(sel.astype(jnp.int32))))
        ncur = cur_pfof.shape[0]
        if 0 < nsel <= (3 * ncur) // 4:
            spad = seg.pad_class(nsel)
            # compact with the padding at the FRONT (group-0 slots): the
            # sorted-layout machinery needs cur_pfof non-decreasing, and
            # sel selects a subsequence of an already group-sorted array
            # — compact_mask's valid-first layout would leave a zero
            # TAIL, corrupting the searchsorted segment offsets (wrong
            # caps/dissolution counts post-compaction)
            dest = (spad - nsel) + jnp.cumsum(sel.astype(jnp.int32)) - 1
            dest = jnp.where(sel, dest, spad)
            sub_idx = jnp.zeros(spad, jnp.int32).at[dest].set(
                jnp.arange(ncur, dtype=jnp.int32), mode="drop")
            svalid = jnp.arange(spad) >= (spad - nsel)
            sub_idx = jnp.where(svalid, sub_idx, 0)
            cur_to_full = jnp.where(
                svalid,
                sub_idx if cur_to_full is None else cur_to_full[sub_idx],
                n_full)
            safe = jnp.where(svalid, sub_idx, 0)
            cur_vel = cur_vel[safe]
            cur_pos = cur_pos[safe]
            cur_mass = jnp.where(svalid, cur_mass[safe], 0.0)
            cur_pfof = jnp.where(svalid, cur_pfof[safe], 0)
            W_cur = W_cur[safe]
            bound = None            # = pfof>0 on the fresh subset
            stats = None            # stale layout: recompute on the subset
            prev_bound = cur_pfof > 0
            if prof:
                jax.block_until_ready(cur_pfof)
                print(f"EJECT:: compact {_time.time()-_t0:.2f}s "
                      f"-> {spad}", flush=True)
                _t0 = _time.time()
        else:
            prev_bound = bound
    return bound_full


def _check_unbound_subset(pos_t, vel_t, mass_t, pfof_t, W_t,
                          num_groups: int, uinfo: UnbindInfo,
                          min_size: int, G: float, boxsize):
    """Ejection on the compacted tagged-particle arrays -> bound mask.

    The subset holds every member of every group, so the bgpot=0 potential
    recomputes work on it directly (boxsize passed through for the periodic
    unwrap inside compute_potential)."""
    return _run_ejection(pos_t, vel_t, mass_t, pfof_t, W_t, num_groups,
                         uinfo, G, boxsize, min_size, presorted=True)


def _finalize_unbind(mass, pfof, bound, W, num_groups: int,
                     uinfo: UnbindInfo, min_size: int,
                     subset=None) -> "UnbindResult":
    """Efrac / USYSANDPART dissolution / renumber by size.

    ``subset=(mass_t, pfof_t, bound_t)``: compacted tagged arrays holding
    every group member — the per-group reductions then scale with the
    group population instead of the box (the full-array segment sums cost
    ~0.5 s at 256^3).  The returned pfof/bound stay full-length."""
    ng1 = num_groups + 1
    m_r, g_r, b_r = subset if subset is not None else (mass, pfof, bound)
    mass0 = seg.segment_sum(jnp.where(g_r > 0, m_r, 0.0), g_r, ng1)
    mass1 = seg.segment_sum(jnp.where(b_r, m_r, 0.0), g_r, ng1)
    Efrac = mass1 / jnp.maximum(mass0, 1e-30)
    if uinfo.unbindtype == USYSANDPART:
        ok = Efrac >= uinfo.minEfrac
        bound = bound & ok[pfof]
        b_r = b_r & ok[g_r]

    new_raw = jnp.where(bound, pfof, 0)
    # renumber surviving groups by decreasing size
    sizes = seg.group_sizes(jnp.where(b_r, g_r, 0), num_groups)
    eligible = (sizes >= min_size) & (jnp.arange(ng1) > 0)
    order = jnp.lexsort((jnp.arange(ng1), -jnp.where(eligible, sizes, 0)))
    ng_new = jnp.sum(eligible).astype(jnp.int32)
    gid_map = jnp.zeros(ng1, jnp.int32)
    ranks = jnp.arange(ng1, dtype=jnp.int32)
    gid_map = gid_map.at[order].set(jnp.where(ranks < ng_new, ranks + 1, 0))
    pfof_new = gid_map[new_raw]
    ng_new = int(fetch_small(ng_new))
    return UnbindResult(pfof=pfof_new, ngroups=ng_new, W=W, Efrac=Efrac,
                        bound=bound, gid_map=gid_map)


def sort_by_binding_energy(vel, mass, pfof, W, num_groups: int,
                           gcmvel: jnp.ndarray,
                           by_energy: bool = True) -> Tuple[jnp.ndarray,
                                                            jnp.ndarray,
                                                            jnp.ndarray]:
    """Reference SortAccordingtoBindingEnergy
    (substructureproperties.cxx:4256; the energy-vs-potential key switch
    on ``Sort_by_binding_energy`` is at :4308, ui.cxx:260): per-group
    permutation
    ordering particles most-bound-first (``by_energy``) or by potential
    alone; also returns per-group indices of the most bound particle and
    of the potential minimum."""
    n = vel.shape[0]
    ng1 = num_groups + 1
    dv = vel - seg.gather_rows(gcmvel, pfof)
    E = 0.5 * mass * jnp.sum(dv * dv, -1) + W
    sortval = E if by_energy else W
    key = jnp.where(pfof > 0, sortval, jnp.inf)
    perm = jnp.lexsort((key, pfof)).astype(jnp.int32)
    mbp = seg.segment_argmin(jnp.where(pfof > 0, E, jnp.inf), pfof, ng1)
    minpot = seg.segment_argmin(jnp.where(pfof > 0, W, jnp.inf), pfof, ng1)
    return perm, mbp, minpot
