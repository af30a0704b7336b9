"""Segmented (per-group) array operations.

TPU-native replacement for the reference's per-group bookkeeping arrays and
OpenMP loops over groups (/root/reference/src/buildandsortarrays.cxx:
``BuildNumInGroup``, ``BuildPGList``, ``BuildHead/Next/Len``, and the
``schedule(dynamic)`` per-group loops all over search.cxx / unbind.cxx /
substructureproperties.cxx).  On TPU, per-group work is expressed as
segment reductions and segment scans over group-sorted arrays — one fused
pass over the particle axis regardless of the group-size distribution, no
ragged task scheduling.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp


def pad_class(x: int, lo: int = 1024, align: int = 1024) -> int:
    """Smallest quarter-octave capacity class >= x (align-rounded):
    2^k x {1, 1.25, 1.5, 1.75}.  Static-shape padding waste drops from
    2x (pow2) to 1.19x at 4x the compile-variant count — per-element
    costs (sweeps, ejection iterations) scale with the PADDED size, so
    the tighter classes are worth the extra (persistently cached)
    compiles."""
    k = lo
    while k < x:
        k *= 2
    if k <= lo:
        return k
    h = k // 2
    for frac in (5, 6, 7):
        cand = -(-(h * frac // 4) // align) * align
        if cand >= x:
            return cand
    return k


def group_sizes(pfof: jnp.ndarray, num_groups: int) -> jnp.ndarray:
    """(num_groups+1,) particle counts per group id (id 0 = untagged).

    Reference equivalent: BuildNumInGroup (buildandsortarrays.cxx).
    """
    return jnp.zeros(num_groups + 1, jnp.int32).at[
        jnp.clip(pfof, 0, num_groups)].add(1)


def segment_sum(values: jnp.ndarray, seg: jnp.ndarray,
                num_segments: int) -> jnp.ndarray:
    """Per-segment sum; (N, k) inputs with small k reduce column-wise.

    A scatter-add whose operand is (N, 3) can be materialised by XLA:TPU
    with the minor dim lane-padded 3 -> 128 (a ~43x HBM blowup that OOMs
    at 256^3 scale); per-column (N,) reductions avoid that layout."""
    if values.ndim == 2 and values.shape[1] <= 4:
        return jnp.stack(
            [jax.ops.segment_sum(values[:, j], seg,
                                 num_segments=num_segments)
             for j in range(values.shape[1])], axis=-1)
    return jax.ops.segment_sum(values, seg, num_segments=num_segments)


def compact_mask(mask: jnp.ndarray, pad: int):
    """Compact the True positions of ``mask`` to the front of a ``pad``-
    length index array.  Returns (sub_idx, svalid, scatter_to):
    ``sub_idx`` (pad,) = source index per subset slot (0 on padding,
    safe for gathers), ``svalid`` = slot validity, ``scatter_to`` =
    per-slot destination for scatter-back (n on padding, for use with
    mode='drop' — plain scatters with duplicate destinations are
    order-unspecified and would clobber index 0)."""
    n = mask.shape[0]
    dest = jnp.cumsum(mask) - 1
    dest = jnp.where(mask, dest, pad)
    sub_idx = jnp.zeros(pad, jnp.int32).at[dest].set(
        jnp.arange(n, dtype=jnp.int32), mode="drop")
    nsub = jnp.sum(mask)
    svalid = jnp.arange(pad) < nsub
    sub_idx = jnp.where(svalid, sub_idx, 0)
    scatter_to = jnp.where(svalid, sub_idx, n)
    return sub_idx, svalid, scatter_to


@jax.jit
def _pair_sort_boundaries(gi, gj, mask):
    big = jnp.int32(2**31 - 1)
    a = jnp.where(mask, gi, big).astype(jnp.int32)
    b = jnp.where(mask, gj, big).astype(jnp.int32)
    # lexicographic (a, b) via two stable argsorts (int32-safe for any ng)
    o1 = jnp.argsort(b, stable=True).astype(jnp.int32)
    order = o1[jnp.argsort(a[o1], stable=True).astype(jnp.int32)]
    a_s, b_s = a[order], b[order]
    valid = a_s != big
    first = jnp.concatenate([
        jnp.ones(1, bool),
        (a_s[1:] != a_s[:-1]) | (b_s[1:] != b_s[:-1])]) & valid
    return a_s, b_s, first, jnp.sum(first), jnp.sum(valid)


@partial(jax.jit, static_argnames=("cap",))
def _pair_compact(a_s, b_s, first, n_valid, cap: int):
    idx, ivalid, _ = compact_mask(first, cap)
    starts = jnp.where(ivalid, idx, n_valid)
    ends = jnp.concatenate([starts[1:], jnp.full(1, n_valid, starts.dtype)])
    ends = jnp.minimum(ends, n_valid)
    counts = jnp.where(ivalid, ends - starts, 0)
    pi = jnp.where(ivalid, a_s[idx], 0)
    pj = jnp.where(ivalid, b_s[idx], 0)
    return pi, pj, counts


def pair_counts_sparse(gi: jnp.ndarray, gj: jnp.ndarray, mask: jnp.ndarray):
    """Sparse (i, j) pair-occurrence counts over masked index pairs.

    Sorts the pairs lexicographically on device and segment-counts runs —
    the sparse replacement for a dense (ng+1)^2 link-count matrix
    (reference MergeGroups' NumberofLinks bookkeeping, search.cxx:3894+),
    which at thousands of substructure candidates would not fit.  Returns
    host numpy (pairs_i, pairs_j, counts) of the distinct pairs, ordered
    lexicographically.  Two tunnel syncs (unique count + compacted table).
    """
    a_s, b_s, first, n_unique_d, n_valid_d = _pair_sort_boundaries(
        jnp.asarray(gi), jnp.asarray(gj), jnp.asarray(mask))
    n_unique = int(jax.device_get(n_unique_d))
    if n_unique == 0:
        z = jnp.zeros(0, jnp.int32)
        return (jax.device_get(z),) * 3
    cap = 1 << max(int(n_unique - 1).bit_length(), 4)
    pi, pj, counts = _pair_compact(a_s, b_s, first, n_valid_d, cap)
    import numpy as _np
    pi, pj, counts = (_np.asarray(jax.device_get(x))[:n_unique]
                      for x in (pi, pj, counts))
    return pi, pj, counts


def gather_rows(table: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """``table[idx]`` for (k, d) tables with small minor dim, gathered
    component-wise: the XLA:TPU row-gather of such tables can pick a
    (8, 128)-tiled result layout that lane-pads d -> 128 (~43x HBM blowup,
    OOM at 256^3 scale)."""
    if table.ndim == 2 and table.shape[1] <= 4:
        return jnp.stack([table[:, j][idx] for j in range(table.shape[1])],
                         axis=-1)
    return table[idx]


def segment_outer(a: jnp.ndarray, b: jnp.ndarray, w: jnp.ndarray,
                  seg: jnp.ndarray, num_segments: int) -> jnp.ndarray:
    """Per-segment weighted outer-product sum: (nseg, 3, 3) of
    sum_i w_i a_i (x) b_i — computed as nine (N,) component reductions.
    A direct (N, 3, 3) intermediate is never formed: XLA pads the minor
    (3, 3) dims to hardware tiles (4, 128), a ~38x memory blowup that
    OOMs at 256^3 scale."""
    rows = []
    for i in range(3):
        cols = [segment_sum(a[:, i] * b[:, j] * w, seg, num_segments)
                for j in range(3)]
        rows.append(jnp.stack(cols, axis=-1))
    return jnp.stack(rows, axis=-2)


def segment_mean(values: jnp.ndarray, weights: jnp.ndarray, seg: jnp.ndarray,
                 num_segments: int) -> jnp.ndarray:
    """Weighted per-segment mean along axis 0 (extra axes broadcast)."""
    if values.ndim > 1:
        w = weights[:, None]
    else:
        w = weights
    num = segment_sum(values * w, seg, num_segments)
    den = jax.ops.segment_sum(weights, seg, num_segments=num_segments)
    den = jnp.maximum(den, 1e-30)
    if values.ndim > 1:
        return num / den[:, None]
    return num / den


def sort_by_group(pfof: jnp.ndarray, key: jnp.ndarray = None
                  ) -> jnp.ndarray:
    """Permutation sorting particles by (group id, key).  Group 0 (untagged)
    sorts first; use descending keys trick by passing -key if needed.

    Reference equivalent: the PID-sort at search.cxx:427-436 that brings each
    group's particles contiguous.
    """
    if key is None:
        return jnp.argsort(pfof, stable=True).astype(jnp.int32)
    return jnp.lexsort((key, pfof)).astype(jnp.int32)


def group_offsets(pfof_sorted: jnp.ndarray, num_groups: int) -> jnp.ndarray:
    """(num_groups+2,) start offset of each group id in group-sorted order.

    offsets[g]..offsets[g+1] is group g's slice.
    """
    ids = jnp.arange(num_groups + 2, dtype=pfof_sorted.dtype)
    return jnp.searchsorted(pfof_sorted, ids, side="left").astype(jnp.int32)


def segment_cumsum(values: jnp.ndarray, seg_sorted: jnp.ndarray,
                   offsets: jnp.ndarray) -> jnp.ndarray:
    """Inclusive cumulative sum within contiguous segments.

    ``seg_sorted`` must be non-decreasing; ``offsets`` from group_offsets.
    """
    total = jnp.cumsum(values, axis=0)
    # value of cumsum just before each segment's start
    starts = offsets[seg_sorted]                      # (N,) start idx per row
    base = jnp.where(starts > 0, total[jnp.maximum(starts - 1, 0)],
                     jnp.zeros_like(total[0]))
    return total - base


def segment_rank(seg_sorted: jnp.ndarray, offsets: jnp.ndarray) -> jnp.ndarray:
    """0-based rank of each element within its contiguous segment."""
    n = seg_sorted.shape[0]
    return jnp.arange(n, dtype=jnp.int32) - offsets[seg_sorted]


def segment_max(values: jnp.ndarray, seg: jnp.ndarray,
                num_segments: int) -> jnp.ndarray:
    return jax.ops.segment_max(values, seg, num_segments=num_segments)


def segment_min(values: jnp.ndarray, seg: jnp.ndarray,
                num_segments: int) -> jnp.ndarray:
    return jax.ops.segment_min(values, seg, num_segments=num_segments)


def segment_argmin(values: jnp.ndarray, seg: jnp.ndarray,
                   num_segments: int) -> jnp.ndarray:
    """Index (into the full array) of the per-segment minimum."""
    n = values.shape[0]
    vmin = segment_min(values, seg, num_segments)
    is_min = values == vmin[seg]
    idx = jnp.where(is_min, jnp.arange(n, dtype=jnp.int32), n)
    return segment_min(idx, seg, num_segments)


def unwrap_positions(pos: jnp.ndarray, pfof: jnp.ndarray, boxsize: float,
                     num_groups: int) -> jnp.ndarray:
    """Remove periodic wraps within each group so group geometry is simply
    connected (reference AdjustStructureForPeriod, search.cxx:856-909).

    Each group's particles are mapped to the minimum image relative to one
    reference member (the lowest-index particle of the group).  Untagged
    (pfof=0) particles are left as-is.
    """
    n = pos.shape[0]
    first = segment_argmin(jnp.arange(n, dtype=jnp.int32), pfof,
                           num_groups + 1)
    ref = pos[jnp.clip(first[jnp.clip(pfof, 0, num_groups)], 0, n - 1)]
    d = pos - ref
    d = d - boxsize * jnp.round(d / boxsize)
    unwrapped = ref + d
    return jnp.where((pfof > 0)[:, None], unwrapped, pos)
