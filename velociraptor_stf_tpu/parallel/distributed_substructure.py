"""Distributed substructure candidate search over a device mesh.

The sharded analog of the reference's MPI decomposition for SearchSubSub
(/root/reference/src/search.cxx:2480-2946: each rank owns whole halos and
runs the per-halo substructure pipeline locally; no cross-rank talk is
needed because structures are independent).

TPU-native design: the recursion already batches same-size structure
classes into vmapped dispatch chains
(models/substructure.py::_search_subset_batch).  The batch axis is
embarrassingly parallel, so distribution is pure data placement: stack
the class batch, shard it over the mesh's first axis (whole structures
per device) and run the SAME jitted phase-A/phase-B programs — GSPMD
partitions the vmap across devices; the only collectives are the scalar
all-reduces of the label fixed-point convergence tests.  The host-side
fmerge merge loops run on the gathered (tiny) sparse pair tables exactly
as in the single-device path, so results are bit-exact by construction.
"""

from __future__ import annotations

import math
from typing import List

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models import substructure as S
from ..ops import fof
from ..ops.cells import build_grid
from ..utils import config as C
from .mesh import PARTS_AXIS


def distributed_subset_batch(opt: C.Options, entries: List[dict],
                             mesh: Mesh) -> None:
    """Sharded ``_search_subset_batch``: same contract (fills
    ``e["sub_np"]``/``e["ng_sub"]``), structure batch sharded over
    ``mesh`` with whole structures per device.

    Entries must share one npad (one size class).  The batch is padded to
    a multiple of the mesh size by repeating the first structure; padded
    lanes are dropped from the results.
    """
    if not entries or not S._batchable_subset(opt):
        return
    ndev = mesh.devices.size
    b = opt.ellxscale * opt.ellphys
    b_build = b * max(1.0, opt.ellxfac)
    lo = np.min(np.stack([e["ppos"].min(0) for e in entries]), 0)
    hi = np.max(np.stack([e["ppos"].max(0) for e in entries]), 0)
    grid = build_grid(lo.astype(np.float64), hi.astype(np.float64),
                      b_build, periodic=False, boxsize=0.0)
    if grid.total_cells > fof._DENSE_TABLE_MAX_CELLS:
        return
    ellx2 = b * b
    costh_it = math.cos(opt.thetaopen * math.pi * opt.thetafac)
    pred0 = S.subset_predicate(opt, ellx2, opt.Vratio * opt.vfac,
                               costh_it, opt.ellthreshold * opt.ellfac)
    minsize0 = max(2, int(opt.MinSize * opt.nminfac))
    pred_att = S.StreamPredAttach(ellx2, opt.Vratio * opt.vfac, costh_it,
                                  opt.ellthreshold)
    pred_merge = S.StreamPred(ellx2, opt.Vratio * opt.vfac, costh_it,
                              opt.ellthreshold * opt.ellfac)
    pred_att2 = S.StreamPredAttach(ellx2 * opt.ellxfac ** 2,
                                   opt.Vratio * opt.vfac, costh_it,
                                   opt.ellthreshold * opt.ellfac)

    B0 = len(entries)
    B = -(-B0 // ndev) * ndev
    reps = [entries[k if k < B0 else 0] for k in range(B)]
    sh = NamedSharding(mesh, P(PARTS_AXIS))
    pos_b = jax.device_put(np.stack([e["ppos"] for e in reps]), sh)
    vel_b = jax.device_put(np.stack([e["pvel"] for e in reps]), sh)
    ell_b = jax.device_put(
        np.stack([np.asarray(e["ell"]) for e in reps]), sh)

    Ts = np.asarray(jax.device_get(S._subset_batch_totals(pos_b, grid)))
    t_pad = fof._pad_pow2(int(max(int(Ts.max()), 1)))
    npad = int(entries[0]["npad"])
    pair_cap = int(min(S._BATCH_PAIR_CAP, max(16, npad)))

    pfof1_b, ng_b, pi_b, pj_b, cnt_b, szj_b, nuni_b = S._subset_batch_a(
        pos_b, vel_b, ell_b, jnp.int32(minsize0), grid, t_pad, pred0,
        pred_att, pred_merge, pair_cap)
    ng_h, pi_h, pj_h, cnt_h, szj_h, nuni_h = jax.device_get(
        (ng_b, pi_b, pj_b, cnt_b, szj_b, nuni_b))
    ngmax = max(int(ng_h.max()), 1)
    targets = np.tile(np.arange(ngmax + 1, dtype=np.int32), (B, 1))
    handled = np.ones(B, bool)
    for k in range(B):
        if int(ng_h[k]) == 0:
            continue
        if int(nuni_h[k]) > pair_cap:
            handled[k] = False
            continue
        absorbed = np.zeros(int(ng_h[k]) + 1, bool)
        tgt = targets[k]
        for i, j, c, sj in zip(pi_h[k], pj_h[k], cnt_h[k], szj_h[k]):
            if i <= 0 or j <= 0 or c <= 0:
                continue
            if absorbed[i] or absorbed[j] or c <= opt.fmerge * float(sj):
                continue
            absorbed[j] = True
            tgt[tgt == j] = i
    target_b = jax.device_put(targets, sh)
    pfof_b, ngnew_b = S._subset_batch_b(
        pos_b, vel_b, ell_b, pfof1_b, target_b, grid, t_pad, pred_att2,
        float(opt.ellthreshold), float(opt.siglevel), int(opt.MinSize))
    pfof_h, ngnew_h = jax.device_get((pfof_b, ngnew_b))
    for k, e in enumerate(entries):
        if not handled[k]:
            continue
        e["sub_np"] = np.asarray(pfof_h[k])
        e["ng_sub"] = int(ngnew_h[k])
