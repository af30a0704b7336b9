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
    lo = np.asarray(jax.device_get(jnp.min(jnp.stack(
        [jnp.min(jnp.asarray(e["ppos"]), 0) for e in entries]), 0)))
    hi = np.asarray(jax.device_get(jnp.max(jnp.stack(
        [jnp.max(jnp.asarray(e["ppos"]), 0) for e in entries]), 0)))
    grid = build_grid(lo.astype(np.float64), hi.astype(np.float64),
                      b_build, periodic=False, boxsize=0.0)
    if grid.total_cells > fof._DENSE_TABLE_MAX_CELLS:
        return
    B0 = len(entries)
    B = -(-B0 // ndev) * ndev
    reps = [entries[k if k < B0 else 0] for k in range(B)]
    sh = NamedSharding(mesh, P(PARTS_AXIS))
    pos_b = jax.device_put(jnp.stack(
        [jnp.asarray(e["ppos"]) for e in reps]), sh)
    vel_b = jax.device_put(jnp.stack(
        [jnp.asarray(e["pvel"]) for e in reps]), sh)
    ell_b = jax.device_put(jnp.stack(
        [jnp.asarray(e["ell"]) for e in reps]), sh)

    Ts = np.asarray(jax.device_get(S._subset_batch_totals(pos_b, grid)))
    t_pad = fof._pad_pow2(int(max(int(Ts.max()), 1)))
    # run on shallow copies: padded lanes repeat entries[0] and must not
    # write into it twice
    filled = [dict(e) for e in reps]
    mass_b = jax.device_put(jnp.stack(
        [jnp.asarray(e["pmass"]) for e in reps]), sh)
    S._subset_batch_run(opt, filled, pos_b, vel_b, ell_b, grid, t_pad,
                        mass_b=mass_b)
    for k in range(B0):
        if "sub_np" in filled[k]:
            entries[k]["sub_np"] = filled[k]["sub_np"]
            entries[k]["ng_sub"] = filled[k]["ng_sub"]
