"""Collective-volume audit of the mesh pipeline (round-5 VERDICT item 4).

The reference accounts for every MPI export byte (export counts/buffer
sizing, /root/reference/src/mpiroutines.cxx:783-1202); here the audited
collective wrappers (parallel/collectives.py) record each sharded
stage's traced payload bytes.  This test runs the full sharded metric
pipeline (+ recursion + baryons) on the virtual device mesh and asserts
NO stage issues a collective whose payload is full-set-sized — i.e. the
mesh path really exchanges boundaries and per-group tables, never a
replicated O(N) array.  (Per-op payloads are static shapes counted at
trace time; multiply by the sweep-count telemetry for wall totals —
tools/audit_collectives.py prints that table.)
"""

import numpy as np
import pytest

import jax

from velociraptor_stf_tpu.io.synthetic import make_cosmo_mock
from velociraptor_stf_tpu.models.pipeline import find_structures
from velociraptor_stf_tpu.parallel.mesh import make_mesh
from velociraptor_stf_tpu.utils import config as C, telemetry


@pytest.mark.skipif(jax.device_count() < 2, reason="needs a device mesh")
def test_no_stage_moves_full_set_payloads():
    boxsize = 40.0
    n = 1 << 16
    pos, vel, mass = make_cosmo_mock(n, boxsize=boxsize, nhalos=20, seed=9)
    ptype = np.where(np.arange(n) % 6 == 5, C.GASTYPE,
                     C.DARKTYPE).astype(np.int32)
    opt = C.Options()
    opt.ellphys = 0.2
    opt.ellxscale = boxsize / n ** (1 / 3)
    opt.fofbgtype = C.FOF6D
    opt.MinSize = 20
    opt.HaloMinSize = 32
    opt.uinfo.unbindflag = 1
    opt.iBoundHalos = 1
    opt.G = 43.0211349
    opt.iSubSearch = 1
    opt.iiterflag = 1
    opt.iBaryonSearch = 1
    opt.partsearchtype = C.PSTALL
    C.config_check(opt)
    mesh = make_mesh(jax.device_count())

    telemetry.reset()
    res = find_structures(opt, pos, vel, mass, boxsize=boxsize,
                          ptype=ptype, mesh=mesh)
    assert res.ngroups > 0
    snap = telemetry.snapshot()
    byte_keys = [k for k in snap if k.startswith("coll_bytes::")]
    # the sharded FOF must actually have been audited
    assert any("::fof3d::" in k for k in byte_keys), snap

    full_set_bytes = n * 4
    for k in byte_keys:
        ops = snap["coll_ops::" + k[len("coll_bytes::"):]]
        per_op = snap[k] / max(ops, 1)
        if k.endswith("::reshard"):
            # the one-shot grouppack/slab deals legitimately move the
            # (padded) working set ONCE — the MPIGroupExchange analog;
            # bound the total so padding blowups would still surface
            assert snap[k] < 24 * full_set_bytes, (k, snap[k])
            continue
        # ghost slabs / per-group tables / scalars — never a full-set
        # (or replicated) array per op
        assert per_op < full_set_bytes, (k, per_op, snap[k], ops)
