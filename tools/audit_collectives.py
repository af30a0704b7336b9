"""Collective-volume audit table for the sharded pipeline.

Runs the full mesh pipeline on the virtual CPU device mesh and prints
per-stage collective payloads (the honest multi-chip *cost* evidence this
single-chip environment can produce; reference analog: the export-count
accounting in /root/reference/src/mpiroutines.cxx:783-1202).

Bytes are STATIC per-op payloads counted at trace time
(parallel/collectives.py); ops inside while_loop bodies execute once per
round — the printed table multiplies ppermute/psum rounds using the
fof sweep telemetry where known.

Usage:
    VR_AUDIT_N=$((2**22)) python tools/audit_collectives.py
"""
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from velociraptor_stf_tpu.io.synthetic import make_cosmo_mock  # noqa: E402
from velociraptor_stf_tpu.models.pipeline import find_structures  # noqa: E402
from velociraptor_stf_tpu.parallel.mesh import make_mesh  # noqa: E402
from velociraptor_stf_tpu.utils import config as C, telemetry  # noqa: E402


def main():
    n = int(os.environ.get("VR_AUDIT_N", 1 << 20))
    boxsize = 100.0
    pos, vel, mass = make_cosmo_mock(n, boxsize=boxsize,
                                     nhalos=max(64, n // 16384), seed=7)
    opt = C.Options()
    opt.ellphys = 0.2
    opt.ellxscale = boxsize / n ** (1 / 3)
    opt.fofbgtype = C.FOF6D
    opt.MinSize = 20
    opt.HaloMinSize = 32
    opt.uinfo.unbindflag = 1
    opt.iBoundHalos = 1
    opt.G = 43.0211349
    opt.iSubSearch = int(os.environ.get("VR_AUDIT_SUB", "0"))
    opt.iiterflag = opt.iSubSearch
    C.config_check(opt)
    mesh = make_mesh(jax.device_count())

    telemetry.reset()
    res = find_structures(opt, pos, vel, mass, boxsize=boxsize, mesh=mesh)
    snap = telemetry.snapshot()
    print(f"n={n} ndev={mesh.devices.size} ngroups={res.ngroups} "
          f"full-set f32 bytes={4 * n:,}")
    print(f"{'stage::kind':<28}{'ops':>5}{'bytes/op':>14}"
          f"{'traced total':>14}  note")
    for k in sorted(snap):
        if not k.startswith("coll_bytes::"):
            continue
        tail = k[len("coll_bytes::"):]
        stage = tail.split("::")[0]
        ops = snap["coll_ops::" + tail]
        per = snap[k] // max(ops, 1)
        note = ""
        if stage in ("fof3d", "fof6d") and tail.endswith("ppermute"):
            note = ("traced once; executes once per fixpoint round "
                    "(runtime round counts: Pallas-path telemetry)")
        if tail.endswith("reshard"):
            note = "one-shot bulk deal (MPIGroupExchange analog)"
        frac = snap[k] / (4 * n)
        print(f"{tail:<28}{ops:>5}{per:>14,}{snap[k]:>14,}  "
              f"{frac:.3f}x full-set  {note}")


if __name__ == "__main__":
    main()
