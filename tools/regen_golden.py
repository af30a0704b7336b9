"""Regenerate the wide golden catalog (tests/golden/golden_catalog2.npz).

Must run on the SAME backend the tests use (8-virtual-device CPU):

    python tools/regen_golden.py

The snapshot, configuration, pipeline invocation and writer-gate hashing
all live in tests/test_golden_writers.py — this tool only freezes their
output, so test and fixture can never drift apart.
"""
import os
import sys
import tempfile

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tests"))

import test_golden_writers as TG  # noqa: E402


def main():
    opt, res = TG.run_golden2_pipeline()
    pos, vel, mass, ptype, u, sfr, boxsize = TG.golden2_snapshot()
    ng = res.ngroups
    out = {
        "pfof": np.asarray(res.pfof),
        "ngroups": np.int64(ng),
        "parent": np.asarray(res.parent),
        "level": np.asarray(res.hierarchy_level),
        "hostid": np.asarray(res.hostid),
        "stype": (np.zeros(0, np.int32) if res.stype is None
                  else np.asarray(res.stype)),
        "so_offsets": (np.zeros(0, np.int64) if res.so_offsets is None
                       else np.asarray(res.so_offsets)),
        "so_indices": (np.zeros(0, np.int64) if res.so_indices is None
                       else np.asarray(res.so_indices)),
    }
    for k, v in res.props.items():
        out[f"prop_{k}"] = np.asarray(v)
    with tempfile.TemporaryDirectory() as td:
        gate = TG.writer_gate_products(
            opt, td, out["pfof"],
            {k[5:]: out[k] for k in out if k.startswith("prop_")}, ng,
            out["parent"], out["hostid"], out["level"],
            None if out["stype"].size == 0 else out["stype"],
            None if out["so_offsets"].size == 0 else out["so_offsets"],
            None if out["so_offsets"].size == 0 else out["so_indices"])
    for k, v in gate.items():
        out[f"gate_{k}"] = np.str_(v)
    np.savez_compressed(TG.GOLDEN2, **out)
    print(f"wrote {TG.GOLDEN2}: ngroups={ng}, "
          f"{sum(k.startswith('prop_') for k in out)} property columns, "
          f"{len(gate)} writer-gate entries")


if __name__ == "__main__":
    main()
