"""Shipped sample configs run end-to-end + catalog match harness.

The reference validates releases by TreeFrog cross-matching catalogs
produced from the same snapshot (examples/catalogcomparisontolerancecheck.py,
SURVEY.md §4); examples/catalog_match.py is our equivalent gate.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

EXDIR = os.path.join(os.path.dirname(__file__), "..", "examples")


@pytest.fixture(scope="module")
def snapshot(tmp_path_factory):
    from velociraptor_stf_tpu.io import gadget as G
    from velociraptor_stf_tpu.io.synthetic import make_cosmo_mock

    d = tmp_path_factory.mktemp("examples")
    n = 32768
    pos, vel, mass = make_cosmo_mock(n, boxsize=20.0, nhalos=10, seed=31)
    fn = str(d / "snap.gdt")
    G.write_gadget(fn, pos, vel, np.arange(1, n + 1),
                   np.ones(n, np.int8), mass, boxsize=20.0,
                   time=1.0, omega0=0.3, omega_lambda=0.7, hubble=0.7)
    return d, fn


def test_sample_dm_config_runs(snapshot):
    from velociraptor_stf_tpu import cli

    d, fn = snapshot
    cfg = os.path.join(EXDIR, "sample_dmcosmological_run.cfg")
    out = str(d / "dmrun")
    rc = cli.main(["-C", cfg, "-i", fn, "-I", "1", "-o", out])
    assert rc == 0
    for ext in (".properties", ".catalog_groups", ".catalog_particles",
                ".profiles", ".hierarchy"):
        assert os.path.exists(out + ext), ext


def test_catalog_match_identical_runs(snapshot):
    from velociraptor_stf_tpu import cli

    sys.path.insert(0, EXDIR)
    try:
        import catalog_match as CM
    finally:
        sys.path.pop(0)

    d, fn = snapshot
    cfg = os.path.join(EXDIR, "sample_dmcosmological_run.cfg")
    outA = str(d / "runA")
    outB = str(d / "runB")
    assert cli.main(["-C", cfg, "-i", fn, "-I", "1", "-o", outA]) == 0
    assert cli.main(["-C", cfg, "-i", fn, "-I", "1", "-o", outB]) == 0
    fab = CM.match_fraction(outA, outB, min_size=20)
    fba = CM.match_fraction(outB, outA, min_size=20)
    assert fab == 1.0 and fba == 1.0


def test_catalog_match_detects_config_drift(snapshot):
    """A materially different linking length must NOT match perfectly —
    the harness actually discriminates."""
    from velociraptor_stf_tpu import cli
    from velociraptor_stf_tpu.utils import config as C

    sys.path.insert(0, EXDIR)
    try:
        import catalog_match as CM
    finally:
        sys.path.pop(0)

    d, fn = snapshot
    cfg = os.path.join(EXDIR, "sample_dmcosmological_run.cfg")
    outA = str(d / "runC")
    assert cli.main(["-C", cfg, "-i", fn, "-I", "1", "-o", outA]) == 0
    # halve the linking length — parse the keyword programmatically so a
    # cosmetic cfg edit cannot silently turn this into a no-op rewrite
    base = C.parse_config_file(cfg)
    lines, seen = [], False
    for ln in open(cfg).read().splitlines():
        key = ln.split("=", 1)[0].strip()
        if key == "Halo_3D_linking_length":
            ln = f"Halo_3D_linking_length={base.ellhalo3dxfac / 2}"
            seen = True
        lines.append(ln)
    assert seen, "sample cfg lost its Halo_3D_linking_length keyword"
    cfg2 = str(d / "drift.cfg")
    open(cfg2, "w").write("\n".join(lines) + "\n")
    drifted = C.parse_config_file(cfg2)
    assert drifted.ellhalo3dxfac == base.ellhalo3dxfac / 2
    outB = str(d / "runD")
    assert cli.main(["-C", cfg2, "-i", fn, "-I", "1", "-o", outB]) == 0
    fab = CM.match_fraction(outA, outB, min_size=20)
    assert fab < 1.0 or CM.match_fraction(outB, outA, min_size=20) < 1.0
