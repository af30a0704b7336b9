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


def test_swifthydro_3dfof_config_via_api(tmp_path):
    """BASELINE scenario sample_swifthydro_3dfof_subhalo.cfg through the
    in-memory library API (the SWIFT Init/Invoke route, reference
    swiftinterface.cxx:120/273)."""
    from velociraptor_stf_tpu.api import (SimInfo, VelociraptorSession)
    from velociraptor_stf_tpu.io.synthetic import make_cosmo_mock

    boxsize = 20.0
    n = 32768
    pos, vel, mass = make_cosmo_mock(n, boxsize=boxsize, nhalos=10, seed=31)
    ptype = np.where(np.arange(n) % 6 == 5, 0, 1).astype(np.int32)
    s = VelociraptorSession(
        config=os.path.join(EXDIR, "sample_swifthydro_3dfof_subhalo.cfg"))
    s.opt.outname = str(tmp_path / "swift3d")
    out = s.invoke(pos, vel, mass, pids=np.arange(1, n + 1), ptype=ptype,
                   sim=SimInfo(period=boxsize,
                               interparticlespacing=boxsize / n ** (1 / 3),
                               icosmologicalsim=1),
                   outname=s.opt.outname, write_output=True)
    assert out["ngroups"] >= 1
    assert (out["group_id"] > 0).sum() >= 20
    assert os.path.exists(s.opt.outname + ".properties")
    assert os.path.exists(s.opt.outname + ".catalog_groups")


def test_zoomhydro_config_end_to_end(tmp_path):
    """BASELINE scenario sample_zoomhydrocosmological_run.cfg: gas +
    high-res DM + low-res interloper DM through the CLI."""
    from velociraptor_stf_tpu import cli
    from velociraptor_stf_tpu.io import gadget as G
    from velociraptor_stf_tpu.io.synthetic import make_cosmo_mock

    rng = np.random.default_rng(8)
    boxsize = 20.0
    nhr = 24576
    pos, vel, mass = make_cosmo_mock(nhr, boxsize=boxsize, nhalos=8,
                                     seed=13)
    # gas rides a subset of the DM field; low-res heavy DM fills the edges
    ngas, nlr = nhr // 6, 2048
    gsel = rng.choice(nhr, ngas, replace=False)
    lpos = rng.uniform(0, boxsize, (nlr, 3)).astype(np.float32)
    lvel = rng.normal(0, 60, (nlr, 3)).astype(np.float32)
    pos = np.concatenate([pos[gsel] + 0.01, pos, lpos])
    vel = np.concatenate([vel[gsel], vel, lvel])
    mass = np.concatenate([mass[gsel] * 0.15, mass, mass[:nlr] * 8.0])
    ptype = np.concatenate([np.zeros(ngas, np.int8),
                            np.ones(nhr, np.int8),
                            np.full(nlr, 2, np.int8)])
    n = len(pos)
    fn = str(tmp_path / "zoomsnap")
    G.write_gadget(fn, pos, vel, np.arange(1, n + 1), ptype, mass,
                   boxsize=boxsize, time=1.0, omega0=0.3,
                   omega_lambda=0.7, hubble=0.7)
    cfg = os.path.join(EXDIR, "sample_zoomhydrocosmological_run.cfg")
    out = str(tmp_path / "zoomrun")
    assert cli.main(["-C", cfg, "-i", fn, "-I", "1", "-o", out]) == 0
    for ext in (".properties", ".catalog_groups", ".catalog_particles",
                ".catalog_parttypes", ".profiles"):
        assert os.path.exists(out + ext), ext


def test_genesis_config_end_to_end(tmp_path):
    """BASELINE scenario genesis2019_configuration.cfg (large-box
    production parameter set: adaptive 6DFOF + iterative substructure +
    full core separation + inclusive FOF masses) at CI scale."""
    from velociraptor_stf_tpu import cli
    from velociraptor_stf_tpu.io import gadget as G
    from velociraptor_stf_tpu.io.synthetic import make_cosmo_mock

    boxsize = 20.0
    n = 32768
    pos, vel, mass = make_cosmo_mock(n, boxsize=boxsize, nhalos=10, seed=29)
    fn = str(tmp_path / "gsnap")
    G.write_gadget(fn, pos, vel, np.arange(1, n + 1), np.ones(n, np.int8),
                   mass, boxsize=boxsize, time=1.0, omega0=0.3,
                   omega_lambda=0.7, hubble=0.7)
    cfg = os.path.join(EXDIR, "genesis2019_configuration.cfg")
    out = str(tmp_path / "genrun")
    assert cli.main(["-C", cfg, "-i", fn, "-I", "1", "-o", out]) == 0
    for ext in (".properties", ".catalog_groups", ".hierarchy"):
        assert os.path.exists(out + ext), ext
    # inclusive FOF SO masses present (Inclusive_halo_masses=2)
    import h5py

    with h5py.File(out + ".properties") as f:
        assert int(f["Num_of_groups"][()]) >= 1
        assert "Mass_200crit" in f
