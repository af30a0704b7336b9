"""Config options that gate pipeline behaviour (round-2 VERDICT item 8).

Each wired option must observably change output:
Singlehalo_search (main.cxx:285), Bound_halos (search.cxx:702,2841),
Sort_by_binding_energy (substructureproperties.cxx:4308),
Reference_frame_for_properties (:327-329),
aperture half-mass radii (:4639).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from velociraptor_stf_tpu.io.synthetic import make_cosmo_mock
from velociraptor_stf_tpu.models import pipeline, unbind as ub
from velociraptor_stf_tpu.models import properties as props_mod
from velociraptor_stf_tpu.utils import config as C


def _base_opt(n, boxsize):
    opt = C.Options()
    opt.ellphys = 0.2
    opt.ellxscale = boxsize / n ** (1 / 3)
    opt.fofbgtype = C.FOF6D
    opt.MinSize = 20
    opt.HaloMinSize = 32
    opt.G = 43.0211349
    opt.iSubSearch = 0
    return opt


@pytest.mark.slow
def test_singlehalo_search_skips_field_search():
    n = 4096
    boxsize = 10.0
    pos, vel, mass = make_cosmo_mock(n, boxsize=boxsize, nhalos=4, seed=40)
    opt = _base_opt(n, boxsize)
    opt.iSingleHalo = 1
    opt.uinfo.unbindflag = 0
    C.config_check(opt)
    res = pipeline.find_structures(opt, pos, vel, mass, boxsize=boxsize)
    assert res.ngroups == 1
    assert (np.asarray(res.pfof) == 1).all()


@pytest.mark.slow
def test_bound_halos_gates_field_unbind():
    n = 1 << 14
    boxsize = 20.0
    pos, vel, mass = make_cosmo_mock(n, boxsize=boxsize, nhalos=8, seed=41)
    opt = _base_opt(n, boxsize)
    opt.uinfo.unbindflag = 1
    opt.uinfo.Eratio = 1.0
    C.config_check(opt)

    opt.iBoundHalos = 0
    res0 = pipeline.find_structures(opt, pos, vel, mass, boxsize=boxsize)
    opt.iBoundHalos = 1
    res1 = pipeline.find_structures(opt, pos, vel, mass, boxsize=boxsize)
    assert "unbind" not in res0.timings
    assert "unbind" in res1.timings
    # the unbound fringe must actually be removed in the bound run
    assert int(np.sum(np.asarray(res1.pfof) > 0)) < \
        int(np.sum(np.asarray(res0.pfof) > 0))


@pytest.mark.slow
def test_bound_halos_2_post_substructure_reunbind():
    n = 1 << 13
    boxsize = 20.0
    pos, vel, mass = make_cosmo_mock(n, boxsize=boxsize, nhalos=4, seed=42)
    opt = _base_opt(n, boxsize)
    opt.iSubSearch = 1
    opt.uinfo.unbindflag = 1
    opt.uinfo.Eratio = 1.0
    opt.iBoundHalos = 2
    C.config_check(opt)
    res = pipeline.find_structures(opt, pos, vel, mass, boxsize=boxsize)
    ng = res.ngroups
    assert ng >= 1
    # hierarchy arrays stay consistent after the halo re-unbind remap
    assert len(res.parent) == ng + 1
    assert (res.parent[1:] <= ng).all() and (res.parent[1:] >= 0).all()
    pf = np.asarray(res.pfof)
    assert pf.max() <= ng


def test_sort_by_binding_energy_vs_potential():
    rng = np.random.default_rng(43)
    n = 64
    vel = rng.normal(0, 1, (n, 3)).astype(np.float32)
    mass = rng.uniform(1.0, 5.0, n).astype(np.float32)
    W = rng.normal(-10, 2, n).astype(np.float32)
    pfof = np.ones(n, np.int32)
    gcmvel = np.zeros((2, 3), np.float32)
    permE, _, _ = ub.sort_by_binding_energy(
        jnp.asarray(vel), jnp.asarray(mass), jnp.asarray(pfof),
        jnp.asarray(W), 1, jnp.asarray(gcmvel), by_energy=True)
    permW, _, _ = ub.sort_by_binding_energy(
        jnp.asarray(vel), jnp.asarray(mass), jnp.asarray(pfof),
        jnp.asarray(W), 1, jnp.asarray(gcmvel), by_energy=False)
    permE, permW = np.asarray(permE), np.asarray(permW)
    assert not np.array_equal(permE, permW)
    # potential sort must order W ascending
    assert (np.diff(W[permW]) >= 0).all()


@pytest.mark.slow
def test_reference_frame_minpot_changes_centre():
    """A halo with an off-CM potential minimum: radius-dependent output
    must move when Reference_frame_for_properties=2 (PROPREFMINPOT)."""
    rng = np.random.default_rng(44)
    boxsize = 20.0
    # dense heavy core at +0.5 offset inside a diffuse cloud: the CM sits
    # between, the potential minimum inside the core
    n1, n2 = 3000, 1000
    cloud = rng.normal(0, 0.8, (n1, 3))
    core = np.array([0.9, 0, 0]) + rng.normal(0, 0.05, (n2, 3))
    pos = (np.concatenate([cloud, core]) + boxsize / 2).astype(np.float32)
    vel = rng.normal(0, 30.0, (n1 + n2, 3)).astype(np.float32)
    mass = np.concatenate([np.ones(n1), 5.0 * np.ones(n2)]).astype(
        np.float32)
    n = n1 + n2
    opt = _base_opt(n, boxsize)
    opt.fofbgtype = C.FOF3D   # pure 3DFOF: cloud+core stay ONE group
    opt.ellphys = 2.0
    opt.uinfo.unbindflag = 1
    opt.iBoundHalos = 1   # field-halo unbind supplies the potentials
    opt.uinfo.Eratio = 100.0   # keep everything bound
    # plain mass-weighted CM (the shrinking-sphere iteration would walk
    # the CM into the dense core, where the potential minimum also sits)
    opt.iIterateCM = 0
    C.config_check(opt)
    res_cm = pipeline.find_structures(opt, pos, vel, mass, boxsize=boxsize)
    opt.iPropertyReferencePosition = C.PROPREFMINPOT
    res_mp = pipeline.find_structures(opt, pos, vel, mass, boxsize=boxsize)
    assert res_cm.ngroups >= 1 and res_mp.ngroups >= 1
    r_cm = res_cm.props["gRhalfmass"][1]
    r_mp = res_mp.props["gRhalfmass"][1]
    assert abs(r_cm - r_mp) > 1e-3
    # the minpot frame centre sits inside the heavy core
    # (gcm itself is frame-independent)
    assert np.allclose(res_cm.props["gcm"][1], res_mp.props["gcm"][1],
                       atol=1e-3)


def test_aperture_rhalfmass():
    rng = np.random.default_rng(45)
    n = 4000
    pos = rng.normal(0, 1.0, (n, 3)).astype(np.float32)
    vel = rng.normal(0, 1.0, (n, 3)).astype(np.float32)
    mass = np.ones(n, np.float32)
    pfof = np.ones(n, np.int32)
    refpos = np.zeros((2, 3), np.float32)
    a = 1.5
    out = props_mod.compute_aperture_properties(
        jnp.asarray(pos), jnp.asarray(vel), jnp.asarray(mass),
        jnp.asarray(pfof), 1, refpos=jnp.asarray(refpos),
        refvel=jnp.asarray(refpos), apertures=(a,))
    rh = float(out["Aperture_rhalfmass_0"][1])
    m_ap = float(out["Aperture_mass_0"][1])
    assert 0 < rh < a
    r = np.linalg.norm(pos, axis=1)
    m_inside = np.sum(mass[r <= rh])
    assert abs(m_inside - 0.5 * m_ap) / m_ap < 0.02


def test_scale_linking_lengths_single_halo():
    """iScaleLengths rescales ellxscale/ellvscale from the halo's bulk
    properties (reference ScaleLinkingLengths, haloproperties.cxx:13)."""
    from velociraptor_stf_tpu.models import haloprops

    rng = np.random.default_rng(46)
    n = 20000
    r = 0.5 / np.sqrt(rng.uniform(0.05, 1.0, n) ** (-2 / 3) - 1.0 + 1e-9)
    u = rng.normal(size=(n, 3))
    u /= np.linalg.norm(u, axis=1, keepdims=True)
    pos = (r[:, None] * u + 5.0).astype(np.float32)
    vel = rng.normal(0, 1.0, (n, 3)).astype(np.float32)
    mass = np.full(n, 0.05, np.float32)

    opt = C.Options()
    opt.G = 43.0211349
    opt.virlevel = 200.0
    before = (opt.ellxscale, opt.ellvscale)
    haloprops.scale_linking_lengths(opt, pos, vel, mass)
    assert opt.ellxscale > 0 and opt.ellvscale > 0
    assert (opt.ellxscale, opt.ellvscale) != before
    # the CM-adjusted virial pipeline must land inside the halo's extent
    cm, _, rlim, maxvc, r_s, Mcum = haloprops.adjust_to_cm(pos, vel, mass)
    assert np.allclose(cm, 5.0, atol=0.2)
    rvir, mvir, renc = haloprops.virial_quantities(
        r_s, Mcum, rlim, 1.19e-7, 200.0)
    assert rlim[0] < rvir <= rlim[2] * 1.02
    assert 0 < mvir <= Mcum[-1] * 1.001
    # enclosed-mass radii are ordered and bracket the half-mass radius
    assert 0 < renc[0] < renc[1] < renc[2]
    k = np.searchsorted(Mcum, 0.5 * Mcum[-1])
    assert abs(renc[1] - r_s[k]) / r_s[k] < 0.3


def test_cli_extra_flags_parse():
    from velociraptor_stf_tpu.cli import build_parser

    args = build_parser().parse_args(
        ["-C", "x.cfg", "-i", "snap", "-G", "5", "-S", "3", "-B", "1",
         "-t", "00010"])
    assert args.gnsphblocks == 5 and args.gnstarblocks == 3
    assert args.gnbhblocks == 1 and args.ramsessnapname == "00010"
