"""All-particle spherical-overdensity search tests.

Oracle: a halo with M(<r) ∝ r (rho ∝ r^-2) embedded in a uniform untagged
background.  Member-only SO misses the background envelope; the all-particle
search must recover the analytic crossing (reference GetSOMasses,
substructureproperties.cxx:2731).
"""

import math

import numpy as np
import pytest

from velociraptor_stf_tpu.ops import so
from velociraptor_stf_tpu.utils import config as C

pytestmark = pytest.mark.slow


def _halo_plus_background(rng, n_h=20000, n_bg=40000, boxsize=10.0,
                          centre=(5.0, 5.0, 5.0), Rh=0.5):
    centre = np.asarray(centre)
    r = Rh * rng.random(n_h)
    d = rng.normal(size=(n_h, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    ph = centre + d * r[:, None]
    pbg = rng.random((n_bg, 3)) * boxsize
    pos = np.concatenate([ph, pbg]).astype(np.float32)
    mass = np.ones(len(pos), np.float32)
    return pos, mass, centre


def test_so_all_particles_matches_analytic():
    rng = np.random.default_rng(1)
    n_h, n_bg, boxsize, Rh = 20000, 40000, 10.0, 0.5
    pos, mass, centre = _halo_plus_background(rng, n_h, n_bg, boxsize,
                                              Rh=Rh)
    nbg = n_bg / boxsize ** 3
    rt = 0.35
    vol = 4 / 3 * math.pi * rt ** 3
    M_true = n_h * rt / Rh + vol * nbg
    rho_thr = M_true / vol
    M, R = so.so_masses_all_particles(
        pos, mass, centre[None, :], np.array([2.0]),
        [math.log(rho_thr)], boxsize=boxsize,
        minnum=np.array([8]), first_mass=np.array([1.0]))
    assert R[0, 0] == pytest.approx(rt, rel=0.03)
    assert M[0, 0] == pytest.approx(M_true, rel=0.04)


def test_so_all_particles_beats_member_only():
    """Member-only SO (group = halo particles only) is biased low when the
    envelope is untagged; the all-particle search includes it."""
    rng = np.random.default_rng(2)
    n_h, n_bg, boxsize, Rh = 3000, 80000, 8.0, 0.4
    pos, mass, centre = _halo_plus_background(rng, n_h, n_bg, boxsize,
                                              Rh=Rh)
    # crossing outside the halo truncation radius: enclosed mass there is
    # halo total + background sphere, which member-only SO cannot see
    rt = 1.0
    vol = 4 / 3 * math.pi * rt ** 3
    nbg = n_bg / boxsize ** 3
    M_true = n_h + vol * nbg
    rho_thr = M_true / vol
    M_mem = n_h  # member-only enclosed mass plateaus at the halo total
    assert M_mem < M_true * 0.9  # background contributes measurably
    M, R = so.so_masses_all_particles(
        pos, mass, centre[None, :], np.array([2.0]),
        [math.log(rho_thr)], boxsize=boxsize,
        minnum=np.array([8]), first_mass=np.array([1.0]))
    assert M[0, 0] == pytest.approx(M_true, rel=0.05)
    assert abs(M[0, 0] - M_true) < abs(M_mem - M_true)


def test_so_multiple_halos_and_classes():
    """Halos of very different sizes land in different radius classes."""
    rng = np.random.default_rng(3)
    boxsize = 20.0
    c1, c2 = np.array([5.0, 5.0, 5.0]), np.array([15.0, 15.0, 15.0])
    specs = [(c1, 1.0, 40000), (c2, 0.1, 5000)]
    parts = [rng.random((20000, 3)) * boxsize]
    for c, Rh, n in specs:
        r = Rh * rng.random(n)
        d = rng.normal(size=(n, 3))
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        parts.append(c + d * r[:, None])
    pos = np.concatenate(parts).astype(np.float32)
    mass = np.ones(len(pos), np.float32)
    centres = np.stack([c1, c2])
    rsearch = np.array([4.0, 0.4])
    out = []
    for (c, Rh, n), rt_frac in zip(specs, (0.6, 0.6)):
        rt = Rh * rt_frac
        vol = 4 / 3 * math.pi * rt ** 3
        M_true = n * rt / Rh + vol * 20000 / boxsize ** 3
        out.append((rt, M_true, math.log(M_true / vol)))
    # one threshold per halo scale is not possible (thresholds are global);
    # use each halo's own threshold and check the corresponding column
    thr = [out[0][2], out[1][2]]
    M, R = so.so_masses_all_particles(
        pos, mass, centres, rsearch, thr, boxsize=boxsize,
        minnum=np.array([8, 8]), first_mass=np.array([1.0, 1.0]))
    assert R[0, 0] == pytest.approx(out[0][0], rel=0.05)
    assert M[0, 0] == pytest.approx(out[0][1], rel=0.05)
    assert R[1, 1] == pytest.approx(out[1][0], rel=0.05)
    assert M[1, 1] == pytest.approx(out[1][1], rel=0.05)


def test_so_particle_list_counts():
    rng = np.random.default_rng(4)
    pos, mass, centre = _halo_plus_background(rng, n_h=5000, n_bg=20000,
                                              boxsize=10.0, Rh=0.5)
    rt = 0.35
    offs, idx = so.so_particle_list(pos, centre[None, :], np.array([rt]),
                                    boxsize=10.0)
    d = pos - centre
    d -= 10.0 * np.round(d / 10.0)
    n_in = int((np.linalg.norm(d, axis=1) <= rt).sum())
    assert offs[1] - offs[0] == n_in
    # indices actually lie inside the sphere
    r = np.linalg.norm(d[idx], axis=1)
    assert (r <= rt + 1e-5).all()
    # radius-sorted per halo
    assert (np.diff(r) >= -1e-5).all()


def test_cli_so_catalog_and_profiles(tmp_path):
    """CLI run with iInclusiveHalo=3 + SO particle lists + radial profiles:
    .catalog_SOlist and .profiles written and self-consistent."""
    import h5py

    from velociraptor_stf_tpu import cli
    from velociraptor_stf_tpu.io import gadget as G
    from velociraptor_stf_tpu.io.synthetic import make_cosmo_mock

    n = 16384
    pos, vel, mass = make_cosmo_mock(n, boxsize=16.0, nhalos=8, seed=12)
    fn = str(tmp_path / "snap.gdt")
    G.write_gadget(fn, pos, vel, np.arange(1, n + 1),
                   np.ones(n, np.int8), mass, boxsize=16.0,
                   time=1.0, omega0=0.3, omega_lambda=0.7, hubble=0.7)
    out = str(tmp_path / "cat")
    cfg = str(tmp_path / "run.cfg")
    open(cfg, "w").write(f"""
Output={out}
Particle_search_type=1
FoF_Field_search_type=5
Search_for_substructure=0
Minimum_size=20
Minimum_halo_size=32
Halo_3D_linking_length=0.2
Unbind_flag=0
Cosmological_input=1
Gravity=43.0211349
Hubble_unit=100.0
Length_unit_to_kpc=1000.0
Velocity_to_kms=1.0
Mass_to_solarmass=1e10
Omega_m=0.3
Omega_Lambda=0.7
h_val=0.7
Binary_output=2
Inclusive_halo_masses=3
Spherical_overdensity_halo_particle_list_output=1
Calculate_radial_profiles=1
Number_of_radial_profile_bin_edges=4
Radial_profile_bin_edges=-2.,-1.,0.,1.,
""")
    rc = cli.main(["-C", cfg, "-i", fn, "-I", "1", "-o", out])
    assert rc == 0
    with h5py.File(out + ".properties") as f:
        ng = int(f["Num_of_groups"][()])
        assert ng >= 3
        m_inc = np.asarray(f["Mass_200crit"])
        m_exc = np.asarray(f["Mass_200crit_excl"])
        assert (m_inc[m_inc > 0] >= 0.5 * m_exc[m_inc > 0]).all()
    with h5py.File(out + ".catalog_SOlist") as f:
        sizes = np.asarray(f["SO_size"])
        offs = np.asarray(f["Offset"])
        spids = np.asarray(f["Particle_IDs"])
        assert len(sizes) == ng
        assert sizes.sum() == len(spids)
        assert ((spids >= 1) & (spids <= n)).all()
        assert (np.diff(offs) == sizes[:-1]).all()
        # SO regions include at least the member particles for the biggest
        assert sizes[0] > 0
    with h5py.File(out + ".profiles") as f:
        mprof = np.asarray(f["Mass_profile"])
        assert mprof.shape[0] == ng
        assert (mprof.sum(axis=1) > 0).any()


def test_pipeline_inclusive_halo_masses_mode3():
    """End-to-end: iInclusiveHalo=3 overwrites field-halo SO masses with
    the all-particle values and keeps member-only *_excl copies."""
    from velociraptor_stf_tpu.models.pipeline import find_structures

    rng = np.random.default_rng(5)
    boxsize = 10.0
    n_h, Rh = 8000, 0.3
    centre = np.array([5.0, 5.0, 5.0])
    r = Rh * rng.random(n_h) ** (1 / 3)
    d = rng.normal(size=(n_h, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    ph = centre + d * r[:, None]
    sig = math.sqrt(43.0211349 * n_h * 1.0 / Rh) * 0.3
    vh = rng.normal(0, sig, (n_h, 3))
    n_bg = 30000
    pbg = rng.random((n_bg, 3)) * boxsize
    vbg = rng.normal(0, 2 * sig, (n_bg, 3))
    pos = np.concatenate([ph, pbg]).astype(np.float32)
    vel = np.concatenate([vh, vbg]).astype(np.float32)
    mass = np.ones(len(pos), np.float32)

    opt = C.Options()
    opt.ellphys = 0.2
    opt.ellxscale = boxsize / len(pos) ** (1 / 3)
    opt.fofbgtype = C.FOF3D
    opt.MinSize = 32
    opt.uinfo.unbindflag = 0
    opt.iSubSearch = 0
    opt.iInclusiveHalo = 3
    # mean total density ~ 38000/1000 = 38; make 200*rhocrit ~ halo scale
    opt.rhocrit = 10.0
    opt.rhobg = 10.0
    opt.icosmologicalin = 0
    C.config_check(opt)
    res = find_structures(opt, pos, vel, mass, boxsize=boxsize)
    assert res.ngroups >= 1
    assert "gM200c_excl" in res.props
    # group 1 is the halo; the all-particle M200c includes background
    m_inc = res.props["gM200c"][1]
    m_exc = res.props["gM200c_excl"][1]
    assert m_inc > 0
    assert m_inc >= m_exc * 0.99
