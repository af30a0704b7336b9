"""End-to-end pipeline tests: snapshot -> CLI -> catalogs; library API."""

import os

import numpy as np
import pytest

from velociraptor_stf_tpu import api, cli
from velociraptor_stf_tpu.io import gadget as G
from velociraptor_stf_tpu.io.synthetic import make_cosmo_mock
from velociraptor_stf_tpu.utils import config as C

CFG = """
#test configuration
Output=OUTNAME
Particle_search_type=1
FoF_Field_search_type=4
Search_for_substructure=0
Minimum_size=20
Minimum_halo_size=32
Halo_3D_linking_length=0.2
Halo_6D_vel_linking_length_factor=1.25
Unbind_flag=1
Bound_halos=1
Allowed_kinetic_potential_ratio=1.0
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
Verbose=0
Write_group_array_file=1
Calculate_aperture_quantities=1
Number_of_apertures=2
Aperture_values_in_kpc=50,200,
Number_of_projected_apertures=1
Projected_aperture_values_in_kpc=100,
Number_of_overdensities=2
Overdensity_values_in_critical_density=500,2500,
Extensive_halo_properties_output=1
"""


@pytest.fixture(scope="module")
def snapshot(tmp_path_factory):
    d = tmp_path_factory.mktemp("e2e")
    n = 32768
    pos, vel, mass = make_cosmo_mock(n, boxsize=20.0, nhalos=12, seed=11)
    fn = str(d / "snap.gdt")
    G.write_gadget(fn, pos, vel, np.arange(1, len(pos) + 1),
                   np.ones(len(pos), np.int8), mass, boxsize=20.0,
                   time=1.0, omega0=0.3, omega_lambda=0.7, hubble=0.7)
    return d, fn, len(pos)


@pytest.mark.slow
def test_cli_end_to_end(snapshot):
    import h5py

    d, fn, n = snapshot
    cfg = str(d / "run.cfg")
    out = str(d / "cat")
    open(cfg, "w").write(CFG.replace("OUTNAME", out))
    rc = cli.main(["-C", cfg, "-i", fn, "-I", "1", "-o", out])
    assert rc == 0
    for ext in (".properties", ".catalog_groups", ".catalog_particles",
                ".catalog_particles.unbound", ".hierarchy",
                ".configuration", ".siminfo", ".units", ".fof.grp"):
        assert os.path.exists(out + ext), ext

    with h5py.File(out + ".properties") as f:
        ng = int(f["Num_of_groups"][()])
        assert ng >= 5
        mass200 = np.asarray(f["Mass_200crit"])
        npart = np.asarray(f["npart"])
        assert (npart >= 32).all()
        # sizes descending (group ids ordered by size)
        assert (np.diff(npart.astype(np.int64)) <= 0).all()
        assert (mass200 > 0).all()
        xc = np.asarray(f["Xc"])
        assert ((xc >= -1) & (xc <= 21)).all()

    with h5py.File(out + ".catalog_groups") as f:
        sizes = np.asarray(f["Group_Size"])
        assert len(sizes) == ng
    with h5py.File(out + ".catalog_particles") as f:
        pid_list = np.asarray(f["Particle_IDs"])
        assert ((pid_list >= 1) & (pid_list <= n)).all()
        assert len(np.unique(pid_list)) == len(pid_list)


def test_library_api(snapshot):
    d, fn, n = snapshot
    _, pos, vel, pids, ptype, mass = G.read_gadget(fn)
    sess = api.VelociraptorSession(config_text=CFG.replace("OUTNAME", "x"))
    sess.opt.iSubSearch = 0
    out = sess.invoke(pos, vel, mass, pids=pids,
                      cosmo=api.CosmoInfo(atime=1.0, Omega_m=0.3,
                                          Omega_Lambda=0.7),
                      sim=api.SimInfo(period=20.0,
                                      interparticlespacing=20.0 / n ** (1 / 3)))
    gid = out["group_id"]
    assert len(gid) == n
    assert out["ngroups"] >= 5
    # group ids are contiguous 1..ng
    assert set(np.unique(gid)) <= set(range(out["ngroups"] + 1))
    # group 1 is the largest
    sizes = np.bincount(gid)
    assert sizes[1] == sizes[1:].max()


@pytest.mark.slow
def test_ikeepfof_envelopes():
    """Keep_FOF=1: 3DFOF envelopes become parent structures of the 6DFOF
    halos (reference search.cxx:582-655); envelopes typed FOF3DTYPE, halos
    carry the envelope as parent/host, leftover (velocity-hot) envelope
    members stay in the envelope."""
    from velociraptor_stf_tpu.models.pipeline import find_structures

    rng = np.random.default_rng(17)
    boxsize = 10.0
    c = np.array([5.0, 5.0, 5.0])
    # cold clump (6DFOF halo) embedded in a velocity-hot diffuse envelope
    n1, nh = 2000, 1200
    p1 = c + rng.normal(0, 0.05, (n1, 3))
    v1 = rng.normal(0, 10.0, (n1, 3))
    ph = c + rng.normal(0, 0.08, (nh, 3))
    vh = rng.normal(0, 4000.0, (nh, 3))
    nbg = 20000
    pbg = rng.random((nbg, 3)) * boxsize
    vbg = rng.normal(0, 800.0, (nbg, 3))
    pos = np.concatenate([p1, ph, pbg]).astype(np.float32)
    vel = np.concatenate([v1, vh, vbg]).astype(np.float32)
    mass = np.ones(len(pos), np.float32)

    opt = C.Options()
    opt.ellphys = 0.2
    opt.ellxscale = boxsize / len(pos) ** (1 / 3)
    opt.fofbgtype = C.FOF6DADAPTIVE
    opt.iKeepFOF = 1
    opt.MinSize = 32
    opt.HaloMinSize = 32
    opt.uinfo.unbindflag = 0
    opt.iSubSearch = 0
    opt.icosmologicalin = 0
    C.config_check(opt)
    res = find_structures(opt, pos, vel, mass, boxsize=boxsize)
    assert res.stype is not None
    st = res.stype[1:res.ngroups + 1]
    assert (st == C.FOF3DTYPE).sum() >= 1     # envelope survives
    assert (st != C.FOF3DTYPE).sum() >= 1     # at least the cold halo
    # the cold clump is a halo whose parent is an envelope
    g1 = np.bincount(res.pfof[:n1])[1:].argmax() + 1
    assert res.stype[g1] != C.FOF3DTYPE
    env = res.parent[g1]
    assert env >= 1 and res.stype[env] == C.FOF3DTYPE
    # a meaningful share of the hot particles stays in the envelope (the
    # adaptive 6D velocity window inevitably absorbs some of the tail)
    hot_labels = res.pfof[n1:n1 + nh]
    n_env_members = int((res.pfof == env).sum())
    assert n_env_members >= 50
    assert (hot_labels == env).sum() >= 0.8 * n_env_members
    # and the cold clump stays pure
    assert (res.pfof[:n1] == g1).mean() > 0.95


@pytest.mark.slow
def test_separate_output_files(snapshot, tmp_path):
    """Separate_output_files=1 splits field halos and substructures into
    outname.* and outname.sublevels.* (reference main.cxx:469-523)."""
    import h5py

    d, fn, n = snapshot
    cfg = str(tmp_path / "sep.cfg")
    out = str(tmp_path / "sep")
    text = CFG.replace("OUTNAME", out).replace(
        "Search_for_substructure=0", "Search_for_substructure=1")
    text += "Separate_output_files=1\nSUBFIND_like_output=1\n"
    open(cfg, "w").write(text)
    rc = cli.main(["-C", cfg, "-i", fn, "-I", "1", "-o", out])
    assert rc == 0
    assert os.path.exists(out + ".properties")
    assert os.path.exists(out + ".sublevels.properties")
    assert os.path.exists(out + ".subproperties")
    with h5py.File(out + ".properties") as f:
        st = np.asarray(f["Structuretype"])
        assert (st == 10).all()          # field halos only
        nf = int(f["Num_of_groups"][()])
    with h5py.File(out + ".sublevels.properties") as f:
        ns = int(f["Num_of_groups"][()])
        if ns:
            assert (np.asarray(f["Structuretype"]) > 10).all()
    with h5py.File(out + ".subproperties") as f:
        assert int(f["Num_of_groups"][()]) == nf + ns


@pytest.mark.slow
def test_zoom_multires_input(tmp_path):
    """Zoom (HIGHRES) handling: low-res heavy DM marks a multi-resolution
    run — the linking-length scale comes from the high-res interparticle
    spacing and heavy particles count as interlopers (reference
    gadgetio.cxx:1370-1412, substructureproperties.cxx:931)."""
    import math

    from velociraptor_stf_tpu import cli as cli_mod
    from velociraptor_stf_tpu.io import gadget as G_io

    rng = np.random.default_rng(19)
    boxsize = 10.0
    Gconst = 43.0211349
    # high-res halo at centre
    n = 5000
    Rh = 0.25
    r = Rh * rng.random(n) ** (1 / 3)
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    sig = math.sqrt(Gconst * n / Rh) * 0.25
    pos_h = np.array([5.0, 5, 5]) + d * r[:, None]
    vel_h = rng.normal(0, sig, (n, 3))
    # low-res background (8x heavier, type 2) + a few inside the halo
    nlr = 2000
    pos_l = rng.random((nlr, 3)) * boxsize
    pos_l[:50] = np.array([5.0, 5, 5]) + \
        Rh * rng.random((50, 3)) * 0.5
    vel_l = rng.normal(0, sig, (nlr, 3))
    pos = np.concatenate([pos_h, pos_l]).astype(np.float32)
    vel = np.concatenate([vel_h, vel_l]).astype(np.float32)
    mass = np.concatenate([np.ones(n), np.full(nlr, 8.0)]).astype(np.float32)
    ptype = np.concatenate([np.ones(n, np.int8), np.full(nlr, 2, np.int8)])
    pids = np.arange(1, len(pos) + 1)
    fn = str(tmp_path / "zoomsnap")
    G_io.write_gadget(fn, pos, vel, pids, ptype, mass, boxsize=boxsize)

    opt = C.Options()
    opt.fname = fn
    opt.inputtype = 1
    opt.outname = str(tmp_path / "zoomout")
    opt.ellphys = 0.2
    opt.fofbgtype = C.FOF3D
    opt.MinSize = 32
    opt.uinfo.unbindflag = 1
    opt.G = Gconst
    opt.iSubSearch = 0
    opt.iBaryonSearch = 1
    opt.partsearchtype = C.PSTALL
    opt.icosmologicalin = 1
    C.config_check(opt)
    rpos, rvel, rpids, rptype, rmass, rbox, extras = \
        cli_mod.read_snapshot(opt)
    # zoom detected: interloper threshold set, ellxscale from the high-res
    # particle mass (total DM mass / m_highres)^(1/3) spacing
    assert opt.zoomlowmassdm > 1.0
    assert opt.zoomlowmassdm < 8.0
    neff = (n + 8.0 * nlr) ** (1 / 3)
    assert abs(opt.ellxscale - boxsize / neff) < 1e-4
    from velociraptor_stf_tpu.models.pipeline import find_structures
    res = find_structures(opt, rpos, rvel, rmass, boxsize=rbox,
                          ptype=rptype, extras=extras)
    assert res.ngroups >= 1
    assert "n_interloper" in res.props
    # the low-res particles planted inside the halo are counted
    assert res.props["n_interloper"][1] > 0


@pytest.mark.slow
def test_library_api_particleset():
    """Library API accepts a ParticleSet (the in-memory container replacing
    NBodylib's Particle array, SURVEY §2.9) and runs the multi-type path."""
    import math

    from velociraptor_stf_tpu.api import VelociraptorSession, SimInfo
    from velociraptor_stf_tpu.particles import ParticleSet

    rng = np.random.default_rng(29)
    boxsize = 10.0
    Gc = 43.0211349
    n = 4000
    Rh = 0.25
    r = Rh * rng.random(n) ** (1 / 3)
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    sig = math.sqrt(Gc * n / Rh) * 0.25
    pos = np.concatenate([np.array([5.0, 5, 5]) + d * r[:, None],
                          rng.random((8000, 3)) * boxsize]).astype(np.float32)
    vel = np.concatenate([rng.normal(0, sig, (n, 3)),
                          rng.normal(0, 500.0, (8000, 3))]).astype(np.float32)
    ptype = np.ones(len(pos), np.int8)
    ptype[:n // 4] = 0  # some gas in the halo
    u = np.where(ptype == 0, 60.0, 0.0).astype(np.float32)
    ps = ParticleSet.from_numpy(pos, vel, np.ones(len(pos), np.float32),
                                pid=np.arange(1, len(pos) + 1), ptype=ptype)
    ps = ps.replace(u=ps.pos[:, 0] * 0 + u)

    s = VelociraptorSession()
    s.opt.ellphys = 0.2
    s.opt.fofbgtype = 5  # FOF3D
    s.opt.MinSize = 32
    s.opt.uinfo.unbindflag = 1
    s.opt.G = Gc
    s.opt.iSubSearch = 0
    s.opt.iBaryonSearch = 1
    s.opt.partsearchtype = 0  # PSTALL
    out = s.invoke(ps, sim=SimInfo(
        period=boxsize, interparticlespacing=boxsize / len(pos) ** (1 / 3),
        icosmologicalsim=0))
    assert out["ngroups"] >= 1
    assert (out["group_id"] > 0).sum() > 0.5 * n
    assert "n_gas" in out["properties"]
    assert out["properties"]["n_gas"][1] > 0
    assert out["properties"]["Temp_mean_gas"][1] > 0
