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
