"""RAMSES reader round-trip tests against synthetic snapshots written in
the reference's record layout (ramsesio.cxx Fortran-unformatted walk)."""

import os
import struct

import numpy as np
import pytest

from velociraptor_stf_tpu.io import ramses as R

KPC_CM = 3.086e21


def _wrec(f, payload: bytes):
    f.write(struct.pack("<i", len(payload)))
    f.write(payload)
    f.write(struct.pack("<i", len(payload)))


def _wint(f, v):
    _wrec(f, struct.pack("<i", int(v)))


def _wflt(f, v):
    _wrec(f, struct.pack("<d", float(v)))


def _warr(f, a, dtype):
    _wrec(f, np.asarray(a, dtype).tobytes())


def write_synthetic_ramses(d, pos, vel, mass, age, pids,
                           gas_grids=None, boxlen=1.0, aexp=1.0,
                           unit_l=KPC_CM * 1000.0, unit_d=6.77e-23,
                           unit_t=1.0, nlevelmax=3):
    """Write info/part(/amr/hydro) files for one-cpu output 00001."""
    snap = "00001"
    n = len(pos)
    with open(os.path.join(d, f"info_{snap}.txt"), "w") as f:
        f.write(f"ncpu        =          1\n")
        f.write(f"ndim        =          3\n")
        f.write(f"levelmin    =          1\n")
        f.write(f"levelmax    =          {nlevelmax}\n")
        f.write(f"ngridmax    =     100000\n")
        f.write(f"boxlen      =  {boxlen:.15E}\n")
        f.write(f"time        =  0.0\n")
        f.write(f"aexp        =  {aexp:.15E}\n")
        f.write(f"H0          =  70.0\n")
        f.write(f"omega_m     =  0.3\n")
        f.write(f"omega_l     =  0.7\n")
        f.write(f"omega_k     =  0.0\n")
        f.write(f"omega_b     =  0.05\n")
        f.write(f"unit_l      =  {unit_l:.15E}\n")
        f.write(f"unit_d      =  {unit_d:.15E}\n")
        f.write(f"unit_t      =  {unit_t:.15E}\n")
        f.write("ordering type=hilbert\n")
    with open(os.path.join(d, f"part_{snap}.out00001"), "wb") as f:
        _wint(f, 1)                      # ncpu
        _wint(f, 3)                      # ndim
        _wint(f, n)                      # npart
        _wrec(f, b"\x00" * 8)            # localseed
        _wint(f, int((age != 0).sum()))  # nstar_tot
        _wflt(f, 0.0)                    # mstar_tot
        _wflt(f, 0.0)                    # mstar_lost
        _wint(f, 0)                      # nsink
        for k in range(3):
            _warr(f, pos[:, k], "<f8")
        for k in range(3):
            _warr(f, vel[:, k], "<f8")
        _warr(f, mass, "<f8")
        _warr(f, pids, "<i4")
        _warr(f, np.ones(n), "<i4")      # level
        _warr(f, age, "<f8")
        _warr(f, np.zeros(n), "<f8")     # metallicity
    if gas_grids is None:
        return
    # amr + hydro: gas_grids = list of (level_idx, xg (G,3), son (8,G),
    #                                   hydro (8, nvarh, G))
    nvarh = gas_grids[0][3].shape[1] if gas_grids else 6
    ngridlevel = np.zeros(nlevelmax, np.int32)
    for lev, xg, son, hyd in gas_grids:
        ngridlevel[lev] += len(xg)
    with open(os.path.join(d, f"amr_{snap}.out00001"), "wb") as fa, \
            open(os.path.join(d, f"hydro_{snap}.out00001"), "wb") as fh:
        _wint(fa, 1)                     # ncpu
        _wint(fa, 3)                     # ndim
        _wrec(fa, struct.pack("<iii", 1, 1, 1))   # nx ny nz
        _wint(fa, nlevelmax)
        _wint(fa, 100000)                # ngridmax
        _wint(fa, 0)                     # nboundary
        _wint(fa, int(ngridlevel.sum())) # ngrid_current
        for _ in range(14):
            _wrec(fa, b"")
        _warr(fa, ngridlevel, "<i4")
        _wrec(fa, b"")                   # skip
        _wrec(fa, b"")                   # skip(2)...
        _wrec(fa, b"")
        for _ in range(4):               # hilbert ordering: 4 skips
            _wrec(fa, b"")
        _wint(fh, 1)                     # ncpu
        _wint(fh, nvarh)
        _wrec(fh, b"")                   # ndim
        _wrec(fh, b"")                   # nlevelmax
        _wrec(fh, b"")                   # nboundary
        _wflt(fh, 5.0 / 3.0)             # gamma
        by_level = {lev: (xg, son, hyd) for lev, xg, son, hyd in gas_grids}
        for j in range(nlevelmax):
            _wrec(fh, b"")               # hydro per-level skip record
            if j not in by_level:
                continue
            xg, son, hyd = by_level[j]
            G = len(xg)
            for _ in range(3):           # grid index, next, prev
                _wrec(fa, b"")
            for k in range(3):
                _warr(fa, xg[:, k], "<f8")
            for _ in range(1 + 6):       # father + 2*ndim neighbours
                _wrec(fa, b"")
            for ind in range(8):
                _warr(fa, son[ind], "<i4")
            for _ in range(16):          # cpu map + refinement map
                _wrec(fa, b"")
            for ind in range(8):
                for ivar in range(nvarh):
                    _warr(fh, hyd[ind, ivar], "<f8")


def test_ramses_particles_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    n = 1000
    pos = rng.random((n, 3))
    vel = rng.normal(0, 0.1, (n, 3))
    mass = np.full(n, 1e-6)
    age = np.zeros(n)
    age[800:] = 0.5                      # 200 stars
    mass[800:] = 2e-7
    pids = np.arange(1, n + 1)
    write_synthetic_ramses(str(tmp_path), pos, vel, mass, age, pids)
    hdr, rpos, rvel, rpid, rtype, rmass, extras = R.read_ramses(
        str(tmp_path), "00001")
    assert len(rpos) == n
    assert (rtype == 1).sum() == 800
    assert (rtype == 4).sum() == 200
    # unit conversion: positions * lscale (unit_l in kpc)
    lscale = hdr.unit_l / KPC_CM
    np.testing.assert_allclose(rpos[rtype == 1],
                               pos[:800] * lscale, rtol=1e-12)
    np.testing.assert_allclose(rvel, vel * hdr.vscale, rtol=1e-12)
    assert hdr.omega_m == 0.3 and hdr.aexp == 1.0
    assert hdr.boxsize == pytest.approx(lscale)


def test_ramses_ghost_rejection(tmp_path):
    """age==0 particles whose mass differs from the DM particle mass are
    ghosts and dropped (reference ramsesio.cxx:387-400)."""
    n = 500
    rng = np.random.default_rng(1)
    pos = rng.random((n, 3))
    vel = np.zeros((n, 3))
    mass = np.full(n, 1e-6)
    mass[490:] = 5e-6                    # ghosts
    age = np.zeros(n)
    write_synthetic_ramses(str(tmp_path), pos, vel, mass, age,
                           np.arange(1, n + 1))
    hdr, rpos, *_ = R.read_ramses(str(tmp_path), "00001")
    assert len(rpos) == 490


def test_ramses_amr_gas_cells(tmp_path):
    """Leaf AMR cells become gas particles with mass rho*dx^3 and
    u = P/rho/(gamma-1) (reference ramsesio.cxx:1128-1155)."""
    # one level-1 grid (dx=0.5) at centre (0.5,0.5,0.5): 8 cells; mark
    # cell 0 refined (son!=0), rest leaves
    xg = np.array([[0.5, 0.5, 0.5]])
    son = np.zeros((8, 1), np.int32)
    son[0, 0] = 7                       # refined -> not a particle
    nvarh = 6
    hyd = np.zeros((8, nvarh, 1))
    hyd[:, 0] = 2.0                     # rho
    hyd[:, 1] = 0.1                     # vx
    hyd[:, 2] = 0.2
    hyd[:, 3] = 0.3
    hyd[:, 4] = 4.0                     # P
    hyd[:, 5] = 0.02                    # Z
    # dummy particle content (1 DM particle so part file exists)
    write_synthetic_ramses(str(tmp_path), np.array([[0.1, 0.1, 0.1]]),
                           np.zeros((1, 3)), np.array([1e-6]),
                           np.zeros(1), np.array([1]),
                           gas_grids=[(1, xg, son, hyd)], nlevelmax=3)
    hdr, pos, vel, pid, ptype, mass, extras = R.read_ramses(
        str(tmp_path), "00001")
    gas = ptype == 0
    assert gas.sum() == 7               # one refined cell skipped
    dx = 0.5 ** 1
    np.testing.assert_allclose(mass[gas], 2.0 * dx ** 3 * hdr.mscale,
                               rtol=1e-12)
    u = extras["u"][gas]
    np.testing.assert_allclose(u, 4.0 / 2.0 / (5.0 / 3.0 - 1.0), rtol=1e-5)
    np.testing.assert_allclose(extras["zmet"][gas], 0.02, rtol=1e-5)
    # cell centres at xg +- dx/2 shifted: check all inside the box
    lscale = hdr.unit_l / KPC_CM
    assert ((pos[gas] >= 0) & (pos[gas] <= lscale)).all()


@pytest.mark.slow
def test_ramses_cli_end_to_end(tmp_path):
    """CLI -I 4 on a synthetic RAMSES dir: read, search, write catalogs."""
    from velociraptor_stf_tpu import cli

    rng = np.random.default_rng(3)
    # a halo + background inside the unit box (code units)
    n_h, n_bg = 3000, 15000
    c = np.array([0.5, 0.5, 0.5])
    ph = c + rng.normal(0, 0.01, (n_h, 3))
    pbg = rng.random((n_bg, 3))
    pos = np.clip(np.concatenate([ph, pbg]), 0, 0.999999)
    vel = rng.normal(0, 0.05, pos.shape)
    n = len(pos)
    mass = np.full(n, 1e-6)
    age = np.zeros(n)
    d = str(tmp_path)
    write_synthetic_ramses(d, pos, vel, mass, age, np.arange(1, n + 1),
                           unit_l=KPC_CM * 1.0)  # lscale=1 -> kpc box [0,1]
    cfg = str(tmp_path / "run.cfg")
    out = str(tmp_path / "cat")
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
Length_unit_to_kpc=1.0
Velocity_to_kms=1.0
Mass_to_solarmass=1e10
Binary_output=2
""")
    rc = cli.main(["-C", cfg, "-i", d, "-I", "4", "-o", out])
    assert rc == 0
    import h5py

    with h5py.File(out + ".properties") as f:
        assert int(f["Num_of_groups"][()]) >= 1
