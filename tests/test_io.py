"""IO tests: gadget/HDF readers, catalog writers round-trips."""

import os

import numpy as np
import pytest

from velociraptor_stf_tpu.io import gadget as G
from velociraptor_stf_tpu.io import hdf as H
from velociraptor_stf_tpu.io import writers as W
from velociraptor_stf_tpu.utils import config as C


@pytest.fixture
def snap(tmp_path):
    rng = np.random.default_rng(0)
    n = 5000
    pos = rng.uniform(0, 50, (n, 3)).astype(np.float32)
    vel = rng.normal(0, 100, (n, 3)).astype(np.float32)
    pids = np.arange(1, n + 1)
    ptype = np.concatenate([np.zeros(1500, np.int8),
                            np.ones(n - 1500, np.int8)])
    mass = np.where(ptype == 0, 0.5, 1.5).astype(np.float32)
    return pos, vel, pids, ptype, mass


def test_gadget_roundtrip(tmp_path, snap):
    pos, vel, pids, ptype, mass = snap
    fn = str(tmp_path / "snap.gdt")
    G.write_gadget(fn, pos, vel, pids, ptype, mass, boxsize=50.0)
    hdr, p2, v2, i2, t2, m2 = G.read_gadget(fn)
    assert hdr.ntotal == len(pos)
    assert hdr.boxsize == 50.0
    o, oo = np.argsort(i2), np.argsort(pids)
    assert np.allclose(p2[o], pos[oo])
    assert np.allclose(v2[o], vel[oo])
    assert np.allclose(m2[o], mass[oo])
    assert (t2[o] == ptype[oo]).all()


def test_hdf_reader(tmp_path, snap):
    import h5py

    pos, vel, pids, ptype, mass = snap
    fn = str(tmp_path / "snap.hdf5")
    with h5py.File(fn, "w") as f:
        h = f.create_group("Header")
        h.attrs["BoxSize"] = 50.0
        h.attrs["Time"] = 1.0
        h.attrs["Redshift"] = 0.0
        h.attrs["Omega0"] = 0.3
        h.attrs["OmegaLambda"] = 0.7
        h.attrs["HubbleParam"] = 0.7
        h.attrs["NumFilesPerSnapshot"] = 1
        npt = np.array([(ptype == t).sum() for t in range(6)], np.uint64)
        h.attrs["NumPart_Total"] = npt
        h.attrs["MassTable"] = np.zeros(6)
        for t in (0, 1):
            sel = ptype == t
            g = f.create_group(f"PartType{t}")
            g["Coordinates"] = pos[sel]
            g["Velocities"] = vel[sel]
            g["ParticleIDs"] = pids[sel]
            g["Masses"] = mass[sel]
            if t == 0:
                g["InternalEnergy"] = np.full(sel.sum(), 7.5, np.float32)
    hdr, p2, v2, i2, t2, m2, extras = H.read_hdf(fn)
    assert hdr.boxsize == 50.0
    assert hdr.omega0 == pytest.approx(0.3)
    o, oo = np.argsort(i2), np.argsort(pids)
    assert np.allclose(p2[o], pos[oo])
    assert np.allclose(m2[o], mass[oo])
    assert (t2[o] == ptype[oo]).all()
    assert extras["u"][t2 == 0][0] == pytest.approx(7.5)
    # dm only
    hdr, p3, *_ = H.read_hdf(fn, parttypes=[1])
    assert len(p3) == (ptype == 1).sum()


def _dummy_props(ng):
    rng = np.random.default_rng(1)
    p = {}
    for k in ("gmass", "gMvir", "gRvir", "gM200c", "gR200c", "gM200m",
              "gR200m", "gM500c", "gR500c", "gMBN98", "gRBN98", "gsize",
              "gRhalfmass", "gRmaxvel", "gmaxvel", "gMmaxvel", "gsigma_v",
              "gq", "gs", "cNFW", "Krot", "Ekin"):
        p[k] = rng.uniform(1, 2, ng + 1)
    p["num"] = rng.integers(20, 100, ng + 1)
    p["gcm"] = rng.uniform(0, 50, (ng + 1, 3))
    p["gcmvel"] = rng.normal(0, 100, (ng + 1, 3))
    p["gveldisp"] = rng.normal(0, 1, (ng + 1, 3, 3))
    p["gJ"] = rng.normal(0, 1, (ng + 1, 3))
    p["geigvec"] = np.tile(np.eye(3), (ng + 1, 1, 1))
    p["SO_mass"] = np.zeros((ng + 1, 0))
    p["SO_radius"] = np.zeros((ng + 1, 0))
    return p


def test_write_properties_and_catalogs(tmp_path):
    import h5py

    opt = C.Options()
    opt.ibinaryout = C.OUTHDF
    opt.lengthtokpc, opt.velocitytokms, opt.masstosolarmass = 1000., 1., 1e10
    ng = 5
    props = _dummy_props(ng)
    out = str(tmp_path / "cat")
    cols = W.properties_table(opt, props, ng)
    W.write_properties(opt, out, cols, ng)
    with h5py.File(out + ".properties") as f:
        assert int(f["Num_of_groups"][()]) == ng
        assert f["Xc"].shape == (ng,)
        assert (np.asarray(f["ID"]) == np.arange(1, ng + 1)).all()
        for name in ("Mass_200crit", "R_200crit", "Vmax", "sigV", "cNFW",
                     "veldisp_xy", "eig_zz", "lambda_B", "npart",
                     "Structuretype", "hostHaloID"):
            assert name in f, name

    # catalogs
    n = 200
    rng = np.random.default_rng(2)
    pfof = rng.integers(0, ng + 1, n).astype(np.int32)
    pids = np.arange(1000, 1000 + n)
    W.write_group_catalog(opt, out, pfof, pids, ng)
    with h5py.File(out + ".catalog_groups") as f:
        sizes = np.asarray(f["Group_Size"])
        assert sizes.sum() == (pfof > 0).sum()
        offs = np.asarray(f["Offset"])
        assert (np.diff(offs) == sizes[:-1]).all()
    with h5py.File(out + ".catalog_particles") as f:
        plist = np.asarray(f["Particle_IDs"])
        assert len(plist) == (pfof > 0).sum()
        # group 1's slice contains exactly the pids of group 1
        with h5py.File(out + ".catalog_groups") as fg:
            s0 = int(np.asarray(fg["Offset"])[0])
            n0 = int(np.asarray(fg["Group_Size"])[0])
        assert set(plist[s0:s0 + n0]) == set(pids[pfof == 1])

    # unbound split
    bound = rng.uniform(size=n) > 0.3
    W.write_group_catalog(opt, out, pfof, pids, ng, bound_mask=bound)
    with h5py.File(out + ".catalog_particles.unbound") as f:
        assert len(np.asarray(f["Particle_IDs"])) == \
            ((pfof > 0) & ~bound).sum()

    parent = np.array([0, 0, 1, 1, 0, 2])
    W.write_hierarchy(opt, out, parent, ng)
    with h5py.File(out + ".hierarchy") as f:
        ns = np.asarray(f["Number_of_substructures_in_halo"])
        assert ns[0] == 2 and ns[1] == 1
        pa = np.asarray(f["Parent_halo_ID"])
        assert pa[1] == 1 and pa[0] == -1

    W.write_config_info(opt, out)
    W.write_sim_info(opt, out)
    W.write_unit_info(opt, out)
    for ext in (".configuration", ".siminfo", ".units"):
        assert os.path.getsize(out + ext) > 100
    W.write_fof_grp(out, pfof)
    lines = open(out + ".fof.grp").read().splitlines()
    assert int(lines[0]) == n


def test_write_binary_mode(tmp_path):
    """Binary_output=1 writes the reference's RAW binary streams
    (io.cxx:416-660: int32 task/nprocs header + uint64 counts + Int_t
    arrays), not HDF5 (round-2 landmine: silent HDF5 under OUTBINARY)."""
    opt = C.Options()
    opt.ibinaryout = C.OUTBINARY
    ng = 4
    props = _dummy_props(ng)
    out = str(tmp_path / "bincat")
    cols = W.properties_table(opt, props, ng)
    W.write_properties(opt, out, cols, ng)

    raw = open(out + ".properties", "rb").read()
    # NOT an HDF5 file
    assert raw[:8] != b"\x89HDF\r\n\x1a\n"
    task, nprocs = np.frombuffer(raw, np.int32, 2)
    ngf, ngtot = np.frombuffer(raw, np.uint64, 2, offset=8)
    hsize = int(np.frombuffer(raw, np.int32, 1, offset=24)[0])
    assert (task, nprocs) == (0, 1)
    assert ngf == ng and ngtot == ng
    assert hsize == len(cols)
    # payload size: per group, 8 bytes per column except 4 for Structuretype
    rowbytes = 8 * (len(cols) - 1) + 4
    assert len(raw) == 28 + ng * rowbytes
    # first 8-byte field of row 0 is the halo ID
    assert int(np.frombuffer(raw, np.int64, 1, offset=28)[0]) == \
        int(cols["ID"][0])

    n = 64
    rng = np.random.default_rng(3)
    pfof = rng.integers(0, ng + 1, n).astype(np.int32)
    pids = np.arange(500, 500 + n)
    ptype = np.ones(n, np.int32)
    W.write_group_catalog(opt, out, pfof, pids, ng, ptype=ptype)
    raw = open(out + ".catalog_groups", "rb").read()
    assert raw[:8] != b"\x89HDF\r\n\x1a\n"
    ngf = int(np.frombuffer(raw, np.uint64, 1, offset=8)[0])
    assert ngf == ng
    sizes = np.frombuffer(raw, np.int64, ng, offset=24)
    assert sizes.sum() == (pfof > 0).sum()
    assert len(raw) == 24 + 3 * 8 * ng
    raw_p = open(out + ".catalog_particles", "rb").read()
    nids = int(np.frombuffer(raw_p, np.uint64, 1, offset=8)[0])
    got = np.frombuffer(raw_p, np.int64, nids, offset=24)
    assert set(got) == set(pids[pfof > 0])
    raw_t = open(out + ".catalog_parttypes", "rb").read()
    ntyp = int(np.frombuffer(raw_t, np.uint64, 1, offset=8)[0])
    assert ntyp == nids
    assert len(raw_t) == 24 + 4 * ntyp       # int32 types (io.cxx:1100)

    parent = np.array([0, 0, 1, 0, 2])
    W.write_hierarchy(opt, out, parent, ng)
    raw_h = open(out + ".hierarchy", "rb").read()
    assert len(raw_h) == 24 + 2 * 8 * ng
    pa = np.frombuffer(raw_h, np.int64, ng, offset=24 + 8 * ng)
    assert pa[1] == 1 and pa[0] == -1


def test_write_ascii_mode(tmp_path):
    opt = C.Options()
    opt.ibinaryout = C.OUTASCII
    ng = 3
    props = _dummy_props(ng)
    out = str(tmp_path / "cat")
    cols = W.properties_table(opt, props, ng)
    W.write_properties(opt, out, cols, ng)
    lines = open(out + ".properties").read().splitlines()
    assert lines[1].split()[0] == str(ng)
    assert len(lines) == 3 + ng


@pytest.mark.parametrize("convention", [H.HDFEAGLENAMES, H.HDFILLUSTRISNAMES,
                                        H.HDFGIZMONAMES,
                                        H.HDFSWIFTEAGLENAMES])
def test_hdf_naming_conventions(tmp_path, snap, convention):
    """Per-convention dataset names (reference HDF_Part_Info,
    hdfitems.h:343-560): EAGLE singular Velocity/Mass, ILLUSTRIS GFM_
    prefixes, GIZMO Metallicity_00, SWIFT plural names + Cosmology group."""
    import h5py

    pos, vel, pids, ptype, mass = snap
    fn = str(tmp_path / "snap.hdf5")
    names = {
        H.HDFEAGLENAMES: dict(vel="Velocity", mass="Mass",
                              u="InternalEnergy", zmet="Metallicity",
                              tage="StellarFormationTime"),
        H.HDFILLUSTRISNAMES: dict(vel="Velocities", mass="Masses",
                                  u="InternalEnergy", zmet="GFM_Metallicity",
                                  tage="GFM_StellarFormationTime"),
        H.HDFGIZMONAMES: dict(vel="Velocities", mass="Masses",
                              u="InternalEnergy", zmet="Metallicity_00",
                              tage="StellarFormationTime"),
        H.HDFSWIFTEAGLENAMES: dict(vel="Velocities", mass="Masses",
                                   u="InternalEnergies",
                                   zmet="MetalMassFractions",
                                   tage="BirthScaleFactors"),
    }[convention]
    with h5py.File(fn, "w") as f:
        h = f.create_group("Header")
        h.attrs["BoxSize"] = 50.0
        h.attrs["NumFilesPerSnapshot"] = 1
        npt = np.array([(ptype == t).sum() for t in range(6)], np.uint64)
        h.attrs["NumPart_Total"] = npt
        h.attrs["MassTable"] = np.zeros(6)
        if convention == H.HDFSWIFTEAGLENAMES:
            h.attrs["Time"] = 1.0
            cos = f.create_group("Cosmology")
            cos.attrs["Omega_m"] = 0.3
            cos.attrs["Omega_lambda"] = 0.7
            cos.attrs["h"] = 0.7
        else:
            h.attrs["Time"] = 1.0
            h.attrs["Omega0"] = 0.3
            h.attrs["OmegaLambda"] = 0.7
            h.attrs["HubbleParam"] = 0.7
        for t in (0, 1, 4):
            sel = ptype == t if t != 4 else ptype == 0  # reuse gas as stars
            if t == 4:
                sel = np.zeros(len(ptype), bool)
                sel[:10] = True
            g = f.create_group(f"PartType{t}")
            g["Coordinates"] = pos[sel]
            g[names["vel"]] = vel[sel]
            g["ParticleIDs"] = pids[sel] + (t << 20)
            g[names["mass"]] = mass[sel]
            if t == 0:
                g[names["u"]] = np.full(sel.sum(), 7.5, np.float32)
                g[names["zmet"]] = np.full(sel.sum(), 0.02, np.float32)
            if t == 4:
                g[names["tage"]] = np.full(sel.sum(), 0.5, np.float32)
                g[names["zmet"]] = np.full(sel.sum(), 0.01, np.float32)
    hdr, p2, v2, i2, t2, m2, extras = H.read_hdf(fn, convention=convention)
    assert hdr.boxsize == 50.0
    assert hdr.omega0 == pytest.approx(0.3)
    assert hdr.hubble_param == pytest.approx(0.7)
    ngas = (ptype == 0).sum()
    assert np.allclose(extras["u"][t2 == 0], 7.5)
    assert np.allclose(extras["zmet"][t2 == 0], 0.02)
    assert np.allclose(extras["tage"][t2 == 4], 0.5)
    assert np.allclose(extras["zmet"][t2 == 4], 0.01)
    assert (m2 > 0).all() and len(p2) == ngas + (ptype == 1).sum() + 10
    assert np.abs(v2).sum() > 0


def test_ascii_catalogs_match_hdf(tmp_path):
    """ASCII .properties / .catalog_* round-trip and agree with the HDF
    outputs column-for-column (reference ASCII layout, io.cxx:1699-1727
    properties; :1060,1141 catalogs/parttypes)."""
    import h5py

    opt = C.Options()
    opt.lengthtokpc, opt.velocitytokms, opt.masstosolarmass = 1000., 1., 1e10
    ng = 5
    n = 300
    rng = np.random.default_rng(7)
    props = _dummy_props(ng)
    pfof = rng.integers(0, ng + 1, n).astype(np.int32)
    pids = np.arange(10**13, 10**13 + n)     # above 2^40: float64-unsafe
    ptype = rng.integers(0, 6, n).astype(np.int32)
    cols = W.properties_table(opt, props, ng)

    out_h = str(tmp_path / "h5")
    out_a = str(tmp_path / "asc")
    opt.ibinaryout = C.OUTHDF
    W.write_properties(opt, out_h, cols, ng)
    W.write_group_catalog(opt, out_h, pfof, pids, ng, ptype=ptype)
    opt.ibinaryout = C.OUTASCII
    W.write_properties(opt, out_a, cols, ng)
    W.write_group_catalog(opt, out_a, pfof, pids, ng, ptype=ptype)

    # properties: header names match the HDF dataset order; numeric
    # values agree; integer columns survive exactly
    lines = open(out_a + ".properties").read().splitlines()
    names = [t[:t.rindex("(")] for t in lines[2].split()]
    with h5py.File(out_h + ".properties") as f:
        hdf_cols = [k for k in cols.keys()]
        assert names == hdf_cols
        table = np.array([ln.split() for ln in lines[3:]])
        for j, name in enumerate(names):
            v_h = np.asarray(f[name])
            if np.issubdtype(np.asarray(cols[name]).dtype, np.integer):
                assert (table[:, j].astype(np.int64) == v_h).all(), name
            else:
                np.testing.assert_allclose(
                    table[:, j].astype(np.float64), v_h.astype(np.float64),
                    rtol=2e-9, err_msg=name)

    # catalogs: sizes/offsets/pids/types identical between formats
    for suffix, key, dtype in (
            (".catalog_particles", "Particle_IDs", np.int64),
            (".catalog_parttypes", "Particle_types", np.int64)):
        body = np.loadtxt(out_a + suffix, skiprows=2, dtype=dtype, ndmin=1)
        with h5py.File(out_h + suffix) as f:
            np.testing.assert_array_equal(body, np.asarray(f[key]))
    agl = open(out_a + ".catalog_groups").read().split()
    with h5py.File(out_h + ".catalog_groups") as f:
        sizes = np.asarray(f["Group_Size"])
        offs = np.asarray(f["Offset"])
        offs_u = np.asarray(f["Offset_unbound"])
    body = np.array(agl[4:], dtype=np.int64)
    np.testing.assert_array_equal(body,
                                  np.concatenate([sizes, offs, offs_u]))


def test_parallel_multifile_gadget_read(tmp_path):
    """-Z/nsnapread parallel multi-file ingest (the analog of the
    reference's read-rank split, mpiroutines.cxx:527-782): a 16-file
    snapshot read with 8 reader threads returns exactly the serial
    result, and the read-phase timing is reported."""
    import time

    from velociraptor_stf_tpu.io import gadget as G

    rng = np.random.default_rng(6)
    n = 1 << 17
    boxsize = 10.0
    pos = rng.uniform(0, boxsize, (n, 3)).astype(np.float32)
    vel = rng.normal(0, 50, (n, 3)).astype(np.float32)
    pids = np.arange(1, n + 1)
    mass = np.ones(n, np.float32)
    fn = str(tmp_path / "multisnap")
    G.write_gadget(fn, pos, vel, pids, np.ones(n, np.int8), mass,
                   boxsize=boxsize, num_files=16)
    assert os.path.exists(fn + ".0") and os.path.exists(fn + ".15")

    t0 = time.time()
    hdr_s, p_s, v_s, id_s, t_s, m_s = G.read_gadget(fn, nsnapread=1)
    t_serial = time.time() - t0
    t0 = time.time()
    hdr_p, p_p, v_p, id_p, t_p, m_p = G.read_gadget(fn, nsnapread=8)
    t_par = time.time() - t0
    print(f"read timing: serial={t_serial:.3f}s parallel(8)={t_par:.3f}s")

    assert hdr_p.num_files == 16
    assert int(hdr_p.ntotal) == n
    np.testing.assert_array_equal(id_p, id_s)
    np.testing.assert_array_equal(p_p, p_s)
    np.testing.assert_array_equal(v_p, v_s)
    np.testing.assert_array_equal(m_p, m_s)
    assert len(p_s) == n and set(id_s) == set(pids)


def test_parallel_multifile_hdf_read(tmp_path, snap):
    """HDF multi-file parallel read equals the serial read."""
    import h5py

    pos, vel, pids, ptype, mass = snap
    n = len(pos)
    # split into 4 EAGLE-convention files
    bounds = np.linspace(0, n, 5).astype(int)
    base = str(tmp_path / "hsnap")
    for k in range(4):
        sl = slice(bounds[k], bounds[k + 1])
        with h5py.File(f"{base}.{k}.hdf5", "w") as f:
            h = f.create_group("Header")
            h.attrs["BoxSize"] = 10.0
            h.attrs["NumFilesPerSnapshot"] = 4
            h.attrs["NumPart_ThisFile"] = np.array(
                [0, sl.stop - sl.start, 0, 0, 0, 0])
            h.attrs["NumPart_Total"] = np.array([0, n, 0, 0, 0, 0])
            h.attrs["Time"] = 1.0
            h.attrs["Omega0"] = 0.3
            h.attrs["OmegaLambda"] = 0.7
            h.attrs["HubbleParam"] = 0.7
            h.attrs["MassTable"] = np.zeros(6)
            g = f.create_group("PartType1")
            g["Coordinates"] = pos[sl]
            g["Velocity"] = vel[sl]
            g["ParticleIDs"] = pids[sl]
            g["Mass"] = mass[sl]
    out_s = H.read_hdf(base + ".hdf5", nsnapread=1)
    out_p = H.read_hdf(base + ".hdf5", nsnapread=4)
    np.testing.assert_array_equal(out_p[3], out_s[3])
    np.testing.assert_array_equal(out_p[1], out_s[1])
    assert len(out_s[1]) == n


def test_extended_output_files(tmp_path):
    """Extended_output extraction files (reference WriteExtendedOutput,
    io.cxx:3826): .filesofgroup lists the input files holding each
    group's particles; .extended.N rows carry Id/IdStruct/IdHost/
    IdTopHost in original within-file order with the reference's
    12/7/7/7 column widths."""
    from velociraptor_stf_tpu.io import writers
    from velociraptor_stf_tpu.utils import config as C

    opt = C.Options()
    opt.snapshotvalue = 3
    base = 3 * 10 ** 12
    pids = np.asarray([11, 12, 13, 14, 15, 16], np.int64)
    pfof = np.asarray([1, 0, 2, 1, 2, 0], np.int32)
    # group 1 is a field halo (hostid -1), group 2 a sub of group 1
    hostid = np.asarray([0, -1, 1], np.int64)
    out = str(tmp_path / "ext")
    writers.write_extended_output(opt, out, pids, pfof, hostid=hostid,
                                  file_counts=[4, 2])

    fog = open(out + ".filesofgroup").read().splitlines()
    # group 1: particles 0 (file 0) and 3 (file 0) -> 1 file
    assert fog[0] == f"{base + 1}  1"
    assert fog[1].split() == ["0"]
    # group 2: particles 2 (file 0) and 4 (file 1) -> 2 files
    assert fog[2] == f"{base + 2}  2"
    assert fog[3].split() == ["0", "1"]

    ext0 = open(out + ".extended.0").read().splitlines()
    ext1 = open(out + ".extended.1").read().splitlines()
    assert len(ext0) == 4 and len(ext1) == 2
    # row: Id, IdStruct=haloid, IdHost (own id for field), IdTopHost
    # (own id when no iKeepFOF envelope exists)
    assert ext0[0].split() == ["11", str(base + 1), "1", "1"]
    assert ext0[1].split() == ["12", "0", "0", "0"]     # untagged
    assert ext0[2].split() == ["13", str(base + 2), str(base + 1), "2"]
    # reference field widths: setw(12) Id + 2 spaces, setw(7) each id
    assert ext0[1] == "          12        0        0        0  "
    ext1_rows = [r.split() for r in ext1]
    assert ext1_rows[0][0] == "15" and ext1_rows[1][0] == "16"
