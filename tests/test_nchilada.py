"""Nchilada reader round-trip tests (XDR field files, reference
nchiladaitems.h:46-64,191-238 layout)."""

import os
import struct

import numpy as np

from velociraptor_stf_tpu.io import nchilada as N


def _write_field(fname, values, time=0.5, code=10):
    """Write one XDR field file in the reference's readField3D layout:
    header + per-dim (min, max, data...)."""
    values = np.asarray(values)
    ndim = values.shape[1] if values.ndim == 2 else 1
    n = len(values)
    dt = np.dtype(N._CODE_DTYPE[code])
    os.makedirs(os.path.dirname(fname), exist_ok=True)
    with open(fname, "wb") as f:
        f.write(np.asarray([N.MAGIC], ">i4").tobytes())
        f.write(np.asarray([time], ">f8").tobytes())
        f.write(np.asarray([0, n, ndim, code], ">i4").tobytes())
        for d in range(ndim):
            col = values[:, d] if values.ndim == 2 else values
            mn, mx = col.min(), col.max()
            f.write(np.asarray([mn, mx], dt).tobytes())
            if mn != mx:
                f.write(np.asarray(col, dt).tobytes())


def test_nchilada_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    d = str(tmp_path / "snap")
    nd, ns = 500, 100
    pos_d = rng.random((nd, 3)) - 0.5
    vel_d = rng.normal(0, 0.1, (nd, 3))
    mass_d = np.full(nd, 1e-8)          # all equal -> min==max shortcut
    pos_s = rng.random((ns, 3)) - 0.5
    vel_s = rng.normal(0, 0.1, (ns, 3))
    mass_s = rng.uniform(1e-9, 2e-9, ns)
    _write_field(os.path.join(d, "dark", "pos"), pos_d)
    _write_field(os.path.join(d, "dark", "vel"), vel_d)
    _write_field(os.path.join(d, "dark", "mass"), mass_d)
    _write_field(os.path.join(d, "dark", "iord"),
                 np.arange(1, nd + 1), code=7)
    _write_field(os.path.join(d, "star", "pos"), pos_s)
    _write_field(os.path.join(d, "star", "vel"), vel_s)
    _write_field(os.path.join(d, "star", "mass"), mass_s)

    hdr, pos, vel, pids, ptype, mass = N.read_nchilada(d)
    assert hdr.time == 0.5
    assert (ptype == 1).sum() == nd
    assert (ptype == 4).sum() == ns
    np.testing.assert_allclose(pos[ptype == 1], pos_d, rtol=1e-12)
    np.testing.assert_allclose(vel[ptype == 4], vel_s, rtol=1e-12)
    # all-equal mass field reconstructed from the min==max shortcut
    np.testing.assert_allclose(mass[ptype == 1], 1e-8, rtol=1e-12)
    np.testing.assert_allclose(mass[ptype == 4], mass_s, rtol=1e-6)
    assert (pids[:nd] == np.arange(1, nd + 1)).all()


def test_nchilada_type_filter(tmp_path):
    d = str(tmp_path / "snap")
    _write_field(os.path.join(d, "dark", "pos"), np.zeros((10, 3)) + 0.25)
    _write_field(os.path.join(d, "dark", "vel"), np.zeros((10, 3)))
    _write_field(os.path.join(d, "dark", "mass"), np.ones(10))
    hdr, pos, vel, pids, ptype, mass = N.read_nchilada(d, parttypes=[1])
    assert len(pos) == 10 and (ptype == 1).all()
