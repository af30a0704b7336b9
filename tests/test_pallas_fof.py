"""Pallas block-range FOF vs the XLA edge pipeline (TPU only).

The CPU test suite exercises the XLA path (tests/conftest.py forces the
CPU backend, where the Pallas path is inactive); this file checks the two
backends produce identical partitions when a TPU is present.  Reference
semantics under test: KDTree::FOF 3D + per-group 6D phase FOF
(/root/reference/src/search.cxx:110,552-576).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.skipif(
    jax.default_backend() not in ("tpu", "axon"),
    reason="pallas FOF runs only on TPU")


def test_pallas_fof3d_matches_xla():
    from velociraptor_stf_tpu.io.synthetic import make_cosmo_mock
    from velociraptor_stf_tpu.ops import fof, pallas_fof

    n = 1 << 16
    boxsize = 50.0
    pos, vel, mass = make_cosmo_mock(n, boxsize=boxsize, nhalos=16, seed=3)
    pos, vel = jnp.asarray(pos), jnp.asarray(vel)
    b3d = 0.2 * boxsize / n ** (1 / 3)

    pf = pallas_fof.PallasFof(pos, vel, boxsize, b3d)
    pfof_p, ng_p = pf.fof3d(b3d, 20)
    pfof_x, ng_x = fof.fof3d(pos, b3d, boxsize=boxsize, min_size=20)
    assert int(jax.device_get(ng_p)) == int(jax.device_get(ng_x))
    assert np.array_equal(np.asarray(jax.device_get(pfof_p)),
                          np.asarray(jax.device_get(pfof_x)))
    assert not pf.check_overflow()


def test_pallas_6d_pipeline_matches_xla(monkeypatch):
    from velociraptor_stf_tpu.io.synthetic import make_cosmo_mock
    from velociraptor_stf_tpu.models import halos
    from velociraptor_stf_tpu.utils import config as C

    n = 1 << 16
    boxsize = 50.0
    pos, vel, mass = make_cosmo_mock(n, boxsize=boxsize, nhalos=16, seed=4)
    pos, vel, mass = map(jnp.asarray, (pos, vel, mass))
    opt = C.Options()
    opt.ellphys = 0.2
    opt.ellxscale = boxsize / n ** (1 / 3)
    opt.fofbgtype = C.FOF6D
    opt.MinSize = 20
    opt.HaloMinSize = 32
    C.config_check(opt)

    outs = {}
    for mode in ("0", "1"):
        monkeypatch.setenv("VR_FOF_PALLAS", mode)
        r = halos.search_full_set(opt, pos, vel, mass, boxsize=boxsize)
        outs[mode] = np.asarray(jax.device_get(r.pfof))
    assert np.array_equal(outs["0"], outs["1"])
