"""Pallas kernel compile-failure fallbacks.

The Pallas sweep/potential kernels only lower on TPU backends; if Mosaic
rejects a kernel (toolchain drift, unsupported op), production runs must
fall back to the XLA paths instead of dying (halos.py / unbind.py /
distributed_unbind.py latch `mark_compile_failed`).  These tests simulate
the failure by monkeypatching the kernel entry points to raise.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from velociraptor_stf_tpu.io.synthetic import MockSpec, make_mock
from velociraptor_stf_tpu.models import halos, unbind
from velociraptor_stf_tpu.ops import pallas_fof, pallas_gravity
from velociraptor_stf_tpu.utils import config as C


@pytest.fixture(autouse=True)
def _reset_latches(monkeypatch):
    monkeypatch.setattr(pallas_fof, "_COMPILE_FAILED", False)
    monkeypatch.setattr(pallas_gravity, "_COMPILE_FAILED", False)
    yield


def _field_opt():
    opt = C.Options()
    opt.ellphys = 0.2
    opt.ellxscale = 1.0
    opt.fofbgtype = C.FOF6D
    opt.MinSize = 8
    opt.HaloMinSize = 8
    return opt


def test_fof_kernel_failure_falls_back_to_edge_pipeline(monkeypatch):
    spec = MockSpec(nhalos=4, particles_per_halo=200, npart_background=400,
                    seed=3)
    pos, vel, mass, _ = make_mock(spec)
    opt = _field_opt()
    opt.ellxscale = spec.boxsize / pos.shape[0] ** (1 / 3)
    baseline = halos.search_full_set(opt, pos, vel, mass,
                                     boxsize=spec.boxsize)

    # pretend the backend advertises the kernels, then fail the build
    monkeypatch.setattr(pallas_fof, "pallas_fof_available",
                        lambda *a, **k: not pallas_fof._COMPILE_FAILED)

    def boom(*a, **k):
        raise RuntimeError("Mosaic lowering failed (simulated)")

    monkeypatch.setattr(pallas_fof, "PallasFof", boom)
    with pytest.warns(RuntimeWarning, match="Pallas FOF"):
        res = halos.search_full_set(opt, pos, vel, mass,
                                    boxsize=spec.boxsize)
    assert pallas_fof._COMPILE_FAILED
    assert res.ngroups == baseline.ngroups
    np.testing.assert_array_equal(np.asarray(res.pfof),
                                  np.asarray(baseline.pfof))
    # the latch short-circuits the next availability check (no new warning)
    res2 = halos.search_full_set(opt, pos, vel, mass,
                                     boxsize=spec.boxsize)
    assert res2.ngroups == baseline.ngroups


def test_potential_kernel_failure_falls_back_to_buckets(monkeypatch):
    rng = np.random.default_rng(11)
    n = 600
    pos = rng.uniform(0, 10, (n, 3))
    mass = rng.uniform(0.5, 1.5, n)
    pfof = rng.integers(0, 3, n).astype(np.int32)
    baseline = np.asarray(unbind.compute_potential(
        jnp.asarray(pos), jnp.asarray(mass), jnp.asarray(pfof), 2,
        eps=0.05, G=43.0))

    monkeypatch.setattr(pallas_gravity, "pallas_potential_available",
                        lambda: not pallas_gravity._COMPILE_FAILED)

    def boom(*a, **k):
        raise RuntimeError("Mosaic lowering failed (simulated)")

    monkeypatch.setattr(pallas_gravity, "potential_group_sorted", boom)
    with pytest.warns(RuntimeWarning, match="Pallas potential"):
        w = np.asarray(unbind.compute_potential(
            jnp.asarray(pos), jnp.asarray(mass), jnp.asarray(pfof), 2,
            eps=0.05, G=43.0))
    assert pallas_gravity._COMPILE_FAILED
    np.testing.assert_allclose(w, baseline, rtol=1e-5, atol=1e-8)
