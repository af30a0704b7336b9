"""Device-residency of the mesh pipeline (round-4 VERDICT item 3).

The reference's MPI design keeps particles on their ranks for the whole
run (/root/reference/src/mpiroutines.cxx:49-230); the TPU analog is
arrays staying sharded on device across stage boundaries.  This test
proves it mechanically: the WHOLE ``find_structures(mesh=)`` metric run
(FOF6D -> velocity scales -> unbind -> properties -> inclusive SO)
executes under JAX's device->host transfer guard in ``disallow`` mode —
any un-audited gather raises — and the audited O(N) fetches recorded by
telemetry are exactly the catalog payloads (pfof / pfof3d / W), nothing
inter-stage.
"""

import numpy as np
import pytest

import jax

from velociraptor_stf_tpu.io.synthetic import make_cosmo_mock
from velociraptor_stf_tpu.models.pipeline import find_structures
from velociraptor_stf_tpu.parallel.mesh import make_mesh
from velociraptor_stf_tpu.utils import config as C, telemetry
from velociraptor_stf_tpu.utils.transfer import no_host_transfers


def _opt(n, boxsize):
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
    opt.iInclusiveHalo = 3      # SO stage joins the guarded run
    C.config_check(opt)
    return opt


@pytest.mark.skipif(jax.device_count() < 2, reason="needs a device mesh")
def test_mesh_pipeline_no_interstage_gathers():
    boxsize = 50.0
    n = 1 << 15
    pos, vel, mass = make_cosmo_mock(n, boxsize=boxsize, nhalos=24, seed=11)
    opt = _opt(n, boxsize)
    mesh = make_mesh(jax.device_count())

    # stage inputs on device FIRST (H2D is allowed either way; the guard
    # below polices the device->host direction only)
    import jax.numpy as jnp
    pos_d, vel_d, mass_d = (jnp.asarray(pos), jnp.asarray(vel),
                            jnp.asarray(mass))
    jax.block_until_ready(mass_d)

    telemetry.reset()
    with no_host_transfers():
        res = find_structures(opt, pos_d, vel_d, mass_d, boxsize=boxsize,
                              mesh=mesh)
    snap = telemetry.snapshot()

    # every audited O(N) fetch is a catalog payload; none is a stage input
    bulk_keys = sorted(k for k in snap
                       if k.startswith("mesh_full_gathers::"))
    assert bulk_keys == ["mesh_full_gathers::catalog_W",
                         "mesh_full_gathers::catalog_pfof",
                         "mesh_full_gathers::pfof3d"], snap
    assert snap["mesh_full_gathers"] == 3
    assert all(snap[k] == 1 for k in bulk_keys), snap

    # and the catalog is real: compare against the unguarded single-device
    # run (partition equality)
    res1 = find_structures(opt, pos, vel, mass, boxsize=boxsize)
    assert res.ngroups == res1.ngroups
    from collections import defaultdict

    def canon(pfof):
        d = defaultdict(list)
        for i, g in enumerate(np.asarray(pfof)):
            if g > 0:
                d[g].append(i)
        return set(frozenset(v) for v in d.values())

    assert canon(res.pfof) == canon(res1.pfof)


def test_guard_actually_trips():
    """Sanity: the interception DOES raise on unaudited host
    materialisations (otherwise the test above proves nothing) — both
    the ``np.asarray`` funnel and ``jax.device_get``, on any backend."""
    import jax.numpy as jnp
    x = jnp.arange(1 << 13, dtype=jnp.float32)
    jax.block_until_ready(x)
    with pytest.raises(RuntimeError, match="unaudited"):
        with no_host_transfers():
            np.asarray(x)
    with pytest.raises(RuntimeError, match="unaudited"):
        with no_host_transfers():
            jax.device_get(x)
    # small fetches and audited fetches pass
    from velociraptor_stf_tpu.utils.transfer import fetch_bulk, fetch_small
    with no_host_transfers():
        assert int(fetch_small(jnp.sum(x))) == (1 << 13) * ((1 << 13) - 1) // 2
        assert np.asarray(fetch_bulk(x, "test")).shape == (1 << 13,)
        np.asarray(jnp.arange(16))     # tiny: allowed


@pytest.mark.skipif(jax.device_count() < 2, reason="needs a device mesh")
def test_mesh_pipeline_recursion_resident():
    """Round-5: the substructure recursion (SearchSubSub) joins the
    guarded run — per-structure contexts are class-batched device gathers
    from the group-sorted order (no host staging of the particle set;
    reference keeps particles rank-resident through SearchSubSub,
    mpiroutines.cxx:2548,2170-3031)."""
    boxsize = 30.0
    n = 1 << 15
    pos, vel, mass = make_cosmo_mock(n, boxsize=boxsize, nhalos=6, seed=13)
    opt = _opt(n, boxsize)
    opt.iSubSearch = 1
    opt.iiterflag = 1
    C.config_check(opt)
    mesh = make_mesh(jax.device_count())

    import jax.numpy as jnp
    pos_d, vel_d, mass_d = (jnp.asarray(pos), jnp.asarray(vel),
                            jnp.asarray(mass))
    jax.block_until_ready(mass_d)

    telemetry.reset()
    with no_host_transfers():
        res = find_structures(opt, pos_d, vel_d, mass_d, boxsize=boxsize,
                              mesh=mesh)
    snap = telemetry.snapshot()
    bulk_keys = sorted(k for k in snap
                       if k.startswith("mesh_full_gathers::"))
    # catalog payloads only — the recursion itself stages nothing
    assert bulk_keys == ["mesh_full_gathers::catalog_W",
                         "mesh_full_gathers::catalog_pfof",
                         "mesh_full_gathers::pfof3d"], snap

    # the recursion really ran (and batched)
    assert snap.get("subset_batched_structures", 0) > 0, snap

    res1 = find_structures(opt, pos, vel, mass, boxsize=boxsize)
    assert res.ngroups == res1.ngroups
    np.testing.assert_array_equal(np.asarray(res.pfof),
                                  np.asarray(res1.pfof))


@pytest.mark.skipif(jax.device_count() < 2, reason="needs a device mesh")
def test_mesh_pipeline_baryons_resident():
    """Round-5: the baryon stage joins the guarded run — the sharded
    assignment stages the combined (tagged DM + baryon) set on device
    (SlabPlan) and the DM/baryon label splice is a device scatter
    (reference analog: particles never leave their ranks through
    SearchBaryons, mpiroutines.cxx:2170-3031)."""
    boxsize = 30.0
    n = 1 << 15
    pos, vel, mass = make_cosmo_mock(n, boxsize=boxsize, nhalos=8, seed=17)
    ptype = np.where(np.arange(n) % 6 == 5, C.GASTYPE,
                     C.DARKTYPE).astype(np.int32)
    opt = _opt(n, boxsize)
    opt.iBaryonSearch = 1
    opt.partsearchtype = C.PSTALL
    C.config_check(opt)
    mesh = make_mesh(jax.device_count())

    import jax.numpy as jnp
    pos_d, vel_d, mass_d = (jnp.asarray(pos), jnp.asarray(vel),
                            jnp.asarray(mass))
    jax.block_until_ready(mass_d)

    telemetry.reset()
    with no_host_transfers():
        res = find_structures(opt, pos_d, vel_d, mass_d, boxsize=boxsize,
                              ptype=ptype, mesh=mesh)
    snap = telemetry.snapshot()
    bulk_keys = sorted(k for k in snap
                       if k.startswith("mesh_full_gathers::"))
    allowed = {"mesh_full_gathers::catalog_W",
               "mesh_full_gathers::catalog_pfof",
               "mesh_full_gathers::pfof3d",
               # DM-subset extraction for the multi-type search is an
               # input-staging fetch (PSTALL splits the typed input),
               # not an inter-stage one
               "mesh_full_gathers::tagged_subset_index"}
    assert set(bulk_keys) <= allowed, snap

    res1 = find_structures(opt, pos, vel, mass, boxsize=boxsize,
                           ptype=ptype)
    assert res.ngroups == res1.ngroups
    np.testing.assert_array_equal(np.asarray(res.pfof),
                                  np.asarray(res1.pfof))
