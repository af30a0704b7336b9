"""Distributed FOF tests on the virtual 8-device CPU mesh.

SPMD slab decomposition + ppermute halo exchange must reproduce the
single-device FOF partition exactly (SURVEY.md §2.6/§2.8: the TPU
replacement for mpiroutines.cxx's link-across fixed point).
"""

import numpy as np
import pytest

import jax

from velociraptor_stf_tpu.io.synthetic import make_cosmo_mock
from velociraptor_stf_tpu.ops import fof
from velociraptor_stf_tpu.parallel import mesh as M
from velociraptor_stf_tpu.parallel.distributed_fof import distributed_fof3d

pytestmark = pytest.mark.slow


def _partition_equal(a, b):
    """Two labelings describe the same partition (ids may differ)."""
    a = np.asarray(a)
    b = np.asarray(b)
    # untagged must match exactly
    if not ((a == 0) == (b == 0)).all():
        return False
    sel = a > 0
    pa, pb = a[sel].astype(np.int64), b[sel].astype(np.int64)
    if pa.size == 0:
        return True
    # bijection check: distinct (a,b) pairs == distinct a == distinct b
    pairs = np.unique(pa * (pb.max() + 2) + pb).size
    return pairs == np.unique(pa).size == np.unique(pb).size


@pytest.mark.parametrize("ndev", [4, 8])
def test_distributed_fof_matches_single_device(ndev):
    n = 1 << 15
    boxsize = 20.0
    pos, vel, mass = make_cosmo_mock(n, boxsize=boxsize, nhalos=12, seed=21)
    b = 0.2 * boxsize / n ** (1 / 3)
    mesh = M.make_mesh(ndev)
    pfof_d, ng_d = distributed_fof3d(pos, b, boxsize, mesh, min_size=20)
    pfof_s, ng_s = fof.fof3d(pos, b, boxsize=boxsize, min_size=20)
    pfof_s = np.asarray(jax.device_get(pfof_s))
    ng_s = int(jax.device_get(ng_s))
    assert ng_d == ng_s
    assert _partition_equal(pfof_d, pfof_s)


def test_distributed_fof_group_spanning_many_slabs():
    """A filament along x crossing every slab boundary (worst case for the
    cross-slab label fixed point) must come out as ONE group."""
    rng = np.random.default_rng(5)
    boxsize = 16.0
    n_fil = 4000
    # filament along x at y=z=8, spacing well below the linking length
    xs = np.linspace(0, boxsize, n_fil, endpoint=False)
    fil = np.stack([xs, np.full(n_fil, 8.0), np.full(n_fil, 8.0)], axis=1)
    fil += rng.normal(0, 0.005, fil.shape)
    bg = rng.random((20000, 3)) * boxsize
    pos = np.concatenate([fil, bg]).astype(np.float32)
    b = 0.05   # links the filament (spacing 0.004), not the background
    mesh = M.make_mesh(8)
    pfof_d, ng_d = distributed_fof3d(pos, b, boxsize, mesh, min_size=20)
    # the filament is one group, and it wraps periodically (0 connects 16)
    lab = pfof_d[:n_fil]
    assert (lab > 0).all()
    assert len(np.unique(lab)) == 1
    pfof_s, ng_s = fof.fof3d(pos, b, boxsize=boxsize, min_size=20)
    assert _partition_equal(pfof_d, np.asarray(jax.device_get(pfof_s)))


def test_distributed_fof6d_matches_single_device():
    """Distributed 6DFOF (velocity payloads riding the ghost exchange)
    reproduces the single-device FOF6DADAPTIVE partition."""
    import jax.numpy as jnp

    from velociraptor_stf_tpu.models import halos
    from velociraptor_stf_tpu.parallel.distributed_fof import \
        distributed_fof6d
    from velociraptor_stf_tpu.utils import config as C

    n = 1 << 15
    boxsize = 20.0
    pos, vel, mass = make_cosmo_mock(n, boxsize=boxsize, nhalos=12, seed=23)
    b = 0.2 * boxsize / n ** (1 / 3)
    mesh = M.make_mesh(8)

    opt = C.Options()
    opt.ellphys = 0.2
    opt.ellxscale = boxsize / n ** (1 / 3)
    opt.fofbgtype = C.FOF6DADAPTIVE
    opt.MinSize = 20
    opt.HaloMinSize = 20
    C.config_check(opt)
    sres = halos.search_full_set(opt, jnp.asarray(pos), jnp.asarray(vel),
                                 jnp.asarray(mass), boxsize=boxsize)
    pfof_s = np.asarray(jax.device_get(sres.pfof))

    pfof_d, ng_d, pfof3_d, ng3_d = distributed_fof6d(
        pos, vel, mass, b, opt.ellhalo6dxfac, opt.ellhalo6dvfac,
        boxsize, mesh, min_size=20, adaptive=True)
    assert ng3_d == sres.ngroups3d
    assert ng_d == sres.ngroups
    # velocity-scale estimates differ at float rounding; demand a near-
    # perfect particle-level match rather than bit equality
    both = (pfof_s > 0) | (pfof_d > 0)
    agree = (pfof_s > 0) & (pfof_d > 0)
    assert agree.sum() / max(both.sum(), 1) > 0.995


def test_distributed_unbind_matches_single_device():
    """Whole-group device assignment + local ejection must reproduce the
    single-device bound masks and renumbered labels bit-for-bit."""
    from velociraptor_stf_tpu.models import unbind as ub
    from velociraptor_stf_tpu.parallel.distributed_unbind import \
        distributed_unbind
    from velociraptor_stf_tpu.utils import config as C

    n = 1 << 14
    boxsize = 20.0
    pos, vel, mass = make_cosmo_mock(n, boxsize=boxsize, nhalos=10, seed=31)
    b = 0.2 * boxsize / n ** (1 / 3)
    pfof_s, ng_s = fof.fof3d(pos, b, boxsize=boxsize, min_size=20)
    pfof_s = np.asarray(jax.device_get(pfof_s))
    ng_s = int(jax.device_get(ng_s))
    assert ng_s >= 3

    uinfo = C.UnbindInfo()
    uinfo.unbindflag = 1
    uinfo.Eratio = 1.0
    G = 43.0211349

    res_s = ub.check_unbound_groups(pos, vel, mass, pfof_s, ng_s, uinfo, G,
                                    boxsize=boxsize, min_size=20)
    mesh = M.make_mesh(8)
    res_d = distributed_unbind(pos, vel, mass, pfof_s, ng_s, uinfo, G,
                               mesh, boxsize=boxsize, min_size=20)
    assert res_d.ngroups == res_s.ngroups
    bs = np.asarray(jax.device_get(res_s.bound))
    bd = np.asarray(jax.device_get(res_d.bound))
    assert np.array_equal(bs, bd)
    assert _partition_equal(np.asarray(jax.device_get(res_s.pfof)),
                            np.asarray(jax.device_get(res_d.pfof)))


def test_distributed_unbind_bgpot_recompute():
    """Keep_background_potential=0 (recompute between chunks) also matches."""
    from velociraptor_stf_tpu.models import unbind as ub
    from velociraptor_stf_tpu.parallel.distributed_unbind import \
        distributed_unbind
    from velociraptor_stf_tpu.utils import config as C

    n = 1 << 13
    boxsize = 20.0
    pos, vel, mass = make_cosmo_mock(n, boxsize=boxsize, nhalos=6, seed=32)
    b = 0.2 * boxsize / n ** (1 / 3)
    pfof_s, ng_s = fof.fof3d(pos, b, boxsize=boxsize, min_size=20)
    pfof_s = np.asarray(jax.device_get(pfof_s))
    ng_s = int(jax.device_get(ng_s))
    assert ng_s >= 2

    uinfo = C.UnbindInfo()
    uinfo.unbindflag = 1
    uinfo.Eratio = 1.0
    uinfo.bgpot = 0
    G = 43.0211349
    res_s = ub.check_unbound_groups(pos, vel, mass, pfof_s, ng_s, uinfo, G,
                                    boxsize=boxsize, min_size=20)
    res_d = distributed_unbind(pos, vel, mass, pfof_s, ng_s, uinfo, G,
                               M.make_mesh(4), boxsize=boxsize, min_size=20)
    assert res_d.ngroups == res_s.ngroups
    assert np.array_equal(np.asarray(jax.device_get(res_s.bound)),
                          np.asarray(jax.device_get(res_d.bound)))


def test_distributed_fof_boundary_buffer_pressure():
    """Heavy boundary columns: a large fraction of all particles packed
    into thin sheets AT slab boundaries stresses the ghost-buffer (B)
    sizing and the cross-slab label chain (buffer pressure, not just the
    label fixed point)."""
    rng = np.random.default_rng(77)
    boxsize = 16.0
    ndev = 8
    mesh = M.make_mesh(ndev)
    b = 0.25
    # plan geometry mirror: W = 256//ndev capped by nx_max=boxsize/b=64
    # -> nxt=64, W=8, nx=64; slab boundaries at x = k * (boxsize/ndev)
    n_bg = 1 << 13
    pos_bg = rng.uniform(0, boxsize, (n_bg, 3)).astype(np.float32)
    sheets = []
    for k in range(ndev):
        xb = (k * boxsize / ndev) % boxsize
        m = 1 << 12   # dense enough that each sheet forms real groups
        s = np.empty((m, 3), np.float32)
        # within half a linking length of the boundary: every sheet
        # particle is a ghost candidate on both neighbouring slabs
        s[:, 0] = xb + rng.uniform(-0.4 * b, 0.4 * b, m)
        s[:, 1] = rng.uniform(0, boxsize, m)
        s[:, 2] = rng.uniform(0, boxsize, m)
        sheets.append(s)
    pos = np.concatenate([pos_bg] + sheets) % boxsize
    pfof_d, ng_d = distributed_fof3d(pos, b, boxsize, mesh, min_size=20)
    assert ng_d > 0   # the sheets must actually form groups
    pfof_s, ng_s = fof.fof3d(pos, b, boxsize=boxsize, min_size=20)
    pfof_s = np.asarray(jax.device_get(pfof_s))
    assert ng_d == int(jax.device_get(ng_s))
    assert _partition_equal(pfof_d, pfof_s)


def test_distributed_bulk_properties_match_numpy():
    """Sharded psum property reductions match a float64 host computation."""
    from velociraptor_stf_tpu.parallel.distributed_props import \
        distributed_bulk_properties

    rng = np.random.default_rng(88)
    n, ng = 20000, 6
    boxsize = 10.0
    pfof = rng.integers(0, ng + 1, n).astype(np.int32)
    pos = rng.uniform(0, boxsize, (n, 3)).astype(np.float32)
    vel = rng.normal(0, 30, (n, 3)).astype(np.float32)
    mass = rng.uniform(1, 2, n).astype(np.float32)
    mesh = M.make_mesh(8)
    out = distributed_bulk_properties(pos, vel, mass, pfof, ng, mesh,
                                      boxsize=boxsize)

    for g in range(1, ng + 1):
        s = pfof == g
        m = mass[s].astype(np.float64)
        # unwrap about the group's lowest-index member (module contract)
        ref = pos[s][0].astype(np.float64)
        d = pos[s].astype(np.float64) - ref
        p = ref + d - boxsize * np.round(d / boxsize)
        mt = m.sum()
        cm = (p * m[:, None]).sum(0) / mt
        cmv = (vel[s].astype(np.float64) * m[:, None]).sum(0) / mt
        assert abs(out["num"][g] - s.sum()) < 0.5
        assert abs(out["gmass"][g] - mt) / mt < 1e-5
        np.testing.assert_allclose(out["gcm"][g], cm, rtol=2e-4, atol=2e-3)
        np.testing.assert_allclose(out["gcmvel"][g], cmv, rtol=2e-4,
                                   atol=2e-3)
        dx = p - cm
        dv = vel[s].astype(np.float64) - cmv
        disp = np.einsum("ni,nj,n->ij", dv, dv, m) / mt
        np.testing.assert_allclose(out["gveldisp"][g], disp, rtol=2e-3,
                                   atol=1e-2)
        J = (m[:, None] * np.cross(dx, dv)).sum(0)
        np.testing.assert_allclose(out["gJ"][g], J, rtol=5e-3,
                                   atol=1e-2 * np.abs(J).max())
        rmax = np.sqrt((dx ** 2).sum(1).max())
        assert abs(out["gsize"][g] - rmax) / rmax < 1e-4


def test_distributed_so_matches_single_device():
    """Sharded partial-histogram SO (psum over the mesh) matches the
    single-device all-particle SO search on every halo and threshold."""
    import math

    from velociraptor_stf_tpu.ops import so
    from velociraptor_stf_tpu.parallel.distributed_so import \
        distributed_so_masses

    rng = np.random.default_rng(31)
    boxsize = 12.0
    # 5 planted halos (varying size to span octave radius classes) +
    # uniform background
    centers, chunks = [], []
    for k in range(5):
        nk = 2000 * (k + 1)
        c = rng.uniform(2, boxsize - 2, 3)
        r = (0.15 + 0.1 * k) * rng.random(nk) ** (1 / 3)
        d = rng.normal(size=(nk, 3))
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        chunks.append(c + d * r[:, None])
        centers.append(c)
    chunks.append(rng.random((30011, 3)) * boxsize)   # odd n -> shard pad
    pos = np.concatenate(chunks).astype(np.float32)
    mass = rng.uniform(0.5, 1.5, len(pos)).astype(np.float32)
    centers = np.asarray(centers, np.float32)
    rsearch = np.array([2.0, 1.5, 2.5, 1.0, 3.0])
    rho0 = len(pos) / boxsize ** 3
    lnthr = [math.log(200 * rho0), math.log(500 * rho0)]
    minnum = np.full(5, 8, np.int32)
    fm = np.full(5, 0.5, np.float64)

    M1, R1 = so.so_masses_all_particles(
        pos, mass, centers, rsearch, lnthr, boxsize=boxsize,
        minnum=minnum, first_mass=fm)
    mesh = M.make_mesh(8)
    M8, R8 = distributed_so_masses(
        pos, mass, centers, rsearch, lnthr, mesh, boxsize=boxsize,
        minnum=minnum, first_mass=fm)
    assert (M1 > 0).any()  # the mock must actually produce crossings
    np.testing.assert_allclose(M8, M1, rtol=5e-5, atol=1e-6)
    np.testing.assert_allclose(R8, R1, rtol=5e-5, atol=1e-6)


def test_distributed_velocity_density_matches_single_device():
    """Slab-sharded velocity density (ghost leaf exchange over the ring)
    agrees with the single-device estimator: identical physics kernel,
    only the KD leaf decomposition differs, so per-particle values agree
    statistically and dense structures are ranked identically."""
    import jax.numpy as jnp

    from velociraptor_stf_tpu.models import localfield
    from velociraptor_stf_tpu.parallel.distributed_localfield import \
        distributed_velocity_density

    rng = np.random.default_rng(77)
    boxsize = 10.0
    # a cold dense clump + hot background; the clump straddles a slab
    # boundary (x = boxsize/8 for ndev=8) to exercise the ghost exchange
    nclump, nbg = 4000, 28000
    cpos = np.array([boxsize / 8, 5.0, 5.0]) + \
        rng.normal(0, 0.15, (nclump, 3))
    cvel = rng.normal(0, 20.0, (nclump, 3))
    bpos = rng.random((nbg, 3)) * boxsize
    bvel = rng.normal(0, 300.0, (nbg, 3))
    pos = np.concatenate([cpos, bpos]).astype(np.float32)
    vel = np.concatenate([cvel, bvel]).astype(np.float32)

    d1 = np.asarray(localfield.velocity_density(
        jnp.asarray(pos), jnp.asarray(vel), nvel=32, nsearch=256))
    mesh = M.make_mesh(8)
    d8 = distributed_velocity_density(pos, vel, mesh, nvel=32, nsearch=256,
                                      boxsize=boxsize)
    assert d1.shape == d8.shape == (len(pos),)
    assert (d8 > 0).all()
    # clump particles must be recognised as dense by both estimators
    # per-particle deviation is decomposition noise inherent to the
    # approximative mode (leaf-shared candidate sets): both estimators
    # show IDENTICAL error vs a high-reach reference (med 1.368 vs 1.372
    # in log, measured), so only their mutual spread is bounded here
    logr = np.log(d8) - np.log(d1)
    med = np.median(np.abs(logr))
    assert med < 0.2, f"median |log ratio| {med:.3f}"
    # density ranking agreement: top-5% dense sets overlap strongly
    k = len(pos) // 20
    top1 = set(np.argsort(-d1)[:k])
    top8 = set(np.argsort(-d8)[:k])
    assert len(top1 & top8) / k > 0.9
    # the clump dominates the dense set in both
    assert np.median(d8[:nclump]) > 10 * np.median(d8[nclump:])


def test_distributed_subset_batch_matches_single_device():
    """Sharded class-batched substructure search (whole structures per
    device, GSPMD-partitioned vmap) reproduces the single-device batch
    bit-for-bit."""
    import jax.numpy as jnp

    from velociraptor_stf_tpu.models import substructure as S
    from velociraptor_stf_tpu.parallel.distributed_substructure import \
        distributed_subset_batch
    from velociraptor_stf_tpu.utils import config as C

    G = 43.0211349
    rng = np.random.default_rng(5)
    opt = C.Options()
    opt.ellphys = 0.2
    opt.ellxscale = 0.25
    opt.iiterflag = 1
    opt.ellthreshold = 2.5
    opt.Vratio = 2.0
    opt.thetaopen = 0.10
    opt.ellfac = 1.0
    opt.MinSize = 20
    opt.G = G

    # 3 structures (not a multiple of the mesh size -> pad lanes) with a
    # cold clump each, padded to one npad class with outlier values
    entries_a, entries_b = [], []
    pad_spacing = 3.0 * opt.ellxscale * opt.ellphys
    for k in range(3):
        nhost, nsub = 2500, 350
        r = rng.uniform(size=nhost) ** 0.5
        d = rng.normal(size=(nhost, 3))
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        hpos = r[:, None] * d
        sigma = np.sqrt(G * 100.0 / 6)
        hvel = rng.normal(0, sigma, (nhost, 3))
        spos = np.array([0.4, 0, 0]) + 0.05 * rng.normal(size=(nsub, 3))
        svel = np.array([0, 1.6 * sigma, 0]) + rng.normal(0, 5, (nsub, 3))
        pos = np.concatenate([hpos, spos]).astype(np.float32)
        vel = np.concatenate([hvel, svel]).astype(np.float32)
        mass = np.full(len(pos), 100.0 / len(pos), np.float32)
        npad = S._next_pow2(len(pos))
        ppos, pvel, pmass, valid = S._pad_structure(pos, vel, mass, npad,
                                                    pad_spacing)
        ell, _, _ = S.structure_outliers(opt, ppos, pvel, pmass, valid)
        e = {"ppos": ppos, "pvel": pvel, "pmass": pmass, "valid": valid,
             "ell": ell, "npad": npad}
        entries_a.append(dict(e))
        entries_b.append(dict(e))

    S._search_subset_batch(opt, entries_a)
    mesh = M.make_mesh(8)
    distributed_subset_batch(opt, entries_b, mesh)

    assert any(e.get("ng_sub", 0) > 0 for e in entries_a)
    for ea, eb in zip(entries_a, entries_b):
        assert ("sub_np" in ea) == ("sub_np" in eb)
        if "sub_np" in ea:
            assert ea["ng_sub"] == eb["ng_sub"]
            np.testing.assert_array_equal(ea["sub_np"], eb["sub_np"])


@pytest.mark.slow
def test_distributed_fof6d_group_spanning_many_slabs():
    """A coherent-velocity filament crossing EVERY slab boundary under the
    6D criterion (velocity payloads riding multi-hop ghost exchange): the
    label fixed point needs several cross-slab rounds and must still
    produce ONE group; a velocity break in the middle must split it."""
    import jax.numpy as jnp

    from velociraptor_stf_tpu.parallel.distributed_fof import \
        distributed_fof6d

    rng = np.random.default_rng(9)
    boxsize = 16.0
    n_fil = 6000
    xs = np.linspace(0, boxsize, n_fil, endpoint=False)
    fil = np.stack([xs, np.full(n_fil, 8.0), np.full(n_fil, 8.0)], axis=1)
    fil += rng.normal(0, 0.004, fil.shape)
    # coherent stream velocity... with a hard break at x = boxsize/2
    vfil = np.tile(np.array([50.0, 0.0, 0.0]), (n_fil, 1))
    vfil[xs >= boxsize / 2] = np.array([-50.0, 0.0, 0.0])
    vfil += rng.normal(0, 0.5, vfil.shape)
    bg = rng.random((20000, 3)) * boxsize
    vbg = rng.normal(0, 300.0, (20000, 3))
    pos = np.concatenate([fil, bg]).astype(np.float32)
    vel = np.concatenate([vfil, vbg]).astype(np.float32)
    mass = np.ones(len(pos), np.float32)
    mesh = M.make_mesh(8)
    b = 0.05
    pfof6, ng6, pfof3, ng3 = distributed_fof6d(
        pos, vel, mass, b, 1.0, 1.0, boxsize, mesh, min_size=20,
        adaptive=True)
    # 3D: one wrapped filament group; 6D: the velocity break splits it
    # in two (each half is periodic-wrapped to the other's far end, but
    # the velocities there differ by 100 >> the per-group dispersion)
    lab3 = pfof3[:n_fil]
    assert len(np.unique(lab3)) == 1 and (lab3 > 0).all()
    lab6 = pfof6[:n_fil]
    labs = np.unique(lab6[lab6 > 0])
    assert len(labs) == 2, f"6D split expected 2 groups, got {len(labs)}"
    # each half coherent: the break is at the half boundary
    left = lab6[xs < boxsize / 2]
    right = lab6[xs >= boxsize / 2]
    assert len(np.unique(left[left > 0])) == 1
    assert len(np.unique(right[right > 0])) == 1
