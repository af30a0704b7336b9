"""Pallas kernel logic on CPU via the TPU interpreter.

The real-TPU parity tests (tests/test_pallas_fof.py) skip off-TPU, which
left the Pallas kernels untested whenever only the CPU suite runs.  The
TPU interpret mode executes the same kernels (manual DMA, semaphores,
SMEM windows) in simulation, so kernel *logic* — block-range candidate
supersets, ghost folds, in-kernel transposes, the label fixed point — is
pinned here against the XLA edge pipeline.  Mosaic lowering and
performance remain TPU-only concerns.

Reference semantics under test: KDTree::FOF 3D + per-group 6D phase FOF
(/root/reference/src/search.cxx:110,552-576) and the direct-sum potential
of the unbinding step (/root/reference/src/unbind.cxx:196).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from velociraptor_stf_tpu.io.synthetic import make_cosmo_mock
from velociraptor_stf_tpu.models import halos
from velociraptor_stf_tpu.utils import config as C

pytestmark = pytest.mark.slow  # interpret mode is minutes-scale


def _opts(boxsize, n):
    opt = C.Options()
    opt.ellphys = 0.2
    opt.ellxscale = boxsize / n ** (1 / 3)
    opt.fofbgtype = C.FOF6D
    opt.MinSize = 20
    opt.HaloMinSize = 32
    C.config_check(opt)
    return opt


def test_interpret_fof_pipeline_matches_xla(monkeypatch):
    n = 1 << 14   # pallas_fof_available's minimum
    boxsize = 25.0
    pos, vel, mass = make_cosmo_mock(n, boxsize=boxsize, nhalos=6, seed=7)
    pos, vel, mass = map(jnp.asarray, (pos, vel, mass))
    opt = _opts(boxsize, n)

    monkeypatch.setenv("VR_FOF_PALLAS", "0")
    r0 = halos.search_full_set(opt, pos, vel, mass, boxsize=boxsize)
    a = np.asarray(jax.device_get(r0.pfof))

    monkeypatch.setenv("VR_FOF_PALLAS", "1")
    with pltpu.force_tpu_interpret_mode():
        r1 = halos.search_full_set(opt, pos, vel, mass, boxsize=boxsize)
        b = np.asarray(jax.device_get(r1.pfof))
    assert r0.ngroups == r1.ngroups
    assert np.array_equal(a, b)


def test_interpret_potential_matches_xla(monkeypatch):
    from velociraptor_stf_tpu.models import unbind as ub
    from velociraptor_stf_tpu.ops import segments as seg

    n = 1 << 14
    boxsize = 25.0
    pos, vel, mass = make_cosmo_mock(n, boxsize=boxsize, nhalos=6, seed=7)
    pos, vel, mass = map(jnp.asarray, (pos, vel, mass))
    opt = _opts(boxsize, n)
    opt.uinfo.unbindflag = 1
    opt.G = 43.0211349

    monkeypatch.setenv("VR_FOF_PALLAS", "0")
    r = halos.search_full_set(opt, pos, vel, mass, boxsize=boxsize)
    assert r.ngroups > 0

    tag = r.pfof > 0
    ntag = int(jax.device_get(jnp.sum(tag)))
    tpad = 1024
    while tpad < ntag:
        tpad *= 2
    sub_idx, svalid, _ = seg.compact_mask(tag, tpad)
    pos_t = pos[sub_idx]
    pfof_t = jnp.where(svalid, r.pfof[sub_idx], 0)
    mass_tv = jnp.where(svalid, mass[sub_idx], 0.0)

    monkeypatch.setenv("VR_POT_PALLAS", "0")
    W0 = np.asarray(jax.device_get(ub.compute_potential(
        pos_t, mass_tv, pfof_t, r.ngroups, opt.uinfo.eps, opt.G,
        boxsize=boxsize)))
    monkeypatch.setenv("VR_POT_PALLAS", "1")
    with pltpu.force_tpu_interpret_mode():
        W1 = np.asarray(jax.device_get(ub.compute_potential(
            pos_t, mass_tv, pfof_t, r.ngroups, opt.uinfo.eps, opt.G,
            boxsize=boxsize)))
    nz = np.abs(W0) > 0
    rel = np.abs(W0 - W1)[nz] / np.maximum(np.abs(W0[nz]), 1e-20)
    assert rel.max() < 1e-4


def test_interpret_fof_clustered_dense(monkeypatch):
    """Heavily-clustered box: dense cells stress the per-dy window split
    (blocks inside halos must still see every 9-cell-stencil candidate;
    blocks spanning multiple y-rows exercise the overlapping-window
    case).  Guards the window decomposition against exactly the geometry
    the uniform mock underrepresents."""
    rng = np.random.default_rng(3)
    boxsize = 20.0
    # one huge tight clump (fills single cells), a smaller one near the
    # periodic corner, and sparse background spanning many empty cells
    clump1 = rng.normal([4.0, 4.0, 4.0], 0.05, (9000, 3))
    clump2 = rng.normal([0.1, 19.9, 0.1], 0.08, (4000, 3)) % boxsize
    bg = rng.uniform(0, boxsize, (3500, 3))
    pos = jnp.asarray(np.vstack([clump1, clump2, bg]).astype(np.float32))
    n = pos.shape[0]
    vel = jnp.asarray(rng.normal(0, 30, (n, 3)).astype(np.float32))
    mass = jnp.ones(n, jnp.float32)
    opt = _opts(boxsize, n)

    monkeypatch.setenv("VR_FOF_PALLAS", "0")
    r0 = halos.search_full_set(opt, pos, vel, mass, boxsize=boxsize)
    a = np.asarray(jax.device_get(r0.pfof))

    monkeypatch.setenv("VR_FOF_PALLAS", "1")
    with pltpu.force_tpu_interpret_mode():
        r1 = halos.search_full_set(opt, pos, vel, mass, boxsize=boxsize)
        b = np.asarray(jax.device_get(r1.pfof))
    assert r0.ngroups == r1.ngroups
    assert np.array_equal(a, b)


def test_interpret_linked_mask_exact():
    """Prune exactness on sparse geometry: isolated particles (no
    neighbour within the linking length) must NOT be kept.  Guards the
    chunk-disjoint window decomposition — overlapping windows scanned
    self twice and kept the whole box at 512^3."""
    from velociraptor_stf_tpu.ops import pallas_fof

    rng = np.random.default_rng(5)
    boxsize = 40.0
    ll = 0.25
    # pairs closer than ll (linked) + singles far from everything
    npair = 300
    base = rng.uniform(2, boxsize - 2, (npair, 3))
    partner = base + rng.normal(0, ll / 4, (npair, 3))
    # grid of isolated singles, > 2*ll apart from everything
    gx = np.arange(1, 39, 2.0)
    singles = np.stack(np.meshgrid(gx, gx, [20.0]), -1).reshape(-1, 3)
    singles = singles + rng.uniform(0.3, 0.6, singles.shape)
    pos = np.vstack([base, partner, singles]).astype(np.float32)
    # pad to pallas minimum with a far-away blob of linked pairs
    need = (1 << 14) - len(pos)
    blob = rng.normal([30.0, 30.0, 35.0], 0.05, (need, 3)).astype(
        np.float32)
    pos = np.vstack([pos, blob])
    n = len(pos)
    vel = np.zeros((n, 3), np.float32)

    with pltpu.force_tpu_interpret_mode():
        pf = pallas_fof.PallasFof(jnp.asarray(pos), jnp.asarray(vel),
                                  boxsize, ll)
        keep, nkeep = pf.linked_mask(ll)
    keep = np.asarray(jax.device_get(keep))
    # brute-force truth
    from scipy.spatial import cKDTree
    t = cKDTree(pos, boxsize=boxsize)
    pairs = t.query_pairs(ll, output_type="ndarray")
    truth = np.zeros(n, bool)
    truth[pairs.ravel()] = True
    assert np.array_equal(keep, truth)
