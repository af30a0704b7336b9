"""Halo-core search tests: two merging cores in one halo."""

import numpy as np
import pytest

import jax.numpy as jnp

from velociraptor_stf_tpu.models import substructure as S
from velociraptor_stf_tpu.utils import config as C

G = 43.0211349


def merger_mock(seed=0, n1=4000, n2=2000, sep=0.6, vsep=1.2):
    """Two overlapping Maxwellian cores (a merger remnant)."""
    rng = np.random.default_rng(seed)
    sigma = np.sqrt(G * 100.0 / 6)
    pos1 = rng.normal(0, 0.25, (n1, 3))
    vel1 = rng.normal(0, sigma, (n1, 3))
    pos2 = np.array([sep, 0, 0]) + rng.normal(0, 0.12, (n2, 3))
    vel2 = np.array([0, vsep * sigma, 0]) + rng.normal(0, 0.5 * sigma,
                                                       (n2, 3))
    pos = np.concatenate([pos1, pos2]).astype(np.float32)
    vel = np.concatenate([vel1, vel2]).astype(np.float32)
    mass = np.full(len(pos), 100.0 / len(pos), np.float32)
    member2 = np.zeros(len(pos), bool)
    member2[n1:] = True
    return pos, vel, mass, member2


@pytest.mark.slow
def test_core_search_finds_second_core():
    pos, vel, mass, member2 = merger_mock()
    opt = C.Options()
    opt.ellphys, opt.ellxscale = 0.2, 0.5
    opt.iHaloCoreSearch = 2
    opt.halocorexfac = 0.7        # sample config values
    opt.halocorevfac = 2.0
    opt.halocorenfac = 0.005
    opt.halocorenumloops = 8
    opt.halocorexfaciter = 0.75
    opt.halocorevfaciter = 1.0
    opt.halocorenumfaciter = 1.2
    opt.MinSize = 20
    valid = np.ones(len(pos), bool)
    core, ncores = S.halo_core_search(opt, pos, vel, mass, valid,
                                      np.zeros(len(pos), np.int32))
    assert ncores >= 2
    core = np.asarray(core)
    # with phase-tensor growth every particle is assigned to a core
    assert (core[valid] > 0).all()
    # the partition separates the planted nucleus: some core holds most of
    # member2 and is dominated by it (which numbered core is "main" depends
    # on which nucleus survives the shrinking loop, as in the reference)
    best_overlap, best_purity = 0, 0.0
    for c in range(1, ncores + 1):
        sel = core == c
        if sel.sum() == 0:
            continue
        ov = (sel & member2).sum()
        if ov > best_overlap:
            best_overlap = ov
            best_purity = ov / sel.sum()
    assert best_overlap > 0.6 * member2.sum()
    assert best_purity > 0.6


def test_core_search_single_core_null():
    """A relaxed single-component halo yields no extra cores."""
    rng = np.random.default_rng(3)
    n = 5000
    sigma = np.sqrt(G * 100.0 / 6)
    pos = rng.normal(0, 0.25, (n, 3)).astype(np.float32)
    vel = rng.normal(0, sigma, (n, 3)).astype(np.float32)
    mass = np.full(n, 100.0 / n, np.float32)
    opt = C.Options()
    opt.ellphys, opt.ellxscale = 0.2, 0.5
    opt.iHaloCoreSearch = 2
    opt.halocorenumloops = 8
    opt.halocorexfaciter = 0.75
    opt.halocorenumfaciter = 1.2
    opt.MinSize = 20
    core, ncores = S.halo_core_search(opt, pos, vel, mass,
                                      np.ones(n, bool),
                                      np.zeros(n, np.int32))
    assert ncores < 2
