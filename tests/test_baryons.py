"""Baryon phase-space association tests."""

import numpy as np

import jax.numpy as jnp

from velociraptor_stf_tpu.models import baryons as B
from velociraptor_stf_tpu.utils import config as C


def test_baryons_assigned_to_nearest_halo():
    rng = np.random.default_rng(0)
    # two DM halos + baryons sprinkled in each + far-away baryons
    n1, n2 = 2000, 1500
    c1, c2 = np.array([2.0, 2, 2]), np.array([8.0, 8, 8])
    pos_dm = np.concatenate([
        c1 + rng.normal(0, 0.1, (n1, 3)),
        c2 + rng.normal(0, 0.1, (n2, 3))]).astype(np.float32)
    vel_dm = np.concatenate([
        rng.normal(0, 50, (n1, 3)),
        np.array([300.0, 0, 0]) + rng.normal(0, 50, (n2, 3))
    ]).astype(np.float32)
    pfof_dm = np.concatenate([np.ones(n1, np.int32),
                              np.full(n2, 2, np.int32)])
    nb = 600
    pos_b = np.concatenate([
        c1 + rng.normal(0, 0.1, (nb // 3, 3)),
        c2 + rng.normal(0, 0.1, (nb // 3, 3)),
        rng.uniform(4, 6, (nb // 3, 3)),       # far from both
    ]).astype(np.float32)
    vel_b = np.concatenate([
        rng.normal(0, 50, (nb // 3, 3)),
        np.array([300.0, 0, 0]) + rng.normal(0, 50, (nb // 3, 3)),
        rng.normal(0, 50, (nb // 3, 3)),
    ]).astype(np.float32)

    opt = C.Options()
    opt.ellphys, opt.ellxscale, opt.ellhalophysfac = 0.2, 0.25, 1.0
    gid = np.asarray(B.search_baryons(opt, pos_dm, vel_dm, pfof_dm,
                                      pos_b, vel_b))
    third = nb // 3
    assert (gid[:third] == 1).mean() > 0.85
    assert (gid[third:2 * third] == 2).mean() > 0.85
    assert (gid[2 * third:] == 0).all()


def test_baryon_kinematic_discrimination():
    """A baryon spatially between halos goes with the kinematically
    matching one."""
    rng = np.random.default_rng(1)
    n = 1000
    c = np.array([5.0, 5, 5])
    # two overlapping DM groups with distinct bulk velocities
    pos_dm = np.concatenate([c + rng.normal(0, 0.05, (n, 3)),
                             c + rng.normal(0, 0.05, (n, 3))]).astype(np.float32)
    vel_dm = np.concatenate([rng.normal(0, 20, (n, 3)),
                             np.array([400.0, 0, 0]) +
                             rng.normal(0, 20, (n, 3))]).astype(np.float32)
    pfof_dm = np.concatenate([np.ones(n, np.int32),
                              np.full(n, 2, np.int32)])
    pos_b = (c + rng.normal(0, 0.05, (100, 3))).astype(np.float32)
    vel_b = (np.array([400.0, 0, 0]) +
             rng.normal(0, 20, (100, 3))).astype(np.float32)
    opt = C.Options()
    opt.ellphys, opt.ellxscale = 0.2, 0.25
    gid = np.asarray(B.search_baryons(opt, pos_dm, vel_dm, pfof_dm,
                                      pos_b, vel_b))
    assert (gid == 2).mean() > 0.9
