"""Property-engine tests against analytic distributions.

SURVEY.md §4 implication (b): property-level unit tests with analytic
oracles (SO masses of uniform spheres, dispersion of Gaussian blobs, etc.).
"""

import numpy as np
import pytest

from velociraptor_stf_tpu.models import properties as P

G = 43.0211349


def uniform_sphere(n, R, centre, rng):
    r = R * rng.uniform(size=n) ** (1 / 3)
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return centre + r[:, None] * d


@pytest.mark.slow
def test_cm_mass_and_size():
    rng = np.random.default_rng(0)
    n = 5000
    centre = np.array([5.0, 6.0, 7.0])
    pos = uniform_sphere(n, 1.0, centre, rng).astype(np.float32)
    vel = rng.normal(100, 30, (n, 3)).astype(np.float32)
    mass = np.full(n, 2.0, np.float32)
    pfof = np.ones(n, np.int32)
    pr = P.compute_properties(pos, vel, mass, pfof, num_groups=1, G=G,
                              rhocrit=1e-9, rhobg=1e-9)
    assert np.allclose(np.asarray(pr["gcm"])[1], centre, atol=0.02)
    assert np.asarray(pr["gmass"])[1] == pytest.approx(2.0 * n, rel=1e-3)
    assert np.asarray(pr["num"])[1] == n
    assert np.asarray(pr["gsize"])[1] == pytest.approx(1.0, abs=0.01)
    assert np.allclose(np.asarray(pr["gcmvel"])[1], [100, 100, 100], atol=2)


def test_so_masses_uniform_sphere():
    """Uniform sphere of density rho0: enclosed density is rho0 at every
    radius, so R_Delta satisfies Delta*rhocrit = rho0 exactly at r=R."""
    rng = np.random.default_rng(1)
    n = 20000
    R = 1.0
    mtot = 100.0
    rho0 = mtot / (4 / 3 * np.pi * R ** 3)
    pos = uniform_sphere(n, R, np.zeros(3), rng).astype(np.float32)
    vel = np.zeros((n, 3), np.float32)
    mass = np.full(n, mtot / n, np.float32)
    pfof = np.ones(n, np.int32)
    # choose rhocrit so that 200*rhocrit = rho0 * 8 => R200c = R/2
    # (uniform sphere: M(<r) ~ r^3, rho_enc = rho0 for all r; enclosed
    # density threshold crossing: rho0 >= 200 rhocrit everywhere inside
    # => falls to rho0 < thr only outside R -> fallback = total mass.)
    # Use thresholds below rho0 => fallback to gmass/gsize per reference.
    pr = P.compute_properties(pos, vel, mass, pfof, num_groups=1, G=G,
                              rhocrit=rho0 / 400, rhobg=rho0 / 400,
                              virlevel=200.0, virBN98=200.0)
    # enclosed density never drops below 200*(rho0/400)=rho0/2 inside the
    # sphere => not found => fallback to total mass and size
    assert np.asarray(pr["gM200c"])[1] == pytest.approx(mtot, rel=1e-3)
    assert np.asarray(pr["gR200c"])[1] == pytest.approx(R, abs=0.01)
    # with rhocrit chosen so 200*rhocrit = 4*rho0, threshold is crossed
    # at the radius enclosing mean density 4 rho0 -- for a uniform sphere
    # that's immediately at small r... instead compare against a direct
    # numerical oracle below.


@pytest.mark.slow
def test_so_masses_powerlaw_oracle():
    """rho ~ r^-2 profile: M(<r) ~ r, rho_enc(r) = 3M/(4 pi r^3) ~ r^-2.
    Crossing radius for threshold D*rhoc: analytic."""
    rng = np.random.default_rng(2)
    n = 30000
    Rout = 2.0
    # M(<r) = mtot * r / Rout  (rho ~ r^-2)
    mtot = 50.0
    r = Rout * rng.uniform(size=n)
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    pos = (r[:, None] * d).astype(np.float32)
    vel = np.zeros((n, 3), np.float32)
    mass = np.full(n, mtot / n, np.float32)
    pfof = np.ones(n, np.int32)
    rhocrit = 1.0
    # rho_enc(r) = 3 mtot/(4 pi Rout r^2) = 200 rhocrit
    r200 = np.sqrt(3 * mtot / (4 * np.pi * Rout * 200 * rhocrit))
    m200 = mtot * r200 / Rout
    assert r200 < Rout  # threshold crossed inside the distribution
    pr = P.compute_properties(pos, vel, mass, pfof, num_groups=1, G=G,
                              rhocrit=rhocrit, rhobg=rhocrit,
                              virlevel=200.0, virBN98=200.0)
    assert np.asarray(pr["gR200c"])[1] == pytest.approx(r200, rel=0.02)
    assert np.asarray(pr["gM200c"])[1] == pytest.approx(m200, rel=0.03)


def test_vmax_powerlaw():
    """For M(<r) = mtot r/Rout, vc^2 = G mtot/Rout = const: Vmax is the
    plateau value."""
    rng = np.random.default_rng(3)
    n = 20000
    Rout, mtot = 2.0, 50.0
    r = Rout * rng.uniform(size=n)
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    pos = (r[:, None] * d).astype(np.float32)
    vel = np.zeros((n, 3), np.float32)
    mass = np.full(n, mtot / n, np.float32)
    pfof = np.ones(n, np.int32)
    pr = P.compute_properties(pos, vel, mass, pfof, num_groups=1, G=G,
                              rhocrit=1e-9, rhobg=1e-9)
    vexp = np.sqrt(G * mtot / Rout)
    # vc(r) is a flat noisy plateau: taking its max is positively biased by
    # Poisson noise at the smallest eligible radius (same in the reference,
    # which applies the identical EncMass >= gmass/sqrt(n) guard)
    assert np.asarray(pr["gmaxvel"])[1] == pytest.approx(vexp, rel=0.08)


def test_velocity_dispersion_and_J():
    rng = np.random.default_rng(4)
    n = 30000
    pos = uniform_sphere(n, 1.0, np.zeros(3), rng).astype(np.float32)
    sig = np.array([50.0, 80.0, 120.0])
    vel = (rng.normal(0, 1, (n, 3)) * sig).astype(np.float32)
    mass = np.ones(n, np.float32)
    pfof = np.ones(n, np.int32)
    pr = P.compute_properties(pos, vel, mass, pfof, num_groups=1, G=G,
                              rhocrit=1e-9, rhobg=1e-9)
    vd = np.asarray(pr["gveldisp"])[1]
    assert np.allclose(np.sqrt(np.diag(vd)), sig, rtol=0.03)
    # sigma_v = |det|^(1/6) (geometric mean of axis dispersions)
    assert np.asarray(pr["gsigma_v"])[1] == pytest.approx(
        np.prod(sig) ** (1 / 3), rel=0.03)
    # isotropic random velocities -> J ~ 0 relative to M*R*sigma
    Jmag = np.linalg.norm(np.asarray(pr["gJ"])[1])
    assert Jmag < 0.05 * n * 1.0 * 120


def test_solid_body_rotation_krot():
    """Solid-body rotation about z: all kinetic energy is rotational."""
    rng = np.random.default_rng(5)
    n = 20000
    pos = uniform_sphere(n, 1.0, np.zeros(3), rng).astype(np.float32)
    omega = 100.0
    vel = np.stack([-omega * pos[:, 1], omega * pos[:, 0],
                    np.zeros(n)], 1).astype(np.float32)
    mass = np.ones(n, np.float32)
    pfof = np.ones(n, np.int32)
    pr = P.compute_properties(pos, vel, mass, pfof, num_groups=1, G=G,
                              rhocrit=1e-9, rhobg=1e-9)
    assert np.asarray(pr["Krot"])[1] == pytest.approx(1.0, abs=0.02)
    J = np.asarray(pr["gJ"])[1]
    assert J[2] > 0 and abs(J[0]) < 0.01 * J[2] and abs(J[1]) < 0.01 * J[2]


def test_shape_triaxial():
    rng = np.random.default_rng(6)
    n = 30000
    axes = np.array([1.0, 0.6, 0.3])
    pos = (rng.normal(0, 1, (n, 3)) * axes).astype(np.float32)
    vel = np.zeros((n, 3), np.float32)
    mass = np.ones(n, np.float32)
    pfof = np.ones(n, np.int32)
    pr = P.compute_properties(pos, vel, mass, pfof, num_groups=1, G=G,
                              rhocrit=1e-9, rhobg=1e-9)
    assert np.asarray(pr["gq"])[1] == pytest.approx(0.6, rel=0.03)
    assert np.asarray(pr["gs"])[1] == pytest.approx(0.3, rel=0.03)


@pytest.mark.slow
def test_multiple_groups_independent():
    """Two disjoint groups must give the same answers as two single-group
    calls (segment reductions don't mix groups)."""
    rng = np.random.default_rng(7)
    n1, n2 = 4000, 6000
    pos1 = uniform_sphere(n1, 0.5, np.zeros(3), rng)
    pos2 = uniform_sphere(n2, 1.5, np.array([30.0, 0, 0]), rng)
    vel1 = rng.normal(0, 50, (n1, 3))
    vel2 = rng.normal(300, 120, (n2, 3))
    pos = np.concatenate([pos1, pos2]).astype(np.float32)
    vel = np.concatenate([vel1, vel2]).astype(np.float32)
    mass = np.concatenate([np.full(n1, 1.0), np.full(n2, 3.0)]).astype(np.float32)
    pfof = np.concatenate([np.full(n1, 2), np.full(n2, 1)]).astype(np.int32)
    pr = P.compute_properties(pos, vel, mass, pfof, num_groups=2, G=G,
                              rhocrit=1e-9, rhobg=1e-9)
    pr1 = P.compute_properties(pos[:n1].copy(), vel[:n1].copy(),
                               mass[:n1].copy(), np.ones(n1, np.int32),
                               num_groups=1, G=G, rhocrit=1e-9, rhobg=1e-9)
    for key in ("gmass", "gsize", "gmaxvel", "gRhalfmass", "gsigma_v"):
        assert np.asarray(pr[key])[2] == pytest.approx(
            np.asarray(pr1[key])[1], rel=1e-4), key
    assert np.allclose(np.asarray(pr["gcm"])[2], np.asarray(pr1["gcm"])[1],
                       atol=1e-4)
