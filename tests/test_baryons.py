"""Baryon phase-space association tests."""

import numpy as np
import pytest

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


@pytest.mark.slow
def test_pipeline_multitype_end_to_end(tmp_path):
    """Gas+DM+star mock through the full pipeline with Baryon_searchflag=1:
    baryons associated in phase space, combined unbinding, per-type
    properties (reference main.cxx:397 SearchBaryons integration +
    GetProperties GASON/STARON blocks)."""
    import math

    from velociraptor_stf_tpu.models.pipeline import find_structures

    rng = np.random.default_rng(7)
    boxsize = 10.0
    G = 43.0211349
    halos = [(np.array([3.0, 3, 3]), 4000), (np.array([7.0, 7, 7]), 2500)]
    pp, vv, tt, uu = [], [], [], []
    for c, n in halos:
        Rh = 0.25
        # DM
        r = Rh * rng.random(n) ** (1 / 3)
        d = rng.normal(size=(n, 3))
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        sig = math.sqrt(G * n / Rh) * 0.25
        pp.append(c + d * r[:, None])
        vv.append(rng.normal(0, sig, (n, 3)))
        tt.append(np.full(n, 1, np.int8))
        uu.append(np.zeros(n))
        # gas: same region, slightly tighter
        ng = n // 4
        r = 0.8 * Rh * rng.random(ng) ** (1 / 3)
        d = rng.normal(size=(ng, 3))
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        pp.append(c + d * r[:, None])
        vv.append(rng.normal(0, sig * 0.8, (ng, 3)))
        tt.append(np.full(ng, 0, np.int8))
        uu.append(np.full(ng, 100.0))
        # stars
        ns = n // 8
        r = 0.5 * Rh * rng.random(ns) ** (1 / 3)
        d = rng.normal(size=(ns, 3))
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        pp.append(c + d * r[:, None])
        vv.append(rng.normal(0, sig * 0.8, (ns, 3)))
        tt.append(np.full(ns, 4, np.int8))
        uu.append(np.zeros(ns))
    nbg = 20000
    pp.append(rng.random((nbg, 3)) * boxsize)
    vv.append(rng.normal(0, 500.0, (nbg, 3)))
    tt.append(np.full(nbg, 1, np.int8))
    uu.append(np.zeros(nbg))
    pos = np.concatenate(pp).astype(np.float32)
    vel = np.concatenate(vv).astype(np.float32)
    ptype = np.concatenate(tt)
    u = np.concatenate(uu).astype(np.float32)
    mass = np.ones(len(pos), np.float32)

    opt = C.Options()
    opt.ellphys = 0.2
    opt.ellxscale = boxsize / len(pos) ** (1 / 3)
    opt.fofbgtype = C.FOF3D
    opt.MinSize = 32
    opt.uinfo.unbindflag = 1
    opt.uinfo.Eratio = 1.0
    opt.G = G
    opt.iSubSearch = 0
    opt.iBaryonSearch = 1
    opt.partsearchtype = C.PSTALL
    opt.icosmologicalin = 0
    C.config_check(opt)
    res = find_structures(opt, pos, vel, mass, boxsize=boxsize,
                          ptype=ptype, extras={"u": u})
    assert res.ngroups >= 2
    # per-type properties present and group 1 (largest) has gas + stars
    assert "n_gas" in res.props and "n_star" in res.props
    assert res.props["n_gas"][1] > 0
    assert res.props["n_star"][1] > 0
    assert res.props["M_gas"][1] > 0
    assert res.props["Temp_mean_gas"][1] > 0
    # gas fraction roughly the planted 1/4 of DM count (same masses)
    frac = res.props["n_gas"][1] / max(res.props["num"][1], 1)
    assert 0.1 < frac < 0.35
    # baryons actually got group ids
    b = ptype != 1
    assert (res.pfof[b] > 0).sum() > 0.5 * (ptype == 0).sum()


def test_pertype_full_property_blocks():
    """Full per-type blocks (reference allvars.h:1322-1528): gas_sf/gas_nsf
    SFR split, per-type shapes/Krot/dispersion tensors, SO-scoped masses
    and angular momenta, interloper counts."""
    import math

    import jax.numpy as jnp

    from velociraptor_stf_tpu.models import properties as P

    rng = np.random.default_rng(11)
    n = 3000
    G = 43.0211349
    Rh = 0.3
    r = Rh * rng.random(n) ** (1 / 3)
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    pos = (d * r[:, None]).astype(np.float32)
    sig = math.sqrt(G * n / Rh) * 0.25
    vel = rng.normal(0, sig, (n, 3)).astype(np.float32)
    mass = np.ones(n, np.float32)
    ptype = np.ones(n, np.int8)
    ptype[:600] = 0            # gas
    ptype[600:900] = 4         # stars
    ptype[900:950] = 5         # BH
    ptype[950:1000] = 2        # low-res interloper
    sfr = np.zeros(n, np.float32)
    sfr[:300] = 1.0            # half the gas is star-forming
    u = np.full(n, 50.0, np.float32)
    zmet = np.full(n, 0.02, np.float32)
    bhmdot = np.full(n, 0.1, np.float32)
    pfof = np.ones(n, np.int32)
    rad = np.full(2, Rh, np.float32)

    out = P.compute_pertype_properties(
        jnp.asarray(pos), jnp.asarray(vel), jnp.asarray(mass),
        jnp.asarray(ptype), jnp.asarray(pfof), 1,
        refpos=jnp.zeros((2, 3)), refvel=jnp.zeros((2, 3)),
        u=jnp.asarray(u), sfr=jnp.asarray(sfr), zmet=jnp.asarray(zmet),
        tage=None, bhmdot=jnp.asarray(bhmdot),
        rvmax=jnp.asarray(rad), r200c=jnp.asarray(rad),
        r200m=jnp.asarray(rad), r500c=jnp.asarray(0.5 * rad),
        rBN98=None, r30=0.1, r50=0.2)
    out = {k: np.asarray(v) for k, v in out.items()}
    assert out["n_gas"][1] == 600
    assert out["n_gas_sf"][1] == 300
    assert out["n_gas_nsf"][1] == 300
    assert out["M_gas_sf"][1] + out["M_gas_nsf"][1] == out["M_gas"][1]
    assert out["SFR_gas"][1] == 300.0
    assert out["n_star"][1] == 300
    assert out["n_bh"][1] == 50
    assert out["n_interloper"][1] == 50
    assert out["M_interloper"][1] == 50.0
    assert abs(out["acc_bh"][1] - 5.0) < 1e-4
    # shapes / Krot / dispersion tensors exist and are sane
    assert 0.7 < out["q_gas"][1] <= 1.001       # isotropic mock
    assert 0.7 < out["s_star"][1] <= 1.001
    assert 0.0 <= out["Krot_gas"][1] < 0.9
    assert out["veldisp_gas"][1].shape == (3, 3)
    assert out["veldisp_gas"][1][0, 0] > 0
    # SO-scoped: all gas inside r200c sphere (radius Rh covers everything)
    assert out["M_200crit_gas"][1] == out["M_gas"][1]
    assert out["M_500c_gas"][1] < out["M_gas"][1]   # half radius cuts some
    assert out["L_200crit_gas"][1].shape == (3,)
    # fixed apertures nest
    assert out["M_gas_30kpc"][1] <= out["M_gas_50kpc"][1]
    assert out["MassTwiceRhalfmass_gas"][1] >= 0.5 * out["M_gas"][1]


def test_symmetric_edge_build_matches_directed():
    """The half-stencil symmetric edge build + both-orientation metric
    pass must reproduce the directed-table assignment exactly."""
    import dataclasses

    import jax.numpy as jnp
    from velociraptor_stf_tpu.models import baryons as B
    from velociraptor_stf_tpu.ops import fof

    rng = np.random.default_rng(13)
    boxsize = 10.0
    nd, nb = 3000, 800
    pos_dm = rng.uniform(0, boxsize, (nd, 3)).astype(np.float32)
    vel_dm = rng.normal(0, 50, (nd, 3)).astype(np.float32)
    pfof_dm = (rng.integers(0, 4, nd)).astype(np.int32)
    pos_b = rng.uniform(0, boxsize, (nb, 3)).astype(np.float32)
    vel_b = rng.normal(0, 50, (nb, 3)).astype(np.float32)

    ellx, ellv2 = 0.4, 2500.0
    metric = B.PhaseMetric(float(ellx * ellx), ellv2)
    pos = jnp.concatenate([jnp.asarray(pos_dm), jnp.asarray(pos_b)])
    vel = jnp.concatenate([jnp.asarray(vel_dm), jnp.asarray(vel_b)])
    isb = jnp.concatenate([jnp.zeros(nd, jnp.int32),
                           jnp.ones(nb, jnp.int32)])
    groups = jnp.concatenate([jnp.asarray(pfof_dm), jnp.zeros(nb, jnp.int32)])

    @dataclasses.dataclass(frozen=True)
    class DirectedElig:
        metric: object

        def __call__(self, d2, own, nbr):
            return self.metric(d2, own, nbr)[1]

    out = {}
    for tag, pred, half in (
            ("sym", B._PairInRange(float(ellx * ellx), ellv2), None),
            ("dir", DirectedElig(metric), False)):
        edges, _, grid = fof.build_edges(
            pos, ellx, boxsize=boxsize,
            fields={"vel": vel, "isb": isb}, predicate=pred, half=half)
        erow, ecol = edges.erow, edges.ecol
        if edges.undirected:
            erow, ecol = (jnp.concatenate([erow, ecol]),
                          jnp.concatenate([ecol, erow]))
        gs = groups[edges.order]
        grp_s, _ = fof.nearest_assign_edges(gs, edges.pos_s,
                                            edges.fields_s, erow, ecol,
                                            grid, metric)
        grp_s = jnp.where(edges.fields_s["isb"] > 0, grp_s, gs)
        out[tag] = np.zeros(nd + nb, np.int32)
        out[tag][np.asarray(edges.order)] = np.asarray(grp_s)
    assert np.array_equal(out["sym"], out["dir"])
    assert (out["sym"][nd:] > 0).any()   # some baryons actually assigned
