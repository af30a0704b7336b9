"""Substructure / core merging tests.

Reference semantics: MergeGroups fmerge link-merging (search.cxx:3894),
MergeSubstructuresCoresPhase (search.cxx:2146), MergeSubstructuresPhase
(search.cxx:2289).
"""

import math

import numpy as np
import pytest

from velociraptor_stf_tpu.models import substructure as S
from velociraptor_stf_tpu.utils import config as C


def _two_fragments(rng, n_each=300, sep=0.08, spacing=0.02):
    """Two compact clumps close enough that relaxed links span them."""
    c1 = np.zeros(3)
    c2 = np.array([sep, 0.0, 0.0])
    p1 = c1 + rng.normal(0, spacing, (n_each, 3))
    p2 = c2 + rng.normal(0, spacing, (n_each, 3))
    pos = np.concatenate([p1, p2]).astype(np.float32)
    # coherent common stream velocity -> stream criterion passes
    vel = np.tile(np.array([100.0, 0, 0], np.float32), (2 * n_each, 1))
    vel += rng.normal(0, 1.0, vel.shape).astype(np.float32)
    return pos, vel


def test_merge_linked_groups_joins_connected_fragments():
    rng = np.random.default_rng(0)
    opt = C.Options()
    opt.ellxscale = 1.0
    opt.ellphys = 0.05       # linking length 0.05: spans the 0.08 gap edges
    opt.Vratio = 1.25
    opt.thetaopen = 0.05
    opt.ellthreshold = 1.0
    opt.vfac = 1.0
    opt.thetafac = 1.0
    opt.ellfac = 0.8
    opt.fmerge = 0.25
    pos, vel = _two_fragments(rng)
    n = len(pos)
    ell = np.full(n, 2.0, np.float32)   # all outliers
    pfof = np.concatenate([np.full(300, 1), np.full(300, 2)]).astype(np.int32)
    out, ng = S.merge_linked_groups(pos, vel, ell, pfof, 2, opt)
    out = np.asarray(out)
    assert (out == out[0]).all()        # one merged group


def test_merge_linked_groups_keeps_disconnected():
    rng = np.random.default_rng(1)
    opt = C.Options()
    opt.ellxscale = 1.0
    opt.ellphys = 0.05
    opt.ellthreshold = 1.0
    opt.ellfac = 0.8
    opt.fmerge = 0.25
    pos, vel = _two_fragments(rng, sep=5.0)   # far apart: no cross links
    ell = np.full(len(pos), 2.0, np.float32)
    pfof = np.concatenate([np.full(300, 1), np.full(300, 2)]).astype(np.int32)
    out, ng = S.merge_linked_groups(pos, vel, ell, pfof, 2, opt)
    out = np.asarray(out)
    assert len(np.unique(out)) == 2


def test_core_sub_phase_merge():
    """A core phase-overlapping a substructure is absorbed; a distant core
    survives and is renumbered contiguously."""
    rng = np.random.default_rng(2)
    n = 400
    # sub 1 at origin; core at same phase position (overlap); core far away
    sub = rng.normal(0, 0.05, (n, 3))
    core_near = rng.normal(0, 0.05, (n, 3))
    core_far = np.array([3.0, 0, 0]) + rng.normal(0, 0.05, (n, 3))
    pos = np.concatenate([sub, core_near, core_far]).astype(np.float32)
    vel = rng.normal(0, 10.0, pos.shape).astype(np.float32)
    vel[2 * n:] += 500.0                        # far core distinct in vel too
    mass = np.ones(len(pos), np.float32)
    pfof = np.concatenate([np.full(n, 1), np.full(n, 2),
                           np.full(n, 3)]).astype(np.int32)
    out, nkept = S.merge_substructures_cores_phase(
        pos, vel, mass, pfof, numsubs=1, numcores=2, fdist=2.0)
    assert nkept == 1
    # near core joined sub 1; far core renumbered to 2
    assert (out[n:2 * n] == 1).all()
    assert (out[2 * n:] == 2).all()


def test_subs_phase_merge():
    rng = np.random.default_rng(3)
    n = 400
    a = rng.normal(0, 0.05, (n, 3))
    b = rng.normal(0, 0.05, (n, 3))           # same phase region as a
    c = np.array([5.0, 0, 0]) + rng.normal(0, 0.05, (n, 3))
    pos = np.concatenate([a, b, c]).astype(np.float32)
    vel = rng.normal(0, 10.0, pos.shape).astype(np.float32)
    mass = np.ones(len(pos), np.float32)
    pfof = np.concatenate([np.full(n, 1), np.full(n, 2),
                           np.full(n, 3)]).astype(np.int32)
    out, ns, nc = S.merge_substructures_phase(pos, vel, mass, pfof,
                                              numsubs=3, numcores=0,
                                              fdist=2.0)
    assert ns == 2 and nc == 0
    assert (out[:n] == out[n:2 * n]).all()
    assert out[2 * n] != out[0]


def test_pair_counts_sparse_matches_dense():
    from velociraptor_stf_tpu.ops import segments as seg
    rng = np.random.default_rng(3)
    ng = 57
    m = 5000
    gi = rng.integers(0, ng + 1, m).astype(np.int32)
    gj = rng.integers(0, ng + 1, m).astype(np.int32)
    mask = (gi > 0) & (gj > 0) & (gi != gj) & (rng.random(m) < 0.7)
    pi, pj, counts = seg.pair_counts_sparse(gi, gj, mask)
    dense = np.zeros((ng + 1, ng + 1), np.int64)
    np.add.at(dense, (gi[mask], gj[mask]), 1)
    sparse = np.zeros_like(dense)
    sparse[pi, pj] = counts
    assert np.array_equal(dense, sparse)
    # lexicographic pair order (the merge loop relies on it)
    key = pi.astype(np.int64) * (ng + 2) + pj
    assert np.all(np.diff(key) > 0)


def test_subs_phase_merge_many_groups_fast():
    """10^4-group phase merge completes quickly (vectorised inner scan)."""
    import time

    rng = np.random.default_rng(4)
    nsub = 8000
    npart = 3 * nsub
    pfof = np.repeat(np.arange(1, nsub + 1), 3).astype(np.int32)
    centres = rng.uniform(0, 1000.0, (nsub, 3))
    pos = (centres[pfof - 1] + rng.normal(0, 0.01, (npart, 3))).astype(
        np.float32)
    vel = rng.normal(0, 50.0, (npart, 3)).astype(np.float32)
    mass = np.ones(npart, np.float32)
    t0 = time.time()
    out, ns2, nc2 = S.merge_substructures_phase(
        pos, vel, mass, pfof, nsub, 0, fdist=2.0)
    dt = time.time() - t0
    assert ns2 <= nsub and nc2 == 0
    assert dt < 30.0  # O(ng^2) Python loops would take minutes
