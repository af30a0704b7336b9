"""FOF engine tests against exact host-side oracles."""

import numpy as np
import pytest

from velociraptor_stf_tpu.io.synthetic import (MockSpec, fof_oracle,
                                               labels_match_rate, make_mock)
from velociraptor_stf_tpu.ops import cells, fof


def _canon(labels):
    """Canonicalise a labeling to compare partitions."""
    out = np.empty_like(labels)
    seen = {}
    for i, l in enumerate(labels):
        out[i] = seen.setdefault(l, len(seen))
    return out


def partitions_equal(a, b):
    a, b = np.asarray(a), np.asarray(b)
    return labels_match_rate(a, b) == 1.0 and labels_match_rate(b, a) == 1.0


def test_binning_roundtrip():
    rng = np.random.default_rng(0)
    pos = rng.uniform(0, 1, (5000, 3)).astype(np.float32)
    grid = cells.build_grid(np.zeros(3), np.ones(3), 0.05, periodic=True,
                            boxsize=1.0)
    b = cells.bin_particles(pos, grid)
    order = np.asarray(b.order)
    assert sorted(order.tolist()) == list(range(5000))
    # counts sum to N; every particle's cell slice contains it
    counts = np.asarray(b.cell_count)
    assert counts.sum() == 5000
    cid_sorted = np.asarray(b.cid_sorted)
    assert (np.diff(cid_sorted) >= 0).all()
    start = np.asarray(b.cell_start)
    pcell = np.asarray(b.pcell)
    for i in [0, 17, 4999]:
        c = pcell[i]
        assert start[c] <= i < start[c] + counts[c]


@pytest.mark.parametrize("periodic", [False, True])
def test_fof_matches_oracle_random(periodic):
    """FOF on clustered random points must exactly match scipy oracle."""
    rng = np.random.default_rng(42)
    n = 4000
    # clustered: mixture of uniform + a few tight blobs
    pos = rng.uniform(0, 1, (n, 3))
    for c in rng.uniform(0.2, 0.8, (6, 3)):
        m = rng.integers(0, n, 200)
        pos[m] = c + rng.normal(0, 0.01, (len(m), 3))
    pos = np.mod(pos, 1.0)
    b = 0.02
    pfof, ng = fof.fof3d(pos.astype(np.float32), b,
                         boxsize=1.0 if periodic else None, min_size=1)
    oracle = fof_oracle(pos, b, boxsize=1.0 if periodic else None)
    assert partitions_equal(np.asarray(pfof), oracle)


def test_fof_min_size_and_ordering():
    """Groups numbered 1..ng by decreasing size; small groups -> 0."""
    rng = np.random.default_rng(3)
    # two blobs of different sizes + isolated points
    blob1 = rng.normal(0.3, 0.005, (300, 3))
    blob2 = rng.normal(0.7, 0.005, (100, 3))
    lone = rng.uniform(0, 1, (50, 3))
    pos = np.concatenate([blob2, blob1, lone]).astype(np.float32)
    pfof, ng = fof.fof3d(pos, 0.05, min_size=20)
    pfof = np.asarray(pfof)
    assert int(ng) == 2
    # the bigger blob must be group 1
    assert (pfof[100:400] == 1).all()
    assert (pfof[:100] == 2).all()
    # isolated particles untagged (0) unless they fell into a blob's reach
    assert (pfof[400:] <= 2).all()


def test_fof_long_filament():
    """A long chain tests label-propagation convergence depth."""
    n = 3000
    t = np.linspace(0, 1, n)
    pos = np.stack([t, 0.5 + 0.02 * np.sin(12 * np.pi * t),
                    0.5 * np.ones(n)], 1)
    pos += np.random.default_rng(1).normal(0, 1e-4, pos.shape)
    pos = pos.astype(np.float32)
    step = 1.0 / n
    pfof, ng = fof.fof3d(pos, 3 * step, min_size=1)
    # entire filament is one group
    assert int(ng) >= 1
    assert (np.asarray(pfof) == 1).sum() == n


def test_fof_periodic_wrap():
    """A blob straddling the periodic boundary is one group."""
    rng = np.random.default_rng(7)
    blob = np.mod(rng.normal(0.0, 0.01, (200, 3)), 1.0)  # wraps around 0
    far = rng.uniform(0.3, 0.7, (100, 3))
    pos = np.concatenate([blob, far]).astype(np.float32)
    pfof, ng = fof.fof3d(pos, 0.05, boxsize=1.0, min_size=50)
    pfof = np.asarray(pfof)
    assert (pfof[:200] == 1).all()


def test_fof_mock_planted_halos():
    """Planted-halo mock: FOF recovers memberships at high match rate."""
    spec = MockSpec(npart_background=8000, nhalos=5, particles_per_halo=400,
                    halo_scale_radius=0.002, seed=5)
    pos, vel, mass, truth = make_mock(spec)
    # standard 0.2 * interparticle spacing: far below background percolation,
    # far above the internal separations of the compact planted blobs
    d = spec.boxsize / (len(pos)) ** (1 / 3)
    b = 0.2 * d
    pfof, ng = fof.fof3d(pos.astype(np.float32), b, boxsize=spec.boxsize,
                         min_size=100)
    pfof = np.asarray(pfof)
    assert int(ng) >= spec.nhalos
    halo_members = truth >= 0
    rate = labels_match_rate(truth[halo_members], pfof[halo_members])
    assert rate > 0.99


def test_fof_6d_criterion():
    """6D criterion separates spatially overlapping, kinematically distinct
    streams."""
    rng = np.random.default_rng(11)
    n = 500
    pos = np.tile(rng.uniform(0.4, 0.6, (n, 3)), (2, 1)).astype(np.float32)
    vel = np.concatenate([
        rng.normal(+500, 5, (n, 3)), rng.normal(-500, 5, (n, 3))
    ]).astype(np.float32)
    group = np.ones(2 * n, np.int32)
    pred = fof.make_pred_6d(b2=0.05 ** 2, v2=50.0 ** 2, same_group=True)
    pfof, ng = fof.fof3d(pos, 0.05, min_size=10, vel=vel,
                         extra_fields={"group": group}, predicate=pred)
    pfof = np.asarray(pfof)
    assert int(ng) == 2
    assert len(np.unique(pfof[:n])) == 1
    assert len(np.unique(pfof[n:])) == 1
    assert pfof[0] != pfof[n]


@pytest.mark.slow
def test_slab_edge_builder_matches_dense(monkeypatch):
    """The slab-chunked edge builder (grids beyond packed int32 / dense
    table budget, the 256^3+ path) produces identical FOF groups to the
    dense half-stencil path."""
    from velociraptor_stf_tpu.ops import fof as F

    rng = np.random.default_rng(31)
    n = 20000
    boxsize = 20.0
    # clustered mock with periodic wrap straddlers
    pos = (rng.random((n, 3)) * boxsize).astype(np.float32)
    pos[-3000:] = (np.asarray((0.5, 10.0, 10.0)) +
                   rng.normal(0, 0.3, (3000, 3))) % boxsize
    pos[-5000:-3000] = (np.asarray((19.8, 2.0, 19.9)) +
                        rng.normal(0, 0.3, (2000, 3))) % boxsize
    pos = pos.astype(np.float32)
    b = 0.2 * boxsize / len(pos) ** (1 / 3)

    pf_dense, ng_dense = F.fof3d(pos, b, boxsize=boxsize, min_size=20)
    ng_dense = int(ng_dense)

    # force the slab path (small dense-table budget -> a handful of
    # x-slabs) with small expansion chunks
    monkeypatch.setattr(F, "_DENSE_TABLE_MAX_CELLS", 1 << 20)
    monkeypatch.setattr(F, "_SLAB_T_BUDGET", 1 << 18)
    edges, binning, grid = F.build_edges(pos, b, boxsize=boxsize)
    assert binning is None          # slab path marker
    assert edges.undirected
    labels = F.fof_labels_from_edges(edges.erow, edges.ecol, len(pos),
                                     undirected=True)
    pf_s, ng_s = F.renumber_by_size(labels, 20, orig_index=edges.order)
    pfof_slab = np.zeros(len(pos), np.int32)
    pfof_slab[np.asarray(edges.order)] = np.asarray(pf_s)
    assert int(ng_s) == ng_dense
    assert np.array_equal(pfof_slab, np.asarray(pf_dense))


def test_fixpoint_terminates_only_on_jump_validated_rounds():
    """Regression: the adaptive-jump gating must not accept convergence
    from a hook-stable state that still holds unmerged multi-hop label
    chains.  Counterexample (advisor, round 4): chains 5->4->0 and 3->1
    over symmetric edges (0,4),(4,5),(5,3),(3,1) are hook-stable — each
    slot's parent already holds the min over its neighbours' labels —
    yet path compression yields TWO roots for one connected component.
    A jump round changes the state and must keep the loop running.

    Exercised by driving pallas_fof._fixpoint directly with a mock
    edge-list sweep and an aux carry that marks every chunk CLEAN (the
    narrow-frontier regime where jumps used to be skipped)."""
    import jax
    import jax.numpy as jnp

    from velociraptor_stf_tpu.ops import pallas_fof as PF

    ns_pad = 6
    erow = jnp.asarray([0, 4, 4, 5, 5, 3, 3, 1], jnp.int32)
    ecol = jnp.asarray([4, 0, 5, 4, 3, 5, 1, 3], jnp.int32)

    def sweep_fn(labels, ranges):
        return jnp.full(ns_pad, PF.BIG_I32, jnp.int32).at[erow].min(
            labels[ecol])

    empty = jnp.zeros(0, jnp.int32)
    ctx = PF.FofSortCtx(
        ccx=empty, ccr=empty,
        cols_p=jnp.zeros((4, ns_pad + PF.CH), jnp.int32),
        cols_v=jnp.zeros((0,), jnp.float32),
        ranges=jnp.zeros((1, 128), jnp.int32),
        src=jnp.arange(ns_pad, dtype=jnp.int32),
        is_real=jnp.ones(ns_pad, bool),
        real_slot=jnp.arange(ns_pad, dtype=jnp.int32),
        gslots=empty, grs=empty, overflow=jnp.bool_(False),
        n=ns_pad, ns_pad=ns_pad)

    labels0 = jnp.asarray([0, 1, 2, 1, 0, 4], jnp.int32)
    # clean aux: prev_ref == labels0 (no dirty chunks -> narrow frontier),
    # nm_cache all BIG (no stale minima)
    aux0 = (labels0, jnp.full(ns_pad, PF.BIG_I32, jnp.int32))
    labels, changed, nsweeps, work, aux = PF._fixpoint(
        sweep_fn, ctx, max_sweeps=64, labels0=labels0, aux0=aux0)
    labels = np.asarray(jax.device_get(labels))
    assert not bool(jax.device_get(changed))
    # one root for the whole component {0, 1, 3, 4, 5}; node 2 alone
    assert len(set(labels[[0, 1, 3, 4, 5]].tolist())) == 1
    assert labels[2] == 2
