"""Bench-mock realism gate (round-5 VERDICT weak #6).

The headline metric runs on make_cosmo_mock; a mock that under-clusters
would flatter every number (the reference's cost is dominated by the few
biggest halos).  This test anchors the mock's RECOVERED group-size
distribution — FOF at the bench linking length must find the planted
power-law tail: heavy top groups, a power-law size CCDF, and the
planted halo mass fraction."""

import numpy as np
import pytest

from velociraptor_stf_tpu.io.synthetic import make_cosmo_mock
from velociraptor_stf_tpu.ops import fof


@pytest.mark.slow
def test_bench_mock_group_size_tail():
    n = 1 << 19
    boxsize = 100.0
    # same construction bench.py uses (scaled down; nhalos = n/16384)
    pos, vel, mass = make_cosmo_mock(n, boxsize=boxsize,
                                     nhalos=max(64, n // 16384), seed=7)
    b = 0.2 * boxsize / n ** (1 / 3)
    pfof, ng = fof.fof3d(pos, b, boxsize=boxsize, min_size=20)
    pfof = np.asarray(pfof)
    ng = int(ng)
    assert ng >= 30
    sizes = np.bincount(pfof[pfof > 0], minlength=ng + 1)[1:]
    sizes = np.sort(sizes)[::-1]

    # (a) heavy tail: the biggest group holds a macroscopic share and the
    # top-20 dominate the clustered mass (reference cost profile)
    assert sizes[0] >= 0.005 * n, sizes[:5]
    assert sizes[:20].sum() >= 0.1 * n

    # (b) clustered fraction: fhalo=0.4 planted, of which FOF at b=0.2
    # recovers the NFW cores (~half the members sit beyond the linking
    # length in the outskirts) — production boxes tag ~15-25% at this b,
    # and an under-clustered mock would fall well below that
    fclust = pfof.astype(bool).mean()
    assert 0.15 <= fclust <= 0.6, fclust

    # (c) power-law CCDF: planted occupancies follow slope=-1.8, so
    # log N(>s) vs log s over the resolved range is ~linear with slope
    # 1 + slope = -0.8; allow generous scatter (finite sampling, FOF
    # bridging) but reject exponential-ish (no-tail) distributions
    smin, smax = 100, sizes[0] / 4
    svals = sizes[(sizes >= smin) & (sizes <= smax)]
    assert len(svals) >= 10
    xs = np.log(np.sort(svals))
    ys = np.log(np.arange(len(svals), 0, -1))
    slope = np.polyfit(xs, ys, 1)[0]
    assert -1.6 <= slope <= -0.3, slope
