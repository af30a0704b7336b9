"""Frozen golden-catalog gate.

The reference validates releases by TreeFrog-matching catalogs produced
from the same snapshot across versions
(examples/catalogcomparisontolerancecheck.py, SURVEY.md §4).  Here a
small frozen snapshot AND the catalog it produced (generated once on the
8-virtual-device CPU backend, checked in at tests/golden/) gate every
round: any silent change to the FOF/6DFOF/unbind/substructure numerics
shows up as a partition or property drift against the frozen result.

If a deliberate algorithm change legitimately moves the catalog,
regenerate the golden file with the recipe in its companion test (and
say so in the commit message) — this test exists to make that step
impossible to forget.
"""

import os
from collections import defaultdict

import numpy as np

from velociraptor_stf_tpu.models.pipeline import find_structures
from velociraptor_stf_tpu.utils import config as C

GOLDEN = os.path.join(os.path.dirname(__file__), "golden",
                      "golden_catalog.npz")


def _golden_options(boxsize, n):
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
    opt.iSubSearch = 1
    opt.iiterflag = 1
    opt.iInclusiveHalo = 3
    C.config_check(opt)
    return opt


def _partition(pfof):
    d = defaultdict(list)
    for i, g in enumerate(np.asarray(pfof)):
        if g > 0:
            d[g].append(i)
    return {g: frozenset(v) for g, v in d.items()}


def _match_fraction(parts_a, parts_b):
    """Greedy best-overlap match rate of A's groups onto B's (the
    TreeFrog-style gate of examples/catalog_match.py, computed directly
    on partitions)."""
    owner = {}
    for g, members in parts_b.items():
        for i in members:
            owner[i] = g
    matched = total = 0
    for g, members in parts_a.items():
        votes = defaultdict(int)
        for i in members:
            if i in owner:
                votes[owner[i]] += 1
        best = max(votes.values()) if votes else 0
        matched += best
        total += len(members)
    return matched / max(total, 1)


def test_golden_catalog_no_drift():
    with np.load(GOLDEN) as z:
        pos, vel, mass = z["pos"], z["vel"], z["mass"]
        boxsize = float(z["boxsize"])
        pfof_g = z["pfof"]
        ng_g = int(z["ngroups"])
        gmass_g, gM200c_g = z["gmass"], z["gM200c"]
        gR200c_g, gsize_g = z["gR200c"], z["gsize"]
        parent_g = z["parent"]

    opt = _golden_options(boxsize, len(pos))
    res = find_structures(opt, pos, vel, mass, boxsize=boxsize)

    # partition gate: membership match >= 99.9% both ways
    pa = _partition(res.pfof)
    pb = _partition(pfof_g)
    assert res.ngroups == ng_g, (res.ngroups, ng_g)
    fab = _match_fraction(pa, pb)
    fba = _match_fraction(pb, pa)
    assert fab >= 0.999 and fba >= 0.999, (fab, fba)

    # property gate on the matched ids (ids are size-ordered; an exact
    # partition match implies aligned ids)
    ng = res.ngroups
    for name, want in (("gmass", gmass_g), ("gM200c", gM200c_g),
                       ("gR200c", gR200c_g), ("gsize", gsize_g)):
        got = np.asarray(res.props[name])[:ng + 1]
        np.testing.assert_allclose(got, want[:ng + 1], rtol=5e-4,
                                   err_msg=name)
    np.testing.assert_array_equal(np.asarray(res.parent), parent_g)
