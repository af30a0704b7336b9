"""Catalog cross-match harness (TreeFrog-style tolerance check).

Counterpart of the reference's examples/catalogcomparisontolerancecheck.py,
which invokes TreeFrog to cross-match two catalogs produced from the same
snapshot and gates merit/match fractions against tolerances.  This
standalone version implements the core of that check directly: greedy
maximum-shared-particle matching between two .catalog_groups/.catalog_*
outputs with a merit function N_shared^2 / (N_a * N_b).

Usage:
    python catalog_match.py catA catB [--min-size 20] [--tol 0.9]

Exit code 0 when the matched fraction (both directions) >= tol.
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def read_catalog(basename: str):
    """Returns (sizes, offsets, pids) from .catalog_groups/.catalog_particles
    (HDF5 written by io/writers.py; reference io.cxx:377)."""
    import h5py

    with h5py.File(basename + ".catalog_groups", "r") as f:
        sizes = np.asarray(f["Group_Size"])
        off = np.asarray(f["Offset"])
    with h5py.File(basename + ".catalog_particles", "r") as f:
        pids = np.asarray(f["Particle_IDs"])
    return sizes, off, pids


def group_map(sizes, off, pids):
    """pid -> group index (bound particles only; offsets index the bound
    pid list; sizes count bound+unbound, so clip runs at the next offset)."""
    gmap = {}
    nb = len(pids)
    for g in range(len(sizes)):
        end = off[g + 1] if g + 1 < len(sizes) else nb
        for p in pids[off[g]:end]:
            gmap[int(p)] = g
    return gmap


def cross_match(catA: str, catB: str, min_size: int = 20):
    """Greedy best-merit matching A->B; returns per-A-group
    (match index or -1, merit, shared fraction)."""
    sA, oA, pA = read_catalog(catA)
    sB, oB, pB = read_catalog(catB)
    mapB = group_map(sB, oB, pB)
    nA = len(sA)
    match = np.full(nA, -1, np.int64)
    merit = np.zeros(nA)
    frac = np.zeros(nA)
    nbA = len(pA)
    for g in range(nA):
        if sA[g] < min_size:
            continue
        end = oA[g + 1] if g + 1 < nA else nbA
        mypids = pA[oA[g]:end]
        counts: dict = {}
        for p in mypids:
            gb = mapB.get(int(p))
            if gb is not None:
                counts[gb] = counts.get(gb, 0) + 1
        if not counts:
            continue
        gb, nsh = max(counts.items(), key=lambda kv: kv[1])
        match[g] = gb
        na = len(mypids)
        endb = oB[gb + 1] if gb + 1 < len(sB) else len(pB)
        nb = endb - oB[gb]
        merit[g] = nsh * nsh / max(na * nb, 1)
        frac[g] = nsh / max(na, 1)
    return match, merit, frac, sA


def match_fraction(catA: str, catB: str, min_size: int = 20,
                   frac_floor: float = 0.5) -> float:
    """Fraction of A-groups (>= min_size) with a B-match sharing more than
    ``frac_floor`` of their particles."""
    match, merit, frac, sizes = cross_match(catA, catB, min_size)
    sel = sizes >= min_size
    if not sel.any():
        return 1.0
    return float(((match >= 0) & (frac > frac_floor))[sel].mean())


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("catA")
    ap.add_argument("catB")
    ap.add_argument("--min-size", type=int, default=20)
    ap.add_argument("--tol", type=float, default=0.9)
    args = ap.parse_args(argv)
    fab = match_fraction(args.catA, args.catB, args.min_size)
    fba = match_fraction(args.catB, args.catA, args.min_size)
    print(f"match fraction A->B: {fab:.4f}  B->A: {fba:.4f}  "
          f"tol: {args.tol}")
    return 0 if min(fab, fba) >= args.tol else 1


if __name__ == "__main__":
    sys.exit(main())
