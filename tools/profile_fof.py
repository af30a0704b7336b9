"""Stage-level profile of the FOF+6DFOF+unbind metric path on TPU.

Usage: python tools/profile_fof.py [N]
Prints per-stage wall times (after warmup) for:
  bin/sort, candidate table, expand+links+compact, label fixpoint,
  renumber, 6D refine, unbind potential, ejection loop.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def sync(x):
    import jax
    jax.device_get(np.asarray(x).ravel()[:1] if isinstance(x, np.ndarray)
                   else x.ravel()[:1])


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("VR_JAX_CACHE", "/tmp/vr_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from velociraptor_stf_tpu.io.synthetic import make_cosmo_mock
    from velociraptor_stf_tpu.ops import fof, cells
    from velociraptor_stf_tpu.utils import config as C

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 128 ** 3
    boxsize = 100.0
    pos, vel, mass = make_cosmo_mock(n, boxsize=boxsize,
                                     nhalos=max(64, n // 16384), seed=7)
    pos, vel, mass = jnp.asarray(pos), jnp.asarray(vel), jnp.asarray(mass)
    sync(mass)

    b3d = 0.2 * boxsize / n ** (1 / 3)

    def timeit(label, fn, reps=2):
        out = fn()  # warm
        ts = []
        for _ in range(reps):
            t0 = time.time()
            out = fn()
            # fetch one element of the first array output to sync
            leaves = jax.tree_util.tree_leaves(out)
            for l in leaves:
                if hasattr(l, "ravel") and l.size:
                    sync(l)
                    break
            ts.append(time.time() - t0)
        print(f"{label:32s} {min(ts)*1000:9.1f} ms")
        return out

    grid = cells.build_grid(np.zeros(3), np.full(3, boxsize), b3d,
                            periodic=True, boxsize=boxsize)
    print(f"n={n}  grid={grid.ncells} total_cells={grid.total_cells}")

    binning = timeit("bin_particles(lean)", lambda: cells.bin_particles(
        pos, grid, lean=True))
    cc = timeit("candidate_counts_half", lambda: fof.candidate_counts_half(
        binning, grid))
    pst, pcn, T = cc
    Tv = int(jax.device_get(T))
    print(f"{'T (candidate slots)':32s} {Tv:12d}")
    t_pad = fof._pad_pow2(max(Tv, 1))
    order = binning.order
    pos_s = pos[order]
    fields_s = {"vel": vel[order]}
    pred = fof.Pred3D(float(b3d) ** 2)

    fc = timeit("flat_candidates", lambda: fof.flat_candidates(
        pst, pcn, t_pad))
    row, col, valid = fc
    fl = timeit("flat_links", lambda: fof.flat_links(
        pos_s, fields_s, row, col, valid, grid, pred))
    mask = fl
    ce = timeit("compact_edges", lambda: fof.compact_edges(
        row, col, mask, t_pad))
    ef = timeit("edges_fused (all 3)", lambda: fof._edges_fused(
        pos_s, fields_s, pst, pcn, grid, pred, t_pad))
    erow, ecol, ne = ef
    nev = int(jax.device_get(ne))
    print(f"{'edges':32s} {nev:12d}")
    e_pad = fof._pad_pow2(max(nev, 1))
    erow_c, ecol_c = erow[:e_pad], ecol[:e_pad]
    sync(erow_c)

    lab = timeit("fof_labels_from_edges", lambda: fof.fof_labels_from_edges(
        erow_c, ecol_c, n, undirected=True), reps=2)
    rn = timeit("renumber_by_size", lambda: fof.renumber_by_size(
        lab, 32, orig_index=order))

    # full build_edges for comparison
    timeit("build_edges (end-to-end)", lambda: fof.build_edges(
        pos, b3d, boxsize=boxsize, fields={"vel": vel}), reps=1)


if __name__ == "__main__":
    main()
