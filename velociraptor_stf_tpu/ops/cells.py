"""Uniform cell-list spatial binning.

TPU-native replacement for NBodylib's KD-tree neighbour machinery (the
missing submodule whose API is reconstructed in SURVEY.md §2.9; used by the
reference at e.g. /root/reference/src/search.cxx:99,570 and
/root/reference/src/unbind.cxx:1508).  Instead of pointer-chasing tree
traversals, all "find pairs within ell" queries become dense, statically
shaped tiles between a cell and its 27-cell neighbourhood:

* the grid geometry (cell counts / widths) is host-static, so everything
  under ``jit`` has static shapes;
* particles are sorted by packed cell id; each occupied cell is a contiguous
  slice of the sorted arrays — gathers are mostly coalesced;
* occupied cells are found with ``jnp.unique(size=N)`` (padded, jit-safe);
* neighbour-cell lookup = integer decode/offset/encode + ``searchsorted``
  into the sorted unique cell ids.

Cell ids are packed into int32; the grid builder caps cells-per-dim so the
packed id cannot overflow (supports > 2^31 cells only via wider cells, which
is always legal for correctness since cell width >= search radius is the only
requirement).
"""

from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

INT32_MAX = np.int32(2**31 - 1)


class CellGrid(NamedTuple):
    """Static (host-side) grid geometry. Hashable -> usable as a jit static."""

    ncells: Tuple[int, int, int]
    origin: Tuple[float, float, float]
    width: Tuple[float, float, float]     # cell width per axis
    periodic: bool
    boxsize: float                         # 0.0 if non-periodic

    @property
    def total_cells(self) -> int:
        return self.ncells[0] * self.ncells[1] * self.ncells[2]


class Binning(NamedTuple):
    """Device-side binning result (pytree of arrays, all length N or N+1).

    Arrays are in *sorted* order: ``order`` maps sorted index -> original
    index.  ``ucid`` is the padded sorted unique cell-id array (padding =
    INT32_MAX); ``cell_start``/``cell_count`` give each occupied cell's
    contiguous slice in sorted order; ``pcell`` is each sorted particle's
    occupied-cell index.
    """

    order: jnp.ndarray        # (N,) int32  sorted -> original
    cid_sorted: jnp.ndarray   # (N,) int32  packed cell id per sorted particle
    ucid: jnp.ndarray         # (N,) int32  unique cell ids, padded w/ INT32_MAX
    cell_start: jnp.ndarray   # (N,) int32  slice start per occupied cell
    cell_count: jnp.ndarray   # (N,) int32  slice length per occupied cell
    pcell: jnp.ndarray        # (N,) int32  occupied-cell index per sorted particle
    num_cells: jnp.ndarray    # ()  int32   number of occupied cells


def build_grid(
    lo: np.ndarray,
    hi: np.ndarray,
    min_width: float,
    periodic: bool = False,
    boxsize: float = 0.0,
    max_total_cells: int = 2**31 - 1,
    target_cells_per_dim: Optional[int] = None,
) -> CellGrid:
    """Choose grid geometry on the host.

    ``min_width`` is the search radius: cell width must be >= it so that the
    27-cell stencil covers all candidates.  Cells-per-dim is additionally
    capped so packed int32 ids cannot overflow.
    """
    lo = np.asarray(lo, np.float64)
    hi = np.asarray(hi, np.float64)
    if periodic:
        assert boxsize > 0
        extent = np.array([boxsize] * 3)
        lo = np.zeros(3)
    else:
        extent = np.maximum(hi - lo, 1e-30)
        # pad slightly so points on the upper boundary land inside
        extent = extent * (1 + 1e-6) + 1e-30

    nc = np.maximum(1, np.floor(extent / max(min_width, 1e-30)).astype(np.int64))
    if target_cells_per_dim is not None:
        nc = np.minimum(nc, target_cells_per_dim)
    # default cap keeps packed int32 ids valid; callers that use the
    # slab-chunked edge builder may pass a larger cap (it never packs ids)
    cap = min(max_total_cells, 2**62)
    while int(np.prod(nc)) > cap:
        nc = np.maximum(1, nc // 2)
    width = extent / nc
    return CellGrid(
        ncells=(int(nc[0]), int(nc[1]), int(nc[2])),
        origin=(float(lo[0]), float(lo[1]), float(lo[2])),
        width=(float(width[0]), float(width[1]), float(width[2])),
        periodic=bool(periodic),
        boxsize=float(boxsize) if periodic else 0.0,
    )


def cell_coords(pos: jnp.ndarray, grid: CellGrid) -> jnp.ndarray:
    """(N,3) integer cell coordinates for positions."""
    origin = jnp.asarray(grid.origin, pos.dtype)
    width = jnp.asarray(grid.width, pos.dtype)
    nc = jnp.asarray(grid.ncells, jnp.int32)
    c = jnp.floor((pos - origin) / width).astype(jnp.int32)
    if grid.periodic:
        c = jnp.mod(c, nc)
    else:
        c = jnp.clip(c, 0, nc - 1)
    return c


def pack_cells(coords: jnp.ndarray, grid: CellGrid) -> jnp.ndarray:
    """Pack (.., 3) integer cell coords into int32 linear ids.

    Grids beyond int32 range must use the slab-chunked edge builder
    (ops/fof.py), which keys on (x-plane, within-plane) int32 pairs instead
    of one packed id (JAX int64 is unavailable without global x64 mode).
    """
    _, ny, nz = grid.ncells
    assert grid.total_cells <= 2**31 - 2, \
        "packed int32 cell ids overflow; use the slab-chunked path"
    return (coords[..., 0] * ny + coords[..., 1]) * nz + coords[..., 2]


def unpack_cells(cid: jnp.ndarray, grid: CellGrid) -> jnp.ndarray:
    """Inverse of pack_cells -> (..., 3) int32."""
    _, ny, nz = grid.ncells
    iz = cid % nz
    rem = cid // nz
    iy = rem % ny
    ix = rem // ny
    return jnp.stack([ix, iy, iz], axis=-1)


@partial(jax.jit, static_argnames=("grid", "lean"))
def bin_particles(pos: jnp.ndarray, grid: CellGrid,
                  lean: bool = False) -> Binning:
    """Sort particles by packed cell id and build the occupied-cell index.

    ``lean``: only ``order``/``cid_sorted`` are needed (the dense-prefix-
    table candidate paths index cells directly) — skip the occupied-cell
    index (`unique` + three `searchsorted`s are ~20x the cost of the sort
    on TPU); the other fields are 1-element placeholders.
    """
    n = pos.shape[0]
    cid = pack_cells(cell_coords(pos, grid), grid)
    order = jnp.argsort(cid).astype(jnp.int32)
    cid_sorted = cid[order]
    if lean:
        z1 = jnp.zeros(1, jnp.int32)
        return Binning(order=order, cid_sorted=cid_sorted, ucid=z1,
                       cell_start=z1, cell_count=z1, pcell=z1,
                       num_cells=jnp.int32(0))
    ucid = jnp.unique(cid_sorted, size=n, fill_value=INT32_MAX)
    start = jnp.searchsorted(cid_sorted, ucid, side="left").astype(jnp.int32)
    end = jnp.searchsorted(cid_sorted, ucid, side="right").astype(jnp.int32)
    count = (end - start).astype(jnp.int32)
    pcell = jnp.searchsorted(ucid, cid_sorted, side="left").astype(jnp.int32)
    num_cells = jnp.sum(count > 0).astype(jnp.int32)
    return Binning(order=order, cid_sorted=cid_sorted, ucid=ucid,
                   cell_start=start, cell_count=count, pcell=pcell,
                   num_cells=num_cells)


def neighbor_cell_table(binning: Binning, grid: CellGrid,
                        stencil: int = 1) -> jnp.ndarray:
    """(N, S) table: for each occupied cell, the occupied-cell index of each
    cell in its (2*stencil+1)^3 neighbourhood, or -1 if empty/out of range.

    S = (2*stencil+1)^3.  Row i of the table corresponds to ucid[i]; padding
    rows (ucid == INT32_MAX) get all -1.
    """
    nc = jnp.asarray(grid.ncells, jnp.int32)
    coords = unpack_cells(binning.ucid, grid)           # (N,3); garbage on pads
    offs = np.stack(np.meshgrid(*([np.arange(-stencil, stencil + 1)] * 3),
                                indexing="ij"), -1).reshape(-1, 3)
    offs = jnp.asarray(offs, jnp.int32)                  # (S,3)
    ncoords = coords[:, None, :] + offs[None, :, :]      # (N,S,3)
    if grid.periodic:
        ncoords = jnp.mod(ncoords, nc)
        in_range = jnp.ones(ncoords.shape[:2], bool)
    else:
        in_range = jnp.all((ncoords >= 0) & (ncoords < nc), axis=-1)
        ncoords = jnp.clip(ncoords, 0, nc - 1)
    nid = pack_cells(ncoords, grid)                      # (N,S)
    idx = jnp.searchsorted(binning.ucid, nid, side="left").astype(jnp.int32)
    idx = jnp.clip(idx, 0, binning.ucid.shape[0] - 1)
    found = (binning.ucid[idx] == nid) & in_range
    is_pad = binning.ucid == INT32_MAX
    found = found & ~is_pad[:, None]
    return jnp.where(found, idx, -1)


def max_cell_count(pos, grid: CellGrid) -> int:
    """Host helper: max particles in any cell (to pick static capacity K)."""
    b = bin_particles(jnp.asarray(pos), grid)
    return int(jax.device_get(jnp.max(b.cell_count)))


def _spread_bits_10(x: jnp.ndarray) -> jnp.ndarray:
    """Spread the low 10 bits of x so there are two zero bits between each
    (classic Morton bit-interleave helper)."""
    x = x.astype(jnp.uint32) & 0x3FF
    x = (x | (x << 16)) & jnp.uint32(0x030000FF)
    x = (x | (x << 8)) & jnp.uint32(0x0300F00F)
    x = (x | (x << 4)) & jnp.uint32(0x030C30C3)
    x = (x | (x << 2)) & jnp.uint32(0x09249249)
    return x


def morton_keys(pos: jnp.ndarray, lo, hi, bits: int = 10) -> jnp.ndarray:
    """(N,) int32 Morton (Z-order) keys of positions within [lo, hi].

    Used to give contiguous chunks of the sorted particle array good spatial
    locality -- the TPU replacement for KD-tree leaf buckets (reference
    NBodylib leaves used as density-estimation work units,
    localfield.cxx:776-826)."""
    lo = jnp.asarray(lo, pos.dtype)
    hi = jnp.asarray(hi, pos.dtype)
    scale = (2 ** bits - 1) / jnp.maximum(hi - lo, 1e-30)
    c = jnp.clip(((pos - lo) * scale), 0, 2 ** bits - 1).astype(jnp.int32)
    key = (_spread_bits_10(c[..., 0]) << 2) | \
          (_spread_bits_10(c[..., 1]) << 1) | _spread_bits_10(c[..., 2])
    return key.astype(jnp.int32)
