"""Equal-count KD partition (median splits) on device.

TPU-native equivalent of NBodylib's KD-tree *leaf structure* as used by the
reference for background grids and density-estimation work units
(/root/reference/src/bgfield.cxx:21 ``InitializeTreeGrid`` builds a tree
whose leaves are the grid cells; /root/reference/src/localfield.cxx:776
iterates leaf nodes).  A KD tree's pointer structure is useless on TPU, but
its *leaves* are just an equal-count spatially-coherent partition — which
can be built with log2(C) segmented sorts:

  level k: within each current segment (contiguous, equal size), sort
  particles by their coordinate along the segment's longest bounding-box
  axis, then split the segment in half.

After L levels the sorted array's contiguous blocks of size N/2^L are the
leaves.  Each level is one lexsort + segment reductions - O(L * N log N)
with perfect static shapes.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnames=("levels",))
def median_partition(pos: jnp.ndarray, levels: int,
                     active: jnp.ndarray = None) -> jnp.ndarray:
    """Return a permutation ordering particles into 2^levels equal-count,
    spatially compact segments (KD leaves).  Inactive particles (padding)
    are sorted to the end first so leaves of real particles stay pure.
    """
    n = pos.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    if active is not None:
        # actives first (stable), pads last
        order = jnp.argsort(jnp.where(active, 0, 1).astype(jnp.int8),
                            stable=True).astype(jnp.int32)
    else:
        order = idx

    seg = jnp.zeros(n, jnp.int32)  # segment id per sorted slot
    for level in range(levels):
        nseg = 1 << level
        p = pos[order]
        # segment bounding boxes -> longest axis per segment
        big = jnp.asarray(3.4e38, pos.dtype)
        d = pos.shape[1]
        mins = jnp.full((nseg, d), big).at[seg].min(p)
        maxs = jnp.full((nseg, d), -big).at[seg].max(p)
        axis = jnp.argmax(maxs - mins, axis=-1)            # (nseg,)
        coord = jnp.take_along_axis(p, axis[seg][:, None], axis=1)[:, 0]
        # sort within segments by the chosen coordinate
        perm = jnp.lexsort((coord, seg)).astype(jnp.int32)
        order = order[perm]
        # split each segment in half: new segment id from global rank
        seg_sz = n >> (level + 1)
        seg = (jnp.arange(n, dtype=jnp.int32) // jnp.maximum(seg_sz, 1))
        seg = jnp.minimum(seg, 2 * nseg - 1)
    return order
