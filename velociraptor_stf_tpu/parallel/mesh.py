"""Device mesh + sharding helpers.

TPU-native replacement for the reference's MPI runtime
(/root/reference/src/mpiroutines.cxx, SURVEY.md §2.6): instead of explicit
domain AABBs, export lists and link-across loops, particle arrays are
sharded over a 1-D ``jax.sharding.Mesh`` along the particle axis ("parts" =
the spatial-slab axis after cell-id sorting, since particles are processed
in cell-sorted order).  XLA's SPMD partitioner inserts the ICI collectives
(all-gathers for halo-cell reads, psum-scatters for label hooking) that the
reference implements by hand with MPI sendrecv
(``MPIBuildParticleExportList``/``MPILinkAcross``/``MPIGroupExchange``).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

PARTS_AXIS = "parts"


def make_mesh(n_devices: Optional[int] = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (PARTS_AXIS,))


def parts_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (particle) axis across the mesh."""
    return NamedSharding(mesh, P(PARTS_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_particles(mesh: Mesh, *arrays):
    """Device-put arrays with the particle axis sharded over the mesh."""
    sh = parts_sharding(mesh)
    return tuple(jax.device_put(a, sh) for a in arrays)
