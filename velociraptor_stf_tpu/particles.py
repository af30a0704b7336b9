"""Particle data container.

TPU-native replacement for NBodylib's array-of-structs ``Particle`` class
(missing submodule; API reconstructed in SURVEY.md §2.9).  On TPU the natural
layout is struct-of-arrays: one dense, statically shaped array per field so
every pipeline stage is a fused vector op over the particle axis, and the
particle axis can be sharded over a ``jax.sharding.Mesh``.

Fields mirror what the reference Particle carries (positions/velocities,
mass, PID, type, density = local velocity density, potential) plus optional
hydro extras (u, sfr, metallicity, stellar age).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

# particle type codes (gadget convention, cf. reference allvars.h GASTYPE..)
GAS = 0
DARK = 1
DARK2 = 2
DARK3 = 3
STAR = 4
BH = 5
WIND = 6
TRACER = 7


@jax.tree_util.register_pytree_node_class
class ParticleSet:
    """Struct-of-arrays particle set (pytree).

    All arrays share leading dimension N (static).  ``mass`` may be a scalar
    broadcast (common for DM-only runs, cf. reference NOMASS option).
    """

    _array_fields = ("pos", "vel", "mass", "pid", "ptype", "density",
                     "potential", "u", "sfr", "zmet", "tage")

    def __init__(self, pos, vel, mass, pid=None, ptype=None, density=None,
                 potential=None, u=None, sfr=None, zmet=None, tage=None):
        self.pos = pos
        self.vel = vel
        self.mass = mass
        n = pos.shape[0]
        self.pid = pid if pid is not None else jnp.arange(n, dtype=jnp.int32)
        self.ptype = ptype if ptype is not None else jnp.full((n,), DARK, dtype=jnp.int8)
        self.density = density
        self.potential = potential
        self.u = u
        self.sfr = sfr
        self.zmet = zmet
        self.tage = tage

    @property
    def n(self) -> int:
        return self.pos.shape[0]

    def masses(self) -> jnp.ndarray:
        """Per-particle masses as an (N,) array regardless of storage."""
        m = jnp.asarray(self.mass)
        if m.ndim == 0:
            return jnp.full((self.n,), m, dtype=m.dtype)
        return m

    def replace(self, **kw) -> "ParticleSet":
        d = {f: getattr(self, f) for f in self._array_fields}
        d.update(kw)
        return ParticleSet(**d)

    def take(self, idx) -> "ParticleSet":
        """Gather a (possibly permuted) subset along the particle axis."""
        d = {}
        for f in self._array_fields:
            v = getattr(self, f)
            if v is None:
                d[f] = None
            elif f == "mass" and jnp.asarray(v).ndim == 0:
                d[f] = v
            else:
                d[f] = jnp.take(v, idx, axis=0)
        return ParticleSet(**d)

    # pytree protocol -------------------------------------------------------
    def tree_flatten(self):
        children = tuple(getattr(self, f) for f in self._array_fields)
        return children, None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(**dict(zip(cls._array_fields, children)))

    @classmethod
    def from_numpy(cls, pos: np.ndarray, vel: np.ndarray,
                   mass, pid: Optional[np.ndarray] = None,
                   ptype: Optional[np.ndarray] = None,
                   dtype=jnp.float32) -> "ParticleSet":
        pos = jnp.asarray(pos, dtype=dtype)
        vel = jnp.asarray(vel, dtype=dtype)
        mass = jnp.asarray(mass, dtype=dtype)
        if pid is not None:
            pid_np = np.asarray(pid)
            if pid_np.max(initial=0) > 2 ** 31 - 1:
                # >2^31 ids (reference VR_LONG_INT, CMakeLists.txt:43) stay
                # HOST-resident int64: they are only read back for catalog
                # output (api.py), and device int64 truncates without x64
                pid = pid_np.astype(np.int64)
            else:
                pid = jnp.asarray(pid_np, dtype=jnp.int32)
        ptype = jnp.asarray(ptype, dtype=jnp.int8) if ptype is not None else None
        return cls(pos, vel, mass, pid=pid, ptype=ptype)

    def __repr__(self):
        return f"ParticleSet(n={self.n}, dtype={self.pos.dtype})"
