"""Byte-audited collective wrappers for the mesh pipeline.

The reference accounts for every MPI export explicitly (buffer sizing and
export counts all over /root/reference/src/mpiroutines.cxx:783-1202); the
XLA analog is implicit — collectives are compiled into the program — so
this module makes the cost visible: every ``ppermute`` / ``psum`` /
``pmax`` / ``pmin`` / ``all_gather`` in the sharded stages goes through a
wrapper that records the payload bytes at TRACE time under the current
stage label.

Semantics of the numbers (see docs/benchmarks.md "Collective-volume
audit"):

* counting happens when the surrounding jit traces, i.e. ONCE per
  compiled program — multiply by the per-stage round counts (the
  ``fof*_sweeps`` telemetry) for totals of ops inside ``while_loop``
  bodies;
* ``ppermute`` bytes = the per-device payload actually moved over the
  link; ``psum``/``pmax``/``pmin`` bytes = the reduced payload shape (an
  ICI ring moves ~2x that per device for reduce-scatter + all-gather);
* a zero count for a stage means its compile was served from the jit
  cache — run a fresh process for a full audit (tools/audit_collectives.py).

Counters: ``coll_bytes::<stage>::<kind>`` and ``coll_ops::<stage>::<kind>``.
Stage labels are set by the stage entry points via ``audit_stage``; with
no active stage the wrappers are zero-overhead pass-throughs.
"""

from __future__ import annotations

import contextlib
from typing import Optional

import jax
import numpy as np

from ..utils import telemetry

_STAGE: Optional[str] = None


@contextlib.contextmanager
def audit_stage(name: str):
    """Label collectives traced within the context (reentrant; inner
    labels win, mirroring nested stage structure)."""
    global _STAGE
    prev = _STAGE
    _STAGE = name
    try:
        yield
    finally:
        _STAGE = prev


def _count(kind: str, x) -> None:
    if _STAGE is None:
        return
    nbytes = 0
    for leaf in jax.tree_util.tree_leaves(x):
        try:
            nbytes += int(np.prod(leaf.shape)) * leaf.dtype.itemsize
        except Exception:
            pass
    telemetry.count(f"coll_bytes::{_STAGE}::{kind}", nbytes)
    telemetry.count(f"coll_ops::{_STAGE}::{kind}")


def ppermute(x, axis_name, perm):
    _count("ppermute", x)
    return jax.lax.ppermute(x, axis_name, perm)


def psum(x, axis_name):
    _count("psum", x)
    return jax.lax.psum(x, axis_name)


def pmax(x, axis_name):
    _count("pmax", x)
    return jax.lax.pmax(x, axis_name)


def pmin(x, axis_name):
    _count("pmin", x)
    return jax.lax.pmin(x, axis_name)


def all_gather(x, axis_name, **kw):
    _count("all_gather", x)
    return jax.lax.all_gather(x, axis_name, **kw)


def count_reshard(stage: str, x) -> None:
    """Account a cross-device resharding data movement (device_put onto a
    mesh sharding — the grouppack/slab deal, the analog of the reference's
    MPIGroupExchange bulk migration).  Unlike the lax collectives these
    move each element ONCE per call; counted under kind ``reshard``."""
    nbytes = 0
    for leaf in jax.tree_util.tree_leaves(x):
        try:
            nbytes += int(np.prod(leaf.shape)) * leaf.dtype.itemsize
        except Exception:
            pass
    telemetry.count(f"coll_bytes::{stage}::reshard", nbytes)
    telemetry.count(f"coll_ops::{stage}::reshard")


def staged(name: str):
    """Decorator: run the wrapped stage entry under ``audit_stage(name)``
    so its traced collectives are attributed."""
    def deco(fn):
        import functools

        @functools.wraps(fn)
        def wrapper(*a, **k):
            with audit_stage(name):
                return fn(*a, **k)
        return wrapper
    return deco
