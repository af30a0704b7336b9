"""Audited device->host transfers for the mesh pipeline.

The reference's MPI design keeps particles resident on their ranks for
the whole run (/root/reference/src/mpiroutines.cxx:49-230); the TPU
analog is arrays staying (sharded) on device across stage boundaries,
with host fetches limited to per-GROUP metadata and scalars.  Every
intentional small fetch in the mesh path goes through ``fetch_small`` so
a test can put JAX's transfer guard in ``disallow`` mode and prove no
stage smuggles a full-array gather: stray ``np.asarray(device_arr)`` /
implicit transfers then raise, while the audited sites keep working.

``count_full_gathers`` telemetry records fetches of n-scale arrays (the
one legitimate gather is the catalog write).
"""

from __future__ import annotations

import contextlib
import threading

import jax

from . import telemetry

_audit = threading.local()


def _in_audit() -> bool:
    return getattr(_audit, "on", False)


@contextlib.contextmanager
def _audited():
    prev = getattr(_audit, "on", False)
    _audit.on = True
    try:
        yield
    finally:
        _audit.on = prev


def fetch_small(x):
    """Fetch per-group metadata / scalars to host (audited site).

    Allowed under the residency test: these are the TPU analog of the
    reference's MPI_Allreduce'd group counts, never O(N) data."""
    with _audited(), jax.transfer_guard_device_to_host("allow"):
        return jax.device_get(x)


def fetch_bulk(x, what: str = ""):
    """Fetch an O(N) array to host (audited site, counted).

    The mesh pipeline budget is the CATALOG payloads only.  Telemetry key
    ``mesh_full_gathers`` counts them."""
    telemetry.count("mesh_full_gathers")
    if what:
        telemetry.count(f"mesh_full_gathers::{what}")
    with _audited(), jax.transfer_guard_device_to_host("allow"):
        return jax.device_get(x)


@contextlib.contextmanager
def no_host_transfers(big: int = 1 << 12):
    """Context in which any UNAUDITED host materialisation of a device
    array with >= ``big`` elements raises (the mechanical proof of the
    mesh pipeline's device-residency guarantee).

    Intercepts the host-materialisation funnels — ``Array.__array__``,
    ``jax.device_get``, and the ``np.asarray`` family — on EVERY backend.
    On TPU, ``__array__`` catches everything (device arrays have no
    buffer protocol); on the zero-copy CPU mesh (where JAX's own transfer
    guard never fires and numpy reads device buffers via PEP 3118,
    skipping ``__array__``) the ``np.asarray``-level patch covers the
    conversion idioms the pipeline uses.  ``fetch_small`` / ``fetch_bulk``
    mark their fetches as audited and pass.

    TEST-ONLY and SINGLE-THREADED: the patches are process-global while
    the audit flag is thread-local, so a concurrent thread doing
    legitimate big conversions inside this context would raise; code that
    cached ``np.asarray`` before entry also bypasses the guard.  Use only
    from a single-threaded test (tests/test_device_residency.py)."""
    import numpy as _np

    import jax.numpy as jnp

    cls = type(jax.block_until_ready(jnp.zeros(1)))
    orig_array = cls.__array__
    orig_get = jax.device_get
    np_funcs = {nm: getattr(_np, nm)
                for nm in ("asarray", "array", "asanyarray",
                           "ascontiguousarray")}

    def _check(x):
        try:
            sz = x.size
        except Exception:
            return
        if sz >= big and not _in_audit():
            raise RuntimeError(
                f"unaudited host materialisation of a {sz}-element device "
                "array inside the mesh pipeline (use fetch_small/"
                "fetch_bulk)")

    def guarded_array(self, *a, **k):
        _check(self)
        return orig_array(self, *a, **k)

    def guarded_get(tree, *a, **k):
        for leaf in jax.tree_util.tree_leaves(tree):
            if isinstance(leaf, cls):
                _check(leaf)
        with _audited():
            return orig_get(tree, *a, **k)

    def make_np_wrapper(fn):
        def wrapper(a, *args, **kw):
            if isinstance(a, cls):
                _check(a)
            return fn(a, *args, **kw)
        return wrapper

    cls.__array__ = guarded_array
    jax.device_get = guarded_get
    for nm, fn in np_funcs.items():
        setattr(_np, nm, make_np_wrapper(fn))
    try:
        with jax.transfer_guard_device_to_host("disallow"):
            yield
    finally:
        cls.__array__ = orig_array
        jax.device_get = orig_get
        for nm, fn in np_funcs.items():
            setattr(_np, nm, fn)
