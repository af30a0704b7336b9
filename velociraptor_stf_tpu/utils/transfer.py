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

import jax

from . import telemetry


def fetch_small(x):
    """Fetch per-group metadata / scalars to host (audited site).

    Allowed under the transfer-guard test: these are the TPU analog of
    the reference's MPI_Allreduce'd group counts, never O(N) data."""
    with jax.transfer_guard_device_to_host("allow"):
        return jax.device_get(x)


def fetch_bulk(x, what: str = ""):
    """Fetch an O(N) array to host (audited site, counted).

    The mesh pipeline budget is ONE of these per run — the catalog
    write.  Telemetry key ``mesh_full_gathers`` counts them."""
    telemetry.count("mesh_full_gathers")
    if what:
        telemetry.count(f"mesh_full_gathers::{what}")
    with jax.transfer_guard_device_to_host("allow"):
        return jax.device_get(x)


@contextlib.contextmanager
def no_host_transfers():
    """Context that makes any UNAUDITED device->host transfer raise
    (test harness for the device-residency guarantee)."""
    with jax.transfer_guard_device_to_host("disallow"):
        yield
