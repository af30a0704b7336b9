"""Native host-runtime (C++ ctypes) tests with numpy oracles."""

import numpy as np
import pytest

from velociraptor_stf_tpu.utils import native


def test_cell_keys_match_numpy():
    rng = np.random.default_rng(0)
    pos = rng.uniform(0, 100, (50000, 3)).astype(np.float32)
    k = native.cell_keys(pos, [0, 0, 0], [1, 1, 1], [100, 100, 100], True)
    c = np.floor(pos).astype(np.int64) % 100
    expect = ((c[:, 0] * 100 + c[:, 1]) * 100 + c[:, 2]).astype(np.int32)
    assert (k == expect).all()


def test_counting_sort_stable():
    rng = np.random.default_rng(1)
    keys = rng.integers(0, 1000, 200000).astype(np.int32)
    perm, offs = native.counting_sort(keys, 1000)
    ks = keys[perm]
    assert (np.diff(ks) >= 0).all()
    assert offs[-1] == len(keys)
    assert (perm.astype(np.int64) == np.argsort(keys, kind="stable")).all()
    # offsets delimit buckets
    assert (np.searchsorted(ks, np.arange(1001)) == offs).all()


def test_gather_and_wrap():
    rng = np.random.default_rng(2)
    pos = rng.uniform(-50, 150, (10000, 3)).astype(np.float32)
    perm = rng.permutation(10000).astype(np.int32)
    assert np.allclose(native.gather(pos, perm), pos[perm])
    w = native.wrap_positions(pos.copy(), 100.0)
    assert (w >= 0).all() and (w < 100).all()
    assert np.allclose(np.mod(w - pos, 100.0) % 100.0, 0, atol=1e-3)


def test_morton_keys_match_device():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from velociraptor_stf_tpu.ops.cells import morton_keys as jk

    rng = np.random.default_rng(3)
    pos = rng.uniform(0, 1, (20000, 3)).astype(np.float32)
    knat = native.morton_keys(pos, [0, 0, 0], [1, 1, 1])
    kdev = np.asarray(jk(jnp.asarray(pos), jnp.zeros(3), jnp.ones(3)))
    # allow tiny discretisation differences at bin boundaries (f32 scaling)
    frac_same = (knat == kdev).mean()
    assert frac_same > 0.999
