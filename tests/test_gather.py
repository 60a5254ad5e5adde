"""ops/gather.py: exactness of both gather formulations.

The XLA one-hot path runs natively on the CPU test backend; the Pallas
TPU kernel is exercised via interpret mode so its logic (hi/lo split,
static row unroll, per-sublane lane gather, padding) is CI-covered even
without TPU hardware."""
import numpy as np
import pytest

import jax.numpy as jnp

from vosk_tpu.ops.gather import _pallas_gather, onehot_gather, onehot_gather_i32


@pytest.mark.parametrize("B,P,N", [(2, 300, 1000), (3, 6008, 4096), (1, 64, 17)])
def test_onehot_gather_exact(B, P, N):
    rng = np.random.default_rng(0)
    table = rng.standard_normal((B, P)).astype(np.float32)
    idx = rng.integers(0, P, (B, N)).astype(np.int32)
    out = np.asarray(onehot_gather(jnp.asarray(table), jnp.asarray(idx)))
    ref = np.take_along_axis(table, idx, axis=1)
    np.testing.assert_array_equal(out, ref)


def test_onehot_gather_i32_full_range():
    rng = np.random.default_rng(1)
    table = rng.integers(-(2**31), 2**31 - 1, (2, 500), dtype=np.int64).astype(
        np.int32
    )
    idx = rng.integers(0, 500, (2, 700)).astype(np.int32)
    out = np.asarray(onehot_gather_i32(jnp.asarray(table), jnp.asarray(idx)))
    np.testing.assert_array_equal(out, np.take_along_axis(table, idx, axis=1))


@pytest.mark.parametrize("B,P,N", [(2, 300, 1000), (2, 6008, 5000)])
def test_pallas_gather_interpret(B, P, N):
    """The TPU kernel's logic, run through the Pallas interpreter."""
    rng = np.random.default_rng(2)
    table = rng.standard_normal((B, P)).astype(np.float32)
    idx = rng.integers(0, P, (B, N)).astype(np.int32)
    out = np.asarray(
        _pallas_gather(jnp.asarray(table), jnp.asarray(idx), interpret=True)
    )
    np.testing.assert_array_equal(out, np.take_along_axis(table, idx, axis=1))
