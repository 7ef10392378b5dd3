"""Diagnostics subsystem tests (SURVEY.md §5 parity)."""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

from cholesky_is_magic_tpu.kkt import dense_kkt_operator
from cholesky_is_magic_tpu.sparse import analyze
from cholesky_is_magic_tpu.utils import diag


def test_factor_report_format():
    rng = np.random.default_rng(0)
    A = (rng.random((16, 24)) < 0.2) * 1.0
    A[np.arange(16), np.arange(16)] = 1.0
    plan = analyze(sp.csc_matrix(A), block=8, use_native=False)
    report = diag.factor_report(plan)
    assert "AA':" in report and "Factor:" in report and "nnz" in report


def test_checked_kkt_passes_on_good_system():
    rng = np.random.default_rng(1)
    m, n = 6, 10
    A = jnp.asarray(rng.normal(size=(m, n)), jnp.float64)
    pos = lambda k: jnp.asarray(0.1 + rng.random(k), jnp.float64)
    op = dense_kkt_operator(A)
    deltas = diag.checked_solve_kkt_newton(
        pos(n), pos(n), pos(n), pos(n), op,
        pos(n), pos(n), jnp.asarray(rng.random(m), jnp.float64), pos(n),
    )
    assert bool(deltas.ok)


def test_checked_kkt_raises_on_singular():
    rng = np.random.default_rng(2)
    m, n = 4, 6
    A = jnp.zeros((m, n), jnp.float64)  # singular normal matrix
    one = jnp.ones(n, jnp.float64)
    op = dense_kkt_operator(A)
    with pytest.raises(Exception):
        diag.checked_solve_kkt_newton(
            one, one, one, one, op, one, one, jnp.ones(m, jnp.float64), one
        )


def test_live_buffer_report():
    rep = diag.live_buffer_report()
    assert rep["count"] >= 0 and rep["bytes"] >= 0
    x = jnp.ones((128, 128))
    rep2 = diag.live_buffer_report()
    assert rep2["bytes"] >= rep["bytes"]
    del x


def test_nan_debug_toggles():
    import jax

    before = jax.config.jax_debug_nans
    with diag.nan_debug(True):
        assert jax.config.jax_debug_nans is True
    assert jax.config.jax_debug_nans == before


class TestProfiler:
    @pytest.mark.slow
    def test_profile_trace_writes_a_trace(self, tmp_path):
        import os

        import jax.numpy as jnp

        from cholesky_is_magic_tpu.ops import dense as dense_ops
        from cholesky_is_magic_tpu.utils import diag

        logdir = str(tmp_path / "trace")
        A = jnp.ones((8, 16), jnp.float32)
        d = jnp.ones(16, jnp.float32)
        g = jnp.ones(8, jnp.float32)
        with diag.profile_trace(logdir):
            with diag.annotate("solve_normal"):
                y, ok = dense_ops.solve_normal(A, d, g)
                float(y[0])
        found = []
        for root, _dirs, files in os.walk(logdir):
            found.extend(files)
        assert found, "profiler trace directory is empty"


def test_memory_map_hygiene():
    """The map-count guard behind the suite's anti-segfault fixture
    (conftest._release_jit_maps; docs/DEVNOTES.md r3 "vm.max_map_count"):
    the count reads positive on Linux, a sky-high threshold never fires,
    and a zero threshold fires and still leaves jax usable."""
    import sys

    import jax.numpy as jnp

    from cholesky_is_magic_tpu.utils import diag

    n = diag.memory_map_count()
    if sys.platform.startswith("linux"):
        assert n > 0
    else:
        assert n == -1
        return
    assert diag.release_jit_maps(threshold=10**9) is False
    assert diag.release_jit_maps(threshold=0) is True
    assert float(jnp.asarray(2.0) * 3.0) == 6.0  # caches rebuild fine
