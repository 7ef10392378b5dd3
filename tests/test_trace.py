"""Per-iteration traces: every solver family records what the reference
prints to stdout each iteration (affine-scaling.lisp:189-191,254-263;
primal-dual-affine-scaling.lisp:336-338,376; alm-approx.lisp:533-536,465),
and the CLI can replay them."""

import os

import jax.numpy as jnp
import numpy as np

import cholesky_is_magic_tpu as cim
from cholesky_is_magic_tpu.ingest import to_device_lp
from cholesky_is_magic_tpu.ingest.mps import read_mps_string
from cholesky_is_magic_tpu.utils.testing import random_lp, write_mps

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")
SIMPLE = os.path.join(FIXTURES, "simple.mps")


def fixture_lp(dtype=jnp.float64, pad=16):
    sf = cim.to_standard_form(cim.read_mps_file(SIMPLE))
    return to_device_lp(sf, pad_multiple=pad, dtype=dtype)


def _filled(series, n):
    arr = np.asarray(series)
    assert arr.shape[0] >= n > 0
    assert np.isfinite(arr[:n]).all(), arr[:n]
    assert np.isnan(arr[n:]).all()  # untouched tail stays NaN


def test_pdas_trace_fills():
    from cholesky_is_magic_tpu.solvers import PDASConfig, make_pdas, pdas

    res = pdas(make_pdas(fixture_lp()), PDASConfig(max_iters=60, record_trace=True))
    n = int(res.iterations)
    tr = res.extra["trace"]
    _filled(tr["gap"], n)
    _filled(tr["objective"], n)
    # steps include inf on repair/recenter iterations: finite OR +inf.
    steps = np.asarray(tr["step"])[:n]
    assert not np.isnan(steps).any()


def test_pdas_dd_trace_fills():
    from cholesky_is_magic_tpu.solvers import PDASConfig
    from cholesky_is_magic_tpu.solvers.pdas_dd import make_pdas_dd, pdas_dd

    res = pdas_dd(
        make_pdas_dd(fixture_lp(jnp.float32)),
        PDASConfig(max_iters=60, gap_tol=1e-8, refine_steps=2, record_trace=True),
    )
    n = int(res.iterations)
    tr = res.extra["trace"]
    _filled(tr["gap"], n)
    _filled(tr["objective"], n)
    _filled(tr["step"], n)
    # The recorded gap series reaches the final reported gap.
    assert np.nanmin(np.asarray(tr["gap"])) <= float(res.extra["gap"]) * 1.01


def test_affine_trace_fills():
    from cholesky_is_magic_tpu.solvers import AffineConfig, affine_scaling, make_affine_state

    res = affine_scaling(
        make_affine_state(fixture_lp()),
        AffineConfig(max_iters=100, record_trace=True),
    )
    n = int(res.iterations)
    tr = res.extra["trace"]
    _filled(tr["objective"], n)
    _filled(tr["residual"], n)
    _filled(tr["step"], n)


def test_alm_trace_fills():
    from cholesky_is_magic_tpu.solvers import alm, make_alm
    from cholesky_is_magic_tpu.solvers.alm import ALMConfig

    res = alm(
        make_alm(fixture_lp()),
        config=ALMConfig(max_outer=200, record_trace=True),
    )
    n = int(res.outer_iterations)
    _filled(res.trace["violation"], n)
    _filled(res.trace["mu"], n)
    _filled(res.trace["pg"], n)
    _filled(res.trace["value"], n)
    # mu follows the LANCELOT-style monotone schedule.
    mu = np.asarray(res.trace["mu"])[:n]
    assert (np.diff(mu) >= -1e-9).all()


def test_cli_prints_trace(capsys):
    from cholesky_is_magic_tpu.__main__ import main

    rc = main([SIMPLE, "--solver", "pdas", "--trace", "--pad", "16",
               "--max-iters", "60"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "iter " in out and "gap=" in out


def test_cli_prints_alm_trace(capsys):
    from cholesky_is_magic_tpu.__main__ import main

    rc = main([SIMPLE, "--solver", "alm", "--trace", "--pad", "16",
               "--max-iters", "200"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "iter " in out and "mu=" in out
