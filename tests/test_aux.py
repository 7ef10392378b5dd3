"""Auxiliary subsystems: checkpoint/resume, warm starts, CLI, sparse ALM,
Netlib-scale synthetic instances."""

import json
import subprocess
import sys

import jax.numpy as jnp
import numpy as np
import pytest

import cholesky_is_magic_tpu as cim
from cholesky_is_magic_tpu.ingest import to_device_lp
from cholesky_is_magic_tpu.ingest.device import to_sparse_lp
from cholesky_is_magic_tpu.ingest.mps import read_mps_string
from cholesky_is_magic_tpu.solvers import (
    PDASConfig,
    alm,
    make_alm,
    make_pdas,
    pdas,
)
from cholesky_is_magic_tpu.solvers.alm import ALMConfig
from cholesky_is_magic_tpu.utils import checkpoint
from cholesky_is_magic_tpu.utils.testing import (
    netlib_like_lp,
    random_lp,
    scipy_reference_solution,
    write_mps,
)

import os

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")


def fixture_lp(dtype=jnp.float64, pad=8):
    sf = cim.to_standard_form(cim.read_mps_file(os.path.join(FIXTURES, "simple.mps")))
    return to_device_lp(sf, pad_multiple=pad, dtype=dtype)


class TestCheckpoint:
    def test_save_load_roundtrip(self, tmp_path):
        lp = fixture_lp()
        st = make_pdas(lp)
        res = pdas(st, PDASConfig(max_iters=5))
        import dataclasses

        mid = dataclasses.replace(
            st, x=res.x, y=res.extra["y"], w=res.extra["w"], z=res.extra["z"]
        )
        path = str(tmp_path / "ckpt")
        checkpoint.save(path, mid)
        restored = checkpoint.load(path, make_pdas(lp))
        np.testing.assert_array_equal(np.asarray(restored.x), np.asarray(mid.x))
        np.testing.assert_array_equal(np.asarray(restored.w), np.asarray(mid.w))

    def test_warm_start_from_checkpoint(self, tmp_path):
        lp = fixture_lp()
        res1 = pdas(make_pdas(lp), PDASConfig(max_iters=200))
        import dataclasses

        final = dataclasses.replace(
            make_pdas(lp), x=res1.x, y=res1.extra["y"], w=res1.extra["w"], z=res1.extra["z"]
        )
        path = str(tmp_path / "warm")
        checkpoint.save(path, final)
        restored = checkpoint.load(path, make_pdas(lp))
        res2 = pdas(make_pdas(lp, warm=restored), PDASConfig(max_iters=200))
        assert int(res2.iterations) <= int(res1.iterations)
        assert float(res2.objective) == pytest.approx(-7.0, abs=1e-3)

    @pytest.mark.slow
    def test_warm_push_resolve_perturbed_instance(self):
        """Cross-instance warm start (the serving re-solve pattern): a 2%
        objective drift moves the optimum; warm-starting pdas_dd from the
        old optimum WITHOUT re-opening the slacks stalls on the old
        active set, with warm_push it converges faster than cold."""
        import dataclasses

        from cholesky_is_magic_tpu.solvers.pdas_dd import make_pdas_dd, pdas_dd

        rng = np.random.default_rng(7)
        ineq = random_lp(5, n_ub=48, n_eq=12, n=96, density=0.15)
        sf = cim.to_standard_form(read_mps_string(write_mps(ineq)))
        lp = to_device_lp(sf, pad_multiple=64, dtype=jnp.float32)
        cfg = PDASConfig(gap_tol=1e-8, max_iters=200, refine_steps=2)
        res = pdas_dd(make_pdas_dd(lp), cfg)
        assert float(res.extra["gap"]) < 1e-8

        c = np.asarray(lp.c)
        drift = 1.0 + 0.02 * rng.standard_normal(c.shape).astype(c.dtype)
        lp2 = dataclasses.replace(lp, c=jnp.asarray(c * drift))
        warm = pdas_dd(make_pdas_dd(lp2, warm=res, warm_push=1e-2), cfg)
        assert float(warm.extra["gap"]) < 1e-8
        cold = pdas_dd(make_pdas_dd(lp2), cfg)
        assert int(warm.iterations) < int(cold.iterations)


class TestSparseALM:
    def test_ell_alm_matches_dense(self):
        sf = cim.to_standard_form(cim.read_mps_file(os.path.join(FIXTURES, "simple.mps")))
        dense_lp = to_device_lp(sf, pad_multiple=8, dtype=jnp.float64)
        sparse_lp = to_sparse_lp(sf, dtype=jnp.float64)
        cfg = ALMConfig(inner_iters=50_000, max_outer=100)
        r_dense = alm(make_alm(dense_lp), config=cfg)
        r_sparse = alm(make_alm(sparse_lp), config=cfg)
        assert float(r_sparse.value) == pytest.approx(float(r_dense.value), abs=1e-6)
        assert float(r_sparse.violation) < 1e-5


class TestNetlibScale:
    def test_sc205_scale_pdas(self):
        # End-to-end at Netlib sc205 scale (205x203) against the oracle.
        ineq = netlib_like_lp("sc205")
        status, fun, _ = scipy_reference_solution(ineq)
        assert status == 0
        sf = cim.to_standard_form(read_mps_string(write_mps(ineq)))
        lp = to_device_lp(sf, pad_multiple=64, dtype=jnp.float64)
        res = pdas(make_pdas(lp), PDASConfig(max_iters=400))
        assert float(res.objective) == pytest.approx(fun, rel=1e-3, abs=1e-3)

    def test_scales_table(self):
        from cholesky_is_magic_tpu.utils.testing import NETLIB_SCALES

        assert set(NETLIB_SCALES) == {"afiro", "adlittle", "sc205", "25fv47", "pilot"}
        ineq = netlib_like_lp("afiro")
        assert ineq.A_ub.shape[1] == 51


class TestCLI:
    # The subprocess must not register the axon TPU plugin: during a
    # tunnel outage the plugin BLOCKS at first device query regardless of
    # JAX_PLATFORM_NAME (docs/DEVNOTES.md "Tunnel outages"), hanging the
    # CLI until the 600 s timeout.  Clearing PALLAS_AXON_POOL_IPS skips
    # registration entirely; the in-process suite is already safe via
    # conftest's jax.config.update.
    CPU_ENV = {
        "JAX_PLATFORM_NAME": "cpu",
        "JAX_PLATFORMS": "cpu",
        "PALLAS_AXON_POOL_IPS": "",
    }

    def test_cli_pdas_json(self):
        out = subprocess.run(
            [
                sys.executable, "-m", "cholesky_is_magic_tpu",
                os.path.join(FIXTURES, "simple.mps"),
                "--solver", "pdas", "--f64", "--pad", "8", "--json",
            ],
            capture_output=True, text=True, timeout=600,
            env={**os.environ, **self.CPU_ENV},
        )
        assert out.returncode == 0, out.stderr[-2000:]
        payload = json.loads(out.stdout.strip().splitlines()[-1])
        assert payload["status"] == "optimal"
        assert payload["objective"] == pytest.approx(-7.0, abs=1e-3)

    def test_cli_report(self):
        out = subprocess.run(
            [
                sys.executable, "-m", "cholesky_is_magic_tpu",
                os.path.join(FIXTURES, "simple.mps"),
                "--solver", "affine", "--f64", "--pad", "8", "--report",
            ],
            capture_output=True, text=True, timeout=600,
            env={**os.environ, **self.CPU_ENV},
        )
        assert out.returncode == 0, out.stderr[-2000:]
        assert "Factor:" in out.stdout
