"""APPROX: accelerated parallel proximal coordinate descent, vectorized.

Reference: approx.lisp (v1, incl. the self-dual LP reformulation with
complementarity terms) and alm-approx.lisp (v2, the optimized redefinition
used by the ALM drivers) — SURVEY.md §2.9/2.10.

The reference's "parallel" coordinate descent is mathematical parallelism
(tau = n full-vector sampling, approx.lisp:3-4) executed serially in Lisp
dotimes loops; here it becomes actual hardware parallelism: one iteration is
two matvecs (MXU) plus elementwise prox work (VPU), and the whole driver is
a single lax.while_loop (SURVEY.md §2 checklist).

Problem representation: a sum of structured terms over variables v in
[l, u]:

- quadratic terms  1/2 (s_i (Q_i·v - q_i))^2  — rows of a padded dense
  matrix Q with rhs q and per-row scale s (make-quadratic,
  alm-approx.lisp:45-55; s = 0 marks padding);
- one linear term  c_lin·v (make-linear, :27-33);
- optional complementarity terms  +/-(v[a]-a0)(v[b]-b0) for the self-dual
  form (approx.lisp:85-92) — gathered/scattered by index.

ESO weights nu_j = sum_i beta_i s_i^2 Q_ij^2 with beta_i = nnz(Q_i)
(accumulate-nu, alm-approx.lisp:95-103), the prox step is the 0.95-damped
coordinate solve (solve-coordinate, :196-213), plus adaptive restart on
<g, z'-z> > 0 (:321-324).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from cholesky_is_magic_tpu.ingest.device import DeviceLP, SparseLP, round_up
from cholesky_is_magic_tpu.ops import bell as bell_ops
from cholesky_is_magic_tpu.ops import sparse_ops
from cholesky_is_magic_tpu.ops.sparse_ops import ELLMatrix
from cholesky_is_magic_tpu.utils.precision import highest_precision

BIG = 1e30  # encoded infinity (see ingest.device)


def _qmv(Q, v, QB=None):
    """Q @ v for a dense array or an ELLMatrix; rides the block-ELL
    rendering when one exists (23x the ELL gather on TPU at m=16k,
    HBM-bandwidth-bound — see ops.bell / SparseLP.EB)."""
    if QB is not None:
        return bell_ops.matvec(QB, v)
    if isinstance(Q, ELLMatrix):
        return sparse_ops.matvec(Q, v)
    return Q @ v


def _qrmv(Q, y, QTB=None):
    """Qᵀ @ y for a dense array or an ELLMatrix; rides the block-ELL of
    Qᵀ when one exists (7.4x over the XLA scatter-add at m=16k).  NOTE
    the measured TPU ordering of the fallbacks: the ELL scatter-add
    BEATS a plain-ELL gather of the pre-transposed matrix (1.10 vs
    1.50 ms at m=16k) — element gathers serialize just like scatters,
    so only whole-tile BELL products are worth a transposed operand."""
    if QTB is not None:
        return bell_ops.matvec(QTB, y)
    if isinstance(Q, ELLMatrix):
        return sparse_ops.rmatvec(Q, y)
    return Q.T @ y


@partial(
    jax.tree_util.register_dataclass,
    data_fields=[
        "Q", "QB", "QTB", "q", "s", "beta", "c_lin", "nu", "l", "u", "z0",
        "comp_a", "comp_b", "comp_a0", "comp_b0", "comp_sign",
    ],
    meta_fields=["n_quads", "n_vars"],
)
@dataclasses.dataclass(frozen=True)
class ApproxProblem:
    """min over l<=v<=u of  sum_i 1/2 (s_i (Q_i v - q_i))^2 + c_lin·v
    + sum_k comp_sign_k (v[comp_a_k] - comp_a0_k)(v[comp_b_k] - comp_b0_k)
    (+ constant z0)."""

    # INVARIANT: QB/QTB, when present, must be block-ELL renderings of
    # the SAME operator as Q — _qmv/_qrmv prefer them and never consult
    # Q, so a mismatched (Q, QB) pair yields silently wrong products.
    # The only constructor that passes them (_make_alm_subproblem_ell)
    # checks the logical shapes; a pytree __post_init__ would break
    # unflattening under transforms.  Internal call sites are
    # equivalence-tested (tests/test_bell.py).
    Q: jax.Array  # (P, N) padded dense, or an ELLMatrix
    QB: object  # ops.bell.BellMatrix of Q, or None (dense path / gated out)
    QTB: object  # ops.bell.BellMatrix of Qᵀ, or None
    q: jax.Array  # (P,)
    s: jax.Array  # (P,) per-quad scale; 0 on padded rows
    beta: jax.Array  # (P,) nnz per quad row (ESO beta, tau = n)
    c_lin: jax.Array  # (N,)
    nu: jax.Array  # (N,) ESO/Lipschitz weights
    l: jax.Array  # (N,)
    u: jax.Array  # (N,)
    z0: jax.Array  # scalar constant added to values
    # Complementarity terms (empty arrays when unused).
    comp_a: jax.Array  # (K,) int32 indices
    comp_b: jax.Array  # (K,) int32 indices
    comp_a0: jax.Array  # (K,)
    comp_b0: jax.Array  # (K,)
    comp_sign: jax.Array  # (K,) +/-1; 0 marks padding
    n_quads: int
    n_vars: int


def _no_comp(dtype):
    z = jnp.zeros((0,), dtype=dtype)
    return dict(
        comp_a=jnp.zeros((0,), jnp.int32),
        comp_b=jnp.zeros((0,), jnp.int32),
        comp_a0=z,
        comp_b0=z,
        comp_sign=z,
    )


def make_alm_subproblem(lp, lam: jax.Array, mu) -> ApproxProblem:
    """The ALM subproblem (make-alm-subproblem, alm-approx.lisp:355-401):

        min  (c + Aᵀλ)·x + mu/2 ||Ax - b||^2 + z0,   z0 = -λ·b,

    i.e. quads = rows of A with rhs b and scale sqrt(mu), linear term
    c + Aᵀλ.  jit-safe: all arithmetic is on padded arrays, so the outer
    ALM loop can rebuild the subproblem inside lax.while_loop.

    Accepts a dense padded DeviceLP or an ELL-backed SparseLP — the latter
    keeps everything at nnz(A) cost (the truly matrix-free at-scale path).
    """
    if isinstance(lp, SparseLP):
        return _make_alm_subproblem_ell(lp, lam, mu)
    dtype = lp.A.dtype
    mu = jnp.asarray(mu, dtype=dtype)
    s = jnp.where(lp.row_mask, jnp.sqrt(mu), 0.0).astype(dtype)
    beta = jnp.sum((lp.A != 0), axis=1).astype(dtype)
    c_lin = jnp.where(lp.col_mask, lp.c + lp.A.T @ lam, 0.0)
    nu = (((beta * s * s)[None, :] @ (lp.A * lp.A))[0]).astype(dtype)
    z0 = -jnp.dot(lam, lp.b)
    return ApproxProblem(
        Q=lp.A,
        QB=None,
        QTB=None,
        q=lp.b,
        s=s,
        beta=beta,
        c_lin=c_lin,
        nu=nu,
        l=jnp.where(lp.col_mask, lp.l, 0.0),
        u=jnp.where(lp.col_mask, lp.u, 0.0),
        z0=z0,
        n_quads=lp.m,
        n_vars=lp.n,
        **_no_comp(dtype),
    )


def _make_alm_subproblem_ell(lp: SparseLP, lam: jax.Array, mu) -> ApproxProblem:
    E = lp.E
    # Shape check for the (Q, QB/QTB) consistency invariant on
    # ApproxProblem — static shapes, so this is jit-trace-safe.
    if lp.EB is not None:
        assert lp.EB.shape == (lp.m, lp.n), (lp.EB.shape, lp.m, lp.n)
    if lp.ETB is not None:
        assert lp.ETB.shape == (lp.n, lp.m), (lp.ETB.shape, lp.n, lp.m)
    dtype = E.values.dtype
    mu = jnp.asarray(mu, dtype=dtype)
    s = jnp.full((lp.m,), jnp.sqrt(mu), dtype=dtype)
    beta = jnp.sum(E.values != 0, axis=1).astype(dtype)
    # Transpose products ride the block-ELL of Aᵀ when the pattern
    # admits one (HBM-bandwidth products; see SparseLP.EB/ETB), else the
    # ELL scatter-add.  The squared-operand product for nu reuses the
    # same layout: padded tiles/slots are zero, so squaring keeps them
    # inert.
    if lp.ETB is not None:
        c_lin = lp.c + bell_ops.matvec(lp.ETB, lam)
        ETB2 = dataclasses.replace(lp.ETB, blocks=lp.ETB.blocks * lp.ETB.blocks)
        nu = bell_ops.matvec(ETB2, beta * s * s)
    else:
        c_lin = lp.c + sparse_ops.rmatvec(E, lam)
        E2 = E._replace(values=E.values * E.values)
        nu = sparse_ops.rmatvec(E2, beta * s * s)
    z0 = -jnp.dot(lam, lp.b)
    return ApproxProblem(
        Q=E,
        QB=lp.EB,
        QTB=lp.ETB,
        q=lp.b,
        s=s,
        beta=beta,
        c_lin=c_lin,
        nu=nu,
        l=lp.l,
        u=lp.u,
        z0=z0,
        n_quads=lp.m,
        n_vars=lp.n,
        **_no_comp(dtype),
    )


def make_approx_selfdual(
    lp: DeviceLP,
    complementarity: bool = False,
    scale: bool = True,
    l1_penalty: float = 0.0,
    pad_multiple: int = 128,
) -> ApproxProblem:
    """The self-dual reformulation (make-approx, approx.lisp:195-299).

    Stacked variables v = (x, y, z, w) with x in [l,u], y sign-bounded by
    row type, z, w >= 0 (fixed at 0 when the matching bound is infinite).
    Quadratic terms: |A x - b| rows, |Aᵀy + z - w - c| rows, and the
    duality-gap row c·x - b·y - l·z + u·w = 0; optional complementarity
    terms z_i(x_i - l_i), w_i(u_i - x_i) and an l1 penalty linear term.
    Built host-side with numpy (it is ingest-time work), returns padded
    device arrays.
    """
    m, n = lp.m, lp.n
    A = np.asarray(lp.A, np.float64)[:m, :n]
    b = np.asarray(lp.b, np.float64)[:m]
    c = np.asarray(lp.c, np.float64)[:n]
    l = np.asarray(lp.l, np.float64)[:n]
    u = np.asarray(lp.u, np.float64)[:n]
    row_type = np.asarray(lp.row_type)[:m]

    NV = 3 * n + m  # x | y | z | w
    ix = np.arange(n)
    iy = n + np.arange(m)
    iz = n + m + np.arange(n)
    iw = n + m + n + np.arange(n)

    lo = np.full(NV, -np.inf)
    hi = np.full(NV, np.inf)
    lo[ix], hi[ix] = l, u
    # Row-type sign bounds on y (approx.lisp:263-266): '<' rows force
    # y <= 0, '>' rows force y >= 0.
    from cholesky_is_magic_tpu.ingest.standard_form import StandardForm

    hi[iy[row_type == StandardForm.ROW_LE]] = 0.0
    lo[iy[row_type == StandardForm.ROW_GE]] = 0.0
    # z, w >= 0; fixed at 0 when the matching bound is infinite
    # (approx.lisp:216-244).
    z_active = l > -1e8
    w_active = u < 1e8
    lo[iz] = 0.0
    hi[iz] = np.where(z_active, np.inf, 0.0)
    lo[iw] = 0.0
    hi[iw] = np.where(w_active, np.inf, 0.0)

    P = m + n + 1  # primal rows, dual rows, gap row
    Q = np.zeros((P, NV))
    q = np.zeros(P)
    # Primal rows: A x - b.
    Q[:m, ix] = A
    q[:m] = b
    # Dual rows: Aᵀ y + z - w - c.
    Q[m : m + n, :][:, iy] = A.T
    Q[m + np.arange(n), iz] = np.where(z_active, 1.0, 0.0)
    Q[m + np.arange(n), iw] = np.where(w_active, -1.0, 0.0)
    q[m : m + n] = c
    # Gap row: c·x - b·y - l·z + u·w = 0.
    Q[m + n, ix] = c
    Q[m + n, iy] = -b
    Q[m + n, iz] = np.where(z_active, -l, 0.0)
    Q[m + n, iw] = np.where(w_active, u, 0.0)
    q[m + n] = 0.0

    s = np.ones(P)
    if scale:
        # v1 scale-quadratic (approx.lisp:67-71): scale = 1/||(coefs, rhs)||.
        norm = np.sqrt((Q**2).sum(axis=1) + q**2)
        s = np.where(norm > 1e-6, 1.0 / np.where(norm == 0, 1.0, norm), 1.0)
    beta = (Q != 0).sum(axis=1).astype(np.float64)
    nu = ((beta * s * s)[:, None] * Q * Q).sum(axis=0)

    # l1 penalty linear term (approx.lisp:269-287).
    c_lin = np.zeros(NV)
    if l1_penalty:
        one_sided_neg = (l == -np.inf) & (u < np.inf)
        one_sided_pos = (l > -np.inf) & (u == np.inf)
        c_lin[ix] = np.where(
            one_sided_neg, -l1_penalty, np.where(one_sided_pos, l1_penalty, 0.0)
        )
        c_lin[iz] = l1_penalty
        c_lin[iw] = l1_penalty

    # Complementarity terms z_i (x_i - l_i) and w_i (u_i - x_i)
    # (approx.lisp:85-92, 222-243): sign +1 for (x-l)z, and the flipped
    # (u-x)w becomes -(x-u)w.
    comp_a, comp_b, comp_a0, comp_b0, comp_sign = [], [], [], [], []
    if complementarity:
        for i in range(n):
            if z_active[i]:
                comp_a.append(ix[i]); comp_b.append(iz[i])
                comp_a0.append(l[i]); comp_b0.append(0.0); comp_sign.append(1.0)
            if w_active[i]:
                comp_a.append(ix[i]); comp_b.append(iw[i])
                comp_a0.append(u[i]); comp_b0.append(0.0); comp_sign.append(-1.0)

    # Pad everything to static shapes.
    NVp = round_up(max(NV, 1), pad_multiple)
    Pp = round_up(max(P, 1), pad_multiple)
    dtype = lp.A.dtype

    def padv(v, size, fill=0.0):
        out = np.full(size, fill)
        out[: len(v)] = v
        return jnp.asarray(out, dtype=dtype)

    Qp = np.zeros((Pp, NVp))
    Qp[:P, :NV] = Q
    K = len(comp_a)
    lo = np.clip(lo, -BIG, BIG)
    hi = np.clip(hi, -BIG, BIG)
    return ApproxProblem(
        Q=jnp.asarray(Qp, dtype=dtype),
        QB=None,
        QTB=None,
        q=padv(q, Pp),
        s=padv(s, Pp),  # padded rows scale 0 => inert
        beta=padv(beta, Pp),
        c_lin=padv(c_lin, NVp),
        nu=padv(nu, NVp),
        l=padv(lo, NVp),
        u=padv(hi, NVp),
        z0=jnp.asarray(0.0, dtype=dtype),
        comp_a=jnp.asarray(np.asarray(comp_a, np.int32).reshape(K)),
        comp_b=jnp.asarray(np.asarray(comp_b, np.int32).reshape(K)),
        comp_a0=jnp.asarray(np.asarray(comp_a0, np.float64).reshape(K), dtype=dtype),
        comp_b0=jnp.asarray(np.asarray(comp_b0, np.float64).reshape(K), dtype=dtype),
        comp_sign=jnp.asarray(np.asarray(comp_sign, np.float64).reshape(K), dtype=dtype),
        n_quads=P,
        n_vars=NV,
    )


def value_and_gradient(prob: ApproxProblem, v: jax.Array):
    """One pass over every term (value-&-gradient, alm-approx.lisp:177-194):
    value, gradient, and the max |term violation| — two matvecs + prox-free
    elementwise work.  Padded quad rows have s = 0 and vanish."""
    r = prob.s * (_qmv(prob.Q, v, prob.QB) - prob.q)
    value = 0.5 * jnp.sum(r * r) + jnp.dot(prob.c_lin, v)
    g = _qrmv(prob.Q, prob.s * r, prob.QTB) + prob.c_lin
    maxviol = jnp.max(jnp.abs(r)) if r.shape[0] else jnp.asarray(0.0, v.dtype)
    if prob.comp_a.shape[0]:
        va = v[prob.comp_a] - prob.comp_a0
        vb = v[prob.comp_b] - prob.comp_b0
        cv = prob.comp_sign * va * vb
        value = value + jnp.sum(cv)
        g = g.at[prob.comp_a].add(prob.comp_sign * vb)
        g = g.at[prob.comp_b].add(prob.comp_sign * va)
        maxviol = jnp.maximum(maxviol, jnp.max(jnp.abs(cv)))
    return value, g, maxviol


def dual_value(prob: ApproxProblem, v: jax.Array):
    """z0 + linear-term value (dual-value, alm-approx.lisp:139-143)."""
    return prob.z0 + jnp.dot(prob.c_lin, v)


def quad_violations(prob: ApproxProblem, v: jax.Array):
    """Raw (unscaled) per-quad residuals Q v - q, zero on padded rows —
    `violation c x nil` as used by the ALM outer loop (alm-approx.lisp:507-511)."""
    return jnp.where(prob.s != 0, _qmv(prob.Q, v, prob.QB) - prob.q, 0.0)


def _solve_coordinate(z, nu, theta, g, l, u):
    """0.95-damped prox step per coordinate (solve-coordinate,
    alm-approx.lisp:196-213), including the nu*theta = 0 degenerate case."""
    step = theta * nu
    best = z - 0.95 * g / jnp.where(step == 0, 1.0, step)
    proxed = jnp.clip(best, l, u)
    degenerate = jnp.where(g < 0, u, jnp.where(g == 0, z, l))
    return jnp.where(step == 0, degenerate, proxed)


def complementarity_violation(prob: ApproxProblem, v: jax.Array):
    """Total complementarity violation sum of sign·(v[a]-a0)(v[b]-b0) over
    active terms (complementarity-violation, approx.lisp:154-170) — the v1
    driver reports this alongside the projected gradient."""
    if not prob.comp_a.shape[0]:
        return jnp.asarray(0.0, v.dtype)
    va = v[prob.comp_a] - prob.comp_a0
    vb = v[prob.comp_b] - prob.comp_b0
    return jnp.sum(jnp.abs(prob.comp_sign * va * vb))


def project_box(prob: ApproxProblem, v):
    return jnp.clip(v, prob.l, prob.u)


def projected_gradient_norm(prob: ApproxProblem, v, g):
    """||v - clip(v - g)||_2 (project-gradient, alm-approx.lisp:264-280)."""
    p = v - jnp.clip(v - g, prob.l, prob.u)
    return jnp.linalg.norm(p)


class ApproxResult(NamedTuple):
    x: jax.Array
    pg: jax.Array  # final projected-gradient norm
    iterations: jax.Array
    value: jax.Array  # final primal value (incl. z0)


def approx(
    prob: ApproxProblem,
    max_iters: int,
    x0: Optional[jax.Array] = None,
    accuracy: float | jax.Array = 1e-5,
) -> ApproxResult:
    """The accelerated driver (approx, alm-approx.lisp:307-346):

    y = (1-theta) x + theta z;  z' = prox(z, grad f(y));  x' = y + theta(z'-z);
    theta' = (sqrt((theta^2+4)theta^2) - theta^2)/2, with adaptive restart
    when <grad f(z'), z'-z> > 0 and stop at ||projected grad|| < accuracy
    after 10 iterations.
    """
    x_init = project_box(prob, x0 if x0 is not None else jnp.zeros_like(prob.c_lin))
    return _approx_jit(prob, x_init, jnp.asarray(accuracy, x_init.dtype), max_iters)


@highest_precision
@partial(jax.jit, static_argnames=("max_iters",))
def _approx_jit(prob: ApproxProblem, x_init, accuracy, max_iters: int) -> ApproxResult:
    def body(carry):
        x, z, theta, i, _pg, _val, _done = carry
        y = (1.0 - theta) * x + theta * z
        _, gy, _ = value_and_gradient(prob, y)
        zp = _solve_coordinate(z, prob.nu, theta, gy, prob.l, prob.u)
        x_new = y + theta * (zp - z)
        theta_new = 0.5 * (
            jnp.sqrt((theta * theta + 4.0) * theta * theta) - theta * theta
        )
        value, g, _ = value_and_gradient(prob, zp)
        restart = jnp.dot(g, zp - z) > 0  # adaptive restart (:321-324)
        x_next = jnp.where(restart, z, x_new)
        theta_next = jnp.where(restart, 1.0, theta_new)
        z_next = jnp.where(restart, z, zp)
        pg = projected_gradient_norm(prob, z_next, g)
        done = (i > 10) & (pg < accuracy)
        return x_next, z_next, theta_next, i + 1, pg, value + prob.z0, done

    def cond(carry):
        _x, _z, _theta, i, _pg, _val, done = carry
        return ~done & (i < max_iters)

    one = jnp.asarray(1.0, x_init.dtype)
    inf = jnp.asarray(np.inf, x_init.dtype)
    x, z, _theta, iters, pg, value, _done = jax.lax.while_loop(
        cond,
        body,
        (x_init, x_init, one, jnp.asarray(0, jnp.int32), inf, inf, jnp.asarray(False)),
    )
    return ApproxResult(x=z, pg=pg, iterations=iters, value=value)


# ---------------------------------------------------------------------------
# Double-word inner driver: the f32 ALM wall is a PRECISION wall (measured:
# host f64 of the same algorithm reaches viol+pg < 1e-5 where f32 floors at
# pg ~1e-2 — examples/alm_e2e_verdict.py).  The cancellation lives in
# r = Ax - b (O(1) operands, ~1e-7 result) and in g = mu·Aᵀr + c + Aᵀλ
# (large terms summing to ~1e-5), and the iterate updates near convergence
# are below ulp(z).  So this driver carries x, z AND the gradient pipeline
# in double-word (ops.dd), riding the block-ELL dd products
# (ops.bell.dd_matvec_dd) — the TPU rendering of the reference's f64 inner
# loop (approx, alm-approx.lisp:307-346), reached via ALMConfig.dd_gradient.
# ---------------------------------------------------------------------------


def _dd_ops(lp):
    """(matvec_dd, rmatvec_dd) for a SparseLP (block-ELL required — the
    plain-ELL dd scatter serializes on TPU) or a dense DeviceLP."""
    from cholesky_is_magic_tpu.ops import dd as ddm

    if isinstance(lp, SparseLP):
        if lp.EB is None or lp.ETB is None:
            raise ValueError(
                "ALMConfig.dd_gradient needs block-ELL operands (SparseLP"
                ".EB/ETB); this pattern was gated out by ops.bell.from_coo"
                " — raise max_bytes in to_sparse_lp or use the dense path."
            )
        return (lambda v: bell_ops.dd_matvec_dd(lp.EB, v),
                lambda t: bell_ops.dd_matvec_dd(lp.ETB, t))
    return (lambda v: ddm.dd_matvec_dd(lp.A, v),
            lambda t: ddm.dd_rmatvec_dd(lp.A, t))


def _approx_dd(lp, prob: ApproxProblem, lam, mu, x0, accuracy,
               max_iters: int):
    """Accelerated APPROX in double-word: same iteration as _approx_jit
    (0.95-damped prox, theta schedule, adaptive restart, stop at
    ||proj grad|| < accuracy after 10 iters) with dd iterates and an
    exactly-fused gradient  g = Aᵀ(mu·r + λ) + c,  r = Ax - b  (the λ
    fold-in costs nothing: same two products per evaluation as the f32
    path's precomputed c_lin).  f32 heads are returned where callers want
    working precision; |lo| <= ulp(hi)/2 so hi IS the rounded value.

    Returns (z: DD, pg, iterations, r_z: DD) with r_z the double-word
    primal residual at z — the outer loop's violation measurement, which
    in f32 would floor at the very cancellation this driver removes.
    """
    from cholesky_is_magic_tpu.ops import dd as ddm

    mv, rmv = _dd_ops(lp)
    b, c = prob.q, lp.c
    l, u = prob.l, prob.u
    nu = prob.nu
    mu = jnp.asarray(mu, l.dtype)

    def grad(v):
        r = ddm.dd_add_w(mv(v), -b)
        t = ddm.dd_add_w(ddm.dd_scale(r, mu), lam)
        g = ddm.dd_add_w(rmv(t), c)
        return g, r

    def prox(z, theta, g):
        step = theta * nu
        inv = 0.95 / jnp.where(step == 0, 1.0, step)
        best = ddm.dd_sub(z, ddm.dd_scale(g, inv))
        proxed = ddm.dd_clip(best, l, u)
        zero = jnp.zeros_like(l)
        degenerate = ddm.dd_where(
            g.hi < 0, ddm.DD(u, zero),
            ddm.dd_where((g.hi == 0) & (g.lo == 0), z, ddm.DD(l, zero)))
        return ddm.dd_where(step == 0, degenerate, proxed)

    def dd_axpy(a, x, s, y):
        # a*x + s*y for f32 scalars a, s and DD vectors x, y.
        return ddm.dd_add(ddm.dd_scale(x, a), ddm.dd_scale(y, s))

    def body(carry):
        x, z, theta, i, _pg, _done = carry
        y = dd_axpy(1.0 - theta, x, theta, z)
        gy, _ = grad(y)
        zp = prox(z, theta, gy)
        dz = ddm.dd_sub(zp, z)
        x_new = ddm.dd_add(y, ddm.dd_scale(dz, theta))
        theta_new = 0.5 * (
            jnp.sqrt((theta * theta + 4.0) * theta * theta) - theta * theta
        )
        g, _ = grad(zp)
        # Restart test <g, zp - z> with the eps^2 cross terms kept.
        dot = (jnp.dot(g.hi, dz.hi)
               + jnp.dot(g.hi, dz.lo) + jnp.dot(g.lo, dz.hi))
        restart = dot > 0
        x_next = ddm.dd_where(restart, z, x_new)
        z_next = ddm.dd_where(restart, z, zp)
        theta_next = jnp.where(restart, 1.0, theta_new)
        proj = ddm.dd_sub(z_next, ddm.dd_clip(ddm.dd_sub(z_next, g), l, u))
        pg = jnp.linalg.norm(proj.hi + proj.lo)
        done = (i > 10) & (pg < accuracy)
        return x_next, z_next, theta_next, i + 1, pg, done

    def cond(carry):
        _x, _z, _theta, i, _pg, done = carry
        return ~done & (i < max_iters)

    one = jnp.asarray(1.0, l.dtype)
    inf = jnp.asarray(np.inf, l.dtype)
    x0 = ddm.dd_clip(x0, l, u)
    _x, z, _theta, iters, pg, _done = jax.lax.while_loop(
        cond, body,
        (x0, x0, one, jnp.asarray(0, jnp.int32), inf, jnp.asarray(False)),
    )
    r_z = ddm.dd_add_w(mv(z), -b)
    return z, pg, iters, r_z
