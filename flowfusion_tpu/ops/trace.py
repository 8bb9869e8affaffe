"""Jacobian-trace (divergence) estimators for CNF log-likelihoods.

Four strategies with the same semantics as the reference dispatch in
``ScoreModel.forward`` (/root/reference/flowfusion/diffusion.py:281-508):

  * ``exact``      — per-sample trace of the Jacobian.  The reference uses
    reverse-mode (``jacrev`` under ``vmap``, diffusion.py:483-503); here we
    use *forward*-mode ``jacfwd``: for the small state dimensions this
    library targets (D <~ 20), D JVP columns are cheaper on TPU than D VJP
    rows and need no transpose program.
  * ``hutchinson`` — probe estimate e^T J e with a fixed Rademacher probe.
    The reference computes e^T J via VJP (diffusion.py:327-334); we compute
    J e via a single JVP — the two contractions give the *same scalar*
    e^T J e for a fixed probe, and forward mode is one fused pass.
  * ``hutchpp``    — Hutch++ (low-rank QR sketch + residual Hutchinson),
    mirroring diffusion.py:336-400 including the ``stop_gradient`` on the
    sketches (the reference ``.detach()``s them).
  * ``xtrace``     — Epperly et al. XTrace leave-one-out estimator,
    mirroring diffusion.py:402-481.

Probes are sampled once per solve and held fixed across every RHS
evaluation so the augmented ODE stays smooth for the adaptive solver
(reference samples them in ``solve_odes_forward``, diffusion.py:697-721).
Here they are explicit arguments — no hidden state.

Hutch++/XTrace apply the probe operator through batched JVPs (A = J; the
reference uses VJPs, A = J^T, diffusion.py:361-373 — the trace is
transpose-invariant, and forward mode is ~1.5x faster on TPU).
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp

__all__ = [
    "rademacher",
    "exact_divergence",
    "hutchinson_divergence",
    "hutchpp_divergence",
    "xtrace_divergence",
    "divergence_fn",
    "make_probes",
]


def rademacher(key: jax.Array, shape, dtype=jnp.float32) -> jax.Array:
    """sign(N(0,1)) probes — matches the reference's torch.sign(randn)."""
    return jnp.sign(jax.random.normal(key, shape, dtype))


def exact_divergence(
    f: Callable[[jax.Array], jax.Array], x: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """Exact divergence via D forward-mode JVP columns.

    ``f`` maps a batch (B, D) -> (B, D) and must be *batch-elementwise*
    (row i of the output depends only on row i of the input — true for
    every RHS in this library, whose networks act row-wise).  Then the
    batched Jacobian is block-diagonal and column d of each per-sample
    Jacobian is one JVP with the broadcast basis tangent e_d:
    div = sum_d [J e_d]_d.  D JVPs total — for the small D this library
    targets, forward mode beats reverse (no transpose program), and the
    batched formulation handles closures over batched conditionals.
    """
    x_dot = f(x)
    D = x.shape[-1]
    div = jnp.zeros(x.shape[:-1], x.dtype)
    for d in range(D):
        tangent = jnp.zeros_like(x).at[..., d].set(1.0)
        _, jcol = jax.jvp(f, (x,), (tangent,))
        div = div + jcol[..., d]
    return x_dot, div


def hutchinson_divergence(
    f: Callable[[jax.Array], jax.Array], x: jax.Array, e: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """Skilling--Hutchinson estimate e^T J e with one JVP."""
    x_dot, je = jax.jvp(f, (x,), (e,))
    div = jnp.sum(je * e, axis=tuple(range(1, x.ndim)))
    return x_dot, div


def _batched_vjp(f, x):
    """Return (f(x), operator v -> A v batched over a leading probe axis).

    The reference applies A = J^T via VJPs (diffusion.py:361-373); the
    trace is transpose-invariant, so this framework applies A = J via
    JVPs instead — forward mode needs no transpose program and measures
    ~1.5x faster Hutch++ likelihood solves on TPU (BENCHMARKS.md).  The
    sketch/leave-one-out algebra downstream is unchanged, just running on
    J rather than J^T; estimator statistics are identical.
    """
    x_dot = f(x)

    def apply(v):  # v: (n, B, D)
        return jax.vmap(lambda vi: jax.jvp(f, (x,), (vi,))[1])(v)

    return x_dot, apply


def hutchpp_divergence(
    f: Callable[[jax.Array], jax.Array],
    x: jax.Array,
    S: jax.Array,
    G: jax.Array,
) -> Tuple[jax.Array, jax.Array]:
    """Hutch++: tr(Q^T A Q) + (1/m) tr(U^T A U), U = (I - QQ^T) G.

    ``S``: (r, B, D) sketch probes, ``G``: (m, B, D) residual probes.
    """
    m = G.shape[0]
    x_dot, Av = _batched_vjp(f, x)

    Y = jnp.transpose(Av(S), (1, 2, 0))  # (B, D, r)
    Y = jax.lax.stop_gradient(Y)
    Q, _ = _batched_thin_qr(Y)  # (B, D, k)

    AQ = jnp.transpose(Av(jnp.transpose(Q, (2, 0, 1))), (1, 2, 0))  # (B, D, k)
    AQ = jax.lax.stop_gradient(AQ)
    trace_lr = jnp.einsum("bdk,bdk->b", Q, AQ)

    G_perm = jnp.transpose(G, (1, 2, 0))  # (B, D, m)
    QtG = jnp.einsum("bdk,bdm->bkm", Q, G_perm)
    U = G_perm - jnp.einsum("bdk,bkm->bdm", Q, QtG)

    AU = jnp.transpose(Av(jnp.transpose(U, (2, 0, 1))), (1, 2, 0))  # (B, D, m)
    AU = jax.lax.stop_gradient(AU)
    trace_res = jnp.einsum("bdm,bdm->b", U, AU)

    return x_dot, trace_lr + trace_res / float(m)


def _batched_thin_qr(Y: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Thin QR of (B, D, m) stacks with m small and static.

    Modified Gram--Schmidt unrolled over the m columns: pure batched
    elementwise/reduction arithmetic.  ``jnp.linalg.qr`` on tiny batched
    matrices lowers to a Householder loop the TPU executes serially per
    matrix — measured 18x slower end-to-end on the XTrace likelihood solve
    (benchmarks/results.json logprob/xtrace before/after).  Near-zero
    column norms (degenerate sketches) are floored like _tri_inv_upper so
    a bad draw yields a bounded estimate instead of NaN.
    """
    B, D, m = Y.shape
    scale = jnp.sqrt(jnp.sum(Y * Y, axis=(-2, -1)))  # (B,)
    floor = jnp.maximum(scale * 1e-6, 1e-30)
    eye = jnp.eye(D, dtype=Y.dtype)
    q_cols = []
    r_rows = [[None] * m for _ in range(m)]
    for j in range(m):
        v = Y[:, :, j]
        for i in range(j):
            r_ij = jnp.sum(q_cols[i] * v, axis=-1)  # (B,)
            r_rows[i][j] = r_ij
            v = v - r_ij[:, None] * q_cols[i]
        r_jj = jnp.sqrt(jnp.sum(v * v, axis=-1))
        r_rows[j][j] = r_jj

        # Rank-deficient column (e.g. collided Rademacher probes): complete
        # the basis like Householder QR would — orthogonalize the canonical
        # basis vectors against the accepted columns and take the one with
        # the largest residual.  Q stays orthonormal (Hutch++'s full-rank
        # exactness depends on it); R keeps the ~0 entry, so QR = Y holds.
        res = jnp.broadcast_to(eye[None], (B, D, D))
        for i in range(j):
            proj = jnp.einsum("bcd,bd->bc", res, q_cols[i])
            res = res - proj[..., None] * q_cols[i][:, None, :]
        res_norm = jnp.sqrt(jnp.sum(res * res, axis=-1))  # (B, D)
        best = jnp.argmax(res_norm, axis=-1)
        q_fb = jnp.take_along_axis(res, best[:, None, None], axis=1)[:, 0]
        q_fb = q_fb / jnp.maximum(
            jnp.take_along_axis(res_norm, best[:, None], axis=1), 1e-30
        )
        degenerate = (r_jj < floor)[:, None]
        q_j = jnp.where(
            degenerate, q_fb, v / jnp.maximum(r_jj, floor)[:, None]
        )
        q_cols.append(q_j)
    zeros = jnp.zeros(Y.shape[0], Y.dtype)
    R = jnp.stack(
        [
            jnp.stack([r_rows[i][j] if j >= i else zeros for j in range(m)], axis=1)
            for i in range(m)
        ],
        axis=1,
    )  # (B, m, m)
    Q = jnp.stack(q_cols, axis=2)  # (B, D, m)
    return Q, R


def _tri_inv_upper(R: jax.Array) -> jax.Array:
    """Batched inverse of small upper-triangular matrices (B, k, k).

    Unrolled back-substitution over the static (small) k — pure
    elementwise arithmetic, so it lowers cleanly on TPU where
    ``solve_triangular`` inside a solver loop faults the runtime.
    """
    k = R.shape[-1]
    # Guard near-singular diagonals (degenerate probe sketches): clamp to
    # a scale-relative floor so a bad draw yields a bounded (if noisy)
    # estimate instead of NaN poisoning the whole solve.
    scale = jnp.max(jnp.abs(jnp.diagonal(R, axis1=-2, axis2=-1)), axis=-1)
    floor = jnp.maximum(scale * 1e-6, 1e-30)[:, None]

    def safe_diag(i):
        d = R[:, i, i]
        return jnp.where(jnp.abs(d) < floor[:, 0], jnp.sign(d) * floor[:, 0] + (d == 0) * floor[:, 0], d)

    cols = []
    for j in range(k):
        xcol = [None] * k  # column j of inv(R): entries (B,)
        for i in range(k - 1, -1, -1):
            if i > j:
                xcol[i] = jnp.zeros(R.shape[0], R.dtype)
                continue
            rhs = jnp.float32(1.0 if i == j else 0.0)
            acc = rhs
            for m in range(i + 1, j + 1):
                acc = acc - R[:, i, m] * xcol[m]
            xcol[i] = acc / safe_diag(i)
        cols.append(jnp.stack(xcol, axis=1))  # (B, k)
    return jnp.stack(cols, axis=2)  # (B, k, k)


def xtrace_divergence(
    f: Callable[[jax.Array], jax.Array], x: jax.Array, O: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """XTrace (Epperly, Tropp & Webber 2023) leave-one-out estimator.

    ``O``: (m, B, D) probes with m <= D.  Follows the batched algebra of the
    reference implementation (diffusion.py:402-481).
    """
    x_dot, Av = _batched_vjp(f, x)

    Y = jnp.transpose(Av(O), (1, 2, 0))  # (B, D, m)
    Y = jax.lax.stop_gradient(Y)
    Q, R = _batched_thin_qr(Y)  # (B, D, k), (B, k, m)
    k = Q.shape[2]

    AQ = jnp.transpose(Av(jnp.transpose(Q, (2, 0, 1))), (1, 2, 0))  # (B, D, k)
    AQ = jax.lax.stop_gradient(AQ)

    H = jnp.einsum("bdi,bdj->bij", Q, AQ)  # (B, k, k)
    W = jnp.einsum("bdk,mbd->bkm", Q, O)
    T = jnp.einsum("bdk,mbd->bkm", AQ, O)

    S_t = _tri_inv_upper(R)  # (B, k, k) == solve_triangular(R, I)
    S_t = S_t / jnp.linalg.norm(S_t, axis=-1, keepdims=True)
    S = jnp.transpose(S_t, (0, 2, 1))  # (B, m, k)

    trace_H = jnp.trace(H, axis1=1, axis2=2)  # (B,)

    X = W - jnp.sum(S * W, axis=1, keepdims=True) * S  # (B, k, m)
    SHS = jnp.sum(S * jnp.einsum("bim,bmk->bik", H, S), axis=1)  # (B, k)
    XHX = jnp.sum(X * jnp.einsum("bim,bmk->bik", H, X), axis=1)
    WS = jnp.sum(W * S, axis=1)
    SR = jnp.sum(S * R, axis=1)
    TX = jnp.sum(T * X, axis=1)

    trace_ests = trace_H[:, None] - SHS + WS * SR - TX + XHX  # (B, k)
    return x_dot, jnp.mean(trace_ests, axis=1)


def make_probes(
    mode: str,
    key,
    x: jax.Array,
    hpp_rank: int = 1,
    hpp_vecs: int = 1,
    xt_vecs: int = 1,
):
    """Sample the probe set an estimator needs, once per solve.

    Mirrors the reference's per-solve probe setup (diffusion.py:697-721):
    'exact' -> (); 'hutchinson' -> (e,); 'hutchpp' -> (S, G);
    'xtrace' -> (O,).  Raises if a stochastic mode is given no key.
    """
    if mode == "exact":
        return ()
    if key is None:
        raise ValueError(f"trace mode {mode!r} needs a PRNG key for its probes")
    batch = x.shape[0]
    D = x.reshape(batch, -1).shape[1]
    if mode == "hutchinson":
        return (rademacher(key, x.shape, x.dtype),)
    if mode == "hutchpp":
        r = min(hpp_rank, D)
        m = max(1, hpp_vecs)
        ks, kg = jax.random.split(key)
        return (
            rademacher(ks, (r, batch, D), x.dtype),
            rademacher(kg, (m, batch, D), x.dtype),
        )
    if mode == "xtrace":
        m = min(max(1, xt_vecs), D)
        # Sphere-distributed probes (Epperly+ 2023 use normalized test
        # vectors), scaled so E[e e^T] = I.  The reference's Rademacher
        # probes (diffusion.py:721) are fragile in low dimension: with
        # D = 2, m = 2 HALF the samples draw (anti)parallel probe pairs,
        # making the QR sketch singular -> NaN estimates; a continuous
        # distribution has collision probability zero.
        g = jax.random.normal(key, (m, batch, D), x.dtype)
        u = g / jnp.linalg.norm(g, axis=-1, keepdims=True)
        return (u * jnp.sqrt(jnp.asarray(D, x.dtype)),)
    raise ValueError(f"unknown trace mode {mode!r}")


def divergence_fn(mode: str):
    """Look up an estimator by name ('exact'|'hutchinson'|'hutchpp'|'xtrace')."""
    table = {
        "exact": exact_divergence,
        "hutchinson": hutchinson_divergence,
        "hutchpp": hutchpp_divergence,
        "xtrace": xtrace_divergence,
    }
    return table[mode]
