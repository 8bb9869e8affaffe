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
    "hutchpp_core",
    "xtrace_divergence",
    "xtrace_core",
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
    x_dot, jv = jax.linearize(f, x)
    D = x.shape[-1]
    div = jnp.zeros(x.shape[:-1], x.dtype)
    for d in range(D):
        tangent = jnp.zeros_like(x).at[..., d].set(1.0)
        div = div + jv(tangent)[..., d]
    return x_dot, div


def hutchinson_divergence(
    f: Callable[[jax.Array], jax.Array], x: jax.Array, e: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """Skilling--Hutchinson estimate e^T J e with one JVP."""
    x_dot, je = jax.jvp(f, (x,), (e,))
    div = jnp.sum(je * e, axis=tuple(range(1, x.ndim)))
    return x_dot, div


def _linearized(f, x):
    """Return (f(x), linear operator v -> J v) sharing one primal trace.

    The reference applies A = J^T via VJPs (diffusion.py:361-373); the
    trace is transpose-invariant, so this framework applies A = J via
    JVPs instead — forward mode needs no transpose program and measures
    ~1.5x faster Hutch++ likelihood solves on TPU (BENCHMARKS.md).  The
    sketch/leave-one-out algebra downstream is unchanged, just running on
    J rather than J^T; estimator statistics are identical.
    ``jax.linearize`` evaluates the primal once; every probe application
    reuses the stored residuals (one tangent chain each).
    """
    return jax.linearize(f, x)


# ---------------------------------------------------------------------------
# Batch-in-lanes sketch algebra.
#
# The sketch estimators manipulate per-sample matrices of shape (D, m) with
# D, m <= ~16 — tiny trailing dimensions.  Arrays laid out (B, D, m) put
# those tiny dims in the TPU lane/sublane axes (2/128 lane occupancy at
# D = 2) and every QR/triangular-solve step becomes a padded relayout-bound
# VPU op; measured ~2.5 ms of a 3.9 ms XTrace RHS eval.  The same lesson as
# the V4 fused kernel applies: keep the BATCH in the lane dimension.  All
# algebra below therefore runs on "columns" — (D, B) arrays — and scalar
# matrix entries — (B,) arrays — with the tiny D/m loops unrolled in
# Python, so every op XLA sees is a fully-occupied (B,)-vectorized
# elementwise/reduce op that fuses into a handful of kernels.
# ---------------------------------------------------------------------------


def _qr_cols(cols):
    """Thin QR of per-sample (D, m) matrices given as m columns of (D, B).

    Modified Gram--Schmidt unrolled over the m columns (``jnp.linalg.qr``
    on tiny batched matrices lowers to a Householder loop the TPU executes
    serially per matrix — measured 18x slower end-to-end on the XTrace
    likelihood solve).  Near-zero column norms (degenerate sketches) are
    floored, and the degenerate column is replaced by completing the basis
    the way Householder QR would: orthogonalize the canonical basis
    vectors against the accepted columns and take the largest residual.
    Q stays orthonormal (Hutch++'s full-rank exactness depends on it); R
    keeps the ~0 entry, so QR = Y holds.

    Returns (q_cols, R) with ``q_cols`` a list of m (D, B) arrays and
    ``R`` an m x m list-of-lists of (B,) entries (zeros below diagonal).

    Cost note for direct callers: the unrolled algebra (including the
    completion state below) emits O(m * D) HLO ops over (D, B)/(D, D, B)
    operands — sized for this package's D <= 16 model dispatch.  For
    large D, batched ``jnp.linalg.qr`` is the better tool.
    """
    m = len(cols)
    D, B = cols[0].shape
    if m > D:
        raise ValueError(
            f"QR of {m} columns in dimension {D}: at most D orthonormal "
            "columns exist — reduce the probe count (make_probes clamps "
            "automatically; direct callers must too)"
        )
    dtype = cols[0].dtype
    scale = jnp.sqrt(sum(jnp.sum(c * c, axis=0) for c in cols))  # (B,)
    floor = jnp.maximum(scale * 1e-6, 1e-30)
    zeros = jnp.zeros(B, dtype)
    eye = jnp.eye(D, dtype=dtype)
    q_cols = []
    R = [[zeros] * m for _ in range(m)]
    # Basis-completion state for rank-deficient columns, maintained
    # incrementally: res[c] is canonical basis vector e_c orthogonalized
    # against the accepted columns so far (one (D, D, B) update per
    # accepted column, not a from-scratch rebuild per column).
    res = jnp.broadcast_to(eye[:, :, None], (D, D, B))  # (c, d, B)
    for j in range(m):
        v = cols[j]
        for i in range(j):
            r_ij = jnp.sum(q_cols[i] * v, axis=0)  # (B,)
            R[i][j] = r_ij
            v = v - r_ij[None, :] * q_cols[i]
        r_jj = jnp.sqrt(jnp.sum(v * v, axis=0))
        R[j][j] = r_jj

        # Fallback direction: the largest residual of the completion basis
        # (what Householder QR would produce for a ~0 column).
        res_norm = jnp.sqrt(jnp.sum(res * res, axis=1))  # (c, B)
        best = jnp.argmax(res_norm, axis=0)  # (B,)
        q_fb = jnp.take_along_axis(res, best[None, None, :], axis=0)[0]  # (D, B)
        q_fb = q_fb / jnp.maximum(
            jnp.take_along_axis(res_norm, best[None, :], axis=0)[0], 1e-30
        )
        degenerate = (r_jj < floor)[None, :]
        q_j = jnp.where(degenerate, q_fb, v / jnp.maximum(r_jj, floor)[None, :])
        q_cols.append(q_j)
        if j + 1 < m:
            proj = jnp.sum(res * q_j[None, :, :], axis=1)  # (c, B)
            res = res - proj[:, None, :] * q_j[None, :, :]
    return q_cols, R


def _tri_inv_entries(R, k):
    """Entries of inv(R) for upper-triangular R given as (B,) entry grid.

    Unrolled back-substitution over the static (small) k.  Near-singular
    diagonals (degenerate probe sketches) are clamped to a scale-relative
    floor so a bad draw yields a bounded (if noisy) estimate instead of
    NaN poisoning the whole solve.
    """
    B = R[0][0].shape[0]
    dtype = R[0][0].dtype
    scale = R[0][0] * 0
    for i in range(k):
        scale = jnp.maximum(scale, jnp.abs(R[i][i]))
    floor = jnp.maximum(scale * 1e-6, 1e-30)

    def safe_diag(i):
        d = R[i][i]
        return jnp.where(
            jnp.abs(d) < floor, jnp.sign(d) * floor + (d == 0) * floor, d
        )

    zeros = jnp.zeros(B, dtype)
    inv = [[zeros] * k for _ in range(k)]
    for j in range(k):
        for i in range(j, -1, -1):
            acc = jnp.full(B, 1.0 if i == j else 0.0, dtype)
            for l in range(i + 1, j + 1):
                acc = acc - R[i][l] * inv[l][j]
            inv[i][j] = acc / safe_diag(i)
    return inv


def hutchpp_core(apply_cols, s_cols, g_cols, measure_cols=None) -> jax.Array:
    """Hutch++ divergence from a column operator.

    ``apply_cols``: list of (D, B) columns -> list of (D, B) columns of
    A v, used to BUILD the sketch (the reference ``.detach()``s sketch
    construction, diffusion.py:336-400 — pass a stop-gradient'ed
    operator here).  ``measure_cols`` (default: ``apply_cols``) applies
    A in the final quadratic forms tr(Q^T A Q) + (1/m) tr(U^T A U) —
    pass the *differentiable* operator there so the divergence carries
    gradients (Q and U are constants; the measurement is linear in A).
    ``s_cols``/``g_cols``: sketch and residual probe columns.  Returns
    the (B,) trace estimate, U = (I - QQ^T) G.
    """
    if measure_cols is None:
        measure_cols = apply_cols
    m = len(g_cols)
    y_cols = apply_cols(s_cols)
    q_cols, _ = _qr_cols(y_cols)

    u_cols = []
    for g in g_cols:
        u = g
        for q in q_cols:
            u = u - jnp.sum(q * g, axis=0)[None, :] * q
        u_cols.append(u)

    # U depends only on Q and the probes, so A Q and A U share one
    # operator application (one fused-kernel dispatch / one JVP group).
    applied = measure_cols(q_cols + u_cols)
    aq_cols, au_cols = applied[: len(q_cols)], applied[len(q_cols) :]

    trace_lr = sum(jnp.sum(q * aq, axis=0) for q, aq in zip(q_cols, aq_cols))
    trace_res = sum(jnp.sum(u * au, axis=0) for u, au in zip(u_cols, au_cols))
    return trace_lr + trace_res / float(m)


def hutchpp_divergence(
    f: Callable[[jax.Array], jax.Array],
    x: jax.Array,
    S: jax.Array,
    G: jax.Array,
) -> Tuple[jax.Array, jax.Array]:
    """Hutch++: tr(Q^T A Q) + (1/m) tr(U^T A U), U = (I - QQ^T) G.

    ``S``: (r, B, D) sketch probes, ``G``: (m, B, D) residual probes.

    Differentiable: the sketch construction (Q from A S) is
    stop-gradient'ed like the reference's ``.detach()``, but the
    measurement applications A Q / A U carry gradients, so
    d(div)/d(params of f) is the unbiased estimator gradient — usable
    under the adjoint solves.
    """
    x_dot, jv = _linearized(f, x)
    sg = jax.lax.stop_gradient

    def sketch_cols(cols):
        return [sg(jv(c.T).T) for c in cols]

    def measure(cols):
        return [jv(c.T).T for c in cols]

    div = hutchpp_core(
        sketch_cols,
        [S[i].T for i in range(S.shape[0])],
        [G[i].T for i in range(G.shape[0])],
        measure_cols=measure,
    )
    return x_dot, div


def xtrace_divergence(
    f: Callable[[jax.Array], jax.Array], x: jax.Array, O: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """XTrace (Epperly, Tropp & Webber 2023) leave-one-out estimator.

    ``O``: (m, B, D) probes with m <= D.  Follows the batched algebra of
    the reference implementation (diffusion.py:402-481), restated on
    (B,)-entry grids with the batch in the lane dimension (see the layout
    note above): for each left-out probe j,
      est_j = tr(H) - S_j^T H S_j + (w_j^T s_j)(s_j^T r_j) - t_j^T x_j
              + x_j^T H x_j
    averaged over j, with S the column-normalized inv(R).

    NOT differentiable: every application of A is stop-gradient'ed (Q
    and R both come out of the QR of A O, so there is no clean
    sketch/measurement split like Hutch++'s) — the divergence VALUE is
    correct but its gradient is zero.  The models therefore reject
    trace_mode='xtrace' under adjoint solves.
    """
    x_dot, jv = _linearized(f, x)
    sg = jax.lax.stop_gradient

    def apply_cols(cols):
        return [sg(jv(c.T).T) for c in cols]

    div = xtrace_core(apply_cols, [O[i].T for i in range(O.shape[0])])
    return x_dot, div


def xtrace_core(apply_cols, o_cols) -> jax.Array:
    """XTrace divergence from a column operator (see hutchpp_core)."""
    m = len(o_cols)
    y_cols = apply_cols(o_cols)
    q_cols, R = _qr_cols(y_cols)  # k = m
    aq_cols = apply_cols(q_cols)

    # Entry grids of the small per-sample matrices; every entry is (B,).
    H = [[jnp.sum(q_cols[i] * aq_cols[j], axis=0) for j in range(m)] for i in range(m)]
    W = [[jnp.sum(q_cols[i] * o_cols[j], axis=0) for j in range(m)] for i in range(m)]
    T = [[jnp.sum(aq_cols[i] * o_cols[j], axis=0) for j in range(m)] for i in range(m)]

    S_t = _tri_inv_entries(R, m)  # inv(R), row i / col j
    # Row-normalize inv(R) (Epperly+ 2023 normalize the test directions).
    for i in range(m):
        norm = jnp.sqrt(sum(S_t[i][j] * S_t[i][j] for j in range(m)))
        norm = jnp.maximum(norm, 1e-30)
        S_t[i] = [S_t[i][j] / norm for j in range(m)]
    # S = inv(R)^T normalized: S[i][j] pairs row index i with W/T's row
    # index (Q column) — the reference's S = transpose(S_t, (0, 2, 1)).
    S = [[S_t[j][i] for j in range(m)] for i in range(m)]

    trace_H = sum(H[i][i] for i in range(m))

    # X = W - colsum(S .* W) * S  (leave-one-out deflation).
    csum = [sum(S[i][j] * W[i][j] for i in range(m)) for j in range(m)]
    X = [[W[i][j] - csum[j] * S[i][j] for j in range(m)] for i in range(m)]

    def quad(V):  # [V^T H V]_jj for each left-out column j -> list of (B,)
        HV = [
            [sum(H[i][l] * V[l][j] for l in range(m)) for j in range(m)]
            for i in range(m)
        ]
        return [sum(V[i][j] * HV[i][j] for i in range(m)) for j in range(m)]

    SHS = quad(S)
    XHX = quad(X)
    WS = [sum(W[i][j] * S[i][j] for i in range(m)) for j in range(m)]
    SR = [sum(S[i][j] * R[i][j] for i in range(m)) for j in range(m)]
    TX = [sum(T[i][j] * X[i][j] for i in range(m)) for j in range(m)]

    ests = [trace_H - SHS[j] + WS[j] * SR[j] - TX[j] + XHX[j] for j in range(m)]
    return sum(ests) / float(m)


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
    if mode not in ("exact", "hutchinson", "hutchpp", "xtrace"):
        raise ValueError(f"unknown trace mode {mode!r}")
    if mode == "exact":
        return ()
    if key is None:
        raise ValueError(f"trace mode {mode!r} needs a PRNG key for its probes")
    if mode in ("hutchpp", "xtrace") and x.ndim != 2:
        raise ValueError(
            f"sketch trace modes consume (B, D) batches; got x.ndim={x.ndim} "
            "— flatten trailing dims first"
        )
    batch = x.shape[0]
    D = x.reshape(batch, -1).shape[1]
    if mode == "hutchinson":
        return (rademacher(key, x.shape, x.dtype),)
    if mode == "hutchpp":
        r = max(1, min(hpp_rank, D))
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
    if mode not in table:
        raise ValueError(
            f"unknown trace mode {mode!r}; use one of {sorted(table)}"
        )
    return table[mode]
