"""Test oracles: NumPy float64 implementations of the published algorithms.

``numpy_dopri5`` implements the same conventions as the solver under test —
Dormand--Prince 5(4) with the mixed-RMS error norm, the 0.9/10/0.2
controller, Hairer's initial step, and quartic dense output — as an
independent float64 implementation.  Agreement between the float32 JAX
solver and this float64 oracle at matching tolerances is the stand-in for
the torchdiffeq parity bar (torchdiffeq itself is not installed in this
environment).

Also provides the closed-form 2-component GMM from the reference demo
notebooks (demo_diffusion.ipynb cell 2) used as a statistical ground truth.
"""

from __future__ import annotations

import numpy as np

# -- Dormand–Prince coefficients (same data as the JAX tableau) -------------
ALPHA = np.array([1 / 5, 3 / 10, 4 / 5, 8 / 9, 1.0, 1.0])
BETA = [
    np.array([1 / 5]),
    np.array([3 / 40, 9 / 40]),
    np.array([44 / 45, -56 / 15, 32 / 9]),
    np.array([19372 / 6561, -25360 / 2187, 64448 / 6561, -212 / 729]),
    np.array([9017 / 3168, -355 / 33, 46732 / 5247, 49 / 176, -5103 / 18656]),
    np.array([35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84]),
]
C_SOL = np.array([35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84, 0.0])
C_ERR = np.array(
    [
        35 / 384 - 1951 / 21600,
        0.0,
        500 / 1113 - 22642 / 50085,
        125 / 192 - 451 / 720,
        -2187 / 6784 + 12231 / 42400,
        11 / 84 - 649 / 6300,
        -1.0 / 60.0,
    ]
)
C_MID = np.array(
    [
        0.5 * (6025192743 / 30085553152),
        0.0,
        0.5 * (51252292925 / 65400821598),
        0.5 * (-2691868925 / 45128329728),
        0.5 * (187940372067 / 1594534317056),
        0.5 * (-1776094331 / 19743644256),
        0.5 * (11237099 / 235043384),
    ]
)


def _rms(x):
    return float(np.sqrt(np.mean(np.square(x))))


def numpy_dopri5(f, y0, ts, rtol, atol, max_steps=100000):
    """Reference adaptive dopri5 on a flat float64 vector state."""
    ts = np.asarray(ts, float)
    if ts[1] < ts[0]:
        g = f
        f = lambda t, y: -g(-t, y)
        ts = -ts
    y = np.asarray(y0, float).copy()
    t = ts[0]
    f0 = f(t, y)

    # Hairer initial step
    scale = atol + np.abs(y) * rtol
    d0, d1 = _rms(y / scale), _rms(f0 / scale)
    h0 = 1e-6 if (d0 < 1e-5 or d1 < 1e-5) else 0.01 * d0 / d1
    f1 = f(t + h0, y + h0 * f0)
    d2 = _rms((f1 - f0) / scale) / h0
    if d1 <= 1e-15 and d2 <= 1e-15:
        h1 = max(1e-6, h0 * 1e-3)
    else:
        h1 = (0.01 / max(d1, d2)) ** (1.0 / 5.0)
    dt = min(100 * h0, h1)

    out = [np.asarray(y0, float).copy()]
    interp = None  # (t0, t1, coeffs)
    n = 0
    for target in ts[1:]:
        while t < target:
            n += 1
            if n > max_steps:
                raise RuntimeError("too many steps")
            k = [f0]
            for i in range(6):
                ti = t + ALPHA[i] * dt
                yi = y + dt * sum(b * kk for b, kk in zip(BETA[i], k))
                k.append(f(ti, yi))
            y1 = yi  # FSAL: last stage input is the 5th-order solution
            f1 = k[-1]
            err = dt * sum(c * kk for c, kk in zip(C_ERR, k))
            tol = atol + rtol * np.maximum(np.abs(y), np.abs(y1))
            ratio = _rms(err / tol)
            accept = ratio <= 1.0
            if accept:
                y_mid = y + dt * sum(c * kk for c, kk in zip(C_MID, k))
                interp = (t, t + dt, _fit(y, y1, y_mid, f0, f1, dt))
                t, y, f0 = t + dt, y1, f1
            if ratio == 0.0:
                dt = dt * 10.0
            else:
                dfac = 1.0 if ratio < 1.0 else 0.2
                dt = dt * min(10.0, max(0.9 / ratio ** (1 / 5), dfac))
        t0, t1, coeffs = interp
        out.append(_eval(coeffs, t0, t1, target))
    return np.stack(out), n


def _fit(y0, y1, ym, f0, f1, dt):
    a = 2 * dt * (f1 - f0) - 8 * (y1 + y0) + 16 * ym
    b = dt * (5 * f0 - 3 * f1) + 18 * y0 + 14 * y1 - 32 * ym
    c = dt * (f1 - 4 * f0) - 11 * y0 - 5 * y1 + 16 * ym
    d = dt * f0
    e = y0
    return [e, d, c, b, a]


def _eval(coeffs, t0, t1, t):
    x = (t - t0) / (t1 - t0)
    e, d, c, b, a = coeffs
    return ((a * x + b) * x + c) * x * x + d * x + e


# -- 2D GMM ground truth (reference demo notebooks) -------------------------
GMM_WEIGHTS = np.array([0.4, 0.6])
GMM_MEANS = np.array([[-1.0, -1.0], [1.0, 1.0]])
GMM_COVS = np.array(
    [[[0.5, 0.2], [0.2, 0.5]], [[0.7, -0.3], [-0.3, 0.4]]]
)


def gmm_sample(rng, n):
    comps = rng.choice(2, size=n, p=GMM_WEIGHTS)
    chols = np.linalg.cholesky(GMM_COVS)
    z = rng.standard_normal((n, 2))
    return GMM_MEANS[comps] + np.einsum("nij,nj->ni", chols[comps], z)


def gmm_log_prob(x):
    x = np.atleast_2d(x)
    logps = []
    for w, mu, cov in zip(GMM_WEIGHTS, GMM_MEANS, GMM_COVS):
        diff = x - mu
        inv = np.linalg.inv(cov)
        maha = np.einsum("ni,ij,nj->n", diff, inv, diff)
        logdet = np.log(np.linalg.det(cov))
        logps.append(np.log(w) - 0.5 * (maha + logdet + 2 * np.log(2 * np.pi)))
    return np.logaddexp(logps[0], logps[1])


def numpy_xtrace(A, O):
    """Float64 XTrace (Epperly+2023) with the reference's batched algebra.

    A: (D, D) Jacobian of the row-wise linear map f(x) = x A^T; the
    operator is applied as J v (JVP semantics — the framework applies J
    rather than the reference's J^T; the trace is transpose-invariant).
    O: (m, B, D) probes.  Returns per-sample trace estimates (B,).
    """
    m, B, D = O.shape
    A = np.asarray(A, float)

    def av(V):  # (n, B, D) -> (n, B, D): rows v -> J v = v @ A^T
        return np.einsum("nbd,ed->nbe", V, A)

    Y = np.transpose(av(O), (1, 2, 0))  # (B, D, m)
    Q = np.zeros((B, D, m))
    R = np.zeros((B, m, m))
    for b in range(B):
        Q[b], R[b] = np.linalg.qr(Y[b])
    AQ = np.transpose(av(np.transpose(Q, (2, 0, 1))), (1, 2, 0))  # (B, D, m)
    H = np.einsum("bdi,bdj->bij", Q, AQ)
    W = np.einsum("bdk,mbd->bkm", Q, O)
    T = np.einsum("bdk,mbd->bkm", AQ, O)
    S_t = np.zeros((B, m, m))
    for b in range(B):
        S_t[b] = np.linalg.solve(R[b], np.eye(m))
    S_t = S_t / np.linalg.norm(S_t, axis=-1, keepdims=True)
    S = np.transpose(S_t, (0, 2, 1))
    trace_H = np.trace(H, axis1=1, axis2=2)
    X = W - np.sum(S * W, axis=1, keepdims=True) * S
    SHS = np.sum(S * np.einsum("bim,bmk->bik", H, S), axis=1)
    XHX = np.sum(X * np.einsum("bim,bmk->bik", H, X), axis=1)
    WS = np.sum(W * S, axis=1)
    SR = np.sum(S * R, axis=1)
    TX = np.sum(T * X, axis=1)
    ests = trace_H[:, None] - SHS + WS * SR - TX + XHX
    return np.mean(ests, axis=1)


# ---------------------------------------------------------------------------
# Float64 score-field oracle: independent numpy implementation of the
# probability-flow likelihood ODE for a trained ScoreMLP + VESDE
# (flowfusion_tpu.models.score.solve_odes_forward semantics).
# ---------------------------------------------------------------------------


def _silu_pair(a):
    s = 1.0 / (1.0 + np.exp(-a))
    return a * s, s * (1.0 + a * (1.0 - s))


def _f64_layers(layer_list):
    return [
        (np.asarray(l["w"], np.float64), np.asarray(l["b"], np.float64))
        for l in layer_list
    ]


def _mlp_forward_f64(layers, h):
    """Shared f64 silu MLP stack (linear last layer) — one definition for
    every oracle net in this file."""
    for i, (w, b) in enumerate(layers):
        h = h @ w + b
        if i < len(layers) - 1:
            h, _ = _silu_pair(h)
    return h


def _mlp_jvp_f64(layers, h, dh):
    """Forward-mode tangent through the same stack; returns d(out)."""
    for i, (w, b) in enumerate(layers):
        h = h @ w + b
        dh = dh @ w
        if i < len(layers) - 1:
            h, dact = _silu_pair(h)
            dh = dact * dh
    return dh


def score_mlp_f64(params):
    """(net(t, X), JVP columns) in float64 for a silu ScoreMLP.

    Returns f(t, X) -> (out (B, D), jvp(t, X, V) -> (B, D)) closures over
    float64 copies of the weights.  Input layout matches
    models/nets.py::apply_score_mlp: concat([fourier_emb(t), x]).
    """
    W = np.asarray(params["W"], np.float64)
    layers = _f64_layers(params["layers"])

    def _input(t, X):
        B = X.shape[0]
        proj = np.full((B, 1), t) * W[None, :] * (2.0 * np.pi)
        return np.concatenate([np.sin(proj), np.cos(proj), X], axis=1)

    def forward(t, X):
        return _mlp_forward_f64(layers, _input(t, X))

    def jvp(t, X, V):
        """Tangent V on x only (t-embedding sees no perturbation)."""
        dh = np.concatenate([np.zeros((X.shape[0], W.size * 2)), V], axis=1)
        return _mlp_jvp_f64(layers, _input(t, X), dh)

    return forward, jvp


def vesde_likelihood_rhs_f64(params, sigma_min=1e-2, sigma_max=10.0):
    """Augmented RHS for numpy_dopri5 on flat state [x.ravel(), dlp].

    dx/dt = -0.5 g^2(t) net(t,x)/sigma(t)  (VESDE: f = 0),
    dlp/dt = +div_x(dx/dt)  (exact, D JVP columns),
    matching ScoreModel.solve_odes_forward with trace_mode='exact'.
    """
    forward, jvp = score_mlp_f64(params)
    log_r = np.log(sigma_max) - np.log(sigma_min)

    def rhs(D):
        def f(t, y):
            B = (y.size) // (D + 1)
            X = y[: B * D].reshape(B, D)
            sigma = sigma_min * (sigma_max / sigma_min) ** t
            g2 = sigma**2 * 2.0 * log_r
            coef = -0.5 * g2 / sigma  # ode_drift = coef * net
            drift = coef * forward(t, X)
            div = np.zeros(B)
            for d in range(D):
                V = np.zeros((B, D))
                V[:, d] = 1.0
                div += coef * jvp(t, X, V)[:, d]
            return np.concatenate([drift.ravel(), div])

        return f

    return rhs


def vesde_prior_logprob_f64(X, sigma_max=10.0):
    """log N(0, sigma_max^2 I) summed over dims, (B,)."""
    return np.sum(
        -0.5 * (X / sigma_max) ** 2 - 0.5 * np.log(2 * np.pi * sigma_max**2),
        axis=1,
    )


def velocity_mlp_f64(params):
    """(v(t, X), JVP columns) in float64 for a silu velocity MLP.

    Input layout matches models/nets.py::apply_velocity_mlp (reference
    flow.py:110-118): concat([x, t]) with raw scalar time as a feature.
    """
    layers = _f64_layers(params["layers"])

    def forward(t, X):
        B = X.shape[0]
        return _mlp_forward_f64(
            layers, np.concatenate([X, np.full((B, 1), t)], axis=1)
        )

    def jvp(t, X, V):
        """Tangent V on x only (the t feature sees no perturbation)."""
        B = X.shape[0]
        h = np.concatenate([X, np.full((B, 1), t)], axis=1)
        dh = np.concatenate([V, np.zeros((B, 1))], axis=1)
        return _mlp_jvp_f64(layers, h, dh)

    return forward, jvp


def flow_likelihood_rhs_f64(params):
    """Augmented RHS for numpy_dopri5 on flat state [x.ravel(), log_jac].

    dx/dt = v(x, t), dlogjac/dt = div_x v (exact, D JVP columns) —
    matching ODEFlow.solve_ode_forward with trace_mode='exact'
    (reference flow.py:122-166, 308-384).
    """
    forward, jvp = velocity_mlp_f64(params)

    def rhs(D):
        def f(t, y):
            B = (y.size) // (D + 1)
            X = y[: B * D].reshape(B, D)
            v = forward(t, X)
            div = np.zeros(B)
            for d in range(D):
                V = np.zeros((B, D))
                V[:, d] = 1.0
                div += jvp(t, X, V)[:, d]
            return np.concatenate([v.ravel(), div])

        return f

    return rhs


def std_normal_logprob_f64(X):
    """log N(0, I) summed over dims, (B,)."""
    return np.sum(-0.5 * X**2 - 0.5 * np.log(2 * np.pi), axis=1)


def symplectic_rhs_f64(params):
    """f64 RHS for the separable-Hamiltonian field on flat (B*2D,) state.

    v = [mlp_q(p, temb), -mlp_p(q, temb)] with Gaussian-Fourier t features
    appended AFTER the state half (models/nets.py::apply_symplectic_mlp;
    reference symplectic.py:82-123).  Trace-free by construction, so the
    likelihood needs no divergence channel.
    """
    W = np.asarray(params["W"], np.float64)
    q_layers = _f64_layers(params["q_layers"])
    p_layers = _f64_layers(params["p_layers"])
    mlp = _mlp_forward_f64

    def rhs(D):
        def f(t, y):
            B = y.size // (2 * D)
            S = y.reshape(B, 2 * D)
            q, p = S[:, :D], S[:, D:]
            proj = np.full((B, 1), t) * W[None, :] * (2.0 * np.pi)
            temb = np.concatenate([np.sin(proj), np.cos(proj)], axis=1)
            v_q = mlp(q_layers, np.concatenate([p, temb], axis=1))
            v_p = -mlp(p_layers, np.concatenate([q, temb], axis=1))
            return np.concatenate([v_q, v_p], axis=1).ravel()

        return f

    return rhs


def cond_score_mlp_f64(params):
    """(net(t, X, C), JVP columns) in float64 for a conditional silu
    ScoreMLP — input layout concat([fourier_emb(t), x, cond])
    (models/nets.py::apply_score_mlp: cond is appended to x before the
    time embedding is prepended)."""
    W = np.asarray(params["W"], np.float64)
    layers = _f64_layers(params["layers"])

    def _input(t, X, C):
        B = X.shape[0]
        proj = np.full((B, 1), t) * W[None, :] * (2.0 * np.pi)
        return np.concatenate([np.sin(proj), np.cos(proj), X, C], axis=1)

    def forward(t, X, C):
        return _mlp_forward_f64(layers, _input(t, X, C))

    def jvp(t, X, C, V):
        """Tangent V on x only (t-embedding and cond unperturbed)."""
        B = X.shape[0]
        dh = np.concatenate(
            [np.zeros((B, W.size * 2)), V, np.zeros((B, C.shape[1]))],
            axis=1,
        )
        return _mlp_jvp_f64(layers, _input(t, X, C), dh)

    return forward, jvp


def vpsde_cond_likelihood_rhs_f64(
    params, cond, beta_min=0.1, beta_max=20.0, T=1.0
):
    """Augmented RHS for numpy_dopri5 on flat [x.ravel(), dlp] for a
    CONDITIONAL no_sigma VP-SDE score model (the conditional-flagship
    family, BASELINE configs[4]):

    dx/dt = -0.5 beta(t) x - 0.5 beta(t) net(t, x, c)   (no_sigma: the
    net IS the score; ScoreModel.score / ode_drift with VPSDE drift
    -beta x/2 and g^2 = beta),
    dlp/dt = +div_x(dx/dt)  (exact, D JVP columns),
    matching ScoreModel.solve_odes_forward(trace_mode='exact') on
    standardized inputs with normalized conditionals.
    """
    forward, jvp = cond_score_mlp_f64(params)
    Cn = np.asarray(cond, np.float64)

    def rhs(D):
        def f(t, y):
            B = y.size // (D + 1)
            X = y[: B * D].reshape(B, D)
            beta = beta_min + (beta_max - beta_min) * (t / T)
            drift = -0.5 * beta * X - 0.5 * beta * forward(t, X, Cn)
            div = np.zeros(B)
            for d in range(D):
                V = np.zeros((B, D))
                V[:, d] = 1.0
                # d(drift_d)/dx_d = -0.5 beta (1 + d net_d/dx_d)
                div += -0.5 * beta * (1.0 + jvp(t, X, Cn, V)[:, d])
            return np.concatenate([drift.ravel(), div])

        return f

    return rhs
