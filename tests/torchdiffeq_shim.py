"""A minimal torchdiffeq-interface ``odeint`` in pure torch, for EXECUTING
the reference's real ODE-solver call sites in this sandbox.

torchdiffeq is not installed here, so the reference's solver entry points
(/root/reference/flowfusion/diffusion.py:621-652 and 734-752, flow.py:288-306
and 358-380 and 781-799, symplectic.py:237) have only ever been *stubbed* in
the parity suite.  This module implements the public torchdiffeq calling
convention — ``odeint(func, y0, t, rtol=1e-7, atol=1e-9, method='dopri5',
options=None)`` with tensor or tuple-of-tensors state — so those call sites
can run end-to-end and be compared against this framework's equivalents
(tests/test_reference_execution.py).

This is an independent implementation written from the documented
conventions (the same ones flowfusion_tpu.ops.integrate.adaptive mirrors
and tests/test_integrate.py pins):

  * Dormand-Prince 5(4) pair (public coefficients), FSAL;
  * mixed-RMS error norm: max over state components of per-component RMS
    of err / (atol + rtol * max(|y0|, |y1|));
  * Hairer/Norsett/Wanner starting-step heuristic;
  * I step controller: dt * clip(0.9 / ratio**(1/5), 0.2, 10), never
    shrinking an accepted step;
  * ``options={'min_step': h}`` clamps the step length.

One documented delta vs torchdiffeq: requested output times are hit by
CLIPPING the step to land exactly on them (scipy/Hairer semantics) instead
of by quartic dense-output interpolation.  At the output point both give
the method's own accuracy; only the step sequence within ~one step of each
output time differs.  All reference call sites request only the two solve
endpoints.

Quirk faithfully reproduced: for a tuple state, torchdiffeq flattens the
RHS return with ``torch.cat([f_.reshape(-1) for f_ in f])`` — iterating a
bare *tensor* return yields its rows, which concatenates to the same flat
vector as ``f.reshape(-1)``.  The reference relies on this (its forward
returns a bare tensor for the 1-tuple state when ``prob`` is False,
diffusion.py:505-508), so the shim accepts either a tuple or a tensor
whose flattened size matches the state.
"""

from __future__ import annotations

import torch

__all__ = ["odeint", "odeint_adjoint"]

# Dormand-Prince 5(4): public Butcher tableau.
_C = (0.2, 0.3, 0.8, 8.0 / 9.0, 1.0, 1.0)
_A = (
    (0.2,),
    (3.0 / 40.0, 9.0 / 40.0),
    (44.0 / 45.0, -56.0 / 15.0, 32.0 / 9.0),
    (19372.0 / 6561.0, -25360.0 / 2187.0, 64448.0 / 6561.0, -212.0 / 729.0),
    (9017.0 / 3168.0, -355.0 / 33.0, 46732.0 / 5247.0, 49.0 / 176.0,
     -5103.0 / 18656.0),
    (35.0 / 384.0, 0.0, 500.0 / 1113.0, 125.0 / 192.0, -2187.0 / 6784.0,
     11.0 / 84.0),
)
_B5 = (35.0 / 384.0, 0.0, 500.0 / 1113.0, 125.0 / 192.0, -2187.0 / 6784.0,
       11.0 / 84.0, 0.0)
_B4 = (5179.0 / 57600.0, 0.0, 7571.0 / 16695.0, 393.0 / 640.0,
       -92097.0 / 339200.0, 187.0 / 2100.0, 1.0 / 40.0)
_E = tuple(b5 - b4 for b5, b4 in zip(_B5, _B4))

_SAFETY, _IFACTOR, _DFACTOR, _ORDER = 0.9, 10.0, 0.2, 5
_MAX_NUM_STEPS = 2 ** 14


def _pack(f, numel, shapes):
    """Flatten an RHS return (tuple of tensors, or a bare tensor)."""
    if torch.is_tensor(f):
        flat = f.reshape(-1)
    else:
        flat = torch.cat([f_.reshape(-1) for f_ in f])
    if flat.numel() != numel:
        raise ValueError(
            f"RHS returned {flat.numel()} elements for a state of {numel} "
            f"(state component shapes: {shapes})"
        )
    return flat


def _split_rms(flat, sizes):
    """Mixed norm: max over state components of the component RMS."""
    out = None
    i = 0
    flat = flat.detach()  # step-size control is not differentiated
    for n in sizes:
        r = flat[i:i + n].square().mean().sqrt()
        out = r if out is None else torch.maximum(out, r)
        i += n
    return out


def _error_ratio(err, y0, y1, rtol, atol, sizes):
    tol = atol + rtol * torch.maximum(y0.abs(), y1.abs())
    return float(_split_rms(err / tol, sizes))


def _initial_step(func, t0, y0, f0, rtol, atol, sizes, span):
    scale = atol + y0.abs() * rtol
    d0 = float(_split_rms(y0 / scale, sizes))
    d1 = float(_split_rms(f0 / scale, sizes))
    h0 = 1e-6 if (d0 < 1e-5 or d1 < 1e-5) else 0.01 * d0 / d1
    h0 = min(h0, span)
    f1 = func(t0 + h0, y0 + h0 * f0)
    d2 = float(_split_rms((f1 - f0) / scale, sizes)) / h0
    if not (d2 == d2):  # NaN probe: fall back to d1 alone
        d2 = d1
    if d1 <= 1e-15 and d2 <= 1e-15:
        h1 = max(1e-6, h0 * 1e-3)
    else:
        h1 = (0.01 / max(d1, d2)) ** (1.0 / 5.0)
    dt0 = min(100.0 * h0, h1)
    if not (dt0 == dt0 and dt0 < float("inf")):
        dt0 = 1e-6
    return min(dt0, span)


def _next_step(dt, ratio, accepted):
    if ratio != ratio:  # NaN error estimate: shrink hard
        return dt * _DFACTOR
    if ratio == 0.0:
        return dt * _IFACTOR
    dfac = 1.0 if accepted else _DFACTOR
    factor = min(_IFACTOR, max(_SAFETY / ratio ** (1.0 / _ORDER), dfac))
    if not (factor == factor and factor < float("inf")):
        factor = _DFACTOR
    return dt * factor


def odeint(func, y0, t, rtol=1e-7, atol=1e-9, method=None, options=None,
           **unused_adjoint_kwargs):
    """torchdiffeq-convention adaptive dopri5 solve.

    Returns the solution at each time in ``t`` with the same structure as
    ``y0``: a tensor of shape (len(t), *y0.shape), or a tuple of such.
    """
    if method not in (None, "dopri5"):
        raise NotImplementedError(
            f"torchdiffeq shim: only method='dopri5' is implemented, got "
            f"{method!r}"
        )
    opts = dict(options or {})
    min_step = float(opts.pop("min_step", 0.0))
    max_num_steps = int(opts.pop("max_num_steps", _MAX_NUM_STEPS))
    if opts:
        raise NotImplementedError(
            f"torchdiffeq shim: unsupported options {sorted(opts)}"
        )

    is_tuple = not torch.is_tensor(y0)
    comps = tuple(y0) if is_tuple else (y0,)
    shapes = [tuple(c.shape) for c in comps]
    sizes = [c.numel() for c in comps]
    numel = sum(sizes)
    flat0 = torch.cat([c.reshape(-1) for c in comps])

    ts = [float(x) for x in t]
    if len(ts) < 2:
        raise ValueError("t must contain at least two times")
    increasing = ts[-1] > ts[0]
    sign = 1.0 if increasing else -1.0
    for a, b in zip(ts, ts[1:]):
        if (b - a) * sign <= 0:
            raise ValueError("t must be strictly monotonic")

    def unpack(flat):
        out, i = [], 0
        for shp, n in zip(shapes, sizes):
            out.append(flat[i:i + n].reshape(shp))
            i += n
        return tuple(out)

    dev = flat0.device
    dtype = flat0.dtype

    def func_flat(u, y_flat):
        # u is time in the internal (forward) direction: t = sign * u.
        tt = torch.as_tensor(sign * u, dtype=dtype, device=dev)
        state = unpack(y_flat)
        f = func(tt, state if is_tuple else state[0])
        return sign * _pack(f, numel, shapes)

    us = [sign * x for x in ts]  # internal times, strictly increasing
    span = us[-1] - us[0]

    y = flat0.clone()
    u_now = us[0]
    f_now = func_flat(u_now, y)
    dt = _initial_step(func_flat, u_now, y, f_now, rtol, atol, sizes, span)

    outputs = [flat0.clone()]
    n_steps = 0
    for u_target in us[1:]:
        while u_now < u_target:
            n_steps += 1
            if n_steps > max_num_steps:
                raise RuntimeError(
                    f"torchdiffeq shim: max_num_steps ({max_num_steps}) "
                    f"exceeded at t={sign * u_now}"
                )
            h = max(dt, min_step)
            landed = u_now + h >= u_target
            if landed:
                h = u_target - u_now
            # FSAL: stage 1 is the stored derivative.
            k = [f_now]
            for ai, ci in zip(_A, _C):
                yi = y.clone()
                for a, kj in zip(ai, k):
                    if a != 0.0:
                        yi = yi + (h * a) * kj
                k.append(func_flat(u_now + h * ci, yi))
            y1 = y.clone()
            for b, kj in zip(_B5, k):
                if b != 0.0:
                    y1 = y1 + (h * b) * kj
            err = torch.zeros_like(y)
            for e, kj in zip(_E, k):
                if e != 0.0:
                    err = err + (h * e) * kj
            ratio = _error_ratio(err, y, y1, rtol, atol, sizes)
            accepted = ratio <= 1.0
            dt_next = _next_step(h, ratio, accepted)
            if landed and accepted:
                # A clipped landing step's length says nothing about the
                # natural scale — resume from the larger of the controller
                # proposal and the pre-clip dt.
                dt_next = max(dt_next, dt)
            dt = dt_next
            if accepted:
                u_now = u_target if landed else u_now + h
                y = y1
                f_now = k[6]  # FSAL: last stage is f(t+h, y1)
        outputs.append(y.clone())

    stacked = torch.stack(outputs)  # (len(t), numel)
    comps_out = []
    i = 0
    for shp, n in zip(shapes, sizes):
        comps_out.append(stacked[:, i:i + n].reshape((len(ts),) + shp))
        i += n
    return tuple(comps_out) if is_tuple else comps_out[0]


def odeint_adjoint(func, y0, t, rtol=1e-7, atol=1e-9, method=None,
                   options=None, **kwargs):
    """Adjoint entry point: same forward solve; gradients (when a caller
    wants them) flow by direct autograd through the solver loop rather
    than a continuous adjoint — identical forward numbers, which is all
    the execution-parity tests compare."""
    if not isinstance(func, torch.nn.Module):
        # torchdiffeq requires an nn.Module for the adjoint; mirror that
        # so reference call sites that would fail under the real package
        # fail here too.
        raise ValueError(
            "odeint_adjoint requires func to be an nn.Module (torchdiffeq "
            "convention)"
        )
    return odeint(func, y0, t, rtol=rtol, atol=atol, method=method,
                  options=options, **kwargs)
