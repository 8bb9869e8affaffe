"""AOT serving artifacts via ``jax.export``.

Production-deployment surface the reference lacks entirely: compile a
model's likelihood (or sampling) entry point once, serialize it as a
portable StableHLO artifact, and serve it WITHOUT the Python model
definitions — the parameters, standardization statistics, solver and
trace-estimator configuration are all baked into the artifact.  The
artifact is loadable from any process with a matching backend (e.g.
lowered on a TPU host, served by a fleet of TPU workers), and the batch
dimension can be left symbolic so one artifact serves every batch size.

Works for all three model families:

    blob = serving.export_log_prob(model, batch=None)      # symbolic batch
    f = serving.deserialize_log_prob(blob)
    lp = f(x, seed=7)                                      # (B,) densities

PRNG discipline: exported functions take an explicit int32 ``seed`` (the
artifact folds it through ``jax.random.PRNGKey`` internally) so stochastic
trace probes / auxiliary momenta stay reproducible across servers.

Non-goals (documented, not silent): the artifact records the platform it
was lowered for (``jax.export`` checks at call time), and the fused
Pallas kernels require a concrete grid, so TPU exports with
``use_fused_kernel=True`` must use a fixed ``batch`` — symbolic-batch
exports use the plain-XLA path.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp

__all__ = [
    "ExportRefused",
    "export_log_prob",
    "export_log_prob_bucketed",
    "deserialize_log_prob",
    "deserialize_log_prob_bucketed",
    "export_sampler",
    "deserialize_sampler",
    "save_artifact",
    "load_artifact",
]


class ExportRefused(ValueError):
    """An export configuration was refused by the serving guards (TPU
    crash-family protection or an unhonourable explicit flag).

    A dedicated type so callers (e.g. the CLI) can translate guard
    refusals into flag advice without swallowing unrelated
    ``ValueError``s raised during closure construction or lowering.
    """


def _target_platforms(platforms) -> set:
    """The platforms an export will actually serve: the ``platforms``
    argument when given, else the current backend.  The crash-family
    guards key off THIS (not the host backend): a TPU-hosted export with
    platforms=('cpu',) is safe, while a CPU-hosted multi-platform export
    including 'tpu' produces an artifact that dies on the server.
    """
    if isinstance(platforms, (str, bytes)):
        # a bare "tpu" would otherwise iterate as {'t','p','u'} and
        # silently skip every platform-keyed guard
        raise TypeError(
            f"platforms must be a sequence of platform names, got the "
            f"bare string {platforms!r} — pass platforms=({platforms!r},)"
        )
    if platforms:
        return {str(p).lower() for p in platforms}
    return {jax.default_backend()}


def _align_kernel_to_targets(model, platforms, likelihood: bool):
    """Concrete-batch exports: align the fused-kernel configuration with
    the artifact's TARGET platforms instead of the tracing host.

    The auto dispatch (``models._common.auto_fused``) keys off
    ``jax.default_backend()`` at trace time, which is wrong for
    cross-platform exports: a CPU host exporting ``platforms=('tpu',)``
    would trace the plain-XLA graph — for the likelihood crash families
    (exact trace / conditional RHS) exactly the artifact that SIGILLs
    the serving TPU's compiler — while a TPU host exporting
    ``platforms=('cpu',)`` would bake in a Mosaic ``pallas_call`` no CPU
    can run.  Cross-host Mosaic lowering works (verified: a CPU host
    exports a TPU fused artifact with ``use_fused_kernel=True``), so:

    * targets include tpu + crash-family likelihood: force the kernel
      on (raising when the config cannot ride it, or when non-TPU
      targets are also requested — one artifact cannot serve both);
    * targets exclude tpu: force the kernel off (plain XLA serves every
      platform).

    An explicit ``use_fused_kernel`` set by the caller wins (False keeps
    the documented escape hatch).
    """
    from ..models.population import PopulationModelDiffusion

    targets = _target_platforms(platforms)
    inner = (
        model.score_model
        if isinstance(model, PopulationModelDiffusion)
        else model
    )
    if not hasattr(inner, "use_fused_kernel"):
        return model

    def set_kernel(val):
        if isinstance(model, PopulationModelDiffusion):
            return dataclasses.replace(
                model,
                score_model=dataclasses.replace(inner, use_fused_kernel=val),
            )
        return dataclasses.replace(model, use_fused_kernel=val)

    wants_tpu = "tpu" in targets
    others = targets - {"tpu"}
    if inner.use_fused_kernel is True and others:
        # An explicit True bakes a Mosaic pallas_call into the artifact;
        # any non-TPU target in the set cannot execute it.  The
        # symbolic-batch path already rejects explicit True — mirror
        # that here instead of exporting a broken artifact.
        raise ExportRefused(
            "use_fused_kernel=True bakes a TPU pallas_call into the "
            f"artifact, but the target platforms {sorted(targets)} "
            "include non-TPU servers that cannot execute it — export "
            "with platforms=('tpu',), or drop the explicit flag so "
            "plain XLA serves every target"
        )
    crashy = likelihood and (
        getattr(inner, "trace_mode", None) == "exact" or _cond_dim(model) > 0
    )
    if wants_tpu and others and not crashy and inner.use_fused_kernel is None:
        # Mixed tpu+non-tpu targets, non-crash family: the auto dispatch
        # keys off the HOST backend at trace time, so a TPU host would
        # bake a pallas_call the cpu/gpu targets cannot run.  Plain XLA
        # serves every platform — force the kernel off.
        return set_kernel(False)
    if wants_tpu and crashy and inner.use_fused_kernel is not False:
        if others:
            raise ExportRefused(
                "one artifact cannot serve TPU and non-TPU platforms for "
                "this likelihood: the TPU side must run the fused kernel "
                "(a pallas_call other platforms cannot execute) because "
                "the plain-XLA exact-trace/conditional graph is a "
                "recorded TPU compiler-crasher — export one artifact per "
                "platform"
            )
        try:
            supported = inner._fused_supported(
                exact=getattr(inner, "trace_mode", None) == "exact"
            )
        except TypeError:  # symplectic: no exact-trace notion
            supported = inner._fused_supported()
        if not supported:
            raise ExportRefused(
                "this net is outside the fused kernel's envelope and its "
                "plain-XLA likelihood graph is a recorded TPU "
                "compiler-crasher — use trace_mode='hutchinson' (or "
                "another estimator), or use_fused_kernel=False to force "
                "the plain graph if your XLA build compiles it"
            )
        return set_kernel(True)
    if not wants_tpu and inner.use_fused_kernel is None:
        # plain XLA serves every non-TPU target; the auto dispatch on a
        # TPU host would otherwise bake in an unservable pallas_call
        return set_kernel(False)
    return model


def _supported_families():
    from ..models.flow import ODEFlow
    from ..models.population import PopulationModelDiffusion
    from ..models.score import ScoreModel
    from ..models.symplectic import SymplecticFlowModel

    return (ScoreModel, ODEFlow, PopulationModelDiffusion, SymplecticFlowModel)


def _check_model(model):
    if not isinstance(model, _supported_families()):
        raise TypeError(
            f"unsupported model type {type(model).__name__}; serving exports "
            "cover ScoreModel, ODEFlow, PopulationModelDiffusion and "
            "SymplecticFlowModel"
        )


def _plain_xla_variant(model, likelihood: bool = False, platforms=None):
    """The model with the fused Pallas kernels switched off.

    Symbolic-batch exports must lower through plain XLA: a ``pallas_call``
    needs a concrete grid, so a default-configured model on a single
    TPU device (where ``_common.auto_fused`` resolves to the kernel)
    would fail to export with a symbolic ``b`` dimension.

    ``likelihood=True`` additionally rejects the plain-XLA graph families
    recorded as TPU compiler-crashers on the log-prob path (exact-trace
    at large batches; any conditional RHS loop — BENCHMARKS.md, the
    TpuPriorityFusionQueue SIGILL): without the guard a symbolic-batch
    export lowers fine and the SERVER then dies at call time.
    """
    from ..models.population import PopulationModelDiffusion

    inner = (
        model.score_model
        if isinstance(model, PopulationModelDiffusion)
        else model
    )
    if getattr(inner, "use_fused_kernel", None) is True:
        raise ExportRefused(
            "use_fused_kernel=True cannot be honoured by a symbolic-batch "
            "export (a pallas_call needs a concrete grid) — pass batch=N "
            "to keep the kernel, or drop the explicit flag"
        )
    # Guards key off the artifact's TARGET platforms, not the host backend
    # (a TPU-hosted cpu-only export is safe; a CPU-hosted export that
    # includes 'tpu' is not).
    for_tpu = "tpu" in _target_platforms(platforms)
    if likelihood and getattr(inner, "trace_mode", None) == "exact" and for_tpu:
        raise ExportRefused(
            "symbolic-batch exports run plain XLA, and the pure-XLA "
            "exact-trace graph crashes the TPU compiler at "
            "large batches — export with batch=N (fused kernel), use "
            "trace_mode='hutchinson'/'hutchpp', or use "
            "export_log_prob_bucketed for variable batches on TPU"
        )
    if likelihood and for_tpu and _cond_dim(model) > 0:
        raise ExportRefused(
            "symbolic-batch log-prob exports run plain XLA, and the "
            "plain-XLA conditional RHS loop reliably crashes the TPU "
            "compiler (recorded TpuPriorityFusionQueue SIGILL; "
            "BENCHMARKS.md) — export conditional models with batch=N so "
            "the fused kernel serves the solve, or use "
            "export_log_prob_bucketed for variable batches"
        )
    if isinstance(model, PopulationModelDiffusion):
        return dataclasses.replace(
            model,
            score_model=dataclasses.replace(
                model.score_model, use_fused_kernel=False
            ),
        )
    if hasattr(model, "use_fused_kernel"):
        return dataclasses.replace(model, use_fused_kernel=False)
    return model


def _logprob_closure(model, atol, rtol, method, options, has_cond,
                     volume_corrected):
    """(x[, cond], seed) -> lp closure with the model baked in, dispatching
    on the family's log_prob signature."""
    from ..models.flow import ODEFlow
    from ..models.population import PopulationModelDiffusion
    from ..models.score import ScoreModel
    from ..models.symplectic import SymplecticFlowModel

    kw = dict(atol=atol, rtol=rtol, method=method, options=options)

    if isinstance(model, PopulationModelDiffusion):

        def fn(x, cond, seed):
            key = jax.random.PRNGKey(seed[0])
            return model.log_prob(
                x, conditional=cond, key=key,
                volume_corrected=volume_corrected, **kw,
            )[0]

    elif isinstance(model, (ScoreModel, ODEFlow)):

        def fn(x, cond, seed):
            key = jax.random.PRNGKey(seed[0])
            return model.log_prob(x, conditional=cond, key=key, **kw)[0]

    elif isinstance(model, SymplecticFlowModel):

        def fn(x, cond, seed):
            key = jax.random.PRNGKey(seed[0])
            return model.log_prob(key, x, conditional=cond, **kw)[0]

    else:
        raise TypeError(f"unsupported model type {type(model).__name__}")

    if has_cond:
        return fn
    return lambda x, seed: fn(x, None, seed)


def _data_dim(model) -> int:
    net = model.net if hasattr(model, "net") else model.score_model.net
    for attr in ("n_dimensions", "target_dimension", "n_data_dims"):
        if hasattr(net, attr):
            return getattr(net, attr)
    raise TypeError(f"cannot infer data dimension from {type(net).__name__}")


def _cond_dim(model) -> int:
    net = model.net if hasattr(model, "net") else model.score_model.net
    for attr in ("n_conditionals", "conditional_dimension"):
        if hasattr(net, attr):
            return getattr(net, attr)
    return 0


def export_log_prob(
    model,
    *,
    batch: Optional[int] = None,
    atol: float = 1e-5,
    rtol: float = 1e-5,
    method: str = "dopri5",
    options: Optional[dict] = None,
    volume_corrected: bool = False,
    platforms: Optional[Sequence[str]] = None,
) -> bytes:
    """Serialize ``model``'s log-density entry point as an AOT artifact.

    ``batch=None`` exports with a *symbolic* batch dimension (one artifact,
    any batch size); the fused Pallas kernels are switched off for the
    export in that case (a ``pallas_call`` needs a concrete grid).  A
    concrete ``batch`` pins the shape and keeps the model's kernel
    configuration as-is.  ``platforms`` defaults to the current backend
    (pass e.g. ``("tpu", "cpu")`` for a multi-platform artifact).

    ``volume_corrected`` is forwarded to the population wrapper's
    ``log_prob`` (False = the reference's standardized-unit densities;
    True = data-unit densities); the other families are always in data
    units.

    The exported callable's signature is ``(x[, conditional], seed)`` with
    ``seed`` an int32 array of shape (1,).
    """
    from jax import export as jexp

    _check_model(model)
    if batch is None:
        model = _plain_xla_variant(model, likelihood=True, platforms=platforms)
    else:
        model = _align_kernel_to_targets(model, platforms, likelihood=True)
    d = _data_dim(model)
    c = _cond_dim(model)
    fn = _logprob_closure(
        model, atol, rtol, method, options, has_cond=c > 0,
        volume_corrected=volume_corrected,
    )

    b = batch if batch is not None else 8  # placeholder, symbolized below
    specs = [jax.ShapeDtypeStruct((b, d), jnp.float32)]
    shapes = [f"b, {d}"]
    if c > 0:
        specs.append(jax.ShapeDtypeStruct((b, c), jnp.float32))
        shapes.append(f"b, {c}")
    specs.append(jax.ShapeDtypeStruct((1,), jnp.int32))
    shapes.append("1")

    if batch is None:
        specs = jexp.symbolic_args_specs(tuple(specs), tuple(shapes))

    exported = jexp.export(
        jax.jit(fn), platforms=list(platforms) if platforms else None
    )(*specs)
    return _wrap_provenance(exported.serialize(), platforms)


def deserialize_log_prob(
    blob: bytes, *, strict: bool = False
) -> Callable[..., jax.Array]:
    """Rehydrate an ``export_log_prob`` artifact into a callable.

    Returns ``f(x[, conditional], seed=0)`` — no flowfusion_tpu model
    objects are needed on the serving side.  The artifact's provenance
    stamp (package/jax/jaxlib versions, commit, target platforms) is
    checked against the serving toolchain: mismatches warn with re-export
    advice, or refuse with ``strict=True``; the stamp is exposed as
    ``.provenance`` on the returned callable.
    """
    from jax import export as jexp

    payload, meta = _strip_provenance(blob, strict)
    if bytes(payload[:8]) == _BUCKET_MAGIC:
        raise ValueError(
            "this blob is a bucketed bundle — use "
            "deserialize_log_prob_bucketed"
        )
    exported = jexp.deserialize(payload)

    def call(x, conditional=None, *, seed: int = 0):
        args = [jnp.asarray(x, jnp.float32)]
        if conditional is not None:
            args.append(jnp.asarray(conditional, jnp.float32))
        args.append(jnp.asarray([seed], jnp.int32))
        return exported.call(*args)

    call.exported = exported
    call.provenance = meta
    return call


# ---------------------------------------------------------------------------
# artifact provenance (who exported this, with what toolchain)
# ---------------------------------------------------------------------------

_PROV_MAGIC = b"FFTPUP1\n"


def _git_commit() -> Optional[str]:
    """Best-effort commit hash of the exporting checkout (None when the
    package is served from a wheel / outside a git worktree)."""
    import os
    import subprocess

    try:
        out = subprocess.run(
            ["git", "-C", os.path.dirname(os.path.dirname(__file__)),
             "rev-parse", "HEAD"],
            capture_output=True, text=True, timeout=5,
        )
        return out.stdout.strip() if out.returncode == 0 else None
    except Exception:
        return None


def _provenance(platforms, with_commit: bool = True) -> dict:
    import jaxlib

    from .. import __version__

    return {
        "format": 1,
        "package": "flowfusion_tpu",
        "package_version": __version__,
        "jax": jax.__version__,
        "jaxlib": jaxlib.__version__,
        # the commit is export-side info only; the serving-side stamp
        # (with_commit=False) never spawns the git subprocess — a
        # serving container without git or with a slow filesystem must
        # not pay a subprocess per artifact load for an uncompared field
        "commit": _git_commit() if with_commit else None,
        "platforms": sorted(_target_platforms(platforms)),
    }


def _wrap_provenance(payload: bytes, platforms) -> bytes:
    """Prepend a provenance envelope: magic, 4-byte header length, JSON
    header, payload.  Every exporter stamps this so a stale artifact's
    failure on a toolchain bump is diagnosable (the benchmark artifacts
    already carry the analogous meta; serving blobs did not)."""
    import json

    header = json.dumps(_provenance(platforms)).encode()
    return b"".join(
        [_PROV_MAGIC, len(header).to_bytes(4, "big"), header, payload]
    )


def _strip_provenance(blob: bytes, strict: bool):
    """Split ``blob`` into (payload, provenance-meta-or-None) and check the
    stamp against the serving toolchain.

    jax/jaxlib or package-version mismatches *warn* by default — jax's
    export format carries its own forward-compatibility window, so a
    mismatch is a diagnosis aid, not necessarily fatal; ``strict=True``
    refuses instead (the mode for fleets that pin toolchains).
    Pre-provenance blobs (no magic) pass through untouched.
    """
    import json
    import warnings

    if bytes(blob[:8]) != _PROV_MAGIC:
        return blob, None
    hlen = int.from_bytes(blob[8:12], "big")
    if len(blob) < 12 + hlen:
        raise ValueError(
            f"corrupt serving artifact: provenance header claims {hlen} "
            f"bytes but only {len(blob) - 12} follow — the blob was "
            "truncated in transit/storage; re-fetch or re-export it"
        )
    try:
        meta = json.loads(blob[12:12 + hlen].decode())
    except (UnicodeDecodeError, json.JSONDecodeError) as e:
        raise ValueError(
            "corrupt serving artifact: provenance header is not valid "
            f"JSON ({e}) — the blob was damaged; re-fetch or re-export it"
        ) from None
    current = _provenance(meta.get("platforms"), with_commit=False)
    mismatches = [
        f"{k}: artifact {meta.get(k)!r} vs serving {current[k]!r}"
        for k in ("package_version", "jax", "jaxlib")
        if meta.get(k) != current[k]
    ]
    if mismatches:
        msg = (
            "serving artifact was exported under a different toolchain — "
            + "; ".join(mismatches)
            + (f" (exported at commit {meta['commit'][:12]})"
               if meta.get("commit") else "")
            + ". jax.export maintains a compatibility window so this may "
            "still serve correctly, but if calls fail, re-export with the "
            "serving toolchain."
        )
        if strict:
            raise ValueError(
                msg + " (strict=True refuses mismatched artifacts; pass "
                "strict=False to attempt serving anyway)"
            )
        warnings.warn(msg, stacklevel=3)
    return blob[12 + hlen:], meta


# ---------------------------------------------------------------------------
# batch-bucketed likelihood serving (variable batches on TPU)
# ---------------------------------------------------------------------------

_BUCKET_MAGIC = b"FFTPUB1\n"


def export_log_prob_bucketed(
    model,
    *,
    batches: Sequence[int] = (1024, 8192, 65536),
    **export_kwargs,
) -> bytes:
    """A ladder of fixed-batch ``export_log_prob`` artifacts in one bundle.

    The standard way to serve *variable* batch sizes on TPU, where the
    symbolic-batch likelihood guards (correctly) refuse the crash-family
    graphs: each bucket is a concrete-batch export (so the fused kernels
    and the model's trace mode are kept as-is), and the bundle's
    dispatcher pads each request up to the next bucket — chunking by the
    largest bucket first, so ANY batch size is servable.

    ``export_kwargs`` are forwarded to :func:`export_log_prob`
    (tolerances, method, platforms, ...).
    """
    import json

    bs = sorted(set(int(b) for b in batches))
    if not bs or bs[0] < 1:
        raise ValueError(f"batches must be positive ints, got {batches!r}")
    # per-bucket exports are individually provenance-wrapped; strip those
    # inner envelopes (identical to the bundle-level stamp added below,
    # which is the authoritative one) so bundles carry ONE stamp and the
    # deserializer needs no duplicate-warning suppression
    blobs = [
        _strip_provenance(
            export_log_prob(model, batch=b, **export_kwargs), strict=False
        )[0]
        for b in bs
    ]
    header = json.dumps({"batches": bs, "cond": _cond_dim(model) > 0}).encode()
    parts = [_BUCKET_MAGIC, len(header).to_bytes(4, "big"), header]
    for blob in blobs:
        parts.append(len(blob).to_bytes(8, "big"))
        parts.append(blob)
    return _wrap_provenance(
        b"".join(parts), export_kwargs.get("platforms")
    )


def deserialize_log_prob_bucketed(
    blob: bytes, *, strict: bool = False
) -> Callable[..., jax.Array]:
    """Rehydrate a bucket bundle into one variable-batch callable.

    ``f(x[, conditional], seed=0)`` accepts any row count: each request is
    padded (with copies of its first row — always-finite solver inputs)
    up to the smallest bucket that fits, oversize requests are chunked by
    the largest bucket, and the padding rows are sliced off the result.
    The bundle's provenance stamp is checked once against the serving
    toolchain (warn, or refuse with ``strict=True``) and exposed as
    ``.provenance``.
    """
    import json

    blob, prov = _strip_provenance(blob, strict)
    if not blob.startswith(_BUCKET_MAGIC):
        raise ValueError(
            "not a bucketed log-prob bundle (bad magic) — use "
            "deserialize_log_prob for single-batch artifacts"
        )
    off = len(_BUCKET_MAGIC)
    hlen = int.from_bytes(blob[off:off + 4], "big")
    off += 4
    meta = json.loads(blob[off:off + hlen].decode())
    off += hlen
    fns = {}
    for b in meta["batches"]:
        blen = int.from_bytes(blob[off:off + 8], "big")
        off += 8
        # bucket payloads are unwrapped (the bundle stamp above is the
        # only one); pre-round-5 bundles with wrapped buckets still load
        # through deserialize_log_prob's own envelope handling
        fns[b] = deserialize_log_prob(blob[off:off + blen])
        off += blen
    buckets = sorted(fns)
    biggest = buckets[-1]
    has_cond = meta["cond"]

    def _pad(a, rows):
        return jnp.concatenate([a, jnp.repeat(a[:1], rows, axis=0)], axis=0)

    def call(x, conditional=None, *, seed: int = 0):
        x = jnp.asarray(x, jnp.float32)
        if has_cond and conditional is None:
            raise ValueError("this bundle serves a conditional model — "
                             "pass `conditional`")
        if conditional is not None:
            if not has_cond:
                raise ValueError(
                    "this bundle serves an unconditional model — "
                    "`conditional` would be silently ignored"
                )
            conditional = jnp.asarray(conditional, jnp.float32)
            if conditional.shape[0] != x.shape[0]:
                raise ValueError(
                    f"conditional has {conditional.shape[0]} rows but x "
                    f"has {x.shape[0]} — they must match"
                )
        n = x.shape[0]
        if n == 0:
            return jnp.zeros((0,), jnp.float32)
        out, pos = [], 0
        while pos < n:
            take = min(n - pos, biggest)
            bucket = next(b for b in buckets if b >= take)
            xc = x[pos:pos + take]
            cc = conditional[pos:pos + take] if has_cond else None
            if take < bucket:
                xc = _pad(xc, bucket - take)
                if has_cond:
                    cc = _pad(cc, bucket - take)
            lp = (
                fns[bucket](xc, cc, seed=seed)
                if has_cond
                else fns[bucket](xc, seed=seed)
            )
            out.append(lp[:take])
            pos += take
        return jnp.concatenate(out)

    call.buckets = tuple(buckets)
    call.provenance = prov
    return call


def _sampler_closure(model, atol, rtol, method, options, has_cond):
    """(base[, cond]) -> samples closure: the deterministic base->data map
    of each family (probability-flow ODE / CNF / symplectic Euler).

    ``atol``/``rtol`` of None mean each family's OWN sampling defaults
    (score: 1e-4, flow: torchdiffeq's 1e-9/1e-7 — reference parity);
    explicit tolerances are rejected where a family cannot honour them
    rather than silently dropped."""
    from ..models.flow import ODEFlow
    from ..models.population import PopulationModelDiffusion
    from ..models.score import ScoreModel
    from ..models.symplectic import SymplecticFlowModel

    if isinstance(model, ScoreModel):
        kw = dict(method=method, options=options)
        if atol is not None:
            kw["atol"] = atol
        if rtol is not None:
            kw["rtol"] = rtol

        def fn(base, cond):
            return model.sample_ode_from_base(base, conditional=cond, **kw)[0]

    elif isinstance(model, ODEFlow):
        kw = dict(method=method, options=options)
        if atol is not None:
            kw["atol"] = atol
        if rtol is not None:
            kw["rtol"] = rtol

        def fn(base, cond):
            return model.sample(base, conditional=cond, **kw)[0]

    elif isinstance(model, PopulationModelDiffusion):
        if atol is not None or rtol is not None:
            raise ValueError(
                "the population wrapper pins sampling tolerances to 1e-5 "
                "(reference parity) — drop atol/rtol for this family"
            )

        def fn(base, cond):
            return model.forward(
                base, conditional=cond, method=method, options=options
            )[0]

    elif isinstance(model, SymplecticFlowModel):
        # fixed-step family: the stepper comes from options ('euler',
        # 'leapfrog', ...), not the adaptive `method` arg.
        if atol is not None or rtol is not None or method != "dopri5":
            raise ValueError(
                "the symplectic sampler is fixed-step: configure it with "
                "options={'num_steps': k, 'method': 'euler' | 'leapfrog'}"
            )
        steps = (options or {}).get("num_steps", 1)
        stepper = (options or {}).get("method", "euler")

        def fn(base, cond):
            return model.sample(
                None, (base.shape[0], base.shape[1] // 2),
                conditional=cond, num_steps=steps, method=stepper,
                base=base,
            )

    else:
        raise TypeError(f"unsupported model type {type(model).__name__}")

    if has_cond:
        return fn
    return lambda base: fn(base, None)


def export_sampler(
    model,
    *,
    batch: Optional[int] = None,
    atol: Optional[float] = None,
    rtol: Optional[float] = None,
    method: str = "dopri5",
    options: Optional[dict] = None,
    platforms: Optional[Sequence[str]] = None,
) -> bytes:
    """Serialize ``model``'s deterministic base->data sampler.

    The exported callable takes standard-normal base noise
    ``(batch, D)`` — ``(batch, 2 D)`` joint (q, p) noise for the
    symplectic family — plus the conditional when the model has one, and
    returns samples in data units.  Keeping the noise an *input* (rather
    than an internal draw) makes the artifact deterministic, replayable,
    and batch-polymorphic (``batch=None`` exports a symbolic batch dim).
    Solver tolerances follow each family's sampling defaults unless
    overridden; the population wrapper pins 1e-5 (reference parity).
    The symplectic family is fixed-step: pass
    ``options={'num_steps': k, 'method': 'euler' | 'leapfrog'}``
    (``atol/rtol/method`` do not apply to it).  As with
    ``export_log_prob``, ``batch=None`` switches the fused Pallas
    kernels off for the export.
    """
    from jax import export as jexp

    from ..models.symplectic import SymplecticFlowModel

    _check_model(model)
    if batch is None:
        model = _plain_xla_variant(model, platforms=platforms)
    else:
        model = _align_kernel_to_targets(model, platforms, likelihood=False)
    d = _data_dim(model)
    if isinstance(model, SymplecticFlowModel):
        d = 2 * d
    c = _cond_dim(model)
    fn = _sampler_closure(model, atol, rtol, method, options, has_cond=c > 0)

    b = batch if batch is not None else 8
    specs = [jax.ShapeDtypeStruct((b, d), jnp.float32)]
    shapes = [f"b, {d}"]
    if c > 0:
        specs.append(jax.ShapeDtypeStruct((b, c), jnp.float32))
        shapes.append(f"b, {c}")

    if batch is None:
        specs = jexp.symbolic_args_specs(tuple(specs), tuple(shapes))

    exported = jexp.export(
        jax.jit(fn), platforms=list(platforms) if platforms else None
    )(*specs)
    return _wrap_provenance(exported.serialize(), platforms)


def deserialize_sampler(
    blob: bytes, *, strict: bool = False
) -> Callable[..., jax.Array]:
    """Rehydrate an ``export_sampler`` artifact: ``f(base[, conditional])``.

    Provenance handling matches :func:`deserialize_log_prob` (warn on
    toolchain mismatch, refuse with ``strict=True``, ``.provenance``
    attribute).
    """
    from jax import export as jexp

    payload, meta = _strip_provenance(blob, strict)
    if bytes(payload[:8]) == _BUCKET_MAGIC:
        # Same actionable rejection as deserialize_log_prob: feeding a
        # bucketed bundle to jexp.deserialize fails with an opaque
        # flatbuffer parse error otherwise.
        raise ValueError(
            "this blob is a bucketed bundle — use "
            "deserialize_log_prob_bucketed (bucketed exports carry "
            "likelihood artifacts, not samplers)"
        )
    exported = jexp.deserialize(payload)

    def call(base, conditional=None):
        args = [jnp.asarray(base, jnp.float32)]
        if conditional is not None:
            args.append(jnp.asarray(conditional, jnp.float32))
        return exported.call(*args)

    call.exported = exported
    call.provenance = meta
    return call


def save_artifact(path: str, blob: bytes) -> None:
    """Write a serialized artifact to disk."""
    with open(path, "wb") as f:
        f.write(blob)


def load_artifact(path: str) -> bytes:
    """Read a serialized artifact from disk."""
    with open(path, "rb") as f:
        return f.read()
