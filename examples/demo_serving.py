"""AOT serving walkthrough: train briefly, export, serve without the model.

End-to-end demonstration of the production-serving surface the reference
lacks (utils/serving.py; SURVEY.md §5 aux subsystems):

  1. train the flagship diffusion model briefly (or load the committed
     demo-grade checkpoint when present — the default);
  2. export its log-density entry point as a portable StableHLO artifact,
     both batch-polymorphic (one artifact, any batch size) and
     fixed-batch (keeps the fused Pallas kernels on TPU);
  3. "ship" the artifact: drop every model object and serve from the
     bytes alone, comparing served densities against the live model;
  4. export the deterministic base->data sampler the same way.

Run (any backend):  python examples/demo_serving.py [--quick]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("JAX_PLATFORMS"):
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from flowfusion_tpu.utils import serving


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="tiny training run")
    ap.add_argument(
        "--out", default="/tmp/flowfusion_logprob.stablehlo",
        help="artifact path",
    )
    args = ap.parse_args()

    from bench import build_trained_model

    t0 = time.time()
    model, x, _ = build_trained_model(
        jax.random.PRNGKey(0),
        steps=50 if args.quick else 400,
        from_checkpoint=not args.quick,
    )
    print(f"model ready in {time.time()-t0:.1f}s")
    xs = x[:512]

    # Hutchinson trace for the exports: symbolic-batch artifacts lower
    # through plain XLA, and on TPU the plain exact-trace (or
    # conditional) log-prob graph is a recorded compiler-crasher — the
    # guard in utils/serving.py would (correctly) refuse it.
    import dataclasses

    model = dataclasses.replace(model, trace_mode="hutchinson")

    # --- batch-polymorphic export (plain-XLA lowering) -----------------
    t0 = time.time()
    blob = serving.export_log_prob(model, atol=1e-4, rtol=1e-4)
    print(
        f"symbolic-batch artifact: {len(blob):,} bytes "
        f"(exported in {time.time()-t0:.1f}s)"
    )
    serving.save_artifact(args.out, blob)

    # --- serve WITHOUT the model: only the artifact bytes --------------
    f = serving.deserialize_log_prob(serving.load_artifact(args.out))
    for b in (64, 512):
        lp = np.asarray(f(xs[:b], seed=7))
        print(f"served batch {b:4d}: mean log p = {lp.mean():+.4f}")

    # live-model agreement at the same tolerances
    lp_live = np.asarray(
        jax.jit(
            lambda m, xx, kk: m.log_prob(xx, key=kk, atol=1e-4, rtol=1e-4)[0]
        )(model, xs[:64], jax.random.PRNGKey(7))
    )
    lp_served = np.asarray(f(xs[:64], seed=7))
    print(
        "served vs live max |Δlog p|: "
        f"{np.max(np.abs(lp_served - lp_live)):.2e}"
    )

    # --- fixed-batch export: keeps the fused Pallas kernel on TPU ------
    blob_fixed = serving.export_log_prob(model, batch=512, atol=1e-4, rtol=1e-4)
    f_fixed = serving.deserialize_log_prob(blob_fixed)
    lp_fixed = np.asarray(f_fixed(xs, seed=7))
    print(
        f"fixed-batch artifact: {len(blob_fixed):,} bytes; "
        f"batch-512 mean log p = {lp_fixed.mean():+.4f}"
    )

    # --- bucketed bundle: variable batches on TPU ----------------------
    # (where the symbolic-batch likelihood guards pin batches, a ladder
    # of fixed-batch artifacts + pad-to-next-bucket dispatcher serves
    # ANY request size; see docs/serving.md)
    blob_b = serving.export_log_prob_bucketed(
        model, batches=(64, 512), atol=1e-4, rtol=1e-4
    )
    fb = serving.deserialize_log_prob_bucketed(blob_b)
    for n in (33, 512, 700):
        lp_b = np.asarray(fb(xs[:n] if n <= len(xs) else np.tile(xs, (2, 1))[:n], seed=7))
        print(
            f"bucketed bundle {fb.buckets}: served {n} rows, "
            f"mean log p = {lp_b.mean():+.4f}"
        )

    # --- sampler artifact: deterministic base -> data map --------------
    blob_s = serving.export_sampler(model, atol=1e-4, rtol=1e-4)
    g = serving.deserialize_sampler(blob_s)
    base = jax.random.normal(jax.random.PRNGKey(3), (256, 2))
    samples = np.asarray(g(base))
    print(
        f"sampler artifact: {len(blob_s):,} bytes; 256 samples with "
        f"mean {samples.mean(0)} std {samples.std(0)}"
    )


if __name__ == "__main__":
    main()
