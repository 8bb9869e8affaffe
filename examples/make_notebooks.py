"""Generate the demo notebooks (.ipynb mirrors of the reference's).

The reference ships its end-to-end workflows as notebooks
(demo_diffusion.ipynb, demo_flow.ipynb); this framework's canonical demos
are the scripts in this directory, and this generator renders notebook
versions of the same workflows so reference users find the artifact they
expect.  Regenerate after changing the demos:

    python examples/make_notebooks.py            # write the .ipynb files
    python examples/make_notebooks.py --execute  # also run them (QUICK mode)
"""

from __future__ import annotations

import argparse
import os
import pathlib

import nbformat as nbf

HERE = pathlib.Path(__file__).resolve().parent


def _nb(cells):
    nb = nbf.v4.new_notebook()
    nb.metadata["kernelspec"] = {
        "display_name": "Python 3",
        "language": "python",
        "name": "python3",
    }
    nb.cells = [
        nbf.v4.new_markdown_cell(src) if kind == "md" else nbf.v4.new_code_cell(src)
        for kind, src in cells
    ]
    return nb


DIFFUSION_CELLS = [
    ("md", """\
# Score-based diffusion on a 2-D Gaussian mixture

TPU-native mirror of the reference's `demo_diffusion.ipynb`
(flowfusion / Cosmo-Pop): sample a two-component mixture, train a VESDE
score model with staged denoising-score-matching, draw samples with the
reverse SDE and the probability-flow ODE, and compare all four
log-likelihood strategies (exact trace, Hutchinson, Hutch++, XTrace)
against the analytic density.

Everything runs as compiled JAX: training is a `lax.scan` of jitted DSM
steps, the samplers and likelihood solves are single compiled programs
(no Python dispatch per solver step).  Set `QUICK = False` for the
full-size run (100k points, reference schedule)."""),
    ("code", """\
# small sizes for a fast first run; set FLOWFUSION_DEMO_FULL=1 (or edit
# this to False) for the reference-scale run
import os
QUICK = os.environ.get("FLOWFUSION_DEMO_FULL", "0") != "1"

import dataclasses, time
import jax, jax.numpy as jnp, numpy as np
import matplotlib.pyplot as plt

from flowfusion_tpu.models.nets import ScoreMLPConfig, init_score_mlp
from flowfusion_tpu.models.population import PopulationModelDiffusion
from flowfusion_tpu.ops.sde import VESDE
from flowfusion_tpu.train import fit
from flowfusion_tpu.utils.data import REFERENCE_GMM, standardization_stats, train_val_test_split

key = jax.random.PRNGKey(0)
k_data, k_split, k_net, k_fit, k_smp, k_lp = jax.random.split(key, 6)"""),
    ("md", """\
## Data

The demo problem of the reference notebooks: a two-component 2-D Gaussian
mixture with an analytic `log_prob` that serves as ground truth for every
check below (`flowfusion_tpu.utils.data.REFERENCE_GMM`)."""),
    ("code", """\
n = 4000 if QUICK else 100_000
x = REFERENCE_GMM.sample(k_data, n)
x_train, x_val, x_test = train_val_test_split(k_split, x)
shift, scale = standardization_stats(x_train)

plt.figure(figsize=(4, 4))
plt.hexbin(np.asarray(x[:, 0]), np.asarray(x[:, 1]), gridsize=40)
plt.title(f"{n} mixture samples"); plt.show()"""),
    ("md", """\
## Model and staged training

`PopulationModelDiffusion` owns the standardization statistics (the
reference's shift/scale buffers) around a `ScoreModel` =
(MLP score net, VESDE).  `fit` reproduces the reference notebook's staged
(batch-size, learning-rate) schedule with jitted, scanned DSM steps."""),
    ("code", """\
model = PopulationModelDiffusion.create(
    k_net, VESDE(), n_dimensions=2, units=(128, 128, 128), shift=shift, scale=scale
)

stages = ((32, 1e-3), (64, 1e-4)) if QUICK else ((32, 1e-3), (64, 1e-4), (128, 1e-5), (256, 1e-6))
epochs = 10 if QUICK else 250
t0 = time.time()
model, results = fit(model, k_fit, x_train, x_val=x_val, stages=stages,
                     epochs_per_stage=epochs, log_every=max(1, epochs // 5))
print(f"training wall-clock: {time.time() - t0:.1f}s")

plt.figure(figsize=(5, 3))
for r in results:
    plt.plot(np.asarray(r.val_losses), label=f"bs={r.batch_size}")
plt.xlabel("epoch"); plt.ylabel("val DSM loss"); plt.legend(); plt.show()"""),
    ("md", """\
## Sampling: reverse SDE and probability-flow ODE

`sample_sde` is the reference's 100-step Euler–Maruyama ancestral sampler
(one `lax.scan`, returns the final denoised mean); `forward` integrates
the probability-flow ODE from base noise with the adaptive dopri5
solver."""),
    ("code", """\
n_s = 2000 if QUICK else 50_000
t0 = time.time(); samples_sde = model.sample_sde(k_smp, (n_s, 2)); jax.block_until_ready(samples_sde)
t_sde = time.time() - t0
base = jax.random.normal(jax.random.PRNGKey(7), (n_s, 2))
t0 = time.time(); samples_ode, _ = model.forward(base); jax.block_until_ready(samples_ode)
t_ode = time.time() - t0

fig, axes = plt.subplots(1, 2, figsize=(8, 4))
for ax, s, name, t in ((axes[0], samples_sde, "SDE", t_sde), (axes[1], samples_ode, "ODE", t_ode)):
    ax.hexbin(np.asarray(s[:, 0]), np.asarray(s[:, 1]), gridsize=40)
    ax.set_title(f"{name} samples ({t:.2f}s)")
plt.show()"""),
    ("md", """\
## Exact CNF log-likelihood, four trace strategies

The augmented probability-flow solve gives the exact change-of-variables
log-density.  The divergence term can be computed with the exact trace
(forward-mode basis tangents) or estimated (Hutchinson / Hutch++ /
XTrace probes, fixed per solve exactly like the reference).  Compare the
summed test-set log-density of each strategy against the analytic
mixture — the reference's own validation protocol."""),
    ("code", """\
x_eval = x_test[: (2000 if QUICK else 50_000)]
truth = float(jnp.sum(REFERENCE_GMM.log_prob(x_eval)))
print(f"analytic truth: {truth:.2f}")
per_point = {}
for mode in ("exact", "hutchinson", "hutchpp", "xtrace"):
    m = dataclasses.replace(model, score_model=dataclasses.replace(
        model.score_model, trace_mode=mode, hpp_rank=1, hpp_vecs=1, xt_vecs=2))
    t0 = time.time()
    lp, stats = m.log_prob(x_eval, key=k_lp, atol=1e-4, rtol=1e-4, volume_corrected=True)
    jax.block_until_ready(lp)
    per_point[mode] = np.asarray(lp)
    rel = abs(float(jnp.sum(lp)) - truth) / abs(truth)
    print(f"{mode:10s}: {time.time()-t0:6.2f}s  sum={float(jnp.sum(lp)):13.2f}  "
          f"rel.err={rel:.4%}  rhs_evals={int(jnp.sum(stats.n_func_evals))}")"""),
    ("code", """\
# Per-point scatter of model density vs truth (reference notebook cell 18-21)
lp_true = np.asarray(REFERENCE_GMM.log_prob(x_eval))
fig, axes = plt.subplots(1, 4, figsize=(14, 3.2), sharey=True)
for ax, mode in zip(axes, per_point):
    ax.plot(lp_true, per_point[mode], ".", ms=1, alpha=0.3)
    lo, hi = lp_true.min(), lp_true.max()
    ax.plot([lo, hi], [lo, hi], "k--", lw=1)
    ax.set_title(mode); ax.set_xlabel("analytic log p")
axes[0].set_ylabel("model log p")
plt.tight_layout(); plt.show()"""),
    ("md", """\
## Notes

* Tolerances follow the reference defaults (`atol=rtol=1e-4` here; the
  population wrapper's `forward` uses its hard-coded 1e-5).
* `volume_corrected=True` adds the −Σ log(scale) change-of-variables term
  the reference's diffusion wrapper omits (documented quirk; pass
  `False` for bit-parity with the reference's standardized-unit
  densities).
* For throughput work use `trace_mode="hutchinson"` with
  `options={"controller": "pi"}` and a large batch — see BENCHMARKS.md."""),
]


FLOW_CELLS = [
    ("md", """\
# Conditional flow matching (rectified flow) on the 2-D mixture

TPU-native mirror of the reference's `demo_flow.ipynb`: train a CNF
velocity field with the linear-interpolant flow-matching loss, sample by
integrating the learned ODE from Gaussian noise, and validate the exact
log-likelihood against the analytic mixture."""),
    ("code", """\
# set FLOWFUSION_DEMO_FULL=1 for the reference-scale run
import os
QUICK = os.environ.get("FLOWFUSION_DEMO_FULL", "0") != "1"

import time
import jax, jax.numpy as jnp, numpy as np
import matplotlib.pyplot as plt

from flowfusion_tpu.models.flow import ODEFlow
from flowfusion_tpu.train import fit
from flowfusion_tpu.utils.data import REFERENCE_GMM, standardization_stats, train_val_test_split

key = jax.random.PRNGKey(0)
k_data, k_split, k_net, k_fit, k_smp = jax.random.split(key, 5)

n = 4000 if QUICK else 50_000
x = REFERENCE_GMM.sample(k_data, n)
x_train, x_val, x_test = train_val_test_split(k_split, x)
shift, scale = standardization_stats(x_train)"""),
    ("md", """\
## Train with the flow-matching loss

`compute_linear_velocity_field` builds the rectified-flow target
(x_t = (1−t)·x₀ + t·x_T, v̂ = x_T − x₀); the loss is the mean squared
velocity error.  Same staged schedule utility as the diffusion demo."""),
    ("code", """\
flow = ODEFlow.create(k_net, target_dimension=2, hidden_units=(128, 128),
                      target_shift=shift, target_scale=scale)

def fm_loss(model, k, xb, cond):
    return model.flow_matching_loss(k, xb, cond)

stages = ((32, 1e-3), (64, 1e-4)) if QUICK else ((32, 1e-3), (64, 1e-4), (128, 1e-5), (256, 1e-6))
epochs = 10 if QUICK else 250
flow, results = fit(flow, k_fit, x_train, x_val=x_val, stages=stages,
                    epochs_per_stage=epochs, loss_fn=fm_loss, log_every=max(1, epochs // 5))"""),
    ("md", """\
## Sample and validate the likelihood

Sampling integrates the velocity field from t=1 (noise) to t=0 (data)
with torchdiffeq's default tolerances, exactly like the reference's
`ODEFlow.sample`; the likelihood augments the state with the divergence
integral (exact trace by default)."""),
    ("code", """\
n_s = 2000 if QUICK else 25_000
xT = jax.random.normal(k_smp, (n_s, 2))
t0 = time.time(); samples, _ = flow.sample(xT); jax.block_until_ready(samples)
print(f"CNF sampling ({n_s}): {time.time()-t0:.2f}s")

x_eval = x_test[:n_s]
truth = float(jnp.sum(REFERENCE_GMM.log_prob(x_eval)))
t0 = time.time(); lp, stats = flow.log_prob(x_eval, atol=1e-4, rtol=1e-4); jax.block_until_ready(lp)
rel = abs(float(jnp.sum(lp)) - truth) / abs(truth)
print(f"log_prob: {time.time()-t0:.2f}s  sum={float(jnp.sum(lp)):.2f} "
      f"(truth {truth:.2f})  rel.err={rel:.4%}  rhs_evals={int(jnp.sum(stats.n_func_evals))}")

fig, axes = plt.subplots(1, 2, figsize=(8, 4))
axes[0].hexbin(np.asarray(samples[:, 0]), np.asarray(samples[:, 1]), gridsize=40)
axes[0].set_title("CNF samples")
axes[1].plot(np.asarray(REFERENCE_GMM.log_prob(x_eval)), np.asarray(lp), ".", ms=1, alpha=0.3)
axes[1].set_title("model vs analytic log p")
plt.tight_layout(); plt.show()"""),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--execute", action="store_true", help="run the notebooks (QUICK mode)")
    ap.add_argument("--full", action="store_true", help="execute at reference scale (QUICK = False)")
    args = ap.parse_args()

    notebooks = {
        "demo_diffusion.ipynb": _nb(DIFFUSION_CELLS),
        "demo_flow.ipynb": _nb(FLOW_CELLS),
    }
    for name, nb in notebooks.items():
        if args.execute or args.full:
            from nbclient import NotebookClient

            # --full flips the scale via the env var the QUICK cell reads
            # instead of rewriting the cell source: the committed
            # notebook keeps its fast-first-run default either way (a
            # persisted QUICK = False would hand every fresh reader the
            # hours-long reference-scale training by default).
            if args.full:
                os.environ["FLOWFUSION_DEMO_FULL"] = "1"
            else:
                os.environ.pop("FLOWFUSION_DEMO_FULL", None)
            NotebookClient(nb, timeout=3600).execute()
        path = HERE / name
        nbf.write(nb, path)
        print("wrote", path)


if __name__ == "__main__":
    main()
