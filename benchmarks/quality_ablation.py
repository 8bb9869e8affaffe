"""Root-cause the demo-protocol statistical-quality gap (VERDICT r3 item 1).

The reference notebook (demo_diffusion.ipynb cells 9-10, 15, 17) trains a
bare ``ScoreModel`` (raw data, no standardization, no EMA) with the staged
small-batch schedule and reports 0.037% relative summed-log-density error
on the 50k test split; this framework's committed mirror on the same
schedule landed at 0.54%.  This harness isolates *training dynamics* from
everything else by holding the data, the split, and the evaluator fixed:

  gen        torch-RNG data + 25:25:50 random_split, saved to npz
  train-ref  the reference library's OWN training loop (torchdiffeq import
             stubbed -- training never touches the solver) on that data
  train-jax  this framework's ``fit`` on the SAME arrays (bare ScoreModel,
             raw data, XLA engine, notebook schedule), with bisection arms
  eval       one evaluator for every arm: convert weights if needed, this
             framework's exact-trace log_prob at tight tolerance, compare
             with the analytic GMM on the SAME test rows

FINDING (2026-08-20, seed 0, 50k test rows, exact trace @1e-6): the gap
was an evaluation artifact, not training dynamics.  The round-3 mirror
scored models against utils.data.DEMO_GMM, which is NOT the notebook's
mixture; against the notebook's own density, the reference's code
retrained here lands at 0.0876% and this framework's fit on identical
data/split at 0.1040% -- statistically equivalent (the notebook's
published 0.037% is one unseeded draw).  See BENCHMARKS.md.

Run (CPU):
  python benchmarks/quality_ablation.py gen --seed 0
  python benchmarks/quality_ablation.py train-ref --seed 0
  python benchmarks/quality_ablation.py train-jax --seed 0 --arm bare-raw
  python benchmarks/quality_ablation.py eval --weights benchmarks/ablation/ref_s0_final.npz
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
OUT = os.path.join(HERE, "ablation")
REFERENCE = "/root/reference"

sys.path.insert(0, REPO)

# Notebook schedule (demo_diffusion.ipynb cell 9-10).
STAGES = ((32, 1e-3), (64, 1e-4), (128, 1e-5), (256, 1e-6))
EPOCHS = 250


def _data_path(seed):
    return os.path.join(OUT, f"data_s{seed}.npz")


# ---------------------------------------------------------------------------
# gen: notebook data + split, torch RNG
# ---------------------------------------------------------------------------

def cmd_gen(args):
    import torch

    torch.manual_seed(args.seed)
    # gmm_rand from the notebook (cell 3): the REFERENCE_GMM constants
    # (utils/data.py) -- NOT DEMO_GMM, whose different components were
    # the round-3 quality-gap artifact.
    mu_1 = torch.tensor([-3.0, 3.0])
    mu_2 = torch.tensor([2.0, -2.0])
    L_1 = torch.linalg.cholesky(torch.tensor([[1.0, 0.0], [0.0, 1.0]]))
    L_2 = torch.linalg.cholesky(torch.tensor([[2.0, 0.9], [0.9, 2.0]]))
    w_1 = 0.4
    N = args.n
    N_1 = int(N * w_1)
    x = torch.randn(N, 2)
    x[:N_1] = mu_1 + x[:N_1] @ L_1
    x[N_1:] = mu_2 + x[N_1:] @ L_2
    x = x[torch.randperm(N)]

    from torch.utils.data import random_split

    tr, va, te = random_split(x, (0.25, 0.25, 0.5))
    os.makedirs(OUT, exist_ok=True)
    np.savez(
        _data_path(args.seed),
        x=x.numpy(),
        train_idx=np.asarray(tr.indices),
        val_idx=np.asarray(va.indices),
        test_idx=np.asarray(te.indices),
    )
    print(f"wrote {_data_path(args.seed)}: x{tuple(x.shape)} "
          f"train {len(tr.indices)} val {len(va.indices)} test {len(te.indices)}")


# ---------------------------------------------------------------------------
# train-ref: the reference library's own loop
# ---------------------------------------------------------------------------

def _import_reference():
    """Import the reference package with torchdiffeq stubbed.

    The stub is never called: the notebook training loop (cell 10) only
    uses MLP/VESDE/ScoreModel/denoising_score_matching, none of which
    touch the ODE solver.
    """
    import types

    stub = types.ModuleType("torchdiffeq")
    stub.odeint = stub.odeint_adjoint = None
    sys.modules.setdefault("torchdiffeq", stub)
    sys.path.insert(0, REFERENCE)
    from flowfusion.diffusion import (  # noqa: E501
        MLP, VESDE, ScoreModel, denoising_score_matching,
    )
    return MLP, VESDE, ScoreModel, denoising_score_matching


def cmd_train_ref(args):
    import torch

    torch.set_num_threads(1)  # single-core sandbox; intra-op threads hurt
    MLP, VESDE, ScoreModel, denoising_score_matching = _import_reference()
    d = np.load(_data_path(args.seed))
    x = torch.from_numpy(d["x"])
    x_train = x[d["train_idx"]]
    x_val = x[d["val_idx"]]

    # Model init consumes the torch global RNG exactly as the notebook
    # does after data gen + split (cell 7 follows cell 3/9).
    torch.manual_seed(args.seed)
    _ = torch.randn(x.shape[0], 2)  # replay data-gen draws
    _ = torch.randperm(x.shape[0])  # replay the shuffle
    _ = torch.randperm(x.shape[0])  # replay random_split's permutation
    net = MLP(n_dimensions=2, n_conditionals=0, units=[128, 128, 128])
    sde = VESDE()
    sm = ScoreModel(model=net, sde=sde)

    from torch.optim import Adam
    from torch.utils.data import DataLoader

    epochs = args.epochs
    t0 = time.time()
    curves = {"train": [], "val": []}
    for si, (bs, lr) in enumerate(STAGES):
        opt = Adam(sm.model.parameters(), lr=lr)
        loader = DataLoader(x_train, shuffle=True, batch_size=bs)
        for epoch in range(epochs):
            tl = 0.0
            c = 0
            for xb in loader:
                opt.zero_grad()
                loss = denoising_score_matching(sm, xb)
                loss.backward()
                opt.step()
                tl += float(loss.detach())
                c += 1
            with torch.no_grad():
                vl = float(denoising_score_matching(sm, x_val))
            curves["train"].append(tl / c)
            curves["val"].append(vl)
            if (epoch + 1) % 25 == 0:
                print(
                    f"[ref s{args.seed} bs={bs} lr={lr:.0e}] epoch "
                    f"{epoch+1}/{epochs} train={tl/c:.4f} val={vl:.4f} "
                    f"({time.time()-t0:.0f}s)",
                    flush=True,
                )
        sd = {k: v.numpy() for k, v in sm.state_dict().items()}
        np.savez(os.path.join(OUT, f"ref_s{args.seed}_stage{si}.npz"), **sd)
    np.savez(os.path.join(OUT, f"ref_s{args.seed}_final.npz"), **sd)
    with open(os.path.join(OUT, f"ref_s{args.seed}_curves.json"), "w") as f:
        json.dump(curves, f)
    print(f"done in {time.time()-t0:.0f}s -> ref_s{args.seed}_final.npz")


# ---------------------------------------------------------------------------
# train-jax: this framework, same data, bisection arms
# ---------------------------------------------------------------------------

def cmd_train_jax(args):
    # Honour JAX_PLATFORMS when set (pass cpu for deterministic offline
    # runs); default is the ambient backend (TPU when tunnelled).
    import jax

    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    import jax.numpy as jnp

    from flowfusion_tpu.models.nets import ScoreMLPConfig, init_score_mlp
    from flowfusion_tpu.models.score import ScoreModel
    from flowfusion_tpu.ops.sde import VESDE
    from flowfusion_tpu.train import fit

    d = np.load(_data_path(args.seed))
    x = d["x"]
    x_train = jnp.asarray(x[d["train_idx"]])
    x_val = jnp.asarray(x[d["val_idx"]])

    cfg = ScoreMLPConfig(n_dimensions=2, units=(128, 128, 128))
    key = jax.random.PRNGKey(args.seed)
    k_net, k_fit = jax.random.split(key)
    params = init_score_mlp(k_net, cfg)
    stages, epochs, ema = STAGES, args.epochs, None
    if args.arm == "tpu-schedule":
        # this framework's own protocol (large-batch staged + EMA — the
        # examples/demo_diffusion.py --tpu-schedule recipe) on the
        # reference's data: the "beat the reference's 0.037%" arm
        stages = ((128, 1e-3), (256, 3e-4), (512, 1e-4), (512, 3e-5),
                  (512, 1e-5))
        epochs, ema = (args.epochs if args.epochs != EPOCHS else 400), 0.999
    if args.arm == "bare-raw-torchinit":
        # torch-initialized weights (replayed exactly as train-ref's),
        # trained by our fit: isolates init-draw luck from dynamics.
        import torch

        torch.manual_seed(args.seed)
        _ = torch.randn(x.shape[0], 2)
        _ = torch.randperm(x.shape[0])
        _ = torch.randperm(x.shape[0])
        MLP, _, _, _ = _import_reference()
        net = MLP(n_dimensions=2, n_conditionals=0, units=[128, 128, 128])
        from flowfusion_tpu.utils.convert import score_mlp_from_torch

        params = score_mlp_from_torch(
            {k: v.numpy() for k, v in net.state_dict().items()}
        )
    model = ScoreModel(params=params, net=cfg, sde=VESDE())

    t0 = time.time()
    model, results = fit(
        model,
        k_fit,
        x_train,
        x_val=x_val,
        stages=stages,
        epochs_per_stage=epochs,
        log_every=25,
        ema_decay=ema,
        engine="auto" if args.arm == "tpu-schedule" else "xla",
    )
    flat = jax.tree_util.tree_flatten_with_path(model.params)[0]
    def _key(path):
        return ".".join(
            str(getattr(p, "key", getattr(p, "idx", getattr(p, "name", p))))
            for p in path
        )
    np.savez(
        os.path.join(OUT, f"jax_{args.arm}_s{args.seed}.npz"),
        **{f"params/{_key(p)}": np.asarray(v) for p, v in flat},
    )
    curves = {
        "train": [float(v) for r in results for v in r.train_losses],
        "val": [float(v) for r in results for v in r.val_losses],
    }
    with open(os.path.join(OUT, f"jax_{args.arm}_s{args.seed}_curves.json"), "w") as f:
        json.dump(curves, f)
    print(f"done in {time.time()-t0:.0f}s -> jax_{args.arm}_s{args.seed}.npz")


# ---------------------------------------------------------------------------
# eval: one evaluator for every arm
# ---------------------------------------------------------------------------

def cmd_eval(args):
    # Honour JAX_PLATFORMS when set (pass cpu for deterministic offline
    # runs); default is the ambient backend (TPU when tunnelled).
    import jax

    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    import jax.numpy as jnp

    from flowfusion_tpu.models.nets import ScoreMLPConfig
    from flowfusion_tpu.models.score import ScoreModel
    from flowfusion_tpu.ops.sde import VESDE
    from flowfusion_tpu.utils.convert import score_mlp_from_torch

    d = np.load(_data_path(args.seed))
    x_test = jnp.asarray(d["x"][d["test_idx"]])[: args.rows]

    w = np.load(args.weights)
    if any(k.startswith("params/") for k in w.files):
        params = _unflatten(
            {k.split("/", 1)[1]: jnp.asarray(w[k]) for k in w.files}
        )
    else:
        sd = {k: w[k] for k in w.files}
        sd = {k[len("model."):] if k.startswith("model.") else k: v
              for k, v in sd.items()}
        params = score_mlp_from_torch(sd)

    cfg = ScoreMLPConfig(n_dimensions=2, units=(128, 128, 128))
    model = ScoreModel(params=params, net=cfg, sde=VESDE(), trace_mode="exact")

    truth_rows = jnp.asarray(_notebook_gmm_logprob(np.asarray(x_test)))
    truth = float(jnp.sum(truth_rows))
    t0 = time.time()
    lp, stats = model.log_prob(x_test, rtol=args.rtol, atol=args.rtol)
    lp_sum = float(jnp.sum(lp))
    rel = abs(lp_sum - truth) / abs(truth)
    per_point = float(jnp.mean(lp - truth_rows))
    mean_abs = float(jnp.mean(jnp.abs(lp - truth_rows)))
    out = {
        "weights": os.path.basename(args.weights),
        "rows": int(x_test.shape[0]),
        "truth_sum": truth,
        "model_sum": lp_sum,
        "rel_err_pct": 100.0 * rel,
        "mean_bias_nats": per_point,
        "mean_abs_err_nats": mean_abs,
        "rtol": args.rtol,
        "eval_s": time.time() - t0,
    }
    print(json.dumps(out))
    if args.out:
        mode = "a" if os.path.exists(args.out) else "w"
        with open(args.out, mode) as f:
            f.write(json.dumps(out) + "\n")


def _notebook_gmm_logprob(x):
    """The notebook's OWN analytic density (demo_diffusion.ipynb cell 3),
    f64 numpy.  NOT utils.data.DEMO_GMM — that is this package's demo
    mixture with different components; evaluating reference-protocol
    models against it would measure error vs the wrong target.
    """
    x = np.asarray(x, np.float64)
    w = np.array([0.4, 0.6])
    mu = np.array([[-3.0, 3.0], [2.0, -2.0]])
    cov = np.array([[[1.0, 0.0], [0.0, 1.0]], [[2.0, 0.9], [0.9, 2.0]]])
    inv = np.linalg.inv(cov)
    logdet = np.linalg.slogdet(cov)[1]
    diff = x[:, None, :] - mu[None]
    maha = np.einsum("nki,kij,nkj->nk", diff, inv, diff)
    logps = np.log(w)[None] - 0.5 * (maha + logdet[None] + 2 * np.log(2 * np.pi))
    m = logps.max(axis=1, keepdims=True)
    return (m + np.log(np.exp(logps - m).sum(axis=1, keepdims=True)))[:, 0]


def _unflatten(flat):
    """'layers.0.w' -> nested pytree; all-digit dict levels become lists."""
    out = {}
    for k, v in flat.items():
        parts = k.split(".")
        cur = out
        for p in parts[:-1]:
            cur = cur.setdefault(p, {})
        cur[parts[-1]] = v

    def listify(node):
        if isinstance(node, dict):
            node = {k: listify(v) for k, v in node.items()}
            if node and all(k.isdigit() for k in node):
                return [node[str(i)] for i in range(len(node))]
        return node

    return listify(out)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)

    g = sub.add_parser("gen")
    g.add_argument("--seed", type=int, default=0)
    g.add_argument("--n", type=int, default=100_000)
    g.set_defaults(fn=cmd_gen)

    r = sub.add_parser("train-ref")
    r.add_argument("--seed", type=int, default=0)
    r.add_argument("--epochs", type=int, default=EPOCHS)
    r.set_defaults(fn=cmd_train_ref)

    j = sub.add_parser("train-jax")
    j.add_argument("--seed", type=int, default=0)
    j.add_argument("--epochs", type=int, default=EPOCHS)
    j.add_argument("--arm", default="bare-raw",
                   choices=["bare-raw", "bare-raw-torchinit", "tpu-schedule"])
    j.set_defaults(fn=cmd_train_jax)

    e = sub.add_parser("eval")
    e.add_argument("--weights", required=True)
    e.add_argument("--seed", type=int, default=0)
    e.add_argument("--rows", type=int, default=50_000)
    e.add_argument("--rtol", type=float, default=1e-6)
    e.add_argument("--out", default=os.path.join(OUT, "results.jsonl"))
    e.set_defaults(fn=cmd_eval)

    args = ap.parse_args()
    args.fn(args)


if __name__ == "__main__":
    main()
