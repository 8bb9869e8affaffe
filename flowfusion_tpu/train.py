"""Training: jitted train step, optimizer masking, staged schedules.

The reference has *no* training framework — optimizers, epoch loops,
(batch-size, lr) stages and splits live in its demo notebooks
(demo_diffusion.ipynb cell 6; SURVEY.md §2.5).  This module supplies the
TPU-native equivalent: a jitted, optionally mesh-sharded ``train_step`` and
a ``fit`` loop with the notebooks' staged schedule as the default
(zip([32, 64, 128, 256], [1e-3, 1e-4, 1e-5, 1e-6]), 250 epochs per stage).

Gradient flow: the *entire model pytree* is differentiated, but the
optimizer update is masked so that only true parameters train — the frozen
Fourier embedding ``W`` (reference ``requires_grad=False``,
diffusion.py:73-76) and the standardization statistics (reference buffers)
receive zero updates.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

__all__ = [
    "trainable_mask",
    "make_optimizer",
    "TrainState",
    "make_train_step",
    "fit",
    "FitCheckpoint",
    "StageResult",
]

# The staged (batch_size, learning_rate) schedule from the reference demos.
DEFAULT_STAGES: Tuple[Tuple[int, float], ...] = (
    (32, 1e-3),
    (64, 1e-4),
    (128, 1e-5),
    (256, 1e-6),
)


def trainable_mask(model: Any) -> Any:
    """Boolean pytree: True for leaves that should receive optimizer updates.

    A leaf is trainable iff its path passes through a field called
    ``params`` and is not the frozen Fourier weight ``W``.
    """

    def is_params_key(p) -> bool:
        return (
            isinstance(p, jax.tree_util.GetAttrKey) and p.name == "params"
        ) or (isinstance(p, jax.tree_util.DictKey) and p.key == "params")

    def is_trainable(path, leaf) -> bool:
        in_params = any(is_params_key(p) for p in path)
        # Only the top-level params["W"] entry is the frozen Fourier
        # embedding (models/nets.py stores layer weights under lowercase
        # 'w'); a custom net's nested weight that happens to be named 'W'
        # deeper in the tree must stay trainable.
        is_w = any(
            is_params_key(a)
            and isinstance(b, jax.tree_util.DictKey)
            and b.key == "W"
            for a, b in zip(path, path[1:])
        )
        return in_params and not is_w

    return jax.tree_util.tree_map_with_path(is_trainable, model)


def make_optimizer(
    learning_rate, model: Any, optimizer: str = "adam", **kwargs
) -> optax.GradientTransformation:
    """Adam (notebook default) masked to the trainable leaves."""
    base = getattr(optax, optimizer)(learning_rate, **kwargs)
    mask = trainable_mask(model)
    return optax.chain(
        optax.masked(base, mask),
        # Hard-zero non-trainable leaves (masked() leaves them untouched but
        # a downstream apply_updates would still add raw gradients).
        optax.masked(optax.set_to_zero(), jax.tree_util.tree_map(lambda b: not b, mask)),
    )


class TrainState(NamedTuple):
    model: Any
    opt_state: Any
    step: jax.Array


LossFn = Callable[[Any, jax.Array, jax.Array, Optional[jax.Array]], jax.Array]


def _default_loss(model, key, x, conditional):
    return model.loss_fn(key, x, conditional)


def _update_step(tx, loss_fn, state: TrainState, key, x, conditional):
    """One optimizer update — the single source of truth shared by
    ``make_train_step`` and ``fit``'s scanned epoch body."""

    def loss_of_model(model):
        return loss_fn(model, key, x, conditional)

    loss, grads = jax.value_and_grad(loss_of_model)(state.model)
    updates, opt_state = tx.update(grads, state.opt_state, state.model)
    model = optax.apply_updates(state.model, updates)
    return TrainState(model, opt_state, state.step + 1), loss


def make_train_step(
    tx: optax.GradientTransformation,
    loss_fn: LossFn = _default_loss,
    donate: bool = True,
):
    """Build a jitted (state, key, batch, cond) -> (state, loss) step."""

    def step(state: TrainState, key, x, conditional=None):
        return _update_step(tx, loss_fn, state, key, x, conditional)

    return jax.jit(step, donate_argnums=(0,) if donate else ())


@dataclasses.dataclass
class StageResult:
    batch_size: int
    learning_rate: float
    train_losses: np.ndarray  # (epochs,)
    val_losses: np.ndarray  # (epochs,) — nan if no val set


class FitCheckpoint:
    """Resumable mid-training snapshots for ``fit(checkpoint_dir=...)``.

    One atomic npz (utils/checkpoint.save_npz: tmp + os.replace) holding
    the FULL training state — model parameters, optimizer moments, the
    EMA shadow, the running PRNG key — plus JSON metadata (stage/epoch
    position, the (stages, epochs_per_stage) plan, loss curves so far).
    A preempted or budget-stopped run resumes EXACTLY: the restored run
    continues the identical key stream and optimizer state, so the final
    model is bit-comparable to an uninterrupted run
    (tests/test_train_checkpoint.py pins it).

    The reference has no training persistence at all (its notebook loops
    hold everything in process memory); this is the production
    counterpart for long schedules on preemptible TPU capacity.
    """

    FILE = "fit_state.npz"

    def __init__(self, directory: str, every: int = 25):
        import os

        self.every = int(every)
        self.path = os.path.join(directory, self.FILE)
        os.makedirs(directory, exist_ok=True)

    def resume_meta(self) -> Optional[dict]:
        """The snapshot's JSON metadata (stage/epoch/plan/curves), or
        None when no snapshot exists yet."""
        import os

        if not os.path.exists(self.path):
            return None
        from .utils.checkpoint import read_npz_extra

        return read_npz_extra(self.path)

    def save(self, state, meta: dict) -> None:
        """Atomically write the training-state pytree + metadata.

        Multi-host: only process 0 writes (training state is replicated;
        concurrent writers racing on a shared filesystem would corrupt
        nothing thanks to the tmp+replace dance, but process-local
        filesystems would diverge) — every process still READS the same
        snapshot on resume.
        """
        if jax.process_index() != 0:
            return
        from .utils.checkpoint import save_npz

        save_npz(self.path, state, extra=meta)

    def load(self, template):
        """Restore the state pytree into ``template``'s structure."""
        from .utils.checkpoint import load_npz

        return load_npz(self.path, template)


def _run_stages(
    key,
    stages,
    epochs_per_stage,
    n,
    log_every,
    val_loss_jit,
    begin_stage,
    run_epoch,
    val_model,
    tag: str = "",
    get_state=None,
    set_state=None,
    ckpt: Optional[FitCheckpoint] = None,
    max_epochs_total: Optional[int] = None,
):
    """Shared staged-training scaffolding for both engines — ``fit()``'s
    XLA scan and ``_fit_fused()`` differ only in their epoch body, so the
    batch-size clamp, per-epoch key splits, val-on-EMA evaluation,
    logging, checkpoint/resume, and StageResult assembly live here once.

    ``begin_stage(batch_size, lr)`` resets per-stage engine state (fresh
    optimizer — notebook parity) and ``run_epoch(epoch_key)`` runs one
    epoch returning its mean train loss; both mutate state they close
    over.  ``val_model()`` returns the model validation loss is evaluated
    on (the EMA shadow when enabled).

    ``get_state()``/``set_state(state)`` expose the engine's full
    training state (params, optimizer moments, EMA) as a pytree; with a
    ``ckpt`` they enable atomic mid-training snapshots and exact resume
    (the snapshot carries the running PRNG key, so the resumed run
    continues the identical stream).  ``max_epochs_total`` stops — with
    a final snapshot — after that many TOTAL epochs of progress
    (snapshot-position-inclusive): the time-budget knob for preemptible
    capacity.
    """
    plan = {
        "stages": [list(map(float, s)) for s in stages],
        "epochs_per_stage": int(epochs_per_stage),
    }
    start_stage = start_epoch = 0
    past = {"train": [], "val": []}  # flat curves from the resumed part
    if ckpt is not None:
        meta = ckpt.resume_meta()
        if meta is not None:
            if (
                meta["stages"] != plan["stages"]
                or meta["epochs_per_stage"] != plan["epochs_per_stage"]
            ):
                raise ValueError(
                    "fit: checkpoint was written for a different schedule "
                    f"({meta['stages']} x {meta['epochs_per_stage']}) than "
                    f"this call ({plan['stages']} x "
                    f"{plan['epochs_per_stage']}) — resume with the same "
                    "plan or point checkpoint_dir somewhere fresh"
                )
            start_stage, start_epoch = meta["stage"], meta["epoch"]
            past = {"train": meta["train_losses"], "val": meta["val_losses"]}
            print(
                f"fit: resuming from {ckpt.path} at stage {start_stage} "
                f"epoch {start_epoch}"
            )
    if ckpt is not None and jax.process_count() > 1:
        # Multi-host: snapshots are written by process 0 only, so
        # checkpoint_dir MUST be a filesystem shared by all hosts.  A
        # process-local directory would leave non-zero processes with no
        # (or a stale) snapshot: they would restart at stage 0 while
        # process 0 resumes mid-run, silently desynchronizing the
        # replicated program until it hangs at the next collective.
        # Catch that here: agree on the resume position across processes
        # before any training step runs.
        from jax.experimental import multihost_utils

        mine = np.asarray([start_stage, start_epoch], dtype=np.int32)
        # allgather, not broadcast: EVERY process must see the full set
        # of positions and raise on disagreement — a broadcast-and-
        # compare lets the majority rank(s) pass their own value
        # trivially and then hang at the first collective while only
        # the minority raises.
        all_pos = np.asarray(multihost_utils.process_allgather(mine))
        if not (all_pos == all_pos[0]).all():
            raise RuntimeError(
                "fit: resume position disagrees across hosts — per-process "
                f"stage/epoch positions are {all_pos.tolist()} (this is "
                f"process {jax.process_index()}, reading {ckpt.path}). "
                "checkpoint_dir must be on a filesystem shared by ALL "
                "hosts (snapshots are written by process 0 only); point "
                "every process at the same directory."
            )

    def snapshot(si, e_done, tl_flat, vl_flat):
        ckpt.save(
            {"engine": get_state(), "key": key},
            {
                **plan,
                "stage": si,
                "epoch": e_done,
                "train_losses": [float(v) for v in tl_flat],
                "val_losses": [float(v) for v in vl_flat],
            },
        )

    results = []
    flat_tl = list(past["train"])
    flat_vl = list(past["val"])
    total_done = start_stage * epochs_per_stage + start_epoch
    stopped = False
    for si, (batch_size, lr) in enumerate(stages):
        if si < start_stage:
            # completed before the resume point: rebuild its StageResult
            # from the snapshot's curves
            lo, hi = si * epochs_per_stage, (si + 1) * epochs_per_stage
            results.append(StageResult(
                min(batch_size, n), lr,  # same clamp as the live path
                np.asarray(past["train"][lo:hi]),
                np.asarray(past["val"][lo:hi]),
            ))
            continue
        if stopped:
            break
        if batch_size > n:
            # Mirror the notebooks' DataLoader semantics (a too-large batch
            # yields one partial batch of the whole set) instead of
            # crashing with steps_per_epoch == 0.
            print(
                f"fit: clamping stage batch_size {batch_size} to dataset "
                f"size {n}"
            )
            batch_size = n
        begin_stage(batch_size, lr)
        first_epoch = start_epoch if si == start_stage else 0
        if ckpt is not None and si == start_stage and (
            start_stage > 0 or start_epoch > 0
        ):
            # restore the engine state + key AFTER begin_stage so the
            # loaded optimizer moments land in this stage's fresh
            # optimizer structure
            state = ckpt.load({"engine": get_state(), "key": key})
            set_state(state["engine"])
            key = state["key"]
        lo = si * epochs_per_stage
        tl = list(past["train"][lo:lo + first_epoch])
        vl = list(past["val"][lo:lo + first_epoch])
        if (
            max_epochs_total is not None
            and total_done >= max_epochs_total
            and first_epoch < epochs_per_stage
        ):
            # The snapshot already meets the budget: don't train one more
            # epoch past it — re-snapshot the restored position and stop.
            if ckpt is not None:
                snapshot(si, first_epoch, flat_tl, flat_vl)
            print(
                f"fit: max_epochs_total={max_epochs_total} already met at "
                f"resume (stage {si} epoch {first_epoch}) — not training "
                "further; raise the budget to continue"
            )
            results.append(
                StageResult(batch_size, lr, np.asarray(tl), np.asarray(vl))
            )
            stopped = True
            break
        for e in range(first_epoch, epochs_per_stage):
            key, ke, kv = jax.random.split(key, 3)
            tl.append(float(run_epoch(ke)))
            if val_loss_jit:
                vl.append(float(val_loss_jit(val_model(), kv)))
            else:
                vl.append(np.nan)
            flat_tl.append(tl[-1])
            flat_vl.append(vl[-1])
            total_done += 1
            if log_every and (e + 1) % log_every == 0:
                val_part = f" val={vl[-1]:.4f}" if val_loss_jit else ""
                print(
                    f"[bs={batch_size} lr={lr:.0e}] epoch "
                    f"{e+1}/{epochs_per_stage} train={tl[-1]:.4f}"
                    f"{val_part}{tag}"
                )
            budget_hit = (
                max_epochs_total is not None
                and total_done >= max_epochs_total
                and not (si == len(stages) - 1 and e == epochs_per_stage - 1)
            )
            if ckpt is not None and (
                (e + 1) % ckpt.every == 0
                or e == epochs_per_stage - 1
                or budget_hit
            ):
                snapshot(si, e + 1, flat_tl, flat_vl)
            if budget_hit:
                print(
                    f"fit: max_epochs_total={max_epochs_total} reached — "
                    f"snapshot at stage {si} epoch {e+1}; re-run with the "
                    "same checkpoint_dir to continue"
                )
                stopped = True
                break
        results.append(
            StageResult(batch_size, lr, np.asarray(tl), np.asarray(vl))
        )
    return results


def _fused_family(model) -> Optional[str]:
    """Which fused-engine family a model belongs to, or None.

    'score': a bare ScoreModel (x already standardized by the caller).
    'population': PopulationModelDiffusion[Conditional] — the wrapper owns
    shift/scale; the kernel trains the inner score model on standardized
    tables.  'flow': ODEFlow/ConditionalODEFlow — raw-time velocity net,
    flow-matching tables, mean-over-dims loss.  'symplectic':
    SymplecticFlowModel — joint-(q, p) FM tables, the two half-stacks
    trained as separate kernel dispatches
    (kernels.fused_train.fused_train_epoch_symplectic).
    """
    if all(hasattr(model, a) for a in ("params", "net", "sde", "no_sigma")):
        return "score"
    if hasattr(model, "score_model") and all(
        hasattr(model, a) for a in ("shift", "scale")
    ):
        inner = model.score_model
        if all(hasattr(inner, a) for a in ("params", "net", "sde", "no_sigma")):
            return "population"
    if all(
        hasattr(model, a)
        for a in ("params", "net", "target_shift", "target_scale",
                  "flow_matching_loss")
    ):
        return "flow"
    # SymplecticFlowModel: owns shift/scale directly (unlike flow's
    # target_* naming) and has neither an SDE nor an inner score model
    if all(
        hasattr(model, a) for a in ("params", "net", "shift", "scale")
    ) and not hasattr(model, "sde"):
        return "symplectic"
    return None


def _fused_engine_ok(model, loss_fn, optimizer, stages, n_train) -> bool:
    """engine='auto' predicate: can this fit run on the fused epoch kernel?

    Requires the TPU backend (off-TPU the kernel runs in interpret mode,
    far slower than the scan), the default loss + Adam the kernel
    hard-codes, a fused-family model with a fused-compatible net, and
    every stage batch (clamped to the dataset size, matching both
    engines' behavior) inside the kernel's VMEM guard.
    """
    if jax.default_backend() != "tpu":
        return False
    if loss_fn is not _default_loss or optimizer != "adam":
        return False
    family = _fused_family(model)
    if family is None:
        return False
    from .kernels.fused_train import _cfg_fields, supports_batch
    from .kernels.fused_mlp import supports_config
    from .models.nets import (
        ScoreMLPConfig,
        SymplecticMLPConfig,
        VelocityMLPConfig,
    )

    cfg = model.score_model.net if family == "population" else model.net
    # Custom nets (anything with an .apply but not one of the config
    # families the kernels compile) train on the XLA engine.
    if not isinstance(
        cfg, (ScoreMLPConfig, VelocityMLPConfig, SymplecticMLPConfig)
    ):
        return False
    # The kernel stores float32 state only (its VMEM blocks are pinned
    # f32); a bf16-initialized model trains on the XLA engine instead of
    # crashing inside Mosaic.
    params = (
        model.score_model.params if family == "population" else model.params
    )
    if any(
        l.dtype != jnp.float32 for l in jax.tree_util.tree_leaves(params)
    ):
        return False
    units, _, _, _ = _cfg_fields(cfg)
    if not supports_config(units, cfg.activation):
        return False
    return all(supports_batch(cfg, min(bs, n_train)) for bs, _ in stages)


def fit(
    model: Any,
    key: jax.Array,
    x_train: jax.Array,
    conditional_train: Optional[jax.Array] = None,
    x_val: Optional[jax.Array] = None,
    conditional_val: Optional[jax.Array] = None,
    stages: Sequence[Tuple[int, float]] = DEFAULT_STAGES,
    epochs_per_stage: int = 250,
    loss_fn: LossFn = _default_loss,
    optimizer: str = "adam",
    log_every: Optional[int] = None,
    ema_decay: Optional[float] = None,
    engine: str = "auto",
    checkpoint_dir: Optional[str] = None,
    checkpoint_every: int = 25,
    max_epochs_total: Optional[int] = None,
) -> Tuple[Any, list]:
    """Staged training loop (notebook parity: fresh optimizer per stage).

    Each epoch is ONE jitted ``lax.scan`` over the shuffled minibatches —
    no per-step Python dispatch.  Returns (trained_model, [StageResult...]).

    ``ema_decay`` (e.g. 0.999) maintains an exponential moving average of
    the model and returns the EMA weights as the trained model — the
    standard variance-reduction trick for score models (a capability the
    reference's notebook loops lack).  Validation losses are evaluated on
    the EMA model when enabled.

    ``engine='fused'`` runs each epoch as ONE Pallas kernel dispatch
    (kernels/fused_train.py: parameters + Adam moments + EMA live in VMEM
    across all steps).  Same math to float rounding (optax-exact Adam,
    identical (t, z) sampling conventions — though a different PRNG
    layout, so individual draws differ from the XLA engine's at the same
    key).  Supported families (with the default loss, Adam, and a
    fused-kernel-compatible net — uniform 128-multiple hidden widths):
    bare score models (DSM tables), population-diffusion wrappers
    (standardization applied up front, inner score model trained
    in-kernel), and flow-matching CNFs (linear-interpolant tables,
    mean-over-dims loss).  Slope-timed on v5e (marginal per-step cost,
    relay dispatch
    overhead cancelled — BENCHMARKS.md "training") the fused epoch runs
    ~1.5-3.5x faster per step than the XLA scan (bs 256: ~2-11 us vs
    ~13-17 us across windows; bs 2048: ~21-41 us vs ~46-50 us, i.e.
    45-100M samples/s).

    ``engine='auto'`` (default) picks the fused kernel when it applies —
    TPU backend, default loss, Adam, fused family, compatible net, every
    stage batch within the kernel's VMEM guard — and the XLA scan
    otherwise.

    ``checkpoint_dir`` enables atomic mid-training snapshots every
    ``checkpoint_every`` epochs (and at stage ends) and EXACT resume: a
    later ``fit`` call with the same schedule and checkpoint_dir picks
    up the model, optimizer moments, EMA shadow, and PRNG stream where
    the snapshot left them, reproducing the uninterrupted run
    bit-comparably (both engines; see :class:`FitCheckpoint`).
    ``max_epochs_total`` stops after that many TOTAL epochs of progress
    with a final snapshot — the time-budget knob for preemptible
    capacity.
    """
    if engine not in ("auto", "xla", "fused"):
        raise ValueError(
            f"unknown engine {engine!r}; use 'auto', 'xla' or 'fused'"
        )
    if engine == "auto":
        engine = "fused" if _fused_engine_ok(
            model, loss_fn, optimizer, stages, x_train.shape[0]
        ) else "xla"
    ckpt = (
        FitCheckpoint(checkpoint_dir, checkpoint_every)
        if checkpoint_dir
        else None
    )
    if engine == "fused":
        return _fit_fused(
            model, key, x_train, conditional_train, x_val, conditional_val,
            stages, epochs_per_stage, loss_fn, optimizer, log_every,
            ema_decay, ckpt=ckpt, max_epochs_total=max_epochs_total,
        )
    n = x_train.shape[0]
    if n == 0:
        raise ValueError("fit: x_train is empty")
    # The epoch step donates its carry for buffer reuse; copy the caller's
    # model (and the EMA tree) so donation never deletes the caller's arrays.
    copy_tree = lambda t: jax.tree_util.tree_map(
        lambda a: jnp.array(a, copy=True), t
    )
    model = copy_tree(model)
    ema = copy_tree(model) if ema_decay else None

    val_loss_jit = (
        jax.jit(lambda m, k: loss_fn(m, k, x_val, conditional_val))
        if x_val is not None
        else None
    )

    has_cond = conditional_train is not None
    # engine state the stage callbacks mutate (model/EMA persist across
    # stages; the optimizer and jitted epoch are fresh per stage)
    st = {"model": model, "ema": ema, "state": None, "epoch_jit": None}

    def begin_stage(batch_size, lr):
        if st["state"] is not None:
            st["model"] = st["state"].model  # carry the trained model forward
        tx = make_optimizer(lr, st["model"], optimizer=optimizer)
        steps_per_epoch = n // batch_size

        def epoch_fn(state, ema_model, epoch_key, x_all, cond_all):
            kperm, kscan = jax.random.split(epoch_key)
            # NB the n % batch_size remainder of each epoch's fresh
            # permutation is dropped (lax.scan needs static shapes) — a
            # deliberate delta from the notebooks' drop_last=False
            # DataLoader; with reshuffling every epoch the exclusion is
            # a different random subset each time, so coverage in
            # expectation is unaffected.
            perm = jax.random.permutation(kperm, n)[: steps_per_epoch * batch_size]
            xb = x_all[perm].reshape(
                steps_per_epoch, batch_size, *x_all.shape[1:]
            )
            cb = (
                cond_all[perm].reshape(
                    steps_per_epoch, batch_size, *cond_all.shape[1:]
                )
                if has_cond
                else None
            )

            def body(carry, inp):
                state, ema_m = carry
                if has_cond:
                    k, bx, bcond = inp
                else:
                    (k, bx), bcond = inp, None

                state, loss = _update_step(tx, loss_fn, state, k, bx, bcond)
                if ema_decay:
                    ema_m = jax.tree_util.tree_map(
                        lambda e, p: ema_decay * e + (1.0 - ema_decay) * p,
                        ema_m,
                        state.model,
                    )
                return (state, ema_m), loss

            keys = jax.random.split(kscan, steps_per_epoch)
            xs = (keys, xb, cb) if has_cond else (keys, xb)
            (state, ema_model), losses = jax.lax.scan(body, (state, ema_model), xs)
            return state, ema_model, jnp.mean(losses)

        st["epoch_jit"] = jax.jit(epoch_fn, donate_argnums=(0, 1))
        # Fresh optimizer per stage (notebook parity), carried across epochs.
        st["state"] = TrainState(
            st["model"], tx.init(st["model"]), jnp.asarray(0, jnp.int32)
        )

    def run_epoch(ke):
        st["state"], st["ema"], loss = st["epoch_jit"](
            st["state"], st["ema"], ke, x_train, conditional_train
        )
        return loss

    def val_model():
        return st["ema"] if ema_decay else st["state"].model

    def get_state():
        s = st["state"]
        return {"model": s.model, "opt": s.opt_state, "step": s.step,
                "ema": st["ema"]}

    def set_state(state):
        st["state"] = TrainState(state["model"], state["opt"], state["step"])
        st["ema"] = state["ema"]

    results = _run_stages(
        key, stages, epochs_per_stage, n, log_every, val_loss_jit,
        begin_stage, run_epoch, val_model,
        get_state=get_state, set_state=set_state, ckpt=ckpt,
        max_epochs_total=max_epochs_total,
    )
    final = st["state"].model if st["state"] is not None else st["model"]
    return (st["ema"] if ema_decay else final), results


def _fit_fused(
    model,
    key,
    x_train,
    conditional_train,
    x_val,
    conditional_val,
    stages,
    epochs_per_stage,
    loss_fn,
    optimizer,
    log_every,
    ema_decay,
    ckpt=None,
    max_epochs_total=None,
):
    """``fit(engine='fused')`` body: staged loop over one-dispatch epochs.

    Mirrors the XLA path step for step — same per-epoch reshuffle with the
    remainder dropped, fresh Adam per stage, EMA of the post-update
    params — but each epoch is a single ``fused_train_epoch`` kernel call.
    Supports four model families (see _fused_family): bare score models,
    population-diffusion wrappers (standardization applied up front, the
    inner score model trained in-kernel), flow-matching CNFs (flow
    tables, mean-over-dims loss), and symplectic flow models (joint-(q,p)
    FM tables, the two half-stacks as separate kernel dispatches).
    """
    from .kernels.fused_train import (
        fused_train_epoch,
        fused_train_epoch_symplectic,
        train_tables,
        train_tables_flow,
        train_tables_symplectic,
    )

    if loss_fn is not _default_loss:
        raise ValueError(
            "engine='fused' supports the model's default loss only — "
            "pass engine='xla' for a custom loss_fn"
        )
    if optimizer != "adam":
        raise ValueError(
            f"engine='fused' implements adam in-kernel; got {optimizer!r}"
        )
    family = _fused_family(model)
    if family is None:
        raise ValueError(
            "engine='fused' needs a score model, a population-diffusion "
            "wrapper, a flow-matching CNF, or a symplectic flow model; "
            f"{type(model).__name__} matches none of those surfaces"
        )

    n = x_train.shape[0]
    if n == 0:
        raise ValueError("fit: x_train is empty")
    has_cond = conditional_train is not None

    # Family specifics: the net/params the kernel trains, the standardized
    # training tables (each family's loss_fn standardizes internally — the
    # kernel consumes pre-standardized tables instead), how to rebuild a
    # full model from new params, and the loss normalization.
    if family == "population":
        inner = model.score_model
        cfg = inner.net
        src_params = inner.params
        x_tab = (x_train - model.shift) / model.scale
        cond_tab = model._norm_cond(conditional_train) if has_cond else None
        tables_fn = lambda ktab, xb: train_tables(
            inner.sde, ktab, xb, no_sigma=inner.no_sigma
        )
        mean_over_dims = False
        rewrap = lambda p: dataclasses.replace(
            model, score_model=dataclasses.replace(inner, params=p)
        )
    elif family == "flow":
        cfg = model.net
        src_params = model.params
        x_tab = (x_train - model.target_shift) / model.target_scale
        cond_tab = model._norm_cond(conditional_train) if has_cond else None
        tables_fn = lambda ktab, xb: train_tables_flow(ktab, xb)
        mean_over_dims = True
        rewrap = lambda p: dataclasses.replace(model, params=p)
    elif family == "symplectic":
        cfg = model.net
        src_params = model.params
        x_tab = (x_train - model.shift) / model.scale
        cond_tab = model._norm_cond(conditional_train) if has_cond else None
        tables_fn = lambda ktab, xb: train_tables_symplectic(ktab, xb)
        mean_over_dims = False  # unused: the symplectic epoch owns 1/(bs*2D)
        rewrap = lambda p: dataclasses.replace(model, params=p)
    else:  # bare score model: x is the caller's responsibility, cond raw
        cfg = model.net
        src_params = model.params
        x_tab = x_train
        cond_tab = conditional_train
        tables_fn = lambda ktab, xb: train_tables(
            model.sde, ktab, xb, no_sigma=model.no_sigma
        )
        mean_over_dims = False
        rewrap = lambda p: dataclasses.replace(model, params=p)

    params = jax.tree_util.tree_map(lambda a: jnp.array(a, copy=True), src_params)
    ema_params = params if ema_decay else None

    val_loss_jit = (
        jax.jit(
            lambda m, k: loss_fn(m, k, x_val, conditional_val)
        )
        if x_val is not None
        else None
    )

    st = {"params": params, "ema": ema_params, "opt": None,
          "tables_jit": None, "lr": None}

    def begin_stage(batch_size, lr):
        steps_per_epoch = n // batch_size

        def epoch_tables(epoch_key, bs=batch_size, spe=steps_per_epoch):
            kperm, ktab = jax.random.split(epoch_key)
            perm = jax.random.permutation(kperm, n)[: spe * bs]
            xb = x_tab[perm].reshape(spe, bs, *x_tab.shape[1:])
            cb = (
                cond_tab[perm].reshape(spe, bs, *cond_tab.shape[1:])
                if has_cond
                else None
            )
            return tables_fn(ktab, xb) + (cb,)

        st["tables_jit"] = jax.jit(epoch_tables)
        st["opt"] = None  # fresh Adam per stage (notebook parity)
        st["lr"] = lr

    def run_epoch(ke):
        *tabs, cb = st["tables_jit"](ke)
        common = dict(
            conditional=cb,
            lr=st["lr"],
            ema=st["ema"],
            ema_decay=float(ema_decay or 0.0),
        )
        if family == "symplectic":
            xt_q, zw_q, xt_p, zw_p, t = tabs
            st["params"], st["opt"], st["ema"], losses = (
                fused_train_epoch_symplectic(
                    st["params"], cfg, st["opt"],
                    xt_q=xt_q, zw_q=zw_q, xt_p=xt_p, zw_p=zw_p, t=t,
                    **common,
                )
            )
        else:
            xt, zw, t, beta = tabs
            st["params"], st["opt"], st["ema"], losses = fused_train_epoch(
                st["params"], cfg, st["opt"],
                xt=xt, zw=zw, t=t, beta=beta,
                mean_over_dims=mean_over_dims,
                **common,
            )
        return jnp.mean(losses)

    def val_model():
        return rewrap(st["ema"] if ema_decay else st["params"])

    def _zero_opt_half(layers):
        # mirror of fused_train_epoch's fresh-state init (moments in the
        # kernel's transposed V4 orientation, python-int step counter) —
        # used as the structure TEMPLATE for checkpoint resume when the
        # stage has not run an epoch yet (st["opt"] is None)
        layers_t = tuple((l["w"], l["b"]) for l in layers)
        m = tuple(
            jnp.zeros(
                a.shape[::-1] if a.ndim == 2 else (a.shape[0], 1), a.dtype
            )
            for pair in layers_t
            for a in pair
        )
        return (m, m, 0)

    def get_state():
        opt = st["opt"]
        if opt is None:
            if family == "symplectic":
                opt = (
                    _zero_opt_half(st["params"]["q_layers"]),
                    _zero_opt_half(st["params"]["p_layers"]),
                )
            else:
                opt = _zero_opt_half(st["params"]["layers"])
        return {"params": st["params"], "opt": opt, "ema": st["ema"]}

    def set_state(state):
        st["params"] = state["params"]
        st["opt"] = state["opt"]
        st["ema"] = state["ema"]

    results = _run_stages(
        key, stages, epochs_per_stage, n, log_every, val_loss_jit,
        begin_stage, run_epoch, val_model, tag=" (fused)",
        get_state=get_state, set_state=set_state, ckpt=ckpt,
        max_epochs_total=max_epochs_total,
    )
    final = st["ema"] if ema_decay else st["params"]
    return rewrap(final), results
