"""CLI round-trip test: train -> sample -> logprob on a tiny dataset."""

import json

import numpy as np
import jax
import pytest

from flowfusion_tpu.cli import main
from flowfusion_tpu.utils.data import DEMO_GMM
from flowfusion_tpu.utils.native_loader import write_f32


@pytest.mark.slow
def test_cli_train_sample_logprob_roundtrip(tmp_path):
    x = np.asarray(DEMO_GMM.sample(jax.random.PRNGKey(0), 2000), np.float32)
    data = str(tmp_path / "x.f32")
    write_f32(data, x)
    ckpt = str(tmp_path / "model.npz")

    main([
        "train", "--data", data, "--dim", "2", "--units", "32",
        "--stages", "64:1e-3", "--epochs", "3", "--out", ckpt,
    ])
    from flowfusion_tpu.utils.checkpoint import read_npz_extra

    meta = read_npz_extra(ckpt)  # embedded in the archive, no sidecar
    assert meta["dim"] == 2 and np.isfinite(meta["final_train_loss"])

    samples_out = str(tmp_path / "s.npy")
    main(["sample", "--ckpt", ckpt, "--n", "256", "--steps", "10", "--out", samples_out])
    s = np.load(samples_out)
    assert s.shape == (256, 2) and np.all(np.isfinite(s))

    lp_out = str(tmp_path / "lp.npy")
    main([
        "logprob", "--ckpt", ckpt, "--data", data, "--tol", "1e-3",
        "--out", lp_out,
    ])
    lp = np.load(lp_out)
    assert lp.shape == (2000,) and np.all(np.isfinite(lp))


def test_bench_json_contract():
    """bench.py must print exactly one JSON line with the driver's keys."""
    import ast
    import pathlib

    src = pathlib.Path(__file__).parent.parent / "bench.py"
    tree = ast.parse(src.read_text())
    # static sanity: module defines main() and references the required keys
    text = src.read_text()
    for key in ('"metric"', '"value"', '"unit"', '"vs_baseline"'):
        assert key in text


@pytest.mark.slow
def test_cli_conditional_sample_requires_and_uses_cond_data(tmp_path):
    """'sample' on a conditional checkpoint must demand --cond-data and
    then draw one sample per conditioning row (regression: it silently
    called the model with conditional=None)."""
    rng = np.random.default_rng(0)
    x = rng.normal(size=(600, 2)).astype(np.float32)
    c = rng.normal(size=(600, 1)).astype(np.float32)
    data = str(tmp_path / "xc.f32")
    write_f32(data, np.concatenate([x, c], axis=1))
    ckpt = str(tmp_path / "cond.npz")

    main([
        "train", "--data", data, "--dim", "2", "--cond-dim", "1",
        "--units", "32", "--stages", "64:1e-3", "--epochs", "2",
        "--out", ckpt,
    ])

    out = str(tmp_path / "s.npy")
    with pytest.raises(SystemExit, match="cond-data"):
        main(["sample", "--ckpt", ckpt, "--n", "16", "--steps", "5",
              "--out", out])

    cond_path = str(tmp_path / "cond_rows.npy")
    np.save(cond_path, c[:32])
    main(["sample", "--ckpt", ckpt, "--steps", "5",
          "--cond-data", cond_path, "--out", out])
    s = np.load(out)
    assert s.shape == (32, 2) and np.all(np.isfinite(s))


@pytest.mark.slow
def test_cli_export_roundtrip(tmp_path):
    """'export' compiles a checkpoint into a serving artifact that a
    model-free consumer can call (symbolic batch)."""
    x = np.asarray(DEMO_GMM.sample(jax.random.PRNGKey(1), 1000), np.float32)
    data = str(tmp_path / "x.f32")
    write_f32(data, x)
    ckpt = str(tmp_path / "model.npz")
    main([
        "train", "--data", data, "--dim", "2", "--units", "32",
        "--trace", "hutchinson", "--stages", "64:1e-3", "--epochs", "2",
        "--out", ckpt,
    ])

    art = str(tmp_path / "lp.stablehlo")
    main(["export", "--ckpt", ckpt, "--tol", "1e-3", "--out", art])

    from flowfusion_tpu.utils import serving

    f = serving.deserialize_log_prob(serving.load_artifact(art))
    for batch in (8, 64):
        lp = f(x[:batch], seed=3)
        assert lp.shape == (batch,) and np.all(np.isfinite(np.asarray(lp)))

    art_s = str(tmp_path / "sampler.stablehlo")
    main(["export", "--ckpt", ckpt, "--what", "sampler", "--out", art_s])
    g = serving.deserialize_sampler(serving.load_artifact(art_s))
    s = g(np.random.default_rng(0).standard_normal((32, 2)).astype(np.float32))
    assert s.shape == (32, 2) and np.all(np.isfinite(np.asarray(s)))


@pytest.mark.slow
@pytest.mark.parametrize("family,method", [("flow", "ode"), ("symplectic", "euler")])
def test_cli_family_roundtrip(tmp_path, family, method):
    """train -> sample -> logprob for the flow and symplectic families."""
    x = np.asarray(DEMO_GMM.sample(jax.random.PRNGKey(0), 1000), np.float32)
    data = str(tmp_path / "x.f32")
    write_f32(data, x)
    ckpt = str(tmp_path / f"{family}.npz")

    main([
        "train", "--data", data, "--family", family, "--dim", "2",
        "--units", "32", "--stages", "64:1e-3", "--epochs", "2",
        "--out", ckpt,
    ])
    from flowfusion_tpu.utils.checkpoint import read_npz_extra

    meta = read_npz_extra(ckpt)
    assert meta["family"] == family

    samples_out = str(tmp_path / "s.npy")
    main([
        "sample", "--ckpt", ckpt, "--n", "128", "--method", method,
        "--out", samples_out,
    ])
    s = np.load(samples_out)
    assert s.shape == (128, 2) and np.all(np.isfinite(s))

    lp_out = str(tmp_path / "lp.npy")
    main([
        "logprob", "--ckpt", ckpt, "--data", data, "--tol", "1e-3",
        "--out", lp_out,
    ])
    lp = np.load(lp_out)
    assert lp.shape == (1000,) and np.all(np.isfinite(lp))


def test_cli_family_flag_validation(tmp_path):
    """Wrong family/flag combinations die loudly, not silently."""
    x = np.asarray(DEMO_GMM.sample(jax.random.PRNGKey(0), 256), np.float32)
    data = str(tmp_path / "x.f32")
    write_f32(data, x)

    with pytest.raises(SystemExit, match="family diffusion only"):
        main([
            "train", "--data", data, "--family", "flow", "--dim", "2",
            "--sde", "vpsde", "--units", "32", "--stages", "64:1e-3",
            "--epochs", "1", "--out", str(tmp_path / "x.npz"),
        ])
    with pytest.raises(SystemExit, match="trace-free"):
        main([
            "train", "--data", data, "--family", "symplectic", "--dim", "2",
            "--trace", "hutchinson", "--units", "32",
            "--stages", "64:1e-3", "--epochs", "1",
            "--out", str(tmp_path / "x.npz"),
        ])

    # a trained flow checkpoint rejects sde sampling and volume correction
    ckpt = str(tmp_path / "flow.npz")
    main([
        "train", "--data", data, "--family", "flow", "--dim", "2",
        "--units", "32", "--stages", "64:1e-3", "--epochs", "1",
        "--out", ckpt,
    ])
    with pytest.raises(SystemExit, match="probability-flow ODE only"):
        main(["sample", "--ckpt", ckpt, "--n", "8", "--out", str(tmp_path / "s.npy")])
    with pytest.raises(SystemExit, match="volume-corrected"):
        main([
            "logprob", "--ckpt", ckpt, "--data", data, "--volume-corrected",
            "--out", str(tmp_path / "lp.npy"),
        ])


@pytest.mark.slow
def test_cli_export_guard_speaks_cli_flags(tmp_path, monkeypatch):
    """On TPU, a default exact-trace checkpoint exported symbolic-batch is
    refused by the serving guard — the CLI must translate that into
    actionable flag advice (--batch / --trace), and the --trace override
    must actually unblock the export."""
    x = np.asarray(DEMO_GMM.sample(jax.random.PRNGKey(1), 500), np.float32)
    data = str(tmp_path / "x.f32")
    write_f32(data, x)
    ckpt = str(tmp_path / "model.npz")
    main([
        "train", "--data", data, "--dim", "2", "--units", "32",
        "--stages", "64:1e-3", "--epochs", "2", "--out", ckpt,
    ])  # default --trace exact

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    with pytest.raises(SystemExit) as ei:
        main(["export", "--ckpt", ckpt, "--tol", "1e-3",
              "--out", str(tmp_path / "lp.stablehlo")])
    assert "--batch" in str(ei.value) and "--trace" in str(ei.value)

    # the advertised escape hatch works (back on the real CPU backend so
    # the lowering actually runs)
    monkeypatch.undo()
    art = str(tmp_path / "lp.stablehlo")
    main(["export", "--ckpt", ckpt, "--trace", "hutchinson",
          "--tol", "1e-3", "--out", art])
    from flowfusion_tpu.utils import serving

    f = serving.deserialize_log_prob(serving.load_artifact(art))
    assert np.all(np.isfinite(np.asarray(f(x[:8], seed=1))))


@pytest.mark.slow
def test_cli_export_buckets_roundtrip(tmp_path):
    """`export --buckets` writes a bucketed bundle that serves any batch
    size (the TPU variable-batch likelihood story, round-4)."""
    from flowfusion_tpu.utils import serving

    x = np.asarray(DEMO_GMM.sample(jax.random.PRNGKey(2), 500), np.float32)
    data = str(tmp_path / "x.f32")
    write_f32(data, x)
    ckpt = str(tmp_path / "model.npz")
    main([
        "train", "--data", data, "--dim", "2", "--units", "32",
        "--trace", "hutchinson", "--stages", "64:1e-3", "--epochs", "1",
        "--out", ckpt,
    ])
    bundle = str(tmp_path / "lp_buckets.bin")
    main([
        "export", "--ckpt", ckpt, "--buckets", "8,32", "--tol", "1e-3",
        "--out", bundle,
    ])
    f = serving.deserialize_log_prob_bucketed(serving.load_artifact(bundle))
    assert f.buckets == (8, 32)
    lp = f(x[:37], seed=3)
    assert lp.shape == (37,) and np.all(np.isfinite(np.asarray(lp)))

    with pytest.raises(SystemExit, match="mutually exclusive"):
        main([
            "export", "--ckpt", ckpt, "--buckets", "8", "--batch", "8",
            "--out", bundle,
        ])
    with pytest.raises(SystemExit, match="logprob"):
        main([
            "export", "--ckpt", ckpt, "--what", "sampler", "--buckets", "8",
            "--tol", "1e-5", "--out", bundle,
        ])


def test_cli_export_buckets_validation(tmp_path):
    x = np.asarray(DEMO_GMM.sample(jax.random.PRNGKey(3), 256), np.float32)
    data = str(tmp_path / "x.f32")
    write_f32(data, x)
    ckpt = str(tmp_path / "model.npz")
    main([
        "train", "--data", data, "--dim", "2", "--units", "32",
        "--trace", "hutchinson", "--stages", "64:1e-3", "--epochs", "1",
        "--out", ckpt,
    ])
    for bad in ("8,abc", "0,8", ","):
        with pytest.raises(SystemExit, match="buckets"):
            main([
                "export", "--ckpt", ckpt, "--buckets", bad,
                "--out", str(tmp_path / "b.bin"),
            ])


def test_cli_train_checkpoint_resume(tmp_path):
    """train --checkpoint-dir + --max-epochs: a budget-stopped run plus a
    resumed run produce the same checkpoint as one uninterrupted run."""
    x = np.asarray(DEMO_GMM.sample(jax.random.PRNGKey(4), 512), np.float32)
    data = str(tmp_path / "x.f32")
    write_f32(data, x)
    base = [
        "train", "--data", data, "--dim", "2", "--units", "32",
        "--trace", "hutchinson", "--stages", "64:1e-3", "--epochs", "4",
    ]
    full = str(tmp_path / "full.npz")
    main(base + ["--out", full])

    cdir = str(tmp_path / "ck")
    part = str(tmp_path / "part.npz")
    main(base + ["--out", part, "--checkpoint-dir", cdir,
                 "--checkpoint-every", "1", "--max-epochs", "2"])
    resumed = str(tmp_path / "resumed.npz")
    main(base + ["--out", resumed, "--checkpoint-dir", cdir,
                 "--checkpoint-every", "1"])

    a, b = np.load(full), np.load(resumed)
    for k in a.files:
        if k.startswith("leaf_"):
            np.testing.assert_array_equal(a[k], b[k])

    with pytest.raises(SystemExit, match="checkpoint-dir"):
        main(base + ["--out", part, "--max-epochs", "2"])
