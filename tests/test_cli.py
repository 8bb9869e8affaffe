"""CLI round-trip test: train -> sample -> logprob on a tiny dataset."""

import json

import numpy as np
import jax
import pytest

from flowfusion_tpu.cli import main
from flowfusion_tpu.utils.data import DEMO_GMM
from flowfusion_tpu.utils.native_loader import write_f32


def test_cli_train_sample_logprob_roundtrip(tmp_path):
    x = np.asarray(DEMO_GMM.sample(jax.random.PRNGKey(0), 2000), np.float32)
    data = str(tmp_path / "x.f32")
    write_f32(data, x)
    ckpt = str(tmp_path / "model.npz")

    main([
        "train", "--data", data, "--dim", "2", "--units", "32",
        "--stages", "64:1e-3", "--epochs", "3", "--out", ckpt,
    ])
    meta = json.load(open(ckpt + ".meta.json"))
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
