"""End-to-end statistical validation on the 2-D GMM (slow; gated).

The reference validates itself by training on a 2-component GMM and
comparing summed log-densities against the analytic mixture
(SURVEY.md §4).  This compressed version trains for a fraction of the
notebook budget and checks the relative density error is already in the
few-percent regime (the demos reproduce the full ≲0.1% run).

Enable with RUN_SLOW=1 (several minutes on CPU).
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.skipif(
    not os.environ.get("RUN_SLOW"), reason="slow statistical test; set RUN_SLOW=1"
)


def test_gmm_density_recovery():
    from flowfusion_tpu.models.population import PopulationModelDiffusion
    from flowfusion_tpu.ops.sde import VESDE
    from flowfusion_tpu.train import fit
    from flowfusion_tpu.utils.data import DEMO_GMM, standardization_stats

    key = jax.random.PRNGKey(0)
    k_data, k_net, k_fit = jax.random.split(key, 3)
    x = DEMO_GMM.sample(k_data, 40_000)
    shift, scale = standardization_stats(x)

    model = PopulationModelDiffusion.create(
        k_net, VESDE(), n_dimensions=2, units=(128, 128, 128),
        shift=shift, scale=scale,
    )
    # 40 epochs/stage without EMA trained to ~5-7% density error, which
    # is MACHINE-marginal: CPU float trajectories differ across hosts and
    # the same seeds landed either side of the bar on different sandbox
    # machines.  100 epochs + EMA reaches ~1.5% — a real margin.
    model, _ = fit(
        model, k_fit, x,
        stages=((128, 1e-3), (256, 3e-4), (256, 1e-4)),
        epochs_per_stage=100,
        ema_decay=0.999,
    )

    x_eval = DEMO_GMM.sample(jax.random.PRNGKey(5), 20_000)
    lp, stats = model.log_prob(x_eval, atol=1e-4, rtol=1e-4, volume_corrected=True)
    # eager multi-device calls autoshard: stats then carry one entry per
    # shard (models/score.py log_prob docstring) — all shards must succeed
    assert bool(np.asarray(stats.succeeded).all())
    truth = DEMO_GMM.log_prob(x_eval)
    rel = abs(float(jnp.sum(lp)) - float(jnp.sum(truth))) / abs(float(jnp.sum(truth)))
    assert rel < 0.05, f"relative density error {rel:.2%}"

    # samples in distribution: compare means/covs of ODE samples vs data
    base = jax.random.normal(jax.random.PRNGKey(6), (20_000, 2))
    samples, _ = model.forward(base)
    np.testing.assert_allclose(
        np.mean(np.asarray(samples), 0), np.mean(np.asarray(x), 0), atol=0.1
    )
    np.testing.assert_allclose(
        np.cov(np.asarray(samples).T), np.cov(np.asarray(x).T), atol=0.15
    )
