"""Sampler tests: discretization goldens, analytic ODE limit, fp64 oracle."""

import jax
import jax.numpy as jnp
import numpy as np

from maskdit_tpu.sampling import edm
from maskdit_tpu.utils.rng import StackedRandomGenerator

SIGMA_DATA = 0.5


def linear_denoiser(x, sigma):
    """Optimal denoiser for x0 ~ N(0, sigma_data^2 I):
    D(x, sigma) = x * sigma_d^2 / (sigma^2 + sigma_d^2)."""
    return x * SIGMA_DATA ** 2 / (sigma ** 2 + SIGMA_DATA ** 2)


def test_sigma_steps_endpoints():
    steps = edm.edm_sigma_steps(40, 0.002, 80.0, 7.0)
    assert steps.shape == (41,)
    np.testing.assert_allclose(steps[0], 80.0, rtol=1e-12)
    np.testing.assert_allclose(steps[39], 0.002, rtol=1e-9)
    assert steps[40] == 0.0
    assert np.all(np.diff(steps) < 0)  # strictly decreasing


def test_edm_sampler_analytic_limit():
    """With the linear denoiser the probability-flow ODE has the closed form
    x(0) = x(s0) * sigma_d / sqrt(s0^2 + sigma_d^2); Heun at 64 steps must
    land on it."""
    latents = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 4, 4))
    out = edm.edm_sampler(linear_denoiser, latents, num_steps=64)
    s0 = 80.0
    expected = np.asarray(latents) * s0 * SIGMA_DATA / np.sqrt(s0 ** 2 + SIGMA_DATA ** 2)
    # ~0.4% discrepancy is Heun discretization error at 64 rho-spaced steps
    # (the fp64-oracle test pins the algorithm itself)
    np.testing.assert_allclose(np.asarray(out), expected, rtol=8e-3, atol=5e-4)


def _edm_oracle_fp64(denoise, latents, num_steps):
    """Direct numpy fp64 transcription of EDM Algorithm 2 (Heun, no churn)."""
    t = edm.edm_sigma_steps(num_steps)
    x = latents.astype(np.float64) * t[0]
    for i in range(num_steps):
        t_cur, t_next = t[i], t[i + 1]
        d_cur = (x - denoise(x, t_cur)) / t_cur
        x_next = x + (t_next - t_cur) * d_cur
        if i < num_steps - 1:
            d_prime = (x_next - denoise(x_next, t_next)) / t_next
            x_next = x + (t_next - t_cur) * 0.5 * (d_cur + d_prime)
        x = x_next
    return x


def test_edm_sampler_matches_fp64_oracle():
    """fp32 scan trajectory stays within ~1e-5 of the fp64 loop."""
    latents = np.asarray(
        jax.random.normal(jax.random.PRNGKey(1), (2, 3, 4, 4))
    )

    def np_denoiser(x, sigma):
        return x * SIGMA_DATA ** 2 / (sigma ** 2 + SIGMA_DATA ** 2)

    ours = np.asarray(
        edm.edm_sampler(linear_denoiser, jnp.asarray(latents), num_steps=40)
    )
    oracle = _edm_oracle_fp64(np_denoiser, latents, 40)
    np.testing.assert_allclose(ours, oracle, rtol=1e-4, atol=1e-5)


def test_ablation_sampler_edm_config_matches_edm_sampler():
    """heun/edm/linear/none is exactly the EDM sampler (reference parity)."""
    latents = jax.random.normal(jax.random.PRNGKey(2), (2, 3, 4, 4))
    a = edm.edm_sampler(linear_denoiser, latents, num_steps=18)
    b = edm.ablation_sampler(
        linear_denoiser, latents, num_steps=18,
        solver="heun", discretization="edm", schedule="linear", scaling="none",
    )
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5)


def test_ablation_sampler_other_configs_run():
    latents = jax.random.normal(jax.random.PRNGKey(3), (1, 2, 4, 4))
    for disc, sched, scal in [
        ("vp", "vp", "vp"),
        ("ve", "ve", "none"),
        ("iddpm", "linear", "none"),
    ]:
        out = edm.ablation_sampler(
            linear_denoiser, latents, num_steps=8, solver="euler",
            discretization=disc, schedule=sched, scaling=scal,
        )
        assert out.shape == latents.shape
        assert np.isfinite(np.asarray(out)).all()


def test_net_sigma_surface():
    """net_sigma_min/max clamp the requested range to the net's, and
    round_sigma snaps levels to its grid (reference sample.py:36-37,
    43,104-106,157). Identity values must be exact no-ops."""
    latents = jax.random.normal(jax.random.PRNGKey(4), (1, 2, 4, 4))

    # clamp: requesting [0.002, 80] on a net supporting [0.01, 40] equals
    # requesting [0.01, 40] directly
    clamped = edm.edm_sampler(
        linear_denoiser, latents, num_steps=8,
        net_sigma_min=0.01, net_sigma_max=40.0,
    )
    direct = edm.edm_sampler(
        linear_denoiser, latents, num_steps=8, sigma_min=0.01, sigma_max=40.0,
    )
    np.testing.assert_array_equal(np.asarray(clamped), np.asarray(direct))

    # identity round_sigma (EDMPrecond's) is a no-op
    base = edm.edm_sampler(linear_denoiser, latents, num_steps=8)
    ident = edm.edm_sampler(
        linear_denoiser, latents, num_steps=8, round_sigma=lambda s: s,
    )
    np.testing.assert_array_equal(np.asarray(base), np.asarray(ident))

    # a real snap changes the levels: round to 2 decimals ~= rounding the
    # discretization before sigma_inv in the ablation sampler
    seen = {}
    snap = lambda s: seen.setdefault("levels", np.round(s, 2))
    out = edm.ablation_sampler(
        linear_denoiser, latents, num_steps=8, solver="euler",
        net_sigma_min=0.01, net_sigma_max=40.0, round_sigma=snap,
    )
    assert np.isfinite(np.asarray(out)).all()
    assert seen["levels"].max() <= 40.0 + 1e-9
    assert seen["levels"].min() >= 0.01 - 5e-3  # rounded grid


def test_churn_requires_rng():
    latents = jnp.zeros((1, 2, 4, 4))
    try:
        edm.edm_sampler(linear_denoiser, latents, num_steps=4, S_churn=1.0)
        assert False, "expected ValueError"
    except ValueError:
        pass
    out = edm.edm_sampler(
        linear_denoiser, latents, num_steps=4, S_churn=1.0,
        rng=jax.random.PRNGKey(0),
    )
    assert np.isfinite(np.asarray(out)).all()


def test_stacked_random_generator_batch_invariance():
    """Sample streams depend only on the seed, not on batch grouping —
    the property the reference built StackedRandomGenerator for."""
    g_all = StackedRandomGenerator([5, 6, 7, 8])
    x_all = np.asarray(g_all.randn([4, 2, 3]))

    g_a = StackedRandomGenerator([5, 6])
    g_b = StackedRandomGenerator([7, 8])
    x_a = np.asarray(g_a.randn([2, 2, 3]))
    x_b = np.asarray(g_b.randn([2, 2, 3]))

    np.testing.assert_array_equal(x_all, np.concatenate([x_a, x_b]))

    # successive draws differ
    x_next = np.asarray(g_all.randn([4, 2, 3]))
    assert np.abs(x_all - x_next).max() > 1e-3

    labels = np.asarray(g_all.randint(1000, size=[4]))
    assert labels.shape == (4,) and (labels >= 0).all() and (labels < 1000).all()
