"""Higher-order / likelihood transport solvers.

Covers sample_ode_heun, sample_ode_dopri5, sample_dpm_solver_pp and
sample_ode_likelihood (show-o2/transport/transport.py:380-503; the
reference's sample_dpm is dead code there — ours is a working
implementation checked against analytic flows).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np

from showo_tpu.show_o2.transport import (
    ode_timegrid, prior_logp, sample_dpm_solver_pp, sample_ode_dopri5,
    sample_ode_euler, sample_ode_heun, sample_ode_likelihood)


def _linear_drift(a=0.7):
    # dx/dt = a x  ->  x(1) = x(0) e^a  (exact)
    def drift(x, t):
        return a * x

    return drift


def test_heun_beats_euler_on_linear_flow():
    x0 = jnp.asarray(np.random.RandomState(0).randn(2, 8), jnp.float32)
    grid = jnp.linspace(0.0, 1.0, 11)
    exact = x0 * math.exp(0.7)
    err_e = float(jnp.abs(sample_ode_euler(_linear_drift(), x0, grid) - exact).max())
    err_h = float(jnp.abs(sample_ode_heun(_linear_drift(), x0, grid) - exact).max())
    assert err_h < err_e / 5
    assert err_h < 5e-3


def test_dopri5_linear_flow():
    x0 = jnp.asarray(np.random.RandomState(1).randn(2, 8), jnp.float32)
    out = sample_ode_dopri5(_linear_drift(), x0, rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(x0) * math.exp(0.7), rtol=1e-4)


def test_dpm_solver_exact_for_constant_data_prediction():
    """If the velocity field corresponds to a constant x1 prediction,
    DPM-Solver++ in data-prediction form is exact regardless of step count."""
    target = jnp.asarray(np.random.RandomState(2).randn(1, 4, 4), jnp.float32)

    def drift(x, t):
        tt = t.reshape(-1, 1, 1)
        return (target - x) / jnp.maximum(1.0 - tt, 1e-6)

    x0 = jnp.asarray(np.random.RandomState(3).randn(1, 4, 4), jnp.float32)
    grid = ode_timegrid(6)
    out = sample_dpm_solver_pp(drift, x0, grid)
    np.testing.assert_allclose(np.asarray(out), np.asarray(target),
                               atol=2e-3, rtol=0)


def test_dpm_solver_converges_on_gaussian_flow():
    """True marginal velocity of the linear path with x1 ~ N(m, s):
    closed-form posterior mean makes the ODE integrable; DPM-Solver
    with few steps should be close to many-step Euler."""
    m, s = 1.5, 0.5

    def drift(x, t):
        # E[x1 | x_t] for x_t = t x1 + (1-t) x0, x0~N(0,1), x1~N(m, s^2)
        tt = t.reshape(-1, 1)
        var = tt ** 2 * s ** 2 + (1 - tt) ** 2
        x1_hat = (tt * s ** 2 * x + (1 - tt) ** 2 * m) / jnp.maximum(var, 1e-8)
        x0_hat = (x - tt * x1_hat) / jnp.maximum(1 - tt, 1e-6)
        return x1_hat - x0_hat

    x0 = jnp.asarray(np.random.RandomState(4).randn(64, 1), jnp.float32)
    ref = sample_ode_euler(drift, x0, jnp.linspace(0.0, 1.0, 401))
    fast = sample_dpm_solver_pp(drift, x0, ode_timegrid(10))
    assert float(jnp.abs(fast - ref).mean()) < 0.05


def test_likelihood_linear_flow_analytic():
    """Generative flow dx/dt = x maps z ~ N(0, I) to x = e z, so
    log p(x) = -N/2 log 2pi - N - |x|^2 e^{-2} / 2."""
    rs = np.random.RandomState(5)
    x = jnp.asarray(rs.randn(4, 6) * math.e, jnp.float32)
    logp, z = sample_ode_likelihood(_linear_drift(1.0), x,
                                    jax.random.PRNGKey(0), num_steps=400)
    n = x.shape[1]
    expected = (-n / 2 * math.log(2 * math.pi) - n
                - np.sum(np.asarray(x) ** 2, axis=1) * math.exp(-2.0) / 2)
    np.testing.assert_allclose(np.asarray(logp), expected, rtol=0.02,
                               atol=0.05)
    np.testing.assert_allclose(np.asarray(z), np.asarray(x) * math.exp(-1.0),
                               rtol=0.02)


def test_prior_logp_matches_scipy_formula():
    z = jnp.asarray(np.random.RandomState(6).randn(3, 5), jnp.float32)
    got = np.asarray(prior_logp(z))
    expect = -5 / 2 * math.log(2 * math.pi) - 0.5 * np.sum(
        np.asarray(z) ** 2, axis=1)
    np.testing.assert_allclose(got, expect, rtol=1e-5)


def test_pipeline_sampler_switch_compiles():
    """heun / dpm-solver paths through the tiny Showo2 t2i velocity."""
    from tests.test_showo2_full_parity import TINY
    from showo_tpu.show_o2.showo2 import init_showo2_params, showo2_t2i_velocity
    from showo_tpu.show_o2.masks import omni_attn_mask

    cfg = TINY
    params = init_showo2_params(cfg, jax.random.PRNGKey(0))
    B, L = 2, 32
    n_img = cfg.num_image_tokens
    text = jnp.zeros((B, L), jnp.int32)
    mp = jnp.tile(jnp.asarray([[[4, n_img]]], jnp.int32), (B, 1, 1))
    bias = omni_attn_mask(mp, L)
    z = jax.random.normal(jax.random.PRNGKey(1),
                          (B, cfg.image_latent_dim, cfg.image_latent_height,
                           cfg.image_latent_width))

    def drift(x, t):
        return showo2_t2i_velocity(cfg, params, text, x, t, bias, mp,
                                   guidance_scale=0.0)

    grid = ode_timegrid(4)
    for fn in (sample_ode_heun, sample_dpm_solver_pp):
        out = fn(drift, z, grid)
        assert out.shape == z.shape
        assert bool(jnp.all(jnp.isfinite(out)))
