"""Flow-matching transport parity + integrator sanity tests."""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from showo_tpu.show_o2.transport import (
    GVPCPlan,
    ICPlan,
    Transport,
    VPCPlan,
    ode_timegrid,
    sample_ode_euler,
)

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "transport.npz")


@pytest.fixture(scope="module")
def golden():
    if not os.path.exists(GOLDEN):
        pytest.skip("golden fixtures missing; run tools/make_golden_transport.py")
    return np.load(GOLDEN)


@pytest.mark.parametrize("name,plan", [("ic", ICPlan()), ("gvp", GVPCPlan()),
                                       ("vp", VPCPlan())])
def test_plan_parity(golden, name, plan):
    t = jnp.asarray(golden["t"])
    x0 = jnp.asarray(golden["x0"])
    x1 = jnp.asarray(golden["x1"])
    _, xt, ut = plan.plan(t, x0, x1)
    np.testing.assert_allclose(np.asarray(xt), golden[f"{name}_xt"],
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(ut), golden[f"{name}_ut"],
                               atol=1e-5, rtol=1e-5)
    score = plan.get_score_from_velocity(ut, xt, t)
    np.testing.assert_allclose(np.asarray(score), golden[f"{name}_score"],
                               atol=1e-3, rtol=1e-3)


def test_timegrid_parity(golden):
    g = ode_timegrid(9, time_shifting_factor=3.0)
    np.testing.assert_allclose(np.asarray(g), golden["tgrid_warp3"],
                               atol=1e-6)
    g2 = ode_timegrid(9, do_shift=True, seq_len=729)
    np.testing.assert_allclose(np.asarray(g2), golden["tgrid_shift729"],
                               atol=1e-5)


def test_euler_integrates_linear_field():
    """dx/dt = c integrates exactly to x0 + c with Euler on any grid."""
    c = jnp.asarray([1.5, -0.5])[:, None]
    x = jnp.zeros((2, 3))
    grid = ode_timegrid(17, time_shifting_factor=3.0)
    out = sample_ode_euler(lambda x, t: jnp.broadcast_to(c, x.shape), x, grid)
    np.testing.assert_allclose(np.asarray(out),
                               np.broadcast_to(np.asarray(c), (2, 3)),
                               atol=1e-5)


def test_lognorm_shifted_sampling():
    tr = Transport(snr_type="lognorm", do_shift=True, seq_len=729)
    t = tr.sample_t(jax.random.PRNGKey(0), 1000)
    t = np.asarray(t)
    assert (t > 0).all() and (t < 1).all()
    # the shift pushes mass toward 0 (more noise) for seq_len > 256
    assert t.mean() < 0.5


def test_training_loss():
    tr = Transport()
    v = jnp.ones((2, 3, 4))
    ut = jnp.zeros((2, 3, 4))
    loss = tr.training_losses(v, ut)
    np.testing.assert_allclose(np.asarray(loss), [1.0, 1.0])
