"""Flow-matching transport: coupling-plan algebra + compiled integrators.

Parity with show-o2/transport/ (path.py, transport.py, integrators.py):
  * paths: Linear (ICPlan), GVP, VP — alpha/sigma/drift algebra;
  * t sampling: uniform / lognorm, with the resolution-aware time shift
    ``mu = lin(seq_len); t <- 1 - e^mu/(e^mu + (1/(1-t) - 1))``
    (transport.py:125-146);
  * training loss = MSE(v_pred, ut) (transport.py:148-198);
  * ODE sampling: fixed-step Euler as ``lax.scan`` (the shipped configs
    use euler, showo2_1.5b_demo_432x432.yaml:59); optional per-sampler
    ``time_shifting_factor`` warp ``t/(t + f - f t)`` (integrators.py:100-101);
  * SDE: Euler-Maruyama and Heun steps (integrators.py:27-49).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp


def _expand(t, x):
    return t.reshape(t.shape[0], *([1] * (x.ndim - 1)))


# ---------------------------------------------------------------------------
# Coupling plans (show-o2/transport/path.py)
# ---------------------------------------------------------------------------


class ICPlan:
    """Linear coupling: alpha=t, sigma=1-t."""

    def compute_alpha_t(self, t):
        return t, jnp.ones_like(t)

    def compute_sigma_t(self, t):
        return 1 - t, -jnp.ones_like(t)

    def compute_d_alpha_alpha_ratio_t(self, t):
        return 1 / t

    def compute_drift(self, x, t):
        t = _expand(t, x)
        alpha_ratio = self.compute_d_alpha_alpha_ratio_t(t)
        sigma_t, d_sigma_t = self.compute_sigma_t(t)
        drift = alpha_ratio * x
        diffusion = alpha_ratio * (sigma_t ** 2) - sigma_t * d_sigma_t
        return -drift, diffusion

    def compute_diffusion(self, x, t, form="constant", norm=1.0):
        t = _expand(t, x)
        if form == "constant":
            return jnp.full_like(t, norm)
        if form == "SBDM":
            return norm * self.compute_drift(x, t)[1]
        if form == "sigma":
            return norm * self.compute_sigma_t(t)[0]
        if form == "linear":
            return norm * (1 - t)
        if form == "decreasing":
            return 0.25 * (norm * jnp.cos(jnp.pi * t) + 1) ** 2
        if form == "increasing-decreasing":
            return norm * jnp.sin(jnp.pi * t) ** 2
        raise NotImplementedError(form)

    def get_score_from_velocity(self, velocity, x, t):
        t = _expand(t, x)
        alpha_t, d_alpha_t = self.compute_alpha_t(t)
        sigma_t, d_sigma_t = self.compute_sigma_t(t)
        reverse_alpha_ratio = alpha_t / d_alpha_t
        var = sigma_t ** 2 - reverse_alpha_ratio * d_sigma_t * sigma_t
        return (reverse_alpha_ratio * velocity - x) / var

    def get_noise_from_velocity(self, velocity, x, t):
        t = _expand(t, x)
        alpha_t, d_alpha_t = self.compute_alpha_t(t)
        sigma_t, d_sigma_t = self.compute_sigma_t(t)
        reverse_alpha_ratio = alpha_t / d_alpha_t
        var = reverse_alpha_ratio * d_sigma_t - sigma_t
        return (reverse_alpha_ratio * velocity - x) / var

    def compute_mu_t(self, t, x0, x1):
        t = _expand(t, x1)
        alpha_t, _ = self.compute_alpha_t(t)
        sigma_t, _ = self.compute_sigma_t(t)
        return alpha_t * x1 + sigma_t * x0

    def compute_xt(self, t, x0, x1):
        return self.compute_mu_t(t, x0, x1)

    def compute_ut(self, t, x0, x1, xt):
        t = _expand(t, x1)
        _, d_alpha_t = self.compute_alpha_t(t)
        _, d_sigma_t = self.compute_sigma_t(t)
        return d_alpha_t * x1 + d_sigma_t * x0

    def plan(self, t, x0, x1):
        xt = self.compute_xt(t, x0, x1)
        ut = self.compute_ut(t, x0, x1, xt)
        return t, xt, ut


class VPCPlan(ICPlan):
    def __init__(self, sigma_min=0.1, sigma_max=20.0):
        self.sigma_min = sigma_min
        self.sigma_max = sigma_max

    def _log_mean_coeff(self, t):
        return (-0.25 * ((1 - t) ** 2) * (self.sigma_max - self.sigma_min)
                - 0.5 * (1 - t) * self.sigma_min)

    def _d_log_mean_coeff(self, t):
        return 0.5 * (1 - t) * (self.sigma_max - self.sigma_min) + 0.5 * self.sigma_min

    def compute_alpha_t(self, t):
        alpha_t = jnp.exp(self._log_mean_coeff(t))
        return alpha_t, alpha_t * self._d_log_mean_coeff(t)

    def compute_sigma_t(self, t):
        p = 2 * self._log_mean_coeff(t)
        sigma_t = jnp.sqrt(1 - jnp.exp(p))
        d_sigma_t = jnp.exp(p) * (2 * self._d_log_mean_coeff(t)) / (-2 * sigma_t)
        return sigma_t, d_sigma_t

    def compute_d_alpha_alpha_ratio_t(self, t):
        return self._d_log_mean_coeff(t)

    def compute_drift(self, x, t):
        t = _expand(t, x)
        beta_t = self.sigma_min + (1 - t) * (self.sigma_max - self.sigma_min)
        return -0.5 * beta_t * x, beta_t / 2


class GVPCPlan(ICPlan):
    def compute_alpha_t(self, t):
        return jnp.sin(t * jnp.pi / 2), jnp.pi / 2 * jnp.cos(t * jnp.pi / 2)

    def compute_sigma_t(self, t):
        return jnp.cos(t * jnp.pi / 2), -jnp.pi / 2 * jnp.sin(t * jnp.pi / 2)

    def compute_d_alpha_alpha_ratio_t(self, t):
        return jnp.pi / (2 * jnp.tan(t * jnp.pi / 2))


# ---------------------------------------------------------------------------
# Transport (show-o2/transport/transport.py)
# ---------------------------------------------------------------------------


def get_lin_function(x1=256.0, y1=0.5, x2=4096.0, y2=1.15):
    m = (y2 - y1) / (x2 - x1)
    b = y1 - m * x1
    return lambda x: m * x + b


def time_shift(mu: float, sigma: float, t):
    """transport.py:133-139 (t=1 is clean data in the show-o2 convention)."""
    t = 1 - t
    t = math.exp(mu) / (math.exp(mu) + (1 / t - 1) ** sigma)
    return 1 - t


_PATHS = {"Linear": ICPlan, "GVP": GVPCPlan, "VP": VPCPlan}


@dataclasses.dataclass
class Transport:
    path_type: str = "Linear"
    prediction: str = "velocity"
    snr_type: str = "uniform"
    do_shift: bool = True
    seq_len: int = 1024
    train_eps: float = 0.0
    sample_eps: float = 0.0

    def __post_init__(self):
        self.path_sampler = _PATHS[self.path_type]()

    def sample_t(self, key, batch: int, max_t0: Optional[float] = None):
        """Draw per-sample times (transport.py:98-131)."""
        t0, t1 = 0.0, 1.0
        if max_t0 is not None:
            t0 = max_t0
        if self.snr_type.startswith("uniform"):
            if "_" in self.snr_type:
                _, t0s, t1s = self.snr_type.split("_")
                t0, t1 = float(t0s), float(t1s)
            t = jax.random.uniform(key, (batch,)) * (t1 - t0) + t0
        elif self.snr_type == "lognorm":
            u = jax.random.normal(key, (batch,))
            t = 1 / (1 + jnp.exp(-u)) * (t1 - t0) + t0
        else:
            raise NotImplementedError(self.snr_type)

        if self.do_shift:
            mu = get_lin_function(y1=0.5, y2=1.15)(self.seq_len)
            t = jnp.asarray(_time_shift_traced(mu, 1.0, t))
        return t

    def sample(self, key, x1, max_t0: Optional[float] = None):
        """(t, x0, xt, ut) for training (transport.py:98-131 + plan)."""
        k_t, k_n = jax.random.split(key)
        t = self.sample_t(k_t, x1.shape[0], max_t0)
        x0 = jax.random.normal(k_n, x1.shape, x1.dtype)
        t, xt, ut = self.path_sampler.plan(t, x0, x1)
        return t, x0, xt, ut

    def training_losses(self, v_pred, ut):
        """MSE over non-batch dims (transport.py:188-198)."""
        return jnp.mean(jnp.square(v_pred - ut),
                        axis=tuple(range(1, v_pred.ndim)))


def _time_shift_traced(mu: float, sigma: float, t):
    t = 1 - t
    t = math.exp(mu) / (math.exp(mu) + (1 / jnp.clip(t, 1e-8) - 1) ** sigma)
    return 1 - t


def create_transport(path_type="Linear", prediction="velocity",
                     snr_type="uniform", do_shift=True, seq_len=1024,
                     **kwargs) -> Transport:
    return Transport(path_type=path_type, prediction=prediction,
                     snr_type=snr_type, do_shift=do_shift, seq_len=seq_len)


# ---------------------------------------------------------------------------
# Samplers (show-o2/transport/integrators.py) as lax.scan loops
# ---------------------------------------------------------------------------


def ode_timegrid(num_steps: int, time_shifting_factor: Optional[float] = None,
                 do_shift: bool = False, seq_len: Optional[int] = None,
                 t0: float = 0.0, t1: float = 1.0) -> jnp.ndarray:
    t = jnp.linspace(t0, t1, num_steps)
    if time_shifting_factor:
        t = t / (t + time_shifting_factor - time_shifting_factor * t)
    if do_shift:
        mu = get_lin_function(y1=0.5, y2=1.15)(seq_len)
        t = _time_shift_traced(mu, 1.0, t)
    return t


def sample_ode_euler(drift_fn: Callable, x: jnp.ndarray, t_grid: jnp.ndarray):
    """Fixed-step Euler over the (possibly warped) time grid, compiled as
    one scan.  drift_fn(x, t_scalar) -> v.  Returns the final sample."""

    def step(x, tt):
        t_cur, t_next = tt
        v = drift_fn(x, jnp.full((x.shape[0],), t_cur, x.dtype))
        return x + (t_next - t_cur) * v, None

    pairs = (t_grid[:-1], t_grid[1:])
    x, _ = jax.lax.scan(step, x, pairs)
    return x


def sample_ode_heun(drift_fn: Callable, x: jnp.ndarray, t_grid: jnp.ndarray):
    """Fixed-step Heun (torchdiffeq 'heun2' route of integrators.py:95-118):
    two drift evaluations per step, 2nd-order accurate."""

    def step(x, tt):
        t_cur, t_next = tt
        dt = t_next - t_cur
        v1 = drift_fn(x, jnp.full((x.shape[0],), t_cur, x.dtype))
        xp = x + dt * v1
        v2 = drift_fn(xp, jnp.full((x.shape[0],), t_next, x.dtype))
        return x + 0.5 * dt * (v1 + v2), None

    pairs = (t_grid[:-1], t_grid[1:])
    x, _ = jax.lax.scan(step, x, pairs)
    return x


def sample_ode_dopri5(drift_fn: Callable, x: jnp.ndarray,
                      t0: float = 0.0, t1: float = 1.0,
                      rtol: float = 1e-3, atol: float = 1e-6):
    """Adaptive Dormand-Prince (the reference's default 'dopri5',
    transport.py:400-447, via torchdiffeq) — here jax.experimental.ode's
    adaptive RK45 under jit."""
    from jax.experimental.ode import odeint

    def f(y, t):
        return drift_fn(y, jnp.full((y.shape[0],), t, y.dtype))

    ys = odeint(f, x, jnp.array([t0, t1], x.dtype), rtol=rtol, atol=atol)
    return ys[-1]


def prior_logp(z: jnp.ndarray) -> jnp.ndarray:
    """Standard-normal prior log-density per batch element
    (transport.py:60-67)."""
    n = math.prod(z.shape[1:])
    return (-n / 2.0 * math.log(2 * math.pi)
            - 0.5 * jnp.sum(jnp.square(z).reshape(z.shape[0], -1), axis=-1))


def sample_ode_likelihood(drift_fn: Callable, x: jnp.ndarray, key: jax.Array,
                          num_steps: int = 50):
    """Exact-likelihood ODE (transport.py:447-503): integrate data -> noise
    with the reversed drift while accumulating the Hutchinson divergence
    estimate (Rademacher probes; the reference's autograd vjp dot eps is
    replaced by a single jax.jvp, same estimator).  Returns (logp, z).

    Instantaneous change of variables: d log p / dt = -div v along the
    generative direction, so logp = prior_logp(z) - int div dt.
    """

    t_grid = jnp.linspace(0.0, 1.0, num_steps + 1)

    def step(carry, tt):
        x, delta, key = carry
        t_cur, t_next = tt
        dt = t_next - t_cur
        key, k = jax.random.split(key)
        eps = jax.random.rademacher(k, x.shape, dtype=x.dtype)
        t_model = jnp.full((x.shape[0],), 1.0 - t_cur, x.dtype)
        v, jv = jax.jvp(lambda xx: drift_fn(xx, t_model), (x,), (eps,))
        div = jnp.sum((jv * eps).reshape(x.shape[0], -1), axis=-1)
        return (x - dt * v, delta + dt * div, key), None

    delta0 = jnp.zeros((x.shape[0],), x.dtype)
    (z, delta_logp, _), _ = jax.lax.scan(
        step, (x, delta0, key), (t_grid[:-1], t_grid[1:]))
    return prior_logp(z) - delta_logp, z


def dpm_solver_pp_coeffs(t_grid) -> Tuple:
    """Per-step scalar coefficients for multistep DPM-Solver++(2M) on the
    flow schedule alpha_t = t, sigma_t = 1 - t (t=1 clean, show-o2
    convention).  The reference's sample_dpm (transport.py:380-397) is dead
    code — NoiseScheduleFlow / DPM_Solver are never imported there — so this
    is a from-scratch working implementation of the published algorithm.

    Data(x1)-prediction form: with h_i = lambda_i - lambda_{i-1},
    lambda = log(alpha/sigma),
        x_i = (sigma_i/sigma_{i-1}) x_{i-1} + alpha_i (1 - e^{-h_i}) D_i,
        D_i = (1 + 1/(2 r_i)) P_{i-1} - 1/(2 r_i) P_{i-2},  r_i = h_{i-1}/h_i
    (first step and the final clean-endpoint step are first order).
    e^{-h_i} is computed as the ratio (sigma_i alpha_{i-1})/(sigma_{i-1}
    alpha_i) directly, which stays finite at both endpoints.
    Returns arrays (c_x, c_p0, c_p1) aligned with t_grid[1:].
    """
    import numpy as np

    t = np.asarray(t_grid, np.float64)
    alpha, sigma = t, 1.0 - t
    tc = np.clip(t, 1e-12, 1 - 1e-12)
    lam = np.log(tc) - np.log1p(-tc)
    n = len(t) - 1
    c_x = np.zeros(n)
    c_p0 = np.zeros(n)
    c_p1 = np.zeros(n)
    for i in range(1, n + 1):
        e_mh = (sigma[i] * alpha[i - 1]) / max(sigma[i - 1] * alpha[i], 1e-300)
        base = alpha[i] * (1.0 - e_mh)
        c_x[i - 1] = sigma[i] / max(sigma[i - 1], 1e-300)
        h_i = lam[i] - lam[i - 1]
        h_prev = lam[i - 1] - lam[i - 2] if i >= 2 else 0.0
        first_order = (i == 1) or (i == n) or h_i <= 0 or h_prev <= 0
        if first_order:
            c_p0[i - 1] = base
        else:
            r = h_prev / h_i
            c_p0[i - 1] = base * (1.0 + 1.0 / (2.0 * r))
            c_p1[i - 1] = base * (-1.0 / (2.0 * r))
    return (jnp.asarray(c_x, jnp.float32), jnp.asarray(c_p0, jnp.float32),
            jnp.asarray(c_p1, jnp.float32))


def sample_dpm_solver_pp(drift_fn: Callable, x: jnp.ndarray,
                         t_grid: jnp.ndarray):
    """Multistep DPM-Solver++(2M) driven by a velocity model on the linear
    flow path.  Data prediction from velocity: x1_pred = x + (1 - t) v
    (since x_t = t x1 + (1 - t) x0 and v = x1 - x0).  One drift eval per
    step — same cost as Euler, 2nd-order in lambda."""
    c_x, c_p0, c_p1 = dpm_solver_pp_coeffs(t_grid)

    def data_pred(x, t_scalar):
        t_vec = jnp.full((x.shape[0],), t_scalar, x.dtype)
        v = drift_fn(x, t_vec)
        return x + (1.0 - t_scalar) * v

    p_prev = jnp.zeros_like(x)  # step 1 is first-order: c_p1[0] == 0

    def step(carry, inp):
        x, p_prev = carry
        t_cur, cx, cp0, cp1 = inp
        p_cur = data_pred(x, t_cur)
        x = cx * x + cp0 * p_cur + cp1 * p_prev
        return (x, p_cur), None

    (x, _), _ = jax.lax.scan(
        step, (x, p_prev), (t_grid[:-1], c_x, c_p0, c_p1))
    return x


def sample_sde_euler_maruyama(drift_fn: Callable, diffusion_fn: Callable,
                              x: jnp.ndarray, t_grid: jnp.ndarray,
                              key: jax.Array):
    """Euler-Maruyama (integrators.py:27-35); fixed dt = t[1]-t[0]."""
    dt = t_grid[1] - t_grid[0]

    def step(carry, t_cur):
        x, key = carry
        key, k = jax.random.split(key)
        w = jax.random.normal(k, x.shape, x.dtype)
        t_vec = jnp.full((x.shape[0],), t_cur, x.dtype)
        drift = drift_fn(x, t_vec)
        diffusion = diffusion_fn(x, t_vec)
        mean_x = x + drift * dt
        x = mean_x + jnp.sqrt(2 * diffusion) * w * jnp.sqrt(dt)
        return (x, key), None

    (x, _), _ = jax.lax.scan(step, (x, key), t_grid[:-1])
    return x


def sample_sde_heun(drift_fn: Callable, diffusion_fn: Callable,
                    x: jnp.ndarray, t_grid: jnp.ndarray, key: jax.Array):
    """Heun step (integrators.py:37-49)."""
    dt = t_grid[1] - t_grid[0]

    def step(carry, t_cur):
        x, key = carry
        key, k = jax.random.split(key)
        w = jax.random.normal(k, x.shape, x.dtype)
        t_vec = jnp.full((x.shape[0],), t_cur, x.dtype)
        diffusion = diffusion_fn(x, t_vec)
        xhat = x + jnp.sqrt(2 * diffusion) * w * jnp.sqrt(dt)
        K1 = drift_fn(xhat, t_vec)
        xp = xhat + dt * K1
        K2 = drift_fn(xp, t_vec + dt)
        return (xhat + 0.5 * dt * (K1 + K2), key), None

    (x, _), _ = jax.lax.scan(step, (x, key), t_grid[:-1])
    return x
