"""EDM samplers as compiled lax.scan loops.

Reference: sample.py:30-66 (edm_sampler, EDM Algorithm 2 / Heun) and
sample.py:73-188 (ablation_sampler superset: solver x discretization x
schedule x scaling). Time discretizations are precomputed host-side in
float64; the on-device ODE state is float32 (the reference keeps fp64 state
but already evaluates the network in fp32 — sample.py:46,56; on TPU fp64 is
emulated and slow, and 40-step trajectories agree to ~1e-5, see
tests/test_sampler.py).

The denoiser is passed as ``denoise_fn(x, sigma) -> D_x`` with sigma a
scalar array; CFG/net binding happens in the caller (sampling.generate), so
one compiled sampler serves every model.
"""

from __future__ import annotations

import math
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

DenoiseFn = Callable[[jax.Array, jax.Array], jax.Array]


def _apply_net_sigma_surface(
    sigma_steps: np.ndarray,
    round_sigma: Optional[Callable],
) -> np.ndarray:
    """Route host-side noise levels through the net's ``round_sigma``.

    Mirrors reference sample.py:43,157 (``net.round_sigma(t_steps)``): nets
    trained on discrete noise levels snap the continuous discretization to
    their grid. EDMPrecond's round_sigma is the identity (precond.py:121),
    so this is a no-op for MaskDiT — kept for surface parity with other
    preconds. Applied host-side to the fp64 levels before they become the
    compiled scan constants; ``ensure_compile_time_eval`` keeps a
    jnp-based round_sigma (EDMPrecond's is ``jnp.asarray``) concrete even
    when the enclosing sampler call is being traced under jit."""
    if round_sigma is None:
        return sigma_steps
    with jax.ensure_compile_time_eval():
        rounded = round_sigma(sigma_steps)
    return np.asarray(rounded, dtype=np.float64)


def edm_sigma_steps(
    num_steps: int, sigma_min: float = 0.002, sigma_max: float = 80.0,
    rho: float = 7.0,
) -> np.ndarray:
    """rho-spaced noise levels with terminal 0 (reference: sample.py:39-43)."""
    idx = np.arange(num_steps, dtype=np.float64)
    steps = (
        sigma_max ** (1 / rho)
        + idx / (num_steps - 1) * (sigma_min ** (1 / rho) - sigma_max ** (1 / rho))
    ) ** rho
    return np.concatenate([steps, np.zeros(1)])


def edm_sampler(
    denoise_fn: DenoiseFn,
    latents: jax.Array,
    rng: Optional[jax.Array] = None,
    num_steps: int = 18,
    sigma_min: float = 0.002,
    sigma_max: float = 80.0,
    rho: float = 7.0,
    S_churn: float = 0.0,
    S_min: float = 0.0,
    S_max: float = float("inf"),
    S_noise: float = 1.0,
    net_sigma_min: float = 0.0,
    net_sigma_max: float = float("inf"),
    round_sigma: Optional[Callable] = None,
) -> jax.Array:
    """Heun 2nd-order EDM sampler (reference: sample.py:30-66).

    79 denoiser evals at the default 40 steps. jit-able end to end; wrap the
    call in jax.jit for production use. ``net_sigma_min/max`` clamp the
    requested range to what the net supports and ``round_sigma`` snaps
    levels to its grid (reference sample.py:36-37,43) — both identity for
    EDMPrecond (precond.py:32-33,121).
    """
    sigma_min = max(sigma_min, net_sigma_min)
    sigma_max = min(sigma_max, net_sigma_max)
    levels = edm_sigma_steps(num_steps, sigma_min, sigma_max, rho)
    levels[:-1] = _apply_net_sigma_surface(levels[:-1], round_sigma)
    t_steps = jnp.asarray(levels, dtype=jnp.float32)
    gamma_max = min(S_churn / num_steps, math.sqrt(2.0) - 1.0)
    use_churn = S_churn > 0
    if use_churn and rng is None:
        raise ValueError("S_churn > 0 requires an rng key")

    x0 = latents.astype(jnp.float32) * t_steps[0]

    def step(x_cur, inputs):
        i, t_cur, t_next = inputs

        if use_churn:
            in_range = (t_cur >= S_min) & (t_cur <= S_max)
            gamma = jnp.where(in_range, gamma_max, 0.0)
            t_hat = t_cur + gamma * t_cur
            step_rng = jax.random.fold_in(rng, i)
            noise = jax.random.normal(step_rng, x_cur.shape, x_cur.dtype)
            x_hat = x_cur + jnp.sqrt(
                jnp.maximum(t_hat ** 2 - t_cur ** 2, 0.0)
            ) * S_noise * noise
        else:
            t_hat = t_cur
            x_hat = x_cur

        denoised = denoise_fn(x_hat, t_hat).astype(jnp.float32)
        d_cur = (x_hat - denoised) / t_hat
        x_euler = x_hat + (t_next - t_hat) * d_cur

        def heun(x_euler):
            denoised2 = denoise_fn(x_euler, t_next).astype(jnp.float32)
            d_prime = (x_euler - denoised2) / t_next
            return x_hat + (t_next - t_hat) * (0.5 * d_cur + 0.5 * d_prime)

        x_next = jax.lax.cond(
            i < num_steps - 1, heun, lambda x: x, x_euler
        )
        return x_next, None

    steps = (
        jnp.arange(num_steps, dtype=jnp.int32),
        t_steps[:-1],
        t_steps[1:],
    )
    x_final, _ = jax.lax.scan(step, x0, steps)
    return x_final


# ---------------------------------------------------------------------------
# Ablation sampler (reference: sample.py:73-188)
# ---------------------------------------------------------------------------

def _vp_sigma(beta_d: float, beta_min: float):
    return lambda t: np.sqrt(np.expm1(0.5 * beta_d * t ** 2 + beta_min * t))


def ablation_sigma_steps(
    num_steps: int,
    discretization: str,
    sigma_min: Optional[float],
    sigma_max: Optional[float],
    rho: float = 7.0,
    epsilon_s: float = 1e-3,
    C_1: float = 0.001,
    C_2: float = 0.008,
    M: int = 1000,
    net_sigma_min: float = 0.0,
    net_sigma_max: float = float("inf"),
) -> tuple[np.ndarray, float, float]:
    """Host-side noise-level discretization for the ablation sampler.

    Returns (sigma_steps[num_steps], sigma_min, sigma_max) — defaults
    resolved per discretization as in reference sample.py:97-103, then
    clamped to the net's supported range (sample.py:104-106).
    """
    if sigma_min is None:
        vp_def = _vp_sigma(19.1, 0.1)(epsilon_s)
        sigma_min = {"vp": vp_def, "ve": 0.02, "iddpm": 0.002, "edm": 0.002}[
            discretization
        ]
    if sigma_max is None:
        vp_def = _vp_sigma(19.1, 0.1)(1.0)
        sigma_max = {"vp": vp_def, "ve": 100.0, "iddpm": 81.0, "edm": 80.0}[
            discretization
        ]
    sigma_min = max(sigma_min, net_sigma_min)
    sigma_max = min(sigma_max, net_sigma_max)

    idx = np.arange(num_steps, dtype=np.float64)
    if discretization == "vp":
        vp_beta_d = (
            2
            * (np.log(sigma_min ** 2 + 1) / epsilon_s - np.log(sigma_max ** 2 + 1))
            / (epsilon_s - 1)
        )
        vp_beta_min = np.log(sigma_max ** 2 + 1) - 0.5 * vp_beta_d
        orig_t = 1 + idx / (num_steps - 1) * (epsilon_s - 1)
        sigma_steps = _vp_sigma(vp_beta_d, vp_beta_min)(orig_t)
    elif discretization == "ve":
        orig_t = sigma_max ** 2 * (sigma_min ** 2 / sigma_max ** 2) ** (
            idx / (num_steps - 1)
        )
        sigma_steps = np.sqrt(orig_t)
    elif discretization == "iddpm":
        u = np.zeros(M + 1, dtype=np.float64)
        alpha_bar = lambda j: np.sin(0.5 * np.pi * j / M / (C_2 + 1)) ** 2
        for j in range(M, 0, -1):
            u[j - 1] = np.sqrt(
                (u[j] ** 2 + 1)
                / max(alpha_bar(j - 1) / alpha_bar(j), C_1)
                - 1
            )
        u_filtered = u[(u >= sigma_min) & (u <= sigma_max)]
        pick = np.round(
            (len(u_filtered) - 1) / (num_steps - 1) * idx
        ).astype(np.int64)
        sigma_steps = u_filtered[pick]
    elif discretization == "edm":
        sigma_steps = (
            sigma_max ** (1 / rho)
            + idx / (num_steps - 1) * (sigma_min ** (1 / rho) - sigma_max ** (1 / rho))
        ) ** rho
    else:
        raise ValueError(f"unknown discretization '{discretization}'")
    return sigma_steps, float(sigma_min), float(sigma_max)


def ablation_sampler(
    denoise_fn: DenoiseFn,
    latents: jax.Array,
    rng: Optional[jax.Array] = None,
    num_steps: int = 18,
    sigma_min: Optional[float] = None,
    sigma_max: Optional[float] = None,
    rho: float = 7.0,
    solver: str = "heun",
    discretization: str = "edm",
    schedule: str = "linear",
    scaling: str = "none",
    epsilon_s: float = 1e-3,
    C_1: float = 0.001,
    C_2: float = 0.008,
    M: int = 1000,
    alpha: float = 1.0,
    S_churn: float = 0.0,
    S_min: float = 0.0,
    S_max: float = float("inf"),
    S_noise: float = 1.0,
    net_sigma_min: float = 0.0,
    net_sigma_max: float = float("inf"),
    round_sigma: Optional[Callable] = None,
) -> jax.Array:
    """Generalized sampler superset (reference: sample.py:73-188).

    ``net_sigma_min/max``/``round_sigma`` mirror the reference's
    net-supported-range clamp and level snapping (sample.py:104-106,157);
    identity for EDMPrecond."""
    assert solver in ("euler", "heun")
    assert discretization in ("vp", "ve", "iddpm", "edm")
    assert schedule in ("vp", "ve", "linear")
    assert scaling in ("vp", "none")

    sigma_steps, sigma_min, sigma_max = ablation_sigma_steps(
        num_steps, discretization, sigma_min, sigma_max, rho, epsilon_s, C_1, C_2, M,
        net_sigma_min=net_sigma_min, net_sigma_max=net_sigma_max,
    )
    sigma_steps = _apply_net_sigma_surface(sigma_steps, round_sigma)

    vp_beta_d = (
        2
        * (np.log(sigma_min ** 2 + 1) / epsilon_s - np.log(sigma_max ** 2 + 1))
        / (epsilon_s - 1)
    )
    vp_beta_min = np.log(sigma_max ** 2 + 1) - 0.5 * vp_beta_d

    # schedule sigma(t) and its inverse/derivative, traced (jnp) versions
    if schedule == "vp":
        sigma = lambda t: jnp.sqrt(jnp.expm1(0.5 * vp_beta_d * t ** 2 + vp_beta_min * t))
        sigma_deriv = lambda t: 0.5 * (vp_beta_min + vp_beta_d * t) * (
            sigma(t) + 1.0 / sigma(t)
        )
        sigma_inv = lambda s: (
            jnp.sqrt(vp_beta_min ** 2 + 2 * vp_beta_d * jnp.log(s ** 2 + 1))
            - vp_beta_min
        ) / vp_beta_d
    elif schedule == "ve":
        sigma = lambda t: jnp.sqrt(t)
        sigma_deriv = lambda t: 0.5 / jnp.sqrt(t)
        sigma_inv = lambda s: s ** 2
    else:
        sigma = lambda t: t
        sigma_deriv = lambda t: jnp.ones_like(t)
        sigma_inv = lambda s: s

    if scaling == "vp":
        s_fn = lambda t: 1.0 / jnp.sqrt(1.0 + sigma(t) ** 2)
        s_deriv = lambda t: -sigma(t) * sigma_deriv(t) * s_fn(t) ** 3
    else:
        s_fn = lambda t: jnp.ones_like(t)
        s_deriv = lambda t: jnp.zeros_like(t)

    t_steps = sigma_inv(jnp.asarray(sigma_steps, dtype=jnp.float32))
    t_steps = jnp.concatenate([t_steps, jnp.zeros((1,), jnp.float32)])

    gamma_max = min(S_churn / num_steps, math.sqrt(2.0) - 1.0)
    use_churn = S_churn > 0
    if use_churn and rng is None:
        raise ValueError("S_churn > 0 requires an rng key")

    t0 = t_steps[0]
    x0 = latents.astype(jnp.float32) * (sigma(t0) * s_fn(t0))

    def step(x_cur, inputs):
        i, t_cur, t_next = inputs

        if use_churn:
            in_range = (sigma(t_cur) >= S_min) & (sigma(t_cur) <= S_max)
            gamma = jnp.where(in_range, gamma_max, 0.0)
            t_hat = sigma_inv(sigma(t_cur) + gamma * sigma(t_cur))
            step_rng = jax.random.fold_in(rng, i)
            noise = jax.random.normal(step_rng, x_cur.shape, x_cur.dtype)
            x_hat = (
                s_fn(t_hat) / s_fn(t_cur) * x_cur
                + jnp.sqrt(
                    jnp.maximum(sigma(t_hat) ** 2 - sigma(t_cur) ** 2, 0.0)
                )
                * s_fn(t_hat)
                * S_noise
                * noise
            )
        else:
            t_hat = t_cur
            x_hat = x_cur

        h = t_next - t_hat
        denoised = denoise_fn(x_hat / s_fn(t_hat), sigma(t_hat)).astype(jnp.float32)
        d_cur = (
            sigma_deriv(t_hat) / sigma(t_hat) + s_deriv(t_hat) / s_fn(t_hat)
        ) * x_hat - sigma_deriv(t_hat) * s_fn(t_hat) / sigma(t_hat) * denoised

        def euler(_):
            return x_hat + h * d_cur

        def heun(_):
            x_prime = x_hat + alpha * h * d_cur
            t_prime = t_hat + alpha * h
            denoised2 = denoise_fn(
                x_prime / s_fn(t_prime), sigma(t_prime)
            ).astype(jnp.float32)
            d_prime = (
                sigma_deriv(t_prime) / sigma(t_prime)
                + s_deriv(t_prime) / s_fn(t_prime)
            ) * x_prime - sigma_deriv(t_prime) * s_fn(t_prime) / sigma(
                t_prime
            ) * denoised2
            return x_hat + h * (
                (1 - 1 / (2 * alpha)) * d_cur + 1 / (2 * alpha) * d_prime
            )

        if solver == "euler":
            x_next = euler(None)
        else:
            x_next = jax.lax.cond(i == num_steps - 1, euler, heun, None)
        return x_next, None

    steps = (
        jnp.arange(num_steps, dtype=jnp.int32),
        t_steps[:-1],
        t_steps[1:],
    )
    x_final, _ = jax.lax.scan(step, x0, steps)
    return x_final
