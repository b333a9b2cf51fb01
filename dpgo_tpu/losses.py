"""Robust loss kernels for inter-node measurements.

rho(s) is applied to the squared residual norm s = |r_e|^2 of each inter-node
edge; w(s) = rho'(s) is the IRLS weight. Matches the reference's evaluate_E
(C++/DPGO/src/DPGOProblem.cpp:634-681) and DPGOStar::evaluate_f
(DPGOStar.cpp:713-761):

  trivial:       rho(s) = s                          w = 1
  Huber:         rho(s) = s                 s <= c   w = min(1, sqrt(c/s))
                        = 2 sqrt(c s) - c   s > c
  Geman-McClure: rho(s) = c s / (s + c)              w = c^2 / (s + c)^2
  Welsch:        rho(s) = c (1 - exp(-s/c))          w = exp(-s/c)

c = loss_reg (0.25 in the reference driver, dist_pgo.cpp:107).
"""

from __future__ import annotations

import enum

import jax.numpy as jnp


class Loss(enum.Enum):
    TRIVIAL = "trivial"
    HUBER = "huber"
    GEMAN_MCCLURE = "geman_mcclure"
    WELSCH = "welsch"


def loss_value(loss: Loss, s: jnp.ndarray, c: float) -> jnp.ndarray:
    if loss == Loss.TRIVIAL:
        return s
    if loss == Loss.HUBER:
        sqrt_c = jnp.sqrt(jnp.asarray(c, s.dtype))
        return jnp.minimum(s, 2.0 * sqrt_c * jnp.sqrt(jnp.maximum(s, c)) - c)
    if loss == Loss.GEMAN_MCCLURE:
        return c * s / (s + c)
    if loss == Loss.WELSCH:
        return c * (1.0 - jnp.exp(-s / c))
    raise ValueError(f"unknown loss {loss}")


def loss_weight(loss: Loss, s: jnp.ndarray, c: float) -> jnp.ndarray:
    if loss == Loss.TRIVIAL:
        return jnp.ones_like(s)
    if loss == Loss.HUBER:
        sqrt_c = jnp.sqrt(jnp.asarray(c, s.dtype))
        return sqrt_c / jnp.sqrt(jnp.maximum(s, c))
    if loss == Loss.GEMAN_MCCLURE:
        return (c / (s + c)) ** 2
    if loss == Loss.WELSCH:
        return jnp.exp(-s / c)
    raise ValueError(f"unknown loss {loss}")
