"""Custom activations.

trunc_exp — parity target ngp-ours/activation.py:5-18: forward exp(x),
backward grad * exp(clamp(x, -15, 15)).  The clamp keeps the density
gradient bounded during the early high-LR phase of Instant-NGP training.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.custom_vjp
def trunc_exp(x):
    return jnp.exp(x)


def _trunc_exp_fwd(x):
    return jnp.exp(x), x


def _trunc_exp_bwd(x, g):
    return (g * jnp.exp(jnp.clip(x, -15.0, 15.0)),)


trunc_exp.defvjp(_trunc_exp_fwd, _trunc_exp_bwd)
