"""Exponential moving average of model weights.

Reference: ttts/utils/utils.py:187-201 (EMA class + update_moving_average),
constructed by the home-rig trainers (ttts/gpt/train.py:51-55). Functional
here: a pure pytree op that runs inside the jitted train step.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp


def ema_init(params: Any) -> Any:
    # explicit copy: sharing buffers with params breaks jit donation
    return jax.tree_util.tree_map(
        lambda p: jnp.array(p, dtype=jnp.float32, copy=True), params)


def ema_update(ema_params: Any, new_params: Any, decay: float = 0.999) -> Any:
    """ema = decay * ema + (1-decay) * new (utils.py:199-201)."""
    return jax.tree_util.tree_map(
        lambda e, p: e * decay + p.astype(e.dtype) * (1.0 - decay),
        ema_params, new_params)


def ema_warmup_decay(step: jnp.ndarray, decay: float = 0.999) -> jnp.ndarray:
    """Ramp decay from ~0 so early EMA tracks the fast-moving params
    (standard (1+s)/(10+s) warmup capped at `decay`)."""
    s = step.astype(jnp.float32)
    return jnp.minimum(decay, (1.0 + s) / (10.0 + s))
