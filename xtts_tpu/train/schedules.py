"""LR schedules matching the reference trainers.

* cosine with warmup + min-lr floor: ttts/gpt/train_ms.py:45-59
* linear warmup: ttts/gpt/train.py:36-40
* exponential decay: ttts/vqvae/train_ms.py:80 (gamma=0.999875 per epoch)
"""
from __future__ import annotations

import math

import optax


def cosine_with_warmup(lr: float, warmup_steps: int, total_steps: int,
                       min_lr_ratio: float = 0.1):
    def fn(step):
        import jax.numpy as jnp
        warm = lr * jnp.minimum(step / jnp.maximum(warmup_steps, 1), 1.0)
        prog = jnp.clip((step - warmup_steps)
                        / jnp.maximum(total_steps - warmup_steps, 1), 0.0, 1.0)
        cos = min_lr_ratio * lr + (1 - min_lr_ratio) * lr * 0.5 * (
            1 + jnp.cos(math.pi * prog))
        return jnp.where(step < warmup_steps, warm, cos)
    return fn


def linear_warmup(lr: float, warmup_steps: int):
    def fn(step):
        import jax.numpy as jnp
        return lr * jnp.minimum((step + 1) / warmup_steps, 1.0)
    return fn


def exponential(lr: float, gamma: float = 0.999875):
    def fn(step):
        import jax.numpy as jnp
        return lr * gamma ** step
    return fn


def make_schedule(kind: str, lr: float, warmup_steps: int, total_steps: int,
                  min_lr_ratio: float = 0.1):
    if kind == "cosine":
        return cosine_with_warmup(lr, warmup_steps, total_steps, min_lr_ratio)
    if kind == "linear":
        return linear_warmup(lr, warmup_steps)
    if kind == "exponential":
        return exponential(lr)
    if kind == "constant":
        return lambda step: lr
    raise ValueError(kind)
