"""Timestep schedule samplers for diffusion training.

Reference: ttts/utils/resample.py:9-188 — UniformSampler and
LossSecondMomentResampler (importance-samples timesteps proportional to the
RMS of recent losses at each t, with uniform warmup until every t has
history). Weights returned alongside samples de-bias the loss estimate.

TPU note: the history buffer is a fixed-shape device array updated
functionally (the reference mutates a numpy ring buffer per t); the whole
sampler state rides inside the jitted train step.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class UniformSampler:
    def __init__(self, num_timesteps: int):
        self.num_timesteps = num_timesteps

    def sample(self, key, batch: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
        t = jax.random.randint(key, (batch,), 0, self.num_timesteps)
        return t, jnp.ones((batch,), jnp.float32)


class LossAwareState(NamedTuple):
    """Per-timestep ring buffer of recent losses (T, history)."""

    history: jnp.ndarray    # (T, H) f32
    counts: jnp.ndarray     # (T,) int32 — filled entries per t


class LossSecondMomentResampler:
    """Importance sampling p(t) ∝ sqrt(E[loss(t)^2]) with uniform floor
    (resample.py:120-188: history 10 per t, uniform_prob 0.001)."""

    def __init__(self, num_timesteps: int, history_per_term: int = 10,
                 uniform_prob: float = 0.001):
        self.num_timesteps = num_timesteps
        self.history = history_per_term
        self.uniform_prob = uniform_prob

    def init_state(self) -> LossAwareState:
        return LossAwareState(
            history=jnp.zeros((self.num_timesteps, self.history), jnp.float32),
            counts=jnp.zeros((self.num_timesteps,), jnp.int32))

    def _warmed_up(self, state: LossAwareState) -> jnp.ndarray:
        return jnp.all(state.counts >= self.history)

    def weights(self, state: LossAwareState) -> jnp.ndarray:
        """(T,) sampling distribution (resample.py:160-173)."""
        uniform = jnp.ones((self.num_timesteps,)) / self.num_timesteps
        sq = jnp.sqrt(jnp.mean(state.history ** 2, axis=-1))
        p = sq / jnp.maximum(sq.sum(), 1e-12)
        p = p * (1 - self.uniform_prob) + self.uniform_prob / self.num_timesteps
        return jnp.where(self._warmed_up(state), p, uniform)

    def sample(self, key, batch: int, state: LossAwareState
               ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Returns (t, importance weights 1/(T p(t)))."""
        p = self.weights(state)
        t = jax.random.choice(key, self.num_timesteps, (batch,), p=p)
        w = 1.0 / (self.num_timesteps * p[t])
        return t, w

    def update(self, state: LossAwareState, t: jnp.ndarray,
               losses: jnp.ndarray) -> LossAwareState:
        """Push per-example losses into the ring buffers (scatter; last
        write wins on duplicate t within a batch, like the reference's
        sequential loop)."""
        slot = state.counts[t] % self.history
        history = state.history.at[t, slot].set(losses.astype(jnp.float32))
        counts = state.counts.at[t].add(1)
        return LossAwareState(history, counts)
