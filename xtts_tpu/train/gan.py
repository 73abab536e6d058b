"""GAN training machinery for the HiFi-GAN decoder.

Reference: ttts/hifigan/losses.py:9-489 (multi-scale STFT loss, L1 spec, MSE
G/D adversarial losses, feature matching) and ttts/hifigan/train_ms.py:62-121
(G/D optimizers, latent extraction with frozen GPT).

TPU design: BOTH discriminator and generator updates compile into one jitted
step (two optax states, one program) instead of two sequential torch passes;
STFTs are framed-matmul ops from xtts_tpu.dsp.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax

from xtts_tpu.dsp.spectral import stft


def stft_magnitude(wav: jnp.ndarray, n_fft: int, hop: int,
                   win: int) -> jnp.ndarray:
    return stft(wav, n_fft, hop, win, magnitude=True, mag_eps=1e-9)


# ---------------------------------------------------------------------------
# losses (ttts/hifigan/losses.py)
# ---------------------------------------------------------------------------


def stft_loss(y_hat: jnp.ndarray, y: jnp.ndarray, n_fft: int, hop: int,
              win: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Spectral-convergence + log-magnitude L1 at one resolution
    (losses.py STFTLoss)."""
    s_hat = stft_magnitude(y_hat, n_fft, hop, win)
    s = stft_magnitude(y, n_fft, hop, win)
    sc = jnp.linalg.norm(s - s_hat) / jnp.maximum(jnp.linalg.norm(s), 1e-8)
    mag = jnp.abs(jnp.log(jnp.clip(s, 1e-5)) - jnp.log(jnp.clip(s_hat, 1e-5))).mean()
    return sc, mag


def multi_scale_stft_loss(y_hat: jnp.ndarray, y: jnp.ndarray,
                          n_ffts=(1024, 2048, 512),
                          hops=(120, 240, 50),
                          wins=(600, 1200, 240)) -> jnp.ndarray:
    """MultiScaleSTFTLoss with the reference's default resolutions."""
    total = 0.0
    for n_fft, hop, win in zip(n_ffts, hops, wins):
        sc, mag = stft_loss(y_hat, y, n_fft, hop, win)
        total = total + sc + mag
    return total / len(n_ffts)


def feature_matching_loss(feats_hat: Sequence[Sequence[jnp.ndarray]],
                          feats_real: Sequence[Sequence[jnp.ndarray]]
                          ) -> jnp.ndarray:
    """Mean L1 between all discriminator feature maps (losses.py feat_match)."""
    total, n = 0.0, 0
    for fh, fr in zip(feats_hat, feats_real):
        for a, b in zip(fh, fr):
            total = total + jnp.abs(a - jax.lax.stop_gradient(b)).mean()
            n += 1
    return total / max(n, 1)


def generator_adv_loss(scores_hat: Sequence[jnp.ndarray]) -> jnp.ndarray:
    """LSGAN generator loss: mean (D(G(z)) - 1)^2."""
    return sum(jnp.mean((s - 1.0) ** 2) for s in scores_hat) / len(scores_hat)


def discriminator_adv_loss(scores_real: Sequence[jnp.ndarray],
                           scores_fake: Sequence[jnp.ndarray]) -> jnp.ndarray:
    """LSGAN discriminator loss: (D(x)-1)^2 + D(G(z))^2."""
    total = 0.0
    for sr, sf in zip(scores_real, scores_fake):
        total = total + jnp.mean((sr - 1.0) ** 2) + jnp.mean(sf ** 2)
    return total / len(scores_real)


@dataclass
class GANLossWeights:
    """ttts/hifigan/config.json loss weights."""

    stft: float = 45.0
    feat_match: float = 2.0
    adv: float = 1.0


# ---------------------------------------------------------------------------
# two-optimizer trainer
# ---------------------------------------------------------------------------


@jax.tree_util.register_pytree_node_class
@dataclass
class GANState:
    g_params: Any
    d_params: Any
    g_opt: Any
    d_opt: Any
    step: jnp.ndarray

    def tree_flatten(self):
        return ((self.g_params, self.d_params, self.g_opt, self.d_opt,
                 self.step), None)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


def make_hifigan_generator_fn(decoder, gpt, gpt_vars, dvae, dvae_vars):
    """Generator closure for GANTrainer: frozen DVAE codes -> frozen GPT
    latents -> HifiDecoder waveform (ttts/hifigan/train_ms.py:168-186 does
    the same latent extraction online per step).

    batch: {'wav': (B, T), 'mel': (B, bins, F), 'refer_mel16': (B, T16, 64),
            'wav_length': (B,)}
    """
    from xtts_tpu.train.steps import _scan_latent_gpt
    gpt, gpt_vars = _scan_latent_gpt(gpt, gpt_vars)

    def _latent_impl(gv_, dv_, batch):
        """The frozen-aux half (DVAE codes -> GPT latents). Frozen params
        are ARGUMENTS, never closure constants: closed-over params embed
        in the serialized HLO and break the tunneled chip's remote-compile
        transport (~1.1 GB body -> HTTP 413 or a ~25 min upload until the
        pipe drops; PERF.md round 5 root cause)."""
        codes = dvae.apply(dv_, batch["mel"],
                           method=dvae.get_codebook_indices)
        codes = jax.lax.stop_gradient(codes)
        latent = gpt.apply(
            gv_, batch["mel"],
            jnp.zeros((batch["mel"].shape[0], 4), jnp.int32),
            jnp.full((batch["mel"].shape[0],), 4, jnp.int32),
            codes, batch["wav_length"], return_latent=True)  # (B, N, D)
        return jax.lax.stop_gradient(latent)

    _latent_jit = jax.jit(_latent_impl)

    def latent_of(batch):
        """Standalone jitted split-path program (BENCH_SPLIT_FROZEN):
        frozen vars enter as runtime args. Call directly; do NOT re-wrap
        in jax.jit (that re-captures the vars as closure constants)."""
        return _latent_jit(gpt_vars, dvae_vars, batch)

    def gen_fn(g_params, batch, rng, frozen=None):
        if "latent" in batch:
            latent = batch["latent"]
        elif frozen is not None:
            latent = _latent_impl(frozen["gpt_vars"], frozen["dvae_vars"],
                                  batch)
        else:
            latent = _latent_impl(gpt_vars, dvae_vars, batch)
        wav_hat = decoder.apply({"params": g_params}, latent,
                                ref_mel16k=batch["refer_mel16"])
        # trim/pad to the real crop length for the discriminators
        t = batch["wav"].shape[1]
        if wav_hat.shape[1] >= t:
            wav_hat = wav_hat[:, :t]
        else:
            wav_hat = jnp.pad(wav_hat, ((0, 0), (0, t - wav_hat.shape[1])))
        # losses (multi-scale STFT rfft, L1) and discriminators run f32 even
        # when the generator computes in bf16 (f32-losses convention)
        return wav_hat.astype(jnp.float32)

    gen_fn.latent_of = latent_of
    # canonical frozen tree for GANTrainer(frozen=...): frozen params as
    # runtime args of the fused step (matches the latent pass's layout)
    gen_fn.frozen = {"gpt_vars": gpt_vars, "dvae_vars": dvae_vars}
    return gen_fn


class GANTrainer:
    """Generator/discriminator pair with a single jitted combined step.

    generator_fn(g_params, batch, rng) -> fake wav (B, T)
    discriminator_fn(d_params, wav)    -> (scores, features)
    real wav comes from batch['wav'].
    """

    def __init__(self, generator_fn: Callable, discriminator_fn: Callable,
                 g_lr: float = 2e-4, d_lr: float = 2e-4,
                 weights: GANLossWeights = GANLossWeights(),
                 grad_clip: float = 1.0,
                 stft_resolutions: Tuple[Sequence[int], Sequence[int],
                                         Sequence[int]] | None = None,
                 frozen=None):
        # frozen: optional pytree forwarded to generator_fn as its 4th
        # argument — frozen aux params (GPT+DVAE) as runtime args of the
        # jitted step instead of ~1.1 GB of embedded HLO constants, which
        # break the tunneled chip's remote-compile transport (PERF.md r5).
        # Use GANTrainer(..., frozen=gen_fn.frozen).
        self.frozen = frozen
        self.gen = generator_fn
        self.disc = discriminator_fn
        self.weights = weights
        # (n_ffts, hops, wins); None = the reference's three resolutions
        # (losses.py MultiScaleSTFTLoss defaults). Overridable so tiny-shape
        # dryruns/tests can compile one resolution instead of three.
        self.stft_resolutions = stft_resolutions
        self.g_tx = optax.chain(optax.clip_by_global_norm(grad_clip),
                                optax.adamw(g_lr, b1=0.8, b2=0.99))
        self.d_tx = optax.chain(optax.clip_by_global_norm(grad_clip),
                                optax.adamw(d_lr, b1=0.8, b2=0.99))
        self._step = jax.jit(self._train_step, donate_argnums=(0,))

    def _stft_loss(self, y_hat, real):
        if self.stft_resolutions is None:
            return multi_scale_stft_loss(y_hat, real)
        n_ffts, hops, wins = self.stft_resolutions
        return multi_scale_stft_loss(y_hat, real, n_ffts=n_ffts, hops=hops,
                                     wins=wins)

    def init_state(self, g_params, d_params) -> GANState:
        return GANState(g_params, d_params, self.g_tx.init(g_params),
                        self.d_tx.init(d_params), jnp.zeros((), jnp.int32))

    def _gen_call(self, g_params, batch, rng, frozen):
        if frozen is not None:
            return self.gen(g_params, batch, rng, frozen)
        return self.gen(g_params, batch, rng)

    def _train_step(self, state: GANState, batch, rng, frozen=None):
        real = batch["wav"]

        # --- discriminator update (generator frozen) ---
        fake = jax.lax.stop_gradient(
            self._gen_call(state.g_params, batch, rng, frozen))

        def d_loss_fn(d_params):
            sr, _ = self.disc(d_params, real)
            sf, _ = self.disc(d_params, fake)
            return discriminator_adv_loss(sr, sf)

        d_loss, d_grads = jax.value_and_grad(d_loss_fn)(state.d_params)
        d_updates, d_opt = self.d_tx.update(d_grads, state.d_opt,
                                            state.d_params)
        d_params = optax.apply_updates(state.d_params, d_updates)

        # --- generator update (new discriminator frozen) ---
        def g_loss_fn(g_params):
            y_hat = self._gen_call(g_params, batch, rng, frozen)
            sf, ff = self.disc(d_params, y_hat)
            _, fr = self.disc(d_params, real)
            adv = generator_adv_loss(sf)
            fm = feature_matching_loss(ff, fr)
            stft_l = self._stft_loss(y_hat, real)
            w = self.weights
            loss = w.adv * adv + w.feat_match * fm + w.stft * stft_l
            return loss, {"g_adv": adv, "g_fm": fm, "g_stft": stft_l}

        (g_loss, aux), g_grads = jax.value_and_grad(
            g_loss_fn, has_aux=True)(state.g_params)
        g_updates, g_opt = self.g_tx.update(g_grads, state.g_opt,
                                            state.g_params)
        g_params = optax.apply_updates(state.g_params, g_updates)

        metrics = {"d_loss": d_loss, "g_loss": g_loss, **aux}
        return GANState(g_params, d_params, g_opt, d_opt,
                        state.step + 1), metrics

    def step(self, state: GANState, batch, rng):
        return self._step(state, batch, rng, self.frozen)

    def grad_check(self, state: GANState, batch, rng):
        """Losses + raw grad trees for DDP-parity checks (no donation, no
        optimizer): reproduces _train_step's exact sequence — d grads on
        the current params, then g grads against the d-updated params.

        Used by the multichip dryrun: comparing GRADIENTS between the
        sharded and single-device arms is the principled DDP check. The
        post-step params can't be compared elementwise under Adam: at any
        step the update is ~lr*sign(m_hat), so every element whose two
        grad estimates straddle zero (near-zero grads under f32 tiling
        differences, 10-30% of some conv tensors here) flips the FULL
        +-lr, drowning real signal (a wrong psum/mean shows up in grads
        directly as a 2x scale, which sign() erases)."""
        def probe(state, batch, rng, frozen):
            fake = jax.lax.stop_gradient(
                self._gen_call(state.g_params, batch, rng, frozen))

            def d_loss_fn(d_params):
                sr, _ = self.disc(d_params, batch["wav"])
                sf, _ = self.disc(d_params, fake)
                return discriminator_adv_loss(sr, sf)

            d_loss, d_grads = jax.value_and_grad(d_loss_fn)(state.d_params)
            d_updates, _ = self.d_tx.update(d_grads, state.d_opt,
                                            state.d_params)
            d_params = optax.apply_updates(state.d_params, d_updates)

            def g_loss_fn(g_params):
                y_hat = self._gen_call(g_params, batch, rng, frozen)
                sf, ff = self.disc(d_params, y_hat)
                _, fr = self.disc(d_params, batch["wav"])
                w = self.weights
                return (w.adv * generator_adv_loss(sf)
                        + w.feat_match * feature_matching_loss(ff, fr)
                        + w.stft * self._stft_loss(y_hat, batch["wav"]))

            g_loss, g_grads = jax.value_and_grad(g_loss_fn)(state.g_params)
            return d_loss, g_loss, d_grads, g_grads

        return jax.jit(probe)(state, batch, rng, self.frozen)
