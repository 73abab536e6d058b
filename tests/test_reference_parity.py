"""Golden parity against the ACTUAL reference torch modules.

Round-1 parity tests (test_torch_parity.py) used torch-core proxies; these
import `/root/reference/ttts` itself (via tests/ref_stubs.py) and assert that
xtts_tpu modules + the utils.convert weight mappings reproduce the reference
math on shared random weights. Fails if either side's model math drifts.

Covered here:
* mel front-end vs MelSpectrogramFeatures / mel_spectrogram / dvae_wav_to_mel
  (ttts/vocoder/feature_extractors.py:27-121, ttts/vqvae/xtts_dvae.py:28-49)
* DiscreteVAE codes (bit-exact), decode, and training forward losses
  (ttts/vqvae/xtts_dvae.py:202-403)
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from ref_stubs import install_reference_stubs

install_reference_stubs()

import jax
import jax.numpy as jnp

torch.manual_seed(0)

# The reference hard-codes `.cuda()` on a loss placeholder
# (ttts/vqvae/xtts_dvae.py:386); make it a no-op on this CPU-only image.
if not torch.cuda.is_available():
    torch.Tensor.cuda = lambda self, *a, **k: self


# ---------------------------------------------------------------------------
# Mel front-end
# ---------------------------------------------------------------------------

class TestMelParity:
    def _wav(self, n=24000, b=2, seed=0):
        rng = np.random.default_rng(seed)
        return (rng.standard_normal((b, n)) * 0.3).astype(np.float32)

    def test_default_mel_l1(self):
        """MelFrontend default == MelSpectrogramFeatures + safe_log
        (ttts/vocoder/feature_extractors.py:73-99)."""
        from ttts.vocoder.feature_extractors import MelSpectrogramFeatures
        from xtts_tpu.dsp.mel import MelFrontend

        wav = self._wav()
        ref = MelSpectrogramFeatures()(torch.from_numpy(wav)).numpy()
        ours = np.asarray(MelFrontend()(jnp.asarray(wav)))
        assert ours.shape == ref.shape
        l1 = np.abs(ours - ref).mean()
        assert l1 < 1e-4, l1

    def test_same_padding_mel(self):
        from ttts.vocoder.feature_extractors import MelSpectrogramFeatures
        from xtts_tpu.core.config import MelConfig
        from xtts_tpu.dsp.mel import MelFrontend

        wav = self._wav(n=8192, b=1, seed=1)
        ref = MelSpectrogramFeatures(padding="same")(
            torch.from_numpy(wav)).numpy()
        ours = np.asarray(MelFrontend(MelConfig(padding="same"))(jnp.asarray(wav)))
        # "same" trims one trailing frame vs center; compare the overlap
        n = min(ours.shape[-1], ref.shape[-1])
        l1 = np.abs(ours[..., :n] - ref[..., :n]).mean()
        assert l1 < 1e-4, l1

    def test_librosa_variant_mel(self):
        """80-bin slaney/slaney variant (mel_spectrogram,
        feature_extractors.py:27-52) == LIBROSA_MEL_CONFIG front-end."""
        from ttts.vocoder.feature_extractors import mel_spectrogram
        from xtts_tpu.dsp.mel import LIBROSA_MEL_CONFIG, MelFrontend

        wav = self._wav(n=8192, b=1, seed=2)
        ref = mel_spectrogram(torch.from_numpy(wav), 1024, 80, 24000, 256,
                              1024, 0, 8000, center=False).numpy()
        ours = np.asarray(MelFrontend(LIBROSA_MEL_CONFIG)(jnp.asarray(wav)))
        n = min(ours.shape[-1], ref.shape[-1])
        l1 = np.abs(ours[..., :n] - ref[..., :n]).mean()
        assert l1 < 1e-4, l1

    def test_dvae_wav_to_mel(self):
        """Legacy tortoise mel (ttts/vqvae/xtts_dvae.py:28-49): 22.05 kHz,
        80 bins, power 2, HTK scale + slaney NORM (torchaudio defaults with
        norm='slaney')."""
        from ttts.vqvae.xtts_dvae import dvae_wav_to_mel
        from xtts_tpu.core.config import MelConfig
        from xtts_tpu.dsp.mel import MelFrontend

        from xtts_tpu.dsp.mel import LEGACY_TORTOISE_MEL_CONFIG

        wav = self._wav(n=22050, b=1, seed=3)
        ref = dvae_wav_to_mel(torch.from_numpy(wav),
                              mel_norms=torch.ones(80)).numpy()
        ours = np.asarray(MelFrontend(LEGACY_TORTOISE_MEL_CONFIG)(jnp.asarray(wav)))
        l1 = np.abs(ours - ref).mean()
        assert l1 < 1e-4, l1


# ---------------------------------------------------------------------------
# DiscreteVAE
# ---------------------------------------------------------------------------

TINY_DVAE = dict(channels=16, hidden_dim=16, codebook_dim=24, num_tokens=96,
                 num_layers=2, num_resnet_blocks=3, kernel_size=3, stride=2)


@pytest.fixture(scope="module")
def dvae_pair():
    from ttts.vqvae.xtts_dvae import DiscreteVAE
    from xtts_tpu.core.config import DVAEConfig
    from xtts_tpu.models.dvae import DVAE
    from xtts_tpu.utils.convert import dvae_from_reference, to_jax

    torch.manual_seed(7)
    ref = DiscreteVAE(
        positional_dims=1, num_tokens=TINY_DVAE["num_tokens"],
        codebook_dim=TINY_DVAE["codebook_dim"],
        num_layers=TINY_DVAE["num_layers"],
        num_resnet_blocks=TINY_DVAE["num_resnet_blocks"],
        hidden_dim=TINY_DVAE["hidden_dim"], channels=TINY_DVAE["channels"],
        stride=2, kernel_size=3, use_transposed_convs=False,
        activation="relu", smooth_l1_loss=True, ssim_loss_weight=0.5,
    ).eval()
    sd = ref.state_dict()
    variables = to_jax(dvae_from_reference(
        sd, TINY_DVAE["num_layers"], TINY_DVAE["num_resnet_blocks"]))
    cfg = DVAEConfig(
        channels=TINY_DVAE["channels"], num_tokens=TINY_DVAE["num_tokens"],
        hidden_dim=TINY_DVAE["hidden_dim"],
        codebook_dim=TINY_DVAE["codebook_dim"],
        num_layers=TINY_DVAE["num_layers"],
        num_resnet_blocks=TINY_DVAE["num_resnet_blocks"], kernel_size=3)
    ours = DVAE(cfg)
    return ref, ours, variables


class TestDVAEParity:
    def _mel(self, b=2, t=40, seed=0):
        rng = np.random.default_rng(seed)
        return rng.standard_normal((b, TINY_DVAE["channels"], t)).astype(np.float32)

    def test_codes_bit_exact(self, dvae_pair):
        """get_codebook_indices (xtts_dvae.py:327-334) — bit-exact codes is
        the BASELINE.md north star."""
        ref, ours, variables = dvae_pair
        mel = self._mel()
        with torch.no_grad():
            want = ref.get_codebook_indices(torch.from_numpy(mel)).numpy()
        got = np.asarray(ours.apply(variables, jnp.asarray(mel),
                                    method=ours.get_codebook_indices))
        np.testing.assert_array_equal(got, want)

    def test_decode_parity(self, dvae_pair):
        """decode (xtts_dvae.py:336-355): codes -> (mel, penult)."""
        ref, ours, variables = dvae_pair
        rng = np.random.default_rng(1)
        codes = rng.integers(0, TINY_DVAE["num_tokens"], (2, 10)).astype(np.int32)
        with torch.no_grad():
            want, want_pen = ref.decode(torch.from_numpy(codes).long())
        got, got_pen = ours.apply(variables, jnp.asarray(codes),
                                  method=ours.decode)
        np.testing.assert_allclose(np.asarray(got), want.numpy(),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(got_pen), want_pen.numpy(),
                                   rtol=1e-4, atol=1e-5)

    def test_training_forward_losses(self, dvae_pair):
        """Training forward (xtts_dvae.py:366-390): recon/ssim/commitment
        losses and recon mel agree."""
        ref, ours, variables = dvae_pair
        mel = self._mel(seed=2)
        ref.train()
        # snapshot EMA buffers: ref.forward mutates them in training mode
        sd0 = {k: v.clone() for k, v in ref.state_dict().items()}
        with torch.no_grad():
            r_recon, r_ssim, r_commit, r_out = ref(torch.from_numpy(mel))
        ref.load_state_dict(sd0)
        ref.eval()

        recon, ssim_l, commit, out, _ = ours.apply(
            variables, jnp.asarray(mel), train=True)
        np.testing.assert_allclose(float(recon), float(r_recon), rtol=1e-4)
        np.testing.assert_allclose(float(ssim_l), float(r_ssim), rtol=1e-3)
        np.testing.assert_allclose(float(commit), float(r_commit), rtol=1e-4)
        np.testing.assert_allclose(np.asarray(out), r_out.numpy(),
                                   rtol=1e-3, atol=1e-4)

    def test_ema_update_matches_reference(self, dvae_pair):
        """One training forward's EMA codebook update (xtts_dvae.py:104-117)
        == quantize() stats + ema_codebook_update()."""
        from xtts_tpu.models.dvae import CodebookState, ema_codebook_update

        ref, ours, variables = dvae_pair
        mel = self._mel(seed=3)
        sd0 = {k: v.clone() for k, v in ref.state_dict().items()}
        ref.train()
        with torch.no_grad():
            ref(torch.from_numpy(mel))
        want = {k: v.clone() for k, v in ref.state_dict().items()
                if k.startswith("codebook.")}
        ref.load_state_dict(sd0)
        ref.eval()

        *_, (onehot_sum, embed_sum) = ours.apply(
            variables, jnp.asarray(mel), train=True)
        cb = CodebookState(**{k: jnp.asarray(v)
                              for k, v in variables["codebook"].items()})
        new = ema_codebook_update(cb, onehot_sum, embed_sum)
        np.testing.assert_allclose(np.asarray(new.cluster_size),
                                   want["codebook.cluster_size"].numpy(),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(new.embed_avg),
                                   want["codebook.embed_avg"].numpy(),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(new.embed),
                                   want["codebook.embed"].numpy(),
                                   rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# UnifiedVoice GPT
# ---------------------------------------------------------------------------

TINY_GPT = dict(layers=2, model_dim=64, heads=4, max_text_tokens=30,
                max_mel_tokens=40, number_text_tokens=20, start_text_token=19,
                stop_text_token=1, number_mel_codes=50, start_mel_token=48,
                stop_mel_token=49)


@pytest.fixture(scope="module")
def gpt_pair():
    from ttts.gpt.model import UnifiedVoice as RefUV
    from xtts_tpu.core.config import GPTConfig
    from xtts_tpu.models.gpt import UnifiedVoice
    from xtts_tpu.utils.convert import to_jax, unified_voice_from_reference

    torch.manual_seed(11)
    ref = RefUV(checkpointing=False, use_perceiver=False, **TINY_GPT).eval()
    sd = ref.state_dict()
    params = to_jax(unified_voice_from_reference(sd, TINY_GPT["layers"]))
    cfg = GPTConfig(**TINY_GPT)
    ours = UnifiedVoice(cfg)
    return ref, ours, {"params": params}, cfg


class TestUnifiedVoiceParity:
    def _inputs(self, seed=0, b=2, tc=24, tt=9, tm=12):
        rng = np.random.default_rng(seed)
        cond = rng.standard_normal((b, 100, tc)).astype(np.float32) * 0.5
        text = rng.integers(2, TINY_GPT["number_text_tokens"] - 1, (b, tt))
        text_lens = np.array([tt, tt - 3])
        codes = rng.integers(0, 47, (b, tm))
        wav_lens = np.array([tm * 1024 - 1536, (tm - 2) * 1024 - 1536])
        return cond, text.astype(np.int64), text_lens, codes.astype(np.int64), wav_lens

    def test_conditioning_parity(self, gpt_pair):
        """get_conditioning (ttts/gpt/model.py:463-476)."""
        ref, ours, variables, cfg = gpt_pair
        cond, *_ = self._inputs()
        with torch.no_grad():
            want = ref.get_conditioning(torch.from_numpy(cond)).numpy()
        got = np.asarray(ours.apply(variables, jnp.asarray(cond),
                                    method=ours.get_conditioning))[:, 0]
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_teacher_forced_losses_and_logits(self, gpt_pair):
        """Training forward (ttts/gpt/model.py:478-557): dual CE + mel logits."""
        ref, ours, variables, cfg = gpt_pair
        cond, text, text_lens, codes, wav_lens = self._inputs(seed=1)
        with torch.no_grad():
            r_lt, r_lm, r_logits = ref(
                torch.from_numpy(cond), torch.from_numpy(text),
                torch.from_numpy(text_lens), torch.from_numpy(codes),
                torch.from_numpy(wav_lens))
        lt, lm, logits = ours.apply(
            variables, jnp.asarray(cond), jnp.asarray(text),
            jnp.asarray(text_lens), jnp.asarray(codes), jnp.asarray(wav_lens),
            return_logits=True)
        np.testing.assert_allclose(float(lt), float(r_lt), rtol=2e-4)
        np.testing.assert_allclose(float(lm), float(r_lm), rtol=2e-4)
        # ref logits are (B, V, T); ours (B, T, V)
        np.testing.assert_allclose(np.asarray(logits),
                                   r_logits.numpy().transpose(0, 2, 1),
                                   rtol=1e-3, atol=2e-4)

    def test_return_latent(self, gpt_pair):
        """return_latent path feeding the diffusion decoder
        (ttts/gpt/model.py:536-538)."""
        ref, ours, variables, cfg = gpt_pair
        cond, text, text_lens, codes, wav_lens = self._inputs(seed=2)
        with torch.no_grad():
            want = ref(torch.from_numpy(cond), torch.from_numpy(text),
                       torch.from_numpy(text_lens), torch.from_numpy(codes),
                       torch.from_numpy(wav_lens), return_latent=True).numpy()
        got = np.asarray(ours.apply(
            variables, jnp.asarray(cond), jnp.asarray(text),
            jnp.asarray(text_lens), jnp.asarray(codes), jnp.asarray(wav_lens),
            return_latent=True))
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=2e-4)

    def test_multi_clip_conditioning_parity(self, gpt_pair):
        """Stacked multi-voice-sample conditioning (B, n, mel, T): per-clip
        encoder outputs averaged (ttts/api.py:225-240 stacks on dim 1,
        ttts/gpt/model.py:466-475 loops + mean)."""
        ref, ours, variables, cfg = gpt_pair
        rng = np.random.default_rng(9)
        stacked = rng.standard_normal((2, 3, 100, 24)).astype(np.float32) * 0.5
        with torch.no_grad():
            want = ref.get_conditioning(torch.from_numpy(stacked)).numpy()
        got = np.asarray(ours.apply(variables, jnp.asarray(stacked),
                                    method=ours.get_conditioning))[:, 0]
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_greedy_decode_token_parity(self, gpt_pair):
        """inference_speech greedy (HF generate, kv_cache) vs our
        while_loop decode (ttts/gpt/model.py:559-591) — token-for-token."""
        from xtts_tpu.models.gpt_infer import generate_speech

        from ref_stubs import patch_reference_generate

        patch_reference_generate()
        ref, ours, variables, cfg = gpt_pair
        ref.post_init_gpt2_config(use_deepspeed=False, kv_cache=True, half=False)
        cond, text, *_ = self._inputs(seed=3, b=2, tt=7)
        max_gen = 12
        with torch.no_grad():
            want = ref.inference_speech(
                torch.from_numpy(cond), torch.from_numpy(text),
                do_sample=False, num_return_sequences=1,
                max_generate_length=max_gen).numpy()
        res = generate_speech(
            ours, variables, jnp.asarray(cond), jnp.asarray(text),
            jax.random.PRNGKey(0), max_gen=max_gen, do_sample=False,
            repetition_penalty=1.0, cache_dtype=jnp.float32)
        got = np.asarray(res.codes)
        # HF pads finished rows with pad=stop token; compare the overlap
        n = min(got.shape[1], want.shape[1])
        np.testing.assert_array_equal(got[:, :n], want[:, :n])


# ---------------------------------------------------------------------------
# UnifiedVoice with PerceiverResampler conditioning (use_perceiver=True)
# ---------------------------------------------------------------------------

# max_conditioning_inputs=32 sizes the mel position table for the perceiver
# fake-input quirk (positions reach n_cond+1+t, ttts/gpt/model.py:574+147)
TINY_GPT_PERC = dict(TINY_GPT, max_conditioning_inputs=32)


@pytest.fixture(scope="module")
def gpt_perceiver_pair():
    from ttts.gpt.model import UnifiedVoice as RefUV
    from xtts_tpu.core.config import GPTConfig
    from xtts_tpu.models.gpt import UnifiedVoice
    from xtts_tpu.utils.convert import to_jax, unified_voice_from_reference

    torch.manual_seed(21)
    ref = RefUV(checkpointing=False, use_perceiver=True, **TINY_GPT_PERC).eval()
    sd = ref.state_dict()
    params = to_jax(unified_voice_from_reference(
        sd, TINY_GPT_PERC["layers"], use_perceiver=True))
    cfg = GPTConfig(use_perceiver=True, **TINY_GPT_PERC)
    ours = UnifiedVoice(cfg)
    return ref, ours, {"params": params}, cfg


class TestUnifiedVoicePerceiverParity:
    """use_perceiver=True coverage (ttts/gpt/perceiver.py:225-318 +
    ttts/gpt/model.py:334-338,463-476): 32-latent conditioning, teacher-forced
    losses/logits/latent, and token-exact greedy decode through the
    n_cond=32 fake-input position quirk."""

    _inputs = TestUnifiedVoiceParity._inputs

    def test_conditioning_parity(self, gpt_perceiver_pair):
        ref, ours, variables, cfg = gpt_perceiver_pair
        cond, *_ = self._inputs()
        with torch.no_grad():
            want = ref.get_conditioning(torch.from_numpy(cond)).numpy()
        got = np.asarray(ours.apply(variables, jnp.asarray(cond),
                                    method=ours.get_conditioning))
        assert got.shape == (cond.shape[0], 32, TINY_GPT["model_dim"])
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_teacher_forced_losses_logits_latent(self, gpt_perceiver_pair):
        ref, ours, variables, cfg = gpt_perceiver_pair
        cond, text, text_lens, codes, wav_lens = self._inputs(seed=4)
        with torch.no_grad():
            r_lt, r_lm, r_logits = ref(
                torch.from_numpy(cond), torch.from_numpy(text),
                torch.from_numpy(text_lens), torch.from_numpy(codes),
                torch.from_numpy(wav_lens))
            r_latent = ref(
                torch.from_numpy(cond), torch.from_numpy(text),
                torch.from_numpy(text_lens), torch.from_numpy(codes),
                torch.from_numpy(wav_lens), return_latent=True).numpy()
        lt, lm, logits = ours.apply(
            variables, jnp.asarray(cond), jnp.asarray(text),
            jnp.asarray(text_lens), jnp.asarray(codes), jnp.asarray(wav_lens),
            return_logits=True)
        np.testing.assert_allclose(float(lt), float(r_lt), rtol=2e-4)
        np.testing.assert_allclose(float(lm), float(r_lm), rtol=2e-4)
        np.testing.assert_allclose(np.asarray(logits),
                                   r_logits.numpy().transpose(0, 2, 1),
                                   rtol=1e-3, atol=2e-4)
        got_latent = np.asarray(ours.apply(
            variables, jnp.asarray(cond), jnp.asarray(text),
            jnp.asarray(text_lens), jnp.asarray(codes), jnp.asarray(wav_lens),
            return_latent=True))
        np.testing.assert_allclose(got_latent, r_latent, rtol=1e-3, atol=2e-4)

    def test_greedy_decode_token_parity(self, gpt_perceiver_pair):
        from xtts_tpu.models.gpt_infer import generate_speech

        from ref_stubs import patch_reference_generate

        patch_reference_generate()
        ref, ours, variables, cfg = gpt_perceiver_pair
        ref.post_init_gpt2_config(use_deepspeed=False, kv_cache=True, half=False)
        cond, text, *_ = self._inputs(seed=5, b=2, tt=7)
        max_gen = 12
        with torch.no_grad():
            want = ref.inference_speech(
                torch.from_numpy(cond), torch.from_numpy(text),
                do_sample=False, num_return_sequences=1,
                max_generate_length=max_gen).numpy()
        res = generate_speech(
            ours, variables, jnp.asarray(cond), jnp.asarray(text),
            jax.random.PRNGKey(0), max_gen=max_gen, do_sample=False,
            repetition_penalty=1.0, cache_dtype=jnp.float32)
        got = np.asarray(res.codes)
        n = min(got.shape[1], want.shape[1])
        np.testing.assert_array_equal(got[:, :n], want[:, :n])


# ---------------------------------------------------------------------------
# AA_diffusion
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def aa_pair():
    from ttts.diffusion.aa_model import AA_diffusion as RefAA
    from xtts_tpu.core.config import CLIPRefConfig, DiffusionModelConfig
    from xtts_tpu.models.aa_diffusion import AADiffusion
    from xtts_tpu.utils.convert import aa_diffusion_from_reference, to_jax

    torch.manual_seed(5)
    # tiny but structure-identical to ttts/diffusion/config.yaml; 128ch keeps
    # every GroupNorm at 32 groups on both sides (tortoise rule == fixed 32)
    vision = dict(layers=2, width=64, head_width=16, mlp_ratio=4.0,
                  patch_dropout=0.4, attentional_pool=False, patch_size=8,
                  image_size=256, in_channels=16, pool_type="tok",
                  pos_embed_type="learnable", final_ln_after_pool=False)
    unet = dict(in_channels=16, out_channels=32, model_channels=128,
                attention_resolutions=[4, 2, 1], num_res_blocks=2,
                channel_mult=[1, 1], num_heads=4, use_spatial_transformer=True,
                transformer_depth=1, context_dim=64, use_checkpoint=False,
                dims=1, legacy=False)
    ref = RefAA({"clip": {"embed_dim": 64, "vision_cfg": vision},
                 "refer_diffusion": unet, "base_diffusion": unet}).eval()
    # the live latent dim is hardcoded 1024 in the reference
    # (hint_converter / unconditioned_cat_embedding, aa_model.py:233,318);
    # shrink both for the tiny test
    ref.base_model.hint_converter = torch.nn.Conv1d(48, 128, 3, padding=1)
    ref.unconditioned_cat_embedding = torch.nn.Parameter(torch.randn(1, 48, 1))
    torch.manual_seed(6)

    cfg = DiffusionModelConfig(
        in_channels=16, out_channels=32, model_channels=128,
        num_res_blocks=2, channel_mult=(1, 1), num_heads=4,
        transformer_depth=1, context_dim=64, in_latent_channels=48,
        clip=CLIPRefConfig(embed_dim=64, width=64, layers=2, head_width=16,
                           patch_size=8, in_channels=16, max_patches=(256 // 8) ** 2))
    params = to_jax(aa_diffusion_from_reference(ref.state_dict(), cfg))
    ours = AADiffusion(cfg)
    return ref, ours, {"params": params}


class TestAADiffusionParity:
    def _inputs(self, seed=0, b=2, tx=24, tl=6, tr=32):
        rng = np.random.default_rng(seed)
        x = rng.standard_normal((b, 16, tx)).astype(np.float32)
        t = np.array([37, 512][:b])
        hint = rng.standard_normal((b, 48, tl)).astype(np.float32)
        refer = rng.standard_normal((b, 16, tr)).astype(np.float32)
        return x, t, hint, refer

    def test_clip_context_parity(self, aa_pair):
        """CLIP reference encoder (cond_emb.py:177-180, normalized tokens)."""
        ref, ours, variables = aa_pair
        *_, refer = self._inputs()
        with torch.no_grad():
            want = ref.refer_enc(torch.from_numpy(refer)).numpy()
        got = np.asarray(ours.apply(variables, jnp.asarray(refer),
                                    method=ours.encode_reference))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=3e-5)

    def test_eps_parity(self, aa_pair):
        """Full forward (aa_model.py:329-339): eps + learned-range var."""
        ref, ours, variables = aa_pair
        x, t, hint, refer = self._inputs(seed=1)
        with torch.no_grad():
            want = ref(torch.from_numpy(x), torch.from_numpy(t),
                       torch.from_numpy(hint), torch.from_numpy(refer)).numpy()
        got = np.asarray(ours.apply(
            variables, jnp.asarray(x), jnp.asarray(t), jnp.asarray(hint),
            jnp.asarray(refer)))
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)

    def test_conditioning_free_parity(self, aa_pair):
        """CFG uncond branch replaces the hint (aa_model.py:330-331)."""
        ref, ours, variables = aa_pair
        x, t, hint, refer = self._inputs(seed=2)
        with torch.no_grad():
            want = ref(torch.from_numpy(x), torch.from_numpy(t),
                       torch.from_numpy(hint), torch.from_numpy(refer),
                       conditioning_free=True).numpy()
        got = np.asarray(ours.apply(
            variables, jnp.asarray(x), jnp.asarray(t), jnp.asarray(hint),
            jnp.asarray(refer), conditioning_free=True))
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


# ---------------------------------------------------------------------------
# Gaussian diffusion process library
# ---------------------------------------------------------------------------

class _FakeTorchDenoiser(torch.nn.Module):
    """Deterministic stand-in denoiser shared (in math) with the jax twin.
    An nn.Module because the reference sample loops probe .parameters()."""

    def __init__(self):
        super().__init__()
        self._dummy = torch.nn.Parameter(torch.zeros(1))

    def forward(self, x, t, conditioning_free=False):
        scale = 0.5 if conditioning_free else 1.0
        eps = 0.1 * torch.sin(x) * scale + (t.float() / 1000.0)[:, None, None]
        var = torch.tanh(x)
        return torch.cat([eps, var], dim=1)


_fake_model_torch = _FakeTorchDenoiser()


def _fake_model_jax(x, t, conditioning_free=False):
    import jax.numpy as jnp
    scale = 0.5 if conditioning_free else 1.0
    eps = 0.1 * jnp.sin(x) * scale + (t.astype(jnp.float32) / 1000.0)[:, None, None]
    var = jnp.tanh(x)
    return jnp.concatenate([eps, var], axis=1)


@pytest.fixture(scope="module")
def diffusion_pair():
    from ttts.utils.diffusion import (SpacedDiffusion, get_named_beta_schedule,
                                      space_timesteps)
    from xtts_tpu.diffusion.gaussian import GaussianDiffusion

    ref = SpacedDiffusion(
        use_timesteps=space_timesteps(1000, [50]),
        model_mean_type="epsilon", model_var_type="learned_range",
        loss_type="mse", betas=get_named_beta_schedule("linear", 1000),
        conditioning_free=True, conditioning_free_k=2.0)
    ours = GaussianDiffusion.spaced(1000, 50, "linear",
                                    conditioning_free=True,
                                    conditioning_free_k=2.0)
    return ref, ours


class TestDiffusionLibParity:
    def test_schedule_constants(self, diffusion_pair):
        """Spaced betas/posterior algebra (diffusion.py:1181-1196, 162-242)."""
        ref, ours = diffusion_pair
        np.testing.assert_allclose(ours.betas, ref.betas, rtol=1e-12)
        np.testing.assert_array_equal(ours.timestep_map, ref.timestep_map)
        np.testing.assert_allclose(ours.posterior_log_variance_clipped,
                                   ref.posterior_log_variance_clipped,
                                   rtol=1e-10)
        np.testing.assert_allclose(ours.posterior_mean_coef1,
                                   ref.posterior_mean_coef1, rtol=1e-10)

    def test_q_sample(self, diffusion_pair):
        ref, ours = diffusion_pair
        rng = np.random.default_rng(0)
        x0 = rng.standard_normal((2, 4, 8)).astype(np.float32)
        noise = rng.standard_normal((2, 4, 8)).astype(np.float32)
        t = np.array([3, 47])
        want = ref.q_sample(torch.from_numpy(x0), torch.from_numpy(t),
                            torch.from_numpy(noise)).numpy()
        got = np.asarray(ours.q_sample(jnp.asarray(x0), jnp.asarray(t),
                                       jnp.asarray(noise)))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    @pytest.mark.parametrize("t_idx", [0, 1, 25, 49])
    def test_p_mean_variance_with_cfg_ramp(self, diffusion_pair, t_idx):
        """p_mean_variance terms incl. learned-range split + ramped CFG mix
        (diffusion.py:284-386)."""
        ref, ours = diffusion_pair
        rng = np.random.default_rng(t_idx)
        x = rng.standard_normal((1, 4, 8)).astype(np.float32)
        t = np.array([t_idx])
        with torch.no_grad():
            want = ref.p_mean_variance(_fake_model_torch, torch.from_numpy(x),
                                       torch.from_numpy(t), model_kwargs={})
        t_orig = ours.map_t(jnp.asarray(t))
        out = _fake_model_jax(jnp.asarray(x), t_orig)
        out_uc = _fake_model_jax(jnp.asarray(x), t_orig, conditioning_free=True)
        got = ours.p_mean_variance_from_output(out, jnp.asarray(x),
                                               jnp.asarray(t), out_uc)
        for k in ("mean", "log_variance", "pred_xstart"):
            np.testing.assert_allclose(np.asarray(got[k]), want[k].numpy(),
                                       rtol=1e-4, atol=1e-5, err_msg=k)

    def test_training_losses(self):
        """Unspaced 1000-step training losses: mse + frozen-mean vb
        (diffusion.py:930-1014)."""
        from ttts.utils.diffusion import (GaussianDiffusion as RefGD,
                                          get_named_beta_schedule)
        from xtts_tpu.diffusion.gaussian import GaussianDiffusion

        ref = RefGD(betas=get_named_beta_schedule("linear", 1000),
                    model_mean_type="epsilon", model_var_type="learned_range",
                    loss_type="mse")
        ours = GaussianDiffusion(betas=get_named_beta_schedule("linear", 1000))
        rng = np.random.default_rng(1)
        x0 = rng.standard_normal((3, 4, 8)).astype(np.float32)
        noise = rng.standard_normal((3, 4, 8)).astype(np.float32)
        t = np.array([0, 250, 999])
        with torch.no_grad():
            want = ref.training_losses(_fake_model_torch, torch.from_numpy(x0),
                                       torch.from_numpy(t), model_kwargs={},
                                       noise=torch.from_numpy(noise))
        got = ours.training_losses(_fake_model_jax, jnp.asarray(x0),
                                   jnp.asarray(t), noise=jnp.asarray(noise))
        np.testing.assert_allclose(np.asarray(got["mse"]),
                                   want["mse"].numpy(), rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(np.asarray(got["vb"]),
                                   want["vb"].numpy(), rtol=1e-3, atol=1e-5)
        np.testing.assert_allclose(np.asarray(got["loss"]),
                                   want["loss"].numpy(), rtol=1e-4, atol=1e-5)

    def test_ddim_loop_deterministic_parity(self, diffusion_pair):
        """Full 50-step DDIM (eta=0) chain from a shared x_T
        (diffusion.py:744-902) — end-to-end sampler parity."""
        ref, ours = diffusion_pair
        rng = np.random.default_rng(2)
        xt = rng.standard_normal((1, 4, 8)).astype(np.float32)
        with torch.no_grad():
            want = ref.ddim_sample_loop(
                _fake_model_torch, (1, 4, 8), noise=torch.from_numpy(xt),
                model_kwargs={}, eta=0.0).numpy()
        got = np.asarray(ours.ddim_sample_loop(
            lambda x, t: (_fake_model_jax(x, t),
                          _fake_model_jax(x, t, conditioning_free=True)),
            (1, 4, 8), jax.random.PRNGKey(0), noise=jnp.asarray(xt)))
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)

    def test_p_sample_loop_deterministic_parity(self, diffusion_pair):
        """p_sample chain with the noise forced to zero on both sides —
        validates every per-step mean/variance (diffusion.py:654-743)."""
        ref, ours = diffusion_pair
        rng = np.random.default_rng(3)
        xt = rng.standard_normal((1, 4, 8)).astype(np.float32)

        x = torch.from_numpy(xt)
        with torch.no_grad():
            for i in reversed(range(50)):
                t = torch.tensor([i])
                pmv = ref.p_mean_variance(_fake_model_torch, x, t,
                                          model_kwargs={})
                x = pmv["mean"]  # zero-noise ancestral step
        want = x.numpy()

        import xtts_tpu.diffusion.gaussian as G
        orig = jax.random.normal
        try:
            jax.random.normal = lambda key, shape, *a, **k: jnp.zeros(shape)
            got = np.asarray(ours.p_sample_loop(
                lambda x, t: (_fake_model_jax(x, t),
                              _fake_model_jax(x, t, conditioning_free=True)),
                (1, 4, 8), jax.random.PRNGKey(0), noise=jnp.asarray(xt)))
        finally:
            jax.random.normal = orig
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)

    def test_dpmpp_2m_update_formula(self):
        """The second-order multistep update ours uses (gaussian.py
        dpmpp_2m_sample_loop body) == the reference
        multistep_dpm_solver_second_update (ttts/sampler/dpm_solver.py,
        dpmsolver++ data-prediction). Grid/endpoint policy deliberately
        differs (ours fully denoises on the spaced grid; the reference's
        k-diffusion path stops at t=1/N on a continuous-VP approximation)."""
        from ttts.sampler.dpm_solver import DPM_Solver, NoiseScheduleVP
        from ttts.utils.diffusion import get_named_beta_schedule

        betas = get_named_beta_schedule("linear", 1000)
        ns = NoiseScheduleVP(schedule="discrete", betas=torch.tensor(betas))
        solver = DPM_Solver(lambda x, t: x, ns, algorithm_type="dpmsolver++")
        rng = np.random.default_rng(0)
        x = torch.from_numpy(rng.standard_normal((1, 4, 8)).astype(np.float32))
        m0 = torch.from_numpy(rng.standard_normal((1, 4, 8)).astype(np.float32))
        m1 = torch.from_numpy(rng.standard_normal((1, 4, 8)).astype(np.float32))
        for (a, b, c) in [(0.8, 0.6, 0.4), (0.9, 0.5, 0.3), (0.5, 0.25, 0.1)]:
            s1, s0, t = torch.tensor([a]), torch.tensor([b]), torch.tensor([c])
            want = solver.multistep_dpm_solver_second_update(
                x, [m1, m0], [s1, s0], t)
            lam, al, sg = (ns.marginal_lambda, ns.marginal_alpha,
                           ns.marginal_std)
            h = lam(t) - lam(s0)
            r = (lam(s0) - lam(s1)) / h
            d = (1 + 1 / (2 * r)) * m0 - (1 / (2 * r)) * m1
            got = (sg(t) / sg(s0)) * x - al(t) * torch.expm1(-h) * d
            np.testing.assert_allclose(got.numpy(), want.numpy(),
                                       rtol=1e-5, atol=1e-6)


# ---------------------------------------------------------------------------
# Vocos
# ---------------------------------------------------------------------------

class TestVocosParity:
    def test_decode_parity(self):
        """Backbone + ISTFT head vs the real reference modules
        (ttts/vocoder/models.py:26-88, heads.py:24-67) through the
        vocos_from_pretrained converter."""
        from ttts.vocoder.heads import ISTFTHead as RefHead
        from ttts.vocoder.models import VocosBackbone as RefBackbone
        from xtts_tpu.core.config import VocosConfig
        from xtts_tpu.models.vocos import Vocos
        from xtts_tpu.utils.convert import to_jax, vocos_from_pretrained

        torch.manual_seed(3)
        bb = RefBackbone(input_channels=12, dim=32, intermediate_dim=96,
                         num_layers=2).eval()
        head = RefHead(dim=32, n_fft=64, hop_length=16, padding="same").eval()
        sd = {f"backbone.{k}": v for k, v in bb.state_dict().items()}
        sd.update({f"head.{k}": v for k, v in head.state_dict().items()})

        cfg = VocosConfig(input_channels=12, dim=32, intermediate_dim=96,
                          num_layers=2, n_fft=64, hop_length=16,
                          padding="same")
        ours = Vocos(cfg)
        params = to_jax(vocos_from_pretrained(sd, num_layers=2))

        rng = np.random.default_rng(0)
        mel = rng.standard_normal((2, 12, 20)).astype(np.float32)
        with torch.no_grad():
            want = head(bb(torch.from_numpy(mel))).numpy()
        got = np.asarray(ours.apply({"params": params}, jnp.asarray(mel)))
        n = min(got.shape[-1], want.shape[-1])
        np.testing.assert_allclose(got[:, :n], want[:, :n],
                                   rtol=1e-3, atol=1e-4)

    def test_mdct_imdct_primitives(self):
        """Matmul MDCT/IMDCT vs the reference FFT-twiddle modules
        (ttts/vocoder/spectral_ops.py:78-191), both paddings."""
        from ttts.vocoder.spectral_ops import IMDCT as RefIMDCT
        from ttts.vocoder.spectral_ops import MDCT as RefMDCT
        from xtts_tpu.dsp.spectral import imdct, mdct

        rng = np.random.default_rng(5)
        for n, pad in [(64, "same"), (64, "center"), (32, "same")]:
            x = rng.standard_normal((2, 512)).astype(np.float32)
            with torch.no_grad():
                want_c = RefMDCT(frame_len=n, padding=pad)(
                    torch.from_numpy(x)).numpy()
            got_c = np.asarray(mdct(jnp.asarray(x), n, pad))
            np.testing.assert_allclose(got_c, want_c, atol=1e-4)
            c = rng.standard_normal(want_c.shape).astype(np.float32)
            with torch.no_grad():
                want_y = RefIMDCT(frame_len=n, padding=pad)(
                    torch.from_numpy(c)).numpy()
            got_y = np.asarray(imdct(jnp.asarray(c), n, pad))
            np.testing.assert_allclose(got_y, want_y, atol=1e-4)

    def test_imdct_heads_parity(self):
        """IMDCTSymExpHead / IMDCTCosHead vs the reference heads
        (ttts/vocoder/heads.py:70-157) on converted weights."""
        from ttts.vocoder.heads import IMDCTCosHead as RefCos
        from ttts.vocoder.heads import IMDCTSymExpHead as RefSym
        from xtts_tpu.core.config import VocosConfig
        from xtts_tpu.models.vocos import IMDCTCosHead, IMDCTSymExpHead
        from xtts_tpu.utils.convert import linear, to_jax

        torch.manual_seed(7)
        rng = np.random.default_rng(7)
        x = rng.standard_normal((2, 12, 32)).astype(np.float32)  # (B, L, H)
        for RefCls, Cls, head in [(RefSym, IMDCTSymExpHead, "imdct_symexp"),
                                  (RefCos, IMDCTCosHead, "imdct_cos")]:
            ref = RefCls(dim=32, mdct_frame_len=64, padding="same").eval()
            with torch.no_grad():
                want = ref(torch.from_numpy(x)).numpy()
            cfg = VocosConfig(dim=32, mdct_frame_len=64, padding="same",
                              head=head)
            params = to_jax({"out": linear(ref.state_dict(), "out")})
            got = np.asarray(Cls(cfg).apply({"params": params},
                                            jnp.asarray(x)))
            assert got.shape == want.shape
            np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)

    def test_imdct_symexp_mel_init_scale(self):
        """sample_rate-conditioned init: our kernel columns carry the same
        1 - f/f_max mel-grid scale the reference multiplies into the torch
        weight rows (ttts/vocoder/heads.py:94-101)."""
        from xtts_tpu.core.config import VocosConfig
        from xtts_tpu.models.vocos import (IMDCTSymExpHead,
                                           _mel_perceptual_scale)

        cfg = VocosConfig(dim=16, mdct_frame_len=32, head="imdct_symexp",
                          head_sample_rate=24000)
        v = IMDCTSymExpHead(cfg).init(jax.random.PRNGKey(0),
                                      jnp.zeros((1, 4, 16)))
        k = np.asarray(v["params"]["out"]["kernel"])     # (in, out)
        scale = _mel_perceptual_scale(24000, 16)
        # column norms must follow the scale profile: zero where scale is 0
        norms = np.linalg.norm(k, axis=0)
        assert norms[-1] == 0.0 and norms[0] > 0
        ratio = norms[1:-1] / scale[1:-1]
        assert ratio.std() / ratio.mean() < 0.5  # same profile, noisy init


# ---------------------------------------------------------------------------
# CLVP (live use_xformers=False tower)
# ---------------------------------------------------------------------------

class TestCLVPParity:
    def test_similarity_and_loss(self):
        """Similarity logits + symmetric InfoNCE vs the reference CLVP
        (ttts/clvp/model.py:101-140, live tortoise tower)."""
        from ttts.clvp.model import CLVP as RefCLVP
        from xtts_tpu.core.config import CLVPConfig
        from xtts_tpu.models.clvp import CLVP
        from xtts_tpu.utils.convert import clvp_from_reference, to_jax

        torch.manual_seed(9)
        ref = RefCLVP(dim_text=32, dim_speech=32, dim_latent=24,
                      num_text_tokens=40, text_enc_depth=2, text_seq_len=30,
                      text_heads=2, num_speech_tokens=50, speech_enc_depth=2,
                      speech_heads=2, speech_seq_len=40,
                      use_xformers=False).eval()
        cfg = CLVPConfig(dim_text=32, dim_speech=32, dim_latent=24,
                         num_text_tokens=40, text_enc_depth=2,
                         text_seq_len=30, text_heads=2, num_speech_tokens=50,
                         speech_enc_depth=2, speech_heads=2,
                         speech_seq_len=40, use_xformers=False)
        ours = CLVP(cfg)
        params = to_jax(clvp_from_reference(ref.state_dict(), 2, 2))

        rng = np.random.default_rng(0)
        text = rng.integers(0, 40, (3, 11))
        codes = rng.integers(0, 50, (3, 17))
        with torch.no_grad():
            want_sim = ref(torch.from_numpy(text), torch.from_numpy(codes),
                           return_loss=False).numpy()
            want_loss = float(ref(torch.from_numpy(text),
                                  torch.from_numpy(codes), return_loss=True))
        got_logits = np.asarray(ours.apply(
            {"params": params}, jnp.asarray(text), jnp.asarray(codes)))
        # reference no-loss path returns only the diagonal n->n similarity
        np.testing.assert_allclose(np.diag(got_logits), want_sim,
                                   rtol=1e-4, atol=1e-5)
        got_loss = float(ours.apply({"params": params}, jnp.asarray(text),
                                    jnp.asarray(codes), return_loss=True))
        np.testing.assert_allclose(got_loss, want_loss, rtol=1e-4)


# ---------------------------------------------------------------------------
# HiFi-GAN (generator + speaker encoder)
# ---------------------------------------------------------------------------

class TestHifiganParity:
    def test_generator_parity(self):
        """MRF generator incl. weight-norm reconstruction and the
        ConvTranspose mapping (hifigan_vocoder.py:223-377)."""
        from ttts.hifigan.hifigan_vocoder import HifiganGenerator as RefGen
        from xtts_tpu.models.hifigan import HifiganGenerator
        from xtts_tpu.utils.convert import (hifigan_generator_from_reference,
                                            to_jax)

        torch.manual_seed(4)
        ref = RefGen(in_channels=12, out_channels=1, resblock_type="1",
                     resblock_dilation_sizes=[[1, 3, 5], [1, 3, 5]],
                     resblock_kernel_sizes=[3, 7],
                     upsample_kernel_sizes=[8, 4],
                     upsample_initial_channel=32,
                     upsample_factors=[4, 2], cond_channels=6,
                     conv_pre_weight_norm=False, conv_post_weight_norm=False,
                     conv_post_bias=False, cond_in_each_up_layer=True).eval()
        ours = HifiganGenerator(
            in_channels=12, out_channels=1, resblock_type="1",
            resblock_dilation_sizes=((1, 3, 5), (1, 3, 5)),
            resblock_kernel_sizes=(3, 7), upsample_kernel_sizes=(8, 4),
            upsample_initial_channel=32, upsample_rates=(4, 2),
            cond_channels=6, cond_in_each_up_layer=True)
        params = to_jax(hifigan_generator_from_reference(
            ref.state_dict(), n_up=2, n_kernels=2))

        rng = np.random.default_rng(0)
        x = rng.standard_normal((2, 12, 30)).astype(np.float32)
        g = rng.standard_normal((2, 6)).astype(np.float32)
        with torch.no_grad():
            want = ref(torch.from_numpy(x),
                       g=torch.from_numpy(g)[..., None]).numpy()[:, 0]
        got = np.asarray(ours.apply(
            {"params": params}, jnp.asarray(x.transpose(0, 2, 1)),
            jnp.asarray(g)))[..., 0]
        # CPU-XLA conv precision dominates (~2e-3 rel; exact in f64)
        np.testing.assert_allclose(got, want, rtol=5e-2, atol=5e-3)

    def test_speaker_encoder_parity(self):
        """SE-ResNet d-vector with folded eval BatchNorms
        (hifigan_vocoder.py:461-654)."""
        from ttts.hifigan.hifigan_vocoder import ResNetSpeakerEncoder as RefSE
        from xtts_tpu.models.hifigan import ResNetSpeakerEncoder
        from xtts_tpu.utils.convert import (speaker_encoder_from_reference,
                                            to_jax)

        torch.manual_seed(8)
        ref = RefSE(input_dim=16, proj_dim=8, layers=[1, 1, 1, 1],
                    num_filters=[8, 8, 16, 16], log_input=False,
                    use_torch_spec=False).eval()
        # randomize BN running stats so the affine fold is actually tested
        with torch.no_grad():
            for m in ref.modules():
                if isinstance(m, (torch.nn.BatchNorm1d, torch.nn.BatchNorm2d)):
                    m.running_mean.normal_(0, 0.5)
                    m.running_var.uniform_(0.5, 2.0)
        ours = ResNetSpeakerEncoder(proj_dim=8, layers=(1, 1, 1, 1),
                                    num_filters=(8, 8, 16, 16),
                                    norm_mode="affine")
        params = to_jax(speaker_encoder_from_reference(
            ref.state_dict(), layers=(1, 1, 1, 1)))

        rng = np.random.default_rng(1)
        spec = rng.standard_normal((2, 16, 40)).astype(np.float32)  # (B,F,T)
        with torch.no_grad():
            want = ref(torch.from_numpy(spec.copy()), l2_norm=True).numpy()
        got = np.asarray(ours.apply({"params": params},
                                    jnp.asarray(spec.transpose(0, 2, 1))))
        np.testing.assert_allclose(got, want, rtol=5e-3, atol=5e-4)


# ---------------------------------------------------------------------------
# Text normalization + tokenizer
# ---------------------------------------------------------------------------

def _nsw_corpus():
    """~200 generated NSW cases spanning every reference rule family
    (zh_normalization/: num, chronology, phonecode, quantifier,
    char_convert)."""
    cases = []
    for y, mo, d in [(2024, 3, 5), (1999, 12, 31), (2008, 8, 8), (85, 1, 1)]:
        cases.append(f"{y}年{mo}月{d}日发生的事。")
        cases.append(f"{y}年{mo}月。")
    cases += [f"{y}-{m:02d}-{d:02d}启程" for y, m, d in
              [(2023, 5, 6), (2020, 11, 30)]]
    for h, m in [(12, 30), (8, 5), (23, 59), (0, 30), (9, 0), (15, 45)]:
        cases.append(f"现在{h}:{m:02d}了")
    cases += ["8:30-12:30上班", "09:00~17:30营业", "10:15:30整"]
    for t in ["-3.5℃", "25°C", "-40度", "36.6摄氏度", "0℃"]:
        cases.append(f"气温{t}左右")
    for n in ["12", "105", "1100", "10010", "123456", "12345678",
              "110000", "1000000", "100000001", "0", "7"]:
        cases.append(f"共{n}个")
        cases.append(f"编号{n}。")
    for n in ["3.5", "0.5", "12.25", "-7.5", "3.20", "0.50", ".75"]:
        cases.append(f"结果是{n}")
    for p in ["12%", "0.5%", "-3%", "99.99%"]:
        cases.append(f"涨幅{p}")
    for f in ["3/4", "1/3", "-5/8"]:
        cases.append(f"大约{f}的人")
    cases += ["电话010-66122197转8", "手机13812345678有效",
              "热线400-666-8800咨询", "号码+86 13587654321。",
              "座机66122197快记下"]
    for r in ["90-95", "3.5~4.5", "100-200"]:
        cases.append(f"得分{r}分")
    cases += ["体重70kg重", "身高175cm高", "容量500ml装", "距离3km远",
              "面积120m2大", "速度5m每秒"]
    for q in ["3个", "10位", "200块", "5年", "30岁", "8条", "100多万元",
              "20来人", "3+场"]:
        cases.append(f"一共{q}")
    cases += ["愛漢語繁體字轉換測試", "這裡有幾個繁體的詞語",
              "第①名、第②名和第⑩名", "π和Ω是希腊字母",
              "他說：買了１２３４个蘋果", "尺寸5cm²和3m³",
              "温度-5℃~5℃波动", "上午09:05:05开会",
              "增长0.5个百分点", "他住3单元402室"]
    return cases


class TestTNDifferential:
    def test_zero_divergence_on_nsw_corpus(self):
        """Our normalizer must reproduce the reference TextNormalizer
        sentence-for-sentence on the NSW corpus
        (zh_normalization/text_normlization.py:120-150 rule cascade)."""
        from ttts.gpt.text.zh_normalization.text_normlization import \
            TextNormalizer as RefTN
        from xtts_tpu.text.normalize import TextNormalizer as OurTN

        ref, our = RefTN(), OurTN()
        diffs = []
        for case in _nsw_corpus():
            r = ref.normalize(case)
            o = our.normalize(case)
            if r != o:
                diffs.append((case, r, o))
        assert not diffs, f"{len(diffs)} divergences, first: {diffs[0]}"


class TestTokenizerFileParity:
    SHIPPED = "/root/reference/ttts/gpt/gpt_tts_tokenizer.json"

    def test_shipped_vocab_identical_ids(self):
        """Both wrappers load the SHIPPED 255-vocab tokenizer json and
        produce identical ids over frontend output
        (ttts/gpt/voice_tokenizer.py:43-57)."""
        from ttts.gpt.voice_tokenizer import VoiceBpeTokenizer as RefTok
        from xtts_tpu.text.tokenizer import VoiceBpeTokenizer

        ref = RefTok(self.SHIPPED)
        ours = VoiceBpeTokenizer(self.SHIPPED)
        assert ours.vocab_size == 255
        texts = [
            "[ZH] ni3 hao3 shi4 jie4",
            "[ZH] zhe4 shi4 yi2 ge4 ce4 shi4",
            "[ZH] chun1 mian2 bu4 jue2 xiao3 , chu4 chu4 wen2 ti2 niao3 .",
            "[EN] hello world",
            "jin1 tian1 tian1 qi4 zhen1 hao3 !",
        ]
        for t in texts:
            got = ours.encode(t)
            want = ref.encode(t)
            assert got == want, (t, got, want)
            assert ours.decode(got) == ref.decode(want)

    def test_frontend_output_tokenizes(self):
        """Full zh frontend -> shipped tokenizer: everything the frontend
        emits must be encodable without [UNK] explosions."""
        from xtts_tpu.text.cleaner import clean_text
        from xtts_tpu.text.tokenizer import VoiceBpeTokenizer

        tok = VoiceBpeTokenizer(self.SHIPPED)
        _, words = clean_text("今天天气真好，我们去公园散步吧。", "ZH")
        ids = tok.encode(" ".join(words))
        assert len(ids) > 0
        unk_frac = sum(1 for i in ids if i == 1) / len(ids)
        assert unk_frac < 0.1, (words, ids)
