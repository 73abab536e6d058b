"""Trainer tests: DVAE / GPT / diffusion steps on an 8-virtual-device mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xtts_tpu.core.config import (
    CLIPRefConfig, DVAEConfig, DiffusionModelConfig, GPTConfig, TrainConfig,
)
from xtts_tpu.diffusion.gaussian import GaussianDiffusion, get_named_beta_schedule
from xtts_tpu.models.aa_diffusion import AADiffusion
from xtts_tpu.models.dvae import DVAE
from xtts_tpu.models.gpt import UnifiedVoice
from xtts_tpu.parallel.mesh import GPT_PARAM_RULES, make_mesh
from xtts_tpu.train.steps import make_diffusion_loss, make_dvae_loss, make_gpt_loss
from xtts_tpu.train.trainer import Trainer

MEL = 8
DVAE_CFG = DVAEConfig(channels=MEL, num_tokens=24, hidden_dim=8,
                      num_resnet_blocks=1, codebook_dim=8, num_layers=2)
GPT_CFG = GPTConfig(layers=2, model_dim=32, heads=4, max_mel_tokens=24,
                    max_text_tokens=16, number_text_tokens=16,
                    start_text_token=15, number_mel_codes=26,
                    start_mel_token=24, stop_mel_token=25, mel_bins=MEL,
                    cond_attn_blocks=1)
TRAIN_CFG = TrainConfig(accum_grad=1, lr=1e-3, warmup_steps=2, train_steps=100,
                        grad_clip=1.0)


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8
    mesh = make_mesh(4, 2)
    assert mesh.shape == {"data": 4, "model": 2}


class TestDVAETraining:
    def test_steps_update_params_and_codebook(self, rng):
        model = DVAE(DVAE_CFG)
        mel = jnp.asarray(rng.standard_normal((4, MEL, 32)).astype(np.float32))
        variables = model.init(jax.random.PRNGKey(0), mel)
        trainer = Trainer(make_dvae_loss(model), TRAIN_CFG)
        state = trainer.init_state(variables["params"],
                                   {"codebook": dict(variables["codebook"])})
        cb0 = np.asarray(state.state_cols["codebook"]["embed"])
        for i in range(3):
            batch = {"mel": jnp.asarray(
                rng.standard_normal((4, MEL, 32)).astype(np.float32))}
            state, metrics = trainer.step(state, batch, jax.random.PRNGKey(i))
        assert np.isfinite(float(metrics["loss"]))
        assert int(state.step) == 3
        # EMA codebook must have moved
        cb1 = np.asarray(state.state_cols["codebook"]["embed"])
        assert np.abs(cb1 - cb0).max() > 0

    def test_balancing_sharded_matches_single_device(self, rng):
        """The balancing reset (lax.cond + replicated RNG + codebook
        rewrite) under the data mesh must equal the single-device step,
        with the window firing INSIDE the step (window=8 << 64 codes/step)
        so the reset branch itself runs under GSPMD."""
        cfg = DVAE_CFG.replace(balancing_heuristic=True, balance_window=8)
        batch = {"mel": jnp.asarray(
            rng.standard_normal((8, MEL, 32)).astype(np.float32))}
        results = []
        for mesh in (None, make_mesh(8, 1)):
            model = DVAE(cfg)
            variables = model.init(jax.random.PRNGKey(0), batch["mel"][:1])
            trainer = Trainer(make_dvae_loss(model), TRAIN_CFG, mesh=mesh)
            state = trainer.shard_state(trainer.init_state(
                variables["params"],
                {"codebook": dict(variables["codebook"])}))
            b = trainer.shard_batch(batch)
            state, metrics = trainer.step(state, b, jax.random.PRNGKey(3))
            results.append((float(metrics["loss"]),
                            jax.tree_util.tree_map(
                                np.asarray, state.state_cols["codebook"])))
        (l0, c0), (l1, c1) = results
        np.testing.assert_allclose(l0, l1, rtol=2e-5)
        assert float(c0["bal_total"]) == 0.0      # window fired + restarted
        for k in c0:
            np.testing.assert_allclose(
                c0[k], c1[k], rtol=2e-4, atol=2e-5,
                err_msg=f"codebook mismatch at {k}")

    def test_accumulation(self, rng):
        model = DVAE(DVAE_CFG)
        mel = jnp.asarray(rng.standard_normal((2, MEL, 32)).astype(np.float32))
        variables = model.init(jax.random.PRNGKey(0), mel)
        trainer = Trainer(make_dvae_loss(model),
                          TRAIN_CFG.replace(accum_grad=4), accum_steps=4)
        state = trainer.init_state(variables["params"],
                                   {"codebook": dict(variables["codebook"])})
        batch = {"mel": jnp.asarray(
            rng.standard_normal((4, 2, MEL, 32)).astype(np.float32))}
        state, metrics = trainer.step(state, batch, jax.random.PRNGKey(0))
        assert np.isfinite(float(metrics["loss"]))


class TestGPTTrainingSharded:
    def test_dp_tp_mesh_step(self, rng):
        mesh = make_mesh(4, 2)
        dvae = DVAE(DVAE_CFG)
        dvae_vars = dvae.init(jax.random.PRNGKey(0), jnp.zeros((1, MEL, 32)))
        gpt = UnifiedVoice(GPT_CFG)
        gpt_vars = gpt.init(jax.random.PRNGKey(1), jnp.zeros((1, MEL, 40)),
                            jnp.zeros((1, 8), jnp.int32), jnp.array([8]),
                            jnp.zeros((1, 8), jnp.int32), jnp.array([8 * 1024]))
        trainer = Trainer(make_gpt_loss(gpt, dvae, dvae_vars),
                          TRAIN_CFG, mesh=mesh, param_rules=GPT_PARAM_RULES)
        state = trainer.shard_state(trainer.init_state(gpt_vars["params"]))
        batch = trainer.shard_batch({
            "cond_mel": jnp.asarray(rng.standard_normal((8, MEL, 40)).astype(np.float32)),
            "text": jnp.asarray(rng.integers(2, 15, (8, 8)).astype(np.int32)),
            "text_lengths": jnp.full((8,), 8, jnp.int32),
            "mel": jnp.asarray(rng.standard_normal((8, MEL, 32)).astype(np.float32)),
            "wav_lengths": jnp.full((8,), 6 * 1024, jnp.int32),
        })
        state, metrics = trainer.step(state, batch, jax.random.PRNGKey(2))
        assert np.isfinite(float(metrics["loss"]))
        assert np.isfinite(float(metrics["loss_mel"]))
        # qkv kernels actually sharded over the model axis
        k = state.params["gpt"]["h_0"]["attn"]["c_attn"]["kernel"]
        assert "model" in str(k.sharding)

    def _fresh(self):
        """Deterministic model/vars build so sharded and single-device runs
        start from identical params (trainer.step donates its state)."""
        dvae = DVAE(DVAE_CFG)
        dvae_vars = dvae.init(jax.random.PRNGKey(0), jnp.zeros((1, MEL, 32)))
        gpt = UnifiedVoice(GPT_CFG)
        gpt_vars = gpt.init(jax.random.PRNGKey(1), jnp.zeros((1, MEL, 40)),
                            jnp.zeros((1, 8), jnp.int32), jnp.array([8]),
                            jnp.zeros((1, 8), jnp.int32), jnp.array([8 * 1024]))
        return dvae, dvae_vars, gpt, gpt_vars

    def _batch(self, rng):
        return {
            "cond_mel": jnp.asarray(
                rng.standard_normal((8, MEL, 40)).astype(np.float32)),
            "text": jnp.asarray(rng.integers(2, 15, (8, 8)).astype(np.int32)),
            "text_lengths": jnp.full((8,), 8, jnp.int32),
            "mel": jnp.asarray(
                rng.standard_normal((8, MEL, 32)).astype(np.float32)),
            "wav_lengths": jnp.full((8,), 6 * 1024, jnp.int32),
        }

    def test_dp_tp_matches_single_device(self):
        """dp x tp step NUMERICALLY equals the single-device step: loss and
        every updated parameter after one optimizer step (VERDICT r2 #2a —
        a wrong psum/sharding that still yields finite numbers must fail).
        Collective semantics match ttts/gpt/train_ms.py:114 (DDP grad
        averaging) + GSPMD TP reductions."""
        batch = self._batch(np.random.default_rng(7))
        results = []
        for mesh, rules in ((None, ()), (make_mesh(4, 2), GPT_PARAM_RULES)):
            dvae, dvae_vars, gpt, gpt_vars = self._fresh()
            trainer = Trainer(make_gpt_loss(gpt, dvae, dvae_vars),
                              TRAIN_CFG, mesh=mesh, param_rules=rules)
            state = trainer.shard_state(trainer.init_state(gpt_vars["params"]))
            b = trainer.shard_batch(batch)
            state, metrics = trainer.step(state, b, jax.random.PRNGKey(2))
            results.append((float(metrics["loss"]),
                            jax.tree_util.tree_map(np.asarray, state.params)))
        (l0, p0), (l1, p1) = results
        np.testing.assert_allclose(l0, l1, rtol=2e-5)
        flat0 = jax.tree_util.tree_leaves_with_path(p0)
        flat1 = dict(jax.tree_util.tree_leaves_with_path(p1))
        for path, a in flat0:
            np.testing.assert_allclose(
                a, flat1[path], rtol=2e-4, atol=2e-5,
                err_msg=f"param mismatch at {jax.tree_util.keystr(path)}")

    def test_tp_sharded_decode_token_parity(self):
        """TP-sharded greedy decode emits the SAME tokens as replicated
        (VERDICT r2 #2b)."""
        from xtts_tpu.models.gpt_infer import generate_speech
        from xtts_tpu.parallel.mesh import shard_params

        _, _, gpt, gpt_vars = self._fresh()
        rng = np.random.default_rng(3)
        cond = jnp.asarray(rng.standard_normal((2, MEL, 40)).astype(np.float32))
        text = jnp.asarray(rng.integers(2, 15, (2, 6)).astype(np.int32))
        base = generate_speech(gpt, gpt_vars, cond, text,
                               jax.random.PRNGKey(0), max_gen=8,
                               do_sample=False, repetition_penalty=1.0,
                               cache_dtype=jnp.float32)
        mesh = make_mesh(1, 2, devices=jax.devices()[:2])
        sharded_vars = {"params": shard_params(gpt_vars["params"], mesh,
                                               GPT_PARAM_RULES)}
        tp = generate_speech(gpt, sharded_vars, cond, text,
                             jax.random.PRNGKey(0), max_gen=8,
                             do_sample=False, repetition_penalty=1.0,
                             cache_dtype=jnp.float32)
        np.testing.assert_array_equal(np.asarray(base.codes),
                                      np.asarray(tp.codes))
        np.testing.assert_array_equal(np.asarray(base.lengths),
                                      np.asarray(tp.lengths))

    def test_sharded_orbax_roundtrip(self, tmp_path):
        """Sharded save -> restore -> step (VERDICT r2 #2c): checkpointing a
        dp x tp state and resuming must reproduce the uninterrupted run."""
        batch = self._batch(np.random.default_rng(11))
        mesh = make_mesh(4, 2)

        def run(ckpt_dir, steps, restore_at=None):
            dvae, dvae_vars, gpt, gpt_vars = self._fresh()
            trainer = Trainer(make_gpt_loss(gpt, dvae, dvae_vars), TRAIN_CFG,
                              mesh=mesh, param_rules=GPT_PARAM_RULES,
                              checkpoint_dir=ckpt_dir)
            state = trainer.shard_state(trainer.init_state(gpt_vars["params"]))
            if restore_at is not None:
                state = trainer.restore(state)
                assert int(state.step) == restore_at
            losses = []
            for i in range(int(state.step), steps):
                state, m = trainer.step(state, trainer.shard_batch(batch),
                                        jax.random.PRNGKey(i))
                losses.append(float(m["loss"]))
            return losses, trainer, state

        d = str(tmp_path / "ck")
        # uninterrupted 2-step run
        ref_losses, _, ref_state = run(str(tmp_path / "ref"), 2)
        # save after step 1, restore into a fresh trainer, run step 2
        losses_a, trainer_a, state_a = run(d, 1)
        trainer_a.save(state_a, wait=True)
        losses_b, _, state_b = run(d, 2, restore_at=1)
        np.testing.assert_allclose(losses_a + losses_b, ref_losses, rtol=1e-6)
        for a, b in zip(jax.tree_util.tree_leaves(ref_state.params),
                        jax.tree_util.tree_leaves(state_b.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-6)

    def test_loss_decreases_over_steps(self, rng):
        dvae = DVAE(DVAE_CFG)
        dvae_vars = dvae.init(jax.random.PRNGKey(0), jnp.zeros((1, MEL, 32)))
        gpt = UnifiedVoice(GPT_CFG)
        gpt_vars = gpt.init(jax.random.PRNGKey(1), jnp.zeros((1, MEL, 40)),
                            jnp.zeros((1, 8), jnp.int32), jnp.array([8]),
                            jnp.zeros((1, 8), jnp.int32), jnp.array([8 * 1024]))
        trainer = Trainer(make_gpt_loss(gpt, dvae, dvae_vars), TRAIN_CFG)
        state = trainer.init_state(gpt_vars["params"])
        batch = {
            "cond_mel": jnp.asarray(rng.standard_normal((2, MEL, 40)).astype(np.float32)),
            "text": jnp.asarray(rng.integers(2, 15, (2, 8)).astype(np.int32)),
            "text_lengths": jnp.full((2,), 8, jnp.int32),
            "mel": jnp.asarray(rng.standard_normal((2, MEL, 32)).astype(np.float32)),
            "wav_lengths": jnp.full((2,), 6 * 1024, jnp.int32),
        }
        losses = []
        for i in range(8):
            state, metrics = trainer.step(state, batch, jax.random.PRNGKey(i))
            losses.append(float(metrics["loss"]))
        assert losses[-1] < losses[0]  # memorizes a fixed batch


class TestDiffusionTraining:
    def test_step(self, rng):
        diff_cfg = DiffusionModelConfig(
            in_channels=MEL, out_channels=2 * MEL, model_channels=16,
            num_res_blocks=1, channel_mult=(1,), num_heads=2, context_dim=16,
            in_latent_channels=32,
            clip=CLIPRefConfig(embed_dim=16, width=16, layers=1, head_width=8,
                               patch_size=4, in_channels=MEL, max_patches=64))
        diff = AADiffusion(diff_cfg)
        dvae = DVAE(DVAE_CFG)
        dvae_vars = dvae.init(jax.random.PRNGKey(0), jnp.zeros((1, MEL, 32)))
        gpt = UnifiedVoice(GPT_CFG)
        gpt_vars = gpt.init(jax.random.PRNGKey(1), jnp.zeros((1, MEL, 40)),
                            jnp.zeros((1, 8), jnp.int32), jnp.array([8]),
                            jnp.zeros((1, 8), jnp.int32), jnp.array([8 * 1024]))
        dvars = diff.init(jax.random.PRNGKey(2), jnp.zeros((2, MEL, 16)),
                          jnp.array([0, 1]), jnp.zeros((2, 32, 4)),
                          jnp.zeros((2, MEL, 16)))
        gd = GaussianDiffusion(betas=get_named_beta_schedule("linear", 100))
        trainer = Trainer(
            make_diffusion_loss(diff, gd, gpt, gpt_vars, dvae, dvae_vars),
            TRAIN_CFG)
        state = trainer.init_state(dvars["params"])
        batch = {
            "mel": jnp.asarray(rng.standard_normal((2, MEL, 32)).astype(np.float32)),
            "refer_mel": jnp.asarray(rng.standard_normal((2, MEL, 24)).astype(np.float32)),
            "text": jnp.asarray(rng.integers(2, 15, (2, 8)).astype(np.int32)),
            "text_lengths": jnp.full((2,), 8, jnp.int32),
            "wav_lengths": jnp.full((2,), 6 * 1024, jnp.int32),
        }
        state, metrics = trainer.step(state, batch, jax.random.PRNGKey(3))
        assert np.isfinite(float(metrics["loss"]))
        assert np.isfinite(float(metrics["mse"]))

    def test_split_frozen_latent_equals_fused(self, rng):
        """Precomputed batch['latent'] (diffusion_latent_fn as its own
        program — the BENCH_SPLIT_FROZEN path for chips whose remote
        compile can't fit the fused step) must give the SAME loss as the
        fused step that recomputes the frozen GPT/DVAE pass inline."""
        from xtts_tpu.train.steps import diffusion_latent_fn
        diff_cfg = DiffusionModelConfig(
            in_channels=MEL, out_channels=2 * MEL, model_channels=16,
            num_res_blocks=1, channel_mult=(1,), num_heads=2, context_dim=16,
            in_latent_channels=32,
            clip=CLIPRefConfig(embed_dim=16, width=16, layers=1, head_width=8,
                               patch_size=4, in_channels=MEL, max_patches=64))
        diff = AADiffusion(diff_cfg)
        dvae = DVAE(DVAE_CFG)
        dvae_vars = dvae.init(jax.random.PRNGKey(0), jnp.zeros((1, MEL, 32)))
        gpt = UnifiedVoice(GPT_CFG)
        gpt_vars = gpt.init(jax.random.PRNGKey(1), jnp.zeros((1, MEL, 40)),
                            jnp.zeros((1, 8), jnp.int32), jnp.array([8]),
                            jnp.zeros((1, 8), jnp.int32), jnp.array([8 * 1024]))
        dvars = diff.init(jax.random.PRNGKey(2), jnp.zeros((2, MEL, 16)),
                          jnp.array([0, 1]), jnp.zeros((2, 32, 4)),
                          jnp.zeros((2, MEL, 16)))
        gd = GaussianDiffusion(betas=get_named_beta_schedule("linear", 100))
        loss_fn = make_diffusion_loss(diff, gd, gpt, gpt_vars, dvae,
                                      dvae_vars)
        batch = {
            "mel": jnp.asarray(rng.standard_normal((2, MEL, 32)).astype(np.float32)),
            "refer_mel": jnp.asarray(rng.standard_normal((2, MEL, 24)).astype(np.float32)),
            "text": jnp.asarray(rng.integers(2, 15, (2, 8)).astype(np.int32)),
            "text_lengths": jnp.full((2,), 8, jnp.int32),
            "wav_lengths": jnp.full((2,), 6 * 1024, jnp.int32),
        }
        key = jax.random.PRNGKey(3)
        l_fused, _ = loss_fn(dvars["params"], {}, batch, key)
        latent = diffusion_latent_fn(gpt, gpt_vars, dvae, dvae_vars)(batch)
        l_split, _ = loss_fn(dvars["params"], {},
                             {**batch, "latent": latent}, key)
        np.testing.assert_allclose(float(l_fused), float(l_split), rtol=1e-6)

    def test_latent_program_embeds_no_param_constants(self, rng):
        """Remote-compile payload guard (PERF.md round-5 root cause): the
        frozen-latent program must take the GPT/DVAE params as ARGUMENTS.
        A closure-captured param tree embeds every tensor as an inline
        `stablehlo.constant dense<...>` literal in the serialized module —
        at the real config that is a ~933 MB remote-compile request body,
        which the tunneled chip's service rejects (HTTP 413) or times out
        uploading (the round-4/5 'compile hang'). Guard: no dense literal
        in the lowered text is larger than a few KB (masks/iota etc. are
        tiny; any param tensor at real scale would blow this bound)."""
        import re
        from xtts_tpu.train.steps import diffusion_latent_impl
        dvae = DVAE(DVAE_CFG)
        dvae_vars = dvae.init(jax.random.PRNGKey(0), jnp.zeros((1, MEL, 32)))
        gpt = UnifiedVoice(GPT_CFG)
        gpt_vars = gpt.init(jax.random.PRNGKey(1), jnp.zeros((1, MEL, 40)),
                            jnp.zeros((1, 8), jnp.int32), jnp.array([8]),
                            jnp.zeros((1, 8), jnp.int32), jnp.array([8 * 1024]))
        batch = {
            "mel": jnp.asarray(rng.standard_normal((2, MEL, 32)).astype(np.float32)),
            "refer_mel": jnp.asarray(rng.standard_normal((2, MEL, 24)).astype(np.float32)),
            "text": jnp.asarray(rng.integers(2, 15, (2, 8)).astype(np.int32)),
            "text_lengths": jnp.full((2,), 8, jnp.int32),
            "wav_lengths": jnp.full((2,), 6 * 1024, jnp.int32),
        }
        impl = diffusion_latent_impl(gpt, dvae)
        txt = jax.jit(impl).lower(gpt_vars, dvae_vars, batch).as_text()
        big = [m for m in re.finditer(r"dense<[^>]{4096,}", txt)]
        assert not big, (
            f"latent program embeds {len(big)} large dense constants — "
            f"params leaked into the program as closure captures")
        # control: the closure-captured form DOES trip the guard (the test
        # would silently pass if as_text ever started eliding literals)
        txt_bad = jax.jit(lambda b: impl(gpt_vars, dvae_vars, b)).lower(
            batch).as_text()
        assert re.search(r"dense<[^>]{4096,}", txt_bad), (
            "closure-capture control no longer shows inline constants; "
            "the guard above is vacuous — update the detection")

    def test_gan_split_frozen_latent_equals_fused(self, rng):
        """make_hifigan_generator_fn: the precomputed batch['latent'] path
        (gen_fn.latent_of as its own program — BENCH_SPLIT_FROZEN) must
        produce the same waveform as the fused frozen DVAE->GPT pass."""
        from xtts_tpu.core.config import HiFiGANConfig
        from xtts_tpu.models.hifigan import HifiDecoder
        from xtts_tpu.train.gan import make_hifigan_generator_fn
        dvae = DVAE(DVAE_CFG)
        dvae_vars = dvae.init(jax.random.PRNGKey(0), jnp.zeros((1, MEL, 32)))
        gpt = UnifiedVoice(GPT_CFG)
        gpt_vars = gpt.init(jax.random.PRNGKey(1), jnp.zeros((1, MEL, 40)),
                            jnp.zeros((1, 8), jnp.int32), jnp.array([8]),
                            jnp.zeros((1, 8), jnp.int32), jnp.array([8 * 1024]))
        hifi_cfg = HiFiGANConfig(
            decoder_input_dim=GPT_CFG.model_dim, d_vector_dim=16,
            upsample_rates=(4, 4), upsample_kernel_sizes=(8, 8),
            upsample_initial_channel=16, resblock_kernel_sizes=(3,),
            resblock_dilation_sizes=((1, 3, 5),))
        decoder = HifiDecoder(hifi_cfg)
        dec_vars = decoder.init(jax.random.PRNGKey(8),
                                jnp.zeros((1, 8, GPT_CFG.model_dim)),
                                ref_mel16k=jnp.zeros((1, 16, 64)))
        gen_fn = make_hifigan_generator_fn(decoder, gpt, gpt_vars, dvae,
                                           dvae_vars)
        wav_len = 8 * 256
        batch = {
            "wav": jnp.asarray(
                rng.standard_normal((2, wav_len)).astype(np.float32)),
            "mel": jnp.asarray(
                rng.standard_normal((2, MEL, 8)).astype(np.float32)),
            "refer_mel16": jnp.asarray(
                rng.standard_normal((2, 16, 64)).astype(np.float32)),
            "wav_length": jnp.full((2,), wav_len, jnp.int32)}
        k = jax.random.PRNGKey(5)
        fused = gen_fn(dec_vars["params"], batch, k)
        latent = gen_fn.latent_of(batch)
        split = gen_fn(dec_vars["params"], {**batch, "latent": latent}, k)
        # latent_of is its OWN jitted program (vars-as-args, PERF.md r5)
        # while the fused arm traces the same math inline — separately
        # compiled programs fuse differently, so equality is ULP-level,
        # not bitwise (observed max 3e-7 abs / 6e-5 rel at tiny shapes)
        np.testing.assert_allclose(np.asarray(fused), np.asarray(split),
                                   rtol=1e-3, atol=1e-5)

    def test_step_with_importance_sampler(self, rng):
        """loss_second_moment timestep sampler threads its loss-history state
        through state_cols and updates it each step."""
        diff_cfg = DiffusionModelConfig(
            in_channels=MEL, out_channels=2 * MEL, model_channels=16,
            num_res_blocks=1, channel_mult=(1,), num_heads=2, context_dim=16,
            in_latent_channels=32,
            clip=CLIPRefConfig(embed_dim=16, width=16, layers=1, head_width=8,
                               patch_size=4, in_channels=MEL, max_patches=64))
        diff = AADiffusion(diff_cfg)
        dvae = DVAE(DVAE_CFG)
        dvae_vars = dvae.init(jax.random.PRNGKey(0), jnp.zeros((1, MEL, 32)))
        gpt = UnifiedVoice(GPT_CFG)
        gpt_vars = gpt.init(jax.random.PRNGKey(1), jnp.zeros((1, MEL, 40)),
                            jnp.zeros((1, 8), jnp.int32), jnp.array([8]),
                            jnp.zeros((1, 8), jnp.int32), jnp.array([8 * 1024]))
        dvars = diff.init(jax.random.PRNGKey(2), jnp.zeros((2, MEL, 16)),
                          jnp.array([0, 1]), jnp.zeros((2, 32, 4)),
                          jnp.zeros((2, MEL, 16)))
        gd = GaussianDiffusion(betas=get_named_beta_schedule("linear", 100))
        loss_fn = make_diffusion_loss(diff, gd, gpt, gpt_vars, dvae,
                                      dvae_vars,
                                      timestep_sampler="loss_second_moment")
        trainer = Trainer(loss_fn, TRAIN_CFG)
        state = trainer.init_state(dvars["params"],
                                   loss_fn.init_sampler_state())
        batch = {
            "mel": jnp.asarray(rng.standard_normal((2, MEL, 32)).astype(np.float32)),
            "refer_mel": jnp.asarray(rng.standard_normal((2, MEL, 24)).astype(np.float32)),
            "text": jnp.asarray(rng.integers(2, 15, (2, 8)).astype(np.int32)),
            "text_lengths": jnp.full((2,), 8, jnp.int32),
            "wav_lengths": jnp.full((2,), 6 * 1024, jnp.int32),
        }
        c0 = int(np.asarray(state.state_cols["t_sampler"]["counts"]).sum())
        state, metrics = trainer.step(state, batch, jax.random.PRNGKey(3))
        assert np.isfinite(float(metrics["loss"]))
        c1 = int(np.asarray(state.state_cols["t_sampler"]["counts"]).sum())
        assert c1 == c0 + 2   # one history push per batch element


class TestCLVPTraining:
    def test_step_through_trainer_contract(self, rng):
        """make_clvp_loss must satisfy the Trainer's
        (params, state_cols, batch, rng) contract (regression: it used the
        old 3-arg form and broke the CLVP CLI branch)."""
        from xtts_tpu.core.config import CLVPConfig
        from xtts_tpu.models.clvp import CLVP, make_clvp_loss
        cfg = CLVPConfig(dim_text=16, dim_speech=16, dim_latent=16,
                         text_enc_depth=1, speech_enc_depth=1,
                         text_heads=2, speech_heads=2,
                         num_text_tokens=32, num_speech_tokens=32)
        model = CLVP(cfg)
        text = jnp.asarray(rng.integers(0, 30, (2, 6)).astype(np.int32))
        codes = jnp.asarray(rng.integers(0, 30, (2, 8)).astype(np.int32))
        variables = model.init(jax.random.PRNGKey(0), text, codes)
        trainer = Trainer(make_clvp_loss(model), TRAIN_CFG)
        state = trainer.init_state(variables["params"])
        state, metrics = trainer.step(
            state, {"text": text, "codes": codes}, jax.random.PRNGKey(1))
        assert np.isfinite(float(metrics["loss"]))
