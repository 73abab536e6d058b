"""Gradient-checkpointing (remat) equivalence tests.

The TPU counterpart of the reference's HF `gradient_checkpointing` flag
(ttts/gpt/model.py:257) and the LDM checkpoint util
(ttts/diffusion/ldm/modules/attention.py:270-272): per-block jax.checkpoint
policies must change ONLY memory/FLOPs, never loss or gradients.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xtts_tpu.core.config import (CLIPRefConfig, DiffusionModelConfig,
                                  GPTConfig)

TINY_GPT = GPTConfig(layers=2, model_dim=32, heads=4, max_mel_tokens=24,
                     max_text_tokens=64, number_mel_codes=32,
                     start_mel_token=30, stop_mel_token=31, mel_bins=8,
                     cond_attn_blocks=1)

TINY_DIFF = DiffusionModelConfig(
    in_channels=8, out_channels=16, model_channels=16, num_res_blocks=1,
    channel_mult=(1,), num_heads=2, context_dim=16, in_latent_channels=32,
    clip=CLIPRefConfig(embed_dim=16, width=16, layers=1, head_width=8,
                       patch_size=4, in_channels=8, max_patches=64))


def _gpt_inputs():
    rng = np.random.default_rng(0)
    cond = jnp.asarray(rng.standard_normal((2, 8, 20)).astype(np.float32))
    text = jnp.asarray(rng.integers(2, 200, (2, 6)), jnp.int32)
    tlen = jnp.array([6, 4])
    codes = jnp.asarray(rng.integers(0, 29, (2, 8)), jnp.int32)
    wlen = jnp.array([8 * 1024 - 512, 6 * 1024])
    return cond, text, tlen, codes, wlen


@pytest.mark.parametrize("policy", ["dots", "dots_no_batch", "full"])
def test_gpt_remat_loss_and_grads_unchanged(policy):
    from xtts_tpu.models.gpt import UnifiedVoice

    base = UnifiedVoice(TINY_GPT)
    rem = UnifiedVoice(TINY_GPT.replace(remat=policy))
    inputs = _gpt_inputs()
    v = jax.jit(base.init)(jax.random.PRNGKey(0), *inputs)
    # identical param trees: remat is a pure execution-plan change
    assert (jax.tree_util.tree_structure(v)
            == jax.tree_util.tree_structure(jax.eval_shape(
                lambda: rem.init(jax.random.PRNGKey(0), *inputs))))

    def loss(m):
        def f(params):
            lt, lm = m.apply({"params": params["params"]}, *inputs)
            return 0.01 * lt + lm
        return f

    l0, g0 = jax.value_and_grad(loss(base))(v)
    l1, g1 = jax.value_and_grad(loss(rem))(v)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_gpt_remat_decode_unaffected():
    """The AR decode path (prefill/step) must keep working and produce the
    same tokens when the training stack carries a remat policy."""
    from xtts_tpu.models.gpt import UnifiedVoice
    from xtts_tpu.models.gpt_infer import generate_speech

    inputs = _gpt_inputs()
    base = UnifiedVoice(TINY_GPT)
    rem = UnifiedVoice(TINY_GPT.replace(remat="full"))
    v = jax.jit(base.init)(jax.random.PRNGKey(0), *inputs)
    cond, text, *_ = inputs
    r0 = generate_speech(base, v, cond, text, jax.random.PRNGKey(1),
                         max_gen=6, do_sample=False, repetition_penalty=1.0,
                         cache_dtype=jnp.float32)
    r1 = generate_speech(rem, v, cond, text, jax.random.PRNGKey(1),
                         max_gen=6, do_sample=False, repetition_penalty=1.0,
                         cache_dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(r0.codes), np.asarray(r1.codes))


@pytest.mark.parametrize("policy", ["dots", "full"])
def test_diffusion_remat_loss_and_grads_unchanged(policy):
    from xtts_tpu.models.aa_diffusion import AADiffusion

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 8, 16)).astype(np.float32))
    t = jnp.array([3, 7])
    hint = jnp.asarray(rng.standard_normal((2, 32, 4)).astype(np.float32))
    refer = jnp.asarray(rng.standard_normal((2, 8, 12)).astype(np.float32))

    base = AADiffusion(TINY_DIFF)
    rem = AADiffusion(TINY_DIFF.replace(remat=policy))
    v = jax.jit(base.init)(jax.random.PRNGKey(0), x, t, hint, refer)

    def loss(m):
        def f(params):
            out = m.apply({"params": params["params"]}, x, t, hint, refer)
            return jnp.mean(out ** 2)
        return f

    l0, g0 = jax.value_and_grad(loss(base))(v)
    l1, g1 = jax.value_and_grad(loss(rem))(v)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("policy", ["dots", "full"])
def test_remat_survives_lowering(policy):
    """Remat must reach the lowered program as optimization_barrier ops.

    The blocks are applied in plain Python loops inside one traced graph, so
    without CSE protection XLA merges the rematerialized forward back into
    the saved one — silently undoing the checkpoint while every numerics
    test still passes (this regressed once: prevent_cse=False gave an
    IDENTICAL 6.4 GiB XLA temp plan for none/dots/full at the reference's
    bs-64 diffusion scale; with the barriers, full drops it to 2.0 GiB —
    PERF.md round 3)."""
    from xtts_tpu.models.aa_diffusion import AADiffusion
    from xtts_tpu.models.gpt import UnifiedVoice

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 8, 16)).astype(np.float32))
    t = jnp.array([3, 7])
    hint = jnp.asarray(rng.standard_normal((2, 32, 4)).astype(np.float32))
    refer = jnp.asarray(rng.standard_normal((2, 8, 12)).astype(np.float32))

    # diffusion UNet
    m0 = AADiffusion(TINY_DIFF)
    m1 = AADiffusion(TINY_DIFF.replace(remat=policy))
    v = jax.jit(m0.init)(jax.random.PRNGKey(0), x, t, hint, refer)

    def diff_loss(m):
        return lambda p: jnp.mean(
            m.apply({"params": p["params"]}, x, t, hint, refer) ** 2)

    base_txt = jax.jit(jax.grad(diff_loss(m0))).lower(v).as_text()
    rem_txt = jax.jit(jax.grad(diff_loss(m1))).lower(v).as_text()
    assert "optimization_barrier" not in base_txt
    assert rem_txt.count("optimization_barrier") > 0

    # GPT stack
    inputs = _gpt_inputs()
    g0 = UnifiedVoice(TINY_GPT)
    g1 = UnifiedVoice(TINY_GPT.replace(remat=policy))
    gv = jax.jit(g0.init)(jax.random.PRNGKey(0), *inputs)

    def gpt_loss(m):
        def f(p):
            lt, lm = m.apply({"params": p["params"]}, *inputs)
            return 0.01 * lt + lm
        return f

    assert "optimization_barrier" not in jax.jit(
        jax.grad(gpt_loss(g0))).lower(gv).as_text()
    assert jax.jit(jax.grad(gpt_loss(g1))).lower(gv).as_text().count(
        "optimization_barrier") > 0


def test_remat_policy_names():
    from xtts_tpu.nn.remat import POLICIES, checkpoint_policy, maybe_remat
    from xtts_tpu.nn.transformer import Block

    assert maybe_remat(Block, "none") is Block
    for p in POLICIES:
        if p != "none":
            assert maybe_remat(Block, p) is not Block
    with pytest.raises(ValueError):
        checkpoint_policy("bogus")
