"""AA_diffusion model tests (small config)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xtts_tpu.core.config import CLIPRefConfig, DiffusionModelConfig
from xtts_tpu.models.aa_diffusion import (
    AADiffusion, denormalize_tacotron_mel, nearest_resize_time,
    normalize_tacotron_mel,
)

CFG = DiffusionModelConfig(
    in_channels=8, out_channels=16, model_channels=32, num_res_blocks=2,
    channel_mult=(1, 1), num_heads=4, context_dim=32, in_latent_channels=24,
    clip=CLIPRefConfig(embed_dim=32, width=32, layers=2, head_width=8,
                       patch_size=4, in_channels=8, max_patches=64),
)


@pytest.fixture(scope="module")
def model_and_vars():
    model = AADiffusion(CFG)
    x = jnp.zeros((2, 8, 24))
    hint = jnp.zeros((2, 24, 6))
    refer = jnp.zeros((2, 8, 20))
    variables = model.init(jax.random.PRNGKey(0), x, jnp.array([0, 1]), hint, refer)
    return model, variables


def _inputs(rng, b=2, tx=24, tl=6, tr=20):
    x = jnp.asarray(rng.standard_normal((b, 8, tx)).astype(np.float32))
    hint = jnp.asarray(rng.standard_normal((b, 24, tl)).astype(np.float32))
    refer = jnp.asarray(rng.standard_normal((b, 8, tr)).astype(np.float32))
    t = jnp.array([3, 700][:b])
    return x, t, hint, refer


class TestAADiffusion:
    def test_forward_shapes(self, model_and_vars, rng):
        model, variables = model_and_vars
        x, t, hint, refer = _inputs(rng)
        out = model.apply(variables, x, t, hint, refer)
        assert out.shape == (2, 16, 24)  # eps + var channels
        assert np.isfinite(np.asarray(out)).all()

    def test_conditioning_free_ignores_hint(self, model_and_vars, rng):
        model, variables = model_and_vars
        x, t, hint, refer = _inputs(rng)
        o1 = model.apply(variables, x, t, hint, refer, conditioning_free=True)
        o2 = model.apply(variables, x, t, hint * 5 + 1, refer,
                         conditioning_free=True)
        np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=1e-6)

    def test_staged_equals_monolithic(self, model_and_vars, rng):
        """encode_reference + reference_features + denoise must reproduce
        __call__ exactly (this is the inference-time hoisted path)."""
        model, variables = model_and_vars
        x, t, hint, refer = _inputs(rng)
        full = model.apply(variables, x, t, hint, refer)

        ctx = model.apply(variables, refer, method=model.encode_reference)
        control = model.apply(variables, refer, t, ctx,
                              method=model.reference_features)
        hint_rs = jnp.swapaxes(
            nearest_resize_time(jnp.swapaxes(hint, 1, 2), x.shape[-1]), 1, 2)
        staged = model.apply(variables, x, t, hint_rs, ctx, control,
                             method=model.denoise)
        np.testing.assert_allclose(np.asarray(full), np.asarray(staged),
                                   atol=1e-5)

    def test_uncond_mask_training_dropout(self, model_and_vars, rng):
        model, variables = model_and_vars
        x, t, hint, refer = _inputs(rng)
        mask = jnp.array([True, False])
        o = model.apply(variables, x, t, hint, refer, uncond_mask=mask)
        # batch element 0 should equal the conditioning-free output
        o_free = model.apply(variables, x, t, hint, refer, conditioning_free=True)
        np.testing.assert_allclose(np.asarray(o[0]), np.asarray(o_free[0]),
                                   atol=1e-5)

    def test_reference_features_depend_on_t(self, model_and_vars, rng):
        model, variables = model_and_vars
        _, _, _, refer = _inputs(rng)
        # zero-init output convs make the trunk t-independent at init; bump
        # every zero kernel so timestep influence can propagate
        params = jax.tree_util.tree_map(
            lambda p: jnp.where(jnp.all(p == 0), jnp.full_like(p, 0.01), p),
            variables["params"])
        variables = {"params": params}
        ctx = model.apply(variables, refer, method=model.encode_reference)
        c0 = model.apply(variables, refer, jnp.array([0, 0]), ctx,
                         method=model.reference_features)
        c1 = model.apply(variables, refer, jnp.array([900, 900]), ctx,
                         method=model.reference_features)
        assert len(c0) == 4  # one per SpatialTransformer (2 levels x 2 blocks)
        diff = float(jnp.abs(c0[1] - c1[1]).max())
        assert diff > 0  # ReferenceNet is timestep-dependent past block 0

    def test_grads_flow(self, model_and_vars, rng):
        model, variables = model_and_vars
        x, t, hint, refer = _inputs(rng)

        def loss(params):
            o = model.apply({"params": params}, x, t, hint, refer)
            return jnp.mean(o ** 2)

        g = jax.grad(loss)(variables["params"])
        assert all(np.isfinite(np.asarray(l)).all()
                   for l in jax.tree_util.tree_leaves(g))


class TestMelNorm:
    def test_roundtrip(self, rng):
        mel = jnp.asarray(rng.standard_normal((2, 8, 10)).astype(np.float32))
        n = normalize_tacotron_mel(mel)
        d = denormalize_tacotron_mel(n)
        # roundtrip exact where not clamped
        keep = np.asarray(mel) > -5.545
        np.testing.assert_allclose(np.asarray(d)[keep], np.asarray(mel)[keep],
                                   rtol=1e-5)

    def test_nearest_resize_is_repeat_for_4x(self, rng):
        x = jnp.asarray(rng.standard_normal((1, 5, 3)).astype(np.float32))
        y = nearest_resize_time(x, 20)
        np.testing.assert_allclose(np.asarray(y), np.repeat(np.asarray(x), 4, 1))


class TestPatchDropout:
    """CLIP PatchDropout (cldm/transformer.py:49-83, applied at :513;
    config.yaml clip.patch_dropout=0.4 — training only)."""

    def test_eval_path_unchanged(self, model_and_vars, rng):
        """train=False (default) must be the exact pre-dropout behavior."""
        model, variables = model_and_vars
        x, t, hint, refer = _inputs(rng)
        o1 = model.apply(variables, x, t, hint, refer)
        o2 = model.apply(variables, x, t, hint, refer, train=False)
        np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))

    def test_train_drops_patches(self, model_and_vars, rng):
        model, variables = model_and_vars
        x, t, hint, refer = _inputs(rng, tr=40)      # 10 patches at size 4
        o_eval = model.apply(variables, x, t, hint, refer)
        o_tr = model.apply(variables, x, t, hint, refer, train=True,
                           rngs={"patch_drop": jax.random.PRNGKey(7)})
        assert o_tr.shape == o_eval.shape            # output length unchanged
        assert np.isfinite(np.asarray(o_tr)).all()
        # the full random-init forward is zero (zero-init out_conv), so
        # assert the dropout effect at the context-encoder stage: fewer
        # tokens AND a different cls representation
        c_eval = model.apply(variables, refer,
                             method=model.encode_reference)
        c_tr = model.apply(variables, refer, train=True,
                           method=model.encode_reference,
                           rngs={"patch_drop": jax.random.PRNGKey(7)})
        assert c_tr.shape[1] == 1 + 6 and c_eval.shape[1] == 1 + 10
        assert not np.allclose(np.asarray(c_tr[:, 0]), np.asarray(c_eval[:, 0]))
        # deterministic given the rng
        o_tr2 = model.apply(variables, x, t, hint, refer, train=True,
                            rngs={"patch_drop": jax.random.PRNGKey(7)})
        np.testing.assert_array_equal(np.asarray(o_tr), np.asarray(o_tr2))

    def test_zero_prob_train_equals_eval(self, rng):
        cfg = CFG.replace(clip=CFG.clip.replace(patch_dropout=0.0))
        model = AADiffusion(cfg)
        x, t, hint, refer = _inputs(rng)
        variables = model.init(jax.random.PRNGKey(0), x, t, hint, refer)
        o_eval = model.apply(variables, x, t, hint, refer)
        o_tr = model.apply(variables, x, t, hint, refer, train=True,
                           rngs={"patch_drop": jax.random.PRNGKey(1)})
        np.testing.assert_array_equal(np.asarray(o_eval), np.asarray(o_tr))

    def test_keep_count_semantics(self, rng):
        """Kept patch count == max(1, int(n*(1-p))) like the reference."""
        from xtts_tpu.models.aa_diffusion import CLIPRefEncoder
        cfg = CFG.clip.replace(patch_dropout=0.4)
        enc = CLIPRefEncoder(cfg)
        mel = jnp.asarray(rng.standard_normal((2, 40, 8)).astype(np.float32))
        variables = enc.init(jax.random.PRNGKey(0), mel)
        out = enc.apply(variables, mel, train=True,
                        rngs={"patch_drop": jax.random.PRNGKey(2)})
        # 10 patches -> keep 6, +1 cls token
        assert out.shape == (2, 7, cfg.width)
