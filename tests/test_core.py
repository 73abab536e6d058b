"""Core subsystem tests: checkpoint save/restore/rotation, partial restore,
EMA, metric logging."""
import glob
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from flax import linen as nn

from xtts_tpu.core.checkpoint import CheckpointManager, filter_restore
from xtts_tpu.core.config import TrainConfig
from xtts_tpu.core.logging import (MetricLogger, StepTimer, get_logger,
                                   plot_spectrogram_to_numpy)
from xtts_tpu.train.ema import ema_init, ema_update, ema_warmup_decay
from xtts_tpu.train.trainer import Trainer, TrainState


class TinyModel(nn.Module):
    @nn.compact
    def __call__(self, x):
        return nn.Dense(4)(nn.relu(nn.Dense(8)(x)))


def _make_trainer(tmp_path, **kw):
    model = TinyModel()
    x = jnp.ones((2, 4))
    params = model.init(jax.random.PRNGKey(0), x)["params"]

    def loss_fn(p, cols, batch, rng):
        y = model.apply({"params": p}, batch["x"])
        loss = jnp.mean((y - batch["y"]) ** 2)
        return loss, {}

    cfg = TrainConfig(accum_grad=1, warmup_steps=2, train_steps=100)
    tr = Trainer(loss_fn, cfg, checkpoint_dir=str(tmp_path / "ckpt"), **kw)
    return tr, tr.init_state(params), model


def _batch(seed=0):
    rng = np.random.default_rng(seed)
    return {"x": jnp.asarray(rng.standard_normal((2, 4)).astype(np.float32)),
            "y": jnp.asarray(rng.standard_normal((2, 4)).astype(np.float32))}


class TestCheckpoint:
    def test_save_restore_exact(self, tmp_path):
        tr, state, _ = _make_trainer(tmp_path)
        b = _batch()
        for _ in range(3):
            state, m = tr.step(state, b, jax.random.PRNGKey(0))
        tr.save(state, wait=True)
        restored = tr.restore(state)
        assert int(restored.step) == 3
        for a, c in zip(jax.tree_util.tree_leaves(state.params),
                        jax.tree_util.tree_leaves(restored.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(c))
        # optimizer moments restored too
        for a, c in zip(jax.tree_util.tree_leaves(state.opt_state),
                        jax.tree_util.tree_leaves(restored.opt_state)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(c))

    def test_resume_training_continues(self, tmp_path):
        tr, state, _ = _make_trainer(tmp_path)
        b = _batch()
        state, _ = tr.step(state, b, jax.random.PRNGKey(0))
        tr.save(state, wait=True)
        restored = tr.restore(state)
        s2, m2 = tr.step(restored, b, jax.random.PRNGKey(1))
        assert int(s2.step) == 2 and jnp.isfinite(m2["loss"])

    def test_rotation_keeps_n(self, tmp_path):
        mgr = CheckpointManager(str(tmp_path / "rot"), keep=2)
        tree = {"w": jnp.ones((3,))}
        for s in range(5):
            mgr.save(s, tree, wait=True)
        steps = sorted(mgr.all_steps())
        assert steps == [3, 4]

    def test_restore_missing_raises(self, tmp_path):
        mgr = CheckpointManager(str(tmp_path / "empty"))
        with pytest.raises(FileNotFoundError):
            mgr.restore()

    def test_filter_restore(self):
        init = {"enc": {"w": jnp.zeros((2,))}, "dec": {"w": jnp.zeros((2,))}}
        rest = {"enc": {"w": jnp.ones((2,))}, "dec": {"w": jnp.ones((2,))}}
        out = filter_restore(rest, init, include=("enc",))
        assert float(out["enc"]["w"][0]) == 1.0
        assert float(out["dec"]["w"][0]) == 0.0

    def test_filter_restore_shape_mismatch_skipped(self):
        init = {"w": jnp.zeros((2,))}
        rest = {"w": jnp.ones((3,))}
        out = filter_restore(rest, init)
        assert out["w"].shape == (2,)

    def test_restore_pretrain_resets_step(self, tmp_path):
        tr, state, _ = _make_trainer(tmp_path)
        b = _batch()
        for _ in range(2):
            state, _ = tr.step(state, b, jax.random.PRNGKey(0))
        tr.save(state, wait=True)
        ft = tr.restore_pretrain(state)
        assert int(ft.step) == 0
        for a, c in zip(jax.tree_util.tree_leaves(state.params),
                        jax.tree_util.tree_leaves(ft.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(c))


class TestEMA:
    def test_update_moves_toward_params(self):
        ema = {"w": jnp.zeros((3,))}
        new = {"w": jnp.ones((3,))}
        out = ema_update(ema, new, 0.9)
        np.testing.assert_allclose(np.asarray(out["w"]), 0.1, rtol=1e-6)

    def test_warmup_decay(self):
        assert float(ema_warmup_decay(jnp.int32(0), 0.999)) == pytest.approx(0.1)
        assert float(ema_warmup_decay(jnp.int32(10**6), 0.999)) == pytest.approx(0.999)

    def test_trainer_ema_integration(self, tmp_path):
        tr, state, _ = _make_trainer(tmp_path, ema_decay=0.9)
        assert "ema" in state.state_cols
        b = _batch()
        s1, _ = tr.step(state, b, jax.random.PRNGKey(0))
        # after one step ema != params but finite and changed from init
        diffs = jax.tree_util.tree_map(
            lambda e, p: float(jnp.abs(e - p).max()),
            s1.state_cols["ema"], s1.params)
        assert any(v > 0 for v in jax.tree_util.tree_leaves(diffs))


class TestLogging:
    def test_metric_logger_jsonl(self, tmp_path):
        ml = MetricLogger(str(tmp_path / "logs"), use_tensorboard=False)
        ml.scalars(1, {"loss": 0.5})
        ml.scalars(2, {"loss": jnp.float32(0.25)})
        ml.close()
        lines = open(os.path.join(str(tmp_path / "logs"),
                                  "metrics.jsonl")).read().splitlines()
        assert json.loads(lines[0]) == {"step": 1, "loss": 0.5}

    def test_mel_plot(self):
        img = plot_spectrogram_to_numpy(np.random.randn(100, 64))
        assert img.shape == (100, 64, 3) and img.dtype == np.uint8

    def test_step_timer(self):
        t = StepTimer()
        assert t.tick() is None
        assert t.tick() is not None and t.mean > 0

    def test_get_logger_file(self, tmp_path):
        lg = get_logger("xtts_tpu.testlog", str(tmp_path / "x.log"))
        lg.info("hello")
        assert "hello" in open(str(tmp_path / "x.log")).read()
