"""Suite coverage for the BENCH_PATH=train bench path (bench.py).

Drives bench_train() in-process at tiny scale for one Trainer family and
one GAN family, pinning the JSON contract the driver-side tooling and
PERF.md tables consume.
"""
import importlib.util
import json
import os

import numpy as np
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

spec = importlib.util.spec_from_file_location(
    "bench_mod", os.path.join(ROOT, "bench.py"))
bench_mod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(bench_mod)


@pytest.fixture(scope="module")
def tiny_cfg_path(tmp_path_factory):
    from test_api_e2e import TINY
    from xtts_tpu.core.config import HiFiGANConfig
    p = str(tmp_path_factory.mktemp("benchcfg") / "cfg.json")
    # bench_train's synthetic text uses ids in [3, 250) — TINY's 256 text
    # vocab satisfies that. TINY has no tiny hifigan; add one (decoder input
    # = TINY.gpt.model_dim).
    cfg = TINY.replace(hifigan=HiFiGANConfig(
        decoder_input_dim=TINY.gpt.model_dim, d_vector_dim=16,
        upsample_rates=(4, 4), upsample_kernel_sizes=(8, 8),
        upsample_initial_channel=16, resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 3, 5),)))
    cfg.to_json(p)
    return p


def _run(capsys, env):
    old = {k: os.environ.get(k) for k in env}
    os.environ.update(env)
    try:
        bench_mod.bench_train()
    finally:
        for k, v in old.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v
    return json.loads(capsys.readouterr().out.strip().splitlines()[-1])


def test_trainer_family_contract(tiny_cfg_path, capsys):
    out = _run(capsys, {
        "BENCH_TRAIN_FAMILY": "vqvae", "BENCH_TRAIN_BS": "2",
        "BENCH_TRAIN_STEPS": "2", "BENCH_CONFIG": tiny_cfg_path})
    assert out["metric"] == "train_vqvae_samples_per_sec"
    assert out["unit"] == "samples/s" and out["value"] > 0
    assert out["batch"] == 2 and out["steps"] == 2
    assert np.isfinite(out["final_loss"])


def test_gan_family_contract(tiny_cfg_path, capsys):
    out = _run(capsys, {
        "BENCH_TRAIN_FAMILY": "hifigan", "BENCH_TRAIN_BS": "2",
        "BENCH_TRAIN_STEPS": "1", "BENCH_TRAIN_SECONDS": "0.2",
        "BENCH_CONFIG": tiny_cfg_path})
    assert out["metric"] == "train_hifigan_samples_per_sec"
    assert out["value"] > 0
    assert np.isfinite(out["final_g_loss"])
    assert np.isfinite(out["final_d_loss"])


def test_diffusion_split_frozen_contract(tiny_cfg_path, capsys):
    """BENCH_SPLIT_FROZEN=1 (diffusion): the two-program fallback for
    chips whose remote-compile transport can't fit the fused step must
    run and flag itself in the JSON line."""
    out = _run(capsys, {
        "BENCH_TRAIN_FAMILY": "diffusion", "BENCH_TRAIN_BS": "2",
        "BENCH_TRAIN_STEPS": "1", "BENCH_SPLIT_FROZEN": "1",
        "BENCH_CONFIG": tiny_cfg_path})
    assert out["metric"] == "train_diffusion_samples_per_sec"
    assert out["value"] > 0 and out["split_frozen"] is True
    assert np.isfinite(out["final_loss"])


def test_gan_split_frozen_contract(tiny_cfg_path, capsys):
    out = _run(capsys, {
        "BENCH_TRAIN_FAMILY": "hifigan", "BENCH_TRAIN_BS": "2",
        "BENCH_TRAIN_STEPS": "1", "BENCH_TRAIN_SECONDS": "0.2",
        "BENCH_SPLIT_FROZEN": "1", "BENCH_CONFIG": tiny_cfg_path})
    assert out["metric"] == "train_hifigan_samples_per_sec"
    assert out["value"] > 0 and out["split_frozen"] is True
    assert np.isfinite(out["final_g_loss"])


def test_slots_path_contract(tiny_cfg_path, capsys):
    """BENCH_PATH=slots JSON contract (continuous-batching steady-state)."""
    env = {"BENCH_PATH": "slots", "BENCH_BATCH": "2", "BENCH_SLOTS_N": "3",
           "BENCH_MAX_GEN": "10", "BENCH_DIFF_STEPS": "3",
           "BENCH_QUANT": "1", "BENCH_CONFIG": tiny_cfg_path}
    old = {k: os.environ.get(k) for k in env}
    os.environ.update(env)
    try:
        bench_mod.main()
    finally:
        for k, v in old.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["metric"] == "slots_full_quality_audio_s_per_s_per_chip"
    assert out["unit"] == "audio_s/s" and out["value"] > 0
    assert out["n_slots"] == 2 and out["n_requests"] == 3
