"""End-to-end drive of the real-weights quality runbook
(scripts/quality_on_real.py) on a random-init tiny checkpoint dir.

The runbook is the one-command path from a checkpoint directory to the
deferred quality verdicts (VERDICT r4 missing #2): quant gates, steps-dial
and refnet-dial render metrics. Real weights slot into the same command;
this pins the wiring so that day needs zero new code.
"""
import json
import os
import sys

import jax
import numpy as np
import pytest

from test_api_e2e import TINY

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "scripts"))


@pytest.fixture(scope="module")
def model_dir(tmp_path_factory):
    """Random-init tiny model dir shaped exactly like converter output."""
    from xtts_tpu.utils.registry import load_model, save_npz
    d = tmp_path_factory.mktemp("qor_model")
    for name in ("gpt", "vqvae", "diffusion", "vocos"):
        _, variables = load_model(name, TINY, weights_path=None,
                                  rng=jax.random.PRNGKey(hash(name) % 1000))
        save_npz(str(d / f"{name}.npz"), variables)
    TINY.to_json(str(d / "xtts_config.json"))
    return str(d)


def test_runbook_end_to_end(model_dir):
    import quality_on_real

    report_path = os.path.join(model_dir, "quality_report.json")
    rc = quality_on_real.main([
        "--model-dir", model_dir, "--max-gen", "8", "--base-steps", "4",
        "--steps", "3", "--refnet-ks", "2", "--gates", "int8,int4,kvq",
        "--report", report_path])
    assert rc == 0
    with open(report_path) as f:
        report = json.load(f)
    stages = report["stages"]

    # conversion + torch parity degrade to explicit skips without --src
    assert stages["convert"]["skipped"]
    assert stages["vq_parity"]["skipped"]
    assert set(stages["load"]["models"]) >= {"gpt", "dvae", "diffusion",
                                             "vocos"}
    assert stages["generate"]["n_codes"] >= 1

    # all three lossy engines got a gate verdict with a real agreement
    for g in ("int8", "int4", "kvq"):
        r = stages["quant_gates"][g]
        assert 0.0 <= r["agreement"] <= 1.0
        assert r["min_agreement"] == 0.98
        assert isinstance(r["passed"], bool)

    # both dials produced finite render metrics vs the base render
    for dial, key in (("steps_dial", "3"), ("refnet_dial", "2")):
        m = stages[dial][key]
        for metric in ("wav_rel_l2", "mel_l1", "mcd_db"):
            assert np.isfinite(m[metric]), (dial, metric, m)


def test_runbook_gate_flags_trained_like_weights(model_dir):
    """The report's `passed` aggregation reflects the per-gate verdicts
    (random weights near-tie logits usually fail int4 — that is the point
    of the gate; here we only pin that passed == all-subgates-passed)."""
    with open(os.path.join(model_dir, "quality_report.json")) as f:
        stages = json.load(f)["stages"]
    gates = stages["quant_gates"]
    sub = [gates[g]["passed"] for g in ("int8", "int4", "kvq")]
    assert gates["passed"] == all(sub)
