"""Device mesh + sharding rules.

Replaces the reference's HF Accelerate DDP wrap (every trainer's
`accelerator.prepare`, e.g. ttts/gpt/train_ms.py:97,114) and the NCCL
all_reduce with one `jax.sharding.Mesh` and NamedSharding annotations; XLA
GSPMD inserts the psum/all-gather collectives over ICI.

Axes:
  data   — batch sharding (the reference's only strategy)
  model  — tensor parallel for the GPT stack (attention heads / MLP columns),
           absent in the reference (233M fits replicated) but wired in so
           scaling up is a config change, not a rewrite.
"""
from __future__ import annotations

import re
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(n_data: Optional[int] = None, n_model: int = 1,
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if n_data is None:
        n_data = n // n_model
    assert n_data * n_model == n, f"{n_data}x{n_model} != {n} devices"
    arr = np.asarray(devices).reshape(n_data, n_model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


# ---------------------------------------------------------------------------
# Parameter partition rules.
#
# Params are pytrees of arrays keyed by flax module paths. Rules map path
# regexes to PartitionSpecs; first match wins; default is replicated.

GPT_PARAM_RULES = [
    # attention qkv / mlp up: shard output features over model axis
    (r".*attn/c_attn/kernel", P(None, MODEL_AXIS)),
    (r".*attn/c_attn/bias", P(MODEL_AXIS)),
    (r".*mlp/c_fc/kernel", P(None, MODEL_AXIS)),
    (r".*mlp/c_fc/bias", P(MODEL_AXIS)),
    # attention out / mlp down: shard input features
    (r".*attn/c_proj/kernel", P(MODEL_AXIS, None)),
    (r".*mlp/c_proj/kernel", P(MODEL_AXIS, None)),
    # big embeddings / heads: shard vocab dim
    (r".*mel_embedding/embedding", P(MODEL_AXIS, None)),
    (r".*mel_head/kernel", P(None, MODEL_AXIS)),
    (r".*mel_head/bias", P(MODEL_AXIS)),
]


def _path_str(path) -> str:
    return "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in path)


def partition_spec_tree(params, rules=GPT_PARAM_RULES):
    """PartitionSpec pytree for `params` according to `rules`."""
    def spec_for(path, leaf):
        p = _path_str(path)
        for pat, spec in rules:
            if re.fullmatch(pat, p):
                return spec
        return P()
    return jax.tree_util.tree_map_with_path(spec_for, params)


def shard_params(params, mesh: Mesh, rules=GPT_PARAM_RULES):
    """Device-put params with NamedShardings from the rules."""
    specs = partition_spec_tree(params, rules)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs)


def data_sharding(mesh: Mesh):
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())
