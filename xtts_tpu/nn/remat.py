"""Gradient checkpointing (rematerialization) policies.

TPU-native equivalent of the reference's two checkpointing knobs: the HF
GPT2 `gradient_checkpointing` flag (ttts/gpt/model.py:257) and the LDM
`checkpoint` util gated by `use_checkpoint`
(ttts/diffusion/ldm/modules/attention.py:270-272). Instead of a boolean,
`jax.checkpoint` policies grade the memory/FLOP trade:

* "none"          — save all activations (no remat)
* "dots"          — save matmul outputs, rematerialize elementwise/norm
                    chains (usually the best deal on TPU: cheap VPU ops are
                    recomputed, expensive MXU results kept)
* "dots_no_batch" — save only batch-free matmul outputs (weights-stationary)
* "full"          — save nothing inside the block; rematerialize the whole
                    block on the backward pass (max memory savings, ~1/3
                    extra FLOPs)
"""
from __future__ import annotations

import jax
from flax import linen as nn

POLICIES = ("none", "dots", "dots_no_batch", "full")


def checkpoint_policy(name: str):
    """Map a policy name to a jax.checkpoint policy callable (None = save
    nothing, jax.checkpoint's default)."""
    if name == "full":
        return None
    if name == "dots":
        return jax.checkpoint_policies.dots_saveable
    if name == "dots_no_batch":
        return jax.checkpoint_policies.dots_with_no_batch_dims_saveable
    raise ValueError(f"unknown remat policy {name!r}; have {POLICIES}")


def maybe_remat(cls, policy: str, **kw):
    """Wrap a linen Module class in nn.remat unless policy is 'none'.

    prevent_cse stays at its default (True): the wrapped blocks are applied
    in plain Python loops inside one traced graph, where XLA would otherwise
    common-subexpression-eliminate the rematerialized forward against the
    saved one — silently undoing the checkpoint (measured: identical XLA
    temp buffers across policies with prevent_cse=False; PERF.md round-3
    remat table). prevent_cse=False is only safe under lax control flow
    (scan/while) bodies, which none of these stacks use per-block."""
    if policy in (None, "none"):
        return cls
    return nn.remat(cls, policy=checkpoint_policy(policy), **kw)
