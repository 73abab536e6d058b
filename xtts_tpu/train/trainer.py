"""Generic pjit data-parallel trainer.

One Trainer replaces the reference's five copy-pasted Trainer classes
(ttts/{vqvae,gpt,diffusion,clvp,hifigan}/train_ms.py). The division of labor:

* a model supplies a `loss_fn(params, state_cols, batch, rng) ->
  (loss, aux_dict)` where `state_cols` carries non-gradient collections
  (e.g. the DVAE EMA codebook) and aux may contain `new_state_cols`;
* the Trainer owns: optax chain (global-norm clip + AdamW + schedule —
  ttts/gpt/train_ms.py:97-113,231), gradient accumulation via `lax.scan`
  microbatches (reference: manual accum loop :221-228), the jit with
  NamedShardings (batch over the `data` axis, params per partition rules),
  checkpoint save/rotate/restore, and metric logging.

Under jit+GSPMD the gradient all-reduce and the VQ EMA stat reductions are
inserted automatically by XLA — this is the TPU equivalent of DDP's bucketed
NCCL all-reduce and the explicit all_reduce at ttts/vqvae/xtts_dvae.py:108-110.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh

from xtts_tpu.core.config import TrainConfig
from xtts_tpu.parallel.mesh import data_sharding, replicated
from xtts_tpu.train.schedules import make_schedule


@dataclass
class TrainState:
    params: Any
    opt_state: Any
    state_cols: Any          # mutable non-gradient collections (may be {})
    step: jnp.ndarray

    def tree_flatten(self):
        return (self.params, self.opt_state, self.state_cols, self.step), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


jax.tree_util.register_pytree_node(
    TrainState, lambda s: s.tree_flatten(),
    lambda aux, children: TrainState(*children))


LossFn = Callable[[Any, Any, Any, jax.Array], Any]


class Trainer:
    def __init__(
        self,
        loss_fn: LossFn,
        cfg: TrainConfig = TrainConfig(),
        mesh: Optional[Mesh] = None,
        param_rules=(),
        accum_steps: Optional[int] = None,
        ema_decay: Optional[float] = None,
        checkpoint_dir: Optional[str] = None,
        frozen=None,
    ):
        # frozen: optional pytree of frozen aux params (e.g. the diffusion
        # family's GPT+DVAE) passed to the jitted step as a runtime
        # ARGUMENT and forwarded to loss_fn as its 5th parameter. Without
        # it, loss closures embed frozen params as HLO constants — ~1.1 GB
        # for the diffusion step — which breaks the tunneled chip's
        # remote-compile transport (PERF.md round 5). Use
        # `Trainer(..., frozen=loss_fn.frozen)` for losses that export one.
        self.frozen = frozen
        self.loss_fn = loss_fn
        self.cfg = cfg
        self.mesh = mesh
        self.param_rules = list(param_rules)
        self.accum = accum_steps if accum_steps is not None else cfg.accum_grad
        self.ema_decay = ema_decay
        schedule = make_schedule(cfg.lr_schedule, cfg.lr, cfg.warmup_steps,
                                 cfg.train_steps, cfg.min_lr_ratio)
        self.schedule = schedule
        self.tx = optax.chain(
            optax.clip_by_global_norm(cfg.grad_clip),
            optax.adamw(schedule, b1=0.9, b2=0.999,
                        weight_decay=cfg.weight_decay),
        )
        self._step_jit = None
        self._ckpt = None
        if checkpoint_dir is not None:
            from xtts_tpu.core.checkpoint import CheckpointManager
            self._ckpt = CheckpointManager(checkpoint_dir, keep=cfg.keep_ckpts)

    # ------------------------------------------------------------------

    def init_state(self, params, state_cols=None) -> TrainState:
        cols = dict(state_cols or {})
        if self.ema_decay is not None:
            from xtts_tpu.train.ema import ema_init
            cols["ema"] = ema_init(params)
        return TrainState(params=params, opt_state=self.tx.init(params),
                          state_cols=cols,
                          step=jnp.zeros((), jnp.int32))

    # ------------------------------------------------------------------

    def _train_step(self, state: TrainState, batch, rng, frozen=None):
        """One optimizer step over `accum` microbatches.

        batch: pytree with leading axis (accum, per_step_batch, ...) when
        accum > 1, else (batch, ...). frozen: see __init__ — forwarded to
        loss_fn as a traced argument (NOT split across microbatches).
        """
        if frozen is not None:
            loss_call = lambda p, c, mb, r: self.loss_fn(p, c, mb, r, frozen)
        else:
            loss_call = self.loss_fn

        def split_aux(aux, cols):
            if isinstance(aux, dict) and "new_state_cols" in aux:
                cols = aux["new_state_cols"]
                aux = {k: v for k, v in aux.items() if k != "new_state_cols"}
            return aux, cols

        def microbatch_grad(carry, mb_and_rng):
            grads_acc, loss_acc, cols = carry
            mb, r = mb_and_rng
            (loss, aux), grads = jax.value_and_grad(
                loss_call, has_aux=True)(state.params, cols, mb, r)
            aux, cols = split_aux(aux, cols)
            grads_acc = jax.tree_util.tree_map(jnp.add, grads_acc, grads)
            return (grads_acc, loss_acc + loss, cols), aux

        zeros = jax.tree_util.tree_map(jnp.zeros_like, state.params)
        if self.accum > 1:
            rngs = jax.random.split(rng, self.accum)
            (grads, loss, cols), auxes = jax.lax.scan(
                microbatch_grad, (zeros, 0.0, state.state_cols), (batch, rngs))
            grads = jax.tree_util.tree_map(lambda g: g / self.accum, grads)
            loss = loss / self.accum
            aux = jax.tree_util.tree_map(jnp.mean, auxes) if auxes else {}
        else:
            (loss, aux), grads = jax.value_and_grad(
                loss_call, has_aux=True)(state.params, state.state_cols,
                                         batch, rng)
            aux, cols = split_aux(aux, state.state_cols)
        updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        if self.ema_decay is not None:
            from xtts_tpu.train.ema import ema_update, ema_warmup_decay
            cols = dict(cols)
            cols["ema"] = ema_update(cols["ema"], params,
                                     ema_warmup_decay(state.step, self.ema_decay))
        gnorm = optax.global_norm(grads)
        metrics = {"loss": loss, "grad_norm": gnorm,
                   "lr": self.schedule(state.step)}
        if isinstance(aux, dict):
            metrics.update(aux)
        return TrainState(params, opt_state, cols, state.step + 1), metrics

    # ------------------------------------------------------------------

    def compile(self, state: TrainState, example_batch, rng):
        """jit once; sharding is carried by the argument placements
        (shard_params / shard_batch), GSPMD propagates the rest."""
        self._step_jit = jax.jit(self._train_step, donate_argnums=(0,))
        return self._step_jit

    def shard_state(self, state: TrainState) -> TrainState:
        """Place params/opt state on the mesh per the partition rules
        (replicated by default), batch-independent collections replicated."""
        if self.mesh is None:
            return state
        from jax.sharding import NamedSharding
        from xtts_tpu.parallel.mesh import shard_params
        params = shard_params(state.params, self.mesh, self.param_rules)
        # Adam moments must be sharded like their params; re-derive them from
        # the sharded params (moments transfer is only needed on resume, where
        # the checkpoint loader restores placements itself).
        opt_state = self.tx.init(params)
        rep = replicated(self.mesh)
        put_rep = lambda t: jax.tree_util.tree_map(
            lambda x: jax.device_put(x, rep), t)
        # moments inherit the param shardings from tx.init, but scalar leaves
        # (Adam step counts) land on the default device — pin them to the
        # mesh replicated, or a checkpoint restore commits them to one device
        # and the next jitted step rejects the mixed placement
        opt_state = jax.tree_util.tree_map(
            lambda x: x if (isinstance(x, jax.Array)
                            and isinstance(x.sharding, NamedSharding))
            else jax.device_put(x, rep), opt_state)
        return TrainState(params, opt_state,
                          put_rep(state.state_cols), put_rep(state.step))

    def step(self, state: TrainState, batch, rng):
        """One optimizer step. NOTE: `state` is donated to the jitted step —
        its buffers (including the original init params) are dead afterwards;
        keep only the returned state."""
        if self._step_jit is None:
            self.compile(state, batch, rng)
        return self._step_jit(state, batch, rng, self.frozen)

    # ------------------------------------------------------------------

    def shard_batch(self, batch):
        if self.mesh is None:
            return batch
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, data_sharding(self.mesh)), batch)

    # ------------------------------------------------------------------
    # checkpointing (full state: params + moments + collections + step)

    def save(self, state: TrainState, wait: bool = False) -> bool:
        if self._ckpt is None:
            raise ValueError("Trainer built without checkpoint_dir")
        payload = {"params": state.params, "opt_state": state.opt_state,
                   "state_cols": state.state_cols,
                   "step": state.step}
        return self._ckpt.save(int(state.step), payload, wait=wait)

    def restore(self, template: TrainState,
                step: Optional[int] = None) -> TrainState:
        """Exact resume: template supplies structure/shardings."""
        if self._ckpt is None:
            raise ValueError("Trainer built without checkpoint_dir")
        payload = {"params": template.params, "opt_state": template.opt_state,
                   "state_cols": template.state_cols, "step": template.step}
        out = self._ckpt.restore(step, target=payload)
        return TrainState(out["params"], out["opt_state"],
                          out["state_cols"], out["step"])

    def restore_pretrain(self, template: TrainState, step=None,
                         include=(), exclude=()) -> TrainState:
        """Weights-only, module-filtered restore for finetuning
        (ttts/utils/checkpoint.py:64-103 semantics); optimizer state and
        step restart fresh."""
        from xtts_tpu.core.checkpoint import filter_restore
        if self._ckpt is None:
            raise ValueError("Trainer built without checkpoint_dir")
        payload = {"params": template.params, "opt_state": template.opt_state,
                   "state_cols": template.state_cols, "step": template.step}
        out = self._ckpt.restore(step, target=payload)
        params = filter_restore(out["params"], template.params,
                                include=include, exclude=exclude)
        return TrainState(params, self.tx.init(params),
                          template.state_cols, jnp.zeros((), jnp.int32))
