"""Shared training harness: optax AdamW, SPMD train step, state init.

Replaces the reference's accelerate + DeepSpeed loop
(/root/reference/stage1_train_prior_model.py:257-339;
 /root/reference/stage2_train_inpaint_model.py:324-406) with one jitted
step function sharded over a ``('data',)`` mesh:

  * gradients all-reduce automatically (XLA psum from the batch sharding)
  * optional ZeRO-1-style optimizer-state sharding along the data axis
  * gradient accumulation via ``optax.MultiSteps``
  * global-norm clipping (reference ``max_grad_norm=1.0``)
  * hyperparameter defaults from the ``run_stage*.sh`` launchers
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pcdms_tpu.parallel.mesh import batch_sharding, zero1_shardings


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    learning_rate: float = 1e-4
    adam_beta1: float = 0.9
    adam_beta2: float = 0.999
    adam_weight_decay: float = 1e-2
    adam_epsilon: float = 1e-8
    max_grad_norm: float = 1.0
    lr_warmup_steps: int = 5000
    max_train_steps: int = 1_000_000
    lr_scheduler: str = "constant_with_warmup"   # reference default
    gradient_accumulation_steps: int = 1
    noise_offset: float = 0.1
    zero1: bool = False                           # shard optimizer state
    # EMA of the trainable params ("--use_ema": declared by the
    # reference's config, src/configs/stage1_config.py:109, but never
    # implemented by its trainers — implemented for real here). Decay is
    # ramped like diffusers' EMAModel: min(ema_decay, (1+t)/(10+t)).
    use_ema: bool = False
    ema_decay: float = 0.9999


def make_lr_schedule(cfg: TrainConfig):
    if cfg.lr_scheduler == "constant":
        return optax.constant_schedule(cfg.learning_rate)
    if cfg.lr_scheduler == "constant_with_warmup":
        return optax.join_schedules(
            [optax.linear_schedule(0.0, cfg.learning_rate,
                                   max(cfg.lr_warmup_steps, 1)),
             optax.constant_schedule(cfg.learning_rate)],
            [cfg.lr_warmup_steps])
    if cfg.lr_scheduler == "cosine":
        return optax.warmup_cosine_decay_schedule(
            0.0, cfg.learning_rate, cfg.lr_warmup_steps,
            cfg.max_train_steps)
    raise ValueError(cfg.lr_scheduler)


def make_optimizer(cfg: TrainConfig):
    lr = make_lr_schedule(cfg)
    tx = optax.chain(
        optax.clip_by_global_norm(cfg.max_grad_norm),
        optax.adamw(lr, b1=cfg.adam_beta1, b2=cfg.adam_beta2,
                    eps=cfg.adam_epsilon,
                    weight_decay=cfg.adam_weight_decay),
    )
    if cfg.gradient_accumulation_steps > 1:
        tx = optax.MultiSteps(tx, cfg.gradient_accumulation_steps)
    return tx


def init_train_state(params, cfg: TrainConfig):
    tx = make_optimizer(cfg)
    state = {
        "params": params,
        "opt_state": tx.init(params),
        "step": jnp.zeros((), jnp.int32),
    }
    if cfg.use_ema:
        # independent copy: the train step donates its state buffers
        state["ema_params"] = jax.tree.map(jnp.array, params)
    return state


def ema_params(state):
    """The parameters to export for inference: the EMA shadow if the run
    tracked one, the raw params otherwise."""
    return state.get("ema_params", state["params"])


def state_shardings(state, cfg: TrainConfig, mesh: Mesh):
    """Target shardings for a train state on the mesh: params/step
    replicated, optimizer state ZeRO-1-sharded when cfg.zero1."""
    repl = NamedSharding(mesh, P())
    params_s = jax.tree.map(lambda _: repl, state["params"])
    if cfg.zero1:
        opt_s = zero1_shardings(state["opt_state"], mesh)
    else:
        opt_s = jax.tree.map(lambda _: repl, state["opt_state"])
    out = {"params": params_s, "opt_state": opt_s, "step": repl}
    if "ema_params" in state:
        out["ema_params"] = jax.tree.map(lambda _: repl,
                                         state["ema_params"])
    return out


def shard_train_state(state, cfg: TrainConfig, mesh: Mesh):
    """Place a train state onto the mesh with its target shardings.

    Required after checkpoint restore: orbax returns arrays committed to
    one device, and the train step's donated first argument refuses
    committed inputs whose sharding mismatches its in_shardings (fresh
    ``init_train_state`` outputs are *uncommitted*, so the first step of
    a cold run reshards implicitly — a restored state does not)."""
    return jax.device_put(state, state_shardings(state, cfg, mesh))


def make_train_step(loss_fn: Callable, cfg: TrainConfig,
                    mesh: Optional[Mesh] = None):
    """Build the jitted SPMD train step.

    loss_fn(params, batch, rng) -> (loss, metrics_dict).
    Returns step_fn(state, batch, rng) -> (state, metrics).
    """
    tx = make_optimizer(cfg)

    def step_fn(state, batch, rng):
        (loss, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state["params"], batch, rng)
        updates, opt_state = tx.update(grads, state["opt_state"],
                                       state["params"])
        params = optax.apply_updates(state["params"], updates)
        metrics = dict(metrics)
        metrics["loss"] = loss
        metrics["grad_norm"] = optax.global_norm(grads)
        new_state = {
            "params": params,
            "opt_state": opt_state,
            "step": state["step"] + 1,
        }
        if "ema_params" in state:
            # Blend only on real optimizer updates: with gradient
            # accumulation (optax.MultiSteps) step_fn runs per
            # micro-batch and params change only on every K-th call —
            # blending each micro-step would compound the decay K times
            # per update and count the ramp in micro-steps.
            k = cfg.gradient_accumulation_steps
            # diffusers-EMAModel decay ramp; t = completed updates
            t = (state["step"] // k).astype(jnp.float32)
            d = jnp.minimum(cfg.ema_decay, (1.0 + t) / (10.0 + t))
            is_update = (state["step"] + 1) % k == 0

            def blend(ema):
                return jax.tree.map(lambda e, p: e * d + p * (1.0 - d),
                                    ema, params)

            new_state["ema_params"] = jax.lax.cond(
                is_update, blend, lambda ema: ema, state["ema_params"])
        return new_state, metrics

    if mesh is None:
        return jax.jit(step_fn, donate_argnums=(0,))

    repl = NamedSharding(mesh, P())
    batch_shard = batch_sharding(mesh)

    # The batch pytree structure isn't known until the first call, so the
    # fully-sharded jit is built lazily on first use.
    cache = {}

    def wrapped(state, batch, rng):
        key = "fn"
        if key not in cache:
            ss = state_shardings(state, cfg, mesh)
            cache[key] = jax.jit(
                step_fn,
                in_shardings=(ss, jax.tree.map(lambda _: batch_shard, batch),
                              repl),
                out_shardings=(ss, None),
                donate_argnums=(0,),
            )
        return cache[key](state, batch, rng)

    return wrapped
