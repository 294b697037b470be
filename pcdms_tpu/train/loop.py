"""Generic training-loop driver.

The SPMD replacement for the reference's accelerate epoch/step loops
(/root/reference/stage2_train_inpaint_model.py:324-406): one process
drives the whole mesh; per-step metrics are already globally reduced by
XLA (the loss is computed over the sharded batch), so there is no
``accelerator.gather`` equivalent needed. Logging, checkpointing cadence
and resume semantics mirror the reference flags.
"""

from __future__ import annotations

import logging
import os
import time
from typing import Callable, Iterator, Optional

import jax
import numpy as np

from pcdms_tpu.train import checkpoint as ckpt
from pcdms_tpu.train.common import TrainConfig, init_train_state, \
    make_train_step, shard_train_state

logger = logging.getLogger("pcdms_tpu.train")


def run_training(loss_fn: Callable, params, batches: Iterator,
                 cfg: TrainConfig, *, mesh=None, rng=None,
                 output_dir: Optional[str] = None,
                 checkpointing_steps: int = 5000,
                 log_every: int = 50,
                 resume_from_checkpoint: bool = False,
                 max_train_steps: Optional[int] = None,
                 profile_dir: Optional[str] = None,
                 tensorboard_writer=None,
                 device_prefetch: int = 2,
                 handle_preemption: bool = True):
    """Run the train loop; returns the final state.

    batches yields host numpy dict batches (already encoder-processed).
    With a mesh, ``device_prefetch`` batches are sharded onto it ahead of
    the step via asynchronous transfers (data/loader.py), so host→HBM
    copies overlap device compute.

    With ``handle_preemption`` (default), SIGTERM/SIGINT stop the loop at
    the next step boundary and write a final checkpoint before returning —
    TPU preemption notices arrive as SIGTERM, so a preempted run resumes
    from its last completed step instead of its last cadence checkpoint.
    (The reference has no preemption handling; recovery there is manual
    ``--resume_from_checkpoint`` from the 5000-step cadence, SURVEY.md §5.)
    """
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    max_steps = max_train_steps or cfg.max_train_steps

    if mesh is not None:
        from pcdms_tpu.data.loader import prefetch_to_device
        batches = prefetch_to_device(batches, mesh, depth=device_prefetch)

    # Pull the first batch BEFORE allocating the optimizer state: the
    # --cache_embeddings batch generators build their cache (and then
    # free the ~7 GB frozen encoders) on first next(); initializing
    # AdamW state first would hold params+opt+encoders simultaneously
    # and OOM a single 16G chip at SD-2.1 scale.
    batches = iter(batches)
    first_batch = next(batches, None)

    state = init_train_state(params, cfg)
    start_step = 0
    if resume_from_checkpoint and output_dir:
        latest = ckpt.latest_step(output_dir)
        if latest is not None:
            state, _, start_step = ckpt.restore_checkpoint(output_dir, state)
            if mesh is not None:
                # restored arrays are committed to one device; re-shard to
                # the step's target shardings (ZeRO-1 opt state included)
                state = shard_train_state(state, cfg, mesh)
            logger.info("resumed from %s at step %d", output_dir, start_step)

    step_fn = make_train_step(loss_fn, cfg, mesh=mesh)

    stop = {"signal": None}
    prev_handlers = {}
    if handle_preemption:
        import signal

        def _on_signal(signum, frame):
            stop["signal"] = signum
            logger.warning(
                "signal %d received: stopping at the next step boundary "
                "and checkpointing", signum)

        for s in (signal.SIGTERM, signal.SIGINT):
            try:
                prev_handlers[s] = signal.signal(s, _on_signal)
            except ValueError:   # not the main thread; run unguarded
                break

    t_last = time.perf_counter()
    examples_since_log = 0
    step = start_step
    last_saved = start_step if start_step else None
    trace_open = False
    if first_batch is not None:
        import itertools
        batches = itertools.chain([first_batch], batches)
    try:
        for batch in batches:
            if step >= max_steps or stop["signal"] is not None:
                break
            if profile_dir and step == start_step + 3:
                jax.profiler.start_trace(profile_dir)
                trace_open = True
            if profile_dir and step == start_step + 6:
                jax.profiler.stop_trace()
                trace_open = False

            rng, sub = jax.random.split(rng)
            state, metrics = step_fn(state, batch, sub)
            step += 1
            examples_since_log += len(jax.tree.leaves(batch)[0])

            if step % log_every == 0 or step == start_step + 1:
                # float() on the device scalar is the synchronization point:
                # it cannot resolve until every dispatched step in the state
                # dependency chain has finished, so the examples/s window below
                # spans fully-executed steps — same checksum-read discipline as
                # bench.py (block_until_ready is a no-op under some transports,
                # e.g. the remote-TPU tunnel; never rely on it for timing).
                loss = float(metrics["loss"])
                dt = time.perf_counter() - t_last
                ips = examples_since_log / max(dt, 1e-9)
                logger.info("step %d loss %.5f | %.1f examples/s (%.2f/s/chip)",
                            step, loss, ips, ips / jax.device_count())
                if tensorboard_writer is not None:
                    tensorboard_writer.scalar("train_loss", loss, step)
                    tensorboard_writer.scalar("examples_per_sec", ips, step)
                t_last = time.perf_counter()
                examples_since_log = 0

            if output_dir and step % checkpointing_steps == 0:
                ckpt.save_checkpoint(output_dir, step, state)
                last_saved = step
                logger.info("checkpoint saved at step %d", step)
        if trace_open:
            # short runs can end before the stop marker at start_step +
            # 6; flush so --profile_dir always yields a usable profile
            jax.profiler.stop_trace()
            trace_open = False
        if output_dir and step != last_saved:
            # skip when the in-loop cadence (or a resumed,
            # already-finished run) saved this exact step — orbax raises
            # StepAlreadyExistsError on duplicates; this final save also
            # covers the preemption path (every completed step persists).
            # It runs with the signal handlers still installed: a second
            # SIGTERM/SIGINT during this (potentially minutes-long) save
            # must not kill the process and lose the interrupted step.
            ckpt.save_checkpoint(output_dir, step, state)
            last_saved = step
    finally:
        if prev_handlers:
            for s, h in prev_handlers.items():
                signal.signal(s, h)
        if trace_open:
            jax.profiler.stop_trace()
    if stop["signal"] is not None:
        logger.warning("stopped by signal %d at step %d (checkpoint %s)",
                       stop["signal"], step,
                       "saved" if output_dir else "not saved: no output_dir")
    return state


def make_tensorboard_writer(logging_dir: str):
    """TensorBoard writer (the reference's ``--report_to=tensorboard``,
    stage1_train_prior_model.py:218-221). Returns None if tensorboard
    isn't importable."""
    try:
        from flax.metrics import tensorboard
    except ImportError:
        logger.warning("tensorboard unavailable; metrics log to stdout only")
        return None
    return tensorboard.SummaryWriter(logging_dir)
