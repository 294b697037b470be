"""Frozen-encoder bundles + trained-parameter export.

The reference keeps its frozen models (SD VAE, CLIP ViT-H, DINOv2-g) as
HuggingFace directories that every script re-loads by path
(/root/reference/stage2_train_inpaint_model.py:175-185,
 stage2_batchtest_inpaint_model.py), so "the encoders the model was
trained against" is implicit in which paths you pass. Here that contract
is explicit: a training run can persist its frozen encoders as a
*bundle* (orbax tree at ``<dir>``), and every downstream CLI — the other
trainers, the batch tests, the LCM distiller — can load the exact same
parameters with ``--frozen_dir``. This matters most for random-init /
tiny-config runs (CI, the tiny-scale learning proof,
scripts/learning_proof.py), where each CLI would otherwise re-draw its
own random "frozen" encoders from its own PRNG key and silently break
the train->inference conditioning contract.

Also here: ``load_trained_params`` — pull the inference parameters
(EMA shadow if tracked, raw otherwise) out of a training run's orbax
checkpoint directory without reconstructing the optimizer state
template (the inference CLIs don't know the run's TrainConfig).
"""

from __future__ import annotations

import logging
import os
from typing import Any, Dict, Optional

import orbax.checkpoint as ocp

logger = logging.getLogger("pcdms_tpu.train.frozen")


def save_frozen(directory: str, frozen: Dict[str, Any]):
    """Persist a dict of frozen param trees (e.g. {"vae", "clip",
    "dino"}) as one orbax tree at ``directory``. None values are
    dropped. No-op (with a log line) if the bundle already exists —
    first writer wins, so N CLIs pointed at one ``--frozen_dir``
    share one set of encoders."""
    frozen = {k: v for k, v in frozen.items() if v is not None}
    if not frozen:
        raise ValueError("nothing to save: all frozen entries are None")
    directory = os.path.abspath(directory)
    if os.path.isdir(directory) and os.listdir(directory):
        logger.info("frozen bundle already exists at %s; keeping it",
                    directory)
        return
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(directory, frozen)
    ckptr.wait_until_finished()
    ckptr.close()
    logger.info("frozen bundle saved to %s (%s)", directory,
                sorted(frozen))


def load_frozen(directory: str) -> Dict[str, Any]:
    """Load a bundle saved by :func:`save_frozen` (template-free).

    Returned as host numpy trees: orbax restores arrays *committed* to
    one device, which jit refuses to mix with mesh-sharded batch inputs
    ("incompatible devices"); numpy params are uncommitted and follow
    the computation's sharding like a fresh init."""
    import jax

    directory = os.path.abspath(directory)
    if not os.path.isdir(directory):
        raise FileNotFoundError(f"no frozen bundle at {directory}")
    ckptr = ocp.StandardCheckpointer()
    out = jax.device_get(ckptr.restore(directory))
    ckptr.close()
    logger.info("frozen bundle loaded from %s (%s)", directory,
                sorted(out))
    return dict(out)


def frozen_dir_or_build(directory: Optional[str],
                        builders: Dict[str, Any]) -> Dict[str, Any]:
    """The train-CLI contract for ``--frozen_dir``.

    ``builders`` maps encoder name -> zero-arg constructor. Keys found
    in the bundle at ``directory`` are loaded from it; missing keys are
    built. If the bundle did not exist, the built encoders are saved
    there — first trainer creates, every later CLI reuses. (If it
    existed but lacked a key, the fresh build is NOT merged in — orbax
    trees are immutable once written — so pre-build full bundles, or
    run the richest-encoder trainer first.) ``directory=None`` builds
    everything without persisting."""
    existing: Dict[str, Any] = {}
    if directory and os.path.isdir(directory) and os.listdir(directory):
        existing = load_frozen(directory)
    out, built = {}, {}
    for name, build in builders.items():
        if name in existing:
            out[name] = existing[name]
        else:
            out[name] = built[name] = build()
    if built and directory:
        if existing:
            logger.warning(
                "frozen bundle %s lacks %s; built fresh (not saved — "
                "the bundle is immutable once written)", directory,
                sorted(built))
        else:
            save_frozen(directory, built)
    return out


def load_trained_params(ckpt_dir: str, step: Optional[int] = None,
                        prefer_ema: bool = True) -> Dict[str, Any]:
    """Inference params from a training run's orbax checkpoint dir.

    Template-free restore of the latest (or given) step; returns the
    EMA shadow when the run tracked one (``--use_ema``) and
    ``prefer_ema``, else the raw params — the same selection rule as
    ``train.common.ema_params``. The optimizer state is restored as
    plain arrays and dropped (inference CLIs don't know the run's
    TrainConfig, so no state template can be built)."""
    import jax

    mgr = ocp.CheckpointManager(os.path.abspath(ckpt_dir))
    step = step if step is not None else mgr.latest_step()
    if step is None:
        raise FileNotFoundError(f"no checkpoint found in {ckpt_dir}")
    # host numpy: restored arrays are committed to one device, which jit
    # refuses to mix with mesh-sharded inputs (see load_frozen)
    restored = jax.device_get(mgr.restore(step))
    mgr.close()
    if prefer_ema and "ema_params" in restored:
        logger.info("loaded EMA params from %s step %d", ckpt_dir, step)
        return restored["ema_params"]
    logger.info("loaded params from %s step %d", ckpt_dir, step)
    return restored["params"]
