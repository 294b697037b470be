"""Multi-host training worker: one JAX process of a 2-process CPU job.

Launched by tests/test_multihost.py as
``python tests/_multihost_worker.py <process_id> <port> <outdir>``.
Each process owns 4 virtual CPU devices (global mesh = 8), loads its
process-local half of every global batch via ``PairList.shard``
striding, runs 10 tiny stage-2 train steps (ZeRO-1 on), saves an orbax
checkpoint from both processes, restores it, and writes per-step losses
+ a params fingerprint to ``<outdir>/result_<pid>.json``.

This simulates the reference's 8-GPU multi-process training topology
(/root/reference/run_stage2.sh: accelerate --num_processes 8;
process-group semantics stage1_train_prior_model.py:74-79) on one
machine — the "multi-node without a cluster" capability SURVEY.md §4
calls for, one level beyond the single-process 8-device mesh tests.
"""

import json
import os
import sys

PID = int(sys.argv[1])
PORT = sys.argv[2]
OUTDIR = sys.argv[3]
NPROC = 2
LOCAL_DEVICES = 4

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    f"--xla_force_host_platform_device_count={LOCAL_DEVICES}")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=f"127.0.0.1:{PORT}",
                           num_processes=NPROC, process_id=PID)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(__file__))
from _multihost_common import (  # noqa: E402
    GLOBAL_BATCH, STEPS, global_pair_order, make_params, make_step,
    pair_batch, params_fingerprint,
)

from pcdms_tpu.data.datasets import PairList  # noqa: E402
from pcdms_tpu.parallel.mesh import make_mesh, shard_batch  # noqa: E402
from pcdms_tpu.train import checkpoint as ckpt  # noqa: E402


def main():
    assert jax.process_count() == NPROC
    assert jax.device_count() == NPROC * LOCAL_DEVICES
    mesh = make_mesh()

    # per-process pair list: the striding the data layer uses everywhere
    # (data/datasets.py PairList.shard)
    pairs = PairList([(f"s{i}", f"t{i}") for i in range(GLOBAL_BATCH)],
                     image_root=None)
    local = pairs.shard(jax.process_index(), jax.process_count())
    local_idx = [int(s[1:]) for s, _ in local.pairs]

    state, step_fn = make_step()

    losses = []
    for step in range(STEPS):
        batch = pair_batch(local_idx, step)
        gbatch = shard_batch(batch, mesh)
        state, metrics = step_fn(state, gbatch,
                                 jax.random.fold_in(jax.random.PRNGKey(7),
                                                    step))
        losses.append(float(metrics["loss"]))

    # orbax multihost save + restore round-trip (all processes participate)
    ckpt_dir = os.path.join(OUTDIR, "ckpt")
    ckpt.save_checkpoint(ckpt_dir, STEPS, state)
    restored, _, rstep = ckpt.restore_checkpoint(ckpt_dir, state)
    assert rstep == STEPS
    same = jax.tree.all(jax.tree.map(
        lambda a, b: bool(jnp.all(jnp.isclose(a, b))
                          ) if hasattr(a, "dtype") else a == b,
        state["params"], restored["params"]))

    out = {
        "process": PID,
        "losses": losses,
        "fingerprint": params_fingerprint(state["params"]),
        "restore_exact": bool(same),
        "pair_order": global_pair_order(GLOBAL_BATCH, NPROC),
    }
    with open(os.path.join(OUTDIR, f"result_{PID}.json"), "w") as f:
        json.dump(out, f)
    print(f"worker {PID} done", flush=True)


if __name__ == "__main__":
    main()
