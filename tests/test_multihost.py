"""Multi-host simulation: 2 JAX processes x 4 virtual CPU devices
training the tiny stage-2 model must produce the same loss curve as the
single-process 8-device run, with orbax multihost checkpointing working
from both processes.

The workers (tests/_multihost_worker.py) connect through
``jax.distributed.initialize`` (TCP coordinator + Gloo CPU collectives)
and load per-process data via ``PairList.shard`` — the SPMD equivalent
of the reference's accelerate 8-process topology
(/root/reference/run_stage2.sh, stage1_train_prior_model.py:74-79,
DistributedSampler :167-173). The single-process reference run below
shares the exact same step program and synthetic data generator
(tests/_multihost_common.py).
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "_multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.fixture(scope="module")
def multihost_results(tmp_path_factory):
    outdir = str(tmp_path_factory.mktemp("mh"))
    port = _free_port()
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env["PYTHONPATH"] = REPO
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(pid), str(port), outdir],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=1200)
        outs.append(out.decode(errors="replace"))
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-4000:]}"
    results = []
    for pid in range(2):
        with open(os.path.join(outdir, f"result_{pid}.json")) as f:
            results.append(json.load(f))
    return results


class TestTwoProcessTraining:
    def test_processes_agree(self, multihost_results):
        """Loss is globally reduced — both processes must report the
        identical curve and final params fingerprint."""
        r0, r1 = multihost_results
        np.testing.assert_allclose(r0["losses"], r1["losses"], rtol=0)
        assert r0["fingerprint"] == pytest.approx(r1["fingerprint"],
                                                  rel=1e-6)

    def test_orbax_multihost_roundtrip(self, multihost_results):
        for r in multihost_results:
            assert r["restore_exact"]

    def test_matches_single_process_run(self, multihost_results):
        """The 2-process loss curve equals the single-process 8-device
        curve on the same global batches (same SPMD program, different
        process topology — only collective implementation differs)."""
        from _multihost_common import STEPS, make_step, pair_batch
        from pcdms_tpu.parallel.mesh import make_mesh, shard_batch

        import jax

        r0 = multihost_results[0]
        mesh = make_mesh()
        state, step_fn = make_step(mesh=mesh)
        losses = []
        for step in range(STEPS):
            batch = pair_batch(r0["pair_order"], step)
            state, metrics = step_fn(
                state, shard_batch(batch, mesh),
                jax.random.fold_in(jax.random.PRNGKey(7), step))
            losses.append(float(metrics["loss"]))
        # Gloo all-reduce vs single-process XLA reduction: same math,
        # different summation order -> f32 rounding tolerance
        np.testing.assert_allclose(losses, r0["losses"], rtol=2e-4)
