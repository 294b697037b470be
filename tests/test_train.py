"""Training-stack tests: losses, SPMD step, ZeRO-1 sharding, checkpointing."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pcdms_tpu.models.prior_transformer import PriorConfig, prior_init
from pcdms_tpu.models.projections import (
    image_proj_mlp_init, pose_cond_embedding_init,
)
from pcdms_tpu.models.unet2d import UNetConfig, unet_init
from pcdms_tpu.models.vae import VAEConfig, vae_init
from pcdms_tpu.parallel.mesh import (
    batch_sharding, make_hybrid_mesh, make_mesh, shard_batch,
    zero1_shardings,
)
from pcdms_tpu.train.common import (
    TrainConfig, init_train_state, make_train_step,
)
from pcdms_tpu.train.stage1 import stage1_loss_fn
from pcdms_tpu.train.stage2 import stage2_loss_fn
from pcdms_tpu.train.stage3 import stage3_loss_fn

PRIOR_CFG = PriorConfig(num_heads=2, head_dim=8, num_layers=2,
                        embedding_dim=16, pose_hidden=8)
UNET_CFG = UNetConfig(in_channels=9, block_out_channels=(8, 16, 16, 16),
                      layers_per_block=1, cross_attention_dim=16, head_dim=8,
                      class_embed_proj_dim=16, norm_groups=4, use_flash=False)
UNET3_CFG = UNetConfig(in_channels=8, block_out_channels=(8, 16, 16, 16),
                       layers_per_block=1, cross_attention_dim=16,
                       head_dim=8, norm_groups=4, use_flash=False)
VAE_CFG = VAEConfig(block_out_channels=(4, 8, 8, 8), layers_per_block=1,
                    norm_groups=2)
TCFG = TrainConfig(learning_rate=1e-3, lr_warmup_steps=1,
                   max_train_steps=100)


def stage1_batch(b=4):
    rng = np.random.default_rng(0)
    return {
        "s_embed": rng.normal(size=(b, 16)).astype(np.float32),
        "t_embed": rng.normal(size=(b, 16)).astype(np.float32),
        "s_pose": rng.random((b, 36)).astype(np.float32),
        "t_pose": rng.random((b, 36)).astype(np.float32),
    }


class TestStage1Training:
    def test_loss_finite_and_decreases(self):
        loss_fn = stage1_loss_fn(PRIOR_CFG, noise_offset=0.0)
        params = prior_init(jax.random.PRNGKey(0), PRIOR_CFG)
        state = init_train_state(params, TCFG)
        step = make_train_step(loss_fn, TCFG)
        batch = stage1_batch()
        losses = []
        for i in range(8):
            state, metrics = step(state, batch, jax.random.PRNGKey(7))
            losses.append(float(metrics["loss"]))
        assert np.isfinite(losses).all()
        # same batch + same rng -> same noise -> loss must go down
        assert losses[-1] < losses[0]

    def test_grad_norm_reported(self):
        loss_fn = stage1_loss_fn(PRIOR_CFG)
        params = prior_init(jax.random.PRNGKey(0), PRIOR_CFG)
        state = init_train_state(params, TCFG)
        step = make_train_step(loss_fn, TCFG)
        _, metrics = step(state, stage1_batch(), jax.random.PRNGKey(1))
        assert float(metrics["grad_norm"]) > 0


def stage2_batch(b=2, h=64, w=128):
    rng = np.random.default_rng(0)
    return {
        "st_image": rng.uniform(-1, 1, (b, h, w, 3)).astype(np.float32),
        "masked_image": rng.uniform(-1, 1, (b, h, w, 3)).astype(np.float32),
        "pose_image": rng.uniform(-1, 1, (b, h, w, 3)).astype(np.float32),
        "dino_features": rng.normal(size=(b, 5, 24)).astype(np.float32),
        "clip_embed": rng.normal(size=(b, 1, 16)).astype(np.float32),
    }


def stage2_params():
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    return {
        "unet": unet_init(ks[0], UNET_CFG),
        "image_proj": image_proj_mlp_init(ks[1], 24, 16, 16),
        "pose_proj": pose_cond_embedding_init(
            ks[2], out_channels=8, block_out_channels=(4, 4, 4, 4)),
    }, vae_init(ks[3], VAE_CFG)


class TestStage2Training:
    pytestmark = pytest.mark.slow
    def test_loss_step(self):
        params, vae = stage2_params()
        loss_fn = stage2_loss_fn(UNET_CFG, vae, vae_cfg=VAE_CFG,
                                 compute_dtype=jnp.float32)
        state = init_train_state(params, TCFG)
        step = make_train_step(loss_fn, TCFG)
        state, metrics = step(state, stage2_batch(), jax.random.PRNGKey(2))
        assert np.isfinite(float(metrics["loss"]))
        assert int(state["step"]) == 1

    def test_vae_not_in_grads(self):
        """The frozen VAE is not part of the trainable tree at all."""
        params, vae = stage2_params()
        assert "vae" not in params


class TestStage3Training:
    pytestmark = pytest.mark.slow
    def test_loss_step(self):
        ks = jax.random.split(jax.random.PRNGKey(0), 3)
        params = {"unet": unet_init(ks[0], UNET3_CFG),
                  "image_proj": image_proj_mlp_init(ks[1], 24, 16, 16)}
        vae = vae_init(ks[2], VAE_CFG)
        loss_fn = stage3_loss_fn(UNET3_CFG, vae, vae_cfg=VAE_CFG,
                                 compute_dtype=jnp.float32)
        state = init_train_state(params, TCFG)
        step = make_train_step(loss_fn, TCFG)
        rng = np.random.default_rng(1)
        batch = {
            "target_image": rng.uniform(-1, 1, (2, 64, 64, 3)).astype(
                np.float32),
            "gen_image": rng.uniform(-1, 1, (2, 64, 64, 3)).astype(
                np.float32),
            "dino_features": rng.normal(size=(2, 5, 24)).astype(np.float32),
        }
        _, metrics = step(state, batch, jax.random.PRNGKey(3))
        assert np.isfinite(float(metrics["loss"]))


class TestShardedStep:
    def test_dp_step_on_8_device_mesh(self):
        mesh = make_mesh()
        assert mesh.devices.size == 8
        loss_fn = stage1_loss_fn(PRIOR_CFG)
        params = prior_init(jax.random.PRNGKey(0), PRIOR_CFG)
        cfg = TrainConfig(zero1=True, lr_warmup_steps=1)
        state = init_train_state(params, cfg)
        step = make_train_step(loss_fn, cfg, mesh=mesh)
        batch = shard_batch(stage1_batch(b=8), mesh)
        state, metrics = step(state, batch, jax.random.PRNGKey(1))
        assert np.isfinite(float(metrics["loss"]))

    def test_sharded_matches_single_device(self):
        """DP over the mesh must produce the same loss/update as one
        device (determinism of the SPMD program)."""
        loss_fn = stage1_loss_fn(PRIOR_CFG, noise_offset=0.0)
        params = prior_init(jax.random.PRNGKey(0), PRIOR_CFG)
        batch = stage1_batch(b=8)
        rng = jax.random.PRNGKey(5)

        cfg = TrainConfig(lr_warmup_steps=1)
        # donate_argnums on the step donates state buffers: each state
        # needs its own copy of the initial params
        s1 = init_train_state(jax.tree.map(jnp.copy, params), cfg)
        f1 = make_train_step(loss_fn, cfg)
        s1, m1 = f1(s1, batch, rng)

        mesh = make_mesh()
        s2 = init_train_state(jax.tree.map(jnp.copy, params), cfg)
        f2 = make_train_step(loss_fn, cfg, mesh=mesh)
        s2, m2 = f2(s2, shard_batch(batch, mesh), rng)

        np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                                   rtol=1e-5)
        leaves1 = jax.tree.leaves(s1["params"])
        leaves2 = jax.tree.leaves(s2["params"])
        for a, b in zip(leaves1, leaves2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-5)

    def test_hybrid_mesh_geometry(self):
        """make_hybrid_mesh splits 8 devices into 2 virtual slices x 4."""
        mesh = make_hybrid_mesh(2)
        assert mesh.axis_names == ("dcn", "data")
        assert mesh.shape["dcn"] == 2 and mesh.shape["data"] == 4
        with pytest.raises(ValueError, match="do not divide"):
            make_hybrid_mesh(3)

        # batch shards jointly over both axes: 1 example per device
        b = shard_batch({"x": np.zeros((8, 4), np.float32)}, mesh)
        shard_shapes = {s.data.shape for s in b["x"].addressable_shards}
        assert shard_shapes == {(1, 4)}

    def test_hybrid_mesh_step_matches_single_device(self):
        """The multi-slice (dcn, data) train step is numerically the same
        program as single-device — DCN placement changes collectives, not
        math — and its ZeRO-1 shards never name the dcn axis (optimizer
        gathers must ride ICI only)."""
        loss_fn = stage1_loss_fn(PRIOR_CFG, noise_offset=0.0)
        params = prior_init(jax.random.PRNGKey(0), PRIOR_CFG)
        batch = stage1_batch(b=8)
        rng = jax.random.PRNGKey(5)
        cfg = TrainConfig(lr_warmup_steps=1, zero1=True)

        s1 = init_train_state(jax.tree.map(jnp.copy, params), cfg)
        f1 = make_train_step(loss_fn, cfg)
        s1, m1 = f1(s1, batch, rng)

        mesh = make_hybrid_mesh(2)
        s2 = init_train_state(jax.tree.map(jnp.copy, params), cfg)
        f2 = make_train_step(loss_fn, cfg, mesh=mesh)
        s2, m2 = f2(s2, shard_batch(batch, mesh), rng)

        np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                                   rtol=1e-5)
        for a, b in zip(jax.tree.leaves(s1["params"]),
                        jax.tree.leaves(s2["params"])):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-5)

        for leaf in jax.tree.leaves(s2["opt_state"]):
            spec = leaf.sharding.spec
            flat = [a for e in spec if e is not None
                    for a in ((e,) if isinstance(e, str) else e)]
            assert "dcn" not in flat, spec

    def test_zero1_shardings_rules(self):
        mesh = make_mesh()
        tree = {
            "big": jnp.zeros((1024, 64)),      # 64k -> sharded on dim 0
            "small": jnp.zeros((4, 4)),        # tiny -> replicated
            "odd": jnp.zeros((33333, 1)),      # indivisible -> replicated
        }
        shardings = zero1_shardings(tree, mesh)
        assert shardings["big"].spec[0] == "data"

        assert shardings["small"].spec == jax.sharding.PartitionSpec()
        assert shardings["odd"].spec == jax.sharding.PartitionSpec()


class TestEMA:
    """--use_ema for real: the reference declares the flag
    (src/configs/stage1_config.py:109) but its trainers never consume
    it; here the shadow updates every step with the diffusers decay
    ramp, shards replicated on the mesh, and round-trips checkpoints."""

    def test_ema_matches_hand_computed_blend(self):
        loss_fn = stage1_loss_fn(PRIOR_CFG, noise_offset=0.0)
        params = prior_init(jax.random.PRNGKey(0), PRIOR_CFG)
        batch = stage1_batch()
        cfg = TrainConfig(learning_rate=1e-3, lr_warmup_steps=1,
                          use_ema=True, ema_decay=0.9)

        # reference run without EMA: same grads, same params trajectory
        s0 = init_train_state(jax.tree.map(jnp.copy, params),
                              TrainConfig(learning_rate=1e-3,
                                          lr_warmup_steps=1))
        f0 = make_train_step(loss_fn,
                             TrainConfig(learning_rate=1e-3,
                                         lr_warmup_steps=1))
        expected = jax.tree.map(np.asarray, params)   # ema starts at init
        for t in range(3):
            rng = jax.random.PRNGKey(100 + t)
            s0, _ = f0(s0, batch, rng)
            d = min(0.9, (1 + t) / (10 + t))
            expected = jax.tree.map(
                lambda e, p: e * d + np.asarray(p) * (1 - d),
                expected, s0["params"])

        s1 = init_train_state(jax.tree.map(jnp.copy, params), cfg)
        f1 = make_train_step(loss_fn, cfg)
        for t in range(3):
            s1, _ = f1(s1, batch, jax.random.PRNGKey(100 + t))

        for a, b in zip(jax.tree.leaves(expected),
                        jax.tree.leaves(s1["ema_params"])):
            np.testing.assert_allclose(np.asarray(b), a, rtol=2e-5,
                                       atol=1e-6)
        # the raw params are unaffected by EMA tracking
        for a, b in zip(jax.tree.leaves(s0["params"]),
                        jax.tree.leaves(s1["params"])):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       atol=1e-6)

    def test_ema_blends_once_per_update_under_accumulation(self):
        """With optax.MultiSteps (gradient_accumulation_steps=K) the
        step runs per micro-batch; the EMA must blend only on the K-th
        micro-step (the real optimizer update) and count its decay ramp
        in updates, not micro-steps."""
        K = 2
        loss_fn = stage1_loss_fn(PRIOR_CFG, noise_offset=0.0)
        params = prior_init(jax.random.PRNGKey(0), PRIOR_CFG)
        batch = stage1_batch()
        base = dict(learning_rate=1e-3, lr_warmup_steps=1,
                    gradient_accumulation_steps=K)

        s0 = init_train_state(jax.tree.map(jnp.copy, params),
                              TrainConfig(**base))
        f0 = make_train_step(loss_fn, TrainConfig(**base))
        cfg = TrainConfig(**base, use_ema=True, ema_decay=0.5)
        s1 = init_train_state(jax.tree.map(jnp.copy, params), cfg)
        f1 = make_train_step(loss_fn, cfg)

        expected = jax.tree.map(np.asarray, params)
        updates_done = 0
        for i in range(2 * K + 1):           # 5 micro-steps, 2 updates
            rng = jax.random.PRNGKey(200 + i)
            s0, _ = f0(s0, batch, rng)
            s1, _ = f1(s1, batch, rng)
            if (i + 1) % K == 0:
                d = min(0.5, (1 + updates_done) / (10 + updates_done))
                expected = jax.tree.map(
                    lambda e, p: e * d + np.asarray(p) * (1 - d),
                    expected, s0["params"])
                updates_done += 1

        # 5th micro-step is not an update: ema reflects exactly the two
        # update-boundary blends
        for a, b in zip(jax.tree.leaves(expected),
                        jax.tree.leaves(s1["ema_params"])):
            np.testing.assert_allclose(np.asarray(b), a, rtol=2e-5,
                                       atol=1e-6)

    @pytest.mark.slow
    def test_ema_on_mesh_with_zero1_and_checkpoint(self, tmp_path):
        from pcdms_tpu.train import checkpoint as ckpt
        from pcdms_tpu.train.common import ema_params, shard_train_state

        loss_fn = stage1_loss_fn(PRIOR_CFG, noise_offset=0.0)
        params = prior_init(jax.random.PRNGKey(0), PRIOR_CFG)
        cfg = TrainConfig(lr_warmup_steps=1, zero1=True, use_ema=True)
        mesh = make_mesh()
        state = init_train_state(params, cfg)
        step = make_train_step(loss_fn, cfg, mesh=mesh)
        state, _ = step(state, shard_batch(stage1_batch(b=8), mesh),
                        jax.random.PRNGKey(1))
        # ema shadow is replicated, never ZeRO-sharded
        for leaf in jax.tree.leaves(state["ema_params"]):
            assert leaf.sharding.spec == jax.sharding.PartitionSpec()

        ckpt.save_checkpoint(str(tmp_path), 1, state)
        template = init_train_state(
            prior_init(jax.random.PRNGKey(9), PRIOR_CFG), cfg)
        restored, _, rstep = ckpt.restore_checkpoint(str(tmp_path),
                                                     template)
        assert rstep == 1
        for a, b in zip(jax.tree.leaves(state["ema_params"]),
                        jax.tree.leaves(restored["ema_params"])):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # restored state steps again on the mesh (resume path)
        restored = shard_train_state(restored, cfg, mesh)
        restored, m = step(restored, shard_batch(stage1_batch(b=8), mesh),
                           jax.random.PRNGKey(2))
        assert np.isfinite(float(m["loss"]))
        assert ema_params(restored) is restored["ema_params"]


class TestPreemption:
    def test_sigterm_checkpoints_and_stops(self, tmp_path):
        """SIGTERM mid-run stops at the next step boundary, writes a final
        checkpoint at the interrupted step, and restores the previous
        signal handler (reference has no preemption handling at all)."""
        import signal

        from pcdms_tpu.train import checkpoint as ckpt
        from pcdms_tpu.train.loop import run_training

        before = signal.getsignal(signal.SIGTERM)
        loss_fn = stage1_loss_fn(PRIOR_CFG, noise_offset=0.0)
        params = prior_init(jax.random.PRNGKey(0), PRIOR_CFG)

        def batches():
            for i in range(100):
                if i == 3:  # delivered synchronously in the main thread
                    signal.raise_signal(signal.SIGTERM)
                yield stage1_batch()

        state = run_training(
            loss_fn, params, batches(), TCFG, output_dir=str(tmp_path),
            checkpointing_steps=1000, max_train_steps=100, log_every=1000)

        assert int(state["step"]) == 3          # stopped, not exhausted
        assert ckpt.latest_step(str(tmp_path)) == 3
        assert signal.getsignal(signal.SIGTERM) is before


class TestCheckpoint:
    def test_save_restore_roundtrip(self, tmp_path):
        from pcdms_tpu.train import checkpoint as ckpt
        params = prior_init(jax.random.PRNGKey(0), PRIOR_CFG)
        state = init_train_state(params, TCFG)
        ckpt.save_checkpoint(str(tmp_path / "ck"), 42, state, epoch=3)
        assert ckpt.latest_step(str(tmp_path / "ck")) == 42
        restored, epoch, step = ckpt.restore_checkpoint(
            str(tmp_path / "ck"), state)
        assert epoch == 3 and step == 42
        a = jax.tree.leaves(state["params"])
        b = jax.tree.leaves(restored["params"])
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    def test_latest_step_empty_dir(self, tmp_path):
        from pcdms_tpu.train import checkpoint as ckpt
        assert ckpt.latest_step(str(tmp_path / "missing")) is None

    @pytest.mark.slow
    def test_mesh_sharded_zero1_resume_parity(self, tmp_path):
        """Save a ZeRO-1-sharded state mid-run on the 8-device mesh,
        restore into a fresh (unsharded) ``init_train_state`` template,
        continue — and match an uninterrupted run step for step. This is
        the subsystem the reference's DeepSpeed resume
        (stage1_train_prior_model.py:48-63) implements with
        mp_rank-specific shard files; here orbax saves the distributed
        arrays and jit input resharding re-shards the restored state."""
        from pcdms_tpu.train import checkpoint as ckpt

        mesh = make_mesh()
        cfg = TrainConfig(learning_rate=1e-3, lr_warmup_steps=1,
                          zero1=True)
        # large enough that zero1_shardings' min-size rule actually
        # shards optimizer-state leaves (>= 2^14 elements)
        prior_cfg = PriorConfig(num_heads=4, head_dim=32, num_layers=2,
                                embedding_dim=128, pose_hidden=64)
        loss_fn = stage1_loss_fn(prior_cfg, noise_offset=0.0)
        params = prior_init(jax.random.PRNGKey(0), prior_cfg)
        keys = [jax.random.PRNGKey(100 + i) for i in range(5)]

        def big_batch():
            rng = np.random.default_rng(0)
            return {
                "s_embed": rng.normal(size=(8, 128)).astype(np.float32),
                "t_embed": rng.normal(size=(8, 128)).astype(np.float32),
                "s_pose": rng.random((8, 36)).astype(np.float32),
                "t_pose": rng.random((8, 36)).astype(np.float32),
            }

        batches = [shard_batch(big_batch(), mesh) for _ in range(5)]

        # --- uninterrupted 5-step run
        s_ref = init_train_state(jax.tree.map(jnp.copy, params), cfg)
        f_ref = make_train_step(loss_fn, cfg, mesh=mesh)
        ref_losses = []
        for k, b in zip(keys, batches):
            s_ref, m = f_ref(s_ref, b, k)
            ref_losses.append(float(m["loss"]))

        # --- interrupted run: 3 steps, checkpoint the *sharded* state
        s_a = init_train_state(jax.tree.map(jnp.copy, params), cfg)
        f_a = make_train_step(loss_fn, cfg, mesh=mesh)
        for k, b in zip(keys[:3], batches[:3]):
            s_a, _ = f_a(s_a, b, k)
        opt_leaves = jax.tree.leaves(s_a["opt_state"])
        assert any(
            l.sharding.spec != jax.sharding.PartitionSpec()
            for l in opt_leaves if hasattr(l, "sharding")
        ), "ZeRO-1 state should actually be sharded on the mesh"
        ckpt.save_checkpoint(str(tmp_path / "ck"), 3, s_a)

        # --- fresh process equivalent: new template, restore, continue
        from pcdms_tpu.train.common import shard_train_state
        template = init_train_state(jax.tree.map(jnp.copy, params), cfg)
        restored, _, step = ckpt.restore_checkpoint(
            str(tmp_path / "ck"), template)
        assert step == 3
        f_b = make_train_step(loss_fn, cfg, mesh=mesh)
        s_b = shard_train_state(restored, cfg, mesh)
        cont_losses = []
        for k, b in zip(keys[3:], batches[3:]):
            s_b, m = f_b(s_b, b, k)
            cont_losses.append(float(m["loss"]))

        np.testing.assert_allclose(cont_losses, ref_losses[3:], rtol=1e-6)
        for a, b in zip(jax.tree.leaves(s_ref["params"]),
                        jax.tree.leaves(s_b["params"])):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-6)


class TestGradAccumulation:
    def test_multisteps_updates_every_k(self):
        cfg = TrainConfig(gradient_accumulation_steps=2,
                          lr_scheduler="constant")
        loss_fn = stage1_loss_fn(PRIOR_CFG, noise_offset=0.0)
        params = prior_init(jax.random.PRNGKey(0), PRIOR_CFG)
        state = init_train_state(params, cfg)
        step = make_train_step(loss_fn, cfg)
        p0 = jax.tree.leaves(state["params"])[0].copy()
        state, _ = step(state, stage1_batch(), jax.random.PRNGKey(1))
        p1 = jax.tree.leaves(state["params"])[0]
        # first micro-step: no update yet
        np.testing.assert_array_equal(np.asarray(p0), np.asarray(p1))
        state, _ = step(state, stage1_batch(), jax.random.PRNGKey(2))
        p2 = jax.tree.leaves(state["params"])[0]
        assert not np.array_equal(np.asarray(p0), np.asarray(p2))


class TestRunTrainingCheckpointCadence:
    def test_final_save_skipped_when_cadence_already_saved(self, tmp_path):
        """When max_train_steps is a multiple of checkpointing_steps the
        in-loop save covers the final step; the closing save must not
        re-save it (orbax raises StepAlreadyExistsError on duplicates),
        and resuming an already-finished run must also be a no-op."""
        import numpy as np
        from pcdms_tpu.train import checkpoint as ckpt
        from pcdms_tpu.train.common import TrainConfig
        from pcdms_tpu.train.loop import run_training

        def loss_fn(params, batch, rng):
            loss = jnp.mean((params["w"] * batch["x"]) ** 2)
            return loss, {"loss": loss}

        params = {"w": jnp.ones((4,))}
        cfg = TrainConfig(learning_rate=1e-3, max_train_steps=4)

        def batches():
            while True:
                yield {"x": np.ones((2, 4), np.float32)}

        out = str(tmp_path)
        run_training(loss_fn, params, batches(), cfg,
                     output_dir=out, checkpointing_steps=2, log_every=100)
        assert ckpt.latest_step(out) == 4

        # resumed, already-finished run: loop body never executes and the
        # restored step must not be re-saved
        run_training(loss_fn, params, batches(), cfg,
                     output_dir=out, checkpointing_steps=2, log_every=100,
                     resume_from_checkpoint=True)
        assert ckpt.latest_step(out) == 4

    def test_final_save_written_off_cadence(self, tmp_path):
        import numpy as np
        from pcdms_tpu.train import checkpoint as ckpt
        from pcdms_tpu.train.common import TrainConfig
        from pcdms_tpu.train.loop import run_training

        def loss_fn(params, batch, rng):
            loss = jnp.mean((params["w"] * batch["x"]) ** 2)
            return loss, {"loss": loss}

        cfg = TrainConfig(learning_rate=1e-3, max_train_steps=3)

        def batches():
            while True:
                yield {"x": np.ones((2, 4), np.float32)}

        out = str(tmp_path)
        run_training(loss_fn, {"w": jnp.ones((4,))}, batches(), cfg,
                     output_dir=out, checkpointing_steps=2, log_every=100)
        assert ckpt.latest_step(out) == 3
