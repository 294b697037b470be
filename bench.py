"""North-star benchmark: stage-2 512px (512x1024 canvas) 50-step DDIM
sampling throughput, images/sec/chip.

Runs the full jitted stage-2 pipeline (VAE encode + pose/image projections
+ CFG-batched UNet denoising scan + VAE decode) with random weights (perf
is weight-independent) on the available accelerator.

Baseline: the reference publishes no latency numbers; the 0.25
images/sec/chip A100 figure for this workload (512x1024 canvas, 50 steps,
CFG on, SD-2.1 9ch UNet, xformers fp16, diffusers DDIM loop) is an
ESTIMATE derived in BASELINE.md ("A100 throughput baseline used by
bench.py"): public 512px SD-2.1 A100 anchor (~0.7 img/s) scaled by the
2x-area / 4x-attention workload (~2.5x). ``vs_baseline`` is relative to
that estimate and tagged "baseline": "estimated" in the output.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "images/sec/chip", "vs_baseline": N}
"""

import json
import os
import sys
import time


def main():
    import jax
    import jax.numpy as jnp

    from pcdms_tpu.models.projections import (
        image_proj_mlp_init, pose_cond_embedding_init,
    )
    from pcdms_tpu.models.unet2d import stage2_unet_config, unet_init
    from pcdms_tpu.models.vae import vae_init
    from pcdms_tpu.pipelines.stage2_inpaint import stage2_generate

    batch = int(os.environ.get("BENCH_BATCH", "8"))   # measured sweet spot
                                                      # (b4 .514, b8 .543,
                                                      #  b16 .526 on v5e-1)
    steps = int(os.environ.get("BENCH_STEPS", "50"))
    height = int(os.environ.get("BENCH_HEIGHT", "512"))
    width = 2 * height                     # [source | target] canvas
    reps = int(os.environ.get("BENCH_REPS", "3"))
    unroll = int(os.environ.get("BENCH_UNROLL", "2"))
    fused_conv = os.environ.get("BENCH_FUSED_CONV", "0") == "1"
    sched = os.environ.get("BENCH_SCHEDULER", "ddim")

    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)

    unet_cfg = stage2_unet_config()
    if fused_conv:
        import dataclasses
        unet_cfg = dataclasses.replace(unet_cfg, fused_conv=True)
    params = {
        "unet": unet_init(k1, unet_cfg),
        "image_proj": image_proj_mlp_init(k2),
        "pose_proj": pose_cond_embedding_init(k3),
        "vae": vae_init(k4),
    }

    vae_image = jnp.zeros((batch, height, width, 3), jnp.float32)
    st_pose = jnp.zeros((batch, height, width, 3), jnp.float32)
    dino = jax.random.normal(k5, (batch, 257, 1536), jnp.float32)
    t_embed = jnp.ones((batch, 1, 1024), jnp.float32)

    # shard the batch over all local chips (the jitted pipeline follows
    # the input sharding) so dividing by n_chips below is honest on
    # multi-chip hosts; with one chip (the tunnel) this is a no-op
    n_chips = jax.device_count()
    if n_chips > 1 and batch % n_chips == 0:
        from pcdms_tpu.parallel.mesh import batch_sharding, make_mesh
        sharding = batch_sharding(make_mesh())
        vae_image, st_pose, dino, t_embed = (
            jax.device_put(x, sharding)
            for x in (vae_image, st_pose, dino, t_embed))
    else:
        n_chips = 1

    def run(seed):
        return stage2_generate(
            params, vae_image, st_pose, dino, t_embed,
            jax.random.PRNGKey(seed), unet_cfg=unet_cfg, num_steps=steps,
            guidance_scale=2.0, scheduler=sched, unroll=unroll)

    # Reduce on device and read ONE scalar back: under the remote-TPU
    # tunnel block_until_ready() does not actually block, and transferring
    # full images through the relay would dominate the measurement.
    from pcdms_tpu.utils.profiling import sync

    # warmup / compile (the scalar read inside sync() is the real
    # synchronization)
    sync(run(0))

    t0 = time.perf_counter()
    for i in range(reps):
        sync(run(i + 1))
    dt = time.perf_counter() - t0

    imgs_per_sec_chip = (batch * reps) / dt / n_chips
    # estimated A100 img/s/GPU at this workload; derivation in BASELINE.md
    # ("A100 throughput baseline used by bench.py")
    baseline_a100 = 0.25
    print(json.dumps({
        "metric": f"stage2 {height}px {steps}-step "
                  f"{sched.upper()} sampling",
        "value": round(imgs_per_sec_chip, 4),
        "unit": "images/sec/chip",
        "vs_baseline": round(imgs_per_sec_chip / baseline_a100, 3),
        "baseline": "estimated A100 0.25 img/s (BASELINE.md)",
    }))


if __name__ == "__main__":
    sys.exit(main())
