"""Model-FLOPs-Utilization (MFU) analysis for the north-star benchmark.

Computes the analytic FLOP cost of one stage-2 denoise step with XLA's
own HloCostAnalysis (``jit(fn).lower(...).cost_analysis()`` — shape-level,
no device or full compile needed) and divides the measured throughput by
the v5e peak to answer: how close to speed-of-light is the exact sampler?

Attention is counted through the ``use_flash=False`` XLA path so its
matmuls are visible to the analysis; the Pallas kernel computes the same
math (its FLOPs are identical, its *time* is what the bench measures).

Methodology notes:
  * the model FLOPs convention counts the CFG doubling (batch 2N) as real
    work, since the reference pays it too;
  * the per-step cost excludes VAE encode/decode + pose/image projections
    (one-off per sample, ~1/50th weight); they are reported separately;
  * v5e-1 bf16 dense peak: 197 TFLOP/s (public spec).

Run on CPU: JAX_PLATFORMS=cpu python scripts/mfu_analysis.py
"""

import dataclasses
import functools

import jax
import jax.numpy as jnp

from pcdms_tpu.models.prior_transformer import (
    PriorConfig, prior_apply, prior_init,
)
from pcdms_tpu.models.unet2d import (
    UNetConfig, stage2_unet_config, stage3_unet_config, unet_apply,
    unet_init,
)
from pcdms_tpu.models.vae import (
    VAEConfig, vae_decode, vae_encode, vae_init,
)

V5E_PEAK_TFLOPS = 197.0


def flops_of(fn, *args) -> float:
    """XLA HloCostAnalysis flops for fn at the given abstract shapes."""
    lowered = jax.jit(fn).lower(*args)
    try:
        cost = lowered.cost_analysis()
    except Exception:
        cost = lowered.compile().cost_analysis()
    if isinstance(cost, (list, tuple)):
        cost = cost[0]
    return float(cost["flops"])


def abstract_params(init_fn, *args):
    shapes = jax.eval_shape(lambda k: init_fn(k, *args),
                            jax.random.PRNGKey(0))
    return jax.tree.map(
        lambda s: jax.ShapeDtypeStruct(s.shape, jnp.bfloat16), shapes)


def unet_call_flops(cfg: UNetConfig, batch: int, h: int, w: int,
                    ctx_tokens: int) -> float:
    cfg = dataclasses.replace(cfg, use_flash=False)   # count via XLA math
    params = abstract_params(unet_init, cfg)
    x = jax.ShapeDtypeStruct((batch, h, w, cfg.in_channels), jnp.bfloat16)
    t = jax.ShapeDtypeStruct((batch,), jnp.float32)
    ctx = jax.ShapeDtypeStruct((batch, ctx_tokens, cfg.cross_attention_dim),
                               jnp.bfloat16)
    cl = (jax.ShapeDtypeStruct((batch, cfg.class_embed_proj_dim),
                               jnp.bfloat16)
          if cfg.class_embed_proj_dim else None)
    pose = jax.ShapeDtypeStruct((batch, h, w, cfg.block_out_channels[0]),
                                jnp.bfloat16)

    def fn(p, x, t, ctx, cl, pose):
        return unet_apply(p, cfg, x, t, ctx, class_labels=cl,
                          pose_cond=pose)

    return flops_of(fn, params, x, t, ctx, cl, pose)


def prior_call_flops(cfg: PriorConfig, batch: int) -> float:
    params = abstract_params(prior_init, cfg)
    e = cfg.embedding_dim
    x = jax.ShapeDtypeStruct((batch, e), jnp.float32)
    t = jax.ShapeDtypeStruct((batch,), jnp.float32)
    proj = jax.ShapeDtypeStruct((batch, e), jnp.float32)
    pose = jax.ShapeDtypeStruct((batch, 36), jnp.float32)

    def fn(p, x, t, proj, sp, tp):
        return prior_apply(p, cfg, x, t, proj, sp, tp)

    return flops_of(fn, params, x, t, proj, pose, pose)


def vae_flops(cfg: VAEConfig, batch: int, h: int, w: int):
    params = abstract_params(vae_init, cfg)
    img = jax.ShapeDtypeStruct((batch, h, w, 3), jnp.bfloat16)
    lat = jax.ShapeDtypeStruct((batch, h // 8, w // 8, 4), jnp.bfloat16)
    enc = flops_of(functools.partial(vae_encode, cfg=cfg), params, img)
    dec = flops_of(functools.partial(vae_decode, cfg=cfg), params, lat)
    return enc, dec


def attention_matmul_flops(cfg: UNetConfig, batch: int, h: int, w: int,
                           ctx_tokens: int) -> float:
    """Analytic QK^T + PV matmul FLOPs per UNet call (the work that runs
    at the measured ~60-69 TF/s flash-kernel ceiling rather than near
    conv/matmul peak). Counts the t2d blocks per level like the step
    decomposition in PERF.md: self-attention 4*L^2*ch, cross-attention
    4*L*ctx*ch (uncond half of cross is skipped analytically at CFG,
    halving it; we count it fully — a conservative overestimate)."""
    levels = []
    hh, ww = h, w
    for i, ch in enumerate(cfg.block_out_channels):
        # t2d count per level: layers_per_block in the down path +
        # (layers_per_block + 1) in the up path
        if cfg.cross_attn_down[i]:
            levels.append((hh * ww, ch, 2 * cfg.layers_per_block + 1))
        if i < len(cfg.block_out_channels) - 1:
            hh, ww = hh // 2, ww // 2
    # the mid block's single t2d runs at the bottleneck resolution
    # (after ALL downsamples — unet2d.unet_encode), not at the deepest
    # attention level's resolution
    levels.append((hh * ww, cfg.block_out_channels[-1], 1))
    total = 0.0
    for tokens, ch, count in levels:
        self_f = 4.0 * tokens * tokens * ch
        cross_f = 4.0 * tokens * ctx_tokens * ch
        total += count * (self_f + cross_f)
    return batch * total


def main():
    H, W = 512, 512                     # target size; canvas is (H, 2W)
    lh, lw = H // 8, 2 * W // 8          # 64 x 128 latent
    batch = 8                            # bench default
    cfg2 = stage2_unet_config()

    # --- stage-2 north star: 50-step DDIM, CFG batch 2N ---
    f_unet = unet_call_flops(cfg2, 2 * batch, lh, lw, 258)
    enc, dec = vae_flops(VAEConfig(), batch, H, 2 * W)
    steps = 50
    f_batch = steps * f_unet + enc + dec
    f_img = f_batch / batch

    print(f"stage-2 UNet fwd (CFG batch {2*batch}, {lh}x{lw}): "
          f"{f_unet/1e12:.3f} TFLOP")
    f_attn = attention_matmul_flops(cfg2, 2 * batch, lh, lw, 258)
    share = f_attn / f_unet
    print(f"  attention matmul share: {f_attn/1e12:.3f} TFLOP "
          f"({share*100:.1f}% of the call)")
    # attention-limited composite bound: attention share at the measured
    # v5e flash ceiling (PERF.md official-kernel A/B: ~60-69 TF/s for
    # d=64), everything else at peak
    for att_tfs in (60.0, 69.0):
        bound = 1.0 / (share / att_tfs + (1 - share) / V5E_PEAK_TFLOPS)
        print(f"  attention-limited bound @ {att_tfs:.0f} TF/s attention: "
              f"{bound:.1f} TF/s")
    print(f"VAE encode/decode (batch {batch}, {H}x{2*W}): "
          f"{enc/1e12:.3f} / {dec/1e12:.3f} TFLOP")
    print(f"per generated image ({steps}-step CFG): {f_img/1e12:.3f} TFLOP")

    # per-image FLOPs at k steps: the VAE encode/decode is one-off per
    # image, only the UNet calls scale with the step count
    def f_img_at(k):
        return (k * f_unet + enc + dec) / batch

    for label, rate, k in [("50-step DDIM (headline)", 0.541, 50),
                           ("50-step DDIM enc-prop/2 (approx)", 0.652, 50),
                           ("20-step UniPC (reference protocol)",
                            1.254, 20)]:
        fi = f_img_at(k)
        mfu = rate * fi / (V5E_PEAK_TFLOPS * 1e12) * 100
        # enc-prop skips encoder work, so its number is EFFECTIVE TF/s
        # (exact-model FLOPs / wall-clock), not hardware utilization
        kind = "effective" if "enc-prop" in label else "sustained"
        print(f"  {label}: {rate} img/s/chip -> "
              f"{rate*fi/1e12:.1f} TF/s {kind} = {mfu:.1f}% MFU")

    # --- cascade at the reference protocol (20 steps each) ---
    cfg3 = stage3_unet_config()
    f_unet3 = unet_call_flops(cfg3, 2 * batch, lh, lw // 2, 257)
    f_prior = prior_call_flops(PriorConfig(), batch)
    enc3, dec3 = vae_flops(VAEConfig(), batch, H, W)
    f_casc_img = (20 * (f_unet + f_unet3 + f_prior)
                  + enc + dec + enc3 + dec3) / batch
    print(f"stage-3 UNet fwd (CFG batch {2*batch}, {lh}x{lw//2}): "
          f"{f_unet3/1e12:.3f} TFLOP")
    print(f"prior fwd (batch {batch}): {f_prior/1e9:.2f} GFLOP")
    print(f"cascade per refined image (20-step): "
          f"{f_casc_img/1e12:.3f} TFLOP")
    rate = 0.891
    mfu = rate * f_casc_img / (V5E_PEAK_TFLOPS * 1e12) * 100
    print(f"  cascade: {rate} img/s/chip -> {rate*f_casc_img/1e12:.1f} "
          f"TF/s sustained = {mfu:.1f}% MFU")


if __name__ == "__main__":
    main()
