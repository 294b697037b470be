"""Stage-3 refinement pipeline: img2img polish of the stage-2 output.

Mirrors ``Stage3_RefinedPipeline.__call__``
(/root/reference/src/pipelines/stage3_refined_pipeline.py:443-565): the
stage-2 generated image's VAE latents are concatenated with the noisy
latents (8 channels total) and denoised conditioned on projected DINOv2
source features; CFG zeroes both the features and the gen-latents.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from pcdms_tpu.diffusion.guidance import apply_cfg
from pcdms_tpu.diffusion.schedules import sd21_schedule
from pcdms_tpu.models.projections import image_proj_mlp_apply
from pcdms_tpu.models.unet2d import (
    UNetConfig, unet_apply,
)
from pcdms_tpu.models.vae import VAEConfig, vae_decode, vae_encode
from pcdms_tpu.pipelines.sampling import SAMPLERS
from pcdms_tpu.utils.tree import cast_pytree


@functools.partial(
    jax.jit,
    static_argnames=("unet_cfg", "vae_cfg", "num_steps",
                     "guidance_scale", "guidance_rescale",
                     "scheduler", "num_samples", "compute_dtype",
                     "decode", "unroll", "eta",
                     "encoder_cache_interval", "deterministic_vae"),
)
def stage3_generate(params, gen_image, dino_features, rng, latents=None, *,
                    unet_cfg: UNetConfig,
                    vae_cfg: VAEConfig = VAEConfig(),
                    num_steps: int = 20,
                    guidance_scale: float = 2.0,
                    guidance_rescale: float = 0.0,
                    scheduler: str = "unipc",
                    num_samples: int = 1,
                    compute_dtype=jnp.bfloat16,
                    decode: bool = True,
                    unroll: int = 1,
                    eta: float = 0.0,
                    encoder_cache_interval: int = 1,
                    deterministic_vae: bool = False):
    """Refine stage-2 outputs.

    params: {"unet", "image_proj", "vae"}.
    gen_image: (B, H, W, 3) stage-2 generated target image in [-1, 1].
    dino_features: (B, 257, 1536) DINOv2 features of the *source* image.
    Returns (B*num_samples, H, W, 3) refined images in [-1, 1].

    encoder_cache_interval > 1 enables encoder-propagation sampling
    (see stage2_inpaint.stage2_generate; default 1 = exact).
    """
    schedule = sd21_schedule()
    cparams = cast_pytree(params, compute_dtype)
    use_cfg = guidance_scale > 1.0
    b, img_h, img_w, _ = gen_image.shape
    lh, lw = img_h // 8, img_w // 8

    rng_latents, rng_vae = jax.random.split(rng)

    feature_f = image_proj_mlp_apply(cparams["image_proj"],
                                     dino_features.astype(compute_dtype))
    # posterior mean instead of sample when deterministic_vae — makes the
    # output a pure function of per-request inputs for the serving layer
    # (see stage2_inpaint.stage2_generate); default keeps .sample()
    gen_latents = vae_encode(cparams["vae"], gen_image.astype(compute_dtype),
                             rng=None if deterministic_vae else rng_vae,
                             cfg=vae_cfg).astype(jnp.float32)

    def tile(x):
        return jnp.concatenate([x] * num_samples, 0)

    feature_f = tile(feature_f)
    gen_latents = tile(gen_latents)
    n = b * num_samples

    if use_cfg:
        feature_f = jnp.concatenate(
            [jnp.zeros_like(feature_f), feature_f], axis=0)
        gen_d = jnp.concatenate(
            [jnp.zeros_like(gen_latents), gen_latents], axis=0)
    else:
        gen_d = gen_latents
    gen_d = gen_d.astype(compute_dtype)

    zp = n if use_cfg else 0

    def make_inp(x, t):
        lat = jnp.concatenate([x] * 2, 0) if use_cfg else x
        inp = jnp.concatenate([lat.astype(compute_dtype), gen_d], axis=-1)
        return inp, jnp.broadcast_to(t, (inp.shape[0],))

    def model_eps(x, t):
        inp, tt = make_inp(x, t)
        eps = unet_apply(cparams["unet"], unet_cfg, inp, tt, feature_f,
                         zero_ctx_prefix=zp)
        eps = eps.astype(jnp.float32)
        if use_cfg:
            eps = apply_cfg(eps, guidance_scale, guidance_rescale)
        return eps

    model_carry = None
    if encoder_cache_interval > 1:
        from pcdms_tpu.pipelines.sampling import encoder_prop_model_eps
        model_eps, model_carry = encoder_prop_model_eps(   # noqa: F811
            cparams["unet"], unet_cfg, make_inp, feature_f,
            interval=encoder_cache_interval, latent_shape=(n, lh, lw, 4),
            zero_ctx_prefix=zp, use_cfg=use_cfg,
            guidance_scale=guidance_scale,
            guidance_rescale=guidance_rescale,
            compute_dtype=compute_dtype)

    if latents is not None:
        x_init = latents.astype(jnp.float32)
    else:
        x_init = jax.random.normal(rng_latents, (n, lh, lw, 4), jnp.float32)
    if scheduler == "ddim" and eta > 0.0:
        from pcdms_tpu.pipelines.sampling import ddim_sample_loop
        # fold_in: rng was already split above (re-splitting would alias
        # rng_eta with rng_vae)
        rng_eta = jax.random.fold_in(rng, 7)
        latents = ddim_sample_loop(schedule, model_eps, x_init, num_steps,
                                   unroll, eta=eta, rng=rng_eta,
                                   model_carry=model_carry)
    else:
        latents = SAMPLERS[scheduler](schedule, model_eps, x_init,
                                      num_steps, unroll,
                                      model_carry=model_carry)

    if not decode:
        return latents
    images = vae_decode(cparams["vae"], latents.astype(compute_dtype),
                        cfg=vae_cfg)
    return images.astype(jnp.float32)
