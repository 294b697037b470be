"""VAE pre-training loss (synthetic-world / tiny-config support).

The reference never trains its VAE — it ships SD-2.1's frozen
autoencoder (/root/reference/stage2_train_inpaint_model.py:181). The
tiny-geometry CI configs have no such pretrained autoencoder, and a
*random* VAE decoder would make stage-2/3 pixel outputs garbage no
matter how well the UNets learn — so the end-to-end learning proof
(scripts/learning_proof.py) first fits the tiny VAE on the synthetic
world with this loss and freezes it into the shared encoder bundle
(train/frozen.py), exactly the role SD-2.1's VAE plays at full scale.

Standard VAE objective: posterior-sample reconstruction MSE plus a
(small) KL regularizer — the same shape as the stable-diffusion
autoencoder's training loss, minus the adversarial/perceptual terms
that need a discriminator/LPIPS net.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pcdms_tpu.models.vae import (
    VAEConfig, vae_decode, vae_encode_moments,
)


def vae_pretrain_loss_fn(cfg: VAEConfig = VAEConfig(),
                         kl_weight: float = 1e-6,
                         compute_dtype=jnp.float32):
    """loss_fn(params, batch, rng) -> (loss, metrics) for the shared
    SPMD train harness (train/common.py). batch: {"image": (B, H, W, 3)
    in [-1, 1]}. params is the VAE tree itself."""

    def loss_fn(params, batch, rng):
        x = batch["image"].astype(compute_dtype)
        p = jax.tree.map(lambda a: a.astype(compute_dtype), params)
        mean, logvar = vae_encode_moments(p, x, cfg)
        z = mean + jnp.exp(0.5 * logvar) * jax.random.normal(
            rng, mean.shape, mean.dtype)
        recon = vae_decode(p, z * cfg.scaling_factor, cfg)
        mse = jnp.mean((recon.astype(jnp.float32)
                        - x.astype(jnp.float32)) ** 2)
        kl = 0.5 * jnp.mean(
            jnp.sum(jnp.square(mean) + jnp.exp(logvar) - 1.0 - logvar,
                    axis=(1, 2, 3)).astype(jnp.float32))
        loss = mse + kl_weight * kl
        return loss, {"loss": loss, "mse": mse, "kl": kl}

    return loss_fn
