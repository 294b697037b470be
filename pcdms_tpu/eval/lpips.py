"""LPIPS (AlexNet variant) in JAX.

Architecture-parity port of the ``lpips.LPIPS(net='alex')`` metric the
reference uses (/root/reference/metrics.py:441-453): AlexNet conv
features after each of the five ReLUs, channel-unit-normalized, squared
differences weighted by the calibrated 1x1 ``lin`` heads, spatially
averaged and summed over layers. Inputs are in [-1, 1] and shifted/scaled
by the LPIPS normalization constants.

Weights (torch ``lpips`` package: ``net.slice*``/features numbering +
``lin{0..4}.model.1.weight``) must be provided locally.
"""

from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)

# AlexNet feature config: (out_ch, kernel, stride, pad), maxpool after
# layers 0 and 1; relu taps after every conv
_ALEX = [(64, 11, 4, 2), (192, 5, 1, 2), (384, 3, 1, 1), (256, 3, 1, 1),
         (256, 3, 1, 1)]


def _conv(p, x, stride, pad):
    y = jax.lax.conv_general_dilated(
        x, p["kernel"].astype(x.dtype), (stride, stride),
        ((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + p["bias"].astype(x.dtype)


def _max_pool(x):
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, (1, 3, 3, 1),
                                 (1, 2, 2, 1), "VALID")


def alexnet_features(params: List, x) -> List:
    """x: (B, H, W, 3) in [-1, 1] (pre-normalized) -> 5 feature maps."""
    feats = []
    for i, (_, k, s, pad) in enumerate(_ALEX):
        x = jax.nn.relu(_conv(params[i], x, s, pad))
        feats.append(x)
        if i in (0, 1):
            x = _max_pool(x)
    return feats


def _unit_normalize(x, eps=1e-10):
    norm = jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True))
    return x / (norm + eps)


def lpips_distance(params: Dict, img1, img2):
    """img1/img2: (B, H, W, 3) in [-1, 1] -> (B,) LPIPS distances."""
    shift = jnp.asarray(_SHIFT, img1.dtype)
    scale = jnp.asarray(_SCALE, img1.dtype)
    x1 = (img1 - shift) / scale
    x2 = (img2 - shift) / scale
    f1 = alexnet_features(params["net"], x1)
    f2 = alexnet_features(params["net"], x2)

    total = 0.0
    for i in range(len(f1)):
        d = (_unit_normalize(f1[i]) - _unit_normalize(f2[i])) ** 2
        w = params["lins"][i].astype(d.dtype)          # (C,)
        total = total + jnp.mean(jnp.sum(d * w, axis=-1), axis=(1, 2))
    return total


def convert_lpips(sd: Dict[str, np.ndarray]):
    """torch lpips(alex) state dict -> JAX params.

    Accepts both 'net.slice1.0.weight'-style and flat
    'net.features.0.weight' naming; lin heads 'lin{i}.model.1.weight'."""
    conv_indices = [0, 3, 6, 8, 10]    # features.* numbering
    slices = [(1, 0), (2, 3), (3, 6), (4, 8), (5, 10)]

    net = []
    for (slice_idx, feat_idx), conv_i in zip(slices, conv_indices):
        for candidate in (
            f"net.slice{slice_idx}.{feat_idx}.weight",
            f"net.features.{feat_idx}.weight",
        ):
            if candidate in sd:
                w = sd[candidate]
                b = sd[candidate[:-len("weight")] + "bias"]
                break
        else:
            raise KeyError(f"conv {conv_i} not found in lpips state dict")
        net.append({
            "kernel": jnp.asarray(w.transpose(2, 3, 1, 0), jnp.float32),
            "bias": jnp.asarray(b, jnp.float32),
        })

    lins = []
    for i in range(5):
        for candidate in (f"lin{i}.model.1.weight",
                          f"lins.{i}.model.1.weight"):
            if candidate in sd:
                # (1, C, 1, 1) non-negative 1x1 conv -> (C,)
                lins.append(jnp.asarray(
                    sd[candidate].reshape(-1), jnp.float32))
                break
        else:
            raise KeyError(f"lin{i} not found in lpips state dict")

    return {"net": net, "lins": lins}


def lpips_from_disk(weights_path: str, files_1, files_2, img_size,
                    batch_size: int = 64) -> float:
    """Mean LPIPS over file lists (reference metrics.py:455-506)."""
    from pcdms_tpu.compat.load import load_state_dict
    from pcdms_tpu.eval.metrics import _load_resized

    params = convert_lpips(load_state_dict(weights_path))

    @jax.jit
    def dist(a, b):
        return lpips_distance(params, a, b)

    results = []
    n = len(files_1)
    batch_size = min(batch_size, n)
    for i in range(0, n - n % batch_size, batch_size):
        a = np.stack([_load_resized(f, img_size)
                      for f in files_1[i:i + batch_size]])
        b = np.stack([_load_resized(f, img_size)
                      for f in files_2[i:i + batch_size]])
        # the reference feeds [0, 1] images with lpips's default
        # normalize=False (metrics.py:484-494: imread/255 straight into
        # model.forward) — i.e. NO [-1, 1] rescale; reproduce exactly
        results.append(np.asarray(dist(
            jnp.asarray(a, jnp.float32),
            jnp.asarray(b, jnp.float32))))
    return float(np.mean(np.concatenate(results)))
