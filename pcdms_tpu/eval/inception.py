"""InceptionV3 pool3 feature extractor for FID, in JAX (NHWC).

Architecture-parity port of the FID InceptionV3 the reference uses
(/root/reference/inception.py — pool3, 2048-d, with the FID-specific
pooling quirks: avg-pool with count_include_pad=False in the A/C/E
blocks and a MAX branch-pool in the final E block). BatchNorm (eps 1e-3)
is folded into the conv weights at conversion time.

Weights must be supplied locally (pt_inception-2015-12-05 or torchvision
inception_v3; key layout ``Mixed_5b.branch1x1.conv.weight`` etc.) — this
environment cannot download them. Input protocol matches the reference:
images in [0, 1], bilinear-resized to 299, scaled to [-1, 1]
(inception.py forward: resize_input=True, normalize_input=True).
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# primitive ops
# ---------------------------------------------------------------------------

def _conv(params, x, stride=1, padding="VALID"):
    y = jax.lax.conv_general_dilated(
        x, params["kernel"].astype(x.dtype),
        window_strides=(stride, stride), padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return jax.nn.relu(y + params["bias"].astype(x.dtype))


def _max_pool(x, window=3, stride=2, padding="VALID"):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, window, window, 1),
        (1, stride, stride, 1), padding)


def _avg_pool_nip(x, window=3):
    """3x3 stride-1 avg pool, padding 1, count_include_pad=False."""
    pad = ((0, 0), (1, 1), (1, 1), (0, 0))
    summed = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, window, window, 1), (1, 1, 1, 1), pad)
    ones = jnp.ones(x.shape[:3] + (1,), x.dtype)
    counts = jax.lax.reduce_window(
        ones, 0.0, jax.lax.add, (1, window, window, 1), (1, 1, 1, 1), pad)
    return summed / counts


# ---------------------------------------------------------------------------
# inception blocks
# ---------------------------------------------------------------------------

def _inception_a(p, x):
    b1 = _conv(p["branch1x1"], x)
    b5 = _conv(p["branch5x5_2"], _conv(p["branch5x5_1"], x),
               padding=((2, 2), (2, 2)))
    b3 = _conv(p["branch3x3dbl_1"], x)
    b3 = _conv(p["branch3x3dbl_2"], b3, padding=((1, 1), (1, 1)))
    b3 = _conv(p["branch3x3dbl_3"], b3, padding=((1, 1), (1, 1)))
    bp = _conv(p["branch_pool"], _avg_pool_nip(x))
    return jnp.concatenate([b1, b5, b3, bp], axis=-1)


def _inception_b(p, x):
    b3 = _conv(p["branch3x3"], x, stride=2)
    bd = _conv(p["branch3x3dbl_1"], x)
    bd = _conv(p["branch3x3dbl_2"], bd, padding=((1, 1), (1, 1)))
    bd = _conv(p["branch3x3dbl_3"], bd, stride=2)
    bp = _max_pool(x)
    return jnp.concatenate([b3, bd, bp], axis=-1)


def _inception_c(p, x):
    b1 = _conv(p["branch1x1"], x)
    b7 = _conv(p["branch7x7_1"], x)
    b7 = _conv(p["branch7x7_2"], b7, padding=((0, 0), (3, 3)))
    b7 = _conv(p["branch7x7_3"], b7, padding=((3, 3), (0, 0)))
    bd = _conv(p["branch7x7dbl_1"], x)
    bd = _conv(p["branch7x7dbl_2"], bd, padding=((3, 3), (0, 0)))
    bd = _conv(p["branch7x7dbl_3"], bd, padding=((0, 0), (3, 3)))
    bd = _conv(p["branch7x7dbl_4"], bd, padding=((3, 3), (0, 0)))
    bd = _conv(p["branch7x7dbl_5"], bd, padding=((0, 0), (3, 3)))
    bp = _conv(p["branch_pool"], _avg_pool_nip(x))
    return jnp.concatenate([b1, b7, bd, bp], axis=-1)


def _inception_d(p, x):
    b3 = _conv(p["branch3x3_2"], _conv(p["branch3x3_1"], x), stride=2)
    b7 = _conv(p["branch7x7x3_1"], x)
    b7 = _conv(p["branch7x7x3_2"], b7, padding=((0, 0), (3, 3)))
    b7 = _conv(p["branch7x7x3_3"], b7, padding=((3, 3), (0, 0)))
    b7 = _conv(p["branch7x7x3_4"], b7, stride=2)
    bp = _max_pool(x)
    return jnp.concatenate([b3, b7, bp], axis=-1)


def _inception_e(p, x, max_branch_pool: bool):
    b1 = _conv(p["branch1x1"], x)
    b3 = _conv(p["branch3x3_1"], x)
    b3 = jnp.concatenate([
        _conv(p["branch3x3_2a"], b3, padding=((0, 0), (1, 1))),
        _conv(p["branch3x3_2b"], b3, padding=((1, 1), (0, 0))),
    ], axis=-1)
    bd = _conv(p["branch3x3dbl_1"], x)
    bd = _conv(p["branch3x3dbl_2"], bd, padding=((1, 1), (1, 1)))
    bd = jnp.concatenate([
        _conv(p["branch3x3dbl_3a"], bd, padding=((0, 0), (1, 1))),
        _conv(p["branch3x3dbl_3b"], bd, padding=((1, 1), (0, 0))),
    ], axis=-1)
    if max_branch_pool:
        bp = _max_pool(x, 3, 1, ((0, 0), (1, 1), (1, 1), (0, 0)))
    else:
        bp = _avg_pool_nip(x)
    bp = _conv(p["branch_pool"], bp)
    return jnp.concatenate([b1, b3, bd, bp], axis=-1)


# ---------------------------------------------------------------------------
# full network
# ---------------------------------------------------------------------------

_STEM = ["Conv2d_1a_3x3", "Conv2d_2a_3x3", "Conv2d_2b_3x3",
         "Conv2d_3b_1x1", "Conv2d_4a_3x3"]
_BLOCKS = (["Mixed_5b", "Mixed_5c", "Mixed_5d", "Mixed_6a", "Mixed_6b",
            "Mixed_6c", "Mixed_6d", "Mixed_6e", "Mixed_7a", "Mixed_7b",
            "Mixed_7c"])


def inception_pool3(params: Dict, x):
    """x: (B, H, W, 3) in [0, 1] -> (B, 2048) pool3 features."""
    x = jax.image.resize(x, (x.shape[0], 299, 299, 3), method="bilinear")
    x = 2.0 * x - 1.0

    x = _conv(params["Conv2d_1a_3x3"], x, stride=2)
    x = _conv(params["Conv2d_2a_3x3"], x)
    x = _conv(params["Conv2d_2b_3x3"], x, padding=((1, 1), (1, 1)))
    x = _max_pool(x)
    x = _conv(params["Conv2d_3b_1x1"], x)
    x = _conv(params["Conv2d_4a_3x3"], x)
    x = _max_pool(x)

    for name in ("Mixed_5b", "Mixed_5c", "Mixed_5d"):
        x = _inception_a(params[name], x)
    x = _inception_b(params["Mixed_6a"], x)
    for name in ("Mixed_6b", "Mixed_6c", "Mixed_6d", "Mixed_6e"):
        x = _inception_c(params[name], x)
    x = _inception_d(params["Mixed_7a"], x)
    x = _inception_e(params["Mixed_7b"], x, max_branch_pool=False)
    x = _inception_e(params["Mixed_7c"], x, max_branch_pool=True)

    return jnp.mean(x, axis=(1, 2))


# ---------------------------------------------------------------------------
# weight conversion (BN folding)
# ---------------------------------------------------------------------------

def convert_inception(sd: Dict[str, np.ndarray], eps: float = 1e-3):
    """torch FID-inception state dict -> folded-BN JAX params."""
    units = {}
    for key in sd:
        if key.endswith(".conv.weight"):
            units[key[:-len(".conv.weight")]] = True

    def fold(prefix):
        w = sd[f"{prefix}.conv.weight"].transpose(2, 3, 1, 0)  # HWIO
        gamma = sd[f"{prefix}.bn.weight"]
        beta = sd[f"{prefix}.bn.bias"]
        mean = sd[f"{prefix}.bn.running_mean"]
        var = sd[f"{prefix}.bn.running_var"]
        scale = gamma / np.sqrt(var + eps)
        return {"kernel": jnp.asarray(w * scale, jnp.float32),
                "bias": jnp.asarray(beta - mean * scale, jnp.float32)}

    params: Dict = {}
    for name in _STEM:
        params[name] = fold(name)
    for block in _BLOCKS:
        branches = sorted({u[len(block) + 1:] for u in units
                           if u.startswith(block + ".")})
        params[block] = {b: fold(f"{block}.{b}") for b in branches}
    return params


def make_inception_feature_fn(weights_path: str, batch_dtype=jnp.float32):
    """Load local torch weights -> jitted (B, H, W, 3)[0,1] -> (B, 2048)."""
    from pcdms_tpu.compat.load import load_state_dict
    params = convert_inception(load_state_dict(weights_path))

    @jax.jit
    def feature_fn(images):
        return inception_pool3(params, jnp.asarray(images, batch_dtype))

    return feature_fn
