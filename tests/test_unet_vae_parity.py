"""Random-weight torch parity for the stage-2/3 UNet and the VAE.

Hand-builds a minimal diffusers-faithful torch mirror of the blocks the
reference UNets are assembled from (ResnetBlock2D, Transformer2DModel with
use_linear_projection, Down/Up/Mid blocks, the 9ch stage-2 UNet with
class-projection + pose injection —
/root/reference/src/models/stage2_inpaint_unet_2d_condition.py:579-820,
class add :700-708, ``conv_in(sample) + my_pose_cond`` :742 — and the
SD AutoencoderKL incl. mid-attention), with the diffusers state-dict key
naming, randomizes the weights, converts through compat/torch_convert, and
asserts the JAX forward matches torch at tiny geometry in f32.

This is the same recipe as tests/test_vit_parity.py / test_zoe_parity.py,
applied to the last unpinned composition surface: skip-connection order,
GN eps placement, GEGLU, temb injection, attention norm layout.
"""

import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from pcdms_tpu.compat.torch_convert import (  # noqa: E402
    _convert_resnet, _convert_transformer2d, convert_unet, convert_vae,
    state_dict_to_numpy,
)
from pcdms_tpu.models.unet2d import (  # noqa: E402
    UNetConfig, unet_apply, unet_init,
)
from pcdms_tpu.models.vae import (  # noqa: E402
    VAEConfig, vae_decode, vae_encode_moments, vae_init,
)
from pcdms_tpu.nn.unet_blocks import (  # noqa: E402
    resnet_block_apply, transformer2d_apply,
)

TOL = dict(atol=1e-4, rtol=1e-3)


def _nhwc(t):
    return np.ascontiguousarray(t.detach().numpy().transpose(0, 2, 3, 1))


def _nchw(a):
    return torch.from_numpy(np.ascontiguousarray(a.transpose(0, 3, 1, 2)))


# ---------------------------------------------------------------------------
# torch mirror modules (diffusers semantics + state-dict naming)
# ---------------------------------------------------------------------------

def timesteps_embedding_torch(timesteps, dim, flip_sin_to_cos=True,
                              downscale_freq_shift=0.0):
    """diffusers ``Timesteps``: sinusoidal features, f32."""
    half = dim // 2
    exponent = -math.log(10000.0) * torch.arange(half, dtype=torch.float32)
    exponent = exponent / (half - downscale_freq_shift)
    emb = timesteps.float()[:, None] * torch.exp(exponent)[None, :]
    sin, cos = torch.sin(emb), torch.cos(emb)
    if flip_sin_to_cos:
        return torch.cat([cos, sin], dim=-1)
    return torch.cat([sin, cos], dim=-1)


class TTimestepEmbedding(nn.Module):
    """diffusers ``TimestepEmbedding``: linear_1 -> SiLU -> linear_2
    (+ optional bias-free cond_proj added to the input)."""

    def __init__(self, in_dim, dim, cond_proj_dim=None):
        super().__init__()
        self.linear_1 = nn.Linear(in_dim, dim)
        self.linear_2 = nn.Linear(dim, dim)
        if cond_proj_dim is not None:
            self.cond_proj = nn.Linear(cond_proj_dim, in_dim, bias=False)

    def forward(self, x, condition=None):
        if condition is not None:
            x = x + self.cond_proj(condition)
        return self.linear_2(F.silu(self.linear_1(x)))


class TResnet(nn.Module):
    """diffusers ``ResnetBlock2D`` (default_init path, eps per caller)."""

    def __init__(self, in_ch, out_ch, temb_dim=None, groups=32, eps=1e-5):
        super().__init__()
        self.norm1 = nn.GroupNorm(groups, in_ch, eps=eps)
        self.conv1 = nn.Conv2d(in_ch, out_ch, 3, padding=1)
        if temb_dim is not None:
            self.time_emb_proj = nn.Linear(temb_dim, out_ch)
        self.norm2 = nn.GroupNorm(groups, out_ch, eps=eps)
        self.conv2 = nn.Conv2d(out_ch, out_ch, 3, padding=1)
        if in_ch != out_ch:
            self.conv_shortcut = nn.Conv2d(in_ch, out_ch, 1)

    def forward(self, x, temb=None):
        h = self.conv1(F.silu(self.norm1(x)))
        if temb is not None and hasattr(self, "time_emb_proj"):
            h = h + self.time_emb_proj(F.silu(temb))[:, :, None, None]
        h = self.conv2(F.silu(self.norm2(h)))
        shortcut = self.conv_shortcut(x) if hasattr(self, "conv_shortcut") \
            else x
        return shortcut + h


class TAttention(nn.Module):
    """diffusers ``Attention`` (no mask, to_out.0 naming)."""

    def __init__(self, query_dim, heads, head_dim, context_dim=None):
        super().__init__()
        inner = heads * head_dim
        ctx = context_dim if context_dim is not None else query_dim
        self.heads, self.head_dim = heads, head_dim
        self.to_q = nn.Linear(query_dim, inner, bias=False)
        self.to_k = nn.Linear(ctx, inner, bias=False)
        self.to_v = nn.Linear(ctx, inner, bias=False)
        self.to_out = nn.ModuleList([nn.Linear(inner, query_dim)])

    def forward(self, x, context=None):
        ctx = x if context is None else context
        b, lq, _ = x.shape
        lk = ctx.shape[1]
        q = self.to_q(x).view(b, lq, self.heads, self.head_dim).transpose(1, 2)
        k = self.to_k(ctx).view(b, lk, self.heads, self.head_dim).transpose(1, 2)
        v = self.to_v(ctx).view(b, lk, self.heads, self.head_dim).transpose(1, 2)
        s = (q @ k.transpose(-1, -2)) * self.head_dim ** -0.5
        o = torch.softmax(s, dim=-1) @ v
        o = o.transpose(1, 2).reshape(b, lq, -1)
        return self.to_out[0](o)


class TGEGLU(nn.Module):
    def __init__(self, dim, inner):
        super().__init__()
        self.proj = nn.Linear(dim, inner * 2)

    def forward(self, x):
        h, gate = self.proj(x).chunk(2, dim=-1)
        return h * F.gelu(gate)


class TFeedForward(nn.Module):
    """diffusers ``FeedForward``: net.0 = GEGLU, net.1 = Dropout, net.2 = Linear."""

    def __init__(self, dim, mult=4):
        super().__init__()
        inner = dim * mult
        self.net = nn.ModuleList(
            [TGEGLU(dim, inner), nn.Dropout(0.0), nn.Linear(inner, dim)])

    def forward(self, x):
        for m in self.net:
            x = m(x)
        return x


class TBasicTransformerBlock(nn.Module):
    def __init__(self, dim, heads, head_dim, context_dim):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim)
        self.attn1 = TAttention(dim, heads, head_dim)
        self.norm2 = nn.LayerNorm(dim)
        self.attn2 = TAttention(dim, heads, head_dim, context_dim)
        self.norm3 = nn.LayerNorm(dim)
        self.ff = TFeedForward(dim)

    def forward(self, x, context):
        x = x + self.attn1(self.norm1(x))
        x = x + self.attn2(self.norm2(x), context)
        x = x + self.ff(self.norm3(x))
        return x


class TTransformer2D(nn.Module):
    """diffusers ``Transformer2DModel`` with use_linear_projection=True."""

    def __init__(self, ch, heads, head_dim, context_dim, groups=32, depth=1):
        super().__init__()
        self.norm = nn.GroupNorm(groups, ch, eps=1e-6)
        self.proj_in = nn.Linear(ch, ch)
        self.transformer_blocks = nn.ModuleList([
            TBasicTransformerBlock(ch, heads, head_dim, context_dim)
            for _ in range(depth)])
        self.proj_out = nn.Linear(ch, ch)

    def forward(self, x, context):
        b, c, h, w = x.shape
        residual = x
        x = self.norm(x)
        x = x.permute(0, 2, 3, 1).reshape(b, h * w, c)
        x = self.proj_in(x)
        for block in self.transformer_blocks:
            x = block(x, context)
        x = self.proj_out(x)
        x = x.reshape(b, h, w, c).permute(0, 3, 1, 2)
        return x + residual


class TDownsample(nn.Module):
    """UNet Downsample2D (padding=1)."""

    def __init__(self, ch):
        super().__init__()
        self.conv = nn.Conv2d(ch, ch, 3, stride=2, padding=1)

    def forward(self, x):
        return self.conv(x)


class TUpsample(nn.Module):
    def __init__(self, ch):
        super().__init__()
        self.conv = nn.Conv2d(ch, ch, 3, padding=1)

    def forward(self, x):
        return self.conv(F.interpolate(x, scale_factor=2.0, mode="nearest"))


class TDownBlock(nn.Module):
    def __init__(self, in_ch, out_ch, temb_dim, layers, cross_attn,
                 context_dim, head_dim, add_downsample, groups):
        super().__init__()
        self.resnets = nn.ModuleList([
            TResnet(in_ch if i == 0 else out_ch, out_ch, temb_dim,
                    groups=groups) for i in range(layers)])
        if cross_attn:
            self.attentions = nn.ModuleList([
                TTransformer2D(out_ch, out_ch // head_dim, head_dim,
                               context_dim, groups=groups)
                for _ in range(layers)])
        if add_downsample:
            self.downsamplers = nn.ModuleList([TDownsample(out_ch)])

    def forward(self, x, temb, context):
        skips = []
        attns = getattr(self, "attentions", None)
        for i, resnet in enumerate(self.resnets):
            x = resnet(x, temb)
            if attns is not None:
                x = attns[i](x, context)
            skips.append(x)
        if hasattr(self, "downsamplers"):
            x = self.downsamplers[0](x)
            skips.append(x)
        return x, skips


class TMidBlock(nn.Module):
    def __init__(self, ch, temb_dim, context_dim, head_dim, groups):
        super().__init__()
        self.resnets = nn.ModuleList([
            TResnet(ch, ch, temb_dim, groups=groups),
            TResnet(ch, ch, temb_dim, groups=groups)])
        self.attentions = nn.ModuleList([
            TTransformer2D(ch, ch // head_dim, head_dim, context_dim,
                           groups=groups)])

    def forward(self, x, temb, context):
        x = self.resnets[0](x, temb)
        x = self.attentions[0](x, context)
        return self.resnets[1](x, temb)


class TUpBlock(nn.Module):
    def __init__(self, skip_ch, prev_ch, out_ch, temb_dim, layers,
                 cross_attn, context_dim, head_dim, add_upsample, groups):
        super().__init__()
        resnets = []
        for i in range(layers):
            res_skip = skip_ch if i == layers - 1 else out_ch
            res_in = prev_ch if i == 0 else out_ch
            resnets.append(TResnet(res_in + res_skip, out_ch, temb_dim,
                                   groups=groups))
        self.resnets = nn.ModuleList(resnets)
        if cross_attn:
            self.attentions = nn.ModuleList([
                TTransformer2D(out_ch, out_ch // head_dim, head_dim,
                               context_dim, groups=groups)
                for _ in range(layers)])
        if add_upsample:
            self.upsamplers = nn.ModuleList([TUpsample(out_ch)])

    def forward(self, x, skips, temb, context):
        attns = getattr(self, "attentions", None)
        for i, resnet in enumerate(self.resnets):
            x = torch.cat([x, skips.pop()], dim=1)
            x = resnet(x, temb)
            if attns is not None:
                x = attns[i](x, context)
        if hasattr(self, "upsamplers"):
            x = self.upsamplers[0](x)
        return x


class TUNet(nn.Module):
    """Mirror of the reference's Stage2_InapintUNet2DConditionModel forward
    (class-proj add :700-708, pose add :742, block wiring :747-820) at a
    parametric tiny geometry."""

    def __init__(self, cfg: UNetConfig):
        super().__init__()
        self.cfg = cfg
        ch0 = cfg.block_out_channels[0]
        temb = cfg.time_embed_dim
        g = cfg.norm_groups
        self.time_embedding = TTimestepEmbedding(
            ch0, temb, cond_proj_dim=cfg.time_cond_proj_dim)
        if cfg.class_embed_proj_dim is not None:
            self.class_embedding = TTimestepEmbedding(
                cfg.class_embed_proj_dim, temb)
        self.conv_in = nn.Conv2d(cfg.in_channels, ch0, 3, padding=1)
        n = len(cfg.block_out_channels)
        self.down_blocks = nn.ModuleList()
        in_ch = ch0
        for i, out_ch in enumerate(cfg.block_out_channels):
            self.down_blocks.append(TDownBlock(
                in_ch, out_ch, temb, cfg.layers_per_block,
                cfg.cross_attn_down[i], cfg.cross_attention_dim,
                cfg.head_dim, add_downsample=i < n - 1, groups=g))
            in_ch = out_ch
        self.mid_block = TMidBlock(cfg.block_out_channels[-1], temb,
                                   cfg.cross_attention_dim, cfg.head_dim, g)
        rev = tuple(reversed(cfg.block_out_channels))
        self.up_blocks = nn.ModuleList()
        prev = rev[0]
        for i in range(n):
            out_ch = rev[i]
            skip_ch = rev[min(i + 1, n - 1)]
            self.up_blocks.append(TUpBlock(
                skip_ch, prev, out_ch, temb, cfg.layers_per_block + 1,
                cfg.cross_attn_up[i], cfg.cross_attention_dim, cfg.head_dim,
                add_upsample=i < n - 1, groups=g))
            prev = out_ch
        self.conv_norm_out = nn.GroupNorm(g, ch0, eps=1e-5)
        self.conv_out = nn.Conv2d(ch0, cfg.out_channels, 3, padding=1)

    def forward(self, sample, timesteps, context, class_labels=None,
                pose_cond=None, timestep_cond=None):
        t_emb = timesteps_embedding_torch(
            timesteps, self.cfg.block_out_channels[0])
        emb = self.time_embedding(t_emb, timestep_cond)
        if hasattr(self, "class_embedding"):
            if class_labels.dim() == 3:
                class_labels = class_labels.squeeze(1)
            emb = emb + self.class_embedding(class_labels)
        sample = self.conv_in(sample)
        if pose_cond is not None:
            sample = sample + pose_cond
        skips = [sample]
        for block in self.down_blocks:
            sample, s = block(sample, emb, context)
            skips.extend(s)
        sample = self.mid_block(sample, emb, context)
        for block in self.up_blocks:
            n = len(block.resnets)
            block_skips = skips[-n:]
            del skips[-n:]
            sample = block(sample, list(block_skips), emb, context)
        return self.conv_out(F.silu(self.conv_norm_out(sample)))


# ---------------------------------------------------------------------------
# torch VAE mirror (AutoencoderKL)
# ---------------------------------------------------------------------------

class TVAEAttention(nn.Module):
    """diffusers VAE mid attention (new ``to_*`` naming): GroupNorm ->
    single-head attention over spatial tokens -> residual."""

    def __init__(self, ch, groups, eps=1e-6):
        super().__init__()
        self.group_norm = nn.GroupNorm(groups, ch, eps=eps)
        self.to_q = nn.Linear(ch, ch)
        self.to_k = nn.Linear(ch, ch)
        self.to_v = nn.Linear(ch, ch)
        self.to_out = nn.ModuleList([nn.Linear(ch, ch)])

    def forward(self, x):
        b, c, h, w = x.shape
        tokens = x.view(b, c, h * w).transpose(1, 2)
        tn = self.group_norm(x).view(b, c, h * w).transpose(1, 2)
        q, k, v = self.to_q(tn), self.to_k(tn), self.to_v(tn)
        s = (q @ k.transpose(-1, -2)) * c ** -0.5
        o = self.to_out[0](torch.softmax(s, dim=-1) @ v)
        return (tokens + o).transpose(1, 2).view(b, c, h, w)


class TVAEMid(nn.Module):
    def __init__(self, ch, groups):
        super().__init__()
        self.resnets = nn.ModuleList([
            TResnet(ch, ch, None, groups=groups, eps=1e-6),
            TResnet(ch, ch, None, groups=groups, eps=1e-6)])
        self.attentions = nn.ModuleList([TVAEAttention(ch, groups)])

    def forward(self, x):
        x = self.resnets[0](x)
        x = self.attentions[0](x)
        return self.resnets[1](x)


class TVAEDownsample(nn.Module):
    """VAE Downsample2D(padding=0): manual (0,1,0,1) pad + stride-2 conv."""

    def __init__(self, ch):
        super().__init__()
        self.conv = nn.Conv2d(ch, ch, 3, stride=2, padding=0)

    def forward(self, x):
        return self.conv(F.pad(x, (0, 1, 0, 1)))


class TEncoder(nn.Module):
    def __init__(self, cfg: VAEConfig):
        super().__init__()
        chans = cfg.block_out_channels
        g = cfg.norm_groups
        self.conv_in = nn.Conv2d(cfg.in_channels, chans[0], 3, padding=1)
        self.down_blocks = nn.ModuleList()
        in_ch = chans[0]
        for i, out_ch in enumerate(chans):
            block = nn.Module()
            block.resnets = nn.ModuleList([
                TResnet(in_ch if j == 0 else out_ch, out_ch, None,
                        groups=g, eps=1e-6)
                for j in range(cfg.layers_per_block)])
            if i < len(chans) - 1:
                block.downsamplers = nn.ModuleList([TVAEDownsample(out_ch)])
            self.down_blocks.append(block)
            in_ch = out_ch
        self.mid_block = TVAEMid(chans[-1], g)
        self.conv_norm_out = nn.GroupNorm(g, chans[-1], eps=1e-6)
        self.conv_out = nn.Conv2d(chans[-1], 2 * cfg.latent_channels, 3,
                                  padding=1)

    def forward(self, x):
        h = self.conv_in(x)
        for block in self.down_blocks:
            for resnet in block.resnets:
                h = resnet(h)
            if hasattr(block, "downsamplers"):
                h = block.downsamplers[0](h)
        h = self.mid_block(h)
        return self.conv_out(F.silu(self.conv_norm_out(h)))


class TDecoder(nn.Module):
    def __init__(self, cfg: VAEConfig):
        super().__init__()
        rev = tuple(reversed(cfg.block_out_channels))
        g = cfg.norm_groups
        self.conv_in = nn.Conv2d(cfg.latent_channels, rev[0], 3, padding=1)
        self.mid_block = TVAEMid(rev[0], g)
        self.up_blocks = nn.ModuleList()
        in_ch = rev[0]
        for i, out_ch in enumerate(rev):
            block = nn.Module()
            block.resnets = nn.ModuleList([
                TResnet(in_ch if j == 0 else out_ch, out_ch, None,
                        groups=g, eps=1e-6)
                for j in range(cfg.layers_per_block + 1)])
            if i < len(rev) - 1:
                block.upsamplers = nn.ModuleList([TUpsample(out_ch)])
            self.up_blocks.append(block)
            in_ch = out_ch
        self.conv_norm_out = nn.GroupNorm(g, rev[-1], eps=1e-6)
        self.conv_out = nn.Conv2d(rev[-1], cfg.in_channels, 3, padding=1)

    def forward(self, z):
        h = self.conv_in(z)
        h = self.mid_block(h)
        for block in self.up_blocks:
            for resnet in block.resnets:
                h = resnet(h)
            if hasattr(block, "upsamplers"):
                h = block.upsamplers[0](h)
        return self.conv_out(F.silu(self.conv_norm_out(h)))


class TVAE(nn.Module):
    def __init__(self, cfg: VAEConfig):
        super().__init__()
        self.encoder = TEncoder(cfg)
        self.decoder = TDecoder(cfg)
        lc = cfg.latent_channels
        self.quant_conv = nn.Conv2d(2 * lc, 2 * lc, 1)
        self.post_quant_conv = nn.Conv2d(lc, lc, 1)

    def encode_moments(self, x):
        moments = self.quant_conv(self.encoder(x))
        mean, logvar = moments.chunk(2, dim=1)
        return mean, torch.clamp(logvar, -30.0, 20.0)

    def decode(self, z, scaling):
        return self.decoder(self.post_quant_conv(z / scaling))


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------

TINY = UNetConfig(
    in_channels=9, out_channels=4, block_out_channels=(32, 64),
    layers_per_block=2, cross_attention_dim=48, head_dim=16,
    cross_attn_down=(True, False), class_embed_proj_dim=24,
    norm_groups=8, use_flash=False)


def _ctx(b, l, d, seed=0):
    rng = np.random.default_rng(seed)
    return rng.normal(size=(b, l, d)).astype(np.float32)


class TestBlockParity:
    def test_resnet_block(self):
        torch.manual_seed(0)
        tblock = TResnet(8, 16, temb_dim=12, groups=4).eval()
        # _convert_resnet looks keys up under "<prefix>." — re-key the
        # state dict with a dotted prefix
        sd = {f"r.{k}": v
              for k, v in state_dict_to_numpy(tblock.state_dict()).items()}
        params = _convert_resnet(sd, "r")
        rng = np.random.default_rng(0)
        x = rng.normal(size=(2, 6, 5, 8)).astype(np.float32)
        temb = rng.normal(size=(2, 12)).astype(np.float32)
        with torch.no_grad():
            tout = tblock(_nchw(x), torch.from_numpy(temb))
        jout = resnet_block_apply(params, jnp.asarray(x), jnp.asarray(temb),
                                  num_groups=4)
        np.testing.assert_allclose(np.asarray(jout), _nhwc(tout), **TOL)

    def test_transformer2d_block(self):
        torch.manual_seed(1)
        tblock = TTransformer2D(32, heads=2, head_dim=16, context_dim=48,
                                groups=8).eval()
        sd = {f"t.{k}": v
              for k, v in state_dict_to_numpy(tblock.state_dict()).items()}
        params = _convert_transformer2d(sd, "t")
        rng = np.random.default_rng(1)
        x = rng.normal(size=(2, 4, 6, 32)).astype(np.float32)
        ctx = _ctx(2, 7, 48, seed=2)
        with torch.no_grad():
            tout = tblock(_nchw(x), torch.from_numpy(ctx))
        jout = transformer2d_apply(params, jnp.asarray(x), jnp.asarray(ctx),
                                   heads=2, use_flash=False, num_groups=8)
        np.testing.assert_allclose(np.asarray(jout), _nhwc(tout), **TOL)


class TestUNetParity:
    @pytest.fixture(scope="class")
    def stage2(self):
        torch.manual_seed(2)
        tmodel = TUNet(TINY).eval()
        params = convert_unet(state_dict_to_numpy(tmodel.state_dict()))
        return tmodel, params

    def test_stage2_full_forward(self, stage2):
        """9ch input + class-proj + pose injection, the reference's
        stage-2 training/inference forward."""
        tmodel, params = stage2
        rng = np.random.default_rng(3)
        b, h, w = 2, 8, 16
        x = rng.normal(size=(b, h, w, 9)).astype(np.float32)
        pose = rng.normal(size=(b, h, w, 32)).astype(np.float32)
        cls = rng.normal(size=(b, 1, 24)).astype(np.float32)
        ctx = _ctx(b, 10, 48, seed=4)
        t = np.array([7, 341], np.int64)
        with torch.no_grad():
            tout = tmodel(_nchw(x), torch.from_numpy(t),
                          torch.from_numpy(ctx),
                          class_labels=torch.from_numpy(cls),
                          pose_cond=_nchw(pose))
        jout = unet_apply(params, TINY, jnp.asarray(x), jnp.asarray(t),
                          jnp.asarray(ctx), class_labels=jnp.asarray(cls),
                          pose_cond=jnp.asarray(pose))
        np.testing.assert_allclose(np.asarray(jout), _nhwc(tout), **TOL)

    def test_stage2_zero_ctx_shortcut_matches_torch(self, stage2):
        """The CFG zero-context analytic shortcut must equal torch's full
        compute when the uncond half's context is all-zero."""
        tmodel, params = stage2
        rng = np.random.default_rng(5)
        b, h, w = 2, 8, 8
        x = rng.normal(size=(b, h, w, 9)).astype(np.float32)
        cls = rng.normal(size=(b, 24)).astype(np.float32)
        ctx = _ctx(b, 6, 48, seed=6)
        ctx[0] = 0.0
        t = np.array([19, 19], np.int64)
        with torch.no_grad():
            tout = tmodel(_nchw(x), torch.from_numpy(t),
                          torch.from_numpy(ctx),
                          class_labels=torch.from_numpy(cls))
        jout = unet_apply(params, TINY, jnp.asarray(x), jnp.asarray(t),
                          jnp.asarray(ctx), class_labels=jnp.asarray(cls),
                          zero_ctx_prefix=1)
        np.testing.assert_allclose(np.asarray(jout), _nhwc(tout), **TOL)

    def test_stage3_variant(self):
        """8ch, no class embedding (stage3_train_refined_model.py:165-166)."""
        cfg = UNetConfig(
            in_channels=8, out_channels=4, block_out_channels=(32, 64),
            layers_per_block=2, cross_attention_dim=48, head_dim=16,
            cross_attn_down=(True, False), class_embed_proj_dim=None,
            norm_groups=8, use_flash=False)
        torch.manual_seed(3)
        tmodel = TUNet(cfg).eval()
        params = convert_unet(state_dict_to_numpy(tmodel.state_dict()))
        rng = np.random.default_rng(7)
        x = rng.normal(size=(1, 8, 8, 8)).astype(np.float32)
        ctx = _ctx(1, 5, 48, seed=8)
        t = np.array([99], np.int64)
        with torch.no_grad():
            tout = tmodel(_nchw(x), torch.from_numpy(t),
                          torch.from_numpy(ctx))
        jout = unet_apply(params, cfg, jnp.asarray(x), jnp.asarray(t),
                          jnp.asarray(ctx))
        np.testing.assert_allclose(np.asarray(jout), _nhwc(tout), **TOL)

    def test_lcm_timestep_cond(self):
        """LCM guidance-embed conditioning through time_embedding.cond_proj
        (PCDMs_pipeline.py:832-859 consumption path)."""
        cfg = UNetConfig(
            in_channels=4, out_channels=4, block_out_channels=(32, 64),
            layers_per_block=1, cross_attention_dim=48, head_dim=16,
            cross_attn_down=(True, False), class_embed_proj_dim=None,
            norm_groups=8, use_flash=False, time_cond_proj_dim=16)
        torch.manual_seed(4)
        tmodel = TUNet(cfg).eval()
        params = convert_unet(state_dict_to_numpy(tmodel.state_dict()))
        rng = np.random.default_rng(9)
        x = rng.normal(size=(1, 8, 8, 4)).astype(np.float32)
        ctx = _ctx(1, 5, 48, seed=10)
        wcond = rng.normal(size=(1, 16)).astype(np.float32)
        t = np.array([400], np.int64)
        with torch.no_grad():
            tout = tmodel(_nchw(x), torch.from_numpy(t),
                          torch.from_numpy(ctx),
                          timestep_cond=torch.from_numpy(wcond))
        jout = unet_apply(params, cfg, jnp.asarray(x), jnp.asarray(t),
                          jnp.asarray(ctx), timestep_cond=jnp.asarray(wcond))
        np.testing.assert_allclose(np.asarray(jout), _nhwc(tout), **TOL)


class TestVAEParity:
    CFG = VAEConfig(block_out_channels=(16, 32), norm_groups=4)

    @pytest.fixture(scope="class")
    def vae(self):
        torch.manual_seed(5)
        tmodel = TVAE(self.CFG).eval()
        params = convert_vae(state_dict_to_numpy(tmodel.state_dict()))
        return tmodel, params

    def test_encode_moments(self, vae):
        tmodel, params = vae
        rng = np.random.default_rng(11)
        x = rng.normal(size=(2, 16, 16, 3)).astype(np.float32)
        with torch.no_grad():
            tmean, tlogvar = tmodel.encode_moments(_nchw(x))
        jmean, jlogvar = vae_encode_moments(params, jnp.asarray(x), self.CFG)
        np.testing.assert_allclose(np.asarray(jmean), _nhwc(tmean), **TOL)
        np.testing.assert_allclose(np.asarray(jlogvar), _nhwc(tlogvar), **TOL)

    def test_decode(self, vae):
        tmodel, params = vae
        rng = np.random.default_rng(12)
        z = rng.normal(size=(2, 8, 8, 4)).astype(np.float32)
        with torch.no_grad():
            tout = tmodel.decode(_nchw(z), self.CFG.scaling_factor)
        jout = vae_decode(params, jnp.asarray(z), self.CFG)
        np.testing.assert_allclose(np.asarray(jout), _nhwc(tout), **TOL)

    def test_encode_decode_roundtrip_shapes(self, vae):
        _, params = vae
        x = jnp.zeros((1, 32, 32, 3), jnp.float32)
        mean, _ = vae_encode_moments(params, x, self.CFG)
        # one downsample in the tiny config -> 2x spatial reduction
        assert mean.shape == (1, 16, 16, 4)
        out = vae_decode(params, mean * self.CFG.scaling_factor, self.CFG)
        assert out.shape == (1, 32, 32, 3)
