"""Random-weight torch parity for the SAM port.

Hand-builds the official SAM graph (windowed ViT-B image encoder with
decomposed rel-pos, random-Fourier prompt encoder, two-way-transformer
mask decoder — /root/reference/src/controlnet_aux/segment_anything/
modeling/) in raw torch with checkpoint naming, randomizes weights, and
asserts convert_sam + the JAX applies reproduce the torch forward.
AMG host utilities are tested against analytic cases.
"""

import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from pcdms_tpu.pose.detectors import sam as sm  # noqa: E402
from pcdms_tpu.pose.detectors import sam_amg as amg  # noqa: E402

pytestmark = pytest.mark.slow

TOL = dict(atol=2e-3, rtol=2e-3)

# a small-but-real config: 2 blocks (one windowed, one global), ViT-B dims
CFG = sm.SamConfig(dim=768, depth=2, heads=12, global_blocks=(1,),
                   img_size=256)


class LayerNorm2d(nn.Module):
    def __init__(self, c, eps=1e-6):
        super().__init__()
        self.weight = nn.Parameter(torch.ones(c))
        self.bias = nn.Parameter(torch.zeros(c))
        self.eps = eps

    def forward(self, x):
        u = x.mean(1, keepdim=True)
        s = (x - u).pow(2).mean(1, keepdim=True)
        x = (x - u) / torch.sqrt(s + self.eps)
        return self.weight[:, None, None] * x + self.bias[:, None, None]


class EncAttention(nn.Module):
    def __init__(self, dim, heads, input_size):
        super().__init__()
        self.num_heads = heads
        self.qkv = nn.Linear(dim, dim * 3)
        self.proj = nn.Linear(dim, dim)
        hd = dim // heads
        self.rel_pos_h = nn.Parameter(torch.randn(2 * input_size - 1, hd)
                                      * 0.02)
        self.rel_pos_w = nn.Parameter(torch.randn(2 * input_size - 1, hd)
                                      * 0.02)

    def forward(self, x):
        B, H, W, _ = x.shape
        qkv = self.qkv(x).reshape(B, H * W, 3, self.num_heads,
                                  -1).permute(2, 0, 3, 1, 4)
        q, k, v = qkv.reshape(3, B * self.num_heads, H * W, -1).unbind(0)
        hd = q.shape[-1]
        attn = (q / math.sqrt(hd)) @ k.transpose(-2, -1)
        idx_h = (torch.arange(H)[:, None] - torch.arange(H)[None, :]
                 + H - 1)
        idx_w = (torch.arange(W)[:, None] - torch.arange(W)[None, :]
                 + W - 1)
        Rh = self.rel_pos_h[idx_h]
        Rw = self.rel_pos_w[idx_w]
        rq = q.reshape(-1, H, W, hd)
        rel_h = torch.einsum("bhwc,hkc->bhwk", rq, Rh)
        rel_w = torch.einsum("bhwc,wkc->bhwk", rq, Rw)
        attn = (attn.view(-1, H, W, H, W) + rel_h[:, :, :, :, None]
                + rel_w[:, :, :, None, :]).view(-1, H * W, H * W)
        attn = attn.softmax(-1)
        x = ((attn @ v).view(B, self.num_heads, H, W, -1)
             .permute(0, 2, 3, 1, 4).reshape(B, H, W, -1))
        return self.proj(x)


class EncBlock(nn.Module):
    def __init__(self, dim, heads, window, grid):
        super().__init__()
        self.window_size = window
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        self.attn = EncAttention(dim, heads,
                                 window if window > 0 else grid)
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        self.mlp = nn.Module()
        self.mlp.lin1 = nn.Linear(dim, dim * 4)
        self.mlp.lin2 = nn.Linear(dim * 4, dim)

    def forward(self, x):
        shortcut = x
        x = self.norm1(x)
        if self.window_size > 0:
            H, W = x.shape[1], x.shape[2]
            ws = self.window_size
            pad_h = (ws - H % ws) % ws
            pad_w = (ws - W % ws) % ws
            if pad_h or pad_w:
                x = F.pad(x, (0, 0, 0, pad_w, 0, pad_h))
            Hp, Wp = H + pad_h, W + pad_w
            x = (x.view(-1, Hp // ws, ws, Wp // ws, ws, x.shape[-1])
                 .permute(0, 1, 3, 2, 4, 5)
                 .reshape(-1, ws, ws, x.shape[-1]))
        x = self.attn(x)
        if self.window_size > 0:
            b = shortcut.shape[0]
            x = (x.view(b, Hp // ws, Wp // ws, ws, ws, -1)
                 .permute(0, 1, 3, 2, 4, 5).reshape(b, Hp, Wp, -1))
            x = x[:, :H, :W]
        x = shortcut + x
        return x + self.mlp.lin2(F.gelu(self.mlp.lin1(self.norm2(x))))


class TorchEncoder(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        grid = cfg.img_size // 16
        self.patch_embed = nn.Module()
        self.patch_embed.proj = nn.Conv2d(3, cfg.dim, 16, 16)
        self.pos_embed = nn.Parameter(torch.randn(1, grid, grid, cfg.dim)
                                      * 0.02)
        self.blocks = nn.ModuleList([
            EncBlock(cfg.dim, cfg.heads,
                     0 if i in cfg.global_blocks else 14, grid)
            for i in range(cfg.depth)])
        self.neck = nn.Sequential(
            nn.Conv2d(cfg.dim, 256, 1, bias=False), LayerNorm2d(256),
            nn.Conv2d(256, 256, 3, padding=1, bias=False), LayerNorm2d(256))

    def forward(self, x):
        h = self.patch_embed.proj(x).permute(0, 2, 3, 1)
        h = h + self.pos_embed
        for blk in self.blocks:
            h = blk(h)
        return self.neck(h.permute(0, 3, 1, 2))


class DecAttention(nn.Module):
    def __init__(self, dim=256, heads=8, down=1):
        super().__init__()
        inner = dim // down
        self.num_heads = heads
        self.q_proj = nn.Linear(dim, inner)
        self.k_proj = nn.Linear(dim, inner)
        self.v_proj = nn.Linear(dim, inner)
        self.out_proj = nn.Linear(inner, dim)

    def forward(self, q, k, v):
        q, k, v = self.q_proj(q), self.k_proj(k), self.v_proj(v)

        def sep(x):
            b, n, c = x.shape
            return x.reshape(b, n, self.num_heads,
                             c // self.num_heads).transpose(1, 2)

        q, k, v = sep(q), sep(k), sep(v)
        attn = torch.softmax(q @ k.permute(0, 1, 3, 2)
                             / math.sqrt(q.shape[-1]), -1)
        out = attn @ v
        out = out.transpose(1, 2).flatten(2)
        return self.out_proj(out)


class TwoWayBlock(nn.Module):
    def __init__(self, skip_first):
        super().__init__()
        self.skip_first = skip_first
        self.self_attn = DecAttention()
        self.norm1 = nn.LayerNorm(256)
        self.cross_attn_token_to_image = DecAttention(down=2)
        self.norm2 = nn.LayerNorm(256)
        self.mlp = nn.Module()
        self.mlp.lin1 = nn.Linear(256, 2048)
        self.mlp.lin2 = nn.Linear(2048, 256)
        self.norm3 = nn.LayerNorm(256)
        self.norm4 = nn.LayerNorm(256)
        self.cross_attn_image_to_token = DecAttention(down=2)

    def forward(self, queries, keys, query_pe, key_pe):
        if self.skip_first:
            queries = self.self_attn(queries, queries, queries)
        else:
            q = queries + query_pe
            queries = queries + self.self_attn(q, q, queries)
        queries = self.norm1(queries)
        q = queries + query_pe
        k = keys + key_pe
        queries = queries + self.cross_attn_token_to_image(q, k, keys)
        queries = self.norm2(queries)
        queries = queries + self.mlp.lin2(F.relu(self.mlp.lin1(queries)))
        queries = self.norm3(queries)
        q = queries + query_pe
        k = keys + key_pe
        keys = keys + self.cross_attn_image_to_token(k, q, queries)
        keys = self.norm4(keys)
        return queries, keys


class MLP3(nn.Module):
    def __init__(self, cin, hidden, cout):
        super().__init__()
        self.layers = nn.ModuleList([nn.Linear(cin, hidden),
                                     nn.Linear(hidden, hidden),
                                     nn.Linear(hidden, cout)])

    def forward(self, x):
        for i, layer in enumerate(self.layers):
            x = F.relu(layer(x)) if i < 2 else layer(x)
        return x


class TorchSam(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        self.image_encoder = TorchEncoder(cfg)
        pe = nn.Module()
        pe.pe_layer = nn.Module()
        pe.pe_layer.register_buffer(
            "positional_encoding_gaussian_matrix", torch.randn(2, 128))
        pe.point_embeddings = nn.ModuleList(
            [nn.Embedding(1, 256) for _ in range(4)])
        pe.not_a_point_embed = nn.Embedding(1, 256)
        pe.no_mask_embed = nn.Embedding(1, 256)
        self.prompt_encoder = pe
        md = nn.Module()
        tr = nn.Module()
        tr.layers = nn.ModuleList([TwoWayBlock(i == 0) for i in range(2)])
        tr.final_attn_token_to_image = DecAttention(down=2)
        tr.norm_final_attn = nn.LayerNorm(256)
        md.transformer = tr
        md.iou_token = nn.Embedding(1, 256)
        md.mask_tokens = nn.Embedding(4, 256)
        md.output_upscaling = nn.Sequential(
            nn.ConvTranspose2d(256, 64, 2, 2), LayerNorm2d(64), nn.GELU(),
            nn.ConvTranspose2d(64, 32, 2, 2), nn.GELU())
        md.output_hypernetworks_mlps = nn.ModuleList(
            [MLP3(256, 256, 32) for _ in range(4)])
        md.iou_prediction_head = MLP3(256, 256, 4)
        self.mask_decoder = md

    # -- prompt embedding ---------------------------------------------------
    def _pe(self, coords01):
        g = self.prompt_encoder.pe_layer.positional_encoding_gaussian_matrix
        c = (2 * coords01 - 1) @ g
        c = 2 * np.pi * c
        return torch.cat([torch.sin(c), torch.cos(c)], -1)

    def dense_pe(self, size):
        h, w = size
        ys = (torch.arange(h).float() + 0.5) / h
        xs = (torch.arange(w).float() + 0.5) / w
        gy, gx = torch.meshgrid(ys, xs, indexing="ij")
        return self._pe(torch.stack([gx, gy], -1))

    def embed_points(self, coords, labels, input_size):
        b = coords.shape[0]
        coords = torch.cat([coords + 0.5, torch.zeros(b, 1, 2)], 1)
        labels = torch.cat([labels, -torch.ones(b, 1)], 1)
        emb = self._pe(coords / input_size)
        pe = self.prompt_encoder
        emb[labels == -1] = 0.0
        emb[labels == -1] += pe.not_a_point_embed.weight[0]
        emb[labels == 0] += pe.point_embeddings[0].weight[0]
        emb[labels == 1] += pe.point_embeddings[1].weight[0]
        return emb

    def decode(self, image_emb, image_pe, sparse):
        md = self.mask_decoder
        b = sparse.shape[0]
        out_tokens = torch.cat([md.iou_token.weight,
                                md.mask_tokens.weight], 0)
        tokens = torch.cat(
            [out_tokens.unsqueeze(0).expand(b, -1, -1), sparse], 1)
        src = image_emb + self.prompt_encoder.no_mask_embed.weight[0].view(
            1, -1, 1, 1)
        src = torch.repeat_interleave(src, b, dim=0)
        pos = torch.repeat_interleave(image_pe, b, dim=0)
        bb, c, h, w = src.shape
        keys = src.flatten(2).permute(0, 2, 1)
        key_pe = pos.flatten(2).permute(0, 2, 1)
        queries = tokens
        for layer in md.transformer.layers:
            queries, keys = layer(queries, keys, tokens, key_pe)
        q = queries + tokens
        k = keys + key_pe
        queries = queries + md.transformer.final_attn_token_to_image(
            q, k, keys)
        queries = md.transformer.norm_final_attn(queries)
        iou_tok = queries[:, 0]
        mask_toks = queries[:, 1:5]
        src = keys.transpose(1, 2).view(bb, c, h, w)
        up = md.output_upscaling(src)
        hyper = torch.stack([md.output_hypernetworks_mlps[i](
            mask_toks[:, i]) for i in range(4)], 1)
        b2, c2, h2, w2 = up.shape
        masks = (hyper @ up.view(b2, c2, h2 * w2)).view(b2, -1, h2, w2)
        iou = md.iou_prediction_head(iou_tok)
        return masks[:, 1:], iou[:, 1:]


def test_sam_parity():
    torch.manual_seed(0)
    tm = TorchSam(CFG).eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    # buffers are included in state_dict; converter reads it directly
    params, _ = sm.convert_sam(sd, cfg=CFG)

    rng = np.random.default_rng(0)
    img = rng.uniform(0, 255, (1, CFG.img_size, CFG.img_size, 3)).astype(
        np.float32)
    with torch.no_grad():
        xn = ((torch.from_numpy(np.transpose(img, (0, 3, 1, 2)).copy())
               - torch.tensor(sm._PIXEL_MEAN).view(1, 3, 1, 1))
              / torch.tensor(sm._PIXEL_STD).view(1, 3, 1, 1))
        temb = tm.image_encoder(xn)
    jemb = sm.sam_encode_image(params, jnp.asarray(img), CFG)
    np.testing.assert_allclose(
        np.asarray(jemb), temb.permute(0, 2, 3, 1).numpy(), **TOL)

    # prompt + decoder on the shared embedding
    grid = CFG.img_size // 16
    pts = rng.uniform(0, CFG.img_size, (5, 1, 2)).astype(np.float32)
    labels = np.ones((5, 1), np.float32)
    with torch.no_grad():
        sparse = tm.embed_points(torch.from_numpy(pts.copy()),
                                 torch.from_numpy(labels.copy()),
                                 CFG.img_size)
        dpe = tm.dense_pe((grid, grid)).permute(2, 0, 1).unsqueeze(0)
        tmasks, tiou = tm.decode(temb, dpe, sparse)

    jsparse = sm.embed_points(params["prompt"], jnp.asarray(pts),
                              jnp.asarray(labels),
                              input_size=CFG.img_size)
    np.testing.assert_allclose(np.asarray(jsparse), sparse.numpy(), **TOL)

    jpe = sm.dense_pe(params["prompt"], (grid, grid))
    jmasks, jiou = sm.mask_decoder_apply(params["decoder"], jemb, jpe,
                                         jsparse)
    np.testing.assert_allclose(np.asarray(jiou), tiou.numpy(), **TOL)
    np.testing.assert_allclose(np.asarray(jmasks), tmasks.numpy(),
                               atol=5e-3, rtol=5e-3)


def test_amg_utilities():
    # point grid
    g = amg.build_point_grid(2)
    np.testing.assert_allclose(
        g, [[0.25, 0.25], [0.75, 0.25], [0.25, 0.75], [0.75, 0.75]])
    # stability score
    m = np.full((1, 4, 4), 2.0)
    m[0, :2] = 0.5
    s = amg.calculate_stability_score(m, 0.0, 1.0)
    np.testing.assert_allclose(s, [8 / 16])
    # mask -> box
    masks = np.zeros((2, 6, 7), bool)
    masks[0, 2:4, 1:5] = True
    boxes = amg.batched_mask_to_box(masks)
    np.testing.assert_allclose(boxes[0], [1, 2, 4, 3])   # inclusive edges
    np.testing.assert_allclose(boxes[1], [0, 0, 0, 0])
    # NMS keeps the highest-scoring of overlapping boxes
    b = np.array([[0, 0, 10, 10], [1, 1, 10, 10], [20, 20, 30, 30]],
                 np.float32)
    keep = amg.box_nms(b, np.array([0.9, 0.8, 0.5]), 0.5)
    assert keep == [0, 2]


def test_sam_detector_smoke():
    cfg = sm.SamConfig(dim=96 * 2, depth=2, heads=4, global_blocks=(1,),
                       img_size=256)
    # amg pipeline at tiny scale: 2x2 point grid, one batch
    params = sm.sam_init(jax.random.PRNGKey(0), cfg)
    det = amg.SamDetector(params, cfg, points_per_side=2,
                          points_per_batch=4, pred_iou_thresh=-1e9,
                          stability_score_thresh=0.0)
    # patch the 1024 protocol size down to the tiny config's input
    amg_mod = det.mask_generator
    img = (np.random.default_rng(1).uniform(0, 255, (96, 64, 3))
           .astype(np.uint8))
    out = det(img, detect_resolution=64, image_resolution=64)
    assert out.dtype == np.uint8 and out.ndim == 3 and out.shape[2] == 3
