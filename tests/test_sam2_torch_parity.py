"""SAM2 numerical fidelity: flax Hiera / memory encoder / memory attention /
mask decoder vs independent torch clones of the same architectures
(the reference wraps facebookresearch/sam2 modules — models/sam2.py:32-35,
sam2_blocks.py; clones here follow those definitions), through explicit
weight mapping. Same pattern as tests/test_dinov2.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cryovit_tpu.models.sam2.config import HieraConfig, SAM2Config
from cryovit_tpu.models.sam2.decoder import MaskDecoder
from cryovit_tpu.models.sam2.hiera import Hiera
from cryovit_tpu.models.sam2.memory import MemoryAttention, MemoryEncoder

torch = pytest.importorskip("torch")
from torch import nn  # noqa: E402
import torch.nn.functional as F  # noqa: E402


def _lin(sd, prefix):
    return {"kernel": sd[f"{prefix}.weight"].T.numpy(), "bias": sd[f"{prefix}.bias"].numpy()}


def _lin_nobias(sd, prefix):
    return {"kernel": sd[f"{prefix}.weight"].T.numpy()}


def _conv2d(sd, prefix):
    return {
        "kernel": sd[f"{prefix}.weight"].numpy().transpose(2, 3, 1, 0),
        "bias": sd[f"{prefix}.bias"].numpy(),
    }


def _convT2d(sd, prefix):
    w = sd[f"{prefix}.weight"].numpy()[:, :, ::-1, ::-1]
    return {
        "kernel": np.ascontiguousarray(w.transpose(2, 3, 0, 1)),
        "bias": sd[f"{prefix}.bias"].numpy(),
    }


def _dwconv2d(sd, prefix):  # torch groups=C (C,1,kh,kw) → flax (kh,kw,1,C)
    return {
        "kernel": sd[f"{prefix}.weight"].numpy().transpose(2, 3, 1, 0),
        "bias": sd[f"{prefix}.bias"].numpy(),
    }


def _ln(sd, prefix):
    return {"scale": sd[f"{prefix}.weight"].numpy(), "bias": sd[f"{prefix}.bias"].numpy()}


# =========================== Hiera ==========================================

class _THieraAttention(nn.Module):
    """hieradet MultiScaleAttention (torch)."""

    def __init__(self, dim, dim_out, num_heads, q_pool):
        super().__init__()
        self.dim_out, self.num_heads, self.q_pool = dim_out, num_heads, q_pool
        self.qkv = nn.Linear(dim, 3 * dim_out)
        self.proj = nn.Linear(dim_out, dim_out)

    def forward(self, x):  # (B, H, W, C)
        b, h, w, _ = x.shape
        hd = self.dim_out // self.num_heads
        qkv = self.qkv(x).reshape(b, h * w, 3, self.num_heads, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        if self.q_pool:
            q = q.reshape(b, h, w, -1).permute(0, 3, 1, 2)
            q = F.max_pool2d(q, 2, 2).permute(0, 2, 3, 1)
            h, w = q.shape[1:3]
            q = q.reshape(b, h * w, self.num_heads, hd)
        attn = (q.transpose(1, 2) * hd**-0.5) @ k.transpose(1, 2).transpose(-2, -1)
        attn = attn.softmax(dim=-1)
        out = (attn @ v.transpose(1, 2)).transpose(1, 2).reshape(b, h, w, -1)
        return self.proj(out)


class _THieraBlock(nn.Module):
    def __init__(self, dim, dim_out, num_heads, window, q_pool, mlp_ratio=4.0):
        super().__init__()
        self.dim, self.dim_out, self.window, self.q_pool = dim, dim_out, window, q_pool
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        self.attn = _THieraAttention(dim, dim_out, num_heads, q_pool)
        self.norm2 = nn.LayerNorm(dim_out, eps=1e-6)
        self.mlp_fc1 = nn.Linear(dim_out, int(dim_out * mlp_ratio))
        self.mlp_fc2 = nn.Linear(int(dim_out * mlp_ratio), dim_out)
        self.proj = nn.Linear(dim, dim_out) if dim != dim_out else None

    @staticmethod
    def _part(x, w):
        b, h, wd, c = x.shape
        ph, pw = (-h) % w, (-wd) % w
        if ph or pw:
            x = F.pad(x, (0, 0, 0, pw, 0, ph))
        hp, wp = h + ph, wd + pw
        x = x.view(b, hp // w, w, wp // w, w, c).permute(0, 1, 3, 2, 4, 5)
        return x.reshape(-1, w, w, c), (hp, wp)

    @staticmethod
    def _unpart(x, w, padded, out):
        hp, wp = padded
        h, wd = out
        b = x.shape[0] // ((hp // w) * (wp // w))
        x = x.view(b, hp // w, wp // w, w, w, -1).permute(0, 1, 3, 2, 4, 5)
        return x.reshape(b, hp, wp, -1)[:, :h, :wd]

    def forward(self, x):
        shortcut = x
        x = self.norm1(x)
        if self.proj is not None:
            shortcut = self.proj(x)
        if self.q_pool:
            shortcut = F.max_pool2d(shortcut.permute(0, 3, 1, 2), 2, 2).permute(0, 2, 3, 1)
        h, w = x.shape[1:3]
        if self.window > 0:
            x, padded = self._part(x, self.window)
        x = self.attn(x)
        if self.window > 0:
            win = self.window // (2 if self.q_pool else 1)
            out_hw = (h // 2, w // 2) if self.q_pool else (h, w)
            padded = tuple(p // 2 for p in padded) if self.q_pool else padded
            x = self._unpart(x, win, padded, out_hw)
        x = shortcut + x
        return x + self.mlp_fc2(F.gelu(self.mlp_fc1(self.norm2(x))))


class _THiera(nn.Module):
    def __init__(self, cfg: HieraConfig):
        super().__init__()
        self.cfg = cfg
        self.patch_embed = nn.Conv2d(
            3, cfg.embed_dim, cfg.patch_kernel, cfg.patch_stride, cfg.patch_padding
        )
        bh, bw = cfg.window_pos_embed_bkg_spatial_size
        self.pos_embed = nn.Parameter(torch.zeros(bh, bw, cfg.embed_dim))
        self.pos_embed_window = nn.Parameter(
            torch.zeros(cfg.window_spec[0], cfg.window_spec[0], cfg.embed_dim)
        )
        blocks = []
        dim, heads, idx = cfg.embed_dim, cfg.num_heads, 0
        self.stage_ends = []
        total = 0
        for stage, depth in enumerate(cfg.stages):
            total += depth
            self.stage_ends.append(total - 1)
            for d in range(depth):
                first = d == 0 and stage > 0
                dim_out = dim * 2 if first else dim
                heads_out = heads * 2 if first else heads
                win = 0 if idx in cfg.global_att_blocks else cfg.window_spec[stage]
                blocks.append(
                    _THieraBlock(dim, dim_out, heads_out, win, first, cfg.mlp_ratio)
                )
                dim, heads = dim_out, heads_out
                idx += 1
        self.blocks = nn.ModuleList(blocks)

    def forward(self, x, pos):  # x (B,3,H,W); pos (gh,gw,C) precomputed
        x = self.patch_embed(x).permute(0, 2, 3, 1)
        x = x + pos[None]
        outs = []
        for i, blk in enumerate(self.blocks):
            x = blk(x)
            if i in self.stage_ends:
                outs.append(x)
        return outs


def _map_hiera(tm: _THiera, cfg: HieraConfig) -> dict:
    sd = tm.state_dict()
    params = {
        "patch_embed": _conv2d(sd, "patch_embed"),
        "pos_embed": sd["pos_embed"].numpy(),
        "pos_embed_window": sd["pos_embed_window"].numpy(),
    }
    for i, blk in enumerate(tm.blocks):
        p = f"blocks.{i}"
        bp = {
            "norm1": _ln(sd, f"{p}.norm1"),
            "norm2": _ln(sd, f"{p}.norm2"),
            "attn": {"qkv": _lin(sd, f"{p}.attn.qkv"), "proj": _lin(sd, f"{p}.attn.proj")},
            "mlp_fc1": _lin(sd, f"{p}.mlp_fc1"),
            "mlp_fc2": _lin(sd, f"{p}.mlp_fc2"),
        }
        if blk.proj is not None:
            bp["proj"] = _lin(sd, f"{p}.proj")
        params[f"block{i}"] = bp
    return {"params": params}


def test_hiera_torch_parity(rng):
    cfg = HieraConfig.test()
    torch.manual_seed(0)
    tm = _THiera(cfg).eval()
    with torch.no_grad():
        for p in tm.parameters():
            p.uniform_(-0.08, 0.08)
    fm = Hiera(cfg)
    variables = _map_hiera(tm, cfg)

    x = rng.random((1, 64, 64, 3)).astype(np.float32)
    outs = fm.apply(variables, jnp.asarray(x))

    # feed the torch clone the flax model's own position embedding so the
    # comparison isolates the transformer math (the bicubic interpolation
    # of the background embedding is covered by tests/test_resize.py)
    from cryovit_tpu.ops.resize import bicubic_resize_matrix

    gh = gw = 64 // cfg.patch_stride
    bh, bw = cfg.window_pos_embed_bkg_spatial_size
    rh = np.asarray(bicubic_resize_matrix(bh, gh))
    rw = np.asarray(bicubic_resize_matrix(bw, gw))
    pos = np.einsum("oh,hwc->owc", rh, variables["params"]["pos_embed"])
    pos = np.einsum("pw,owc->opc", rw, pos)
    win = cfg.window_spec[0]
    tiles = np.tile(
        variables["params"]["pos_embed_window"],
        ((gh + win - 1) // win, (gw + win - 1) // win, 1),
    )
    pos = pos + tiles[:gh, :gw]

    with torch.no_grad():
        t_outs = tm(
            torch.from_numpy(x.transpose(0, 3, 1, 2)), torch.from_numpy(pos)
        )
    assert len(outs) == len(t_outs) == len(cfg.stages)
    for o, t in zip(outs, t_outs):
        np.testing.assert_allclose(np.asarray(o), t.numpy(), atol=2e-5)


# ======================= Memory encoder =====================================

class _TMemoryEncoder(nn.Module):
    def __init__(self, cfg: SAM2Config):
        super().__init__()
        d = cfg.d_model
        chans = (4, 16, 64, d)
        self.downs = nn.ModuleList()
        self.lns = nn.ModuleList()
        cin = 1
        for c in chans:
            self.downs.append(nn.Conv2d(cin, c, 3, 2, 1))
            self.lns.append(nn.LayerNorm(c, eps=1e-6))
            cin = c
        self.pix_proj = nn.Conv2d(d, d, 1)
        self.fuser_dw = nn.ModuleList([nn.Conv2d(d, d, 7, 1, 3, groups=d) for _ in range(2)])
        self.fuser_ln = nn.ModuleList([nn.LayerNorm(d, eps=1e-6) for _ in range(2)])
        self.fuser_fc1 = nn.ModuleList([nn.Linear(d, 4 * d) for _ in range(2)])
        self.fuser_fc2 = nn.ModuleList([nn.Linear(4 * d, d) for _ in range(2)])
        self.fuser_gamma = nn.ParameterList(
            [nn.Parameter(torch.full((d,), 1e-6)) for _ in range(2)]
        )
        self.out_proj = nn.Conv2d(d, cfg.mem_dim, 1)

    def forward(self, pix, masks):  # pix (B,d,e,e); masks (B,1,S,S)
        x = torch.sigmoid(masks)
        for conv, ln in zip(self.downs, self.lns):
            x = conv(x)
            x = ln(x.permute(0, 2, 3, 1)).permute(0, 3, 1, 2)
            x = F.gelu(x)
        x = x + self.pix_proj(pix)
        for i in range(2):
            y = self.fuser_dw[i](x).permute(0, 2, 3, 1)
            y = self.fuser_ln[i](y)
            y = self.fuser_fc2[i](F.gelu(self.fuser_fc1[i](y)))
            x = x + (y * self.fuser_gamma[i]).permute(0, 3, 1, 2)
        return self.out_proj(x)


def _map_memory_encoder(tm: _TMemoryEncoder) -> dict:
    sd = tm.state_dict()
    params = {"pix_proj": _conv2d(sd, "pix_proj"), "out_proj": _conv2d(sd, "out_proj")}
    for i in range(4):
        params[f"mask_down{i}"] = _conv2d(sd, f"downs.{i}")
        params[f"mask_ln{i}"] = _ln(sd, f"lns.{i}")
    for i in range(2):
        params[f"fuser_dw{i}"] = _dwconv2d(sd, f"fuser_dw.{i}")
        params[f"fuser_ln{i}"] = _ln(sd, f"fuser_ln.{i}")
        params[f"fuser_fc1_{i}"] = _lin(sd, f"fuser_fc1.{i}")
        params[f"fuser_fc2_{i}"] = _lin(sd, f"fuser_fc2.{i}")
        params[f"fuser_gamma{i}"] = sd[f"fuser_gamma.{i}"].numpy()
    return {"params": params}


def test_memory_encoder_torch_parity(rng):
    cfg = SAM2Config.tiny_test()
    torch.manual_seed(1)
    tm = _TMemoryEncoder(cfg).eval()
    with torch.no_grad():
        for p in tm.parameters():
            p.uniform_(-0.1, 0.1)
    fm = MemoryEncoder(cfg)
    variables = _map_memory_encoder(tm)

    e = cfg.embed_size
    pix = rng.random((2, e, e, cfg.d_model)).astype(np.float32)
    masks = (rng.random((2, cfg.image_size, cfg.image_size, 1)) * 8 - 4).astype(np.float32)
    out = fm.apply(variables, jnp.asarray(pix), jnp.asarray(masks))
    with torch.no_grad():
        t_out = tm(
            torch.from_numpy(pix.transpose(0, 3, 1, 2)),
            torch.from_numpy(masks.transpose(0, 3, 1, 2)),
        )
    np.testing.assert_allclose(
        np.asarray(out), t_out.permute(0, 2, 3, 1).numpy(), atol=2e-5
    )


# ======================= Memory attention ====================================

class _TMemAttnLayer(nn.Module):
    def __init__(self, d, mem_dim, grid):
        super().__init__()
        self.d, self.mem_dim, self.grid = d, mem_dim, grid
        self.norm1 = nn.LayerNorm(d, eps=1e-6)
        self.self_qkv = nn.Linear(d, 3 * d)
        self.self_proj = nn.Linear(d, d)
        self.norm2 = nn.LayerNorm(d, eps=1e-6)
        self.cross_q = nn.Linear(d, d)
        self.cross_q_down = nn.Linear(d, mem_dim)
        self.cross_k = nn.Linear(mem_dim, mem_dim)
        self.cross_v = nn.Linear(mem_dim, mem_dim)
        self.cross_proj = nn.Linear(mem_dim, d)
        self.norm3 = nn.LayerNorm(d, eps=1e-6)
        self.mlp_fc1 = nn.Linear(d, 8 * d)
        self.mlp_fc2 = nn.Linear(8 * d, d)

    def _rope(self, x):
        from cryovit_tpu.models.sam2.memory import axial_rope

        out = axial_rope(jnp.asarray(x.detach().numpy()), self.grid)
        return torch.from_numpy(np.asarray(out))

    def forward(self, x, mem, mask):
        y = self.norm1(x)
        q, k, v = self.self_qkv(y).chunk(3, dim=-1)
        q = self._rope(q.unsqueeze(2))[:, :, 0]
        k = self._rope(k.unsqueeze(2))[:, :, 0]
        d = self.d
        attn = (q * d**-0.5) @ k.transpose(-2, -1)
        x = x + self.self_proj(attn.softmax(-1) @ v)

        y = self.norm2(x)
        q = self.cross_q(y)
        qm = self.cross_q_down(q)
        km, vm = self.cross_k(mem), self.cross_v(mem)
        logits = (qm * self.mem_dim**-0.5) @ km.transpose(-2, -1)
        logits = logits.masked_fill(~mask[:, None, :], -1e30)
        x = x + self.cross_proj(logits.softmax(-1) @ vm)

        y = self.norm3(x)
        return x + self.mlp_fc2(F.gelu(self.mlp_fc1(y)))


def _map_mem_attn(tm, n_layers) -> dict:
    sd = tm.state_dict()
    params = {"norm_out": _ln(sd, "norm_out")}
    for i in range(n_layers):
        p = f"layers.{i}"
        params[f"layer{i}"] = {
            "norm1": _ln(sd, f"{p}.norm1"),
            "self_qkv": _lin(sd, f"{p}.self_qkv"),
            "self_proj": _lin(sd, f"{p}.self_proj"),
            "norm2": _ln(sd, f"{p}.norm2"),
            "cross_q": _lin(sd, f"{p}.cross_q"),
            "cross_q_down": _lin(sd, f"{p}.cross_q_down"),
            "cross_k": _lin(sd, f"{p}.cross_k"),
            "cross_v": _lin(sd, f"{p}.cross_v"),
            "cross_proj": _lin(sd, f"{p}.cross_proj"),
            "norm3": _ln(sd, f"{p}.norm3"),
            "mlp_fc1": _lin(sd, f"{p}.mlp_fc1"),
            "mlp_fc2": _lin(sd, f"{p}.mlp_fc2"),
        }
    return params


def test_memory_attention_torch_parity(rng):
    cfg = SAM2Config.tiny_test()
    e, d = cfg.embed_size, cfg.d_model

    class _TMemAttn(nn.Module):
        def __init__(self):
            super().__init__()
            self.layers = nn.ModuleList(
                [_TMemAttnLayer(d, cfg.mem_dim, (e, e)) for _ in range(cfg.memory_attention_layers)]
            )
            self.norm_out = nn.LayerNorm(d, eps=1e-6)

        def forward(self, feats, mem, mask):
            b = feats.shape[0]
            x = feats.reshape(b, e * e, d)
            for layer in self.layers:
                x = layer(x, mem, mask)
            return self.norm_out(x).reshape(b, e, e, d)

    torch.manual_seed(2)
    tm = _TMemAttn().eval()
    with torch.no_grad():
        for p in tm.parameters():
            p.uniform_(-0.1, 0.1)
    fm = MemoryAttention(cfg)
    variables = {"params": _map_mem_attn(tm, cfg.memory_attention_layers)}

    feats = rng.random((2, e, e, d)).astype(np.float32)
    mem = rng.random((2, 10, cfg.mem_dim)).astype(np.float32)
    mask = np.ones((2, 10), dtype=bool)
    mask[:, 7:] = False
    out = fm.apply(variables, jnp.asarray(feats), jnp.asarray(mem), jnp.asarray(mask))
    with torch.no_grad():
        t_out = tm(torch.from_numpy(feats), torch.from_numpy(mem), torch.from_numpy(mask))
    np.testing.assert_allclose(np.asarray(out), t_out.numpy(), atol=2e-5)


# ========================= Mask decoder ======================================

class _TLoRALinear(nn.Module):
    def __init__(self, din, dout, rank, alpha):
        super().__init__()
        self.proj = nn.Linear(din, dout)
        self.rank, self.alpha = rank, alpha
        if rank > 0:
            self.w_a = nn.Linear(din, rank, bias=False)
            self.w_b = nn.Linear(rank, dout, bias=False)

    def forward(self, x):
        y = self.proj(x)
        if self.rank > 0:
            y = y + self.w_b(self.w_a(x)) * (self.alpha / self.rank)
        return y


class _TAttention(nn.Module):
    def __init__(self, dim, heads, downsample=1, rank=0, alpha=1.0):
        super().__init__()
        inner = dim // downsample
        self.heads, self.inner = heads, inner
        self.q_proj = _TLoRALinear(dim, inner, rank, alpha)
        self.k_proj = nn.Linear(dim, inner)
        self.v_proj = _TLoRALinear(dim, inner, rank, alpha)
        self.out_proj = nn.Linear(inner, dim)

    def forward(self, q, k, v):
        b, nq, _ = q.shape
        hd = self.inner // self.heads
        qh = self.q_proj(q).reshape(b, nq, self.heads, hd).transpose(1, 2)
        kh = self.k_proj(k).reshape(b, k.shape[1], self.heads, hd).transpose(1, 2)
        vh = self.v_proj(v).reshape(b, v.shape[1], self.heads, hd).transpose(1, 2)
        attn = ((qh * hd**-0.5) @ kh.transpose(-2, -1)).softmax(-1)
        out = (attn @ vh).transpose(1, 2).reshape(b, nq, self.inner)
        return self.out_proj(out)


class _TMLP(nn.Module):
    def __init__(self, din, hidden, dout, depth=3, sigmoid=False):
        super().__init__()
        dims = [din] + [hidden] * (depth - 1) + [dout]
        self.layers = nn.ModuleList(
            nn.Linear(dims[i], dims[i + 1]) for i in range(depth)
        )
        self.sigmoid = sigmoid

    def forward(self, x):
        for i, l in enumerate(self.layers):
            x = l(x)
            if i < len(self.layers) - 1:
                x = F.relu(x)
        return torch.sigmoid(x) if self.sigmoid else x


class _TTwoWay(nn.Module):
    def __init__(self, d, heads, rank, alpha, skip_pe):
        super().__init__()
        self.skip_pe = skip_pe
        self.self_attn = _TAttention(d, heads, 1, rank, alpha)
        self.norm1 = nn.LayerNorm(d, eps=1e-6)
        self.cross_t2i = _TAttention(d, heads, 2, rank, alpha)
        self.norm2 = nn.LayerNorm(d, eps=1e-6)
        self.mlp1 = nn.Linear(d, 8 * d)
        self.mlp2 = nn.Linear(8 * d, d)
        self.norm3 = nn.LayerNorm(d, eps=1e-6)
        self.cross_i2t = _TAttention(d, heads, 2, rank, alpha)
        self.norm4 = nn.LayerNorm(d, eps=1e-6)

    def forward(self, queries, keys, qpe, kpe):
        if self.skip_pe:
            queries = self.self_attn(queries, queries, queries)
        else:
            q = queries + qpe
            queries = queries + self.self_attn(q, q, queries)
        queries = self.norm1(queries)
        q, k = queries + qpe, keys + kpe
        queries = self.norm2(queries + self.cross_t2i(q, k, keys))
        queries = self.norm3(queries + self.mlp2(F.relu(self.mlp1(queries))))
        q, k = queries + qpe, keys + kpe
        keys = self.norm4(keys + self.cross_i2t(k, q, queries))
        return queries, keys


class _TMaskDecoder(nn.Module):
    def __init__(self, cfg: SAM2Config, rank, alpha):
        super().__init__()
        d = cfg.d_model
        self.cfg = cfg
        m = cfg.num_multimask_outputs + 1
        self.iou_token = nn.Parameter(torch.zeros(1, d))
        self.mask_tokens = nn.Parameter(torch.zeros(m, d))
        self.obj_token = nn.Parameter(torch.zeros(1, d))
        self.layers = nn.ModuleList(
            _TTwoWay(d, cfg.decoder_heads, rank, alpha, i == 0)
            for i in range(cfg.decoder_depth)
        )
        self.final_attn = _TAttention(d, cfg.decoder_heads, 2, rank, alpha)
        self.norm_final = nn.LayerNorm(d, eps=1e-6)
        self.upscale1 = nn.ConvTranspose2d(d, d // 4, 2, 2)
        self.upscale_ln = nn.LayerNorm(d // 4, eps=1e-6)
        self.upscale2 = nn.ConvTranspose2d(d // 4, d // 8, 2, 2)
        self.conv_s0 = nn.Conv2d(d, d // 8, 1)
        self.conv_s1 = nn.Conv2d(d, d // 4, 1)
        self.hypers = nn.ModuleList(_TMLP(d, d, d // 8) for _ in range(m))
        self.iou_head = _TMLP(d, d, m, cfg.iou_head_depth, sigmoid=True)
        self.obj_head = _TMLP(d, d, 1)

    def forward(self, img, pe, sparse, dense, hi):
        cfg = self.cfg
        b, e = img.shape[0], img.shape[1]
        d = cfg.d_model
        m = cfg.num_multimask_outputs + 1
        out_tokens = torch.cat([self.obj_token, self.iou_token, self.mask_tokens], 0)
        tokens = torch.cat([out_tokens.unsqueeze(0).expand(b, -1, -1), sparse], 1)
        src = (img + dense).reshape(b, e * e, d)
        pe_seq = pe.reshape(1, e * e, d).expand(b, -1, -1)
        queries, keys = tokens, src
        for layer in self.layers:
            queries, keys = layer(queries, keys, tokens, pe_seq)
        q, k = queries + tokens, keys + pe_seq
        queries = self.norm_final(queries + self.final_attn(q, k, keys))
        obj_out, iou_out = queries[:, 0], queries[:, 1]
        mask_out = queries[:, 2 : 2 + m]
        imgf = keys.reshape(b, e, e, d).permute(0, 3, 1, 2)
        up1 = self.upscale1(imgf) + self.conv_s1(hi[1])
        up1 = F.gelu(self.upscale_ln(up1.permute(0, 2, 3, 1)).permute(0, 3, 1, 2))
        up2 = F.gelu(self.upscale2(up1) + self.conv_s0(hi[0]))
        hyper = torch.stack([h(mask_out[:, i]) for i, h in enumerate(self.hypers)], 1)
        masks = torch.einsum("bmc,bchw->bmhw", hyper, up2)
        return masks, self.iou_head(iou_out), mask_out, self.obj_head(obj_out)


def _map_attn(sd, prefix, rank):
    def lora(name):
        out = {"proj": _lin(sd, f"{prefix}.{name}.proj")}
        if rank > 0:
            out["w_a"] = _lin_nobias(sd, f"{prefix}.{name}.w_a")
            out["w_b"] = _lin_nobias(sd, f"{prefix}.{name}.w_b")
        return out

    return {
        "q_proj": lora("q_proj"),
        "k_proj": _lin(sd, f"{prefix}.k_proj"),
        "v_proj": lora("v_proj"),
        "out_proj": _lin(sd, f"{prefix}.out_proj"),
    }


def _map_decoder(tm: _TMaskDecoder, cfg: SAM2Config, rank) -> dict:
    sd = tm.state_dict()
    m = cfg.num_multimask_outputs + 1
    params = {
        "iou_token": sd["iou_token"].numpy(),
        "mask_tokens": sd["mask_tokens"].numpy(),
        "obj_score_token": sd["obj_token"].numpy(),
        "norm_final": _ln(sd, "norm_final"),
        "upscale1": _convT2d(sd, "upscale1"),
        "upscale_ln": _ln(sd, "upscale_ln"),
        "upscale2": _convT2d(sd, "upscale2"),
        "conv_s0": _conv2d(sd, "conv_s0"),
        "conv_s1": _conv2d(sd, "conv_s1"),
        "final_attn_token_to_image": _map_attn(sd, "final_attn", rank),
    }
    for i in range(cfg.decoder_depth):
        p = f"layers.{i}"
        params[f"layer{i}"] = {
            "self_attn": _map_attn(sd, f"{p}.self_attn", rank),
            "cross_attn_token_to_image": _map_attn(sd, f"{p}.cross_t2i", rank),
            "cross_attn_image_to_token": _map_attn(sd, f"{p}.cross_i2t", rank),
            "norm1": _ln(sd, f"{p}.norm1"),
            "norm2": _ln(sd, f"{p}.norm2"),
            "norm3": _ln(sd, f"{p}.norm3"),
            "norm4": _ln(sd, f"{p}.norm4"),
            "mlp": {"lin1": _lin(sd, f"{p}.mlp1"), "lin2": _lin(sd, f"{p}.mlp2")},
        }
    for i in range(m):
        params[f"hyper{i}"] = {
            f"layer{j}": _lin(sd, f"hypers.{i}.layers.{j}") for j in range(3)
        }
    params["iou_head"] = {
        f"layer{j}": _lin(sd, f"iou_head.layers.{j}")
        for j in range(cfg.iou_head_depth)
    }
    params["obj_score_head"] = {
        f"layer{j}": _lin(sd, f"obj_head.layers.{j}") for j in range(3)
    }
    return {"params": params}


@pytest.mark.parametrize("rank", [0, 4])
def test_mask_decoder_torch_parity(rng, rank):
    """Decoder parity with LoRA disabled (base weights) and enabled
    (random adapters mapped 1:1) — covers q/v LoRA wiring and scaling."""
    cfg = SAM2Config.tiny_test()
    torch.manual_seed(3)
    tm = _TMaskDecoder(cfg, rank, alpha=float(2 * rank) if rank else 1.0).eval()
    with torch.no_grad():
        for p in tm.parameters():
            p.uniform_(-0.08, 0.08)
    fm = MaskDecoder(cfg, lora_rank=rank, lora_alpha=float(2 * rank) if rank else 1.0)
    variables = _map_decoder(tm, cfg, rank)

    e, d = cfg.embed_size, cfg.d_model
    img = rng.random((2, e, e, d)).astype(np.float32)
    pe = rng.random((e, e, d)).astype(np.float32)
    sparse = rng.random((2, 3, d)).astype(np.float32)
    dense = rng.random((2, e, e, d)).astype(np.float32)
    hi0 = rng.random((2, 4 * e, 4 * e, d)).astype(np.float32)
    hi1 = rng.random((2, 2 * e, 2 * e, d)).astype(np.float32)

    masks, ious, tokens, obj = fm.apply(
        variables, jnp.asarray(img), jnp.asarray(pe), jnp.asarray(sparse),
        jnp.asarray(dense), (jnp.asarray(hi0), jnp.asarray(hi1)),
    )
    with torch.no_grad():
        t_masks, t_ious, t_tokens, t_obj = tm(
            torch.from_numpy(img), torch.from_numpy(pe), torch.from_numpy(sparse),
            torch.from_numpy(dense),
            (torch.from_numpy(hi0.transpose(0, 3, 1, 2)),
             torch.from_numpy(hi1.transpose(0, 3, 1, 2))),
        )
    np.testing.assert_allclose(np.asarray(masks), t_masks.numpy(), atol=5e-5)
    np.testing.assert_allclose(np.asarray(ious), t_ious.numpy(), atol=5e-5)
    np.testing.assert_allclose(np.asarray(tokens), t_tokens.numpy(), atol=5e-5)
    np.testing.assert_allclose(np.asarray(obj), t_obj.numpy(), atol=5e-5)
