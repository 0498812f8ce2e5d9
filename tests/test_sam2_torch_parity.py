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
# Torch clones mirroring sam2/modeling/memory_encoder.py (LayerNorm2d from
# sam2/modeling/sam2_utils.py), with sam2's own attribute names so their
# state dicts carry the PUBLISHED tensor naming — the mapping under test is
# cryovit_tpu.models.sam2.convert, not a hand-written test map.

class _TLayerNorm2d(nn.Module):
    """sam2/modeling/sam2_utils.py:LayerNorm2d (channels-first LN)."""

    def __init__(self, num_channels, eps=1e-6):
        super().__init__()
        self.weight = nn.Parameter(torch.ones(num_channels))
        self.bias = nn.Parameter(torch.zeros(num_channels))
        self.eps = eps

    def forward(self, x):
        u = x.mean(1, keepdim=True)
        s = (x - u).pow(2).mean(1, keepdim=True)
        x = (x - u) / torch.sqrt(s + self.eps)
        return self.weight[:, None, None] * x + self.bias[:, None, None]


class _TMaskDownSampler(nn.Module):
    """sam2/modeling/memory_encoder.py:MaskDownSampler — stride-2 convs
    growing channels by stride² (1→4→16→64→256) with LayerNorm2d + GELU,
    then a final 1×1 conv to embed_dim."""

    def __init__(self, embed_dim):
        super().__init__()
        layers, cin = [], 1
        for _ in range(4):
            cout = cin * 4
            layers += [nn.Conv2d(cin, cout, 3, 2, 1), _TLayerNorm2d(cout), nn.GELU()]
            cin = cout
        layers.append(nn.Conv2d(cin, embed_dim, 1))
        self.encoder = nn.Sequential(*layers)

    def forward(self, x):
        return self.encoder(x)


class _TCXBlock(nn.Module):
    """sam2/modeling/memory_encoder.py:CXBlock (ConvNeXt block)."""

    def __init__(self, dim):
        super().__init__()
        self.dwconv = nn.Conv2d(dim, dim, 7, padding=3, groups=dim)
        self.norm = _TLayerNorm2d(dim, eps=1e-6)
        self.pwconv1 = nn.Linear(dim, 4 * dim)
        self.pwconv2 = nn.Linear(4 * dim, dim)
        self.gamma = nn.Parameter(1e-6 * torch.ones(dim))

    def forward(self, x):
        inp = x
        x = self.dwconv(x)
        x = self.norm(x)
        x = x.permute(0, 2, 3, 1)
        x = self.pwconv2(F.gelu(self.pwconv1(x)))
        x = self.gamma * x
        return inp + x.permute(0, 3, 1, 2)


class _TMemoryEncoder(nn.Module):
    """sam2/modeling/memory_encoder.py:MemoryEncoder."""

    def __init__(self, cfg: SAM2Config):
        super().__init__()
        d = cfg.d_model
        self.mask_downsampler = _TMaskDownSampler(d)
        self.pix_feat_proj = nn.Conv2d(d, d, 1)
        self.fuser = nn.Module()
        self.fuser.layers = nn.ModuleList([_TCXBlock(d) for _ in range(2)])
        self.out_proj = nn.Conv2d(d, cfg.mem_dim, 1)

    def forward(self, pix_feat, masks, skip_mask_sigmoid=False):
        if not skip_mask_sigmoid:
            masks = torch.sigmoid(masks)
        masks = self.mask_downsampler(masks)
        x = self.pix_feat_proj(pix_feat)
        x = x + masks
        for layer in self.fuser.layers:
            x = layer(x)
        return self.out_proj(x)


def _numpy_sd(module: nn.Module, prefix: str) -> dict:
    return {
        f"{prefix}.{k}": v.detach().numpy() for k, v in module.state_dict().items()
    }


def test_memory_encoder_torch_parity(rng):
    """Published-named memory_encoder.* state dict → convert.py → flax
    forward parity with the sam2-clone forward."""
    from cryovit_tpu.models.sam2.convert import convert_memory_encoder_state_dict

    cfg = SAM2Config.tiny_test()
    torch.manual_seed(1)
    tm = _TMemoryEncoder(cfg).eval()
    with torch.no_grad():
        for p in tm.parameters():
            p.uniform_(-0.1, 0.1)
    fm = MemoryEncoder(cfg)
    variables = convert_memory_encoder_state_dict(_numpy_sd(tm, "memory_encoder"))

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
# Clones of sam2/modeling/sam/transformer.py:RoPEAttention and
# sam2/modeling/memory_attention.py:{MemoryAttentionLayer, MemoryAttention},
# including an independent port of sam2/modeling/position_encoding.py's
# compute_axial_cis / apply_rotary_enc (torch complex arithmetic) so the
# flax axial_rope is checked against sam2's math, not against itself.

def _t_compute_axial_cis(dim, end_x, end_y, theta=10000.0):
    """sam2/modeling/position_encoding.py:compute_axial_cis."""
    freqs = 1.0 / (theta ** (torch.arange(0, dim, 4)[: dim // 4].float() / dim))
    t = torch.arange(end_x * end_y)
    t_x = (t % end_x).float()
    t_y = torch.div(t, end_x, rounding_mode="floor").float()
    fx = torch.outer(t_x, freqs)
    fy = torch.outer(t_y, freqs)
    ang = torch.cat([fx, fy], dim=-1)
    return torch.polar(torch.ones_like(ang), ang)  # (N, dim/2) complex


def _t_apply_rotary_enc(xq, xk, freqs_cis, repeat_freqs_k=False):
    """sam2/modeling/position_encoding.py:apply_rotary_enc.
    xq/xk: (B, H, N, D) real → rotated, adjacent channel pairs complex."""
    xq_ = torch.view_as_complex(xq.float().reshape(*xq.shape[:-1], -1, 2))
    xk_ = torch.view_as_complex(xk.float().reshape(*xk.shape[:-1], -1, 2))
    fc = freqs_cis.reshape(1, 1, *freqs_cis.shape)
    xq_out = torch.view_as_real(xq_ * fc).flatten(3)
    if repeat_freqs_k:
        r = xk_.shape[-2] // xq_.shape[-2]
        fc = fc.repeat(1, 1, r, 1)
    xk_out = torch.view_as_real(xk_ * fc).flatten(3)
    return xq_out.type_as(xq), xk_out.type_as(xk)


class _TRoPEAttention(nn.Module):
    """sam2/modeling/sam/transformer.py:RoPEAttention (separate q/k/v/out
    projections; RoPE applied after head split; optional kv_in_dim and
    rope_k_repeat; obj-pointer tokens excluded via num_k_exclude_rope).
    ``attn_mask`` is a test-side extension for the ring buffer's validity
    mask — with an all-true mask this is exactly sam2's module."""

    def __init__(self, embedding_dim, num_heads=1, kv_in_dim=None,
                 rope_k_repeat=False, feat_sizes=(8, 8)):
        super().__init__()
        kv_in = kv_in_dim if kv_in_dim is not None else embedding_dim
        self.num_heads = num_heads
        self.rope_k_repeat = rope_k_repeat
        self.q_proj = nn.Linear(embedding_dim, embedding_dim)
        self.k_proj = nn.Linear(kv_in, embedding_dim)
        self.v_proj = nn.Linear(kv_in, embedding_dim)
        self.out_proj = nn.Linear(embedding_dim, embedding_dim)
        self.freqs_cis = _t_compute_axial_cis(
            embedding_dim // num_heads, *feat_sizes
        )

    def forward(self, q, k, v, num_k_exclude_rope=0, attn_mask=None):
        q, k, v = self.q_proj(q), self.k_proj(k), self.v_proj(v)
        b, nq = q.shape[:2]
        h = self.num_heads

        def sep(x):
            return x.reshape(b, x.shape[1], h, -1).transpose(1, 2)

        q, k, v = sep(q), sep(k), sep(v)
        num_k_rope = k.size(-2) - num_k_exclude_rope
        q, k_rope = _t_apply_rotary_enc(
            q, k[:, :, :num_k_rope], self.freqs_cis,
            repeat_freqs_k=self.rope_k_repeat,
        )
        k = torch.cat([k_rope, k[:, :, num_k_rope:]], dim=2)
        attn = (q * q.shape[-1] ** -0.5) @ k.transpose(-2, -1)
        if attn_mask is not None:
            attn = attn.masked_fill(~attn_mask[:, None, None, :], -1e30)
        out = (attn.softmax(-1) @ v).transpose(1, 2).reshape(b, nq, -1)
        return self.out_proj(out)


class _TMemAttnLayer(nn.Module):
    """sam2/modeling/memory_attention.py:MemoryAttentionLayer with the
    published sam2.1_hiera_l layer config (pos_enc_at_attn=False,
    pos_enc_at_cross_attn_keys=True, pos_enc_at_cross_attn_queries=False,
    ReLU activation, kv_in_dim=mem_dim)."""

    def __init__(self, d, mem_dim, grid):
        super().__init__()
        self.self_attn = _TRoPEAttention(d, 1, feat_sizes=grid)
        self.cross_attn_image = _TRoPEAttention(
            d, 1, kv_in_dim=mem_dim, rope_k_repeat=True, feat_sizes=grid
        )
        self.linear1 = nn.Linear(d, 8 * d)
        self.linear2 = nn.Linear(8 * d, d)
        self.norm1 = nn.LayerNorm(d)
        self.norm2 = nn.LayerNorm(d)
        self.norm3 = nn.LayerNorm(d)

    def forward(self, tgt, memory, pos, num_k_exclude_rope=0, mask=None):
        tgt2 = self.norm1(tgt)
        tgt = tgt + self.self_attn(tgt2, tgt2, tgt2)
        tgt2 = self.norm2(tgt)
        tgt = tgt + self.cross_attn_image(
            tgt2, memory + pos, memory,
            num_k_exclude_rope=num_k_exclude_rope, attn_mask=mask,
        )
        tgt2 = self.norm3(tgt)
        return tgt + self.linear2(F.relu(self.linear1(tgt2)))


class _TMemAttn(nn.Module):
    """sam2/modeling/memory_attention.py:MemoryAttention
    (pos_enc_at_input=True: curr + 0.1·curr_pos)."""

    def __init__(self, cfg: SAM2Config, grid):
        super().__init__()
        d = cfg.d_model
        self.layers = nn.ModuleList(
            [
                _TMemAttnLayer(d, cfg.mem_dim, grid)
                for _ in range(cfg.memory_attention_layers)
            ]
        )
        self.norm = nn.LayerNorm(d)

    def forward(self, curr, curr_pos, memory, memory_pos, mask, num_obj_ptr_tokens):
        x = curr + 0.1 * curr_pos
        for layer in self.layers:
            x = layer(
                x, memory, memory_pos,
                num_k_exclude_rope=num_obj_ptr_tokens, mask=mask,
            )
        return self.norm(x)


def test_memory_attention_torch_parity(rng):
    """Published-named memory_attention.* state dict → convert.py → flax
    forward parity with the sam2-clone stack, including RoPE'd spatial
    memory slots, excluded object-pointer tokens, and a validity mask."""
    from cryovit_tpu.models.sam2.convert import convert_memory_attention_state_dict

    cfg = SAM2Config.tiny_test()
    e, d = cfg.embed_size, cfg.d_model

    torch.manual_seed(2)
    tm = _TMemAttn(cfg, (e, e)).eval()
    with torch.no_grad():
        for p in tm.parameters():
            p.uniform_(-0.1, 0.1)
    fm = MemoryAttention(cfg)
    variables = convert_memory_attention_state_dict(
        _numpy_sd(tm, "memory_attention"), cfg
    )

    n_slots, n_ptr = 2, 4
    n_rope_k = n_slots * e * e
    m_total = n_rope_k + n_ptr
    feats = rng.random((2, e, e, d)).astype(np.float32)
    pos = rng.random((2, e, e, d)).astype(np.float32)
    mem = rng.random((2, m_total, cfg.mem_dim)).astype(np.float32)
    mem_pos = rng.random((2, m_total, cfg.mem_dim)).astype(np.float32)
    mask = np.ones((2, m_total), dtype=bool)
    mask[:, e * e : n_rope_k] = False  # an invalid (empty) spatial slot
    mask[:, -2:] = False  # two empty pointer tokens

    out = fm.apply(
        variables, jnp.asarray(feats), jnp.asarray(pos), jnp.asarray(mem),
        jnp.asarray(mem_pos), jnp.asarray(mask), n_rope_k,
    )
    with torch.no_grad():
        t_out = tm(
            torch.from_numpy(feats.reshape(2, e * e, d)),
            torch.from_numpy(pos.reshape(2, e * e, d)),
            torch.from_numpy(mem),
            torch.from_numpy(mem_pos),
            torch.from_numpy(mask),
            n_ptr,
        )
    np.testing.assert_allclose(
        np.asarray(out), t_out.numpy().reshape(2, e, e, d), atol=2e-5
    )


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


# =================== Full checkpoint round-trip ==============================
# Assembles a complete state dict with the PUBLISHED sam2 tensor naming
# (sam2.1 checkpoint layout: image_encoder.trunk/neck, sam_prompt_encoder,
# sam_mask_decoder, memory_encoder, memory_attention, and the SAM2Base-level
# embeddings) from the torch clones above, converts it with
# convert_sam2_state_dict, and asserts it exactly fills the flax SAM2Model
# tree — every checkpoint tensor consumed, every model param covered except
# the deliberately-from-scratch PromptPredictor (the reference trains it
# fresh, models/sam2.py:63-66) and LoRA adapters (applied AFTER the strict
# load, reference models/sam2.py:802-842).

def _renamed(sd: dict, renames: list[tuple[str, str]]) -> dict:
    out = {}
    for k, v in sd.items():
        for old, new in renames:
            if k.startswith(old):
                k = new + k[len(old):]
                break
        out[k] = v
    return out


def _published_full_state_dict(cfg: SAM2Config, rng, return_modules: bool = False):
    """Build a sam2.1-checkpoint-shaped state dict for ``cfg``.

    With ``return_modules`` also returns the torch clone instances whose
    weights the state dict carries (for the train-step parity test)."""
    torch.manual_seed(11)

    def small_init(module):
        # keep activations tame so f32 accumulation-order noise between
        # frameworks stays inside parity tolerances (torch default inits
        # produce O(10) activations whose relative noise amplifies over
        # the 4-stage trunk + heads)
        with torch.no_grad():
            for p in module.parameters():
                p.uniform_(-0.05, 0.05)
        return module

    def rand(*shape):
        return rng.standard_normal(shape).astype(np.float32) * 0.05

    sd: dict[str, np.ndarray] = {}

    # ---- image encoder: Hiera trunk (published: mlp.layers.{0,1},
    # patch_embed.proj) + FPN neck (convs ordered low-res→high-res)
    th = small_init(_THiera(cfg.hiera))
    trunk = {k: v.detach().numpy() for k, v in th.state_dict().items()}
    renames = [("patch_embed.", "patch_embed.proj.")]
    for i in range(len(th.blocks)):
        renames += [
            (f"blocks.{i}.mlp_fc1.", f"blocks.{i}.mlp.layers.0."),
            (f"blocks.{i}.mlp_fc2.", f"blocks.{i}.mlp.layers.1."),
        ]
    trunk = _renamed(trunk, renames)
    trunk["pos_embed"] = trunk["pos_embed"].transpose(2, 0, 1)[None]
    trunk["pos_embed_window"] = trunk["pos_embed_window"].transpose(2, 0, 1)[None]
    sd.update({f"image_encoder.trunk.{k}": v for k, v in trunk.items()})
    dims = cfg.hiera.stage_dims
    for i, dim in enumerate(reversed(dims)):  # convs.0 = lowest-res level
        sd[f"image_encoder.neck.convs.{i}.conv.weight"] = rand(cfg.d_model, dim, 1, 1)
        sd[f"image_encoder.neck.convs.{i}.conv.bias"] = rand(cfg.d_model)

    # ---- prompt encoder (sam2/modeling/sam/prompt_encoder.py layout)
    d = cfg.d_model
    pe = "sam_prompt_encoder"
    sd[f"{pe}.pe_layer.positional_encoding_gaussian_matrix"] = rand(2, d // 2)
    for i in range(4):
        sd[f"{pe}.point_embeddings.{i}.weight"] = rand(1, d)
    sd[f"{pe}.not_a_point_embed.weight"] = rand(1, d)
    sd[f"{pe}.no_mask_embed.weight"] = rand(1, d)
    chans = [(1, 4), (4, 16)]
    for j, (cin, cout) in enumerate(chans):
        sd[f"{pe}.mask_downscaling.{3 * j}.weight"] = rand(cout, cin, 2, 2)
        sd[f"{pe}.mask_downscaling.{3 * j}.bias"] = rand(cout)
        sd[f"{pe}.mask_downscaling.{3 * j + 1}.weight"] = rand(cout)
        sd[f"{pe}.mask_downscaling.{3 * j + 1}.bias"] = rand(cout)
    sd[f"{pe}.mask_downscaling.6.weight"] = rand(d, 16, 1, 1)
    sd[f"{pe}.mask_downscaling.6.bias"] = rand(d)

    # ---- mask decoder (published transformer/upscaling naming)
    td = small_init(_TMaskDecoder(cfg, rank=0, alpha=1.0))
    dec = {k: v.detach().numpy() for k, v in td.state_dict().items()}
    renames = [
        ("final_attn.", "transformer.final_attn_token_to_image."),
        ("norm_final.", "transformer.norm_final_attn."),
        ("upscale1.", "output_upscaling.0."),
        ("upscale_ln.", "output_upscaling.1."),
        ("upscale2.", "output_upscaling.3."),
        ("hypers.", "output_hypernetworks_mlps."),
        ("iou_head.", "iou_prediction_head."),
        ("obj_head.", "pred_obj_score_head."),
    ]
    for i in range(cfg.decoder_depth):
        renames += [
            (f"layers.{i}.cross_t2i.", f"transformer.layers.{i}.cross_attn_token_to_image."),
            (f"layers.{i}.cross_i2t.", f"transformer.layers.{i}.cross_attn_image_to_token."),
            (f"layers.{i}.mlp1.", f"transformer.layers.{i}.mlp.layers.0."),
            (f"layers.{i}.mlp2.", f"transformer.layers.{i}.mlp.layers.1."),
            (f"layers.{i}.", f"transformer.layers.{i}."),
        ]
    dec = _renamed(dec, renames)
    # rank-0 LoRALinear wraps the base projection under .proj; published
    # checkpoints store plain q_proj/v_proj Linears
    dec = {k.replace(".q_proj.proj.", ".q_proj.").replace(".v_proj.proj.", ".v_proj."): v
           for k, v in dec.items()}
    # token embeddings are nn.Embedding in sam2 (.weight)
    for tok, pub in [("iou_token", "iou_token"), ("mask_tokens", "mask_tokens"),
                     ("obj_token", "obj_score_token")]:
        dec[f"{pub}.weight"] = dec.pop(tok)
    sd.update({f"sam_mask_decoder.{k}": v for k, v in dec.items()})

    # ---- memory modules (published naming straight from the clones)
    tme = small_init(_TMemoryEncoder(cfg))
    sd.update(_numpy_sd(tme, "memory_encoder"))
    tma = small_init(_TMemAttn(cfg, (cfg.embed_size, cfg.embed_size)))
    sd.update(_numpy_sd(tma, "memory_attention"))

    # ---- SAM2Base-level embeddings
    sd["no_mem_embed"] = rand(1, 1, d)
    sd["no_mem_pos_enc"] = rand(1, 1, d)
    sd["maskmem_tpos_enc"] = rand(cfg.num_maskmem, 1, 1, cfg.mem_dim)
    sd["obj_ptr_proj.weight"] = rand(d, d)
    sd["obj_ptr_proj.bias"] = rand(d)
    sd["obj_ptr_tpos_proj.weight"] = rand(cfg.mem_dim, d)
    sd["obj_ptr_tpos_proj.bias"] = rand(cfg.mem_dim)
    sd["no_obj_ptr"] = rand(1, d)
    if return_modules:
        return sd, {"hiera": th, "decoder": td, "memenc": tme, "memattn": tma}
    return sd


def test_converter_full_checkpoint_roundtrip(rng, caplog):
    """A complete published-naming state dict converts with every tensor
    consumed and exactly fills the SAM2Model param tree (minus the
    from-scratch PromptPredictor and post-load LoRA adapters)."""
    import logging

    from cryovit_tpu.models.sam2.convert import convert_sam2_state_dict
    from cryovit_tpu.models.sam2.model import SAM2Model

    cfg = SAM2Config.tiny_test()
    sd = _published_full_state_dict(cfg, rng)

    with caplog.at_level(logging.WARNING):
        converted = convert_sam2_state_dict(sd, cfg)
    assert not [r for r in caplog.records if "unconsumed" in r.message], (
        "converter left checkpoint tensors unconsumed"
    )

    model = SAM2Model(cfg=cfg, lora_rank=0, lora_alpha=1.0)
    s = cfg.image_size
    expected = jax.eval_shape(
        model.init, jax.random.key(0),
        jnp.zeros((1, 2, s, s), dtype=jnp.float32),
    )

    def paths(tree):
        return {
            jax.tree_util.keystr(p): v.shape
            for p, v in jax.tree_util.tree_flatten_with_path(tree)[0]
        }

    # the converter emits the family wrapper's {"params": {"sam": ...}}
    # scoping; a bare SAM2Model's tree sits directly under "params"
    got = paths(converted["params"]["sam"])
    want = paths(expected["params"])

    missing = {p for p in want if p not in got}
    extra = {p for p in got if p not in want}
    assert not extra, f"converted params absent from the model tree: {sorted(extra)[:8]}"
    # the only uncovered params must be the from-scratch prompt predictor
    assert missing and all("prompt_predictor" in p for p in missing), sorted(missing)[:8]

    mismatched = {
        p: (got[p], want[p]) for p in got if tuple(got[p]) != tuple(want[p])
    }
    assert not mismatched, f"shape mismatches: {dict(list(mismatched.items())[:5])}"


def test_pretrained_sam2_weights_merge(tmp_path, rng):
    """The reference's create_sam_model_from_weights path: a converted
    checkpoint in model_dir/SAM2 merges over model.init — pretrained
    modules take the checkpoint values, PromptPredictor/LoRA stay fresh."""
    from flax.serialization import to_bytes

    from cryovit_tpu.models.losses import DiceLoss
    from cryovit_tpu.models.metrics import DiceMetric
    from cryovit_tpu.models.sam2.convert import convert_sam2_state_dict
    from cryovit_tpu.models.sam2.family import SAM2
    from cryovit_tpu.train.checkpoint import merge_variables

    cfg = SAM2Config.tiny_test()
    sd = _published_full_state_dict(cfg, rng)
    converted = convert_sam2_state_dict(sd, cfg)
    sam_dir = tmp_path / "SAM2"
    sam_dir.mkdir()
    (sam_dir / "sam2_weights.msgpack").write_bytes(to_bytes(converted))

    sam = SAM2(
        name="SAM2", input_key="data", lr=5e-5, weight_decay=1e-3,
        losses={"dice_loss": DiceLoss()},
        metrics={"dice_metric": DiceMetric(0.5)},
        custom_kwargs={"test_config": True},
    )
    pretrained = sam.load_pretrained_variables(sam_dir)
    assert pretrained is not None

    s = cfg.image_size
    init = sam.init(
        jax.random.key(0), jnp.zeros((1, 2, s, s, 1), dtype=jnp.float32)
    )
    merged = merge_variables(init, pretrained)

    got = np.asarray(
        merged["params"]["sam"]["image_encoder"]["trunk"]["patch_embed"]["kernel"]
    )
    want = np.asarray(
        converted["params"]["sam"]["image_encoder"]["trunk"]["patch_embed"]["kernel"]
    )
    np.testing.assert_allclose(got, want, atol=1e-6)
    # prompt predictor params survive from init (not in the checkpoint)
    assert "prompt_predictor" in merged["params"]["sam"]

    # missing weights → None with a warning, not an error
    assert sam.load_pretrained_variables(tmp_path / "nowhere") is None


# ======================= Prompt predictor ====================================
# Torch clone of the reference's own PromptPredictor (reference
# models/sam2_blocks.py:14-223 — the one first-party SAM2 module the
# reference defines itself rather than importing from the sam2 package),
# with its attribute naming, InstanceNorm3d(no-affine) conv blocks,
# align_corners=True resizes, and unclipped box corners.

class _TPromptConvBlock(nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.conv = nn.Conv3d(cin, cout, 3, padding=1, bias=False)
        self.norm = nn.InstanceNorm3d(cout)
        self.act = nn.GELU()

    def forward(self, x):
        return self.act(self.norm(self.conv(x)))


class _TPromptPredictor(nn.Module):
    def __init__(self, in_channels, hidden=16, depth=4, mults=(1, 2, 4, 8, 10)):
        super().__init__()
        ch = [m * hidden for m in mults]
        self.scale_factor = 4
        self.init_conv = nn.Module()
        self.init_conv.layers = nn.Sequential(
            _TPromptConvBlock(in_channels, ch[0]), _TPromptConvBlock(ch[0], ch[0])
        )
        self.down_layers = nn.ModuleList()
        for i in range(depth):
            blk = nn.Module()
            blk.layers = nn.Sequential(
                nn.MaxPool3d(2),
                _TPromptConvBlock(ch[i], ch[i + 1]),
                _TPromptConvBlock(ch[i + 1], ch[i + 1]),
            )
            self.down_layers.append(blk)
        self.up_layers = nn.ModuleList()
        for i in reversed(range(depth)):
            blk = nn.Module()
            blk.layers = nn.Sequential(
                _TPromptConvBlock(ch[i + 1] + ch[i], ch[i]),
                _TPromptConvBlock(ch[i], ch[i]),
            )
            self.up_layers.append(blk)
        self.prompt_out = nn.Conv3d(ch[0], 1, 1)
        self.box_out = nn.Module()
        self.box_out.fc = nn.Linear(ch[0], 4)

    def forward(self, x, num_batches):  # x (B·D, C, H, W)
        bd, c, hh, ww = x.shape
        x = x.view(num_batches, -1, c, hh, ww).transpose(1, 2)
        x = self.init_conv.layers(x)
        outs = []
        for blk in self.down_layers:
            outs.append(x)
            x = blk.layers(x)
        for blk, skip in zip(self.up_layers, reversed(outs)):
            x = F.interpolate(
                x, size=skip.shape[-3:], mode="trilinear", align_corners=True
            )
            x = blk.layers(torch.cat([skip, x], dim=1))
        prompts = self.prompt_out(x).view(bd, 1, hh, ww)
        prompts = F.interpolate(
            prompts, scale_factor=self.scale_factor, mode="bilinear",
            align_corners=True,
        )
        pooled = x.mean(dim=(-2, -1)).transpose(1, 2).reshape(bd, -1)
        box = torch.sigmoid(self.box_out.fc(pooled))
        x1y1 = box[:, :2]
        return torch.cat([x1y1, x1y1 + box[:, 2:]], dim=1), prompts


def _conv3d_nobias(sd, prefix):
    return {"kernel": sd[f"{prefix}.weight"].numpy().transpose(2, 3, 4, 1, 0)}


def _map_prompt_predictor(tm: _TPromptPredictor, depth=4) -> dict:
    sd = tm.state_dict()
    params = {
        "in0": {"Conv_0": _conv3d_nobias(sd, "init_conv.layers.0.conv")},
        "in1": {"Conv_0": _conv3d_nobias(sd, "init_conv.layers.1.conv")},
        "prompt_out": {
            "kernel": sd["prompt_out.weight"].numpy().transpose(2, 3, 4, 1, 0),
            "bias": sd["prompt_out.bias"].numpy(),
        },
        "box_out": {
            "kernel": sd["box_out.fc.weight"].numpy().T,
            "bias": sd["box_out.fc.bias"].numpy(),
        },
    }
    for i in range(depth):
        params[f"down{i}_0"] = {
            "Conv_0": _conv3d_nobias(sd, f"down_layers.{i}.layers.1.conv")
        }
        params[f"down{i}_1"] = {
            "Conv_0": _conv3d_nobias(sd, f"down_layers.{i}.layers.2.conv")
        }
    for j, i in enumerate(reversed(range(depth))):
        params[f"up{i}_0"] = {
            "Conv_0": _conv3d_nobias(sd, f"up_layers.{j}.layers.0.conv")
        }
        params[f"up{i}_1"] = {
            "Conv_0": _conv3d_nobias(sd, f"up_layers.{j}.layers.1.conv")
        }
    return {"params": params}


def test_prompt_predictor_torch_parity(rng):
    """flax PromptPredictor vs the reference-faithful torch clone: boxes
    and 4×-upsampled mask prompts match through weight mapping."""
    from cryovit_tpu.models.sam2.prompt_predictor import PromptPredictor

    # depth/h/w stay ≥2 at the U-Net bottom (InstanceNorm needs >1 element)
    cin, b, d, hh = 32, 1, 32, 32
    torch.manual_seed(5)
    tm = _TPromptPredictor(cin).eval()
    with torch.no_grad():
        for p in tm.parameters():
            p.uniform_(-0.1, 0.1)
    fm = PromptPredictor(in_channels=cin)
    variables = jax.tree_util.tree_map(
        jnp.asarray, _map_prompt_predictor(tm)
    )

    feats = rng.random((b, d, hh, hh, cin)).astype(np.float32)
    boxes, prompts = fm.apply(variables, jnp.asarray(feats))
    with torch.no_grad():
        t_boxes, t_prompts = tm(
            torch.from_numpy(
                feats.reshape(b * d, hh, hh, cin).transpose(0, 3, 1, 2)
            ),
            b,
        )
    np.testing.assert_allclose(np.asarray(boxes), t_boxes.numpy(), atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(prompts)[..., 0], t_prompts[:, 0].numpy(), atol=2e-4
    )


def test_verify_checkpoint_strict_audit(rng):
    """`tools/convert_sam2.py --verify` backend (VERDICT r3 next #7): a
    clean published-naming checkpoint passes; a perturbed one — extra key,
    missing key, or wrong shape — fails with the offender named."""
    from cryovit_tpu.models.sam2.convert import verify_checkpoint

    cfg = SAM2Config.tiny_test()
    sd = _published_full_state_dict(cfg, rng)

    report = verify_checkpoint(dict(sd), cfg)
    assert report["ok"], {
        k: v for k, v in report.items() if v and k != "n_tensors"
    }
    assert report["n_consumed"] == report["n_tensors"]

    # extra (unconsumed) tensor — e.g. naming drift in a future release
    extra = dict(sd)
    extra["image_encoder.trunk.blocks.0.attn.qkv.weight_g"] = np.zeros(3)
    report = verify_checkpoint(extra, cfg)
    assert not report["ok"]
    assert "image_encoder.trunk.blocks.0.attn.qkv.weight_g" in report["unconsumed"]

    # missing tensor
    short = dict(sd)
    del short["no_obj_ptr"]
    report = verify_checkpoint(short, cfg)
    assert not report["ok"]
    assert report["missing"] == ["no_obj_ptr"]

    # wrong shape (a transposed decoder projection)
    wrong = dict(sd)
    key = "obj_ptr_proj.weight"
    wrong[key] = np.zeros((sd[key].shape[0], sd[key].shape[1] + 1), np.float32)
    report = verify_checkpoint(wrong, cfg)
    assert not report["ok"]
    assert report["error"] or any(
        "obj_ptr_proj" in path for path, *_ in report["shape_mismatches"]
    ), report
