"""SAM2 TRAIN-STEP parity: the flax SAM2Model's full tracking forward,
loss, gradients, and one AdamW update vs an independent torch assembly of
the per-module clones from tests/test_sam2_torch_parity.py (each of which
mirrors the sam2 package module it names).

The torch side replays the ring-buffer tracking semantics as a plain
python loop (cond slices first, recency-indexed maskmem_tpos_enc on the
pos stream, object pointers with projected temporal sine PE, sigmoid
scale/bias memory encoding of RAW backbone features) — the same contract
``tests/test_sam2.py::test_tracking_scan_matches_python_oracle`` pins on
the jax side, but here with torch autograd so the GRADIENT flow is
checked end to end (VERDICT r2 next-step #4).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
from torch import nn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from cryovit_tpu.models.sam2.config import SAM2Config  # noqa: E402
from cryovit_tpu.models.sam2.encoder import sine_position_encoding  # noqa: E402

from test_sam2_torch_parity import (  # noqa: E402
    _TLayerNorm2d,
    _TPromptPredictor,
    _map_prompt_predictor,
    _published_full_state_dict,
)


def _t(arr):
    return torch.from_numpy(np.asarray(arr, dtype=np.float32))


class _TSAM2(nn.Module):
    """Torch assembly of the module clones + SAM2Model.__call__ semantics."""

    def __init__(self, cfg: SAM2Config, sd, mods, tpp):
        super().__init__()
        self.cfg = cfg
        self.trunk = mods["hiera"]
        self.decoder = mods["decoder"]
        self.memenc = mods["memenc"]
        self.memattn = mods["memattn"]
        self.pp = tpp
        d = cfg.d_model
        n = len(cfg.hiera.stages)
        dims = cfg.hiera.stage_dims
        self.neck = nn.ModuleList()
        for i in range(n):  # flax neck_conv{i} ↔ published convs.{n-1-i}
            conv = nn.Conv2d(dims[i], d, 1)
            conv.weight.data = _t(sd[f"image_encoder.neck.convs.{n - 1 - i}.conv.weight"])
            conv.bias.data = _t(sd[f"image_encoder.neck.convs.{n - 1 - i}.conv.bias"])
            self.neck.append(conv)

        pe = "sam_prompt_encoder"
        self.pe_gaussian = nn.Parameter(
            _t(sd[f"{pe}.pe_layer.positional_encoding_gaussian_matrix"])
        )
        self.point_embeddings = nn.Parameter(
            _t(np.stack([sd[f"{pe}.point_embeddings.{i}.weight"][0] for i in range(4)]))
        )
        self.not_a_point_embed = nn.Parameter(_t(sd[f"{pe}.not_a_point_embed.weight"][0]))
        self.no_mask_embed = nn.Parameter(_t(sd[f"{pe}.no_mask_embed.weight"][0]))
        self.mask_down = nn.ModuleList()
        for j, (cin, cout, k, s) in enumerate(
            [(1, 4, 2, 2), (4, 16, 2, 2), (16, d, 1, 1)]
        ):
            conv = nn.Conv2d(cin, cout, k, s)
            conv.weight.data = _t(sd[f"{pe}.mask_downscaling.{3 * j}.weight"])
            conv.bias.data = _t(sd[f"{pe}.mask_downscaling.{3 * j}.bias"])
            self.mask_down.append(conv)
        self.mask_lns = nn.ModuleList()
        for j, c in enumerate((4, 16)):
            ln = _TLayerNorm2d(c, eps=1e-6)
            ln.weight.data = _t(sd[f"{pe}.mask_downscaling.{3 * j + 1}.weight"])
            ln.bias.data = _t(sd[f"{pe}.mask_downscaling.{3 * j + 1}.bias"])
            self.mask_lns.append(ln)

        self.no_mem_embed = nn.Parameter(_t(sd["no_mem_embed"]).reshape(-1))
        self.maskmem_tpos_enc = nn.Parameter(
            _t(sd["maskmem_tpos_enc"]).reshape(cfg.num_maskmem, cfg.mem_dim)
        )
        self.obj_ptr_proj = nn.Linear(d, d)
        self.obj_ptr_proj.weight.data = _t(sd["obj_ptr_proj.weight"])
        self.obj_ptr_proj.bias.data = _t(sd["obj_ptr_proj.bias"])
        self.obj_ptr_tpos_proj = nn.Linear(d, cfg.mem_dim)
        self.obj_ptr_tpos_proj.weight.data = _t(sd["obj_ptr_tpos_proj.weight"])
        self.obj_ptr_tpos_proj.bias.data = _t(sd["obj_ptr_tpos_proj.bias"])
        self.no_obj_ptr = nn.Parameter(_t(sd["no_obj_ptr"]).reshape(-1))

        # constants
        e = cfg.embed_size
        self.register_buffer("grid_pe_mem", _t(sine_position_encoding(e, e, cfg.mem_dim)))
        self.register_buffer("vis_pos", _t(sine_position_encoding(e, e, d)))
        # hiera background-pos resize matrices (differentiable pos path)
        from cryovit_tpu.ops.resize import bicubic_resize_matrix

        gh = cfg.image_size // cfg.hiera.patch_stride
        bh, bw = cfg.hiera.window_pos_embed_bkg_spatial_size
        self.register_buffer("pos_rh", _t(np.asarray(bicubic_resize_matrix(bh, gh))))
        self.register_buffer("pos_rw", _t(np.asarray(bicubic_resize_matrix(bw, gh))))

    # ---- building blocks -------------------------------------------------

    def _hiera_pos(self, gh, gw):
        cfg = self.cfg.hiera
        pos = torch.einsum("oh,hwc->owc", self.pos_rh, self.trunk.pos_embed)
        pos = torch.einsum("pw,owc->opc", self.pos_rw, pos)
        win = cfg.window_spec[0]
        tiles = self.trunk.pos_embed_window.repeat(
            (gh + win - 1) // win, (gw + win - 1) // win, 1
        )
        return pos + tiles[:gh, :gw]

    def encode_images(self, slices):  # (N, S, S) → fpn levels + pos
        x = slices[:, None].repeat(1, 3, 1, 1)
        gh = x.shape[-1] // self.cfg.hiera.patch_stride
        trunk_outs = self.trunk(x, self._hiera_pos(gh, gh))  # (N,H,W,C) levels
        n = len(trunk_outs)
        laterals = [
            self.neck[i](t.permute(0, 3, 1, 2)) for i, t in enumerate(trunk_outs)
        ]
        outs = [None] * n
        prev = None
        for i in range(n - 1, -1, -1):
            feat = laterals[i]
            if prev is not None and i >= n - 2:
                feat = feat + F.interpolate(prev, scale_factor=2, mode="nearest")
            outs[i] = feat
            prev = feat
        return outs[: self.cfg.num_feature_levels]  # NCHW, strides 4/8/16

    def _random_pe(self, coords):  # (...,2) in [0,1]
        proj = (2.0 * coords - 1.0) @ self.pe_gaussian
        proj = 2 * np.pi * proj
        return torch.cat([torch.sin(proj), torch.cos(proj)], dim=-1)

    def dense_pe(self):
        e = self.cfg.embed_size
        ys = (torch.arange(e, dtype=torch.float32) + 0.5) / e
        gx, gy = torch.meshgrid(ys, ys, indexing="xy")
        return self._random_pe(torch.stack([gx, gy], dim=-1))

    def encode_boxes(self, boxes):
        corners = boxes.reshape(-1, 2, 2) + 0.5
        pe = self._random_pe(corners / self.cfg.image_size)
        tl = pe[:, 0] + self.point_embeddings[2]
        br = pe[:, 1] + self.point_embeddings[3]
        return torch.stack([tl, br], dim=1)

    def encode_masks(self, masks):  # (B,1,S,S)
        x = self.mask_down[0](masks)
        x = F.gelu(self.mask_lns[0](x))
        x = self.mask_down[1](x)
        x = F.gelu(self.mask_lns[1](x))
        return self.mask_down[2](x)  # (B,d,e,e)

    def sam_heads(self, pix, boxes, mask_prompt, high_res, multimask):
        """pix (B,e,e,d) channels-last; mask_prompt (B,1,S,S); high_res
        NCHW level feats; mirrors SAM2Model._sam_heads."""
        cfg = self.cfg
        b = pix.shape[0]
        s = cfg.mask_input_size
        mp = F.interpolate(
            mask_prompt, size=(s, s), mode="bilinear", antialias=True
        )
        sparse = torch.cat(
            [
                self.not_a_point_embed[None, None].expand(b, 1, -1),
                self.encode_boxes(boxes * cfg.image_size),
            ],
            dim=1,
        )
        dense = self.encode_masks(mp).permute(0, 2, 3, 1)  # (B,e,e,d)
        masks, ious, tokens_out, obj = self.decoder(
            pix, self.dense_pe(), sparse, dense,
            (high_res[0], high_res[1]),
        )
        is_obj = obj > 0
        masks = torch.where(is_obj[:, :, None, None], masks, torch.as_tensor(cfg.no_obj_score))
        multi_low = masks[:, 1:].max(dim=1).values
        best = ious[:, 1:].argmax(dim=-1)
        idx = best[:, None, None, None].expand(-1, 1, masks.shape[-2], masks.shape[-1])
        best_low = torch.gather(masks[:, 1:], 1, idx)[:, 0]
        tok_idx = best[:, None, None].expand(-1, 1, tokens_out.shape[-1])
        multi_token = torch.gather(tokens_out[:, 1:], 1, tok_idx)[:, 0]
        low_res = multi_low if multimask else masks[:, 0]
        mem_mask = best_low if multimask else masks[:, 0]
        token = multi_token if multimask else tokens_out[:, 0]
        obj_ptr = self.obj_ptr_proj(token)
        lam = is_obj[:, 0:1].float()
        obj_ptr = lam * obj_ptr + (1 - lam) * self.no_obj_ptr
        high = F.interpolate(
            mem_mask[:, None], size=(cfg.image_size, cfg.image_size),
            mode="bilinear",
        )
        return low_res, high, obj_ptr

    def forward(self, slices, order, num_cond):
        """slices (B, D, S, S); mirrors SAM2Model.__call__ + the oracle
        loop in tests/test_sam2.py."""
        cfg = self.cfg
        b, dnum, s, _ = slices.shape
        e = cfg.embed_size
        fpn = self.encode_images(slices.reshape(b * dnum, s, s))
        s0, s1, s2 = (
            f.permute(0, 2, 3, 1).reshape(b, dnum, *f.shape[-2:], cfg.d_model)
            for f in fpn
        )
        boxes, prompts = self.pp(
            fpn[0].reshape(b * dnum, cfg.d_model, *fpn[0].shape[-2:]), b
        )
        boxes = boxes.reshape(b, dnum, 4)
        prompts_full = prompts.reshape(b, dnum, s, s)

        mc = cfg.max_cond_slices
        ratio = cfg.d_model // cfg.mem_dim
        cond_mems, roll_mems, cond_ptrs, roll_ptrs = [], [], [], []
        outs = {}
        for step, i in enumerate(order):
            is_cond = step < num_cond
            feat2 = s2[:, i]  # (B,e,e,d)
            if is_cond or not (cond_mems or roll_mems):
                pix = feat2 + self.no_mem_embed
            else:
                toks, poss = [], []
                grid_pe = self.grid_pe_mem.reshape(1, e * e, cfg.mem_dim)
                for m in cond_mems:
                    toks.append(m)
                    poss.append(grid_pe + self.maskmem_tpos_enc[cfg.num_maskmem - 1])
                recent = roll_mems[-(cfg.num_maskmem - 1):]
                for j, m in enumerate(reversed(recent)):
                    toks.append(m)
                    poss.append(grid_pe + self.maskmem_tpos_enc[j])
                n_rope_k = len(toks) * e * e
                ptrs = cond_ptrs + roll_ptrs[-(cfg.max_obj_ptrs - mc):]
                nroll = len(roll_ptrs[-(cfg.max_obj_ptrs - mc):])
                dists = [0.0] * len(cond_ptrs) + [
                    float(nroll - j) for j in range(nroll)
                ]
                ptr_tok = torch.stack(ptrs, dim=1).reshape(b, -1, cfg.mem_dim)
                pe_in = _t(
                    np.asarray(
                        _sine_pe_1d_np(
                            np.asarray(dists) / max(cfg.max_obj_ptrs - 1, 1),
                            cfg.d_model,
                        )
                    )
                )
                ptr_pe = self.obj_ptr_tpos_proj(pe_in)
                ptr_pos = ptr_pe.repeat_interleave(ratio, dim=0)[None].expand_as(ptr_tok)
                tokens = torch.cat(toks + [ptr_tok], dim=1)
                pos_toks = torch.cat(
                    [p.expand_as(t) for p, t in zip(poss, toks)] + [ptr_pos], dim=1
                )
                mask = torch.ones(tokens.shape[:2], dtype=torch.bool)
                pix = self.memattn(
                    feat2.reshape(b, e * e, cfg.d_model),
                    self.vis_pos.reshape(1, e * e, cfg.d_model).expand(b, -1, -1),
                    tokens,
                    pos_toks,
                    mask,
                    ptr_tok.shape[1],
                ).reshape(b, e, e, cfg.d_model)
            low, high, optr = self.sam_heads(
                pix, boxes[:, i], prompts_full[:, i][:, None],
                (
                    s0[:, i].permute(0, 3, 1, 2),
                    s1[:, i].permute(0, 3, 1, 2),
                ),
                is_cond,
            )
            mask_for_mem = (
                torch.sigmoid(high) * cfg.sigmoid_scale_for_mem_enc
                + cfg.sigmoid_bias_for_mem_enc
            )
            mem = self.memenc(
                feat2.permute(0, 3, 1, 2), mask_for_mem, skip_mask_sigmoid=True
            )
            mem = mem.permute(0, 2, 3, 1).reshape(b, -1, cfg.mem_dim)
            (cond_mems if is_cond else roll_mems).append(mem)
            (cond_ptrs if is_cond else roll_ptrs).append(optr)
            outs[i] = low
        low = torch.stack([outs[i] for i in range(dnum)], dim=1)
        up = F.interpolate(
            low.reshape(b * dnum, 1, *low.shape[-2:]), size=(s, s), mode="bilinear"
        ).reshape(b, dnum, s, s)
        return torch.sigmoid(up), prompts_full


def _sine_pe_1d_np(pos, dim, temperature=10000.0):
    pe_dim = dim // 2
    dim_t = np.arange(pe_dim, dtype=np.float32)
    dim_t = temperature ** (2 * (dim_t // 2) / pe_dim)
    ang = np.asarray(pos)[..., None] / dim_t
    return np.concatenate([np.sin(ang), np.cos(ang)], axis=-1).astype(np.float32)


def _dice(pred, target):
    inter = (pred * target).sum()
    return 1 - 2 * inter / (pred.sum() + target.sum() + 1e-3)


def test_sam2_train_step_parity(rng):
    """Full tracking forward + combined dice/mask loss + gradients + one
    AdamW step: flax vs the torch clone assembly on identical weights and
    data (cond-first order, ring memory, object pointers)."""
    import optax

    from cryovit_tpu.models.sam2.convert import convert_sam2_state_dict
    from cryovit_tpu.models.sam2.model import SAM2Model
    from cryovit_tpu.train.checkpoint import merge_variables

    import dataclasses

    # image 128 / 16 slices keep the depth-4 prompt-predictor U-Net's
    # MaxPool3d legal on the torch side (the reference pools depth too)
    cfg = dataclasses.replace(SAM2Config.tiny_test(), image_size=128, max_cond_slices=2)
    sd, mods = _published_full_state_dict(cfg, rng, return_modules=True)
    torch.manual_seed(21)
    tpp = _TPromptPredictor(cfg.d_model)
    with torch.no_grad():
        for p in tpp.parameters():
            p.uniform_(-0.05, 0.05)
    tmodel = _TSAM2(cfg, sd, mods, tpp)

    model = SAM2Model(cfg=cfg, lora_rank=0, lora_alpha=1.0)
    s = cfg.image_size
    d = 16
    slices = rng.random((1, d, s, s)).astype(np.float32)
    labels = rng.integers(0, 2, size=(1, d, s, s)).astype(np.float32)
    order = [0, 8] + [i for i in range(d) if i not in (0, 8)]
    num_cond = 2

    init = model.init(jax.random.key(0), jnp.asarray(slices))
    converted = convert_sam2_state_dict(sd, cfg)
    variables = merge_variables(init, {"params": converted["params"]["sam"]})
    variables["params"]["prompt_predictor"] = jax.tree_util.tree_map(
        jnp.asarray, _map_prompt_predictor(tpp)["params"]
    )

    def loss_fn(v, slices, labels):
        out = model.apply(
            v, slices, order=jnp.asarray(order), num_cond=jnp.asarray(num_cond)
        )
        return _dice_j(out["preds"], labels) + _dice_j(
            jax.nn.sigmoid(out["prompts"]), labels
        )

    def _dice_j(pred, target):
        inter = jnp.sum(pred * target)
        return 1 - 2 * inter / (jnp.sum(pred) + jnp.sum(target) + 1e-3)

    jl, grads = jax.value_and_grad(loss_fn)(
        variables, jnp.asarray(slices), jnp.asarray(labels)
    )

    tslices = torch.from_numpy(slices)
    tlabels = torch.from_numpy(labels)
    preds_t, prompts_t = tmodel(tslices, order, num_cond)
    tl = _dice(preds_t, tlabels) + _dice(torch.sigmoid(prompts_t), tlabels)

    # forward + loss parity
    out0 = model.apply(
        variables, jnp.asarray(slices), order=jnp.asarray(order),
        num_cond=jnp.asarray(num_cond),
    )
    np.testing.assert_allclose(
        np.asarray(out0["preds"]), preds_t.detach().numpy(), atol=2e-3
    )
    assert abs(float(jl) - float(tl)) < 2e-3, (float(jl), float(tl))

    # gradient parity: global grad norm + a deep leaf
    tl.backward()
    tnorm = float(
        torch.sqrt(
            sum((p.grad**2).sum() for p in tmodel.parameters() if p.grad is not None)
        )
    )
    jnorm = float(optax.global_norm(grads))
    assert abs(jnorm - tnorm) / max(tnorm, 1e-6) < 0.05, (jnorm, tnorm)

    g_patch_j = np.asarray(
        grads["params"]["image_encoder"]["trunk"]["patch_embed"]["kernel"]
    )
    g_patch_t = tmodel.trunk.patch_embed.weight.grad.numpy().transpose(2, 3, 1, 0)
    np.testing.assert_allclose(g_patch_j, g_patch_t, atol=5e-4)

    # one AdamW step on every parameter, then forward parity again
    lr, wd = 1e-3, 1e-3
    opt = optax.adamw(lr, weight_decay=wd)
    opt_state = opt.init(variables)
    updates, _ = opt.update(grads, opt_state, variables)
    variables2 = optax.apply_updates(variables, updates)

    topt = torch.optim.AdamW(tmodel.parameters(), lr=lr, weight_decay=wd)
    topt.step()
    with torch.no_grad():
        preds_t2, _ = tmodel(tslices, order, num_cond)
    out2 = model.apply(
        variables2, jnp.asarray(slices), order=jnp.asarray(order),
        num_cond=jnp.asarray(num_cond),
    )
    np.testing.assert_allclose(
        np.asarray(out2["preds"]), preds_t2.numpy(), atol=5e-3
    )
