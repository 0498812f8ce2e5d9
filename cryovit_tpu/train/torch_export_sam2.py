"""TPU-trained SAM2/MedSAM → reference-readable torch state dict.

The reference saves trained SAM2 models like any other family: a
``.model`` pickle whose ``weights`` is the FULL Lightning-wrapper state
dict (``/root/reference/src/cryovit/utils.py:354-381``, written after CLI
training at ``run/train_model.py:152``) and whose ``model_cfg`` targets
``cryovit.models.sam2.SAM2``; ``load_model`` (``utils.py:431-468``)
rebuilds the model via ``create_sam_model_from_weights`` (published
checkpoint + LoRA factory, ``models/sam2.py:802-842``) and strict-loads
the saved weights over it.

This module emits that state dict from flax ``SAM2Model`` variables: the
exact INVERSE of ``models/sam2/convert.py`` for the published modules
(validated round-trip in ``tests/test_torch_export_sam2.py``), plus the
two trained module sets the published checkpoint lacks:

- LoRA adapters (reference ``models/sam2_blocks.py:226-286``): the
  factory rewraps decoder-attention ``q_proj``/``v_proj`` as
  ``LoRALinear`` holding the base Linear under ``.proj`` and the factors
  as ``.w_a``/``.w_b`` — so the torch keys become
  ``...q_proj.proj.weight`` / ``...q_proj.w_a.weight`` /
  ``...q_proj.w_b.weight`` (matching the flax ``LoRALinear`` submodule
  names, ``models/sam2/decoder.py:28-46``).
- PromptPredictor (reference ``models/sam2_blocks.py:146-221``):
  ``init_conv.layers.{0,1}``, ``down_layers.{i}.layers.{1,2}`` (index 0
  is the MaxPool), ``up_layers.{j}.layers.{0,1}`` with ``j`` counting
  from the BOTTOM of the U-Net (the reference builds them in
  ``reversed(range(depth))``), ``prompt_out``, ``box_out.fc``.

Key prefixes follow the reference wrapper attributes: the SAM2Base tree
under ``model.`` and the predictor under ``prompt_predictor.``
(``models/sam2.py:63-64``).
"""

from __future__ import annotations

import numpy as np

from cryovit_tpu.models.sam2.config import SAM2Config

__all__ = ["export_sam2_state_dict"]


def _f32(x) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(x, dtype=np.float32))


def _dense(out: dict, prefix: str, tree: dict) -> None:
    out[f"{prefix}.weight"] = np.ascontiguousarray(_f32(tree["kernel"]).T)
    if "bias" in tree:
        out[f"{prefix}.bias"] = _f32(tree["bias"])


def _conv2(out: dict, prefix: str, tree: dict) -> None:
    # flax (kh, kw, in, out) → torch Conv2d (out, in, kh, kw) — the exact
    # inverse of convert._conv
    out[f"{prefix}.weight"] = np.ascontiguousarray(
        _f32(tree["kernel"]).transpose(3, 2, 0, 1)
    )
    if "bias" in tree:
        out[f"{prefix}.bias"] = _f32(tree["bias"])


def _conv3(out: dict, prefix: str, tree: dict) -> None:
    # flax (kd, kh, kw, in, out) → torch Conv3d (out, in, kd, kh, kw)
    out[f"{prefix}.weight"] = np.ascontiguousarray(
        _f32(tree["kernel"]).transpose(4, 3, 0, 1, 2)
    )
    if "bias" in tree:
        out[f"{prefix}.bias"] = _f32(tree["bias"])


def _convT2(out: dict, prefix: str, tree: dict) -> None:
    # flax ConvTranspose (kh, kw, in, out) → torch ConvTranspose2d
    # (in, out, kh, kw) — inverse of convert's upscale transpose(2,3,0,1)
    out[f"{prefix}.weight"] = np.ascontiguousarray(
        _f32(tree["kernel"]).transpose(2, 3, 0, 1)
    )
    if "bias" in tree:
        out[f"{prefix}.bias"] = _f32(tree["bias"])


def _ln(out: dict, prefix: str, tree: dict) -> None:
    out[f"{prefix}.weight"] = _f32(tree["scale"])
    out[f"{prefix}.bias"] = _f32(tree["bias"])


def _lora_proj(out: dict, prefix: str, tree: dict) -> None:
    """``LoRALinear``: base Dense under ``proj`` (+ ``w_a``/``w_b`` factor
    Dense kernels when rank > 0 — the reference's post-load LoRA wrapper
    keys). Rank-0 trees export as a plain Linear, matching the published
    (pre-LoRA) decoder naming."""
    if "w_a" in tree:
        _dense(out, f"{prefix}.proj", tree["proj"])
        _dense(out, f"{prefix}.w_a", tree["w_a"])
        _dense(out, f"{prefix}.w_b", tree["w_b"])
    else:
        _dense(out, prefix, tree["proj"])


def _attention(out: dict, prefix: str, tree: dict) -> None:
    _lora_proj(out, f"{prefix}.q_proj", tree["q_proj"])
    _dense(out, f"{prefix}.k_proj", tree["k_proj"])
    _lora_proj(out, f"{prefix}.v_proj", tree["v_proj"])
    _dense(out, f"{prefix}.out_proj", tree["out_proj"])


def export_sam2_state_dict(
    variables: dict, cfg: SAM2Config
) -> dict[str, np.ndarray]:
    """flax ``SAM2Model`` variables (bare, or under the family wrapper's
    ``sam`` scope) → the reference SAM2 Lightning wrapper's full torch
    state dict (numpy values)."""
    params = variables.get("params", variables)
    if "sam" in params:
        params = params["sam"]
    out: dict[str, np.ndarray] = {}

    # ---- image encoder: Hiera trunk + FPN neck ---------------------------
    trunk = params["image_encoder"]["trunk"]
    tp = "model.image_encoder.trunk"
    _conv2(out, f"{tp}.patch_embed.proj", trunk["patch_embed"])
    out[f"{tp}.pos_embed"] = np.ascontiguousarray(
        _f32(trunk["pos_embed"]).transpose(2, 0, 1)[None]
    )
    out[f"{tp}.pos_embed_window"] = np.ascontiguousarray(
        _f32(trunk["pos_embed_window"]).transpose(2, 0, 1)[None]
    )
    for i in range(sum(cfg.hiera.stages)):
        block = trunk[f"block{i}"]
        bp = f"{tp}.blocks.{i}"
        _ln(out, f"{bp}.norm1", block["norm1"])
        _ln(out, f"{bp}.norm2", block["norm2"])
        _dense(out, f"{bp}.attn.qkv", block["attn"]["qkv"])
        _dense(out, f"{bp}.attn.proj", block["attn"]["proj"])
        _dense(out, f"{bp}.mlp.layers.0", block["mlp_fc1"])
        _dense(out, f"{bp}.mlp.layers.1", block["mlp_fc2"])
        if "proj" in block:
            _dense(out, f"{bp}.proj", block["proj"])
    n_levels = len(cfg.hiera.stages)
    for i in range(n_levels):  # flax neck_conv{i} ↔ published convs.{n-1-i}
        _conv2(
            out,
            f"model.image_encoder.neck.convs.{n_levels - 1 - i}.conv",
            params["image_encoder"][f"neck_conv{i}"],
        )

    # ---- prompt encoder --------------------------------------------------
    penc = params["prompt_encoder"]
    pe = "model.sam_prompt_encoder"
    out[f"{pe}.pe_layer.positional_encoding_gaussian_matrix"] = _f32(
        penc["pe_gaussian"]
    )
    for i in range(4):
        out[f"{pe}.point_embeddings.{i}.weight"] = _f32(
            penc["point_embeddings"]
        )[i][None]
    out[f"{pe}.not_a_point_embed.weight"] = _f32(penc["not_a_point_embed"])[None]
    out[f"{pe}.no_mask_embed.weight"] = _f32(penc["no_mask_embed"])[None]
    _conv2(out, f"{pe}.mask_downscaling.0", penc["mask_down0"])
    _ln(out, f"{pe}.mask_downscaling.1", penc["mask_ln0"])
    _conv2(out, f"{pe}.mask_downscaling.3", penc["mask_down1"])
    _ln(out, f"{pe}.mask_downscaling.4", penc["mask_ln1"])
    _conv2(out, f"{pe}.mask_downscaling.6", penc["mask_down2"])

    # ---- mask decoder (LoRA-wrapped q/v) ---------------------------------
    dec = params["mask_decoder"]
    md = "model.sam_mask_decoder"
    out[f"{md}.iou_token.weight"] = _f32(dec["iou_token"])
    out[f"{md}.mask_tokens.weight"] = _f32(dec["mask_tokens"])
    out[f"{md}.obj_score_token.weight"] = _f32(dec["obj_score_token"])
    _convT2(out, f"{md}.output_upscaling.0", dec["upscale1"])
    _ln(out, f"{md}.output_upscaling.1", dec["upscale_ln"])
    _convT2(out, f"{md}.output_upscaling.3", dec["upscale2"])
    _conv2(out, f"{md}.conv_s0", dec["conv_s0"])
    _conv2(out, f"{md}.conv_s1", dec["conv_s1"])
    for i in range(cfg.num_multimask_outputs + 1):
        for j in range(3):
            _dense(
                out,
                f"{md}.output_hypernetworks_mlps.{i}.layers.{j}",
                dec[f"hyper{i}"][f"layer{j}"],
            )
    for j in range(cfg.iou_head_depth):
        _dense(out, f"{md}.iou_prediction_head.layers.{j}",
               dec["iou_head"][f"layer{j}"])
    for j in range(3):
        _dense(out, f"{md}.pred_obj_score_head.layers.{j}",
               dec["obj_score_head"][f"layer{j}"])
    for i in range(cfg.decoder_depth):
        layer = dec[f"layer{i}"]
        lp = f"{md}.transformer.layers.{i}"
        _attention(out, f"{lp}.self_attn", layer["self_attn"])
        _attention(
            out, f"{lp}.cross_attn_token_to_image",
            layer["cross_attn_token_to_image"],
        )
        _attention(
            out, f"{lp}.cross_attn_image_to_token",
            layer["cross_attn_image_to_token"],
        )
        for n in ("norm1", "norm2", "norm3", "norm4"):
            _ln(out, f"{lp}.{n}", layer[n])
        _dense(out, f"{lp}.mlp.layers.0", layer["mlp"]["lin1"])
        _dense(out, f"{lp}.mlp.layers.1", layer["mlp"]["lin2"])
    _attention(
        out, f"{md}.transformer.final_attn_token_to_image",
        dec["final_attn_token_to_image"],
    )
    _ln(out, f"{md}.transformer.norm_final_attn", dec["norm_final"])

    # ---- memory encoder --------------------------------------------------
    menc = params["memory_encoder"]
    me = "model.memory_encoder"
    _conv2(out, f"{me}.pix_feat_proj", menc["pix_proj"])
    _conv2(out, f"{me}.out_proj", menc["out_proj"])
    _conv2(out, f"{me}.mask_downsampler.encoder.12", menc["mask_down_final"])
    for i in range(4):
        _conv2(out, f"{me}.mask_downsampler.encoder.{3 * i}", menc[f"mask_down{i}"])
        _ln(out, f"{me}.mask_downsampler.encoder.{3 * i + 1}", menc[f"mask_ln{i}"])
    for i in range(2):
        fp = f"{me}.fuser.layers.{i}"
        _conv2(out, f"{fp}.dwconv", menc[f"fuser_dw{i}"])
        _ln(out, f"{fp}.norm", menc[f"fuser_ln{i}"])
        _dense(out, f"{fp}.pwconv1", menc[f"fuser_fc1_{i}"])
        _dense(out, f"{fp}.pwconv2", menc[f"fuser_fc2_{i}"])
        out[f"{fp}.gamma"] = _f32(menc[f"fuser_gamma{i}"])

    # ---- memory attention ------------------------------------------------
    mattn = params["memory_attention"]
    ma = "model.memory_attention"
    _ln(out, f"{ma}.norm", mattn["norm_out"])
    for i in range(cfg.memory_attention_layers):
        layer = mattn[f"layer{i}"]
        lp = f"{ma}.layers.{i}"
        for flax_name, pub in (
            ("self_q", "self_attn.q_proj"), ("self_k", "self_attn.k_proj"),
            ("self_v", "self_attn.v_proj"), ("self_out", "self_attn.out_proj"),
            ("cross_q", "cross_attn_image.q_proj"),
            ("cross_k", "cross_attn_image.k_proj"),
            ("cross_v", "cross_attn_image.v_proj"),
            ("cross_out", "cross_attn_image.out_proj"),
            ("mlp_fc1", "linear1"), ("mlp_fc2", "linear2"),
        ):
            _dense(out, f"{lp}.{pub}", layer[flax_name])
        for n in ("norm1", "norm2", "norm3"):
            _ln(out, f"{lp}.{n}", layer[n])

    # ---- SAM2Base-level embeddings ---------------------------------------
    out["model.no_mem_embed"] = _f32(params["no_mem_embed"])
    out["model.no_mem_pos_enc"] = _f32(params["no_mem_pos_enc"])
    out["model.maskmem_tpos_enc"] = _f32(params["maskmem_tpos_enc"]).reshape(
        cfg.num_maskmem, 1, 1, cfg.mem_dim
    )
    _dense(out, "model.obj_ptr_proj", params["obj_ptr_proj"])
    if "obj_ptr_tpos_proj" in params:
        _dense(out, "model.obj_ptr_tpos_proj", params["obj_ptr_tpos_proj"])
    out["model.no_obj_ptr"] = _f32(params["no_obj_ptr"]).reshape(1, -1)

    # ---- prompt predictor (the other trained module) ---------------------
    _export_prompt_predictor(out, "prompt_predictor", params["prompt_predictor"])
    return out


def _export_prompt_predictor(out: dict, pd: str, pp: dict) -> None:
    """``PromptPredictor`` params → reference torch naming
    (``models/sam2_blocks.py:146-221``: ``init_conv.layers.{0,1}``,
    ``down_layers.{i}.layers.{1,2}`` after the MaxPool at index 0,
    ``up_layers.{j}`` counting from the U-Net bottom)."""
    _conv3(out, f"{pd}.init_conv.layers.0.conv", pp["in0"]["Conv_0"])
    _conv3(out, f"{pd}.init_conv.layers.1.conv", pp["in1"]["Conv_0"])
    depth = sum(1 for k in pp if k.startswith("down") and k.endswith("_0"))
    for i in range(depth):
        _conv3(out, f"{pd}.down_layers.{i}.layers.1.conv", pp[f"down{i}_0"]["Conv_0"])
        _conv3(out, f"{pd}.down_layers.{i}.layers.2.conv", pp[f"down{i}_1"]["Conv_0"])
    for j, i in enumerate(reversed(range(depth))):
        _conv3(out, f"{pd}.up_layers.{j}.layers.0.conv", pp[f"up{i}_0"]["Conv_0"])
        _conv3(out, f"{pd}.up_layers.{j}.layers.1.conv", pp[f"up{i}_1"]["Conv_0"])
    _conv3(out, f"{pd}.prompt_out", pp["prompt_out"])
    _dense(out, f"{pd}.box_out.fc", pp["box_out"])
