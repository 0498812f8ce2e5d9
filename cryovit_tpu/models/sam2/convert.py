"""Torch SAM2 checkpoint → flax parameter conversion.

Maps the ``sam2.1_hiera_large.pt`` / ``MedSAM2_latest.pt`` state dicts
(the checkpoints the reference downloads from HF hub,
``models/sam2.py:31-39, 845-874``) onto this package's module tree.

Fidelity: the converter covers the full published module set — Hiera
trunk + FPN neck, prompt encoder, mask decoder, memory encoder, memory
attention, and the SAM2-level embeddings (``no_mem_embed``,
``no_mem_pos_enc``, ``maskmem_tpos_enc``, ``obj_ptr_proj``,
``obj_ptr_tpos_proj``, ``no_obj_ptr``). The mapping is validated
end-to-end in ``tests/test_sam2_torch_parity.py``: torch clones of the
sam2 modules (each citing the sam2 file/class it mirrors) are assembled
into a state dict with the published tensor naming, pushed through
:func:`convert_sam2_state_dict`, and the resulting flax forward is
asserted against the torch clone forward. Unknown checkpoint keys are
logged, never silently dropped.
"""

from __future__ import annotations

import logging
from typing import Any

import numpy as np

from cryovit_tpu.models.sam2.config import SAM2Config

logger = logging.getLogger(__name__)

__all__ = [
    "convert_sam2_state_dict",
    "convert_encoder_state_dict",
    "convert_prompt_predictor_state_dict",
    "convert_memory_encoder_state_dict",
    "convert_memory_attention_state_dict",
    "verify_checkpoint",
]


class _TrackingDict(dict):
    """State-dict wrapper recording which keys the conversion consumed."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.consumed: set[str] = set()

    def __getitem__(self, key):
        self.consumed.add(key)
        return super().__getitem__(key)

    def __contains__(self, key):  # membership probes don't count as use
        return super().__contains__(key)


def _np(v) -> np.ndarray:
    return np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)


def _dense(sd: dict, prefix: str) -> dict[str, np.ndarray]:
    out = {"kernel": _np(sd[f"{prefix}.weight"]).T}
    if f"{prefix}.bias" in sd:
        out["bias"] = _np(sd[f"{prefix}.bias"])
    return out


def _conv(sd: dict, prefix: str) -> dict[str, np.ndarray]:
    # torch (out, in, kh, kw) → flax (kh, kw, in, out)
    w = _np(sd[f"{prefix}.weight"])
    out = {"kernel": w.transpose(2, 3, 1, 0)}
    if f"{prefix}.bias" in sd:
        out["bias"] = _np(sd[f"{prefix}.bias"])
    return out


def _ln(sd: dict, prefix: str) -> dict[str, np.ndarray]:
    return {"scale": _np(sd[f"{prefix}.weight"]), "bias": _np(sd[f"{prefix}.bias"])}


def convert_encoder_state_dict(
    sd: dict[str, Any], cfg: SAM2Config
) -> dict[str, Any]:
    """Map ``image_encoder.*`` tensors → :class:`ImageEncoder` params."""
    hiera = cfg.hiera
    trunk: dict[str, Any] = {
        "patch_embed": _conv(sd, "image_encoder.trunk.patch_embed.proj"),
        "pos_embed": _np(sd["image_encoder.trunk.pos_embed"])[0].transpose(1, 2, 0),
        "pos_embed_window": _np(sd["image_encoder.trunk.pos_embed_window"])[0].transpose(1, 2, 0),
    }
    depth = sum(hiera.stages)
    for i in range(depth):
        p = f"image_encoder.trunk.blocks.{i}"
        block = {
            "norm1": _ln(sd, f"{p}.norm1"),
            "norm2": _ln(sd, f"{p}.norm2"),
            "attn": {
                "qkv": _dense(sd, f"{p}.attn.qkv"),
                "proj": _dense(sd, f"{p}.attn.proj"),
            },
            "mlp_fc1": _dense(sd, f"{p}.mlp.layers.0"),
            "mlp_fc2": _dense(sd, f"{p}.mlp.layers.1"),
        }
        if f"{p}.proj.weight" in sd:
            block["proj"] = _dense(sd, f"{p}.proj")
        trunk[f"block{i}"] = block

    params: dict[str, Any] = {"trunk": trunk}
    # sam2 FPNNeck builds convs from backbone_channel_list ordered
    # low-res→high-res ([1152, 576, 288, 144] for hiera-L), while the flax
    # neck_conv{i} index follows the trunk output order (high-res first) —
    # convs.0 (stride 32) pairs with the LAST flax lateral
    n_levels = len(hiera.stages)
    for i in range(n_levels):
        params[f"neck_conv{i}"] = _conv(
            sd, f"image_encoder.neck.convs.{n_levels - 1 - i}.conv"
        )
    return {"params": params}


def convert_memory_encoder_state_dict(sd: dict[str, Any]) -> dict[str, Any]:
    """``memory_encoder.*`` tensors → :class:`MemoryEncoder` params
    (sam2/modeling/memory_encoder.py: MaskDownSampler ``encoder``
    Sequential [conv, LN, GELU]×4 + final 1×1 conv at index 12;
    ``pix_feat_proj``; ``fuser.layers.{i}`` CXBlocks; ``out_proj``)."""
    me = "memory_encoder"
    menc: dict[str, Any] = {
        "pix_proj": _conv(sd, f"{me}.pix_feat_proj"),
        "out_proj": _conv(sd, f"{me}.out_proj"),
        "mask_down_final": _conv(sd, f"{me}.mask_downsampler.encoder.12"),
    }
    for i in range(4):
        menc[f"mask_down{i}"] = _conv(sd, f"{me}.mask_downsampler.encoder.{3 * i}")
        menc[f"mask_ln{i}"] = _ln(sd, f"{me}.mask_downsampler.encoder.{3 * i + 1}")
    for i in range(2):
        fp = f"{me}.fuser.layers.{i}"
        menc[f"fuser_dw{i}"] = _conv(sd, f"{fp}.dwconv")
        menc[f"fuser_ln{i}"] = _ln(sd, f"{fp}.norm")
        menc[f"fuser_fc1_{i}"] = _dense(sd, f"{fp}.pwconv1")
        menc[f"fuser_fc2_{i}"] = _dense(sd, f"{fp}.pwconv2")
        menc[f"fuser_gamma{i}"] = _np(sd[f"{fp}.gamma"])
    return {"params": menc}


def convert_memory_attention_state_dict(
    sd: dict[str, Any], cfg: SAM2Config
) -> dict[str, Any]:
    """``memory_attention.*`` tensors → :class:`MemoryAttention` params
    (sam2/modeling/memory_attention.py: ``layers.{i}`` with
    ``self_attn``/``cross_attn_image`` RoPEAttention q/k/v/out
    projections, ``linear1``/``linear2`` MLP, ``norm1-3``; final
    ``norm``)."""
    ma = "memory_attention"
    mattn: dict[str, Any] = {"norm_out": _ln(sd, f"{ma}.norm")}
    for i in range(cfg.memory_attention_layers):
        lp = f"{ma}.layers.{i}"
        mattn[f"layer{i}"] = {
            "self_q": _dense(sd, f"{lp}.self_attn.q_proj"),
            "self_k": _dense(sd, f"{lp}.self_attn.k_proj"),
            "self_v": _dense(sd, f"{lp}.self_attn.v_proj"),
            "self_out": _dense(sd, f"{lp}.self_attn.out_proj"),
            "cross_q": _dense(sd, f"{lp}.cross_attn_image.q_proj"),
            "cross_k": _dense(sd, f"{lp}.cross_attn_image.k_proj"),
            "cross_v": _dense(sd, f"{lp}.cross_attn_image.v_proj"),
            "cross_out": _dense(sd, f"{lp}.cross_attn_image.out_proj"),
            "norm1": _ln(sd, f"{lp}.norm1"),
            "norm2": _ln(sd, f"{lp}.norm2"),
            "norm3": _ln(sd, f"{lp}.norm3"),
            "mlp_fc1": _dense(sd, f"{lp}.linear1"),
            "mlp_fc2": _dense(sd, f"{lp}.linear2"),
        }
    return {"params": mattn}


def convert_prompt_predictor_state_dict(sd: dict[str, Any]) -> dict[str, Any]:
    """``prompt_predictor.*`` tensors (reference-TRAINED artifacts only —
    the published checkpoints lack this module; reference
    ``models/sam2_blocks.py:146-221``) → :class:`PromptPredictor` params.
    ``up_layers.{j}`` counts from the U-Net bottom (the reference builds
    them in ``reversed(range(depth))``) ↔ flax ``up{depth-1-j}``."""

    def conv3(prefix: str) -> dict[str, np.ndarray]:
        # torch Conv3d (out, in, kd, kh, kw) → flax (kd, kh, kw, in, out)
        w = _np(sd[f"{prefix}.weight"])
        out = {"kernel": w.transpose(2, 3, 4, 1, 0)}
        if f"{prefix}.bias" in sd:
            out["bias"] = _np(sd[f"{prefix}.bias"])
        return out

    pd = "prompt_predictor"
    depth = 0
    while f"{pd}.down_layers.{depth}.layers.1.conv.weight" in sd:
        depth += 1
    params: dict[str, Any] = {
        "in0": {"Conv_0": conv3(f"{pd}.init_conv.layers.0.conv")},
        "in1": {"Conv_0": conv3(f"{pd}.init_conv.layers.1.conv")},
        "prompt_out": conv3(f"{pd}.prompt_out"),
        "box_out": _dense(sd, f"{pd}.box_out.fc"),
    }
    for i in range(depth):
        params[f"down{i}_0"] = {
            "Conv_0": conv3(f"{pd}.down_layers.{i}.layers.1.conv")
        }
        params[f"down{i}_1"] = {
            "Conv_0": conv3(f"{pd}.down_layers.{i}.layers.2.conv")
        }
    for j, i in enumerate(reversed(range(depth))):
        params[f"up{i}_0"] = {
            "Conv_0": conv3(f"{pd}.up_layers.{j}.layers.0.conv")
        }
        params[f"up{i}_1"] = {
            "Conv_0": conv3(f"{pd}.up_layers.{j}.layers.1.conv")
        }
    return {"params": params}


def convert_sam2_state_dict(sd: dict[str, Any], cfg: SAM2Config) -> dict[str, Any]:
    """Full-model conversion (encoder + prompt encoder + decoder + memory).

    Accepts both the PUBLISHED checkpoints (``sam2.1_hiera_large.pt`` /
    ``MedSAM2_latest.pt``) and reference-TRAINED artifacts (the state dict
    a reference ``.model`` carries, ``utils.py:354-381``): trained dicts
    nest the SAM2Base tree under the Lightning wrapper's ``model.`` prefix
    (``models/sam2.py:63``), carry LoRA-wrapped decoder projections
    (``...q_proj.proj.weight`` + ``.w_a``/``.w_b`` factors,
    ``models/sam2_blocks.py:226-286``) and the trained PromptPredictor
    under ``prompt_predictor.*`` — all consumed here.

    Returns the params for :class:`SAM2Model` under the ``sam`` scope used
    by the family wrapper. Unconsumed checkpoint keys are logged so gaps are
    visible rather than silent.
    """
    prompt_pred = None
    if any(k.startswith("model.") for k in sd):
        # reference-trained wrapper dict: split the prompt predictor off,
        # strip the SAM2Base prefix
        if any(k.startswith("prompt_predictor.") for k in sd):
            prompt_pred = convert_prompt_predictor_state_dict(
                {
                    k: v
                    for k, v in sd.items()
                    if k.startswith("prompt_predictor.")
                }
            )
        sd = {
            k.removeprefix("model."): v
            for k, v in sd.items()
            if k.startswith("model.")
        }
    if not isinstance(sd, _TrackingDict):
        sd = _TrackingDict(sd)
    params: dict[str, Any] = {}
    params["image_encoder"] = convert_encoder_state_dict(sd, cfg)["params"]

    # prompt encoder
    pe = "sam_prompt_encoder"
    params["prompt_encoder"] = {
        # sam2 PositionEmbeddingRandom stores (2, num_pos_feats) and
        # multiplies coords @ matrix — identical layout to this module
        "pe_gaussian": _np(
            sd[f"{pe}.pe_layer.positional_encoding_gaussian_matrix"]
        ),
        "point_embeddings": np.stack(
            [_np(sd[f"{pe}.point_embeddings.{i}.weight"])[0] for i in range(4)]
        ),
        "not_a_point_embed": _np(sd[f"{pe}.not_a_point_embed.weight"])[0],
        "no_mask_embed": _np(sd[f"{pe}.no_mask_embed.weight"])[0],
        "mask_down0": _conv(sd, f"{pe}.mask_downscaling.0"),
        "mask_ln0": _ln(sd, f"{pe}.mask_downscaling.1"),
        "mask_down1": _conv(sd, f"{pe}.mask_downscaling.3"),
        "mask_ln1": _ln(sd, f"{pe}.mask_downscaling.4"),
        "mask_down2": _conv(sd, f"{pe}.mask_downscaling.6"),
    }

    # mask decoder
    md = "sam_mask_decoder"
    dec: dict[str, Any] = {
        "iou_token": _np(sd[f"{md}.iou_token.weight"]),
        "mask_tokens": _np(sd[f"{md}.mask_tokens.weight"]),
        "obj_score_token": _np(sd[f"{md}.obj_score_token.weight"]),
        "upscale1": {
            "kernel": _np(sd[f"{md}.output_upscaling.0.weight"]).transpose(2, 3, 0, 1),
            "bias": _np(sd[f"{md}.output_upscaling.0.bias"]),
        },
        "upscale_ln": _ln(sd, f"{md}.output_upscaling.1"),
        "upscale2": {
            "kernel": _np(sd[f"{md}.output_upscaling.3.weight"]).transpose(2, 3, 0, 1),
            "bias": _np(sd[f"{md}.output_upscaling.3.bias"]),
        },
        "conv_s0": _conv(sd, f"{md}.conv_s0"),
        "conv_s1": _conv(sd, f"{md}.conv_s1"),
    }
    for i in range(cfg.num_multimask_outputs + 1):
        hyper = {}
        for j in range(3):
            hyper[f"layer{j}"] = _dense(sd, f"{md}.output_hypernetworks_mlps.{i}.layers.{j}")
        dec[f"hyper{i}"] = hyper
    iou_head = {}
    for j in range(cfg.iou_head_depth):
        iou_head[f"layer{j}"] = _dense(sd, f"{md}.iou_prediction_head.layers.{j}")
    dec["iou_head"] = iou_head
    obj_head = {}
    for j in range(3):
        obj_head[f"layer{j}"] = _dense(sd, f"{md}.pred_obj_score_head.layers.{j}")
    dec["obj_score_head"] = obj_head

    def lora_proj(prefix: str) -> dict[str, Any]:
        # published: plain Linear; trained: LoRALinear wrapper with the
        # base under .proj and the low-rank factors as .w_a/.w_b
        if f"{prefix}.proj.weight" in sd:
            out = {"proj": _dense(sd, f"{prefix}.proj")}
            if f"{prefix}.w_a.weight" in sd:
                out["w_a"] = _dense(sd, f"{prefix}.w_a")
                out["w_b"] = _dense(sd, f"{prefix}.w_b")
            return out
        return {"proj": _dense(sd, prefix)}

    def attn(prefix: str) -> dict[str, Any]:
        return {
            "q_proj": lora_proj(f"{prefix}.q_proj"),
            "k_proj": _dense(sd, f"{prefix}.k_proj"),
            "v_proj": lora_proj(f"{prefix}.v_proj"),
            "out_proj": _dense(sd, f"{prefix}.out_proj"),
        }

    for i in range(cfg.decoder_depth):
        lp = f"{md}.transformer.layers.{i}"
        dec[f"layer{i}"] = {
            "self_attn": attn(f"{lp}.self_attn"),
            "cross_attn_token_to_image": attn(f"{lp}.cross_attn_token_to_image"),
            "cross_attn_image_to_token": attn(f"{lp}.cross_attn_image_to_token"),
            "norm1": _ln(sd, f"{lp}.norm1"),
            "norm2": _ln(sd, f"{lp}.norm2"),
            "norm3": _ln(sd, f"{lp}.norm3"),
            "norm4": _ln(sd, f"{lp}.norm4"),
            "mlp": {
                "lin1": _dense(sd, f"{lp}.mlp.layers.0"),
                "lin2": _dense(sd, f"{lp}.mlp.layers.1"),
            },
        }
    dec["final_attn_token_to_image"] = attn(f"{md}.transformer.final_attn_token_to_image")
    dec["norm_final"] = _ln(sd, f"{md}.transformer.norm_final_attn")
    params["mask_decoder"] = dec

    params["memory_encoder"] = convert_memory_encoder_state_dict(sd)["params"]
    params["memory_attention"] = convert_memory_attention_state_dict(sd, cfg)[
        "params"
    ]

    # SAM2-level embeddings
    params["no_mem_embed"] = _np(sd["no_mem_embed"])
    params["no_mem_pos_enc"] = _np(sd["no_mem_pos_enc"])
    params["maskmem_tpos_enc"] = _np(sd["maskmem_tpos_enc"]).reshape(
        cfg.num_maskmem, -1
    )
    params["obj_ptr_proj"] = _dense(sd, "obj_ptr_proj")
    if cfg.add_tpos_enc_to_obj_ptrs and "obj_ptr_tpos_proj.weight" in sd:
        params["obj_ptr_tpos_proj"] = _dense(sd, "obj_ptr_tpos_proj")
    params["no_obj_ptr"] = _np(sd["no_obj_ptr"]).reshape(-1)

    if prompt_pred is not None:
        params["prompt_predictor"] = prompt_pred["params"]

    unconsumed = sorted(set(sd) - sd.consumed)
    if unconsumed:
        logger.warning(
            "SAM2 conversion left %d checkpoint tensors unconsumed: %s",
            len(unconsumed),
            ", ".join(unconsumed[:12]) + ("..." if len(unconsumed) > 12 else ""),
        )
    return {"params": {"sam": params}}


def verify_checkpoint(
    sd: dict[str, Any], cfg: SAM2Config, encoder_only: bool = False
) -> dict[str, Any]:
    """Strict checkpoint verification (one command instead of archaeology
    the day a real ``sam2.1_hiera_large.pt`` is reachable; mirrors the
    reference's strict load, ``models/sam2.py:832-838``).

    Runs the conversion and audits three independent failure classes:

    - ``missing``: checkpoint tensors the mapping requires but the file
      lacks (first offender — the conversion aborts there),
    - ``unconsumed``: checkpoint tensors the mapping never touched
      (naming drift / new modules in a future release),
    - ``not_in_model`` / ``shape_mismatches``: converted entries compared
      per-path against the flax module's ``jax.eval_shape`` manifest.

    Returns a report dict with ``ok=True`` only when every class is empty.
    """
    import jax
    import jax.numpy as jnp

    report: dict[str, Any] = {
        "ok": False,
        "error": None,
        "missing": [],
        "unconsumed": [],
        "not_in_model": [],
        "shape_mismatches": [],
        "n_tensors": len(sd),
        "n_consumed": 0,
        "n_params": 0,
    }
    tracked = _TrackingDict(sd)
    try:
        if encoder_only:
            converted = convert_encoder_state_dict(tracked, cfg)
        else:
            converted = convert_sam2_state_dict(tracked, cfg)
    except KeyError as exc:
        report["missing"].append(str(exc.args[0]) if exc.args else str(exc))
        report["n_consumed"] = len(tracked.consumed)
        return report
    except Exception as exc:  # shape/transpose errors → report, not crash
        report["error"] = f"{type(exc).__name__}: {exc}"
        report["n_consumed"] = len(tracked.consumed)
        return report
    report["n_consumed"] = len(tracked.consumed)
    report["unconsumed"] = sorted(set(sd) - tracked.consumed)

    if encoder_only:
        from cryovit_tpu.models.sam2.encoder import ImageEncoder

        module = ImageEncoder(cfg)
        probe = jnp.zeros((1, cfg.image_size, cfg.image_size, 3), jnp.float32)
        expected = jax.eval_shape(module.init, jax.random.key(0), probe)
        got_params = converted["params"]
    else:
        from cryovit_tpu.models.sam2.model import SAM2Model

        module = SAM2Model(cfg=cfg)
        probe = jnp.zeros((1, 2, cfg.image_size, cfg.image_size), jnp.float32)
        expected = jax.eval_shape(module.init, jax.random.key(0), probe)
        got_params = converted["params"]["sam"]

    want = {
        jax.tree_util.keystr(path): leaf.shape
        for path, leaf in jax.tree_util.tree_leaves_with_path(
            expected["params"]
        )
    }
    got = {
        jax.tree_util.keystr(path): np.asarray(leaf).shape
        for path, leaf in jax.tree_util.tree_leaves_with_path(got_params)
    }
    report["n_params"] = len(got)
    for path, shape in sorted(got.items()):
        if path not in want:
            report["not_in_model"].append(path)
        elif tuple(shape) != tuple(want[path]):
            report["shape_mismatches"].append(
                (path, tuple(shape), tuple(want[path]))
            )
    report["ok"] = not (
        report["missing"]
        or report["unconsumed"]
        or report["not_in_model"]
        or report["shape_mismatches"]
    )
    return report
