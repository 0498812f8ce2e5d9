"""Tests for the TPU-native SAM2 family (tiny config, CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cryovit_tpu.composer import instantiate
from cryovit_tpu.config import compose
from cryovit_tpu.models.sam2.config import SAM2Config
from cryovit_tpu.models.sam2.decoder import LoRALinear, MaskDecoder
from cryovit_tpu.models.sam2.encoder import ImageEncoder
from cryovit_tpu.models.sam2.memory import MemoryEncoder, axial_rope
from cryovit_tpu.models.sam2.model import MemoryBank, SAM2Model
from cryovit_tpu.models.sam2.prompt_predictor import PromptPredictor
from cryovit_tpu.models.sam2.prompts import PromptEncoder


@pytest.fixture(scope="module")
def tiny_cfg():
    return SAM2Config.tiny_test()


@pytest.fixture(scope="module")
def tiny_sam(tiny_cfg):
    model = SAM2Model(cfg=tiny_cfg, lora_rank=4, lora_alpha=4.0)
    slices = jnp.zeros((1, 3, tiny_cfg.image_size, tiny_cfg.image_size))
    variables = model.init(jax.random.key(0), slices)
    return model, variables


def test_encoder_pyramid_shapes(tiny_cfg, rng):
    enc = ImageEncoder(tiny_cfg)
    x = jnp.asarray(rng.random((1, 64, 64, 3)), dtype=jnp.float32)
    vars_ = enc.init(jax.random.key(0), x)
    out = enc.apply(vars_, x)
    shapes = [f.shape for f in out["backbone_fpn"]]
    assert shapes == [(1, 16, 16, 32), (1, 8, 8, 32), (1, 4, 4, 32)]
    assert [p.shape for p in out["vision_pos_enc"]] == shapes


def test_prompt_encoder_outputs(tiny_cfg, rng):
    pe = PromptEncoder(tiny_cfg)
    boxes = jnp.asarray([[4.0, 4.0, 32.0, 32.0]])
    masks = jnp.asarray(rng.random((1, tiny_cfg.mask_input_size, tiny_cfg.mask_input_size, 1)), dtype=jnp.float32)
    vars_ = pe.init(jax.random.key(0), boxes, masks)
    sparse, dense = pe.apply(vars_, boxes, masks)
    e = tiny_cfg.embed_size
    assert sparse.shape == (1, 3, tiny_cfg.d_model)  # pad point + 2 corners
    assert dense.shape == (1, e, e, tiny_cfg.d_model)
    # no-mask path uses the learned embedding
    _, dense_none = pe.apply(vars_, boxes, None)
    assert dense_none.shape == dense.shape
    assert not np.allclose(np.asarray(dense), np.asarray(dense_none))


def test_mask_decoder_shapes(tiny_cfg, rng):
    dec = MaskDecoder(tiny_cfg, lora_rank=4, lora_alpha=4.0)
    e, d = tiny_cfg.embed_size, tiny_cfg.d_model
    img = jnp.asarray(rng.random((2, e, e, d)), dtype=jnp.float32)
    pe = jnp.asarray(rng.random((e, e, d)), dtype=jnp.float32)
    sparse = jnp.asarray(rng.random((2, 3, d)), dtype=jnp.float32)
    dense = jnp.asarray(rng.random((2, e, e, d)), dtype=jnp.float32)
    hi = (
        jnp.asarray(rng.random((2, 4 * e, 4 * e, d)), dtype=jnp.float32),
        jnp.asarray(rng.random((2, 2 * e, 2 * e, d)), dtype=jnp.float32),
    )
    vars_ = dec.init(jax.random.key(0), img, pe, sparse, dense, hi)
    masks, ious, tokens, obj = dec.apply(vars_, img, pe, sparse, dense, hi)
    m = tiny_cfg.num_multimask_outputs + 1
    assert masks.shape == (2, m, 4 * e, 4 * e)
    assert ious.shape == (2, m)
    assert tokens.shape == (2, m, d)
    assert obj.shape == (2, 1)


def test_lora_linear_starts_as_identity(rng):
    """w_b zero-init → LoRA output equals the base projection at init."""
    x = jnp.asarray(rng.random((2, 8)), dtype=jnp.float32)
    lora = LoRALinear(features=8, rank=4, alpha=8.0)
    vars_ = lora.init(jax.random.key(0), x)
    base_only = x @ vars_["params"]["proj"]["kernel"] + vars_["params"]["proj"]["bias"]
    np.testing.assert_allclose(np.asarray(lora.apply(vars_, x)), np.asarray(base_only), atol=1e-6)
    assert (np.asarray(vars_["params"]["w_b"]["kernel"]) == 0).all()


def test_axial_rope_preserves_norm(rng):
    x = jnp.asarray(rng.standard_normal((1, 12, 2, 8)), dtype=jnp.float32)
    out = axial_rope(x, (3, 4))
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(out), axis=-1),
        np.linalg.norm(np.asarray(x), axis=-1),
        rtol=1e-5,
    )


def test_prompt_predictor_outputs(tiny_cfg, rng):
    pp = PromptPredictor(in_channels=tiny_cfg.d_model)
    feats = jnp.asarray(rng.random((1, 4, 16, 16, tiny_cfg.d_model)), dtype=jnp.float32)
    vars_ = pp.init(jax.random.key(0), feats)
    boxes, prompts = pp.apply(vars_, feats)
    assert boxes.shape == (4, 4)
    assert prompts.shape == (4, 64, 64, 1)
    b = np.asarray(boxes)
    assert (b >= 0).all() and (b <= 1).all()
    assert (b[:, 2:] >= b[:, :2] - 1e-6).all()  # x2y2 >= x1y1


def test_memory_bank_ring_buffer(tiny_cfg, tiny_sam):
    model, variables = tiny_sam
    bank = MemoryBank.empty(1, tiny_cfg)
    assert not bool(bank.spatial_valid.any())
    e2 = tiny_cfg.embed_size**2
    pix = jnp.ones((1, tiny_cfg.embed_size, tiny_cfg.embed_size, tiny_cfg.d_model))
    mask = jnp.zeros((1, tiny_cfg.image_size, tiny_cfg.image_size, 1))
    ptr = jnp.ones((1, tiny_cfg.d_model))

    write = lambda bank, cond, idx: model.apply(
        variables, bank, pix, mask, ptr, cond, jnp.asarray(idx),
        method=model._write_memory,
    )
    bank = write(bank, True, 0)
    assert bool(bank.spatial_valid[0, 0])
    for i in range(1, 4):
        bank = write(bank, False, i)
    # ring of size num_maskmem-1=2 → slots 1..2 valid, cond slot intact
    assert bank.spatial_valid[0].tolist() == [True, True, True]
    assert int(bank.write_idx) == 4


def test_sam2_full_forward_and_grads(tiny_cfg, tiny_sam, rng):
    model, variables = tiny_sam
    slices = jnp.asarray(
        rng.random((1, 3, tiny_cfg.image_size, tiny_cfg.image_size)), dtype=jnp.float32
    )
    out = jax.jit(model.apply)(variables, slices)
    assert out["preds"].shape == (1, 3, 64, 64)
    assert out["prompts"].shape == (1, 3, 64, 64)
    assert np.isfinite(np.asarray(out["preds"])).all()


def test_sam2_family_train_step(rng):
    """Full family wrapper: config instantiate → jit train step → finite loss,
    prompt-predictor grads flow, frozen encoder stays untouched."""
    import optax

    from cryovit_tpu.models import SAM2
    from cryovit_tpu.models.base import prediction_mask

    cfg = compose("train_model", ["model=sam2", "datamodule=single", "label_key=mito"])
    node = dict(cfg.model)
    node["custom_kwargs"] = dict(node.get("custom_kwargs") or {})
    node["custom_kwargs"]["test_config"] = True
    model = instantiate(node)
    assert isinstance(model, SAM2)
    assert model.prompt_lr == 1e-4
    assert model.use_cache_features  # config default

    data = jnp.asarray(rng.random((1, 3, 64, 64, 1)), dtype=jnp.float32)
    label = jnp.asarray(rng.integers(-1, 2, size=(1, 3, 64, 64)), dtype=jnp.float32)
    variables = model.init(jax.random.key(0), data)

    opt = model.make_optimizer(gradient_clip_val=1.0)
    opt_state = opt.init(variables)

    @jax.jit
    def step(v, s):
        def loss_fn(v):
            preds, aux = model.apply_with_aux(v, data)
            losses = model.compute_losses(preds, label, prediction_mask(label), aux=aux)
            return losses["total"], losses

        (total, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(v)
        updates, s = opt.update(grads, s, v)
        return optax.apply_updates(v, updates), s, total, losses, grads

    new_vars, _, total, losses, grads = step(variables, opt_state)
    assert np.isfinite(float(total))
    assert "mask_loss" in losses

    flat_old = jax.tree_util.tree_flatten_with_path(variables)[0]
    flat_new = dict(jax.tree_util.tree_flatten_with_path(new_vars)[0])
    changed_prompt = changed_frozen = 0
    for path, old in flat_old:
        joined = "/".join(str(getattr(p, "key", p)) for p in path)
        diff = float(jnp.abs(flat_new[tuple(path)] - old).max())
        if "prompt_predictor" in joined and diff > 0:
            changed_prompt += 1
        if "image_encoder" in joined and diff > 0:
            changed_frozen += 1
    assert changed_prompt > 0, "prompt predictor must receive updates"
    assert changed_frozen == 0, "image encoder must stay frozen"


def test_sam_features_extraction(tmp_path, rng, tiny_cfg):
    """sam_features runner: pyramids in the reference file layout."""
    import h5py

    from cryovit_tpu.io import write_mrc
    from cryovit_tpu.run.sam_features import (
        SamFeatureExtractor,
        make_sam_encoder_variables,
        run_sam,
    )

    variables = make_sam_encoder_variables("", cfg=tiny_cfg, random_init=True)
    ext = SamFeatureExtractor(variables, cfg=tiny_cfg, batch_size=2)
    stack = rng.random((3, 48, 48)).astype(np.float32)
    feats = ext.extract(stack)
    assert set(feats) == {"backbone_fpn", "vision_pos_enc"}
    assert feats["backbone_fpn"][0].shape == (3, tiny_cfg.d_model, 16, 16)
    assert feats["backbone_fpn"][0].dtype == np.float16

    # full runner through a file
    p = tmp_path / "v.mrc"
    write_mrc(p, (rng.random((3, 48, 48)) * 200).astype(np.float32))
    out = run_sam([p], tmp_path / "out", batch_size=2, random_init=True, sam_cfg=tiny_cfg)
    with h5py.File(out[0]) as f:
        assert "sam_features/backbone_fpn/0" in f
        assert "sam_features/vision_pos_enc/2" in f
        assert "data" in f


def test_sam2_cached_features_path(tmp_path, rng, tiny_cfg):
    """use_cache_features: precomputed pyramids skip the encoder and give
    the same predictions as the on-the-fly path."""
    from cryovit_tpu.models import SAM2
    from cryovit_tpu.models.losses import DiceLoss
    from cryovit_tpu.models.metrics import DiceMetric
    from cryovit_tpu.run.sam_features import SamFeatureExtractor, make_sam_encoder_variables
    from cryovit_tpu.types import TomogramData

    model = SAM2(
        name="SAM2", input_key="data", lr=5e-5,
        losses={"dice_loss": DiceLoss()}, metrics={"dice_metric": DiceMetric(0.5)},
        custom_kwargs={"test_config": True, "use_cache_features": True},
    )
    s = tiny_cfg.image_size
    data = rng.random((1, 3, s, s, 1)).astype(np.float32)
    variables = model.init(jax.random.key(0), jnp.asarray(data))

    # extract pyramids with the model's own encoder weights
    enc_vars = {"params": variables["params"]["sam"]["image_encoder"]}
    ext = SamFeatureExtractor(enc_vars, cfg=tiny_cfg, batch_size=4)
    feats = ext.extract(data[0, ..., 0])

    item = TomogramData(
        sample="AD", tomo_name="t.hdf", split_id=None,
        data=data[0], label=np.zeros((3, s, s), np.int8),
        aux_data={"sam_features": feats},
    )
    inputs = model.prepare_inputs(data, [item])
    assert isinstance(inputs, dict) and "backbone" in inputs
    preds_cached = model.apply(variables, inputs)
    preds_fresh = model.apply(variables, jnp.asarray(data))
    assert preds_cached.shape == preds_fresh.shape == (1, 3, s, s)
    # fp16 cache quantization → close but not identical
    np.testing.assert_allclose(
        np.asarray(preds_cached), np.asarray(preds_fresh), atol=0.1
    )
