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
    # x1y1 ∈ [0,1]; x2y2 = x1y1 + wh may exceed 1 (the reference does not
    # clip, models/sam2_blocks.py:138-141) but stays ≤ 2
    assert (b >= 0).all() and (b[:, :2] <= 1).all() and (b <= 2).all()
    assert (b[:, 2:] >= b[:, :2] - 1e-6).all()  # x2y2 >= x1y1


def test_memory_bank_ring_buffer(tiny_cfg, tiny_sam):
    model, variables = tiny_sam
    bank = MemoryBank.empty(1, tiny_cfg)
    assert not bool(bank.spatial_valid.any())
    pix = jnp.ones((1, tiny_cfg.embed_size, tiny_cfg.embed_size, tiny_cfg.d_model))
    mask = jnp.zeros((1, tiny_cfg.image_size, tiny_cfg.image_size, 1))
    ptr = jnp.ones((1, tiny_cfg.d_model))

    write = lambda bank, cond: model.apply(
        variables, bank, pix, mask, ptr, cond, method=model._write_memory
    )
    bank = write(bank, True)
    assert bool(bank.spatial_valid[0, 0])
    assert int(bank.cond_count) == 1
    for _ in range(3):
        bank = write(bank, False)
    # ring of size num_maskmem-1=2 → slots 1..2 valid, cond slot intact
    assert bank.spatial_valid[0].tolist() == [True, True, True]
    assert int(bank.write_idx) == 4


def test_memory_bank_multi_cond_slots():
    """max_cond_slices > 1: cond writes fill consecutive cond slots and
    never touch the rolling ring (reference keeps cond_frame_outputs
    separate, models/sam2.py:481-508)."""
    import dataclasses

    cfg = dataclasses.replace(SAM2Config.tiny_test(), max_cond_slices=2)
    model = SAM2Model(cfg=cfg, lora_rank=4, lora_alpha=4.0)
    slices = jnp.zeros((1, 3, cfg.image_size, cfg.image_size))
    variables = model.init(jax.random.key(0), slices)

    bank = MemoryBank.empty(1, cfg)
    assert bank.spatial.shape[1] == 2 + cfg.num_maskmem - 1
    pix = jnp.ones((1, cfg.embed_size, cfg.embed_size, cfg.d_model))
    mask = jnp.zeros((1, cfg.image_size, cfg.image_size, 1))
    ptr = jnp.ones((1, cfg.d_model))
    write = lambda bank, cond: model.apply(
        variables, bank, pix, mask, ptr, cond, method=model._write_memory
    )
    bank = write(bank, True)
    bank = write(bank, True)
    assert bank.spatial_valid[0].tolist() == [True, True, False, False]
    assert int(bank.cond_count) == 2
    bank = write(bank, False)
    assert bank.spatial_valid[0].tolist() == [True, True, True, False]
    assert int(bank.write_idx) == 2


def test_tracking_order_permutation_identity(tiny_cfg, tiny_sam, rng):
    """order=arange + num_cond=1 must reproduce the default call exactly,
    and a permuted order must return preds in original slice order."""
    model, variables = tiny_sam
    s = tiny_cfg.image_size
    slices = jnp.asarray(rng.random((1, 4, s, s)), dtype=jnp.float32)
    base = model.apply(variables, slices)
    same = model.apply(
        variables, slices, order=jnp.arange(4), num_cond=jnp.asarray(1)
    )
    np.testing.assert_allclose(
        np.asarray(base["preds"]), np.asarray(same["preds"]), atol=1e-6
    )
    # cond slice 0 processed first either way; tracking order of the rest
    # differs → preds differ but stay aligned to the original slice axis
    perm = model.apply(
        variables, slices, order=jnp.asarray([0, 2, 1, 3]), num_cond=jnp.asarray(1)
    )
    assert perm["preds"].shape == base["preds"].shape
    assert np.isfinite(np.asarray(perm["preds"])).all()


def test_tracking_bf16_close_to_f32(tiny_cfg, tiny_sam, rng):
    """bf16 compute threading through the tracking path (memory attention,
    mask decoder, prompt/memory encoders — the r4 dtype work that cut the
    cached tracking pass; params stay f32) must keep sigmoid predictions
    close to the f32 oracle and leave the parameter tree unchanged."""
    model, variables = tiny_sam
    s = tiny_cfg.image_size
    slices = jnp.asarray(rng.random((1, 4, s, s)), dtype=jnp.float32)
    ref = model.apply(variables, slices)
    half = SAM2Model(
        cfg=tiny_cfg, lora_rank=4, lora_alpha=4.0, dtype=jnp.bfloat16
    )
    # identical param tree: dtype= threads compute only
    paths = lambda v: [
        jax.tree_util.keystr(p)
        for p, _ in jax.tree_util.tree_leaves_with_path(v)
    ]
    assert paths(half.init(jax.random.key(0), slices)) == paths(variables)
    out = half.apply(variables, slices)
    a = np.asarray(ref["preds"], dtype=np.float64)
    b = np.asarray(out["preds"], dtype=np.float64)
    assert np.isfinite(b).all()
    # probabilities: bf16 activations move them only slightly
    assert np.abs(a - b).mean() < 0.02, np.abs(a - b).mean()
    assert np.abs(a - b).max() < 0.25, np.abs(a - b).max()


def test_tracking_chunked_encoder_matches_unchunked(tiny_cfg, tiny_sam, rng):
    """The live-encoder chunking (``encoder_chunk``: nn.scan over slice
    chunks, needed so depth-255 eval volumes fit 16 GB — Hiera-L at batch
    255 is a 22 GB program) must be numerically identical to the one-batch
    encode, including the pad-to-chunk remainder path."""
    model, variables = tiny_sam
    s = tiny_cfg.image_size
    slices = jnp.asarray(rng.random((1, 5, s, s)), dtype=jnp.float32)
    base = model.apply(variables, slices)  # default chunk 64 > 5: unchunked
    chunked = SAM2Model(
        cfg=tiny_cfg, lora_rank=4, lora_alpha=4.0, encoder_chunk=2
    )
    out = chunked.apply(variables, slices)  # 5 slices → 3 chunks, 1 pad
    np.testing.assert_allclose(
        np.asarray(base["preds"]), np.asarray(out["preds"]), atol=1e-5
    )


def test_tracking_multi_cond_forward(rng):
    """num_cond=2: both cond slices skip memory attention, later slices
    track; same compiled program serves different draws."""
    import dataclasses

    cfg = dataclasses.replace(SAM2Config.tiny_test(), max_cond_slices=3)
    model = SAM2Model(cfg=cfg, lora_rank=4, lora_alpha=4.0)
    s = cfg.image_size
    slices = jnp.asarray(rng.random((1, 5, s, s)), dtype=jnp.float32)
    variables = model.init(jax.random.key(0), slices)

    fn = jax.jit(lambda v, x, o, n: model.apply(v, x, order=o, num_cond=n))
    out1 = fn(variables, slices, jnp.asarray([0, 3, 1, 2, 4]), jnp.asarray(2))
    out2 = fn(variables, slices, jnp.asarray([0, 2, 4, 1, 3]), jnp.asarray(3))
    assert out1["preds"].shape == (1, 5, s, s)
    assert np.isfinite(np.asarray(out1["preds"])).all()
    assert np.isfinite(np.asarray(out2["preds"])).all()
    # one compiled program serves all draws (order/num_cond are traced)
    assert fn._cache_size() == 1
    # semantic equivalence of the scan vs the reference-style python loop
    # (incl. multi-cond) is covered by test_tracking_scan_matches_python_oracle


def test_tracking_scan_matches_python_oracle(rng):
    """The compiled ring-buffer scan must reproduce a plain-python
    list-based tracking loop (the reference's semantics: a dict of
    cond/non-cond frame outputs re-assembled every step,
    models/sam2.py:457-532) — including cond-first processing, ring
    eviction of old memories, and object-pointer truncation."""
    import dataclasses

    cfg = dataclasses.replace(SAM2Config.tiny_test(), max_cond_slices=2)
    model = SAM2Model(cfg=cfg, lora_rank=4, lora_alpha=4.0)
    s = cfg.image_size
    d = 6  # > num_maskmem-1 rolling slots → exercises eviction
    slices = jnp.asarray(rng.random((1, d, s, s)), dtype=jnp.float32)
    variables = model.init(jax.random.key(0), slices)
    order = [0, 3, 1, 2, 4, 5]
    num_cond = 2

    scan_out = model.apply(
        variables, slices, order=jnp.asarray(order), num_cond=jnp.asarray(num_cond)
    )

    def oracle(mdl, slices):
        cfg = mdl.cfg
        b, d_, s_, _ = slices.shape
        backbone = mdl.encode_images(slices.reshape(b * d_, s_, s_))
        fpn, pos = backbone["backbone_fpn"], backbone["vision_pos_enc"]
        unflat = lambda x: x.reshape(b, d_, *x.shape[1:])
        s0, s1, s2 = (unflat(f) for f in fpn[:3])
        pos2 = unflat(pos[2])
        boxes, prompts = mdl.prompt_predictor(s0)
        boxes = boxes.reshape(b, d_, 4)
        prompts = prompts.reshape(b, d_, s_, s_)

        from cryovit_tpu.models.sam2.encoder import sine_position_encoding
        from cryovit_tpu.models.sam2.memory import sine_pe_1d

        mc = cfg.max_cond_slices
        e = cfg.embed_size
        grid_pe = jnp.asarray(
            sine_position_encoding(e, e, cfg.mem_dim), dtype=jnp.float32
        ).reshape(1, e * e, cfg.mem_dim)
        ratio = cfg.d_model // cfg.mem_dim
        cond_mems, roll_mems, cond_ptrs, roll_ptrs = [], [], [], []
        outs = {}
        for step, i in enumerate(order):
            is_cond = step < num_cond
            feat2, p2 = s2[:, i], pos2[:, i]
            if is_cond or not (cond_mems or roll_mems):
                pix = feat2 + mdl.no_mem_embed.reshape(1, 1, 1, -1)
            else:
                toks, poss = [], []
                for m in cond_mems:
                    toks.append(m)
                    poss.append(
                        grid_pe
                        + mdl.maskmem_tpos_enc[cfg.num_maskmem - 1][None, None, :]
                    )
                recent = roll_mems[-(cfg.num_maskmem - 1):]
                for j, m in enumerate(reversed(recent)):
                    toks.append(m)
                    poss.append(grid_pe + mdl.maskmem_tpos_enc[j][None, None, :])
                n_rope_k = len(toks) * e * e
                # object pointers: cond dist 0, rolling most-recent dist 1
                ptrs = cond_ptrs + roll_ptrs[-(cfg.max_obj_ptrs - mc):]
                dists = [0.0] * len(cond_ptrs) + [
                    float(len(roll_ptrs[-(cfg.max_obj_ptrs - mc):]) - j)
                    for j in range(len(roll_ptrs[-(cfg.max_obj_ptrs - mc):]))
                ]
                ptr_tok = jnp.stack(ptrs, axis=1).reshape(b, -1, cfg.mem_dim)
                pe = mdl.obj_ptr_tpos_proj(
                    sine_pe_1d(
                        jnp.asarray(dists) / max(cfg.max_obj_ptrs - 1, 1),
                        cfg.d_model,
                    )
                )
                ptr_pos = jnp.repeat(pe, ratio, axis=0)[None]
                ptr_pos = jnp.broadcast_to(ptr_pos, ptr_tok.shape)
                tokens = jnp.concatenate(toks + [ptr_tok], axis=1)
                pos_toks = jnp.concatenate(
                    [jnp.broadcast_to(p, t.shape) for p, t in zip(poss, toks)]
                    + [ptr_pos],
                    axis=1,
                )
                mask = jnp.ones(tokens.shape[:2], dtype=bool)
                pix = mdl.memory_attention(
                    feat2, p2, tokens, pos_toks, mask, n_rope_k
                )
            sp_i, de_i = mdl._encode_prompts(
                boxes[:, i][:, None], prompts[:, i][:, None]
            )
            low, high, optr = mdl._sam_heads(
                pix, sp_i[:, 0], de_i[:, 0],
                (s0[:, i], s1[:, i]), is_cond,
            )
            mask_for_mem = (
                jax.nn.sigmoid(high) * cfg.sigmoid_scale_for_mem_enc
                + cfg.sigmoid_bias_for_mem_enc
            )
            mem = mdl.memory_encoder(
                feat2, mask_for_mem, skip_sigmoid=True
            ).reshape(b, -1, cfg.mem_dim)
            (cond_mems if is_cond else roll_mems).append(mem)
            (cond_ptrs if is_cond else roll_ptrs).append(optr)
            outs[i] = low
        low = jnp.stack([outs[i] for i in range(d_)], axis=1)
        up = jax.image.resize(low, (b, d_, s_, s_), method="linear")
        return jax.nn.sigmoid(up)

    oracle_preds = model.apply(variables, slices, method=oracle)
    np.testing.assert_allclose(
        np.asarray(scan_out["preds"]), np.asarray(oracle_preds), atol=1e-4
    )


def test_family_cond_slice_sampling(rng):
    """SAM2.prepare_inputs draws a random cond set in train mode and the
    fixed eval count otherwise (reference prepare_prompt_inputs)."""
    from cryovit_tpu.models import SAM2
    from cryovit_tpu.models.losses import DiceLoss
    from cryovit_tpu.models.metrics import DiceMetric
    from cryovit_tpu.types import TomogramData

    model = SAM2(
        name="SAM2", input_key="data", lr=5e-5,
        losses={"dice_loss": DiceLoss()}, metrics={"dice_metric": DiceMetric(0.5)},
        custom_kwargs={
            "test_config": True,
            "num_init_cond_slices": (3, 1),
            "rand_init_cond_slices": (True, False),
        },
    )
    assert model.sam_cfg.max_cond_slices == 3
    s = model.sam_cfg.image_size
    data = rng.random((1, 5, s, s, 1)).astype(np.float32)
    item = TomogramData(
        sample="AD", tomo_name="t.hdf", split_id=None,
        data=data[0], label=np.zeros((5, s, s), np.int8), aux_data={},
    )
    np.random.seed(0)
    model.train_mode = True
    seen = set()
    for _ in range(8):
        inputs = model.prepare_inputs(data, [item])
        assert isinstance(inputs, dict) and "order" in inputs
        order = np.asarray(inputs["order"])
        k = int(inputs["num_cond"])
        seen.add(k)
        assert order[0] == 0 and 1 <= k <= 3
        assert sorted(order.tolist()) == list(range(5))
    assert len(seen) > 1, "cond count should vary across draws"

    model.train_mode = False
    inputs = model.prepare_inputs(data, [item])
    assert not isinstance(inputs, dict)  # eval count 1 → default path

    # end-to-end: a train step with a multi-cond draw runs and is finite
    model.train_mode = True
    variables = model.init(jax.random.key(0), jnp.asarray(data))
    inputs = model.prepare_inputs(data, [item])
    preds, aux = model.apply_with_aux(variables, inputs)
    assert preds.shape == (1, 5, s, s)
    assert np.isfinite(np.asarray(preds)).all()


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


def test_hiera_window_persistent_matches_per_block(rng):
    """The window-persistent layout (one partition round trip per run of
    windowed blocks) is a pure layout transform: outputs must be
    bit-identical to per-block partitioning whenever windows tile the
    grid. A 128² input on the large config exercises both regimes —
    stages 1/2 form multi-block runs (windows 8/4 tile grids 32/16)
    while stage 3's window 16 exceeds its 8-grid and falls back."""
    from cryovit_tpu.models.sam2.config import HieraConfig
    from cryovit_tpu.models.sam2.hiera import Hiera

    cfg = HieraConfig.large()
    x = jnp.asarray(rng.random((1, 128, 128)), dtype=jnp.float32)
    fast = Hiera(cfg, window_persistent=True)
    slow = Hiera(cfg, window_persistent=False)
    variables = jax.jit(fast.init)(jax.random.key(0), x)
    # identical param trees: the layout change must not rename/move params
    slow_vars = jax.jit(slow.init)(jax.random.key(0), x)
    paths = lambda v: [
        jax.tree_util.keystr(p)
        for p, _ in jax.tree_util.tree_leaves_with_path(v)
    ]
    assert paths(variables) == paths(slow_vars)
    out_fast = jax.jit(fast.apply)(variables, x)
    out_slow = jax.jit(slow.apply)(variables, x)
    for a, b in zip(out_fast, out_slow):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_hiera_fused_window_block_matches_xla(rng):
    """The fused Pallas window-block path (ops/window_attention.py:
    [LN1→qkv→attention→proj→+res] + [LN2→MLP(exact gelu)→+res] kernels,
    dispatched for 128–512-token windows) must keep the XLA path's param
    tree exactly and its numerics to within the bf16 softmax recipe's
    tolerance. Runs the kernels in interpret mode on CPU."""
    from cryovit_tpu.models.sam2.config import HieraConfig
    from cryovit_tpu.models.sam2.hiera import Hiera
    from cryovit_tpu.ops.window_attention import set_window_kernel

    cfg = HieraConfig(
        embed_dim=8, num_heads=1, stages=(2, 1, 1, 1),
        window_spec=(16, 4, 4, 2), global_att_blocks=(4,),
    )
    x = jnp.asarray(rng.random((1, 128, 128)), jnp.float32)
    m = Hiera(cfg, dtype=jnp.bfloat16)
    try:
        set_window_kernel(False)
        variables = jax.jit(m.init)(jax.random.key(0), x)
        o_xla = jax.jit(m.apply)(variables, x)
        set_window_kernel("interpret")
        v2 = jax.jit(m.init)(jax.random.key(0), x)
        paths = lambda v: [
            jax.tree_util.keystr(p)
            for p, _ in jax.tree_util.tree_leaves_with_path(v)
        ]
        assert paths(variables) == paths(v2)
        assert [l.shape for l in jax.tree_util.tree_leaves(variables)] == [
            l.shape for l in jax.tree_util.tree_leaves(v2)
        ]
        o_kernel = jax.jit(m.apply)(variables, x)
    finally:
        set_window_kernel(None)
    for a, b in zip(o_xla, o_kernel):
        a = np.asarray(a, dtype=np.float64).ravel()
        b = np.asarray(b, dtype=np.float64).ravel()
        cos = a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12)
        assert cos > 0.9999, cos
        assert np.abs(a - b).max() < 0.1, np.abs(a - b).max()


def test_encoder_int8_mode_fidelity(tiny_cfg, rng):
    """The opt-in w8a8 trunk mode (``--int8``, hiera._Dense) must keep the
    same parameter tree as the bf16 path (converter compatibility) and
    stay close to it numerically on every FPN level."""
    x = jnp.asarray(rng.random((2, 64, 64, 3)), dtype=jnp.float32)
    ref = ImageEncoder(tiny_cfg, dtype=jnp.bfloat16)
    q = ImageEncoder(tiny_cfg, dtype=jnp.bfloat16, quant_int8=True)
    variables = jax.jit(ref.init)(jax.random.key(0), x)
    q_vars = jax.jit(q.init)(jax.random.key(0), x)
    paths = lambda v: [
        jax.tree_util.keystr(p)
        for p, _ in jax.tree_util.tree_leaves_with_path(v)
    ]
    assert paths(variables) == paths(q_vars)
    out_ref = jax.jit(ref.apply)(variables, x)
    out_q = jax.jit(q.apply)(variables, x)
    for a, b in zip(out_ref["backbone_fpn"], out_q["backbone_fpn"]):
        a = np.asarray(a, dtype=np.float64).ravel()
        b = np.asarray(b, dtype=np.float64).ravel()
        cos = a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12)
        rel = np.linalg.norm(a - b) / (np.linalg.norm(a) + 1e-12)
        # observed: cos ≥ 0.99989, rel-L2 ≤ 0.0146 per level (advisor r3:
        # the earlier 0.99 bound was loose enough for a broken scale
        # broadcast to slip through); bound both so a real quant
        # regression trips the test
        assert cos > 0.9995, cos
        assert rel < 0.03, rel

    # the prequantized-weight path (qweights collection, built once at
    # SamFeatureExtractor setup) must be bit-exact vs on-the-fly quant
    from cryovit_tpu.run.sam_features import prequantize_trunk_int8

    qw = {"params": variables["params"],
          "qweights": prequantize_trunk_int8(variables["params"])}
    out_pre = jax.jit(q.apply)(qw, x)
    for a, b in zip(out_q["backbone_fpn"], out_pre["backbone_fpn"]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_hiera_fused_window_block_standalone_dispatch(rng):
    """The fused path's OWN partition/unpartition branch (a fused-eligible
    block dispatched standalone, pre_windowed=False) must match the XLA
    path too — the window-persistent run loop groups eligible neighbors
    as pre_windowed, so this branch only fires for isolated blocks or
    ``window_persistent=False`` (advisor r4: previously untested)."""
    from cryovit_tpu.models.sam2.config import HieraConfig
    from cryovit_tpu.models.sam2.hiera import Hiera
    from cryovit_tpu.ops.window_attention import set_window_kernel

    cfg = HieraConfig(
        embed_dim=8, num_heads=1, stages=(2, 1, 1, 1),
        window_spec=(16, 4, 4, 2), global_att_blocks=(4,),
    )
    x = jnp.asarray(rng.random((1, 128, 128)), jnp.float32)
    m = Hiera(cfg, dtype=jnp.bfloat16, window_persistent=False)
    try:
        set_window_kernel(False)
        variables = jax.jit(m.init)(jax.random.key(0), x)
        o_xla = jax.jit(m.apply)(variables, x)
        set_window_kernel("interpret")
        o_kernel = jax.jit(m.apply)(variables, x)
    finally:
        set_window_kernel(None)
    for a, b in zip(o_xla, o_kernel):
        a = np.asarray(a, dtype=np.float64).ravel()
        b = np.asarray(b, dtype=np.float64).ravel()
        cos = a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12)
        assert cos > 0.9999, cos
        assert np.abs(a - b).max() < 0.1, np.abs(a - b).max()


def test_window_attention_matches_reference(rng):
    """The standalone per-window attention kernel (probe/building-block
    pair exported from ops/window_attention.py) must match its XLA oracle
    on the head-padded layout (advisor r4: was export-only, untested)."""
    from cryovit_tpu.ops.window_attention import (
        window_attention,
        window_attention_reference,
    )

    heads, d, n, t = 2, 72, 3, 64
    import math

    def padded(key, ones_col=False):
        x = np.zeros((n, t, heads * 128), np.float32)
        for h in range(heads):
            x[:, :, h * 128 : h * 128 + d] = rng.standard_normal((n, t, d))
            if ones_col:
                x[:, :, h * 128 + d] = 1.0
        return jnp.asarray(x, jnp.bfloat16)

    q = padded(0) * (d**-0.5 * math.log2(math.e))
    k = padded(1)
    v = padded(2, ones_col=True)
    out_k = window_attention(q, k, v, head_dim=d, interpret=True)
    out_ref = window_attention_reference(q, k, v, head_dim=d)
    a = np.asarray(out_k, np.float64)
    b = np.asarray(out_ref, np.float64)
    # compare the real lanes (pad lanes hold the denominator column ≡ 1)
    for h in range(heads):
        np.testing.assert_allclose(
            a[..., h * 128 : h * 128 + d],
            b[..., h * 128 : h * 128 + d],
            atol=0.02, rtol=0.02,
        )


def test_hiera_global_kernel_attention_matches_xla(rng):
    """The global-attention Pallas path (1024-token blocks on head-padded
    planes, MultiScaleAttention._global_kernel_attention) must keep the
    XLA path's param tree exactly and its numerics to within the bf16
    softmax recipe's tolerance. Runs the kernel in interpret mode on CPU."""
    from cryovit_tpu.models.sam2.config import HieraConfig
    from cryovit_tpu.models.sam2.hiera import Hiera
    from cryovit_tpu.ops.window_attention import set_window_kernel

    # stage-1 grid 32×32 → block 1 is a 1024-token global block
    cfg = HieraConfig(
        embed_dim=8, num_heads=1, stages=(2, 1, 1, 1),
        window_spec=(4, 4, 4, 2), global_att_blocks=(1,),
    )
    x = jnp.asarray(rng.random((1, 128, 128)), jnp.float32)
    m = Hiera(cfg, dtype=jnp.bfloat16)
    try:
        set_window_kernel(False)
        variables = jax.jit(m.init)(jax.random.key(0), x)
        o_xla = jax.jit(m.apply)(variables, x)
        set_window_kernel("interpret")
        v2 = jax.jit(m.init)(jax.random.key(0), x)
        paths = lambda v: [
            jax.tree_util.keystr(p)
            for p, _ in jax.tree_util.tree_leaves_with_path(v)
        ]
        assert paths(variables) == paths(v2)
        assert [l.shape for l in jax.tree_util.tree_leaves(variables)] == [
            l.shape for l in jax.tree_util.tree_leaves(v2)
        ]
        o_kernel = jax.jit(m.apply)(variables, x)
    finally:
        set_window_kernel(None)
    for a, b in zip(o_xla, o_kernel):
        a = np.asarray(a, dtype=np.float64).ravel()
        b = np.asarray(b, dtype=np.float64).ravel()
        cos = a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12)
        assert cos > 0.9999, cos
        assert np.abs(a - b).max() < 0.1, np.abs(a - b).max()


def test_tracking_kv_cache_matches_uncached(rng):
    """The opt-in per-slot k/v cache for the tracking scan
    (SAM2Model(kv_cache=True), memory._MemAttnLayer.cached) is exact
    math — linearity of the cross k/v projections and of RoPE — so the
    cached and uncached programs must agree. (Measured FLAT on the real
    chip, BASELINE.md r5 — kept as a tested opt-in.)"""
    import dataclasses

    cfg = dataclasses.replace(SAM2Config.tiny_test(), max_cond_slices=2)
    s = cfg.image_size
    d = 6
    slices = jnp.asarray(rng.random((1, d, s, s)), dtype=jnp.float32)
    base = SAM2Model(cfg=cfg, lora_rank=4, lora_alpha=4.0)
    variables = base.init(jax.random.key(0), slices)
    order = jnp.asarray([0, 3, 1, 2, 4, 5])
    num_cond = jnp.asarray(2)
    out_plain = base.apply(variables, slices, order=order, num_cond=num_cond)
    cached = SAM2Model(cfg=cfg, lora_rank=4, lora_alpha=4.0, kv_cache=True)
    out_cached = cached.apply(variables, slices, order=order, num_cond=num_cond)
    np.testing.assert_allclose(
        np.asarray(out_plain["preds"]), np.asarray(out_cached["preds"]),
        atol=1e-4,
    )
