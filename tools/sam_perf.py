#!/usr/bin/env python
"""SAM2 Hiera-L pyramid-extraction timing lab (real TPU).

Times the ``features --use-sam`` hot loop (bench.py methodology: scalar
read forced per batch) for the bf16 path and the opt-in w8a8 trunk mode.
Run: python tools/sam_perf.py [--int8-only] [--batch N]
"""

import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)

import jax.numpy as jnp
import numpy as np

from cryovit_tpu.run.sam_features import (
    SamFeatureExtractor,
    make_sam_encoder_variables,
)

NBATCH = 8


def time_variant(name, extractor, stacks):
    fn = extractor._batch_fn()
    float(jnp.sum(fn(stacks[0])["backbone_fpn"][0].astype(jnp.float32)))
    t0 = time.perf_counter()
    sums = [
        jnp.sum(fn(s)["backbone_fpn"][0].astype(jnp.float32)) for s in stacks
    ]
    for s in sums:
        float(s)
    dt = time.perf_counter() - t0
    rate = stacks[0].shape[0] * len(stacks) / dt
    print(f"{name}: {rate:6.2f} slices/s")
    return rate


def synth_variables(model, s: int):
    """Random variables from init SHAPES — jitting/eagerly running the real
    init costs minutes through the tunnel (see time_tracking)."""
    import time as _t

    t0 = _t.perf_counter()
    shapes = jax.eval_shape(
        model.init, jax.random.key(0), jnp.zeros((1, 2, s, s, 1), jnp.float32)
    )
    leaves, treedef = jax.tree_util.tree_flatten(shapes)

    @jax.jit
    def synth(k):
        ks = jax.random.split(k, len(leaves))
        return treedef.unflatten([
            (0.02 * jax.random.normal(ki, l.shape, l.dtype))
            if jnp.issubdtype(l.dtype, jnp.floating)
            else jnp.zeros(l.shape, l.dtype)
            for ki, l in zip(ks, leaves)
        ])

    variables = synth(jax.random.key(1))
    jax.block_until_ready(variables)
    print(f"  [params synthesized in {_t.perf_counter() - t0:.1f}s]")
    return variables


def time_train_step(cached: bool, depth: int = 8):
    """SAM2-large train step (frozen Hiera-L + LoRA decoder + prompt
    predictor, AdamW, bf16), full encoder forward or cached pyramids."""
    import optax

    from cryovit_tpu.config import compose
    from cryovit_tpu.models.base import prediction_mask
    from cryovit_tpu.run.common import build_model

    cfg = compose(
        "train_model", ["model=sam2", "datamodule=single", "label_key=mito"]
    )
    model = build_model(cfg, "bf16")
    model.train_mode = True  # the train forward (kv_cache off)
    s = model_img = 512
    rng = np.random.default_rng(0)
    data = jnp.asarray(
        rng.random((1, depth, s, s, 1)).astype(np.float32)
    )
    label = jnp.asarray(
        rng.integers(-1, 2, size=(1, depth, s, s)).astype(np.float32)
    )
    variables = synth_variables(model, s)
    if cached:
        d_model = model.sam_cfg.d_model
        levels = tuple(
            jnp.asarray(
                rng.random((depth, model_img // st, model_img // st, d_model))
                .astype(np.float32)
            )
            for st in (4, 8, 16)
        )
        inputs = {"slices": data, "backbone": {
            "backbone_fpn": levels, "vision_pos_enc": levels}}
    else:
        inputs = data
    opt = model.make_optimizer(gradient_clip_val=1.0)
    opt_state = opt.init(variables)

    @jax.jit
    def step(v, st, inp, lab):
        def loss_fn(v):
            preds, aux = model.apply_with_aux(v, inp)
            losses = model.compute_losses(
                preds, lab, prediction_mask(lab), aux=aux
            )
            return losses["total"], losses

        (total, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(v)
        updates, st = opt.update(grads, st, v)
        return optax.apply_updates(v, updates), st, total

    variables, opt_state, total = step(variables, opt_state, inputs, label)
    float(total)  # warmup + force
    n = 5
    t0 = time.perf_counter()
    for _ in range(n):
        variables, opt_state, total = step(variables, opt_state, inputs, label)
    float(total)
    dt = (time.perf_counter() - t0) / n
    name = "cached pyramids" if cached else "full encoder fwd"
    print(
        f"train step ({name}, {depth} slices @512²): {dt * 1e3:7.1f} ms "
        f"({depth / dt:5.1f} slices/s)"
    )


def time_tracking(cached: bool, depth: int = 255):
    """SAM2 tracking INFERENCE (the ``evaluate``/``infer`` eval workload,
    reference ``models/sam2.py:457-532``): sequential memory-conditioned
    tracking over ``depth`` slices @512² through the ring-buffer scan —
    one jit program per volume. ``cached=True`` uses precomputed
    ``sam_features`` pyramids (the ``use_cache_features=True`` config
    default); ``cached=False`` runs the live Hiera-L encoder in the same
    program."""
    from cryovit_tpu.config import compose
    from cryovit_tpu.run.common import build_model

    cfg = compose(
        "train_model", ["model=sam2", "datamodule=single", "label_key=mito"]
    )
    model = build_model(cfg, "bf16")
    model.train_mode = False
    s = 512
    data = jax.jit(
        lambda k: jax.random.uniform(k, (1, depth, s, s, 1), jnp.float32)
    )(jax.random.key(0))
    # params are depth-independent: synthesize from the 2-slice init shapes
    variables = synth_variables(model, s)
    if cached:
        # cached pyramids are fp16 on disk (save_feature_hdf); keep them
        # sub-f32 on device too — f32 levels at D=255 alone are ~11 GB.
        # Generated on device: host rng + tunnel upload of ~5 GB at D=255
        # dominates wall time otherwise.
        d_model = model.sam_cfg.d_model
        levels = tuple(
            jax.jit(
                lambda k, st=st: jax.random.uniform(
                    k, (depth, s // st, s // st, d_model), jnp.bfloat16
                )
            )(jax.random.key(10 + st))
            for st in (4, 8, 16)
        )
        inputs = {"slices": data, "backbone": {
            "backbone_fpn": levels, "vision_pos_enc": levels}}
    else:
        inputs = data

    fwd = jax.jit(lambda v, inp: model.apply(v, inp))
    t0 = time.perf_counter()
    preds = fwd(variables, inputs)
    float(jnp.sum(preds.astype(jnp.float32)))  # warmup + force
    print(f"  [compile+warmup in {time.perf_counter() - t0:.1f}s]")
    n = 3
    t0 = time.perf_counter()
    sums = []
    for _ in range(n):
        sums.append(jnp.sum(fwd(variables, inputs).astype(jnp.float32)))
    for x in sums:
        float(x)
    dt = (time.perf_counter() - t0) / n
    name = "cached pyramids" if cached else "live encoder"
    print(
        f"tracking inference ({name}, {depth} slices @512²): "
        f"{dt * 1e3:8.1f} ms/volume ({depth / dt:6.1f} slices/s)"
    )
    return depth / dt


def main():
    if "--train" in sys.argv:
        time_train_step(cached=False)
        time_train_step(cached=True)
        return
    if "--track" in sys.argv:
        depth = 255
        if "--depth" in sys.argv:
            depth = int(sys.argv[sys.argv.index("--depth") + 1])
        time_tracking(cached=True, depth=depth)
        time_tracking(cached=False, depth=depth)
        return
    batch = 24
    if "--batch" in sys.argv:
        batch = int(sys.argv[sys.argv.index("--batch") + 1])
    variables = make_sam_encoder_variables("", random_init=True)
    rng = np.random.default_rng(3)
    stacks = [
        jnp.asarray(rng.random((batch, 512, 512)).astype(np.float32))
        for _ in range(NBATCH)
    ]
    if "--int8-only" not in sys.argv:
        time_variant(
            f"bf16 (batch {batch})",
            SamFeatureExtractor(variables, batch_size=batch),
            stacks,
        )
    time_variant(
        f"int8 (batch {batch})",
        SamFeatureExtractor(variables, batch_size=batch, quant_int8=True),
        stacks,
    )


if __name__ == "__main__":
    main()
