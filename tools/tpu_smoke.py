#!/usr/bin/env python
"""Real-TPU smoke test for the Pallas kernel paths (~2 min warm).

The pytest suite runs on CPU (interpret mode / XLA fallbacks), which cannot
catch Mosaic lowering regressions — non-32-bit lane rotates, Element-spec
rules, scoped-VMEM limits and layout constraints all only bite on hardware
(each broke once during round 3). Run this after touching ops/ or the
decoder: it compiles and numerically checks every kernel at a real tail
shape, then runs one train step + one fused forward.

Usage: python tools/tpu_smoke.py
"""

import functools
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)

import jax.numpy as jnp
import numpy as np
import optax


def check(name, got, want, tol):
    err = float(
        jnp.max(jnp.abs(got.astype(jnp.float32) - want.astype(jnp.float32)))
        / (jnp.max(jnp.abs(want.astype(jnp.float32))) + 1e-9)
    )
    status = "ok" if err < tol else "FAIL"
    print(f"  {name:34s} rel_err={err:.2e}  {status}", flush=True)
    return err < tol


def main() -> int:
    assert jax.default_backend() not in ("cpu",), "needs a real TPU"
    rng = np.random.RandomState(0)
    ok = True

    from cryovit_tpu.ops.conv3d_dm import (
        conv3d_dm,
        conv3d_dm_dw,
        conv3d_dm_reference,
    )

    print("conv3d_dm:", flush=True)
    for (d, ci, h, w, co, dil) in [
        (8, 32, 128, 128, 32, (8, 1, 1)),
        (8, 8, 64, 512, 8, (1, 1, 1)),
        (8, 8, 64, 512, 1, (1, 1, 1)),
        (8, 1, 64, 512, 8, (1, 1, 1)),
    ]:
        x = jnp.asarray(rng.randn(1, d, ci, h, w), jnp.bfloat16)
        k = jnp.asarray(rng.randn(3, 3, 3, ci, co), jnp.bfloat16) * 0.1
        ref = conv3d_dm_reference(x.astype(jnp.float32), k.astype(jnp.float32), dil)
        ok &= check(f"fwd {d}x{ci}x{h}x{w}->{co} dil{dil[0]}", jax.jit(functools.partial(conv3d_dm, dilation=dil))(x, k), ref, 2e-2)
        g = jnp.asarray(rng.randn(1, d, co, h, w), jnp.bfloat16)
        dw_ref = jax.grad(
            lambda kk: jnp.sum(
                conv3d_dm_reference(x.astype(jnp.float32), kk, dil)
                * g.astype(jnp.float32)
            )
        )(jnp.zeros((3, 3, 3, ci, co), jnp.float32))
        ok &= check(f"dW  {d}x{ci}x{h}x{w}->{co}", jax.jit(functools.partial(conv3d_dm_dw, dilation=dil))(x, g), dw_ref, 2e-2)

    from cryovit_tpu.ops.convt_dm import (
        convt2x_dm,
        convt2x_dm_bwd,
        convt2x_dm_reference,
    )

    print("convt2x_dm:", flush=True)
    for (d, ci, h, w, co) in [(8, 32, 128, 128, 32), (8, 16, 64, 256, 8)]:
        x = jnp.asarray(rng.randn(1, d, ci, h, w), jnp.bfloat16)
        k = jnp.asarray(rng.randn(1, 2, 2, ci, co), jnp.bfloat16) * 0.3
        ref = convt2x_dm_reference(x.astype(jnp.float32), k.astype(jnp.float32))
        ok &= check(f"fwd {d}x{ci}x{h}x{w}->{co}", jax.jit(convt2x_dm)(x, k), ref, 2e-2)
        g = jnp.asarray(rng.randn(1, d, co, 2 * h, 2 * w), jnp.bfloat16)
        dxr, dwr = jax.grad(
            lambda x_, k_: jnp.sum(
                convt2x_dm_reference(x_, k_) * g.astype(jnp.float32)
            ),
            argnums=(0, 1),
        )(x.astype(jnp.float32), k.astype(jnp.float32))
        dx, dw = jax.jit(convt2x_dm_bwd)(g, x, k)
        ok &= check(f"bwd dx {d}x{ci}x{h}x{w}", dx, dxr, 3e-2)
        ok &= check(f"bwd dW {d}x{ci}x{h}x{w}", dw, dwr, 3e-2)

    print("decoder train step + fused fwd:", flush=True)
    from cryovit_tpu.models import CryoVIT
    from cryovit_tpu.models.base import prediction_mask
    from cryovit_tpu.models.losses import DiceLoss
    from cryovit_tpu.models.metrics import DiceMetric

    model = CryoVIT(
        name="cryovit", input_key="dino_features", lr=1e-4,
        losses={"dice_loss": DiceLoss()},
        metrics={"dice_metric": DiceMetric()}, dtype=jnp.bfloat16,
    )
    opt = model.make_optimizer()
    data = jnp.asarray(rng.randn(1, 8, 32, 32, 1536), jnp.float16)
    label = jnp.asarray((rng.rand(1, 8, 512, 512) > 0.7).astype(np.float32))
    params = model.init(jax.random.key(0), data)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, data, label):
        def loss_fn(p):
            preds = model.apply(p, data)
            return DiceLoss()(preds, label, prediction_mask(label))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state2 = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state2, loss

    t0 = time.perf_counter()
    p2, o2, loss = step(params, opt_state, data, label)
    loss = float(loss)
    print(f"  train step ok: loss={loss:.4f} ({time.perf_counter()-t0:.0f}s inc. compile)", flush=True)
    ok &= np.isfinite(loss)

    print("OK" if ok else "FAILED", flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
