"""Shape, gradient, and torch-parity tests for the flax models."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cryovit_tpu.composer import instantiate
from cryovit_tpu.config import compose
from cryovit_tpu.models import CryoVIT, CryoVITModule, UNet3D, UNet3DModule
from cryovit_tpu.models.base import prediction_mask


def test_cryovit_shapes_and_range(rng):
    module = CryoVITModule()
    x = jnp.asarray(rng.standard_normal((1, 6, 2, 3, 1536)), dtype=jnp.float32)
    variables = module.init(jax.random.key(0), x)
    y = module.apply(variables, x)
    assert y.shape == (1, 6, 32, 48)  # 16x H/W upsampling, depth untouched
    assert float(y.min()) >= 0.0 and float(y.max()) <= 1.0


def test_unet3d_shapes_and_range(rng):
    module = UNet3DModule()
    x = jnp.asarray(rng.standard_normal((1, 16, 16, 32, 1)), dtype=jnp.float32)
    variables = module.init(jax.random.key(0), x)
    y = module.apply(variables, x)
    assert y.shape == (1, 16, 16, 32)
    assert float(y.min()) >= 0.0 and float(y.max()) <= 1.0


def test_unet3d_rejects_unpadded():
    module = UNet3DModule()
    x = jnp.zeros((1, 10, 16, 16, 1))
    with pytest.raises(ValueError, match="multiples"):
        module.init(jax.random.key(0), x)


def test_model_from_config_and_grad_step(rng):
    cfg = compose("train_model", ["model=cryovit", "datamodule=single", "label_key=mito"])
    model = instantiate(cfg.model)
    assert isinstance(model, CryoVIT)
    assert model.lr == 1e-4 and model.weight_decay == 1e-3
    assert set(model.losses) == {"dice_loss"}
    assert set(model.metrics) == {"dice_metric", "f1_metric"}

    x = jnp.asarray(rng.standard_normal((1, 4, 2, 2, 1536)), dtype=jnp.float32)
    y_true = jnp.asarray(rng.integers(-1, 2, size=(1, 4, 32, 32)), dtype=jnp.float32)
    variables = model.init(jax.random.key(0), x)

    def loss_fn(v):
        y_pred = model.apply(v, x)
        mask = prediction_mask(y_true)
        return model.compute_losses(y_pred, y_true, mask)["total"]

    loss, grads = jax.value_and_grad(loss_fn)(variables)
    assert np.isfinite(float(loss))
    gnorm = jnp.sqrt(sum(jnp.sum(g**2) for g in jax.tree_util.tree_leaves(grads)))
    assert float(gnorm) > 0

    opt = model.make_optimizer()
    opt_state = opt.init(variables)
    updates, _ = opt.update(grads, opt_state, variables)
    new_vars = jax.tree_util.tree_map(lambda p, u: p + u, variables, updates)
    assert float(loss_fn(new_vars)) != float(loss)


def test_unet3d_from_config():
    cfg = compose("train_model", ["model=unet3d", "datamodule=single", "label_key=mito"])
    model = instantiate(cfg.model)
    assert isinstance(model, UNet3D)
    assert model.lr == 3e-3
    assert model.input_key == "data"


def test_param_counts():
    # CryoVIT decoder should be ~8M params (1536→1024 projection dominates)
    model_cfg = compose("train_model", ["model=cryovit", "datamodule=single", "label_key=mito"]).model
    model = instantiate(model_cfg)
    x = jnp.zeros((1, 2, 2, 2, 1536))
    n = model.param_count(model.init(jax.random.key(0), x))
    assert 3_000_000 < n < 20_000_000


# ---- torch parity of building blocks -------------------------------------

torch = pytest.importorskip("torch")


def _to_torch(x):
    return torch.from_numpy(np.asarray(x, dtype=np.float32))


def test_groupnorm_parity_with_torch(rng):
    """flax GroupNorm(eps 1e-3) matches torch.nn.GroupNorm on NDHWC↔NCDHW."""
    from flax import linen as nn

    c, g = 32, 8
    x = rng.standard_normal((2, 4, 4, 4, c)).astype(np.float32)
    gamma = rng.standard_normal(c).astype(np.float32)
    beta = rng.standard_normal(c).astype(np.float32)

    fx = nn.GroupNorm(num_groups=g, epsilon=1e-3)
    out_flax = fx.apply(
        {"params": {"scale": jnp.asarray(gamma), "bias": jnp.asarray(beta)}},
        jnp.asarray(x),
    )

    tg = torch.nn.GroupNorm(g, c, eps=1e-3)
    with torch.no_grad():
        tg.weight.copy_(_to_torch(gamma))
        tg.bias.copy_(_to_torch(beta))
        out_torch = tg(_to_torch(x).permute(0, 4, 1, 2, 3)).permute(0, 2, 3, 4, 1)
    np.testing.assert_allclose(np.asarray(out_flax), out_torch.numpy(), atol=2e-5)


def test_dilated_conv3d_same_parity_with_torch(rng):
    """flax Conv k3 depth-dilated 'SAME' matches torch Conv3d padding='same'."""
    from flax import linen as nn

    cin, cout, d1 = 3, 5, 4
    x = rng.standard_normal((1, 16, 6, 6, cin)).astype(np.float32)
    w = rng.standard_normal((3, 3, 3, cin, cout)).astype(np.float32) * 0.1
    b = rng.standard_normal(cout).astype(np.float32)

    conv = nn.Conv(cout, (3, 3, 3), kernel_dilation=(d1, 1, 1), padding="SAME")
    out_flax = conv.apply(
        {"params": {"kernel": jnp.asarray(w), "bias": jnp.asarray(b)}}, jnp.asarray(x)
    )

    tc = torch.nn.Conv3d(cin, cout, 3, padding="same", dilation=(d1, 1, 1))
    with torch.no_grad():
        # flax kernel (kd,kh,kw,cin,cout) → torch (cout,cin,kd,kh,kw)
        tc.weight.copy_(_to_torch(w).permute(4, 3, 0, 1, 2))
        tc.bias.copy_(_to_torch(b))
        out_torch = tc(_to_torch(x).permute(0, 4, 1, 2, 3)).permute(0, 2, 3, 4, 1)
    np.testing.assert_allclose(np.asarray(out_flax), out_torch.numpy(), atol=1e-4)


def test_convtranspose_parity_with_torch(rng):
    """flax ConvTranspose (1,2,2)/s(1,2,2) matches torch ConvTranspose3d."""
    from flax import linen as nn

    cin, cout = 4, 6
    x = rng.standard_normal((1, 3, 5, 5, cin)).astype(np.float32)
    w = rng.standard_normal((1, 2, 2, cin, cout)).astype(np.float32) * 0.1
    b = np.zeros(cout, dtype=np.float32)

    ct = nn.ConvTranspose(cout, (1, 2, 2), strides=(1, 2, 2), padding="VALID")
    out_flax = ct.apply(
        {"params": {"kernel": jnp.asarray(w), "bias": jnp.asarray(b)}}, jnp.asarray(x)
    )

    tt = torch.nn.ConvTranspose3d(cin, cout, (1, 2, 2), stride=(1, 2, 2), bias=False)
    with torch.no_grad():
        # flax ConvTranspose applies the kernel unflipped (fractionally
        # strided conv); torch computes the conv gradient (flipped kernel).
        # Weight mapping therefore flips spatial dims:
        # flax (kd,kh,kw,cin,cout) → torch (cin,cout,kd̄,kh̄,kw̄).
        tt.weight.copy_(_to_torch(w[::-1, ::-1, ::-1].copy()).permute(3, 4, 0, 1, 2))
        out_torch = tt(_to_torch(x).permute(0, 4, 1, 2, 3)).permute(0, 2, 3, 4, 1)
    assert out_flax.shape == (1, 3, 10, 10, cout)
    np.testing.assert_allclose(np.asarray(out_flax), out_torch.numpy(), atol=1e-5)


def test_gelu_exact_parity_with_torch(rng):
    from cryovit_tpu.models.cryovit import _gelu

    x = rng.standard_normal(128).astype(np.float32) * 3
    np.testing.assert_allclose(
        np.asarray(_gelu(jnp.asarray(x))),
        torch.nn.functional.gelu(_to_torch(x)).numpy(),
        atol=1e-6,
    )


def test_instancenorm_parity_with_torch(rng):
    from cryovit_tpu.models.unet3d import _instance_norm

    c = 16
    x = rng.standard_normal((2, 4, 4, 4, c)).astype(np.float32)
    gamma = rng.standard_normal(c).astype(np.float32)
    beta = rng.standard_normal(c).astype(np.float32)
    out_flax = _instance_norm(c, jnp.float32).apply(
        {"params": {"scale": jnp.asarray(gamma), "bias": jnp.asarray(beta)}},
        jnp.asarray(x),
    )
    tn = torch.nn.InstanceNorm3d(c, eps=1e-3, affine=True)
    with torch.no_grad():
        tn.weight.copy_(_to_torch(gamma))
        tn.bias.copy_(_to_torch(beta))
        out_torch = tn(_to_torch(x).permute(0, 4, 1, 2, 3)).permute(0, 2, 3, 4, 1)
    np.testing.assert_allclose(np.asarray(out_flax), out_torch.numpy(), atol=2e-5)
