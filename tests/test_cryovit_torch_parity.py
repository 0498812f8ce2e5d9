"""Whole-model parity: flax CryoVIT decoder vs a torch build of the same
architecture, through weight mapping, forward pass, and AdamW training steps.

This is the synthetic-data stand-in for the Dice-parity requirement
(BASELINE.md): if forward outputs and optimization trajectories match at
fp32 tolerance, training on identical real data produces the same model.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cryovit_tpu.models.cryovit import CryoVITModule

torch = pytest.importorskip("torch")


def _torch_cryovit():
    """The reference CryoVIT architecture in torch (from the SURVEY spec)."""
    from torch import nn

    def synthesis(c1, c2, c3, d1, d2):
        return nn.Sequential(
            nn.GroupNorm(max(8, c1 // 8), c1, eps=1e-3),
            nn.Conv3d(c1, c2, 3, padding="same", dilation=(d1, 1, 1)),
            nn.GELU(),
            nn.Conv3d(c2, c2, 3, padding="same", dilation=(d2, 1, 1)),
            nn.GELU(),
            nn.ConvTranspose3d(c2, c3, (1, 2, 2), stride=(1, 2, 2)),
            nn.GELU(),
        )

    class TorchCryoVIT(nn.Module):
        def __init__(self):
            super().__init__()
            self.layers = nn.Sequential(
                nn.Conv3d(1536, 1024, 1, padding="same"),
                nn.GELU(),
                synthesis(1024, 192, 128, 32, 24),
                synthesis(128, 64, 32, 16, 12),
                synthesis(32, 32, 32, 8, 4),
                synthesis(32, 16, 8, 2, 1),
            )
            self.output_layer = nn.Sequential(
                nn.Conv3d(8, 8, 3, padding="same"),
                nn.GELU(),
                nn.Conv3d(8, 1, 3, padding="same"),
            )

        def forward(self, x):  # (B, C, D, H, W)
            x = self.output_layer(self.layers(x))
            return torch.sigmoid(torch.clip(x, -5.0, 5.0))[:, 0]

    return TorchCryoVIT()


def _conv_w(t):  # torch Conv3d (out,in,kd,kh,kw) → flax (kd,kh,kw,in,out)
    return t.detach().numpy().transpose(2, 3, 4, 1, 0)


def _convT_w(t):  # torch ConvTranspose3d (in,out,kd,kh,kw) → flax, flipped
    w = t.detach().numpy()[:, :, ::-1, ::-1, ::-1]
    return np.ascontiguousarray(w.transpose(2, 3, 4, 0, 1))


def _map_params(tmodel) -> dict:
    """torch state → flax CryoVITModule param tree."""
    sd = {k: v for k, v in tmodel.state_dict().items()}

    def conv(prefix):
        return {"kernel": _conv_w(sd[f"{prefix}.weight"]),
                "bias": sd[f"{prefix}.bias"].numpy()}

    def convT(prefix):
        return {"kernel": _convT_w(sd[f"{prefix}.weight"]),
                "bias": sd[f"{prefix}.bias"].numpy()}

    def gn(prefix):
        return {"scale": sd[f"{prefix}.weight"].numpy(),
                "bias": sd[f"{prefix}.bias"].numpy()}

    params = {"Conv_0": conv("layers.0")}
    for i in range(4):
        base = f"layers.{2 + i}"
        params[f"SynthesisBlock_{i}"] = {
            "GroupNorm_0": gn(f"{base}.0"),
            "Conv_0": conv(f"{base}.1"),
            "Conv_1": conv(f"{base}.3"),
            "ConvTranspose_0": convT(f"{base}.5"),
        }
    params["Conv_1"] = conv("output_layer.0")
    params["Conv_2"] = conv("output_layer.2")
    return {"params": params}


@pytest.fixture(scope="module")
def pair():
    torch.manual_seed(0)
    tmodel = _torch_cryovit().eval()
    fmodel = CryoVITModule(dtype=jnp.float32)
    variables = jax.tree_util.tree_map(jnp.asarray, _map_params(tmodel))
    return tmodel, fmodel, variables


def test_forward_parity(pair, rng):
    tmodel, fmodel, variables = pair
    feats = rng.standard_normal((1, 4, 2, 3, 1536)).astype(np.float32) * 0.3
    out_flax = np.asarray(fmodel.apply(variables, jnp.asarray(feats)))
    with torch.no_grad():
        out_torch = tmodel(
            torch.from_numpy(feats.transpose(0, 4, 1, 2, 3))
        ).numpy()
    assert out_flax.shape == out_torch.shape == (1, 4, 32, 48)
    np.testing.assert_allclose(out_flax, out_torch, atol=5e-5)


def test_training_step_parity(pair, rng):
    """Two AdamW+dice steps track between frameworks (same data, lr, wd)."""
    import optax

    from cryovit_tpu.models.losses import dice_loss

    _, fmodel, _ = pair
    torch.manual_seed(0)
    tmodel = _torch_cryovit()  # fresh copy so the fixture stays pristine
    variables = jax.tree_util.tree_map(jnp.asarray, _map_params(tmodel))

    feats = rng.standard_normal((1, 2, 2, 2, 1536)).astype(np.float32) * 0.3
    label = rng.integers(0, 2, size=(1, 2, 32, 32)).astype(np.float32)

    lr, wd = 1e-3, 1e-3
    opt = optax.adamw(lr, weight_decay=wd)
    opt_state = opt.init(variables)

    topt = torch.optim.AdamW(tmodel.parameters(), lr=lr, weight_decay=wd)
    tfeats = torch.from_numpy(feats.transpose(0, 4, 1, 2, 3))
    tlabel = torch.from_numpy(label)

    @jax.jit
    def step(v, s):
        def loss_fn(v):
            preds = fmodel.apply(v, jnp.asarray(feats))
            return dice_loss(preds, jnp.asarray(label), jnp.ones_like(jnp.asarray(label), bool))

        loss, grads = jax.value_and_grad(loss_fn)(v)
        updates, s = opt.update(grads, s, v)
        return optax.apply_updates(v, updates), s, loss

    for i in range(2):
        variables, opt_state, jloss = step(variables, opt_state)

        topt.zero_grad()
        tpred = tmodel(tfeats)
        inter = (tpred * tlabel).sum()
        tloss = 1 - 2 * inter / (tpred.sum() + tlabel.sum() + 1e-3)
        tloss.backward()
        topt.step()
        np.testing.assert_allclose(float(jloss), float(tloss.detach()), atol=2e-5)

    # post-update forward outputs still match
    out_flax = np.asarray(fmodel.apply(variables, jnp.asarray(feats)))
    with torch.no_grad():
        out_torch = tmodel(tfeats).numpy()
    np.testing.assert_allclose(out_flax, out_torch, atol=5e-4)
