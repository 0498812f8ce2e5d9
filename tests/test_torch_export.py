"""Torch export round trip (VERDICT r3 missing #3): TPU-trained weights →
reference-readable artifacts → strict torch load + forward parity.

Clones below reproduce the reference modules' exact nn.Module trees
(reference ``models/cryovit.py:18-34``, ``models/unet3d.py:20-46``) so
``load_state_dict(strict=True)`` validates the exported key set and the
forward pass validates the layout inverses.
"""

import pickle
import pickletools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cryovit_tpu.models.cryovit import CryoVITModule
from cryovit_tpu.models.unet3d import UNet3DModule
from cryovit_tpu.train.torch_export import (
    export_state_dict,
    save_torch_model,
    save_torch_weights,
)
from cryovit_tpu.types import ModelType

torch = pytest.importorskip("torch")
from torch import nn  # noqa: E402


def _ref_cryovit():
    """Reference CryoVIT with the real NESTED block Sequentials
    (``SynthesisBlock.layers``, reference models/cryovit.py:52-83)."""

    class SynthesisBlock(nn.Module):
        def __init__(self, c1, c2, c3, d1, d2):
            super().__init__()
            self.layers = nn.Sequential(
                nn.GroupNorm(max(8, c1 // 8), c1, eps=1e-3),
                nn.Conv3d(c1, c2, 3, padding="same", dilation=(d1, 1, 1)),
                nn.GELU(),
                nn.Conv3d(c2, c2, 3, padding="same", dilation=(d2, 1, 1)),
                nn.GELU(),
                nn.ConvTranspose3d(c2, c3, (1, 2, 2), stride=(1, 2, 2)),
                nn.GELU(),
            )

        def forward(self, x):
            return self.layers(x)

    class RefCryoVIT(nn.Module):
        def __init__(self):
            super().__init__()
            self.layers = nn.Sequential(
                nn.Conv3d(1536, 1024, 1, padding="same"),
                nn.GELU(),
                SynthesisBlock(1024, 192, 128, 32, 24),
                SynthesisBlock(128, 64, 32, 16, 12),
                SynthesisBlock(32, 32, 32, 8, 4),
                SynthesisBlock(32, 16, 8, 2, 1),
            )
            self.output_layer = nn.Sequential(
                nn.Conv3d(8, 8, 3, padding="same"),
                nn.GELU(),
                nn.Conv3d(8, 1, 3, padding="same"),
            )

        def forward(self, x):  # (B, C, D, H, W)
            x = self.output_layer(self.layers(x))
            return torch.sigmoid(torch.clip(x, -5.0, 5.0))[:, 0]

    return RefCryoVIT()


def _ref_unet3d():
    """Reference UNet3D tree (reference models/unet3d.py:20-210)."""

    def inorm(c):
        return nn.InstanceNorm3d(c, eps=1e-3, affine=True)

    class AnalysisBlock(nn.Module):
        def __init__(self, cin, cout):
            super().__init__()
            self.pool = nn.Sequential(
                nn.Conv3d(cout, cout, 2, stride=2), inorm(cout), nn.GELU()
            )
            self.layers = nn.Sequential(
                nn.Conv3d(cin, cout, 3, padding="same"), inorm(cout), nn.GELU(),
                nn.Conv3d(cout, cout, 3, padding="same"), inorm(cout), nn.GELU(),
            )

        def forward(self, x):
            x = self.layers(x)
            return self.pool(x), x

    class LinearProjection(nn.Module):
        def __init__(self, cin, cout):
            super().__init__()
            self.proj = nn.Linear(cin, cout)

        def forward(self, x):
            x = torch.permute(x, (0, 2, 3, 4, 1))
            x = self.proj(x)
            return torch.permute(x, (0, 4, 1, 2, 3))

    class SynthesisBlock(nn.Module):
        def __init__(self, cin, cskip, cout):
            super().__init__()
            self.upconv = nn.Sequential(
                nn.ConvTranspose3d(cin, cout, 2, stride=2), inorm(cout), nn.GELU()
            )
            self.layers = nn.Sequential(
                LinearProjection(cout + cskip, cout), inorm(cout), nn.GELU(),
                nn.Conv3d(cout, cout, 3, padding="same"), inorm(cout), nn.GELU(),
            )

        def forward(self, x, skip):
            x = self.upconv(x)
            x = torch.cat([x, skip], 1)
            return self.layers(x)

    class RefUNet3D(nn.Module):
        def __init__(self):
            super().__init__()
            self.bottom_layer = nn.Sequential(
                nn.Conv3d(256, 384, 3, padding="same"), inorm(384), nn.GELU(),
                nn.Conv3d(384, 256, 3, padding="same"), inorm(256), nn.GELU(),
            )
            self.analysis_layers = nn.ModuleList(
                [AnalysisBlock(1, 16), AnalysisBlock(16, 64), AnalysisBlock(64, 256)]
            )
            self.synthesis_layers = nn.ModuleList(
                [
                    SynthesisBlock(256, 256, 64),
                    SynthesisBlock(64, 64, 16),
                    SynthesisBlock(16, 16, 16),
                ]
            )
            self.output_layer = nn.Conv3d(16, 1, 1, padding="same")

        def forward(self, x):  # (B, 1, D, H, W), dims multiples of 16
            skips = []
            for block in self.analysis_layers:
                x, skip = block(x)
                skips.append(skip)
            x = self.bottom_layer(x)
            for block in self.synthesis_layers:
                x = block(x, skips.pop())
            x = torch.clip(self.output_layer(x), -5.0, 5.0)
            return torch.sigmoid(x)[:, 0]

    return RefUNet3D()


@pytest.mark.slow
def test_cryovit_export_strict_load_and_forward_parity(rng):
    module = CryoVITModule(dtype=jnp.float32)
    feats = jnp.asarray(rng.standard_normal((1, 3, 4, 4, 1536)), jnp.float32)
    variables = module.init(jax.random.key(0), feats)

    sd = export_state_dict(variables, ModelType.CRYOVIT)
    tmodel = _ref_cryovit().eval()
    # strict load: exported keys/shapes must exactly match the reference tree
    tmodel.load_state_dict({k: torch.from_numpy(v) for k, v in sd.items()})

    out_flax = np.asarray(jax.jit(module.apply)(variables, feats))
    with torch.inference_mode():
        tin = torch.from_numpy(
            np.asarray(feats).transpose(0, 4, 1, 2, 3)
        )  # (B, C, D, H, W)
        out_torch = tmodel(tin).numpy()
    np.testing.assert_allclose(out_flax, out_torch, atol=2e-5)


@pytest.mark.slow
def test_unet3d_export_strict_load_and_forward_parity(rng):
    module = UNet3DModule(dtype=jnp.float32)
    x = jnp.asarray(rng.standard_normal((1, 16, 32, 32, 1)), jnp.float32)
    variables = module.init(jax.random.key(0), x)

    sd = export_state_dict(variables, ModelType.UNET3D)
    tmodel = _ref_unet3d().eval()
    tmodel.load_state_dict({k: torch.from_numpy(v) for k, v in sd.items()})

    out_flax = np.asarray(jax.jit(module.apply)(variables, x))
    with torch.inference_mode():
        tin = torch.from_numpy(np.asarray(x).transpose(0, 4, 1, 2, 3))
        out_torch = tmodel(tin).numpy()
    np.testing.assert_allclose(out_flax, out_torch, atol=3e-5)


def test_torch_model_artifact_round_trip(tmp_path, rng):
    """save_torch_model → (a) pickle carries the reference's class paths,
    (b) our own importer reads it back with identical weights."""
    from cryovit_tpu.models import CryoVIT
    from cryovit_tpu.models.losses import DiceLoss
    from cryovit_tpu.models.metrics import DiceMetric
    from cryovit_tpu.train.checkpoint import load_model

    model = CryoVIT(
        name="CryoVIT", input_key="dino_features", lr=1e-4,
        losses={"dice_loss": DiceLoss()}, metrics={"dice_metric": DiceMetric(0.5)},
    )
    feats = jnp.asarray(rng.standard_normal((1, 2, 4, 4, 1536)), jnp.float32)
    variables = model.init(jax.random.key(0), feats)
    path = save_torch_model("exported", "mito", model, variables, tmp_path / "m.torch.model")

    # (a) the pickle references the REFERENCE stack's classes by module path
    ops = list(pickletools.genops(path.read_bytes()))
    globals_seen = set()
    stack = []
    for op, arg, _ in ops:
        if op.name in ("SHORT_BINUNICODE", "BINUNICODE", "UNICODE"):
            stack.append(arg)
        elif op.name == "STACK_GLOBAL" and len(stack) >= 2:
            globals_seen.add((stack[-2], stack[-1]))
        elif op.name == "GLOBAL":
            globals_seen.add(tuple(arg.split(" ")))
    assert ("cryovit.utils", "SavedModel") in globals_seen, globals_seen
    assert ("cryovit.types", "ModelType") in globals_seen
    assert ("omegaconf.omegaconf", "OmegaConf.create") in globals_seen
    # no stub modules leak into this process
    import sys

    assert "cryovit" not in sys.modules and "omegaconf" not in sys.modules

    # (b) round trip through our reference-artifact importer
    lmodel, lvars, mtype, name, label_key = load_model(path)
    assert (name, label_key, mtype) == ("exported", "mito", ModelType.CRYOVIT)
    orig = export_state_dict(variables, ModelType.CRYOVIT)
    back = export_state_dict(lvars, ModelType.CRYOVIT)
    for k in orig:
        np.testing.assert_array_equal(orig[k], back[k])


def test_torch_weights_round_trip(tmp_path, rng):
    from cryovit_tpu.train.checkpoint import load_weights

    module = CryoVITModule(dtype=jnp.float32)
    feats = jnp.asarray(rng.standard_normal((1, 2, 4, 4, 1536)), jnp.float32)
    variables = module.init(jax.random.key(0), feats)
    path = save_torch_weights(variables, ModelType.CRYOVIT, tmp_path / "weights.pt")

    sd = torch.load(path, map_location="cpu", weights_only=True)
    assert "layers.0.weight" in sd and "layers.2.layers.5.weight" in sd
    assert sd["layers.0.weight"].shape == (1024, 1536, 1, 1, 1)

    lvars = load_weights(path)  # torch-zip path → converted back to flax
    flat_a = jax.tree_util.tree_leaves_with_path(variables)
    flat_b = dict(jax.tree_util.tree_leaves_with_path(lvars))
    for p, leaf in flat_a:
        np.testing.assert_allclose(np.asarray(leaf), np.asarray(flat_b[p]), atol=0)
