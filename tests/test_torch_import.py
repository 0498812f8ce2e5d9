"""Reference torch-artifact ingestion: `.model` pickles and weights.pt
state dicts convert to flax and reproduce the torch forward pass.

The torch models here replicate the reference layouts exactly
(reference models/cryovit.py:18-34, models/unet3d.py:20-46, pickle writer
utils.py:354-381), including the nested ``SynthesisBlock.layers``
Sequential that real checkpoints contain.
"""

import pickle
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cryovit_tpu.models.cryovit import CryoVITModule
from cryovit_tpu.models.unet3d import UNet3DModule
from cryovit_tpu.train.checkpoint import load_model, load_weights
from cryovit_tpu.train.torch_import import (
    convert_state_dict,
    infer_model_type,
    load_reference_model,
)
from cryovit_tpu.types import ModelType

torch = pytest.importorskip("torch")
from torch import nn  # noqa: E402


# ---- reference-layout torch models -----------------------------------------

class _RefCryoSynthesis(nn.Module):
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


class _RefCryoVIT(nn.Module):
    def __init__(self):
        super().__init__()
        self.layers = nn.Sequential(
            nn.Conv3d(1536, 1024, 1, padding="same"),
            nn.GELU(),
            _RefCryoSynthesis(1024, 192, 128, 32, 24),
            _RefCryoSynthesis(128, 64, 32, 16, 12),
            _RefCryoSynthesis(32, 32, 32, 8, 4),
            _RefCryoSynthesis(32, 16, 8, 2, 1),
        )
        self.output_layer = nn.Sequential(
            nn.Conv3d(8, 8, 3, padding="same"),
            nn.GELU(),
            nn.Conv3d(8, 1, 3, padding="same"),
        )

    def forward(self, x):  # (B, C, D, H, W)
        x = self.output_layer(self.layers(x))
        return torch.sigmoid(torch.clip(x, -5.0, 5.0))[:, 0]


class _RefAnalysis(nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.pool = nn.Sequential(
            nn.Conv3d(cout, cout, 2, stride=2),
            nn.InstanceNorm3d(cout, eps=1e-3, affine=True),
            nn.GELU(),
        )
        self.layers = nn.Sequential(
            nn.Conv3d(cin, cout, 3, padding="same"),
            nn.InstanceNorm3d(cout, eps=1e-3, affine=True),
            nn.GELU(),
            nn.Conv3d(cout, cout, 3, padding="same"),
            nn.InstanceNorm3d(cout, eps=1e-3, affine=True),
            nn.GELU(),
        )

    def forward(self, x):
        x = self.layers(x)
        return self.pool(x), x


class _RefLinearProjection(nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.proj = nn.Linear(cin, cout)

    def forward(self, x):
        x = torch.permute(x, (0, 2, 3, 4, 1))
        x = self.proj(x)
        return torch.permute(x, (0, 4, 1, 2, 3))


class _RefSynthesis(nn.Module):
    def __init__(self, cin, cskip, cout):
        super().__init__()
        self.upconv = nn.Sequential(
            nn.ConvTranspose3d(cin, cout, 2, stride=2),
            nn.InstanceNorm3d(cout, eps=1e-3, affine=True),
            nn.GELU(),
        )
        self.layers = nn.Sequential(
            _RefLinearProjection(cout + cskip, cout),
            nn.InstanceNorm3d(cout, eps=1e-3, affine=True),
            nn.GELU(),
            nn.Conv3d(cout, cout, 3, padding="same"),
            nn.InstanceNorm3d(cout, eps=1e-3, affine=True),
            nn.GELU(),
        )

    def forward(self, x, skip):
        x = self.upconv(x)
        x = torch.cat([x, skip], 1)
        return self.layers(x)


class _RefUNet3D(nn.Module):
    def __init__(self):
        super().__init__()
        self.bottom_layer = nn.Sequential(
            nn.Conv3d(256, 384, 3, padding="same"),
            nn.InstanceNorm3d(384, eps=1e-3, affine=True),
            nn.GELU(),
            nn.Conv3d(384, 256, 3, padding="same"),
            nn.InstanceNorm3d(256, eps=1e-3, affine=True),
            nn.GELU(),
        )
        self.analysis_layers = nn.ModuleList(
            [_RefAnalysis(1, 16), _RefAnalysis(16, 64), _RefAnalysis(64, 256)]
        )
        self.synthesis_layers = nn.ModuleList(
            [_RefSynthesis(256, 256, 64), _RefSynthesis(64, 64, 16), _RefSynthesis(16, 16, 16)]
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


def _tree_paths(tree):
    return {
        jax.tree_util.keystr(p)
        for p, _ in jax.tree_util.tree_flatten_with_path(tree)[0]
    }


def _write_reference_pickle(path, name, model_type_value, label_key, state_dict):
    """Pickle a SavedModel the way the reference does — with classes that
    claim to live in the (uninstalled) ``cryovit`` package."""
    import dataclasses
    import enum

    cryovit_mod = types.ModuleType("cryovit")
    utils_mod = types.ModuleType("cryovit.utils")
    types_mod = types.ModuleType("cryovit.types")

    FakeModelType = enum.Enum(
        "ModelType",
        {"CRYOVIT": "cryovit", "UNET3D": "unet3d", "SAM2": "sam2", "MEDSAM": "medsam"},
        module="cryovit.types",
    )
    FakeModelType.__qualname__ = "ModelType"

    @dataclasses.dataclass
    class FakeSavedModel:
        name: str
        model_type: object
        label_key: str
        model_cfg: object
        weights: dict

    FakeSavedModel.__module__ = "cryovit.utils"
    FakeSavedModel.__qualname__ = "SavedModel"

    utils_mod.SavedModel = FakeSavedModel
    types_mod.ModelType = FakeModelType
    cryovit_mod.utils = utils_mod
    cryovit_mod.types = types_mod
    sys.modules.update(
        {"cryovit": cryovit_mod, "cryovit.utils": utils_mod, "cryovit.types": types_mod}
    )
    try:
        artifact = FakeSavedModel(
            name=name,
            model_type=FakeModelType(model_type_value),
            label_key=label_key,
            model_cfg=None,
            weights=state_dict,
        )
        with open(path, "wb") as f:
            pickle.dump(artifact, f)
    finally:
        for mod in ("cryovit", "cryovit.utils", "cryovit.types"):
            sys.modules.pop(mod, None)


# ---- tests ------------------------------------------------------------------

@pytest.fixture(scope="module")
def torch_cryovit():
    torch.manual_seed(7)
    return _RefCryoVIT().eval()


@pytest.fixture(scope="module")
def torch_unet():
    torch.manual_seed(8)
    return _RefUNet3D().eval()


def test_cryovit_conversion_structure_and_parity(torch_cryovit, rng):
    sd = {k: v.detach().numpy() for k, v in torch_cryovit.state_dict().items()}
    assert infer_model_type(sd) == ModelType.CRYOVIT
    variables, mt = convert_state_dict(sd)
    assert mt == ModelType.CRYOVIT

    fmodel = CryoVITModule(dtype=jnp.float32)
    expected = jax.eval_shape(
        fmodel.init, jax.random.key(0), jnp.zeros((1, 2, 2, 2, 1536))
    )
    assert _tree_paths(variables) == _tree_paths(expected)

    feats = rng.standard_normal((1, 2, 2, 3, 1536)).astype(np.float32) * 0.3
    out_flax = np.asarray(fmodel.apply(variables, jnp.asarray(feats)))
    with torch.no_grad():
        out_torch = torch_cryovit(
            torch.from_numpy(feats.transpose(0, 4, 1, 2, 3))
        ).numpy()
    np.testing.assert_allclose(out_flax, out_torch, atol=5e-5)


def test_unet3d_conversion_structure_and_parity(torch_unet, rng):
    sd = {k: v.detach().numpy() for k, v in torch_unet.state_dict().items()}
    assert infer_model_type(sd) == ModelType.UNET3D
    variables, mt = convert_state_dict(sd)
    assert mt == ModelType.UNET3D

    fmodel = UNet3DModule(dtype=jnp.float32)
    expected = jax.eval_shape(
        fmodel.init, jax.random.key(0), jnp.zeros((1, 16, 16, 16, 1))
    )
    assert _tree_paths(variables) == _tree_paths(expected)

    vol = rng.standard_normal((1, 16, 16, 32, 1)).astype(np.float32)
    out_flax = np.asarray(fmodel.apply(variables, jnp.asarray(vol)))
    with torch.no_grad():
        out_torch = torch_unet(
            torch.from_numpy(vol.transpose(0, 4, 1, 2, 3))
        ).numpy()
    np.testing.assert_allclose(out_flax, out_torch, atol=1e-4)


def test_reference_model_pickle_roundtrip(torch_cryovit, tmp_path, rng):
    """A reference `.model` (torch state dict, cryovit.* classes) loads via
    load_model and produces the torch model's predictions."""
    path = tmp_path / "mito.model"
    _write_reference_pickle(
        path, "mito_model", "cryovit", "mito", torch_cryovit.state_dict()
    )

    name, mt, label_key, sd = load_reference_model(path)
    assert (name, mt, label_key) == ("mito_model", ModelType.CRYOVIT, "mito")

    model, variables, mt2, name2, lk2 = load_model(path)
    assert (mt2, name2, lk2) == (ModelType.CRYOVIT, "mito_model", "mito")
    assert model is not None and variables is not None

    feats = rng.standard_normal((1, 2, 2, 2, 1536)).astype(np.float32) * 0.3
    out_flax = np.asarray(model.apply(variables, jnp.asarray(feats)))
    with torch.no_grad():
        out_torch = torch_cryovit(
            torch.from_numpy(feats.transpose(0, 4, 1, 2, 3))
        ).numpy()
    np.testing.assert_allclose(out_flax, out_torch, atol=5e-5)


def test_reference_model_metadata_only(torch_cryovit, tmp_path):
    path = tmp_path / "meta.model"
    _write_reference_pickle(
        path, "m", "cryovit", "cristae", torch_cryovit.state_dict()
    )
    model, variables, mt, name, lk = load_model(path, load_weights_flag=False)
    assert model is None and variables is None
    assert (mt, name, lk) == (ModelType.CRYOVIT, "m", "cristae")


def test_unet3d_training_trajectory_parity(torch_unet, tmp_path, rng):
    """Multi-epoch end-to-end parity for the SECOND model family: the jax
    Trainer + raw-voxel pipeline vs the reference-layout torch UNet3D on
    identical data (reference recipe: AdamW lr 3e-3 wd 1e-3, dice loss —
    configs/model/unet3d.yaml). Complements the CryoVIT trajectory test."""
    import h5py
    import optax  # noqa: F401

    from cryovit_tpu.config import compose
    from cryovit_tpu.models import UNet3D as UNet3DFamily
    from cryovit_tpu.models.losses import DiceLoss
    from cryovit_tpu.models.metrics import DiceMetric
    from cryovit_tpu.run.common import build_file_datamodule
    from cryovit_tpu.train.loop import Trainer

    d, s = 16, 32
    vol = (rng.random((d, s, s)) * 255).astype(np.uint8)
    label = rng.integers(0, 2, size=(d, s, s)).astype(np.int8)
    label[:3] = -1
    train_hdf = tmp_path / "train.hdf"
    with h5py.File(train_hdf, "w") as f:
        f.create_dataset("data", data=vol)
        f.create_dataset("labels/mito", data=label)
    labels_hdf = tmp_path / "labels.hdf"
    with h5py.File(labels_hdf, "w") as f:
        f.create_dataset("mito", data=label)

    cfg = compose(
        "train_model",
        ["model=unet3d", "datamodule=file", "label_key=mito",
         f"paths.exp_dir={tmp_path}", "name=parity"],
    )
    datamodule = build_file_datamodule(
        cfg, data_paths=[train_hdf], data_labels=[labels_hdf], labels=["mito"]
    )

    torch.manual_seed(5)
    tmodel = _RefUNet3D()
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    variables, _ = convert_state_dict(sd)
    variables = jax.tree_util.tree_map(jnp.asarray, variables)

    lr, wd, epochs = 3e-3, 1e-3, 4
    model = UNet3DFamily(
        name="UNet3D", input_key="data", lr=lr, weight_decay=wd,
        losses={"dice_loss": DiceLoss()},
        metrics={"dice_metric": DiceMetric(0.5)},
        dtype=jnp.float32,
    )

    class Rec:
        def __init__(self):
            self.history = []

        def log_scalars(self, scalars, step):
            self.history.append(dict(scalars, step=step))

    rec = Rec()
    trainer = Trainer(
        precision="f32", max_epochs=epochs, loggers=[rec], donate_state=False
    )
    state = trainer.fit(model, datamodule, variables=variables)
    jax_loss = [h["train_dice_loss"] for h in rec.history if "train_dice_loss" in h]
    assert len(jax_loss) == epochs

    batch, _ = next(iter(datamodule.train_loader()))
    np_vol = np.asarray(batch.data)  # (1, D, H, W, 1) normalized by pipeline
    np_label = np.asarray(batch.label)
    tvol = torch.from_numpy(np_vol.transpose(0, 4, 1, 2, 3).astype(np.float32))
    tlabel = torch.from_numpy(np_label.astype(np.float32))
    tmask = (tlabel > -1).float()

    topt = torch.optim.AdamW(tmodel.parameters(), lr=lr, weight_decay=wd)
    torch_loss = []
    for _ in range(epochs):
        topt.zero_grad()
        pred = tmodel(tvol)
        yt, yp = tlabel * tmask, pred * tmask
        loss = 1 - 2 * (yt * yp).sum() / (yt.sum() + yp.sum() + 1e-3)
        loss.backward()
        topt.step()
        torch_loss.append(float(loss.detach()))

    np.testing.assert_allclose(jax_loss, torch_loss, atol=2e-3)
    # final predictions track
    with torch.no_grad():
        torch_final = tmodel(tvol).numpy()
    jax_final = np.asarray(model.apply(state.params, jnp.asarray(np_vol)))
    agree = np.mean((jax_final >= 0.5) == (torch_final >= 0.5))
    assert agree > 0.99


def test_weights_pt_import(torch_unet, tmp_path):
    """A torch.save-d weights.pt converts through load_weights."""
    path = tmp_path / "weights.pt"
    torch.save(torch_unet.state_dict(), path)
    variables = load_weights(path)
    fmodel = UNet3DModule(dtype=jnp.float32)
    expected = jax.eval_shape(
        fmodel.init, jax.random.key(0), jnp.zeros((1, 16, 16, 16, 1))
    )
    assert _tree_paths(variables) == _tree_paths(expected)


def test_lightning_ckpt_import(torch_cryovit, tmp_path, rng):
    """A reference-style Lightning `last.ckpt` fine-tune checkpoint
    (state dict under `state_dict`, torchmetrics buffers, torch.compile
    `_orig_mod.` wrapping) imports through load_weights (reference accepts
    `.ckpt` at run/train_model.py:107-130)."""
    inner = {
        f"_orig_mod.{k}": v for k, v in torch_cryovit.state_dict().items()
    }
    # torchmetrics buffers that a real BaseModel checkpoint carries
    inner["metric_fns.TRAIN.dice_metric.dice"] = torch.zeros(())
    inner["metric_fns.VAL.dice_metric.total"] = torch.zeros(())
    ckpt = {
        "epoch": 49,
        "global_step": 500,
        "pytorch-lightning_version": "2.5.2",
        "state_dict": inner,
        "loops": {},
    }
    path = tmp_path / "last.ckpt"
    torch.save(ckpt, path)

    variables = load_weights(path)
    fmodel = CryoVITModule(dtype=jnp.float32)
    expected = jax.eval_shape(
        fmodel.init, jax.random.key(0), jnp.zeros((1, 2, 2, 2, 1536))
    )
    assert _tree_paths(variables) == _tree_paths(expected)

    feats = rng.standard_normal((1, 2, 2, 2, 1536)).astype(np.float32) * 0.3
    out_flax = np.asarray(fmodel.apply(variables, jnp.asarray(feats)))
    with torch.no_grad():
        out_torch = torch_cryovit(
            torch.from_numpy(feats.transpose(0, 4, 1, 2, 3))
        ).numpy()
    np.testing.assert_allclose(out_flax, out_torch, atol=5e-5)


def test_lightning_ckpt_model_prefix_unwrap(torch_unet, tmp_path):
    """SAM2-style LightningModules nest the network under `self.model`
    (reference models/sam2.py:63) — a uniform `model.` prefix is stripped."""
    inner = {f"model.{k}": v for k, v in torch_unet.state_dict().items()}
    ckpt = {"state_dict": inner, "epoch": 0}
    path = tmp_path / "nested.ckpt"
    torch.save(ckpt, path)
    variables = load_weights(path)
    fmodel = UNet3DModule(dtype=jnp.float32)
    expected = jax.eval_shape(
        fmodel.init, jax.random.key(0), jnp.zeros((1, 16, 16, 16, 1))
    )
    assert _tree_paths(variables) == _tree_paths(expected)
