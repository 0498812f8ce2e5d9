"""Tests for the feature-extraction runner (tiny model, CPU)."""

import h5py
import numpy as np
import pandas as pd
import pytest

import jax
import jax.numpy as jnp

from cryovit_tpu.config import compose
from cryovit_tpu.io import write_hdf
from cryovit_tpu.models.dinov2 import DinoV2Config, make_dinov2
from cryovit_tpu.run.dino_features import (
    DinoExtractor,
    run_trainer,
    save_feature_hdf,
)


@pytest.fixture(scope="module")
def tiny_variables():
    cfg = DinoV2Config.tiny_test()
    model = make_dinov2(cfg, use_flash_attention=False)
    import jax.numpy as jnp

    return cfg, model.init(jax.random.key(0), jnp.zeros((1, 28, 28)))


def test_extractor_output_layout(tiny_variables, rng):
    cfg, variables = tiny_variables
    extractor = DinoExtractor(variables, cfg=cfg, batch_size=4)
    stack = rng.random((6, 32, 48)).astype(np.float32)  # multiples of 16
    feats = extractor.extract(stack)
    # (C, D, H/16, W/16) fp16 — reference file layout
    assert feats.shape == (cfg.embed_dim, 6, 2, 3)
    assert feats.dtype == np.float16
    assert np.isfinite(feats).all()


def test_extractor_uint8_device_normalization(tiny_variables, rng):
    """uint8 stacks transfer raw (4× less H2D) and normalize on device —
    features must equal the host-normalized f32 path exactly."""
    cfg, variables = tiny_variables
    extractor = DinoExtractor(variables, cfg=cfg, batch_size=4)
    raw = rng.integers(0, 256, size=(4, 32, 32)).astype(np.uint8)
    f_u8 = extractor.extract(raw)
    f_f32 = extractor.extract(raw.astype(np.float32) / 255.0)
    np.testing.assert_allclose(f_u8, f_f32, atol=1e-3)


def test_fused_uint8_matches_f32(tiny_variables, rng):
    from cryovit_tpu.models.cryovit import CryoVITModule
    from cryovit_tpu.models.fused import FusedDinoCryoVIT

    cfg, variables = tiny_variables
    dec = CryoVITModule(dtype=jnp.float32)
    decv = dec.init(
        jax.random.key(1), jnp.zeros((1, 2, 2, 2, cfg.embed_dim))
    )
    pipe = FusedDinoCryoVIT(
        variables, decv, dino_cfg=cfg, dtype=jnp.float32, slice_batch=4
    )
    raw = rng.integers(0, 256, size=(4, 32, 32)).astype(np.uint8)
    p_u8 = np.asarray(pipe.segment(raw))
    p_f32 = np.asarray(pipe.segment(raw.astype(np.float32) / 255.0))
    np.testing.assert_allclose(p_u8, p_f32, atol=1e-5)


def test_extractor_tail_batch_consistency(tiny_variables, rng):
    """Padding the tail batch must not change feature values."""
    cfg, variables = tiny_variables
    stack = rng.random((5, 32, 32)).astype(np.float32)
    full = DinoExtractor(variables, cfg=cfg, batch_size=5).extract(stack)
    tail = DinoExtractor(variables, cfg=cfg, batch_size=3).extract(stack)
    np.testing.assert_allclose(full, tail, atol=2e-3)


def test_save_feature_hdf_layout(tmp_path, rng):
    source = {
        "data": rng.integers(0, 255, size=(4, 32, 32), dtype=np.uint8),
        "mito": rng.integers(0, 2, size=(4, 32, 32)).astype(np.int8),
    }
    feats = rng.standard_normal((8, 4, 2, 2)).astype(np.float16)
    path = save_feature_hdf(source, feats, "t.hdf", tmp_path)
    with h5py.File(path) as f:
        assert f["data"].compression == "gzip"
        assert f["labels/mito"].compression == "gzip"
        assert f["dino_features"].compression is None
        assert f["dino_features"].dtype == np.float16


def test_run_trainer_experiment_sweep(tmp_path, rng, tiny_variables, monkeypatch):
    """Experiment driver: data_dir/dino_features/<sample> → data_dir/tomograms."""
    cfg_tiny, variables = tiny_variables
    data_dir = tmp_path / "data"
    src = data_dir / "dino_features" / "AD"
    for i in range(2):
        write_hdf(
            src / f"t{i}.hdf",
            {
                "data": rng.integers(0, 255, size=(3, 32, 32), dtype=np.uint8),
                "labels/mito": rng.integers(0, 2, size=(3, 32, 32)).astype(np.int8),
            },
        )
    # per-sample csv limiting to one tomogram
    (data_dir / "csv").mkdir(parents=True)
    pd.DataFrame({"tomo_name": ["t0.hdf"]}).to_csv(data_dir / "csv" / "AD.csv", index=False)

    import cryovit_tpu.run.dino_features as df_mod

    monkeypatch.setattr(
        df_mod, "load_dinov2_variables", lambda *a, **k: (variables, True)
    )
    cfg = compose(
        "dino_features",
        [f"paths.data_dir={data_dir}", "batch_size=2", "sample=AD"],
    )
    run_trainer(cfg, dino_cfg=cfg_tiny)

    out = data_dir / "tomograms" / "AD" / "t0.hdf"
    assert out.exists()
    with h5py.File(out) as f:
        assert set(f.keys()) == {"data", "dino_features", "labels"}
        assert f["dino_features"].shape == (cfg_tiny.embed_dim, 3, 2, 2)
        assert "mito" in f["labels"]
    # t1 not in csv → not processed
    assert not (data_dir / "tomograms" / "AD" / "t1.hdf").exists()


def test_fused_pipeline_matches_two_step(tiny_variables, rng):
    """Fused raw→probs must equal extract-features-then-decode (within fp16)."""
    import jax
    import jax.numpy as jnp

    from cryovit_tpu.models.cryovit import CryoVITModule
    from cryovit_tpu.models.fused import FusedDinoCryoVIT

    cfg, dino_vars = tiny_variables
    stack = rng.random((5, 32, 32)).astype(np.float32)

    # two-step: extract (fp16 file dtype) then decode
    extractor = DinoExtractor(dino_vars, cfg=cfg, batch_size=4)
    feats = extractor.extract(stack)  # (C, D, gh, gw) fp16
    feats_cl = np.moveaxis(feats.astype(np.float32), 0, -1)[None]
    decoder = CryoVITModule(dtype=jnp.float32)
    # tiny embed dim ≠ 1536 — decoder projects whatever C it gets
    dec_vars = decoder.init(jax.random.key(1), jnp.asarray(feats_cl))
    two_step = decoder.apply(dec_vars, jnp.asarray(feats_cl))[0]

    fused = FusedDinoCryoVIT(
        dino_vars, dec_vars, dino_cfg=cfg, dtype=jnp.float32, slice_batch=2
    )
    out = fused.segment(stack)
    assert out.shape == two_step.shape == (5, 32, 32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(two_step), atol=5e-3)
