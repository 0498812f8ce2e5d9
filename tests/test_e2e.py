"""End-to-end smoke tests: train → eval → infer on synthetic tomograms.

This is the port of the reference smoke-sweep
(``configs/experiments/test_experiment.yaml``: run everything once briefly)
onto synthetic data, exercising L0–L5 of the stack.
"""

import numpy as np
import pandas as pd
import pytest

from cryovit_tpu.composer import DotDict
from cryovit_tpu.config import compose
from cryovit_tpu.io import write_hdf
from cryovit_tpu.run.eval_model import run_trainer as eval_trainer
from cryovit_tpu.run.train_model import run_trainer as train_trainer
from cryovit_tpu.run import run_evaluation, run_inference, run_training

from conftest import make_synthetic_tomogram


@pytest.fixture
def experiment_env(tmp_path, rng):
    """Reference data_dir layout: tomograms/<sample>/*.hdf + csv/splits.csv."""
    data_dir = tmp_path / "data"
    rows = []
    for sample in ("AD", "Young"):
        for i in range(4):
            name = f"t{i}.hdf"
            write_hdf(
                data_dir / "tomograms" / sample / name,
                make_synthetic_tomogram(rng, depth=4, side=32),
            )
            rows.append({"sample": sample, "tomo_name": name, "split_id": i % 2})
    (data_dir / "csv").mkdir(parents=True)
    pd.DataFrame(rows).to_csv(data_dir / "csv" / "splits.csv", index=False)
    return data_dir


def _exp_cfg(data_dir, tmp_path, model="cryovit", extra=()):
    return compose(
        "train_model",
        [
            f"model={model}",
            "datamodule=single",
            "label_key=mito",
            "datamodule.sample=AD",
            "datamodule.split_id=1",
            "datamodule.test_sample=Young",
            "trainer.max_epochs=2",
            "trainer.precision=f32",
            f"paths.data_dir={data_dir}",
            f"paths.exp_dir={tmp_path / 'results'}",
            "logger={}",
            *extra,
        ],
    )


def test_experiment_train_then_eval_cryovit(experiment_env, tmp_path):
    data_dir = experiment_env
    cfg = _exp_cfg(data_dir, tmp_path)
    exp_dir = train_trainer(cfg)
    assert (exp_dir / "weights.msgpack").exists()
    assert exp_dir.name == "split_1"  # exp layout: name/sample/split_k/test_X

    eval_cfg = compose(
        "eval_model",
        [
            "model=cryovit",
            "datamodule=single",
            "label_key=mito",
            "datamodule.sample=AD",
            "datamodule.split_id=1",
            "datamodule.test_sample=Young",
            f"paths.data_dir={data_dir}",
            f"paths.exp_dir={tmp_path / 'results'}",
            "name=" + str(cfg.name),
        ],
    )
    results = eval_trainer(eval_cfg)
    assert len(results) == 4  # all Young tomograms
    for r in results:
        assert 0.0 <= r.metrics["dice_metric"] <= 1.0
        assert r.preds[0].shape == (4, 32, 32)  # unpadded to true shape

    # CsvWriter output: per-sample CSV with replace-on-rerun
    csv_dir = tmp_path / "results" / "results" / str(eval_cfg.name)
    csvs = list(csv_dir.glob("*.csv"))
    assert len(csvs) == 1
    df = pd.read_csv(csvs[0])
    assert len(df) == 4
    assert {"sample", "tomo_name", "dice_metric", "f1_metric"} <= set(df.columns)

    # TestPredictionWriter output layout
    pred_dir = tmp_path / "results" / "predictions" / str(eval_cfg.name)
    preds = list(pred_dir.rglob("*.hdf"))
    assert len(preds) == 4
    import h5py

    with h5py.File(preds[0]) as f:
        assert {"data", "mito", "mito_preds"} <= set(f.keys())

    # rerun eval → rows replaced, not duplicated
    eval_trainer(eval_cfg)
    assert len(pd.read_csv(csvs[0])) == 4


def test_experiment_unet3d_one_epoch(experiment_env, tmp_path):
    cfg = _exp_cfg(experiment_env, tmp_path, model="unet3d", extra=("trainer.max_epochs=1",))
    exp_dir = train_trainer(cfg)
    assert (exp_dir / "weights.msgpack").exists()


def test_cli_train_evaluate_infer_roundtrip(tmp_path, rng):
    # two annotated tomograms as separate data + label files
    data_paths, label_paths = [], []
    for i in range(2):
        d = make_synthetic_tomogram(rng, depth=4, side=32)
        dp = tmp_path / f"tomo{i}.hdf"
        lp = tmp_path / f"label{i}.hdf"
        write_hdf(dp, {"data": d["data"], "dino_features": d["dino_features"]})
        write_hdf(lp, {"mito": d["labels/mito"]})
        data_paths.append(dp)
        label_paths.append(lp)

    out = tmp_path / "out"
    model_path = run_training(
        train_data=data_paths,
        train_labels=label_paths,
        labels=["mito"],
        label_key="mito",
        model_name="smoke",
        result_dir=out,
        num_epochs=1,
        **{"trainer.precision": "f32"},
    )
    assert model_path.exists() and model_path.suffix == ".model"

    csv_dir = run_evaluation(
        test_data=data_paths,
        test_labels=label_paths,
        labels=["mito"],
        model_path=model_path,
        result_dir=out / "eval",
        visualize=False,
        **{"trainer.precision": "f32"},
    )
    csvs = list(csv_dir.glob("*.csv"))
    assert csvs, f"no metrics csv under {csv_dir}"

    written = run_inference(
        data=data_paths,
        model_path=model_path,
        result_dir=out / "infer",
        threshold=0.5,
        **{"trainer.precision": "f32"},
    )
    assert len(written) == 2
    import h5py

    with h5py.File(written[0]) as f:
        segs = np.asarray(f["mito_preds"])
        assert segs.dtype == np.uint8
        assert set(np.unique(segs)) <= {0, 1}


def test_swa_kicks_in(experiment_env, tmp_path):
    """SWA averages the last 20% of epochs (reference SWA config)."""
    from cryovit_tpu.train.swa import StochasticWeightAveraging

    swa = StochasticWeightAveraging(swa_epoch_start=0.5)
    assert swa.start_epoch(10) == 5
    import jax.numpy as jnp

    p1 = {"w": jnp.asarray(1.0)}
    p2 = {"w": jnp.asarray(3.0)}
    for epoch, params in [(4, p1), (5, p1), (6, p2)]:
        swa.on_train_epoch_end(epoch, 10, params)
    out = swa.on_fit_end({"w": jnp.asarray(99.0)})
    assert float(out["w"]) == 2.0  # mean of p1, p2 (epoch 4 before window)


def test_save_model_from_weights_roundtrip(tmp_path, rng):
    """Build a .model artifact from a raw weights file (reference
    utils.py:384-428)."""
    import jax
    import jax.numpy as jnp

    from cryovit_tpu.composer import instantiate
    from cryovit_tpu.config import compose
    from cryovit_tpu.train.checkpoint import (
        load_model,
        save_model_from_weights,
        save_weights,
    )
    from cryovit_tpu.types import ModelType

    cfg = compose("train_model", ["model=cryovit", "datamodule=single", "label_key=mito"])
    model = instantiate(cfg.model)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 2, 2, 2, 1536)))
    wpath = tmp_path / "weights.msgpack"
    save_weights(wpath, variables)

    mpath = tmp_path / "rebuilt.model"
    save_model_from_weights("rebuilt", "mito", ModelType.CRYOVIT, wpath, mpath)
    loaded, lvars, mtype, name, label_key = load_model(mpath)
    assert mtype == ModelType.CRYOVIT and name == "rebuilt" and label_key == "mito"
    x = jnp.asarray(rng.standard_normal((1, 2, 2, 2, 1536)), dtype=jnp.float32)
    np.testing.assert_allclose(
        np.asarray(loaded.apply(lvars, x)), np.asarray(model.apply(variables, x)), atol=1e-6
    )


def test_swa_does_not_alias_live_params():
    """SWA must deep-copy on first store: the live TrainState buffers get
    donated by the next jitted train step (regression test)."""
    import jax.numpy as jnp

    from cryovit_tpu.train.swa import StochasticWeightAveraging

    swa = StochasticWeightAveraging(swa_epoch_start=0.5)
    params = {"w": jnp.ones((4,))}
    swa.on_train_epoch_end(5, 10, params)
    assert swa.swa_params["w"] is not params["w"]
    assert swa.swa_params["w"].unsafe_buffer_pointer() != params["w"].unsafe_buffer_pointer()


def test_swa_with_donation_multi_epoch(experiment_env, tmp_path):
    """Fit with SWA active across several donated steps must not crash."""
    cfg = _exp_cfg(
        experiment_env, tmp_path,
        extra=("trainer.max_epochs=4",),
    )
    exp_dir = train_trainer(cfg)
    assert (exp_dir / "weights.msgpack").exists()


def test_fused_inference_on_raw_tomograms(tmp_path, rng, monkeypatch):
    """`run_inference(fused=True)`: raw tomograms → masks without feature files."""
    import jax
    import jax.numpy as jnp

    from cryovit_tpu.models.dinov2 import DinoV2Config, make_dinov2
    from cryovit_tpu.run.infer_model import run_inference
    from cryovit_tpu.run.train_model import run_training
    from cryovit_tpu.io import write_mrc

    # a trained tiny cryovit .model (trained on matching tiny-dino features)
    cfg_tiny = DinoV2Config.tiny_test()
    dino = make_dinov2(cfg_tiny, use_flash_attention=False)
    dino_vars = dino.init(jax.random.key(0), jnp.zeros((1, 28, 28)))

    d = make_synthetic_tomogram(rng, depth=4, side=32, feature_dim=cfg_tiny.embed_dim)
    dp, lp = tmp_path / "t.hdf", tmp_path / "l.hdf"
    write_hdf(dp, {"data": d["data"], "dino_features": d["dino_features"]})
    write_hdf(lp, {"mito": d["labels/mito"]})
    model_path = run_training(
        [dp], [lp], ["mito"], "mito", "fusedtest", tmp_path / "out",
        num_epochs=1, **{"trainer.precision": "f32"},
    )

    # raw tomogram only (no features inside)
    raw = tmp_path / "raw.mrc"
    write_mrc(raw, rng.integers(0, 255, size=(4, 32, 32)).astype(np.int16))

    # drive the fused path with an explicit tiny backbone (the public
    # run_inference(fused=True) resolves the giant backbone from config)
    from cryovit_tpu.run.infer_model import _run_fused_inference
    from cryovit_tpu.train.checkpoint import load_model

    model, variables, *_ = load_model(model_path)
    written = _run_fused_inference(
        [raw], model, variables, "mito",
        tmp_path / "fused_out", 0.5, dino_cfg=cfg_tiny, dino_variables=dino_vars,
    )
    assert len(written) == 1
    import h5py

    with h5py.File(written[0]) as f:
        segs = np.asarray(f["mito_preds"])
        assert segs.shape == (4, 32, 32)
        assert segs.dtype == np.uint8


def test_mito_mask_applies_at_test_only(experiment_env, tmp_path, rng):
    """additional_keys=[labels/mito] gates test metrics by the ground-truth
    mito mask (reference base_model.py:91-112 + test_step), while fit-time
    validation ignores it."""
    data_dir = experiment_env
    cfg = _exp_cfg(data_dir, tmp_path, extra=("trainer.max_epochs=1",))
    train_trainer(cfg)

    base_overrides = [
        "model=cryovit", "datamodule=single", "label_key=mito",
        "datamodule.sample=AD", "datamodule.split_id=1",
        "datamodule.test_sample=Young",
        f"paths.data_dir={data_dir}", f"paths.exp_dir={tmp_path / 'results'}",
        "name=" + str(cfg.name),
    ]
    plain = eval_trainer(compose("eval_model", base_overrides))
    masked = eval_trainer(
        compose("eval_model", base_overrides + ["additional_keys=[data, labels/mito]"])
    )
    # the mito mask restricts the metric support → scores must differ
    d_plain = [r.metrics["dice_metric"] for r in plain]
    d_masked = [r.metrics["dice_metric"] for r in masked]
    assert d_plain != d_masked
    # and use_mito_mask=False disables it again (multi_granule experiment)
    disabled = eval_trainer(
        compose(
            "eval_model",
            base_overrides
            + ["additional_keys=[data, labels/mito]",
               "model.custom_kwargs={use_mito_mask: false}"],
        )
    )
    assert [r.metrics["dice_metric"] for r in disabled] == pytest.approx(d_plain, abs=1e-6)
