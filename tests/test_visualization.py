"""Tests for analysis/figure generation on synthetic results."""

import numpy as np
import pandas as pd
import pytest

from cryovit_tpu.visualization import (
    compute_stats,
    export_pca,
    merge_experiments,
    process_fractional_experiment,
    process_single_experiment,
    significance_test,
)


@pytest.fixture
def results_tree(tmp_path, rng):
    """exp_dir/<exp_name>/<sample>.csv trees for two models."""
    samples = ["AD", "Young"]
    tomos = [f"t{i}.hdf" for i in range(6)]
    for model in ("cryovit", "unet3d"):
        for sample in samples:
            rows = [
                {
                    "sample": sample,
                    "tomo_name": t,
                    "dice_metric": float(
                        np.clip(rng.normal(0.8 if model == "cryovit" else 0.6, 0.05), 0, 1)
                    ),
                    "f1_metric": 0.7,
                    "split_id": i % 3 + 1,
                }
                for i, t in enumerate(tomos)
            ]
            d = tmp_path / f"single_test_{model}_mito"
            d.mkdir(exist_ok=True)
            pd.DataFrame(rows).to_csv(d / f"{sample}.csv", index=False)
    return tmp_path


def test_merge_experiments(results_tree):
    df = merge_experiments(
        results_tree,
        {"single_test_cryovit_mito": ["CryoViT"], "single_test_unet3d_mito": ["3D U-Net"]},
    )
    assert set(df["model"]) == {"CryoViT", "3D U-Net"}
    assert len(df) == 24
    # combined per-experiment csv written
    assert (results_tree / "single_test_cryovit_mito.csv").exists()


def test_significance_test_detects_difference(results_tree):
    df = merge_experiments(
        results_tree,
        {"single_test_cryovit_mito": ["CryoViT"], "single_test_unet3d_mito": ["3D U-Net"]},
    )
    p = significance_test(df, "CryoViT", "3D U-Net")
    assert p < 0.01  # clearly separated synthetic distributions
    with pytest.raises(ValueError, match="Unknown test"):
        significance_test(df, "CryoViT", "3D U-Net", test_fn="bogus")


def test_compute_stats_table(results_tree, tmp_path):
    import functools

    df = merge_experiments(
        results_tree,
        {"single_test_cryovit_mito": ["CryoViT"], "single_test_unet3d_mito": ["3D U-Net"]},
    )
    out = tmp_path / "stats.csv"
    test_fn = functools.partial(significance_test, model_A="CryoViT", model_B="3D U-Net")
    pvalues = compute_stats(df, ["sample", "model"], str(out), test_fn)
    assert out.exists()
    table = pd.read_csv(out)
    assert "p-value" in table.columns
    assert len(pvalues) == 2  # one per sample


def test_process_single_experiment_writes_figures(results_tree, tmp_path):
    out = tmp_path / "figs"
    process_single_experiment(
        "single",
        "test",
        {
            "Test": {
                "single_test_cryovit_mito": ["CryoVIT", "Test"],
                "single_test_unet3d_mito": ["3D U-Net", "Test"],
            }
        },
        results_tree,
        out,
    )
    assert (out / "test_single.png").exists()
    assert (out / "test_single.svg").exists()


def test_process_fractional_experiment(results_tree, tmp_path):
    out = tmp_path / "frac"
    process_fractional_experiment(
        "fractional",
        "test",
        {"Mito": {"single_test_cryovit_mito": ["CryoVIT"]}},
        results_tree,
        out,
    )
    assert (out / "mito_fractional.png").exists()


def test_export_pca(tmp_path, rng):
    data = rng.random((12, 32, 32)).astype(np.float32)
    feats = rng.standard_normal((16, 12, 2, 2)).astype(np.float16)
    export_pca(data, feats, "tomo", tmp_path)
    pngs = list((tmp_path / "tomo").glob("*.png"))
    assert len(pngs) == 2  # slices 0 and 10
    from PIL import Image

    img = Image.open(pngs[0])
    assert img.size == (2 * 32, 32)  # side-by-side raw | pca at voxel res


def test_segmentation_video(tmp_path, rng):
    import h5py

    from cryovit_tpu.visualization.segmentations import process_experiment

    pred_dir = tmp_path / "predictions" / "run" / "AD"
    pred_dir.mkdir(parents=True)
    with h5py.File(pred_dir / "t0.hdf", "w") as f:
        f.create_dataset("data", data=rng.random((4, 32, 32)).astype(np.float32))
        f.create_dataset("mito_preds", data=rng.integers(0, 2, size=(4, 32, 32)).astype(np.uint8))
    videos = process_experiment(tmp_path / "predictions", tmp_path / "videos")
    assert len(videos) == 1
    assert videos[0].exists() and videos[0].suffix == ".mp4"


def test_visualize_results_cli_dispatch(tmp_path, rng):
    """dino_pca dispatch through the module entry point."""
    import h5py

    from cryovit_tpu.training.visualize_results import main

    tomo_dir = tmp_path / "exp" / "AD"
    tomo_dir.mkdir(parents=True)
    with h5py.File(tomo_dir / "t0.hdf", "w") as f:
        f.create_dataset("data", data=rng.integers(0, 255, (4, 32, 32), dtype=np.uint8))
        f.create_dataset(
            "dino_features", data=rng.standard_normal((16, 4, 2, 2)).astype(np.float16)
        )
    rc = main(
        [
            "--exp_type", "dino_pca",
            "--exp_dir", str(tmp_path / "exp"),
            "--result_dir", str(tmp_path / "out"),
        ]
    )
    assert rc == 0
    assert list((tmp_path / "out").rglob("*.png"))
