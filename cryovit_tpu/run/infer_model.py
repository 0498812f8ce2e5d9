"""Inference runner (reference ``run/infer_model.py``)."""

from __future__ import annotations

import logging
from pathlib import Path

from cryovit_tpu.callbacks import PredictionWriter
from cryovit_tpu.config import compose
from cryovit_tpu.run.common import build_file_datamodule, build_trainer
from cryovit_tpu.train.checkpoint import load_model

logger = logging.getLogger(__name__)

__all__ = ["run_inference"]


def run_inference(
    data: list[Path],
    model_path: Path,
    result_dir: Path,
    threshold: float = 0.5,
    fused: bool = False,
    quant_int8: bool = False,
    **overrides: object,
) -> list[Path]:
    """Segment tomograms with a ``.model`` artifact → thresholded uint8
    HDF5s (reference ``run/infer_model.py:18-85``).

    ``fused=True`` (CryoVIT models only) runs the fused DINOv2→decoder
    pipeline directly on RAW tomograms — no separate ``cryovit features``
    step or feature files needed (the north-star streaming path).
    """
    result_dir = Path(result_dir)
    model, variables, model_type, model_name, label_key = load_model(model_path)
    if fused:
        if overrides:
            raise ValueError(
                f"config overrides are not supported with fused=True: {overrides}"
            )
        return _run_fused_inference(
            data, model, variables, label_key, result_dir, threshold,
            quant_int8=quant_int8,
        )

    if quant_int8:
        raise ValueError(
            "quant_int8 applies to the DINOv2 backbone and requires "
            "fused=True (file-based inference reads precomputed features)"
        )
    ov = [
        f"model={model_type.value}",
        f"label_key={label_key}",
        f"name={model_name}",
        f"paths.exp_dir={result_dir}",
    ] + [f"{k}={v}" for k, v in overrides.items()]
    cfg = compose("infer_model", ov)

    datamodule = build_file_datamodule(cfg, data_paths=data)
    writer = PredictionWriter(
        results_dir=result_dir, label_key=label_key, threshold=threshold
    )
    trainer = build_trainer(cfg, extra_callbacks=[writer])
    trainer.predict(model, variables, datamodule)
    logger.info("wrote %d segmentations under %s", len(writer.result_paths), result_dir)
    return writer.result_paths


def _run_fused_inference(
    data: list[Path],
    model,
    decoder_variables,
    label_key: str,
    result_dir: Path,
    threshold: float,
    dino_cfg=None,
    dino_variables=None,
    quant_int8: bool = False,
) -> list[Path]:
    """Raw tomograms → fused ViT+decoder → thresholded segmentations."""
    import numpy as np

    from cryovit_tpu.callbacks import PredictionWriter
    from cryovit_tpu.config import compose
    from cryovit_tpu.data.transforms import pad_slices_to_multiple
    from cryovit_tpu.io import load_data
    from cryovit_tpu.models.fused import FusedDinoCryoVIT
    from cryovit_tpu.run.dino_features import load_dinov2_variables
    from cryovit_tpu.types import BatchedModelResult, ModelType

    if model.model_type != ModelType.CRYOVIT:
        raise ValueError(
            "fused inference streams DINOv2 features into the CryoVIT "
            f"decoder; got model type {model.model_type.value!r}"
        )
    if dino_variables is None:
        cfg = compose("dino_features")
        dino_variables, _ = load_dinov2_variables(cfg.model_dir, cfg=dino_cfg)
    fused = FusedDinoCryoVIT(
        dino_variables, decoder_variables, dino_cfg=dino_cfg,
        quant_int8=quant_int8,
    )
    writer = PredictionWriter(
        results_dir=result_dir, label_key=label_key, threshold=threshold
    )
    for path in data:
        raw, _ = load_data(Path(path), key="data")
        stack = pad_slices_to_multiple(raw[0].astype(np.float32))
        probs = np.asarray(fused.segment(stack))
        d, h, w = raw[0].shape
        result = BatchedModelResult(
            batch_size=1,
            samples=[Path(path).parent.name],
            tomo_names=[Path(path).name],
            split_id=[None],
            data=[raw[0]],
            label=[np.zeros_like(raw[0], dtype=np.int8)],
            preds=[probs[:d, :h, :w]],
            losses={},
            metrics={},
        )
        writer.on_predict_batch_end(result)
    logger.info("fused inference wrote %d segmentations", len(writer.result_paths))
    return writer.result_paths
