"""SAM2 image-encoder feature extraction (``sam_features`` path).

Parity target: reference ``_sam_features`` (``run/dino_features.py:67-106``)
and the ``sam_features`` entry point: run the (frozen) Hiera+FPN encoder
over every slice at 512² and store the multi-level ``backbone_fpn`` /
``vision_pos_enc`` pyramids as fp16 in the training-ready HDF5
(``sam_features/<key>/<level>`` datasets), so SAM2 training with
``use_cache_features=True`` skips the encoder.

File layout matches the reference: arrays are stored channels-first
``(D, C, h, w)`` like the torch pipeline writes them.
"""

from __future__ import annotations

import logging
from functools import partial
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from cryovit_tpu.composer import DotDict
from cryovit_tpu.config import samples as ALL_SAMPLES, tomogram_exts, validate_dino_config
from cryovit_tpu.models.sam2.config import SAM2Config
from cryovit_tpu.models.sam2.encoder import ImageEncoder
from cryovit_tpu.run.dino_features import _read_source, save_feature_hdf

logger = logging.getLogger(__name__)

__all__ = ["SamFeatureExtractor", "run_sam", "run_trainer"]


def _fold_rgb_patch_embed(variables):
    """Fold the 3-channel replication of grayscale slices into the patch
    embed: ``Σ_c W_c ⊛ x = (Σ_c W_c) ⊛ x`` (exact; the sum runs in f32
    before any compute-dtype cast). Kills the materialized
    ``(B, H, W, 3)`` repeat and shrinks the 7×7 patch conv 3× — same
    trick as the DINOv2 extractor (``models/dinov2.py:fold_patch_embed``)."""
    params = variables.get("params", variables)
    kernel = params["trunk"]["patch_embed"]["kernel"]
    if kernel.shape[2] == 1:
        return variables, False
    pe = dict(params["trunk"]["patch_embed"])
    pe["kernel"] = jnp.sum(kernel, axis=2, keepdims=True)
    trunk = dict(params["trunk"])
    trunk["patch_embed"] = pe
    new_params = dict(params)
    new_params["trunk"] = trunk
    if "params" in variables:
        out = dict(variables)
        out["params"] = new_params
        return out, True
    return new_params, True


def prequantize_trunk_int8(params) -> dict:
    """Build the ``qweights`` collection for the w8a8 mode: quantize every
    opted-in trunk projection kernel (``qkv`` / ``mlp_fc1``, see
    ``models/sam2/hiera.py:_Dense``) ONCE on the host. The trunk is frozen
    during extraction, so re-quantizing per batch inside the jitted forward
    was a recurring abs-max + round HBM pass over each (C, D) weight
    (advisor finding r3). Collection paths mirror the module tree."""
    from cryovit_tpu.ops.quant import int8_quant

    def walk(tree):
        out = {}
        for key, val in tree.items():
            if not isinstance(val, dict):
                continue
            if key in ("qkv", "mlp_fc1") and "kernel" in val:
                wq, sw = int8_quant(jnp.asarray(val["kernel"]), axis=0)
                out[key] = {"wq": wq, "sw": sw}
            else:
                sub = walk(val)
                if sub:
                    out[key] = sub
        return out

    return walk(params)


class SamFeatureExtractor:
    """Jit-compiled Hiera+FPN pyramid extractor over slice batches."""

    def __init__(
        self,
        variables,
        cfg: SAM2Config | None = None,
        batch_size: int = 24,
        dtype=jnp.bfloat16,
        quant_int8: bool = False,
        mesh=None,
    ) -> None:
        self.cfg = cfg or SAM2Config.large()
        # batch 24 is the measured throughput sweet spot on TPU v5e for
        # Hiera-L @512² (113.7 slices/s vs ~104 at 16/20/28/32, 101 at 64,
        # 99 at 128 — the encoder is HBM-layout-bound, bigger batches only
        # grow the intermediates). Callers (run_sam / configs) may override.
        # bf16 compute like the DINOv2 extractor and the SAM2 training
        # forward (models/sam2/model.py:81); fidelity vs f32 on the FPN
        # outputs: cosine ≥0.9999 per level.
        # quant_int8: opt-in w8a8 trunk projections (``--int8``), same
        # deal as the DINOv2 extractor's mode — measured in BASELINE.md.
        # mesh: shard the slice batch over the "data" axis via shard_map
        # (the DinoExtractor recipe — slices are embarrassingly parallel,
        # and inside shard_map each device traces its own unsharded
        # per-shard program, so the fused Pallas window-block kernels
        # survive multi-chip untouched; GSPMD cannot partition a
        # pallas_call).
        self.encoder = ImageEncoder(self.cfg, dtype=dtype, quant_int8=quant_int8)
        variables, self._rgb_folded = _fold_rgb_patch_embed(variables)
        if quant_int8 and "qweights" not in variables:
            variables = dict(variables)
            variables["qweights"] = prequantize_trunk_int8(
                variables.get("params", variables)
            )
        self.mesh = mesh
        if mesh is not None:
            from cryovit_tpu.parallel.mesh import batch_sharding, replicate

            self.sharding = batch_sharding(mesh)
            if batch_size % mesh.size:
                # shard_map needs equal per-device shards; the tail batch
                # pads up to batch_size anyway, so rounding up is free
                batch_size = -(-batch_size // mesh.size) * mesh.size
                logger.info("batch_size rounded up to %d (mesh of %d)",
                            batch_size, mesh.size)
            variables = replicate(variables, mesh)
        else:
            self.sharding = None
            variables = jax.device_put(variables)
        self.variables = variables
        self.batch_size = batch_size
        self._fn = None

    def _batch_fn(self):
        if self._fn is not None:
            return self._fn
        s = self.cfg.image_size

        def compute(variables, slices):  # (B, H, W) f32
            if slices.shape[1:] == (s, s):
                x = slices  # same-size resize is NOT free: XLA keeps the
                # identity gather/matmul pair unless we skip it here
            else:
                x = jax.image.resize(
                    slices, (slices.shape[0], s, s), method="linear"
                )
            if not self._rgb_folded:
                x = jnp.repeat(x[..., None], 3, axis=-1)
            out = self.encoder.apply(variables, x)
            # fp16, channels-first for file-layout parity
            return {
                "backbone_fpn": [
                    jnp.moveaxis(f, -1, 1).astype(jnp.float16)
                    for f in out["backbone_fpn"]
                ],
                "vision_pos_enc": [
                    jnp.moveaxis(p, -1, 1).astype(jnp.float16)
                    for p in out["vision_pos_enc"]
                ],
            }

        if self.mesh is not None:
            from jax.sharding import PartitionSpec as P

            fn = jax.jit(
                jax.shard_map(
                    compute,
                    mesh=self.mesh,
                    in_specs=(P(), P("data")),
                    out_specs=P("data"),
                    # pallas_call has no vma annotations; replication safety
                    # is by construction (params replicated, batch sharded)
                    check_vma=False,
                )
            )
        else:
            fn = jax.jit(compute)

        self._fn = partial(fn, self.variables)
        return self._fn

    def extract(self, stack: np.ndarray) -> dict[str, list[np.ndarray]]:
        """(D, H, W) f32 → dict of per-level (D, C, h, w) fp16 pyramids."""
        d = stack.shape[0]
        fn = self._batch_fn()
        bs = self.batch_size
        chunks: list[dict] = []
        for i in range(0, d, bs):
            batch = stack[i : i + bs]
            n = batch.shape[0]
            if n < bs:
                batch = np.concatenate(
                    [batch, np.zeros((bs - n, *batch.shape[1:]), batch.dtype)]
                )
            dev = (
                jax.device_put(jnp.asarray(batch), self.sharding)
                if self.sharding is not None
                else jnp.asarray(batch)
            )
            out = fn(dev)
            chunks.append(
                {
                    key: [np.asarray(level)[:n] for level in levels]
                    for key, levels in out.items()
                }
            )
        return {
            key: [
                np.concatenate([c[key][lvl] for c in chunks], axis=0)
                for lvl in range(len(chunks[0][key]))
            ]
            for key in chunks[0]
        }


def make_sam_encoder_variables(
    model_dir: str | Path,
    cfg: SAM2Config | None = None,
    random_init: bool = False,
):
    """Load converted SAM2 encoder weights, or random-init for testing."""
    cfg = cfg or SAM2Config.large()
    if random_init:
        logger.warning("using RANDOM SAM2 encoder weights")
        enc = ImageEncoder(cfg)
        probe = jnp.zeros((1, cfg.image_size, cfg.image_size, 3))
        return jax.jit(enc.init)(jax.random.key(0), probe)
    path = Path(model_dir) / "sam2_encoder.msgpack"
    if not path.exists():
        raise FileNotFoundError(
            f"SAM2 encoder weights not found at {path}. Convert once with "
            f"tools/convert_sam2.py"
        )
    from flax.serialization import msgpack_restore

    return msgpack_restore(path.read_bytes())


def run_sam(
    train_data: list[Path],
    result_dir: Path,
    batch_size: int = 64,
    random_init: bool = False,
    sam_cfg: SAM2Config | None = None,
    model_dir: str | Path | None = None,
    quant_int8: bool = False,
) -> list[Path]:
    """CLI path: extract SAM pyramids for explicit tomogram files."""
    from cryovit_tpu.config import compose
    from cryovit_tpu.io import load_data

    if model_dir is None:
        # resolve paths.model_dir/SAM2 from the sam_features config
        model_dir = compose("sam_features", [f"batch_size={batch_size}"]).model_dir
    variables = make_sam_encoder_variables(model_dir, sam_cfg, random_init)
    extractor = SamFeatureExtractor(
        variables, cfg=sam_cfg, batch_size=batch_size, quant_int8=quant_int8
    )
    written = []
    for f in train_data:
        data, _ = load_data(f)
        stack = data[0].astype(np.float32)
        feats = extractor.extract(stack)
        out = Path(result_dir) / f"{Path(f).stem}.hdf"
        save_feature_hdf({"data": stack}, feats, out.name, out.parent)
        written.append(out)
        logger.info("wrote %s", out)
    return written


def run_trainer(cfg: DotDict, sam_cfg: SAM2Config | None = None) -> None:
    """Experiment path: per-sample SAM feature sweep (reference
    ``run/dino_features.py:304-350`` with ``use_sam=True``)."""
    validate_dino_config(cfg)
    data_dir = Path(cfg.paths.data_dir)
    src_dir = data_dir / cfg.paths.feature_name
    dst_dir = data_dir / cfg.paths.tomo_name
    csv_dir = data_dir / cfg.paths.csv_name

    sample_names = (
        [cfg.sample] if cfg.get("sample") else [s for s in ALL_SAMPLES if (src_dir / s).exists()]
    )
    variables = make_sam_encoder_variables(
        cfg.model_dir, sam_cfg, random_init=bool(cfg.get("random_init", False))
    )
    extractor = SamFeatureExtractor(
        variables, cfg=sam_cfg, batch_size=int(cfg.batch_size)
    )
    for sample in sample_names:
        tomo_dir = src_dir / sample
        csv_file = csv_dir / f"{sample}.csv"
        if csv_file.exists():
            names = pd.read_csv(csv_file)["tomo_name"].to_list()
        else:
            names = sorted(
                f.name for f in tomo_dir.glob("*") if f.suffix in tomogram_exts
            )
        for name in names:
            source = _read_source(tomo_dir / name)
            data = source["data"]
            stack = (
                data.astype(np.float32) / 255.0
                if data.dtype == np.uint8
                else data.astype(np.float32)
            )
            feats = extractor.extract(stack)
            save_feature_hdf(source, feats, name, dst_dir / sample)
            logger.info("[%s] %s", sample, name)
