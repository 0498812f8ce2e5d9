"""Fused DINOv2 → CryoVIT pipeline.

The BASELINE.json north star's "streams per-slice patch embeddings directly
into the CryoVIT 3D convolutional decoder": instead of materializing ~GB
fp16 feature files (reference two-step ``dino_features`` → ``train_model``),
the extractor and decoder run in ONE jit program — raw voxel slices in,
per-voxel probabilities out. XLA fuses the fp16 round-trip away entirely
(features never leave HBM, never hit fp16).

Used for direct inference/eval on raw tomograms; the file-based path
remains for reference-layout compatibility and cheap decoder-only training.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from cryovit_tpu.models.cryovit import CryoVITModule
from cryovit_tpu.models.dinov2 import DinoV2Config, make_dinov2
from cryovit_tpu.ops.resize import bicubic_resize_matrix

__all__ = ["FusedDinoCryoVIT"]

DINO_PATCH = 14


class FusedDinoCryoVIT:
    """End-to-end tomogram segmentation: slices → ViT-g features → decoder.

    Not a flax module (the two parameter trees stay separate so the decoder
    can come from any trained CryoVIT artifact while the backbone weights
    are shared/frozen).
    """

    def __init__(
        self,
        dino_variables: Any,
        decoder_variables: Any,
        dino_cfg: DinoV2Config | None = None,
        dtype=jnp.bfloat16,
        slice_batch: int = 64,
        quant_int8: bool = False,
    ) -> None:
        self.dino_cfg = dino_cfg or DinoV2Config.giant()
        self.backbone = make_dinov2(
            self.dino_cfg, dtype=dtype, quant_int8=quant_int8
        )
        self.decoder = CryoVITModule(dtype=dtype)
        self.dino_variables = dino_variables
        self.decoder_variables = decoder_variables
        self.slice_batch = slice_batch
        self._fns: dict = {}

    def _fn(self, d: int, h: int, w: int, normalize: bool = False):
        key = (d, h, w, normalize)
        if key in self._fns:
            return self._fns[key]
        out_h = h // 16 * DINO_PATCH
        out_w = w // 16 * DINO_PATCH
        gh, gw = h // 16, w // 16
        rh = bicubic_resize_matrix(h, out_h)
        rw = bicubic_resize_matrix(w, out_w)
        sb = min(self.slice_batch, d)
        n_chunks = -(-d // sb)
        d_pad = n_chunks * sb

        @jax.jit
        def fn(dino_vars, dec_vars, slices):  # (D, H, W) f32 (or uint8)
            x = slices.astype(jnp.float32)
            if normalize:  # uint8 → [0,1] on device (4× less H2D)
                x = x * (1.0 / 255.0)
            x = jnp.pad(x, ((0, d_pad - d), (0, 0), (0, 0)))
            x = jnp.einsum("oh,bhw->bow", rh, x)
            x = jnp.einsum("pw,bow->bop", rw, x)

            # slice micro-batching through the frozen backbone as a scan:
            # bounds activation memory to one chunk (reference loops batches
            # of 128 on host, run/dino_features.py:53-63 — here it stays on
            # device and overlaps via XLA scheduling)
            chunks = x.reshape(n_chunks, sb, out_h, out_w)

            def step(_, chunk):
                feats = self.backbone.apply(dino_vars, chunk)
                return None, feats

            _, feats = jax.lax.scan(step, None, chunks)
            feats = feats.reshape(d_pad, gh, gw, self.dino_cfg.embed_dim)[:d]
            feats = jax.lax.stop_gradient(feats)
            probs = self.decoder.apply(dec_vars, feats[None])  # (1, D, 16gh, 16gw)
            return probs[0]

        self._fns[key] = fn
        return fn

    def segment(self, slices) -> jnp.ndarray:
        """``(D, H, W)`` padded-to-16 stack → ``(D, 16·gh, 16·gw)`` probs.
        f32 input is taken as already normalized; uint8 transfers raw and
        rescales on device."""
        d, h, w = slices.shape
        normalize = getattr(slices, "dtype", None) == np.uint8
        return self._fn(d, h, w, normalize)(
            self.dino_variables, self.decoder_variables, jnp.asarray(slices)
        )
