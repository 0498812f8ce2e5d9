"""SAM prompt encoder (points / boxes / dense masks) in flax.

Mirrors the sam2 PromptEncoder: random-Fourier positional encoding of point
coordinates, per-label learned embeddings (box corners = labels 2/3, padding
point = label −1), and a small conv net downscaling dense mask prompts to
the embedding grid (with a learned ``no_mask_embed`` otherwise).

The reference drives this with *box + predicted-mask* prompts only
(``models/sam2.py:670-740``): a dummy padding point plus a box, and the
PromptPredictor's mask.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from cryovit_tpu.models.sam2.config import SAM2Config

__all__ = ["PromptEncoder", "random_position_encoding"]


def random_position_encoding(coords: jnp.ndarray, gaussian: jnp.ndarray) -> jnp.ndarray:
    """Fourier-feature encoding of [0,1] coords (sam PositionEmbeddingRandom).

    coords: (..., 2); gaussian: (2, dim/2) → (..., dim).
    """
    proj = (2.0 * coords - 1.0) @ gaussian
    proj = 2 * np.pi * proj
    return jnp.concatenate([jnp.sin(proj), jnp.cos(proj)], axis=-1)


class PromptEncoder(nn.Module):
    cfg: SAM2Config = SAM2Config.large()
    dtype: Any = jnp.float32

    def setup(self) -> None:
        d = self.cfg.d_model
        self.pe_gaussian = self.param(
            "pe_gaussian", nn.initializers.normal(1.0), (2, d // 2)
        )
        # 0: negative point, 1: positive point, 2: box TL, 3: box BR
        self.point_embeddings = self.param(
            "point_embeddings", nn.initializers.normal(0.02), (4, d)
        )
        self.not_a_point_embed = self.param(
            "not_a_point_embed", nn.initializers.normal(0.02), (d,)
        )
        self.no_mask_embed = self.param(
            "no_mask_embed", nn.initializers.normal(0.02), (d,)
        )
        self.mask_down = [
            nn.Conv(4, (2, 2), strides=(2, 2), dtype=self.dtype, name="mask_down0"),
            nn.Conv(16, (2, 2), strides=(2, 2), dtype=self.dtype, name="mask_down1"),
            nn.Conv(d, (1, 1), dtype=self.dtype, name="mask_down2"),
        ]
        self.mask_norms = [
            nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="mask_ln0"),
            nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="mask_ln1"),
        ]

    def dense_pe(self) -> jnp.ndarray:
        """Positional encoding of the embedding grid (get_dense_pe)."""
        e = self.cfg.embed_size
        ys = (jnp.arange(e, dtype=jnp.float32) + 0.5) / e
        xs = (jnp.arange(e, dtype=jnp.float32) + 0.5) / e
        grid = jnp.stack(jnp.meshgrid(xs, ys, indexing="xy"), axis=-1)  # (e, e, 2)
        return random_position_encoding(grid, self.pe_gaussian)

    def encode_boxes(self, boxes: jnp.ndarray) -> jnp.ndarray:
        """(B, 4) pixel boxes → (B, 2, d) corner tokens."""
        corners = boxes.reshape(-1, 2, 2) + 0.5
        coords = corners / self.cfg.image_size
        pe = random_position_encoding(coords, self.pe_gaussian)
        tl = pe[:, 0] + self.point_embeddings[2]
        br = pe[:, 1] + self.point_embeddings[3]
        return jnp.stack([tl, br], axis=1)

    def padding_point(self, batch: int) -> jnp.ndarray:
        """(B, 1, d) token for the −1-label dummy point the reference always
        feeds (``models/sam2.py:684-687``)."""
        tok = self.not_a_point_embed[None, None, :]
        return jnp.broadcast_to(tok, (batch, 1, self.cfg.d_model))

    def encode_masks(self, masks: jnp.ndarray | None, batch: int) -> jnp.ndarray:
        """(B, S, S, 1) dense prompt → (B, e, e, d); no-mask embedding otherwise."""
        e = self.cfg.embed_size
        if masks is None:
            return jnp.broadcast_to(
                self.no_mask_embed[None, None, None, :],
                (batch, e, e, self.cfg.d_model),
            )
        x = masks
        x = self.mask_down[0](x)
        x = nn.gelu(self.mask_norms[0](x), approximate=False)
        x = self.mask_down[1](x)
        x = nn.gelu(self.mask_norms[1](x), approximate=False)
        return self.mask_down[2](x)

    def __call__(
        self, boxes: jnp.ndarray, masks: jnp.ndarray | None
    ) -> tuple[jnp.ndarray, jnp.ndarray]:
        """→ (sparse tokens (B, 3, d), dense embeddings (B, e, e, d))."""
        b = boxes.shape[0]
        sparse = jnp.concatenate(
            [self.padding_point(b), self.encode_boxes(boxes)], axis=1
        ).astype(self.dtype)
        dense = self.encode_masks(masks, b).astype(self.dtype)
        return sparse, dense
