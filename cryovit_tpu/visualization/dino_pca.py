"""PCA colormap visualizations of DINOv2 features.

Parity target: reference ``visualization/dino_pca.py`` — PCA(≤1024) →
3-component embedding → HSV recolor → upscale to voxel resolution,
side-by-side with the raw slice every 10th z. The reference uses UMAP for
the 3D embedding; UMAP is not available in this build, so the 3-component
projection falls back to PCA (documented behavioral difference — the maps
stay qualitatively equivalent feature-similarity colorings).
"""

from __future__ import annotations

import logging
from pathlib import Path

import h5py
import numpy as np

from cryovit_tpu.config import tomogram_exts

logger = logging.getLogger(__name__)

__all__ = ["export_pca", "process_samples"]


def _embed_3d(x: np.ndarray, n_fit: int) -> tuple:
    """Fit PCA(≤1024) (+UMAP(3) when available, PCA(3) otherwise) on ``x``
    (N, C); returns a transform closure."""
    from sklearn.decomposition import PCA

    pca = PCA(n_components=min(1024, x.shape[0], x.shape[1]))
    reduced = pca.fit_transform(x)
    try:  # pragma: no cover - umap not installed in this build
        from umap import UMAP

        um = UMAP(n_components=3, verbose=False)
        um.fit(reduced)
        return lambda y: um.transform(pca.transform(y))
    except ImportError:
        pca3 = PCA(n_components=3)
        pca3.fit(reduced)
        return lambda y: pca3.transform(pca.transform(y))


def _calculate_pca(features: np.ndarray) -> np.ndarray:
    """``(C, D, gh, gw)`` features → ``(D, 2·gh, 2·gw, 3)`` embedding maps
    (2× bicubic upscale before the transform, as the reference does)."""
    import jax.numpy as jnp

    from cryovit_tpu.ops.resize import resize_bicubic_2d

    f32 = features.astype(np.float32)
    flat = f32.transpose(1, 2, 3, 0).reshape(-1, f32.shape[0])
    transform = _embed_3d(flat, n_fit=flat.shape[0])

    up = np.asarray(
        resize_bicubic_2d(
            jnp.asarray(f32), f32.shape[2] * 2, f32.shape[3] * 2
        )
    )  # (C, D, 2gh, 2gw)
    d, gh2, gw2 = up.shape[1:]
    flat_up = up.transpose(1, 2, 3, 0).reshape(-1, up.shape[0])
    emb = transform(flat_up)
    return emb.reshape(d, gh2, gw2, 3)


def _color_features(features: np.ndarray, alpha: float = 0.0) -> np.ndarray:
    """Normalize the 3D embedding into fixed-S/V HSV colors and 8×-upscale
    to voxel resolution (reference ``dino_pca.py:40-61``)."""
    from matplotlib.colors import hsv_to_rgb, rgb_to_hsv

    f = features - features.min(axis=(0, 1, 2))
    f = f / np.maximum(f.max(axis=(0, 1, 2)), 1e-8)
    hsv = rgb_to_hsv(f)
    hsv[..., 1] = 0.9
    hsv[..., 2] = 0.75
    hsv[..., 0] = (alpha + hsv[..., 0]) % 1.0
    rgb = (255 * hsv_to_rgb(hsv)).astype(np.uint8)
    rgb = np.repeat(rgb, 8, axis=1)
    return np.repeat(rgb, 8, axis=2)


def export_pca(
    data: np.ndarray,
    features: np.ndarray,
    tomo_name: str,
    result_dir: Path,
    frame_id: int | None = None,
) -> None:
    """Save side-by-side (raw | PCA colormap) PNGs for every 10th slice
    (reference ``dino_pca.py:63-100``)."""
    from PIL import Image

    image_dir = Path(result_dir) / tomo_name
    image_dir.mkdir(parents=True, exist_ok=True)

    idxs = (
        list(np.arange(0, data.shape[0], step=10, dtype=int))
        if frame_id is None
        else [frame_id]
    )
    emb = _calculate_pca(features[:, idxs])
    rgb = _color_features(emb)

    norm = data - data.min()
    norm = norm / max(norm.max(), 1e-8)
    int_data = (norm * 255.0).astype(np.uint8)

    for i, idx in enumerate(idxs):
        f_img = Image.fromarray(rgb[i][::-1])
        d_img = Image.fromarray(int_data[idx][::-1]).convert("RGB")
        d_img = d_img.resize(f_img.size)
        img = Image.new("RGB", (2 * f_img.size[0], f_img.size[1]))
        img.paste(d_img)
        img.paste(f_img, box=(d_img.size[0], 0))
        img.save(image_dir / f"{idx}.png")
    logger.info("saved %d PCA maps to %s", len(idxs), image_dir)


def process_samples(exp_dir: Path, result_dir: Path, sample: str | None = None) -> None:
    """Export PCA maps for every tomogram of every sample dir
    (reference ``dino_pca.py:103-136``)."""
    exp_dir, result_dir = Path(exp_dir), Path(result_dir)
    result_dir.mkdir(parents=True, exist_ok=True)
    sample_list = (
        [s.name for s in exp_dir.iterdir() if s.is_dir()] if sample is None else [sample]
    )
    for s in sample_list:
        tomo_dir = exp_dir / s
        for f in sorted(tomo_dir.glob("*")):
            if f.suffix not in tomogram_exts:
                continue
            with h5py.File(f) as fh:
                data = np.asarray(fh["data"][()])
                if data.dtype == np.uint8:
                    data = data.astype(np.float32) / 255.0
                features = np.asarray(fh["dino_features"][()], dtype=np.float32)
            export_pca(data, features, f.stem, result_dir / s)
