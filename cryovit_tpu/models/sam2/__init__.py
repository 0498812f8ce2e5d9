"""TPU-native SAM2 family.

The reference wraps the external ``sam2`` torch package
(``models/sam2.py``, ``models/sam2_blocks.py``); that package is rebuilt
here in flax:

- :mod:`hiera`            — hierarchical windowed-attention backbone
- :mod:`encoder`          — FPN neck + sine position encodings
- :mod:`prompts`          — SAM prompt encoder (points/boxes/masks)
- :mod:`decoder`          — two-way transformer mask decoder (+LoRA)
- :mod:`memory`           — memory encoder + memory attention (RoPE)
- :mod:`prompt_predictor` — 3D U-Net box/mask prompt predictor
- :mod:`model`            — the trainable SAM2 wrapper + tracking scan
"""

from cryovit_tpu.models.sam2.config import HieraConfig, SAM2Config

__all__ = ["SAM2Config", "HieraConfig"]
