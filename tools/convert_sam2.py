#!/usr/bin/env python
"""One-time conversion: torch SAM2 checkpoint → flax msgpack weights.

The reference downloads ``facebook/sam2.1-hiera-large`` and
``wanglab/MedSAM2`` from HF hub at runtime (``models/sam2.py:845-874``);
this converts a locally downloaded checkpoint once.

Usage:
    python tools/convert_sam2.py --weights sam2.1_hiera_large.pt \
        --out <model_dir>/sam2_weights.msgpack [--encoder-only]

``--encoder-only`` writes just the image-encoder params
(``sam2_encoder.msgpack``) used by the sam_features extraction path.
"""

from __future__ import annotations

import argparse
from pathlib import Path


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--weights", type=Path, required=True)
    parser.add_argument("--out", type=Path, required=True)
    parser.add_argument("--encoder-only", action="store_true")
    parser.add_argument("--tiny", action="store_true", help="MedSAM2 (hiera-tiny) config")
    args = parser.parse_args()

    import torch
    from flax.serialization import to_bytes

    from cryovit_tpu.models.sam2.config import SAM2Config
    from cryovit_tpu.models.sam2.convert import (
        convert_encoder_state_dict,
        convert_sam2_state_dict,
    )

    sd = torch.load(args.weights, map_location="cpu", weights_only=True)
    if "model" in sd:
        sd = sd["model"]
    cfg = SAM2Config.medsam_tiny() if args.tiny else SAM2Config.large()
    variables = (
        convert_encoder_state_dict(sd, cfg)
        if args.encoder_only
        else convert_sam2_state_dict(sd, cfg)
    )
    args.out.parent.mkdir(parents=True, exist_ok=True)
    args.out.write_bytes(to_bytes(variables))
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
