#!/usr/bin/env python
"""One-time conversion: torch DINOv2 checkpoint → flax msgpack weights.

The reference loads ``dinov2_vitg14_reg`` from torch hub at runtime
(reference ``run/dino_features.py:25-28, 253-256``). This framework converts
the checkpoint once (folding the 3-channel patch embed + optional ImageNet
normalization into a single-channel kernel) and ships a pure-jax artifact.

Usage:
    # from a local torch hub checkpoint (state dict .pth):
    python tools/convert_dinov2.py \
        --torch-weights dinov2_vitg14_reg4_pretrain.pth \
        --out /path/to/model_dir/dinov2_vitg14_reg.msgpack

    # or let torch hub download it first (needs network):
    python tools/convert_dinov2.py --from-hub --out ...
"""

from __future__ import annotations

import argparse
from pathlib import Path


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--torch-weights", type=Path, default=None,
                        help="path to the dinov2_vitg14_reg4_pretrain .pth state dict")
    parser.add_argument("--from-hub", action="store_true",
                        help="download via torch.hub (requires network)")
    parser.add_argument("--out", type=Path, required=True)
    parser.add_argument("--no-normalize", action="store_true",
                        help="do NOT fold ImageNet normalization into the patch "
                             "embed (reproduces the reference experiment path, "
                             "which skips normalization — see SURVEY §2.3)")
    args = parser.parse_args()

    import torch
    from flax.serialization import to_bytes

    from cryovit_tpu.models.dinov2 import DinoV2Config, convert_torch_state_dict

    if args.from_hub:
        model = torch.hub.load("facebookresearch/dinov2", "dinov2_vitg14_reg")
        state_dict = model.state_dict()
    else:
        if args.torch_weights is None:
            parser.error("--torch-weights or --from-hub required")
        state_dict = torch.load(args.torch_weights, map_location="cpu", weights_only=True)
        if "model" in state_dict and not any(k.startswith("blocks") for k in state_dict):
            state_dict = state_dict["model"]

    variables = convert_torch_state_dict(
        state_dict,
        DinoV2Config.giant(),
        normalize=not args.no_normalize,
        scan_blocks=True,  # giant runs as scan-over-blocks
    )
    args.out.parent.mkdir(parents=True, exist_ok=True)
    args.out.write_bytes(to_bytes(variables))
    n_params = sum(
        v.size for v in _leaves(variables)
    )
    print(f"wrote {args.out} ({n_params/1e9:.3f}B params)")


def _leaves(tree):
    if isinstance(tree, dict):
        for v in tree.values():
            yield from _leaves(v)
    else:
        yield tree


if __name__ == "__main__":
    main()
