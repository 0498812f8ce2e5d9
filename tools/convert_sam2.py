#!/usr/bin/env python
"""One-time conversion: torch SAM2 checkpoint → flax msgpack weights.

The reference downloads ``facebook/sam2.1-hiera-large`` and
``wanglab/MedSAM2`` from HF hub at runtime (``models/sam2.py:845-874``);
this converts a locally downloaded checkpoint once.

Usage:
    python tools/convert_sam2.py --weights sam2.1_hiera_large.pt \
        --out <model_dir>/sam2_weights.msgpack [--encoder-only] [--verify]

``--encoder-only`` writes just the image-encoder params
(``sam2_encoder.msgpack``) used by the sam_features extraction path.

``--verify`` runs the strict checkpoint audit before writing: it reports
missing tensors, unconsumed tensors, and a per-parameter shape-manifest
diff against the flax module tree, and exits nonzero on ANY mismatch
(mirroring the reference's strict load, ``models/sam2.py:832-838``) —
so validating a real published checkpoint is one command.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path


def _print_report(report: dict) -> None:
    print(
        f"checkpoint tensors: {report['n_tensors']}  consumed: "
        f"{report['n_consumed']}  converted params: {report['n_params']}"
    )
    if report["error"]:
        print(f"CONVERSION ERROR: {report['error']}")
    for key, label in (
        ("missing", "MISSING from checkpoint"),
        ("unconsumed", "UNCONSUMED checkpoint tensors"),
        ("not_in_model", "converted entries NOT IN the flax model"),
    ):
        if report[key]:
            print(f"{label} ({len(report[key])}):")
            for name in report[key][:40]:
                print(f"  {name}")
            if len(report[key]) > 40:
                print(f"  ... and {len(report[key]) - 40} more")
    if report["shape_mismatches"]:
        print(f"SHAPE MISMATCHES ({len(report['shape_mismatches'])}):")
        for path, got, want in report["shape_mismatches"][:40]:
            print(f"  {path}: checkpoint {got} != model {want}")
    print("verify:", "OK" if report["ok"] else "FAILED")


def main() -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--weights", type=Path, required=True)
    parser.add_argument("--out", type=Path, default=None)
    parser.add_argument("--encoder-only", action="store_true")
    parser.add_argument("--tiny", action="store_true", help="MedSAM2 (hiera-tiny) config")
    parser.add_argument("--verify", action="store_true",
                        help="strict audit; nonzero exit on any mismatch")
    args = parser.parse_args()
    if args.out is None and not args.verify:
        parser.error("--out is required unless --verify")

    import torch
    from flax.serialization import to_bytes

    from cryovit_tpu.models.sam2.config import SAM2Config
    from cryovit_tpu.models.sam2.convert import (
        convert_encoder_state_dict,
        convert_sam2_state_dict,
        verify_checkpoint,
    )

    sd = torch.load(args.weights, map_location="cpu", weights_only=True)
    if "model" in sd:
        sd = sd["model"]
    cfg = SAM2Config.medsam_tiny() if args.tiny else SAM2Config.large()
    if args.verify:
        report = verify_checkpoint(sd, cfg, encoder_only=args.encoder_only)
        _print_report(report)
        if not report["ok"]:
            return 1
    if args.out is None:
        return 0
    variables = (
        convert_encoder_state_dict(sd, cfg)
        if args.encoder_only
        else convert_sam2_state_dict(sd, cfg)
    )
    args.out.parent.mkdir(parents=True, exist_ok=True)
    args.out.write_bytes(to_bytes(variables))
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
