"""``cryovit`` command-line interface.

Parity target: reference typer app (``cli/cli.py:18-24``, ``dino_cli.py``,
``train_cli.py``, ``eval_cli.py``, ``infer_cli.py``) with the same verbs,
argument order, and flag names, implemented with argparse (typer is not a
dependency of this build).
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

from cryovit_tpu._logging_config import setup_logging
from cryovit_tpu.types import ModelType


def _add_features(sub: argparse._SubParsersAction) -> None:
    p = sub.add_parser(
        "features",
        help="Compute high-level features using DINOv2 for a set of tomograms.",
    )
    p.add_argument("tomograms", help="Folder or .txt manifest of tomograms to process.")
    p.add_argument("result_folder", help="Folder where the DINO features are saved.")
    p.add_argument("--batch-size", type=int, default=64, help="Slices per extraction step.")
    p.add_argument("-v", "--visualize", action="store_true",
                   help="Save PCA visualizations of DINO features (slower).")
    p.add_argument("--use-sam", action="store_true",
                   help="Extract SAM2 feature pyramids instead of DINOv2.")
    p.add_argument("--int8", action="store_true",
                   help="w8a8 projection matmuls on the MXU (~1.2x faster "
                        "on TPU v5e; measured fidelity in BASELINE.md).")
    p.add_argument("--random-init", action="store_true", help=argparse.SUPPRESS)


def _add_train(sub: argparse._SubParsersAction) -> None:
    p = sub.add_parser("train", help="Train a segmentation model on annotated tomograms.")
    p.add_argument("train_data", help="Folder or .txt manifest of training tomograms.")
    p.add_argument("train_labels", help="Folder or .txt manifest of label files.")
    p.add_argument("label_key", help="Name of the label to train on.")
    p.add_argument("--labels", nargs="+", required=True,
                   help="Label names in ascending-value order.")
    p.add_argument("--validation-data", default=None)
    p.add_argument("--validation-labels", default=None)
    p.add_argument("--name", default=None, help="Name for the trained model.")
    p.add_argument("--model", default=ModelType.CRYOVIT.value,
                   choices=[m.value for m in ModelType])
    p.add_argument("--result-folder", default=None)
    p.add_argument("--ckpt", default=None,
                   help="Fine-tune from a .model / weights / checkpoint file.")
    p.add_argument("--num-epochs", type=int, default=50)
    p.add_argument("--log-training", action="store_true",
                   help="Log training curves to TensorBoard.")
    p.add_argument("--export-torch", action="store_true",
                   help="Also write <name>.torch.model — a reference-stack-"
                        "readable artifact (torch state_dict weights).")


def _add_evaluate(sub: argparse._SubParsersAction) -> None:
    p = sub.add_parser("evaluate", help="Evaluate a trained model against labels.")
    p.add_argument("test_data", help="Folder or .txt manifest of test tomograms.")
    p.add_argument("test_labels", help="Folder or .txt manifest of label files.")
    p.add_argument("model", help="Path to the trained .model file.")
    p.add_argument("--labels", nargs="+", required=True,
                   help="Label names in ascending-value order.")
    p.add_argument("--result-folder", default=None)
    p.add_argument("-v", "--visualize", action="store_true",
                   help="Also save prediction HDF5s.")


def _add_infer(sub: argparse._SubParsersAction) -> None:
    p = sub.add_parser("infer", help="Segment tomograms with a trained model.")
    p.add_argument("tomograms", help="Folder or .txt manifest of tomograms.")
    p.add_argument("--model", required=True, help="Path to the trained .model file.")
    p.add_argument("--result-folder", default=None)
    p.add_argument("--threshold", type=float, default=0.5,
                   help="Probability threshold for binary segmentation.")
    p.add_argument("--fused", action="store_true",
                   help="Run the fused DINOv2+decoder pipeline directly on raw "
                        "tomograms (CryoVIT models; no feature files needed).")
    p.add_argument("--int8", action="store_true",
                   help="With --fused: w8a8 backbone projections "
                        "(see features --int8).")


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(
        prog="cryovit",
        description="TPU-native cryo-electron tomogram segmentation "
        "(DINOv2 features + CryoVIT / 3D U-Net / SAM2).",
    )
    parser.add_argument(
        "--version", action="version",
        version=f"cryovit_tpu {__import__('cryovit_tpu').__version__}",
    )
    sub = parser.add_subparsers(dest="command", required=True)
    _add_features(sub)
    _add_train(sub)
    _add_evaluate(sub)
    _add_infer(sub)
    args = parser.parse_args(argv)
    setup_logging("INFO")

    from cryovit_tpu.io import load_files_from_path

    if args.command == "features":
        tomo_path = Path(args.tomograms)
        assert tomo_path.exists(), "Tomograms path does not exist."
        result = Path(args.result_folder)
        result.mkdir(parents=True, exist_ok=True)
        files = load_files_from_path(tomo_path)
        if args.use_sam:
            from cryovit_tpu.run.sam_features import run_sam

            run_sam(files, result, batch_size=args.batch_size,
                    random_init=args.random_init, quant_int8=args.int8)
        else:
            from cryovit_tpu.run.dino_features import run_dino

            run_dino(
                files,
                result,
                batch_size=args.batch_size,
                visualize=args.visualize,
                random_init=args.random_init,
                quant_int8=args.int8,
            )
        return 0

    if args.command == "train":
        from cryovit_tpu.run.train_model import run_training

        train_files = load_files_from_path(Path(args.train_data))
        label_files = load_files_from_path(Path(args.train_labels))
        val_files = (
            load_files_from_path(Path(args.validation_data))
            if args.validation_data
            else None
        )
        val_labels = (
            load_files_from_path(Path(args.validation_labels))
            if args.validation_labels
            else None
        )
        assert args.label_key in args.labels, (
            f"label_key {args.label_key!r} must be one of --labels {args.labels}"
        )
        name = args.name or f"{args.model}_{args.label_key}"
        result_dir = Path(args.result_folder or ".")
        run_training(
            train_data=train_files,
            train_labels=label_files,
            labels=args.labels,
            label_key=args.label_key,
            model_name=name,
            result_dir=result_dir,
            val_data=val_files,
            val_labels=val_labels,
            model_type=args.model,
            num_epochs=args.num_epochs,
            ckpt_path=Path(args.ckpt) if args.ckpt else None,
            log_training=args.log_training,
            export_torch=args.export_torch,
        )
        return 0

    if args.command == "evaluate":
        from cryovit_tpu.run.eval_model import run_evaluation
        from cryovit_tpu.train.checkpoint import load_model

        _, _, _, _, label_key = load_model(args.model, load_weights_flag=False)
        csv_dir = run_evaluation(
            test_data=load_files_from_path(Path(args.test_data)),
            test_labels=load_files_from_path(Path(args.test_labels)),
            labels=args.labels,
            model_path=Path(args.model),
            result_dir=Path(args.result_folder or "."),
            visualize=args.visualize,
        )
        print(f"metrics written under {csv_dir}")
        return 0

    if args.command == "infer":
        from cryovit_tpu.run.infer_model import run_inference

        written = run_inference(
            data=load_files_from_path(Path(args.tomograms)),
            model_path=Path(args.model),
            result_dir=Path(args.result_folder or "."),
            threshold=args.threshold,
            fused=args.fused,
            quant_int8=args.int8,
        )
        print(f"wrote {len(written)} segmentations")
        return 0

    return 1


if __name__ == "__main__":
    sys.exit(main())
