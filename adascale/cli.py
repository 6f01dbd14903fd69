"""Command-line entry points: ``python -m adascale <cmd> ...``.

The reference exposes bare functions as entry points (train.py:107,
demo.py:178 — no CLI parser anywhere). This thin argparse layer maps
one-to-one onto those functions:

  train    adascale.training.loop.train
  export   adascale.training.loop.export_inference_artifact
  demo     adascale.inference.demo.infer (visualization JPEGs)
  detect   AdaptiveScalingInference.detect -> char polygons JSON
  stablehlo  adascale.inference.export.export_stablehlo
"""
from __future__ import annotations

import argparse
import json
import sys


def _cmd_train(args):
    from .training.loop import train

    metrics = train(
        dataset_config_json=args.dataset_config,
        output_folder=args.output,
        reset_output_folder=args.reset_output,
        epoch_config_json=args.epoch_config,
        model_config_json=args.model_config,
        optimizer_config_json=args.optimizer_config,
        rough_loss_config_json=args.rough_loss_config,
        precise_loss_config_json=args.precise_loss_config,
        restore_state_path=args.restore,
        use_mesh=args.mesh,
    )
    print(json.dumps(metrics))


def _cmd_export(args):
    from .training.loop import export_inference_artifact

    path = export_inference_artifact(args.checkpoint, args.output, args.model_config)
    print(path)


def _cmd_demo(args):
    from .inference.demo import infer

    infer(args.config, args.image, args.output)


def _cmd_detect(args):
    import cv2

    from .inference import AdaptiveScalingInference, AdaptiveScalingInferenceConfig
    from .models import AdaptiveScalingConfig
    from .utils.config import load_config

    engine = AdaptiveScalingInference(
        AdaptiveScalingInferenceConfig(
            checkpoint=args.checkpoint,
            model=load_config(args.model_config, AdaptiveScalingConfig),
            compute_dtype=args.dtype,
            use_pallas_backbone=args.pallas,
        )
    )
    image = cv2.cvtColor(cv2.imread(args.image), cv2.COLOR_BGR2RGB)
    # Tri-state: --tiled forces on, --no-tiled forces off, absent -> None
    # lets config.tiled_rough_long_side_min auto-decide.
    result = engine.detect(image, tiled=args.tiled)
    polygons = [p.points.tolist() for p in result["char_polygons"]]
    out = json.dumps({"num_chars": len(polygons), "char_polygons": polygons})
    if args.output:
        with open(args.output, "w") as fout:
            fout.write(out)
    else:
        print(out)


def _cmd_stablehlo(args):
    from .inference.engine import load_params
    from .inference.export import export_stablehlo
    from .models import AdaptiveScalingConfig
    from .utils.config import load_config

    model_config = load_config(args.model_config, AdaptiveScalingConfig)
    params = load_params(args.checkpoint, model_config)
    manifest = export_stablehlo(params, model_config, args.output)
    print(json.dumps(manifest))


def main(argv=None):
    parser = argparse.ArgumentParser(prog="adascale")
    sub = parser.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("train", help="run the training driver")
    p.add_argument("--dataset-config", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--epoch-config")
    p.add_argument("--model-config")
    p.add_argument("--optimizer-config")
    p.add_argument("--rough-loss-config")
    p.add_argument("--precise-loss-config")
    p.add_argument("--restore")
    p.add_argument("--reset-output", action="store_true")
    p.add_argument("--mesh", action="store_true", help="data-parallel over all devices")
    p.set_defaults(fn=_cmd_train)

    p = sub.add_parser("export", help="checkpoint -> inference artifact")
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--model-config")
    p.set_defaults(fn=_cmd_export)

    p = sub.add_parser("demo", help="two-stage inference + visualization JPEGs")
    p.add_argument("--config", required=True)
    p.add_argument("--image", required=True)
    p.add_argument("--output", required=True)
    p.set_defaults(fn=_cmd_demo)

    p = sub.add_parser("detect", help="page image -> char polygons JSON")
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--image", required=True)
    p.add_argument("--model-config")
    p.add_argument("--output")
    p.add_argument("--dtype", default="float32", choices=["float32", "bfloat16"])
    p.add_argument("--pallas", action="store_true")
    p.add_argument(
        "--tiled",
        action=argparse.BooleanOptionalAction,
        default=None,
        help="force tiling on (--tiled) or off (--no-tiled); "
        "default auto-decides from config",
    )
    p.set_defaults(fn=_cmd_detect)

    p = sub.add_parser("stablehlo", help="checkpoint -> StableHLO artifacts")
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--model-config")
    p.set_defaults(fn=_cmd_stablehlo)

    args = parser.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main(sys.argv[1:])
