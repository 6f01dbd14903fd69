"""Launch the flagship training run (see README.md). Run from this dir:
    python launch.py [--num-epochs N]
Stage progress goes to run/log.txt; safe to resume with --restore.
"""
import argparse
import os
import sys

sys.path.insert(
    0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
)

parser = argparse.ArgumentParser()
parser.add_argument("--num-epochs", type=int, default=None)
parser.add_argument("--restore", default=None)
args = parser.parse_args()

import jax  # noqa: E402

cache = os.path.expanduser("~/.cache/jax_comp_cache")
os.makedirs(cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

if args.num_epochs is not None:
    import json

    epoch = json.load(open("epoch.json"))
    epoch["num_epochs"] = args.num_epochs
    json.dump(epoch, open("epoch.json", "w"), indent=1)

from adascale.training.loop import train  # noqa: E402

metrics = train(
    dataset_config_json="dataset.json",
    output_folder="run",
    epoch_config_json="epoch.json",
    model_config_json="model.json",
    restore_state_path=args.restore,
)
print("final:", metrics, flush=True)
