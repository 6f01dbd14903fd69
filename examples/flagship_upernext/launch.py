"""Launch the flagship training run (see README.md). Run from this dir:
    python launch.py [--num-epochs N] [--restore run/state_K]

By default this is a SUPERVISOR: it runs the actual training in a child
process and, if the child dies (the experimental TPU tunnel client leaks
every host->device staging buffer, so multi-hour runs are eventually
OOM-killed), restarts it from the newest checkpoint — the training
driver's restore path resumes at the following epoch with optimizer/
schedule state intact. rc=0 from the child ends the loop.
"""
import argparse
import os
import re
import subprocess
import sys

sys.path.insert(
    0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
)

parser = argparse.ArgumentParser()
parser.add_argument("--num-epochs", type=int, default=None)
parser.add_argument("--restore", default=None)
parser.add_argument("--child", action="store_true", help="internal: run training directly")
parser.add_argument("--max-restarts", type=int, default=20)
args = parser.parse_args()

if args.num_epochs is not None:
    import json

    epoch = json.load(open("epoch.json"))
    epoch["num_epochs"] = args.num_epochs
    json.dump(epoch, open("epoch.json", "w"), indent=1)


def latest_checkpoint():
    if not os.path.isdir("run"):
        return None
    best = (-1, None)
    for name in os.listdir("run"):
        m = re.fullmatch(r"state_(\d+)(_not_best)?", name)
        if m and int(m.group(1)) > best[0]:
            best = (int(m.group(1)), os.path.join("run", name))
    return best[1]


if not args.child:
    restore = args.restore
    for attempt in range(args.max_restarts + 1):
        cmd = [sys.executable, os.path.abspath(__file__), "--child"]
        if restore:
            cmd += ["--restore", restore]
        print(f"supervisor: starting child (attempt {attempt}, restore={restore})",
              flush=True)
        rc = subprocess.call(cmd)
        if rc == 0:
            print("supervisor: training finished", flush=True)
            sys.exit(0)
        restore = latest_checkpoint()
        print(f"supervisor: child died rc={rc}; latest checkpoint {restore}",
              flush=True)
        if restore is None:
            sys.exit(rc)
    sys.exit(1)

import jax  # noqa: E402

cache = os.path.expanduser("~/.cache/jax_comp_cache")
os.makedirs(cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from adascale.training.loop import train  # noqa: E402

metrics = train(
    dataset_config_json="dataset.json",
    output_folder="run",
    epoch_config_json="epoch.json",
    model_config_json="model.json",
    restore_state_path=args.restore,
)
print("final:", metrics, flush=True)
