"""Launch the flagship training run (see README.md). Run from this dir:
    python launch.py [--num-epochs N] [--restore run/state_K]

By default this is a SUPERVISOR: it runs the actual training in a child
process and restarts it from the newest checkpoint whenever the child
stops making progress — the training driver's restore path resumes at the
following epoch with optimizer/schedule state intact. rc=0 from the child
ends the loop. Three failure modes are covered (all observed in anger on
this sandbox):

  1. Child death (the experimental TPU tunnel client leaks every
     host->device staging buffer, so multi-hour runs are eventually
     OOM-killed) -> restart from latest checkpoint.
  2. Child HANG (a tunnel RPC that never returns leaves the process
     sleeping forever; cost 1h40m of silent wall-clock once) -> the
     supervisor watches run/log.txt's mtime and kills a child that has
     written nothing for --stall-timeout seconds.
  3. Leak-driven memory pressure (host RSS creeping toward the 125 GB
     physical limit starves the datagen workers before the OOM killer
     fires) -> kill preemptively at --rss-limit-gb and restart clean.
"""
import argparse
import os
import re
import subprocess
import sys
import time

sys.path.insert(
    0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
)

parser = argparse.ArgumentParser()
parser.add_argument("--num-epochs", type=int, default=None)
parser.add_argument("--restore", default=None)
parser.add_argument(
    "--init-params", default=None,
    help="params-only continuation: start from exported weights (.npz / "
    "orbax dir) with fresh optimizer moments; combine with --start-epoch "
    "to resume the cosine schedule mid-arm (loop.py init_params_path)",
)
parser.add_argument(
    "--start-epoch", type=int, default=None,
    help="epoch index to resume the schedule at (reset_epoch_idx_to_value)",
)
parser.add_argument("--child", action="store_true", help="internal: run training directly")
parser.add_argument("--max-restarts", type=int, default=20)
parser.add_argument(
    "--stall-timeout", type=float, default=900.0,
    help="kill the child if run/log.txt is untouched this long (steady "
    "epochs log every few seconds; even a dev eval + checkpoint save "
    "finishes well inside 15 min)",
)
parser.add_argument(
    "--rss-limit-gb", type=float, default=96.0,
    help="kill the child preemptively when its RSS passes this (tunnel "
    "staging-buffer leak; restart is cheaper than swap death / OOM)",
)
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


def child_rss_gb(pid):
    try:
        with open(f"/proc/{pid}/status") as fin:
            for line in fin:
                if line.startswith("VmRSS:"):
                    return float(line.split()[1]) / 1e6
    except OSError:
        pass
    return 0.0


def supervise_one(cmd):
    """Run one child to completion; returns (rc, reason)."""
    started = time.time()
    proc = subprocess.Popen(cmd)
    while True:
        rc = proc.poll()
        if rc is not None:
            return rc, f"exited rc={rc}"
        now = time.time()
        try:
            log_age = now - os.path.getmtime(os.path.join("run", "log.txt"))
        except OSError:
            log_age = 0.0
        # Grace for startup (restore + cached compiles + datagen warmup):
        # only count staleness after the child has had a full timeout.
        if log_age > args.stall_timeout and now - started > args.stall_timeout:
            proc.kill()
            proc.wait()
            return -1, f"STALLED (log untouched {log_age:.0f}s) -> killed"
        rss = child_rss_gb(proc.pid)
        if rss > args.rss_limit_gb:
            proc.kill()
            proc.wait()
            return -1, f"RSS {rss:.1f} GB > {args.rss_limit_gb} GB -> killed"
        time.sleep(20)


if not args.child:
    restore = args.restore
    for attempt in range(args.max_restarts + 1):
        cmd = [sys.executable, os.path.abspath(__file__), "--child"]
        if restore:
            cmd += ["--restore", restore]
        elif args.init_params:
            # Params-only continuation; once the run saves its first
            # checkpoint, restarts go through the normal restore path.
            cmd += ["--init-params", args.init_params]
            if args.start_epoch is not None:
                cmd += ["--start-epoch", str(args.start_epoch)]
        print(f"supervisor: starting child (attempt {attempt}, restore={restore})",
              flush=True)
        rc, reason = supervise_one(cmd)
        if rc == 0:
            print("supervisor: training finished", flush=True)
            sys.exit(0)
        restore = latest_checkpoint()
        print(f"supervisor: child {reason}; latest checkpoint {restore}",
              flush=True)
        if restore is None and not args.init_params:
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
    init_params_path=(None if args.restore else args.init_params),
    reset_epoch_idx_to_value=(args.start_epoch if not args.restore else None),
)
print("final:", metrics, flush=True)
