"""Post-training evidence battery runner.

Round 4 lost its entire FPN evidence battery to an environment bug: a bash
watcher invoked ``python -m adascale.tools.*`` without the repo root on
PYTHONPATH and every step died with ModuleNotFoundError one-liners. This
tool replaces that bash script with a tested runner that cannot lose a
battery the same way:

  * every subprocess step inherits a PYTHONPATH derived from the *imported*
    ``adascale`` package location (if this module runs, the steps can
    import it too);
  * each step's stdout/stderr goes to ``<logdir>/<name>.log`` and its
    outcome (rc, wall seconds, log path, last log line) is appended to a
    ``battery_manifest.json`` that is rewritten after EVERY step — a crash
    or VM snapshot mid-battery keeps everything finished so far;
  * steps already marked ok in an existing manifest are skipped, so the
    battery is resumable with the same command line.

Battery spec is a JSON file::

    {
      "logdir": "run/eval_r5",             # resolved relative to the spec
      "wait_pid": null,                     # optional: wait for pid to exit
      "steps": [
        {"name": "eval_f32",
         "module": "adascale.tools.eval_checkpoint",
         "args": ["--run", "run", "--model-config", "model.json"],
         "cwd": ".",                        # relative to the spec file
         "timeout": 3000}
      ]
    }

Usage:  python -m adascale.tools.battery --spec examples/battery_fpn.json
        [--wait-pid N]
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time
from pathlib import Path
from typing import Any, Dict, List, Optional


def _repo_pythonpath() -> str:
    """PYTHONPATH entry that makes ``import adascale`` work in children."""
    import adascale

    pkg_root = Path(adascale.__file__).resolve().parent.parent
    existing = os.environ.get("PYTHONPATH", "")
    return f"{pkg_root}{os.pathsep}{existing}" if existing else str(pkg_root)


def wait_for_pid(pid: int, poll_seconds: float = 30.0) -> None:
    """Block until ``pid`` no longer exists (the supervisor it watches)."""
    while True:
        try:
            os.kill(pid, 0)
        except (ProcessLookupError, PermissionError):
            return
        time.sleep(poll_seconds)


def _load_manifest(path: Path) -> Dict[str, Any]:
    if path.exists():
        try:
            return json.loads(path.read_text())
        except (json.JSONDecodeError, OSError):
            pass
    return {"steps": []}


def _ok_names(manifest: Dict[str, Any]) -> set:
    return {s["name"] for s in manifest.get("steps", []) if s.get("rc") == 0}


def run_step(
    step: Dict[str, Any],
    spec_dir: Path,
    logdir: Path,
    env: Dict[str, str],
) -> Dict[str, Any]:
    name = step["name"]
    argv = [sys.executable, "-m", step["module"], *step.get("args", [])]
    cwd = (spec_dir / step.get("cwd", ".")).resolve()
    timeout = float(step.get("timeout", 3000))
    log_path = logdir / f"{name}.log"
    started = time.time()
    rc: Optional[int] = None
    note = ""
    with open(log_path, "wb") as log:
        try:
            rc = subprocess.run(
                argv, cwd=cwd, env=env, stdout=log, stderr=subprocess.STDOUT,
                timeout=timeout,
            ).returncode
        except subprocess.TimeoutExpired:
            rc, note = -1, f"timeout after {timeout:.0f}s"
        except OSError as exc:
            rc, note = -2, f"spawn failed: {exc}"
    tail = ""
    try:
        lines = log_path.read_text(errors="replace").strip().splitlines()
        tail = lines[-1][:300] if lines else ""
    except OSError:
        pass
    return {
        "name": name,
        "argv": argv[1:],  # drop the interpreter path (machine-specific)
        "rc": rc,
        "seconds": round(time.time() - started, 1),
        "log": str(log_path),
        "note": note,
        "tail": tail,
    }


def run_battery(
    spec_path: Path, wait_pid: Optional[int] = None, resume: bool = True
) -> Dict[str, Any]:
    spec = json.loads(spec_path.read_text())
    spec_dir = spec_path.resolve().parent
    logdir = (spec_dir / spec.get("logdir", "battery_logs")).resolve()
    logdir.mkdir(parents=True, exist_ok=True)
    manifest_path = logdir / "battery_manifest.json"
    manifest = _load_manifest(manifest_path) if resume else {"steps": []}
    done = _ok_names(manifest)

    pid = wait_pid if wait_pid is not None else spec.get("wait_pid")
    if pid:
        print(f"[battery] waiting for pid {pid} ...", flush=True)
        wait_for_pid(int(pid))

    env = dict(os.environ)
    env["PYTHONPATH"] = _repo_pythonpath()

    steps: List[Dict[str, Any]] = spec["steps"]
    for step in steps:
        if step["name"] in done:
            print(f"[battery] {step['name']}: already ok, skipping", flush=True)
            continue
        print(f"[battery] {step['name']}: start", flush=True)
        result = run_step(step, spec_dir, logdir, env)
        # Drop any stale earlier record of this step, then append.
        manifest["steps"] = [
            s for s in manifest["steps"] if s["name"] != result["name"]
        ] + [result]
        manifest_path.write_text(json.dumps(manifest, indent=1))
        status = "ok" if result["rc"] == 0 else f"FAILED rc={result['rc']}"
        print(
            f"[battery] {step['name']}: {status} ({result['seconds']}s)",
            flush=True,
        )

    ok_now = _ok_names(manifest)
    manifest["ok"] = all(step["name"] in ok_now for step in steps)
    manifest_path.write_text(json.dumps(manifest, indent=1))
    return manifest


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--spec", required=True, type=Path)
    ap.add_argument("--wait-pid", type=int, default=None)
    ap.add_argument(
        "--no-resume", action="store_true",
        help="re-run every step even if an earlier manifest marked it ok",
    )
    args = ap.parse_args()
    manifest = run_battery(args.spec, args.wait_pid, resume=not args.no_resume)
    failed = [s["name"] for s in manifest["steps"] if s["rc"] != 0]
    print(json.dumps({"battery_ok": manifest["ok"], "failed": failed}))
    sys.exit(0 if manifest["ok"] else 1)


if __name__ == "__main__":
    main()
