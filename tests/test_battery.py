"""End-to-end test of the battery runner (adascale/tools/battery.py).

Guards against the round-4 failure class: evidence batteries silently dying
to environment bugs (missing PYTHONPATH) or losing completed results to a
mid-battery crash.
"""
import json
import subprocess
import sys
from pathlib import Path

from adascale.tools.battery import run_battery


def _write_spec(tmp_path: Path, steps) -> Path:
    spec = {"logdir": "logs", "steps": steps}
    p = tmp_path / "battery.json"
    p.write_text(json.dumps(spec))
    return p


def test_stub_battery_manifest_and_logs(tmp_path):
    spec = _write_spec(
        tmp_path,
        [
            # Imports adascale in a child with a scrubbed PYTHONPATH: the
            # runner must inject the repo root itself (the round-4 bug).
            {
                "name": "import_check",
                "module": "adascale.tools.battery",
                "args": ["--help"],
                "timeout": 60,
            },
            {
                "name": "boom",
                "module": "adascale._no_such_module_",
                "timeout": 60,
            },
        ],
    )
    manifest = run_battery(spec)
    assert manifest["ok"] is False
    by_name = {s["name"]: s for s in manifest["steps"]}
    assert by_name["import_check"]["rc"] == 0
    assert by_name["boom"]["rc"] != 0
    # Logs exist and the manifest survives on disk.
    logdir = tmp_path / "logs"
    assert (logdir / "import_check.log").exists()
    assert (logdir / "boom.log").exists()
    on_disk = json.loads((logdir / "battery_manifest.json").read_text())
    assert on_disk["ok"] is False


def test_battery_resume_skips_ok_steps(tmp_path):
    steps = [
        {
            "name": "once",
            "module": "adascale.tools.battery",
            "args": ["--help"],
            "timeout": 60,
        }
    ]
    spec = _write_spec(tmp_path, steps)
    first = run_battery(spec)
    assert first["ok"] is True
    stamp = (tmp_path / "logs" / "once.log").stat().st_mtime_ns
    second = run_battery(spec)  # resume: must not re-run the ok step
    assert second["ok"] is True
    assert (tmp_path / "logs" / "once.log").stat().st_mtime_ns == stamp


def test_battery_cli_exit_code(tmp_path):
    spec = _write_spec(
        tmp_path,
        [
            {
                "name": "fails",
                "module": "adascale._no_such_module_",
                "timeout": 60,
            }
        ],
    )
    proc = subprocess.run(
        [sys.executable, "-m", "adascale.tools.battery", "--spec", str(spec)],
        capture_output=True,
        text=True,
    )
    assert proc.returncode == 1
    assert '"battery_ok": false' in proc.stdout
