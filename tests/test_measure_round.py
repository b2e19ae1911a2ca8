"""measure_round: child retry discipline + artifact merging (the
round-3 lesson — official numbers must be un-loseable and diagnosable)."""
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                "tools"))
import measure_round as mr  # noqa: E402


def test_run_child_parses_last_json_and_retries(tmp_path):
    """A child that dies (rc!=0, no JSON) is retried; the last JSON line
    wins; non-TPU results are rejected when want_tpu; diagnostics carry
    the stderr tail."""
    script = tmp_path / "child.py"
    marker = tmp_path / "attempts"
    script.write_text("""
import json, os, sys
n = int(open(r"%s").read()) if os.path.exists(r"%s") else 0
open(r"%s", "w").write(str(n + 1))
if n == 0:
    print("some diagnostic", file=sys.stderr)
    sys.exit(3)                     # first attempt dies
if n == 1:
    print(json.dumps({"value": 1.0, "device": "cpu"}))
    sys.exit(0)                     # second: lands but not TPU
print("# progress line")
print(json.dumps({"value": 1.0, "device": "tpu"}))
print(json.dumps({"value": 2.0, "device": "tpu"}))   # last line wins
""" % (marker, marker, marker))
    r, diags = mr._run_child([sys.executable, str(script)], timeout_s=30,
                             want_tpu=True, retries=4, label="t")
    assert r is not None and r["value"] == 2.0 and r["attempts"] == 3
    assert len(diags) == 2
    assert diags[0]["rc"] == 3
    assert diags[0]["stderr_tail"] == ["some diagnostic"]
    assert diags[1]["device"] == "cpu"      # rejected non-TPU result


def test_run_child_timeout_is_a_failure(tmp_path):
    script = tmp_path / "hang.py"
    script.write_text("import time\ntime.sleep(60)\n")
    r, diags = mr._run_child([sys.executable, str(script)], timeout_s=1,
                             want_tpu=True, retries=2, label="t")
    assert r is None
    assert [d["rc"] for d in diags] == ["timeout", "timeout"]


def test_artifact_merge_preserves_other_sections(tmp_path):
    """--skip re-measures update the existing artifact in place instead
    of discarding the sections they skipped (run main() for real with
    everything skipped)."""
    out = tmp_path / "M.json"
    out.write_text(json.dumps({"round": 7, "unix_time": 1,
                               "bench": {"value": 42.0},
                               "receiver_median_msps": 99.0}))
    tool = os.path.join(os.path.dirname(mr.__file__), "measure_round.py")
    p = subprocess.run(
        [sys.executable, tool, "--round", "7", "--out", str(out),
         "--skip", "bench,acq,receiver,ttff"],
        capture_output=True, timeout=60)
    assert p.returncode == 0, p.stderr
    final = json.loads(out.read_text())
    assert final["bench"]["value"] == 42.0          # skipped: preserved
    assert final["receiver_median_msps"] == 99.0
    assert final["unix_time"] != 1                  # re-stamped
