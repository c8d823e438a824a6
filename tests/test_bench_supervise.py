"""bench.py wedge resilience (VERDICT r4 #9): a wedged tunnel on the
first attempt must not cost the round's perf evidence — the supervisor
retries in a fresh process (fresh relay connection) and ships the
second attempt's record."""
import json
import os
import subprocess
import sys


def _run_bench(tmp_path, extra_env):
    env = dict(os.environ)
    env.update(extra_env)
    env["SWARMMAP_BENCH_BACKOFF_S"] = "0"
    r = subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(__file__),
                                      os.pardir, "bench.py")],
        capture_output=True, text=True, timeout=300, env=env)
    lines = [ln for ln in r.stdout.splitlines() if ln.startswith("{")]
    assert lines, (r.stdout, r.stderr)
    return r.returncode, json.loads(lines[-1])


def test_supervisor_retries_past_injected_wedge(tmp_path):
    marker = str(tmp_path / "wedged_once")
    rc, rec = _run_bench(tmp_path, {
        "SWARMMAP_BENCH_WEDGE_ONCE": marker,
        "SWARMMAP_BENCH_FAKE_OK": "1",
    })
    assert rc == 0
    assert rec["value"] == 123.0
    assert rec["bench_attempt"] == 2  # attempt 1 wedged, attempt 2 shipped
    assert os.path.exists(marker)


def test_supervisor_clean_first_attempt(tmp_path):
    rc, rec = _run_bench(tmp_path, {"SWARMMAP_BENCH_FAKE_OK": "1"})
    assert rc == 0
    assert rec["value"] == 123.0
    assert rec["bench_attempt"] == 1
