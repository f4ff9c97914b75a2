"""bench.py must emit a parseable, stale-marked JSON line when the device
backend cannot initialize at all (VERDICT r3 weak #1: round 3's bench
exited rc=1 with no line during the axon outage).

The simulation forces jax onto the 'tpu' platform, which has no local
libtpu in this image, so the first device op raises the same
"Unable to initialize backend" RuntimeError class the outage produced.
"""

import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).parent.parent


def test_bench_emits_stale_line_on_backend_init_failure():
    code = (
        "import jax\n"
        "jax.config.update('jax_platforms', 'tpu')\n"
        "import runpy\n"
        f"runpy.run_path({str(REPO / 'bench.py')!r}, run_name='__main__')\n"
    )
    res = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        timeout=300,
        cwd=REPO,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    line = res.stdout.strip().splitlines()[-1]
    out = json.loads(line)
    assert out["stale"] is True
    assert "stale_reason" in out and out["stale_reason"]
    assert out["metric"] == "gigapixel_mosaic_composited_megapixels_per_sec"
    assert isinstance(out["value"], (int, float)) and out["value"] > 0


def test_bench_assertion_failure_is_not_reported_healthy():
    """An AssertionError is bench's own on-device correctness check
    failing — a regression, not an outage. The parseable stale line must
    still appear (the driver parses stdout), but rc must be nonzero so
    the chain records a failure instead of healthy-but-stale."""
    import os

    env = dict(os.environ)
    env["EMOSAIC_BENCH_SELFTEST_RAISE"] = "sharded mismatch"
    res = subprocess.run(
        [sys.executable, str(REPO / "bench.py")],
        capture_output=True,
        text=True,
        timeout=300,
        cwd=REPO,
        env=env,
    )
    assert res.returncode == 1, (res.returncode, res.stderr[-2000:])
    out = json.loads(res.stdout.strip().splitlines()[-1])
    assert out["stale"] is True
    assert "AssertionError" in out["stale_reason"]


def test_rate_via_difference_spread(monkeypatch):
    """VERDICT r4 #4: the difference-method timer reports (min, median)
    over _REPS reps so round-over-round comparisons can tell a real
    regression from jitter."""
    import importlib.util

    spec = importlib.util.spec_from_file_location("bench", REPO / "bench.py")
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    assert bench._REPS >= 5  # the protocol floor

    times = {1: [1.0, 1.2, 1.1, 1.3, 1.05], 3: [2.0, 2.6, 2.2, 2.4, 2.1]}
    calls = {1: 0, 3: 0}

    def fn(k):
        v = times[k][calls[k] % 5]
        calls[k] += 1
        return v

    monkeypatch.setattr(bench, "_REPS", 5)
    lo, med = bench._rate_via_difference(fn, 1, 3)
    assert abs(lo - (2.0 - 1.0) / 2) < 1e-12
    assert abs(med - (2.2 - 1.1) / 2) < 1e-12
    assert bench._median([3.0, 1.0, 2.0]) == 2.0
    assert bench._median([4.0, 1.0, 2.0, 3.0]) == 2.5
