"""Zero-dependency line coverage for the test suite (sys.monitoring).

The image has no coverage/pytest-cov; CPython 3.12's sys.monitoring
gives cheap line events instead: each (code object, line) location is
disabled after its first hit, so steady-state overhead is near zero and
the 1-core CI suite stays runnable.

Usage:
    EMOSAIC_COV_OUT=/tmp/cov.json python -m pytest tests/ -q -p tools.covplug
    python tools/covreport.py /tmp/cov.json        # uncovered-line report

Caveats (inherent to line coverage): lines in subprocesses the tests
spawn (bench outage children, multiproc dryrun ranks, prep pool
workers) are NOT seen by the parent's monitor — the report
(tools/covreport.py) says so next to the files dominated by those.
"""

from __future__ import annotations

import atexit
import json
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_PREFIX = os.path.join(_REPO, "emosaic_tpu") + os.sep
_OUT = os.environ.get("EMOSAIC_COV_OUT", "/tmp/emosaic_cov.json")

_mon = sys.monitoring
_TOOL = _mon.COVERAGE_ID
_seen: set[tuple[str, int]] = set()


def _line_cb(code, lineno, _seen=_seen, _prefix=_PREFIX, _disable=_mon.DISABLE):
    # module globals are purged to None mid-interpreter-shutdown while
    # late callbacks still fire — everything the callback touches is
    # bound as a default arg so it survives the purge (the dump already
    # ran by then; observed: AttributeError on _mon.DISABLE at teardown)
    fn = code.co_filename
    if fn.startswith(_prefix):
        _seen.add((fn, lineno))
    # either way, never fire again for this exact location
    return _disable


def _dump():
    by_file: dict[str, list[int]] = {}
    for fn, ln in _seen:
        by_file.setdefault(fn, []).append(ln)
    for v in by_file.values():
        v.sort()
    with open(_OUT, "w") as f:
        json.dump(by_file, f)
    print(
        f"[covplug] {sum(len(v) for v in by_file.values())} lines in "
        f"{len(by_file)} files -> {_OUT}",
        file=sys.stderr,
    )


_mon.use_tool_id(_TOOL, "emosaic-cov")
_mon.register_callback(_TOOL, _mon.events.LINE, _line_cb)
_mon.set_events(_TOOL, _mon.events.LINE)
atexit.register(_dump)
