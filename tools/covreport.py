"""Report uncovered executable lines from a tools/covplug.py dump.

Executable lines are derived from compiled code objects (co_lines over
the module's code tree), so docstrings/comments/blank lines don't count
against coverage. Run:

    python tools/covreport.py /tmp/emosaic_cov.json [--min N] [--show FILE]

--min N     only list files with more than N uncovered lines (default 0)
--show F    print the uncovered line numbers (grouped into ranges) and
            source for files whose path contains F
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = os.path.join(REPO, "emosaic_tpu")

#: files whose code mostly runs in test-spawned SUBPROCESSES the parent
#: monitor can't see — flagged in the report instead of read as gaps
SUBPROCESS_HEAVY = {
    "aws/tile_manager.py": "runs as a CLI (subprocess tests)",
    "serve.py": "main()/argparse executed via the subprocess entry test",
    "parallel/distributed.py": "multi-controller branches run in dryrun ranks",
}


def executable_lines(path: str) -> set[int]:
    with open(path, "r") as f:
        src = f.read()
    try:
        code = compile(src, path, "exec")
    except SyntaxError:
        return set()
    lines: set[int] = set()
    stack = [code]
    while stack:
        co = stack.pop()
        for _, _, ln in co.co_lines():
            if ln is not None:
                lines.add(ln)
        for const in co.co_consts:
            if hasattr(const, "co_lines"):
                stack.append(const)
    return lines


def ranges(nums: list[int]) -> str:
    out = []
    i = 0
    while i < len(nums):
        j = i
        while j + 1 < len(nums) and nums[j + 1] == nums[j] + 1:
            j += 1
        out.append(str(nums[i]) if i == j else f"{nums[i]}-{nums[j]}")
        i = j + 1
    return ",".join(out)


def main() -> int:
    dump = sys.argv[1] if len(sys.argv) > 1 else "/tmp/emosaic_cov.json"
    min_n = int(sys.argv[sys.argv.index("--min") + 1]) if "--min" in sys.argv else 0
    show = sys.argv[sys.argv.index("--show") + 1] if "--show" in sys.argv else None
    with open(dump) as f:
        covered = {k: set(v) for k, v in json.load(f).items()}

    rows = []
    tot_exec = tot_cov = 0
    for dirpath, _, files in os.walk(PKG):
        for name in sorted(files):
            if not name.endswith(".py"):
                continue
            path = os.path.join(dirpath, name)
            ex = executable_lines(path)
            if not ex:
                continue
            cov = covered.get(path, set()) & ex
            tot_exec += len(ex)
            tot_cov += len(cov)
            miss = sorted(ex - cov)
            rel = os.path.relpath(path, PKG)
            rows.append((len(miss), rel, len(ex), miss))
    rows.sort(reverse=True)
    print(f"total: {tot_cov}/{tot_exec} executable lines covered "
          f"({100.0 * tot_cov / max(1, tot_exec):.1f}%)")
    for n_miss, rel, n_ex, miss in rows:
        if n_miss <= min_n:
            continue
        note = f"  [{SUBPROCESS_HEAVY[rel]}]" if rel in SUBPROCESS_HEAVY else ""
        print(f"  {n_miss:4d}/{n_ex:4d} uncovered  {rel}{note}")
        if show and show in rel:
            print(f"       lines: {ranges(miss)}")
            with open(os.path.join(PKG, rel)) as f:
                src = f.readlines()
            for ln in miss:
                print(f"       {ln:5d}: {src[ln - 1].rstrip()}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
