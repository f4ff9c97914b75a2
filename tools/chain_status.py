#!/usr/bin/env python
"""One-command status of the detached outage-recovery chain.

The on-chip proof chain (CLAUDE.md rule 9; memory note round3-device-chain)
runs as detached self-bounded watchers. This prints, without touching the
device: probe cadence and last claim attempt, which chain links have fired
(and their rc), which watchers are still alive, and the key results each
landed artifact carries. Safe to run any time.
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# (name, marker_log, marker_regex, pidfile)
LINKS = [
    ("fixproof", "/tmp/claimloop.log", r"fixproof rc=(\d+)", "/tmp/claimloop.pid"),
    ("bench", "/tmp/chain.log", r"bench rc=(\d+)", "/tmp/chain.pid"),
    ("streamproof", "/tmp/chain2.log", r"streamproof rc=(\d+)", "/tmp/chain2.pid"),
    ("e2e", "/tmp/chain3.log", r"e2e rc=(\d+)", "/tmp/chain3.pid"),
    ("wc_sweep", "/tmp/chain4.log", r"wc rc=(\d+)", "/tmp/chain4.pid"),
    ("hazards", "/tmp/chain5.log", r"hazards rc=(\d+)", "/tmp/chain5.pid"),
    ("serve_warm", "/tmp/chain6.log", r"serve rc=(\d+)", "/tmp/chain6.pid"),
]


def _read(path: str) -> str:
    try:
        with open(path, "r", errors="replace") as f:
            return f.read()
    except OSError:
        return ""


def _alive(pidfile: str) -> str:
    pid = _read(pidfile).strip()
    if not pid:
        return "no-pidfile"
    try:
        os.kill(int(pid), 0)
        return f"alive({pid})"
    except (OSError, ValueError):
        return f"dead({pid})"


def _last_probe() -> str:
    txt = _read("/tmp/claimloop.log")
    probes = re.findall(r"=== probe (\d+) (\S+) ===", txt)
    gave_up = "gave up" in txt
    claimed = "claim ok" in txt
    out = []
    if probes:
        out.append(f"claimloop probe {probes[-1][0]} at {probes[-1][1]}")
    if claimed:
        out.append("CLAIMED")
    if gave_up:
        out.append("claimloop exhausted")
    dtxt = _read("/tmp/chain_driver.log")
    dprobes = re.findall(r"\[driver\] probe (\d+) (\S+)", dtxt)
    if dprobes:
        out.append(f"driver probe {dprobes[-1][0]} at {dprobes[-1][1]}")
    if "[driver] claim ok" in dtxt:
        out.append("DRIVER CLAIMED")
    d2txt = _read("/tmp/chain_driver2.log")
    d2probes = re.findall(r"\[driver2\] probe (\d+) (\S+)", d2txt)
    if d2probes:
        out.append(f"driver2 probe {d2probes[-1][0]} at {d2probes[-1][1]}")
    if "[driver2] claim ok" in d2txt:
        out.append("DRIVER2 CLAIMED")
    stxt = _read("/tmp/seqchain.log")
    ssteps = re.findall(r"\[seq\] (\S+(?: \S+)*?) (\d\d:\d\d:\d\d)", stxt)
    if ssteps:
        out.append(f"seqchain: {ssteps[-1][0]} at {ssteps[-1][1]}")
    return "; ".join(out) or "no probe activity"


def _scale_keys() -> dict:
    p = os.path.join(REPO, "SCALE_r03.json")
    try:
        data = json.loads(_read(p) or "{}")
    except json.JSONDecodeError:
        return {}
    out = {}
    for k in ("L2_ad2M", "N_stream6p8G"):
        v = data.get(k)
        if isinstance(v, dict):
            out[k] = {
                kk: v[kk]
                for kk in (
                    "brute_top1_spot_ok",
                    "ok",
                    "prefetch_bit_equal_serial",
                    "prefetch_error",
                    "note",
                )
                if kk in v
            }
        elif v is not None:
            out[k] = v
    return out


def main() -> int:
    print(f"chain status at {time.strftime('%F %T')}")
    print(f"  probes: {_last_probe()}")
    drv = _alive("/tmp/chain_driver.pid")
    drv2 = _alive("/tmp/chain_driver2.pid")
    seq = _alive("/tmp/seqchain.pid")
    print(f"  driver: {drv}; driver2: {drv2}; seqchain: {seq}")
    for name, log, rx, pidf in LINKS:
        m = re.findall(rx, _read(log))
        state = f"DONE rc={m[-1]}" if m else f"waiting [{_alive(pidf)}]"
        print(f"  {name:12s} {state}")
    sk = _scale_keys()
    if sk:
        print("  SCALE_r03 keys:")
        for k, v in sk.items():
            print(f"    {k}: {json.dumps(v)}")
    # last bench line, if a live bench ran
    btxt = _read("/tmp/bench_r9.log")
    for line in reversed(btxt.splitlines()):
        if line.startswith("{") and '"metric"' in line:
            print(f"  bench line: {line[:240]}")
            break
    # one bounded, non-hanging device hint: is an axon claim plausibly live?
    # (tpu_probe runs are the authority; this just surfaces the newest log)
    for p in ("/tmp/probe_d.log", "/tmp/probe.log"):
        t = _read(p).strip().splitlines()
        if t:
            print(f"  {p}: {t[-1][:160]}")
            break
    return 0


if __name__ == "__main__":
    try:
        sys.exit(main())
    except BrokenPipeError:  # e.g. `chain_status.py | head`
        sys.exit(0)
