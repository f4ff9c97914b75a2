#!/usr/bin/env python3
"""Minimal device-claim probe (CLAUDE.md rule 3): one tiny synced op,
self-bounded — the watchdog exits the process on its own so no external
SIGTERM ever lands mid-claim (rule 2). Prints CLAIM_OK on success.

usage: tpu_probe.py [timeout_s]
"""

import os
import sys
import threading
import time

sys.path.insert(0, "/root/repo")


def main():
    limit = float(sys.argv[1]) if len(sys.argv) > 1 else 600.0

    def watchdog():
        time.sleep(limit)
        print(f"CLAIM_TIMEOUT after {limit:.0f}s", flush=True)
        os._exit(3)

    threading.Thread(target=watchdog, daemon=True).start()
    t0 = time.time()
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    print(f"devices ok at {time.time() - t0:.1f}s: {dev.device_kind}", flush=True)
    v = jax.device_get((jnp.ones((8, 128)) * 2).ravel()[0])
    print(f"CLAIM_OK at {time.time() - t0:.1f}s (v={v})", flush=True)


if __name__ == "__main__":
    main()
