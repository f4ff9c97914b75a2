#!/usr/bin/env python3
"""One-claim driver for the two runs that close the 2M-row thread
(device claims are minutes each through the tunnel — batch them):

  M_dma_limit  the tpu_r21_dmalimit.py probe: plant a self-indexing
               6.1 GB single-buffer library and measure which wrap width
               (2^31 / 2^32) the Pallas dynamic .at[row] offsets alias
               to — the bug behind L2_ad2M's failed brute spot check.
  L2_ad2M      re-run the 2M-row adaptive envelope phase through the
               BANKED library path (_lib_banks splits at
               _DMA_LIB_BYTES_MAX) and require the brute top-1 spot
               check to pass this time.

Phases ordered diagnosis-first: the probe needs the guard disarmed (it
measures the failure on purpose); the guard is restored before the
banked proof so the production path runs exactly as shipped.
"""

import os
import sys
import threading
import time

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from emosaic_tpu.ops import distance  # noqa: E402

_T0 = time.time()


def log(msg):
    print(f"[fixproof {time.time() - _T0:6.1f}s] {msg}", flush=True)


def main():
    def watchdog():
        time.sleep(3300)
        log("watchdog: 55 min elapsed; exiting with partial results")
        os._exit(0)

    threading.Thread(target=watchdog, daemon=True).start()
    dev = jax.devices()[0]
    log(f"device: {dev.platform} {dev.device_kind}")
    jax.device_get((jnp.ones((8, 128)) * 2).ravel()[0])
    log("probe ok")

    guard = distance._DMA_LIB_BYTES_MAX
    sys.path.insert(0, "/root/repo/tools")
    import tpu_r21_dmalimit as m21  # disarms the guard at import

    try:
        m21.main()
    except Exception:
        import traceback

        traceback.print_exc()
    finally:
        distance._DMA_LIB_BYTES_MAX = guard
    log("diagnosis done; guard restored; starting banked L2 re-run")

    import json

    import tpu_r18_envelope as r18

    try:
        with open(r18.OUT) as f:
            r18.RESULTS.update(json.load(f))
    except (OSError, ValueError):
        pass
    try:
        r18.phase_ad2M()
        r18.RESULTS.pop("L_error", None)
        with open(r18.OUT, "w") as f:
            json.dump(r18.RESULTS, f, indent=1)
    except Exception as e:
        import traceback

        traceback.print_exc()
        r18.save("L_error", {"error": repr(e)[:500]})
    log("all phases done")


if __name__ == "__main__":
    sys.exit(main() or 0)
