"""Multi-controller (multi-process) validation.

tests/test_sharding.py proves the sharded kernels on a single-process
8-device virtual mesh; this file proves they survive REAL process
boundaries: tools/cpu_multiproc_dryrun.py joins 2 OS processes x 4
virtual CPU devices into one global mesh via jax.distributed (gloo
transport), so every collective in parallel/sharded.py genuinely
crosses a transport — the closest topology to a TPU pod this 1-host
environment can express. Reference analogue: none (single-host rayon,
rendering.rs:68-70).
"""

import os
import subprocess
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).parent.parent


def test_multiprocess_dryrun_bit_identical():
    """2 processes x 4 devices: every sharded kernel bit-equals its
    single-device oracle in BOTH ranks, and the ranks agree on the
    fetched output bytes. ~60 s (two fresh CPU-XLA child processes)."""
    env = {
        k: v for k, v in os.environ.items() if k != "XLA_FLAGS"
    }  # the tool provisions its own per-child device count
    res = subprocess.run(
        [sys.executable, str(REPO / "tools" / "cpu_multiproc_dryrun.py")],
        capture_output=True,
        text=True,
        timeout=500,
        cwd=REPO,
        env=env,
    )
    assert res.returncode == 0, res.stdout[-4000:] + res.stderr[-2000:]
    assert "MULTIPROC_DRYRUN OK" in res.stdout
    for rank in (0, 1):
        assert f"[rank {rank}] MULTIPROC_OK" in res.stdout


def test_fetch_single_process_passthrough():
    """fetch() must be a plain device_get for fully-addressable arrays
    (no collective, numpy pass-through for host arrays)."""
    import jax.numpy as jnp

    from emosaic_tpu.parallel.distributed import fetch

    a = np.arange(6).reshape(2, 3)
    assert fetch(a) is a
    x = jnp.arange(6).reshape(2, 3)
    np.testing.assert_array_equal(fetch(x), a)


def test_init_distributed_no_cluster_is_noop():
    """Without a cluster environment, init_distributed must not raise
    and must leave the process single-controller."""
    import jax

    from emosaic_tpu.parallel.distributed import init_distributed, is_multiprocess

    for k in (
        "EMOSAIC_COORDINATOR",
        "EMOSAIC_NUM_PROCESSES",
        "EMOSAIC_PROCESS_ID",
    ):
        assert k not in os.environ, f"{k} set in the test env"
    init_distributed()
    assert not is_multiprocess()
    assert jax.process_count() == 1
