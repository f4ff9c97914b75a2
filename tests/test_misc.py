"""Modes, monitor, and small utility coverage."""

import time

import pytest

from emosaic_tpu.modes import MODE_TO_N, Mode
from emosaic_tpu.monitor import MemoryMonitor, get_current_rss_kb


def test_mode_table():
    # src/main.rs:400-413 monomorphization table
    assert MODE_TO_N == {
        "1": 1, "2": 4, "3": 9, "4": 16, "5": 25, "6": 36,
        "8": 64, "16": 256, "32": 1024, "64": 4096, "128": 16384,
    }
    assert Mode.M2.dim == 2
    assert Mode.M128.n_cells == 16384
    assert Mode.M32.label == "32x32 (N=1024)"
    assert Mode.RANDOM.label == "Random"
    with pytest.raises(ValueError):
        Mode.RANDOM.n_cells


def test_memory_monitor():
    rss = get_current_rss_kb()
    assert rss is not None and rss > 1000  # Linux /proc path
    m = MemoryMonitor().start()
    time.sleep(0.25)
    m.stop()
    assert float(m.peak_mb()) > 1.0
