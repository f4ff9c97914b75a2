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


def test_make_mesh():
    import jax
    from emosaic_tpu.parallel import make_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    m = make_mesh(8, model=2)
    assert m.shape == {"data": 4, "model": 2}
    m1 = make_mesh(4)
    assert m1.shape == {"data": 4, "model": 1}
    with pytest.raises(ValueError, match="not divisible"):
        make_mesh(6, model=4)


def test_main_module_entry(tmp_path, monkeypatch):
    # `python -m emosaic_tpu` surface exists
    import emosaic_tpu.__main__  # noqa: F401
