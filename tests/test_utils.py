"""Unit tests for utils/: StepTimer windows, atomic results.json writes."""

import json
import os
import time

import numpy as np

from domain_transfer_gan_tpu.utils import StepTimer
from domain_transfer_gan_tpu.utils.artifacts import save_results


def test_steptimer_window_accumulates_and_resets():
    t = StepTimer()
    for _ in range(4):
        t.tick(8)
    time.sleep(0.01)
    sec_per_item, items_per_sec, dt, steps = t.window(
        sync_array=np.ones((2, 2)))
    assert steps == 4
    assert dt >= 0.01
    assert sec_per_item > 0 and items_per_sec > 0
    assert abs(sec_per_item * 32 - dt) < 1e-6  # 4 ticks x 8 items
    # window resets
    t.tick(8)
    _, _, _, steps2 = t.window()
    assert steps2 == 1


def test_save_results_atomic(tmp_path):
    """results.json is rewritten every eval; the write must be atomic so a
    crash mid-write can't leave truncated JSON that bricks
    --continue_train's unguarded json.load on resume."""
    save_results(str(tmp_path), {"mse_A": [1.0, 2.0]})
    p = tmp_path / "results.json"
    assert json.load(open(str(p))) == {"mse_A": [1.0, 2.0]}
    # overwrite keeps the file parseable and leaves no temp debris
    save_results(str(tmp_path), {"mse_A": [1.0, 2.0, 3.0]})
    assert json.load(open(str(p)))["mse_A"][-1] == 3.0
    assert [f for f in os.listdir(str(tmp_path)) if f.endswith(".tmp")] == []
