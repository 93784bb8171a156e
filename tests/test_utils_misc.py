"""Small utilities: prefetch loader ordering/errors, step timer, meters."""

import time

import numpy as np
import pytest

from haff_tpu.data.loader import PrefetchLoader
from haff_tpu.train.metrics import AverageMeter, ProgressMeter
from haff_tpu.utils.profiling import StepTimer


def test_prefetch_loader_order_and_count():
    made = []

    def make(i):
        made.append(i)
        return {"i": i}

    out = [b["i"] for b in PrefetchLoader(make, 5, prefetch=2)]
    assert out == [0, 1, 2, 3, 4]
    assert made == [0, 1, 2, 3, 4]


def test_prefetch_loader_propagates_errors():
    def make(i):
        if i == 2:
            raise ValueError("boom")
        return {"i": i}

    loader = PrefetchLoader(make, 5, prefetch=2)
    with pytest.raises(ValueError, match="boom"):
        list(loader)


def test_average_meter():
    m = AverageMeter("loss", ":.2f")
    m.update(2.0)
    m.update(4.0, n=3)
    assert m.val == 4.0
    assert abs(m.avg - 3.5) < 1e-9
    assert "loss" in str(m)
    ProgressMeter(10, [m], prefix="E0 ").display(1)  # smoke


def test_step_timer():
    t = StepTimer()
    time.sleep(0.01)
    dt = t.tick(sync_value=np.asarray([1.0]))
    assert dt >= 0.01
    assert t.steps == 1 and t.mean > 0
