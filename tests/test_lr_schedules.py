"""LR-schedule parity vs reference LambdaLR values."""

import os

import numpy as np
import pytest

from showo_tpu.training.lr_schedules import get_lr_schedule

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "lr_schedules.npz")
BASE_LR = 0.1


@pytest.fixture(scope="module")
def golden():
    if not os.path.exists(GOLDEN):
        pytest.skip("run tools/make_golden_lr.py")
    return np.load(GOLDEN)


CASES = [
    ("constant", {}),
    ("constant_with_warmup", dict(num_warmup_steps=10)),
    ("linear", dict(num_warmup_steps=10, num_training_steps=100)),
    ("cosine", dict(num_warmup_steps=10, num_training_steps=100)),
    ("cosine_with_restarts", dict(num_warmup_steps=10,
                                  num_training_steps=100, num_cycles=3)),
    ("polynomial", dict(num_warmup_steps=10, num_training_steps=100,
                        power=2.0)),
]


@pytest.mark.parametrize("name,kw", CASES)
def test_schedule_parity(golden, name, kw):
    fn = get_lr_schedule(name, BASE_LR, **kw)
    steps = golden["steps"]
    got = np.asarray([float(fn(s)) for s in steps])
    np.testing.assert_allclose(got, golden[name], atol=1e-7, rtol=1e-5,
                               err_msg=name)
