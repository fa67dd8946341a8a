"""Golden LR-schedule fixtures from the reference (models/lr_schedulers.py).

    python tools/make_golden_lr.py
"""

import importlib.util
import sys

import numpy as np
import torch

import types  # noqa: E402
import logging as _pylog  # noqa: E402

pkg = types.ModuleType("reflr")
pkg.__path__ = ["/root/reference/models"]
sys.modules["reflr"] = pkg
logmod = types.ModuleType("reflr.logging")
logmod.get_logger = lambda name=None: _pylog.getLogger(name or "x")
sys.modules["reflr.logging"] = logmod

spec = importlib.util.spec_from_file_location(
    "reflr.lr_schedulers", "/root/reference/models/lr_schedulers.py")
ref_lr = importlib.util.module_from_spec(spec)
sys.modules["reflr.lr_schedulers"] = ref_lr
spec.loader.exec_module(ref_lr)

BASE_LR = 0.1
STEPS = list(range(0, 120, 7))


def run(name, **kw):
    opt = torch.optim.SGD([torch.nn.Parameter(torch.zeros(1))], lr=BASE_LR)
    sched = ref_lr.get_scheduler(name, optimizer=opt, **kw)
    lrs = []
    for s in range(max(STEPS) + 1):
        if s in STEPS:
            lrs.append(opt.param_groups[0]["lr"])
        opt.step()
        sched.step()
    return np.asarray(lrs)


def main() -> None:
    out = {"steps": np.asarray(STEPS)}
    out["constant"] = run("constant")
    out["constant_with_warmup"] = run("constant_with_warmup",
                                      num_warmup_steps=10)
    out["linear"] = run("linear", num_warmup_steps=10, num_training_steps=100)
    out["cosine"] = run("cosine", num_warmup_steps=10, num_training_steps=100)
    out["cosine_with_restarts"] = run("cosine_with_restarts",
                                      num_warmup_steps=10,
                                      num_training_steps=100, num_cycles=3)
    out["polynomial"] = run("polynomial", num_warmup_steps=10,
                            num_training_steps=100, power=2.0)
    np.savez_compressed("tests/golden/lr_schedules.npz", **out)
    print("wrote tests/golden/lr_schedules.npz")


if __name__ == "__main__":
    main()
