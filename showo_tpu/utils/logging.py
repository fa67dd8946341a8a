"""Console logging + training meters + optional wandb.

Replaces the reference's vendored HF logging shim (models/logging.py) with
stdlib logging, and ports AverageMeter / throughput accounting
(training/utils.py:160-176, train.py:637-650).  wandb is optional and
no-ops when unavailable or disabled.
"""

from __future__ import annotations

import logging
import os
import sys
import time
from typing import Any, Dict, Optional

_DEFAULT_LEVEL = os.environ.get("SHOWO_TPU_VERBOSITY", "info").upper()


def get_logger(name: str = "showo_tpu") -> logging.Logger:
    logger = logging.getLogger(name)
    if not logger.handlers:
        h = logging.StreamHandler(sys.stderr)
        h.setFormatter(logging.Formatter(
            "%(asctime)s %(levelname)s %(name)s: %(message)s"))
        logger.addHandler(h)
        logger.setLevel(getattr(logging, _DEFAULT_LEVEL, logging.INFO))
        logger.propagate = False
    return logger


class AverageMeter:
    """training/utils.py:160-176."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val, n: int = 1):
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / max(self.count, 1)


class Stopwatch:
    def __init__(self):
        self.t = time.perf_counter()

    def lap(self) -> float:
        now = time.perf_counter()
        dt = now - self.t
        self.t = now
        return dt


def resolve_wandb_run_id(config, output_dir: str, enabled: bool = True):
    """The reference's wandb run-id resume logic (train.py:129-151,
    inference_t2i.py:40-53): reuse config.wandb.run_id when set; otherwise
    reattach to the id persisted by a previous invocation of the same
    output_dir; otherwise generate a fresh id and persist it.  Returns
    (run_id, resume_flag).

    With enabled=False nothing is read or written — constructing a
    trainer must not create output_dir or persist a run id as a side
    effect (a persisted id would be shared by every later clone of the
    directory)."""
    import os
    import random
    import string

    wandb_cfg = config.get("wandb", {}) or {}
    run_id = wandb_cfg.get("run_id")
    resume = wandb_cfg.get("resume", "auto")
    if run_id:
        return run_id, resume
    if not enabled:
        return None, False
    path = os.path.join(output_dir, "wandb_run_id.txt")
    if os.path.exists(path):
        with open(path) as f:
            return f.read().strip(), resume
    # wandb.util.generate_id format: 8 lowercase alphanumerics
    rng = random.SystemRandom()
    run_id = "".join(rng.choice(string.ascii_lowercase + string.digits)
                     for _ in range(8))
    os.makedirs(output_dir, exist_ok=True)
    with open(path, "w") as f:
        f.write(run_id)
    return run_id, False


class Tracker:
    """wandb facade: logs scalars/images when wandb is importable and
    enabled, else accumulates to memory (inspectable in tests)."""

    def __init__(self, project: Optional[str] = None, name: Optional[str] = None,
                 config: Optional[Dict[str, Any]] = None, enabled: bool = True,
                 resume: Optional[str] = None, run_id: Optional[str] = None):
        self.history: list = []
        self._wandb = None
        if not enabled:
            return
        try:
            import wandb  # type: ignore

            self._wandb = wandb
            wandb.init(project=project, name=name, config=config,
                       resume=resume, id=run_id)
        except Exception:
            self._wandb = None

    def log(self, metrics: Dict[str, Any], step: Optional[int] = None):
        self.history.append((step, dict(metrics)))
        if self._wandb is not None:
            self._wandb.log(metrics, step=step)

    def log_config(self, flat_config: Dict[str, Any]):
        """Attach the flattened run config (training/utils.py:20-48)."""
        self.config = dict(flat_config)
        if self._wandb is not None:
            self._wandb.config.update(flat_config, allow_val_change=True)

    def finish(self):
        if self._wandb is not None:
            self._wandb.finish()
