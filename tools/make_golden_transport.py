"""Golden transport fixtures: path algebra + time grids from the reference.

    python tools/make_golden_transport.py
"""

import sys

import numpy as np
import torch

sys.path.insert(0, "/root/reference/show-o2")

# stub torchdiffeq (only needed by the odeint wrapper we don't exercise)
import types  # noqa: E402

_td = types.ModuleType("torchdiffeq")
_td.odeint = None
sys.modules.setdefault("torchdiffeq", _td)

from transport.path import ICPlan, GVPCPlan, VPCPlan  # noqa: E402
from transport.utils import time_shift, get_lin_function  # noqa: E402


def main() -> None:
    g = torch.Generator().manual_seed(0)
    t = torch.rand(5, generator=g) * 0.98 + 0.01
    x0 = torch.randn(5, 4, 3, 3, generator=g)
    x1 = torch.randn(5, 4, 3, 3, generator=g)

    out = {"t": t.numpy(), "x0": x0.numpy(), "x1": x1.numpy()}
    for name, plan in (("ic", ICPlan()), ("gvp", GVPCPlan()), ("vp", VPCPlan())):
        tt, xt, ut = plan.plan(t, x0, x1)
        out[f"{name}_xt"] = xt.numpy()
        out[f"{name}_ut"] = ut.numpy()
        drift, diffusion = plan.compute_drift(x1, t)
        out[f"{name}_drift"] = drift.numpy()
        out[f"{name}_diffusion"] = (
            diffusion.numpy() if torch.is_tensor(diffusion)
            else np.full((1,), diffusion, np.float32))
        score = plan.get_score_from_velocity(ut, xt, t)
        out[f"{name}_score"] = score.numpy()

    # time grid warps (integrators.py:99-101 + utils time_shift)
    tgrid = torch.linspace(0, 1, 9)
    out["tgrid_warp3"] = (tgrid / (tgrid + 3.0 - 3.0 * tgrid)).numpy()
    mu = get_lin_function(y1=0.5, y2=1.15)(729)
    out["tgrid_shift729"] = time_shift(mu, 1.0, tgrid).numpy()

    import os

    os.makedirs("tests/golden", exist_ok=True)
    np.savez_compressed("tests/golden/transport.npz", **out)
    print("wrote tests/golden/transport.npz")


if __name__ == "__main__":
    main()
