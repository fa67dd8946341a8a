"""Generate full-size value-map manifests (import-wiring fingerprints).

For each released reference checkpoint's key->shape manifest
(tests/golden/manifests/*.json, from tools/make_key_manifests.py), runs
the framework importer on an ordinal-filled synthetic state dict and
records the per-leaf {source-key ordinal -> element count} map — see
showo_tpu.utils.torch_import.value_map_fingerprint.  The committed
manifests gate the import wiring at real checkpoint scale without the
weights (tests/test_import_value_map.py).

Run: python tools/make_value_map_manifests.py [name ...]
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

MANIFEST_DIR = os.path.join(os.path.dirname(__file__), "..", "tests",
                            "golden", "manifests")


def importers():
    from showo_tpu.utils.torch_import import (
        linear_kernel,
        magvit_params_from_torch,
        phi_params_from_torch,
        showo2_params_from_torch,
        wan_vae_params_from_torch,
    )

    def v1_clip(sd):
        return {
            "showo": phi_params_from_torch(sd),
            "mm_projector": {
                "fc1": {"kernel": linear_kernel(sd["mm_projector.0.weight"]),
                        "bias": sd["mm_projector.0.bias"]},
                "fc2": {"kernel": linear_kernel(sd["mm_projector.2.weight"]),
                        "bias": sd["mm_projector.2.bias"]},
            },
        }

    return {
        "showo_v1": lambda sd: {"showo": phi_params_from_torch(sd)},
        "showo_v1_clip": v1_clip,
        "magvitv2": magvit_params_from_torch,
        "wan21_vae": wan_vae_params_from_torch,
        "showo2_1.5b": lambda sd: showo2_params_from_torch(sd, tied=True),
        "showo2_7b": lambda sd: showo2_params_from_torch(sd, tied=False),
    }


def main():
    from showo_tpu.utils.torch_import import value_map_fingerprint

    names = sys.argv[1:] or list(importers())
    for name in names:
        with open(os.path.join(MANIFEST_DIR, f"{name}.json")) as f:
            manifest = json.load(f)
        fp = value_map_fingerprint(importers()[name], manifest)
        out = os.path.join(MANIFEST_DIR, f"value_map_{name}.json")
        with open(out, "w") as f:
            json.dump(fp, f, sort_keys=True)
        print(f"{name}: {len(fp)} leaves -> {out}")


if __name__ == "__main__":
    main()
