"""Full-size import-wiring regression gate (no weights needed).

Each released checkpoint's importer runs on an ordinal-filled synthetic
state dict at REAL checkpoint dimensions; the per-leaf {source-key
ordinal -> element count} fingerprint must match the committed manifest
(tools/make_value_map_manifests.py).  A swapped same-shape source, a
wrong fused-qkv slice boundary, or a dropped/duplicated row changes the
counts — complementing the tiny-dim goldens (numerics through the torch
reference) and the shape manifests (test_import_manifests.py).

The Wan-VAE + MagVit gates run in the default suite; the LLM-scale
models are slow-marked (same machinery, bigger memcpys).
"""

import json
import os
import sys

import pytest

MANIFEST_DIR = os.path.join(os.path.dirname(__file__), "golden", "manifests")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))


def _check(name):
    from make_value_map_manifests import importers

    from showo_tpu.utils.torch_import import value_map_fingerprint

    with open(os.path.join(MANIFEST_DIR, f"{name}.json")) as f:
        manifest = json.load(f)
    with open(os.path.join(MANIFEST_DIR, f"value_map_{name}.json")) as f:
        want = json.load(f)
    got = value_map_fingerprint(importers()[name], manifest)
    assert set(got) == set(want), (
        f"leaf set changed: +{sorted(set(got) - set(want))[:5]} "
        f"-{sorted(set(want) - set(got))[:5]}")
    diff = [k for k in want if got[k] != want[k]]
    assert not diff, f"import wiring changed for leaves: {diff[:10]}"


def test_value_map_wan_vae():
    _check("wan21_vae")


def test_value_map_magvitv2():
    _check("magvitv2")


@pytest.mark.slow
@pytest.mark.parametrize("name", ["showo_v1", "showo_v1_clip",
                                  "showo2_1.5b", "showo2_7b"])
def test_value_map_slow(name):
    """The LLM-scale fingerprints: the same machinery, GB-scale memcpys
    (~2-4 min each on the 1-CPU harness) -> slow-marked."""
    _check(name)
