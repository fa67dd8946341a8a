"""Showo2 export -> reimport round-trip + device prefetch test."""

import numpy as np
import jax
import jax.numpy as jnp

from showo_tpu.show_o2.showo2 import init_showo2_params
from showo_tpu.utils.torch_export import showo2_state_dict
from showo_tpu.utils.torch_import import showo2_params_from_torch
from tests.test_showo2_full_parity import TINY


def test_showo2_export_roundtrip():
    params = init_showo2_params(TINY, jax.random.PRNGKey(0))
    sd = showo2_state_dict(params, num_llm_layers=2, num_siglip_layers=2,
                           num_dit_layers=2)
    back = showo2_params_from_torch(sd, num_llm_layers=2,
                                    num_siglip_layers=2, num_dit_layers=2)
    flat_a = jax.tree_util.tree_flatten_with_path(params)[0]
    flat_b = dict(jax.tree_util.tree_flatten_with_path(back)[0])
    checked = 0
    for path, a in flat_a:
        if path in flat_b:
            np.testing.assert_allclose(np.asarray(a),
                                       np.asarray(flat_b[path]), atol=1e-6,
                                       err_msg=str(path))
            checked += 1
    assert checked > 30


def test_device_prefetch():
    from showo_tpu.data.loader import device_prefetch

    batches = [{"x": np.full((2, 3), i, np.float32)} for i in range(5)]
    out = list(device_prefetch(iter(batches), size=2))
    assert len(out) == 5
    for i, b in enumerate(out):
        assert float(b["x"][0, 0]) == i
        assert hasattr(b["x"], "sharding")  # on device


def test_checkpointable_loader_resume(tmp_path):
    from showo_tpu.data.loader import (CheckpointableDataLoader,
                                       restore_loader_state,
                                       save_loader_state)

    def samples():
        for i in range(40):
            yield {"x": np.full((2,), i, np.int32)}

    loader = CheckpointableDataLoader(samples, batch_size=4, num_epochs=1)
    it = iter(loader)
    seen = [next(it)["x"][0, 0] for _ in range(3)]
    assert seen == [0, 4, 8]
    save_loader_state(loader, str(tmp_path), step=3)

    fresh = CheckpointableDataLoader(samples, batch_size=4, num_epochs=1)
    assert restore_loader_state(fresh, str(tmp_path), step=3)
    resumed = [b["x"][0, 0] for b in fresh]
    # fast-forwarded past the 3 consumed batches
    assert resumed[0] == 12
    assert fresh.batches_yielded == 10


def test_mixed_loader_resume():
    from showo_tpu.data.loader import CheckpointableDataLoader
    from showo_tpu.data.mixed import MixedDataLoader

    def source(base):
        def gen():
            for i in range(32):
                yield {"x": np.full((1,), base + i, np.int32)}
        return gen

    def build():
        return MixedDataLoader(
            [CheckpointableDataLoader(source(0), batch_size=2, num_epochs=1),
             CheckpointableDataLoader(source(100), batch_size=2, num_epochs=1)],
            mode="min_size", seed=7)

    a = build()
    it = iter(a)
    consumed = [int(next(it)["x"][0, 0]) for _ in range(5)]
    sd = a.state_dict()
    rest_a = [int(b["x"][0, 0]) for b in it]

    b = build()
    b.load_state_dict(sd)
    rest_b = [int(x["x"][0, 0]) for x in b]
    assert rest_b == rest_a, (consumed, rest_a, rest_b)
