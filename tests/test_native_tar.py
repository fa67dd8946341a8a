"""Native tar reader: parity with Python tarfile + batched reads."""

import io
import os
import tarfile

import numpy as np
import pytest

from showo_tpu.data.native_tar import TarIndex, _load_lib


@pytest.fixture()
def shard(tmp_path):
    p = tmp_path / "s.tar"
    rng = np.random.default_rng(0)
    payloads = {}
    with tarfile.open(p, "w") as tf:
        for i in range(10):
            name = f"sample_{i:04d}.bin"
            data = rng.integers(0, 256, size=100 + 37 * i).astype(np.uint8).tobytes()
            payloads[name] = data
            info = tarfile.TarInfo(name)
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))
        # a long GNU name
        long_name = "deeply/nested/" + "x" * 150 + ".bin"
        data = b"longname-payload"
        payloads[long_name] = data
        info = tarfile.TarInfo(long_name)
        info.size = len(data)
        tf.addfile(info, io.BytesIO(data))
    return str(p), payloads


def test_index_and_read(shard):
    path, payloads = shard
    idx = TarIndex(path)
    assert len(idx) == len(payloads)
    assert set(idx.names) == set(payloads)
    datas = idx.read(list(range(len(idx))), num_threads=3)
    for name, data in zip(idx.names, datas):
        assert data == payloads[name], name


def test_native_library_builds(shard):
    lib = _load_lib()
    if lib is False:
        pytest.skip("toolchain unavailable")
    path, payloads = shard
    idx = TarIndex(path)
    assert idx.native
    # spot check a subset in scrambled order
    order = [3, 0, 7]
    datas = idx.read(order)
    for o, d in zip(order, datas):
        assert d == payloads[idx.names[o]]
