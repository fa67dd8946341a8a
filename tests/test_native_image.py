"""Native JPEG batch decoder vs PIL reference."""

import io

import numpy as np
import pytest

from showo_tpu.data.native_image import _load_lib, decode_batch


def _jpeg_bytes(size=(40, 32), color=(200, 80, 30)):
    from PIL import Image

    img = Image.new("RGB", size, color)
    buf = io.BytesIO()
    img.save(buf, format="JPEG", quality=95)
    return buf.getvalue()


def _png_bytes():
    from PIL import Image

    img = Image.new("RGB", (20, 20), (0, 255, 0))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    return buf.getvalue()


def test_decode_batch_mixed():
    bufs = [_jpeg_bytes(), _png_bytes(), b"not an image",
            _jpeg_bytes(size=(64, 48), color=(10, 10, 240))]
    out, valid = decode_batch(bufs, resolution=16)
    assert out.shape == (4, 16, 16, 3)
    assert valid == [True, True, False, True]
    # flat-color jpegs decode to ~the color, normalized
    want0 = np.array([200, 80, 30]) / 127.5 - 1.0
    np.testing.assert_allclose(out[0].mean(axis=(0, 1)), want0, atol=0.05)
    want3 = np.array([10, 10, 240]) / 127.5 - 1.0
    np.testing.assert_allclose(out[3].mean(axis=(0, 1)), want3, atol=0.05)


def test_native_lib_present():
    if _load_lib() is False:
        pytest.skip("toolchain unavailable")
    bufs = [_jpeg_bytes() for _ in range(8)]
    out, valid = decode_batch(bufs, resolution=24, num_threads=3)
    assert all(valid)
    assert np.isfinite(out).all()
