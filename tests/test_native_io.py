"""Native host-IO engine: bit-exact parity with the Python readers."""

import os

import numpy as np
import pytest

from iridium_tpu.io import native, readers

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="libhostio.so not built")


@pytest.mark.parametrize("fmt,dtype,scale", [
    ("ci8", np.int8, 127), ("ci16", np.int16, 32767),
    ("cf32", np.float32, 1.0)])
def test_native_matches_python(tmp_path, fmt, dtype, scale):
    rng = np.random.default_rng(1)
    raw = (rng.uniform(-1, 1, 2 * 50_000) * scale).astype(dtype)
    path = str(tmp_path / f"x.{fmt}")
    raw.tofile(path)
    a = [(b.copy(), n) for b, n in native.read_blocks(path, 16_384, fmt)]
    b = [(b.copy(), n) for b, n in readers.read_blocks(path, 16_384, fmt)]
    assert len(a) == len(b)
    for (x, nx), (y, ny) in zip(a, b):
        assert nx == ny
        # native yields owned (block, 2) f32 I/Q pairs (the pipeline's
        # upload format); python readers yield complex64
        assert x.shape == (16_384, 2) and x.dtype == np.float32
        np.testing.assert_array_equal(
            x[:, 0] + 1j * x[:, 1], y.astype(np.complex64))


def test_native_empty_file(tmp_path):
    path = str(tmp_path / "empty.cf32")
    open(path, "wb").close()
    assert list(native.read_blocks(path, 4096, "cf32")) == []


def test_native_exact_multiple(tmp_path):
    rng = np.random.default_rng(2)
    raw = rng.standard_normal(2 * 8192).astype(np.float32)
    path = str(tmp_path / "x.cf32")
    raw.tofile(path)
    blocks = [(b.copy(), n) for b, n in native.read_blocks(path, 4096, "cf32")]
    assert [n for _, n in blocks] == [4096, 4096]
