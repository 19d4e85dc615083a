"""Native C++ loader tests (skipped when no toolchain is available)."""

import struct

import numpy as np
import pytest

from vargp_tpu.data import loader


pytestmark = pytest.mark.skipif(
    not loader.native_available(), reason="native loader not built"
)


def test_native_gather_matches_numpy():
    rng = np.random.default_rng(0)
    data = rng.standard_normal((1000, 37)).astype(np.float32)
    targets = rng.integers(0, 10, 1000).astype(np.int32)
    order = rng.permutation(1000)

    x, y = loader.native_gather(data, targets, order)
    np.testing.assert_array_equal(x, data[order])
    np.testing.assert_array_equal(y, targets[order])


@pytest.mark.slow
def test_native_gather_large_parallel():
    rng = np.random.default_rng(1)
    data = rng.standard_normal((60000, 784)).astype(np.float32)
    targets = rng.integers(0, 10, 60000).astype(np.int32)
    order = rng.permutation(60000)
    x, y = loader.native_gather(data, targets, order)
    np.testing.assert_array_equal(x[::1000], data[order][::1000])
    np.testing.assert_array_equal(y, targets[order])


def test_native_idx_roundtrip(tmp_path):
    """Write a tiny IDX pair and parse it back through the C++ path."""
    rng = np.random.default_rng(2)
    n, r, c = 17, 5, 4
    imgs = rng.integers(0, 256, (n, r, c), dtype=np.uint8)
    labels = rng.integers(0, 10, n, dtype=np.uint8)

    img_path = tmp_path / "imgs-idx3-ubyte"
    with open(img_path, "wb") as f:
        f.write(struct.pack(">HBB", 0, 0x08, 3))
        f.write(struct.pack(">III", n, r, c))
        f.write(imgs.tobytes())
    lbl_path = tmp_path / "labels-idx1-ubyte"
    with open(lbl_path, "wb") as f:
        f.write(struct.pack(">HBB", 0, 0x08, 1))
        f.write(struct.pack(">I", n))
        f.write(labels.tobytes())

    got_imgs = loader.native_parse_idx_images(str(img_path))
    got_labels = loader.native_parse_idx_labels(str(lbl_path))
    np.testing.assert_allclose(
        got_imgs, imgs.reshape(n, -1).astype(np.float32) / 255.0, rtol=1e-6
    )
    np.testing.assert_array_equal(got_labels, labels.astype(np.int32))
