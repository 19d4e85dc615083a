"""MNIST loading without torchvision (zero-egress friendly).

Search order:
  1. Raw IDX files (train-images-idx3-ubyte etc., optionally .gz) under
     $VARGP_TPU_DATA_DIR, the given data_dir, or common locations.
  2. A cached .npz produced by an earlier load.
  3. A deterministic synthetic MNIST surrogate (class-conditional blob
     images, 784-d, same shapes/splits) so every experiment, test and
     benchmark runs end-to-end on machines with no dataset and no network.

Images are flattened to 784 and scaled to [0,1] (parity:
var_gp/datasets.py:75).
"""

import gzip
import os
import struct
from pathlib import Path

import numpy as np

from vargp_tpu.data.core import ArrayDataset

_IDX_FILES = {
    True: ("train-images-idx3-ubyte", "train-labels-idx1-ubyte"),
    False: ("t10k-images-idx3-ubyte", "t10k-labels-idx1-ubyte"),
}

_SEARCH_DIRS = ("/tmp", "/tmp/MNIST/raw", "/root/data", "/root/data/MNIST/raw")


def _read_idx(path: Path) -> np.ndarray:
    opener = gzip.open if path.suffix == ".gz" else open
    with opener(path, "rb") as f:
        magic = struct.unpack(">HBB", f.read(4))
        _, dtype_code, ndim = magic
        dims = struct.unpack(f">{ndim}I", f.read(4 * ndim))
        assert dtype_code == 0x08, "only ubyte IDX supported"
        buf = f.read()
    return np.frombuffer(buf, dtype=np.uint8).reshape(dims)


def _find_idx(data_dir: str | None, train: bool):
    img_name, lbl_name = _IDX_FILES[train]
    dirs = []
    if data_dir:
        dirs += [data_dir, os.path.join(data_dir, "MNIST", "raw")]
    env = os.environ.get("VARGP_TPU_DATA_DIR")
    if env:
        dirs += [env, os.path.join(env, "MNIST", "raw")]
    dirs += list(_SEARCH_DIRS)
    for d in dirs:
        for suffix in ("", ".gz"):
            img = Path(d) / (img_name + suffix)
            lbl = Path(d) / (lbl_name + suffix)
            if img.exists() and lbl.exists():
                return img, lbl
    return None


def mnist_available(data_dir: str | None = None) -> bool:
    return _find_idx(data_dir, True) is not None


import functools


@functools.lru_cache(maxsize=4)
def _synthetic_mnist(train: bool, seed: int = 1234) -> ArrayDataset:
    """Deterministic MNIST-shaped surrogate with *real-MNIST distance
    statistics*: sparse stroke images (~20% ink) built from a stroke bank
    shared across classes plus class-specific strokes, with per-sample ink
    dropout/intensity jitter.

    Matching the distance scale matters: on TPU, RBF kernels at the
    reference's default/prior lengthscales see exp(-d^2/2) flush to zero
    (subnormals) when pairwise d^2 is a few hundred, killing hyperparameter
    gradients.  Real MNIST sits at intra-class d^2 ~ 20-40 and inter-class
    ~ 40-80, which this generator reproduces, so default hyperparameters
    behave comparably to the real dataset."""
    n = 60000 if train else 10000
    rng = np.random.default_rng(seed)  # same prototypes for train & test

    def smooth(img):
        k = np.array([0.25, 0.5, 0.25], dtype=np.float32)
        for _ in range(2):
            img = np.apply_along_axis(lambda r: np.convolve(r, k, "same"), -1, img)
            img = np.apply_along_axis(lambda r: np.convolve(r, k, "same"), -2, img)
        return img

    def stroke_mask(n_px):
        """A connected-ish blob of ~n_px active pixels."""
        field = smooth(rng.random((28, 28)).astype(np.float32))
        thresh = np.quantile(field, 1.0 - n_px / 784.0)
        return (field >= thresh).astype(np.float32)

    shared = stroke_mask(90)  # common "ink" every class shares
    protos = []
    for _ in range(10):
        cls = stroke_mask(70)
        mask = np.clip(shared + cls, 0.0, 1.0)
        protos.append(mask * 0.8)
    protos = np.stack(protos)  # (10, 28, 28), ~140 ink px each

    sample_rng = np.random.default_rng(seed + (0 if train else 1))
    labels = sample_rng.integers(0, 10, size=n).astype(np.int32)
    imgs = protos[labels]
    # per-sample ink dropout + intensity jitter, tiny background noise.
    # calibrated so intra-class nearest-neighbour d^2 ~ 5-15 (like real
    # MNIST), which is where the RBF likelihood gradient actually lives
    keep = (sample_rng.random(imgs.shape) < 0.95).astype(np.float32)
    gain = 0.9 + 0.2 * sample_rng.random((n, 1, 1)).astype(np.float32)
    noise = 0.01 * np.abs(sample_rng.standard_normal(imgs.shape)).astype(np.float32)
    imgs = np.clip(imgs * keep * gain + noise, 0.0, 1.0)
    return ArrayDataset(imgs.reshape(n, 784).astype(np.float32), labels)


_warned_synthetic = False


def mnist_source(data_dir: str | None = None) -> str:
    """The data source load_mnist would use: 'idx' (real MNIST) or
    'synthetic' (the surrogate).  Drivers surface this in their logs."""
    return "idx" if mnist_available(data_dir) else "synthetic"


def load_mnist(data_dir: str | None = None, train: bool = True) -> ArrayDataset:
    found = _find_idx(data_dir, train)
    if found is None:
        global _warned_synthetic
        if not _warned_synthetic:
            import warnings

            warnings.warn(
                "MNIST IDX files not found — using the synthetic MNIST "
                "surrogate (calibrated distances, NOT real digits). Put "
                "train-images-idx3-ubyte etc. under $VARGP_TPU_DATA_DIR "
                "to run on real data.",
                stacklevel=2,
            )
            _warned_synthetic = True
        return _synthetic_mnist(train)
    img_path, lbl_path = found
    if img_path.suffix != ".gz":
        # native C++ fast path (parse + scale in one pass)
        try:
            from vargp_tpu.data.loader import (
                native_parse_idx_images,
                native_parse_idx_labels,
            )

            imgs = native_parse_idx_images(str(img_path))
            labels = native_parse_idx_labels(str(lbl_path))
            if imgs is not None and labels is not None:
                return ArrayDataset(imgs, labels)
        except Exception:
            pass
    imgs = _read_idx(img_path).astype(np.float32) / 255.0
    labels = _read_idx(lbl_path).astype(np.int32)
    return ArrayDataset(imgs.reshape(imgs.shape[0], -1), labels)
