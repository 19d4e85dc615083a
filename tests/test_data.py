"""Data layer tests."""

import numpy as np
import pytest

from vargp_tpu import data


def test_toy_dataset_shapes_and_determinism():
    d1 = data.make_toy_dataset(seed=3)
    d2 = data.make_toy_dataset(seed=3)
    assert d1.data.shape == (200, 2) and d1.targets.shape == (200,)
    np.testing.assert_array_equal(d1.data, d2.data)
    assert set(np.unique(d1.targets)) == {0, 1, 2, 3}
    assert d1.num_classes() == 4


def test_filter_by_class():
    d = data.make_toy_dataset()
    f = data.filter_by_class(d, [0, 1])
    assert len(f) == 100
    assert set(np.unique(f.targets)) == {0, 1}
    # None keeps everything
    assert len(data.filter_by_class(d, None)) == 200


def test_batch_iter_static_shapes_and_coverage():
    d = data.make_toy_dataset()
    rng = np.random.default_rng(0)
    seen = 0
    for b in data.batch_iter(d, 64, rng=rng):
        assert b.x.shape == (64, 2) and b.y.shape == (64,) and b.w.shape == (64,)
        seen += int(b.w.sum())
    assert seen == 200


@pytest.mark.slow
def test_split_and_permute():
    d = data.load_mnist(train=True)
    assert d.data.shape == (60000, 784)
    assert d.data.dtype == np.float32
    assert d.data.min() >= 0.0 and d.data.max() <= 1.0

    rng = np.random.default_rng(1)
    tr, va = data.split_train_val(d, 10000, rng)
    assert len(tr) == 50000 and len(va) == 10000

    perms = data.make_permutations(3, 784, rng)
    assert len(perms) == 3
    np.testing.assert_array_equal(perms[0], np.arange(784))
    p = data.apply_permutation(tr, perms[1])
    np.testing.assert_allclose(p.data[:5], tr.data[:5][:, perms[1]])


def test_synthetic_mnist_learnable():
    """The zero-egress surrogate must be class-separable (sanity: a nearest-
    centroid rule clears 90%) so continual-learning dynamics are real."""
    tr = data.load_mnist(train=True)
    te = data.load_mnist(train=False)
    cents = np.stack([tr.data[tr.targets == c][:500].mean(0) for c in range(10)])
    sub = te.data[:2000]
    pred = np.argmin(
        ((sub[:, None] - cents[None]) ** 2).sum(-1), axis=1
    )
    acc = (pred == te.targets[:2000]).mean()
    assert acc > 0.9


def test_synthetic_mnist_calibration():
    """Pin the surrogate's two calibration targets (mnist.py docstring):

    1. Trainable at the reference init — the RBF Gram at lengthscale 0.5
       sees exp(-2 d^2); the median intra-class nearest-neighbour d^2 must
       stay small enough that the kernel has gradient signal (measured
       regression in round 2: NN d^2 ~ 17 -> model flatlines at 10%).
    2. Non-saturating — hybrid label noise must keep 1-NN below 99% so
       continual metrics (accuracy matrices, BWT) retain discriminative
       power (round-1 surrogate saturated every metric at 1.0).
    """
    tr = data.load_mnist(train=True)
    rng = np.random.default_rng(0)
    idx = rng.permutation(len(tr))[:1500]
    X = tr.data[idx].astype(np.float64)
    y = tr.targets[idx]
    sq = np.sum(X**2, axis=1)
    d2 = np.maximum(sq[:, None] - 2 * X @ X.T + sq[None], 0)
    np.fill_diagonal(d2, np.inf)
    same = y[:, None] == y[None]
    nn_intra = np.min(np.where(same, d2, np.inf), axis=1)
    assert np.median(nn_intra) < 4.0, np.median(nn_intra)  # kernel alive
    nn_acc = np.mean(y[np.argmin(d2, axis=1)] == y)
    assert 0.90 < nn_acc < 0.99, nn_acc  # hard but learnable


def test_real_mnist_integration():
    """Skip-gated real-data path: when IDX files are present (e.g. under
    $VARGP_TPU_DATA_DIR), the loader must return the genuine 60k/10k MNIST
    and a nearest-centroid rule must clear the known ~75-85% band."""
    import pytest

    if not data.mnist_available():
        pytest.skip("real MNIST IDX files not provisioned")
    tr = data.load_mnist(train=True)
    te = data.load_mnist(train=False)
    assert len(tr) == 60000 and len(te) == 10000
    cents = np.stack([tr.data[tr.targets == c].mean(0) for c in range(10)])
    pred = np.argmin(((te.data[:2000, None] - cents[None]) ** 2).sum(-1), axis=1)
    acc = (pred == te.targets[:2000]).mean()
    assert acc > 0.70, acc
