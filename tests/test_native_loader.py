"""Native C++ batch-loader tests (built on the fly with g++)."""

import numpy as np
import pytest

from flowfusion_tpu.utils.native_loader import (
    NativeBatchLoader,
    numpy_batch_iterator,
    write_f32,
)


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    rng = np.random.default_rng(0)
    x = rng.normal(size=(1000, 4)).astype(np.float32)
    path = tmp_path_factory.mktemp("data") / "ds.f32"
    write_f32(str(path), x)
    return str(path), x


def test_native_loader_streams_real_rows(dataset):
    if not NativeBatchLoader.available():
        pytest.skip("no native toolchain")
    path, x = dataset
    loader = NativeBatchLoader(path, n_cols=4, batch=128, seed=7)
    assert loader.n_rows == 1000
    row_set = {tuple(np.round(r, 5)) for r in x}
    seen = []
    for _ in range(16):  # > 1 epoch worth of batches
        b = loader.next()
        assert b.shape == (128, 4)
        for r in b:
            assert tuple(np.round(r, 5)) in row_set
        seen.append(b)
    loader.close()
    # shuffling: two consecutive batches are not identical
    assert not np.array_equal(seen[0], seen[1])


def test_native_loader_epoch_coverage(dataset):
    if not NativeBatchLoader.available():
        pytest.skip("no native toolchain")
    path, x = dataset
    loader = NativeBatchLoader(path, n_cols=4, batch=100, seed=3)
    # one epoch = 10 batches of 100 covering each row exactly once
    rows = np.concatenate([loader.next() for _ in range(10)])
    loader.close()
    a = np.sort(rows.view([("", np.float32)] * 4), axis=0)
    b = np.sort(x.view([("", np.float32)] * 4), axis=0)
    assert np.array_equal(a, b)


def test_native_loader_bad_path_raises():
    if not NativeBatchLoader.available():
        pytest.skip("no native toolchain")
    with pytest.raises(RuntimeError):
        NativeBatchLoader("/nonexistent/file.f32", n_cols=4, batch=8)


def test_numpy_fallback_same_semantics():
    x = np.arange(40, dtype=np.float32).reshape(10, 4)
    it = numpy_batch_iterator(x, batch=5, seed=0)
    b1, b2 = next(it), next(it)
    assert b1.shape == (5, 4)
    rows = np.concatenate([b1, b2])
    assert np.array_equal(
        np.sort(rows[:, 0]), np.sort(x[:, 0])
    )  # one epoch covers all rows


def test_batches_never_span_epochs_and_close_is_safe(tmp_path):
    """Epoch remainder is dropped (a batch can never contain the same row
    twice — parity with the numpy fallback and the reference DataLoader);
    next-after-close raises instead of crashing; bad configs error."""
    from flowfusion_tpu.utils.native_loader import NativeBatchLoader, write_f32

    if not NativeBatchLoader.available():
        pytest.skip("no C++ toolchain")

    rng = np.random.default_rng(0)
    n, d, bs = 10, 2, 4  # 10 % 4 = 2-row remainder each epoch
    x = np.arange(n * d, dtype=np.float32).reshape(n, d)
    path = str(tmp_path / "x.f32")
    write_f32(path, x)

    loader = NativeBatchLoader(path, n_cols=d, batch=bs, seed=3)
    for _ in range(50):
        b = loader.next()
        rows = [tuple(r) for r in b]
        assert len(set(rows)) == bs, "batch contains a duplicated row"
    loader.close()
    with pytest.raises(RuntimeError, match="closed"):
        loader.next()
    loader.close()  # idempotent

    # invalid configs fail loudly, not with SIGFPE/bad_alloc
    with pytest.raises(RuntimeError):
        NativeBatchLoader(path, n_cols=0, batch=4)
