"""Native C++ .npy loader: byte-parity with numpy and prefetch-pool behavior.

The loader is optional (built lazily with the system g++); these tests skip
cleanly where no toolchain exists. Replaces nothing — the Python path remains
the default fallback, matching the reference's Python loader
(reference: ttt/datasets/preembedding_dataset.py).
"""

import numpy as np
import pytest

from ttt_video_dit_tpu.data import native


pytestmark = pytest.mark.skipif(not native.available(), reason="no native toolchain")


@pytest.mark.parametrize(
    "dtype,shape",
    [
        (np.float32, (3, 4, 5)),
        (np.float16, (7,)),
        (np.float64, (2, 2)),
        (np.int64, (4, 1)),
        (np.uint8, (16, 3)),
        (np.float32, ()),  # 0-d
    ],
)
def test_native_matches_numpy(tmp_path, dtype, shape):
    rng = np.random.default_rng(0)
    arr = (rng.standard_normal(shape) * 100).astype(dtype)
    p = str(tmp_path / "x.npy")
    np.save(p, arr)
    out = native.load_npy(p)
    assert out.dtype == arr.dtype and out.shape == arr.shape
    np.testing.assert_array_equal(out, arr)


def test_native_rejects_fortran_order(tmp_path):
    arr = np.asfortranarray(np.arange(12, dtype=np.float32).reshape(3, 4))
    p = str(tmp_path / "f.npy")
    np.save(p, arr)
    with pytest.raises(IOError):
        native.load_npy(p)


def test_prefetch_pool_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    arrays = {i: rng.standard_normal((32, 16)).astype(np.float32) for i in range(8)}
    paths = {}
    for i, a in arrays.items():
        paths[i] = str(tmp_path / f"a{i}.npy")
        np.save(paths[i], a)

    pool = native.PrefetchPool(num_threads=3)
    try:
        for i, p in paths.items():
            pool.submit(i, p)
        # wait out of submission order
        for i in reversed(sorted(arrays)):
            np.testing.assert_array_equal(pool.wait(i), arrays[i])
    finally:
        pool.close()


def test_pool_reports_missing_file(tmp_path):
    pool = native.PrefetchPool(num_threads=1)
    try:
        pool.submit(99, str(tmp_path / "nope.npy"))
        with pytest.raises(IOError):
            pool.wait(99)
    finally:
        pool.close()


def test_load_tensor_uses_native_path(tmp_path):
    from ttt_video_dit_tpu.data.dataset import load_tensor

    arr = np.random.default_rng(2).standard_normal((5, 6)).astype(np.float32)
    p = str(tmp_path / "t.npy")
    np.save(p, arr)
    np.testing.assert_array_equal(load_tensor(p), arr)
