"""Native mmtio (C++ .npy writer + mmap reader) round-trip tests."""
import numpy as np

from massive_marl_tpu import native


def test_native_roundtrip(tmp_path):
    lib = native.get_lib()
    assert lib is not None, "g++ build of mmtio failed"
    p = str(tmp_path / "x.npy")
    arr = np.arange(24, dtype=np.float32).reshape(6, 4)
    native.write_npy(p, arr)
    # numpy can read what the native writer produced
    back = np.load(p)
    np.testing.assert_array_equal(back, arr)
    # native mmap reader + gather
    m = native.NpyMmap(p)
    assert m.shape == (6, 4)
    np.testing.assert_array_equal(m.as_array(), arr)
    np.testing.assert_array_equal(m.gather(np.array([3, 0, 5])), arr[[3, 0, 5]])
    m.close()


def test_native_reads_numpy_written(tmp_path):
    p = str(tmp_path / "y.npy")
    arr = np.random.RandomState(0).randn(10, 3).astype(np.float32)
    np.save(p, arr)
    m = native.NpyMmap(p)
    np.testing.assert_allclose(m.as_array(), arr)
    m.close()
