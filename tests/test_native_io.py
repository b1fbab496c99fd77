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


def test_native_tbevents_readable_by_tensorboard(tmp_path):
    """The C++ tfevents writer produces files the real TensorBoard reader
    accepts (it validates the masked CRC32C of every record)."""
    w = native.TBEventWriter(str(tmp_path))
    for i in range(5):
        w.add_scalar("train/mean_reward", 1.5 * i, i)
    w.add_scalar("perf/fps", 123456.0, 4)
    w.close()

    from massive_marl_tpu.utils.logger.tools import read_tfevents
    data = read_tfevents(w.path)
    assert set(data) == {"train/mean_reward", "perf/fps"}
    rew = data["train/mean_reward"]
    assert [s for _, s, _ in rew] == list(range(5))
    np.testing.assert_allclose([v for _, _, v in rew],
                               [1.5 * i for i in range(5)], rtol=1e-6)
    assert data["perf/fps"][0][1:] == (4, 123456.0)


def test_writer_uses_native_backend(tmp_path):
    from massive_marl_tpu.utils.logging import Writer
    w = Writer(str(tmp_path))
    assert type(w._tb).__name__ == "TBEventWriter"
    w.add_scalar("a/b", 3.0, 7)
    w.close()
    from massive_marl_tpu.utils.logger.tools import convert_tfevents_to_csv
    written = convert_tfevents_to_csv(str(tmp_path))
    assert any(p.endswith("a_b.csv") for p in written)
