"""Cross-implementation LMDB tests: C++ reader vs Python writer/reader."""

import numpy as np
import pytest

from maskdit_tpu.data import lmdb_lite
from maskdit_tpu.data import native_io


@pytest.fixture(scope="module")
def native_available():
    if native_io._load_lib() is None:
        pytest.skip("native toolchain unavailable")
    return True


def test_native_reader_matches_python(tmp_path, native_available):
    path = str(tmp_path / "db")
    rng = np.random.RandomState(0)
    records = {}
    with lmdb_lite.Writer(path) as w:
        for i in range(2500):
            key = f"z-{i}".encode()
            val = rng.bytes(9000) if i % 11 == 0 else rng.bytes(rng.randint(1, 150))
            records[key] = val
            w.put(key, val)
        w.put(b"length", b"2500")
        records[b"length"] = b"2500"

    nr = native_io.NativeReader(path)
    pr = lmdb_lite.Reader(path)
    assert len(nr) == len(pr) == 2501
    for key, val in records.items():
        assert nr.get(key) == val, key
    assert nr.get(b"nope") is None
    assert nr.get(b"z-99999") is None
    nr.close()
    pr.close()


def test_open_reader_fallback(tmp_path):
    path = str(tmp_path / "db")
    with lmdb_lite.Writer(path) as w:
        w.put(b"k", b"v")
    r = native_io.open_reader(path)
    assert r.get(b"k") == b"v"
    r.close()


def test_native_reader_bad_file(tmp_path, native_available):
    bad = tmp_path / "bad.mdb"
    bad.write_bytes(b"\x00" * 16384)
    with pytest.raises(IOError):
        native_io.NativeReader(str(bad))
