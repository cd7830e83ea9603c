"""Params-npz cache robustness: atomic save, corrupt-cache recovery.

A session kill mid-``save_params_npz`` used to leave a truncated .npz that
poisoned every later ``load_model`` with BadZipFile; the loader now writes
atomically and silently discards unreadable caches.
"""
import numpy as np

from free_hunch_tpu.models.loading import (_try_load_cache, load_params_npz,
                                           save_params_npz)


def _params():
    return {"block": {"w": np.arange(6, dtype=np.float32).reshape(2, 3),
                      "b": np.zeros((3,), np.float32)}}


def test_save_load_roundtrip(tmp_path):
    path = str(tmp_path / "p.npz")
    save_params_npz(path, _params())
    out = load_params_npz(path)
    np.testing.assert_array_equal(np.asarray(out["block"]["w"]),
                                  _params()["block"]["w"])


def test_atomic_save_no_suffix_surprise(tmp_path):
    # numpy appends ".npz" to plain filenames; the atomic tmp-file path must
    # not trigger that (the cache would otherwise land at p.npz.tmp.npz)
    path = str(tmp_path / "p.npz")
    save_params_npz(path, _params())
    leftovers = [f.name for f in tmp_path.iterdir() if f.name != "p.npz"]
    assert leftovers == []


def test_corrupt_cache_discarded(tmp_path):
    path = str(tmp_path / "p.npz")
    with open(path, "wb") as f:
        f.write(b"PK\x03\x04 truncated garbage")
    import pytest
    with pytest.warns(UserWarning, match="corrupt params cache"):
        assert _try_load_cache(path) is None
    assert not (tmp_path / "p.npz").exists()


def test_missing_cache_is_none(tmp_path):
    assert _try_load_cache(str(tmp_path / "absent.npz")) is None
    assert _try_load_cache(None) is None
