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


def test_transient_load_failure_keeps_cache(tmp_path, monkeypatch):
    """A transient reader failure (EMFILE, MemoryError mid-decompress) must
    NOT delete a valid multi-GB cache — fall back to conversion this time and
    leave the file for the next load. Only definitively-corrupt content
    (BadZipFile & co) may be discarded."""
    import pytest

    import free_hunch_tpu.models.loading as loading

    path = str(tmp_path / "p.npz")
    save_params_npz(path, _params())
    monkeypatch.setattr(loading, "load_params_npz",
                        lambda p: (_ for _ in ()).throw(MemoryError("oom")))
    with pytest.warns(UserWarning, match="unreadable .kept on disk"):
        assert loading._try_load_cache(path) is None
    assert (tmp_path / "p.npz").exists()
    monkeypatch.undo()
    out = loading._try_load_cache(path)  # intact cache loads next time
    np.testing.assert_array_equal(np.asarray(out["block"]["w"]),
                                  _params()["block"]["w"])
