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


def test_random_init_cache_keyed_by_architecture(tmp_path):
    """The random-init cache must miss when the setup (architecture) changes
    for the same missing .pt path — a hit would return wrong-shaped params
    (the cache used to be keyed by (path, seed) only)."""
    import jax
    from free_hunch_tpu.models.loading import load_model

    setup_a = str(tmp_path / "a.txt")
    setup_b = str(tmp_path / "b.txt")
    base = ("--channel_mult 1,2 --attention_resolutions 8 --class_cond False "
            "--diffusion_steps 1000 --dropout 0.0 --image_size 32 "
            "--learn_sigma True --noise_schedule linear --num_channels {nc} "
            "--num_head_channels 16 --num_res_blocks 1 --resblock_updown True "
            "--use_fp16 False --use_scale_shift_norm True "
            "--use_new_attention_order False")
    with open(setup_a, "w") as f:
        f.write(base.format(nc=32))
    with open(setup_b, "w") as f:
        f.write(base.format(nc=64))
    missing_pt = str(tmp_path / "none.pt")

    _, pa, _ = load_model(missing_pt, setup_a, init_random_if_missing=True)
    _, pb, _ = load_model(missing_pt, setup_b, init_random_if_missing=True)
    la = jax.tree_util.tree_leaves(pa)
    lb = jax.tree_util.tree_leaves(pb)
    assert {tuple(x.shape) for x in la} != {tuple(x.shape) for x in lb}
    # same setup again: served from cache, bit-identical
    _, pa2, _ = load_model(missing_pt, setup_a, init_random_if_missing=True)
    for x, y2 in zip(la, jax.tree_util.tree_leaves(pa2)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y2))
