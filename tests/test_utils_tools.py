"""Ortho transforms, metrics, stats, misc utils, dataset, and the CLI tools."""
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import PIL.Image
import pytest


def test_haar_dwt_orthonormal_roundtrip():
    from free_hunch_tpu.ops.ortho import haar_dwt2, haar_idwt2
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 3, 16, 16)))
    w = haar_dwt2(x, level=3)
    np.testing.assert_allclose(haar_idwt2(w, level=3), x, atol=1e-10)
    # orthonormal: norms preserved
    np.testing.assert_allclose(jnp.sum(w**2), jnp.sum(x**2), rtol=1e-10)


def test_ortho_transform_registry_and_lazy_cov():
    from free_hunch_tpu.ops.ortho import LazyOTCovariance, OrthoTransform
    x = jnp.asarray(np.random.default_rng(1).normal(size=(1, 3, 8, 8)))
    ident = OrthoTransform()
    np.testing.assert_allclose(ident(x), x)
    dct = OrthoTransform("dct")
    np.testing.assert_allclose(dct.inv(dct(x)), x, atol=1e-10)
    dwt = OrthoTransform("dwt", level=2)
    np.testing.assert_allclose(dwt.inv(dwt(x)), x, atol=1e-10)
    var = jnp.ones_like(x) * 2.0
    cov = LazyOTCovariance(dct, var)
    np.testing.assert_allclose(cov(x), 2.0 * x, atol=1e-8)


def test_psnr_ssim_match_definitions():
    from free_hunch_tpu.metrics.quality import psnr, ssim
    rng = np.random.default_rng(2)
    a = rng.uniform(0, 255, (3, 32, 32)).astype(np.float32)
    np.testing.assert_allclose(float(psnr(a, a)), 10 * np.log10(255**2 / 1e-12),
                               rtol=1e-3)
    b = a + rng.normal(0, 10, a.shape).astype(np.float32)
    p = float(psnr(a, b))
    want = 10 * np.log10(255**2 / np.mean((a - b) ** 2))
    np.testing.assert_allclose(p, want, rtol=1e-5)
    s_same = float(ssim(a, a, channel_axis=0))
    assert s_same > 0.9999
    s_noisy = float(ssim(a, b, channel_axis=0))
    assert 0 < s_noisy < s_same


@pytest.mark.skipif(not os.path.exists("/opt/venv"), reason="env check only")
def test_ssim_matches_skimage_if_available():
    skimage = pytest.importorskip("skimage.metrics")
    if not hasattr(skimage, "structural_similarity"):
        # another test may have installed an empty skimage stub for the
        # reference-oracle imports (test_schedule_parity.py)
        pytest.skip("skimage stubbed, real scikit-image unavailable")
    from free_hunch_tpu.metrics.quality import ssim
    rng = np.random.default_rng(3)
    a = rng.uniform(0, 255, (3, 64, 64)).astype(np.float32)
    b = np.clip(a + rng.normal(0, 20, a.shape), 0, 255).astype(np.float32)
    got = float(ssim(a, b, channel_axis=0))
    want = skimage.structural_similarity(a, b, data_range=255, channel_axis=0)
    np.testing.assert_allclose(got, want, rtol=1e-3)


def test_ssim_matches_skimage_semantics_replica():
    """Exact skimage.structural_similarity semantics via a scipy
    uniform_filter replica (scikit-image itself is absent from this image,
    which is how a double-crop of the SSIM map — mean over (H-4p, W-4p)
    instead of skimage's (H-2p, W-2p) — previously went unnoticed)."""
    from scipy.ndimage import uniform_filter

    from free_hunch_tpu.metrics.quality import ssim

    def replica(a, b, data_range, win=7, K1=0.01, K2=0.03):
        f = lambda x: uniform_filter(x.astype(np.float64), size=win)
        ux, uy = f(a), f(b)
        uxx, uyy, uxy = f(a * a), f(b * b), f(a * b)
        cn = win * win / (win * win - 1.0)
        vx, vy = cn * (uxx - ux * ux), cn * (uyy - uy * uy)
        vxy = cn * (uxy - ux * uy)
        C1, C2 = (K1 * data_range) ** 2, (K2 * data_range) ** 2
        S = ((2 * ux * uy + C1) * (2 * vxy + C2)
             / ((ux**2 + uy**2 + C1) * (vx + vy + C2)))
        pad = (win - 1) // 2
        return S[pad:-pad, pad:-pad].mean()

    rng = np.random.default_rng(7)
    for shape in [(64, 64), (48, 80)]:
        a = rng.uniform(-1, 1, shape).astype(np.float32)
        b = np.clip(a + 0.1 * rng.normal(size=shape).astype(np.float32), -1, 1)
        got = float(ssim(a, b, data_range=2.0))
        np.testing.assert_allclose(got, replica(a, b, 2.0), atol=3e-6)
    a = rng.uniform(-1, 1, (3, 64, 64)).astype(np.float32)
    b = np.clip(a + 0.1 * rng.normal(size=a.shape).astype(np.float32), -1, 1)
    want = np.mean([replica(a[c], b[c], 2.0) for c in range(3)])
    np.testing.assert_allclose(float(ssim(a, b, data_range=2.0, channel_axis=0)),
                               want, atol=3e-6)


def test_training_stats_collector():
    from free_hunch_tpu.utils import stats
    stats.report("loss", [1.0, 2.0, 3.0])
    stats.report("loss", 4.0)
    c = stats.Collector(regex="loss")
    assert c.num("loss") == 4
    np.testing.assert_allclose(c.mean("loss"), 2.5)
    np.testing.assert_allclose(c.std("loss"), np.std([1, 2, 3, 4]), rtol=1e-6)
    d = c.as_dict()
    assert d["loss"]["num"] == 4


def test_misc_utils():
    from free_hunch_tpu.utils.misc import (InfiniteSampler, assert_shape,
                                           count_parameters, set_random_seed)
    key = set_random_seed(7, rank=1)
    assert key.shape == (2,)
    assert_shape(np.zeros((2, 3)), (2, None))
    with pytest.raises(AssertionError):
        assert_shape(np.zeros((2, 3)), (3, 3))
    it = iter(InfiniteSampler(10, rank=0, num_replicas=2, seed=0))
    vals = [next(it) for _ in range(25)]
    assert all(0 <= v < 10 for v in vals)
    assert count_parameters({"a": np.zeros((2, 3)), "b": np.zeros(5)}) == 11


def test_checkpoint_io(tmp_path):
    from free_hunch_tpu.parallel.dist import CheckpointIO

    class Obj:
        def __init__(self):
            self.v = 1

        def state_dict(self):
            return {"v": self.v}

        def load_state_dict(self, s):
            self.v = s["v"]

    o = Obj()
    o.v = 42
    io = CheckpointIO(obj=o)
    p = str(tmp_path / "ck" / "state-000.pkl")
    io.save(p, verbose=False)
    o.v = 0
    io.load(p, verbose=False)
    assert o.v == 42
    assert io.load_latest(str(tmp_path / "ck"), verbose=False).endswith("state-000.pkl")


def _make_dataset_dir(tmp_path, n=4, res=16):
    d = tmp_path / "ds"
    d.mkdir()
    rng = np.random.default_rng(0)
    for i in range(n):
        arr = rng.integers(0, 255, (res, res, 3), dtype=np.uint8)
        PIL.Image.fromarray(arr).save(d / f"img{i:04d}.png")
    return str(d)


def test_image_folder_dataset(tmp_path):
    from free_hunch_tpu.data.dataset import ImageFolderDataset, shard_indices
    path = _make_dataset_dir(tmp_path)
    ds = ImageFolderDataset(path, return_idx=True)
    assert len(ds) == 4
    idx, img, label = ds[1]
    assert idx == 1 and img.shape == (3, 16, 16) and img.dtype == np.uint8
    ds2 = ImageFolderDataset(path, xflip=True)
    assert len(ds2) == 8
    a, _ = ds2[0]
    b, _ = ds2[4]
    np.testing.assert_array_equal(a[:, :, ::-1], b)
    shards = [shard_indices(10, 3, r) for r in range(3)]
    assert sorted(np.concatenate(shards).tolist()) == list(range(10))


def test_dataset_tool_convert_roundtrip(tmp_path):
    import dataset_tool
    src = _make_dataset_dir(tmp_path, n=3, res=20)
    dest = str(tmp_path / "out.zip")
    n = dataset_tool.convert(src, dest, resolution="16x16",
                             transform="center-crop")
    assert n == 3
    from free_hunch_tpu.data.dataset import ImageFolderDataset
    ds = ImageFolderDataset(dest)
    assert len(ds) == 3 and ds[0][0].shape == (3, 16, 16)
    # dhariwal transform produces the target resolution too
    dest2 = str(tmp_path / "out2")
    dataset_tool.convert(src, dest2, resolution="8x8",
                         transform="center-crop-dhariwal")
    assert ImageFolderDataset(dest2)[0][0].shape == (3, 8, 8)


def test_frequency_analysis(tmp_path):
    from do_frequency_analysis import compute_dct_variance
    path = _make_dataset_dir(tmp_path, n=6, res=16)
    mean, var = compute_dct_variance(path, num_images=6, resolution=16,
                                     batch_size=4)
    assert var.shape == (3, 16, 16) and (var >= 0).all()
    # Parseval: total DCT variance equals total pixel variance (orthonormal)
    assert np.isfinite(var).all() and var.sum() > 0


def test_frequency_analysis_zip_dataset(tmp_path, monkeypatch):
    """main() with a ZIP dataset: the output dir defaults to the dataset
    path, which is a FILE — the variance files must land in a sibling
    directory instead of crashing after the whole accumulation."""
    import sys
    import zipfile

    import do_frequency_analysis as dfa

    src = _make_dataset_dir(tmp_path, n=4, res=16)
    zpath = tmp_path / "ds.zip"
    with zipfile.ZipFile(zpath, "w") as zf:
        for name in sorted(os.listdir(src)):
            zf.write(os.path.join(src, name), name)
    monkeypatch.setattr(sys, "argv", [
        "do_frequency_analysis.py", f"--dataset_path={zpath}",
        "--num_images=4", "--resolution=16"])
    dfa.main()
    out = np.load(tmp_path / "ds" / "dct_variance.npz")
    assert out["dct_variance"].shape == (3, 16, 16)


def test_count_flops_tiny():
    from count_flops import count_flops
    import jax.numpy as jnp

    def f(a, b):
        return a @ b

    a = jnp.zeros((64, 64))
    cost, _ = count_flops(f, a, a)
    assert cost.get("flops", 0) >= 2 * 64**3 * 0.9


def test_visualisation_grid(tmp_path):
    from create_image_visualisation import build_grid
    for run in ("m1", "m2"):
        for sub in ("images", "cond_images", "forward_images"):
            d = tmp_path / run / sub
            d.mkdir(parents=True)
            for i in range(2):
                PIL.Image.fromarray(
                    np.full((8, 8, 3), 100 + i, np.uint8)).save(
                        d / f"{i:06d}_000000.png")
    canvas, labels = build_grid([str(tmp_path / "m1"), str(tmp_path / "m2")],
                                num_images=2)
    assert canvas.ndim == 3 and len(labels) == 4


def test_mesh_helpers():
    from free_hunch_tpu.parallel.mesh import (all_reduce_mean, make_mesh,
                                              parse_mesh_shape, shard_batch)
    assert parse_mesh_shape("data:-1", 8) == {"data": 8}
    assert parse_mesh_shape("data:4,model:2", 8) == {"data": 4, "model": 2}
    mesh = make_mesh("data:-1")
    assert mesh.devices.size == 8
    x = jnp.arange(16.0).reshape(16, 1)
    xs = shard_batch(x, mesh)
    assert float(all_reduce_mean(xs)) == float(np.mean(np.arange(16)))


def test_persistence_roundtrip():
    from free_hunch_tpu.utils import persistence as P

    @P.persistent_class
    class Thing:
        def __init__(self, a, b=2):
            self.a = a
            self.b = b
            self.derived = a * b

    t = Thing(3, b=4)
    data = P.dumps(t)
    t2 = P.loads(data)
    assert (t2.a, t2.b, t2.derived) == (3, 4, 12)
    assert P.is_persistent(t)


def test_persistence_module_source_reconstruction(tmp_path):
    """A pickled class whose defining module has VANISHED must rebuild from
    the embedded module source — including base classes and module-level
    references, which the legacy class-body-only fallback cannot execute
    (reference persistence.py embeds the whole module, _module_to_src)."""
    import importlib
    import sys
    from free_hunch_tpu.utils import persistence as P

    mod_name = "_persist_probe_mod"
    src = (
        "from free_hunch_tpu.utils import persistence as P\n"
        "SCALE = 10\n"
        "class Base:\n"
        "    def tag(self):\n"
        "        return 'base'\n"
        "@P.persistent_class\n"
        "class Derived(Base):\n"
        "    def __init__(self, a):\n"
        "        self.a = a\n"
        "        self.scaled = a * SCALE\n"
    )
    (tmp_path / f"{mod_name}.py").write_text(src)
    sys.path.insert(0, str(tmp_path))
    try:
        mod = importlib.import_module(mod_name)
        obj = mod.Derived(4)
        blob = P.dumps(obj)
    finally:
        sys.path.remove(str(tmp_path))
        sys.modules.pop(mod_name, None)
    (tmp_path / f"{mod_name}.py").unlink()  # module is now unimportable

    obj2 = P.loads(blob)
    assert (obj2.a, obj2.scaled) == (4, 40)
    assert obj2.tag() == "base"  # base class came from the module source


def test_phase_timer_and_annotate():
    import jax.numpy as jnp
    from free_hunch_tpu.utils.profiling import PhaseTimer, annotate

    pt = PhaseTimer()
    out = pt.measure("matmul", lambda: jnp.ones((64, 64)) @ jnp.ones((64, 64)))
    assert out.shape == (64, 64)
    with pt.phase("sleepy"):
        pass
    with pt.phase("blocked") as ph:
        # the handle records the value computed INSIDE the block, so exit
        # blocks on the actual result (not just async dispatch)
        ph.set(jnp.ones((8, 8)) * 2)
    s = pt.summary()
    assert "matmul" in s and "sleepy" in s and "blocked" in s
    assert pt.counts["blocked"] == 1
    with annotate("region"):
        pass


def test_dynamic_construction_and_open_url(tmp_path):
    from free_hunch_tpu.utils.dynamic import (construct_class_by_name,
                                              get_obj_by_name, open_url, is_url)
    d = construct_class_by_name(class_name="collections.OrderedDict", a=1)
    assert d["a"] == 1
    assert get_obj_by_name("os.path.join")("a", "b").endswith("b")
    p = tmp_path / "blob.bin"
    p.write_bytes(b"hello")
    assert open_url(str(p)).read() == b"hello"
    assert open_url(f"file://{p}", return_filename=True) == str(p)
    assert is_url("https://x.y/z") and not is_url("/tmp/x")
    import pytest as _pytest
    with _pytest.raises(IOError):
        open_url("https://nonexistent.example/x", cache_dir=str(tmp_path / "nc"))


def test_data_solution_reduces_residual():
    import jax.numpy as jnp
    from free_hunch_tpu.ops.fftops import data_solution, pre_calculate, downsample, fft_conv
    rng = np.random.default_rng(21)
    x_true = jnp.asarray(rng.normal(size=(1, 3, 16, 16)), jnp.float32)
    k = jnp.asarray(rng.uniform(0.1, 1, (1, 1, 5, 5)), jnp.float32)
    k = k / k.sum()
    sf = 2
    y = downsample(fft_conv(x_true, __import__("free_hunch_tpu.ops.fftops", fromlist=["p2o"]).p2o(k.astype(jnp.complex64), (16, 16))), sf)
    FB, FBC, F2B, FBFy = pre_calculate(y, k, sf)
    x0 = jnp.zeros_like(x_true)
    sol = data_solution(x0, FB, FBC, F2B, FBFy, 0.1, sf)
    # the HQS data solution must fit the measurement better than the init
    def resid(x):
        return float(jnp.sum((downsample(fft_conv(x, FB), sf) - y) ** 2))
    assert resid(sol) < resid(x0)


def test_packaged_default_config():
    """The default config ships inside the package (pyproject package-data),
    so a wheel install works without the repo checkout (reference keeps it at
    config/config.yaml — here that path is a symlink to the packaged file)."""
    import free_hunch_tpu
    from free_hunch_tpu.config import _DEFAULT_CONFIG_PATH, load_config

    pkg_dir = os.path.dirname(os.path.abspath(free_hunch_tpu.__file__))
    assert os.path.abspath(_DEFAULT_CONFIG_PATH).startswith(pkg_dir)
    assert os.path.isfile(_DEFAULT_CONFIG_PATH)
    opts = load_config(argv=["--outdir=/tmp/_cfg_probe"])
    assert opts.num_steps > 0 and "conditioning_mechanism" in opts
