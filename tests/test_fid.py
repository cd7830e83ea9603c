"""FID machinery tests.

* Fréchet distance against closed forms (identical distributions -> 0;
  diagonal-covariance Gaussians -> per-dimension formula),
* streaming/mergeable FeatureStats vs direct np.mean/np.cov,
* ORACLE: the native InceptionV3 feature extractor vs a from-scratch torch
  twin (torchvision is absent here) sharing the same random weights AND
  non-trivial BatchNorm statistics — validates the architecture, the BN
  inference folding, and the pytorch-fid pooling deviations
  (count_include_pad=False avg pools; Mixed_7c max pool),
* the proxy extractor separates distributions (FID(shift) >> FID(same)).

The reference computes no FID (SURVEY.md §6); this is paper-metric surface
beyond the repo.
"""
import numpy as np
import pytest

from free_hunch_tpu.metrics import fid

# heavyweight tier: torch oracles / e2e CLI / multi-process / full-model
# forwards — excluded from the <5 min fast tier (pytest -m 'not slow')
pytestmark = pytest.mark.slow


def test_frechet_distance_closed_form():
    rng = np.random.default_rng(0)
    mu = rng.normal(size=4)
    a = rng.normal(size=(4, 4))
    sigma = a @ a.T + np.eye(4)
    assert fid.frechet_distance(mu, sigma, mu, sigma) == pytest.approx(0.0, abs=1e-8)

    # diagonal covariances: d^2 = sum_i (dmu_i^2 + (sqrt(v1_i)-sqrt(v2_i))^2)
    mu1, mu2 = rng.normal(size=3), rng.normal(size=3)
    v1, v2 = rng.uniform(0.5, 2.0, 3), rng.uniform(0.5, 2.0, 3)
    expect = np.sum((mu1 - mu2) ** 2 + (np.sqrt(v1) - np.sqrt(v2)) ** 2)
    got = fid.frechet_distance(mu1, np.diag(v1), mu2, np.diag(v2))
    assert got == pytest.approx(expect, rel=1e-8)


def test_feature_stats_streaming_and_merge():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(50, 8))
    st = fid.FeatureStats(8)
    for i in range(0, 50, 7):  # ragged chunks
        st.add(x[i:i + 7])
    mu, sigma = st.mu_sigma()
    np.testing.assert_allclose(mu, x.mean(axis=0), atol=1e-12)
    np.testing.assert_allclose(sigma, np.cov(x, rowvar=False), atol=1e-12)

    # two "process shards" merged == the full set
    a, b = fid.FeatureStats(8), fid.FeatureStats(8)
    a.add(x[:20])
    b.add(x[20:])
    a.merge_arrays(b.n, b.s, b.ss)
    mu2, sigma2 = a.mu_sigma()
    np.testing.assert_allclose(mu2, mu, atol=1e-12)
    np.testing.assert_allclose(sigma2, sigma, atol=1e-12)


def _torch_twin(raw):
    """From-scratch torch InceptionV3 (pytorch-fid pool3 variant) built from
    the same spec table, weights injected from ``raw``."""
    import torch
    import torch.nn.functional as F

    mods = {}
    for name, cin, cout, k, stride, pad in fid.all_conv_specs():
        conv = torch.nn.Conv2d(cin, cout, k, stride=stride, padding=pad,
                               bias=False)
        bn = torch.nn.BatchNorm2d(cout, eps=1e-3)
        with torch.no_grad():
            conv.weight.copy_(torch.from_numpy(raw[f"{name}.w"]))
            bn.weight.copy_(torch.from_numpy(raw[f"{name}.bn.weight"]))
            bn.bias.copy_(torch.from_numpy(raw[f"{name}.bn.bias"]))
            bn.running_mean.copy_(torch.from_numpy(raw[f"{name}.bn.running_mean"]))
            bn.running_var.copy_(torch.from_numpy(raw[f"{name}.bn.running_var"]))
        seq = torch.nn.Sequential(conv, bn, torch.nn.ReLU())
        seq.eval()
        mods[name] = seq

    def c(name, x):
        return mods[name](x)

    def avg3(x):
        return F.avg_pool2d(x, 3, stride=1, padding=1, count_include_pad=False)

    def forward(x):
        x = c("Conv2d_1a_3x3", x)
        x = c("Conv2d_2a_3x3", x)
        x = c("Conv2d_2b_3x3", x)
        x = F.max_pool2d(x, 3, 2)
        x = c("Conv2d_3b_1x1", x)
        x = c("Conv2d_4a_3x3", x)
        x = F.max_pool2d(x, 3, 2)
        for btype, name, _, _ in fid.MIXED:
            if btype == "A":
                x = torch.cat([
                    c(f"{name}.branch1x1", x),
                    c(f"{name}.branch5x5_2", c(f"{name}.branch5x5_1", x)),
                    c(f"{name}.branch3x3dbl_3",
                      c(f"{name}.branch3x3dbl_2", c(f"{name}.branch3x3dbl_1", x))),
                    c(f"{name}.branch_pool", avg3(x))], 1)
            elif btype == "B":
                x = torch.cat([
                    c(f"{name}.branch3x3", x),
                    c(f"{name}.branch3x3dbl_3",
                      c(f"{name}.branch3x3dbl_2", c(f"{name}.branch3x3dbl_1", x))),
                    F.max_pool2d(x, 3, 2)], 1)
            elif btype == "C":
                b7 = c(f"{name}.branch7x7_3",
                       c(f"{name}.branch7x7_2", c(f"{name}.branch7x7_1", x)))
                bd = c(f"{name}.branch7x7dbl_1", x)
                for i in (2, 3, 4, 5):
                    bd = c(f"{name}.branch7x7dbl_{i}", bd)
                x = torch.cat([c(f"{name}.branch1x1", x), b7, bd,
                               c(f"{name}.branch_pool", avg3(x))], 1)
            elif btype == "D":
                b3 = c(f"{name}.branch3x3_2", c(f"{name}.branch3x3_1", x))
                b7 = c(f"{name}.branch7x7x3_1", x)
                for i in (2, 3, 4):
                    b7 = c(f"{name}.branch7x7x3_{i}", b7)
                x = torch.cat([b3, b7, F.max_pool2d(x, 3, 2)], 1)
            else:
                b3 = c(f"{name}.branch3x3_1", x)
                b3 = torch.cat([c(f"{name}.branch3x3_2a", b3),
                                c(f"{name}.branch3x3_2b", b3)], 1)
                bd = c(f"{name}.branch3x3dbl_2", c(f"{name}.branch3x3dbl_1", x))
                bd = torch.cat([c(f"{name}.branch3x3dbl_3a", bd),
                                c(f"{name}.branch3x3dbl_3b", bd)], 1)
                pool = (avg3(x) if btype == "E1"
                        else F.max_pool2d(x, 3, stride=1, padding=1))
                x = torch.cat([c(f"{name}.branch1x1", x), b3, bd,
                               c(f"{name}.branch_pool", pool)], 1)
        return x.mean(dim=(-2, -1))

    return forward


@pytest.mark.slow
def test_inception_oracle_vs_torch():
    """Shared random weights + non-trivial BN stats: jax and torch twins must
    agree — validates architecture, BN folding, and the FID pooling quirks."""
    import jax.numpy as jnp
    import torch

    rng = np.random.default_rng(7)
    raw = fid.random_params(seed=3)
    # randomise the BN statistics so the inference-folding path is exercised
    for name, _, cout, _, _, _ in fid.all_conv_specs():
        raw[f"{name}.bn.weight"] = rng.uniform(0.5, 1.5, cout).astype(np.float32)
        raw[f"{name}.bn.bias"] = rng.normal(0, 0.1, cout).astype(np.float32)
        raw[f"{name}.bn.running_mean"] = rng.normal(0, 0.1, cout).astype(np.float32)
        raw[f"{name}.bn.running_var"] = rng.uniform(0.5, 1.5, cout).astype(np.float32)

    x = rng.normal(0, 0.5, (2, 3, 299, 299)).astype(np.float32).clip(-1, 1)

    params = {k: jnp.asarray(v) for k, v in fid._fold_bn(raw).items()}
    ours = np.asarray(fid.inception_features(params, jnp.asarray(x),
                                             resize=False))

    with torch.no_grad():
        theirs = _torch_twin(raw)(torch.from_numpy(x)).numpy()

    assert ours.shape == theirs.shape == (2, fid.FEATURE_DIM)
    scale = np.abs(theirs).max()
    assert np.abs(ours - theirs).max() < 2e-3 * max(scale, 1.0), (
        np.abs(ours - theirs).max(), scale)


def test_convert_round_trip():
    """convert_torch_weights consumes the pytorch-fid state_dict layout."""
    raw = fid.random_params(seed=0)
    state = {}
    for name, _, _, _, _, _ in fid.all_conv_specs():
        state[f"{name}.conv.weight"] = raw[f"{name}.w"]
        for k in ("weight", "bias", "running_mean", "running_var"):
            state[f"{name}.bn.{k}"] = raw[f"{name}.bn.{k}"]
    out = fid.convert_torch_weights(state)
    np.testing.assert_array_equal(out["Mixed_7c.branch_pool.w"],
                                  raw["Mixed_7c.branch_pool.w"])


def test_configured_weights_fail_fast(tmp_path, monkeypatch):
    """A configured-but-bad FID_WEIGHTS path must raise, not silently swap in
    the random-feature proxy (which would put a proxy FID in a run the user
    believes is publication-comparable)."""
    monkeypatch.setenv("FID_WEIGHTS", str(tmp_path / "nope.npz"))
    with pytest.raises(FileNotFoundError, match="FID weights"):
        fid.load_weights()
    # incomplete npz (one conv present, rest missing)
    partial = str(tmp_path / "partial.npz")
    np.savez(partial, **{"Conv2d_1a_3x3.w": np.zeros((32, 3, 3, 3), np.float32)})
    with pytest.raises(KeyError, match="incomplete"):
        fid.load_weights(partial)
    # unconfigured -> proxy fallback, no raise
    monkeypatch.delenv("FID_WEIGHTS")
    assert fid.load_weights() is None


def test_install_fid_rejects_proxy_mismatch(tmp_path, monkeypatch):
    """Reference stats built with a different extractor (proxy vs real) must
    abort at construction — the Fréchet distance between features of two
    different networks is not an FID of anything."""
    import jax.numpy as jnp
    from free_hunch_tpu.eval import Evaluator

    monkeypatch.delenv("FID_WEIGHTS", raising=False)
    extract, is_proxy = fid.make_extractor()
    assert is_proxy
    st = fid.FeatureStats()
    st.add(np.asarray(extract(jnp.zeros((2, 3, 32, 32), jnp.float32))))
    ref = str(tmp_path / "real_stats.npz")
    st.save(ref, is_proxy=False)  # claims real-weight features

    ev = Evaluator.__new__(Evaluator)  # _install_fid reads only self.opts
    ev.opts = dict(fid_ref_stats=ref)
    with pytest.raises(ValueError, match="proxy"):
        ev._install_fid()
    # matching flags install cleanly
    st.save(ref, is_proxy=True)
    ev._install_fid()
    assert ev._fid is not None and ev._fid["is_proxy"] is True


@pytest.mark.slow
def test_proxy_fid_separates_distributions(monkeypatch):
    """Random-feature FID: same-distribution pairs score far below a strong
    distribution shift (the documented proxy semantics)."""
    import jax.numpy as jnp

    monkeypatch.delenv("FID_WEIGHTS", raising=False)  # force the proxy path
    extract, is_proxy = fid.make_extractor()
    assert is_proxy
    rng = np.random.default_rng(0)

    def feats(imgs):
        st = fid.FeatureStats()
        st.add(np.asarray(extract(jnp.asarray(imgs))))
        return st

    # low-res "images": smooth random fields vs the same + heavy blur shift
    base = rng.normal(0, 0.4, (24, 3, 64, 64)).astype(np.float32)
    same = rng.normal(0, 0.4, (24, 3, 64, 64)).astype(np.float32)
    shifted = (base * 0.2 + 0.7).astype(np.float32)  # contrast+brightness shift

    st_a, st_b, st_c = feats(base), feats(same), feats(shifted)
    d_same = fid.frechet_distance(*st_a.mu_sigma(), *st_b.mu_sigma())
    d_shift = fid.frechet_distance(*st_a.mu_sigma(), *st_c.mu_sigma())
    assert d_shift > 3 * d_same, (d_same, d_shift)
