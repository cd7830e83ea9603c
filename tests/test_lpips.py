"""Oracle test: the native JAX LPIPS (VGG16 + official linear heads) matches
a from-scratch torch implementation of the exact richzhang/PerceptualSimilarity
``lpips.LPIPS(net='vgg')`` computation, with shared random weights.

The real pretrained weights cannot be downloaded in this environment (zero
egress), so correctness is pinned at the implementation level: identical
weights in => identical distances out (<1e-5, far inside the 1e-3 target of
VERDICT r1 #3). Dropping the converted torchvision/LPIPS weight npz into
``LPIPS_WEIGHTS`` then yields real LPIPS numbers with no further code.

Reference consumer: ``generate_conditional.py:543-547``.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402

from free_hunch_tpu.metrics import lpips_jax  # noqa: E402

# heavyweight tier: torch oracles / e2e CLI / multi-process / full-model
# forwards — excluded from the <5 min fast tier (pytest -m 'not slow')
pytestmark = pytest.mark.slow

# torchvision vgg16 `features` layout: (seq_idx, in_ch, out_ch) of each conv
_CFG = [(0, 3, 64), (2, 64, 64), (5, 64, 128), (7, 128, 128),
        (10, 128, 256), (12, 256, 256), (14, 256, 256),
        (17, 256, 512), (19, 512, 512), (21, 512, 512),
        (24, 512, 512), (26, 512, 512), (28, 512, 512)]
_POOL_AFTER = {2, 7, 14, 21}
_TAPS = (2, 7, 14, 21, 28)


def _random_weights(seed=0):
    rng = np.random.default_rng(seed)
    vgg_state, lin_state = {}, {}
    for idx, cin, cout in _CFG:
        std = np.sqrt(2.0 / (cin * 9))
        vgg_state[f"{idx}.weight"] = rng.normal(0, std, (cout, cin, 3, 3)).astype(np.float32)
        vgg_state[f"{idx}.bias"] = rng.normal(0, 0.01, (cout,)).astype(np.float32)
    for i, c in enumerate(lpips_jax.TAP_CHANNELS):
        lin_state[f"lins.{i}.model.1.weight"] = rng.uniform(
            0, 1, (1, c, 1, 1)).astype(np.float32)
    return vgg_state, lin_state


class _TorchLPIPS(nn.Module):
    """Line-for-line torch mirror of the official LPIPS(net='vgg') forward."""

    def __init__(self, vgg_state, lin_state):
        super().__init__()
        self.convs = nn.ModuleDict()
        for idx, cin, cout in _CFG:
            conv = nn.Conv2d(cin, cout, 3, padding=1)
            conv.weight.data = torch.from_numpy(vgg_state[f"{idx}.weight"])
            conv.bias.data = torch.from_numpy(vgg_state[f"{idx}.bias"])
            self.convs[str(idx)] = conv
        self.lins = [torch.from_numpy(lin_state[f"lins.{i}.model.1.weight"])
                     for i in range(5)]
        self.register_buffer("shift", torch.tensor([-.030, -.088, -.188])
                             .view(1, 3, 1, 1))
        self.register_buffer("scale", torch.tensor([.458, .448, .450])
                             .view(1, 3, 1, 1))

    def _taps(self, x):
        taps = []
        for idx, _, _ in _CFG:
            x = torch.relu(self.convs[str(idx)](x))
            if idx in _TAPS:
                taps.append(x)
            if idx in _POOL_AFTER:
                x = torch.nn.functional.max_pool2d(x, 2, 2)
        return taps

    @staticmethod
    def _norm(f, eps=1e-10):
        return f / (torch.sqrt(torch.sum(f**2, dim=1, keepdim=True)) + eps)

    def forward(self, a, b):
        fa = self._taps((a - self.shift) / self.scale)
        fb = self._taps((b - self.shift) / self.scale)
        total = 0.0
        for i, (x, y) in enumerate(zip(fa, fb)):
            d = (self._norm(x) - self._norm(y)) ** 2
            lin = torch.nn.functional.conv2d(d, self.lins[i])
            total = total + lin.mean(dim=(2, 3)).squeeze(1)
        return total


def test_lpips_matches_torch_oracle():
    vgg_state, lin_state = _random_weights(0)
    params = lpips_jax.convert_torch_weights(vgg_state, lin_state)

    rng = np.random.default_rng(1)
    a = rng.uniform(-1, 1, (2, 3, 64, 64)).astype(np.float32)
    b = np.clip(a + rng.normal(0, 0.2, a.shape), -1, 1).astype(np.float32)

    with torch.no_grad():
        want = _TorchLPIPS(vgg_state, lin_state)(
            torch.from_numpy(a), torch.from_numpy(b)).numpy()

    import jax.numpy as jnp
    got = np.asarray(lpips_jax.lpips_forward(
        {k: jnp.asarray(v) for k, v in params.items()}, a, b))
    assert got.shape == (2,)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
    # identical images -> exactly zero distance
    same = np.asarray(lpips_jax.lpips_forward(
        {k: jnp.asarray(v) for k, v in params.items()}, a, a))
    np.testing.assert_allclose(same, 0.0, atol=1e-7)


def test_lpips_fn_uses_native_weights(tmp_path, monkeypatch):
    """lpips_fn picks the native JAX path (is_proxy=False) when LPIPS_WEIGHTS
    points at a converted npz, and degrades to the flagged proxy otherwise."""
    from free_hunch_tpu.metrics import quality

    vgg_state, lin_state = _random_weights(2)
    params = lpips_jax.convert_torch_weights(vgg_state, lin_state)
    path = tmp_path / "lpips_vgg.npz"
    np.savez(path, **params)

    monkeypatch.setenv("LPIPS_WEIGHTS", str(path))
    quality._LPIPS_CACHE.clear()
    fn = quality.lpips_fn("vgg")
    assert fn.is_proxy is False
    rng = np.random.default_rng(3)
    a = rng.uniform(-1, 1, (1, 3, 64, 64)).astype(np.float32)
    b = np.clip(a + 0.1, -1, 1)
    with torch.no_grad():
        want = float(_TorchLPIPS(vgg_state, lin_state)(
            torch.from_numpy(a), torch.from_numpy(b)).mean())
    assert fn(a, b) == pytest.approx(want, rel=1e-4, abs=1e-5)

    monkeypatch.delenv("LPIPS_WEIGHTS")
    quality._LPIPS_CACHE.clear()
    fn2 = quality.lpips_fn("vgg")
    assert fn2.is_proxy is True
    quality._LPIPS_CACHE.clear()


def test_convert_rejects_wrong_head_shape():
    vgg_state, lin_state = _random_weights(4)
    lin_state["lins.0.model.1.weight"] = np.ones((1, 32, 1, 1), np.float32)
    with pytest.raises(ValueError, match="lin head 0"):
        lpips_jax.convert_torch_weights(vgg_state, lin_state)
