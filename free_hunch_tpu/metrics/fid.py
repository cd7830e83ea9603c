"""FID (Fréchet Inception Distance) in JAX.

The reference repo computes no FID — its ``ref_stats_name: fid_ref.pkl``
config key (``config/config.yaml:34``) is an EDM vestige nothing reads — but
the paper's tables report FID, so the TPU build ships the full machinery:

* :class:`FeatureStats` — streaming first/second feature-moment accumulation
  (exact, order-independent, mergeable across processes),
* :func:`frechet_distance` — ``||mu1-mu2||^2 + tr(S1 + S2 - 2 (S1 S2)^1/2)``
  with the standard jitter fallback for near-singular products,
* a native InceptionV3-299 feature extractor (the pytorch-fid "pool3" 2048-d
  layout, including its FID-specific pooling deviations from torchvision:
  ``count_include_pad=False`` average pools in the A/C/E blocks and a MAX
  pool branch in the final E block), oracle-tested against a from-scratch
  torch twin with shared weights (tests/test_fid.py).

Official Inception weights are unobtainable in this environment (zero
egress, no torchvision). When a converted weight file exists (env
``FID_WEIGHTS`` — an npz of the pytorch-fid state_dict via
:func:`convert_torch_weights`), features are the real pool3 activations and
FID numbers are comparable to published ones. Otherwise the extractor runs
with DETERMINISTIC seeded random weights — random-feature Fréchet distances
are still a valid two-sample discrepancy (monotone under common corruption,
zero iff matched moments) but NOT comparable to published FID; results carry
``fid_is_proxy: true`` exactly like the LPIPS proxy flag.

TPU notes: the whole extractor is one jitted NCHW f32 program (convs on the
MXU); BN folds to a scale/shift at load time so inference carries no
batch-stat ops.
"""
from __future__ import annotations

import os
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# InceptionV3 (pytorch-fid variant) — architecture table.
# Each BasicConv2d is (name, in_ch, out_ch, kernel(h,w), stride, pad(h,w)).
# Names mirror the torchvision/pytorch-fid state_dict so conversion is 1:1.
# ---------------------------------------------------------------------------

STEM = (
    ("Conv2d_1a_3x3", 3, 32, (3, 3), 2, (0, 0)),
    ("Conv2d_2a_3x3", 32, 32, (3, 3), 1, (0, 0)),
    ("Conv2d_2b_3x3", 32, 64, (3, 3), 1, (1, 1)),
    ("maxpool", None, None, None, None, None),
    ("Conv2d_3b_1x1", 64, 80, (1, 1), 1, (0, 0)),
    ("Conv2d_4a_3x3", 80, 192, (3, 3), 1, (0, 0)),
    ("maxpool", None, None, None, None, None),
)

# (block_type, name, in_channels, param) — param is pool_features (A),
# channels_7x7 (C), or None.
MIXED = (
    ("A", "Mixed_5b", 192, 32),
    ("A", "Mixed_5c", 256, 64),
    ("A", "Mixed_5d", 288, 64),
    ("B", "Mixed_6a", 288, None),
    ("C", "Mixed_6b", 768, 128),
    ("C", "Mixed_6c", 768, 160),
    ("C", "Mixed_6d", 768, 160),
    ("C", "Mixed_6e", 768, 192),
    ("D", "Mixed_7a", 768, None),
    ("E1", "Mixed_7b", 1280, None),   # avg pool branch (count_include_pad=False)
    ("E2", "Mixed_7c", 2048, None),   # pytorch-fid: MAX pool branch
)

FEATURE_DIM = 2048
_BN_EPS = 1e-3


def _block_convs(btype: str, name: str, cin: int, p) -> List[Tuple]:
    """Enumerate the BasicConv2d specs of one Mixed block, torchvision
    naming/order."""
    if btype == "A":
        return [
            (f"{name}.branch1x1", cin, 64, (1, 1), 1, (0, 0)),
            (f"{name}.branch5x5_1", cin, 48, (1, 1), 1, (0, 0)),
            (f"{name}.branch5x5_2", 48, 64, (5, 5), 1, (2, 2)),
            (f"{name}.branch3x3dbl_1", cin, 64, (1, 1), 1, (0, 0)),
            (f"{name}.branch3x3dbl_2", 64, 96, (3, 3), 1, (1, 1)),
            (f"{name}.branch3x3dbl_3", 96, 96, (3, 3), 1, (1, 1)),
            (f"{name}.branch_pool", cin, p, (1, 1), 1, (0, 0)),
        ]
    if btype == "B":
        return [
            (f"{name}.branch3x3", cin, 384, (3, 3), 2, (0, 0)),
            (f"{name}.branch3x3dbl_1", cin, 64, (1, 1), 1, (0, 0)),
            (f"{name}.branch3x3dbl_2", 64, 96, (3, 3), 1, (1, 1)),
            (f"{name}.branch3x3dbl_3", 96, 96, (3, 3), 2, (0, 0)),
        ]
    if btype == "C":
        c7 = p
        return [
            (f"{name}.branch1x1", cin, 192, (1, 1), 1, (0, 0)),
            (f"{name}.branch7x7_1", cin, c7, (1, 1), 1, (0, 0)),
            (f"{name}.branch7x7_2", c7, c7, (1, 7), 1, (0, 3)),
            (f"{name}.branch7x7_3", c7, 192, (7, 1), 1, (3, 0)),
            (f"{name}.branch7x7dbl_1", cin, c7, (1, 1), 1, (0, 0)),
            (f"{name}.branch7x7dbl_2", c7, c7, (7, 1), 1, (3, 0)),
            (f"{name}.branch7x7dbl_3", c7, c7, (1, 7), 1, (0, 3)),
            (f"{name}.branch7x7dbl_4", c7, c7, (7, 1), 1, (3, 0)),
            (f"{name}.branch7x7dbl_5", c7, 192, (1, 7), 1, (0, 3)),
            (f"{name}.branch_pool", cin, 192, (1, 1), 1, (0, 0)),
        ]
    if btype == "D":
        return [
            (f"{name}.branch3x3_1", cin, 192, (1, 1), 1, (0, 0)),
            (f"{name}.branch3x3_2", 192, 320, (3, 3), 2, (0, 0)),
            (f"{name}.branch7x7x3_1", cin, 192, (1, 1), 1, (0, 0)),
            (f"{name}.branch7x7x3_2", 192, 192, (1, 7), 1, (0, 3)),
            (f"{name}.branch7x7x3_3", 192, 192, (7, 1), 1, (3, 0)),
            (f"{name}.branch7x7x3_4", 192, 192, (3, 3), 2, (0, 0)),
        ]
    # E1 / E2
    return [
        (f"{name}.branch1x1", cin, 320, (1, 1), 1, (0, 0)),
        (f"{name}.branch3x3_1", cin, 384, (1, 1), 1, (0, 0)),
        (f"{name}.branch3x3_2a", 384, 384, (1, 3), 1, (0, 1)),
        (f"{name}.branch3x3_2b", 384, 384, (3, 1), 1, (1, 0)),
        (f"{name}.branch3x3dbl_1", cin, 448, (1, 1), 1, (0, 0)),
        (f"{name}.branch3x3dbl_2", 448, 384, (3, 3), 1, (1, 1)),
        (f"{name}.branch3x3dbl_3a", 384, 384, (1, 3), 1, (0, 1)),
        (f"{name}.branch3x3dbl_3b", 384, 384, (3, 1), 1, (1, 0)),
        (f"{name}.branch_pool", cin, 192, (1, 1), 1, (0, 0)),
    ]


def all_conv_specs() -> List[Tuple]:
    specs = [s for s in STEM if s[0] != "maxpool"]
    for btype, name, cin, p in MIXED:
        specs.extend(_block_convs(btype, name, cin, p))
    return specs


# ---------------------------------------------------------------------------
# Parameters: one (scale-folded) conv per BasicConv2d.
# ---------------------------------------------------------------------------


def convert_torch_weights(state_dict: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """pytorch-fid / torchvision ``inception_v3`` state_dict -> the FID_WEIGHTS
    npz dict. Expects per BasicConv2d ``<name>.conv.weight`` (OIHW, no bias)
    and ``<name>.bn.{weight,bias,running_mean,running_var}``."""
    out = {}
    for name, _, _, _, _, _ in all_conv_specs():
        try:
            out[f"{name}.w"] = np.asarray(state_dict[f"{name}.conv.weight"],
                                          np.float32)
            for k in ("weight", "bias", "running_mean", "running_var"):
                out[f"{name}.bn.{k}"] = np.asarray(state_dict[f"{name}.bn.{k}"],
                                                   np.float32)
        except KeyError as e:
            raise KeyError(f"missing inception weight for {name}: {e}") from e
    return out


def _fold_bn(raw: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Fold inference BN into a per-conv (weight, bias) pair:
    y = conv(x) * g/sqrt(var+eps) + (beta - mean * g/sqrt(var+eps))."""
    params = {}
    for name, _, _, _, _, _ in all_conv_specs():
        w = raw[f"{name}.w"]
        g = raw[f"{name}.bn.weight"]
        beta = raw[f"{name}.bn.bias"]
        mean = raw[f"{name}.bn.running_mean"]
        var = raw[f"{name}.bn.running_var"]
        s = g / np.sqrt(var + _BN_EPS)
        params[f"{name}.w"] = (w * s[:, None, None, None]).astype(np.float32)
        params[f"{name}.b"] = (beta - mean * s).astype(np.float32)
    return params


def random_params(seed: int = 0) -> Dict[str, np.ndarray]:
    """Deterministic He-normal random weights (the proxy extractor). BN is
    identity at init (gamma=1, beta=0, mean=0, var=1), so folding is a no-op."""
    rng = np.random.default_rng(seed)
    raw = {}
    for name, cin, cout, k, _, _ in all_conv_specs():
        fan_in = cin * k[0] * k[1]
        raw[f"{name}.w"] = rng.normal(
            0.0, np.sqrt(2.0 / fan_in), (cout, cin, k[0], k[1])).astype(np.float32)
        raw[f"{name}.bn.weight"] = np.ones(cout, np.float32)
        raw[f"{name}.bn.bias"] = np.zeros(cout, np.float32)
        raw[f"{name}.bn.running_mean"] = np.zeros(cout, np.float32)
        raw[f"{name}.bn.running_var"] = np.ones(cout, np.float32)
    return raw


def load_weights(weights_path: Optional[str] = None) -> Optional[Dict[str, np.ndarray]]:
    """Load the converted npz (env FID_WEIGHTS or explicit path).

    Returns None only when NO weights were configured. A configured-but-bad
    path raises: silently swapping in the random-feature proxy would put a
    proxy FID in a run the user believes is publication-comparable."""
    path = weights_path or os.environ.get("FID_WEIGHTS")
    if not path:
        return None
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"FID weights {path!r} do not exist (convert the pytorch-fid "
            f"state_dict with metrics/fid.py::convert_torch_weights)")
    blob = np.load(path)
    raw = {}
    for name, _, _, _, _, _ in all_conv_specs():
        keys = [f"{name}.w"] + [f"{name}.bn.{k}" for k in
                                ("weight", "bias", "running_mean", "running_var")]
        missing = [k for k in keys if k not in blob]
        if missing:
            raise KeyError(
                f"FID weights {path!r} are incomplete: missing {missing[0]} "
                f"(+{len(missing) - 1} more) — regenerate with "
                f"convert_torch_weights")
        for k in keys:
            raw[k] = np.asarray(blob[k], np.float32)
    return raw


# ---------------------------------------------------------------------------
# Forward pass.
# ---------------------------------------------------------------------------


def _conv(params, name, x, stride, pad):
    # Precision.HIGHEST: TPU f32 convs default to bf16 passes (~1e-3 noise),
    # which would make real-weight features diverge from CPU-computed
    # reference stats and from pytorch-fid
    y = jax.lax.conv_general_dilated(
        x, params[f"{name}.w"], window_strides=(stride, stride),
        padding=(pad, pad) if isinstance(pad, int) else ((pad[0], pad[0]),
                                                         (pad[1], pad[1])),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        precision=jax.lax.Precision.HIGHEST)
    return jax.nn.relu(y + params[f"{name}.b"][None, :, None, None])


def _maxpool3s2(x):
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                 (1, 1, 3, 3), (1, 1, 2, 2), "VALID")


def _pool3s1(x, kind: str):
    """3x3 stride-1 pad-1 pooling. avg uses count_include_pad=False divisors
    (the pytorch-fid deviation from torchvision)."""
    if kind == "max":
        return jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max, (1, 1, 3, 3), (1, 1, 1, 1),
            [(0, 0), (0, 0), (1, 1), (1, 1)])
    s = jax.lax.reduce_window(x, 0.0, jax.lax.add, (1, 1, 3, 3), (1, 1, 1, 1),
                              [(0, 0), (0, 0), (1, 1), (1, 1)])
    ones = jnp.ones((1, 1) + x.shape[-2:], x.dtype)
    cnt = jax.lax.reduce_window(ones, 0.0, jax.lax.add, (1, 1, 3, 3),
                                (1, 1, 1, 1),
                                [(0, 0), (0, 0), (1, 1), (1, 1)])
    return s / cnt


def _mixed_a(params, name, x, cin):
    del cin
    b1 = _conv(params, f"{name}.branch1x1", x, 1, (0, 0))
    b5 = _conv(params, f"{name}.branch5x5_1", x, 1, (0, 0))
    b5 = _conv(params, f"{name}.branch5x5_2", b5, 1, (2, 2))
    b3 = _conv(params, f"{name}.branch3x3dbl_1", x, 1, (0, 0))
    b3 = _conv(params, f"{name}.branch3x3dbl_2", b3, 1, (1, 1))
    b3 = _conv(params, f"{name}.branch3x3dbl_3", b3, 1, (1, 1))
    bp = _conv(params, f"{name}.branch_pool", _pool3s1(x, "avg"), 1, (0, 0))
    return jnp.concatenate([b1, b5, b3, bp], axis=1)


def _mixed_b(params, name, x):
    b3 = _conv(params, f"{name}.branch3x3", x, 2, (0, 0))
    bd = _conv(params, f"{name}.branch3x3dbl_1", x, 1, (0, 0))
    bd = _conv(params, f"{name}.branch3x3dbl_2", bd, 1, (1, 1))
    bd = _conv(params, f"{name}.branch3x3dbl_3", bd, 2, (0, 0))
    return jnp.concatenate([b3, bd, _maxpool3s2(x)], axis=1)


def _mixed_c(params, name, x):
    b1 = _conv(params, f"{name}.branch1x1", x, 1, (0, 0))
    b7 = _conv(params, f"{name}.branch7x7_1", x, 1, (0, 0))
    b7 = _conv(params, f"{name}.branch7x7_2", b7, 1, (0, 3))
    b7 = _conv(params, f"{name}.branch7x7_3", b7, 1, (3, 0))
    bd = _conv(params, f"{name}.branch7x7dbl_1", x, 1, (0, 0))
    bd = _conv(params, f"{name}.branch7x7dbl_2", bd, 1, (3, 0))
    bd = _conv(params, f"{name}.branch7x7dbl_3", bd, 1, (0, 3))
    bd = _conv(params, f"{name}.branch7x7dbl_4", bd, 1, (3, 0))
    bd = _conv(params, f"{name}.branch7x7dbl_5", bd, 1, (0, 3))
    bp = _conv(params, f"{name}.branch_pool", _pool3s1(x, "avg"), 1, (0, 0))
    return jnp.concatenate([b1, b7, bd, bp], axis=1)


def _mixed_d(params, name, x):
    b3 = _conv(params, f"{name}.branch3x3_1", x, 1, (0, 0))
    b3 = _conv(params, f"{name}.branch3x3_2", b3, 2, (0, 0))
    b7 = _conv(params, f"{name}.branch7x7x3_1", x, 1, (0, 0))
    b7 = _conv(params, f"{name}.branch7x7x3_2", b7, 1, (0, 3))
    b7 = _conv(params, f"{name}.branch7x7x3_3", b7, 1, (3, 0))
    b7 = _conv(params, f"{name}.branch7x7x3_4", b7, 2, (0, 0))
    return jnp.concatenate([b3, b7, _maxpool3s2(x)], axis=1)


def _mixed_e(params, name, x, pool_kind):
    b1 = _conv(params, f"{name}.branch1x1", x, 1, (0, 0))
    b3 = _conv(params, f"{name}.branch3x3_1", x, 1, (0, 0))
    b3 = jnp.concatenate([_conv(params, f"{name}.branch3x3_2a", b3, 1, (0, 1)),
                          _conv(params, f"{name}.branch3x3_2b", b3, 1, (1, 0))],
                         axis=1)
    bd = _conv(params, f"{name}.branch3x3dbl_1", x, 1, (0, 0))
    bd = _conv(params, f"{name}.branch3x3dbl_2", bd, 1, (1, 1))
    bd = jnp.concatenate([_conv(params, f"{name}.branch3x3dbl_3a", bd, 1, (0, 1)),
                          _conv(params, f"{name}.branch3x3dbl_3b", bd, 1, (1, 0))],
                         axis=1)
    bp = _conv(params, f"{name}.branch_pool", _pool3s1(x, pool_kind), 1, (0, 0))
    return jnp.concatenate([b1, b3, bd, bp], axis=1)


def inception_features(params: Dict[str, jnp.ndarray], x: jnp.ndarray,
                       resize: bool = True) -> jnp.ndarray:
    """pool3 features. x: (B, 3, H, W) f32 in [-1, 1] (the TF-style range
    pytorch-fid normalises to). Returns (B, 2048)."""
    if resize and x.shape[-2:] != (299, 299):
        # bilinear, half-pixel centers, NO antialiasing == pytorch-fid's
        # F.interpolate(..., mode='bilinear', align_corners=False). jax's
        # default antialias=True widens the kernel when DOWNscaling (>299px
        # inputs), which torch's plain bilinear does not.
        x = jax.image.resize(x, x.shape[:2] + (299, 299), method="bilinear",
                             antialias=False)
    x = _conv(params, "Conv2d_1a_3x3", x, 2, (0, 0))
    x = _conv(params, "Conv2d_2a_3x3", x, 1, (0, 0))
    x = _conv(params, "Conv2d_2b_3x3", x, 1, (1, 1))
    x = _maxpool3s2(x)
    x = _conv(params, "Conv2d_3b_1x1", x, 1, (0, 0))
    x = _conv(params, "Conv2d_4a_3x3", x, 1, (0, 0))
    x = _maxpool3s2(x)
    for btype, name, cin, p in MIXED:
        if btype == "A":
            x = _mixed_a(params, name, x, cin)
        elif btype == "B":
            x = _mixed_b(params, name, x)
        elif btype == "C":
            x = _mixed_c(params, name, x)
        elif btype == "D":
            x = _mixed_d(params, name, x)
        else:
            x = _mixed_e(params, name, x, "avg" if btype == "E1" else "max")
    return jnp.mean(x, axis=(-2, -1))  # adaptive avg pool to 1x1


def make_extractor(weights_path: Optional[str] = None,
                   proxy_seed: int = 0):
    """Return (jitted extract(x)->(B,2048), is_proxy). Real weights when the
    converted npz is available, else deterministic random features."""
    raw = load_weights(weights_path)
    is_proxy = raw is None
    if is_proxy:
        raw = random_params(proxy_seed)
    params = {k: jnp.asarray(v) for k, v in _fold_bn(raw).items()}
    fn = jax.jit(lambda x: inception_features(params, x))
    return fn, is_proxy


# ---------------------------------------------------------------------------
# Moment accumulation + Fréchet distance.
# ---------------------------------------------------------------------------


class FeatureStats:
    """Streaming, mergeable first/second moment accumulator (f64).

    Accumulates sum(x) and sum(x xᵀ); ``mu_sigma`` returns the sample mean
    and the UNBIASED covariance (pytorch-fid's ``np.cov`` default)."""

    def __init__(self, dim: int = FEATURE_DIM):
        self.dim = dim
        self.n = 0
        self.s = np.zeros(dim, np.float64)
        self.ss = np.zeros((dim, dim), np.float64)

    def add(self, feats: np.ndarray):
        f = np.asarray(feats, np.float64)
        assert f.ndim == 2 and f.shape[1] == self.dim, f.shape
        self.n += f.shape[0]
        self.s += f.sum(axis=0)
        self.ss += f.T @ f

    def merge_arrays(self, n: float, s: np.ndarray, ss: np.ndarray):
        self.n += int(n)
        self.s += s
        self.ss += ss

    def mu_sigma(self) -> Tuple[np.ndarray, np.ndarray]:
        assert self.n >= 2, "need at least 2 samples for a covariance"
        mu = self.s / self.n
        sigma = (self.ss - self.n * np.outer(mu, mu)) / (self.n - 1)
        return mu, sigma

    def save(self, path: str, is_proxy: Optional[bool] = None):
        mu, sigma = self.mu_sigma()
        extra = {} if is_proxy is None else dict(is_proxy=is_proxy)
        np.savez(path, mu=mu, sigma=sigma, n=self.n, **extra)


def allgather_merge(st: "FeatureStats") -> "FeatureStats":
    """Merge per-process feature moments across the jax.distributed runtime
    (exact: sums are additive). The f64 sums must survive the gather
    bit-exactly, but ``process_allgather`` canonicalizes f64 arrays to f32
    when ``jax_enable_x64`` is off — so the raw bytes ship as int32.
    Exercised by the real 2-process test (tests/test_multiprocess.py)."""
    from jax.experimental import multihost_utils

    packed = np.concatenate([[float(st.n)], st.s, st.ss.reshape(-1)])
    assert packed.dtype == np.float64
    gathered = np.asarray(multihost_utils.process_allgather(
        packed.view(np.int32)))
    merged = FeatureStats(st.dim)
    for raw in gathered:
        row = np.ascontiguousarray(raw).view(np.float64)
        merged.merge_arrays(row[0], row[1:1 + st.dim],
                            row[1 + st.dim:].reshape(st.dim, st.dim))
    return merged


def load_ref_stats(path: str) -> Tuple[np.ndarray, np.ndarray]:
    blob = np.load(path)
    return np.asarray(blob["mu"], np.float64), np.asarray(blob["sigma"], np.float64)


def frechet_distance(mu1, sigma1, mu2, sigma2, eps: float = 1e-6) -> float:
    """d^2 = ||mu1 - mu2||^2 + tr(S1 + S2 - 2 sqrt(S1 S2)); pytorch-fid
    semantics including the jitter retry when sqrtm is singular."""
    import scipy.linalg

    mu1, mu2 = np.atleast_1d(mu1), np.atleast_1d(mu2)
    sigma1, sigma2 = np.atleast_2d(sigma1), np.atleast_2d(sigma2)
    diff = mu1 - mu2
    covmean, _ = scipy.linalg.sqrtm(sigma1 @ sigma2, disp=False)
    if not np.isfinite(covmean).all():
        offset = np.eye(sigma1.shape[0]) * eps
        covmean, _ = scipy.linalg.sqrtm(
            (sigma1 + offset) @ (sigma2 + offset), disp=False)
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(diff @ diff + np.trace(sigma1) + np.trace(sigma2)
                 - 2.0 * np.trace(covmean))


def compute_fid(stats: FeatureStats, ref_stats_path: str) -> float:
    mu_g, sig_g = stats.mu_sigma()
    mu_r, sig_r = load_ref_stats(ref_stats_path)
    return frechet_distance(mu_g, sig_g, mu_r, sig_r)
