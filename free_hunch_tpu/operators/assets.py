"""Bundled measurement/covariance data assets.

The paper's fixed blur kernels (61x61 gaussian std 3.0 / motion std 0.5,
reference ``measurement_utils/measurements.py:135,175``), the bicubic SR
kernels (``kernels_bicubicx234.mat``), the ImageNet DCT variance prior
(``data/imagenet/dct_variance.pt``, reference ``online_update_bfgs.py:343``),
and the per-sigma analytic reconstruction MSE
(``analytic_variance/imagenet/recon_mse.pt``) — all converted once to
npy/npz so runtime needs neither torch nor mat readers.
"""
from __future__ import annotations

import functools
import os

import numpy as np

_ASSET_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "assets")


def _path(*parts) -> str:
    return os.path.abspath(os.path.join(_ASSET_DIR, *parts))


@functools.lru_cache(maxsize=None)
def gaussian_blur_kernel() -> np.ndarray:
    """61x61 gaussian kernel, std 3.0 (sums to 1)."""
    return np.load(_path("kernels", "gaussian_ks61_std3.0.npy"))


@functools.lru_cache(maxsize=None)
def motion_blur_kernel() -> np.ndarray:
    """61x61 motion-blur kernel, intensity 0.5 (sums to 1)."""
    return np.load(_path("kernels", "motion_ks61_std0.5.npy"))


@functools.lru_cache(maxsize=None)
def bicubic_sr_kernel(scale_factor: int) -> np.ndarray:
    """25x25 bicubic kernel for x2/x3/x4 SR (x4 reused above 4, matching the
    reference's k_index clamp at measurements.py:97)."""
    data = np.load(_path("kernels", "bicubic_x234.npz"))
    key = {2: "x2", 3: "x3", 4: "x4"}.get(scale_factor if scale_factor < 5 else 4, "x4")
    return data[key]


@functools.lru_cache(maxsize=None)
def dct_variance(dataset: str = "imagenet") -> np.ndarray:
    """(3, 256, 256) per-DCT-coefficient variance prior."""
    return np.load(_path(f"dct_variance_{dataset}.npz"))["dct_variance"]


@functools.lru_cache(maxsize=None)
def recon_mse(dataset: str = "imagenet") -> dict:
    """{'sigmas': (1001,), 'mse_list': (1001,)} analytic x0 variance table."""
    data = np.load(_path(f"recon_mse_{dataset}.npz"))
    return {"sigmas": data["sigmas"], "mse_list": data["mse_list"]}


def load_dct_variance_from_dir(data_dir: str) -> np.ndarray:
    """Load a dct_variance prior from a dataset directory (supports the
    reference's ``dct_variance.pt`` via torch, or a converted ``.npz``)."""
    npz = os.path.join(data_dir, "dct_variance.npz")
    if os.path.exists(npz):
        return np.load(npz)["dct_variance"]
    pt = os.path.join(data_dir, "dct_variance.pt")
    if os.path.exists(pt):
        import torch
        return torch.load(pt, weights_only=True, map_location="cpu").numpy()
    return dct_variance("imagenet")
