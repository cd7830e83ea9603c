"""Shared installer for the torch reference oracle's missing dependencies.

The reference at /root/reference imports torch_dct, pywt, hdf5storage, hydra,
lpips, skimage, omegaconf and torchvision, and mirrors covariance state to
CUDA unconditionally (online_update_bfgs.py:40-51). On this machine none of
those extras exist and there is no GPU, so every consumer (the oracle tests
and the A/B scripts) needs the same set of stubs + a CPU-ified
``torch.Tensor.cuda``. One copy lives here (VERDICT r2 item 8).

``install_reference_stubs()`` is idempotent; call it before importing
anything from /root/reference.
"""
import sys
import types

import numpy as np


def install_reference_stubs():
    import torch

    if "torch_dct" not in sys.modules:
        import scipy.fft as _sfft

        def _dct_mat(n):
            return torch.from_numpy(
                _sfft.dct(np.eye(n), norm="ortho", axis=0).astype(np.float64))

        def _apply2d(x, m_fn):
            mh = m_fn(x.shape[-2]).to(x.dtype)
            mw = m_fn(x.shape[-1]).to(x.dtype)
            return torch.einsum("km,...mw,lw->...kl", mh, x, mw)

        stub = types.ModuleType("torch_dct")
        stub.dct_2d = lambda x, norm="ortho": _apply2d(x, _dct_mat)
        stub.idct_2d = lambda x, norm="ortho": _apply2d(
            x, lambda n: _dct_mat(n).T)
        sys.modules["torch_dct"] = stub

    for name in ("pywt", "hydra", "lpips"):
        sys.modules.setdefault(name, types.ModuleType(name))

    if "hdf5storage" not in sys.modules:
        import scipy.io as _sio
        h5 = types.ModuleType("hdf5storage")
        h5.loadmat = _sio.loadmat
        sys.modules["hdf5storage"] = h5

    if "skimage" not in sys.modules:
        sk = types.ModuleType("skimage")
        sk.metrics = types.ModuleType("skimage.metrics")
        sys.modules["skimage"] = sk
        sys.modules["skimage.metrics"] = sk.metrics

    if "omegaconf" not in sys.modules:
        oc = types.ModuleType("omegaconf")
        oc.DictConfig, oc.OmegaConf = dict, object
        sys.modules["omegaconf"] = oc

    if "torchvision" not in sys.modules or not hasattr(
            sys.modules["torchvision"], "utils"):
        tv = types.ModuleType("torchvision")
        tv.torch = torch  # the reference does `from torchvision import torch`
        tv.utils = types.ModuleType("torchvision.utils")
        tv.transforms = types.ModuleType("torchvision.transforms")
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.utils"] = tv.utils
        sys.modules["torchvision.transforms"] = tv.transforms

    # CPU-only torch: the reference calls .cuda() unconditionally
    torch.Tensor.cuda = lambda self, *a, **k: self

    # append (not insert): repo-root modules must win name collisions
    if "/root/reference" not in sys.path:
        sys.path.append("/root/reference")
