"""Measurement operators A for y = A x + n (registry + linear/nonlinear ops).

Parity: reference ``measurement_utils/measurements.py`` (registry :25-40,
noise :56, colorization :74, super_resolution :87, motion_blur :126,
gaussian_blur :164, inpainting :204, phase_retrieval :331, nonlinear_blur :342).

TPU redesign:

* operators are immutable objects holding precomputed device arrays (OTF
  tuples, masks, resize matrices) built once at construction — every
  ``forward``/``transpose`` is a pure jittable function of its inputs,
* measurement noise is explicit: ``forward(x, key=...)`` draws from a passed
  ``jax.random`` key instead of mutating a global RNG,
* the inpainting mask is generated from a key at construction
  (``mask_key=...``), reproducing the reference's fresh-mask-per-image
  behaviour under explicit seeding,
* ``auto_transpose`` checks adjointness via ``jax.vjp`` (the reference's
  autograd transpose oracle, measurements.py:49-53).
"""
from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np

from free_hunch_tpu.operators import assets, masks
from free_hunch_tpu.operators.resize import build_resizer
from free_hunch_tpu.ops import fftops
from free_hunch_tpu.ops.fftops import downsample, fft_conv, p2o_np, upsample

__OPERATOR__ = {}


def register_operator(name: str):
    def wrapper(cls):
        if name in __OPERATOR__:
            raise NameError(f"operator {name!r} already registered")
        cls.name = name
        __OPERATOR__[name] = cls
        return cls
    return wrapper


def register_operator_pytree(cls, array_fields):
    """Make an operator class a jax pytree whose device arrays are leaves.

    This is what lets the jitted sampler take the operator as an *argument*
    instead of a baked-in constant: per-image quantities (a fresh inpainting
    mask, a new blur kernel) flow in without retracing — one compilation
    serves the whole evaluation run.
    """
    def flatten(op):
        children = tuple(getattr(op, f) for f in array_fields)
        aux = {k: v for k, v in op.__dict__.items() if k not in array_fields}
        return children, (tuple(sorted(aux)), tuple(aux[k] for k in sorted(aux)))

    def unflatten(aux, children):
        op = object.__new__(cls)
        keys, vals = aux
        op.__dict__.update(dict(zip(keys, vals)))
        op.__dict__.update(dict(zip(array_fields, children)))
        return op

    jax.tree_util.register_pytree_node(cls, flatten, unflatten)
    return cls


def get_operator(name: str, **kwargs):
    if name not in __OPERATOR__:
        raise NameError(f"operator {name!r} is not defined")
    return __OPERATOR__[name](**kwargs)


class LinearOperator:
    """Base: forward (with optional explicit noise key) + transpose."""
    name = "abstract"
    sigma_s: jnp.ndarray

    def forward(self, data, noiseless=False, key=None):
        raise NotImplementedError

    def transpose(self, y):
        raise NotImplementedError

    def _noise(self, y, noiseless, key):
        if noiseless or key is None:
            return y
        return y + self.sigma_s * jax.random.normal(key, y.shape, y.dtype)

    def auto_transpose(self, y):
        """Adjoint via vjp of the noiseless forward (test oracle)."""
        probe = jnp.zeros(self.in_shape, jnp.float32)
        _, vjp = jax.vjp(lambda x: self.forward(x, noiseless=True), probe)
        return vjp(y)[0]


@register_operator(name="noise")
class DenoiseOperator(LinearOperator):
    """Identity operator (pure denoising)."""

    def __init__(self, sigma_s=0.0, in_shape=(1, 3, 256, 256), **kwargs):
        self.sigma_s = np.float32(sigma_s)
        self.in_shape = in_shape
        self.out_shape = in_shape

    def forward(self, data, noiseless=False, key=None):
        return self._noise(data, noiseless, key)

    def transpose(self, y):
        return y

    def ortho_project(self, data):
        return data

    def project(self, data):
        return data


@register_operator(name="colorization")
class ColorizationOperator(LinearOperator):
    """Channel mean: y = mean_c(x)."""

    def __init__(self, sigma_s=0.0, in_shape=(1, 3, 256, 256), **kwargs):
        self.sigma_s = np.float32(sigma_s)
        self.in_shape = in_shape
        self.out_shape = (in_shape[0], 1) + tuple(in_shape[2:])

    def forward(self, data, noiseless=False, key=None):
        y = jnp.mean(data, axis=1, keepdims=True)
        return self._noise(y, noiseless, key)

    def transpose(self, y):
        c = self.in_shape[1]
        return jnp.repeat(y, c, axis=1) / c


class _FFTBlurOperator(LinearOperator):
    """Shared FFT-diagonalised circular-convolution machinery."""

    def _init_kernel(self, kernel: np.ndarray, in_shape):
        self.in_shape = tuple(in_shape)
        self.out_shape = tuple(in_shape)
        h, w = in_shape[-2:]
        # host-numpy constants (embedded at trace time, never read back)
        self.kernel = np.asarray(kernel, np.float32)
        FB = p2o_np(self.kernel.reshape(1, 1, *self.kernel.shape), (h, w))
        # the OTF is stored as stacked (real, imag) float32 so the operator
        # pytree has no complex leaves: complex leaves are fine as trace-time
        # constants but cannot be device_put as jit *arguments* on remote TPU
        # backends; f32 leaves transfer everywhere and the complex view is
        # rebuilt in-trace (XLA represents complex as such a pair anyway)
        self.FB_ri = np.stack([FB.real, FB.imag]).astype(np.float32)
        self.F2B = (np.abs(FB) ** 2).astype(np.float32)

    @property
    def FB(self):
        return self.FB_ri[0] + 1j * self.FB_ri[1]

    @property
    def FBC(self):
        return self.FB_ri[0] - 1j * self.FB_ri[1]

    def get_kernel(self):
        return jnp.asarray(self.kernel).reshape(1, 1, *self.kernel.shape)

    @property
    def pre_calculated(self):
        """(FB, FBC, F2B, FBFy) tuple consumed by the mat solvers. FBFy is
        computed lazily from the last measurement (reference stores it after
        forward; solvers here recompute it from y directly when needed)."""
        return self.FB, self.FBC, self.F2B, None

    def forward(self, data, noiseless=False, key=None):
        y = fft_conv(data, self.FB)
        return self._noise(y, noiseless, key)

    def transpose(self, y):
        return fft_conv(y, self.FBC)


@register_operator(name="gaussian_blur")
class GaussianBlurOperator(_FFTBlurOperator):
    """61x61 gaussian blur (std from the paper's fixed kernel asset)."""

    def __init__(self, kernel_size=61, intensity=3.0, sigma_s=0.0,
                 in_shape=(1, 3, 256, 256), kernel=None, **kwargs):
        self.kernel_size = kernel_size
        self.sigma_s = np.float32(sigma_s)
        k = assets.gaussian_blur_kernel() if kernel is None else kernel
        self._init_kernel(np.asarray(k, np.float32), in_shape)


@register_operator(name="motion_blur")
class MotionBlurOperator(_FFTBlurOperator):
    """61x61 motion blur (fixed kernel asset; random synthesis available via
    free_hunch_tpu.operators.motionblur.MotionKernel)."""

    def __init__(self, kernel_size=61, intensity=0.5, sigma_s=0.0,
                 in_shape=(1, 3, 256, 256), kernel=None, **kwargs):
        self.kernel_size = kernel_size
        self.sigma_s = np.float32(sigma_s)
        k = assets.motion_blur_kernel() if kernel is None else kernel
        self._init_kernel(np.asarray(k, np.float32), in_shape)


@register_operator(name="super_resolution")
class SuperResolutionOperator(LinearOperator):
    """Bicubic downsample (ResizeRight semantics) with an FFT-factorised
    surrogate (bicubic conv kernel + s-fold sampling) for the mat solvers."""

    def __init__(self, in_shape=(1, 3, 256, 256), scale_factor=4, sigma_s=0.0, **kwargs):
        self.in_shape = tuple(in_shape)
        self.scale_factor = int(scale_factor)
        self.sigma_s = np.float32(sigma_s)
        h, w = in_shape[-2:]
        self.out_shape = (in_shape[0], in_shape[1], h // self.scale_factor,
                          w // self.scale_factor)
        self._down = build_resizer((h, w), 1.0 / self.scale_factor)
        self._up_adjoint_h = self._down.matrices[0].T
        self._up_adjoint_w = self._down.matrices[1].T
        # FFT surrogate used by the guidance solvers (blur-then-sample form);
        # host-numpy constants
        k = assets.bicubic_sr_kernel(self.scale_factor).astype(np.float32)
        FB = p2o_np(k.reshape(1, 1, *k.shape), (h, w))
        # stacked (real, imag) f32 — see _FFTBlurOperator._init_kernel
        self.FB_ri = np.stack([FB.real, FB.imag]).astype(np.float32)
        self.F2B = (np.abs(FB) ** 2).astype(np.float32)

    @property
    def FB(self):
        return self.FB_ri[0] + 1j * self.FB_ri[1]

    @property
    def FBC(self):
        return self.FB_ri[0] - 1j * self.FB_ri[1]

    @property
    def pre_calculated(self):
        return self.FB, self.FBC, self.F2B, None

    def get_kernel(self):
        return jnp.asarray(assets.bicubic_sr_kernel(self.scale_factor),
                           jnp.float32).reshape(1, 1, 25, 25)

    def forward(self, data, noiseless=False, key=None):
        y = self._down(data)
        return self._noise(y, noiseless, key)

    def transpose(self, y):
        """Adjoint of the bicubic downsample: R_h^T y R_w."""
        x = jnp.einsum("ho,...ow->...hw", self._up_adjoint_h, y)
        return jnp.einsum("...hw,wp->...hp", x, self._up_adjoint_w.T)

    def fft_forward(self, x):
        """The solver surrogate: downsample(ifft2(FB fft2(x)))."""
        return downsample(fft_conv(x, self.FB), self.scale_factor)

    def fft_transpose(self, y):
        return fft_conv(upsample(y, self.scale_factor), self.FBC)


@register_operator(name="inpainting")
class InpaintingOperator(LinearOperator):
    """Masked identity. Mask drawn at construction from ``mask_key`` (or a
    seed), matching the reference's fresh-mask-per-operator behaviour."""

    def __init__(self, sigma_s=0.0, mask_opt=None, mask=None, mask_key=None,
                 in_shape=None, **kwargs):
        mask_opt = dict(mask_opt or {"mask_type": "random", "image_size": 256,
                                     "mask_prob_range": (0.1, 0.3)})
        size = mask_opt.get("image_size", 256)
        self.in_shape = tuple(in_shape) if in_shape else (1, 3, size, size)
        self.out_shape = self.in_shape
        self.sigma_s = np.float32(sigma_s)
        if mask is not None:
            self.mask = jnp.asarray(mask, jnp.float32)
        else:
            if mask_key is None:
                mask_key = jax.random.PRNGKey(np.random.randint(0, 2**31 - 1))
            self.mask = masks.generate_mask(mask_key, mask_opt, self.in_shape[1])

    def forward(self, data, noiseless=False, key=None):
        # noise is added before masking, as in the reference (:213-217)
        y = self._noise(data, noiseless, key)
        return y * self.mask

    def transpose(self, y):
        return y * self.mask


class NonLinearOperator(LinearOperator):
    def project(self, data, measurement, **kwargs):
        return data + measurement - self.forward(data, noiseless=True)


@register_operator(name="phase_retrieval")
class PhaseRetrievalOperator(NonLinearOperator):
    """|F(pad(x))| amplitude measurement (reference :331-340)."""

    def __init__(self, oversample=2.0, in_shape=(1, 3, 256, 256), sigma_s=0.0, **kwargs):
        self.pad = int((oversample / 8.0) * in_shape[-1])
        self.in_shape = tuple(in_shape)
        self.sigma_s = np.float32(sigma_s)

    def forward(self, data, noiseless=False, key=None):
        p = self.pad
        padded = jnp.pad(data, ((0, 0), (0, 0), (p, p), (p, p)))
        # centered, orthonormal 2-D FFT amplitude
        f = jnp.fft.fftshift(fftops.fft2(jnp.fft.ifftshift(
            padded.astype(jnp.complex64), axes=(-2, -1)), norm="ortho"), axes=(-2, -1))
        amp = jnp.abs(f)
        return self._noise(amp, noiseless, key)


# Pytree registrations: device arrays as leaves, config as static aux.
register_operator_pytree(DenoiseOperator, ("sigma_s",))
register_operator_pytree(ColorizationOperator, ("sigma_s",))
register_operator_pytree(GaussianBlurOperator, ("sigma_s", "kernel", "FB_ri", "F2B"))
register_operator_pytree(MotionBlurOperator, ("sigma_s", "kernel", "FB_ri", "F2B"))
register_operator_pytree(SuperResolutionOperator,
                         ("sigma_s", "FB_ri", "F2B",
                          "_up_adjoint_h", "_up_adjoint_w"))
register_operator_pytree(InpaintingOperator, ("sigma_s", "mask"))
register_operator_pytree(PhaseRetrievalOperator, ("sigma_s",))


@register_operator(name="nonlinear_blur")
class NonlinearBlurOperator(NonLinearOperator):
    """Learned kernel-space blur. The reference depends on the external
    ``bkse.models.kernel_encoding.kernel_wizard`` model whose code is absent
    from its snapshot (SURVEY.md §7.4 — broken upstream); gated here with an
    explicit error until a KernelWizard port lands."""

    def __init__(self, opt_yml_path=None, **kwargs):
        raise NotImplementedError(
            "nonlinear_blur requires the external bkse KernelWizard model, "
            "which is missing from the upstream snapshot as well")
