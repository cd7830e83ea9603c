"""free_hunch_tpu — a TPU-native (JAX/XLA/Pallas) framework for guided-diffusion
inverse problems with online denoiser-covariance estimation ("Free Hunch",
Rissanen et al., ICLR 2025).

Capability parity target: AaltoML/free-hunch (PyTorch/CUDA reference), re-designed
TPU-first:

* the whole guided sampling run is ONE ``jax.jit`` containing a ``lax.scan``
  over the sigma grid (reference: a Python-level per-step loop,
  ``generate_conditional.py:131-167``),
* the online covariance model is a fixed-capacity ``diag(a) + U M U^T``
  pytree in float32 (reference: dynamically growing complex128 CPU tensors
  with ``scipy.linalg.sqrtm``, ``conditioning_utils/online_update_bfgs.py``),
* guidance linear systems are solved by a batched masked ``lax.while_loop``
  conjugate-gradient whose matvec (FFT ∘ iDCT ∘ low-rank ∘ DCT ∘ FFT) fuses
  under XLA (reference: torch/scipy CG with host round-trips),
* everything carries a leading batch axis and shards over a
  ``jax.sharding.Mesh`` (reference: hard batch-size-1 assert + torchrun ranks).
"""

__version__ = "0.1.0"

from free_hunch_tpu.utils.easydict import EasyDict  # noqa: F401
