"""DDNM+ evaluation driver (the reference's entry point B).

Parity: ``generate_conditional.py:487-494`` routes
``--conditioning_mechanism=ddnm`` to the SVD sampler with doubled steps; this
module plugs the DDNM+ scan into the shared evaluation loop. The raw
epsilon-prediction UNet is driven directly on the DDPM index grid (variance
channel stripped), bypassing the preconditioner as upstream does.
"""
from __future__ import annotations

import dataclasses

import jax

from free_hunch_tpu.eval import Evaluator
from free_hunch_tpu.samplers.ddnm import build_svd_operator, ddnm_sample


@dataclasses.dataclass
class DDNMEvaluator(Evaluator):
    def __post_init__(self):
        self.opts = dict(self.opts, conditioning_mechanism="ddnm")
        super().__post_init__()
        self.num_steps = int(self.opts.get("num_steps", 100))
        self.sigma_y = float(self.opts.get("noise_sigma", 0.0))
        self.eta = float(self.opts.get("eta", 1.0))
        self._svd_template = None
        if not self.is_inpainting:
            self._svd_template = build_svd_operator(
                self.operator_kwargs, self.res)

    def _batch_fn(self, params, noise, cond_latents, operator, key, labels=None):
        b = noise.shape[0]

        def eps_fn(x, t):
            out = self.model.apply(params, x, t, y=labels)
            return out[:, :3]  # strip the learned-variance channel (ref :107)

        y = operator.A(cond_latents.reshape(b, -1))
        y = y + self.sigma_y * jax.random.normal(jax.random.fold_in(key, 0),
                                                 y.shape, y.dtype)
        x, traj = ddnm_sample(eps_fn, operator, noise, y,
                              num_steps=self.num_steps, sigma_y=self.sigma_y,
                              eta=self.eta, rng_key=jax.random.fold_in(key, 1),
                              return_trajectory=self.save_videos)
        # measurement image for the forward_images/ output directory
        if self.operator_kwargs["name"] == "inpainting":
            y_img = operator.A_with_zeros(cond_latents.reshape(b, -1)).reshape(
                cond_latents.shape)
        else:
            y_img = operator.At(y).reshape(cond_latents.shape)
        return x, (traj if self.save_videos else None), y_img

    def _make_operator(self, batch_keys):
        if self._svd_template is not None:
            return self._svd_template
        # fresh random mask PER IMAGE (reference: fresh operator per image),
        # each repeated across its seed replicas — the batched Inpainting
        # carries per-row permutations, mirroring the base Evaluator's
        # per-image mask pytree
        from free_hunch_tpu.operators.svd import create_inpainting_operator
        return create_inpainting_operator(
            3, self.res, self.operator_kwargs["mask_opt"],
            mask_key=list(batch_keys), repeats=len(self.seeds))
