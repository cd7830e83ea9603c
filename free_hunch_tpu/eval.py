"""Conditional-generation evaluation driver (orchestration layer).

Parity: reference ``generate_conditional.py:289-598`` — dataset sharding
across processes, per-image batching, operator/noise assembly, sampling,
PSNR/SSIM/LPIPS, cross-process metric reduction, results.txt, image/video
output, and excess-image pruning.

TPU redesign:

* ONE jitted batch function (model params, noise, conditioning images,
  operator pytree, rng key -> images) is compiled once and reused for every
  batch; fresh per-image inpainting masks flow through the operator pytree
  without retracing,
* real batching: `batch_size` images x len(seeds) samples per call (the
  reference hard-codes batch 1), sharded over the device mesh on a 'data'
  axis,
* process-level sharding is deterministic strided indexing (replaces
  DistributedSampler); metrics reduce with a process_allgather mean,
* no rank-0-first barriers: every process loads the converted checkpoint.
"""
from __future__ import annotations

import dataclasses
import json
import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import PIL.Image

from free_hunch_tpu.data.dataset import ImageFolderDataset, shard_indices
from free_hunch_tpu.data.encoders import StandardRGBEncoder
from free_hunch_tpu.guidance import choose_conditioning_mechanism
from free_hunch_tpu.metrics.quality import lpips_fn, psnr, ssim
from free_hunch_tpu.models.loading import load_model, wrap_precond
from free_hunch_tpu.operators import get_operator
from free_hunch_tpu.operators import masks as mask_mod
from free_hunch_tpu.parallel import dist_init, get_rank, get_world_size
from free_hunch_tpu.parallel.mesh import make_mesh, shard_batch
from free_hunch_tpu.samplers.edm import (prepare_schedule, required_cov_capacity,
                                         sample_scan)
from free_hunch_tpu.utils.logging import setup_logger
from free_hunch_tpu.utils.misc import set_random_seed

logger = setup_logger()

_SCHEDULE_KEYS = ("num_steps", "sigma_min", "sigma_max", "rho", "solver",
                  "discretization", "schedule", "scaling", "S_churn", "S_min",
                  "S_max", "S_noise")
_MECH_KEYS = dict(
    online_covariance=("max_vector_count", "image_base_covariance",
                       "denoiser_mean_error_threshold",
                       "use_analytical_score_time_update", "project_to_diagonal",
                       "space_step_update_threshold",
                       "space_step_update_lower_threshold", "do_space_updates",
                       "use_analytic_var_at_end", "solver_type", "cg_coords",
                       "cg_warm_start",
                       "guidance_gradient", "guidance_vjp_below",
                       "bfgs_secant_novelty_min"),
    diffpir=("diffpir_lambda",),
)


def build_operator_kwargs(opts) -> dict:
    """CLI option -> operator kwargs (reference cmdline:461-486)."""
    res = opts.get("img_resolution", 256)
    kw = dict(name=opts["operator_name"], kernel_size=opts.get("kernel_size", 61),
              intensity=opts.get("intensity", 1.0),
              sigma_s=opts.get("noise_sigma", 0.1),
              scale_factor=opts.get("scale_factor", 2),
              in_shape=(1, 3, res, res))
    itype = opts.get("inpainting_type", "random")
    if itype == "box":
        kw["mask_opt"] = {"mask_type": "box", "mask_len_range": (64, 156),
                          "mask_prob_range": (0.1, 0.3), "image_size": res}
    elif itype == "random":
        kw["mask_opt"] = {"mask_type": "random", "mask_len_range": (64, 156),
                          "mask_prob_range": (opts.get("inpainting_prob_lower", 0.1),
                                              opts.get("inpainting_prob_upper", 0.3)),
                          "image_size": res}
    else:
        raise ValueError(f"Inpainting type {itype} is not supported")
    return kw


@dataclasses.dataclass
class Evaluator:
    opts: dict

    def __post_init__(self):
        opts = self.opts
        dist_init()
        self.rank, self.world = get_rank(), get_world_size()
        self.key = set_random_seed(int(opts.get("seed", 0)), self.rank)
        # disjoint key domains per purpose: fold_in(k, i) == split(k)[i] for
        # threefry, so folding raw indices into ONE key collides across
        # purposes once counters overlap (e.g. batch 1000+g vs mask key g)
        self._key_mask = jax.random.fold_in(self.key, 0)
        self._key_batch = jax.random.fold_in(self.key, 1)
        self._key_enc = jax.random.fold_in(self.key, 2)
        # PROCESS-LOCAL mesh: the driver's parallel design is the
        # reference's (SURVEY.md §2.2) — images strided across processes
        # (shard_indices below), each process computing its own batches —
        # so the mesh parallelises devices WITHIN a process only. A global
        # mesh here would try to device_put local batches onto other
        # processes' non-addressable devices.
        self.mesh = make_mesh(opts.get("mesh_shape", "data:-1"),
                              devices=jax.local_devices())
        mesh_axes = dict(zip(self.mesh.axis_names, self.mesh.devices.shape))
        # mesh_shape=data:N,model:M (M>1) turns on model parallelism: the
        # UNet torso is spatially partitioned (height over 'model', GSPMD
        # halo exchanges) and the FreeHunch covariance state is sharded on
        # the d dimension — the >1-chip path for activation/vjp HBM.
        self._model_parallel = mesh_axes.get("model", 1) > 1

        # --- model ----------------------------------------------------------
        dtype = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[
            opts.get("dtype", "bfloat16")]
        remat = bool(opts.get("remat", False))
        if opts.get("guidance_gradient") == "hybrid" and not remat:
            # hybrid REQUIRES the remat'd UNet: without jax.checkpoint every
            # forward activation must cross the lax.cond boundary as a
            # pullback residual — measured 44G of HBM at 256px batch 8
            # (bench.py applies the same coupling)
            logger.warning("guidance_gradient=hybrid forces remat=True "
                           "(cond-boundary pullback residuals)")
            remat = True
        quant = opts.get("quant", "none")
        quant = None if quant in (None, "none", "") else quant
        self._quant = quant
        self.model, self.params, model_args = load_model(
            opts.get("openai_state_dict_path"), opts["openai_setup_path"],
            dtype=dtype, remat=remat,
            init_random_if_missing=bool(opts.get("allow_random_init", False)),
            spatial_partition=(("data", "model") if self._model_parallel
                               else None),
            quant=quant)
        self._model_args = model_args
        self._precond_kind = opts.get("iddpm_preconditioning", "linear")
        if quant == "int8_static":
            # static scales need the calibration table, built below once the
            # schedule/operator/mechanism exist; until then a DYNAMIC-scale
            # twin provides the (identical) sigma grid for scheduling
            from free_hunch_tpu.models.unet import create_model
            dyn = create_model(dtype=dtype, remat=remat, quant="int8",
                               **model_args)
            self.precond = wrap_precond(dyn, model_args, self._precond_kind)
        else:
            self.precond = wrap_precond(self.model, model_args,
                                        self._precond_kind)
        self.res = model_args.get("image_size", 256)
        self.encoder = StandardRGBEncoder()

        # --- dataset ----------------------------------------------------------
        ds_name = opts.get("dataset_name",
                           "free_hunch_tpu.data.dataset.ImageFolderDataset")
        if ds_name in ("training.dataset.ImageFolderDataset", None):
            # reference config default -> our dataset class
            ds_name = "free_hunch_tpu.data.dataset.ImageFolderDataset"
        from free_hunch_tpu.utils.dynamic import construct_class_by_name
        # class-conditional checkpoints need dataset.json labels loaded —
        # without use_labels=True get_label returns empty arrays and every
        # sample would silently condition on class 0
        use_labels = bool(model_args.get("class_cond"))
        self.dataset = construct_class_by_name(
            class_name=ds_name, path=opts["dataset_path"],
            resolution=self.res, return_idx=True, use_labels=use_labels)
        total = opts.get("total_images") or len(self.dataset)
        total = min(total, len(self.dataset))
        self.indices = shard_indices(total, self.world, self.rank)
        self.seeds = list(opts.get("seeds", [0]))
        self.batch_size = max(int(opts.get("batch_size", 1)), 1)
        # real multi-frame trajectory videos (the reference's save_videos
        # :266-281 only ever receives the initial-noise frame because its
        # sampler never appends to x_all:118 — we wire the full trajectory)
        self.save_videos = bool(opts.get("save_videos", False))

        # --- schedule + operator + mechanism ---------------------------------
        sched_kw = {k: opts[k] for k in _SCHEDULE_KEYS if k in opts and opts[k] is not None}
        if sched_kw.get("S_max") in ("inf", float("inf")):
            sched_kw["S_max"] = float("inf")
        self.xs, self.sigma0_scaled = prepare_schedule(
            round_sigma=self.precond.round_sigma,
            net_sigma_min=self.precond.sigma_min,
            net_sigma_max=self.precond.sigma_max, **sched_kw)

        self.operator_kwargs = build_operator_kwargs(dict(opts, img_resolution=self.res))
        self.is_inpainting = opts["operator_name"] == "inpainting"
        self._template_op = get_operator(**self.operator_kwargs,
                                         mask_key=jax.random.PRNGKey(0))

        mech_name = opts.get("conditioning_mechanism", "dps")
        if mech_name == "ddnm":
            # the DDNM+ path has no conditioning mechanism; the subclass
            # (eval_ddnm.DDNMEvaluator) installs its own batch function
            self._mech_builder = None
            self._run_batch = jax.jit(self._batch_fn)
            self._install_codecs()
            self._lpips = lpips_fn("vgg")
            self._install_fid()
            return
        mech_cls = choose_conditioning_mechanism(mech_name)
        mkw = dict(cond_scaling=opts.get("cond_scaling", 1.0),
                   clip_x0_mean=bool(opts.get("clip_x0_mean", False)),
                   pigdm_posthoc_scaling=bool(opts.get("pigdm_posthoc_scaling", False)),
                   max_rtol=opts.get("max_rtol", 1.0),
                   use_rtol_func=bool(opts.get("use_rtol_func", False)),
                   cg_maxiter=opts.get("cg_maxiter"))
        for k in _MECH_KEYS.get(mech_name, ()):
            if k in opts:
                mkw[k] = opts[k]
        if mech_name == "online_covariance":
            # robustness knobs (config keys; None = reference behaviour,
            # see docs/design.md "Robustness knobs" for the A/B)
            mkw.update(transport_mean_bound=opts.get("transport_mean_bound"),
                       guidance_update_bound=opts.get("guidance_update_bound"),
                       cov_partition=(("data", "model")
                                      if self._model_parallel else None),
                       init_denoiser_variance=1.0,
                       init_noise_variance=float(self.sigma0_scaled) ** 2,
                       data_dim=3 * self.res * self.res,
                       cov_capacity=self._cov_capacity(opts),
                       data_dir=opts.get("dataset_path"))
        self._mech_builder = lambda op: mech_cls(forward_operator=op, **mkw)

        if self._quant == "int8_static":
            self._calibrate_static_qscales()
        self._run_batch = jax.jit(self._batch_fn)
        self._install_codecs()
        self._lpips = lpips_fn("vgg")
        self._install_fid()

    def _calibrate_static_qscales(self):
        """quant='int8_static': build (or load) the per-(site, sigma-stage)
        activation-scale table and install the static-mode preconditioner
        (models/calibrate.py). Calibration replays the production sampler on
        one synthetic batch; the table is cached next to the checkpoint keyed
        by architecture + schedule + margin."""
        from free_hunch_tpu.models import calibrate as cal
        opts = self.opts
        if self._mech_builder is None:
            raise ValueError("quant='int8_static' is not supported for the "
                             "ddnm driver; use quant='int8' there")
        num_steps = int(np.asarray(self.xs["sigma_hat"]).shape[0])
        margin = float(opts.get("qscale_margin", 1.1))
        n_draws = int(opts.get("qscale_calib_draws", 3))
        ckpt = opts.get("openai_state_dict_path") or "qscales"
        cache = cal.qscales_cache_key(ckpt, self._model_args, num_steps,
                                      self.res, margin) \
            + (f".d{n_draws}" if n_draws != 1 else "")
        qs = cal.load_qscales(cache)
        if qs is None:
            logger.info(f"calibrating int8_static activation scales "
                        f"({n_draws} dynamic-int8 sampler replays)...")
            op = self._template_op
            b = self.batch_size
            shape = (b, 3, self.res, self.res)
            for d in range(n_draws):
                key = jax.random.fold_in(jax.random.fold_in(self.key, 3), d)
                cond = jax.random.uniform(jax.random.fold_in(key, 0), shape,
                                          minval=-1, maxval=1)
                y = jax.jit(lambda c, k: op.forward(c, noiseless=False,
                                                    key=k))(
                    cond, jax.random.fold_in(key, 1))
                noise = jax.random.normal(jax.random.fold_in(key, 2), shape)
                t = cal.calibrate_qscales(
                    self._model_args, self.params, self._mech_builder(op),
                    noise, y, self.xs, self.sigma0_scaled,
                    jax.random.fold_in(key, 4), dtype=self.model.cfg.dtype,
                    margin=margin, precond_kind=self._precond_kind)
                qs = t if qs is None else cal.merge_qscales(qs, t)
            try:
                cal.save_qscales(cache, *qs)
            except OSError:
                pass
        self.precond = wrap_precond(self.model, self._model_args,
                                    self._precond_kind, qscales=qs)

    def _install_fid(self):
        """Optional FID accumulation against precomputed reference stats
        (``--fid_ref_stats=stats.npz`` from scripts/compute_fid_stats.py).
        The reference repo computes no FID (its ref_stats_name key is an EDM
        vestige); the paper reports it, so the driver can."""
        self._fid = None
        path = self.opts.get("fid_ref_stats")
        if not path:
            return
        if not os.path.exists(path):
            # fail fast: a typo'd path must not silently drop FID from
            # results.json after a multi-hour run
            raise FileNotFoundError(
                f"--fid_ref_stats={path} does not exist (build it with "
                f"scripts/compute_fid_stats.py)")
        from free_hunch_tpu.metrics import fid as fid_mod
        extract, is_proxy = fid_mod.make_extractor()
        ref_blob = np.load(path)
        if "is_proxy" in ref_blob and bool(ref_blob["is_proxy"]) != is_proxy:
            # fail fast: comparing features from two different networks
            # produces a number that is not an FID of anything
            raise ValueError(
                f"--fid_ref_stats={path} was computed with "
                f"{'the proxy' if bool(ref_blob['is_proxy']) else 'real'} "
                f"Inception features but this run uses "
                f"{'the proxy' if is_proxy else 'real'} ones — rebuild the "
                f"stats with scripts/compute_fid_stats.py under the same "
                f"FID_WEIGHTS setting")
        self._fid = dict(mod=fid_mod, extract=extract, is_proxy=is_proxy,
                         stats=fid_mod.FeatureStats(), ref=path)
        if is_proxy:
            logger.warning("FID_WEIGHTS not set: FID uses deterministic "
                           "random Inception features (fid_is_proxy=true; "
                           "not comparable to published numbers)")

    def _fid_add_u8(self, images_u8: np.ndarray):
        feats = self._fid["extract"](
            jnp.asarray(images_u8, jnp.float32) / 127.5 - 1.0)
        self._fid["stats"].add(np.asarray(feats))

    def _fid_replay_ok(self, outdir: str, batch_id: str) -> bool:
        """On resume, FID features of journaled batches are re-extracted from
        the saved PNGs (metric journals hold only scalar means). Returns False
        — forcing full recomputation — when any image is missing (e.g.
        pruned), so the FID stream stays complete."""
        if self._fid is None:
            return True
        paths = [os.path.join(outdir, "images", f"{n}.png")
                 for n in batch_id.split("|")]
        if not all(os.path.exists(p) for p in paths):
            return False
        imgs = np.stack([np.asarray(PIL.Image.open(p).convert("RGB"))
                         .transpose(2, 0, 1) for p in paths])
        self._fid_add_u8(imgs)
        return True

    def _cov_capacity(self, opts) -> int:
        """'auto' (default): exact schedule-derived capacity (see
        ``samplers.edm.required_cov_capacity``) — every CG iteration streams
        the whole (d, K) factor, so an oversized K is pure HBM-bandwidth
        waste. An integer pins it explicitly (e.g. for A/B against the
        reference's max_vector_count budget)."""
        cap = opts.get("cov_capacity", "auto")
        if cap in (None, "auto", 0, "0"):
            return required_cov_capacity(
                self.xs,
                lower=float(opts.get("space_step_update_lower_threshold", 1.0)),
                upper=float(opts.get("space_step_update_threshold", 10.0)),
                do_space_updates=bool(opts.get("do_space_updates", True)))
        return int(cap)

    def _install_codecs(self):
        """Every device computation outside the main batch function also runs
        under jit: remote TPU backends (axon) mis-handle eagerly dispatched
        ops — their outputs can neither transfer to the host nor feed later
        computations reliably."""
        self._decode = jax.jit(self.encoder.decode)
        # stochastic encoders (the SD-VAE samples its latent posterior) take
        # an explicit key: a keyless encode under jit would freeze its
        # internal RNG split at trace time and reuse the same noise forever
        import inspect
        if "key" in inspect.signature(self.encoder.encode).parameters:
            self._encode = jax.jit(lambda x, k: self.encoder.encode(x, key=k))
        else:
            _enc = jax.jit(self.encoder.encode)
            self._encode = lambda x, k=None: _enc(x)
        res = self.res

        def gen_noise(seeds):
            return jax.vmap(lambda sd: jax.random.normal(
                jax.random.PRNGKey(sd), (3, res, res)))(seeds)

        self._gen_noise = jax.jit(gen_noise)
        if self.is_inpainting:
            opt = dict(self.operator_kwargs["mask_opt"])
            self._gen_masks = jax.jit(
                lambda keys: jax.vmap(
                    lambda k: mask_mod.generate_mask(k, opt, 3)[0])(keys))

    # -- the compiled per-batch function ---------------------------------------

    def _batch_fn(self, params, noise, cond_latents, operator, key, labels=None):
        denoise = lambda x, s: self.precond.apply(params, x, s, y=labels)
        mech = self._mech_builder(operator)
        y = operator.forward(cond_latents, noiseless=False,
                             key=jax.random.fold_in(key, 0))
        x, traj = sample_scan(denoise, mech, noise, y, self.xs,
                              jax.random.fold_in(key, 1),
                              sigma0_scaled=self.sigma0_scaled,
                              return_trajectory=self.save_videos)
        return x, (traj if self.save_videos else None), y

    def _make_operator(self, batch_keys):
        """Fresh random mask per image for inpainting (reference: fresh
        operator per image, measurements.py:211); shared operator otherwise."""
        if not self.is_inpainting:
            return self._template_op
        masks_b = self._gen_masks(jnp.stack(batch_keys))  # (b, C, H, W)
        # every seed-replica of an image shares its mask
        mask = jnp.repeat(masks_b, len(self.seeds), axis=0)
        return get_operator(**self.operator_kwargs, mask=mask)

    # -- main loop ---------------------------------------------------------------

    def run(self) -> dict:
        opts = self.opts
        outdir = opts["outdir"]
        os.makedirs(outdir, exist_ok=True)
        if self.rank == 0:
            # per-run config dump for reproducibility + the visualisation tool
            # (the reference's create_image_visualisation.py expected one that
            # its driver never wrote — SURVEY.md §7.4)
            with open(os.path.join(outdir, "config.json"), "w") as f:
                json.dump({k: v for k, v in sorted(dict(opts).items())
                           if isinstance(v, (str, int, float, bool, list,
                                             tuple, type(None)))}, f, indent=2)
        n_seeds = len(self.seeds)
        acc = MetricAccumulator("psnr", "ssim", "lpips")
        n_batches = 0
        n_resumed = 0
        t0 = time.time()

        # --- sample-level resume (beyond the reference: SURVEY.md §5 notes a
        # crash loses the run and a rerun regenerates everything). Each
        # process journals completed batches to metrics_rank*.jsonl (written
        # AFTER the batch's images are saved, so a record implies artifacts
        # on disk); --resume=true replays journal records instead of
        # recomputing, and the RNG stream stays aligned because skipped
        # batches advance n_batches exactly like computed ones.
        journal_path = os.path.join(outdir,
                                    f"metrics_rank{self.rank:02d}.jsonl")
        resume = bool(opts.get("resume", False))
        done = {}
        if resume and os.path.exists(journal_path):
            with open(journal_path) as f:
                for line in f:
                    try:
                        rec = json.loads(line)
                        done[rec["batch"]] = rec
                    except (ValueError, KeyError):
                        pass  # truncated tail record from a crash
        journal = open(journal_path, "a" if resume else "w")

        for start in range(0, len(self.indices), self.batch_size):
            idx_chunk = self.indices[start:start + self.batch_size]
            # the dataset returns its argument as the global index
            # (data/dataset.py __getitem__), so batch identity needs no
            # image decode — replayed batches skip dataset IO entirely
            gidx = [int(i) for i in idx_chunk]
            batch_id = "|".join(f"{g:06d}_{s:06d}" for g in gidx
                                for s in self.seeds)
            if batch_id in done and self._fid_replay_ok(outdir, batch_id):
                rec = done[batch_id]
                acc.add(int(rec["n"]), psnr=rec["psnr"], ssim=rec["ssim"],
                        lpips=rec["lpips"])
                n_batches += 1
                n_resumed += 1
                logger.info(f"batch {n_batches}: resumed from journal "
                            f"(psnr={rec['psnr']:.3f})")
                continue
            imgs, labs = [], []
            for i in idx_chunk:
                _, img, lab = self.dataset[int(i)]
                imgs.append(img)
                labs.append(lab)
            cond_u8 = np.stack(imgs)  # (b, C, H, W) uint8
            cond_rep = np.repeat(cond_u8, n_seeds, axis=0)
            # encode key: a pure function of the batch counter, so a resumed
            # run (which also advances n_batches on replay) stays aligned
            cond_latents = self._encode(
                jnp.asarray(cond_rep),
                jax.random.fold_in(self._key_enc, n_batches))
            # class-conditional models: onehot labels -> class indices,
            # repeated per seed; unconditional datasets carry empty labels
            labels = None
            if getattr(self.precond, "label_dim", 0) and np.size(labs[0]):
                labels = jnp.asarray(np.repeat(
                    np.argmax(np.stack(labs), axis=-1), n_seeds), jnp.int32)
            # per-(image, seed) noise via one jitted vmapped draw
            seed_arr = jnp.asarray([int(s) % (1 << 31) for g in gidx
                                    for s in self.seeds], jnp.int32)
            noise = self._gen_noise(seed_arr)
            op = self._make_operator(
                [jax.random.fold_in(self._key_mask, g) for g in gidx])
            batch_key = jax.random.fold_in(self._key_batch, n_batches)

            data_axis = dict(zip(self.mesh.axis_names, self.mesh.devices.shape)
                             ).get("data", 1)
            if noise.shape[0] % max(data_axis, 1) == 0:
                noise, cond_latents = shard_batch((noise, cond_latents), self.mesh)
            # ambient mesh context: the model-parallel sharding constraints
            # (UNet spatial_partition / FreeHunch cov_partition) are bare
            # PartitionSpecs that resolve against the context mesh
            with self.mesh:
                x, traj, y = self._run_batch(self.params, noise, cond_latents,
                                             op, batch_key, labels)

            gen_u8 = np.asarray(self._decode(x))
            y_u8 = np.asarray(self._decode(y))

            # --- save artifacts (reference :517-537) -------------------------
            names = [f"{g:06d}_{s:06d}.png" for g in gidx for s in self.seeds]
            if opts.get("save_images", True):
                _save_images(gen_u8, os.path.join(outdir, "images"), names)
            if opts.get("num_other_images_to_save", 0) > 0:
                _save_images(cond_rep, os.path.join(outdir, "cond_images"), names)
                _save_images(y_u8, os.path.join(outdir, "forward_images"), names)
            if self.save_videos and traj is not None:
                # (T, B, C, H, W) -> T decoded frames of (B, C, H, W)
                t_steps = traj.shape[0]
                flat = jnp.reshape(traj, (-1,) + tuple(traj.shape[2:]))
                dec = np.asarray(self._decode(flat))
                frames = dec.reshape((t_steps, -1) + dec.shape[1:])
                _save_videos(list(frames), os.path.join(outdir, "videos"), names)

            # --- metrics (reference :543-551); one jitted vmapped call -------
            if not hasattr(self, "_metric_fn"):
                def _metrics(a, b):
                    return (psnr(a, b),
                            jax.vmap(lambda u, v: ssim(u, v, channel_axis=0))(a, b))
                self._metric_fn = jax.jit(_metrics)
            p_all, s_all = self._metric_fn(jnp.asarray(cond_rep, jnp.float32),
                                           jnp.asarray(gen_u8, jnp.float32))
            p = float(jnp.mean(p_all))
            s_vals = np.asarray(s_all)
            lp = self._lpips(cond_rep.astype(np.float32) / 127.5 - 1,
                             gen_u8.astype(np.float32) / 127.5 - 1)
            if self._fid is not None:
                self._fid_add_u8(gen_u8)
            acc.add(gen_u8.shape[0], psnr=p, ssim=float(np.mean(s_vals)),
                    lpips=float(lp))
            if batch_id not in done:  # keep the journal one-record-per-batch
                # (a journaled batch only recomputes when its PNGs were
                # pruned and FID needed them; the record is already present)
                journal.write(json.dumps(dict(
                    batch=batch_id, n=int(gen_u8.shape[0]), psnr=p,
                    ssim=float(np.mean(s_vals)), lpips=float(lp))) + "\n")
                journal.flush()
            n_batches += 1
            logger.info(f"batch {n_batches}: psnr={p:.3f} ssim={np.mean(s_vals):.4f} "
                        f"lpips={lp:.4f}")
            # fault-injection is DOUBLE-gated (opts key AND env var): the key
            # is undeclared in the config schema, and a stray programmatic
            # opt must not be able to hard-kill a production eval mid-flight
            kill_after = (opts.get("fault_kill_after_batches")
                          if os.environ.get("FREE_HUNCH_FAULT_INJECT") == "1"
                          else None)
            if kill_after and (n_batches - n_resumed) >= int(kill_after):
                # fault-injection hook (tests/test_multiprocess.py): simulate
                # a hard crash (kill -9) AFTER this batch's artifacts and
                # journal record hit disk. The elastic-recovery contract: a
                # restart with --resume replays the journaled batches and
                # recomputes the rest, reproducing the uninterrupted run's
                # journal byte-for-byte. (The reference has no recovery at
                # all — torch_utils/distributed.py:59-70 stubs.)
                import signal
                journal.close()
                logger.warning(f"fault injection: SIGKILL after "
                               f"{kill_after} computed batches")
                os.kill(os.getpid(), signal.SIGKILL)

        journal.close()
        elapsed = time.time() - t0
        totals = _process_mean(acc.means(), acc.count)
        totals["time_taken"] = elapsed
        # global counts (psnr/ssim/lpips above are cross-process means; a
        # rank-local image count next to them would under-report by world
        # size). time_taken stays rank-local wall clock, like the reference's.
        totals["images"] = _process_sum(len(self.indices) * n_seeds)
        totals["resumed_batches"] = _process_sum(n_resumed)
        totals["lpips_is_proxy"] = bool(getattr(self._lpips, "is_proxy", False))
        if self._fid is not None:
            st = self._fid["stats"]
            if get_world_size() > 1:
                st = self._fid["mod"].allgather_merge(st)
            if st.n >= 2:
                # extractor/ref proxy consistency was enforced in _install_fid
                totals["fid"] = self._fid["mod"].compute_fid(st, self._fid["ref"])
                totals["fid_is_proxy"] = bool(self._fid["is_proxy"])

        if self.rank == 0:
            with open(os.path.join(outdir, "results.txt"), "w") as f:
                f.write(f"PSNR: {totals['psnr']}\n")
                f.write(f"SSIM: {totals['ssim']}\n")
                f.write(f"LPIPS: {totals['lpips']}\n")
                if "fid" in totals:
                    f.write(f"FID: {totals['fid']}\n")
            with open(os.path.join(outdir, "results.json"), "w") as f:
                json.dump(totals, f, indent=2)
            _prune_images(outdir, opts.get("num_other_images_to_save"))
        return totals


class MetricAccumulator:
    """Sample-weighted running mean of named metrics. Guards against the
    ragged-final-batch bias: per-batch means are re-weighted by batch size
    before aggregation (the reference averages per-batch means,
    generate_conditional.py:549-569 — SURVEY.md §7.4)."""

    def __init__(self, *names: str):
        self.sums = {n: 0.0 for n in names}
        self.count = 0

    def add(self, batch_size: int, **batch_means: float):
        for n, v in batch_means.items():
            self.sums[n] += float(v) * batch_size
        self.count += batch_size

    def means(self) -> dict:
        d = max(self.count, 1)
        return {n: s / d for n, s in self.sums.items()}


def _process_sum(n: int) -> int:
    """Sum a rank-local integer across processes."""
    if get_world_size() > 1:
        from jax.experimental import multihost_utils
        return int(np.asarray(multihost_utils.process_allgather(
            np.asarray([float(n)]))).sum())
    return int(n)


def _process_mean(means: dict, n_samples: int) -> dict:
    """Cross-process SAMPLE-weighted metric mean. The reference all-reduces
    per-rank batch averages (generate_conditional.py:557-569), which is wrong
    for unequal shards; we gather (sum, count) pairs and divide once."""
    if get_world_size() > 1:
        from jax.experimental import multihost_utils
        n = float(n_samples)
        arr = np.asarray([means["psnr"] * n, means["ssim"] * n,
                          means["lpips"] * n, n])
        gathered = np.asarray(multihost_utils.process_allgather(arr))
        sums = gathered[:, :3].sum(axis=0)
        count = max(gathered[:, 3].sum(), 1.0)
        return dict(means, psnr=float(sums[0] / count),
                    ssim=float(sums[1] / count), lpips=float(sums[2] / count))
    return dict(means)


def _save_images(images_u8: np.ndarray, image_dir: str, names) -> None:
    os.makedirs(image_dir, exist_ok=True)
    for img, name in zip(images_u8, names):
        PIL.Image.fromarray(img.transpose(1, 2, 0), "RGB").save(
            os.path.join(image_dir, name))


def _save_videos(frames_list, video_dir: str, names) -> None:
    """mp4 of the sampling trajectory per sample, one frame per ODE step
    (reference save_videos:266-281 — which upstream only ever fed the initial
    noise frame; here ``frames_list`` is the real T-frame trajectory)."""
    import cv2
    os.makedirs(video_dir, exist_ok=True)
    n = frames_list[0].shape[0]
    for i in range(n):
        path = os.path.join(video_dir, names[i].replace(".png", ".mp4"))
        h, w = frames_list[0][i].shape[-2:]
        vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 10, (w, h))
        for frames in frames_list:
            im = np.ascontiguousarray(frames[i].transpose(1, 2, 0))
            vw.write(cv2.cvtColor(im, cv2.COLOR_RGB2BGR))
        vw.release()


def _prune_images(outdir: str, keep: Optional[int]) -> None:
    """Delete excess PNGs beyond `keep` (reference :586-593)."""
    if keep is None or keep < 0:
        return
    for sub in ("images", "cond_images", "forward_images"):
        d = os.path.join(outdir, sub)
        if not os.path.isdir(d):
            continue
        files = sorted(f for f in os.listdir(d) if f.endswith(".png"))
        for f in files[keep:]:
            os.remove(os.path.join(d, f))
