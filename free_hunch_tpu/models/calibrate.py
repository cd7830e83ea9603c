"""Static int8 activation-scale calibration (quant='int8_static').

The dynamic int8 path (ops/quant.py) computes a per-sample abs-max for every
quantized activation in-graph; the reduce is a barrier that forces XLA to
materialise the f32 GroupNorm/SiLU producer and re-read the whole activation
(measured as the dominant int8 overhead — BASELINE.md "int8" section, fixes
(1)/(2)). This module replaces those reduces with a one-time calibration:

1. run the production guided sampler once with the DYNAMIC int8 twin,
   recording the trajectory (the states every denoiser call actually sees);
2. re-apply the denoiser at every (sigma stage, state) with the 'int8_calib'
   model, which sows each quantized site's batch abs-max into a mutable
   'qstats' collection;
3. per stage, convert abs-max -> scale = margin * amax / 127 and stack the
   per-site trees over stages.

The result (sigmas (S,), table pytree of (S,) leaves) plugs into
``wrap_precond(..., qscales=...)``: the preconditioner selects the stage's
scale set by nearest-sigma lookup (models/precond._select_qscales) and the
'int8_static' model reads them from the 'qscales' collection — zero
activation-scale passes in the compiled sampler.

Calibration is per (checkpoint, architecture, schedule); ``qscales_cache``
persists the table next to the checkpoint like the params npz cache.

Why per-stage scales: the FiLM time conditioning makes the torso's
activation magnitudes sigma-dependent (the out_norm affine is
``g*(1+scale(emb))``), so a single global scale would waste int8 range at
whichever end of the schedule is quieter. The sigma grid is static host
data (samplers/edm.prepare_schedule), so per-stage tables cost one scalar
gather per call.

Anchor: the guidance path this accelerates is the reference's covariance
branch, ``/root/reference/conditioning_utils/conditioning_mechanisms.py:283-288``;
the reference's own reduced-precision posture is the fp16 torso
(``/root/reference/training/openai_unet.py:625-646``).
"""
from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from free_hunch_tpu.models.unet import create_model


def _qstats_to_scale_tree(qstats: dict, margin: float) -> dict:
    """Rename each sown 'amax' leaf to the 'act_scale' variable the static
    modules read, converting amax -> scale."""
    import flax.traverse_util as tu
    flat = tu.flatten_dict(qstats)
    out = {}
    for path, amax in flat.items():
        assert path[-1] == "amax", path
        # sow may store a tuple when no reduce_fn collapsed it; ours reduces
        val = amax[0] if isinstance(amax, tuple) else amax
        scale = jnp.maximum(jnp.asarray(val, jnp.float32), 1e-12) \
            * (margin / 127.0)
        out[path[:-1] + ("act_scale",)] = scale
    return tu.unflatten_dict(out)


def calibrate_qscales(model_args: dict, params, mechanism, noise, y, xs,
                      sigma0_scaled: float, rng_key, *, dtype=jnp.bfloat16,
                      margin: float = 1.0,
                      precond_kind: str = "linear") -> Tuple[np.ndarray, dict]:
    """Run the calibration described in the module docstring.

    model_args: the parsed setup-file kwargs (models/loading.parse_setup_txt).
    params: the model's variables dict ({'params': ...}).
    mechanism / noise / y / xs / sigma0_scaled / rng_key: exactly what the
    production ``sample_scan`` call will receive — calibration replays the
    real sampler so every site sees representative activations.

    Returns (sigmas (S,) float32 numpy ascending, table) for
    ``wrap_precond(..., qscales=(sigmas, table))``.
    """
    from free_hunch_tpu.models.loading import wrap_precond
    from free_hunch_tpu.samplers.edm import sample_scan

    # 1. trajectory under the DYNAMIC int8 twin (numerically ~ the static
    # model; remat off — forward only)
    dyn_model = create_model(dtype=dtype, remat=False, quant="int8",
                             **model_args)
    dyn_precond = wrap_precond(dyn_model, model_args, precond_kind)
    # params as a jit ARGUMENT, not a closure capture — captured they would
    # be embedded as 2.2GB of lowering constants
    import sys as _sys
    import time as _time

    def _log(msg):
        print(f"  qscale calibration: {msg}", file=_sys.stderr, flush=True)

    run = jax.jit(lambda p, n, y_, k: sample_scan(
        lambda x, s: dyn_precond.apply(p, x, s), mechanism, n, y_, xs, k,
        sigma0_scaled=sigma0_scaled, return_trajectory=True))
    _t0 = _time.time()
    _log("compiling + running the dynamic-int8 trajectory replay...")
    _, traj = run(params, noise, y, rng_key)
    jax.block_until_ready(traj)
    _log(f"trajectory done in {_time.time() - _t0:.1f}s")
    # traj STAYS on device — (num_steps, B, C, H, W) is ~190 MB at the bench
    # protocol, and remote TPU tunnels (axon) transfer at ~MB/s; only the
    # tiny per-site amax trees ever cross to the host

    # 2. stage (sigma, state) pairs. With the default no-churn schedule
    # x_hat_i = scale_ratio_i * x_{i-1}; the Heun corrector state x_prime_i
    # differs from x_next_i = traj[i] by O(h^2) — close enough for abs-max
    # calibration (margin covers it, and clipping rare outliers is standard
    # static-quantization behaviour).
    sigma_hat = np.asarray(xs["sigma_hat"], np.float64)
    sigma_prime = np.asarray(xs["sigma_prime"], np.float64)
    scale_ratio = np.asarray(xs["scale_ratio"], np.float64)
    use_heun = np.asarray(xs["use_heun"], bool)

    # all state gathering stays under jit: remote TPU backends (axon)
    # mis-handle eagerly dispatched ops (see eval._install_codecs), and a
    # per-stage eager slice/scale would be 2x59 eager dispatches
    @jax.jit
    def gather_state(traj_, n_, j, ratio):
        """Extended-trajectory lookup: j=0 -> the initial noise state,
        j>=1 -> traj[j-1]; scaled by ratio (the churn scale_ratio)."""
        x0_ = n_.astype(jnp.float32) * sigma0_scaled
        prev = jnp.where(
            j == 0, x0_,
            jax.lax.dynamic_index_in_dim(traj_, jnp.maximum(j - 1, 0), 0,
                                         keepdims=False))
        return ratio * prev

    stages = []  # (sigma, j, ratio)
    for i in range(len(sigma_hat)):
        stages.append((float(sigma_hat[i]), i, float(scale_ratio[i])))
        if use_heun[i]:
            stages.append((float(sigma_prime[i]), i + 1, 1.0))

    # 3. capture per-site abs-max at every stage with the calib model
    calib_model = create_model(dtype=dtype, remat=False, quant="int8_calib",
                               **model_args)
    calib_precond = wrap_precond(calib_model, model_args, precond_kind)

    @jax.jit
    def stage_stats(p, x, s):
        _, mut = calib_precond.apply(p, x, s, mutable=("qstats",))
        return mut["qstats"]

    by_sigma = {}  # sigma -> amax tree (np leaves), max-merged on collision
    for idx, (sigma, j, ratio) in enumerate(stages):
        state = gather_state(traj, noise, jnp.asarray(j, jnp.int32),
                             jnp.float32(ratio))
        tree = jax.device_get(stage_stats(params, state, jnp.float32(sigma)))
        if sigma in by_sigma:
            by_sigma[sigma] = jax.tree.map(np.maximum, by_sigma[sigma], tree)
        else:
            by_sigma[sigma] = tree
        if idx % 10 == 0:
            _log(f"stage {idx + 1}/{len(stages)}")

    sigmas = np.asarray(sorted(by_sigma), np.float32)
    trees = [_qstats_to_scale_tree(by_sigma[float(s)], margin)
             for s in sigmas]
    table = jax.tree.map(lambda *leaves: jnp.stack(leaves), *trees)
    return sigmas, table


# -- persistence --------------------------------------------------------------

def save_qscales(path: str, sigmas: np.ndarray, table: dict) -> None:
    import flax.traverse_util as tu
    flat = {"tree/" + "/".join(k): np.asarray(v)
            for k, v in tu.flatten_dict(table).items()}
    flat["sigmas"] = np.asarray(sigmas, np.float32)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez_compressed(f, **flat)
    os.replace(tmp, path)


def load_qscales(path: str) -> Optional[Tuple[np.ndarray, dict]]:
    import flax.traverse_util as tu
    if not os.path.exists(path):
        return None
    try:
        data = np.load(path)
        sigmas = np.asarray(data["sigmas"], np.float32)
        flat = {tuple(k[len("tree/"):].split("/")): jnp.asarray(data[k])
                for k in data.files if k.startswith("tree/")}
        return sigmas, tu.unflatten_dict(flat)
    except Exception:
        try:
            os.remove(path)
        except OSError:
            pass
        return None


def qscales_cache_key(state_dict_path: str, model_args: dict, num_steps: int,
                      res: int, margin: float) -> str:
    """Cache path keyed like the params cache, plus the schedule facts the
    table depends on."""
    import hashlib
    arch = hashlib.md5(repr(sorted(model_args.items())).encode()) \
        .hexdigest()[:10]
    m = ("%g" % margin).replace(".", "p")
    return f"{state_dict_path}.qscales.{arch}.s{num_steps}.r{res}.m{m}.npz"


def merge_qscales(a, b):
    """Combine two calibration tables site-wise by MAX (scales are
    monotone in the observed abs-max)."""
    (sa, ta), (sb, tb) = a, b
    assert np.allclose(sa, sb), "tables calibrated on different sigma grids"
    return sa, jax.tree.map(jnp.maximum, ta, tb)


def bench_qscales(state_dict_path: str, model_args: dict, params, *,
                  num_steps: int, res: int, batch: int = 8,
                  dtype=jnp.bfloat16, margin: float = 1.1,
                  precond_kind: str = "linear", n_draws: int = 3):
    """Calibration table for the benchmark/profiling protocol (bench.py /
    scripts/op_profile.py): gaussian-blur operator + online-covariance
    mechanism with the covariance guidance gradient (the trajectory's
    activation statistics, which is all calibration needs, are
    gradient-mode-independent — the cheap mode keeps the one-time replay
    short). Cached next to the checkpoint.

    n_draws independent (cond, noise) draws are max-merged: clipping is a
    BIASED error (systematically damped features), so under-covered
    calibration shows up directly as end-to-end quality loss. MEASURED on
    the 256px free-running QAB protocol: 1 draw margin 1.0 -> 0.52 dB PSNR
    delta vs bf16; 1 draw margin 1.5 -> 0.375; 3 draws margin 1.1 ->
    0.046 dB (at the cross-seed noise scale) — the defaults."""
    from free_hunch_tpu.guidance import choose_conditioning_mechanism
    from free_hunch_tpu.models.loading import wrap_precond
    from free_hunch_tpu.operators import get_operator
    from free_hunch_tpu.samplers.edm import (prepare_schedule,
                                             required_cov_capacity)

    cache = qscales_cache_key(state_dict_path, model_args, num_steps, res,
                              margin) + (f".d{n_draws}" if n_draws != 1 else "")
    qs = load_qscales(cache)
    if qs is not None:
        return qs
    dyn = create_model(dtype=dtype, remat=False, quant="int8", **model_args)
    pre = wrap_precond(dyn, model_args, precond_kind)
    op = get_operator(name="gaussian_blur", in_shape=(1, 3, res, res),
                      sigma_s=0.1, kernel_size=61, intensity=3.0)
    xs, s0 = prepare_schedule(
        round_sigma=pre.round_sigma, net_sigma_min=pre.sigma_min,
        net_sigma_max=pre.sigma_max, num_steps=num_steps, solver="heun",
        discretization="edm", schedule="linear", scaling="none")
    mech = choose_conditioning_mechanism("online_covariance")(
        cond_scaling=1.0, forward_operator=op, clip_x0_mean=False,
        image_base_covariance=("dct_diagonal" if res == 256
                               else "dct_diagonal_noinfo"),
        init_denoiser_variance=1.0,
        init_noise_variance=80.0**2, data_dim=3 * res * res,
        cov_capacity=required_cov_capacity(xs), solver_type="customcuda",
        guidance_gradient="covariance")
    key = jax.random.PRNGKey(17)
    qs = None
    for d in range(n_draws):
        kd = jax.random.fold_in(key, 100 + d)
        cond = jax.random.uniform(jax.random.fold_in(kd, 0),
                                  (batch, 3, res, res), minval=-1, maxval=1)
        y = jax.jit(lambda c, k: op.forward(c, noiseless=False, key=k))(
            cond, jax.random.fold_in(kd, 1))
        noise = jax.random.normal(jax.random.fold_in(kd, 2),
                                  (batch, 3, res, res))
        t = calibrate_qscales(model_args, params, mech, noise, y, xs, s0,
                              jax.random.fold_in(kd, 3), dtype=dtype,
                              margin=margin, precond_kind=precond_kind)
        qs = t if qs is None else merge_qscales(qs, t)
    try:
        save_qscales(cache, *qs)
    except OSError:
        pass
    return qs
