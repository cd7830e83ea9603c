"""Model loading: OpenAI setup-file parsing + checkpoint conversion + orbax IO.

Parity: reference ``training/openai_loading_utils.py:12-42`` (torch state dict
+ ``models/*_setup.txt`` arg-string) and the checkpoint-load path of
``generate_conditional.py:222-244``. The TPU build converts the torch
checkpoint once (``models/convert.py``) and caches the flax pytree next to it
as an orbax/npz checkpoint so later runs never import torch.
"""
from __future__ import annotations

import os
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from free_hunch_tpu.models.convert import load_torch_checkpoint
from free_hunch_tpu.models.precond import IDDPMCosinePrecond, IDDPMLinearPrecond
from free_hunch_tpu.models.unet import UNetModel, create_model

_BOOL_KEYS = ("class_cond", "learn_sigma", "resblock_updown",
              "use_new_attention_order", "use_fp16", "use_scale_shift_norm",
              "use_checkpoint")
_INT_KEYS = ("image_size", "num_channels", "num_head_channels", "num_res_blocks",
             "num_heads", "num_heads_upsample")
_FLOAT_KEYS = ("dropout",)
_DROP_KEYS = ("diffusion_steps", "noise_schedule", "timestep_respacing", "rescale_timesteps",
              "rescale_learned_sigmas", "use_kl", "predict_xstart", "lr", "batch_size")


def parse_setup_txt(text: str) -> dict:
    """Parse an OpenAI '--key value --key value' setup string into typed kwargs
    (reference parse_args_to_dict:5-10 + the coercions at :22-37)."""
    args = {}
    for chunk in text.strip().split("--")[1:]:
        chunk = chunk.strip()
        if not chunk:
            continue
        key, _, value = chunk.partition(" ")
        args[key.strip()] = value.strip()
    for k in _DROP_KEYS:
        args.pop(k, None)
    for k in _BOOL_KEYS:
        if k in args:
            args[k] = str(args[k]).lower() == "true"
    for k in _INT_KEYS:
        if k in args:
            args[k] = int(args[k])
    for k in _FLOAT_KEYS:
        if k in args:
            args[k] = float(args[k])
    return args


def load_model(state_dict_path: str, setup_path: str, dtype=jnp.bfloat16,
               init_random_if_missing: bool = False, rng_seed: int = 0,
               remat: bool = True, spatial_partition=None,
               quant=None) -> Tuple[UNetModel, dict, dict]:
    """Build the UNet per the setup file and load converted weights.

    Returns (model, params, model_args). When the .pt checkpoint is absent
    and ``init_random_if_missing`` (used by benchmarks and smoke tests without
    downloaded checkpoints), parameters are randomly initialised instead.
    A converted copy is cached at ``<state_dict_path>.npz``.

    ``spatial_partition=(data_axis, model_axis)`` enables GSPMD spatial
    model-parallelism for the torso (UNetConfig.spatial_partition): image
    height sharded over the model axis, halo exchanges over ICI.
    """
    with open(setup_path, "r") as f:
        model_args = parse_setup_txt(f.read())
    model = create_model(dtype=dtype, remat=remat,
                         spatial_partition=spatial_partition, quant=quant,
                         **model_args)

    cache = state_dict_path + ".npz" if state_dict_path else None
    cached = _try_load_cache(cache)
    if cached is not None:
        params = cached
    elif state_dict_path and os.path.exists(state_dict_path):
        params = load_torch_checkpoint(state_dict_path, model.cfg)
        try:
            save_params_npz(cache, params)
        except OSError:
            pass
    elif init_random_if_missing:
        # cache the random init: re-initialising 552M params costs minutes
        # per process (init compile + device->host round trips), and
        # benchmarks/profilers reload the same model repeatedly. Keyed by
        # seed AND an architecture fingerprint: the same missing .pt path can
        # be paired with different setup files, and a cache hit for the wrong
        # topology would hand back wrong-shaped params.
        import hashlib
        arch = hashlib.md5(repr(sorted(model_args.items()))
                           .encode()).hexdigest()[:10]
        rcache = (f"{state_dict_path}.random{rng_seed}.{arch}.npz"
                  if state_dict_path else None)
        rcached = _try_load_cache(rcache)
        if rcached is not None:
            return model, rcached, model_args
        res = model_args.get("image_size", 256)
        init_kwargs = {}
        if model_args.get("class_cond"):
            init_kwargs["y"] = jnp.zeros((1,), jnp.int32)
        # init via the unpartitioned twin: spatial_partition's sharding
        # constraints need an ambient mesh, which doesn't exist at load time
        # (the param tree is identical either way)
        init_model = (model if spatial_partition is None else
                      create_model(dtype=dtype, remat=remat, **model_args))
        params = init_model.init(jax.random.PRNGKey(rng_seed),
                                 jnp.zeros((1, 3, res, res), jnp.float32),
                                 jnp.zeros((1,), jnp.float32), **init_kwargs)
        # keep only the parameter collection: quant='int8_static' init also
        # creates placeholder 'qscales' variables, which are calibration
        # data, not parameters — they must not leak into the params cache
        # (the tree is quant-mode-independent this way)
        params = {"params": params["params"]}
        # a freshly initialised ADM UNet computes F(x) == 0 (the reference's
        # zero_module layers are mirrored for conversion parity) — randomise
        # them so random-init smoke runs exercise the whole network
        params = randomize_zero_leaves(params, seed=rng_seed)
        if rcache:
            try:
                save_params_npz(rcache, params)
            except OSError:
                pass
    else:
        raise FileNotFoundError(
            f"checkpoint {state_dict_path!r} not found; download it per the "
            f"upstream README or pass init_random_if_missing=True")
    return model, params, model_args


def wrap_precond(model: UNetModel, model_args: dict, kind: str = "linear",
                 qscales=None):
    """Wrap in the sigma-parameterisation (reference load_network:232-241).

    qscales: per-(site, sigma-stage) static activation-scale table for
    quant='int8_static' models (models/calibrate.calibrate_qscales)."""
    res = model_args.get("image_size", model.cfg.image_size)
    label_dim = 1000 if model_args.get("class_cond") else 0
    if model.cfg.quant == "int8_static" and qscales is None:
        raise ValueError(
            "quant='int8_static' needs a calibration table: pass qscales="
            "(sigmas, table) from models/calibrate.calibrate_qscales (or use "
            "quant='int8' for dynamic activation scales)")
    cls = {"linear": IDDPMLinearPrecond, "cosine": IDDPMCosinePrecond}[kind]
    return cls(model, img_resolution=res, img_channels=3, label_dim=label_dim,
               qscales=qscales)


# -- flat npz pytree IO (torch-free fast path) --------------------------------

def save_params_npz(path: str, params: dict) -> None:
    import flax.traverse_util as tu
    flat = {"/".join(k): np.asarray(v) for k, v in
            tu.flatten_dict(params).items()}
    # atomic: a process killed mid-write must not leave a truncated cache
    # that poisons every later load
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:  # file object: avoids numpy's .npz suffixing
        np.savez_compressed(f, **flat)
    os.replace(tmp, path)


def _try_load_cache(path):
    """Load a cached params npz, deleting it and returning None if corrupt
    (e.g. a truncated write from a killed process)."""
    if not path or not os.path.exists(path):
        return None
    import warnings
    import zipfile
    try:
        return load_params_npz(path)
    except (zipfile.BadZipFile, EOFError, ValueError, KeyError) as e:
        # definitively corrupt content (e.g. a truncated write from a killed
        # process): discard so later loads convert fresh
        warnings.warn(f"discarding corrupt params cache {path!r}: {e!r}")
        try:
            os.remove(path)
        except OSError:
            pass
        return None
    except Exception as e:
        # transient failures (EMFILE, MemoryError mid-decompress, interrupted
        # read) must NOT destroy a valid multi-GB cache — fall back to
        # conversion this time and leave the file for the next load
        warnings.warn(f"params cache {path!r} unreadable (kept on disk): {e!r}")
        return None


def load_params_npz(path: str) -> dict:
    import flax.traverse_util as tu
    data = np.load(path)
    flat = {tuple(k.split("/")): jnp.asarray(data[k]) for k in data.files}
    return tu.unflatten_dict(flat)


def randomize_zero_leaves(params: dict, scale: float = 0.1, seed: int = 0) -> dict:
    """Flax twin of ``convert.randomize_zero_tensors``: replace all-zero
    parameter leaves (the zero-initialised residual output convs / proj_out /
    final out conv mirrored from the reference ADM UNet) with fan-in-scaled
    noise, so random-init runs exercise the whole network instead of the
    degenerate F(x) == 0 denoiser."""
    leaves, treedef = jax.tree.flatten(params)
    key = jax.random.PRNGKey(seed)
    out = []
    for i, leaf in enumerate(leaves):
        if hasattr(leaf, "shape") and leaf.size > 0 and \
                jnp.issubdtype(leaf.dtype, jnp.floating) and \
                float(jnp.abs(leaf).max()) == 0.0:
            fan_in = int(np.prod(leaf.shape[:-1])) if leaf.ndim > 1 else leaf.shape[0]
            noise = jax.random.normal(jax.random.fold_in(key, i), leaf.shape,
                                      leaf.dtype)
            # keep the leaf dtype: the np f64 scalar would otherwise promote
            # f32 leaves to f64 under jax_enable_x64
            out.append((noise * (scale / np.sqrt(max(fan_in, 1))))
                       .astype(leaf.dtype))
        else:
            out.append(leaf)
    return jax.tree.unflatten(treedef, out)
