#!/usr/bin/env python
"""Flagship-layout checkpoint conversion A/B (VERDICT r2 component #16).

The real 256x256_diffusion_uncond.pt checkpoint is unobtainable here (zero
egress), so the conversion path was only ever oracle-tested on small 32px
architecture variants (tests/test_unet_parity.py). This script closes the
layout gap: it materialises a checkpoint with the EXACT flagship topology —
the reference's own ``training.openai_loading_utils.load_model`` +
``training.openai_util.create_model`` build the 552M-param ADM UNet from the
shipped setup file (reference README.md:44-49 points at this file pair), its
randomly-initialised state dict is saved as a real ``.pt`` — and then loads
it through our FULL production path (``models/loading.py::load_model``:
torch file -> convert_state_dict -> npz cache -> cache reload) and compares
forward passes.

The forward runs at 64px input: the ADM UNet is fully convolutional (no
positional state), so every weight tensor of the real 256px layout is
exercised while a single-CPU-core forward stays affordable. Attention fires
at ds 8/16/32 exactly as at 256px (8x8 / 4x4 / 2x2 grids here).

Artifact: docs/flagship_conversion_ab.json. Also runnable as a gated test:
tests/test_flagship_conversion.py (RUN_FLAGSHIP_AB=1).
"""
import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.append("/root/reference")  # append: repo modules win name collisions

FLAGSHIP_SETUP = os.path.join(REPO, "models/256x256_diffusion_uncond_setup.txt")


def run(input_res: int = 64, out_json: str | None = None,
        setup_file: str = FLAGSHIP_SETUP) -> dict:
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import numpy as np
    import torch

    import jax
    # the axon TPU plugin claims the backend regardless of JAX_PLATFORMS; the
    # config route (effective until first backend use) actually forces CPU.
    # This matters for precision: TPU f32 convs default to bf16 passes, which
    # would put ~1e-3 of hardware noise into a conversion-parity comparison.
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from free_hunch_tpu.models.convert import randomize_zero_tensors
    from free_hunch_tpu.models.loading import load_model

    # the released checkpoint's setup, with fp16 off so both forwards run f32
    # (use_fp16 only switches the reference's activation dtype; the released
    # state dict itself is f32 master weights either way)
    with open(setup_file) as f:
        setup = f.read().replace("--use_fp16 True", "--use_fp16 False")

    with tempfile.TemporaryDirectory() as td:
        setup_path = os.path.join(td, "setup.txt")
        pt_path = os.path.join(td, "flagship.pt")
        with open(setup_path, "w") as f:
            f.write(setup)

        # --- reference side: its own loader builds the flagship torch model
        from training.openai_loading_utils import (
            load_model as ref_load_model, parse_args_to_dict)
        from training.openai_util import create_model as ref_create_model

        margs = parse_args_to_dict(setup.strip())
        margs["class_cond"] = margs["class_cond"].lower() == "true"
        margs.pop("diffusion_steps"); margs.pop("noise_schedule")
        for k in ("dropout",):
            margs[k] = float(margs[k])
        for k in ("image_size", "num_channels", "num_head_channels",
                  "num_res_blocks"):
            margs[k] = int(margs[k])
        for k in ("learn_sigma", "resblock_updown", "use_new_attention_order",
                  "use_fp16", "use_scale_shift_norm"):
            margs[k] = str(margs[k]).lower() == "true"
        seed_model = ref_create_model(**margs)
        # ADM zero-initialises every residual/out conv: a fresh net computes
        # F(x)==0, which would make the comparison vacuous — randomise those
        sd = randomize_zero_tensors(seed_model.state_dict())
        torch.save(sd, pt_path)
        del seed_model

        tmodel, _ = ref_load_model(pt_path, setup_path)  # the reference path
        tmodel.eval()
        n_params = sum(p.numel() for p in tmodel.parameters())
        t0 = time.time()

        # --- our side: full production load (convert + npz cache write)
        jmodel, params, _ = load_model(pt_path, setup_path,
                                       dtype=jnp.float32, remat=False)
        t_convert = time.time() - t0
        assert os.path.exists(pt_path + ".npz"), "npz cache not written"
        # and the cache-reload path the driver takes on every later run
        t0 = time.time()
        _, params2, _ = load_model(pt_path, setup_path, dtype=jnp.float32,
                                   remat=False)
        t_cache = time.time() - t0

        assert jax.default_backend() == "cpu", \
            "conversion A/B must run on CPU (TPU f32 convs are bf16 passes)"
        rng = np.random.default_rng(0)
        x = rng.normal(size=(1, 3, input_res, input_res)).astype(np.float32)
        t_in = np.asarray([500.0], np.float32)
        with torch.no_grad():
            tout = tmodel(torch.from_numpy(x), torch.from_numpy(t_in)).numpy()
        del tmodel
        jout = np.asarray(jmodel.apply(params, jnp.asarray(x),
                                       jnp.asarray(t_in)))
        jout2 = np.asarray(jmodel.apply(params2, jnp.asarray(x),
                                        jnp.asarray(t_in)))

    assert np.abs(tout).max() > 1e-3, "torch oracle output is (near) zero"
    abs_err = float(np.abs(jout - tout).max())
    denom = np.abs(tout).max()
    rel_err = float(abs_err / denom)
    cache_err = float(np.abs(jout2 - jout).max())
    result = dict(
        setup=os.path.relpath(setup_file, REPO),
        n_params=int(n_params),
        n_state_dict_keys=len(sd),
        input_res=input_res,
        out_shape=list(tout.shape),
        max_abs_err=abs_err,
        max_rel_err=rel_err,
        npz_cache_roundtrip_err=cache_err,
        convert_seconds=round(t_convert, 2),
        cache_reload_seconds=round(t_cache, 2),
        agree=bool(rel_err < 2e-4 and cache_err == 0.0),
    )
    if out_json:
        with open(out_json, "w") as f:
            json.dump(result, f, indent=2)
        print(f"wrote {out_json}")
    print(json.dumps(result, indent=2))
    return result


if __name__ == "__main__":
    # both shipped model families (reference README.md:44-49)
    results = {}
    for key, setup in (("imagenet_256_uncond", FLAGSHIP_SETUP),
                       ("ffhq_10m",
                        os.path.join(REPO, "models/ffhq_10m_setup.txt"))):
        results[key] = run(setup_file=setup)
    out = os.path.join(REPO, "docs/flagship_conversion_ab.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print(f"wrote {out}")
    sys.exit(0 if all(r["agree"] for r in results.values()) else 1)
