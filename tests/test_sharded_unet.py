"""Spatial model-parallelism for the UNet denoiser (GSPMD, NHWC H-sharding).

``UNetConfig.spatial_partition=(data, model)`` pins the torso activations to
``P(data, model, None, None)`` — batch over the data axis, image height over
the model axis. XLA GSPMD inserts the halo exchanges for the 3x3 convs and
the collectives for GroupNorm statistics / attention. This is the TPU-native
extension for scaling activation + vjp HBM past one chip; the reference has
no model parallelism at all (its only axis is DP evaluation,
generate_conditional.py:38-169 — SURVEY.md §2.2).

Verified here on the virtual 8-device CPU mesh (conftest): numerical parity
with the unsharded forward AND the guidance vjp, plus evidence that the
compiled module actually communicates (halo exchange / all-gather in HLO)
rather than gathering everything to one device.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from free_hunch_tpu.models.precond import IDDPMLinearPrecond
from free_hunch_tpu.models.unet import UNetConfig, UNetModel
from free_hunch_tpu.parallel.mesh import make_mesh

# heavyweight tier: torch oracles / e2e CLI / multi-process / full-model
# forwards — excluded from the <5 min fast tier (pytest -m 'not slow')
pytestmark = pytest.mark.slow

RES = 32
BATCH = 4


def _build(spatial_partition=None, remat=False):
    cfg = UNetConfig(image_size=RES, in_channels=3, model_channels=32,
                     out_channels=6, num_res_blocks=1,
                     attention_resolutions=(4,), channel_mult=(1, 2),
                     num_heads=2, num_head_channels=16, dtype=jnp.float32,
                     remat=remat, spatial_partition=spatial_partition)
    model = UNetModel(cfg)
    # init outside any mesh context with the unpartitioned twin (identical
    # params tree; spatial_partition only adds sharding annotations)
    init_model = UNetModel(
        cfg if spatial_partition is None
        else dataclasses.replace(cfg, spatial_partition=None))
    params = init_model.init(jax.random.PRNGKey(0),
                             jnp.zeros((1, 3, RES, RES)), jnp.zeros((1,)))
    precond = IDDPMLinearPrecond(model, img_resolution=RES, img_channels=3)
    return precond, params


@pytest.fixture(scope="module")
def data():
    x = jax.random.normal(jax.random.PRNGKey(1), (BATCH, 3, RES, RES),
                          jnp.float32)
    sigma = jnp.full((BATCH,), 2.5, jnp.float32)
    return x, sigma


@pytest.mark.parametrize("remat", [False, True])
def test_spatially_sharded_forward_matches_unsharded(data, remat):
    x, sigma = data
    ref_pre, params = _build(None, remat=remat)
    want, want_var = jax.jit(ref_pre.apply)(params, x, sigma)

    mesh = make_mesh("data:4,model:2")
    sp_pre, _ = _build(("data", "model"), remat=remat)
    bsh = NamedSharding(mesh, P("data"))
    rep = NamedSharding(mesh, P())
    with mesh:
        fn = jax.jit(sp_pre.apply,
                     in_shardings=(rep, bsh, bsh), out_shardings=bsh)
        got, got_var = fn(params, jax.device_put(x, bsh),
                          jax.device_put(sigma, bsh))
        # the compiled module must actually exchange halos / gather for
        # attention over the model axis, not fall back to one device
        hlo = fn.lower(params, x, sigma).compile().as_text()
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(got_var), np.asarray(want_var),
                               rtol=2e-5, atol=2e-5)
    assert ("collective-permute" in hlo or "all-gather" in hlo
            or "all-to-all" in hlo), "no cross-device communication compiled"


def test_spatially_sharded_vjp_matches_unsharded(data):
    """The guidance pullback (one UNet vjp per sampler stage) is the HBM
    consumer that motivates spatial partitioning — it must shard too."""
    x, sigma = data
    ref_pre, params = _build(None)
    sp_pre, _ = _build(("data", "model"))

    def loss_ref(xx):
        mean, _ = ref_pre.apply(params, xx, sigma)
        return jnp.sum(mean ** 2)

    def loss_sp(xx):
        mean, _ = sp_pre.apply(params, xx, sigma)
        return jnp.sum(mean ** 2)

    want = jax.jit(jax.grad(loss_ref))(x)
    mesh = make_mesh("data:4,model:2")
    bsh = NamedSharding(mesh, P("data"))
    with mesh:
        got = jax.jit(jax.grad(loss_sp), in_shardings=(bsh,),
                      out_shardings=bsh)(jax.device_put(x, bsh))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=5e-5, atol=5e-5)


def test_spatial_partition_whole_model_axis(data):
    """data:1,model:8 — the whole mesh on the model axis (8 | H at every
    level of this config: 32/8=4, 16/8=2)."""
    x, sigma = data
    mesh = make_mesh("data:1,model:8")
    sp_pre, params = _build(("data", "model"))
    bsh = NamedSharding(mesh, P("data"))
    with mesh:
        out, _ = jax.jit(sp_pre.apply)(params, jax.device_put(x, bsh), sigma)
    ref_pre, _ = _build(None)
    want, _ = jax.jit(ref_pre.apply)(params, x, sigma)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_spatial_partition_non_divisible_height_pads_but_stays_correct():
    """When the model-axis size does NOT divide H at some level, GSPMD pads
    the ragged shard rather than raising — wasteful (padding rows burn HBM
    and MXU) but numerically correct. Pin the correctness half of that
    contract: an 8-wide model axis over a net whose deepest level has H=4
    (8px input, one downsample) must still match the unsharded forward."""
    res = 8
    cfg = UNetConfig(image_size=res, in_channels=3, model_channels=32,
                     out_channels=6, num_res_blocks=1,
                     attention_resolutions=(2,), channel_mult=(1, 2),
                     num_heads=2, num_head_channels=16, dtype=jnp.float32,
                     remat=False, spatial_partition=("data", "model"))
    model = UNetModel(cfg)
    init_model = UNetModel(dataclasses.replace(cfg, spatial_partition=None))
    params = init_model.init(jax.random.PRNGKey(0),
                             jnp.zeros((1, 3, res, res)), jnp.zeros((1,)))
    precond = IDDPMLinearPrecond(model, img_resolution=res, img_channels=3)
    ref_precond = IDDPMLinearPrecond(init_model, img_resolution=res,
                                     img_channels=3)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 3, res, res), jnp.float32)
    sigma = jnp.full((2,), 2.5, jnp.float32)
    want, _ = jax.jit(ref_precond.apply)(params, x, sigma)

    mesh = make_mesh("data:1,model:8")
    bsh = NamedSharding(mesh, P("data"))
    with mesh:
        out, _ = jax.jit(precond.apply)(params, jax.device_put(x, bsh), sigma)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               rtol=2e-5, atol=2e-5)
