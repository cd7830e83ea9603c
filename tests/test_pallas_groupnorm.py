"""Fused GroupNorm+SiLU: reference-math parity (fallback path on CPU; the
Pallas path itself is validated in interpret mode) and gradient correctness."""
import jax
import jax.numpy as jnp
import numpy as np

from free_hunch_tpu.ops import pallas_groupnorm as pg


def _flax_oracle(x, gamma, beta, groups=32, eps=1e-5):
    import flax.linen as nn
    gn = nn.GroupNorm(num_groups=groups, epsilon=eps, dtype=jnp.float32,
                      param_dtype=jnp.float32)
    params = {"params": {"scale": gamma, "bias": beta}}
    return gn.apply(params, x.astype(jnp.float32))


def test_reference_matches_flax_groupnorm():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 64)), jnp.float32)
    gamma = jnp.asarray(rng.normal(size=(64,)) * 0.1 + 1, jnp.float32)
    beta = jnp.asarray(rng.normal(size=(64,)) * 0.1, jnp.float32)
    got = pg._reference(x, gamma, beta, groups=32, eps=1e-5, apply_silu=False)
    want = _flax_oracle(x, gamma, beta)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_silu_fusion_and_dtype():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 64)), jnp.bfloat16)
    gamma = jnp.ones((64,), jnp.float32)
    beta = jnp.zeros((64,), jnp.float32)
    y = pg.groupnorm_silu(x, gamma, beta, 32, 1e-5, True)
    assert y.dtype == jnp.bfloat16
    base = pg._reference(x, gamma, beta, 32, 1e-5, False)
    want = base.astype(jnp.float32) * jax.nn.sigmoid(base.astype(jnp.float32))
    np.testing.assert_allclose(np.asarray(y, np.float32), np.asarray(want),
                               rtol=2e-2, atol=2e-2)


def test_pallas_kernel_interpret_mode_matches_reference():
    """Run the actual Pallas kernels in interpreter mode on CPU."""
    from functools import partial
    from jax.experimental import pallas as pl

    rng = np.random.default_rng(2)
    n, h, w, c, groups = 2, 8, 4, 128, 32
    x = jnp.asarray(rng.normal(size=(n, h, w, c)), jnp.float32)
    gamma = jnp.asarray(rng.normal(size=(c,)) * 0.1 + 1, jnp.float32)
    beta = jnp.asarray(rng.normal(size=(c,)) * 0.1, jnp.float32)

    th = 4
    n_h = h // th
    stats = pl.pallas_call(
        partial(pg._stats_kernel, groups=groups),
        grid=(n, n_h),
        in_specs=[pl.BlockSpec((1, th, w, c), lambda i, j: (i, j, 0, 0))],
        out_specs=pl.BlockSpec((1, 2, groups), lambda i, j: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, 2, groups), jnp.float32),
        interpret=True,
    )(x)
    count = float(h * w * (c // groups))
    y = pl.pallas_call(
        partial(pg._apply_kernel, groups=groups, eps=1e-5, count=count,
                apply_silu=True),
        grid=(n, n_h),
        in_specs=[
            pl.BlockSpec((1, th, w, c), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, 2, groups), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((c,), lambda i, j: (0,)),
            pl.BlockSpec((c,), lambda i, j: (0,)),
        ],
        out_specs=pl.BlockSpec((1, th, w, c), lambda i, j: (i, j, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=True,
    )(x, stats, gamma, beta)

    want = pg._reference(x, gamma, beta, groups, 1e-5, True)
    np.testing.assert_allclose(np.asarray(y), np.asarray(want), rtol=1e-4,
                               atol=1e-5)


def test_gradients_flow_through_custom_vjp():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(1, 4, 4, 64)), jnp.float32)
    gamma = jnp.ones((64,), jnp.float32)
    beta = jnp.zeros((64,), jnp.float32)

    def loss(a, g, b):
        return jnp.sum(pg.groupnorm_silu(a, g, b, 32, 1e-5, True) ** 2)

    def loss_ref(a, g, b):
        return jnp.sum(pg._reference(a, g, b, 32, 1e-5, True) ** 2)

    g1 = jax.grad(loss, argnums=(0, 1, 2))(x, gamma, beta)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(x, gamma, beta)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=1e-5)
