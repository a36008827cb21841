"""Rematerialization: remat'd ViT/BERT layers must give identical losses
and gradients (only activation memory changes)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from bridgeqa_tpu.models.blip_vqa3d import BLIPVQA3D
from tests.test_blip import TINY_CFG


import pytest


@pytest.mark.parametrize("remat_mode", ["block", "attn"])
def test_remat_forward_and_grad_identical(remat_mode):
    rng = np.random.RandomState(0)
    b, lq, la, n_obj = 2, 8, 5, 4
    args = (jnp.asarray(rng.rand(b, 32, 32, 3), jnp.float32),
            jnp.asarray(rng.randint(1, 100, (b, lq))), jnp.ones((b, lq), jnp.int32),
            jnp.asarray(rng.randint(1, 100, (b, la))), jnp.ones((b, la), jnp.int32),
            jnp.asarray(rng.rand(b, n_obj, 16), jnp.float32), jnp.ones((b, n_obj), jnp.int32))

    base = BLIPVQA3D(TINY_CFG)
    remat = BLIPVQA3D(dataclasses.replace(TINY_CFG, remat=True, remat_mode=remat_mode))
    variables = base.init({"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
                          *args, train=False)

    def loss_of(model):
        def f(params):
            loss, _, _ = model.apply({"params": params}, *args, train=False)
            return loss
        return f

    l0, g0 = jax.value_and_grad(loss_of(base))(variables["params"])
    l1, g1 = jax.value_and_grad(loss_of(remat))(variables["params"])
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    for (p0, a0), (p1, a1) in zip(
        sorted(jax.tree_util.tree_leaves_with_path(g0), key=lambda kv: str(kv[0])),
        sorted(jax.tree_util.tree_leaves_with_path(g1), key=lambda kv: str(kv[0])),
    ):
        np.testing.assert_allclose(np.asarray(a0), np.asarray(a1), rtol=1e-5, atol=1e-6,
                                   err_msg=str(p0))
