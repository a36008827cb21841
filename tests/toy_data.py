"""Deterministic toy dataset + model shared by the multi-host worker and the
in-process expectation computation (tests/test_multihost.py)."""

import numpy as np


class ToyDataset:
    def __len__(self):
        return 16

    def __getitem__(self, i):
        rng = np.random.RandomState(100 + i)
        return {"x": rng.rand(6).astype(np.float32), "y": np.float32(i % 3)}


def toy_model_params_and_step():
    """Tiny linear-regression model + sgd step, deterministic init."""
    import jax
    import jax.numpy as jnp
    import optax
    from flax import linen as nn

    model = nn.Dense(1)
    params = model.init(jax.random.PRNGKey(7), jnp.zeros((1, 6)))
    tx = optax.sgd(0.1)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, batch):
        def loss_fn(p):
            pred = model.apply(p, batch["x"])[..., 0]
            return jnp.mean((pred - batch["y"]) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, new_opt = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_opt, loss

    return model, params, tx, opt_state, step
