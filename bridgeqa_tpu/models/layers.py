"""Shared neural building blocks.

Equivalents of ``lib/pointnet2/pytorch_utils.py`` (SharedMLP / Conv+BN+ReLU
stacks / BN momentum scheduling), designed for channel-last layouts where a
1x1 conv is a Dense over the trailing axis (an MXU matmul on TPU).
"""

from collections.abc import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

# torch kaiming_normal_ (fan_in, gain sqrt(2)) equivalent.
kaiming_normal = nn.initializers.variance_scaling(2.0, "fan_in", "normal")

BN_MOMENTUM_INIT = 0.5
BN_MOMENTUM_MAX = 0.001


def bn_momentum_schedule(epoch: int, decay_step: int = 20, decay_rate: float = 0.5) -> float:
    """Reference BN momentum decay (``lib/solver.py:274-276``):
    ``max(0.5 * 0.5**(epoch // 20), 0.001)``."""
    return max(BN_MOMENTUM_INIT * decay_rate ** (int(epoch / decay_step)), BN_MOMENTUM_MAX)


class BatchNorm(nn.Module):
    """BatchNorm with torch semantics over the trailing feature axis.

    Differences from ``flax.linen.BatchNorm`` that matter for parity with the
    reference (``nn.BatchNorm{1,2}d`` + ``BNMomentumScheduler``):

    - torch momentum convention: ``running = (1 - m) * running + m * batch``;
    - momentum is a *call* argument so the solver can schedule it per epoch
      without rebuilding the module (reference ``pytorch_utils.py:299-335``);
    - normalisation uses the biased batch variance, the running update the
      unbiased one (torch behavior).
    """

    features: int
    eps: float = 1e-5
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, *, train: bool, momentum=0.1):
        scale = self.param("scale", nn.initializers.ones, (self.features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros((self.features,), jnp.float32))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones((self.features,), jnp.float32))

        if train:
            reduce_axes = tuple(range(x.ndim - 1))
            # f32 statistics under bf16 compute; promote (not demote) so the
            # f64 training-parity goldens keep full precision end-to-end
            xf = x.astype(jnp.promote_types(x.dtype, jnp.float32))
            mean = jnp.mean(xf, axis=reduce_axes)
            var = jnp.mean(jnp.square(xf), axis=reduce_axes) - jnp.square(mean)
            if not self.is_initializing():
                n = x.size // x.shape[-1]
                unbiased = var * (n / max(n - 1, 1))
                ra_mean.value = (1.0 - momentum) * ra_mean.value + momentum * mean
                ra_var.value = (1.0 - momentum) * ra_var.value + momentum * unbiased
        else:
            mean, var = ra_mean.value, ra_var.value

        y = (x - mean) * jax.lax.rsqrt(var + self.eps) * scale + bias
        return y.astype(self.dtype or x.dtype)


class SharedMLP(nn.Module):
    """Stack of [Dense -> BN -> ReLU] over the trailing axis.

    Replaces ``pt_utils.SharedMLP`` (1x1 Conv2d+BN2d+ReLU over (B, C, M, S));
    in channel-last layout each 1x1 conv is a Dense, which XLA maps straight
    onto the MXU and fuses with the pointwise BN/ReLU.

    ``features``: output widths (the reference's ``mlp[1:]``; input width is
    inferred). Conv bias is disabled when BN is on (``_ConvBase: bias = bias
    and (not bn)``).
    """

    features: Sequence[int]
    bn: bool = True
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x=None, *, planes=None, train: bool, bn_momentum=0.1):
        """x: (..., Cin) channel-last input. Alternatively ``planes``: a
        tuple of arrays shaped (...,) — leading input channels presented one
        plane at a time (optionally combined with a trailing ``x`` tensor
        holding the remaining channels). TPU layout note: a grouped-xyz
        tensor has Cin=3 in the lane dimension (42x padding waste + a
        relayout to build it, plus a lane-misaligned concat when grouped
        features follow); feeding the 3 coordinate planes directly lets
        layer 0 compute ``sum_d planes[d] * kernel[d] (+ x @ kernel[3:])``
        with the output (lane dim = width) born in a good layout and no
        (..., 3) tensor or channel concat ever materialized. Parameters are
        identical either way (kernel rows = [planes..., x channels])."""
        for i, width in enumerate(self.features):
            if i == 0 and planes is not None:
                x = PlaneDense(width, use_bias=not self.bn, dtype=self.dtype,
                               name="layer0")(planes, x)
            else:
                x = nn.Dense(
                    width,
                    use_bias=not self.bn,
                    kernel_init=kaiming_normal,
                    dtype=self.dtype,
                    name=f"layer{i}",
                )(x)
            if self.bn:
                x = BatchNorm(width, dtype=self.dtype, name=f"bn{i}")(x, train=train, momentum=bn_momentum)
            x = nn.relu(x)
        return x


class PlaneDense(nn.Module):
    """Dense over an input whose leading channels arrive as per-channel
    planes and (optionally) whose remaining channels arrive as a normal
    channel-last tensor ``x``. Parameter tree (kernel (Cin, width)[, bias],
    Cin = len(planes) + x channels) is identical to ``nn.Dense`` over the
    concatenated input, so a model may init through either path and apply
    through the other."""

    width: int
    use_bias: bool = True
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, planes, x=None):
        cin = len(planes) + (x.shape[-1] if x is not None else 0)
        kernel = self.param("kernel", kaiming_normal, (cin, self.width), jnp.float32)
        dt = self.dtype or (x.dtype if x is not None else planes[0].dtype)
        y = sum(p[..., None].astype(dt) * kernel[d].astype(dt) for d, p in enumerate(planes))
        if x is not None:
            y = y + x.astype(dt) @ kernel[len(planes):].astype(dt)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.width,), jnp.float32)
            y = y + bias.astype(dt)
        return y
