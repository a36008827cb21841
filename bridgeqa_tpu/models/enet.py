"""ENet encoder for multiview 2D semantic features.

Equivalent of ``lib/enet.py`` (a 717-line torch7-converted Sequential used
via ``create_enet_for_3d``, ``enet.py:697-716``): the reference feeds
328x256 frames through the pretrained ScanNet ENet **encoder** and takes
the 128-channel, 1/8-resolution feature maps (41x32) as per-frame features
(``scripts/compute_multiview_features.py:89-123``).

This is a clean flax implementation of the same ENet encoder family
(Paszke et al. 2016): initial block (conv+maxpool concat, 16ch), stage 1
(downsample to 64ch + 4 bottlenecks), stages 2-3 (downsample to 128ch +
dilated/asymmetric bottleneck series). Output: (B, H/8, W/8, 128).

Inference-only (the reference freezes it too): BatchNorm uses stored
running statistics; PReLU slopes are parameters.
"""

import jax.numpy as jnp
from flax import linen as nn


class PReLU(nn.Module):
    """Channel-shared PReLU (torch default: one slope per channel here,
    matching ENet's per-channel PReLU)."""

    channels: int

    @nn.compact
    def __call__(self, x):
        alpha = self.param("alpha", nn.initializers.constant(0.25), (self.channels,), jnp.float32)
        return jnp.where(x >= 0, x, alpha.astype(x.dtype) * x)


class InitialBlock(nn.Module):
    """3x3/2 conv (13 filters) concatenated with 2x2 maxpool of the input."""

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        # explicit (1, 1) padding: torch pads symmetrically; flax SAME with
        # stride 2 would pad (0, 1) and shift the grid by one pixel
        conv = nn.Conv(13, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)), use_bias=True,
                       name="conv")(x)
        pool = nn.max_pool(x, (2, 2), strides=(2, 2), padding="SAME")
        out = jnp.concatenate([conv, pool], axis=-1)  # 16 channels
        out = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-3,
                           name="bn")(out)
        return PReLU(16, name="prelu")(out)


class Bottleneck(nn.Module):
    """ENet bottleneck: 1x1 reduce -> core conv -> 1x1 expand, residual add.

    kind: 'regular' | 'down' | 'dilated' | 'asymmetric'.
    """

    out_ch: int
    kind: str = "regular"
    dilation: int = 1
    asym_k: int = 5
    proj_ratio: int = 4
    drop: float = 0.1

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        in_ch = x.shape[-1]
        mid = self.out_ch // self.proj_ratio
        stride = 2 if self.kind == "down" else 1

        # main (residual) branch
        if self.kind == "down":
            main = nn.max_pool(x, (2, 2), strides=(2, 2), padding="SAME")
            if in_ch < self.out_ch:  # zero-pad channels
                pad = self.out_ch - in_ch
                main = jnp.pad(main, ((0, 0), (0, 0), (0, 0), (0, pad)))
        else:
            main = x

        # bottleneck branch
        h = nn.Conv(mid, (stride, stride) if self.kind == "down" else (1, 1),
                    strides=(stride, stride), padding="VALID", use_bias=False, name="reduce")(x)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-3, name="bn1")(h)
        h = PReLU(mid, name="prelu1")(h)

        if self.kind == "asymmetric":
            # reference order (lib/enet.py torch7 port): (1, k) no-bias then
            # (k, 1) with bias
            k = self.asym_k
            h = nn.Conv(mid, (1, k), padding="SAME", use_bias=False, name="conv_a")(h)
            h = nn.Conv(mid, (k, 1), padding="SAME", use_bias=True, name="conv_b")(h)
        else:
            h = nn.Conv(mid, (3, 3), padding="SAME", use_bias=True,
                        kernel_dilation=(self.dilation, self.dilation), name="conv")(h)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-3, name="bn2")(h)
        h = PReLU(mid, name="prelu2")(h)

        h = nn.Conv(self.out_ch, (1, 1), use_bias=False, name="expand")(h)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-3, name="bn3")(h)
        # torch7-style dropout (lib/enet.py:89-96): the branch is scaled by
        # (1-p) at EVAL too (kept elements end up unscaled in training) —
        # the pretrained weights expect this inference-time damping
        h = h * (1.0 - self.drop)
        h = nn.Dropout(self.drop)(h, deterministic=not train)

        return PReLU(self.out_ch, name="prelu_out")(main + h)


class ENetEncoder(nn.Module):
    """Stages initial..3 -> (B, H/8, W/8, 128) feature maps."""

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        x = InitialBlock(name="initial")(x, train=train)

        x = Bottleneck(64, kind="down", drop=0.01, name="b1_0")(x, train=train)
        for i in range(1, 5):
            x = Bottleneck(64, drop=0.01, name=f"b1_{i}")(x, train=train)

        x = Bottleneck(128, kind="down", name="b2_0")(x, train=train)
        for stage in (2, 3):
            start = 1 if stage == 2 else 0
            specs = [("regular", 1), ("dilated", 2), ("asymmetric", 1), ("dilated", 4),
                     ("regular", 1), ("dilated", 8), ("asymmetric", 1), ("dilated", 16)]
            for i, (kind, dil) in enumerate(specs, start=start):
                x = Bottleneck(128, kind=kind, dilation=dil, name=f"b{stage}_{i}")(x, train=train)
        return x


class ENetClassifier(nn.Module):
    """1x1 classifier head over encoder features (``create_enet_for_3d``'s
    ``model_classifier``) — for label-projection pipelines."""

    num_classes: int

    @nn.compact
    def __call__(self, feats):
        return nn.Conv(self.num_classes, (1, 1), use_bias=False, name="classifier")(feats)


def create_enet_for_3d(num_classes: int = 41):
    """Returns (encoder, classifier) — the fixed feature stack + 1x1 head,
    mirroring the reference's (model_fixed+model_trainable, model_classifier)
    split (``lib/enet.py:697-716``)."""
    return ENetEncoder(), ENetClassifier(num_classes)
