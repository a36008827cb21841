"""PointNet++ set-abstraction / feature-propagation modules.

Equivalents of ``lib/pointnet2/pointnet2_modules.py``
(``PointnetSAModuleVotes`` 164-277, ``PointnetFPModule`` 361-420) in
channel-last layout: features are (B, N, C) and grouped tensors
(B, M, S, 3 + C), so the shared MLP is a plain Dense chain on the MXU and the
max-pool reduces the S axis.
"""

from collections.abc import Sequence

import jax.numpy as jnp
from flax import linen as nn

from bridgeqa_tpu.models.layers import SharedMLP
from bridgeqa_tpu.ops import (
    furthest_point_sample,
    gather_points,
    group_all,
    query_and_group,
    three_interpolate,
    three_nn,
)
from bridgeqa_tpu.ops.sampling import furthest_point_sample_with_xyz


class PointnetSAModuleVotes(nn.Module):
    """Single-scale set abstraction with sampled-index return (VoteNet flavor).

    Mirrors ``PointnetSAModuleVotes`` (``pointnet2_modules.py:164-277``):
    FPS -> ball-query group (recentered, optionally radius-normalized xyz
    prepended) -> shared MLP -> max/avg/rbf pool over the ball.
    """

    mlp: Sequence[int]  # output widths per MLP layer (reference mlp[1:])
    npoint: int | None = None
    radius: float | None = None
    nsample: int | None = None
    bn: bool = True
    use_xyz: bool = True
    pooling: str = "max"
    sigma: float | None = None
    normalize_xyz: bool = False
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, xyz, features=None, inds=None, *, train: bool, bn_momentum=0.1):
        """xyz (B, N, 3); features (B, N, C) or None; inds optional (B, npoint).

        Returns: new_xyz (B, npoint, 3), new_features (B, npoint, mlp[-1]),
        inds (B, npoint).
        """
        sigma = self.sigma if self.sigma is not None else (self.radius / 2 if self.radius else None)

        import jax

        from bridgeqa_tpu.ops import grouping as _grouping
        from bridgeqa_tpu.ops.grouping import (
            MAX_KERNEL_FEATS,
            _ball_query_stripes,
            _ball_query_stripes_feats,
            _ball_query_stripes_xla,
            group_points,
        )

        grouped = grouped_xyz = planes = None
        fplanes = ()
        if self.npoint is not None:
            if inds is None:
                # fused kernel: indices + sampled coords in one pass
                inds, new_xyz = furthest_point_sample_with_xyz(xyz, self.npoint)
            else:
                new_xyz = gather_points(xyz, inds)
            # Stripe fast path: the kernel's rel-xyz feeds the MLP as
            # coordinate PLANES — the (B, M, S, 3) tensor (lane dim 3: 42x
            # pad waste + a relayout) is never materialized, and with input
            # features the 3+C channel concat (lane-misaligned) is replaced
            # by the hybrid PlaneDense layer 0. Gate mirrors
            # ``query_and_group``'s stripe-mode selection so the off-TPU
            # FORCE_MODE="stripes" ablation exercises this exact path.
            on_tpu = jax.default_backend() == "tpu"
            mode = _grouping.FORCE_MODE
            fast_planes = (self.use_xyz and self.nsample % 2 == 0
                           and (mode == "stripes" or (mode is None and on_tpu)))
            if fast_planes:
                nf = 0 if features is None else features.shape[-1]
                if 0 < nf <= MAX_KERNEL_FEATS:
                    # features extracted inside the ball-query sweep: the
                    # group_points gather (53 ms at SA1 shapes, XLA's
                    # take_along_axis row loop) never runs
                    if on_tpu:
                        idx, rel, fplanes = _ball_query_stripes_feats(
                            self.radius, self.nsample, xyz, new_xyz, features)
                    else:
                        idx, rel, fplanes = _ball_query_stripes_xla(
                            self.radius, self.nsample, xyz, new_xyz, features)
                else:
                    stripe_fn = _ball_query_stripes if on_tpu else _ball_query_stripes_xla
                    idx, rel = stripe_fn(self.radius, self.nsample, xyz, new_xyz)
                    if nf:
                        grouped = group_points(features, idx)  # feature part only
                if self.normalize_xyz:
                    rel = tuple(p / self.radius for p in rel)
                planes = rel
            else:
                grouped, grouped_xyz = query_and_group(
                    self.radius,
                    self.nsample,
                    xyz,
                    new_xyz,
                    features,
                    use_xyz=self.use_xyz,
                    normalize_xyz=self.normalize_xyz,
                    ret_grouped_xyz=True,
                )
        else:
            new_xyz = None
            grouped, grouped_xyz = group_all(xyz, features, use_xyz=self.use_xyz, ret_grouped_xyz=True)

        mlp_planes = planes + fplanes if planes is not None else None
        new_features = SharedMLP(self.mlp, bn=self.bn, dtype=self.dtype, name="mlp_module")(
            grouped, planes=mlp_planes, train=train, bn_momentum=bn_momentum
        )  # (B, npoint, nsample, mlp[-1])

        if self.pooling == "max":
            new_features = jnp.max(new_features, axis=2)
        elif self.pooling == "avg":
            new_features = jnp.mean(new_features, axis=2)
        elif self.pooling == "rbf":
            if planes is not None:
                d2 = sum(p * p for p in planes)  # (B, M, S)
            else:
                d2 = jnp.sum(grouped_xyz**2, axis=-1)
            rbf = jnp.exp(-d2 / (sigma**2) / 2)
            new_features = jnp.sum(new_features * rbf[..., None], axis=2) / float(self.nsample)
        else:
            raise ValueError(f"unknown pooling {self.pooling}")

        return new_xyz, new_features, inds


class PointnetFPModule(nn.Module):
    """Feature propagation: 3-NN inverse-distance interpolation + shared MLP.

    Mirrors ``PointnetFPModule`` (``pointnet2_modules.py:361-420``), incl. the
    weight formula ``w = (1 / (dist + 1e-8)) / sum`` over euclidean distances.
    """

    mlp: Sequence[int]
    bn: bool = True
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, unknown, known, unknown_feats, known_feats, *, train: bool, bn_momentum=0.1):
        """unknown (B, n, 3); known (B, m, 3); unknown_feats (B, n, C1) or
        None; known_feats (B, m, C2). Returns (B, n, mlp[-1])."""
        if known is not None:
            dist, idx = three_nn(unknown, known)
            dist_recip = 1.0 / (dist + 1e-8)
            norm = jnp.sum(dist_recip, axis=2, keepdims=True)
            weight = dist_recip / norm
            interpolated = three_interpolate(known_feats, idx, weight)
        else:
            interpolated = jnp.broadcast_to(
                known_feats, (known_feats.shape[0], unknown.shape[1], known_feats.shape[-1])
            )

        if unknown_feats is not None:
            new_features = jnp.concatenate([interpolated, unknown_feats], axis=-1)
        else:
            new_features = interpolated

        return SharedMLP(self.mlp, bn=self.bn, dtype=self.dtype, name="mlp")(
            new_features, train=train, bn_momentum=bn_momentum
        )
