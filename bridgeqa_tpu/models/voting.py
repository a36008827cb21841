"""Hough voting module: per-seed vote offsets + residual features.

Equivalent of ``models/voting_module.py:11-60``: Conv1d(+BN+ReLU) x2 then a
projection to ``(3 + out_dim) * vote_factor``; votes are seed_xyz + offset
and vote features are seed features + residual.
"""

import jax.numpy as jnp
from flax import linen as nn

from bridgeqa_tpu.models.layers import BatchNorm, kaiming_normal


class VotingModule(nn.Module):
    vote_factor: int
    seed_feature_dim: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, seed_xyz, seed_features, *, train: bool, bn_momentum=0.1):
        """seed_xyz (B, num_seed, 3); seed_features (B, num_seed, C).

        Returns vote_xyz (B, num_seed * vote_factor, 3),
        vote_features (B, num_seed * vote_factor, C).
        """
        b, num_seed, _ = seed_xyz.shape
        c = self.seed_feature_dim
        num_vote = num_seed * self.vote_factor

        # reference Conv1d defaults: bias=True even with BN (voting_module.py
        # uses raw torch.nn.Conv1d + BatchNorm1d, not pt_utils.Conv1d)
        net = nn.Dense(c, kernel_init=kaiming_normal, dtype=self.dtype, name="conv1")(seed_features)
        net = nn.relu(BatchNorm(c, dtype=self.dtype, name="bn1")(net, train=train, momentum=bn_momentum))
        net = nn.Dense(c, kernel_init=kaiming_normal, dtype=self.dtype, name="conv2")(net)
        net = nn.relu(BatchNorm(c, dtype=self.dtype, name="bn2")(net, train=train, momentum=bn_momentum))
        net = nn.Dense((3 + c) * self.vote_factor, kernel_init=kaiming_normal, dtype=self.dtype, name="conv3")(net)

        net = net.reshape(b, num_seed, self.vote_factor, 3 + c)
        offset = net[..., 0:3]
        vote_xyz = (seed_xyz[:, :, None, :] + offset).reshape(b, num_vote, 3)
        residual = net[..., 3:]
        vote_features = (seed_features[:, :, None, :] + residual).reshape(b, num_vote, c)
        return vote_xyz, vote_features
