"""VoteNet 3D detector: backbone + voting + proposal.

Composes the detection branch exactly as ``ScanQA.forward`` does
(``models/qa_module.py:437-461``): backbone seeds come from fp2, vote
features are L2-normalized over the feature axis (``qa_module.py:452-453``),
then votes are aggregated into proposals.
"""

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from bridgeqa_tpu.models.backbone import Pointnet2Backbone
from bridgeqa_tpu.models.proposal import ProposalModule
from bridgeqa_tpu.models.voting import VotingModule


class VoteNetDetector(nn.Module):
    num_class: int
    num_heading_bin: int
    num_size_cluster: int
    mean_size_arr: np.ndarray
    input_feature_dim: int = 0
    num_proposal: int = 256
    vote_factor: int = 1
    sampling: str = "vote_fps"
    seed_feat_dim: int = 256
    proposal_size: int = 128
    width: int = 1
    depth: int = 2
    sa_npoints: tuple = (2048, 1024, 512, 256)
    sa_nsamples: tuple = (64, 32, 16, 16)
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, point_clouds, *, train: bool, bn_momentum=0.1):
        """point_clouds (B, N, 3+C) -> dict of detector outputs (channel-last)."""
        out = Pointnet2Backbone(
            input_feature_dim=self.input_feature_dim,
            width=self.width,
            depth=self.depth,
            seed_feat_dim=self.seed_feat_dim,
            sa_npoints=self.sa_npoints,
            sa_nsamples=self.sa_nsamples,
            dtype=self.dtype,
            name="backbone_net",
        )(point_clouds, train=train, bn_momentum=bn_momentum)

        out["seed_inds"] = out["fp2_inds"]
        out["seed_xyz"] = out["fp2_xyz"]
        out["seed_features"] = out["fp2_features"]

        vote_xyz, vote_features = VotingModule(
            self.vote_factor, self.seed_feat_dim, dtype=self.dtype, name="vgen"
        )(out["seed_xyz"], out["seed_features"], train=train, bn_momentum=bn_momentum)
        # L2-normalize vote features over the feature axis (qa_module.py:452).
        # Exactly-zero rows (seeds whose ball-query groups were all empty at
        # degenerate point densities + zero-init biases) stay zero instead of
        # 0/0 = NaN; any nonzero norm divides identically to the reference.
        norm = jnp.linalg.norm(vote_features, axis=-1, keepdims=True)
        vote_features = vote_features / jnp.where(norm == 0.0, 1.0, norm)
        out["vote_xyz"] = vote_xyz
        out["vote_features"] = vote_features

        out.update(
            ProposalModule(
                num_class=self.num_class,
                num_heading_bin=self.num_heading_bin,
                num_size_cluster=self.num_size_cluster,
                mean_size_arr=self.mean_size_arr,
                num_proposal=self.num_proposal,
                sampling=self.sampling,
                seed_feat_dim=self.seed_feat_dim,
                proposal_size=self.proposal_size,
                dtype=self.dtype,
                name="proposal",
            )(vote_xyz, vote_features, train=train, bn_momentum=bn_momentum)
        )
        return out
