"""PointNet++ backbone (4 SA + 2 FP) for point-cloud feature learning.

Equivalent of ``models/backbone_module.py:11-131`` with identical layer
hyperparameters (npoint 2048/1024/512/256, radius 0.2/0.4/0.8/1.2, nsample
64/32/16/16, width/depth-scalable MLPs, seed_feat_dim output). Emits the same
named intermediate set (``saK_*``, ``fp2_*``, ``fp2_inds``) as a dict.
"""

import jax.numpy as jnp
from flax import linen as nn

from bridgeqa_tpu.models.pointnet2 import PointnetFPModule, PointnetSAModuleVotes


class Pointnet2Backbone(nn.Module):
    input_feature_dim: int = 0
    width: int = 1
    depth: int = 2
    seed_feat_dim: int = 256
    # reference hyperparameters (backbone_module.py:32-66); overridable so
    # tiny-shape dryruns/tests can scale the sequential FPS work down.
    sa_npoints: tuple = (2048, 1024, 512, 256)
    sa_nsamples: tuple = (64, 32, 16, 16)
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, point_clouds, *, train: bool, bn_momentum=0.1):
        """point_clouds: (B, N, 3 + input_feature_dim).

        Returns dict with sa1..sa4/fp2 xyz+features (+ inds), channel-last.
        """
        w, d = self.width, self.depth
        xyz = point_clouds[..., :3]
        features = point_clouds[..., 3:] if point_clouds.shape[-1] > 3 else None

        np1, np2, np3, np4 = self.sa_npoints
        ns1, ns2, ns3, ns4 = self.sa_nsamples
        # mlp widths are the reference specs minus the (inferred) input dim;
        # the +3 use_xyz bump is implicit in channel-last concat.
        sa1 = PointnetSAModuleVotes(
            mlp=[64 * w] * d + [128 * w], npoint=np1, radius=0.2, nsample=ns1,
            use_xyz=True, normalize_xyz=True, dtype=self.dtype, name="sa1",
        )
        sa2 = PointnetSAModuleVotes(
            mlp=[128 * w] * d + [256 * w], npoint=np2, radius=0.4, nsample=ns2,
            use_xyz=True, normalize_xyz=True, dtype=self.dtype, name="sa2",
        )
        sa3 = PointnetSAModuleVotes(
            mlp=[128 * w] * d + [256 * w], npoint=np3, radius=0.8, nsample=ns3,
            use_xyz=True, normalize_xyz=True, dtype=self.dtype, name="sa3",
        )
        sa4 = PointnetSAModuleVotes(
            mlp=[128 * w] * d + [256 * w], npoint=np4, radius=1.2, nsample=ns4,
            use_xyz=True, normalize_xyz=True, dtype=self.dtype, name="sa4",
        )
        fp1 = PointnetFPModule(mlp=[256 * w, 256 * w], dtype=self.dtype, name="fp1")
        fp2 = PointnetFPModule(mlp=[256 * w, self.seed_feat_dim], dtype=self.dtype, name="fp2")

        out = {}
        xyz1, feat1, inds1 = sa1(xyz, features, train=train, bn_momentum=bn_momentum)
        out["sa1_inds"], out["sa1_xyz"], out["sa1_features"] = inds1, xyz1, feat1

        xyz2, feat2, inds2 = sa2(xyz1, feat1, train=train, bn_momentum=bn_momentum)
        out["sa2_inds"], out["sa2_xyz"], out["sa2_features"] = inds2, xyz2, feat2

        xyz3, feat3, _ = sa3(xyz2, feat2, train=train, bn_momentum=bn_momentum)
        out["sa3_xyz"], out["sa3_features"] = xyz3, feat3

        xyz4, feat4, _ = sa4(xyz3, feat3, train=train, bn_momentum=bn_momentum)
        out["sa4_xyz"], out["sa4_features"] = xyz4, feat4

        feat_fp1 = fp1(xyz3, xyz4, feat3, feat4, train=train, bn_momentum=bn_momentum)
        feat_fp2 = fp2(xyz2, xyz3, feat2, feat_fp1, train=train, bn_momentum=bn_momentum)

        out["fp2_features"] = feat_fp2  # (B, 1024, seed_feat_dim)
        out["fp2_xyz"] = out["sa2_xyz"]
        num_seed = out["fp2_xyz"].shape[1]
        out["fp2_inds"] = out["sa1_inds"][:, :num_seed]  # indices into the raw cloud
        return out
