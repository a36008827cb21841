"""Proposal module: vote aggregation + box parameter head + on-device decode.

Equivalent of ``models/proposal_module.py:20-152``. Key TPU-first change: the
reference's ``decode_pred_box`` syncs to host and loops the batch in numpy
(``proposal_module.py:87-108``, flagged as the training-loop sync bottleneck
in SURVEY.md §3.5); here box corner decoding is vectorized jnp inside jit
(``bridgeqa_tpu.geometry.boxes.decode_pred_box``).
"""

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from bridgeqa_tpu.geometry.boxes import decode_pred_box
from bridgeqa_tpu.models.layers import BatchNorm, SharedMLP, kaiming_normal
from bridgeqa_tpu.models.pointnet2 import PointnetSAModuleVotes


class ProposalModule(nn.Module):
    num_class: int
    num_heading_bin: int
    num_size_cluster: int
    mean_size_arr: np.ndarray  # (num_size_cluster, 3), static
    num_proposal: int = 256
    sampling: str = "vote_fps"
    seed_feat_dim: int = 256
    proposal_size: int = 128
    radius: float = 0.3
    nsample: int = 16
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, xyz, features, *, train: bool, bn_momentum=0.1):
        """xyz: (B, K, 3) votes; features: (B, K, C) vote features.

        Returns dict of decoded proposal fields (all on-device).
        """
        p = self.proposal_size
        vote_aggregation = PointnetSAModuleVotes(
            mlp=[p, p, p],
            npoint=self.num_proposal,
            radius=self.radius,
            nsample=self.nsample,
            use_xyz=True,
            normalize_xyz=True,
            dtype=self.dtype,
            name="vote_aggregation",
        )
        agg_xyz, agg_features, fps_inds = vote_aggregation(xyz, features, train=train, bn_momentum=bn_momentum)

        out = {
            "aggregated_vote_xyz": agg_xyz,  # (B, num_proposal, 3)
            "aggregated_vote_features": agg_features,  # (B, num_proposal, p)
            "aggregated_vote_inds": fps_inds,
        }

        # proposal head: [Dense(no-bias)+BN+ReLU] x2 + Dense
        net = SharedMLP([p, p], bn=True, dtype=self.dtype, name="proposal_mlp")(
            agg_features, train=train, bn_momentum=bn_momentum
        )
        out_dim = 2 + 3 + self.num_heading_bin * 2 + self.num_size_cluster * 4 + self.num_class
        net = nn.Dense(out_dim, kernel_init=kaiming_normal, dtype=self.dtype, name="proposal_out")(net)

        out.update(self.decode_scores(net, agg_xyz))
        return out

    def decode_scores(self, net, base_xyz):
        """Split head channels into objectness/center/heading/size/sem-cls
        (``proposal_module.py:110-151``) and decode corners on-device."""
        nh, ns = self.num_heading_bin, self.num_size_cluster
        b, k, _ = net.shape
        mean_size = jnp.asarray(self.mean_size_arr, dtype=jnp.float32)

        objectness_scores = net[..., 0:2]
        center = base_xyz + net[..., 2:5]
        heading_scores = net[..., 5 : 5 + nh]
        heading_residuals_normalized = net[..., 5 + nh : 5 + 2 * nh]
        size_scores = net[..., 5 + 2 * nh : 5 + 2 * nh + ns]
        size_residuals_normalized = net[..., 5 + 2 * nh + ns : 5 + 2 * nh + 4 * ns].reshape(b, k, ns, 3)
        sem_cls_scores = net[..., 5 + 2 * nh + 4 * ns :]

        heading_residuals = heading_residuals_normalized * (jnp.pi / nh)
        size_residuals = size_residuals_normalized * mean_size[None, None, :, :]

        out = {
            "objectness_scores": objectness_scores,
            "center": center,
            "heading_scores": heading_scores,
            "heading_residuals_normalized": heading_residuals_normalized,
            "heading_residuals": heading_residuals,
            "size_scores": size_scores,
            "size_residuals_normalized": size_residuals_normalized,
            "size_residuals": size_residuals,
            "sem_cls_scores": sem_cls_scores,
        }
        out["bbox_corner"] = decode_pred_box(
            center, heading_scores, heading_residuals, size_scores, size_residuals,
            mean_size, self.num_heading_bin,
        )
        out["bbox_mask"] = jnp.argmax(objectness_scores, axis=-1)
        out["bbox_sems"] = jnp.argmax(sem_cls_scores, axis=-1)
        return out
