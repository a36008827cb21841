"""BridgeQA top-level model: detector + twin-BLIP VQA + grounding heads.

Equivalent of ``models/qa_module.py:47-760`` (``ScanQA``). Three operating
modes, matching the reference:

- **DET stage** (``stage='DET'``, ``qa_module.py:158``): detector only;
- **BLIP path** (``use_blip=True``): detector -> proposal features ->
  ``object_feat_linear`` -> BLIP_VQA3D twin VQA (train LM loss or
  rank-answer inference) -> language head on the fused CLS + SGA grounding
  head producing ``cluster_ref`` (``qa_module.py:593-758``);
- **MCAN path** (``use_blip=False``): LangModule LSTM + MCAN_ED fusion +
  AttFlat pooling + classifier heads (``qa_module.py:493-591``).

All paths are jittable; tokenization happens in the host data pipeline.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from bridgeqa_tpu.models.blip_vqa3d import BLIPVQA3D, BlipVQA3DConfig
from bridgeqa_tpu.models.detector import VoteNetDetector
from bridgeqa_tpu.models.lang import LangModule
from bridgeqa_tpu.models.mcan import SGA, AttFlat, MCAN_ED, McanLayerNorm
from bridgeqa_tpu.models.med import normal_init


@dataclasses.dataclass(frozen=True)
class BridgeQAConfig:
    num_answers: int = 4500
    num_object_class: int = 18
    input_feature_dim: int = 0
    num_heading_bin: int = 1
    num_size_cluster: int = 18
    num_proposal: int = 256
    vote_factor: int = 1
    seed_feat_dim: int = 256
    proposal_size: int = 128
    pointnet_width: int = 1
    pointnet_depth: int = 2
    backbone_sa_npoints: tuple = (2048, 1024, 512, 256)
    backbone_sa_nsamples: tuple = (64, 32, 16, 16)
    answer_pdrop: float = 0.3
    mcan_num_layers: int = 2
    mcan_num_heads: int = 8
    mcan_pdrop: float = 0.1
    mcan_flat_mlp_size: int = 512
    mcan_flat_glimpses: int = 1
    mcan_flat_out_size: int = 1024
    lang_use_bidir: bool = False
    lang_emb_size: int = 300
    lang_pdrop: float = 0.1
    # MCAN-path language encoder: feed BERT hidden states (an in-graph med
    # BertModel over question ids) into the LSTM instead of GloVe vectors
    # (lang_module.py:27-46 bert_model_name option)
    lang_bert: bool = False
    lang_bert_freeze: bool = False
    lang_bert_finetune_last: bool = False
    hidden_size: int = 128
    # dropout of the lang_cls / object_cls MlpHeads (the reference hardcodes
    # 0.1, qa_module.py:223-232; exposed so training-parity goldens can run
    # the train-mode graph deterministically)
    head_pdrop: float = 0.1
    use_object_mask: bool = True
    use_lang_cls: bool = True
    use_reference: bool = True
    use_answer: bool = True
    use_blip: bool = True
    use_text_decoder: bool = True
    stage: str = "VQA"  # "DET" or "VQA"
    att_pdrop: float = 0.0
    att_drop_topk: int = 100
    blip: BlipVQA3DConfig = dataclasses.field(default_factory=BlipVQA3DConfig)


class MlpHead(nn.Module):
    """Dense-GELU-Dropout-Dense head (lang_cls / object_cls patterns)."""

    hidden: int
    out: int
    pdrop: float = 0.1
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, *, deterministic: bool):
        x = nn.Dense(self.hidden, kernel_init=normal_init, dtype=self.dtype, name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dropout(self.pdrop)(x, deterministic=deterministic)
        return nn.Dense(self.out, kernel_init=normal_init, dtype=self.dtype, name="fc2")(x)


class BridgeQA(nn.Module):
    cfg: BridgeQAConfig
    mean_size_arr: np.ndarray = None
    dtype: jnp.dtype | None = None

    def setup(self):
        c = self.cfg
        self.detector = VoteNetDetector(
            num_class=c.num_object_class,
            num_heading_bin=c.num_heading_bin,
            num_size_cluster=c.num_size_cluster,
            mean_size_arr=self.mean_size_arr,
            input_feature_dim=c.input_feature_dim,
            num_proposal=c.num_proposal,
            vote_factor=c.vote_factor,
            seed_feat_dim=c.seed_feat_dim,
            proposal_size=c.proposal_size,
            width=c.pointnet_width,
            depth=c.pointnet_depth,
            sa_npoints=c.backbone_sa_npoints,
            sa_nsamples=c.backbone_sa_nsamples,
            dtype=self.dtype,
            name="detector",
        )
        if c.stage == "DET":
            return

        self.object_feat_linear = nn.Dense(c.hidden_size, kernel_init=normal_init, dtype=self.dtype,
                                           name="object_feat_linear")

        if c.use_blip:
            blip_cfg = dataclasses.replace(c.blip, scene_size=c.hidden_size, num_answers=c.num_answers,
                                           use_text_decoder=c.use_text_decoder)
            self.blip_model = BLIPVQA3D(blip_cfg, dtype=self.dtype, name="blip_model")
            blip_enc_size = blip_cfg.med.hidden_size
            self.lang_cls = MlpHead(c.hidden_size, c.num_object_class, c.head_pdrop, dtype=self.dtype, name="lang_cls")
            self.object_cls = MlpHead(c.hidden_size, 1, c.head_pdrop, dtype=self.dtype, name="object_cls")
            self.linear_blip_to_object = nn.Dense(c.hidden_size, kernel_init=normal_init, dtype=self.dtype,
                                                  name="linear_blip_to_object")
            self.dec_list_qo = [
                SGA(c.hidden_size, c.mcan_num_heads, c.mcan_pdrop, dtype=self.dtype, name=f"dec_qo_{i}")
                for i in range(c.mcan_num_layers)
            ]
        else:
            self.object_cls = MlpHead(c.hidden_size, 1, c.head_pdrop, dtype=self.dtype, name="object_cls")
            self.lang_net = LangModule(c.num_object_class, use_lang_classifier=False,
                                       use_bidir=c.lang_use_bidir, hidden_size=c.hidden_size,
                                       pdrop=c.lang_pdrop, name="lang_net")
            if c.lang_bert:
                import dataclasses as _dc

                from bridgeqa_tpu.models.lang import BertLangEncoder

                bert_cfg = _dc.replace(c.blip.med, add_cross_attention=False)
                self.lang_bert_enc = BertLangEncoder(
                    bert_cfg, freeze=c.lang_bert_freeze,
                    finetune_last_layer=c.lang_bert_finetune_last, name="lang_bert_enc")
            self.lang_feat_linear = nn.Dense(c.hidden_size, kernel_init=normal_init, dtype=self.dtype,
                                             name="lang_feat_linear")
            self.lang_cls = MlpHead(c.hidden_size, c.num_object_class, c.head_pdrop, dtype=self.dtype, name="lang_cls")
            self.attflat_visual = AttFlat(c.hidden_size, c.mcan_flat_mlp_size, c.mcan_flat_glimpses,
                                          c.mcan_flat_out_size, 0.1, dtype=self.dtype, name="attflat_visual")
            self.attflat_lang = AttFlat(c.hidden_size, c.mcan_flat_mlp_size, c.mcan_flat_glimpses,
                                        c.mcan_flat_out_size, 0.1, dtype=self.dtype, name="attflat_lang")
            self.answer_cls = MlpHead(c.hidden_size, c.num_answers, c.answer_pdrop, dtype=self.dtype,
                                      name="answer_cls")
            self.fusion_backbone = MCAN_ED(c.hidden_size, c.mcan_num_heads, c.mcan_num_layers,
                                           c.mcan_pdrop, dtype=self.dtype, name="fusion_backbone")
            self.fusion_norm = McanLayerNorm(c.mcan_flat_out_size, name="fusion_norm")

    def __call__(self, batch, *, train: bool, bn_momentum=0.1, inference: str = "rank", k_test: int = 256,
                 num_beams: int | None = None, max_length: int | None = None,
                 output_attentions: bool = False):
        """batch: dict of arrays (see data pipeline). Returns the end_points
        dict with detector outputs + QA heads, mirroring
        ``ScanQA.forward``'s ``data_dict`` keys."""
        c = self.cfg
        out = self.detector(batch["point_clouds"], train=train, bn_momentum=bn_momentum)
        if c.stage == "DET":
            return out

        object_feat = out["aggregated_vote_features"]  # (B, K, proposal_size)
        object_feat = nn.gelu(self.object_feat_linear(object_feat), approximate=False)

        # bbox_mask = objectness argmax; True where proposal is an object
        bbox_mask = out["bbox_mask"].astype(bool)
        # MCAN convention (True = masked): mask non-objects
        object_mask = (~bbox_mask)[:, None, None, :] if c.use_object_mask else None

        if c.use_blip:
            out.update(self._forward_blip(batch, out, object_feat, object_mask, bbox_mask,
                                          train=train, inference=inference, k_test=k_test,
                                          num_beams=num_beams, max_length=max_length,
                                          output_attentions=output_attentions))
        else:
            out.update(self._forward_mcan(batch, out, object_feat, object_mask, train=train))
        return out

    def _forward_blip(self, batch, det_out, object_feat, object_mask, bbox_mask, *,
                      train: bool, inference: str, k_test: int,
                      num_beams=None, max_length=None, output_attentions: bool = False):
        c = self.cfg
        out = {}
        # scene_feature_type == "full": proposals straight into the adapter
        # (qa_module.py:609-615); mask flips back to 1-valid for BLIP
        scene_object_embeds = object_feat
        scene_object_mask = bbox_mask.astype(jnp.int32)

        image = batch["images"][:, 0] if batch["images"].ndim == 5 else batch["images"]

        if not c.use_text_decoder:
            # classifier mode (blip_vqa_3d.py:354-393): answer_cls heads on
            # the 2D/3D CLS states; same path for train and eval
            scores, fused_feat, fused_mask = self.blip_model.classify(
                image, batch["question_ids"], batch["question_mask"],
                scene_object_embeds, scene_object_mask, train=train,
            )
            out.update(scores)
        elif train or inference == "loss":
            # inference="loss": the train-branch LM loss under eval-mode
            # BN/dropout (deterministic validation loss; also how the torch
            # reference behaves under ``model.eval()`` with phase=="train")
            loss, fused_feat, fused_mask = self.blip_model(
                image, batch["question_ids"], batch["question_mask"],
                batch["answer_ids"], batch["answer_mask"],
                scene_object_embeds, scene_object_mask, train=train,
            )
            out["decoder_loss"] = loss
            if "answer_cat_scores" in batch:
                out["answer_scores"] = batch["answer_cat_scores"]  # GT scores for acc metrics
        elif inference == "generate":
            # open-ended generation path (qa_module.py:650-672)
            generated_ids, fused_feat, fused_mask = self.blip_model.generate(
                image, batch["question_ids"], batch["question_mask"],
                scene_object_embeds, scene_object_mask,
                num_beams=num_beams, max_length=max_length,
            )
            out["generated_ids"] = generated_ids
        else:
            fused_feat, scores, fused_mask = self.blip_model.rank(
                image, batch["question_ids"], batch["question_mask"],
                batch["answer_list_ids"], batch["answer_list_mask"],
                scene_object_embeds, scene_object_mask, k_test=k_test,
                output_attentions=output_attentions,
            )
            num_all = c.num_answers
            for key, val in scores.items():
                if key.endswith("_attention"):  # (B, nh, Lq, Lk) prob dumps
                    out[key] = val
                    continue
                if val.shape[1] < num_all:
                    val = jnp.pad(val, ((0, 0), (0, num_all - val.shape[1])), constant_values=-1e4)
                out[key] = val

        if c.use_lang_cls:
            out["lang_scores"] = self.lang_cls(fused_feat[:, 0, :], deterministic=not train)

        if c.use_reference:
            fused_for_crossatt = self.linear_blip_to_object(fused_feat)
            fused_mask_b = fused_mask.astype(bool)[:, None, None, :]
            # NOTE: reproduces the reference's mask polarity exactly
            # (qa_module.py:744-748): x_mask = ~object_mask (True AT objects),
            # y_mask = ~fused_mask (True at question padding).
            x_mask = None if object_mask is None else ~object_mask
            for dec in self.dec_list_qo:
                object_feat = dec(object_feat, fused_for_crossatt, x_mask, ~fused_mask_b,
                                  deterministic=not train)
            object_conf_feat = object_feat * bbox_mask.astype(object_feat.dtype)[..., None]
            out["cluster_ref"] = self.object_cls(object_conf_feat, deterministic=not train)[..., 0]

        return out

    def _forward_mcan(self, batch, det_out, object_feat, object_mask, *, train: bool):
        c = self.cfg
        out = {}
        if c.lang_bert:
            word_states = self.lang_bert_enc(batch["question_ids"], batch["question_mask"],
                                             train=train)
            lang_len = jnp.sum(batch["question_mask"], axis=1)
            lang = self.lang_net(word_states, lang_len, train=train)
        else:
            lang = self.lang_net(batch["lang_feat"], batch["lang_len"], train=train)
        lang_mask = lang["lang_mask"][:, None, None, :]  # True = masked
        lang_feat = nn.gelu(self.lang_feat_linear(lang["lang_out"]), approximate=False)

        lang_feat, object_feat = self.fusion_backbone(
            lang_feat, object_feat, lang_mask, object_mask, deterministic=not train
        )

        if c.use_reference:
            object_conf_feat = object_feat * det_out["bbox_mask"].astype(object_feat.dtype)[..., None]
            out["cluster_ref"] = self.object_cls(object_conf_feat, deterministic=not train)[..., 0]

        lang_flat = self.attflat_lang(lang_feat, lang_mask, deterministic=not train)
        object_flat = self.attflat_visual(
            object_feat, object_mask, deterministic=not train,
            att_pdrop=c.att_pdrop if train else 0.0, att_drop_topk=c.att_drop_topk,
        )
        fuse_feat = self.fusion_norm(lang_flat + object_flat)
        out["fuse_feat"] = fuse_feat

        if c.use_lang_cls:
            out["lang_scores"] = self.lang_cls(fuse_feat, deterministic=not train)
        if c.use_answer:
            out["answer_scores"] = self.answer_cls(fuse_feat, deterministic=not train)
        return out
