"""BLIP-ITM: image-text matching / contrastive model for view selection.

Equivalent of ``models/blip_itm.py:10-76``: ViT image encoder + med-BERT
text encoder with two heads:

- ``itc`` (contrastive): 256-d normalized projections of the image CLS and
  text CLS; similarity = cosine. This is the mode the BridgeQA view
  selection uses (``eval_scene_best_views.py:248-298``).
- ``itm`` (matching): text encoder cross-attends to the image tokens with
  the [ENC] token prepended; a 2-way head on the CLS state scores
  match/no-match.

TPU-first: both paths are jittable at fixed batch; the view-selection
driver batches all frames of a scene through ``encode_images`` once and
reuses the embeddings for every question (the reference recomputed
per-question batches host-side).
"""

import dataclasses

import jax.numpy as jnp
from flax import linen as nn

from bridgeqa_tpu.models.med import BertModel, MedConfig, normal_init
from bridgeqa_tpu.models.vit import create_vit


@dataclasses.dataclass(frozen=True)
class BlipITMConfig:
    med: MedConfig = dataclasses.field(default_factory=MedConfig)
    image_size: int = 384
    vit: str = "base"
    embed_dim: int = 256
    vit_custom_embed_dim: int = 64  # vit='custom' (tests)
    vit_custom_depth: int = 2
    vit_custom_heads: int = 4


class BLIPITM(nn.Module):
    cfg: BlipITMConfig
    dtype: jnp.dtype | None = None

    def setup(self):
        c = self.cfg
        self.visual_encoder, vision_width = create_vit(
            c.vit, c.image_size, dtype=self.dtype,
            custom_embed_dim=c.vit_custom_embed_dim, custom_depth=c.vit_custom_depth,
            custom_heads=c.vit_custom_heads,
        )
        enc_cfg = dataclasses.replace(c.med, encoder_width=vision_width)
        self.text_encoder = BertModel(enc_cfg, dtype=self.dtype, name="text_encoder")
        self.vision_proj = nn.Dense(c.embed_dim, kernel_init=normal_init, dtype=self.dtype,
                                    name="vision_proj")
        self.text_proj = nn.Dense(c.embed_dim, kernel_init=normal_init, dtype=self.dtype,
                                  name="text_proj")
        self.itm_head = nn.Dense(2, kernel_init=normal_init, dtype=self.dtype, name="itm_head")

    def encode_images(self, images):
        """(B, H, W, 3) -> L2-normalized (B, embed_dim) itc features."""
        embeds = self.visual_encoder(images, deterministic=True)
        feat = self.vision_proj(embeds[:, 0, :])
        return feat / jnp.linalg.norm(feat, axis=-1, keepdims=True)

    def encode_texts(self, text_ids, text_mask):
        """Text-only encode (``mode='text'``) -> normalized (B, embed_dim)."""
        out = self.text_encoder(text_ids, text_mask, deterministic=True, multimodal=False)
        feat = self.text_proj(out[:, 0, :])
        return feat / jnp.linalg.norm(feat, axis=-1, keepdims=True)

    def itc_scores(self, images, text_ids, text_mask):
        """Cosine similarity matrix (num_texts, num_images)."""
        ifeat = self.encode_images(images)
        tfeat = self.encode_texts(text_ids, text_mask)
        return tfeat @ ifeat.T

    def itm_scores(self, images, text_ids, text_mask):
        """Cross-attention matching logits (B, 2); paired inputs."""
        image_embeds = self.visual_encoder(images, deterministic=True)
        image_atts = jnp.ones(image_embeds.shape[:2], dtype=jnp.int32)
        out = self.text_encoder(
            text_ids, text_mask,
            encoder_hidden_states=image_embeds, encoder_attention_mask=image_atts,
            deterministic=True,
        )
        return self.itm_head(out[:, 0, :])

    def __call__(self, images, text_ids, text_mask, match_head: str = "itc"):
        if match_head == "itc":
            return self.itc_scores(images, text_ids, text_mask)
        return self.itm_scores(images, text_ids, text_mask)

    def init_all(self, images, text_ids, text_mask):
        """Touch both heads so ``model.init(..., method=init_all)`` creates
        the full parameter tree (itc projections + itm cross-attention)."""
        return (self.itc_scores(images, text_ids, text_mask),
                self.itm_scores(images, text_ids, text_mask))
