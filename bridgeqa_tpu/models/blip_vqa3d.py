"""BLIP_VQA3D: the 2D/3D twin-transformer VQA model.

Equivalent of ``models/blip_vqa_3d.py:45-598`` ("paralleltwin" path): ViT
image encoder + twin med-BERT question encoder (2D stream cross-attends to
the image, 3D stream to projected scene-object proposals) + twin causal LM
answer decoders, low-rank bilinear 2D/3D fusion, and the rank-answer
inference that scores a fixed answer list with both decoders and ensembles
``exp(s_2d) + exp(1.05 * s_3d)`` (``blip_vqa_3d.py:437-495``).

TPU-first differences:
- tokenization happens in the host data pipeline; this module takes padded
  static-length token ids (question 80, answers padded);
- ``rank_answer``'s per-sample python loops (``blip_vqa_3d.py:537-541``)
  are replaced by batched gather/scatter with a static k;
- everything (train loss and rank inference) runs under one jit.
"""

import dataclasses

import jax
import jax.numpy as jnp
from flax import linen as nn

from bridgeqa_tpu.models.med import (
    BertLMHeadModel,
    BertModelTwin,
    MedConfig,
    label_smoothed_lm_loss,
    normal_init,
)
from bridgeqa_tpu.models.vit import create_vit

IGNORE_INDEX = -100


@dataclasses.dataclass(frozen=True)
class BlipVQA3DConfig:
    med: MedConfig = dataclasses.field(default_factory=MedConfig)
    image_size: int = 480
    vit: str = "base"
    vit_drop_path_rate: float = 0.1
    vit_custom_embed_dim: int = 256  # only for vit='custom' (tests)
    vit_custom_depth: int = 2
    vit_custom_heads: int = 4
    scene_size: int = 128  # proposal feature dim fed to the 3D adapter
    num_answers: int = 4500
    answer_pdrop: float = 0.1
    # dropout inside the linear_scene_object adapter (the reference hardcodes
    # 0.1, blip_vqa_3d.py:142-149; exposed for deterministic train goldens)
    adapter_pdrop: float = 0.1
    use_text_decoder: bool = True
    use_scene_classifier: bool = False
    use_scene_classifier_2d3d: bool = False
    share_decoder: bool = False
    # "paralleltwin" (paper main path): separate 3D decoder (unless
    # share_decoder). "parallelshare" (blip_vqa_3d.py:331-341): ONE decoder
    # for both streams, the 3D calls selecting the per-layer alternate
    # FFN-output LayerNorm (BertOutputParallel, med.py:320-330).
    scene_feature_position: str = "paralleltwin"
    decoder_layers: int | None = None
    encoder_layers: int | None = None
    pad_token_id: int = 0
    bos_token_id: int = 30522  # [DEC] (blip.py:326-331)
    sep_token_id: int = 102  # [SEP] = generation eos (blip_vqa_3d.py:409)
    scene_ensemble_weight: float = 1.05  # blip_vqa_3d.py:492
    rank_loss_chunk_size: int | None = 512  # chunked answer-scoring loss (HBM bound)
    num_beams: int = 5  # blip_vqa_3d.py:396
    use_kv_cache: bool = True  # O(L) cached generation vs O(L^2) prefix re-run
    generate_max_length: int = 20
    generate_min_length: int = 1
    remat: bool = False  # rematerialize ViT blocks + BERT layers (training memory)
    remat_mode: str = "block"  # "block" = whole layer; "attn" = only attention matrices


class MlpAdapter(nn.Module):
    """Dense-GELU-Dropout-Dense-GELU-LayerNorm adapter
    (``linear_scene_object`` / ``camera_encoder``, ``blip_vqa_3d.py:142-159``)."""

    hidden_size: int
    drop: float = 0.1
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, *, deterministic: bool):
        x = nn.Dense(self.hidden_size, kernel_init=normal_init, dtype=self.dtype, name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dropout(self.drop)(x, deterministic=deterministic)
        x = nn.Dense(self.hidden_size, kernel_init=normal_init, dtype=self.dtype, name="fc2")(x)
        x = nn.gelu(x, approximate=False)
        # epsilon=1e-5: torch nn.LayerNorm default (the reference's adapter
        # uses a bare nn.LayerNorm, blip_vqa_3d.py:149); flax defaults to 1e-6
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)


class ClassifierHead(nn.Module):
    """``answer_cls`` head: Dense-GELU-Dropout-LayerNorm-Dense
    (``blip_vqa_3d.py:125-139``)."""

    hidden_size: int
    num_answers: int
    drop: float = 0.1
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, *, deterministic: bool):
        x = nn.Dense(self.hidden_size, kernel_init=normal_init, dtype=self.dtype, name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dropout(self.drop)(x, deterministic=deterministic)
        # epsilon=1e-5: torch nn.LayerNorm default (blip_vqa_3d.py:125-139)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        return nn.Dense(self.num_answers, kernel_init=normal_init, dtype=self.dtype, name="fc2")(x)


class BLIPVQA3D(nn.Module):
    cfg: BlipVQA3DConfig
    dtype: jnp.dtype | None = None

    def setup(self):
        c = self.cfg
        med = c.med
        if c.encoder_layers is not None:
            med = dataclasses.replace(med, num_hidden_layers=c.encoder_layers)
        if c.remat:
            med = dataclasses.replace(med, remat=True, remat_mode=c.remat_mode)
        self.visual_encoder, vision_width = create_vit(
            c.vit, c.image_size, drop_path_rate=c.vit_drop_path_rate, dtype=self.dtype,
            custom_embed_dim=c.vit_custom_embed_dim, custom_depth=c.vit_custom_depth,
            custom_heads=c.vit_custom_heads, remat=c.remat, remat_mode=c.remat_mode,
        )
        if vision_width != med.hidden_size:
            raise ValueError(
                "twin exchange concatenates image embeds with BERT hidden states; "
                f"vision width ({vision_width}) must equal med hidden size ({med.hidden_size})"
            )
        enc_cfg = dataclasses.replace(med, encoder_width=vision_width)
        self.text_encoder = BertModelTwin(enc_cfg, dtype=self.dtype, name="text_encoder")

        if c.scene_feature_position not in ("paralleltwin", "parallelshare"):
            raise ValueError(f"unsupported scene_feature_position: {c.scene_feature_position!r}")
        dec_med = med if c.decoder_layers is None else dataclasses.replace(med, num_hidden_layers=c.decoder_layers)
        dec_cfg = dataclasses.replace(dec_med, encoder_width=med.hidden_size)
        if c.scene_feature_position == "parallelshare":
            # one decoder, two FFN-output LayerNorm banks (idx 0 = 2D, 1 = 3D)
            dec_cfg = dataclasses.replace(dec_cfg, parallel_layernorms=1)
        self.text_decoder = BertLMHeadModel(dec_cfg, dtype=self.dtype, name="text_decoder")
        if not c.share_decoder and c.scene_feature_position != "parallelshare":
            self.text_decoder_scene = BertLMHeadModel(dec_cfg, dtype=self.dtype, name="text_decoder_scene")

        h = med.hidden_size
        lowrank = h // 8
        self.lowrank_2d = nn.Dense(lowrank, kernel_init=normal_init, dtype=self.dtype, name="lowrank_2d")
        self.lowrank_3d = nn.Dense(lowrank, kernel_init=normal_init, dtype=self.dtype, name="lowrank_3d")
        # torch nn.Bilinear(lowrank, lowrank, h): out_o = x W_o y + b_o
        self.bilinear_kernel = self.param(
            "bilinear_fusion_kernel",
            nn.initializers.uniform(scale=1.0 / (lowrank**0.5)),
            (h, lowrank, lowrank),
            jnp.float32,
        )
        self.bilinear_bias = self.param("bilinear_fusion_bias", nn.initializers.zeros, (h,), jnp.float32)

        self.linear_scene_object = MlpAdapter(h, drop=c.adapter_pdrop, dtype=self.dtype,
                                              name="linear_scene_object")
        # NOTE: the reference's ``camera_encoder`` (blip_vqa_3d.py:152-159) is
        # only consumed by the non-parallel scene_feature_position modes
        # (blip_vqa_3d.py:261-264), which this rebuild intentionally omits —
        # so it is not constructed at all here.
        if not c.use_text_decoder:
            self.answer_cls = ClassifierHead(h, c.num_answers, c.answer_pdrop, dtype=self.dtype,
                                             name="answer_cls")
            if c.use_scene_classifier_2d3d:
                self.answer_cls_2d3d = ClassifierHead(h, c.num_answers, c.answer_pdrop,
                                                      dtype=self.dtype, name="answer_cls_2d3d")

    def _decoder_scene(self):
        c = self.cfg
        if c.share_decoder or c.scene_feature_position == "parallelshare":
            return self.text_decoder
        return self.text_decoder_scene

    def _scene_layernorm_idx(self) -> int:
        """layernorm_idx for 3D-stream decoder calls (blip_vqa_3d.py:331,
        523-524): parallelshare selects the alternate LayerNorm bank."""
        return 1 if self.cfg.scene_feature_position == "parallelshare" else 0

    def encode_image(self, image, *, train: bool = False):
        """image (B, H, W, 3) -> (B, 1+N, width)."""
        return self.visual_encoder(image, deterministic=not train)

    def encode_question(self, image_embeds, question_ids, question_mask,
                        scene_object_embeds, scene_object_mask, *, train: bool = False,
                        output_attentions: bool = False):
        """Twin encoding of the question against image + scene streams.

        Returns (hidden_2d, hidden_3d, last_attn) — hiddens (B, Lq, H);
        ``last_attn`` is the final layer's attention-prob dict
        (self/cross x 2d/3d, the reference's ``attentions[-1]`` /
        ``cross_attentions[-1]`` dump at blip_vqa_3d.py:281-282) when
        ``output_attentions`` else None.
        """
        image_atts = jnp.ones(image_embeds.shape[:2], dtype=jnp.int32)
        scene_embeds = self.linear_scene_object(scene_object_embeds, deterministic=not train)
        (h2d, h3d), last_attn = self.text_encoder(
            question_ids,
            question_mask,
            image_embeds,
            image_atts,
            scene_embeds,
            scene_object_mask,
            deterministic=not train,
            output_attentions=output_attentions,
        )
        return h2d, h3d, last_attn

    def fuse_2d3d(self, h2d, h3d):
        """Low-rank bilinear fusion + stream mean (``blip_vqa_3d.py:502-507``)."""
        x = self.lowrank_2d(h2d)
        y = self.lowrank_3d(h3d)
        bilinear = jnp.einsum("...i,oij,...j->...o", x, self.bilinear_kernel.astype(x.dtype), y)
        return bilinear + self.bilinear_bias.astype(x.dtype) + (h2d + h3d) / 2.0

    def __call__(self, image, question_ids, question_mask, answer_ids, answer_mask,
                 scene_object_embeds, scene_object_mask, *, train: bool = True):
        """Training forward (``blip_vqa_3d.py:289-349``): twin encode + both
        decoder LM losses. Returns (loss, fused_hidden, question_mask)."""
        image_embeds = self.encode_image(image, train=train)
        h2d, h3d, _ = self.encode_question(
            image_embeds, question_ids, question_mask, scene_object_embeds, scene_object_mask, train=train
        )

        answer_targets = jnp.where(answer_ids == self.cfg.pad_token_id, IGNORE_INDEX, answer_ids)
        batch = image_embeds.shape[0]

        _, loss_2d = self.text_decoder(
            answer_ids, answer_mask, h2d, question_mask, labels=answer_targets, deterministic=not train
        )
        _, loss_3d = self._decoder_scene()(
            answer_ids, answer_mask, h3d, question_mask, labels=answer_targets,
            deterministic=not train, layernorm_idx=self._scene_layernorm_idx()
        )
        loss = (jnp.sum(loss_2d) + jnp.sum(loss_3d)) / batch

        fused = self.fuse_2d3d(h2d, h3d)
        return loss, fused, question_mask

    def classify(self, image, question_ids, question_mask, scene_object_embeds,
                 scene_object_mask, *, train: bool = False):
        """Classifier mode (``use_text_decoder=False``,
        ``blip_vqa_3d.py:354-393``): the ``answer_cls`` head scores the full
        answer vocabulary from the 2D and 3D CLS states; the heads are
        averaged (optionally including ``answer_cls_2d3d`` on the fused
        state when ``use_scene_classifier_2d3d``).

        Returns (scores dict, fused_hidden, question_mask)."""
        image_embeds = self.encode_image(image, train=train)
        h2d, h3d, _ = self.encode_question(
            image_embeds, question_ids, question_mask, scene_object_embeds, scene_object_mask,
            train=train,
        )
        score_2d = self.answer_cls(h2d[:, 0, :], deterministic=not train)
        score_3d = self.answer_cls(h3d[:, 0, :], deterministic=not train)
        fused = self.fuse_2d3d(h2d, h3d)
        scores = {"answer_scores_2d": score_2d, "answer_scores_scene": score_3d}
        if self.cfg.use_scene_classifier_2d3d:
            score_2d3d = self.answer_cls_2d3d(fused[:, 0, :], deterministic=not train)
            scores["answer_scores_2d3d"] = score_2d3d
            scores["answer_scores"] = (score_2d + score_3d + score_2d3d) / 3.0
        else:
            scores["answer_scores"] = (score_2d + score_3d) / 2.0
        return scores, fused, question_mask

    # ---- inference ----

    def _rank_with_decoder(self, decoder, question_states, question_mask,
                           answer_ids, answer_mask, k: int, layernorm_idx: int = 0):
        """Vectorized ``rank_answer`` (``blip_vqa_3d.py:509-566``): one-step
        first-token beam then full scoring of the top-k answers.

        answer_ids: (A, La) full answer-list token table (row 0's first token
        is bos, as the reference overwrites ids[:,0] with [DEC]).

        Returns (topk_ids (B, k), log_probs_sum (B, k)).
        """
        num_ques = question_states.shape[0]
        bos = jnp.full((num_ques, 1), self.cfg.bos_token_id, dtype=answer_ids.dtype)

        start_logits, _ = decoder(bos, None, question_states, question_mask, deterministic=True,
                                  layernorm_idx=layernorm_idx)
        logits = start_logits[:, 0, :]

        answer_first_token = answer_ids[:, 1]
        prob_first = jax.nn.softmax(logits.astype(jnp.float32), axis=1)[:, answer_first_token]  # (B, A)
        topk_probs, topk_ids = jax.lax.top_k(prob_first, k)

        input_ids = answer_ids[topk_ids]  # (B, k, La)
        input_atts = answer_mask[topk_ids]
        la = answer_ids.shape[1]
        input_ids = input_ids.reshape(num_ques * k, la)
        input_atts = input_atts.reshape(num_ques * k, la)
        targets = jnp.where(input_ids == self.cfg.pad_token_id, IGNORE_INDEX, input_ids)

        # question states stay at batch B: the decoder's grouped
        # cross-attention projects each question's K/V once and shares them
        # across its k candidate answers (med.BertSelfAttention group path).
        # loss_chunk_size keeps the (B*k, La, vocab) logits out of HBM —
        # at k_test=256/batch 32 the full tensor would need >15 GB.
        _, loss = decoder(input_ids, input_atts, question_states, question_mask,
                          labels=targets, deterministic=True,
                          loss_chunk_size=self.cfg.rank_loss_chunk_size,
                          layernorm_idx=layernorm_idx)
        log_probs_sum = (-loss).reshape(num_ques, k)
        return topk_ids, log_probs_sum

    def rank(self, image, question_ids, question_mask, answer_ids, answer_mask,
             scene_object_embeds, scene_object_mask, k_test: int = 128,
             output_attentions: bool = False):
        """Rank-answer inference with the 2D/3D decoder ensemble
        (``blip_vqa_3d.py:437-495``).

        Returns (fused_hidden, scores dict, question_mask); scores are over
        the full answer list (A,) per sample, -1e4 for unscored answers.
        With ``output_attentions``, the scores dict also carries the last
        twin-encoder layer's attention probs under the reference's dump keys
        (``2d/3d_self/cross_attention``, blip_vqa_3d.py:281-282).
        """
        image_embeds = self.encode_image(image, train=False)
        h2d, h3d, last_attn = self.encode_question(
            image_embeds, question_ids, question_mask, scene_object_embeds, scene_object_mask,
            train=False, output_attentions=output_attentions,
        )

        num_answers = answer_ids.shape[0]
        batch = h2d.shape[0]
        k = min(k_test, num_answers)

        def scatter_scores(topk_ids, scores):
            all_scores = jnp.zeros((batch, num_answers), dtype=jnp.float32)
            b_idx = jnp.arange(batch)[:, None].repeat(k, 1)
            flat_b, flat_a = b_idx.reshape(-1), topk_ids.reshape(-1)
            all_scores = all_scores.at[flat_b, flat_a].add(scores.reshape(-1))
            # explicit scored-mask instead of the reference's `score == 0`
            # sentinel (blip_vqa_3d.py:442-447), which would remap a
            # legitimately-zero log-prob sum to -1e4
            scored = jnp.zeros((batch, num_answers), dtype=bool).at[flat_b, flat_a].set(True)
            return jnp.where(scored, all_scores, -1e4)

        ids_2d, scores_2d = self._rank_with_decoder(
            self.text_decoder, h2d, question_mask, answer_ids, answer_mask, k
        )
        all_2d = scatter_scores(ids_2d, scores_2d)

        ids_3d, scores_3d = self._rank_with_decoder(
            self._decoder_scene(), h3d, question_mask, answer_ids, answer_mask, k,
            layernorm_idx=self._scene_layernorm_idx()
        )
        all_3d = scatter_scores(ids_3d, scores_3d)

        # likelihood-space ensemble: exp(s_2d) + exp(1.05 * s_3d)
        ensemble = jnp.exp(all_2d) + jnp.exp(self.cfg.scene_ensemble_weight * all_3d)

        fused = self.fuse_2d3d(h2d, h3d)
        scores = {
            "answer_scores": ensemble,
            "answer_scores_scene": all_3d,
            "answer_scores_2d": all_2d,
        }
        if last_attn is not None:
            scores["2d_self_attention"] = last_attn["self_2d"]
            scores["3d_self_attention"] = last_attn["self_3d"]
            scores["2d_cross_attention"] = last_attn["cross_2d"]
            scores["3d_cross_attention"] = last_attn["cross_3d"]
        return fused, scores, question_mask

    def generate(self, image, question_ids, question_mask, scene_object_embeds,
                 scene_object_mask, *, num_beams: int | None = None,
                 max_length: int | None = None, min_length: int | None = None):
        """Open-ended answer generation (``blip_vqa_3d.py:394-416``): beam
        search with ``2 * num_beams`` beams per question, half attending to
        the 2D question states and half to the 3D ones, decoded by the 2D
        ``text_decoder`` (as the reference does), eos = [SEP].

        Returns (best_ids (B, max_length), fused_hidden, question_mask).
        """
        from bridgeqa_tpu.models.generation import (
            beam_search_cached,
            generate_answers,
            interleave_streams,
        )

        c = self.cfg
        num_beams = num_beams if num_beams is not None else c.num_beams
        max_length = max_length if max_length is not None else c.generate_max_length
        min_length = min_length if min_length is not None else c.generate_min_length

        image_embeds = self.encode_image(image, train=False)
        h2d, h3d, _ = self.encode_question(
            image_embeds, question_ids, question_mask, scene_object_embeds, scene_object_mask,
            train=False,
        )
        question_states = interleave_streams(h2d, h3d, num_beams)
        batch = h2d.shape[0]

        if c.use_kv_cache:
            k = 2 * num_beams
            q_mask_rows = jnp.repeat(question_mask, k, axis=0)
            cache = self.text_decoder.init_cache(question_states, q_mask_rows, max_length)

            def decode_step_fn(tok, cache):
                return self.text_decoder.decode_step(tok, cache)

            ids, scores = beam_search_cached(
                decode_step_fn, cache, batch, k,
                bos_token_id=c.bos_token_id, eos_token_id=c.sep_token_id,
                pad_token_id=c.pad_token_id, max_length=max_length, min_length=min_length,
            )
            best_ids, best_scores = ids[:, 0], scores[:, 0]
        else:
            import warnings

            warnings.warn(
                "use_kv_cache=False: the prefix-rerun beam search re-interprets "
                "a beam's prefix under its destination row's question stream when "
                "beams hop between the 2D/3D halves — sequences can differ from "
                "the (default, reference-matching) cached path. Prefer "
                "use_kv_cache=True.",
                stacklevel=2,
            )

            def decoder_apply(ids, mask, enc_states, enc_mask):
                logits, _ = self.text_decoder(ids, mask, enc_states, enc_mask, deterministic=True)
                return logits

            best_ids, best_scores = generate_answers(
                decoder_apply, question_states, question_mask, batch, num_beams,
                bos_token_id=c.bos_token_id, eos_token_id=c.sep_token_id,
                pad_token_id=c.pad_token_id, max_length=max_length, min_length=min_length,
            )
        fused = self.fuse_2d3d(h2d, h3d)
        return best_ids, fused, question_mask

    def decode_step(self, input_ids, input_mask, question_states, question_mask):
        """One full-prefix decoder pass returning next-token logits for each
        stream-agnostic generation driver. input_ids (B, L)."""
        logits, _ = self.text_decoder(input_ids, input_mask, question_states, question_mask, deterministic=True)
        return logits
