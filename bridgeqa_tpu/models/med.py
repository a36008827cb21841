"""med-BERT: BLIP's mixture-of-encoder-decoder BERT, including the BridgeQA
twin transformer.

Equivalent of ``models/med.py``:

- ``BertEmbeddings/SelfAttention/Attention/Intermediate/Output/Layer``
  (``med.py:53-395``): post-LN BERT with optional cross-attention whose
  keys/values project from ``encoder_width``;
- ``BertEncoder`` (``med.py:401-505``);
- ``BertEncoderTwin`` / ``BertModelTwin`` (``med.py:508-645, 975-1156``) —
  the core BridgeQA mechanism: every layer runs twice (main + twin stream),
  the main stream cross-attending to ``[image_embeds ‖ hidden_twin]`` and the
  twin stream to ``[scene_objects ‖ hidden_main]``, with the question
  attention mask appended to both cross masks (``med.py:1069-1070``);
- ``BertLMHeadModel`` (``med.py:1324-1470``): causal decoder with
  cross-attention, label-smoothed (0.1) per-sequence summed CE, tied
  input/output embeddings.

All sequence lengths are static (question 80, answers padded) so the whole
stack jits cleanly; generation re-runs the short (<=20 token) answer prefix
instead of maintaining a KV cache — at BridgeQA's answer lengths the cross
attention to 80 question tokens dominates either way.
"""

import dataclasses

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.ad_checkpoint import checkpoint_name

NEG_INF = -10000.0  # HF additive-mask constant

normal_init = nn.initializers.normal(stddev=0.02)


@dataclasses.dataclass(frozen=True)
class MedConfig:
    """configs/med_config.json values."""

    vocab_size: int = 30524
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_hidden_layers_twin: int | None = None
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    hidden_dropout_prob: float = 0.1
    attention_probs_dropout_prob: float = 0.1
    layer_norm_eps: float = 1e-12
    encoder_width: int = 768
    pad_token_id: int = 0
    add_cross_attention: bool = True
    # Extra per-layer FFN-output LayerNorms (``BertOutputParallel``,
    # med.py:320-330): the "parallelshare" decoder runs the SAME weights for
    # the 2D and 3D streams but selects LayerNorm ``layernorm_idx`` per call
    # (0 = the stock one, 1.. = the extras). The reference hardcodes one.
    parallel_layernorms: int = 0
    remat: bool = False  # rematerialize each layer (training memory)
    # "block": recompute the whole layer in the backward (default; matches
    #          coarser than the reference's per-attn/per-mlp checkpoint_wrapper, vit.py:103-105);
    # "attn": recompute only the (B, nh, Lq, Lk) attention scores/probs
    #         (the twin encoder's cross-attention keys span 901 image
    #         tokens) and save every other activation — chip-measured OOM
    #         at train batch 16 on a 16G v5e, opt-in for smaller batches.
    remat_mode: str = "block"
    # Fused Pallas answer-scoring path (whole-layer megakernel + streaming
    # vocab loss): "auto" = on TPU only, "force" = also off-TPU via the
    # Pallas interpreter (tests), "off" = always the XLA module path.
    fused_scoring: str = "auto"

    @property
    def twin_layers(self):
        return self.num_hidden_layers_twin if self.num_hidden_layers_twin is not None else self.num_hidden_layers


def extend_attention_mask(mask):
    """(B, L) 1/0 mask -> (B, 1, 1, L) additive bias."""
    return (1.0 - mask[:, None, None, :].astype(jnp.float32)) * NEG_INF


def causal_attention_bias(mask):
    """(B, L) padding mask -> (B, 1, L, L) additive causal+padding bias."""
    l = mask.shape[-1]
    causal = jnp.tril(jnp.ones((l, l), dtype=jnp.float32))
    combined = causal[None, :, :] * mask[:, None, :].astype(jnp.float32)
    return ((1.0 - combined) * NEG_INF)[:, None, :, :]


class BertEmbeddings(nn.Module):
    config: MedConfig
    dtype: jnp.dtype | None = None

    def setup(self):
        c = self.config
        self.word_embeddings = nn.Embed(c.vocab_size, c.hidden_size, embedding_init=normal_init,
                                        dtype=self.dtype, name="word_embeddings")
        self.position_embeddings = nn.Embed(c.max_position_embeddings, c.hidden_size,
                                            embedding_init=normal_init, dtype=self.dtype,
                                            name="position_embeddings")
        self.LayerNorm = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype)
        self.dropout = nn.Dropout(c.hidden_dropout_prob)

    def __call__(self, input_ids=None, inputs_embeds=None, position_offset=0, *, deterministic: bool):
        if inputs_embeds is None:
            inputs_embeds = self.word_embeddings(input_ids)
        seq_length = inputs_embeds.shape[1]
        # written as arange + offset so a traced offset (KV-cache decode) works
        position_ids = (jnp.arange(seq_length) + position_offset)[None, :]
        embeddings = inputs_embeds + self.position_embeddings(position_ids)
        embeddings = self.LayerNorm(embeddings)
        return self.dropout(embeddings, deterministic=deterministic)


class BertSelfAttention(nn.Module):
    config: MedConfig
    is_cross_attention: bool = False
    dtype: jnp.dtype | None = None

    def setup(self):
        c = self.config
        self.query = nn.Dense(c.hidden_size, kernel_init=normal_init, dtype=self.dtype, name="query")
        self.key = nn.Dense(c.hidden_size, kernel_init=normal_init, dtype=self.dtype, name="key")
        self.value = nn.Dense(c.hidden_size, kernel_init=normal_init, dtype=self.dtype, name="value")
        self.prob_dropout = nn.Dropout(c.attention_probs_dropout_prob)

    def project_kv(self, kv_src):
        """(B, Lk, *) -> K/V (B, nh, Lk, hd) — the cacheable half."""
        c = self.config
        nh = c.num_attention_heads
        hd = c.hidden_size // nh
        kb, lk = kv_src.shape[:2]
        k = self.key(kv_src).reshape(kb, lk, nh, hd).transpose(0, 2, 1, 3)
        v = self.value(kv_src).reshape(kb, lk, nh, hd).transpose(0, 2, 1, 3)
        return k, v

    def attend_cached(self, hidden_states, k, v, attention_bias=None, *, deterministic: bool):
        """Query from ``hidden_states`` against precomputed K/V (the KV-cache
        decode path; no dropout — inference only)."""
        c = self.config
        nh = c.num_attention_heads
        hd = c.hidden_size // nh
        b, lq = hidden_states.shape[:2]
        q = self.query(hidden_states).reshape(b, lq, nh, hd).transpose(0, 2, 1, 3)
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(hd).astype(q.dtype)
        if attention_bias is not None:
            scores = scores + attention_bias.astype(scores.dtype)
        probs = jax.nn.softmax(scores.astype(jnp.promote_types(scores.dtype, jnp.float32)), axis=-1).astype(scores.dtype)
        ctx = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        return ctx.transpose(0, 2, 1, 3).reshape(b, lq, c.hidden_size)

    def __call__(self, hidden_states, attention_bias=None, encoder_hidden_states=None, *, deterministic: bool):
        c = self.config
        h, nh = c.hidden_size, c.num_attention_heads
        hd = h // nh
        b, lq = hidden_states.shape[:2]

        # NOTE: a fused (H, 3H) QKV GEMM was tried and measured SLOWER
        # end-to-end (the post-split slices cost more traffic than the three
        # narrower GEMMs save) — keep the separate projections.
        kv_src = encoder_hidden_states if self.is_cross_attention else hidden_states
        query = self.query(hidden_states)
        key = self.key(kv_src)
        value = self.value(kv_src)

        lk = kv_src.shape[1]
        kb = kv_src.shape[0]
        k = key.reshape(kb, lk, nh, hd).transpose(0, 2, 1, 3)
        v = value.reshape(kb, lk, nh, hd).transpose(0, 2, 1, 3)

        if self.is_cross_attention and kb != b:
            # grouped cross-attention: the query batch is g copies per
            # encoder row (answer-ranking scores g answers against ONE
            # question) — fold the group into the query length so K/V are
            # projected once per question instead of per (question, answer)
            # pair (~70% of the ranking decoder's FLOPs).
            g = b // kb
            q = query.reshape(kb, g * lq, nh, hd).transpose(0, 2, 1, 3)
            scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(hd).astype(q.dtype)
            if attention_bias is not None:  # (kb, 1, 1, lk) question padding bias
                scores = scores + attention_bias.astype(scores.dtype)
            scores = checkpoint_name(scores, "bert_attn_scores")
            probs = checkpoint_name(jax.nn.softmax(scores.astype(jnp.promote_types(scores.dtype, jnp.float32)), axis=-1),
                                    "bert_attn_probs32").astype(scores.dtype)
            probs = checkpoint_name(probs, "bert_attn_probs")
            probs_d = checkpoint_name(self.prob_dropout(probs, deterministic=deterministic),
                                      "bert_attn_probs_d")
            ctx = jnp.einsum("bhqk,bhkd->bhqd", probs_d, v)
            ctx = ctx.transpose(0, 2, 1, 3).reshape(b, lq, h)
            return ctx, probs

        if b * nh >= 4096 and lq <= 16 and lk <= 16:
            # answer-scoring shapes: a huge batch of tiny per-head matmuls.
            # The MXU pays a full 128x128 pass per (12, 64)x(64, 12) element
            # (~10x padding waste per side); broadcast-multiply-reduce runs
            # on the VPU instead — measured 3x faster at (8192, 12, 768).
            qv = query.reshape(b, lq, nh, hd)
            kv = key.reshape(b, lk, nh, hd)
            vv = value.reshape(b, lk, nh, hd)
            scores = jnp.sum(qv[:, :, None] * kv[:, None, :], axis=-1)  # (B, Lq, Lk, nh)
            scores = scores / jnp.sqrt(hd).astype(scores.dtype)
            if attention_bias is not None:
                # incoming bias is (B', 1|nh, Lq|1, Lk) -> (B', Lq|1, Lk, 1|nh)
                scores = scores + attention_bias.transpose(0, 2, 3, 1).astype(scores.dtype)
            probs = jax.nn.softmax(scores.astype(jnp.promote_types(scores.dtype, jnp.float32)), axis=2).astype(scores.dtype)
            probs_d = self.prob_dropout(probs, deterministic=deterministic)
            ctx = jnp.sum(probs_d[..., None] * vv[:, None], axis=2)  # (B, Lq, nh, hd)
            return ctx.reshape(b, lq, h), probs.transpose(0, 3, 1, 2)

        q = query.reshape(b, lq, nh, hd).transpose(0, 2, 1, 3)
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(hd).astype(q.dtype)
        if attention_bias is not None:
            scores = scores + attention_bias.astype(scores.dtype)
        scores = checkpoint_name(scores, "bert_attn_scores")
        probs = checkpoint_name(jax.nn.softmax(scores.astype(jnp.promote_types(scores.dtype, jnp.float32)), axis=-1),
                                "bert_attn_probs32").astype(scores.dtype)
        probs = checkpoint_name(probs, "bert_attn_probs")
        # the dropout output and the f32 softmax are attention-shaped too —
        # without naming them the "attn" remat policy would still save
        # (B, nh, Lq, Lk) tensors and the memory saving would evaporate
        probs_d = checkpoint_name(self.prob_dropout(probs, deterministic=deterministic),
                                  "bert_attn_probs_d")

        ctx = jnp.einsum("bhqk,bhkd->bhqd", probs_d, v)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(b, lq, h)
        return ctx, probs


class BertSelfOutput(nn.Module):
    config: MedConfig
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, hidden_states, input_tensor, *, deterministic: bool):
        c = self.config
        hidden_states = nn.Dense(c.hidden_size, kernel_init=normal_init, dtype=self.dtype, name="dense")(hidden_states)
        hidden_states = nn.Dropout(c.hidden_dropout_prob)(hidden_states, deterministic=deterministic)
        return nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype, name="LayerNorm")(hidden_states + input_tensor)


class BertAttention(nn.Module):
    config: MedConfig
    is_cross_attention: bool = False
    dtype: jnp.dtype | None = None

    def setup(self):
        self.self = BertSelfAttention(self.config, self.is_cross_attention, dtype=self.dtype, name="self")
        self.output = BertSelfOutput(self.config, dtype=self.dtype, name="output")

    def __call__(self, hidden_states, attention_bias=None, encoder_hidden_states=None, *, deterministic: bool):
        ctx, probs = self.self(hidden_states, attention_bias, encoder_hidden_states, deterministic=deterministic)
        return self.output(ctx, hidden_states, deterministic=deterministic), probs


class BertLayer(nn.Module):
    config: MedConfig
    dtype: jnp.dtype | None = None

    def setup(self):
        c = self.config
        self.attention = BertAttention(c, dtype=self.dtype, name="attention")
        if c.add_cross_attention:
            self.crossattention = BertAttention(c, is_cross_attention=True, dtype=self.dtype, name="crossattention")
        self.intermediate_dense = nn.Dense(c.intermediate_size, kernel_init=normal_init, dtype=self.dtype,
                                           name="intermediate_dense")
        self.output_dense = nn.Dense(c.hidden_size, kernel_init=normal_init, dtype=self.dtype, name="output_dense")
        self.output_LayerNorm = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype, name="output_LayerNorm")
        # BertOutputParallel's extra LayerNorms (med.py:320-330); selected
        # statically per call via ``layernorm_idx`` (the parallelshare mode
        # makes exactly two calls per step, one per stream)
        self.output_LayerNorms = [
            nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype, name=f"output_LayerNorms_{i}")
            for i in range(c.parallel_layernorms)
        ]
        self.output_dropout = nn.Dropout(c.hidden_dropout_prob)

    def _ffn_layernorm(self, layernorm_idx: int):
        return self.output_LayerNorm if layernorm_idx == 0 else self.output_LayerNorms[layernorm_idx - 1]

    def _apply_ffn_layernorm(self, x, layernorm_idx: int):
        if self.is_initializing():
            # materialize EVERY bank regardless of which idx this init trace
            # uses — otherwise a model initialized through an idx-0-only
            # method (e.g. generate) would be missing the alternate params
            self.output_LayerNorm(x)
            for ln in self.output_LayerNorms:
                ln(x)
        return self._ffn_layernorm(layernorm_idx)(x)

    def __call__(self, hidden_states, attention_bias=None, encoder_hidden_states=None,
                 encoder_attention_bias=None, deterministic: bool = True, multimodal: bool = True,
                 layernorm_idx: int = 0):
        attention_output, self_probs = self.attention(hidden_states, attention_bias, deterministic=deterministic)
        cross_probs = None
        if multimodal and encoder_hidden_states is not None:
            attention_output, cross_probs = self.crossattention(
                attention_output, encoder_attention_bias, encoder_hidden_states, deterministic=deterministic
            )
        intermediate = nn.gelu(self.intermediate_dense(attention_output), approximate=False)
        layer_output = self.output_dropout(self.output_dense(intermediate), deterministic=deterministic)
        layer_output = self._apply_ffn_layernorm(layer_output + attention_output, layernorm_idx)
        return layer_output, self_probs, cross_probs

    # ---- KV-cache decode (inference only; reference med.py:1447-1470
    # past_key_value machinery, TPU-first static-shape formulation) ----

    def decode_kv_init(self, encoder_hidden_states):
        """Cross-attention K/V from the encoder states — computed ONCE per
        generation instead of per decode step."""
        return self.crossattention.self.project_kv(encoder_hidden_states)

    def decode_step(self, hidden, layer_cache, pos, self_bias, cross_bias, layernorm_idx: int = 0):
        """One-token layer step: write this position's self K/V into the
        cache, attend over the cached prefix + the fixed cross K/V."""
        from jax import lax

        k_new, v_new = self.attention.self.project_kv(hidden)
        self_k = lax.dynamic_update_slice(layer_cache["self_k"], k_new, (0, 0, pos, 0))
        self_v = lax.dynamic_update_slice(layer_cache["self_v"], v_new, (0, 0, pos, 0))
        ctx = self.attention.self.attend_cached(hidden, self_k, self_v, self_bias,
                                                deterministic=True)
        attention_output = self.attention.output(ctx, hidden, deterministic=True)
        cctx = self.crossattention.self.attend_cached(
            attention_output, layer_cache["cross_k"], layer_cache["cross_v"], cross_bias,
            deterministic=True)
        attention_output = self.crossattention.output(cctx, attention_output, deterministic=True)
        intermediate = nn.gelu(self.intermediate_dense(attention_output), approximate=False)
        layer_output = self._apply_ffn_layernorm(
            self.output_dense(intermediate) + attention_output, layernorm_idx)
        new_cache = dict(layer_cache, self_k=self_k, self_v=self_v)
        return layer_output, new_cache


def _layer_cls(config: MedConfig):
    """BertLayer, optionally remat-wrapped (deterministic/multimodal/
    layernorm_idx static)."""
    if config.remat and config.remat_mode == "attn":
        policy = jax.checkpoint_policies.save_anything_except_these_names(
            "bert_attn_scores", "bert_attn_probs32", "bert_attn_probs",
            "bert_attn_probs_d")
        return nn.remat(BertLayer, static_argnums=(5, 6, 7), policy=policy)
    if config.remat:
        return nn.remat(BertLayer, static_argnums=(5, 6, 7))
    return BertLayer


class BertEncoder(nn.Module):
    config: MedConfig
    dtype: jnp.dtype | None = None

    def setup(self):
        cls = _layer_cls(self.config)
        self.layer = [cls(self.config, dtype=self.dtype, name=f"layer_{i}")
                      for i in range(self.config.num_hidden_layers)]

    def __call__(self, hidden_states, attention_bias=None, encoder_hidden_states=None,
                 encoder_attention_bias=None, *, deterministic: bool, multimodal: bool = True,
                 layernorm_idx: int = 0):
        for layer in self.layer:
            hidden_states, _, _ = layer(
                hidden_states, attention_bias, encoder_hidden_states, encoder_attention_bias,
                deterministic, multimodal, layernorm_idx,
            )
        return hidden_states


class BertEncoderTwin(nn.Module):
    """Two-stream encoder with per-layer hidden-state exchange
    (``med.py:508-645``). Stream A (main/2D) cross-attends to
    ``[encoder_hidden ‖ hidden_twin]``, stream B (twin/3D) to
    ``[encoder_hidden_twin ‖ hidden_main]``; both use the *pre-layer* value
    of the other stream.
    """

    config: MedConfig
    dtype: jnp.dtype | None = None

    def setup(self):
        cls = _layer_cls(self.config)
        self.layer = [cls(self.config, dtype=self.dtype, name=f"layer_{i}")
                      for i in range(self.config.num_hidden_layers)]
        self.layer_twin = [cls(self.config, dtype=self.dtype, name=f"layer_twin_{i}")
                           for i in range(self.config.twin_layers)]

    def __call__(self, hidden_states, attention_bias, encoder_hidden_states, encoder_attention_bias,
                 encoder_hidden_states_twin, encoder_attention_bias_twin, *, deterministic: bool,
                 output_attentions: bool = False):
        hidden_twin = hidden_states
        last_attn = None
        for i, layer in enumerate(self.layer):
            layer_twin = self.layer_twin[i] if i < len(self.layer_twin) else None

            cross_mix = jnp.concatenate([encoder_hidden_states, hidden_twin], axis=1)
            cross_mix_twin = jnp.concatenate([encoder_hidden_states_twin, hidden_states], axis=1)

            new_hidden, self_p, cross_p = layer(
                hidden_states, attention_bias, cross_mix, encoder_attention_bias,
                deterministic, True, 0,
            )
            if layer_twin is not None:
                new_twin, self_pt, cross_pt = layer_twin(
                    hidden_twin, attention_bias, cross_mix_twin, encoder_attention_bias_twin,
                    deterministic, True, 0,
                )
                hidden_twin = new_twin
            else:
                self_pt = cross_pt = None
            hidden_states = new_hidden
            if output_attentions:
                last_attn = {"self_2d": self_p, "self_3d": self_pt, "cross_2d": cross_p, "cross_3d": cross_pt}
        return (hidden_states, hidden_twin), last_attn


class BertModelTwin(nn.Module):
    """``BertModelTwin`` (``med.py:975-1156``): embeddings + twin encoder.

    Builds the cross masks by appending the question self-mask to the
    image/scene masks (``med.py:1069-1070``).
    """

    config: MedConfig
    dtype: jnp.dtype | None = None

    def setup(self):
        self.embeddings = BertEmbeddings(self.config, dtype=self.dtype, name="embeddings")
        self.encoder = BertEncoderTwin(self.config, dtype=self.dtype, name="encoder")

    def __call__(self, input_ids, attention_mask, encoder_hidden_states, encoder_attention_mask,
                 encoder_hidden_states_twin, encoder_attention_mask_twin, *, deterministic: bool,
                 output_attentions: bool = False):
        attention_bias = extend_attention_mask(attention_mask)
        cross_mask = jnp.concatenate([encoder_attention_mask, attention_mask], axis=1)
        cross_mask_twin = jnp.concatenate([encoder_attention_mask_twin, attention_mask], axis=1)

        embedding_output = self.embeddings(input_ids, deterministic=deterministic)
        return self.encoder(
            embedding_output,
            attention_bias,
            encoder_hidden_states,
            extend_attention_mask(cross_mask),
            encoder_hidden_states_twin,
            extend_attention_mask(cross_mask_twin),
            deterministic=deterministic,
            output_attentions=output_attentions,
        )


class BertModel(nn.Module):
    config: MedConfig
    dtype: jnp.dtype | None = None

    def setup(self):
        self.embeddings = BertEmbeddings(self.config, dtype=self.dtype, name="embeddings")
        self.encoder = BertEncoder(self.config, dtype=self.dtype, name="encoder")

    def __call__(self, input_ids=None, attention_mask=None, encoder_hidden_states=None,
                 encoder_attention_mask=None, inputs_embeds=None, *, deterministic: bool,
                 is_decoder: bool = False, multimodal: bool = True, layernorm_idx: int = 0):
        if attention_mask is None:
            ref = input_ids if input_ids is not None else inputs_embeds[..., 0]
            attention_mask = jnp.ones(ref.shape[:2], dtype=jnp.int32)
        attention_bias = causal_attention_bias(attention_mask) if is_decoder else extend_attention_mask(attention_mask)
        cross_bias = None
        if encoder_hidden_states is not None:
            if encoder_attention_mask is None:
                encoder_attention_mask = jnp.ones(encoder_hidden_states.shape[:2], dtype=jnp.int32)
            cross_bias = extend_attention_mask(encoder_attention_mask)

        embedding_output = self.embeddings(input_ids, inputs_embeds, deterministic=deterministic)
        return self.encoder(
            embedding_output, attention_bias, encoder_hidden_states, cross_bias,
            deterministic=deterministic, multimodal=multimodal, layernorm_idx=layernorm_idx,
        )


class BertLMPredictionHead(nn.Module):
    """``BertOnlyMLMHead``: transform (dense+gelu+LN) then a decoder tied to
    the word embedding table plus a free bias."""

    config: MedConfig
    dtype: jnp.dtype | None = None

    def setup(self):
        c = self.config
        self.transform_dense = nn.Dense(c.hidden_size, kernel_init=normal_init, dtype=self.dtype,
                                        name="transform_dense")
        self.transform_LayerNorm = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype,
                                                name="transform_LayerNorm")
        self.bias = self.param("bias", nn.initializers.zeros, (c.vocab_size,), jnp.float32)

    def transform(self, hidden_states):
        h = self.transform_dense(hidden_states)
        h = nn.gelu(h, approximate=False)
        return self.transform_LayerNorm(h)

    def __call__(self, hidden_states, word_embed: nn.Embed):
        logits = word_embed.attend(self.transform(hidden_states))
        return logits + self.bias


def label_smoothed_lm_loss(logits, labels, epsilon: float = 0.1):
    """torch ``CrossEntropyLoss(label_smoothing=0.1, reduction='none')`` with
    ignore_index -100, shift-by-one, summed per sequence
    (``med.py:1424-1432``). logits (B, L, V), labels (B, L) -> (B,)."""
    return _label_smoothed_from_shifted(logits[:, :-1, :], labels[:, 1:], epsilon)


def _label_smoothed_from_shifted(shifted_logits, shifted_labels, epsilon: float = 0.1):
    """Label-smoothed CE in logsumexp form: ``nll = lse - logit_target`` and
    ``smooth = -mean(logp) = lse - mean(logits)``. Mathematically identical
    to ``log_softmax`` + gather, but only *reductions* touch the (B, L, V)
    logits — XLA fuses the f32 upcast into them, so no full-vocab f32
    tensor ever materializes (at answer-ranking batch sizes that tensor is
    >10 GB and was the round-1 HBM OOM)."""
    valid = shifted_labels != -100
    safe_labels = jnp.where(valid, shifted_labels, 0)
    lse = jax.nn.logsumexp(shifted_logits.astype(jnp.promote_types(shifted_logits.dtype, jnp.float32)), axis=-1)
    mean_logits = jnp.mean(shifted_logits.astype(jnp.promote_types(shifted_logits.dtype, jnp.float32)), axis=-1)
    target = jnp.take_along_axis(shifted_logits, safe_labels[..., None], axis=-1)[..., 0]
    nll = lse - target.astype(lse.dtype)
    smooth = lse - mean_logits
    per_token = (1.0 - epsilon) * nll + epsilon * smooth
    per_token = jnp.where(valid, per_token, 0.0)
    return jnp.sum(per_token, axis=-1)


class BertLMHeadModel(nn.Module):
    """Causal LM decoder with cross-attention (``med.py:1324-1470``)."""

    config: MedConfig
    dtype: jnp.dtype | None = None

    def setup(self):
        self.bert = BertModel(self.config, dtype=self.dtype, name="bert")
        self.cls = BertLMPredictionHead(self.config, dtype=self.dtype, name="cls")

    def __call__(self, input_ids, attention_mask=None, encoder_hidden_states=None,
                 encoder_attention_mask=None, labels=None, *, deterministic: bool,
                 loss_chunk_size: int | None = None, layernorm_idx: int = 0):
        """Returns (logits, per_sequence_loss | None).

        ``loss_chunk_size``: when scoring a large batch (answer ranking runs
        B*k_test = thousands of sequences), the (B, L, vocab) logits tensor
        cannot materialize in HBM (k_test=256 at batch 32 needs a 10+ GB
        f32 buffer). Setting a chunk size computes the vocab projection +
        label-smoothed loss in sequential batch chunks via ``lax.map``; only
        the per-sequence loss is returned (logits come back as None).
        """
        fused = self._fused_scoring_loss(
            input_ids, encoder_hidden_states, encoder_attention_mask, labels,
            deterministic=deterministic, layernorm_idx=layernorm_idx)
        if fused is not None:
            return None, fused
        sequence_output = self.bert(
            input_ids,
            attention_mask=attention_mask,
            encoder_hidden_states=encoder_hidden_states,
            encoder_attention_mask=encoder_attention_mask,
            deterministic=deterministic,
            is_decoder=True,
            layernorm_idx=layernorm_idx,
        )
        word_embed = self.bert.embeddings.word_embeddings
        if labels is not None and loss_chunk_size is not None and sequence_output.shape[0] > loss_chunk_size:
            b, l, h = sequence_output.shape
            cs = loss_chunk_size
            pad = (-b) % cs
            # pre-shift: the last position predicts nothing, so drop it
            # BEFORE the vocab projection (saves 1/L of the head matmul)
            h_t = self.cls.transform(sequence_output)[:, :-1, :]  # (B, L-1, H)
            shifted_labels = labels[:, 1:]
            if pad:
                h_t = jnp.concatenate([h_t, jnp.zeros((pad, l - 1, h), h_t.dtype)], axis=0)
                shifted_labels = jnp.concatenate(
                    [shifted_labels, jnp.full((pad, l - 1), -100, shifted_labels.dtype)], axis=0)
            # match Embed.attend's dtype promotion, then + f32 bias
            table = jnp.asarray(word_embed.embedding, h_t.dtype)
            bias = self.cls.bias

            def chunk_fn(args):
                h_c, lab_c = args
                logits_c = jnp.dot(h_c, table.T) + bias
                return _label_smoothed_from_shifted(logits_c, lab_c)

            n_chunks = h_t.shape[0] // cs
            loss = jax.lax.map(
                chunk_fn,
                (h_t.reshape(n_chunks, cs, l - 1, h), shifted_labels.reshape(n_chunks, cs, l - 1)),
            ).reshape(-1)[:b]
            return None, loss
        logits = self.cls(sequence_output, word_embed)
        loss = label_smoothed_lm_loss(logits, labels) if labels is not None else None
        return logits, loss

    def _fused_scoring_loss(self, input_ids, encoder_hidden_states,
                            encoder_attention_mask, labels, *, deterministic,
                            layernorm_idx: int = 0):
        """Answer-scoring fast path: whole-layer Pallas megakernel decoder
        body + streaming vocab loss. Returns the per-sequence loss, or None
        when the regular module path should run instead.

        Active only for the grouped rank-answer shapes (query batch a
        multiple >=2 of the encoder batch), deterministic, with labels —
        exactly the ``rank_answer`` full-scoring call. Numerically this path
        drops the answer padding mask (equivalent for right-padded answers:
        every unmasked-loss row sees only valid tokens under the causal
        mask) and accumulates the vocab projection in f32 instead of
        truncating to bf16 (strictly tighter); ``tests/test_scoring_fused.py``
        pins the equivalence.
        """
        import jax as _jax

        from bridgeqa_tpu.ops.scoring_layer import (
            fused_scoring_capable,
            scoring_decoder_body,
        )
        from bridgeqa_tpu.ops.vocab_loss import label_smoothed_loss_streaming

        c = self.config
        if (labels is None or not deterministic or encoder_hidden_states is None
                or c.remat or c.fused_scoring == "off" or self.is_initializing()):
            return None
        dt = self.dtype if self.dtype is not None else jnp.float32
        if not fused_scoring_capable(c, input_ids.shape[0],
                                     encoder_hidden_states.shape[0],
                                     input_ids.shape[1], c.hidden_size, dt):
            return None
        on_tpu = _jax.default_backend() == "tpu"
        if not on_tpu and c.fused_scoring != "force":
            return None

        emb = self.bert.embeddings(input_ids, deterministic=True)
        if encoder_attention_mask is None:
            encoder_attention_mask = jnp.ones(encoder_hidden_states.shape[:2],
                                              dtype=jnp.int32)
        enc_params = self.variables["params"]["bert"]["encoder"]
        x = scoring_decoder_body(
            enc_params, emb, encoder_hidden_states, encoder_attention_mask,
            config=c, dtype=dt, interpret=not on_tpu, layernorm_idx=layernorm_idx,
        )
        h_t = self.cls.transform(x)[:, :-1, :]
        table = jnp.asarray(self.bert.embeddings.word_embeddings.embedding, dt)
        return label_smoothed_loss_streaming(
            h_t, labels[:, 1:], table, self.cls.bias, interpret=not on_tpu)

    # ---- KV-cache decode path (generation; see BertLayer.decode_step) ----

    def init_cache(self, question_states, question_mask, max_length: int):
        """Decode cache: per-layer cross K/V projected once from the question
        states + zeroed self K/V buffers (B, nh, max_length, hd).

        NOT supported with ``config.remat`` (the remat-lifted layer class
        exposes only ``__call__``); generation never needs remat.
        """
        c = self.config
        assert not c.remat, "KV-cache decode requires remat=False layers"
        nh = c.num_attention_heads
        hd = c.hidden_size // nh
        b = question_states.shape[0]
        layers = []
        for layer in self.bert.encoder.layer:
            ck, cv = layer.decode_kv_init(question_states)
            layers.append({
                "self_k": jnp.zeros((b, nh, max_length, hd), ck.dtype),
                "self_v": jnp.zeros((b, nh, max_length, hd), cv.dtype),
                "cross_k": ck,
                "cross_v": cv,
            })
        return {
            "pos": jnp.zeros((), jnp.int32),
            "layers": layers,
            "cross_bias": extend_attention_mask(question_mask),
        }

    def decode_step(self, token_ids, cache, layernorm_idx: int = 0):
        """token_ids (B, 1) at position ``cache['pos']`` -> (next-token
        logits (B, V), updated cache)."""
        pos = cache["pos"]
        hidden = self.bert.embeddings(token_ids, position_offset=pos, deterministic=True)
        max_len = cache["layers"][0]["self_k"].shape[2]
        self_bias = jnp.where(jnp.arange(max_len)[None, None, None, :] <= pos, 0.0, NEG_INF)
        new_layers = []
        for layer, lc in zip(self.bert.encoder.layer, cache["layers"]):
            hidden, new_lc = layer.decode_step(hidden, lc, pos, self_bias, cache["cross_bias"],
                                               layernorm_idx)
            new_layers.append(new_lc)
        logits = self.cls(hidden, self.bert.embeddings.word_embeddings)  # (B, 1, V)
        new_cache = {"pos": pos + 1, "layers": new_layers, "cross_bias": cache["cross_bias"]}
        return logits[:, 0, :], new_cache
