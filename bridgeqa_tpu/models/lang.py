"""Language module: (bi)LSTM over GloVe/BERT word embeddings.

Equivalent of ``models/lang_module.py:14-125`` for the 3D-only (non-BLIP)
path: word dropout -> LSTM over padded sequences with true lengths
(pack_padded semantics: the final hidden state is each sample's true last
step) -> optional 18-way language classifier.
"""

import jax.numpy as jnp
from flax import linen as nn

from bridgeqa_tpu.models.med import normal_init


class LangModule(nn.Module):
    num_object_class: int
    use_lang_classifier: bool = True
    use_bidir: bool = False
    hidden_size: int = 256
    pdrop: float = 0.1

    @nn.compact
    def __call__(self, lang_feat, lang_len, *, train: bool):
        """lang_feat (B, L, E) pre-embedded words (GloVe 300d or BERT states);
        lang_len (B,) true lengths.

        Returns dict with lang_out (B, L, H*dirs), lang_emb (B, H*dirs),
        lang_mask (B, L) True=masked, and optionally lang_scores.
        """
        x = nn.Dropout(self.pdrop)(lang_feat, deterministic=not train)

        rnn_fwd = nn.RNN(nn.OptimizedLSTMCell(self.hidden_size), return_carry=True, name="lstm_fwd")
        (c_f, h_f), out_f = rnn_fwd(x, seq_lengths=lang_len)
        if self.use_bidir:
            rnn_bwd = nn.RNN(nn.OptimizedLSTMCell(self.hidden_size), return_carry=True,
                             reverse=True, keep_order=True, name="lstm_bwd")
            (c_b, h_b), out_b = rnn_bwd(x, seq_lengths=lang_len)
            lang_out = jnp.concatenate([out_f, out_b], axis=-1)
            lang_emb = jnp.concatenate([h_f, h_b], axis=-1)
        else:
            lang_out = out_f
            lang_emb = h_f

        valid = jnp.arange(lang_out.shape[1])[None, :] < lang_len[:, None]
        lang_out = jnp.where(valid[..., None], lang_out, 0.0)  # pad_packed zeros

        out = {
            "lang_out": lang_out,
            "lang_emb": lang_emb,
            # make_mask semantics (lang_module.py:71-78): True past true length
            "lang_mask": ~valid,
        }
        if self.use_lang_classifier:
            h = nn.Dropout(self.pdrop)(lang_emb, deterministic=not train)
            out["lang_scores"] = nn.Dense(self.num_object_class, kernel_init=normal_init, name="lang_cls")(h)
        return out


class CLIPLangModule(nn.Module):
    """``CLIPLangModule`` (``models/lang_module.py:~125-139``): the reference
    variant that feeds frozen open_clip token features through a projection
    instead of an LSTM. open_clip isn't bundled here, so this takes the
    pre-extracted CLIP token embeddings from the data pipeline (any (B, L, E)
    stream) and applies the same projection + mask interface as LangModule.
    """

    out_size: int = 256
    pdrop: float = 0.1

    @nn.compact
    def __call__(self, clip_feat, lang_len, *, train: bool):
        """clip_feat (B, L, E) precomputed CLIP token features; lang_len (B,)."""
        x = nn.Dropout(self.pdrop)(clip_feat, deterministic=not train)
        lang_out = nn.Dense(self.out_size, kernel_init=normal_init, name="proj")(x)
        valid = jnp.arange(lang_out.shape[1])[None, :] < lang_len[:, None]
        lang_out = jnp.where(valid[..., None], lang_out, 0.0)
        # CLS-style pooled embedding = mean over valid tokens
        denom = jnp.maximum(lang_len[:, None], 1)
        lang_emb = jnp.sum(lang_out, axis=1) / denom
        return {"lang_out": lang_out, "lang_emb": lang_emb, "lang_mask": ~valid}


class BertLangEncoder(nn.Module):
    """``LangModule``'s ``bert_model_name`` option (``lang_module.py:27-46``):
    a BERT text encoder over question token ids whose last hidden states feed
    the LSTM instead of GloVe vectors. ``freeze`` / ``finetune_last_layer``
    mirror the reference's ``requires_grad`` toggles via ``stop_gradient``
    (full stop at the output, or a cut before the final layer so only its
    parameters receive gradients).

    Weights load from a BERT checkpoint with
    ``utils.blip_checkpoint.convert_lm_head``-style converters (same med
    BertModel tree as the BLIP text encoder).
    """

    config: "object"  # MedConfig
    freeze: bool = False
    finetune_last_layer: bool = False

    def setup(self):
        from bridgeqa_tpu.models.med import BertModel

        assert not (self.freeze and self.finetune_last_layer)
        self.bert = BertModel(self.config, name="bert")

    def __call__(self, input_ids, attention_mask, *, train: bool):
        """(B, L) ids/mask -> (B, L, hidden) word states."""
        import jax

        from bridgeqa_tpu.models.med import extend_attention_mask

        deterministic = not train
        bias = extend_attention_mask(attention_mask)
        h = self.bert.embeddings(input_ids, deterministic=deterministic)
        layers = self.bert.encoder.layer
        for i, layer in enumerate(layers):
            if self.finetune_last_layer and i == len(layers) - 1:
                # cut the path into earlier layers' params; the last layer
                # still trains (lang_module.py:38-46)
                h = jax.lax.stop_gradient(h)
            h, _, _ = layer(h, bias, None, None, deterministic, False)
        if self.freeze:
            h = jax.lax.stop_gradient(h)
        return h
