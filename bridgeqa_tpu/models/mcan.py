"""MCAN fusion modules (deep modular co-attention).

Equivalents of ``models/mcan_module.py:18-355``: FC/MLP, the std-based
LayerNorm variant (eps added to the *std*, not the variance — matters for
parity), MHAtt, SA / SGA blocks, AttFlat pooling with optional top-k
attention dropout, and the MCAN_E / MCAN_ED cascades.

Mask convention follows the reference: boolean masks are **True where
masked** (``scores.masked_fill(mask, -1e9)``).
"""

import jax
import jax.numpy as jnp
from flax import linen as nn

from bridgeqa_tpu.models.med import normal_init


class McanLayerNorm(nn.Module):
    """``mcan_module.LayerNorm``: (x - mean) / (std + eps), std unbiased=True
    like torch.std default."""

    size: int
    eps: float = 1e-6
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        a = self.param("a_2", nn.initializers.ones, (self.size,), jnp.float32)
        b = self.param("b_2", nn.initializers.zeros, (self.size,), jnp.float32)
        mean = jnp.mean(x, axis=-1, keepdims=True)
        n = x.shape[-1]
        var = jnp.sum((x - mean) ** 2, axis=-1, keepdims=True) / max(n - 1, 1)
        std = jnp.sqrt(var)
        return a * (x - mean) / (std + self.eps) + b


class MLP(nn.Module):
    mid_size: int
    out_size: int
    pdrop: float = 0.0
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, *, deterministic: bool):
        x = nn.Dense(self.mid_size, kernel_init=normal_init, dtype=self.dtype, name="fc")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dropout(self.pdrop)(x, deterministic=deterministic)
        return nn.Dense(self.out_size, kernel_init=normal_init, dtype=self.dtype, name="linear")(x)


class MHAtt(nn.Module):
    hidden_size: int
    num_heads: int = 8
    pdrop: float = 0.1
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, v, k, q, mask, *, deterministic: bool):
        """mask: broadcastable to (B, H, Lq, Lk), True = masked."""
        b = q.shape[0]
        hd = self.hidden_size // self.num_heads

        def split(x, name):
            x = nn.Dense(self.hidden_size, kernel_init=normal_init, dtype=self.dtype, name=name)(x)
            return x.reshape(b, -1, self.num_heads, hd).transpose(0, 2, 1, 3)

        vh = split(v, "linear_v")
        kh = split(k, "linear_k")
        qh = split(q, "linear_q")

        scores = jnp.einsum("bhqd,bhkd->bhqk", qh, kh) / jnp.sqrt(hd).astype(qh.dtype)
        if mask is not None:
            scores = jnp.where(mask, -1e9, scores)
        att = jax.nn.softmax(scores.astype(jnp.promote_types(scores.dtype, jnp.float32)), axis=-1).astype(v.dtype)
        att = nn.Dropout(self.pdrop)(att, deterministic=deterministic)

        out = jnp.einsum("bhqk,bhkd->bhqd", att, vh).transpose(0, 2, 1, 3).reshape(b, -1, self.hidden_size)
        return nn.Dense(self.hidden_size, kernel_init=normal_init, dtype=self.dtype, name="linear_merge")(out)


class FFN(nn.Module):
    hidden_size: int
    pdrop: float = 0.1
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, *, deterministic: bool):
        return MLP(self.hidden_size * 4, self.hidden_size, self.pdrop, dtype=self.dtype, name="mlp")(
            x, deterministic=deterministic
        )


class SA(nn.Module):
    hidden_size: int
    num_heads: int = 8
    pdrop: float = 0.1
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, x_mask, *, deterministic: bool):
        att = MHAtt(self.hidden_size, self.num_heads, self.pdrop, dtype=self.dtype, name="mhatt")(
            x, x, x, x_mask, deterministic=deterministic
        )
        x = McanLayerNorm(self.hidden_size, name="norm1")(
            x + nn.Dropout(self.pdrop)(att, deterministic=deterministic)
        )
        ffn = FFN(self.hidden_size, self.pdrop, dtype=self.dtype, name="ffn")(x, deterministic=deterministic)
        return McanLayerNorm(self.hidden_size, name="norm2")(
            x + nn.Dropout(self.pdrop)(ffn, deterministic=deterministic)
        )


class SGA(nn.Module):
    hidden_size: int
    num_heads: int = 8
    pdrop: float = 0.1
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, y, x_mask, y_mask, *, deterministic: bool):
        att1 = MHAtt(self.hidden_size, self.num_heads, self.pdrop, dtype=self.dtype, name="mhatt1")(
            x, x, x, x_mask, deterministic=deterministic
        )
        x = McanLayerNorm(self.hidden_size, name="norm1")(
            x + nn.Dropout(self.pdrop)(att1, deterministic=deterministic)
        )
        att2 = MHAtt(self.hidden_size, self.num_heads, self.pdrop, dtype=self.dtype, name="mhatt2")(
            y, y, x, y_mask, deterministic=deterministic
        )
        x = McanLayerNorm(self.hidden_size, name="norm2")(
            x + nn.Dropout(self.pdrop)(att2, deterministic=deterministic)
        )
        ffn = FFN(self.hidden_size, self.pdrop, dtype=self.dtype, name="ffn")(x, deterministic=deterministic)
        return McanLayerNorm(self.hidden_size, name="norm3")(
            x + nn.Dropout(self.pdrop)(ffn, deterministic=deterministic)
        )



class AttFlat(nn.Module):
    """Attention-flatten pooling (``mcan_module.py:74-131``) incl. the
    top-k attention-drop regulariser used by ``attflat_visual``."""

    hidden_size: int
    flat_mlp_size: int = 512
    flat_glimpses: int = 1
    flat_out_size: int = 1024
    pdrop: float = 0.1
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, x_mask, *, deterministic: bool, att_pdrop: float = 0.0, att_drop_topk: int = 100):
        att = MLP(self.flat_mlp_size, self.flat_glimpses, self.pdrop, dtype=self.dtype, name="mlp")(
            x, deterministic=deterministic
        )  # (B, N, G)
        if x_mask is not None:
            # x_mask arrives (B, 1, 1, N) True=masked
            att = jnp.where(x_mask[:, 0, 0, :, None], -1e9, att)

        if att_pdrop > 0 and not deterministic:
            # mask off top-K attentive scores with prob att_pdrop per token
            bsz, ntoken, ng = att.shape
            k = min(att_drop_topk, ntoken)
            _, ind = jax.lax.top_k(att.transpose(0, 2, 1), k)  # (B, G, k)
            topk_mask = jnp.zeros((bsz, ng, ntoken), bool)
            b_idx = jnp.arange(bsz)[:, None, None]
            g_idx = jnp.arange(ng)[None, :, None]
            topk_mask = topk_mask.at[b_idx, g_idx, ind].set(True)
            rng = self.make_rng("dropout")
            keep_n = int(ntoken * (1 - att_pdrop))
            rand = jax.random.uniform(rng, (ntoken,))
            _, drop_cols = jax.lax.top_k(rand, keep_n)
            topk_mask = topk_mask.at[:, :, drop_cols].set(False)
            att = jnp.where(topk_mask.transpose(0, 2, 1), -jnp.inf, att)

        att = jax.nn.softmax(att.astype(jnp.promote_types(att.dtype, jnp.float32)), axis=1).astype(x.dtype)
        glimpses = [jnp.sum(att[:, :, i : i + 1] * x, axis=1) for i in range(self.flat_glimpses)]
        x_atted = jnp.concatenate(glimpses, axis=1)
        return nn.Dense(self.flat_out_size, kernel_init=normal_init, dtype=self.dtype, name="linear_merge")(x_atted)


class MCAN_E(nn.Module):
    hidden_size: int
    num_heads: int = 8
    num_layers: int = 6
    pdrop: float = 0.1
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, x_mask, *, deterministic: bool):
        for i in range(self.num_layers):
            x = SA(self.hidden_size, self.num_heads, self.pdrop, dtype=self.dtype, name=f"enc_{i}")(
                x, x_mask, deterministic=deterministic
            )
        return x


class MCAN_ED(nn.Module):
    hidden_size: int
    num_heads: int = 8
    num_layers: int = 6
    pdrop: float = 0.1
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, y, x_mask, y_mask, *, deterministic: bool):
        for i in range(self.num_layers):
            x = SA(self.hidden_size, self.num_heads, self.pdrop, dtype=self.dtype, name=f"enc_{i}")(
                x, x_mask, deterministic=deterministic
            )
        for i in range(self.num_layers):
            y = SGA(self.hidden_size, self.num_heads, self.pdrop, dtype=self.dtype, name=f"dec_{i}")(
                y, x, y_mask, x_mask, deterministic=deterministic
            )
        return x, y
