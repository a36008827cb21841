"""Vision Transformer (ViT-B/16, BLIP flavor).

Equivalent of ``models/vit.py:113-196`` (timm-style pre-LN ViT): Conv patch
embed, prepended CLS token, learned absolute pos-embed, ``depth`` pre-LN
blocks with stochastic depth, final LayerNorm. 480x480 input -> 901 tokens.

Module/parameter names mirror the torch model (``patch_embed.proj``,
``blocks.N.attn.qkv`` ...) so the BLIP checkpoint converter is a mechanical
path mapping. ``interpolate_pos_embed`` (``vit.py:283-307``) lives in
``bridgeqa_tpu.utils.checkpoint`` as a host-side numpy helper.
"""

from functools import partial

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.ad_checkpoint import checkpoint_name

trunc_normal_init = nn.initializers.truncated_normal(stddev=0.02)


class DropPath(nn.Module):
    """Per-sample stochastic depth (timm ``DropPath``)."""

    rate: float = 0.0

    @nn.compact
    def __call__(self, x, *, deterministic: bool):
        if self.rate == 0.0 or deterministic:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, 0.0)


class Mlp(nn.Module):
    hidden_features: int
    out_features: int
    drop: float = 0.0
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, *, deterministic: bool):
        x = nn.Dense(self.hidden_features, kernel_init=trunc_normal_init, dtype=self.dtype, name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dropout(self.drop)(x, deterministic=deterministic)
        x = nn.Dense(self.out_features, kernel_init=trunc_normal_init, dtype=self.dtype, name="fc2")(x)
        x = nn.Dropout(self.drop)(x, deterministic=deterministic)
        return x


class Attention(nn.Module):
    dim: int
    num_heads: int = 8
    qkv_bias: bool = True
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, *, deterministic: bool):
        b, n, c = x.shape
        head_dim = self.dim // self.num_heads
        scale = head_dim**-0.5

        qkv = nn.Dense(self.dim * 3, use_bias=self.qkv_bias, kernel_init=trunc_normal_init,
                       dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(b, n, 3, self.num_heads, head_dim).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]  # (B, H, N, D)

        attn = jnp.einsum("bhnd,bhmd->bhnm", q * scale, k)
        attn = checkpoint_name(attn, "vit_attn_scores")
        # f32 softmax regardless of compute dtype (torch AMP semantics);
        # every attention-shaped intermediate (f32 probs, cast, dropout
        # output) is checkpoint-named so the "attn" remat policy actually
        # recomputes all of them instead of silently saving one
        attn = checkpoint_name(jax.nn.softmax(attn.astype(jnp.promote_types(attn.dtype, jnp.float32)), axis=-1),
                               "vit_attn_probs32").astype(q.dtype)
        attn = checkpoint_name(attn, "vit_attn_probs")
        attn = checkpoint_name(nn.Dropout(self.attn_drop)(attn, deterministic=deterministic),
                               "vit_attn_probs_d")

        x = jnp.einsum("bhnm,bhmd->bhnd", attn, v).transpose(0, 2, 1, 3).reshape(b, n, c)
        x = nn.Dense(self.dim, kernel_init=trunc_normal_init, dtype=self.dtype, name="proj")(x)
        x = nn.Dropout(self.proj_drop)(x, deterministic=deterministic)
        return x


class Block(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path: float = 0.0
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")(x)
        y = Attention(self.dim, self.num_heads, self.qkv_bias, self.attn_drop, self.drop,
                      dtype=self.dtype, name="attn")(y, deterministic=deterministic)
        x = x + DropPath(self.drop_path, name="drop_path1")(y, deterministic=deterministic)

        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")(x)
        y = Mlp(int(self.dim * self.mlp_ratio), self.dim, self.drop, dtype=self.dtype, name="mlp")(
            y, deterministic=deterministic
        )
        x = x + DropPath(self.drop_path, name="drop_path2")(y, deterministic=deterministic)
        return x


class VisionTransformer(nn.Module):
    img_size: int = 480
    patch_size: int = 16
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    remat: bool = False  # rematerialize block activations (training memory)
    # "block": recompute the whole block in the backward. The reference wraps
    #          attn and mlp EACH in a fairscale checkpoint_wrapper (reference
    #          vit.py:103-105), i.e. sub-block granularity; "block" is the
    #          coarser whole-layer equivalent (functionally similar, saves
    #          strictly more memory per recompute unit).
    # "attn": save everything except the (B, H, N, N) attention scores/probs
    #         and recompute just those (~5% recompute vs "block"'s ~33%) —
    #         cheaper recompute but saves ~6x more activation memory per
    #         block: chip-measured OOM at the reference train batch 16 on a
    #         16G v5e, so opt-in for smaller batches only.
    remat_mode: str = "block"
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        """x: (B, H, W, 3) channel-last image. Returns (B, 1+N, embed_dim)."""
        b = x.shape[0]
        num_patches = (self.img_size // self.patch_size) ** 2

        x = nn.Conv(
            self.embed_dim,
            kernel_size=(self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size),
            padding="VALID",
            dtype=self.dtype,
            name="patch_embed_proj",
        )(x)
        x = x.reshape(b, -1, self.embed_dim)

        cls_token = self.param("cls_token", trunc_normal_init, (1, 1, self.embed_dim), jnp.float32)
        pos_embed = self.param("pos_embed", trunc_normal_init, (1, num_patches + 1, self.embed_dim), jnp.float32)

        x = jnp.concatenate([jnp.broadcast_to(cls_token, (b, 1, self.embed_dim)).astype(x.dtype), x], axis=1)
        x = x + pos_embed[:, : x.shape[1], :].astype(x.dtype)
        x = nn.Dropout(self.drop_rate)(x, deterministic=deterministic)

        if self._use_fused_blocks(deterministic):
            from bridgeqa_tpu.ops import vit_block as vb

            x = vb.fused_vit_blocks(
                self.variables["params"], x, depth=self.depth, heads=self.num_heads,
                interpret=jax.default_backend() != "tpu",
            )
            return nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(x)

        # per-layer stochastic-depth rates (python-static, safe under jit)
        dpr = [self.drop_path_rate * i / max(self.depth - 1, 1) for i in range(self.depth)]
        # jax.checkpoint per block trades recompute for activation memory
        # (reference used fairscale checkpoint_wrapper, vit.py:103-105)
        if self.remat and self.remat_mode == "attn":
            policy = jax.checkpoint_policies.save_anything_except_these_names(
                "vit_attn_scores", "vit_attn_probs32", "vit_attn_probs",
                "vit_attn_probs_d")
            block_cls = nn.remat(Block, static_argnums=(2,), policy=policy)
        elif self.remat:
            block_cls = nn.remat(Block, static_argnums=(2,))
        else:
            block_cls = Block
        for i in range(self.depth):
            x = block_cls(
                self.embed_dim, self.num_heads, self.mlp_ratio, self.qkv_bias,
                self.drop_rate, self.attn_drop_rate, dpr[i], dtype=self.dtype, name=f"blocks_{i}",
            )(x, deterministic)

        return nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(x)

    def _use_fused_blocks(self, deterministic: bool) -> bool:
        """Gate for the fused Pallas block path (inference only; the module
        loop stays the training/init path)."""
        from bridgeqa_tpu.ops import vit_block as vb

        if not deterministic or self.is_initializing():
            return False
        if vb.FUSED_MODE == "off" or not vb.fused_vit_capable(self.embed_dim, self.num_heads):
            return False
        if jax.default_backend() == "tpu":
            return True
        return vb.FUSED_MODE == "force"


def create_vit(vit: str, image_size: int, drop_path_rate: float = 0.0, dtype=None,
               custom_embed_dim: int = 256, custom_depth: int = 2, custom_heads: int = 4,
               remat: bool = False, remat_mode: str = "block"):
    """``create_vit`` (``models/blip.py:334-363``): base=768/12, large=1024/24.
    ``vit='custom'`` builds an arbitrary-size ViT (tests / ablations)."""
    if vit == "custom":
        model = VisionTransformer(img_size=image_size, patch_size=16, embed_dim=custom_embed_dim,
                                  depth=custom_depth, num_heads=custom_heads,
                                  drop_path_rate=drop_path_rate, remat=remat,
                                  remat_mode=remat_mode, dtype=dtype)
        return model, custom_embed_dim
    if vit == "base":
        model = VisionTransformer(img_size=image_size, patch_size=16, embed_dim=768, depth=12,
                                  num_heads=12, drop_path_rate=drop_path_rate, remat=remat,
                                  remat_mode=remat_mode, dtype=dtype)
        width = 768
    elif vit == "large":
        model = VisionTransformer(img_size=image_size, patch_size=16, embed_dim=1024, depth=24,
                                  num_heads=16, drop_path_rate=drop_path_rate, remat=remat,
                                  remat_mode=remat_mode, dtype=dtype)
        width = 1024
    else:
        raise ValueError(f"unknown vit size {vit}")
    return model, width
