"""Fused ViT encoder block (pre-LN) Pallas kernel for inference.

The ViT-B/480 encode (batch 32, 901 tokens) measured ~100 ms at ~30% MFU
under XLA — per-op glue and the (B, 12, 901, 901) f32 attention-probs
round-trips dominate. Like ``ops/scoring_layer.py``, this runs the ENTIRE
block — LN1 -> QKV -> per-head attention -> proj -> residual -> LN2 -> MLP
-> residual — in one ``pallas_call`` per layer with the block's weights
resident in VMEM and one grid step per image, so each layer costs one HBM
round-trip of the (B, 901, 768) activations.

Token padding: 901 rows pad to a 16-aligned count; padded KEYS are masked
with -1e9 in the scores (so softmax ignores them), padded QUERY rows
compute garbage that the caller slices off. LN statistics and softmax run
in f32; GEMMs accumulate f32 and store bf16 (the module path's policy).

Inference-only (no dropout / stochastic depth); the module path remains the
training path. Reference: ``models/vit.py:113-196`` (timm Block).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bridgeqa_tpu.ops.scoring_layer import _gelu_exact
from bridgeqa_tpu.ops.vma import out_struct

NEG = -1e9

# test hook: "auto" = TPU only, "force" = interpret off-TPU, "off"
FUSED_MODE = "auto"


def _block_kernel(x_ref, wqkv_ref, bqkv_ref, wo_ref, bo_ref, ln1s_ref, ln1b_ref,
                  wi_ref, bi_ref, wo2_ref, bo2_ref, ln2s_ref, ln2b_ref, out_ref,
                  *, heads: int, eps: float, valid: int):
    x = x_ref[0]                        # (NP, H)
    dt = x.dtype
    npd, h = x.shape
    hd = h // heads
    scale = 1.0 / float(hd) ** 0.5

    def ln(y, s_ref, b_ref):
        yf = y.astype(jnp.float32)
        mu = jnp.mean(yf, axis=-1, keepdims=True)
        var = jnp.mean(yf * yf, axis=-1, keepdims=True) - mu * mu
        normed = (yf - mu) * lax.rsqrt(var + eps)
        return (normed * s_ref[...] + b_ref[...]).astype(dt)

    y = ln(x, ln1s_ref, ln1b_ref)
    qkv = (jnp.dot(y, wqkv_ref[...], preferred_element_type=jnp.float32)
           + bqkv_ref[...]).astype(dt)

    col = lax.broadcasted_iota(jnp.int32, (npd, npd), 1)
    key_mask = jnp.where(col < valid, 0.0, NEG)

    ctx = []
    for i in range(heads):
        qh = qkv[:, i * hd:(i + 1) * hd]
        kh = qkv[:, h + i * hd:h + (i + 1) * hd]
        vh = qkv[:, 2 * h + i * hd:2 * h + (i + 1) * hd]
        s = lax.dot_general(qh, kh, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale + key_mask
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        # NOTE: deferring the normalization past the context matmul (the
        # scoring_layer.attend trick) was tried here and REVERTED: the extra
        # per-head live buffers push Mosaic's scoped-vmem request past every
        # limit tried (48.8M @ 48M cap, 59M @ 56M — the scheduler expands to
        # fill whatever it is given) and the kernel no longer compiles.
        p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(dt)
        ctx.append(jnp.dot(p, vh, preferred_element_type=jnp.float32).astype(dt))
    ctx = jnp.concatenate(ctx, axis=-1)
    attn = (jnp.dot(ctx, wo_ref[...], preferred_element_type=jnp.float32)
            + bo_ref[...]).astype(dt)
    x1 = x + attn

    y2 = ln(x1, ln2s_ref, ln2b_ref)
    inter = _gelu_exact(
        jnp.dot(y2, wi_ref[...], preferred_element_type=jnp.float32) + bi_ref[...]
    ).astype(dt)
    mlp = (jnp.dot(inter, wo2_ref[...], preferred_element_type=jnp.float32)
           + bo2_ref[...]).astype(dt)
    out_ref[0] = x1 + mlp


@functools.partial(jax.jit, static_argnames=("heads", "eps", "valid", "interpret"))
def vit_block(x, wqkv, bqkv, wo, bo, ln1s, ln1b, wi, bi, wo2, bo2, ln2s, ln2b,
              *, heads: int, eps: float, valid: int, interpret: bool = False):
    """One fused pre-LN transformer block. x: (B, NP, H) padded tokens."""
    b, npd, h = x.shape

    def w(arr):
        return pl.BlockSpec(arr.shape, lambda i: (0,) * arr.ndim,
                            memory_space=pltpu.VMEM)

    kernel = functools.partial(_block_kernel, heads=heads, eps=eps, valid=valid)
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, npd, h), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            w(wqkv), w(bqkv), w(wo), w(bo), w(ln1s), w(ln1b),
            w(wi), w(bi), w(wo2), w(bo2), w(ln2s), w(ln2b),
        ],
        out_specs=pl.BlockSpec((1, npd, h), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=out_struct((b, npd, h), x.dtype, x),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=48 * 1024 * 1024),
        interpret=interpret,
    )(x, wqkv, bqkv, wo, bo, ln1s, ln1b, wi, bi, wo2, bo2, ln2s, ln2b)


def fused_vit_capable(embed_dim: int, num_heads: int) -> bool:
    return (embed_dim % 128 == 0 and embed_dim % num_heads == 0
            and (embed_dim // num_heads) % 8 == 0)


def fused_vit_blocks(block_params, x, *, depth: int, heads: int,
                     eps: float = 1e-6, interpret: bool = False):
    """Run ``depth`` fused blocks. block_params: {'blocks_0': {...}, ...}
    (the VisionTransformer param subtree). x: (B, N, H) tokens (unpadded).
    Returns (B, N, H)."""
    b, n, h = x.shape
    dt = x.dtype
    pad = (-n) % 16
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))

    def f32row(a):
        return a[None, :].astype(jnp.float32)

    for i in range(depth):
        p = block_params[f"blocks_{i}"]
        a = p["attn"]
        x = vit_block(
            x,
            a["qkv"]["kernel"].astype(dt), f32row(a["qkv"]["bias"]),
            a["proj"]["kernel"].astype(dt), f32row(a["proj"]["bias"]),
            f32row(p["norm1"]["scale"]), f32row(p["norm1"]["bias"]),
            p["mlp"]["fc1"]["kernel"].astype(dt), f32row(p["mlp"]["fc1"]["bias"]),
            p["mlp"]["fc2"]["kernel"].astype(dt), f32row(p["mlp"]["fc2"]["bias"]),
            f32row(p["norm2"]["scale"]), f32row(p["norm2"]["bias"]),
            heads=heads, eps=eps, valid=n, interpret=interpret,
        )
    return x[:, :n, :] if pad else x
