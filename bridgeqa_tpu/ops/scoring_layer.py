"""Fused whole-decoder-layer Pallas kernel for answer-scoring inference.

The rank-answer hot loop (reference ``models/blip_vqa_3d.py:509-566``) runs a
12-layer BERT decoder over ``B * k_test`` short answer sequences (12 tokens)
per question. Measured on-chip, the XLA formulation spends ~24 ms/layer
against a ~15 ms component sum — the gap is inter-op scheduling glue and
activation round-trips that no amount of per-op tuning recovers (fused QKV,
stock flash attention and a fused cross-attention kernel all measured
*slower* individually). This kernel runs the ENTIRE layer — self-attention,
grouped cross-attention to the per-question states, and the FFN — in one
``pallas_call`` with all layer weights resident in VMEM, so each layer costs
exactly one HBM round-trip of the activations.

Design notes (TPU-first, not a translation of the reference):

- One grid step processes ``G`` whole answer sequences of ONE question
  (``R = G * La`` rows).  Weights use constant index maps, so Mosaic fetches
  them once and keeps them in VMEM across the grid.
- Self-attention over the tiny 12-token sequences is computed as a full
  ``(R, R)`` per-head GEMM with a *static block-diagonal causal mask*
  (rows/cols of different sequences are masked).  The extra score FLOPs are
  ~1 ms/layer at peak but keep the MXU in ``(R, hd) @ (hd, R)`` shapes
  instead of 12x64 slivers.  The answer padding mask is deliberately
  dropped: answers are right-padded, so for every *valid* row the causal
  mask alone already restricts attention to valid tokens, and padded rows'
  outputs are discarded by the -100 label mask downstream (see
  ``tests/test_scoring_fused.py`` for the equivalence check).
- Cross-attention K/V are pre-projected per question OUTSIDE the kernel
  (they are shared by all ``k_test`` answers of that question — the same
  dedup the module path's grouped branch does) and DMA'd per grid row.
- Softmax and LayerNorm statistics run in f32; GEMMs accumulate in f32 and
  store bf16, matching the module path's numerics policy.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from bridgeqa_tpu.ops.vma import out_struct

NEG = -1e9


def _erf(x):
    """Abramowitz–Stegun 7.1.26 rational erf (|err| <= 1.5e-7, i.e. exact at
    f32): Mosaic has no erf/erfc lowering, and the tanh-gelu approximation
    would drift the scoring numerics vs the module path."""
    a1, a2, a3 = 0.254829592, -0.284496736, 1.421413741
    a4, a5, p = -1.453152027, 1.061405429, 0.3275911
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu_exact(x):
    """gelu(approximate=False) on f32 values inside the kernel."""
    return 0.5 * x * (1.0 + _erf(x * 0.7071067811865475))


def _layer_kernel(x_ref, wqkv_ref, bqkv_ref, wo_ref, bo_ref, ln1s_ref, ln1b_ref,
                  wcq_ref, bcq_ref, wco_ref, bco_ref, ln2s_ref, ln2b_ref,
                  wi_ref, bi_ref, wo2_ref, bo2_ref, ln3s_ref, ln3b_ref,
                  ck_ref, cv_ref, cbias_ref, out_ref,
                  *, la: int, heads: int, eps: float):
    x = x_ref[...]                      # (R, H)
    dt = x.dtype
    r, h = x.shape
    hd = h // heads
    scale = 1.0 / float(hd) ** 0.5

    def ln(y, s_ref, b_ref):
        yf = y.astype(jnp.float32)
        mu = jnp.mean(yf, axis=-1, keepdims=True)
        var = jnp.mean(yf * yf, axis=-1, keepdims=True) - mu * mu
        normed = (yf - mu) * lax.rsqrt(var + eps)
        return (normed * s_ref[...] + b_ref[...]).astype(dt)

    def attend(s, vh):
        """softmax(s) @ vh with the normalization DEFERRED past the context
        matmul: dividing the (R, head_dim) context by the row sums costs
        3-4x fewer VPU divides than dividing the (R, Lk) probabilities
        (exp(s - max) is already in [0, 1], so the bf16 cast loses nothing
        the normalized form wouldn't)."""
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        denom = jnp.sum(e, axis=-1, keepdims=True)
        ctx_h = jnp.dot(e.astype(dt), vh, preferred_element_type=jnp.float32)
        return (ctx_h / denom).astype(dt)

    # ---- self-attention: per-head (R, R) GEMM + static block-causal mask
    qkv = (jnp.dot(x, wqkv_ref[...], preferred_element_type=jnp.float32)
           + bqkv_ref[...]).astype(dt)   # (R, 3H)
    row = lax.broadcasted_iota(jnp.int32, (r, r), 0)
    col = lax.broadcasted_iota(jnp.int32, (r, r), 1)
    mask_bias = jnp.where((row // la == col // la) & (col <= row), 0.0, NEG)

    ctx = []
    for i in range(heads):
        qh = qkv[:, i * hd:(i + 1) * hd]
        kh = qkv[:, h + i * hd:h + (i + 1) * hd]
        vh = qkv[:, 2 * h + i * hd:2 * h + (i + 1) * hd]
        s = lax.dot_general(qh, kh, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
        ctx.append(attend(s * scale + mask_bias, vh))
    ctx = jnp.concatenate(ctx, axis=-1)
    attn = (jnp.dot(ctx, wo_ref[...], preferred_element_type=jnp.float32)
            + bo_ref[...]).astype(dt)
    x1 = ln(attn + x, ln1s_ref, ln1b_ref)

    # ---- grouped cross-attention to this question's pre-projected K/V
    qc = (jnp.dot(x1, wcq_ref[...], preferred_element_type=jnp.float32)
          + bcq_ref[...]).astype(dt)
    ck = ck_ref[0]                      # (Lk, H)
    cv = cv_ref[0]
    cb = cbias_ref[0]                   # (1, Lk) additive f32
    cctx = []
    for i in range(heads):
        qh = qc[:, i * hd:(i + 1) * hd]
        kh = ck[:, i * hd:(i + 1) * hd]
        vh = cv[:, i * hd:(i + 1) * hd]
        s = lax.dot_general(qh, kh, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
        cctx.append(attend(s * scale + cb, vh))
    cctx = jnp.concatenate(cctx, axis=-1)
    cattn = (jnp.dot(cctx, wco_ref[...], preferred_element_type=jnp.float32)
             + bco_ref[...]).astype(dt)
    x2 = ln(cattn + x1, ln2s_ref, ln2b_ref)

    # ---- FFN
    inter = _gelu_exact(
        jnp.dot(x2, wi_ref[...], preferred_element_type=jnp.float32) + bi_ref[...]
    ).astype(dt)
    y = (jnp.dot(inter, wo2_ref[...], preferred_element_type=jnp.float32)
         + bo2_ref[...]).astype(dt)
    out_ref[...] = ln(y + x2, ln3s_ref, ln3b_ref)


# Rows per kernel block (tunable): bounds the (R, R) per-head score matrix,
# whose masked-GEMM waste + softmax width grow quadratically in R. Sweep on
# v5e at the production shapes (B*k=8192, La=12, 12 layers): 1536 rows
# 212 ms, 768 -> 177, 384 -> 150, 192 -> 141, 96 -> 143 ms/body — 192 wins.
ROW_CAP = 192


def _pick_group(g: int, la: int, dtype) -> int:
    """Largest G dividing g with G*la sublane-aligned and <= ROW_CAP rows."""
    align = 16 if dtype == jnp.bfloat16 else 8
    for cand in range(min(g, max(1, ROW_CAP // la)), 0, -1):
        if g % cand == 0 and (cand * la) % align == 0:
            return cand
    return 0


@functools.partial(
    jax.jit,
    static_argnames=("la", "group", "heads", "eps", "interpret"),
)
def scoring_layer(x, wqkv, bqkv, wo, bo, ln1s, ln1b, wcq, bcq, wco, bco,
                  ln2s, ln2b, wi, bi, wo2, bo2, ln3s, ln3b,
                  ck, cv, cbias, *, la: int, group: int, heads: int,
                  eps: float, interpret: bool = False):
    """One fused decoder layer over grouped answer sequences.

    x: (S*la, H) rows, sequence-major; sequence s belongs to question
    ``s // (S/Q)``. ck/cv: (Q, Lk, H) pre-projected cross K/V (bias folded
    in). cbias: (Q, Lk) additive f32 question-padding bias. Returns (S*la, H).
    """
    rows, h = x.shape
    q = ck.shape[0]
    lk = ck.shape[1]
    r_blk = group * la
    n_blk = rows // r_blk
    cb_per_q = n_blk // q

    def w(shape_arr):
        return pl.BlockSpec(shape_arr.shape, lambda i, j: (0,) * shape_arr.ndim,
                            memory_space=pltpu.VMEM)

    grid = (q, cb_per_q)
    kernel = functools.partial(_layer_kernel, la=la, heads=heads, eps=eps)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((r_blk, h), lambda i, j, cb=cb_per_q: (i * cb + j, 0),
                         memory_space=pltpu.VMEM),
            w(wqkv), w(bqkv), w(wo), w(bo), w(ln1s), w(ln1b),
            w(wcq), w(bcq), w(wco), w(bco), w(ln2s), w(ln2b),
            w(wi), w(bi), w(wo2), w(bo2), w(ln3s), w(ln3b),
            pl.BlockSpec((1, lk, h), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lk, h), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            # (Q, 1, Lk) so the trailing block dims satisfy Mosaic's
            # (8, 128)-divisible-or-full rule ((1, Lk) = full dims here)
            pl.BlockSpec((1, 1, lk), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((r_blk, h), lambda i, j, cb=cb_per_q: (i * cb + j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=out_struct((rows, h), x.dtype, x, ck, cbias),
        # weights (~16.5 MB bf16) + activation/score buffers exceed the
        # 16 MB default scoped-vmem policy limit; the chip holds >=48 MB
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=48 * 1024 * 1024),
        interpret=interpret,
    )(x, wqkv, bqkv, wo, bo, ln1s, ln1b, wcq, bcq, wco, bco, ln2s, ln2b,
      wi, bi, wo2, bo2, ln3s, ln3b, ck, cv, cbias[:, None, :])


def _dense_p(p):
    return p["kernel"], p["bias"]


def _ffn_ln(layer_params, layernorm_idx: int):
    if layernorm_idx == 0:
        return layer_params["output_LayerNorm"]
    return layer_params[f"output_LayerNorms_{layernorm_idx - 1}"]


def fused_scoring_capable(config, batch: int, enc_batch: int, la: int,
                          hidden: int, dtype=jnp.bfloat16) -> bool:
    """Shape/feature gate for the fused scoring decoder body."""
    if enc_batch <= 0 or batch % enc_batch != 0:
        return False
    g = batch // enc_batch
    if g < 2:
        return False
    if hidden % 128 != 0 or hidden % config.num_attention_heads != 0:
        return False
    if (hidden // config.num_attention_heads) % 8 != 0:
        return False
    return _pick_group(g, la, dtype) > 0


def scoring_decoder_body(enc_params, emb, question_states, question_mask,
                         *, config, dtype, interpret: bool = False,
                         layernorm_idx: int = 0):
    """Run the full decoder stack (all layers) through the fused kernel.

    enc_params: the BertEncoder param tree ({'layer_0': {...}, ...}).
    emb: (S, La, H) embedded answer tokens, S = Q * k grouped by question.
    question_states: (Q, Lq, H); question_mask: (Q, Lq) 1/0.
    layernorm_idx: which FFN-output LayerNorm to use (BertOutputParallel,
    parallelshare mode): 0 = ``output_LayerNorm``, i>=1 =
    ``output_LayerNorms_{i-1}``.

    Returns (S, La, H) final hidden states (padded answer rows carry
    causal-only values — identical on all rows whose loss is unmasked).
    """
    s, la, h = emb.shape
    qn, lq, _ = question_states.shape
    g = s // qn
    heads = config.num_attention_heads
    eps = config.layer_norm_eps
    dt = emb.dtype if dtype is None else dtype

    group = _pick_group(g, la, dt)
    assert group > 0, "caller must check fused_scoring_capable first"

    lk_pad = (-lq) % 128
    qs = question_states.astype(dt)
    cbias = jnp.where(question_mask > 0, 0.0, NEG).astype(jnp.float32)
    if lk_pad:
        qs = jnp.pad(qs, ((0, 0), (0, lk_pad), (0, 0)))
        cbias = jnp.pad(cbias, ((0, 0), (0, lk_pad)), constant_values=NEG)

    x = emb.astype(dt).reshape(s * la, h)
    num_layers = config.num_hidden_layers
    for i in range(num_layers):
        lp = enc_params[f"layer_{i}"]
        a = lp["attention"]["self"]
        ao = lp["attention"]["output"]
        ca = lp["crossattention"]["self"]
        cao = lp["crossattention"]["output"]

        kq, bq = _dense_p(a["query"])
        kk, bk = _dense_p(a["key"])
        kv, bv = _dense_p(a["value"])
        wqkv = jnp.concatenate([kq, kk, kv], axis=1).astype(dt)
        bqkv = jnp.concatenate([bq, bk, bv])[None, :].astype(jnp.float32)
        wo, bo = _dense_p(ao["dense"])
        wcq, bcq = _dense_p(ca["query"])
        wck, bck = _dense_p(ca["key"])
        wcv, bcv = _dense_p(ca["value"])
        wco, bco = _dense_p(cao["dense"])
        wi, bi = _dense_p(lp["intermediate_dense"])
        wo2, bo2 = _dense_p(lp["output_dense"])

        # cross K/V once per question per layer (shared across its k answers)
        ck = (jnp.dot(qs, wck.astype(dt)) + bck.astype(dt)).astype(dt)
        cv = (jnp.dot(qs, wcv.astype(dt)) + bcv.astype(dt)).astype(dt)

        x = scoring_layer(
            x,
            wqkv, bqkv,
            wo.astype(dt), bo[None, :].astype(jnp.float32),
            ao["LayerNorm"]["scale"][None, :].astype(jnp.float32),
            ao["LayerNorm"]["bias"][None, :].astype(jnp.float32),
            wcq.astype(dt), bcq[None, :].astype(jnp.float32),
            wco.astype(dt), bco[None, :].astype(jnp.float32),
            cao["LayerNorm"]["scale"][None, :].astype(jnp.float32),
            cao["LayerNorm"]["bias"][None, :].astype(jnp.float32),
            wi.astype(dt), bi[None, :].astype(jnp.float32),
            wo2.astype(dt), bo2[None, :].astype(jnp.float32),
            _ffn_ln(lp, layernorm_idx)["scale"][None, :].astype(jnp.float32),
            _ffn_ln(lp, layernorm_idx)["bias"][None, :].astype(jnp.float32),
            ck, cv, cbias,
            la=la, group=group, heads=heads, eps=eps, interpret=interpret,
        )
    return x.reshape(s, la, h)
