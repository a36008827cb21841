"""Streaming label-smoothed LM vocab loss (flash-logsumexp over vocab tiles).

The answer-scoring head projects ``B*k_test*(La-1)`` ~ 90k token rows onto a
30.5k-word vocabulary and reduces the logits straight into a label-smoothed
CE (reference ``med.py:1424-1432``). The chunked XLA formulation still
materializes each chunk's f32 logits (~0.7 GB per chunk) in HBM before the
reductions — ~half the measured 53 ms head cost is that round-trip.

This kernel never materializes logits: it streams vocab tiles of the
(tied) embedding table through VMEM, maintaining per-row online
``(running_max, sum_exp, sum_logits, target_logit)`` carries — the same
rescaling trick as flash attention, applied to logsumexp — and emits the
three per-row reductions the loss needs. Accumulation is f32 throughout
(the XLA path truncates the matmul to bf16 before the bias add; this kernel
is strictly more precise).

Loss combine (outside, O(rows)):
    nll    = lse - logit_target
    smooth = lse - sum_logits / V
    loss   = (1-eps) * nll + eps * smooth     [masked where label == -100]
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from bridgeqa_tpu.ops.vma import out_struct

NEG = -1e30


def _kernel(h_ref, table_ref, bias_ref, labels_ref,
            lse_ref, sumlog_ref, tgt_ref,
            m_sc, s_sc, sum_sc, tgt_sc, *, vocab: int, vb: int):
    j = pl.program_id(1)
    nv = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        m_sc[...] = jnp.full_like(m_sc, NEG)
        s_sc[...] = jnp.zeros_like(s_sc)
        sum_sc[...] = jnp.zeros_like(sum_sc)
        tgt_sc[...] = jnp.zeros_like(tgt_sc)

    # (R, VB) logits tile, f32 accumulation, never leaves VMEM
    logits = lax.dot_general(
        h_ref[...], table_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bias_ref[...]

    col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1) + j * vb
    valid = col < vocab
    masked = jnp.where(valid, logits, NEG)

    m_old = m_sc[...]
    m_new = jnp.maximum(m_old, jnp.max(masked, axis=1, keepdims=True))
    rescale = jnp.exp(m_old - m_new)
    s_sc[...] = s_sc[...] * rescale + jnp.sum(
        jnp.exp(masked - m_new), axis=1, keepdims=True)
    m_sc[...] = m_new
    sum_sc[...] = sum_sc[...] + jnp.sum(jnp.where(valid, logits, 0.0), axis=1,
                                        keepdims=True)
    hit = col == labels_ref[...]
    tgt_sc[...] = tgt_sc[...] + jnp.sum(jnp.where(hit, logits, 0.0), axis=1,
                                        keepdims=True)

    @pl.when(j == nv - 1)
    def _():
        lse_ref[...] = m_sc[...] + jnp.log(s_sc[...])
        sumlog_ref[...] = sum_sc[...]
        tgt_ref[...] = tgt_sc[...]


@functools.partial(jax.jit, static_argnames=("interpret",))
def lm_vocab_reductions(h, table, bias, labels, *, interpret: bool = False):
    """Per-row (lse, sum_logits, target_logit) of ``h @ table.T + bias``.

    h: (R, H) transformed hidden states; table: (V, H) tied embedding;
    bias: (V,) f32; labels: (R,) int32 (invalid rows may carry any value in
    [0, V)). Returns three (R,) f32 arrays.
    """
    r, hdim = h.shape
    v = table.shape[0]

    # on-chip sweep at the production shapes (90k rows x 30.5k vocab):
    # (2048,1024) 27.5 ms, (4096,1024) 27.3, (4096,512) 32.5,
    # (2048,2048) 25.5 <- best, (1024,4096) 27.8
    r_blk = 2048
    vb = 2048
    r_pad = (-r) % r_blk
    v_pad = (-v) % vb
    if r_pad:
        h = jnp.pad(h, ((0, r_pad), (0, 0)))
        labels = jnp.pad(labels, (0, r_pad))
    if v_pad:
        table = jnp.pad(table, ((0, v_pad), (0, 0)))
        bias = jnp.pad(bias, (0, v_pad))
    rp = h.shape[0]
    vp = table.shape[0]
    grid = (rp // r_blk, vp // vb)

    kernel = functools.partial(_kernel, vocab=v, vb=vb)
    out_spec = pl.BlockSpec((r_blk, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM)
    lse, sumlog, tgt = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((r_blk, hdim), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((vb, hdim), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, vb), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((r_blk, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[out_spec, out_spec, out_spec],
        out_shape=[out_struct((rp, 1), jnp.float32, h, labels, table)] * 3,
        scratch_shapes=[pltpu.VMEM((r_blk, 1), jnp.float32)] * 4,
        # ~29 MB live (double-buffered h/table tiles + the f32 logits tile);
        # the 16 MB default scoped-vmem limit is compiler policy, not the
        # hardware cap (v5e VMEM comfortably fits this, probed to >=48 MB)
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=48 * 1024 * 1024),
        interpret=interpret,
    )(h, table, bias[None, :].astype(jnp.float32), labels[:, None].astype(jnp.int32))
    return lse[:r, 0], sumlog[:r, 0], tgt[:r, 0]


def label_smoothed_loss_streaming(h_shifted, labels_shifted, table, bias,
                                  epsilon: float = 0.1, *,
                                  interpret: bool = False):
    """Label-smoothed summed-per-sequence LM loss via the streaming kernel.

    h_shifted: (B, L-1, H) transformed hidden states (positions 0..L-2);
    labels_shifted: (B, L-1) target ids with -100 = ignore. Returns (B,).
    """
    b, lm1, hdim = h_shifted.shape
    v = table.shape[0]
    flat_h = h_shifted.reshape(b * lm1, hdim)
    flat_lab = labels_shifted.reshape(b * lm1)
    valid = flat_lab != -100
    safe = jnp.where(valid, flat_lab, 0)
    lse, sumlog, tgt = lm_vocab_reductions(flat_h, table, bias, safe,
                                           interpret=interpret)
    nll = lse - tgt
    smooth = lse - sumlog / v
    per_token = (1.0 - epsilon) * nll + epsilon * smooth
    per_token = jnp.where(valid, per_token, 0.0)
    return jnp.sum(per_token.reshape(b, lm1), axis=-1)
