"""Pallas row-gather: the workhorse behind gather/group/interpolate ops.

XLA's TPU gather lowers batched row lookups to a per-index dynamic-slice
loop (~1.7 us/row measured — seconds for SA-layer shapes). This kernel
keeps the (N, C) table resident in VMEM and streams output rows with
unrolled dynamic sublane loads, which is ~two orders of magnitude faster.

Used by ``gather_points`` / ``group_points`` / ``three_interpolate`` on
TPU; CPU keeps ``jnp.take_along_axis`` (fast there, and the parity
baseline).
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from bridgeqa_tpu.ops.vma import out_struct

_ROWS_PER_STEP = 8  # unrolled dynamic loads per loop iteration
_OUT_BLOCK = 2048   # output rows per grid step

# table VMEM budget: N*C*4 bytes; above this fall back to XLA gather
_VMEM_TABLE_LIMIT = 12 * 1024 * 1024


def _gather_kernel(idx_ref, table_ref, out_ref):
    """idx (1, R) int32 in SMEM; table (N, C) VMEM; out (R, C) VMEM."""
    r = out_ref.shape[0]

    def body(i, _):
        base = i * _ROWS_PER_STEP
        for k in range(_ROWS_PER_STEP):  # static unroll
            row = idx_ref[0, base + k]
            out_ref[pl.ds(base + k, 1), :] = table_ref[pl.ds(row, 1), :]
        return 0

    lax.fori_loop(0, r // _ROWS_PER_STEP, body, 0)


@partial(jax.jit, static_argnames=())
def _gather_rows_one(table: jax.Array, idx: jax.Array) -> jax.Array:
    """table (N, C) f32/bf16, idx (R,) int32 -> (R, C)."""
    n, c = table.shape
    r = idx.shape[0]
    r_pad = (-r) % _OUT_BLOCK
    c_pad = (-c) % 128
    if r_pad:
        idx = jnp.pad(idx, (0, r_pad))
    if c_pad:
        table = jnp.pad(table, ((0, 0), (0, c_pad)))
    rp, cp = idx.shape[0], table.shape[1]

    out = pl.pallas_call(
        _gather_kernel,
        grid=(rp // _OUT_BLOCK,),
        in_specs=[
            pl.BlockSpec((1, _OUT_BLOCK), lambda i: (0, i), memory_space=pltpu.SMEM),
            pl.BlockSpec((n, cp), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_OUT_BLOCK, cp), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=out_struct((rp, cp), table.dtype, idx, table),
    )(idx[None, :].astype(jnp.int32), table)
    return out[:r, :c]


_OH_ROWS = 1024   # one-hot matmul: output rows per grid step
_OH_CHUNK = 2048  # one-hot matmul: table rows per grid step


def _onehot_gather_kernel(idx_ref, table_ref, out_ref, acc_ref):
    """Gather as an MXU matmul: out[r, :] = onehot(idx[r]) @ table.

    Grid (rows, chunks); the one-hot tile is built on the fly in VMEM (an
    iota compare), so nothing R x N ever touches HBM.
    """
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        acc_ref[:, :] = jnp.zeros_like(acc_ref)

    # build the one-hot TRANSPOSED (chunk, rows) so the (1, R) index vector
    # broadcasts along lanes without a relayout; the MXU contracts dim 0
    # of both operands directly (no explicit transpose materialized).
    local = idx_ref[0:1, :] - k * _OH_CHUNK  # (1, R)
    rows = lax.broadcasted_iota(jnp.int32, (_OH_CHUNK, _OH_ROWS), 0)
    oh_t = (rows == local).astype(jnp.bfloat16)  # (chunk, R)

    def sel(tab):  # one-hot selection: exactly one term per row, no accum error
        return lax.dot_general(oh_t, tab, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)

    tab = table_ref[:, :]
    if tab.dtype == jnp.float32:
        # MXU matmuls run bf16; split f32 into hi+lo bf16 parts so the
        # selected value reconstructs to ~17 mantissa bits (<1e-5 rel err)
        hi = tab.astype(jnp.bfloat16)
        lo = (tab - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        acc_ref[:, :] += sel(hi) + sel(lo)
    else:
        acc_ref[:, :] += sel(tab.astype(jnp.bfloat16))

    @pl.when(k == pl.num_programs(1) - 1)
    def _():
        out_ref[:, :] = acc_ref[:, :].astype(out_ref.dtype)


def _gather_rows_onehot(table: jax.Array, idx: jax.Array) -> jax.Array:
    """Large-table gather via chunked one-hot matmuls. table (N, C), idx (R,)."""
    n, c = table.shape
    r = idx.shape[0]
    r_pad = (-r) % _OH_ROWS
    c_pad = (-c) % 128
    n_pad = (-n) % _OH_CHUNK
    if r_pad:
        idx = jnp.pad(idx, (0, r_pad), constant_values=-1)
    if c_pad or n_pad:
        table = jnp.pad(table, ((0, n_pad), (0, c_pad)))
    rp, (np_, cp) = idx.shape[0], table.shape

    out = pl.pallas_call(
        _onehot_gather_kernel,
        grid=(rp // _OH_ROWS, np_ // _OH_CHUNK),
        in_specs=[
            pl.BlockSpec((1, _OH_ROWS), lambda i, k: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((_OH_CHUNK, cp), lambda i, k: (k, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_OH_ROWS, cp), lambda i, k: (i, 0), memory_space=pltpu.VMEM),
        out_shape=out_struct((rp, cp), table.dtype, idx, table),
        scratch_shapes=[pltpu.VMEM((_OH_ROWS, cp), jnp.float32)],
    )(idx[None, :].astype(jnp.int32), table)
    return out[:r, :c]


def gather_rows_batched(points: jax.Array, idx: jax.Array) -> jax.Array:
    """Batched row gather: ``out[b, r, :] = points[b, idx[b, r], :]``.

    points (B, N, C), idx (B, R) -> (B, R, C).

    TPU fast path for the SA-layer feature groupings: an XLA-level one-hot
    einsum — the iota-compare one-hot fuses into the matmul, so the MXU
    does the lookup at matmul speed. Measured at SA2 shapes
    (B=32, R=32k, N=2048, C=131): 9.7 -> 3.0 ms vs take_along_axis (XLA's
    batched row gather is a ~1.7 us/row dynamic-slice loop; custom Pallas
    row/one-hot kernels above both measured slower still).

    Restricted to sub-f32 dtypes: a one-hot bf16 matmul copies values
    EXACTLY (single product x1.0, f32 accumulation of one term), while
    an f32 matmul on the MXU goes through bf16 multi-pass splitting and
    is not a bitwise copy — f32 gathers (e.g. the xyz groupings behind
    the verify_parity bitwise contract) keep take_along_axis.
    """
    b, n, c = points.shape
    r = idx.shape[1]
    if (jax.default_backend() == "tpu" and points.dtype == jnp.bfloat16
            and r >= 4096 and n <= 4096):
        oh = jax.nn.one_hot(idx.astype(jnp.int32), n, dtype=points.dtype)
        return jnp.einsum("brn,bnc->brc", oh, points)
    return jnp.take_along_axis(points, idx[..., None].astype(jnp.int32), axis=1)
