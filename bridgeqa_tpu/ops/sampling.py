"""Farthest point sampling + point gathering.

TPU-native equivalents of the reference CUDA kernels
``furthest_point_sampling_kernel`` / ``gather_points_kernel``
(reference: ``lib/pointnet2/_ext_src/src/sampling_gpu.cu:8-229``,
wrappers ``lib/pointnet2/pointnet2_utils.py:51-117``).

Reference semantics preserved exactly:

- the first sampled index is always 0;
- points with squared norm ``<= 1e-3`` are treated as padding and can never
  be selected nor influence the running min-distance buffer
  (``sampling_gpu.cu:104: if (mag <= 1e-3) continue;``);
- the min-distance buffer starts at ``1e10`` (``sampling.cpp:66-87``);
- ties in the argmax resolve to the lowest index (CUDA uses a strict ``>``
  scan, which keeps the first maximum).

The iteration over ``npoint`` selections is inherently sequential; each step
is a full-width masked distance update + argmax, which vectorizes perfectly
on the VPU. This runs as a ``lax.fori_loop`` vmapped over the batch.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from bridgeqa_tpu.ops.vma import out_struct

PADDING_NORM_SQ = 1e-3
INIT_DIST = 1e10
_BB = 8  # batch rows per Pallas program (one f32 sublane group)


@partial(jax.jit, static_argnums=1)
def furthest_point_sample(xyz: jax.Array, npoint: int) -> jax.Array:
    """Iterative farthest point sampling.

    On TPU this runs as a Pallas kernel with the whole per-batch state
    (coords + running min-distance) resident in VMEM and the batch packed
    into sublanes — the XLA ``fori_loop`` formulation pays a while-loop
    round trip per selected point (~0.9 ms x npoint ~= seconds); the kernel
    runs the identical recurrence at VPU speed (~20-40 ms for the SA1 shape).

    Args:
      xyz: (B, N, 3) float32 point coordinates.
      npoint: number of points to sample (static).

    Returns:
      (B, npoint) int32 indices into N.
    """
    if jax.default_backend() == "tpu":
        return _fps_pallas(xyz, npoint)[0]
    return jax.vmap(lambda p: _fps_single(p, npoint))(xyz)


@partial(jax.jit, static_argnums=1)
def furthest_point_sample_with_xyz(xyz: jax.Array, npoint: int):
    """FPS returning (indices (B, npoint), sampled coords (B, npoint, 3)) —
    on TPU the coords come out of the kernel's recurrence state, saving the
    downstream ``gather_points`` of the centers."""
    if jax.default_backend() == "tpu":
        return _fps_pallas(xyz, npoint)
    idx = jax.vmap(lambda p: _fps_single(p, npoint))(xyz)
    return idx, jnp.take_along_axis(xyz, idx[..., None].astype(jnp.int32), axis=1)


def _fps_kernel(x_ref, y_ref, z_ref, valid_ref, out_ref, ox_ref, oy_ref, oz_ref, temp_ref):
    """One program handles _BB batch rows; O(npoint * N) VPU work.

    Recurrence identical to ``_fps_single`` (CUDA semantics: first index 0,
    padding-skip, min-distance buffer init 1e10, first-max tie-break).
    Also emits the selected coordinates — the downstream ``gather_points``
    of the FPS centers comes for free from the recurrence state."""
    npoint = out_ref.shape[1]
    x, y, z = x_ref[:, :], y_ref[:, :], z_ref[:, :]
    valid = valid_ref[:, :] > 0.0
    # NaN coordinates are always invalid lanes (NaN mag fails the > 1e-3
    # padding-skip test) but would poison the maskless recurrence below
    # (min(-1, NaN) = NaN, and argmax treats NaN as the maximum) — zero
    # them ONCE here; bitwise-free for every NaN-free input.
    x = jnp.where(jnp.isnan(x), 0.0, x)
    y = jnp.where(jnp.isnan(y), 0.0, y)
    z = jnp.where(jnp.isnan(z), 0.0, z)
    # Padding points carry temp = -1 forever: min(-1, d) = -1 (d >= 0, no
    # NaNs after the scrub above), so they never win the argmax and need no
    # per-iteration `valid` masking — saves two full-width VPU passes per
    # selection, bitwise-identical (valid points see the exact same min
    # recurrence; cand == new_temp).
    temp_ref[:, :] = jnp.where(valid, INIT_DIST, -1.0)
    out_ref[:, :] = jnp.zeros(out_ref.shape, jnp.int32)
    ox_ref[:, :] = jnp.where(
        lax.broadcasted_iota(jnp.int32, ox_ref.shape, 1) == 0, x[:, 0:1], 0.0)
    oy_ref[:, :] = jnp.where(
        lax.broadcasted_iota(jnp.int32, oy_ref.shape, 1) == 0, y[:, 0:1], 0.0)
    oz_ref[:, :] = jnp.where(
        lax.broadcasted_iota(jnp.int32, oz_ref.shape, 1) == 0, z[:, 0:1], 0.0)
    lane = lax.broadcasted_iota(jnp.int32, x.shape, 1)
    out_lane = lax.broadcasted_iota(jnp.int32, out_ref.shape, 1)
    bb = x.shape[0]
    # coordinate planes stacked along sublanes: the per-selection coordinate
    # extraction then needs ONE cross-lane reduce over (3*BB, N) instead of
    # three over (BB, N) — cross-lane reduce ops (not elementwise passes)
    # dominate this kernel's cost
    xyz3 = jnp.concatenate([x, y, z], axis=0)  # (3*BB, N)

    def one(j, ref):
        lx, ly, lz = ref
        d = (x - lx) ** 2 + (y - ly) ** 2 + (z - lz) ** 2
        cand = jnp.minimum(temp_ref[:, :], d)  # padding rows pinned at -1
        temp_ref[:, :] = cand
        best = jnp.argmax(cand, axis=1).astype(jnp.int32)  # (BB,)
        hit = lane == best[:, None]
        hit3 = jnp.concatenate([hit, hit, hit], axis=0)
        sel3 = jnp.sum(jnp.where(hit3, xyz3, 0.0), axis=1, keepdims=True)
        nlx, nly, nlz = sel3[0:bb], sel3[bb:2 * bb], sel3[2 * bb:3 * bb]
        # dynamic-lane stores aren't supported by Mosaic; accumulate one-hot
        at_j = out_lane == j
        out_ref[:, :] = out_ref[:, :] + jnp.where(at_j, best[:, None], 0)
        ox_ref[:, :] = ox_ref[:, :] + jnp.where(at_j, nlx, 0.0)
        oy_ref[:, :] = oy_ref[:, :] + jnp.where(at_j, nly, 0.0)
        oz_ref[:, :] = oz_ref[:, :] + jnp.where(at_j, nlz, 0.0)
        return nlx, nly, nlz

    # 8 selections per fori iteration: the per-iteration loop overhead is
    # the dominant cost for the small-N SA2-4/proposal FPS calls (and a
    # mild win even at N=40k). Overshooting past npoint-1 is harmless —
    # `at_j` never matches, and temp updates past the last selection are
    # dead state. Bitwise-identical to the 1-step loop (verified on chip).
    unroll = 8

    def body(i, ref):
        for u in range(unroll):
            ref = one(1 + i * unroll + u, ref)
        return ref

    outer = -(-(npoint - 1) // unroll)
    lax.fori_loop(0, outer, body, (x[:, 0:1], y[:, 0:1], z[:, 0:1]))


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def _fps_pallas(xyz: jax.Array, npoint: int):
    return _fps_pallas_impl(xyz, npoint)


def _fps_pallas_fwd(xyz, npoint):
    out = _fps_pallas_impl(xyz, npoint)
    return out, (out[0], xyz.shape)


def _fps_pallas_bwd(npoint, res, g):
    """Selected coords are copies of input coords: scatter the coord
    cotangents back to the selected rows (the reference's
    ``gather_points_grad_kernel`` semantics); indices get no gradient."""
    idx, shape = res
    _, g_xyz_sel = g
    b = shape[0]
    grad = jnp.zeros(shape, g_xyz_sel.dtype)
    grad = grad.at[jnp.arange(b)[:, None], idx].add(g_xyz_sel)
    return (grad,)


_fps_pallas.defvjp(_fps_pallas_fwd, _fps_pallas_bwd)


def _fps_pallas_impl(xyz: jax.Array, npoint: int, *, interpret: bool = False):
    b, n = xyz.shape[:2]
    xyz = xyz.astype(jnp.float32)
    n_pad = (-n) % 128
    b_pad = (-b) % _BB
    mag = jnp.sum(xyz * xyz, axis=-1)
    valid = (mag > PADDING_NORM_SQ).astype(jnp.float32)
    x, y, z = xyz[..., 0], xyz[..., 1], xyz[..., 2]
    if n_pad or b_pad:
        padded = [jnp.pad(a, ((0, b_pad), (0, n_pad))) for a in (x, y, z, valid)]
        x, y, z, valid = padded
    bb = x.shape[0]

    grid = (bb // _BB,)
    spec = pl.BlockSpec((_BB, x.shape[1]), lambda i: (i, 0), memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((_BB, npoint), lambda i: (i, 0), memory_space=pltpu.VMEM)
    idx, ox, oy, oz = pl.pallas_call(
        _fps_kernel,
        grid=grid,
        in_specs=[spec, spec, spec, spec],
        out_specs=[out_spec] * 4,
        out_shape=[out_struct((bb, npoint), jnp.int32, x)]
        + [out_struct((bb, npoint), jnp.float32, x)] * 3,
        scratch_shapes=[pltpu.VMEM((_BB, x.shape[1]), jnp.float32)],
        # headroom over the 16 MB scoped-vmem policy default (buffer
        # assignment varies with the surrounding graph, e.g. under scan)
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=32 * 1024 * 1024),
        interpret=interpret,
    )(x, y, z, valid)
    return idx[:b], jnp.stack([ox[:b], oy[:b], oz[:b]], axis=-1)


def _fps_single(xyz: jax.Array, npoint: int) -> jax.Array:
    n = xyz.shape[0]
    xyz = xyz.astype(jnp.float32)
    mag = jnp.sum(xyz * xyz, axis=-1)
    valid = mag > PADDING_NORM_SQ

    def body(j, state):
        temp, idxs, old = state
        ref = xyz[old]
        d = jnp.sum((xyz - ref[None, :]) ** 2, axis=-1)
        new_temp = jnp.where(valid, jnp.minimum(temp, d), temp)
        # CUDA starts `best = -1` and only considers valid points, so an
        # all-padding cloud selects index 0 (argmax of a constant field).
        cand = jnp.where(valid, new_temp, -1.0)
        besti = jnp.argmax(cand).astype(jnp.int32)
        idxs = idxs.at[j].set(besti)
        return new_temp, idxs, besti

    from bridgeqa_tpu.ops.vma import vary_tree_like

    # constants lifted to xyz's varying axes so the carry type-checks under
    # shard_map's vma checker (no-op outside shard_map)
    init = vary_tree_like(
        (jnp.full((n,), INIT_DIST, dtype=jnp.float32),
         jnp.zeros((npoint,), dtype=jnp.int32),
         jnp.int32(0)),
        xyz)
    _, idxs, _ = lax.fori_loop(1, npoint, body, init)
    return idxs


def gather_points(points: jax.Array, idx: jax.Array) -> jax.Array:
    """Gather points/features by index (channel-last).

    Equivalent of ``gather_points_kernel`` (``sampling_gpu.cu:8-30``) but for
    the (B, N, C) layout: ``out[b, m, c] = points[b, idx[b, m], c]``.
    The backward pass (scatter-add, ``gather_points_grad_kernel``) is XLA
    autodiff of the gather.

    Args:
      points: (B, N, C).
      idx: (B, M) integer indices into N.

    Returns:
      (B, M, C).
    """
    from bridgeqa_tpu.ops.gather import gather_rows_batched

    return gather_rows_batched(points, idx)
