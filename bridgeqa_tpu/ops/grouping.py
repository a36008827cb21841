"""Ball query + grouping ops.

TPU-native equivalents of ``query_ball_point_kernel``
(``lib/pointnet2/_ext_src/src/ball_query_gpu.cu:9-54``) and
``group_points_kernel`` (``group_points_gpu.cu``), plus the ``QueryAndGroup``
/ ``GroupAll`` wrappers (``lib/pointnet2/pointnet2_utils.py:294-425``).

Reference ball-query semantics preserved exactly:

- a neighbor qualifies iff ``d2 < radius**2`` (strict);
- the query returns the **first** ``nsample`` qualifying indices in ascending
  point order (the CUDA kernel scans ``k = 0..n-1``);
- if fewer than ``nsample`` qualify, the remaining slots are filled with the
  *first* qualifying index (the ``cnt == 0`` pre-fill branch in
  ``ball_query_gpu.cu:35-39``);
- if none qualify, all slots are 0 (the output buffer is zero-initialised in
  ``ball_query.cpp``).

Implementation: instead of a per-center sequential scan, distances are
computed for blocks of centers at once (VPU-wide), qualifying indices are
extracted with a ``top_k`` over order keys, and the whole thing runs under a
``lax.scan`` over center blocks so the (block, N) distance tile stays small
enough to live in VMEM-sized working sets instead of an O(M·N) HBM buffer.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bridgeqa_tpu.ops.vma import out_struct

def _block_size(m: int, target: int = 256) -> int:
    """Largest divisor of m that is <= target (m is a power of two in practice)."""
    b = min(m, target)
    while m % b != 0:
        b -= 1
    return b


def pairwise_sqdist(a: jax.Array, b: jax.Array) -> jax.Array:
    """Exact pairwise squared distances, matching the CUDA accumulation order.

    Computes ``sum_k (a[..., i, k] - b[..., j, k])**2`` by unrolling the
    (tiny) coordinate axis, so no (..., i, j, k) intermediate is materialised
    and the arithmetic matches the reference's per-coordinate
    subtract-square-add exactly (no ||a||^2 + ||b||^2 - 2ab cancellation).

    Args:
      a: (..., M, K)
      b: (..., N, K) with K small (3 for xyz).

    Returns:
      (..., M, N) float32.
    """
    k = a.shape[-1]
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    d2 = jnp.zeros(a.shape[:-1] + (b.shape[-2],), dtype=jnp.float32)
    for i in range(k):
        diff = a[..., i][..., :, None] - b[..., i][..., None, :]
        d2 = d2 + diff * diff
    return d2


_CHUNK = 128  # N-axis chunk (one lane group)


# test/ablation hook: None = backend default, "exact" / "stripes" to force a
# selection rule everywhere (stripes off-TPU runs the XLA emulation below)
FORCE_MODE = None


def ball_query(radius: float, nsample: int, xyz: jax.Array, new_xyz: jax.Array,
               *, exact: bool | None = None) -> jax.Array:
    """Radius neighborhood query.

    Two modes:

    - ``exact=True``: the reference's "first nsample qualifying indices in
      ascending point order" (CUDA scan order), computed sort-free (see
      ``_ball_query_exact``). Default off-TPU; the parity baseline.
    - ``exact=False`` (default on TPU): a Pallas kernel that picks one
      qualifier per contiguous point stripe — the *first* qualifier of each
      of ``nsample`` stripes when that layout needs no extra padding
      (``_stripe_plan``; the large-N SA1 case), else the first *and last*
      of ``nsample/2`` wider stripes. Because the data pipeline randomly
      permutes points (``dataset.py:415``), the reference's "first nsample"
      is itself a uniform random in-ball subset — either stripe rule draws
      from the same distribution at a fraction of the cost (one fused VMEM
      sweep vs a 40k-wide sort), with the same fill semantics (replicate
      the first qualifier; all-empty -> 0). Deterministic, but NOT
      bitwise-identical to the CUDA scan.
    """
    if FORCE_MODE == "exact":
        exact = True
    elif FORCE_MODE == "stripes" and nsample % 2 == 0:
        if jax.default_backend() == "tpu":
            return _ball_query_stripes(radius, nsample, xyz, new_xyz)[0]
        return _ball_query_stripes_xla(radius, nsample, xyz, new_xyz)[0]
    if exact is None:
        exact = jax.default_backend() != "tpu"
    if exact or nsample % 2:
        return _ball_query_exact(radius, nsample, xyz, new_xyz)
    return _ball_query_stripes(radius, nsample, xyz, new_xyz)[0]


@partial(jax.jit, static_argnums=(0, 1))
def _ball_query_exact(radius: float, nsample: int, xyz: jax.Array, new_xyz: jax.Array) -> jax.Array:
    """Exact CUDA-order ball query.

    TPU note: "first nsample qualifying indices in ascending order" is
    computed WITHOUT a sort. ``lax.top_k`` over order keys lowers to a full
    stable sort of the (B, M, N) key tensor on TPU (seconds at SA1 shapes);
    instead this exploits the keys being the point indices themselves:

    1. count qualifiers per 128-point chunk (a fused distance+reduce sweep);
    2. exclusive-cumsum the per-chunk counts;
    3. for each output slot s, locate the chunk holding the (s+1)-th
       qualifier by comparing s against the cumulative counts (compare+sum,
       no search), gather that chunk, and pick its (s+1-cum)-th qualifier
       with an in-chunk cumsum. Three linear sweeps total.

    Args:
      radius: ball radius (static).
      nsample: max neighbors per ball (static).
      xyz: (B, N, 3) all points.
      new_xyz: (B, M, 3) query centers.

    Returns:
      (B, M, nsample) int32 indices into N.
    """
    b, m = new_xyz.shape[:2]
    n = xyz.shape[1]
    r2 = jnp.float32(radius * radius)
    blk = _block_size(m, 32)
    nblk = m // blk

    c = _CHUNK
    n_pad = (-n) % c
    # pad with far-away points so padding never qualifies
    xyz_p = jnp.pad(xyz.astype(jnp.float32), ((0, 0), (0, n_pad), (0, 0)),
                    constant_values=1e9) if n_pad else xyz.astype(jnp.float32)
    np_ = xyz_p.shape[1]
    k = np_ // c
    s1 = jnp.arange(1, nsample + 1, dtype=jnp.int32)  # slot ranks, 1-based

    def step(_, centers):  # centers: (B, blk, 3)
        d2 = pairwise_sqdist(centers, xyz_p)  # (B, blk, Np) — fused into the reduce
        counts = jnp.sum((d2 < r2).reshape(b, blk, k, c), axis=-1, dtype=jnp.int32)
        cum_incl = jnp.cumsum(counts, axis=-1)
        cum_excl = cum_incl - counts
        total = cum_incl[..., -1:]  # (B, blk, 1)

        # chunk containing the s-th qualifier (count of chunks still below s)
        k_sel = jnp.sum((cum_incl[..., None] < s1).astype(jnp.int32), axis=2)  # (B, blk, ns)
        k_cl = jnp.minimum(k_sel, k - 1)
        cum_before = jnp.take_along_axis(cum_excl, k_cl, axis=2)
        rank = s1[None, None, :] - cum_before  # 1-based rank within the chunk

        base = k_cl * c
        gidx = base[..., None] + jnp.arange(c, dtype=jnp.int32)  # (B, blk, ns, C)
        g = jnp.take_along_axis(
            xyz_p, gidx.reshape(b, -1, 1), axis=1
        ).reshape(b, blk, nsample, c, 3)
        cd2 = jnp.sum((g - centers[:, :, None, None, :]) ** 2, axis=-1)
        cmask = cd2 < r2
        wcum = jnp.cumsum(cmask.astype(jnp.int32), axis=-1)
        hit = cmask & (wcum == rank[..., None])
        within = jnp.argmax(hit, axis=-1).astype(jnp.int32)
        idx = base + within

        slot_valid = s1[None, None, :] <= total
        first = idx[..., :1]
        out = jnp.where(slot_valid, idx, first)
        out = jnp.where(total > 0, out, 0)  # no neighbors at all -> 0
        return None, out.astype(jnp.int32)

    centers = jnp.moveaxis(new_xyz.astype(jnp.float32).reshape(b, nblk, blk, 3), 1, 0)
    _, idx = lax.scan(step, None, centers)  # (nblk, B, blk, nsample)
    return jnp.moveaxis(idx, 0, 1).reshape(b, m, nsample)


_BQ_BLK = 128   # centers per Pallas program (VMEM-bounded)
_BIG = 2**30


_BQ_BATCH = 8  # batch rows per program (sublane-dim blocks must be x8)


def _ball_query_stripe_kernel(r2: float, nsample: int, blk: int, picks: int, nf: int = 0):
    """Stripe ball query; with ``nf`` > 0 the kernel ALSO extracts that many
    per-point feature channels at the selected lanes — the grouped features
    come out of the same VMEM sweep and the (53 ms at SA1 shapes)
    ``group_points`` gather disappears entirely. Feature planes follow
    group_points semantics exactly: slot -> features[idx[slot]], including
    the fill index (all-empty balls carry point 0's features, NOT zeros —
    unlike rel-xyz, which zeroes those slots)."""
    stripes = nsample // picks
    nch = 3 + nf  # extraction channels per pick: dx, dy, dz, features...

    def kernel(*refs):
        px_ref, py_ref, pz_ref = refs[0:3]
        f_refs = refs[3:3 + nf]
        cx_ref, cy_ref, cz_ref = refs[3 + nf:6 + nf]
        idx_ref, rx_ref, ry_ref, rz_ref = refs[6 + nf:10 + nf]
        fo_refs = refs[10 + nf:10 + 2 * nf]

        w = px_ref.shape[1] // stripes
        big = jnp.int32(_BIG)
        col = lax.broadcasted_iota(jnp.int32, (blk, nsample), 1)

        for bi in range(_BQ_BATCH):
            cx = cx_ref[bi, :, :]  # (blk, 1)
            cy = cy_ref[bi, :, :]
            cz = cz_ref[bi, :, :]
            # point 0's feature values (the all-empty fill target: idx 0)
            lane128 = lax.broadcasted_iota(jnp.int32, (1, 128), 1)
            f_zero = [jnp.sum(jnp.where(lane128 == 0, fr[bi:bi + 1, pl.ds(0, 128)], 0.0),
                              axis=1, keepdims=True) for fr in f_refs]  # (1, 1) each

            def stripe_body(s, state):
                idxs, sel_planes, first_all, fills = state
                base = pl.multiple_of(s * w, 128)
                dx = px_ref[bi:bi + 1, pl.ds(base, w)] - cx  # (blk, w)
                dy = py_ref[bi:bi + 1, pl.ds(base, w)] - cy
                dz = pz_ref[bi:bi + 1, pl.ds(base, w)] - cz
                fvs = [jnp.broadcast_to(fr[bi:bi + 1, pl.ds(base, w)], (blk, w))
                       for fr in f_refs]
                d2 = dx * dx + dy * dy + dz * dz
                mask = d2 < r2
                lidx = lax.broadcasted_iota(jnp.int32, (blk, w), 1)
                vals = [dx, dy, dz] + fvs
                # Cross-lane reduce OPS (not elementwise passes) dominate
                # this kernel: stack everything to reduce along sublanes so
                # each stripe does ONE key reduce + ONE extraction reduce.
                # No qualifier in the stripe <=> fst == big (the -big key
                # wins the max) — no separate `any` sweep needed.
                if picks == 2:
                    keys = jnp.concatenate(
                        [jnp.where(mask, -lidx, -big), jnp.where(mask, lidx, -1)], axis=0)
                    r = jnp.max(keys, axis=1, keepdims=True)  # (2*blk, 1)
                    fst = -r[0:blk]
                    lst = r[blk:2 * blk]
                    hitf = lidx == fst
                    hitl = lidx == lst
                    hit2n = jnp.concatenate([hitf] * nch + [hitl] * nch, axis=0)
                    v2n = jnp.concatenate(vals + vals, axis=0)
                    sel = jnp.sum(jnp.where(hit2n, v2n, 0.0), axis=1, keepdims=True)
                    first_sel = [sel[c * blk:(c + 1) * blk] for c in range(nch)]
                    last_sel = [sel[(nch + c) * blk:(nch + c + 1) * blk] for c in range(nch)]
                    gfst = jnp.where(fst < big, fst + s * w, big)
                    glst = jnp.where(lst >= 0, lst + s * w, big)
                    at_f = col == 2 * s
                    at_l = col == 2 * s + 1
                    idxs = jnp.where(at_f, gfst, jnp.where(at_l, glst, idxs))
                    sel_planes = [jnp.where(at_f, fc, jnp.where(at_l, lc, sp))
                                  for fc, lc, sp in zip(first_sel, last_sel, sel_planes)]
                else:
                    fst = -jnp.max(jnp.where(mask, -lidx, -big), axis=1, keepdims=True)
                    hit = lidx == fst
                    hitn = jnp.concatenate([hit] * nch, axis=0)
                    vn = jnp.concatenate(vals, axis=0)
                    sel = jnp.sum(jnp.where(hitn, vn, 0.0), axis=1, keepdims=True)
                    first_sel = [sel[c * blk:(c + 1) * blk] for c in range(nch)]
                    gfst = jnp.where(fst < big, fst + s * w, big)
                    at_f = col == s
                    idxs = jnp.where(at_f, gfst, idxs)
                    sel_planes = [jnp.where(at_f, fc, sp)
                                  for fc, sp in zip(first_sel, sel_planes)]

                better = gfst < first_all
                first_all = jnp.minimum(first_all, gfst)
                fills = [jnp.where(better, fc, fl) for fc, fl in zip(first_sel, fills)]
                return idxs, sel_planes, first_all, fills

            init = (jnp.full((blk, nsample), big, jnp.int32),
                    [jnp.zeros((blk, nsample), jnp.float32) for _ in range(nch)],
                    jnp.full((blk, 1), big, jnp.int32),
                    [jnp.zeros((blk, 1), jnp.float32) for _ in range(nch)])
            idxs, sel_planes, first_all, fills = lax.fori_loop(
                0, stripes, stripe_body, init)

            found_any = first_all < big
            fill_idx = jnp.where(found_any, first_all, 0)
            missing = idxs >= big
            idx_ref[bi, :, :] = jnp.where(missing, fill_idx, idxs).astype(jnp.int32)
            use_fill = missing & found_any
            for c, out_ref in enumerate((rx_ref, ry_ref, rz_ref)):
                out_ref[bi, :, :] = jnp.where(
                    use_fill, fills[c], jnp.where(missing, 0.0, sel_planes[c]))
            for j, out_ref in enumerate(fo_refs):
                # all-empty -> idx 0 -> point 0's feature (group_points parity)
                out_ref[bi, :, :] = jnp.where(
                    use_fill, fills[3 + j],
                    jnp.where(missing, f_zero[j], sel_planes[3 + j]))

    return kernel


@partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _ball_query_stripes(radius: float, nsample: int, xyz: jax.Array, new_xyz: jax.Array):
    return _ball_query_stripes_impl(radius, nsample, xyz, new_xyz)


def _ball_query_stripes_fwd(radius, nsample, xyz, new_xyz):
    out = _ball_query_stripes_impl(radius, nsample, xyz, new_xyz)
    return out, (out[0], xyz.shape)


def _ball_query_stripes_bwd(radius, nsample, res, g):
    """rel = xyz[idx] - center: scatter rel cotangents onto the selected
    points (reference ``group_points_grad_kernel``) and accumulate the
    negated sum onto the centers; indices get no gradient."""
    idx, xyz_shape = res
    _, g_rel = g
    b, m, ns = idx.shape
    g_stack = jnp.stack(g_rel, axis=-1)  # (B, M, ns, 3)
    g_xyz = jnp.zeros(xyz_shape, g_stack.dtype)
    g_xyz = g_xyz.at[jnp.arange(b)[:, None], idx.reshape(b, m * ns)].add(
        g_stack.reshape(b, m * ns, 3))
    g_center = -jnp.sum(g_stack, axis=2)  # (B, M, 3)
    return g_xyz, g_center


_ball_query_stripes.defvjp(_ball_query_stripes_fwd, _ball_query_stripes_bwd)


# how many feature channels the in-kernel extraction carries before the
# per-stripe stacked reduce outgrows the group_points gather it replaces
MAX_KERNEL_FEATS = 4


@partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _ball_query_stripes_feats(radius: float, nsample: int, xyz: jax.Array,
                              new_xyz: jax.Array, feats: jax.Array):
    """Stripe ball query + in-sweep feature extraction.

    feats (B, N, F), F <= MAX_KERNEL_FEATS. Returns (idx, rel planes x3,
    feature planes xF) where feature plane j == feats[b, idx[b,m,s], j]
    bitwise — the group_points gather (53 ms at SA1 shapes vs ~5 ms of
    extra in-kernel reduce) never runs."""
    return _ball_query_stripes_impl(radius, nsample, xyz, new_xyz, feats=feats)


def _ball_query_stripes_feats_fwd(radius, nsample, xyz, new_xyz, feats):
    out = _ball_query_stripes_impl(radius, nsample, xyz, new_xyz, feats=feats)
    return out, (out[0], xyz.shape, feats.shape)


def _ball_query_stripes_feats_bwd(radius, nsample, res, g):
    """xyz/center cotangents as in the featureless VJP; feature-plane
    cotangents scatter-add onto the gathered points (group_points grad)."""
    idx, xyz_shape, feats_shape = res
    _, g_rel, g_fp = g
    b, m, ns = idx.shape
    rows = jnp.arange(b)[:, None]
    flat_idx = idx.reshape(b, m * ns)
    g_stack = jnp.stack(g_rel, axis=-1)  # (B, M, ns, 3)
    g_xyz = jnp.zeros(xyz_shape, g_stack.dtype)
    g_xyz = g_xyz.at[rows, flat_idx].add(g_stack.reshape(b, m * ns, 3))
    g_center = -jnp.sum(g_stack, axis=2)  # (B, M, 3)
    g_fstack = jnp.stack(g_fp, axis=-1)  # (B, M, ns, F)
    g_feats = jnp.zeros(feats_shape, g_fstack.dtype)
    g_feats = g_feats.at[rows, flat_idx].add(
        g_fstack.reshape(b, m * ns, feats_shape[-1]))
    return g_xyz, g_center, g_feats


_ball_query_stripes_feats.defvjp(_ball_query_stripes_feats_fwd,
                                 _ball_query_stripes_feats_bwd)


def _stripe_plan(n: int, nsample: int) -> tuple[int, int]:
    """Choose the stripe layout: (picks per stripe, padded point count).

    1 pick (the first qualifier) from each of ``nsample`` narrow stripes
    costs ~25% fewer VPU passes than 2 picks (first+last) from ``nsample/2``
    wide stripes — use it whenever the narrower 128-lane quantum needs no
    extra padding (the large-N SA1 case); otherwise keep 2 picks so small
    clouds (SA2-4, vote aggregation) don't pay doubled padding sweeps.
    """
    q2 = (nsample // 2) * 128
    np2 = -(-n // q2) * q2
    q1 = nsample * 128
    np1 = -(-n // q1) * q1
    return (1, np1) if np1 == np2 else (2, np2)


@partial(jax.jit, static_argnums=(0, 1), static_argnames=("interpret",))
def _ball_query_stripes_impl(radius: float, nsample: int, xyz: jax.Array, new_xyz: jax.Array,
                             feats: jax.Array | None = None, *, interpret: bool = False):
    """Pallas stripe-sampled ball query (see ``ball_query`` docstring).

    Returns (idx (B, M, nsample) int32, rel planes ((B, M, nsample) f32 x3))
    — the recentered coordinates come straight out of the kernel's VMEM
    sweep, so no separate gather of grouped xyz is ever needed. Planes stay
    separate: stacking them to (..., 3) puts 3 in the lane dim (42x pad
    waste); consumers that need the tensor form stack explicitly.

    With ``feats`` (B, N, F): also returns F grouped feature planes
    (``== feats[b, idx, j]`` bitwise) as a third element.
    """
    b, m = new_xyz.shape[:2]
    n = xyz.shape[1]
    nf = 0 if feats is None else feats.shape[-1]
    picks, np_padded = _stripe_plan(n, nsample)
    n_pad = np_padded - n
    xyz_p = jnp.pad(xyz.astype(jnp.float32), ((0, 0), (0, n_pad), (0, 0)),
                    constant_values=1e9) if n_pad else xyz.astype(jnp.float32)
    np_ = xyz_p.shape[1]
    if nf:
        feats_p = jnp.pad(feats.astype(jnp.float32), ((0, 0), (0, n_pad), (0, 0))) \
            if n_pad else feats.astype(jnp.float32)

    blk = min(_BQ_BLK, m)
    while m % blk:
        blk -= 8
    bq = _BQ_BATCH
    b_pad = (-b) % bq
    c = new_xyz.astype(jnp.float32)[..., None]  # per-coord (B, M, 1)
    if b_pad:
        xyz_p = jnp.pad(xyz_p, ((0, b_pad), (0, 0), (0, 0)), constant_values=1e9)
        c = jnp.pad(c, ((0, b_pad), (0, 0), (0, 0), (0, 0)))
        if nf:
            feats_p = jnp.pad(feats_p, ((0, b_pad), (0, 0), (0, 0)))
    bp = xyz_p.shape[0]

    pts_spec = pl.BlockSpec((bq, np_), lambda i, j: (i, 0), memory_space=pltpu.VMEM)
    ctr_spec = pl.BlockSpec((bq, blk, 1), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((bq, blk, nsample), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        _ball_query_stripe_kernel(float(radius * radius), nsample, blk, picks, nf),
        grid=(bp // bq, m // blk),
        in_specs=[pts_spec] * (3 + nf) + [ctr_spec] * 3,
        out_specs=[out_spec] * (4 + nf),
        out_shape=[out_struct((bp, m, nsample), jnp.int32, xyz_p, c)]
        + [out_struct((bp, m, nsample), jnp.float32, xyz_p, c)] * (3 + nf),
        # ~18 MB live in some surrounding-graph contexts (buffer assignment
        # varies under scan) — the 16 MB scoped-vmem default is compiler
        # policy, not the hardware cap
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=32 * 1024 * 1024),
        interpret=interpret,
    )(xyz_p[..., 0], xyz_p[..., 1], xyz_p[..., 2],
      *([feats_p[..., j] for j in range(nf)] if nf else []),
      c[:, :, 0], c[:, :, 1], c[:, :, 2])
    idx, rx, ry, rz = outs[0], outs[1], outs[2], outs[3]
    if nf:
        return idx[:b], (rx[:b], ry[:b], rz[:b]), tuple(o[:b] for o in outs[4:])
    return idx[:b], (rx[:b], ry[:b], rz[:b])


@partial(jax.jit, static_argnums=(0, 1))
def _ball_query_stripes_xla(radius: float, nsample: int, xyz: jax.Array, new_xyz: jax.Array,
                            feats: jax.Array | None = None):
    """Pure-XLA emulation of the Pallas stripe kernel's selection rule
    (first + last qualifier per contiguous stripe, same padding/fill
    semantics). Runs anywhere — used by the exact-vs-stripes detector
    ablation on the CPU mesh and as the off-TPU FORCE_MODE="stripes" path.

    Returns (idx (B, M, nsample) int32, rel planes ((B, M, nsample) f32 x3)
    [, grouped feature planes xF when ``feats`` is given]).
    """
    b, m = new_xyz.shape[:2]
    n = xyz.shape[1]
    picks, np_padded = _stripe_plan(n, nsample)
    stripes = nsample // picks
    n_pad = np_padded - n
    xyz_p = jnp.pad(xyz.astype(jnp.float32), ((0, 0), (0, n_pad), (0, 0)),
                    constant_values=1e9) if n_pad else xyz.astype(jnp.float32)
    np_ = xyz_p.shape[1]
    w = np_ // stripes
    r2 = jnp.float32(radius * radius)
    big = jnp.int32(_BIG)

    blk = _block_size(m, 64)
    nblk = m // blk

    def step(_, centers):  # centers: (B, blk, 3)
        d2 = pairwise_sqdist(centers, xyz_p).reshape(b, blk, stripes, w)
        mask = d2 < r2
        lidx = jnp.arange(w, dtype=jnp.int32)
        fst = jnp.min(jnp.where(mask, lidx, big), axis=-1)  # (B, blk, stripes)
        found = jnp.any(mask, axis=-1)
        base = (jnp.arange(stripes, dtype=jnp.int32) * w)[None, None, :]
        gfst = jnp.where(found, fst + base, big)

        if picks == 2:
            lst = jnp.max(jnp.where(mask, lidx, -1), axis=-1)
            glst = jnp.where(found, lst + base, big)
            # interleave (fst_0, lst_0, fst_1, lst_1, ...) into the slot axis
            idxs = jnp.stack([gfst, glst], axis=-1).reshape(b, blk, nsample)
        else:
            idxs = gfst  # one pick per stripe: slot s = stripe s
        first_all = jnp.min(gfst, axis=-1, keepdims=True)  # (B, blk, 1)
        found_any = first_all < big
        fill_idx = jnp.where(found_any, first_all, 0)
        missing = idxs >= big
        idx_final = jnp.where(missing, fill_idx, idxs).astype(jnp.int32)

        sel = jnp.take_along_axis(xyz_p, idx_final.reshape(b, -1, 1), axis=1)
        rel = sel.reshape(b, blk, nsample, 3) - centers[:, :, None, :]
        rel = jnp.where((missing & ~found_any)[..., None], 0.0, rel)
        return None, (idx_final, rel)

    centers = jnp.moveaxis(new_xyz.astype(jnp.float32).reshape(b, nblk, blk, 3), 1, 0)
    _, (idx, rel) = lax.scan(step, None, centers)
    idx = jnp.moveaxis(idx, 0, 1).reshape(b, m, nsample)
    rel = jnp.moveaxis(rel, 0, 1).reshape(b, m, nsample, 3)
    if feats is not None:
        fg = jnp.take_along_axis(feats.astype(jnp.float32), idx.reshape(b, -1, 1), axis=1)
        fg = fg.reshape(b, m, nsample, feats.shape[-1])
        return idx, (rel[..., 0], rel[..., 1], rel[..., 2]), \
            tuple(fg[..., j] for j in range(feats.shape[-1]))
    return idx, (rel[..., 0], rel[..., 1], rel[..., 2])


def group_points(points: jax.Array, idx: jax.Array) -> jax.Array:
    """Grouped gather: ``out[b, m, s, c] = points[b, idx[b, m, s], c]``.

    Equivalent of ``group_points_kernel`` (``group_points_gpu.cu``) in
    channel-last layout; backward (atomicAdd scatter) is XLA autodiff.

    Args:
      points: (B, N, C).
      idx: (B, M, S) integer indices into N.

    Returns:
      (B, M, S, C).
    """
    from bridgeqa_tpu.ops.gather import gather_rows_batched

    b, m, s = idx.shape
    flat = gather_rows_batched(points, idx.reshape(b, m * s))
    return flat.reshape(b, m, s, points.shape[-1])


def query_and_group(
    radius: float,
    nsample: int,
    xyz: jax.Array,
    new_xyz: jax.Array,
    features: jax.Array | None = None,
    *,
    use_xyz: bool = True,
    normalize_xyz: bool = False,
    ret_grouped_xyz: bool = False,
    sample_uniformly: bool = False,
    rng: jax.Array | None = None,
):
    """Ball query + group + recenter (reference ``QueryAndGroup``,
    ``lib/pointnet2/pointnet2_utils.py:294-376``), channel-last.

    Args:
      xyz: (B, N, 3); new_xyz: (B, M, 3); features: (B, N, C) or None.

    Returns:
      (B, M, nsample, 3 + C) grouped features (xyz offsets first when
      ``use_xyz``), optionally also the recentered grouped xyz.
    """
    on_tpu = jax.default_backend() == "tpu"
    stripes_ok = nsample % 2 == 0 and not sample_uniformly
    if FORCE_MODE == "exact":
        fast = False
    elif FORCE_MODE == "stripes":
        fast = stripes_ok
    else:
        fast = on_tpu and stripes_ok
    if fast:
        # fused Pallas path: selection + recentered xyz in one VMEM sweep
        # (XLA emulation of the same selection rule off-TPU)
        stripe_fn = _ball_query_stripes if on_tpu else _ball_query_stripes_xla
        idx, rel = stripe_fn(radius, nsample, xyz, new_xyz)
        grouped_xyz = jnp.stack(rel, axis=-1)
    else:
        idx = ball_query(radius, nsample, xyz, new_xyz)
        if sample_uniformly:
            if rng is None:
                raise ValueError("sample_uniformly requires an rng key")
            idx = _resample_uniform(idx, rng, nsample)
        grouped_xyz = group_points(xyz, idx) - new_xyz[:, :, None, :]
    if normalize_xyz:
        grouped_xyz = grouped_xyz / radius

    if features is not None:
        grouped_features = group_points(features, idx)
        if use_xyz:
            new_features = jnp.concatenate([grouped_xyz.astype(grouped_features.dtype), grouped_features], axis=-1)
        else:
            new_features = grouped_features
    else:
        assert use_xyz, "cannot group with neither features nor xyz"
        new_features = grouped_xyz

    if ret_grouped_xyz:
        return new_features, grouped_xyz
    return new_features


def _resample_uniform(idx: jax.Array, rng: jax.Array, nsample: int) -> jax.Array:
    """Uniform re-sampling over the *unique* indices of each ball.

    Mirrors the python loop in ``pointnet2_utils.py:337-346``: keeps the set
    of unique neighbor indices and fills the remaining slots by sampling
    uniformly (with replacement) among them. Order differs from the
    reference (which relies on ``torch.unique`` sort order) but the sampled
    *distribution* matches.
    """
    b, m, s = idx.shape

    def per_ball(ball_idx, key):
        # unique via sort + first-occurrence mask
        sorted_idx = jnp.sort(ball_idx)
        is_first = jnp.concatenate([jnp.array([True]), sorted_idx[1:] != sorted_idx[:-1]])
        num_unique = jnp.sum(is_first)
        # compact unique values to the front
        order = jnp.argsort(~is_first, stable=True)
        uniq = sorted_idx[order]  # first num_unique entries are unique values
        draw = jax.random.randint(key, (s,), 0, jnp.maximum(num_unique, 1))
        slot = lax.broadcasted_iota(jnp.int32, (s, 1), 0).squeeze(-1)
        return jnp.where(slot < num_unique, uniq, uniq[draw])

    keys = jax.random.split(rng, b * m).reshape(b, m, 2)
    return jax.vmap(jax.vmap(per_ball))(idx, keys)


def group_all(xyz: jax.Array, features: jax.Array | None = None, *, use_xyz: bool = True, ret_grouped_xyz: bool = False):
    """Single group containing every point (reference ``GroupAll``,
    ``pointnet2_utils.py:379-425``), channel-last: returns (B, 1, N, 3 + C)."""
    grouped_xyz = xyz[:, None, :, :]
    if features is not None:
        grouped_features = features[:, None, :, :]
        if use_xyz:
            new_features = jnp.concatenate([grouped_xyz.astype(grouped_features.dtype), grouped_features], axis=-1)
        else:
            new_features = grouped_features
    else:
        new_features = grouped_xyz
    if ret_grouped_xyz:
        return new_features, grouped_xyz
    return new_features
