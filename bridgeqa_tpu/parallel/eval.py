"""Explicitly-sharded (``shard_map``) deployment of the rank-eval step.

The module-path eval step (:func:`bridgeqa_tpu.train.step.make_eval_step`)
shards fine under GSPMD when its inputs carry shardings — but the fused
inference Pallas kernels (``ops/scoring_layer.py``, ``ops/vit_block.py``)
are opaque to GSPMD: under a mesh it would *replicate* their operands
instead of partitioning them. ``shard_map`` sidesteps that by partitioning
the program explicitly — each device runs the complete per-shard eval body
(fused kernels included) on its slice of the batch, exactly the program the
single-chip benchmark measures.

Reference equivalent: the DDP eval loop (``scripts/eval.py:264-440``) where
each rank runs the full model on its ``DistributedSampler`` shard.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, PartitionSpec as P

from bridgeqa_tpu.train.step import StepConfig, eval_body

# batch entries that are global state shared by every sample (the ranked
# answer table), not per-sample data
REPLICATED_KEYS = ("answer_list_ids", "answer_list_mask")


def make_sharded_eval_step(model, dataset_config, step_cfg: StepConfig,
                           mesh: Mesh, k_test: int = 256,
                           replicated_keys=REPLICATED_KEYS,
                           check_vma: bool = True):
    """Build a jitted eval step whose body is ``shard_map``-ped over the
    mesh ``data`` axis.

    - ``state`` (params/batch_stats) and ``replicated_keys`` batch entries
      are replicated (``P()``);
    - every other batch array is sharded on axis 0 (``P('data')``) — the
      global batch must divide the data-axis size;
    - scalar outputs (losses/metrics) are ``pmean``-ed over the data axis;
      per-sample outputs are reassembled along axis 0.

    ``check_vma``: the varying-manual-axes checker stays ON by default —
    loop carries and pallas ``out_shape``s declare their varying axes
    explicitly (``ops/vma.py``), so new cross-shard dependencies are static
    errors. The ONE deployment that must pass ``check_vma=False`` is
    interpret-mode Pallas off-TPU (CPU tests / dryrun): JAX's HLO
    interpreter evaluates kernel bodies with vma-typed avals and trips on
    its own internal ``dynamic_slice`` index constants (JAX suggests this
    exact workaround in the error). Compiled (Mosaic) kernels on TPU don't
    have that problem.
    """
    ndata = mesh.shape["data"]

    def split(batch):
        shard = {k: v for k, v in batch.items() if k not in replicated_keys}
        table = {k: v for k, v in batch.items() if k in replicated_keys}
        return shard, table

    def local_body(state, shard_batch, table_batch):
        batch = dict(shard_batch)
        batch.update(table_batch)
        return eval_body(model, dataset_config, step_cfg, k_test, state, batch)

    def local_fn(state, shard_batch, table_batch):
        ep = local_body(state, shard_batch, table_batch)
        return {k: (jax.lax.pmean(v, "data") if v.ndim == 0 else v)
                for k, v in ep.items()}

    def out_spec_for(key, leaf):
        if key in replicated_keys or leaf.ndim == 0:
            return P()
        return P("data")

    @jax.jit
    def sharded_eval_step(state, batch):
        shard, table = split(batch)
        for k, v in shard.items():
            if v.ndim and v.shape[0] % ndata:
                raise ValueError(
                    f"batch['{k}'] axis 0 ({v.shape[0]}) must divide the "
                    f"mesh data axis ({ndata})")
        local_shapes = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct((x.shape[0] // ndata,) + x.shape[1:], x.dtype),
            shard)
        state_shapes = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), state)
        table_shapes = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), table)
        # trace the pmean-free body for shapes (pmean is shape-preserving but
        # needs a bound mesh axis, which only exists inside shard_map)
        out_shapes = jax.eval_shape(local_body, state_shapes, local_shapes, table_shapes)
        out_specs = {k: out_spec_for(k, v) for k, v in out_shapes.items()}
        in_batch_specs = {k: P("data") for k in shard}
        return jax.shard_map(
            local_fn, mesh=mesh,
            in_specs=(P(), in_batch_specs, P()),
            out_specs=out_specs,
            check_vma=check_vma,
        )(state, shard, table)

    return sharded_eval_step
