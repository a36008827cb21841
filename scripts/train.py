"""Train BridgeQA-TPU (DET pretraining or VQA stage).

Equivalent of the reference ``scripts/train.py`` (argparse surface 40-179,
3-group AdamW routing 385-417, Solver hookup) — torchrun/DDP replaced by a
sharded jit over the device mesh. Run metadata (``info.json``,
``answer_vocab.json``) is written like ``train.py:495-512`` so
predict/eval can replay the configuration.

Demo (no ScanNet): ``python scripts/train.py --synthetic --tiny --epochs 1``
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from bridgeqa_tpu.data.tokenization import make_answer_list
from bridgeqa_tpu.eval.qa_eval import get_eval
from bridgeqa_tpu.parallel import make_mesh
from bridgeqa_tpu.train import checkpoints
from bridgeqa_tpu.train.optim import OptimConfig, build_optimizer
from bridgeqa_tpu.train.solver import Solver, SolverConfig
from bridgeqa_tpu.train.step import StepConfig, TrainState
from bridgeqa_tpu.utils.logging_utils import RunLogger
from scripts import common


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    common.add_model_args(p)
    common.add_data_args(p)
    p.add_argument("--tag", type=str, default="debug")
    p.add_argument("--output_root", type=str, default="runs")
    p.add_argument("--epochs", type=int, default=30)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--lr", type=float, default=5e-4)
    p.add_argument("--lr_blip", type=float, default=1e-4)
    p.add_argument("--lr_blip3d", type=float, default=1e-4)
    p.add_argument("--wd", type=float, default=1e-5)
    p.add_argument("--lr_decay_step", type=int, nargs="+", default=[100, 200])
    p.add_argument("--lr_decay_step_2d", type=int, nargs="+", default=[100, 200])
    p.add_argument("--lr_decay_rate", type=float, default=0.2)
    p.add_argument("--scheduler_type", type=str, default="step",
                   choices=["step", "step_except_2d", "linear", "cosine", "none"])
    p.add_argument("--val_step", type=int, default=2000)
    p.add_argument("--verbose", type=int, default=50)
    p.add_argument("--cur_criterion", type=str, default="answer_acc_at1")
    p.add_argument("--max_iters_per_epoch", type=int, default=0)
    p.add_argument("--k_test", type=int, default=256)
    p.add_argument("--tp", type=int, default=1,
                   help="tensor-parallel size (mesh model axis; Megatron-style "
                        "column/row kernel sharding, beyond the reference's dp-only)")
    p.add_argument("--distributed", action="store_true",
                   help="multi-host: jax.distributed.initialize() (coordinator from env: "
                        "JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID, or "
                        "cloud TPU metadata); batch_size is PER PROCESS")
    p.add_argument("--use_checkpoint", type=str, default=None,
                   help="run dir to resume from (checkpoint.tar equivalent)")
    p.add_argument("--first_stage_ckpt_path", type=str, default=None,
                   help="DET-stage run dir: load detector weights")
    p.add_argument("--trace_dir", type=str, default=None)
    p.add_argument("--tensorboard", action="store_true",
                   help="also write TB event files under <run>/tb (tensorboardX)")
    p.add_argument("--wandb", action="store_true",
                   help="log scalars to wandb (no-op if wandb is not installed)")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    if args.distributed:
        # multi-host entry — replaces torchrun + NCCL env:// init
        # (reference scripts/train.py:181-187)
        from bridgeqa_tpu.parallel import initialize_distributed

        initialize_distributed()
    if args.stage == "DET":
        args.no_answer = True  # train.py:632-636
        args.no_blip = True
        args.no_lang_cls = True
        args.cur_criterion = "loss"

    run_dir = os.path.join(args.output_root, args.tag)
    logger = RunLogger(run_dir, tensorboard=args.tensorboard, wandb=args.wandb)
    logger.info(f"process {jax.process_index()}/{jax.process_count()}, "
                f"devices: {jax.local_device_count()} local / {len(jax.devices())} global")

    datasets, tokenizer, answer_cands, answer_counter = common.build_datasets(args)
    logger.info(f"train {len(datasets['train'])} / val {len(datasets['val'])} samples, "
                f"{len(answer_cands)} answers")
    model, cfg, dc = common.build_model(args, num_answers=max(len(answer_cands), 1))

    # per-process loader shards (the DistributedSampler equivalent,
    # reference train.py:241-247); shard_batch assembles the global array
    train_loader = common.make_loader(datasets["train"], args, shuffle=True, seed=args.seed,
                                      num_shards=jax.process_count(),
                                      shard_index=jax.process_index())
    val_loader = common.make_loader(datasets["val"], args, shuffle=False,
                                    num_shards=jax.process_count(),
                                    shard_index=jax.process_index())

    # --- init params from one example batch
    example = next(iter(train_loader))
    arrays = {k: v for k, v in example.items() if isinstance(v, np.ndarray)}
    rng = jax.random.PRNGKey(args.seed)
    variables = model.init({"params": rng, "dropout": jax.random.PRNGKey(args.seed + 1)},
                           arrays, train=True)

    if args.first_stage_ckpt_path:
        # two-stage flow (qa_module.py:386-407): graft detector weights
        restored = checkpoints.load_params(args.first_stage_ckpt_path, "model_last")
        params = dict(variables["params"])
        params["detector"] = restored["params"]["detector"]
        variables = {**variables, "params": params}
        logger.info(f"loaded stage-1 detector from {args.first_stage_ckpt_path}")

    steps_per_epoch = max(len(train_loader), 1)
    opt_cfg = OptimConfig(lr=args.lr, lr_blip=args.lr_blip, lr_blip3d=args.lr_blip3d,
                          wd=args.wd, lr_decay_step=tuple(args.lr_decay_step),
                          lr_decay_step_2d=tuple(args.lr_decay_step_2d),
                          lr_decay_rate=args.lr_decay_rate,
                          scheduler_type=args.scheduler_type,
                          steps_per_epoch=steps_per_epoch, total_epochs=args.epochs)
    tx, _ = build_optimizer(variables["params"], opt_cfg)
    state = TrainState.create(variables, tx)
    start_epoch = 0
    if args.use_checkpoint:
        state, start_epoch = checkpoints.load_train_state(args.use_checkpoint, state)
        logger.info(f"resumed from {args.use_checkpoint} at epoch {start_epoch}")

    # data axis must divide the global batch; drop devices if it doesn't
    # (single-process only — a multi-host mesh must contain every process's
    # local devices, so there the division is a hard requirement)
    global_batch = args.batch_size * jax.process_count()
    n_dev = len(jax.devices())
    tp = max(args.tp, 1)
    if n_dev % tp:
        raise ValueError(f"--tp {tp} must divide the device count {n_dev}")
    if jax.process_count() > 1:
        if global_batch % (n_dev // tp):
            raise ValueError(f"global batch {global_batch} must divide over {n_dev // tp} "
                             "data-parallel ranks")
    else:
        while global_batch % (n_dev // tp):
            n_dev -= tp
    mesh = make_mesh(jax.devices()[:n_dev], model_axis=tp)
    if n_dev != len(jax.devices()):
        logger.info(f"using {n_dev}/{len(jax.devices())} devices (batch {args.batch_size})")
    from bridgeqa_tpu.parallel import replicate_array, replicated_sharding, shard_params_tp

    if jax.process_count() > 1:
        state = jax.tree.map(lambda a: replicate_array(np.asarray(a), mesh), state)
    elif tp > 1:
        sharded_params = shard_params_tp(state.params, mesh)
        state = state.replace(
            params=sharded_params,
            opt_state=tx.init(sharded_params),  # moments inherit the TP shardings
            batch_stats=jax.device_put(state.batch_stats, replicated_sharding(mesh)),
            step=jax.device_put(state.step, replicated_sharding(mesh)),
        )
        logger.info(f"tensor parallelism: model axis {tp}")
    else:
        state = jax.device_put(state, replicated_sharding(mesh))

    step_cfg = StepConfig(detection=True, use_reference=not args.no_reference,
                          use_lang_classifier=not args.no_lang_cls,
                          use_answer=not args.no_answer)
    solver_cfg = SolverConfig(epochs=args.epochs, val_step=args.val_step,
                              verbose_step=args.verbose, cur_criterion=args.cur_criterion,
                              criterion_higher_better=args.cur_criterion != "loss",
                              k_test=args.k_test,
                              max_iters_per_epoch=args.max_iters_per_epoch,
                              trace_dir=args.trace_dir)

    extra_eval = {}
    if not args.no_blip and args.stage != "DET":
        ids, mask = make_answer_list(tokenizer, answer_cands, args.answer_len)
        extra_eval = {"answer_list_ids": ids, "answer_list_mask": mask}

    SCALAR_EVAL_KEYS = ("ref_acc_mean", "ref_iou_rate_0.25", "ref_iou_rate_0.5", "lang_acc",
                        "obj_acc", "sem_acc", "answer_acc_at1", "answer_acc_at10",
                        "answer_acc_at1_scene", "answer_acc_at1_2d", "answer_acc_at1_2d3d")

    def eval_metrics(end_points, host_batch):
        ep = get_eval(end_points, dc, use_lang_classifier=not args.no_lang_cls)
        return {k: ep[k] for k in SCALAR_EVAL_KEYS if k in ep}

    def predictions(end_points, host_batch):
        """Per-sample rows for the best-val CSV (solver.py:623-656 schema)."""
        if "answer_scores" not in end_points or "question_id_str" not in host_batch:
            return []
        import numpy as _np

        scores = _np.asarray(jax.device_get(end_points["answer_scores"]))
        top1 = scores.argmax(axis=1)
        rows = []
        for i, qid in enumerate(host_batch["question_id_str"]):
            rows.append({
                "question_id": qid,
                "scene_id": host_batch["scene_id_str"][i],
                "question": host_batch["question"][i],
                "pred_answer": answer_cands[top1[i]] if answer_cands else "",
                "gt_answers": host_batch["answers"][i],
            })
        return rows

    solver = Solver(model, dc, tx, step_cfg, solver_cfg, mesh=mesh, run_dir=run_dir,
                    logger=logger, eval_metrics_fn=eval_metrics,
                    extra_eval_inputs=extra_eval, predictions_fn=predictions)

    if jax.process_index() == 0:
        checkpoints.save_run_info(run_dir, common.args_to_dict(args))
        checkpoints.save_answer_vocab(run_dir, answer_cands, answer_counter)
        with open(os.path.join(run_dir, "cmdline.txt"), "w") as f:  # solver.py:331-336
            f.write(" ".join(sys.argv) + "\n")

    state = solver(state, train_loader, val_loader, rng=jax.random.PRNGKey(args.seed + 2),
                   start_epoch=start_epoch)
    logger.info(f"done; best {args.cur_criterion}={solver.best_criterion:.4f} "
                f"@ epoch {solver.best_epoch + 1}")
    return solver


if __name__ == "__main__":
    main()
