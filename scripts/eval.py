"""Evaluate a trained run: QA metrics (--qa) and/or detector mAP (--detection).

Equivalent of the reference ``scripts/eval.py`` (``eval_qa`` 264-440,
``eval_det`` 442-507): restores the run, loops the val split, and reports
EM@1/EM@10, grounding IoU rates, objectness/semantic accuracy, and
AP@0.25/0.5 through the APCalculator. Metric math runs on-device; only AP's
variable-length per-scan lists are host-side.

Alongside the aggregate ``score.<split>.json`` this writes the reference's
per-sample artifacts (``eval.py:301-303,383-420``): ``pred.<split>.pkl``
({scene_id: {question_id: {pred_bbox, gt_bbox, iou, pred_answers_at10}}}),
its flattened ``pred.<split>.pkl.json`` conversion, and
``score.<split>.pkl`` (per-batch metric lists per trial) — schema-compatible
with the reference's downstream consumers and ``verify_parity.py`` diffing.
"""

import argparse
import json
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from bridgeqa_tpu.data.answers import Answer
from bridgeqa_tpu.data.tokenization import make_answer_list
from bridgeqa_tpu.eval.detection_eval import APCalculator, parse_groundtruths, parse_predictions
from bridgeqa_tpu.eval.qa_eval import get_eval
from bridgeqa_tpu.losses import get_loss
from bridgeqa_tpu.train import checkpoints
from bridgeqa_tpu.utils.logging_utils import RunningMeans
from scripts import common
from scripts.predict import overwrite_config


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--run_dir", type=str, required=True)
    p.add_argument("--split", type=str, default="val")
    p.add_argument("--qa", action="store_true")
    p.add_argument("--detection", action="store_true")
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--k_test", type=int, default=256)
    p.add_argument("--nms_iou", type=float, default=0.25)
    p.add_argument("--repeat", type=int, default=1,
                   help="number of seeded eval trials; per-trial metric lists are "
                        "stacked into score.<split>.pkl (reference eval.py:297-312,517)")
    p.add_argument("--seed", type=int, default=42, help="base seed; trial t uses seed+t")
    p.add_argument("--force", action="store_true")
    return p.parse_args(argv)


SCALAR_KEYS = ("loss", "ref_acc_mean", "ref_iou_rate_0.25", "ref_iou_rate_0.5", "lang_acc",
               "obj_acc", "sem_acc", "answer_acc_at1", "answer_acc_at10",
               "answer_acc_at1_scene", "answer_acc_at1_2d", "answer_acc_at1_2d3d",
               "pos_ratio", "neg_ratio")


def _accumulate_qa(cli, batch, end_points, agg, batch_lists, predictions, answer_cands):
    """Fold one eval batch into the running means, the per-batch metric
    lists, and the per-sample prediction records (reference eval.py:318-420)."""
    agg.update(jax.device_get({k: end_points[k] for k in SCALAR_KEYS if k in end_points}))
    per = jax.device_get({k: end_points[k] for k in
                          ("ref_acc", "ref_iou", "pred_bboxes", "gt_bboxes",
                           "pred_answers_at10", "lang_acc",
                           "answer_acc_at1", "answer_acc_at10")
                          if k in end_points})
    batch_lists["ref_acc"] += np.asarray(per["ref_acc"]).tolist()
    batch_lists["ious"] += np.asarray(per["ref_iou"]).tolist()
    if "lang_acc" in per:
        batch_lists["lang_acc"].append(float(per["lang_acc"]))
    batch_lists["answer_acc_at1"].append(float(per["answer_acc_at1"]))
    batch_lists["answer_acc_at10"].append(float(per["answer_acc_at10"]))
    for i in range(len(batch["question_id_str"])):
        scene_id = batch["scene_id_str"][i]
        qid = batch["question_id_str"][i]
        rec = predictions.setdefault(scene_id, {}).setdefault(qid, {})
        rec["pred_bbox"] = np.asarray(per["pred_bboxes"][i])
        rec["gt_bbox"] = np.asarray(per["gt_bboxes"][i])
        rec["iou"] = float(per["ref_iou"][i])
        if "pred_answers_at10" in per:
            rec["pred_answers_at10"] = [
                answer_cands[j] if j < len(answer_cands) else "<pad>"
                for j in np.asarray(per["pred_answers_at10"][i])]


def main(argv=None):
    cli = parse_args(argv)
    if not (cli.qa or cli.detection):
        cli.qa = True
    info = checkpoints.load_run_info(cli.run_dir)
    args = overwrite_config(cli, info)

    answer_cands, _ = checkpoints.load_answer_vocab(cli.run_dir)
    datasets, tokenizer, _, _ = common.build_datasets(args, splits=(cli.split,))
    dataset = datasets[cli.split]
    dataset.answer_cands = answer_cands
    dataset.answer_vocab = Answer(answer_cands)
    dataset.num_answers = len(answer_cands)

    model, cfg, dc = common.build_model(args, num_answers=len(answer_cands))
    restored = checkpoints.load_params(cli.run_dir, "model")
    variables = {"params": restored["params"], "batch_stats": restored.get("batch_stats", {})}

    detection_only = info.get("stage") == "DET" or info.get("no_blip")
    extra = {}
    if not detection_only:
        ids, mask = make_answer_list(tokenizer, answer_cands, args.answer_len)
        extra = {"answer_list_ids": jnp.asarray(ids), "answer_list_mask": jnp.asarray(mask)}

    @jax.jit
    def eval_step(batch):
        out = model.apply(variables, batch, train=False, inference="rank", k_test=args.k_test)
        end_points = dict(batch)
        end_points.update(out)
        _, end_points = get_loss(end_points, dc, detection=True,
                                 use_reference=not info.get("no_reference", False),
                                 use_lang_classifier=not info.get("no_lang_cls", False),
                                 use_answer=False)
        end_points = get_eval(end_points, dc,
                              use_lang_classifier=not info.get("no_lang_cls", False))
        return end_points

    agg = RunningMeans()
    ap25 = APCalculator(0.25, dc.class2type)
    ap50 = APCalculator(0.5, dc.class2type)

    # per-sample records + per-trial stacks of per-batch metric lists
    # (reference eval.py:297-312,318-420: --repeat runs N seeded trials and
    # stacks each trial's metric lists into score.<split>.pkl)
    predictions = {}
    trial_lists = {"ref_acc": [], "lang_acc": [], "answer_acc_at1": [],
                   "answer_acc_at10": [], "ious": []}

    for trial in range(max(1, cli.repeat)):
        # reseed the dataset's point sampling / augmentation stream per trial
        dataset.seed = cli.seed + trial
        dataset.rng = np.random.RandomState(dataset.seed)
        loader = common.make_loader(dataset, args, shuffle=False, seed=dataset.seed)
        batch_lists = {k: [] for k in trial_lists}
        first_trial = trial == 0

        for batch in loader:
            arrays = {k: jnp.asarray(v) for k, v in batch.items() if not isinstance(v, list)}
            arrays.update(extra)
            end_points = eval_step(arrays)
            if cli.qa:
                _accumulate_qa(cli, batch, end_points, agg if first_trial else RunningMeans(),
                               batch_lists, predictions if first_trial else {}, answer_cands)
            if cli.detection and first_trial:
                cfg_dict = {"dataset_config": dc, "nms_iou": cli.nms_iou}
                # parse_* expect host-accessible arrays
                ep = {k: v for k, v in end_points.items()
                      if isinstance(v, (jnp.ndarray, np.ndarray)) or hasattr(v, "shape")}
                pred = parse_predictions(ep, cfg_dict)
                gt = parse_groundtruths(ep, cfg_dict)
                ap25.step(pred, gt)
                ap50.step(pred, gt)
        for k in trial_lists:
            trial_lists[k].append(batch_lists[k])

    results = {}
    if cli.qa:
        results["qa"] = agg.means()
        # reference eval.py:301-303,383-420: per-sample pkl + json conversion
        pred_path = os.path.join(cli.run_dir, f"pred.{cli.split}.pkl")
        with open(pred_path, "wb") as f:
            pickle.dump(predictions, f)
        conved = []
        for scene_id, scene in predictions.items():
            for qid, inst in scene.items():
                inst = {k: v.tolist() if isinstance(v, np.ndarray) else v
                        for k, v in inst.items()}
                inst.update({"scene_id": scene_id, "question_id": qid})
                inst["answer_top10"] = inst.pop("pred_answers_at10", [])
                inst["bbox"] = inst.pop("pred_bbox")
                conved.append(inst)
        with open(pred_path + ".json", "w") as f:
            json.dump(conved, f)
        with open(os.path.join(cli.run_dir, f"score.{cli.split}.pkl"), "wb") as f:
            # one list per trial, stacked (reference eval.py:297-312,517)
            pickle.dump(trial_lists, f)
    if cli.detection:
        for name, calc in (("mAP@0.25", ap25), ("mAP@0.5", ap50)):
            m = calc.compute_metrics()
            results[name] = {k: float(v) for k, v in m.items()}

    out_path = os.path.join(cli.run_dir, f"score.{cli.split}.json")
    with open(out_path, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results, indent=2))
    return results


if __name__ == "__main__":
    main()
