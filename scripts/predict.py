"""Produce ``pred.<split>.json`` from a trained run.

Equivalent of the reference ``scripts/predict.py:222-421``: replays the run
configuration from ``info.json`` (``overwrite_config``, 382-389), restores
the best ``model`` checkpoint, and for every batch runs rank inference +
objectness-masked grounding. Output records mirror the reference schema
(``predict.py:353-358``): scene_id, question_id, answer_top10, bbox
(8 corners of the grounded proposal).

TPU-first: box decoding, NMS masking and answer top-10 all happen inside
the jitted forward — the host only formats JSON.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from bridgeqa_tpu.data.tokenization import make_answer_list
from bridgeqa_tpu.eval.detection_eval import parse_predictions_device
from bridgeqa_tpu.train import checkpoints
from scripts import common


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--run_dir", type=str, required=True)
    p.add_argument("--split", type=str, default="val",
                   choices=["val", "test_w_obj", "test_wo_obj", "train"])
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--k_test", type=int, default=256)
    p.add_argument("--nms_iou", type=float, default=0.25)
    p.add_argument("--open_ended", action="store_true",
                   help="also beam-search a free-form answer per question "
                        "(reference predict.py's open-ended generation path)")
    p.add_argument("--num_beams", type=int, default=5)
    p.add_argument("--gen_max_length", type=int, default=20)
    p.add_argument("--output_attention", action="store_true",
                   help="dump the last twin-encoder layer's 2d/3d self/cross "
                        "attention probs per sample (reference "
                        "predict.py:359-365)")
    return p.parse_args(argv)


def overwrite_config(args, info: dict):
    """Reconstruct the train-time namespace (``utils/misc.py:38``)."""
    merged = argparse.Namespace(**info)
    merged.run_dir = args.run_dir
    merged.split = args.split
    merged.k_test = args.k_test
    merged.nms_iou = args.nms_iou
    if args.batch_size:
        merged.batch_size = args.batch_size
    merged.use_unanswerable = True  # predict.py uses the full split
    return merged


def main(argv=None):
    cli = parse_args(argv)
    info = checkpoints.load_run_info(cli.run_dir)
    args = overwrite_config(cli, info)

    answer_cands, answer_counter = checkpoints.load_answer_vocab(cli.run_dir)
    split = "val" if args.split in ("train", "val") else args.split
    datasets, tokenizer, _, _ = common.build_datasets(args, splits=(split,))
    dataset = datasets[split]
    # predictions must index the run's answer vocab, not a rebuilt one
    from bridgeqa_tpu.data.answers import Answer

    dataset.answer_cands = answer_cands
    dataset.answer_vocab = Answer(answer_cands)
    dataset.num_answers = len(answer_cands)

    model, cfg, dc = common.build_model(args, num_answers=len(answer_cands))
    restored = checkpoints.load_params(cli.run_dir, "model")
    variables = {"params": restored["params"], "batch_stats": restored.get("batch_stats", {})}

    ids, mask = make_answer_list(tokenizer, answer_cands, args.answer_len)
    answer_list = {"answer_list_ids": ids, "answer_list_mask": mask}

    ATTN_KEYS = ("2d_self_attention", "3d_self_attention",
                 "2d_cross_attention", "3d_cross_attention")

    @jax.jit
    def infer(batch):
        out = model.apply(variables, batch, train=False, inference="rank", k_test=args.k_test,
                          output_attentions=cli.output_attention)
        # objectness-masked grounding + on-device NMS suppression
        dev = parse_predictions_device(
            out["center"], out["heading_scores"], out["heading_residuals"],
            out["size_scores"], out["size_residuals"], out["sem_cls_scores"],
            out["objectness_scores"], batch["point_clouds"],
            jnp.asarray(dc.mean_size_arr, jnp.float32),
            num_heading_bin=dc.num_heading_bin, nms_iou=args.nms_iou,
        )
        pred_mask = dev["pred_mask"].astype(jnp.float32)
        masked_ref = out["cluster_ref"] - 1e6 * (1.0 - pred_mask)
        grounded = jnp.argmax(masked_ref, axis=1)
        corners = jnp.take_along_axis(out["bbox_corner"], grounded[:, None, None, None]
                                      .repeat(8, 2).repeat(3, 3), axis=1)[:, 0]
        top10 = jnp.argsort(-out["answer_scores"], axis=1)[:, :10]
        attn = {k: out[k] for k in ATTN_KEYS if k in out}
        return top10, corners, out["answer_scores"], attn

    generate = None
    if cli.open_ended:
        @jax.jit
        def generate(batch):
            out = model.apply(variables, batch, train=False, inference="generate",
                              num_beams=cli.num_beams, max_length=cli.gen_max_length)
            return out["generated_ids"]

    loader = common.make_loader(dataset, args, shuffle=False)
    preds = []
    for batch in loader:
        arrays = {k: jnp.asarray(v) for k, v in batch.items() if not isinstance(v, list)}
        arrays.update({k: jnp.asarray(v) for k, v in answer_list.items()})
        top10, corners, _, attn = jax.device_get(infer(arrays))
        gen_texts = None
        if generate is not None:
            gen_ids = np.asarray(jax.device_get(generate(arrays)))
            gen_texts = [tokenizer.decode(row) for row in gen_ids]
        for i in range(len(batch["question_id_str"])):
            rec = {
                "scene_id": batch["scene_id_str"][i],
                "question_id": batch["question_id_str"][i],
                "question": batch["question"][i],
                "answer_top10": [answer_cands[j] for j in top10[i]],
                "bbox": np.asarray(corners[i]).tolist(),
            }
            if gen_texts is not None:
                rec["open_ended_answer"] = gen_texts[i]
            for k, v in attn.items():  # reference predict.py:359-365
                rec[k] = np.asarray(v[i]).tolist()
            preds.append(rec)

    out_path = os.path.join(cli.run_dir, f"pred.{cli.split}.json")
    with open(out_path, "w") as f:
        json.dump(preds, f, indent=2)
    print(f"wrote {len(preds)} predictions -> {out_path}")
    return preds


if __name__ == "__main__":
    main()
