"""Real-data parity dry-dock: reference checkpoint -> converter -> forward
-> predictions, with an optional diff against the torch reference.

Round-1 verdict item 10. The moment a real reference checkpoint
(``model.pth`` from ``scripts/train.py`` of the reference) and a real scene
are available, this script:

1. converts the torch state dict onto our BridgeQA tree
   (``utils/bridgeqa_checkpoint.convert_scanqa``) and reports any
   shape-mismatched / unmapped keys;
2. runs the detector (+ BLIP rank path when the checkpoint carries
   ``blip_model.*`` weights) on the scene;
3. decodes boxes through the same NMS configuration as ``predict.py`` and
   writes ``parity_report.json`` with boxes/answers;
4. with ``--expected`` (a JSON of reference outputs for the same inputs,
   produced by running the reference's ``scripts/predict.py``), diffs boxes
   (max |corner delta|) and answers (exact-match) and reports PASS/FAIL.

Usage (detector-only, synthetic scene — the plumbing self-test):
  python scripts/verify_parity.py --checkpoint ckpt.pth --synthetic --out report.json
Real data:
  python scripts/verify_parity.py --checkpoint model.pth --scene_npy scene0000_00.npy \
      --question "what color is the chair" --image view.jpg --answer_vocab vocab.json
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--checkpoint", required=True, help="reference torch model.pth")
    p.add_argument("--scene_npy", default=None, help="scene _aligned_vert.npy")
    p.add_argument("--synthetic", action="store_true", help="random 20k-point scene")
    p.add_argument("--num_points", type=int, default=20000)
    p.add_argument("--question", default=None)
    p.add_argument("--image", default=None, help="best-view image for the question")
    p.add_argument("--answer_vocab", default=None, help="answer_vocab.json of the run")
    p.add_argument("--vocab_txt", default=None, help="bert-base-uncased vocab.txt")
    p.add_argument("--k_test", type=int, default=256)
    p.add_argument("--num_proposal", type=int, default=256)
    p.add_argument("--expected", default=None,
                   help="JSON of reference outputs to diff against")
    p.add_argument("--box_tol", type=float, default=1e-3)
    p.add_argument("--tiny_backbone", action="store_true",
                   help="scaled-down SA npoints (fast plumbing checks on CPU)")
    p.add_argument("--out", default="parity_report.json")
    return p.parse_args(argv)


def load_points(args):
    if args.synthetic or args.scene_npy is None:
        rng = np.random.RandomState(0)
        return ((rng.rand(args.num_points, 3) - 0.5) * 6.0).astype(np.float32)
    verts = np.load(args.scene_npy)
    pts = verts[:, :3].astype(np.float32)
    # 40k/20k random sample like the dataset (dataset.py:415)
    idx = np.random.RandomState(0).choice(len(pts), args.num_points,
                                          replace=len(pts) < args.num_points)
    return pts[idx]


def main(argv=None):
    args = parse_args(argv)
    import jax
    import jax.numpy as jnp
    import torch

    # Bitwise box comparison is this tool's contract: pin the ball-query
    # EXACT mode (the TPU default is the stripe kernel — distribution-
    # equivalent but not bitwise vs the reference's in-order fill).
    from bridgeqa_tpu.ops import grouping as _grouping

    _grouping.FORCE_MODE = "exact"

    from bridgeqa_tpu.data.scannet_config import ScannetDatasetConfig
    from bridgeqa_tpu.eval.detection_eval import parse_predictions
    from bridgeqa_tpu.models.bridgeqa import BridgeQA, BridgeQAConfig
    from bridgeqa_tpu.utils.blip_checkpoint import merge_pretrained
    from bridgeqa_tpu.utils.bridgeqa_checkpoint import convert_scanqa

    ckpt = torch.load(args.checkpoint, map_location="cpu")
    sd = ckpt.get("model", ckpt) if isinstance(ckpt, dict) else ckpt
    sd = {k.removeprefix("module."): (v.numpy() if hasattr(v, "numpy") else np.asarray(v))
          for k, v in sd.items()}
    has_blip = any(k.startswith("blip_model.") for k in sd)

    converted = convert_scanqa(sd)
    dc = ScannetDatasetConfig()

    num_answers = 1
    answer_vocab = None
    if args.answer_vocab:
        with open(args.answer_vocab) as f:
            answer_vocab = json.load(f)
            if isinstance(answer_vocab, dict):
                answer_vocab = answer_vocab.get("answers", list(answer_vocab))
        num_answers = len(answer_vocab)

    stage = "VQA" if has_blip else "DET"
    backbone_kw = {}
    if args.tiny_backbone:
        backbone_kw = dict(backbone_sa_npoints=(128, 64, 32, 16),
                           backbone_sa_nsamples=(8, 8, 8, 8))
    cfg = BridgeQAConfig(num_answers=max(num_answers, 1), num_proposal=args.num_proposal,
                         stage=stage, **backbone_kw)
    model = BridgeQA(cfg, mean_size_arr=dc.mean_size_arr)

    points = load_points(args)[None]  # (1, N, 3)
    batch = {"point_clouds": jnp.asarray(points)}
    report = {"checkpoint": args.checkpoint, "stage": stage}

    if stage == "DET":
        variables = model.init(jax.random.PRNGKey(0), batch, train=False)
    else:
        from bridgeqa_tpu.data.tokenization import (
            WordPieceTokenizer,
            make_answer_list,
            make_question_batch,
        )

        if args.vocab_txt:
            tok = WordPieceTokenizer.from_vocab_file(args.vocab_txt)
        else:
            from scripts.common import synthetic_tokenizer

            tok = synthetic_tokenizer()
        q_ids, q_mask = make_question_batch(tok, [args.question or "what is this"], 80)
        batch.update(question_ids=jnp.asarray(q_ids), question_mask=jnp.asarray(q_mask))
        if args.image:
            from PIL import Image

            from bridgeqa_tpu.data.views import preprocess_vqa

            batch["images"] = jnp.asarray(
                preprocess_vqa(np.asarray(Image.open(args.image).convert("RGB")))[None])
        else:
            batch["images"] = jnp.zeros((1, 480, 480, 3), jnp.float32)
        ids, mask = make_answer_list(tok, answer_vocab or ["yes", "no"], 12)
        batch["answer_list_ids"] = jnp.asarray(ids)
        batch["answer_list_mask"] = jnp.asarray(mask)
        variables = model.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            batch, train=False, inference="rank", k_test=min(args.k_test, num_answers),
        )

    merged_params, loaded, skipped = merge_pretrained(variables["params"],
                                                      converted["params"])
    merged_stats, loaded_s, skipped_s = merge_pretrained(
        variables.get("batch_stats", {}), converted["batch_stats"])
    report["params_loaded"] = len(loaded) + len(loaded_s)
    report["params_skipped"] = [s for s in skipped + skipped_s if "no such param" not in s]
    variables = {"params": merged_params, "batch_stats": merged_stats}

    if stage == "DET":
        out = model.apply(variables, batch, train=False)
    else:
        out = model.apply(variables, batch, train=False, inference="rank",
                          k_test=min(args.k_test, num_answers))
    ep = {k: np.asarray(v) for k, v in out.items() if hasattr(v, "shape")}
    ep["point_clouds"] = points
    cfg_dict = dict(dataset_config=dc, remove_empty_box=False, use_3d_nms=True,
                    cls_nms=True, nms_iou=0.25, use_old_type_nms=False, conf_thresh=0.05,
                    per_class_proposal=True)
    preds = parse_predictions(ep, cfg_dict)
    report["num_boxes_kept"] = len(preds[0]) // dc.num_class
    report["bbox_corners"] = np.asarray(out["bbox_corner"])[0].tolist()
    report["objectness"] = np.asarray(out["objectness_scores"])[0].tolist()
    if "answer_scores" in out and answer_vocab:
        scores = np.asarray(out["answer_scores"])[0]
        top10 = np.argsort(-scores)[:10]
        report["answer_top10"] = [answer_vocab[i] for i in top10]

    if args.expected:
        with open(args.expected) as f:
            exp = json.load(f)
        diffs = {}
        if "bbox_corners" in exp:
            ours = np.asarray(report["bbox_corners"])
            theirs = np.asarray(exp["bbox_corners"])
            diffs["bbox_max_abs_delta"] = float(np.abs(ours - theirs).max())
            diffs["bbox_ok"] = bool(diffs["bbox_max_abs_delta"] < args.box_tol)
        if "answer_top10" in exp and "answer_top10" in report:
            diffs["answer_top1_match"] = report["answer_top10"][0] == exp["answer_top10"][0]
            diffs["answer_top10_overlap"] = len(
                set(report["answer_top10"]) & set(exp["answer_top10"]))
        report["diff"] = diffs
        report["pass"] = all(v for k, v in diffs.items() if k.endswith(("_ok", "_match")))

    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    kept = report["num_boxes_kept"]
    print(f"wrote {args.out}: {report['params_loaded']} params loaded, "
          f"{len(report['params_skipped'])} skipped, {kept} boxes kept"
          + (f", pass={report.get('pass')}" if args.expected else ""))
    return report


if __name__ == "__main__":
    main()
