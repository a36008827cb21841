"""End-to-end driver tests: train (synthetic, tiny) -> checkpoints ->
predict -> score, exercising Solver, Orbax checkpointing, and the CLI
surface the reference exposes (train/predict/eval/score)."""

import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="module")
def run_dir(tmp_path_factory):
    from scripts import train as train_script

    out_root = str(tmp_path_factory.mktemp("runs"))
    solver = train_script.main([
        "--synthetic", "--tiny", "--epochs", "1", "--batch_size", "4",
        "--num_points", "2048", "--max_iters_per_epoch", "2", "--val_step", "0",
        "--verbose", "1", "--k_test", "8",
        "--output_root", out_root, "--tag", "t",
    ])
    return os.path.join(out_root, "t"), solver


class TestTrainDriver:
    def test_artifacts_written(self, run_dir):
        d, _ = run_dir
        for name in ("info.json", "answer_vocab.json", "log.txt", "metrics.jsonl",
                     "model", "model_last", "checkpoint", "cmdline.txt",
                     "predictions.csv"):
            assert os.path.exists(os.path.join(d, name)), name

    def test_metrics_logged_finite(self, run_dir):
        d, _ = run_dir
        with open(os.path.join(d, "metrics.jsonl")) as f:
            recs = [json.loads(l) for l in f]
        train_recs = [r for r in recs if r["phase"] == "train"]
        val_recs = [r for r in recs if r["phase"] == "val"]
        assert train_recs and val_recs
        for r in recs:
            for k, v in r.items():
                if isinstance(v, float):
                    assert np.isfinite(v), (k, r)

    def test_resume_restores_epoch(self, run_dir):
        d, _ = run_dir
        from bridgeqa_tpu.train import checkpoints
        from bridgeqa_tpu.train.optim import OptimConfig, build_optimizer
        from bridgeqa_tpu.train.step import TrainState

        restored = checkpoints.load_params(d, "model_last")
        assert "params" in restored

        # full-state resume round trip
        info = checkpoints.load_run_info(d)
        assert info["tiny"] is True


class TestPredictScore:
    def test_predict_writes_json(self, run_dir):
        d, _ = run_dir
        from scripts import predict as predict_script

        preds = predict_script.main(["--run_dir", d, "--split", "val", "--k_test", "8"])
        assert preds
        p0 = preds[0]
        assert set(p0) >= {"scene_id", "question_id", "answer_top10", "bbox"}
        assert len(p0["answer_top10"]) <= 10
        bbox = np.asarray(p0["bbox"])
        assert bbox.shape == (8, 3)
        assert np.isfinite(bbox).all()

    def test_predict_open_ended(self, run_dir):
        d, _ = run_dir
        from scripts import predict as predict_script

        preds = predict_script.main(["--run_dir", d, "--split", "val", "--k_test", "4",
                                     "--open_ended", "--num_beams", "2",
                                     "--gen_max_length", "5"])
        assert preds and "open_ended_answer" in preds[0]
        assert isinstance(preds[0]["open_ended_answer"], str)

    def test_score_pipeline(self, run_dir):
        d, _ = run_dir
        from scripts import score as score_script

        results = score_script.main(["--run_dir", d, "--split", "val"])
        assert "EM@1" in results and "BLEU-1" in results and "CIDEr" in results
        assert 0.0 <= results["EM@1"] <= 100.0


class TestParallelshareDriver:
    def test_train_step_parallelshare(self, tmp_path):
        """The --scene_feature_position parallelshare CLI mode wires through
        BridgeQA end-to-end: one decoder (no text_decoder_scene params), the
        alternate LayerNorm bank present, train step finite."""
        from scripts import train as train_script

        solver = train_script.main([
            "--synthetic", "--tiny", "--epochs", "1", "--batch_size", "2",
            "--num_points", "1024", "--max_iters_per_epoch", "1", "--val_step", "0",
            "--k_test", "4", "--scene_feature_position", "parallelshare",
            "--output_root", str(tmp_path), "--tag", "ps",
        ])
        del solver
        from bridgeqa_tpu.train import checkpoints

        payload = checkpoints.load_params(os.path.join(str(tmp_path), "ps"), "model_last")
        blip = payload["params"]["blip_model"]
        assert "text_decoder_scene" not in blip
        layer0 = blip["text_decoder"]["bert"]["encoder"]["layer_0"]
        assert "output_LayerNorms_0" in layer0


class TestEvalDriver:
    def test_eval_qa_and_detection(self, run_dir):
        """scripts/eval.py over the trained tiny run: QA scalar means +
        detector mAP@0.25/0.5 written to score.<split>.json, all finite."""
        run, _ = run_dir
        from scripts import eval as eval_script

        eval_script.main(["--run_dir", run, "--qa", "--detection",
                          "--k_test", "4", "--batch_size", "4", "--repeat", "2"])
        out = os.path.join(run, "score.val.json")
        assert os.path.exists(out)
        with open(out) as f:
            results = json.load(f)
        assert "qa" in results and "mAP@0.25" in results and "mAP@0.5" in results
        for v in results["qa"].values():
            assert np.isfinite(v)
        assert np.isfinite(results["mAP@0.25"].get("mAP", 0.0))

        # per-sample artifacts (reference eval.py:301-303,383-420)
        import pickle

        with open(os.path.join(run, "pred.val.pkl"), "rb") as f:
            predictions = pickle.load(f)
        assert predictions
        scene = next(iter(predictions.values()))
        rec = next(iter(scene.values()))
        assert set(rec) >= {"pred_bbox", "gt_bbox", "iou", "pred_answers_at10"}
        assert np.asarray(rec["pred_bbox"]).shape == (8, 3)
        assert 1 <= len(rec["pred_answers_at10"]) <= 10  # min(10, |vocab|)
        with open(os.path.join(run, "score.val.pkl"), "rb") as f:
            scores = pickle.load(f)
        assert set(scores) == {"ref_acc", "lang_acc", "answer_acc_at1",
                               "answer_acc_at10", "ious"}
        n_samples = sum(len(s) for s in predictions.values())
        # --repeat 2: one stacked per-batch list PER TRIAL
        # (reference eval.py:297-312,517)
        assert len(scores["ious"]) == 2
        assert len(scores["ious"][0]) == n_samples
        assert len(scores["ious"][1]) == n_samples
        with open(os.path.join(run, "pred.val.pkl.json")) as f:
            conved = json.load(f)
        assert len(conved) == n_samples
        assert set(conved[0]) >= {"scene_id", "question_id", "answer_top10", "bbox", "iou"}
