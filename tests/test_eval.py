"""Eval-layer tests: AP calculator, QA metrics, scoring."""

import numpy as np
import jax.numpy as jnp
import pytest

from bridgeqa_tpu.data.scannet_config import ScannetDatasetConfig
from bridgeqa_tpu.eval.detection_eval import APCalculator, eval_det, voc_ap
from bridgeqa_tpu.eval.scoring import (
    bleu,
    cider,
    exact_match,
    prep_ans,
    qclass1,
    rouge_l,
    score_predictions,
)

DC = ScannetDatasetConfig()


def box(center, size):
    c, s = np.asarray(center, float), np.asarray(size, float) / 2
    signs = np.array([[1, 1, 1], [1, -1, 1], [-1, -1, 1], [-1, 1, 1],
                      [1, 1, -1], [1, -1, -1], [-1, -1, -1], [-1, 1, -1]])
    return c + signs * s


class TestAP:
    def test_perfect_detection(self):
        calc = APCalculator(ap_iou_thresh=0.25)
        gt = [[(0, box([0, 0, 0], [1, 1, 1])), (1, box([3, 3, 0], [1, 1, 1]))]]
        pred = [[(0, box([0, 0, 0], [1, 1, 1]), 0.9), (1, box([3, 3, 0], [1, 1, 1]), 0.8)]]
        calc.step(pred, gt)
        m = calc.compute_metrics()
        assert m["mAP"] == pytest.approx(1.0)
        assert m["AR"] == pytest.approx(1.0)

    def test_false_positive_lowers_precision(self):
        calc = APCalculator(0.25)
        gt = [[(0, box([0, 0, 0], [1, 1, 1]))]]
        pred = [[(0, box([0, 0, 0], [1, 1, 1]), 0.5), (0, box([10, 10, 0], [1, 1, 1]), 0.9)]]
        calc.step(pred, gt)
        m = calc.compute_metrics()
        assert 0 < m["mAP"] < 1.0

    def test_duplicate_detection_is_fp(self):
        rec, prec, ap = eval_det(
            {0: [(0, box([0, 0, 0], [1, 1, 1]), 0.9), (0, box([0, 0, 0], [1, 1, 1]), 0.8)]},
            {0: [(0, box([0, 0, 0], [1, 1, 1]))]},
        )
        assert ap[0] == pytest.approx(1.0)  # first matches; duplicate is FP after recall=1
        assert prec[0][-1] == pytest.approx(0.5)

    def test_voc_ap_monotone_envelope(self):
        ap = voc_ap(np.array([0.5, 1.0]), np.array([1.0, 0.5]))
        assert 0.5 < ap <= 1.0


class TestScoring:
    def test_prep_ans(self):
        assert prep_ans("The Chair") == "chair"
        assert prep_ans("three") == "3"
        assert prep_ans("red, blue") == "red blue"

    def test_exact_match(self):
        em1, em10 = exact_match({"q1": ["red", "blue"], "q2": ["green"]},
                                {"q1": ["blue"], "q2": ["green"]})
        assert em1 == 0.5 and em10 == 1.0

    def test_bleu_perfect(self):
        gts = {"a": ["the red chair"]}
        res = {"a": ["the red chair"]}
        b = bleu(gts, res)
        assert b[0] == pytest.approx(1.0)

    def test_rouge_and_cider_ordering(self):
        # CIDEr idf needs a multi-document corpus to be non-degenerate
        gts = {"a": ["the red chair near the window"],
               "b": ["a wooden desk"],
               "c": ["two lamps on the ceiling"]}
        good = {"a": ["the red chair near the window"], "b": ["a wooden desk"],
                "c": ["two lamps on the ceiling"]}
        bad = {"a": ["a blue table"], "b": ["something else"], "c": ["no idea"]}
        assert rouge_l(gts, good) > rouge_l(gts, bad)
        assert cider(gts, good) > cider(gts, bad)

    def test_qclass(self):
        assert qclass1("Where is the chair?") == "Place"
        assert qclass1("How many chairs?") == "Number"
        assert qclass1("What color is it?") == "Color"
        assert qclass1("What is on the desk?") == "Object"

    def test_score_predictions_end_to_end(self):
        gold = [{"question_id": "q1", "answers": ["red"], "question": "What color is it?"},
                {"question_id": "q2", "answers": ["chair"], "question": "What is near?"}]
        preds = {"q1": {"answer_top10": ["red", "blue"]},
                 "q2": {"answer_top10": ["table", "chair"]}}
        out = score_predictions(preds, gold)
        assert out["EM@1"] == 50.0
        assert out["EM@10"] == 100.0
        assert "BLEU-1" in out and "CIDEr" in out
        assert out["EM@1 Color"] == 100.0


def _synthetic_eval_ep(b=2, k=8, k2=4, a=10, seed=0):
    rng = np.random.RandomState(seed)
    return {
            "objectness_scores": jnp.asarray(rng.randn(b, k, 2), jnp.float32),
            "objectness_label": jnp.asarray(rng.randint(0, 2, (b, k))),
            "objectness_mask": jnp.ones((b, k), jnp.float32),
            "object_assignment": jnp.asarray(rng.randint(0, k2, (b, k))),
            "cluster_ref": jnp.asarray(rng.randn(b, k), jnp.float32),
            "cluster_labels": jnp.asarray(np.eye(k)[rng.randint(0, k, b)], jnp.float32),
            "ref_box_label": jnp.asarray(np.eye(k2)[rng.randint(0, k2, b)], jnp.int32),
            "center": jnp.asarray(rng.rand(b, k, 3), jnp.float32),
            "heading_scores": jnp.asarray(rng.randn(b, k, 1), jnp.float32),
            "heading_residuals": jnp.zeros((b, k, 1), jnp.float32),
            "size_scores": jnp.asarray(rng.randn(b, k, 18), jnp.float32),
            "size_residuals": jnp.zeros((b, k, 18, 3), jnp.float32),
            "center_label": jnp.asarray(rng.rand(b, k2, 3), jnp.float32),
            "heading_class_label": jnp.zeros((b, k2), jnp.int32),
            "heading_residual_label": jnp.zeros((b, k2), jnp.float32),
            "size_class_label": jnp.zeros((b, k2), jnp.int32),
            "size_residual_label": jnp.zeros((b, k2, 3), jnp.float32),
            "sem_cls_label": jnp.zeros((b, k2), jnp.int32),
            "sem_cls_scores": jnp.asarray(rng.randn(b, k, 18), jnp.float32),
            "object_cat": jnp.zeros((b,), jnp.int32),
            "lang_scores": jnp.asarray(rng.randn(b, 18), jnp.float32),
            "answer_scores": jnp.asarray(rng.randn(b, a), jnp.float32),
            "answer_cats": jnp.asarray(np.eye(a)[rng.randint(0, a, b)], jnp.float32),
            "num_bbox": jnp.full((b,), k2, jnp.int32),
        }


class TestQAEval:
    def test_get_eval_on_synthetic(self):
        from bridgeqa_tpu.eval.qa_eval import get_eval

        b, a = 2, 10
        ep = _synthetic_eval_ep(b=b, a=a)
        out = get_eval(dict(ep), DC, use_lang_classifier=True)
        for key in ("ref_acc_mean", "ref_iou_rate_0.25", "ref_iou_rate_0.5", "lang_acc",
                    "answer_acc_at1", "answer_acc_at10", "obj_acc", "sem_acc"):
            v = np.asarray(out[key])
            assert np.isfinite(v).all(), key
            assert (0 <= v).all() and (v <= 1).all(), key
        assert out["ref_iou"].shape == (b,)
        assert out["pred_answers_at10"].shape == (b, 10)
        # row 0 of the top-10 is the argmax prediction
        np.testing.assert_array_equal(
            np.asarray(out["pred_answers_at10"])[:, 0],
            np.argmax(np.asarray(ep["answer_scores"]), axis=1))

    def test_use_best(self):
        """eval_helper.py:97-100: grounding by the GT cluster label — with
        matching GT box labels the referenced IoU becomes exact 1."""
        from bridgeqa_tpu.eval.qa_eval import get_eval

        ep = _synthetic_eval_ep()
        # make cluster GT point at assignment rows whose box == the ref box
        gt_ref = np.argmax(np.asarray(ep["ref_box_label"]), 1)
        assign = np.asarray(ep["object_assignment"])
        b, k = assign.shape
        cluster_labels = np.zeros((b, k), np.float32)
        for i in range(b):
            cols = np.where(assign[i] == gt_ref[i])[0]
            assert cols.size, "fixture needs an assignable proposal"
            cluster_labels[i, cols[0]] = 1.0
        ep["cluster_labels"] = jnp.asarray(cluster_labels)
        out = get_eval(dict(ep), DC, use_oracle=True, use_best=True)
        np.testing.assert_allclose(np.asarray(out["ref_iou"]), 1.0, rtol=1e-5)
        # cluster_ref is replaced by the labels (reference line 100)
        np.testing.assert_array_equal(np.asarray(out["cluster_ref"]), cluster_labels)

    def test_use_oracle(self):
        """eval_helper.py:126-138: predicted box params swapped for the GT
        params gathered through object_assignment; grounding unchanged."""
        from bridgeqa_tpu.eval.qa_eval import get_eval

        ep = _synthetic_eval_ep()
        out = get_eval(dict(ep), DC, use_oracle=True)
        base = get_eval(dict(ep), DC)
        # same referenced proposal, different box -> IoU vs the GT box of the
        # ASSIGNED object; oracle IoU >= predicted-head IoU in expectation,
        # and the pred box equals the gt box whenever assignment == gt_ref
        pred_ref = np.argmax(np.asarray(ep["cluster_ref"])
                             * (np.argmax(np.asarray(ep["objectness_scores"]), 2) == 1), 1)
        assign = np.asarray(ep["object_assignment"])
        gt_ref = np.argmax(np.asarray(ep["ref_box_label"]), 1)
        for i in range(len(pred_ref)):
            if assign[i, pred_ref[i]] == gt_ref[i]:
                assert np.asarray(out["ref_iou"])[i] == pytest.approx(1.0, rel=1e-5)
        assert out["ref_iou"].shape == base["ref_iou"].shape

    def test_use_cat_rand(self):
        """eval_helper.py:101-120: the grounded proposal is a random one whose
        assigned semantic class matches object_cat."""
        import jax

        from bridgeqa_tpu.eval.qa_eval import get_eval

        ep = _synthetic_eval_ep()
        # two semantic classes; ask for class 1
        rng = np.random.RandomState(3)
        sem = rng.randint(0, 2, np.asarray(ep["sem_cls_label"]).shape)
        ep["sem_cls_label"] = jnp.asarray(sem, jnp.int32)
        ep["object_cat"] = jnp.ones((2,), jnp.int32)
        assign = np.asarray(ep["object_assignment"])
        candidate = sem[np.arange(2)[:, None], assign] == 1
        assert candidate.any(1).all(), "fixture needs candidates"
        for seed in range(5):
            out = get_eval(dict(ep), DC, use_cat_rand=True, rng=jax.random.PRNGKey(seed))
            chosen = np.argmax(np.asarray(out["cluster_ref"]), 1)
            for i in range(2):
                assert candidate[i, chosen[i]], (seed, i, chosen)
        with pytest.raises(ValueError):
            get_eval(dict(ep), DC, use_cat_rand=True)


class TestMeteorVsNltk:
    """Our METEOR aligner (exact + Porter-stem stages) must match nltk's
    reference implementation run with an empty-synonym WordNet stub — the
    same configuration, so scores must agree to float precision."""

    class _NoWordnet:
        @staticmethod
        def synsets(word):
            return []

    CASES = [
        (["the brown chair"], "brown chair"),
        (["a red office chairs", "red chair"], "the red chair"),
        (["on the left side of the room"], "left side room"),
        (["two"], "2"),
        (["trash can", "trashcan"], "trash cans"),
        (["it is on the desk next to the monitor"], "on the desk"),
        (["running shoes"], "running shoe"),
        (["cat sat on the mat"], "the cat sat mat on"),
    ]

    def test_matches_nltk(self):
        nltk_meteor = pytest.importorskip("nltk.translate.meteor_score")
        from bridgeqa_tpu.eval.scoring import _porter_stem, _tok, single_meteor

        stem = _porter_stem()
        for refs, hyp in self.CASES:
            ours = max(single_meteor(_tok(r), _tok(hyp), stem) for r in refs)
            theirs = nltk_meteor.meteor_score(
                [_tok(r) for r in refs], _tok(hyp), wordnet=self._NoWordnet())
            np.testing.assert_allclose(ours, theirs, rtol=1e-9, err_msg=f"{refs} / {hyp}")


class TestBleuVsNltk:
    """Corpus-BLEU oracle: our COCO-style BLEU (corpus counts, closest-ref
    brevity penalty, geometric mean — the reference scores with
    pycocoevalcap's Bleu, the same algorithm) must match nltk's
    ``corpus_bleu`` with uniform weights exactly on corpora where every
    order has nonzero matches (the implementations differ only in
    zero-count smoothing, which ScanQA answer scoring never hits at
    BLEU-1/2 and the reference leaves unsmoothed anyway)."""

    def test_matches_nltk_corpus_bleu(self):
        pytest.importorskip("nltk")
        from nltk.translate.bleu_score import corpus_bleu

        from bridgeqa_tpu.eval.scoring import bleu

        rng = np.random.RandomState(3)
        vocab = ["red", "blue", "chair", "table", "on", "the", "left",
                 "right", "a", "small"]
        gts, res = {}, {}
        refs_nltk, hyps_nltk = [], []
        for q in range(16):
            n_ref = rng.randint(1, 4)
            refs = [" ".join(rng.choice(vocab, rng.randint(5, 10)))
                    for _ in range(n_ref)]
            base = list(refs[rng.randint(n_ref)].split())
            base[rng.randint(len(base))] = str(rng.choice(vocab))
            if q % 3 == 0:
                base = base[:-1]  # exercise the brevity penalty
            gts[q] = refs
            res[q] = [" ".join(base)]
            refs_nltk.append([r.split() for r in refs])
            hyps_nltk.append(base)

        ours = bleu(gts, res)
        assert all(o < 1.0 for o in ours), "fixture must be discriminative"
        for n in range(1, 5):
            ref = corpus_bleu(refs_nltk, hyps_nltk, weights=tuple([1.0 / n] * n))
            assert abs(ours[n - 1] - ref) < 1e-9, (n, ours[n - 1], ref)


class TestCiderOracle:
    """CIDEr-D oracle: an independent from-scratch transcription of the
    published pycocoevalcap ``cider_scorer.py`` algorithm (raw tf x idf,
    min-clipped numerator over hypothesis n-grams, per-n cosine, gaussian
    length penalty, mean over n, x10) must agree with ``scoring.cider``
    to 1e-12 on a discriminative corpus (repeated hypothesis n-grams so
    the min-clipping actually bites)."""

    @staticmethod
    def _oracle(gts, res, n_max=4, sigma=6.0):
        import collections
        import math

        from bridgeqa_tpu.eval.scoring import _ngrams, _tok

        doc_freq = collections.defaultdict(float)
        for qid in gts:
            for ng in set().union(*(set(_ngrams(_tok(r), n))
                                    for r in gts[qid] for n in range(1, n_max + 1))):
                doc_freq[ng] += 1
        ref_len = math.log(float(len(gts)))

        def counts2vec(cnts):
            vec = [collections.defaultdict(float) for _ in range(n_max)]
            norm = [0.0] * n_max
            length = 0
            for ngram, term_freq in cnts.items():
                df = math.log(max(1.0, doc_freq[ngram]))
                n = len(ngram) - 1
                vec[n][ngram] = float(term_freq) * (ref_len - df)
                norm[n] += pow(vec[n][ngram], 2)
                if n == 1:
                    length += term_freq
            return vec, [math.sqrt(x) for x in norm], length

        def allgrams(tokens):
            out = {}
            for n in range(1, n_max + 1):
                for ng, c in _ngrams(tokens, n).items():
                    out[ng] = c
            return out

        def sim(vh, vr, nh, nr, lh, lr):
            delta = float(lh - lr)
            val = [0.0] * n_max
            for n in range(n_max):
                for ngram, count in vh[n].items():
                    val[n] += min(vh[n][ngram], vr[n][ngram]) * vr[n][ngram]
                if nh[n] != 0 and nr[n] != 0:
                    val[n] /= nh[n] * nr[n]
                val[n] *= math.e ** (-(delta**2) / (2 * sigma**2))
            return val

        scores = []
        for qid in res:
            # note: pycocoevalcap counts "length" as bigram total; replicate
            vec, norm, length = counts2vec(allgrams(_tok(res[qid][0])))
            score = [0.0] * n_max
            for ref_s in gts[qid]:
                vr, nr, lr = counts2vec(allgrams(_tok(ref_s)))
                for n, v in enumerate(sim(vec, vr, norm, nr, length, lr)):
                    score[n] += v
            score_avg = sum(score) / n_max / len(gts[qid]) * 10.0
            scores.append(score_avg)
        return sum(scores) / len(scores)

    def test_matches_pycocoevalcap_transcription(self):
        from bridgeqa_tpu.eval.scoring import cider

        rng = np.random.RandomState(9)
        vocab = ["red", "blue", "chair", "table", "on", "the", "left", "right"]
        gts, res = {}, {}
        for q in range(14):
            refs = [" ".join(rng.choice(vocab, rng.randint(4, 9)))
                    for _ in range(rng.randint(1, 4))]
            base = list(refs[0].split())
            base[rng.randint(len(base))] = str(rng.choice(vocab))
            if q % 4 == 0:
                base = base + base[:2]  # repeated n-grams: min-clip must bite
            gts[q] = refs
            res[q] = [" ".join(base)]
        ours = cider(gts, res)
        ref = self._oracle(gts, res)
        assert ours > 0.0
        assert abs(ours - ref) < 1e-12, (ours, ref)


class TestRougeOracle:
    """ROUGE-L oracle vs an independent transcription of pycocoevalcap
    ``rouge.py``: max precision and max recall taken SEPARATELY over the
    references before the F-combination. The fixture includes a case where
    the best-precision and best-recall references differ — the max-of-F
    formulation (the previous bug) disagrees there."""

    @staticmethod
    def _oracle(gts, res, beta=1.2):
        from bridgeqa_tpu.eval.scoring import _lcs, _tok

        scores = []
        for qid in res:
            token_c = _tok(res[qid][0])
            prec, rec = [], []
            for ref_s in gts[qid]:
                token_r = _tok(ref_s)
                lcs = _lcs(token_r, token_c)
                prec.append(lcs / float(len(token_c)))
                rec.append(lcs / float(len(token_r)))
            prec_max, rec_max = max(prec), max(rec)
            if prec_max != 0 and rec_max != 0:
                s = ((1 + beta**2) * prec_max * rec_max) / (rec_max + beta**2 * prec_max)
            else:
                s = 0.0
            scores.append(s)
        return sum(scores) / len(scores)

    def test_matches_pycocoevalcap_transcription(self):
        from bridgeqa_tpu.eval.scoring import rouge_l

        gts = {
            # best precision from ref A (short superset), best recall from
            # ref B (long) — separate-max vs max-of-F diverge here
            0: ["the red chair", "the red chair stands on the left side of the room"],
            1: ["a blue table", "blue table"],
            2: ["on the right"],
        }
        res = {0: ["the red chair on left"], 1: ["a blue chair"], 2: ["on the right"]}
        ours = rouge_l(gts, res)
        ref = self._oracle(gts, res)
        assert abs(ours - ref) < 1e-12, (ours, ref)
        assert 0.0 < ours < 1.0


class TestPtbTok:
    def test_ptb_edge_cases(self):
        """PTB-approx tokenizer: intra-token punctuation (decimals,
        hyphenated words, times) stays intact like the Stanford tokenizer;
        edge punctuation separates and drops; clitics keep their PTB form."""
        from bridgeqa_tpu.eval.scoring import _tok

        assert _tok("3.5 meters") == ["3.5", "meters"]
        assert _tok("l-shaped couch.") == ["l-shaped", "couch"]
        assert _tok("3:30") == ["3:30"]
        assert _tok("it's red,") == ["it", "'s", "red"]
        assert _tok("The RED chair!") == ["the", "red", "chair"]
        assert _tok("...") == []
        assert _tok("wall-mounted tv --") == ["wall-mounted", "tv"]
