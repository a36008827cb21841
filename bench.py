"""End-to-end BridgeQA-TPU benchmark: QA pairs/sec/chip.

Measures the full paralleltwin inference path (BASELINE.json config 4):
VoteNet detector over 40k-point scenes + ViT-B/480 + twin 12-layer BERT +
dual-decoder rank-answer over a 4500-answer list at the reference's own
ranking settings (k_test=256, the `qa_module` default the reference
evaluates with; answers padded to 12 tokens ~ ScanQA's max), batch 32,
on the real TPU chip. Prints ONE JSON line.

``vs_baseline`` compares against BASELINE_QA_PER_SEC_PER_GPU, an estimate of
the PyTorch reference's eval throughput per GPU: the reference eval loop
(``scripts/eval.py``) interleaves CUDA compute with host numpy box decoding
and per-sample python loops in rank_answer; on the 8-GPU node used in the
README, full ScanQA val (~4.6k QA pairs) takes on the order of several
minutes → ~12 QA pairs/sec/GPU. This constant is an estimate, not a
measurement (the reference publishes accuracy only — BASELINE.md), and is
kept fixed across rounds so the ratio is comparable round-to-round.

NOTE: on the axon platform ``block_until_ready()`` is a no-op; sync via
``jax.device_get`` (see .claude/skills/verify/SKILL.md).
"""

import json
import time

import numpy as np

BASELINE_QA_PER_SEC_PER_GPU = 12.0

BATCH = 32
NUM_POINTS = 40000
IMAGE_SIZE = 480
K_TEST = 256  # reference ranking default (scripts/train.py k_test, SURVEY §3.3)
NUM_ANSWERS = 4500
ANSWER_LEN = 12  # ScanQA answers tokenize to ~12 max
QUESTION_LEN = 80


def main():
    import jax
    import jax.numpy as jnp

    from bridgeqa_tpu.data.scannet_config import ScannetDatasetConfig
    from bridgeqa_tpu.models.bridgeqa import BridgeQA, BridgeQAConfig

    dc = ScannetDatasetConfig()
    cfg = BridgeQAConfig(num_answers=NUM_ANSWERS)
    model = BridgeQA(cfg, mean_size_arr=dc.mean_size_arr, dtype=jnp.bfloat16)

    rng = np.random.RandomState(0)
    batch = dict(
        point_clouds=jnp.asarray((rng.rand(BATCH, NUM_POINTS, 3) - 0.5) * 6.0, jnp.float32),
        images=jnp.asarray(rng.rand(BATCH, IMAGE_SIZE, IMAGE_SIZE, 3), jnp.float32),
        question_ids=jnp.asarray(rng.randint(1, 30000, (BATCH, QUESTION_LEN))),
        question_mask=jnp.ones((BATCH, QUESTION_LEN), jnp.int32),
        answer_list_ids=jnp.asarray(
            np.concatenate([np.full((NUM_ANSWERS, 1), 30522), rng.randint(1, 30000, (NUM_ANSWERS, ANSWER_LEN - 1))],
                           axis=1)),
        answer_list_mask=jnp.ones((NUM_ANSWERS, ANSWER_LEN), jnp.int32),
    )

    init_batch = dict(batch)
    init_batch.update(
        answer_ids=jnp.asarray(rng.randint(1, 30000, (BATCH, ANSWER_LEN))),
        answer_mask=jnp.ones((BATCH, ANSWER_LEN), jnp.int32),
    )
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        init_batch, train=True,
    )
    variables = {"params": variables["params"], "batch_stats": variables.get("batch_stats", {})}

    @jax.jit
    def infer(variables, batch):
        out = model.apply(variables, batch, train=False, inference="rank", k_test=K_TEST)
        return out["answer_scores"], out["cluster_ref"]

    # warmup / compile
    scores, _ = infer(variables, batch)
    _ = jax.device_get(scores)

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        scores, refs = infer(variables, batch)
        _ = jax.device_get(scores)
        times.append(time.perf_counter() - t0)

    best = min(times)
    qa_per_sec = BATCH / best
    print(json.dumps({
        "metric": "QA pairs/sec/chip (ScanQA-shape e2e paralleltwin rank inference, "
                  "batch 32, k_test=256, answer_len 12)",
        "value": round(qa_per_sec, 3),
        "unit": "QA pairs/sec/chip",
        "vs_baseline": round(qa_per_sec / BASELINE_QA_PER_SEC_PER_GPU, 3),
        "baseline_note": f"vs estimated {BASELINE_QA_PER_SEC_PER_GPU} QA/s/GPU for the torch "
                         "reference eval loop (estimate, not a measurement; fixed across rounds)",
    }))


if __name__ == "__main__":
    main()
