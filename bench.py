"""End-to-end BridgeQA-TPU benchmark: QA pairs/sec/chip + roofline stats.

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

``mfu``/``mbu`` ground the claim in hardware facts instead of the GPU
estimate: the answer-scoring pass (decoder body + vocab head, the dominant
cost) and the ViT are timed separately with analytic FLOP/byte counts, and
reported as fractions of the chip's peak (v5e: 197 TFLOP/s bf16,
819 GB/s HBM). Derivation: FLOPs = 2*M*N*K summed over every GEMM in the
pass; bytes = one activation read+write per fused layer + resident weights
(+ the embedding table stream for the head). The timing scan feeds each rep
perturbed question states so XLA cannot hoist the body (CSE).

NOTE: on the axon platform ``block_until_ready()`` is a no-op; sync via
``jax.device_get`` (see .claude/skills/verify/SKILL.md).
"""

import json
import sys
import time
from functools import partial

import numpy as np

BASELINE_QA_PER_SEC_PER_GPU = 12.0

# TPU v5e (1 chip) peaks — public spec numbers
PEAK_BF16_FLOPS = 197e12
PEAK_HBM_BYTES = 819e9

BATCH = 32
NUM_POINTS = 40000
IMAGE_SIZE = 480
K_TEST = 256  # reference ranking default (scripts/train.py k_test, SURVEY §3.3)
NUM_ANSWERS = 4500
ANSWER_LEN = 12  # ScanQA answers tokenize to ~12 max
QUESTION_LEN = 80

H = 768
FF = 3072
LAYERS = 12
VOCAB = 30524
VIT_TOKENS = (IMAGE_SIZE // 16) ** 2 + 1  # 901


def scoring_pass_flops_bytes():
    """Analytic cost of ONE decoder scoring pass (B*k sequences)."""
    rows = BATCH * K_TEST * ANSWER_LEN
    per_layer = (
        4 * H * H * 2 * rows          # self QKV + output proj
        + 2 * H * H * 2 * rows        # cross query + output proj
        + 2 * H * FF * 2 * rows       # FFN pair
        + 2 * ANSWER_LEN * H * 2 * rows   # self scores+ctx (useful part)
        + 2 * QUESTION_LEN * H * 2 * rows  # cross scores+ctx
    )
    head_rows = BATCH * K_TEST * (ANSWER_LEN - 1)
    head = head_rows * H * H * 2 + head_rows * H * VOCAB * 2
    flops = LAYERS * per_layer + head

    act = rows * H * 2  # bf16
    weights = LAYERS * (6 * H * H + 2 * H * FF) * 2
    table_streams = -(-head_rows // 4096)  # vocab-loss kernel row blocks
    head_bytes = head_rows * H * 2 + table_streams * VOCAB * H * 2
    bytes_ = LAYERS * 2 * act + weights + head_bytes
    return flops, bytes_


def vit_flops():
    t = VIT_TOKENS
    per_layer = t * (4 * H * H + 2 * H * FF) * 2 + 2 * t * t * H * 2
    return BATCH * LAYERS * per_layer


def train_fwd_gemm_flops(tb: int, num_proposal: int) -> float:
    """Analytic fwd GEMM FLOPs of one train step's transformer stack (ViT +
    twin encoder + both LM decoders) at train batch ``tb``. The detector's
    point ops (gather/group sweeps) are excluded, so the derived train MFU is
    a LOWER bound on real MXU utilization."""
    t = VIT_TOKENS
    vit = tb * LAYERS * (t * (4 * H * H + 2 * H * FF) * 2 + 2 * t * t * H * 2)
    keys = t + num_proposal  # per-stream cross-attention keys (image | scene)
    twin = tb * LAYERS * QUESTION_LEN * 2 * (2 * (4 * H * H + 2 * H * H + 2 * H * FF)) \
        + tb * LAYERS * 2 * 2 * (keys * 2 * H * H
                                 + QUESTION_LEN * keys * H * 2
                                 + QUESTION_LEN * QUESTION_LEN * H * 2)
    rows = tb * ANSWER_LEN
    dec = 2 * (LAYERS * rows * (4 * H * H * 2 + 2 * H * H * 2 + 2 * H * FF * 2
                                + 2 * ANSWER_LEN * H * 2 + 2 * QUESTION_LEN * H * 2)
               + tb * LAYERS * QUESTION_LEN * 2 * H * H * 2
               + rows * (H * H + H * VOCAB) * 2)
    return vit + twin + dec


def main(smoke: bool = False):
    """Prints the one-line JSON benchmark. ``smoke`` shrinks every dimension
    to a CPU-runnable config that exercises the IDENTICAL code path (model
    build, rank scan, all roofline sub-phases, JSON assembly) so the real
    TPU run can't fail on plumbing — numbers are meaningless in smoke mode."""
    global BATCH, NUM_POINTS, IMAGE_SIZE, K_TEST, NUM_ANSWERS, ANSWER_LEN, QUESTION_LEN

    import jax
    import jax.numpy as jnp

    from bridgeqa_tpu.data.scannet_config import ScannetDatasetConfig
    from bridgeqa_tpu.models.blip_vqa3d import BlipVQA3DConfig
    from bridgeqa_tpu.models.bridgeqa import BridgeQA, BridgeQAConfig
    from bridgeqa_tpu.models.med import MedConfig

    dc = ScannetDatasetConfig()
    # input_feature_dim=1: the reference eval default (--use_height) feeds
    # xyz + height; the stripe kernel extracts the height channel in its
    # own sweep so the extra channel is ~free (round-3)
    if smoke:
        BATCH, NUM_POINTS, IMAGE_SIZE = 2, 1024, 64
        K_TEST, NUM_ANSWERS, ANSWER_LEN, QUESTION_LEN = 8, 30, 6, 20
        med = MedConfig(vocab_size=200, hidden_size=64, num_hidden_layers=2,
                        num_attention_heads=4, intermediate_size=128,
                        max_position_embeddings=128, encoder_width=64)
        blip = BlipVQA3DConfig(med=med, image_size=IMAGE_SIZE, num_answers=NUM_ANSWERS,
                               vit="custom", vit_custom_embed_dim=64, vit_custom_depth=2,
                               vit_custom_heads=4, vit_drop_path_rate=0.0, bos_token_id=110)
        cfg = BridgeQAConfig(num_answers=NUM_ANSWERS, num_proposal=32, hidden_size=32,
                             blip=blip, mcan_num_layers=1, mcan_flat_out_size=64,
                             mcan_flat_mlp_size=32, input_feature_dim=1)
    else:
        cfg = BridgeQAConfig(num_answers=NUM_ANSWERS, input_feature_dim=1)
    model = BridgeQA(cfg, mean_size_arr=dc.mean_size_arr, dtype=jnp.bfloat16)

    bos_id = cfg.blip.bos_token_id
    vmax = min(30000, cfg.blip.med.vocab_size - 2)
    h_model = cfg.blip.med.hidden_size

    rng = np.random.RandomState(0)
    pc = (rng.rand(BATCH, NUM_POINTS, 3) - 0.5) * 6.0
    height = (pc[..., 2:3] - pc[..., 2:3].min(axis=1, keepdims=True))
    batch = dict(
        point_clouds=jnp.asarray(np.concatenate([pc, height], axis=-1), jnp.float32),
        images=jnp.asarray(rng.rand(BATCH, IMAGE_SIZE, IMAGE_SIZE, 3), jnp.float32),
        question_ids=jnp.asarray(rng.randint(1, vmax, (BATCH, QUESTION_LEN))),
        question_mask=jnp.ones((BATCH, QUESTION_LEN), jnp.int32),
        answer_list_ids=jnp.asarray(
            np.concatenate([np.full((NUM_ANSWERS, 1), bos_id), rng.randint(1, vmax, (NUM_ANSWERS, ANSWER_LEN - 1))],
                           axis=1)),
        answer_list_mask=jnp.ones((NUM_ANSWERS, ANSWER_LEN), jnp.int32),
    )

    init_batch = dict(batch)
    init_batch.update(
        answer_ids=jnp.asarray(rng.randint(1, vmax, (BATCH, ANSWER_LEN))),
        answer_mask=jnp.ones((BATCH, ANSWER_LEN), jnp.int32),
    )
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        init_batch, train=True,
    )
    variables = {"params": variables["params"], "batch_stats": variables.get("batch_stats", {})}

    REPS = 4
    RPC_FLOOR = 0.030  # measured axon dispatch+fetch round-trip floor

    @jax.jit
    def infer(variables, batch):
        out = model.apply(variables, batch, train=False, inference="rank", k_test=K_TEST)
        return out["answer_scores"], out["cluster_ref"]

    # warmup / compile + sanity on the real outputs
    scores, refs = infer(variables, batch)
    s_host = jax.device_get(scores)
    assert np.all(np.isfinite(s_host)) and s_host.shape == (BATCH, NUM_ANSWERS)

    # Steady-state chip throughput: REPS perturbed batches scanned inside
    # ONE jit, outputs reduced in-graph to scalars. Fetching the full
    # (B, num_answers) scores per dispatch would time the ~40 MB/s axon
    # host tunnel (+~30 ms RPC floor per dispatch), not the chip — a
    # pipelined serving deployment overlaps result transfer with compute.
    pc_stack = jnp.asarray(
        np.stack([np.asarray(batch["point_clouds"]) + 1e-3 * i for i in range(REPS)]))
    img_rep = jnp.asarray(
        np.stack([np.asarray(batch["images"]) + 1e-3 * i for i in range(REPS)]))

    @jax.jit
    def infer_scan(variables, batch, pcs, imgs):
        def body(c, x):
            pc_i, img_i = x
            b = dict(batch, point_clouds=pc_i, images=img_i)
            out = model.apply(variables, b, train=False, inference="rank",
                              k_test=K_TEST)
            return (c + jnp.sum(out["answer_scores"]).astype(jnp.float32)
                    + jnp.sum(out["cluster_ref"]).astype(jnp.float32)), None
        s, _ = jax.lax.scan(body, 0.0, (pcs, imgs))
        return s

    _ = np.asarray(infer_scan(variables, batch, pc_stack, img_rep))  # compile
    t0 = time.perf_counter()
    _ = np.asarray(infer_scan(variables, batch, pc_stack, img_rep))
    per_call = max((time.perf_counter() - t0 - RPC_FLOOR) / REPS, 1e-9)

    best = per_call
    qa_per_sec = BATCH / best

    # ---- roofline sub-phases (CSE-proof scan over perturbed inputs) ----

    def timed_scan(fn, xs):
        @jax.jit
        def run(v, xs):
            def body(c, x):
                return c + fn(v, x), None
            s, _ = jax.lax.scan(body, 0.0, xs)
            return s
        _ = np.asarray(run(variables, xs))  # compile
        t0 = time.perf_counter()
        _ = np.asarray(run(variables, xs))
        return max((time.perf_counter() - t0 - RPC_FLOOR) / REPS, 1e-9)

    # scoring pass: the decoder full-scoring call at the e2e rank shapes
    ids = jnp.asarray(rng.randint(1, vmax, (BATCH * K_TEST, ANSWER_LEN)))
    atts = jnp.ones((BATCH * K_TEST, ANSWER_LEN), jnp.int32)
    labels = ids
    qmask = jnp.ones((BATCH, QUESTION_LEN), jnp.int32)
    qs_stack = jnp.asarray(
        rng.randn(REPS, BATCH, QUESTION_LEN, h_model).astype(np.float32) * 0.5)

    def scoring_fn(v, qs_i):
        def run(m, qs_i):
            dec = m.blip_model.text_decoder
            _, loss = dec(ids, atts, qs_i, qmask, labels=labels, deterministic=True,
                          loss_chunk_size=m.blip_model.cfg.rank_loss_chunk_size)
            return jnp.sum(loss)
        return model.apply(v, qs_i, method=run)

    t_scoring = timed_scan(scoring_fn, qs_stack)

    img_stack = jnp.asarray(
        rng.rand(REPS, BATCH, IMAGE_SIZE, IMAGE_SIZE, 3).astype(np.float32))

    def vit_fn(v, img_i):
        def run(m, img_i):
            return jnp.sum(m.blip_model.encode_image(img_i, train=False))
        return model.apply(v, img_i, method=run)

    t_vit = timed_scan(vit_fn, img_stack)

    pc_stack2 = jnp.asarray(
        np.stack([np.asarray(batch["point_clouds"]) + 1e-3 * (i + 1) for i in range(REPS)]))

    def det_fn(v, pc_i):
        def run(m, pc_i):
            out = m.detector(pc_i, train=False)
            return sum(jnp.sum(o.astype(jnp.float32))
                       for o in jax.tree_util.tree_leaves(out) if o.dtype != jnp.int32)
        return model.apply(v, pc_i, method=run)

    t_det = timed_scan(det_fn, pc_stack2)

    s_flops, s_bytes = scoring_pass_flops_bytes()
    mfu_scoring = s_flops / t_scoring / PEAK_BF16_FLOPS
    mbu_scoring = s_bytes / t_scoring / PEAK_HBM_BYTES
    mfu_vit = vit_flops() / t_vit / PEAK_BF16_FLOPS

    # ---- open-ended generation (the reference predict --open_ended path,
    # scripts/predict.py:353-378): jitted KV-cached beam search over the
    # interleaved 2D/3D question states (models/generation.py) ----
    @jax.jit
    def gen_scan(v, batch, pcs, imgs):
        def body(c, x):
            pc_i, img_i = x
            b = dict(batch, point_clouds=pc_i, images=img_i)
            out = model.apply(v, b, train=False, inference="generate")
            return c + jnp.sum(out["generated_ids"]).astype(jnp.float32), None
        s, _ = jax.lax.scan(body, 0.0, (pcs, imgs))
        return s

    _ = np.asarray(gen_scan(variables, batch, pc_stack, img_rep))  # compile
    t0 = time.perf_counter()
    _ = np.asarray(gen_scan(variables, batch, pc_stack, img_rep))
    t_generate = max((time.perf_counter() - t0 - RPC_FLOOR) / REPS, 1e-9)

    # ---- training throughput (reference hot loop: lib/solver.py:398-411,
    # trained at batch 16/GPU per scripts/train.py:47) ----
    from bridgeqa_tpu.train.optim import OptimConfig, build_optimizer
    from bridgeqa_tpu.train.step import StepConfig, TrainState, train_body

    TRAIN_BATCH = 2 if smoke else 16
    tb = TRAIN_BATCH
    max_obj = 8
    tr_pc = np.asarray(pc_stack)[0][:tb]
    tr_batch = dict(
        point_clouds=jnp.asarray(tr_pc, jnp.float32),
        images=jnp.asarray(rng.rand(tb, IMAGE_SIZE, IMAGE_SIZE, 3), jnp.float32),
        question_ids=jnp.asarray(rng.randint(1, vmax, (tb, QUESTION_LEN))),
        question_mask=jnp.ones((tb, QUESTION_LEN), jnp.int32),
        answer_ids=jnp.asarray(rng.randint(1, vmax, (tb, ANSWER_LEN))),
        answer_mask=jnp.ones((tb, ANSWER_LEN), jnp.int32),
        answer_cat=jnp.asarray(rng.randint(0, NUM_ANSWERS, (tb,))),
        answer_cat_scores=jnp.asarray(rng.rand(tb, NUM_ANSWERS), jnp.float32),
        vote_label=jnp.asarray(rng.randn(tb, NUM_POINTS, 9) * 0.1, jnp.float32),
        vote_label_mask=jnp.asarray(rng.randint(0, 2, (tb, NUM_POINTS)), jnp.float32),
        center_label=jnp.asarray(rng.randn(tb, max_obj, 3), jnp.float32),
        box_label_mask=jnp.ones((tb, max_obj), jnp.float32),
        sem_cls_label=jnp.asarray(rng.randint(0, 18, (tb, max_obj)), jnp.int32),
        size_class_label=jnp.asarray(rng.randint(0, 18, (tb, max_obj)), jnp.int32),
        size_residual_label=jnp.asarray(rng.randn(tb, max_obj, 3) * 0.1, jnp.float32),
        heading_class_label=jnp.zeros((tb, max_obj), jnp.int32),
        heading_residual_label=jnp.zeros((tb, max_obj), jnp.float32),
        ref_center_label=jnp.asarray(rng.randn(tb, 3), jnp.float32),
        ref_heading_class_label=jnp.zeros((tb,), jnp.int32),
        ref_heading_residual_label=jnp.zeros((tb,), jnp.float32),
        ref_size_class_label=jnp.asarray(rng.randint(0, 18, (tb,)), jnp.int32),
        ref_size_residual_label=jnp.asarray(rng.randn(tb, 3) * 0.1, jnp.float32),
        ref_obj_mask=jnp.ones((tb,), jnp.int32),
        object_cat=jnp.asarray(rng.randint(0, 18, (tb,)), jnp.int32),
    )
    # Train under remat like the reference: its ViT blocks run inside
    # fairscale checkpoint_wrapper (models/vit.py:103-105), trading recompute
    # for activation memory. Without remat the batch-16 backward's saved
    # (B, 12, 901, 901) ViT attention probs alone blow the 16G HBM.
    # remat does not change the param tree (tests/test_remat.py).
    import dataclasses as _dc
    train_cfg = _dc.replace(
        cfg, blip=_dc.replace(cfg.blip, remat=True, remat_mode="block"))
    train_model = BridgeQA(train_cfg, mean_size_arr=dc.mean_size_arr, dtype=jnp.bfloat16)
    tx, _ = build_optimizer(variables["params"], OptimConfig())
    # TrainState.create aliases variables["params"] (train/step.py:30-33) and
    # train_scan donates the state, which consumes those shared buffers: the
    # train phase MUST stay the last phase, and `variables` must never be
    # touched afterwards — enforced by deleting the name here. (A defensive
    # params copy would cost ~1.75G extra HBM at batch 16, eating the remat
    # headroom that makes the step fit on the 16G chip.)
    t_state = TrainState.create(variables, tx)
    del variables
    step_cfg = StepConfig()

    tr_pcs = jnp.asarray(np.stack(
        [tr_pc + 1e-3 * (i + 1) for i in range(REPS)]), jnp.float32)
    tr_rngs = jax.random.split(jax.random.PRNGKey(7), REPS)

    # Donating the state is what makes batch 16 fit: without it the f32
    # params + both AdamW moments (~7G) are double-buffered as arguments
    # AND fresh outputs (the production step donates too, train/step.py:93).
    @partial(jax.jit, donate_argnums=(0,))
    def train_scan(state, batch, pcs, rngs):
        def body(carry, x):
            pc_i, rng_i = x
            b = dict(batch, point_clouds=pc_i)
            new_state, metrics = train_body(train_model, dc, tx, step_cfg, carry, b, rng_i, 0.1)
            return new_state, metrics["loss"]
        state, losses = jax.lax.scan(body, state, (tr_pcs, rngs))
        return state, jnp.sum(losses)

    t_state, l0 = train_scan(t_state, tr_batch, tr_pcs, tr_rngs)  # compile
    _ = np.asarray(l0)
    t0 = time.perf_counter()
    t_state, l1 = train_scan(t_state, tr_batch, tr_pcs, tr_rngs)
    _ = np.asarray(l1)
    t_train = max((time.perf_counter() - t0 - RPC_FLOOR) / REPS, 1e-9)
    train_samples_per_sec = tb / t_train
    # useful FLOPs = 3x fwd GEMMs (fwd + 2x in bwd); remat's recompute is
    # overhead by MFU convention, so the achievable ceiling under "block"
    # remat is ~75% even at perfect MXU occupancy. Detector excluded -> lower
    # bound (see train_fwd_gemm_flops).
    train_mfu = 3 * train_fwd_gemm_flops(tb, cfg.num_proposal) / t_train / PEAK_BF16_FLOPS

    payload = {
        "metric": "QA pairs/sec/chip (ScanQA-shape e2e paralleltwin rank inference, "
                  "batch 32, k_test=256, answer_len 12)",
        "value": round(qa_per_sec, 3),
        "unit": "QA pairs/sec/chip",
        "vs_baseline": round(qa_per_sec / BASELINE_QA_PER_SEC_PER_GPU, 3),
        "baseline_note": f"vs estimated {BASELINE_QA_PER_SEC_PER_GPU} QA/s/GPU for the torch "
                         "reference eval loop (estimate, not a measurement; fixed across rounds)",
        "timing_note": "steady-state: 4 perturbed batches scanned in one jit, outputs reduced "
                       "in-graph, minus the 30 ms dispatch floor (fetching full scores per "
                       "dispatch would time the ~40 MB/s axon debug tunnel, not the chip); "
                       "rounds 1-2 timed per-dispatch incl. tunnel fetch (~44 ms pessimistic)",
        "scoring_pass_ms": round(t_scoring * 1e3, 1),
        "vit_ms": round(t_vit * 1e3, 1),
        "detector_ms": round(t_det * 1e3, 1),
        "mfu_scoring": round(mfu_scoring, 3),
        "mbu_scoring": round(mbu_scoring, 3),
        "mfu_vit": round(mfu_vit, 3),
        "generate_ms": round(t_generate * 1e3, 1),
        "generate_samples_per_sec": round(BATCH / t_generate, 2),
        "generate_note": "open-ended KV-cached beam search (reference predict --open_ended, "
                         f"predict.py:353-378) at batch {BATCH}, num_beams "
                         f"{cfg.blip.num_beams}, max_length {cfg.blip.generate_max_length}",
        "train_step_ms": round(t_train * 1e3, 1),
        "train_samples_per_sec": round(train_samples_per_sec, 2),
        "train_mfu": round(train_mfu, 3),
        "train_mfu_note": "3x analytic fwd GEMM FLOPs (ViT+twin+2 decoders; detector point ops "
                          "excluded -> lower bound) / step time / 197 TFLOP/s; 'block' remat "
                          "recompute counts as overhead, so ~0.75 is the remat ceiling",
        "train_note": f"full train step (fwd+loss+grads+AdamW groups) at the reference's own "
                      f"batch {TRAIN_BATCH} (scripts/train.py:47), 40k points, bf16 compute, "
                      "ViT/BERT remat (reference trains its ViT under fairscale "
                      "checkpoint_wrapper, models/vit.py:103-105); "
                      "scanned 4 perturbed batches in one jit minus the dispatch floor",
        "roofline_note": "mfu/mbu = analytic GEMM FLOPs (2MNK summed) and fused-path HBM bytes "
                         "(one activation round-trip/layer + weights + head table stream) over "
                         "measured time, vs v5e peaks 197 TFLOP/s bf16 / 819 GB/s; "
                         "one decoder scoring pass at B*k=8192, La=12; ViT-B/480 batch 32",
    }
    if smoke:
        payload["smoke"] = True  # tiny CPU plumbing check; numbers meaningless
    print(json.dumps(payload))


if __name__ == "__main__":
    main(smoke="--smoke" in sys.argv[1:])
