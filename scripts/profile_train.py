"""Train-step phase profiler: where the training millisecond budget goes.

The reference's hot training loop (``lib/solver.py:398-411``) is
forward -> loss -> backward -> optimizer on one CUDA stream; its published
profile is the per-phase ``fetch/forward/backward/eval`` means logged every
``verbose`` iters (``lib/solver.py:466-503``). This is the TPU equivalent:
each phase of the fused train step is timed as its own jitted
``value_and_grad`` program over CSE-proof perturbed-input scans (the bench
harness trick), plus analytic MFU for the GEMM-dominated phases, so the
train-step budget is grounded in hardware peaks rather than guesses.

Run on the real chip:  python scripts/profile_train.py [--batch 16]
CPU plumbing check:    python scripts/profile_train.py --smoke

Prints one JSON object per line (phase, ms, optional mfu), then a summary
line. Phases:

  full        complete train step (fwd + all losses + bwd + grouped AdamW)
  fwd         forward + loss only (no grad) — bwd cost = full - fwd - opt
  detector    d(sum detector outputs)/d(params) at 40k points
  vit         d(sum ViT-B/480 embeds)/d(params)
  twin        d(sum twin question encode)/d(params), fixed image embeds
  decoders    d(2d+3d LM loss)/d(params), fixed question states
  opt         grouped AdamW update alone on prebuilt grads
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RPC_FLOOR = 0.030  # measured axon dispatch+fetch round-trip floor
REPS = 4

# TPU v5e single-chip peaks (public spec)
PEAK_BF16_FLOPS = 197e12


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16,
                    help="train batch (reference scripts/train.py:47 default 16)")
    ap.add_argument("--smoke", action="store_true", help="tiny CPU plumbing check")
    ap.add_argument("--num_points", type=int, default=40000)
    ap.add_argument("--image_size", type=int, default=480)
    args = ap.parse_args()

    if args.smoke:
        # force CPU before first device use (the axon sitecustomize merges the
        # TPU platform back in even with JAX_PLATFORMS=cpu in the env); the
        # LLVM flags halve the XLA:CPU compile (plumbing check — codegen
        # quality is irrelevant, same trick as __graft_entry__.dryrun)
        os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                                   + " --xla_backend_optimization_level=0"
                                   + " --xla_llvm_disable_expensive_passes=true")
        import jax
        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp

    from bridgeqa_tpu.data.scannet_config import ScannetDatasetConfig
    from bridgeqa_tpu.models.blip_vqa3d import BlipVQA3DConfig
    from bridgeqa_tpu.models.bridgeqa import BridgeQA, BridgeQAConfig
    from bridgeqa_tpu.models.med import MedConfig
    from bridgeqa_tpu.train.optim import OptimConfig, build_optimizer
    from bridgeqa_tpu.train.step import StepConfig, TrainState, train_body

    B = args.batch
    NUM_POINTS, IMAGE_SIZE = args.num_points, args.image_size
    QUESTION_LEN, ANSWER_LEN = 80, 12
    NUM_ANSWERS = 4500
    H, FF, LAYERS, VOCAB = 768, 3072, 12, 30524

    dc = ScannetDatasetConfig()
    if args.smoke:
        B, NUM_POINTS, IMAGE_SIZE = 2, 1024, 64
        QUESTION_LEN, ANSWER_LEN, NUM_ANSWERS = 20, 6, 30
        H, FF, LAYERS, VOCAB = 64, 128, 2, 200
        med = MedConfig(vocab_size=VOCAB, hidden_size=H, num_hidden_layers=LAYERS,
                        num_attention_heads=4, intermediate_size=FF,
                        max_position_embeddings=128, encoder_width=H)
        blip = BlipVQA3DConfig(med=med, image_size=IMAGE_SIZE, num_answers=NUM_ANSWERS,
                               vit="custom", vit_custom_embed_dim=H, vit_custom_depth=2,
                               vit_custom_heads=4, vit_drop_path_rate=0.0, bos_token_id=110)
        cfg = BridgeQAConfig(num_answers=NUM_ANSWERS, num_proposal=32, hidden_size=32,
                             blip=blip, mcan_num_layers=1, mcan_flat_out_size=64,
                             mcan_flat_mlp_size=32, input_feature_dim=1)
        vit_depth, vit_width, vit_tokens = 2, H, (IMAGE_SIZE // 16) ** 2 + 1
    else:
        cfg = BridgeQAConfig(num_answers=NUM_ANSWERS, input_feature_dim=1)
        vit_depth, vit_width, vit_tokens = 12, 768, (IMAGE_SIZE // 16) ** 2 + 1

    # Production training runs under remat like the reference (fairscale
    # checkpoint_wrapper around ViT blocks, models/vit.py:103-105): without it
    # the batch-16 ViT backward's saved attention probs alone exceed 16G HBM.
    import dataclasses as _dc
    cfg = _dc.replace(cfg, blip=_dc.replace(cfg.blip, remat=True))
    # the fused Pallas ViT/scoring kernels are inference-only (no VJP); the
    # production train step runs the module path, so the component grad
    # phases must too — vit_grad calls encode_image(train=False), which
    # would otherwise route to the fused kernel and fail under value_and_grad
    from bridgeqa_tpu.ops import vit_block as _vb
    _vb.FUSED_MODE = "never"
    model = BridgeQA(cfg, mean_size_arr=dc.mean_size_arr, dtype=jnp.bfloat16)
    bos_id = cfg.blip.bos_token_id
    vmax = min(30000, cfg.blip.med.vocab_size - 2)
    h_model = cfg.blip.med.hidden_size

    rng = np.random.RandomState(0)
    pc = (rng.rand(B, NUM_POINTS, 3) - 0.5) * 6.0
    height = pc[..., 2:3] - pc[..., 2:3].min(axis=1, keepdims=True)
    max_obj = 8
    batch = dict(
        point_clouds=jnp.asarray(np.concatenate([pc, height], axis=-1), jnp.float32),
        images=jnp.asarray(rng.rand(B, IMAGE_SIZE, IMAGE_SIZE, 3), jnp.float32),
        question_ids=jnp.asarray(rng.randint(1, vmax, (B, QUESTION_LEN))),
        question_mask=jnp.ones((B, QUESTION_LEN), jnp.int32),
        answer_ids=jnp.asarray(rng.randint(1, vmax, (B, ANSWER_LEN))),
        answer_mask=jnp.ones((B, ANSWER_LEN), jnp.int32),
        answer_cat=jnp.asarray(rng.randint(0, NUM_ANSWERS, (B,))),
        answer_cat_scores=jnp.asarray(rng.rand(B, NUM_ANSWERS), jnp.float32),
        vote_label=jnp.asarray(rng.randn(B, NUM_POINTS, 9) * 0.1, jnp.float32),
        vote_label_mask=jnp.asarray(rng.randint(0, 2, (B, NUM_POINTS)), jnp.float32),
        center_label=jnp.asarray(rng.randn(B, max_obj, 3), jnp.float32),
        box_label_mask=jnp.ones((B, max_obj), jnp.float32),
        sem_cls_label=jnp.asarray(rng.randint(0, 18, (B, max_obj)), jnp.int32),
        size_class_label=jnp.asarray(rng.randint(0, 18, (B, max_obj)), jnp.int32),
        size_residual_label=jnp.asarray(rng.randn(B, max_obj, 3) * 0.1, jnp.float32),
        heading_class_label=jnp.zeros((B, max_obj), jnp.int32),
        heading_residual_label=jnp.zeros((B, max_obj), jnp.float32),
        ref_center_label=jnp.asarray(rng.randn(B, 3), jnp.float32),
        ref_heading_class_label=jnp.zeros((B,), jnp.int32),
        ref_heading_residual_label=jnp.zeros((B,), jnp.float32),
        ref_size_class_label=jnp.asarray(rng.randint(0, 18, (B,)), jnp.int32),
        ref_size_residual_label=jnp.asarray(rng.randn(B, 3) * 0.1, jnp.float32),
        ref_obj_mask=jnp.ones((B,), jnp.int32),
        object_cat=jnp.asarray(rng.randint(0, 18, (B,)), jnp.int32),
    )

    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch, train=True,
    )
    variables = {"params": variables["params"],
                 "batch_stats": variables.get("batch_stats", {})}
    params, batch_stats = variables["params"], variables["batch_stats"]
    tx, _ = build_optimizer(params, OptimConfig())
    step_cfg = StepConfig()

    def fresh_state():
        """A donatable TrainState built from COPIES of the shared params
        (TrainState.create would alias ``variables['params']``; donating the
        aliased buffers would invalidate every later phase's operands)."""
        return TrainState.create(
            {"params": jax.tree_util.tree_map(jnp.copy, params),
             "batch_stats": jax.tree_util.tree_map(jnp.copy, batch_stats)}, tx)

    pcs = jnp.asarray(np.stack([np.asarray(batch["point_clouds"]) + 1e-3 * (i + 1)
                                for i in range(REPS)]), jnp.float32)
    imgs = jnp.asarray(np.stack([np.asarray(batch["images"]) + 1e-3 * (i + 1)
                                 for i in range(REPS)]), jnp.float32)
    rngs = jax.random.split(jax.random.PRNGKey(7), REPS)

    def timed(make_run, operands, xs, label="", donate=False):
        """Compile + steady-state time of a jitted scan over perturbed xs.

        ``operands`` (params / state trees) are passed as jit ARGUMENTS —
        closing over them would bake multi-GB constants into every phase's
        lowering (observed: 7.5G captured constants, compile never finished).

        ``donate=True`` donates arg 0 (required for phases that carry the
        full f32 params + AdamW moments: without donation the ~7G state is
        double-buffered and batch 16 OOMs the 16G chip, same as bench.py's
        train phase). Donated operands are consumed per call, so pass a
        zero-arg FACTORY producing a fresh operand tree instead of the tree.
        """
        run = jax.jit(make_run, donate_argnums=(0,) if donate else ())
        get = operands if callable(operands) else (lambda: operands)

        def fetch(res):
            # donated phases return (final_state, scalar): the state output
            # is what the donated input buffers alias into (without it XLA
            # reports "donated buffers not usable" and double-buffers ~7G);
            # fetch only the scalar to keep the host tunnel out of the timing
            return np.asarray(res[-1] if isinstance(res, tuple) else res)

        t0 = time.perf_counter()
        _ = fetch(run(get(), xs))  # compile + warm
        print(f"# {label}: compiled+warm in {time.perf_counter() - t0:.1f}s",
              file=sys.stderr, flush=True)
        ops = get()
        t0 = time.perf_counter()
        _ = fetch(run(ops, xs))
        return max((time.perf_counter() - t0 - RPC_FLOOR) / REPS, 1e-9)

    results = {}

    # ---- full train step --------------------------------------------------
    def full_run(st0, xs):
        def body(carry, x):
            pc_i, rng_i = x
            b = dict(batch, point_clouds=pc_i)
            new_state, metrics = train_body(model, dc, tx, step_cfg, carry, b, rng_i, 0.1)
            return new_state, metrics["loss"]
        st, losses = jax.lax.scan(body, st0, xs)
        return st, jnp.sum(losses)

    results["full"] = timed(full_run, fresh_state, (pcs, rngs), "full", donate=True)

    # ---- forward + loss only ----------------------------------------------
    from bridgeqa_tpu.losses import get_loss

    def fwd_only(params, xs):
        def body(c, x):
            pc_i, rng_i = x
            b = dict(batch, point_clouds=pc_i)
            out, _ = model.apply(
                {"params": params, "batch_stats": batch_stats},
                b, train=True, bn_momentum=0.1, mutable=["batch_stats"],
                rngs={"dropout": rng_i})
            ep = dict(b); ep.update(out)
            loss, _ = get_loss(ep, dc, detection=True, use_reference=True,
                               use_lang_classifier=True, use_answer=True)
            return c + loss.astype(jnp.float32), None
        s, _ = jax.lax.scan(body, 0.0, xs)
        return s

    results["fwd"] = timed(fwd_only, params, (pcs, rngs), "fwd")

    # ---- detector fwd+bwd ---------------------------------------------------
    def det_grad(params0, xs):
        def body(c, pc_i):
            def f(params):
                out = model.apply({"params": params, "batch_stats": batch_stats},
                                  pc_i, method=lambda m, p: m.detector(p, train=False))
                return sum(jnp.sum(o.astype(jnp.float32))
                           for o in jax.tree_util.tree_leaves(out)
                           if o.dtype != jnp.int32)
            l, g = jax.value_and_grad(f)(params0)
            return c + l + sum(jnp.sum(jnp.abs(x).astype(jnp.float32)) * 1e-30
                               for x in jax.tree_util.tree_leaves(g)), None
        s, _ = jax.lax.scan(body, 0.0, xs)
        return s

    results["detector"] = timed(det_grad, params, pcs, "detector")

    # ---- ViT fwd+bwd --------------------------------------------------------
    def vit_grad(params0, xs):
        def body(c, img_i):
            def f(params):
                out = model.apply({"params": params, "batch_stats": batch_stats},
                                  img_i,
                                  method=lambda m, im: m.blip_model.encode_image(im, train=False))
                return jnp.sum(out.astype(jnp.float32))
            l, g = jax.value_and_grad(f)(params0)
            return c + l + sum(jnp.sum(x.astype(jnp.float32)) * 1e-30
                               for x in jax.tree_util.tree_leaves(g)), None
        s, _ = jax.lax.scan(body, 0.0, xs)
        return s

    results["vit"] = timed(vit_grad, params, imgs, "vit")

    # ---- twin question encode fwd+bwd (fixed image embeds) ------------------
    n_obj = cfg.num_proposal
    img_embeds = jnp.asarray(rng.randn(B, vit_tokens, vit_width) * 0.3, jnp.bfloat16)
    # detector-width object features; encode_question's scene-object adapter
    # (linear_scene_object) maps cfg.hidden_size -> BERT width itself
    obj_embeds = jnp.asarray(rng.randn(B, n_obj, cfg.hidden_size) * 0.3, jnp.float32)
    obj_mask = jnp.ones((B, n_obj), jnp.int32)
    ie_stack = jnp.asarray(np.stack([np.asarray(img_embeds, np.float32) + 1e-3 * i
                                     for i in range(REPS)]), jnp.bfloat16)

    def twin_grad(params0, xs):
        def body(c, ie_i):
            def f(params):
                def run(m, ie):
                    h2d, h3d, _ = m.blip_model.encode_question(
                        ie, batch["question_ids"], batch["question_mask"],
                        obj_embeds, obj_mask, train=False)
                    return jnp.sum(h2d.astype(jnp.float32)) + jnp.sum(h3d.astype(jnp.float32))
                return model.apply({"params": params, "batch_stats": batch_stats},
                                   ie_i, method=run)
            l, g = jax.value_and_grad(f)(params0)
            return c + l + sum(jnp.sum(x.astype(jnp.float32)) * 1e-30
                               for x in jax.tree_util.tree_leaves(g)), None
        s, _ = jax.lax.scan(body, 0.0, xs)
        return s

    results["twin"] = timed(twin_grad, params, ie_stack, "twin")

    # ---- both decoder LM losses fwd+bwd (fixed question states) -------------
    qs_stack = jnp.asarray(rng.randn(REPS, B, QUESTION_LEN, h_model).astype(np.float32) * 0.5)

    def dec_grad(params0, xs):
        def body(c, qs_i):
            def f(params):
                def run(m, qs):
                    tgt = jnp.where(batch["answer_ids"] == m.blip_model.cfg.pad_token_id,
                                    -100, batch["answer_ids"])
                    _, l2 = m.blip_model.text_decoder(
                        batch["answer_ids"], batch["answer_mask"], qs,
                        batch["question_mask"], labels=tgt, deterministic=True)
                    _, l3 = m.blip_model._decoder_scene()(
                        batch["answer_ids"], batch["answer_mask"], qs,
                        batch["question_mask"], labels=tgt, deterministic=True,
                        layernorm_idx=m.blip_model._scene_layernorm_idx())
                    return (jnp.sum(l2) + jnp.sum(l3)).astype(jnp.float32) / B
                return model.apply({"params": params, "batch_stats": batch_stats},
                                   qs_i, method=run)
            l, g = jax.value_and_grad(f)(params0)
            return c + l + sum(jnp.sum(x.astype(jnp.float32)) * 1e-30
                               for x in jax.tree_util.tree_leaves(g)), None
        s, _ = jax.lax.scan(body, 0.0, xs)
        return s

    results["decoders"] = timed(dec_grad, params, qs_stack, "decoders")

    # ---- optimizer alone -----------------------------------------------------
    # One base grad tree scaled by a per-rep SCALAR inside the scan (a
    # REPS-wide stacked grad tree would be ~REPS x params bytes of HBM on top
    # of the params + moments — an OOM by itself at ViT-B/BERT-base scale).
    # The carry (params + moments) is donated via a fresh-copy factory.
    grads = jax.tree_util.tree_map(lambda p: jnp.ones_like(p) * 1e-4, params)
    scales = jnp.asarray([1 + 0.1 * i for i in range(REPS)], jnp.float32)

    def fresh_opt_carry():
        p = jax.tree_util.tree_map(jnp.copy, params)
        return (p, tx.init(p))

    def opt_run(carry0, aux):
        import optax
        g_base, scales_i = aux

        def body(carry, s_i):
            p, opt_state = carry
            g_i = jax.tree_util.tree_map(lambda x: x * s_i, g_base)
            updates, new_opt = tx.update(g_i, opt_state, p)
            new_params = optax.apply_updates(p, updates)
            return (new_params, new_opt), jnp.sum(
                updates["object_feat_linear"]["kernel"].astype(jnp.float32))

        (_, _), outs = jax.lax.scan(body, carry0, scales_i)
        return jnp.sum(outs)

    results["opt"] = timed(opt_run, fresh_opt_carry, (grads, scales), "opt", donate=True)

    # ---- analytic MFU for the GEMM phases (fwd+bwd = 3x fwd GEMM FLOPs) ----
    t = vit_tokens
    vit_fwd_flops = B * vit_depth * (t * (4 * vit_width**2 + 2 * vit_width * (4 * vit_width)) * 2
                                     + 2 * t * t * vit_width * 2)
    twin_keys_2d, twin_keys_3d = vit_tokens, n_obj
    twin_fwd_flops = B * LAYERS * QUESTION_LEN * 2 * (
        # two streams: self QKV+out + cross q+out + FFN pair
        2 * (4 * H * H + 2 * H * H + 2 * H * FF)
    ) + B * LAYERS * 2 * 2 * (
        # cross K/V projections over [keys] + attention scores/ctx
        (twin_keys_2d + twin_keys_3d) * 2 * H * H
        + QUESTION_LEN * (twin_keys_2d + twin_keys_3d) * H * 2
        + QUESTION_LEN * QUESTION_LEN * H * 2
    )
    dec_rows = B * ANSWER_LEN
    dec_fwd_flops = 2 * (LAYERS * dec_rows * (
        4 * H * H * 2 + 2 * H * H * 2 + 2 * H * FF * 2
        + 2 * ANSWER_LEN * H * 2 + 2 * QUESTION_LEN * H * 2)
        + B * LAYERS * QUESTION_LEN * 2 * H * H * 2  # cross K/V over question
        + dec_rows * (H * H + H * VOCAB) * 2)

    mfu = {
        "vit": 3 * vit_fwd_flops / results["vit"] / PEAK_BF16_FLOPS,
        "twin": 3 * twin_fwd_flops / results["twin"] / PEAK_BF16_FLOPS,
        "decoders": 3 * dec_fwd_flops / results["decoders"] / PEAK_BF16_FLOPS,
    }

    for phase in ("full", "fwd", "detector", "vit", "twin", "decoders", "opt"):
        row = {"phase": phase, "ms": round(results[phase] * 1e3, 1)}
        if phase in mfu:
            row["mfu"] = round(mfu[phase], 3)
        print(json.dumps(row))

    bwd_glue = results["full"] - results["fwd"] - results["opt"]
    component_sum = (results["detector"] + results["vit"] + results["twin"]
                     + results["decoders"] + results["opt"])
    print(json.dumps({
        "summary": {
            "batch": B,
            "train_samples_per_sec": round(B / results["full"], 2),
            "bwd_plus_glue_ms": round(bwd_glue * 1e3, 1),
            "component_grad_sum_ms": round(component_sum * 1e3, 1),
            "full_ms": round(results["full"] * 1e3, 1),
            "note": "component grads each re-run their own forward, so their sum "
                    "overcounts vs full (which shares one forward); mfu = 3x analytic "
                    "fwd GEMM FLOPs / time vs 197 TFLOP/s bf16 peak",
        },
        "smoke": bool(args.smoke) or None,
    }))


if __name__ == "__main__":
    main()
