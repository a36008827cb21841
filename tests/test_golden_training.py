"""TRAINING-DYNAMICS goldens: the reference's own backward + AdamW loop vs
``jax.grad`` + the production optax optimizer, with converter-shared weights.

Everything prior compared forward passes under ``torch.no_grad()``; these two
tests close the last correctness hole (round-4 verdict item 1):

- **gradient golden** — ``get_loss(ScanQA(data)).backward()``
  (``lib/solver.py:398-411`` semantics) vs ``jax.value_and_grad`` of the
  production ``train_body`` loss on the same batch, comparing dLoss/dtheta
  across EVERY converted parameter (backbone SA MLPs, voting, proposal head,
  twin layers incl. ``layer_twin``, both decoders, adapters, grounding/lang
  heads). The reference's full backward runs on CPU via the exact-semantics
  ``pointnet2._ext`` oracles incl. their gradient kernels
  (``tests/ref_shim.py``).
- **trajectory golden** — 10 full optimizer steps on a fixed synthetic batch:
  3-group AdamW routing (``scripts/train.py:385-417``), clip-by-value 1.0
  (``solver.py:408-409``), the x10 loss, and a stepped BN-momentum schedule
  (``pytorch_utils.py:299-312``), asserting the loss trajectories track and
  the BN running stats converge to the same values.

Both sides run with all dropout rates pinned to 0 so the train-mode graph is
deterministic; BN still runs in train mode (batch statistics + running-stat
updates), which is the part forward goldens never exercised.
"""

import os
import types

import numpy as np
import pytest

from tests.ref_shim import REFERENCE, install_pointnet2_ext_oracles

pytestmark = [
    pytest.mark.skipif(not os.path.isdir(REFERENCE), reason="no reference snapshot"),
    # reference-torch golden tier: executes the reference snapshot's own
    # torch code on CPU (minutes per test) — excluded from the default
    # fast suite; run with `pytest -m golden`
    pytest.mark.golden,
]

torch = pytest.importorskip("torch")

B = 2
N_POINTS = 2304  # >= the backbone's hardcoded SA1 npoint (2048)
NUM_PROPOSAL = 32
HIDDEN = 128
NUM_ANSWERS = 8
MAX_OBJ = 6

# optimizer hyperparameters = the reference CLI defaults (scripts/train.py)
LR, LR_BLIP, LR_BLIP3D, WD, WD_BLIP = 5e-4, 1e-4, 1e-4, 1e-5, 0.0

# reference routing patterns (scripts/train.py:389-407)
_BLIP3D_PATTERNS = ("layer_twin", "text_encoder_scene", "text_decoder_scene")
_OTHER_PATTERNS = ("lowrank", "fusion", "gated", "lang_net", "answer_cls",
                   "linear_scene_object", "scene_weight", "classifier")


def _zero_torch_dropout(model):
    for mod in model.modules():
        if isinstance(mod, torch.nn.Dropout):
            mod.p = 0.0
        if hasattr(mod, "drop_prob"):  # timm-style DropPath
            mod.drop_prob = 0.0


def _set_torch_bn_momentum(model, momentum):
    for mod in model.modules():
        if isinstance(mod, (torch.nn.BatchNorm1d, torch.nn.BatchNorm2d)):
            mod.momentum = momentum


def _torch_param_groups(model):
    """3-group AdamW routing exactly as ``scripts/train.py:385-417``."""
    p_blip, p_blip3d, p_other = [], [], []
    for name, param in model.named_parameters():
        if "blip_model" in name:
            if any(p in name for p in _BLIP3D_PATTERNS):
                p_blip3d.append(param)
            elif any(p in name for p in _OTHER_PATTERNS):
                p_other.append(param)
            else:
                p_blip.append(param)
        else:
            p_other.append(param)
    return [
        {"params": p_blip, "lr": LR_BLIP, "weight_decay": WD_BLIP},
        {"params": p_blip3d, "lr": LR_BLIP3D, "weight_decay": WD_BLIP},
        {"params": p_other},
    ]


def _grad_state_dict(model):
    """state_dict-shaped tree of gradients (zeros for buffers / no-grad
    params). ``keep_vars=True`` returns the parameter objects themselves, so
    tied tensors (LM-head decoder <-> word embeddings) expose the same
    accumulated ``.grad`` under both names, matching JAX's summed gradient
    for the shared table."""
    out = {}
    for k, v in model.state_dict(keep_vars=True).items():
        g = getattr(v, "grad", None)
        out[k] = (g if g is not None else torch.zeros_like(v)).detach().numpy().copy()
    return out


@pytest.fixture(scope="module")
def tpair():
    import jax

    from tests.ref_shim import import_ref_dataset
    from tests.test_golden_orchestration import _FakeTokenizer, _pad_ids

    install_pointnet2_ext_oracles()
    import_ref_dataset()

    import lib.loss_helper as ref_loss
    import models.blip_vqa_3d as ref_vqa3d
    import models.qa_module as ref_qa

    from bridgeqa_tpu.data.scannet_config import ScannetDatasetConfig
    from bridgeqa_tpu.models.blip_vqa3d import BlipVQA3DConfig
    from bridgeqa_tpu.models.bridgeqa import BridgeQA, BridgeQAConfig
    from bridgeqa_tpu.models.med import MedConfig
    from bridgeqa_tpu.utils.blip_checkpoint import merge_pretrained
    from bridgeqa_tpu.utils.bridgeqa_checkpoint import convert_scanqa

    dc = ScannetDatasetConfig()
    # SAME seeds as tests/test_golden_scanqa.py's proven-clean fixture: the
    # backbone's discrete selections (ball-query membership at the radius
    # boundary) are 1-ulp sensitive to FMA/reassociation differences between
    # frameworks; these seeds produce bitwise-identical index structures
    # (asserted below), other seeds were observed to flip a few memberships
    # and poison the feature comparison downstream.
    rng = np.random.RandomState(42)

    questions = ["q0", "q1"]
    answers = [f"a{i}" for i in range(NUM_ANSWERS)]
    table = {}
    for i, q in enumerate(questions):
        table[q] = [101] + list(rng.randint(1000, 29000, 6 + i)) + [102]
    for i, a in enumerate(answers):
        table[a] = [101] + list(rng.randint(1000, 29000, 1 + (i % 3))) + [102]

    ref_vqa3d.init_tokenizer = lambda: _FakeTokenizer(table)

    def fake_get_blip(**kw):
        model = ref_vqa3d.BLIP_VQA3D(
            image_size=48, vit="base", scene_size=kw["scene_size"],
            num_answers=kw["num_answers"], use_text_decoder=kw["use_text_decoder"],
            scene_feature_position=kw["scene_feature_position"],
            encoder_layers=2, decoder_layers=2,
        )
        return model, 3

    ref_qa.get_blip_model_simple = fake_get_blip

    torch.manual_seed(7)
    ref_model = ref_qa.ScanQA(
        num_answers=NUM_ANSWERS, num_object_class=dc.num_class,
        input_feature_dim=0, num_heading_bin=dc.num_heading_bin,
        num_size_cluster=dc.num_size_cluster, mean_size_arr=dc.mean_size_arr,
        num_proposal=NUM_PROPOSAL, hidden_size=HIDDEN,
        use_object_mask=True, use_lang_cls=True, use_reference=True,
        use_answer=True, use_blip=True, use_text_decoder=True,
        all_answers=answers, stage="VQA",
        scene_feature_position="paralleltwin", image_size=48,
    )
    _zero_torch_dropout(ref_model)
    with torch.no_grad():
        for mod in ref_model.modules():
            if isinstance(mod, (torch.nn.BatchNorm1d, torch.nn.BatchNorm2d)):
                mod.running_mean.normal_(0, 0.3)
                mod.running_var.uniform_(0.5, 2.0)

    med = MedConfig(hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)
    blip_cfg = BlipVQA3DConfig(
        med=med, image_size=48, vit="base", scene_size=HIDDEN,
        num_answers=NUM_ANSWERS, use_text_decoder=True,
        encoder_layers=2, decoder_layers=2,
        vit_drop_path_rate=0.0, adapter_pdrop=0.0, answer_pdrop=0.0,
    )
    cfg = BridgeQAConfig(
        num_answers=NUM_ANSWERS, num_object_class=dc.num_class,
        num_heading_bin=dc.num_heading_bin, num_size_cluster=dc.num_size_cluster,
        num_proposal=NUM_PROPOSAL, hidden_size=HIDDEN, use_blip=True,
        use_text_decoder=True, use_lang_cls=True,
        head_pdrop=0.0, mcan_pdrop=0.0, blip=blip_cfg,
    )
    model = BridgeQA(cfg, mean_size_arr=dc.mean_size_arr)

    # ---- shared inputs + GT labels
    points = ((rng.rand(B, N_POINTS, 3) - 0.5) * np.array([6.0, 6.0, 2.5])).astype(np.float32)
    image = rng.rand(B, 48, 48, 3).astype(np.float32)
    poses = np.tile(np.eye(4, dtype=np.float32), (B, 1, 1, 1))
    depths = np.zeros((B, 1, 48, 48), np.float32)
    q_ids, q_mask = _pad_ids(table, questions, first_token=_FakeTokenizer.enc_token_id)
    a_ids, a_mask = _pad_ids(table, ["a0", "a1"], first_token=_FakeTokenizer.bos_token_id)

    gt = dict(
        vote_label=(rng.rand(B, N_POINTS, 9).astype(np.float32) - 0.5) * 0.6,
        vote_label_mask=(rng.rand(B, N_POINTS) > 0.5).astype(np.int64),
        center_label=np.concatenate(
            [(rng.rand(B, MAX_OBJ, 3).astype(np.float32) - 0.5) * 4.0,
             np.zeros((B, MAX_OBJ, 1), np.float32)], axis=-1),
        box_label_mask=(rng.rand(B, MAX_OBJ) > 0.3).astype(np.float32),
        heading_class_label=np.zeros((B, MAX_OBJ), np.int64),
        heading_residual_label=np.zeros((B, MAX_OBJ), np.float32),
        size_class_label=rng.randint(0, dc.num_size_cluster, (B, MAX_OBJ)).astype(np.int64),
        size_residual_label=(rng.randn(B, MAX_OBJ, 3) * 0.1).astype(np.float32),
        sem_cls_label=rng.randint(0, dc.num_class, (B, MAX_OBJ)).astype(np.int64),
        ref_center_label=(rng.rand(B, 3).astype(np.float32) - 0.5) * 4.0,
        ref_heading_class_label=np.zeros((B,), np.int64),
        ref_heading_residual_label=np.zeros((B,), np.float32),
        ref_size_class_label=rng.randint(0, dc.num_size_cluster, (B,)).astype(np.int64),
        ref_size_residual_label=(rng.randn(B, 3) * 0.1).astype(np.float32),
        ref_obj_mask=np.array([1.0, 1.0], np.float32),
        object_cat=rng.randint(0, dc.num_class, (B,)).astype(np.int64),
    )

    batch = dict(
        point_clouds=points, images=image,
        question_ids=q_ids, question_mask=q_mask,
        answer_ids=a_ids, answer_mask=a_mask,
    )
    import jax.numpy as jnp

    for k, v in gt.items():
        batch[k] = jnp.asarray(v.astype(np.int32) if v.dtype == np.int64 else v)

    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch, train=False, inference="loss",
    )
    # .copy() is LOAD-BEARING: .detach().numpy() returns VIEWS of the live
    # torch parameter storage; without the copy, the trajectory golden's
    # opt.step() calls would silently rewrite the converted JAX weights
    # through the aliased buffers (observed: step-0 loss 127.8 vs 600.2).
    sd = {k: v.detach().numpy().copy() for k, v in ref_model.state_dict().items()}
    converted = convert_scanqa(sd, image_size=48)
    merged_p, _, skipped_p = merge_pretrained(variables["params"], converted["params"])
    merged_s, _, skipped_s = merge_pretrained(variables["batch_stats"], converted["batch_stats"])
    real_skips = [s for s in skipped_p + skipped_s if "no such param" not in s]
    assert not real_skips, real_skips
    variables = {"params": merged_p, "batch_stats": merged_s}

    def ref_data_dict():
        dd = {
            "point_clouds": torch.from_numpy(points.copy()),
            "scene_id_str": ["scene0000_00", "scene0001_00"],
            "question_id_str": questions,
            "images": torch.from_numpy(image.transpose(0, 3, 1, 2)[:, None].copy()),
            "poses": torch.from_numpy(poses.copy()),
            "depths": torch.from_numpy(depths.copy()),
            "question": questions,
            "answers": ["a0", "a1"],
            "answer_cat_scores": torch.zeros(B, NUM_ANSWERS),
            "phase": "train",
        }
        for k, v in gt.items():
            dd[k] = torch.from_numpy(np.asarray(v).copy())
        return dd

    def ref_loss_backward():
        """One reference forward + get_loss + backward; returns (loss, dd)."""
        ref_model.train()
        dd = ref_model(ref_data_dict())
        loss, dd = ref_loss.get_loss(
            dd, dc, detection=True, use_reference=True,
            use_lang_classifier=True, use_answer=True)
        ref_model.zero_grad()
        loss.backward()
        return loss, dd

    return types.SimpleNamespace(
        ref_model=ref_model, ref_loss_backward=ref_loss_backward,
        ref_loss_mod=ref_loss, ref_data_dict=ref_data_dict,
        model=model, variables=variables, batch=batch, dc=dc,
        convert_scanqa=convert_scanqa,
    )


def _tree_leaves_with_paths(tree, prefix=""):
    if isinstance(tree, dict):
        for k in sorted(tree):
            yield from _tree_leaves_with_paths(tree[k], f"{prefix}/{k}")
    else:
        yield prefix, np.asarray(tree)


def _lookup(tree, path):
    node = tree
    for part in path.strip("/").split("/"):
        if not isinstance(node, dict) or part not in node:
            return None
        node = node[part]
    return node


class TestGradientGolden:
    def test_grads_match_reference_backward(self, tpair):
        """Both backwards at FLOAT64, tight tolerance.

        At f32, cross-framework reduction-order roundoff amplifies to
        ~1e-2 rel-L2 on deep-graph params (detector FP layers, twin
        cross-attention) — measured to collapse below 1e-5 at f64, proving
        those gaps are numerical, not semantic. Running the golden at f64
        makes any SEMANTIC backward difference (a missing detach, a wrong
        mask, different loss composition) stand out by orders of magnitude
        instead of hiding in the f32 noise band.
        """
        import copy

        import jax

        from bridgeqa_tpu.losses import get_loss

        import lib.loss_helper as ref_loss_mod

        # ---- torch side in double. Default dtype too: the loss helpers
        # create fresh f32 tensors (e.g. the objectness CE weight,
        # loss_helper.py:106). Deepcopy so the module-scoped f32 model the
        # trajectory golden uses stays untouched.
        ref_model = copy.deepcopy(tpair.ref_model).double()
        prev_dtype = torch.get_default_dtype()
        torch.set_default_dtype(torch.float64)
        try:
            dd = {k: (v.double() if torch.is_tensor(v) and v.is_floating_point() else v)
                  for k, v in tpair.ref_data_dict().items()}
            ref_model.train()
            ref_dd = ref_model(dd)
            ref_loss_val, ref_dd = ref_loss_mod.get_loss(
                ref_dd, tpair.dc, detection=True, use_reference=True,
                use_lang_classifier=True, use_answer=True)
            ref_model.zero_grad()
            ref_loss_val.backward()
        finally:
            torch.set_default_dtype(prev_dtype)
        grads_conv = tpair.convert_scanqa(_grad_state_dict(ref_model), image_size=48)

        model, dc = tpair.model, tpair.dc

        def _to64(x):
            x = np.asarray(x)
            return x.astype(np.float64) if np.issubdtype(x.dtype, np.floating) else x

        params64 = jax.tree.map(_to64, tpair.variables["params"])
        stats64 = jax.tree.map(_to64, tpair.variables["batch_stats"])
        batch64 = {k: _to64(v) for k, v in tpair.batch.items()}

        def loss_fn(params):
            out, mutated = model.apply(
                {"params": params, "batch_stats": stats64}, batch64,
                train=True, bn_momentum=0.1, mutable=["batch_stats"],
                rngs={"dropout": jax.random.PRNGKey(2)},
            )
            end_points = dict(batch64)
            end_points.update(out)
            loss, end_points = get_loss(end_points, dc, detection=True, use_reference=True,
                                        use_lang_classifier=True, use_answer=True)
            sub = {k: end_points[k] for k in
                   ("vote_loss", "objectness_loss", "box_loss", "sem_cls_loss",
                    "ref_loss", "lang_loss", "answer_loss")}
            inds = {k: end_points[k] for k in
                    ("sa1_inds", "sa2_inds", "seed_inds", "aggregated_vote_inds")}
            return loss, (sub, inds)

        with jax.enable_x64(True):
            (loss, (sub, inds)), grads = jax.jit(
                jax.value_and_grad(loss_fn, has_aux=True))(params64)
            loss = float(loss)
            sub = {k: float(v) for k, v in sub.items()}
            inds = {k: np.asarray(v) for k, v in inds.items()}
            grads = jax.tree.map(np.asarray, grads)

        # precondition: the train-mode forward's discrete selections must
        # agree bitwise, otherwise the gradient comparison would compare two
        # different (individually valid) grouping structures (see the
        # fixture's seed note)
        for key in inds:
            np.testing.assert_array_equal(inds[key], ref_dd[key].numpy(), err_msg=key)

        # the scalar the reference optimizes, and each of its components
        # (rtol 5e-5, not ~1e-15: a handful of internals pin f32 by design
        # on both sides — e.g. torch softmax autocast semantics mirrored in
        # our attention — so full-f64 bitwise agreement is not expected)
        np.testing.assert_allclose(loss, float(ref_loss_val), rtol=5e-5)
        for key in sub:
            np.testing.assert_allclose(
                float(sub[key]), float(ref_dd[key]), rtol=2e-4, atol=1e-7, err_msg=key)

        # dLoss/dtheta for every parameter the converter maps (detector
        # backbone/voting/proposal, twin encoder incl. layer_twin, both
        # decoders, adapters, grounding + lang heads)
        checked = 0
        failures = []
        for path, ref_g in _tree_leaves_with_paths(grads_conv["params"]):
            ours = _lookup(grads, path)
            if ours is None:
                # torch-only module with no counterpart in our tree (e.g. the
                # reference constructs answer_cls even in decoder mode,
                # blip_vqa_3d.py:125-139, but never calls it): legitimate only
                # if the reference backward agrees it is unused (zero grad)
                assert np.linalg.norm(np.asarray(ref_g)) == 0.0, \
                    f"no JAX grad at {path} but reference grad is nonzero"
                continue
            ours = np.asarray(ours, np.float64)
            ref_g = np.asarray(ref_g, np.float64)
            denom = np.linalg.norm(ref_g)
            err = np.linalg.norm(ours - ref_g)
            if denom < 1e-10 and np.linalg.norm(ours) < 1e-10:
                # both numerically zero: unused heads, and mathematically
                # zero-gradient params (attention KEY biases — softmax is
                # invariant to a per-query constant shift, both frameworks
                # return ~1e-17 roundoff noise there at f64)
                checked += 1
                continue
            rel = err / (denom + 1e-30)
            if rel > 1e-4:
                failures.append(f"{path}: rel-L2 {rel:.2e} (|ref|={denom:.3e})")
            checked += 1
        assert checked > 300, f"only {checked} grad tensors compared"
        assert not failures, "\n".join(failures[:25])


class TestTrajectoryGolden:
    def test_ten_step_adamw_trajectory(self, tpair):
        import jax
        import jax.numpy as jnp

        from bridgeqa_tpu.train.optim import OptimConfig, build_optimizer
        from bridgeqa_tpu.train.step import StepConfig, TrainState, train_body

        n_steps = 10
        # stepped BN-momentum schedule, mirroring BNMomentumScheduler's
        # shape (pytorch_utils.py:299-312)
        momenta = [max(0.5 * (0.5 ** (k // 4)), 0.01) for k in range(n_steps)]
        # 0.1x the reference CLI default LRs: at the defaults the random-init
        # loss landscape is chaotic (loss 600 -> 400 in ONE step; measured
        # 10% transient loss divergence at step 2 that re-converges by step
        # 3), so trajectory comparison would test sensitivity, not
        # semantics. Scaling the LR leaves every code path under test --
        # 3-group AdamW routing, clip-by-value 1.0, x10 loss, BN momentum
        # schedule -- identical on both sides.
        lr, lr_blip, lr_blip3d = 0.1 * LR, 0.1 * LR_BLIP, 0.1 * LR_BLIP3D

        # ---- torch side: Solver._backward semantics (solver.py:398-411)
        ref_model, ref_loss = tpair.ref_model, tpair.ref_loss_mod

        def _groups(model):
            groups = _torch_param_groups(model)
            groups[0]["lr"], groups[1]["lr"] = lr_blip, lr_blip3d
            return groups

        opt = torch.optim.AdamW(_groups(ref_model), lr=lr,
                                betas=(0.9, 0.999), eps=1e-8, weight_decay=WD)
        ref_model.train()
        ref_losses, ref_votes = [], []
        for k in range(n_steps):
            _set_torch_bn_momentum(ref_model, momenta[k])
            dd = ref_model(tpair.ref_data_dict())
            loss, dd = ref_loss.get_loss(dd, tpair.dc, detection=True, use_reference=True,
                                         use_lang_classifier=True, use_answer=True)
            opt.zero_grad()
            loss.backward()
            torch.nn.utils.clip_grad_value_(ref_model.parameters(), 1.0)
            opt.step()
            ref_losses.append(float(loss))
            ref_votes.append(float(dd["vote_loss"]))

        # ---- JAX side: the production train step (train/step.py + optim.py)
        ocfg = OptimConfig(lr=lr, lr_blip=lr_blip, lr_blip3d=lr_blip3d, wd=WD,
                           wd_blip=WD_BLIP, steps_per_epoch=10**6)
        tx, _ = build_optimizer(tpair.variables["params"], ocfg)
        state = TrainState.create(
            {"params": jax.tree.map(jnp.copy, tpair.variables["params"]),
             "batch_stats": jax.tree.map(jnp.copy, tpair.variables["batch_stats"])}, tx)
        step_cfg = StepConfig(use_lang_classifier=True)
        step = jax.jit(
            lambda s, b, m: train_body(tpair.model, tpair.dc, tx, step_cfg, s, b,
                                       jax.random.PRNGKey(0), m))
        our_losses, our_votes = [], []
        for k in range(n_steps):
            state, metrics = step(state, tpair.batch, momenta[k])
            our_losses.append(float(metrics["loss"]))
            our_votes.append(float(metrics["vote_loss"]))
            if k == 0:
                print("\nstep0 metrics:", {m: round(float(v), 4) for m, v in metrics.items()})

        print("\ntraj ours:", [round(x, 3) for x in our_losses])
        print("traj ref: ", [round(x, 3) for x in ref_losses])
        print("traj rel: ", [round(abs(a - b) / b, 5)
                             for a, b in zip(our_losses, ref_losses)])
        # trajectories must track: tight at step 0, robust later. Compounding
        # f32 cross-framework divergence occasionally flips ONE discrete
        # switch in the graph (objectness argmax -> bbox_mask, ball-query
        # membership), producing a single-step transient (measured: steps
        # 0-7 within 0.6%, one 10% ref-side spike at step 8, step 9 back to
        # 1.3%) — so assert the DISTRIBUTION tracks instead of every step:
        # median rel < 1%, >= 8/10 steps within 2%.
        rel = np.abs(np.asarray(our_losses) - np.asarray(ref_losses)) / np.asarray(ref_losses)
        np.testing.assert_allclose(our_losses[0], ref_losses[0], rtol=2e-3)
        assert np.median(rel) < 1e-2, f"median traj rel {np.median(rel):.3e}\n{rel}"
        assert (rel < 2e-2).sum() >= 8, f"traj outliers: {rel}"
        vrel = (np.abs(np.asarray(our_votes) - np.asarray(ref_votes))
                / (np.asarray(ref_votes) + 1e-4))
        assert np.median(vrel) < 1.5e-2, f"median vote rel {np.median(vrel):.3e}\n{vrel}"
        assert (vrel < 3e-2).sum() >= 8, f"vote outliers: {vrel}"
        # training must actually be progressing for this to mean anything
        assert ref_losses[-1] < ref_losses[0]

        # BN running stats after 10 momentum-scheduled train steps
        sd_after = {k: v.detach().numpy().copy() for k, v in ref_model.state_dict().items()}
        stats_after = tpair.convert_scanqa(sd_after, image_size=48)["batch_stats"]
        rels = []
        for path, ref_v in _tree_leaves_with_paths(stats_after):
            ours = _lookup(state.batch_stats, path)
            assert ours is not None, f"no batch stat at {path}"
            ours = np.asarray(ours, np.float64)
            ref_v = np.asarray(ref_v, np.float64)
            rel = np.linalg.norm(ours - ref_v) / (np.linalg.norm(ref_v) + 1e-30)
            rels.append((rel, path, float(np.linalg.norm(ref_v))))
        rels.sort(reverse=True)
        for r, p, n in rels[:6]:
            print(f"BN stat {p}: rel {r:.3e} |ref|={n:.3e}")
        print(f"BN stat median rel: {np.median([r for r, _, _ in rels]):.3e}")
        # Backbone/voting BN stats see stable ball-query memberships (the
        # input point cloud is fixed), so they must track tightly. The
        # PROPOSAL-stage BNs (vote_aggregation / proposal_mlp) normalize
        # features grouped around the moving votes: membership flips as the
        # two frameworks' votes drift apart at f32, so their batch
        # statistics legitimately diverge over steps (measured 8-14% at
        # step 10) — same chaos class as the trajectory outlier above.
        upstream = [r for r, p, _ in rels if "/proposal/" not in p]
        assert np.median([r for r, _, _ in rels]) < 1e-2, rels[:6]
        assert max(upstream) < 2e-2, \
            f"backbone/vgen BN stat off: {[x for x in rels if '/proposal/' not in x[1]][:4]}"
