"""Golden parity tests against the actual reference implementation.

Runs the reference's pure-torch modules on CPU (the read-only snapshot at
/root/reference, with shims for moved transformers symbols and missing
soft deps) and compares our JAX implementations bit-for-bit(-ish):

- the twin BERT encoder — BridgeQA's core mechanism (``med.py:508-645,
  975-1156``) — via the checkpoint converter;
- the VoteNet loss stack (``lib/loss_helper.py``) on identical inputs;
- ``nn_distance``/``huber_loss`` numerics.

Skipped automatically when the reference snapshot is unavailable.
"""

import os
import sys
import types

import numpy as np
import pytest

REFERENCE = "/root/reference"

pytestmark = [
    pytest.mark.skipif(not os.path.isdir(REFERENCE), reason="no reference snapshot"),
    # reference-torch golden tier: executes the reference snapshot's own
    # torch code on CPU (minutes per test) — excluded from the default
    # fast suite; run with `pytest -m golden`
    pytest.mark.golden,
]

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def ref():
    """Import the reference modules with compatibility shims installed."""
    import transformers.modeling_utils as mu
    import transformers.pytorch_utils as pu

    for name in ("apply_chunking_to_forward", "find_pruneable_heads_and_indices",
                 "prune_linear_layer"):
        if not hasattr(mu, name) and hasattr(pu, name):
            setattr(mu, name, getattr(pu, name))
    if "icecream" not in sys.modules:
        ice = types.ModuleType("icecream")
        ice.ic = lambda *a, **k: (a[0] if a else None)
        sys.modules["icecream"] = ice
    for soft_dep in ("trimesh", "easydict", "tensorboardX", "wandb", "plyfile"):
        if soft_dep not in sys.modules:
            try:
                __import__(soft_dep)
            except ImportError:
                stub = types.ModuleType(soft_dep)
                stub.PlyData = stub.PlyElement = object  # plyfile symbols
                sys.modules[soft_dep] = stub
    # the snapshot's data/ package is dangling; satisfy the import with our
    # semantics-compatible dataset config
    if "data.scannet.model_util_scannet" not in sys.modules:
        from bridgeqa_tpu.data.scannet_config import ScannetDatasetConfig, rotate_aligned_boxes_along_axis

        data_pkg = types.ModuleType("data")
        scannet_pkg = types.ModuleType("data.scannet")
        util = types.ModuleType("data.scannet.model_util_scannet")
        util.ScannetDatasetConfig = ScannetDatasetConfig
        util.rotate_aligned_boxes_along_axis = rotate_aligned_boxes_along_axis

        def extract_pc_in_box3d(pc, box3d):  # axis-aligned in-hull test
            mn, mx = box3d.min(0), box3d.max(0)
            mask = np.all((pc[:, :3] >= mn) & (pc[:, :3] <= mx), axis=1)
            return pc[mask], mask

        util.extract_pc_in_box3d = extract_pc_in_box3d
        sys.modules["data"] = data_pkg
        sys.modules["data.scannet"] = scannet_pkg
        sys.modules["data.scannet.model_util_scannet"] = util

    # the reference hard-codes .cuda(); run it on CPU
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self
    torch.cuda.FloatTensor = torch.FloatTensor

    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    import models.med as ref_med
    from utils import nn_distance as ref_nnd

    return types.SimpleNamespace(med=ref_med, nn_distance=ref_nnd)


TINY = dict(vocab_size=120, hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
            intermediate_size=128, max_position_embeddings=64, encoder_width=64)


class TestTwinEncoderGolden:
    def test_twin_streams_match_reference(self, ref):
        import jax
        import jax.numpy as jnp

        from bridgeqa_tpu.models.med import BertModelTwin, MedConfig
        from bridgeqa_tpu.utils.blip_checkpoint import (
            _bert_embeddings,
            convert_bert_encoder,
            merge_pretrained,
        )

        cfg_dict = dict(TINY, attention_probs_dropout_prob=0.0, hidden_dropout_prob=0.0,
                        hidden_act="gelu", layer_norm_eps=1e-12, model_type="bert",
                        pad_token_id=0, type_vocab_size=2, initializer_range=0.02,
                        add_cross_attention=True, num_hidden_layers_twin=2)
        ref_cfg = ref.med.BertConfig.from_dict(cfg_dict)
        torch.manual_seed(0)
        ref_model = ref.med.BertModelTwin(ref_cfg, add_pooling_layer=False).eval()
        # twin starts as a copy of the pretrained layers (med.py:985-988)
        ref_model.init_twin()

        rng = np.random.RandomState(0)
        b, lq, li, ls = 2, 10, 7, 5
        ids = rng.randint(5, 100, (b, lq)).astype(np.int64)
        qmask = (np.arange(lq)[None] < np.array([[8], [10]])).astype(np.int64)
        img = rng.rand(b, li, 64).astype(np.float32)
        img_mask = np.ones((b, li), np.int64)
        scene = rng.rand(b, ls, 64).astype(np.float32)
        scene_mask = (np.arange(ls)[None] < np.array([[5], [3]])).astype(np.int64)

        with torch.no_grad():
            out = ref_model(
                torch.tensor(ids), attention_mask=torch.tensor(qmask),
                encoder_hidden_states=torch.tensor(img),
                encoder_attention_mask=torch.tensor(img_mask),
                encoder_hidden_states_twin=torch.tensor(scene),
                encoder_attention_mask_twin=torch.tensor(scene_mask),
                return_dict=True, mode="multimodal",
            )
        ref_h2d, ref_h3d = (t.numpy() for t in out.last_hidden_state)

        sd = {f"text_encoder.{k}": v.numpy() for k, v in ref_model.state_dict().items()}
        converted = {
            "embeddings": _bert_embeddings(sd, "text_encoder.embeddings", 120),
            "encoder": convert_bert_encoder(sd, "text_encoder.encoder", twin=True),
        }

        ours = BertModelTwin(MedConfig(**TINY, hidden_dropout_prob=0.0,
                                       attention_probs_dropout_prob=0.0))
        init = ours.init(jax.random.PRNGKey(0), jnp.asarray(ids), jnp.asarray(qmask),
                         jnp.asarray(img), jnp.asarray(img_mask), jnp.asarray(scene),
                         jnp.asarray(scene_mask), deterministic=True)
        merged, loaded, skipped = merge_pretrained(init["params"], converted)
        # every reference BertLayer physically carries the BertOutputParallel
        # alternate LayerNorm bank (med.py:320-330), but paralleltwin never
        # selects it (layernorm_idx=0 everywhere) — dropping those params is
        # the correct conversion for a parallel_layernorms=0 target
        real_skips = [s for s in skipped if "output_LayerNorms" not in s]
        assert not real_skips, real_skips

        (h2d, h3d), _ = ours.apply({"params": merged}, jnp.asarray(ids), jnp.asarray(qmask),
                                   jnp.asarray(img), jnp.asarray(img_mask), jnp.asarray(scene),
                                   jnp.asarray(scene_mask), deterministic=True)
        valid = qmask == 1
        np.testing.assert_allclose(np.asarray(h2d)[valid], ref_h2d[valid], atol=3e-4)
        np.testing.assert_allclose(np.asarray(h3d)[valid], ref_h3d[valid], atol=3e-4)


class TestLossGolden:
    def test_nn_distance_and_huber(self, ref):
        import jax.numpy as jnp

        from bridgeqa_tpu.geometry.nn_distance import huber_loss, nn_distance

        rng = np.random.RandomState(1)
        a = rng.rand(2, 12, 3).astype(np.float32)
        b = rng.rand(2, 7, 3).astype(np.float32)
        with torch.no_grad():
            rd1, ri1, rd2, ri2 = ref.nn_distance.nn_distance(torch.tensor(a), torch.tensor(b))
        d1, i1, d2, i2 = nn_distance(jnp.asarray(a), jnp.asarray(b))
        np.testing.assert_allclose(np.asarray(d1), rd1.numpy(), atol=1e-6)
        np.testing.assert_array_equal(np.asarray(i1), ri1.numpy())
        np.testing.assert_allclose(np.asarray(d2), rd2.numpy(), atol=1e-6)
        np.testing.assert_array_equal(np.asarray(i2), ri2.numpy())

        x = rng.randn(50).astype(np.float32) * 2
        with torch.no_grad():
            rh = ref.nn_distance.huber_loss(torch.tensor(x), delta=1.0).numpy()
        np.testing.assert_allclose(np.asarray(huber_loss(jnp.asarray(x), delta=1.0)), rh,
                                   atol=1e-6)

    def test_vote_and_objectness_and_box_losses(self, ref):
        import jax.numpy as jnp

        import lib.loss_helper as ref_loss
        from bridgeqa_tpu.data.scannet_config import ScannetDatasetConfig
        from bridgeqa_tpu.losses.detection import (
            compute_box_and_sem_cls_loss,
            compute_objectness_loss,
            compute_vote_loss,
        )

        dc = ScannetDatasetConfig()
        rng = np.random.RandomState(2)
        b, n_seed, n_prop, n_gt = 2, 64, 16, 6

        dd = {
            "seed_xyz": rng.rand(b, n_seed, 3).astype(np.float32) * 4 - 2,
            "seed_inds": rng.randint(0, 500, (b, n_seed)).astype(np.int64),
            "vote_xyz": rng.rand(b, n_seed, 3).astype(np.float32) * 4 - 2,
            "vote_label": rng.rand(b, 500, 9).astype(np.float32),
            "vote_label_mask": (rng.rand(b, 500) > 0.4).astype(np.float32),
            "aggregated_vote_xyz": rng.rand(b, n_prop, 3).astype(np.float32) * 4 - 2,
            "center_label": np.concatenate(
                [rng.rand(b, n_gt, 3).astype(np.float32) * 4 - 2,
                 np.zeros((b, n_gt, 1), np.float32)], axis=-1),
            "objectness_scores": rng.randn(b, n_prop, 2).astype(np.float32),
            "center": rng.rand(b, n_prop, 3).astype(np.float32) * 4 - 2,
            "box_label_mask": (rng.rand(b, n_gt) > 0.3).astype(np.float32),
            "heading_scores": rng.randn(b, n_prop, 1).astype(np.float32),
            "heading_residuals_normalized": rng.randn(b, n_prop, 1).astype(np.float32),
            "heading_class_label": np.zeros((b, n_gt), np.int64),
            "heading_residual_label": np.zeros((b, n_gt), np.float32),
            "size_scores": rng.randn(b, n_prop, 18).astype(np.float32),
            "size_residuals_normalized": rng.randn(b, n_prop, 18, 3).astype(np.float32),
            "size_class_label": rng.randint(0, 18, (b, n_gt)).astype(np.int64),
            "size_residual_label": rng.randn(b, n_gt, 3).astype(np.float32) * 0.1,
            "sem_cls_label": rng.randint(0, 18, (b, n_gt)).astype(np.int64),
            "sem_cls_scores": rng.randn(b, n_prop, 18).astype(np.float32),
        }
        tdict = {k: torch.tensor(v) for k, v in dd.items()}
        jdict = {k: jnp.asarray(v.astype(np.int32) if v.dtype == np.int64 else v)
                 for k, v in dd.items()}

        with torch.no_grad():
            ref_vote = ref_loss.compute_vote_loss(tdict).item()
            r_obj, r_lbl, r_mask, r_assign = ref_loss.compute_objectness_loss(tdict)
            tdict["objectness_label"] = r_lbl
            tdict["objectness_mask"] = r_mask
            tdict["object_assignment"] = r_assign
            (r_center, r_hcls, r_hreg, r_scls, r_sreg, r_sem) = \
                ref_loss.compute_box_and_sem_cls_loss(tdict, dc)

        got_vote = float(compute_vote_loss(jdict))
        np.testing.assert_allclose(got_vote, ref_vote, rtol=1e-5)

        g_obj, g_lbl, g_mask, g_assign = compute_objectness_loss(jdict)
        np.testing.assert_allclose(float(g_obj), r_obj.item(), rtol=1e-5)
        np.testing.assert_array_equal(np.asarray(g_lbl), r_lbl.numpy())
        np.testing.assert_array_equal(np.asarray(g_assign), r_assign.numpy())

        jdict["objectness_label"] = g_lbl
        jdict["object_assignment"] = g_assign
        got = compute_box_and_sem_cls_loss(jdict, dc)
        for g, r, name in zip(got, (r_center, r_hcls, r_hreg, r_scls, r_sreg, r_sem),
                              ("center", "hcls", "hreg", "scls", "sreg", "sem")):
            np.testing.assert_allclose(float(g), r.item(), rtol=2e-4, atol=1e-6, err_msg=name)


class TestVotingGolden:
    def test_voting_module_matches_reference(self, ref):
        import importlib

        import jax
        import jax.numpy as jnp

        ref_voting = importlib.import_module("models.voting_module")
        from bridgeqa_tpu.models.voting import VotingModule

        torch.manual_seed(1)
        C = 32
        ref_m = ref_voting.VotingModule(vote_factor=1, seed_feature_dim=C).eval()

        rng = np.random.RandomState(3)
        b, n_seed = 2, 24
        seed_xyz = rng.rand(b, n_seed, 3).astype(np.float32)
        seed_feat = rng.rand(b, C, n_seed).astype(np.float32)  # torch channel-first

        with torch.no_grad():
            r_xyz, r_feat = ref_m(torch.tensor(seed_xyz), torch.tensor(seed_feat))
        r_xyz, r_feat = r_xyz.numpy(), r_feat.numpy().transpose(0, 2, 1)

        ours = VotingModule(vote_factor=1, seed_feature_dim=C)
        variables = ours.init(jax.random.PRNGKey(0), jnp.asarray(seed_xyz),
                              jnp.asarray(seed_feat.transpose(0, 2, 1)), train=False)
        # convert: Conv1d weight (out, in, 1) -> Dense kernel (in, out); BN stats
        sd = {k: v.numpy() for k, v in ref_m.state_dict().items()}
        params = {
            f"conv{i}": {"kernel": sd[f"conv{i}.weight"][..., 0].T,
                         "bias": sd[f"conv{i}.bias"]} for i in (1, 2, 3)
        }
        params.update({
            f"bn{i}": {"scale": sd[f"bn{i}.weight"], "bias": sd[f"bn{i}.bias"]} for i in (1, 2)
        })
        stats = {f"bn{i}": {"mean": sd[f"bn{i}.running_mean"],
                            "var": sd[f"bn{i}.running_var"]} for i in (1, 2)}
        from bridgeqa_tpu.utils.blip_checkpoint import merge_pretrained

        merged, _, skipped = merge_pretrained(variables["params"], params)
        assert not skipped, skipped
        mstats, _, skipped = merge_pretrained(variables["batch_stats"], stats)
        assert not skipped, skipped

        g_xyz, g_feat = ours.apply({"params": merged, "batch_stats": mstats},
                                   jnp.asarray(seed_xyz),
                                   jnp.asarray(seed_feat.transpose(0, 2, 1)), train=False)
        np.testing.assert_allclose(np.asarray(g_xyz), r_xyz, atol=2e-5)
        np.testing.assert_allclose(np.asarray(g_feat), r_feat, atol=2e-5)
