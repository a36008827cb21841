"""Shared import shims for golden tests against the reference snapshot.

The read-only reference at /root/reference targets older transformers /
soft deps; these shims let its pure-torch modules import and run on CPU so
our JAX implementations can be compared against the reference's own code.
"""

import importlib.machinery
import os
import sys
import types


def _mod(name):
    m = types.ModuleType(name)
    m.__spec__ = importlib.machinery.ModuleSpec(name, None)
    return m

import numpy as np

REFERENCE = "/root/reference"


def install_reference_shims():
    """Idempotent: make ``import models.med`` etc. work from /root/reference."""
    import torch
    import transformers.modeling_utils as mu
    import transformers.pytorch_utils as pu

    for name in ("apply_chunking_to_forward", "find_pruneable_heads_and_indices",
                 "prune_linear_layer"):
        if not hasattr(mu, name) and hasattr(pu, name):
            setattr(mu, name, getattr(pu, name))
    if "icecream" not in sys.modules:
        ice = _mod("icecream")
        ice.ic = lambda *a, **k: (a[0] if a else None)
        sys.modules["icecream"] = ice
    for soft_dep in ("trimesh", "easydict", "tensorboardX", "wandb", "plyfile", "h5py",
                     "pretty_errors", "open_clip", "toml", "colorama", "datasets"):
        if soft_dep not in sys.modules:
            try:
                __import__(soft_dep)
            except ImportError:
                stub = _mod(soft_dep)
                stub.PlyData = stub.PlyElement = object  # plyfile symbols

                class EasyDict(dict):  # easydict.EasyDict surface
                    def __getattr__(self, k):
                        try:
                            return self[k]
                        except KeyError as e:
                            raise AttributeError(k) from e

                    def __setattr__(self, k, v):
                        self[k] = EasyDict(v) if isinstance(v, dict) else v

                stub.EasyDict = EasyDict
                stub.File = object  # h5py.File
                sys.modules[soft_dep] = stub
    try:  # newer `datasets` removed load_metric; the reference imports it
        import datasets as _datasets

        if not hasattr(_datasets, "load_metric"):
            _datasets.load_metric = lambda *a, **k: None
    except ImportError:
        pass

    # the snapshot's data/ package is dangling; satisfy the import with our
    # semantics-compatible dataset config
    if "data.scannet.model_util_scannet" not in sys.modules:
        from bridgeqa_tpu.data.scannet_config import (
            ScannetDatasetConfig,
            rotate_aligned_boxes_along_axis,
        )

        data_pkg = _mod("data")
        scannet_pkg = _mod("data.scannet")
        util = _mod("data.scannet.model_util_scannet")
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

    _install_timm_shim(torch)
    _install_torchvision_shim()

    # the CUDA extension is only touched inside forward(); a stub suffices
    # for state-dict-level work (converter goldens)
    if "pointnet2" not in sys.modules:
        pn2 = _mod("pointnet2")
        pn2._ext = _mod("pointnet2._ext")
        sys.modules["pointnet2"] = pn2
        sys.modules["pointnet2._ext"] = pn2._ext
    pn2_path = os.path.join(REFERENCE, "lib", "pointnet2")
    if pn2_path not in sys.path:
        sys.path.insert(0, pn2_path)

    # the reference hard-codes .cuda(); run it on CPU
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self
    torch.cuda.FloatTensor = torch.FloatTensor

    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)

    # transformers >= 4.50: PreTrainedModel no longer inherits
    # GenerationMixin, so the reference's BertLMHeadModel loses `.generate`
    # (med.py:1447-1470 implements the prepare_inputs/_reorder_cache hooks
    # but relies on the old inheritance). Graft the mixin back onto the
    # class BEFORE any model is instantiated so can_generate() is true and
    # generation_config gets created.
    try:
        from transformers.generation import GenerationMixin

        import models.med as _ref_med

        if not issubclass(_ref_med.BertLMHeadModel, GenerationMixin):
            # BLIP pre-tiles encoder_hidden_states to num_beams*2 rows and
            # relies on the OLD expansion rule (only input_ids/attention
            # masks get repeated); new HF expands every tensor kwarg, which
            # would double-tile them — exclude those two keys.
            @staticmethod
            def _expand_inputs_for_generation(expand_size=1, is_encoder_decoder=False,
                                              input_ids=None, **model_kwargs):
                keep = {k: model_kwargs.pop(k)
                        for k in ("encoder_hidden_states", "encoder_attention_mask")
                        if k in model_kwargs}
                input_ids, model_kwargs = GenerationMixin._expand_inputs_for_generation(
                    expand_size=expand_size, is_encoder_decoder=is_encoder_decoder,
                    input_ids=input_ids, **model_kwargs)
                model_kwargs.update(keep)
                return input_ids, model_kwargs

            patched = type("BertLMHeadModel",
                           (_ref_med.BertLMHeadModel, GenerationMixin),
                           {"_expand_inputs_for_generation": _expand_inputs_for_generation})
            _ref_med.BertLMHeadModel = patched
            for modname in ("models.blip_vqa_3d", "models.blip"):
                m = sys.modules.get(modname)
                if m is not None and hasattr(m, "BertLMHeadModel"):
                    m.BertLMHeadModel = patched
    except ImportError:
        pass


def install_pointnet2_ext_oracles():
    """Populate the ``pointnet2._ext`` stub with CPU implementations whose
    semantics bitwise-match the reference CUDA kernels
    (``lib/pointnet2/_ext_src/src/*.cu``), so the reference's OWN
    ``ScanQA.forward`` can run end-to-end on CPU for full-model goldens.

    All distance math is done in float32 with the kernels' operand order
    (3-term sequential sums), and selection rules replicate the CUDA scan
    semantics exactly: FPS padding-skip ``|p|^2 <= 1e-3`` + first-max
    tiebreak (sampling_gpu.cu:69-229), ball-query first-``nsample``-in-index-
    order with slot-0 fill (ball_query_gpu.cu:9-54), three_nn stable 3-min
    ordering (interpolate_gpu.cu:9-68).
    """
    import torch

    install_reference_shims()
    ext = sys.modules["pointnet2._ext"]
    if getattr(ext, "_oracles_installed", False):
        return

    def furthest_point_sampling(xyz, npoint):
        pts_all = xyz.detach().cpu().numpy().astype(np.float32)
        b, n, _ = pts_all.shape
        out = np.zeros((b, int(npoint)), dtype=np.int32)
        for bi in range(b):
            pts = pts_all[bi]
            mag = (pts * pts).sum(axis=1, dtype=np.float32)
            pad = mag <= np.float32(1e-3)
            temp = np.full(n, 1e10, dtype=np.float32)
            old = 0
            for j in range(1, int(npoint)):
                diff = pts - pts[old]
                d = (diff * diff).sum(axis=1, dtype=np.float32)
                d2 = np.minimum(d, temp)
                temp = np.where(pad, temp, d2)
                cand = np.where(pad, np.float32(-np.inf), temp)
                old = int(np.argmax(cand))  # first max == strict-> tiebreak
                out[bi, j] = old
        return torch.from_numpy(out)

    def ball_query(new_xyz, xyz, radius, nsample):
        nq = new_xyz.detach().cpu().numpy().astype(np.float32)
        pts = xyz.detach().cpu().numpy().astype(np.float32)
        b, m, _ = nq.shape
        n = pts.shape[1]
        r2 = np.float32(radius) * np.float32(radius)
        nsample = int(nsample)
        out = np.zeros((b, m, nsample), dtype=np.int32)
        arange = np.arange(n, dtype=np.int64)
        for bi in range(b):
            diff = nq[bi][:, None, :] - pts[bi][None, :, :]
            d2 = (diff * diff).sum(axis=-1, dtype=np.float32)  # (m, n)
            hit = d2 < r2
            order = np.where(hit, arange[None, :], n)
            srt = np.sort(order, axis=-1)[:, :nsample]
            first = srt[:, :1]
            row = np.where(srt >= n, first, srt)
            row = np.where(first >= n, 0, row)
            out[bi] = row.astype(np.int32)
        return torch.from_numpy(out)

    def three_nn(unknown, known):
        unk = unknown.detach().cpu().numpy().astype(np.float32)
        kn = known.detach().cpu().numpy().astype(np.float32)
        diff = unk[:, :, None, :] - kn[:, None, :, :]
        d2 = (diff * diff).sum(axis=-1, dtype=np.float32)  # (B, n, m)
        idx = np.argsort(d2, axis=-1, kind="stable")[..., :3]
        dist2 = np.take_along_axis(d2, idx, axis=-1)
        return (torch.from_numpy(dist2.astype(np.float32)),
                torch.from_numpy(idx.astype(np.int32)))

    def gather_points(points, idx):
        c = points.shape[1]
        gather_idx = idx.long().unsqueeze(1).expand(-1, c, -1)
        return points.gather(2, gather_idx).contiguous()

    def gather_points_grad(grad_out, idx, n):
        b, c, m = grad_out.shape
        grad = grad_out.new_zeros(b, c, n)
        grad.scatter_add_(2, idx.long().unsqueeze(1).expand(-1, c, -1), grad_out)
        return grad

    def group_points(points, idx):
        b, c, n = points.shape
        _, m, s = idx.shape
        flat = idx.long().view(b, 1, m * s).expand(-1, c, -1)
        # .clone(): the output must NOT be a view — GroupingOperation's
        # callers modify it in place (pointnet2_utils.py:350) and torch
        # forbids inplace on views returned from custom Functions
        return points.gather(2, flat).view(b, c, m, s).clone()

    def group_points_grad(grad_out, idx, n):
        b, c, m, s = grad_out.shape
        grad = grad_out.new_zeros(b, c, n)
        flat = idx.long().view(b, 1, m * s).expand(-1, c, -1)
        grad.scatter_add_(2, flat, grad_out.reshape(b, c, m * s))
        return grad

    def three_interpolate(points, idx, weight):
        b, c, _ = points.shape
        n = idx.shape[1]
        flat = idx.long().view(b, 1, n * 3).expand(-1, c, -1)
        gathered = points.gather(2, flat).view(b, c, n, 3)
        return (gathered * weight.unsqueeze(1)).sum(-1).contiguous()

    def three_interpolate_grad(grad_out, idx, weight, m):
        b, c, n = grad_out.shape
        weighted = grad_out.unsqueeze(-1) * weight.unsqueeze(1)  # (B,C,n,3)
        flat = idx.long().view(b, 1, n * 3).expand(-1, c, -1)
        grad = grad_out.new_zeros(b, c, m)
        grad.scatter_add_(2, flat, weighted.reshape(b, c, n * 3))
        return grad

    ext.furthest_point_sampling = furthest_point_sampling
    ext.ball_query = ball_query
    ext.three_nn = three_nn
    ext.gather_points = gather_points
    ext.gather_points_grad = gather_points_grad
    ext.group_points = group_points
    ext.group_points_grad = group_points_grad
    ext.three_interpolate = three_interpolate
    ext.three_interpolate_grad = three_interpolate_grad
    ext._oracles_installed = True


def import_ref_dataset():
    """Import ``lib.dataset`` despite its module-level reads of absent data
    files (scannetv2.txt scene lists, incl. one hardcoded absolute path)."""
    import builtins
    import io

    install_reference_shims()
    real_open = builtins.open

    def fake_open(path, *a, **k):
        if isinstance(path, str) and path.endswith("scannetv2.txt"):
            return io.StringIO("scene0000_00\nscene0001_00\n")
        return real_open(path, *a, **k)

    builtins.open = fake_open
    try:
        import lib.dataset as ref_dataset
    finally:
        builtins.open = real_open
    return ref_dataset


def _install_torchvision_shim():
    """Name-level stand-ins for the torchvision.transforms symbols the
    reference's blip_utils imports (only constructed inside image-loading
    paths our goldens don't exercise)."""
    if "torchvision" in sys.modules:
        return

    class _T:
        def __init__(self, *a, **k):
            pass

        def __call__(self, x):
            raise NotImplementedError("torchvision shim: image transforms unavailable")

    tv = _mod("torchvision")
    transforms = _mod("torchvision.transforms")
    functional = _mod("torchvision.transforms.functional")
    for name in ("Compose", "Resize", "ToTensor", "Normalize", "RandomResizedCrop",
                 "RandomHorizontalFlip", "CenterCrop"):
        setattr(transforms, name, type(name, (_T,), {}))

    class InterpolationMode:
        BICUBIC = "bicubic"
        BILINEAR = "bilinear"
        NEAREST = "nearest"

    functional.InterpolationMode = InterpolationMode
    tv.transforms = transforms
    transforms.functional = functional
    sys.modules.update({"torchvision": tv, "torchvision.transforms": transforms,
                        "torchvision.transforms.functional": functional})


def _install_timm_shim(torch):
    """Minimal real implementations of the few timm/fairscale symbols the
    reference ``models/vit.py`` imports (timm isn't in this image). Only
    PatchEmbed carries weights; its state-dict keys (``proj.weight/bias``)
    match timm's, which the checkpoint converter relies on."""
    if "timm" in sys.modules:
        return
    nn = torch.nn

    class PatchEmbed(nn.Module):
        def __init__(self, img_size=224, patch_size=16, in_chans=3, embed_dim=768,
                     norm_layer=None, flatten=True):
            super().__init__()
            self.img_size = (img_size, img_size) if isinstance(img_size, int) else img_size
            self.patch_size = (patch_size, patch_size) if isinstance(patch_size, int) else patch_size
            self.num_patches = (self.img_size[0] // self.patch_size[0]) * (
                self.img_size[1] // self.patch_size[1])
            self.flatten = flatten
            self.proj = nn.Conv2d(in_chans, embed_dim, kernel_size=patch_size, stride=patch_size)
            self.norm = norm_layer(embed_dim) if norm_layer else nn.Identity()

        def forward(self, x):
            x = self.proj(x)
            if self.flatten:
                x = x.flatten(2).transpose(1, 2)
            return self.norm(x)

    class DropPath(nn.Module):
        def __init__(self, drop_prob=None):
            super().__init__()
            self.drop_prob = drop_prob or 0.0

        def forward(self, x):
            if self.drop_prob == 0.0 or not self.training:
                return x
            keep = 1 - self.drop_prob
            shape = (x.shape[0],) + (1,) * (x.ndim - 1)
            rand = keep + torch.rand(shape, dtype=x.dtype, device=x.device)
            return x.div(keep) * rand.floor_()

    def named_apply(fn, module, name="", depth_first=True, include_root=False):
        if not depth_first and include_root:
            fn(module=module, name=name)
        for child_name, child in module.named_children():
            child_name = f"{name}.{child_name}" if name else child_name
            named_apply(fn, child, child_name, depth_first, True)
        if depth_first and include_root:
            fn(module=module, name=name)
        return module

    timm = _mod("timm")
    models = _mod("timm.models")
    vt = _mod("timm.models.vision_transformer")
    vt._cfg = lambda url="", **kwargs: dict(url=url, **kwargs)
    vt.PatchEmbed = PatchEmbed
    registry = _mod("timm.models.registry")
    registry.register_model = lambda fn: fn
    layers = _mod("timm.models.layers")
    layers.trunc_normal_ = torch.nn.init.trunc_normal_
    layers.DropPath = DropPath
    helpers = _mod("timm.models.helpers")
    helpers.named_apply = named_apply
    helpers.adapt_input_conv = lambda in_chans, conv_weight: conv_weight
    hub = _mod("timm.models.hub")

    def download_cached_file(*a, **k):
        raise RuntimeError("no network in the test environment")

    hub.download_cached_file = download_cached_file
    timm.models = models
    models.vision_transformer = vt
    models.registry = registry
    models.layers = layers
    models.helpers = helpers
    models.hub = hub
    sys.modules.update({
        "timm": timm, "timm.models": models, "timm.models.vision_transformer": vt,
        "timm.models.registry": registry, "timm.models.layers": layers,
        "timm.models.helpers": helpers, "timm.models.hub": hub,
    })

    if "fairscale" not in sys.modules:
        fairscale = _mod("fairscale")
        fs_nn = _mod("fairscale.nn")
        fs_ckpt = _mod("fairscale.nn.checkpoint")
        fs_ca = _mod("fairscale.nn.checkpoint.checkpoint_activations")
        fs_ca.checkpoint_wrapper = lambda module, *a, **k: module
        fairscale.nn = fs_nn
        fs_nn.checkpoint = fs_ckpt
        fs_ckpt.checkpoint_activations = fs_ca
        sys.modules.update({
            "fairscale": fairscale, "fairscale.nn": fs_nn,
            "fairscale.nn.checkpoint": fs_ckpt,
            "fairscale.nn.checkpoint.checkpoint_activations": fs_ca,
        })
