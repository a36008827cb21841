"""Extract per-frame ENet features for every scene frame.

Equivalent of the reference ``scripts/compute_multiview_features.py``
(89-123): 328x256 frames -> ENet encoder -> 128-d feature maps saved per
frame (``<out>/<scene>/<frame>.npy``). Batched through one jitted program
on TPU instead of the reference's per-256 torch batches.

Demo: ``python scripts/compute_multiview_features.py --synthetic --out /tmp/mv``
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from bridgeqa_tpu.models.enet import ENetEncoder

IMAGE_DIMS = (328, 256)  # (W, H)


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data_root", type=str, default=None)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--out", type=str, required=True)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--enet_ckpt", type=str, default=None,
                   help="orbax ENet params (trained/converted); random init otherwise")
    return p.parse_args(argv)


def iter_frames(args):
    if args.synthetic or not args.data_root:
        rng = np.random.RandomState(0)
        for s in range(2):
            for f in range(4):
                yield f"synth{s:04d}_00", f"{f * 20}", rng.rand(IMAGE_DIMS[1], IMAGE_DIMS[0], 3).astype(np.float32)
        return
    from PIL import Image

    frames_root = os.path.join(args.data_root, "frames_square")
    for scene_id in sorted(os.listdir(frames_root)):
        color_dir = os.path.join(frames_root, scene_id, "color")
        if not os.path.isdir(color_dir):
            continue
        for name in sorted(os.listdir(color_dir)):
            img = Image.open(os.path.join(color_dir, name)).convert("RGB")
            img = img.resize(IMAGE_DIMS, Image.BILINEAR)
            yield scene_id, os.path.splitext(name)[0], np.asarray(img, np.float32) / 255.0


def main(argv=None):
    args = parse_args(argv)
    model = ENetEncoder()
    dummy = np.zeros((1, IMAGE_DIMS[1], IMAGE_DIMS[0], 3), np.float32)
    variables = model.init(jax.random.PRNGKey(0), dummy)
    if args.enet_ckpt:
        import orbax.checkpoint as ocp

        variables = ocp.PyTreeCheckpointer().restore(os.path.abspath(args.enet_ckpt))

    @jax.jit
    def extract(images):
        return model.apply(variables, images)

    buf, meta, count = [], [], 0
    for scene_id, frame_id, image in iter_frames(args):
        buf.append(image)
        meta.append((scene_id, frame_id))
        if len(buf) == args.batch:
            count += _flush(extract, buf, meta, args.out)
            buf, meta = [], []
    if buf:
        # pad to the compiled batch shape
        pad = args.batch - len(buf)
        feats_needed = len(buf)
        buf += [buf[-1]] * pad
        count += _flush(extract, buf, meta, args.out, keep=feats_needed)
    print(f"extracted features for {count} frames -> {args.out}")
    return count


def _flush(extract, buf, meta, out_root, keep=None):
    feats = np.asarray(extract(np.stack(buf)))
    keep = keep if keep is not None else len(meta)
    for i in range(keep):
        scene_id, frame_id = meta[i]
        d = os.path.join(out_root, scene_id)
        os.makedirs(d, exist_ok=True)
        np.save(os.path.join(d, f"{frame_id}.npy"), feats[i])
    return keep


if __name__ == "__main__":
    main()
