"""Geometry parity tests: box decode, IoU, NMS vs reference-semantics oracles."""

import numpy as np
import jax.numpy as jnp

from bridgeqa_tpu.geometry import (
    box3d_iou_batch,
    get_3d_box_batch,
    nms_3d,
    nms_3d_samecls,
    nn_distance,
    huber_loss,
)
from bridgeqa_tpu.data.scannet_config import ScannetDatasetConfig


# --- numpy oracles transliterating utils/box_util.py / utils/nms.py ---

def _np_get_3d_box_batch(box_size, heading_angle, center):
    input_shape = heading_angle.shape
    output = np.zeros(tuple(list(input_shape) + [3, 3]))
    c, s = np.cos(heading_angle), np.sin(heading_angle)
    output[..., 0, 0] = c
    output[..., 0, 2] = s
    output[..., 1, 1] = 1
    output[..., 2, 0] = -s
    output[..., 2, 2] = c
    R = output
    l = np.expand_dims(box_size[..., 0], -1)
    w = np.expand_dims(box_size[..., 1], -1)
    h = np.expand_dims(box_size[..., 2], -1)
    corners_3d = np.zeros(tuple(list(input_shape) + [8, 3]))
    corners_3d[..., :, 0] = np.concatenate((l / 2, l / 2, -l / 2, -l / 2, l / 2, l / 2, -l / 2, -l / 2), -1)
    corners_3d[..., :, 1] = np.concatenate((w / 2, -w / 2, -w / 2, w / 2, w / 2, -w / 2, -w / 2, w / 2), -1)
    corners_3d[..., :, 2] = np.concatenate((h / 2, h / 2, h / 2, h / 2, -h / 2, -h / 2, -h / 2, -h / 2), -1)
    tlist = list(range(len(input_shape))) + [len(input_shape) + 1, len(input_shape)]
    corners_3d = np.matmul(corners_3d, np.transpose(R, tuple(tlist)))
    corners_3d += np.expand_dims(center, -2)
    return corners_3d


def _np_nms_3d(boxes, thresh, same_cls=False):
    """utils/nms.py:75-151 semantics; boxes (K, 7|8): x1y1z1x2y2z2 score [cls]."""
    x1, y1, z1, x2, y2, z2, score = (boxes[:, i] for i in range(7))
    cls = boxes[:, 7] if same_cls else None
    area = (x2 - x1) * (y2 - y1) * (z2 - z1)
    I = np.argsort(score)
    pick = []
    while I.size != 0:
        last = I.size
        i = I[-1]
        pick.append(i)
        xx1 = np.maximum(x1[i], x1[I[: last - 1]])
        yy1 = np.maximum(y1[i], y1[I[: last - 1]])
        zz1 = np.maximum(z1[i], z1[I[: last - 1]])
        xx2 = np.minimum(x2[i], x2[I[: last - 1]])
        yy2 = np.minimum(y2[i], y2[I[: last - 1]])
        zz2 = np.minimum(z2[i], z2[I[: last - 1]])
        inter = np.maximum(0, xx2 - xx1) * np.maximum(0, yy2 - yy1) * np.maximum(0, zz2 - zz1)
        o = inter / (area[i] + area[I[: last - 1]] - inter)
        if same_cls:
            o = o * (cls[i] == cls[I[: last - 1]])
        I = np.delete(I, np.concatenate(([last - 1], np.where(o > thresh)[0])))
    return sorted(pick)


class TestBoxes:
    def test_corners_match_reference(self, rng):
        size = rng.uniform(0.2, 2.0, (4, 16, 3)).astype(np.float32)
        angle = rng.uniform(-np.pi, np.pi, (4, 16)).astype(np.float32)
        center = rng.uniform(-3, 3, (4, 16, 3)).astype(np.float32)
        got = np.asarray(get_3d_box_batch(jnp.asarray(size), jnp.asarray(angle), jnp.asarray(center)))
        want = _np_get_3d_box_batch(size, angle, center)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_iou_batch(self, rng):
        size = rng.uniform(0.2, 2.0, (2, 8, 3)).astype(np.float32)
        center = rng.uniform(-1, 1, (2, 8, 3)).astype(np.float32)
        zero = np.zeros((2, 8), dtype=np.float32)
        c1 = get_3d_box_batch(jnp.asarray(size), jnp.asarray(zero), jnp.asarray(center))
        c2 = get_3d_box_batch(jnp.asarray(size), jnp.asarray(zero), jnp.asarray(center + 0.1))
        iou = np.asarray(box3d_iou_batch(c1, c2))
        assert ((iou > 0) & (iou < 1)).all()
        # identical boxes -> IoU ~ 1
        iou_self = np.asarray(box3d_iou_batch(c1, c1))
        np.testing.assert_allclose(iou_self, 1.0, atol=1e-5)

    def test_param2obb_roundtrip(self, rng):
        cfg = ScannetDatasetConfig()
        center = rng.uniform(-2, 2, (5, 3))
        size_cls = rng.randint(0, 18, 5)
        size_res = rng.uniform(-0.1, 0.1, (5, 3))
        obb = cfg.param2obb_batch(center, np.zeros(5, dtype=np.int64), np.zeros(5), size_cls, size_res)
        np.testing.assert_allclose(obb[:, :3], center)
        np.testing.assert_allclose(obb[:, 3:6], cfg.mean_size_arr[size_cls] + size_res, rtol=1e-6)
        np.testing.assert_allclose(obb[:, 6], 0.0)


class TestNMS:
    def _boxes(self, rng, k=32, same_cls=False):
        lo = rng.uniform(-2, 2, (k, 3)).astype(np.float32)
        hi = lo + rng.uniform(0.3, 1.5, (k, 3)).astype(np.float32)
        score = rng.rand(k).astype(np.float32)
        cols = [lo, hi, score[:, None]]
        if same_cls:
            cols.append(rng.randint(0, 3, (k, 1)).astype(np.float32))
        return np.concatenate(cols, axis=1)

    def test_nms3d_matches_oracle(self, rng):
        for thresh in (0.1, 0.25, 0.5):
            boxes = self._boxes(rng)
            mask = np.asarray(nms_3d(jnp.asarray(boxes[:, :3]), jnp.asarray(boxes[:, 3:6]),
                                     jnp.asarray(boxes[:, 6]), thresh))
            got = sorted(np.where(mask)[0].tolist())
            want = _np_nms_3d(boxes, thresh)
            assert got == want

    def test_nms3d_samecls_matches_oracle(self, rng):
        boxes = self._boxes(rng, same_cls=True)
        mask = np.asarray(nms_3d_samecls(jnp.asarray(boxes[:, :3]), jnp.asarray(boxes[:, 3:6]),
                                         jnp.asarray(boxes[:, 6]), jnp.asarray(boxes[:, 7]), 0.25))
        got = sorted(np.where(mask)[0].tolist())
        want = _np_nms_3d(boxes, 0.25, same_cls=True)
        assert got == want

    def test_valid_mask_respected(self, rng):
        boxes = self._boxes(rng, k=16)
        valid = np.zeros(16, dtype=bool)
        valid[:4] = True
        mask = np.asarray(nms_3d(jnp.asarray(boxes[:, :3]), jnp.asarray(boxes[:, 3:6]),
                                 jnp.asarray(boxes[:, 6]), 0.25, valid=jnp.asarray(valid)))
        assert not mask[4:].any()


class TestNNDistance:
    def test_matches_reference_demo(self):
        # mirrors utils/nn_distance.py:54-85 demo cross-check
        np.random.seed(0)
        pc1 = np.random.random((1, 5, 3)).astype(np.float32)
        pc2 = np.random.random((1, 6, 3)).astype(np.float32)
        d1, i1, d2, i2 = nn_distance(jnp.asarray(pc1), jnp.asarray(pc2))
        dist = np.zeros((5, 6))
        for i in range(5):
            for j in range(6):
                dist[i, j] = np.sum((pc1[0, i] - pc2[0, j]) ** 2)
        np.testing.assert_allclose(np.asarray(d1)[0], dist.min(1), rtol=1e-5)
        np.testing.assert_array_equal(np.asarray(i1)[0], dist.argmin(1))
        np.testing.assert_allclose(np.asarray(d2)[0], dist.min(0), rtol=1e-5)
        np.testing.assert_array_equal(np.asarray(i2)[0], dist.argmin(0))

    def test_huber(self):
        err = jnp.asarray([-2.0, -0.5, 0.0, 0.5, 2.0])
        got = np.asarray(huber_loss(err, delta=1.0))
        want = np.array([1.5, 0.125, 0.0, 0.125, 1.5])
        np.testing.assert_allclose(got, want)
