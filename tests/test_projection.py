"""ENet + 2D->3D projection tests: exact pinhole geometry, depth
consistency gating, multiview aggregation, encoder output shape."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bridgeqa_tpu.models.enet import ENetEncoder
from bridgeqa_tpu.tools.projection import (
    ProjectionHelper,
    adjust_intrinsic,
    aggregate_multiview,
    project_scene_multiview,
)

W, H = 16, 12
FX = FY = 10.0


def make_helper():
    intr = np.eye(4)
    intr[0, 0], intr[1, 1] = FX, FY
    intr[0, 2], intr[1, 2] = W / 2, H / 2
    return ProjectionHelper(intr, image_dims=(W, H))


def point_for_pixel(u, v, z):
    """World point (identity pose) that projects exactly to (u, v) at depth z."""
    return np.array([(u - W / 2) * z / FX, (v - H / 2) * z / FY, z], np.float32)


class TestProjectionGeometry:
    def test_exact_pixel_hit(self):
        helper = make_helper()
        z = 2.0
        pts = np.stack([point_for_pixel(3, 4, z), point_for_pixel(10, 7, z)])
        depth = np.full((H, W), z, np.float32)
        uv, valid = helper.project(jnp.asarray(pts), jnp.eye(4), jnp.asarray(depth))
        np.testing.assert_array_equal(np.asarray(uv), [[3, 4], [10, 7]])
        assert np.asarray(valid).all()

    def test_depth_inconsistency_invalid(self):
        helper = make_helper()
        pts = point_for_pixel(3, 4, 2.0)[None]
        depth = np.full((H, W), 3.0, np.float32)  # frame sees something else
        _, valid = helper.project(jnp.asarray(pts), jnp.eye(4), jnp.asarray(depth))
        assert not np.asarray(valid).any()

    def test_depth_range_and_bounds(self):
        helper = make_helper()
        pts = np.stack([
            point_for_pixel(3, 4, 0.05),   # too close
            point_for_pixel(3, 4, 5.0),    # too far
            point_for_pixel(200, 4, 2.0),  # out of bounds
            np.array([0, 0, -2.0], np.float32),  # behind camera
        ])
        depth = np.full((H, W), 2.0, np.float32)
        _, valid = helper.project(jnp.asarray(pts), jnp.eye(4), jnp.asarray(depth))
        assert not np.asarray(valid).any()

    def test_camera_pose_applied(self):
        helper = make_helper()
        # camera translated +1 in world x: world point must shift accordingly
        pose = np.eye(4, dtype=np.float32)
        pose[0, 3] = 1.0
        z = 2.0
        p_cam = point_for_pixel(5, 6, z)
        p_world = p_cam + np.array([1.0, 0, 0], np.float32)
        depth = np.full((H, W), z, np.float32)
        uv, valid = helper.project(jnp.asarray(p_world[None]), jnp.asarray(pose),
                                   jnp.asarray(depth))
        np.testing.assert_array_equal(np.asarray(uv)[0], [5, 6])
        assert np.asarray(valid).all()

    def test_feature_gather(self):
        helper = make_helper()
        z = 2.0
        pts = point_for_pixel(3, 4, z)[None]
        depth = np.full((H, W), z, np.float32)
        feats = np.zeros((H, W, 5), np.float32)
        feats[4, 3] = np.arange(5)
        out, valid = helper.project_features(jnp.asarray(pts), jnp.eye(4),
                                             jnp.asarray(depth), jnp.asarray(feats))
        np.testing.assert_array_equal(np.asarray(out)[0], np.arange(5))


class TestAggregation:
    def test_maxpool_masks_invalid(self):
        feats = np.array([[[1.0, 5.0]], [[3.0, -2.0]]])  # (V=2, N=1, C=2)
        valid = np.array([[True], [True]])
        out = np.asarray(aggregate_multiview(feats, valid))
        np.testing.assert_array_equal(out, [[3.0, 5.0]])

        valid = np.array([[False], [True]])
        out = np.asarray(aggregate_multiview(feats, valid))
        np.testing.assert_array_equal(out, [[3.0, -2.0]])

        valid = np.array([[False], [False]])  # no view sees the point -> 0
        out = np.asarray(aggregate_multiview(feats, valid))
        np.testing.assert_array_equal(out, [[0.0, 0.0]])

    def test_mean_mode(self):
        feats = np.array([[[2.0]], [[4.0]]])
        valid = np.array([[True], [True]])
        np.testing.assert_allclose(np.asarray(aggregate_multiview(feats, valid, "mean")), [[3.0]])

    def test_full_scene_pipeline(self):
        helper = make_helper()
        z = 2.0
        pts = np.stack([point_for_pixel(3, 4, z), point_for_pixel(8, 9, z)])
        poses = np.tile(np.eye(4, dtype=np.float32), (2, 1, 1))
        depths = np.full((2, H, W), z, np.float32)
        feats = np.random.RandomState(0).rand(2, H, W, 4).astype(np.float32)
        out = np.asarray(project_scene_multiview(helper, pts, poses, depths, feats))
        expect0 = np.maximum(feats[0, 4, 3], feats[1, 4, 3])
        np.testing.assert_allclose(out[0], expect0, rtol=1e-6)


class TestIntrinsicAdjust:
    def test_scaling(self):
        intr = np.eye(4)
        intr[0, 0] = intr[1, 1] = 577.87
        intr[0, 2], intr[1, 2] = 319.5, 239.5
        out = adjust_intrinsic(intr, (640, 480), (41, 32))
        assert out[0, 0] == pytest.approx(577.87 * 41 / 640)
        assert out[1, 1] == pytest.approx(577.87 * 32 / 480)
        assert out[0, 2] == pytest.approx(319.5 * 40 / 639)


class TestENet:
    def test_encoder_shape(self):
        model = ENetEncoder()
        x = np.zeros((1, 256, 328, 3), np.float32)
        variables = model.init(jax.random.PRNGKey(0), x)
        out = model.apply(variables, x)
        assert out.shape == (1, 32, 41, 128)
        assert np.isfinite(np.asarray(out)).all()
