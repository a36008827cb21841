"""Parity tests of the TPU-native point ops against CUDA-semantics oracles."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from bridgeqa_tpu.ops import (
    ball_query,
    furthest_point_sample,
    gather_points,
    group_all,
    group_points,
    query_and_group,
    three_interpolate,
    three_nn,
)
from tests.oracles import ball_query_oracle, fps_oracle, three_nn_oracle


def _cloud(rng, b=2, n=128, scale=2.0):
    return (rng.rand(b, n, 3).astype(np.float32) - 0.5) * scale


class TestFPS:
    def test_matches_oracle(self, rng):
        xyz = _cloud(rng, b=3, n=200)
        got = np.asarray(furthest_point_sample(jnp.asarray(xyz), 32))
        want = fps_oracle(xyz, 32)
        np.testing.assert_array_equal(got, want)

    def test_padding_points_skipped(self, rng):
        xyz = _cloud(rng, b=2, n=64, scale=4.0)
        xyz[:, 40:, :] = 0.0  # padding: norm^2 <= 1e-3 must never be sampled
        got = np.asarray(furthest_point_sample(jnp.asarray(xyz), 16))
        assert got.max() < 40
        np.testing.assert_array_equal(got, fps_oracle(xyz, 16))

    def test_first_index_is_zero(self, rng):
        xyz = _cloud(rng)
        got = np.asarray(furthest_point_sample(jnp.asarray(xyz), 8))
        assert (got[:, 0] == 0).all()

    def test_all_padding(self):
        xyz = np.zeros((1, 16, 3), dtype=np.float32)
        got = np.asarray(furthest_point_sample(jnp.asarray(xyz), 4))
        np.testing.assert_array_equal(got, 0)


class TestBallQuery:
    @pytest.mark.parametrize("radius,nsample", [(0.5, 8), (0.2, 4), (1.5, 16)])
    def test_matches_oracle(self, rng, radius, nsample):
        xyz = _cloud(rng, b=2, n=100)
        new_xyz = _cloud(rng, b=2, n=16)
        got = np.asarray(ball_query(radius, nsample, jnp.asarray(xyz), jnp.asarray(new_xyz)))
        want = ball_query_oracle(radius, nsample, xyz, new_xyz)
        np.testing.assert_array_equal(got, want)

    def test_empty_ball_returns_zero(self, rng):
        xyz = _cloud(rng, b=1, n=32) + 100.0
        new_xyz = np.zeros((1, 4, 3), dtype=np.float32)
        got = np.asarray(ball_query(0.1, 8, jnp.asarray(xyz), jnp.asarray(new_xyz)))
        np.testing.assert_array_equal(got, 0)

    def test_fill_with_first(self, rng):
        # one point inside the ball -> every slot is that point's index
        xyz = np.full((1, 16, 3), 50.0, dtype=np.float32)
        xyz[0, 7] = [0.05, 0.0, 0.0]
        new_xyz = np.zeros((1, 1, 3), dtype=np.float32)
        got = np.asarray(ball_query(0.2, 8, jnp.asarray(xyz), jnp.asarray(new_xyz)))
        np.testing.assert_array_equal(got, 7)


class TestThreeNN:
    def test_matches_oracle(self, rng):
        unknown = _cloud(rng, b=2, n=64)
        known = _cloud(rng, b=2, n=24)
        d_got, i_got = three_nn(jnp.asarray(unknown), jnp.asarray(known))
        d_want, i_want = three_nn_oracle(unknown, known)
        np.testing.assert_array_equal(np.asarray(i_got), i_want)
        np.testing.assert_allclose(np.asarray(d_got), d_want, rtol=1e-6, atol=1e-6)


class TestGatherGroup:
    def test_gather(self, rng):
        pts = rng.rand(2, 50, 7).astype(np.float32)
        idx = rng.randint(0, 50, (2, 10)).astype(np.int32)
        got = np.asarray(gather_points(jnp.asarray(pts), jnp.asarray(idx)))
        want = np.stack([pts[b][idx[b]] for b in range(2)])
        np.testing.assert_array_equal(got, want)

    def test_group(self, rng):
        pts = rng.rand(2, 50, 7).astype(np.float32)
        idx = rng.randint(0, 50, (2, 10, 4)).astype(np.int32)
        got = np.asarray(group_points(jnp.asarray(pts), jnp.asarray(idx)))
        want = np.stack([pts[b][idx[b]] for b in range(2)])
        np.testing.assert_array_equal(got, want)

    def test_group_grad_is_scatter_add(self, rng):
        # backward of grouping must accumulate like the CUDA atomicAdd kernel
        pts = rng.rand(1, 20, 3).astype(np.float32)
        idx = np.array([[[0, 0, 5], [5, 5, 5]]], dtype=np.int32)

        def loss(p):
            return jnp.sum(group_points(p, jnp.asarray(idx)))

        g = np.asarray(jax.grad(loss)(jnp.asarray(pts)))
        want = np.zeros_like(pts)
        for m in range(2):
            for s in range(3):
                want[0, idx[0, m, s]] += 1.0
        np.testing.assert_allclose(g, want)

    def test_query_and_group_shapes(self, rng):
        xyz = _cloud(rng, b=2, n=64)
        new_xyz = _cloud(rng, b=2, n=8)
        feats = rng.rand(2, 64, 5).astype(np.float32)
        out, gxyz = query_and_group(
            0.5, 4, jnp.asarray(xyz), jnp.asarray(new_xyz), jnp.asarray(feats),
            use_xyz=True, normalize_xyz=True, ret_grouped_xyz=True,
        )
        assert out.shape == (2, 8, 4, 8)
        assert gxyz.shape == (2, 8, 4, 3)
        # xyz offsets recentered and normalized by radius -> within ~1 for real neighbors
        assert np.abs(np.asarray(out)[..., :3]).max() <= 100.0

    def test_group_all(self, rng):
        xyz = _cloud(rng, b=2, n=16)
        feats = rng.rand(2, 16, 5).astype(np.float32)
        out = group_all(jnp.asarray(xyz), jnp.asarray(feats))
        assert out.shape == (2, 1, 16, 8)
        np.testing.assert_allclose(np.asarray(out)[:, 0, :, :3], xyz, rtol=1e-6)


class TestThreeInterpolate:
    def test_value_and_grad(self, rng):
        pts = rng.rand(2, 12, 6).astype(np.float32)
        idx = rng.randint(0, 12, (2, 20, 3)).astype(np.int32)
        w = rng.rand(2, 20, 3).astype(np.float32)
        w = w / w.sum(-1, keepdims=True)
        got = np.asarray(three_interpolate(jnp.asarray(pts), jnp.asarray(idx), jnp.asarray(w)))
        want = np.zeros((2, 20, 6), dtype=np.float32)
        for b in range(2):
            for n in range(20):
                for k in range(3):
                    want[b, n] += pts[b, idx[b, n, k]] * w[b, n, k]
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

        # gradcheck vs numerical, mirroring lib/pointnet2/pointnet2_test.py:18-33
        def f(p):
            return jnp.sum(three_interpolate(p, jnp.asarray(idx), jnp.asarray(w)) ** 2)

        g = np.asarray(jax.grad(f)(jnp.asarray(pts)))
        eps = 1e-3
        for probe in [(0, 3, 1), (1, 11, 5)]:
            pp = pts.copy()
            pp[probe] += eps
            pm = pts.copy()
            pm[probe] -= eps
            num = (f(jnp.asarray(pp)) - f(jnp.asarray(pm))) / (2 * eps)
            np.testing.assert_allclose(g[probe], num, rtol=1e-2)


class TestStripeKernelOracle:
    """The Pallas stripe kernel (interpret mode here; driven on the real chip
    per .claude/skills/verify/SKILL.md) must be BITWISE equal to its XLA
    emulation for both stripe plans (first-only narrow stripes / first+last
    wide stripes, ``_stripe_plan``)."""

    @pytest.mark.parametrize("n,nsample,expect_picks", [
        (1024, 8, 1),  # narrow quantum needs no extra padding -> first-only
        (512, 8, 2),   # padded lengths differ -> first+last wide stripes
    ])
    def test_kernel_matches_emulation(self, rng, n, nsample, expect_picks):
        from bridgeqa_tpu.ops.grouping import (
            _ball_query_stripes_impl,
            _ball_query_stripes_xla,
            _stripe_plan,
        )

        picks, _ = _stripe_plan(n, nsample)
        assert picks == expect_picks
        xyz = jnp.asarray(_cloud(rng, b=3, n=n, scale=2.0))
        ctr = jnp.asarray(_cloud(rng, b=3, n=64, scale=2.0))
        ki, kr = _ball_query_stripes_impl(0.5, nsample, xyz, ctr, interpret=True)
        ei, er = _ball_query_stripes_xla(0.5, nsample, xyz, ctr)
        np.testing.assert_array_equal(np.asarray(ki), np.asarray(ei))
        for got, want in zip(kr, er):
            np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
        # sanity: both empty-ball (0) and filled slots occur in the fixture
        assert (np.asarray(ki) == 0).any()
        assert (np.asarray(ki) > 0).any()

    @pytest.mark.parametrize("n,nsample", [(1024, 8), (512, 8)])  # both plans
    def test_feature_extraction_matches_group_points(self, rng, n, nsample):
        """In-sweep feature extraction contract: feature plane j equals
        ``feats[b, idx[b,m,s], j]`` BITWISE (fill slots carry the fill
        point's features; all-empty balls carry point 0's, matching
        ``group_points`` on the returned idx), kernel == emulation."""
        from bridgeqa_tpu.ops.grouping import (
            _ball_query_stripes_impl,
            _ball_query_stripes_xla,
        )

        nf = 2
        xyz = jnp.asarray(_cloud(rng, b=3, n=n, scale=2.0))
        ctr = jnp.asarray(_cloud(rng, b=3, n=64, scale=2.0))
        feats = jnp.asarray(rng.randn(3, n, nf).astype(np.float32))
        ki, kr, kf = _ball_query_stripes_impl(0.5, nsample, xyz, ctr, feats,
                                              interpret=True)
        ei, er, ef = _ball_query_stripes_xla(0.5, nsample, xyz, ctr, feats)
        np.testing.assert_array_equal(np.asarray(ki), np.asarray(ei))
        for got, want in zip(kr + kf, er + ef):
            np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
        # group_points parity: plane j == feats[b, idx, j] everywhere
        gathered = np.take_along_axis(np.asarray(feats),
                                      np.asarray(ki).reshape(3, -1, 1), axis=1)
        gathered = gathered.reshape(3, 64, nsample, nf)
        for j in range(nf):
            np.testing.assert_array_equal(np.asarray(kf[j]), gathered[..., j])
        assert (np.asarray(ki) == 0).any() and (np.asarray(ki) > 0).any()

    def test_feature_extraction_grad(self, rng):
        """The feats-kernel VJP must match autodiff of the equivalent
        gather/recenter formulation (same idx held fixed)."""
        import jax

        from bridgeqa_tpu.ops.grouping import (
            _ball_query_stripes_feats_bwd,
            _ball_query_stripes_xla,
        )

        n, nsample, nf = 512, 8, 2
        xyz = jnp.asarray(_cloud(rng, b=2, n=n, scale=2.0))
        ctr = jnp.asarray(_cloud(rng, b=2, n=32, scale=2.0))
        feats = jnp.asarray(rng.randn(2, n, nf).astype(np.float32))
        idx, rel, fp = _ball_query_stripes_xla(0.5, nsample, xyz, ctr, feats)

        g_rel = tuple(jnp.asarray(rng.randn(*r.shape).astype(np.float32)) for r in rel)
        g_fp = tuple(jnp.asarray(rng.randn(*f.shape).astype(np.float32)) for f in fp)
        g_xyz, g_ctr, g_feats = _ball_query_stripes_feats_bwd(
            0.5, nsample, (idx, xyz.shape, feats.shape), (None, g_rel, g_fp))

        def ref_fn(xyz_, ctr_, feats_):
            sel = jnp.take_along_axis(xyz_, idx.reshape(2, -1, 1), axis=1)
            rel_ = sel.reshape(2, 32, nsample, 3) - ctr_[:, :, None, :]
            fsel = jnp.take_along_axis(feats_, idx.reshape(2, -1, 1), axis=1)
            fsel = fsel.reshape(2, 32, nsample, nf)
            return (jnp.sum(rel_ * jnp.stack(g_rel, -1))
                    + jnp.sum(fsel * jnp.stack(g_fp, -1)))

        rx, rc, rf = jax.grad(ref_fn, argnums=(0, 1, 2))(xyz, ctr, feats)
        np.testing.assert_allclose(np.asarray(g_feats), np.asarray(rf), atol=1e-5)
        np.testing.assert_allclose(np.asarray(g_ctr), np.asarray(rc), atol=1e-5)
        # the kernel zeroes rel on all-empty balls while the plain gather
        # does not; restrict the xyz check to batches with no all-empty
        # slots — the fixture's 0.5 radius over 512 points leaves none
        np.testing.assert_allclose(np.asarray(g_xyz), np.asarray(rx), atol=1e-5)


class TestPlaneDense:
    def test_hybrid_matches_dense_concat(self, rng):
        """SharedMLP fed (planes, features) must match the same params
        applied to the concatenated channel-last tensor (the layout the
        reference's SharedMLP consumes)."""
        from bridgeqa_tpu.models.layers import SharedMLP

        b, m, s, c = 2, 8, 4, 6
        planes = tuple(jnp.asarray(rng.randn(b, m, s).astype(np.float32)) for _ in range(3))
        feats = jnp.asarray(rng.randn(b, m, s, c).astype(np.float32))
        mlp = SharedMLP([16, 8], bn=True)
        concat = jnp.concatenate([jnp.stack(planes, -1), feats], axis=-1)
        v = mlp.init({"params": jax.random.PRNGKey(0)}, concat, train=False)
        out_t = mlp.apply(v, concat, train=False)
        out_h = mlp.apply(v, feats, planes=planes, train=False)
        np.testing.assert_allclose(np.asarray(out_t), np.asarray(out_h), rtol=1e-5, atol=1e-5)


class TestFpsNanRobust:
    def test_nan_point_never_selected(self, rng):
        """A NaN-coordinate point (always an invalid lane: NaN magnitude
        fails the padding-skip test) must not poison the maskless kernel
        recurrence — kernel (interpret mode) == the reference-semantics
        single-cloud formulation, and the NaN index never appears."""
        from bridgeqa_tpu.ops.sampling import _fps_pallas_impl, _fps_single

        xyz = rng.randn(2, 256, 3).astype(np.float32) * 2.0
        xyz[0, 17, 0] = np.nan   # one corrupted coordinate
        xyz[1, 200] = np.nan     # fully-NaN point
        xyz_j = jnp.asarray(xyz)
        ki, kxyz = _fps_pallas_impl(xyz_j, 32, interpret=True)
        ref = np.stack([np.asarray(_fps_single(xyz_j[b], 32)) for b in range(2)])
        np.testing.assert_array_equal(np.asarray(ki), ref)
        assert 17 not in np.asarray(ki)[0]
        assert 200 not in np.asarray(ki)[1]
        assert np.isfinite(np.asarray(kxyz)).all()
