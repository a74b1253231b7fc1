"""Splatting renderer tests: visibility, occlusion, and env-level
consistency against the exact DDA ray-marcher."""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gennbv_tpu.config import CameraConfig, EnvConfig, RendererConfig, SceneConfig
from gennbv_tpu.env import ReconEnv, make_scenes
from gennbv_tpu.ops import camera, splat


class TestSplatDepth:
    def _cam(self, h=64, w=64):
        k = jnp.asarray(camera.intrinsics(h, w, 90.0))
        pose = jnp.array([0.0, 0.0, 6.0, 0.0, np.pi / 2, 0.0])  # looking down
        r_c2w, t_c2w = camera.pose_to_c2w(pose)
        return k, r_c2w, t_c2w, h, w

    def test_top_face_visible_bottom_not(self):
        k, r, t, h, w = self._cam()
        # two-layer slab: top layer z=2, bottom layer z=1 (occluded from above)
        n = 8
        xs = (np.arange(n) - n / 2 + 0.5) * 0.25
        top = np.stack(np.meshgrid(xs, xs, [2.0], indexing="ij"), -1).reshape(-1, 3)
        bot = np.stack(np.meshgrid(xs, xs, [1.0], indexing="ij"), -1).reshape(-1, 3)
        pts = jnp.asarray(np.concatenate([top, bot]), jnp.float32)
        mask = jnp.ones(len(pts), bool)
        zbuf, fg, visible = splat.splat_depth(
            pts, mask, k, r, t, h, w, 50.0, jnp.asarray(0.15), 1
        )
        vis = np.array(visible)
        assert vis[: len(top)].all(), "top layer fully visible"
        assert not vis[len(top):].any(), "bottom layer fully occluded"
        assert float(zbuf.min()) == pytest.approx(4.1, abs=0.01)  # cam 6.1 -> z=2

    def test_padding_mask_respected(self):
        k, r, t, h, w = self._cam()
        pts = jnp.zeros((16, 3)).at[:, 2].set(1.0)
        mask = jnp.zeros(16, bool).at[0].set(True)
        zbuf, fg, visible = splat.splat_depth(
            pts, mask, k, r, t, h, w, 50.0, jnp.asarray(0.1), 1
        )
        assert int(visible.sum()) == 1

    def test_behind_camera_invisible(self):
        k, r, t, h, w = self._cam()
        pts = jnp.asarray([[0.0, 0.0, 10.0]], jnp.float32)  # above the camera
        zbuf, fg, visible = splat.splat_depth(
            pts, jnp.ones(1, bool), k, r, t, h, w, 50.0, jnp.asarray(0.1), 1
        )
        assert not bool(visible[0])
        assert not bool(fg.any())


class TestSplatEnvConsistency:
    def test_coverage_close_to_dda(self):
        """Same scenes, same orbit: splat-mode coverage tracks DDA-mode
        coverage (they share GT derivation; hits differ only by sampling).

        Splat hits are the COMPLETE visible surfel set while DDA hits are
        pixel samples, so splat legitimately dominates on concave scenes
        where grazing-angle surfaces catch few pixel rays — the check is
        one-sided dominance plus a coarse band, not symmetric closeness."""
        scene_cfg = SceneConfig(num_scenes=2, seed=3)
        base = dict(
            num_envs=2,
            camera=CameraConfig(height=48, width=48),
            scene=scene_cfg,
            max_episode_length=50,
            coverage_done_threshold=None,
        )
        cfg_splat = EnvConfig(renderer=RendererConfig(mode="splat", resolution=32), **base)
        cfg_dda = EnvConfig(renderer=RendererConfig(mode="dda", resolution=32), **base)
        scenes = make_scenes(scene_cfg, 32)
        env_s = ReconEnv(cfg_splat, scenes)
        env_d = ReconEnv(cfg_dda, scenes)

        def run(env):
            state, out = env.reset(2)
            for i in range(1, 8):
                ang = 2 * np.pi * i / 8
                x, y = 5.0 * np.cos(ang), 5.0 * np.sin(ang)
                idx = np.array([
                    (x + 8) / 0.2, (y + 8) / 0.2, (3.0 - 0.1) / 0.2, 0,
                    round((0.45 + np.pi / 2) / (np.pi / 12)),
                    round(((ang + np.pi) % (2 * np.pi)) / (np.pi / 6)),
                ]).round().astype(np.int32)
                act = jnp.tile(jnp.asarray(idx)[None], (2, 1))
                state, out = env.step(state, act)
            return np.array(state.coverage)

        cov_s = run(env_s)
        cov_d = run(env_d)
        assert (cov_s > 0.4).all(), f"splat orbit coverage too low: {cov_s}"
        assert (cov_s >= cov_d - 0.05).all(), \
            f"splat must dominate pixel-sampled DDA hits: {cov_s} vs {cov_d}"
        np.testing.assert_allclose(cov_s, cov_d, atol=0.3)


def test_scatter_min_image_matches_exact():
    """The MXU radix-min zbuf must match the exact scatter-min within its
    declared quantization step, with identical empty-pixel masks."""
    import numpy as np
    from gennbv_tpu.ops import mxu

    rng = np.random.RandomState(3)
    h = w = 32
    q = 3000
    vi = jnp.asarray(rng.randint(0, h, q), jnp.int32)
    ui = jnp.asarray(rng.randint(0, w, q), jnp.int32)
    z = jnp.asarray(rng.uniform(1.0, 29.0, q), jnp.float32)
    ok = jnp.asarray(rng.rand(q) < 0.6)
    dmax = 50.0

    zb, quant = jax.jit(
        lambda *a: mxu.scatter_min_image(*a, h, w, dmax))(vi, ui, z, ok)
    flat = vi * w + ui
    exact = jnp.full((h * w,), dmax, jnp.float32).at[flat].min(
        jnp.where(ok, z, dmax))

    zb, exact = np.asarray(zb), np.asarray(exact)
    hit = exact < dmax
    assert ((zb < dmax) == hit).all(), "empty-pixel mask differs"
    err = np.abs(zb[hit] - exact[hit])
    assert err.max() <= float(quant) * 1.01, (err.max(), float(quant))


def test_scatter_min_image_conflict_overflow_degrades_conservatively():
    """>2^spacing_bits points in one (pixel, bucket) may only push the
    result LOWER (conservative), never higher than the true min + quant."""
    import numpy as np
    from gennbv_tpu.ops import mxu

    h = w = 8
    q = 8192
    vi = jnp.zeros(q, jnp.int32)
    ui = jnp.zeros(q, jnp.int32)    # ALL points on one pixel
    z = jnp.full(q, 10.0, jnp.float32)  # all same depth: one bucket overflow
    ok = jnp.ones(q, bool)
    zb, quant = mxu.scatter_min_image(vi, ui, z, ok, h, w, 50.0)
    assert float(zb[0]) <= 10.0 + float(quant) * 1.01


class TestSplatCompactBatch:
    """splat_depth_batch's survivor-compacted fast path must be
    BIT-IDENTICAL to the dense path (the cull bound is exact: a culled
    point can neither pass visibility nor change the pooled z-buffer)."""

    def _setup(self, n_envs=4, seed=0, h=48, w=64, q_bot=704,
               q_behind=64):
        """Synthetic batch: a visible top plane, a dense occluded slab well
        below it (cullable), and points behind the camera (invalid)."""
        rng = np.random.default_rng(seed)
        k = jnp.asarray(camera.intrinsics(h, w, 90.0))
        poses = np.stack([
            [0, 0, 6.0, 0, np.pi / 2, 0],                      # exact top-down
            *(np.array([0.3, -0.2, 6.0, 0, np.pi / 2 - 0.15, 0.4])
              + 0.1 * rng.standard_normal((n_envs - 1, 6))),
        ]).astype(np.float32)
        r, t = jax.vmap(camera.pose_to_c2w)(jnp.asarray(poses))

        # the top plane is a 24x24 GRID (spacing 0.2 m ~ 1.6 px at its
        # depth < the 3x3 footprint), so it is hole-free: every slab point
        # underneath is occluded in the exact top-down view
        gx = (np.arange(24) - 11.5) * 0.2

        def pts_one(rr):
            top = np.stack(np.meshgrid(gx, gx, [2.0], indexing="ij"),
                           -1).reshape(-1, 3)
            bot = np.c_[rr.uniform(-2, 2, (q_bot, 2)),
                        rr.uniform(0.3, 1.0, q_bot)]
            beh = np.c_[rr.uniform(-2, 2, (q_behind, 2)),
                        np.full(q_behind, 9.0)]                 # above cam
            return np.concatenate([top, bot, beh]).astype(np.float32)

        sp = jnp.asarray(np.stack([pts_one(np.random.default_rng(seed + i))
                                   for i in range(n_envs)]))
        sm = jnp.ones(sp.shape[:2], bool)
        veps = jnp.full((n_envs,), 0.15, jnp.float32)
        return sp, sm, k, r, t, h, w, veps

    def _run(self, cap, **kw):
        sp, sm, k, r, t, h, w, veps = self._setup(**kw)
        dense = splat.splat_depth_batch(sp, sm, k, r, t, h, w, 50.0, veps,
                                        1, "mxu", None)
        fast = splat.splat_depth_batch(sp, sm, k, r, t, h, w, 50.0, veps,
                                       1, "mxu", cap)
        return dense, fast, sp.shape[1]

    def test_fast_path_identical(self):
        # cap 768 >> the 576-point visible plane + cull shell: the fast
        # (compacted) branch runs.  visibility and fg must be EXACTLY
        # equal; the zbuf is equal to 1 ulp (the radix DIGITS are
        # bit-identical, but XLA may fuse the affine decode
        # zmin + frac*zrange as an fma in one graph and not the other)
        (zb_d, fg_d, vis_d), (zb_f, fg_f, vis_f), q = self._run(cap=768)
        assert q == 576 + 704 + 64
        assert int(np.array(vis_d).sum()) > 0
        np.testing.assert_allclose(np.array(zb_d), np.array(zb_f), rtol=3e-7)
        np.testing.assert_array_equal(np.array(fg_d), np.array(fg_f))
        np.testing.assert_array_equal(np.array(vis_d), np.array(vis_f))

    def test_overflow_falls_back_dense(self):
        # a 128-slot cap is overrun by the visible plane alone -> the
        # batch takes the dense branch and is trivially identical
        (zb_d, _, vis_d), (zb_f, _, vis_f), _ = self._run(cap=128)
        np.testing.assert_allclose(np.array(zb_d), np.array(zb_f), rtol=3e-7)
        np.testing.assert_array_equal(np.array(vis_d), np.array(vis_f))

    def test_cull_keeps_all_visible(self):
        # the occluded slab must be invisible, the top plane visible —
        # i.e. the cull bound never removes a point the dense path sees
        sp, sm, k, r, t, h, w, veps = self._setup()
        _, _, vis = splat.splat_depth_batch(sp, sm, k, r, t, h, w, 50.0,
                                            veps, 1, "mxu", 768)
        vis = np.array(vis)
        # env 0 is the exact top-down view over the hole-free plane grid
        assert vis[0, :576].mean() > 0.9, "top plane visible (env 0)"
        assert not vis[0, 576:].any(), "occluded slab + behind-camera"

    def test_env_step_compact_matches(self):
        """Full env.step parity: compact_cap_frac on vs off (real scenes;
        exercises overflow fallback and fast path across steps)."""
        cfg = EnvConfig(
            num_envs=4,
            camera=CameraConfig(height=48, width=48),
            renderer=RendererConfig(resolution=24),
            scene=SceneConfig(num_scenes=4, seed=3),
        )
        cfg_c = dataclasses.replace(
            cfg, renderer=dataclasses.replace(cfg.renderer,
                                              compact_cap_frac=0.625))
        scenes = make_scenes(cfg.scene, cfg.renderer.resolution)
        env_a = ReconEnv(cfg, scenes)
        env_b = ReconEnv(cfg_c, scenes)
        state_a, out_a = env_a.reset(4)
        state_b, out_b = env_b.reset(4)
        np.testing.assert_array_equal(np.array(out_a.obs), np.array(out_b.obs))
        rng = np.random.default_rng(0)
        for _ in range(3):
            acts = jnp.asarray(rng.integers(0, np.asarray(env_a.nvec), (4, 6)),
                               jnp.int32)
            state_a, out_a = env_a.step(state_a, acts)
            state_b, out_b = env_b.step(state_b, acts)
            np.testing.assert_array_equal(np.array(out_a.obs),
                                          np.array(out_b.obs))
            np.testing.assert_array_equal(np.array(out_a.reward),
                                          np.array(out_b.reward))


class TestSplatBandedBatch:
    """Row-banded splat path (renderer.band_split): per-band GEMMs must be
    bit-identical to the dense path — the banding is a lossless partition
    of points by their own pixel row (footprint pooling happens on the
    assembled image either way), so every pixel sees the same point set
    and the same radix quantization."""

    _setup = TestSplatCompactBatch._setup

    def _run_banded(self, bands, cap, **kw):
        sp, sm, k, r, t, h, w, veps = self._setup(**kw)
        dense = splat.splat_depth_batch(sp, sm, k, r, t, h, w, 50.0, veps,
                                        1, "mxu", None)
        fast = splat.splat_depth_batch(sp, sm, k, r, t, h, w, 50.0, veps,
                                       1, "mxu", None,
                                       band_split=bands, band_cap=cap)
        return dense, fast

    def test_banded_identical(self):
        # h=48 / 6 bands of 8 rows; cap 640 fits the densest band
        (zb_d, fg_d, vis_d), (zb_f, fg_f, vis_f) = self._run_banded(6, 640)
        assert int(np.array(vis_d).sum()) > 0
        np.testing.assert_allclose(np.array(zb_d), np.array(zb_f), rtol=3e-7)
        np.testing.assert_array_equal(np.array(fg_d), np.array(fg_f))
        np.testing.assert_array_equal(np.array(vis_d), np.array(vis_f))

    def test_banded_overflow_falls_back_dense(self):
        # a 64-slot cap is overrun by the central bands -> dense branch
        (zb_d, _, vis_d), (zb_f, _, vis_f) = self._run_banded(6, 64)
        np.testing.assert_allclose(np.array(zb_d), np.array(zb_f), rtol=3e-7)
        np.testing.assert_array_equal(np.array(vis_d), np.array(vis_f))

    def test_env_step_banded_matches(self):
        """Full env.step parity: band_split on vs off (real scenes,
        init-view cache engaged, overflow fallback reachable)."""
        cfg = EnvConfig(
            num_envs=4,
            camera=CameraConfig(height=48, width=48),
            renderer=RendererConfig(resolution=24),
            scene=SceneConfig(num_scenes=4, seed=3),
        )
        cfg_b = dataclasses.replace(
            cfg, renderer=dataclasses.replace(cfg.renderer,
                                              band_split=6,
                                              band_cap_frac=0.5))
        scenes = make_scenes(cfg.scene, cfg.renderer.resolution)
        env_a = ReconEnv(cfg, scenes)
        env_b = ReconEnv(cfg_b, scenes)
        state_a, out_a = env_a.reset(4)
        state_b, out_b = env_b.reset(4)
        np.testing.assert_array_equal(np.array(out_a.obs), np.array(out_b.obs))
        rng = np.random.default_rng(0)
        for _ in range(3):
            acts = jnp.asarray(rng.integers(0, np.asarray(env_a.nvec), (4, 6)),
                               jnp.int32)
            state_a, out_a = env_a.step(state_a, acts)
            state_b, out_b = env_b.step(state_b, acts)
            np.testing.assert_array_equal(np.array(out_a.obs),
                                          np.array(out_b.obs))

    def test_env_step_merged_gather_matches(self):
        """splat_vis_carve (merged visibility+carve gather) must be
        bit-identical to the split form on the full env.step (it measured
        SLOWER live at 400^2 — reports/r3_ab_split_vs_merged_400.log — so
        it defaults off, but stays config-selectable and exact)."""
        cfg = EnvConfig(
            num_envs=4,
            camera=CameraConfig(height=48, width=48),
            renderer=RendererConfig(resolution=24),
            scene=SceneConfig(num_scenes=4, seed=3),
        )
        cfg_m = dataclasses.replace(
            cfg, renderer=dataclasses.replace(cfg.renderer,
                                              merge_vis_carve=True))
        scenes = make_scenes(cfg.scene, cfg.renderer.resolution)
        env_a, env_m = ReconEnv(cfg, scenes), ReconEnv(cfg_m, scenes)
        state_a, out_a = env_a.reset(4)
        state_m, out_m = env_m.reset(4)
        np.testing.assert_array_equal(np.array(out_a.obs), np.array(out_m.obs))
        rng = np.random.default_rng(0)
        for _ in range(3):
            acts = jnp.asarray(rng.integers(0, np.asarray(env_a.nvec), (4, 6)),
                               jnp.int32)
            state_a, out_a = env_a.step(state_a, acts)
            state_m, out_m = env_m.step(state_m, acts)
            np.testing.assert_array_equal(np.array(out_a.obs),
                                          np.array(out_m.obs))
            np.testing.assert_array_equal(np.array(out_a.reward),
                                          np.array(out_m.reward))
