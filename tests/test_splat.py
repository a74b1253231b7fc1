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
