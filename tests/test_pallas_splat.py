"""Fused pallas splat kernel (ops/pallas_splat.py) vs the reference mxu
formulation — must agree exactly (same digit/decode math, same bf16
products with f32 accumulation)."""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gennbv_tpu.config import CameraConfig, EnvConfig, RendererConfig, SceneConfig
from gennbv_tpu.env import ReconEnv, make_scenes
from gennbv_tpu.ops import camera, splat


def _random_cloud(seed, q=700, h=64, w=64):
    rng = np.random.default_rng(seed)
    k = jnp.asarray(camera.intrinsics(h, w, 90.0))
    pose = jnp.array([0.3, -0.2, 6.0, 0.0, np.pi / 2, 0.15])
    r_c2w, t_c2w = camera.pose_to_c2w(pose)
    pts = jnp.asarray(
        rng.uniform(-2, 2, (q, 3)) * np.array([1, 1, 0.5]) + np.array([0, 0, 1.5]),
        jnp.float32,
    )
    mask = jnp.asarray(rng.random(q) < 0.8)
    return pts, mask, k, r_c2w, t_c2w, h, w


class TestPallasVsMxu:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_exact_match_random_cloud(self, seed):
        pts, mask, k, r, t, h, w = _random_cloud(seed)
        args = (pts, mask, k, r, t, h, w, 50.0, jnp.asarray(0.15), 1)
        zb_m, fg_m, vis_m = splat.splat_depth(*args, "mxu")
        zb_p, fg_p, vis_p = splat.splat_depth(*args, "pallas")
        # zbuf to 1 ulp: the radix DIGITS agree bit-for-bit, but XLA may
        # fma-fuse the affine decode (zmin + frac*zrange) differently
        # between the two compiled graphs
        np.testing.assert_allclose(np.array(zb_m), np.array(zb_p), rtol=3e-7)
        np.testing.assert_array_equal(np.array(fg_m), np.array(fg_p))
        np.testing.assert_array_equal(np.array(vis_m), np.array(vis_p))

    def test_vmapped_batch(self):
        """The env calls splat inside vmap — the batch axis must become a
        pallas grid dimension transparently."""
        clouds = [_random_cloud(s, q=512) for s in (3, 4)]
        pts = jnp.stack([c[0] for c in clouds])
        mask = jnp.stack([c[1] for c in clouds])
        k, r, t, h, w = clouds[0][2:]

        def one(p, m, impl):
            return splat.splat_depth(p, m, k, r, t, h, w, 50.0,
                                     jnp.asarray(0.15), 1, impl)

        zb_m, _, vis_m = jax.vmap(lambda p, m: one(p, m, "mxu"))(pts, mask)
        zb_p, _, vis_p = jax.vmap(lambda p, m: one(p, m, "pallas"))(pts, mask)
        np.testing.assert_allclose(np.array(zb_m), np.array(zb_p), rtol=3e-7)
        np.testing.assert_array_equal(np.array(vis_m), np.array(vis_p))

    def test_no_valid_points(self):
        _, _, k, r, t, h, w = _random_cloud(5)
        pts = jnp.zeros((16, 3)).at[:, 2].set(20.0)  # all above the camera
        mask = jnp.ones(16, bool)
        zb, fg, vis = splat.splat_depth(pts, mask, k, r, t, h, w, 50.0,
                                        jnp.asarray(0.1), 1, "pallas")
        assert not bool(vis.any())
        assert not bool(fg.any())
        assert float(zb.min()) == pytest.approx(50.0)

    def test_env_step_parity(self):
        """Full env.step with renderer.zbuf_impl='pallas' reproduces the
        mxu-mode step bit-for-bit (coverage, obs, prob grid)."""
        scenes = make_scenes(SceneConfig(num_scenes=2, grid_size=12,
                                         seed=7), 32)
        base = EnvConfig(
            num_envs=2, max_episode_length=30,
            camera=CameraConfig(height=48, width=48),
            renderer=RendererConfig(mode="splat", resolution=32,
                                    zbuf_impl="mxu"),
        )
        env_m = ReconEnv(base, scenes)
        env_p = ReconEnv(
            dataclasses.replace(
                base, renderer=dataclasses.replace(base.renderer,
                                                   zbuf_impl="pallas")),
            scenes,
        )
        sm, om = env_m.reset(2)
        sp, op = env_p.reset(2)
        np.testing.assert_array_equal(np.array(om.obs), np.array(op.obs))
        acts = jnp.asarray([[40, 40, 25, 0, 6, 6], [20, 60, 10, 0, 3, 9]],
                           jnp.int32)
        for _ in range(3):
            sm, om = env_m.step(sm, acts)
            sp, op = env_p.step(sp, acts)
            np.testing.assert_array_equal(np.array(om.obs), np.array(op.obs))
            np.testing.assert_array_equal(np.array(sm.coverage),
                                          np.array(sp.coverage))
