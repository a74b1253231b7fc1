"""Measure row-band occupancy of the splat's projected points, to size
`renderer.band_cap_frac` for the banded splat path (ops/splat.py,
_zbuf_vis_banded_one): the fast path runs only while every band of every
env holds <= cap valid points, so the cap must sit above the occupancy
tail — but every increment of cap/Q is a proportional increase in the
fine-pass GEMM FLOPs (cut = Q/cap, independent of the band count).

Pose distribution matches training: random actions with the forced
top-down init action on fresh envs; init views are EXCLUDED from the
tail statistics because the env serves them from the per-scene render
cache (skip_env masks their points out of the splat entirely).

Usage: python tools/probe_band_occupancy.py [num_envs] [cam] [steps]
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

BANDS = (4, 8, 16)


def main():
    num_envs = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    cam = int(sys.argv[2]) if len(sys.argv) > 2 else 400
    steps = int(sys.argv[3]) if len(sys.argv) > 3 else 40

    from gennbv_tpu.config import (CameraConfig, EnvConfig, RendererConfig,
                                   SceneConfig)
    from gennbv_tpu.env import ReconEnv, make_scenes
    from gennbv_tpu.ops import camera, splat

    cfg = EnvConfig(
        num_envs=num_envs,
        camera=CameraConfig(height=cam, width=cam),
        renderer=RendererConfig(resolution=64),
        scene=SceneConfig(num_scenes=num_envs, seed=0),
    )
    scenes = make_scenes(cfg.scene, cfg.renderer.resolution)
    env = ReconEnv(cfg, scenes)
    q = scenes.surf_pts.shape[1]
    print(f"envs={num_envs} cam={cam} Q={q} bands={BANDS}")

    @jax.jit
    def band_counts(scene_id, poses):
        def one(sid, pose):
            r_c2w, t_c2w = camera.pose_to_c2w(pose, cfg.camera.z_offset)
            vic, _, _, ok = splat.project_px(
                scenes.surf_pts[sid], scenes.surf_mask[sid], env.intrinsics,
                r_c2w, t_c2w, cam, cam)
            outs = []
            for b in BANDS:
                band = jnp.where(ok, vic // (cam // b), b)
                cnt = jnp.sum(band[None, :] == jnp.arange(b)[:, None], axis=1)
                outs.append(jnp.max(cnt))
            return tuple(outs)

        return jax.vmap(one)(scene_id, poses)

    rng = np.random.default_rng(0)
    state, out = env.reset(num_envs)
    per_b = {b: [] for b in BANDS}       # batch-max band count per step,
    for t in range(steps):               # EXCL. forced-init (cache-served)
        actions = rng.integers(0, np.asarray(env.nvec), (num_envs, 6))
        actions = jnp.asarray(actions, jnp.int32)
        a = jnp.clip(actions, 0, env.nvec - 1)
        fresh = np.asarray(state.episode_len == 0)
        a = jnp.where(jnp.asarray(fresh)[:, None], env.init_action[None, :], a)
        poses = a.astype(jnp.float32) * env.action_unit + env.pose_low
        maxima = jax.block_until_ready(band_counts(state.scene_id, poses))
        for b, m in zip(BANDS, maxima):
            m = np.asarray(m)
            live = m[~fresh]
            per_b[b].append(live.max() if len(live) else 0)
        state, out = env.step(state, actions)

    for b in BANDS:
        m = np.array(per_b[b])
        print(f"B={b:2d}: batch-max band count/Q  mean={m.mean()/q:.3f}  "
              f"p90={np.percentile(m, 90)/q:.3f}  max={m.max()/q:.3f}")
        for frac in (0.1875, 0.25, 0.3125, 0.375, 0.5):
            capn = int(np.ceil(q * frac / 128) * 128)
            print(f"    cap={frac:.4f}Q ({capn}): fast-path on "
                  f"{(m <= capn).mean() * 100:.0f}% of steps "
                  f"(FLOP cut {q / capn:.1f}x)")


if __name__ == "__main__":
    main()
