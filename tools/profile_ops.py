"""Per-op timing of the env-step hot path at training scale.

Breaks the ~X ms/step from tools/profile_train.py into: splat z-buffer,
carve z-test, hit scatter, collision, grayscale/obs assembly, policy
forward, distribution sample — each timed standalone (vmapped over envs,
jitted, block_until_ready).

Usage: python tools/profile_ops.py [num_envs] [cam] [res]
"""
from __future__ import annotations

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp


def bench(name, fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:38s} {dt:8.2f} ms", flush=True)
    return dt


def main():
    num_envs = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    cam = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    res = int(sys.argv[3]) if len(sys.argv) > 3 else 64

    from gennbv_tpu import spec
    from gennbv_tpu.config import (CameraConfig, EnvConfig, ModelConfig,
                                   RendererConfig, SceneConfig)
    from gennbv_tpu.env import ReconEnv, make_scenes
    from gennbv_tpu.env import scene as scene_lib
    from gennbv_tpu.models import distributions, init_policy
    from gennbv_tpu.ops import camera, carve, splat, voxel

    cfg = EnvConfig(
        num_envs=num_envs,
        camera=CameraConfig(height=cam, width=cam),
        renderer=RendererConfig(resolution=res),
        scene=SceneConfig(num_scenes=num_envs, seed=0),
    )
    scenes = make_scenes(cfg.scene, res)
    env = ReconEnv(cfg, scenes)
    print(f"envs={num_envs} cam={cam} res={res} "
          f"Q={scenes.surf_pts.shape[1]} G={scenes.grid_size}", flush=True)

    state = env.init_state(num_envs)
    actions = jnp.broadcast_to(env.init_action, (num_envs, 6))
    state, out = env.step(state, actions)
    poses = actions.astype(jnp.float32) * env.action_unit + env.pose_low
    g = scenes.grid_size
    h, w = cam, cam

    # precompute per-env camera frames
    r_c2w, t_c2w = jax.vmap(lambda p: camera.pose_to_c2w(p, cfg.camera.z_offset))(poses)

    def splat_one(sid, r, t):
        rv = (scenes.box_hi[sid] - scenes.box_lo[sid]) / scenes.grid_res
        return splat.splat_depth(
            scenes.surf_pts[sid], scenes.surf_mask[sid], env.intrinsics, r, t,
            h, w, cfg.camera.depth_max, jnp.mean(rv), cfg.renderer.footprint)

    f_splat = jax.jit(jax.vmap(splat_one))
    zbuf, fg, visible = f_splat(state.scene_id, r_c2w, t_c2w)
    bench("splat_depth (scatter+minpool+vis)", f_splat, state.scene_id, r_c2w, t_c2w)

    # splat WITHOUT the footprint min-pool
    def splat_fp0(sid, r, t):
        rv = (scenes.box_hi[sid] - scenes.box_lo[sid]) / scenes.grid_res
        return splat.splat_depth(
            scenes.surf_pts[sid], scenes.surf_mask[sid], env.intrinsics, r, t,
            h, w, cfg.camera.depth_max, jnp.mean(rv), 0)
    bench("splat_depth footprint=0 (scatter only)", jax.jit(jax.vmap(splat_fp0)),
          state.scene_id, r_c2w, t_c2w)

    def hits_one(sid, vis):
        idx, ib = voxel.points_to_voxel_idx(
            scenes.surf_pts[sid], vis, scenes.range_gt[sid], scenes.voxel_size[sid])
        return voxel.scatter_hits(g, idx, ib)
    f_hits = jax.jit(jax.vmap(hits_one))
    bench("voxelize+scatter_hits (G^3)", f_hits, state.scene_id, visible)

    def carve_one(sid, zb, r, t):
        centers = scene_lib.voxel_centers(scenes.range_gt[sid], scenes.voxel_size[sid], g)
        margin = 0.5 * jnp.mean(scenes.voxel_size[sid])
        return carve.carve_ztest(centers, zb.reshape(h, w), None, env.intrinsics,
                                 r, t, margin, depth_max=cfg.camera.depth_max)
    bench("carve_ztest (G^3 gather)", jax.jit(jax.vmap(carve_one)),
          state.scene_id, zbuf, r_c2w, t_c2w)

    # the batch form used by env.step (the vmapped per-env form materializes
    # every env's [R^3] grid and reads ~6.6 ms — kept out of the hot path)
    f_coll = jax.jit(env._collision_batch)
    bench("collision (batch, as in step)", f_coll, state.scene_id, poses)

    f_gray = jax.jit(lambda d: camera.depth_to_grayscale(
        d.reshape(num_envs, h, w), cfg.camera.depth_max, cfg.rgb_h, cfg.rgb_w))
    bench("depth->grayscale resize", f_gray, zbuf)

    model, variables = init_policy(ModelConfig(), jax.random.PRNGKey(0), env.obs_dim)
    f_pol = jax.jit(lambda o: model.apply(variables, o, train=False))
    bench("policy forward", f_pol, out.obs)

    rng = jax.random.PRNGKey(1)
    logits = f_pol(out.obs).logits
    f_samp = jax.jit(distributions.sample)
    bench("distribution sample", f_samp, logits, rng)

    f_step = env.step
    _ = f_step(state, actions)
    bench("FULL env.step", lambda s, a: f_step(s, a)[1].obs, state, actions, iters=10)


if __name__ == "__main__":
    main()
