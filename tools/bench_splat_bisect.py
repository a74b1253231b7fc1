"""Bisect why splat.splat_depth times 13x slower than an inline
re-expression of the same math (tools/bench_splat_forms.py).

Variants, all vmapped over 256 envs at the given camera:
  A. splat.splat_depth as shipped (inner @jax.jit wrapper)
  B. splat_depth's body WITHOUT the jit wrapper (__wrapped__)
  C. mxu.scatter_min_image + mxu.gather_image called directly from a local
     projection (bypasses splat_depth entirely)
  D. fully local re-implementation (the known-fast form)

Usage: python tools/bench_splat_bisect.py [num_envs] [cam]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    num_envs = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    cam = int(sys.argv[2]) if len(sys.argv) > 2 else 400

    from gennbv_tpu.config import (CameraConfig, EnvConfig, RendererConfig,
                                   SceneConfig)
    from gennbv_tpu.env import ReconEnv, make_scenes
    from gennbv_tpu.ops import camera, mxu, splat

    cfg = EnvConfig(num_envs=num_envs,
                    camera=CameraConfig(height=cam, width=cam),
                    renderer=RendererConfig(resolution=64),
                    scene=SceneConfig(num_scenes=num_envs, seed=0))
    scenes = make_scenes(cfg.scene, cfg.renderer.resolution)
    env = ReconEnv(cfg, scenes)
    print(f"platform={jax.default_backend()} envs={num_envs} cam={cam}",
          flush=True)

    state = env.init_state(num_envs)
    actions = jnp.broadcast_to(env.init_action, (num_envs, 6))
    poses = actions.astype(jnp.float32) * env.action_unit + env.pose_low
    r_c2w, t_c2w = jax.vmap(
        lambda p: camera.pose_to_c2w(p, cfg.camera.z_offset))(poses)

    fp = cfg.renderer.footprint
    dmax = cfg.camera.depth_max

    def project(sid, r, t):
        surf_pts = scenes.surf_pts[sid]
        surf_mask = scenes.surf_mask[sid]
        p_cam = (surf_pts - t[None, :]) @ r
        z = p_cam[:, 2]
        in_front = (z > 1e-3) & surf_mask
        safe_z = jnp.where(in_front, z, 1.0)
        k = env.intrinsics
        u = k[0, 0] * p_cam[:, 0] / safe_z + k[0, 2]
        v = k[1, 1] * p_cam[:, 1] / safe_z + k[1, 2]
        ui_ = jnp.floor(u).astype(jnp.int32)
        vi_ = jnp.floor(v).astype(jnp.int32)
        ok = in_front & (ui_ >= 0) & (ui_ < cam) & (vi_ >= 0) & (vi_ < cam)
        rv = (scenes.box_hi[sid] - scenes.box_lo[sid]) / scenes.grid_res
        return (jnp.clip(vi_, 0, cam - 1), jnp.clip(ui_, 0, cam - 1), z, ok,
                jnp.mean(rv))

    def splat_args(sid, r, t):
        return (scenes.surf_pts[sid], scenes.surf_mask[sid], env.intrinsics,
                r, t, cam, cam, dmax,
                jnp.mean((scenes.box_hi[sid] - scenes.box_lo[sid])
                         / scenes.grid_res), fp, "mxu")

    @jax.jit
    def impl_a(sids, rs, ts):
        return jax.vmap(
            lambda s, r, t: splat.splat_depth(*splat_args(s, r, t)))(
                sids, rs, ts)

    # B existed to isolate the inner-jit boundary; splat_depth is now a
    # plain function (the fix), so B == A.
    unwrapped = getattr(splat.splat_depth, "__wrapped__", splat.splat_depth)

    @jax.jit
    def impl_b(sids, rs, ts):
        return jax.vmap(
            lambda s, r, t: unwrapped(*splat_args(s, r, t)))(sids, rs, ts)

    @jax.jit
    def impl_c(sids, rs, ts):
        def one(sid, r, t):
            vic, uic, z, ok, veps = project(sid, r, t)
            zbuf0, quant = mxu.scatter_min_image(vic, uic, z, ok, cam, cam,
                                                 dmax)
            big = jnp.asarray(dmax, jnp.float32)
            k2 = 2 * fp + 1
            z2d = zbuf0.reshape(cam, cam)
            z2d = jax.lax.reduce_window(z2d, big, jax.lax.min,
                                        (k2, 1), (1, 1), "SAME")
            z2d = jax.lax.reduce_window(z2d, big, jax.lax.min,
                                        (1, k2), (1, 1), "SAME")
            z_at = mxu.gather_image(z2d, vic, uic, exact=False)
            vis = ok & (z <= z_at + veps + quant)
            return z2d.reshape(-1), vis
        return jax.vmap(one)(sids, rs, ts)

    impls = [("A splat_depth (inner jit)", impl_a),
             ("B splat_depth.__wrapped__", impl_b),
             ("C mxu ops direct", impl_c)]

    ref = None
    for name, fn in impls:
        out = jax.block_until_ready(fn(state.scene_id, r_c2w, t_c2w))
        zb = np.array(jax.tree_util.tree_leaves(out)[0])
        if ref is None:
            ref = zb
        else:
            print(f"  {name}: zbuf max|diff| vs A = "
                  f"{np.abs(zb - ref).max():.8f}", flush=True)

    def bench(name, fn, iters=20):
        args = [state.scene_id, r_c2w, t_c2w]
        out = jax.block_until_ready(fn(*args))
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
            s = jax.tree_util.tree_leaves(out)[0].reshape(-1)[0]
            args[2] = args[2] + s.astype(jnp.float32) * 1e-30
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / iters * 1e3
        print(f"{name:36s} {dt:8.2f} ms", flush=True)
        return dt

    for name, fn in impls:
        bench(name, fn)


if __name__ == "__main__":
    main()
