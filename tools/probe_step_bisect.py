"""Serial-chained live bisect INSIDE env.step at training scale.

probe_rollout_split.py showed env.step alone is ~95% of the 128^2
rollout (6.75 of 7.08 ms/step).  This probe times scans of nested
sub-pipelines at true shapes, each a full lax.scan(T=128) whose carry
threads the data dependency (pose depends on the previous output, the
grids carry forward), so the deltas are honest live costs:

  V1 splat_depth (radix zbuf + visibility gather)
  V2 V1 + hits scatter + carve z-test + prob/tri/coverage update
     (= vmap(_splat_step_one), the whole render+mapping path)
  V3 full env.step (adds pose decode, obs ring buffers, grayscale
     resize, rewards, termination/collision, masked auto-reset)

Run on the real TPU: python tools/probe_step_bisect.py [num_envs] [cam]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp

T = 128


def timeit(name, fn, *args, reps=4):
    out = fn(*args)
    jax.block_until_ready(out)
    best = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best.append(time.perf_counter() - t0)
    dt = min(best)
    print(f"{name:46s} {dt*1e3:9.1f} ms  ({dt/T*1e3:6.3f} ms/step)",
          flush=True)
    return dt


def main():
    num_envs = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    cam = int(sys.argv[2]) if len(sys.argv) > 2 else 128

    from gennbv_tpu.config import CameraConfig, EnvConfig, RendererConfig, SceneConfig
    from gennbv_tpu.env import ReconEnv, make_scenes
    from gennbv_tpu.ops import camera, splat
    from gennbv_tpu.utils.jitutil import unjitted_method

    cfg = EnvConfig(
        num_envs=num_envs,
        camera=CameraConfig(height=cam, width=cam),
        renderer=RendererConfig(),
        scene=SceneConfig(num_scenes=num_envs, seed=0),
    )
    scenes = make_scenes(cfg.scene, cfg.renderer.resolution)
    env = ReconEnv(cfg, scenes)
    state = env.init_state(num_envs)
    g = scenes.grid_size
    h = w = cam
    gather_impl = cfg.renderer.gather_impl_for(cam)
    print(f"envs={num_envs} cam={cam} Q={scenes.surf_pts.shape[1]} "
          f"gather={gather_impl}", flush=True)

    # a realistic orbit pose per env; the carry perturbs it each step so
    # consecutive scan iterations are data-dependent (serial chain)
    ang = jnp.linspace(0.0, 6.28, num_envs)
    poses = jnp.stack([4.0 * jnp.cos(ang), 4.0 * jnp.sin(ang),
                       jnp.full((num_envs,), 3.0), jnp.zeros(num_envs),
                       jnp.full((num_envs,), 0.4), ang + 3.14], axis=-1)
    sid = state.scene_id

    def splat_one(pose, scene_id):
        r_c2w, t_c2w = camera.pose_to_c2w(pose, cfg.camera.z_offset)
        render_vsize = (scenes.box_hi[scene_id] - scenes.box_lo[scene_id]) \
            / scenes.grid_res
        return splat.splat_depth(
            scenes.surf_pts[scene_id], scenes.surf_mask[scene_id],
            env.intrinsics, r_c2w, t_c2w, h, w, cfg.camera.depth_max,
            jnp.mean(render_vsize), cfg.renderer.footprint,
            cfg.renderer.zbuf_impl, gather_impl=gather_impl)

    @jax.jit
    def v1_splat(sid, poses):
        def body(s, _):
            p = poses + 1e-9 * s
            zbuf, fg, visible = jax.vmap(splat_one)(p, sid)
            return zbuf.sum(), None
        return jax.lax.scan(body, jnp.float32(0.0), None, length=T)[0]

    step_one = unjitted_method(env, "_splat_step_one")
    hits_carve_one = unjitted_method(env, "_hits_carve_one")

    # NOTE: every variant's scan carry must DEPEND on the work being
    # timed — XLA's while-loop simplifier dead-code-eliminates carry
    # elements whose final value is unused (first version of this probe
    # read mapping == 0.000 ms because only zbuf.sum() was live).

    def splat_parts(pose, scene_id):
        r_c2w, t_c2w = camera.pose_to_c2w(pose, cfg.camera.z_offset)
        zbuf, fg, visible = splat_one(pose, scene_id)
        return r_c2w, t_c2w, zbuf, visible

    @jax.jit
    def v1h_hits(sid, poses):
        """splat + hit scatter only (live via hit_grid sum)."""
        from gennbv_tpu.ops import voxel as voxel_ops

        def one(pose, scene_id):
            r_c2w, t_c2w, zbuf, visible = splat_parts(pose, scene_id)
            idx, in_b = voxel_ops.points_to_voxel_idx(
                scenes.surf_pts[scene_id], visible,
                scenes.range_gt[scene_id], scenes.voxel_size[scene_id])
            hit = voxel_ops.scatter_hits(g, idx, in_b)
            return zbuf.sum() + hit.sum()

        def body(s, _):
            p = poses + 1e-9 * s
            return jax.vmap(one)(p, sid).sum(), None
        return jax.lax.scan(body, jnp.float32(0.0), None, length=T)[0]

    @jax.jit
    def v1c_carve(sid, poses):
        """splat + hits + carve z-test (live via both sums)."""
        def one(pose, scene_id):
            r_c2w, t_c2w, zbuf, visible = splat_parts(pose, scene_id)
            hit, trav = hits_carve_one(scene_id, r_c2w, t_c2w, zbuf, visible)
            return zbuf.sum() + hit.sum() + trav.sum()

        def body(s, _):
            p = poses + 1e-9 * s
            return jax.vmap(one)(p, sid).sum(), None
        return jax.lax.scan(body, jnp.float32(0.0), None, length=T)[0]

    @jax.jit
    def v2_mapping(sid, poses, prob_grid, scanned_gt):
        def body(carry, _):
            prob_grid, scanned_gt, s = carry
            p = poses + 1e-9 * s
            zbuf, prob_grid, tri, scanned_gt, ratio = jax.vmap(step_one)(
                sid, p, prob_grid, scanned_gt)
            # keep the WHOLE mapping live: ratio <- scanned_gt <- hits,
            # tri <- prob_grid <- carve
            s = zbuf.sum() + ratio.sum() + tri.sum()
            return (prob_grid, scanned_gt, s), None
        init = (prob_grid, scanned_gt, jnp.float32(0.0))
        return jax.lax.scan(body, init, None, length=T)[0][2]

    @jax.jit
    def v2g_gray(sid, poses, prob_grid, scanned_gt):
        """v2 + grayscale resize (the only remaining image-sized op)."""
        def body(carry, _):
            prob_grid, scanned_gt, s = carry
            p = poses + 1e-9 * s
            zbuf, prob_grid, tri, scanned_gt, ratio = jax.vmap(step_one)(
                sid, p, prob_grid, scanned_gt)
            gray = camera.depth_to_grayscale(
                zbuf.reshape(num_envs, h, w), cfg.camera.depth_max,
                cfg.rgb_h, cfg.rgb_w)
            s = zbuf.sum() + ratio.sum() + tri.sum() + gray.sum()
            return (prob_grid, scanned_gt, s), None
        init = (prob_grid, scanned_gt, jnp.float32(0.0))
        return jax.lax.scan(body, init, None, length=T)[0][2]

    env_step = unjitted_method(env, "step")
    acts0 = jnp.zeros((num_envs, 6), jnp.int32)

    @jax.jit
    def v3_step(state):
        def body(carry, _):
            carry, out = env_step(carry, acts0)
            return carry, None
        return jax.lax.scan(body, state, None, length=T)[0]

    t1 = timeit("V1 splat_depth (zbuf + visibility)", v1_splat, sid, poses)
    t1h = timeit("V1h + hit scatter", v1h_hits, sid, poses)
    t1c = timeit("V1c + hits + carve z-test", v1c_carve, sid, poses)
    t2 = timeit("V2 + prob/tri/coverage (full mapping)", v2_mapping, sid,
                poses, state.prob_grid, state.scanned_gt)
    t2g = timeit("V2g + grayscale resize", v2g_gray, sid, poses,
                 state.prob_grid, state.scanned_gt)
    t3 = timeit("V3 full env.step", v3_step, state)
    ms = 1e3 / T
    print(f"\nper-step: splat {t1*ms:.3f} | +scatter {(t1h-t1)*ms:.3f} | "
          f"+carve {(t1c-t1h)*ms:.3f} | +prob/tri/cov {(t2-t1c)*ms:.3f} | "
          f"+gray {(t2g-t2)*ms:.3f} | obs/reset/rest {(t3-t2g)*ms:.3f}")


if __name__ == "__main__":
    main()
