"""Micro-benchmarks of the env-step components on the current backend.

Usage: python tools/bench_render.py [num_envs] [H] [R]
Reports per-component wall time so kernel work targets the real bottleneck.
"""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from gennbv_tpu.config import CameraConfig, EnvConfig, RendererConfig, SceneConfig
from gennbv_tpu.env import ReconEnv, make_scenes


def timeit(fn, *args, n=5, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    num_envs = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    h = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    r = int(sys.argv[3]) if len(sys.argv) > 3 else 64

    print(f"backend={jax.devices()[0].platform} num_envs={num_envs} cam={h}x{h} R={r}")
    cfg = EnvConfig(
        num_envs=num_envs,
        camera=CameraConfig(height=h, width=h),
        renderer=RendererConfig(resolution=r),
        scene=SceneConfig(num_scenes=min(num_envs, 64), seed=0),
    )
    scenes = make_scenes(cfg.scene, r)
    env = ReconEnv(cfg, scenes)
    state, out = env.reset(num_envs)
    actions = jnp.tile(jnp.asarray([[30, 50, 20, 0, 8, 3]], jnp.int32), (num_envs, 1))

    # full step
    dt_step = timeit(lambda: env.step(state, actions))
    print(f"full env.step: {dt_step*1e3:.1f} ms -> {num_envs/dt_step:.0f} env-steps/s")

    # render only
    poses = actions.astype(jnp.float32) * env.action_unit + env.pose_low
    render_fn = jax.jit(lambda sid, p: jax.vmap(env._render_one)(sid, p))
    dt_render = timeit(render_fn, state.scene_id, poses)
    print(f"render only:   {dt_render*1e3:.1f} ms ({dt_render/dt_step*100:.0f}% of step)")

    # mapping only
    depth, fg, r_c2w, t_c2w = render_fn(state.scene_id, poses)
    map_fn = jax.jit(lambda *a: jax.vmap(env._mapping_one)(*a))
    dt_map = timeit(map_fn, state.scene_id, poses, depth, fg, r_c2w, t_c2w,
                    state.prob_grid, state.scanned_gt)
    print(f"mapping only:  {dt_map*1e3:.1f} ms ({dt_map/dt_step*100:.0f}% of step)")

    # policy forward at this batch
    from gennbv_tpu.config import ModelConfig
    from gennbv_tpu.models import init_policy
    model, variables = init_policy(ModelConfig(), jax.random.PRNGKey(0), env.obs_dim)
    fwd = jax.jit(lambda o: model.apply(variables, o, train=False))
    dt_fwd = timeit(fwd, out.obs)
    print(f"policy fwd:    {dt_fwd*1e3:.1f} ms")


if __name__ == "__main__":
    main()
