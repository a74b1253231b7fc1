"""Real-TPU validation + timing of the fused Pallas splat kernel.

Compares ops/pallas_splat.py against the mxu radix-min reference
(ops/mxu.py) on identical inputs at training scale: z-buffer agreement,
visibility agreement, then wall-clock for the splat op alone and for the
FULL env.step under each `renderer.zbuf_impl`.

The Pallas kernel was authored against interpret mode (tests/
test_pallas_splat.py); this tool is its first-light check on the real
Mosaic compiler, plus the VERDICT r1 item-2 measurement (400x400 path).

Usage: python tools/bench_pallas_splat.py [num_envs] [cam] [res]
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


def bench(name, fn, *args, iters=20, chain=1):
    """Serial-chained timing: fold a scalar of each output into the float
    operand at `chain` so the axon tunnel's pipelined dispatch cannot
    overlap iterations (BENCHMARKS.md method notes)."""
    args = list(args)
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        s = jax.tree_util.tree_leaves(out)[0].reshape(-1)[0]
        args[chain] = args[chain] + s.astype(jnp.float32) * 1e-30
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:44s} {dt:8.2f} ms", flush=True)
    return dt


def main():
    num_envs = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    cam = int(sys.argv[2]) if len(sys.argv) > 2 else 400
    res = int(sys.argv[3]) if len(sys.argv) > 3 else 64

    from gennbv_tpu.config import (CameraConfig, EnvConfig, RendererConfig,
                                   SceneConfig)
    from gennbv_tpu.env import ReconEnv, make_scenes
    from gennbv_tpu.ops import camera, splat

    def env_cfg(impl):
        return EnvConfig(
            num_envs=num_envs,
            camera=CameraConfig(height=cam, width=cam),
            renderer=RendererConfig(resolution=res, zbuf_impl=impl),
            scene=SceneConfig(num_scenes=num_envs, seed=0),
        )

    scenes = make_scenes(SceneConfig(num_scenes=num_envs, seed=0), res)
    env = ReconEnv(env_cfg("mxu"), scenes)
    print(f"platform={jax.default_backend()} envs={num_envs} cam={cam} "
          f"res={res} Q={scenes.surf_pts.shape[1]}", flush=True)

    state = env.init_state(num_envs)
    if len(sys.argv) > 4 and sys.argv[4] == "random":
        # training-distribution poses (valid fraction ~10%) instead of the
        # forced init view (valid ~0.9): the Pallas kernel's per-env chunk
        # skipping only pays off on the former; with the init-view render
        # cache (recon_env._build_init_render_cache) the kernel never sees
        # init views in training
        rng_np = np.random.default_rng(0)
        actions = jnp.asarray(
            rng_np.integers(0, np.asarray(env.nvec), (num_envs, 6)),
            jnp.int32)
    else:
        actions = jnp.broadcast_to(env.init_action, (num_envs, 6))
    poses = actions.astype(jnp.float32) * env.action_unit + env.pose_low
    r_c2w, t_c2w = jax.vmap(
        lambda p: camera.pose_to_c2w(p, env.cfg.camera.z_offset))(poses)

    def splat_impl(impl):
        def one(sid, r, t):
            rv = (scenes.box_hi[sid] - scenes.box_lo[sid]) / scenes.grid_res
            return splat.splat_depth(
                scenes.surf_pts[sid], scenes.surf_mask[sid], env.intrinsics,
                r, t, cam, cam, env.cfg.camera.depth_max, jnp.mean(rv),
                env.cfg.renderer.footprint, impl)
        return jax.jit(jax.vmap(one))

    f_mxu, f_pal = splat_impl("mxu"), splat_impl("pallas")

    # ---- correctness ---------------------------------------------------
    zb_m, fg_m, vis_m = jax.block_until_ready(
        f_mxu(state.scene_id, r_c2w, t_c2w))
    zb_p, fg_p, vis_p = jax.block_until_ready(
        f_pal(state.scene_id, r_c2w, t_c2w))
    zb_m, zb_p = np.array(zb_m), np.array(zb_p)
    vis_m, vis_p = np.array(vis_m), np.array(vis_p)
    zdiff = np.abs(zb_m - zb_p)
    vdiff = vis_m != vis_p
    print(f"zbuf  max|diff| = {zdiff.max():.6f}  "
          f"mean = {zdiff.mean():.8f}  frac>1e-3 = {(zdiff > 1e-3).mean():.2e}")
    print(f"vis   disagree  = {vdiff.sum()} / {vdiff.size} "
          f"({vdiff.mean():.2e})  counts mxu={vis_m.sum()} pallas={vis_p.sum()}")
    print(f"fg    disagree  = {(np.array(fg_m) != np.array(fg_p)).sum()}")

    # ---- op timing ------------------------------------------------------
    t_m = bench(f"splat mxu    ({cam}x{cam})", f_mxu, state.scene_id, r_c2w, t_c2w)
    t_p = bench(f"splat pallas ({cam}x{cam})", f_pal, state.scene_id, r_c2w, t_c2w)
    print(f"op speedup: {t_m / t_p:.2f}x", flush=True)

    # ---- full env.step under each impl ----------------------------------
    # carry the state through iterations: true data dependence, so the
    # tunnel's pipelined dispatch cannot overlap steps
    results = {}
    for impl in ("mxu", "pallas"):
        e = ReconEnv(env_cfg(impl), scenes)
        s = e.init_state(num_envs)
        s, _ = jax.block_until_ready(e.step(s, actions))
        iters = 10
        t0 = time.perf_counter()
        for _ in range(iters):
            s, out = e.step(s, actions)
        jax.block_until_ready(out.obs)
        results[impl] = (time.perf_counter() - t0) / iters * 1e3
        print(f"{'FULL env.step [' + impl + ']':44s} "
              f"{results[impl]:8.2f} ms", flush=True)
    sp = results["mxu"] / results["pallas"]
    print(f"env.step speedup: {sp:.2f}x "
          f"({results['mxu']:.1f} -> {results['pallas']:.1f} ms; "
          f"{num_envs / results['pallas'] * 1e3:,.0f} env-steps/s "
          f"env-side at {cam}x{cam})", flush=True)


if __name__ == "__main__":
    main()
