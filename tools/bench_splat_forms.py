"""A/B the mxu splat's one-hot strategy at the 400x400 sensor.

The shipped path (ops/mxu.py::scatter_min_image + gather_image_oh) builds
the [Q, V]/[Q, U] bf16 pixel one-hots ONCE per env (pixel_onehots) and
shares them across the 4 GEMMs (radix pass A, pass B, the m1 gather, the
visibility gather).  Under vmap at 400^2 that materializes ~4.6 GB of
one-hot operands to HBM and re-streams them per GEMM — the splat is
bandwidth-bound, not MXU-bound (tools/bench_ragged.py: the identical
inline-one-hot einsum runs 1.57 ms where the shipped splat spends ~34 ms).

This tool times the full zbuf+visibility sequence with one-hots REBUILT
INLINE at every consumer (XLA fuses the broadcast-compare into the dot
operand; compute is duplicated, HBM traffic collapses to the index
vectors), validates bit-exactness against the shipped path (the radix
encoding sums exact powers of two — order-independent in f32), and prints
both timings.

Usage: python tools/bench_splat_forms.py [num_envs] [cam] [iters]
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
import numpy as np

from gennbv_tpu.ops.mxu import exact_exp2_neg, exact_min_digit

LEVELS = 10
SPACING = 12


def zbuf_vis_inline(vi, ui, z, valid, height, width, z_default, voxel_eps,
                    footprint):
    """Per-env fused-form z-buffer + visibility, numerics identical to
    ops/splat.py's mxu path (same digit formulas, same bf16 products, same
    pool).  One-hots are rebuilt at each consumer instead of shared."""
    f32 = jnp.float32
    iv = jnp.arange(height, dtype=jnp.int32)
    iu = jnp.arange(width, dtype=jnp.int32)
    vf = valid.astype(f32)

    zmin = jnp.min(jnp.where(valid, z, jnp.inf))
    zmax = jnp.max(jnp.where(valid, z, -jnp.inf))
    zrange = jnp.maximum(zmax - zmin, 1e-3)
    t = jnp.clip((z - zmin) / zrange * LEVELS, 0.0, LEVELS - 1e-3)
    d1 = jnp.floor(t)
    d2 = jnp.floor((t - d1) * LEVELS)

    def enc_min(d_digit, mask):
        w = exact_exp2_neg(d_digit, SPACING) * mask          # [Q] f32
        a = jnp.where(vi[:, None] == iv[None, :],
                      w[:, None], 0.0).astype(jnp.bfloat16)  # [Q, V] inline
        c = (ui[:, None] == iu[None, :]).astype(jnp.bfloat16)
        m = jax.lax.dot_general(a, c, (((0,), (0,)), ((), ())),
                                preferred_element_type=f32)  # [V, U]
        have = m > 0.0
        digit = exact_min_digit(m, SPACING, LEVELS)
        return jnp.where(have, jnp.clip(digit, 0, LEVELS - 1),
                         jnp.float32(LEVELS)), have

    def gather(img_bf16):
        a = (vi[:, None] == iv[None, :]).astype(jnp.bfloat16)
        tmp = jnp.dot(a, img_bf16, preferred_element_type=f32)   # [Q, U]
        ohu = ui[:, None] == iu[None, :]
        return jnp.where(ohu, tmp, 0.0).sum(-1)

    m1, have1 = enc_min(d1, vf)
    m1_at_q = gather(m1.astype(jnp.bfloat16))
    in_min = vf * (jnp.abs(d1 - m1_at_q) < 0.5)
    m2, have2 = enc_min(d2, in_min)
    sub = jnp.where(have2, m2 + 0.5, 0.5 * LEVELS)
    frac = (m1 + sub / LEVELS) / LEVELS
    zq = zmin + frac * zrange
    zbuf0 = jnp.where(have1, zq, jnp.float32(z_default))
    quant = zrange / (LEVELS * LEVELS)

    big = jnp.asarray(z_default, f32)
    if footprint > 0:
        k2 = 2 * footprint + 1
        z2d = jax.lax.reduce_window(zbuf0, big, jax.lax.min,
                                    (k2, 1), (1, 1), "SAME")
        z2d = jax.lax.reduce_window(z2d, big, jax.lax.min,
                                    (1, k2), (1, 1), "SAME")
    else:
        z2d = zbuf0
    z_at_px = gather(z2d.astype(jnp.bfloat16))
    visible = valid & (z <= z_at_px + voxel_eps + quant)
    return z2d.reshape(-1), visible


def main():
    num_envs = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    cam = int(sys.argv[2]) if len(sys.argv) > 2 else 400
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 20

    from gennbv_tpu.config import (CameraConfig, EnvConfig, RendererConfig,
                                   SceneConfig)
    from gennbv_tpu.env import ReconEnv, make_scenes
    from gennbv_tpu.ops import camera, splat

    cfg = EnvConfig(num_envs=num_envs,
                    camera=CameraConfig(height=cam, width=cam),
                    renderer=RendererConfig(resolution=64),
                    scene=SceneConfig(num_scenes=num_envs, seed=0))
    scenes = make_scenes(cfg.scene, cfg.renderer.resolution)
    env = ReconEnv(cfg, scenes)
    q = scenes.surf_pts.shape[1]
    print(f"platform={jax.default_backend()} envs={num_envs} cam={cam} Q={q}",
          flush=True)

    state = env.init_state(num_envs)
    actions = jnp.broadcast_to(env.init_action, (num_envs, 6))
    poses = actions.astype(jnp.float32) * env.action_unit + env.pose_low
    r_c2w, t_c2w = jax.vmap(
        lambda p: camera.pose_to_c2w(p, cfg.camera.z_offset))(poses)

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

    @jax.jit
    def inline_impl(sids, rs, ts):
        def one(sid, r, t):
            vic, uic, z, ok, veps = project(sid, r, t)
            return zbuf_vis_inline(vic, uic, z, ok, cam, cam,
                                   cfg.camera.depth_max, veps,
                                   cfg.renderer.footprint)
        return jax.vmap(one)(sids, rs, ts)

    @jax.jit
    def shipped_impl(sids, rs, ts):
        def one(sid, r, t):
            rv = (scenes.box_hi[sid] - scenes.box_lo[sid]) / scenes.grid_res
            return splat.splat_depth(
                scenes.surf_pts[sid], scenes.surf_mask[sid], env.intrinsics,
                r, t, cam, cam, cfg.camera.depth_max, jnp.mean(rv),
                cfg.renderer.footprint, "mxu")
        return jax.vmap(one)(sids, rs, ts)

    zb_s, fg_s, vis_s = jax.block_until_ready(
        shipped_impl(state.scene_id, r_c2w, t_c2w))
    zb_i, vis_i = jax.block_until_ready(
        inline_impl(state.scene_id, r_c2w, t_c2w))
    zd = np.abs(np.array(zb_s) - np.array(zb_i))
    vd = np.array(vis_s) != np.array(vis_i)
    print(f"zbuf max|diff| = {zd.max():.8f}   vis disagree = {vd.sum()}"
          f" / {vd.size}", flush=True)

    def bench(name, fn, chain_arg):
        """serial-chained timing (BENCHMARKS.md method notes)"""
        args = [state.scene_id, r_c2w, t_c2w]
        out = jax.block_until_ready(fn(*args))
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
            s = jax.tree_util.tree_leaves(out)[0].reshape(-1)[0]
            args[chain_arg] = args[chain_arg] + s.astype(jnp.float32) * 1e-30
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / iters * 1e3
        print(f"{name:44s} {dt:8.2f} ms", flush=True)
        return dt

    t_s = bench(f"splat shipped shared-onehots ({cam}x{cam})", shipped_impl, 2)
    t_i = bench(f"splat inline-onehots         ({cam}x{cam})", inline_impl, 2)
    print(f"speedup: {t_s / t_i:.2f}x", flush=True)


if __name__ == "__main__":
    main()
