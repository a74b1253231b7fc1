"""Serial-chained timing of the row-banded splat vs dense, on synthetic
points with a training-like vertical skew (most points in the middle
rows).  Answers whether the per-band GEMMs' small output-row dim (H/B)
keeps MXU efficiency — the nominal FLOP cut is Q/cap, but an M-dim pad to
128 would eat it.

Usage: python tools/bench_banded.py [num_envs] [cam] [q]
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

from gennbv_tpu.ops import camera, splat


def serial_bench(name, fn, args, iters=10):
    """Feed a data-dependence through each iteration (axon tunnel
    pipelining under-reads independent dispatches; see verify skill)."""
    dep = jnp.zeros((), jnp.float32)
    out = jax.block_until_ready(fn(*args, dep))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args, dep)
        dep = out[0].ravel()[0]
    jax.block_until_ready(dep)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:44s} {dt:8.2f} ms", flush=True)
    return dt


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    cam = int(sys.argv[2]) if len(sys.argv) > 2 else 400
    q = int(sys.argv[3]) if len(sys.argv) > 3 else 11264

    rng = np.random.default_rng(0)
    k = jnp.asarray(camera.intrinsics(cam, cam, 90.0))
    # camera 6 m up looking down; points in a box so ~90% project in-image
    # with a centered vertical footprint (the skewed case the probe showed)
    poses = np.c_[rng.uniform(-1, 1, (n, 2)), rng.uniform(5, 7, n),
                  np.zeros(n), np.full(n, np.pi / 2 - 0.2),
                  rng.uniform(-np.pi, np.pi, n)].astype(np.float32)
    r, t = jax.vmap(camera.pose_to_c2w)(jnp.asarray(poses))
    pts = np.c_[rng.uniform(-3, 3, (n * q, 2)),
                rng.uniform(0, 2.5, n * q)].reshape(n, q, 3).astype(np.float32)
    sp = jnp.asarray(pts)
    sm = jnp.ones((n, q), bool)
    veps = jnp.full((n,), 0.15, jnp.float32)

    def run(bands, cap):
        def f(sp_, dep):
            z, fg, vis = splat.splat_depth_batch(
                sp_ + dep * 0.0, sm, k, r, t, cam, cam, 50.0, veps, 1,
                "mxu", None, band_split=bands, band_cap=cap)
            return z, vis
        return jax.jit(f)

    # report occupancy so we know which branch actually timed
    vic, uic, z, ok = jax.vmap(
        lambda p, m, rr, tt: splat.project_px(p, m, k, rr, tt, cam, cam)
    )(sp, sm, r, t)
    ok_n = np.asarray(jnp.sum(ok, axis=1))
    print(f"envs={n} cam={cam} Q={q}  valid/Q mean={ok_n.mean()/q:.3f}")
    for bands in (8, 16):
        rpb = cam // bands
        band = jnp.where(ok, vic // rpb, bands)
        cnt = jnp.max(jnp.sum(
            band[:, None, :] == jnp.arange(bands)[None, :, None], axis=2))
        print(f"B={bands}: max band count/Q = {float(cnt)/q:.3f}")

    serial_bench("dense mxu splat", run(None, None), (sp,))
    for bands, frac in ((8, 0.5), (16, 0.3125), (16, 0.25)):
        cap = int(-(-frac * q // 128) * 128)
        serial_bench(f"banded B={bands} cap={frac}Q ({cap})",
                     run(bands, cap), (sp,))


if __name__ == "__main__":
    main()
