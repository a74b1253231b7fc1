"""Microbenchmarks for the env-step hot ops: XLA scatter/gather vs
MXU one-hot-matmul reformulations vs a Pallas VMEM z-buffer kernel.

Findings drive which implementation ops/ uses (renderer.impl).

Usage: python tools/bench_scatter.py [num_envs] [Q] [cam]
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


def bench(name, fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:44s} {dt:8.2f} ms", flush=True)
    return out


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    q = int(sys.argv[2]) if len(sys.argv) > 2 else 11264
    cam = int(sys.argv[3]) if len(sys.argv) > 3 else 128
    g = 20
    hw = cam * cam
    rng = np.random.RandomState(0)

    vi = jnp.asarray(rng.randint(0, cam, (n, q)), jnp.int32)
    ui = jnp.asarray(rng.randint(0, cam, (n, q)), jnp.int32)
    z = jnp.asarray(rng.uniform(1.0, 30.0, (n, q)), jnp.float32)
    ok = jnp.asarray(rng.rand(n, q) < 0.7)
    print(f"n={n} Q={q} cam={cam}", flush=True)

    # ---------------- zbuf scatter-min (the splat hot op) ----------------
    DMAX = 50.0

    @jax.jit
    def zbuf_scatter(vi, ui, z, ok):
        flat = vi * cam + ui
        init = jnp.full((n, hw), DMAX, jnp.float32)
        zz = jnp.where(ok, z, DMAX)
        def one(buf, f, v):
            return buf.at[f].min(v)
        return jax.vmap(one)(init, flat, zz)

    ref = bench("zbuf: XLA scatter-min", zbuf_scatter, vi, ui, z, ok)

    # count-matmul: D depth levels folded into the U axis of one matmul
    D = 64

    @jax.jit
    def zbuf_matmul(vi, ui, z, ok):
        def one(vi, ui, z, ok):
            zmin = jnp.min(jnp.where(ok, z, jnp.inf))
            zmax = jnp.max(jnp.where(ok, z, -jnp.inf))
            rng_ = jnp.maximum(zmax - zmin, 1e-3)
            d = jnp.clip(((z - zmin) / rng_ * D).astype(jnp.int32), 0, D - 1)
            ud = ui * D + d
            ohv = (vi[None, :] == jnp.arange(cam)[:, None]) & ok[None, :]
            ohud = ud[:, None] == jnp.arange(cam * D)[None, :]
            counts = jnp.dot(ohv.astype(jnp.bfloat16),
                             ohud.astype(jnp.bfloat16),
                             preferred_element_type=jnp.float32)
            counts = counts.reshape(cam, cam, D)
            have = counts > 0.5
            first = jnp.argmax(have, axis=-1)
            any_ = jnp.any(have, axis=-1)
            zq = zmin + (first.astype(jnp.float32) + 0.5) * (rng_ / D)
            return jnp.where(any_, zq, DMAX).reshape(-1)
        return jax.lax.map(lambda a: one(*a), (vi, ui, z, ok), batch_size=8)

    out = bench("zbuf: count-matmul (64 levels)", zbuf_matmul, vi, ui, z, ok)

    # pallas per-env scalar scatter-min
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def zbuf_kernel(flat_ref, z_ref, out_ref):
        out_ref[:] = jnp.full((cam, cam), DMAX, jnp.float32)
        def body(i, _):
            f = flat_ref[0, i]
            v = f // cam
            u = f % cam
            old = out_ref[v, u]
            out_ref[v, u] = jnp.minimum(old, z_ref[0, i])
            return 0
        jax.lax.fori_loop(0, q, body, 0)

    @jax.jit
    def zbuf_pallas(vi, ui, z, ok):
        flat = vi * cam + ui
        zz = jnp.where(ok, z, DMAX)
        return pl.pallas_call(
            zbuf_kernel,
            out_shape=jax.ShapeDtypeStruct((n, cam, cam), jnp.float32),
            grid=(n,),
            in_specs=[
                pl.BlockSpec((1, q), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, q), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, cam, cam), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
        )(flat, zz)

    try:
        outp = bench("zbuf: pallas scalar RMW", zbuf_pallas, vi, ui, z, ok)
        err = float(jnp.abs(outp.reshape(n, -1) - ref).max())
        print(f"  pallas exactness vs scatter: max|diff|={err:.2e}")
    except Exception as e:
        print(f"  pallas kernel failed: {type(e).__name__}: {str(e)[:200]}")

    # accuracy of count-matmul vs exact
    errs = jnp.abs(out - ref)
    print(f"  count-matmul err: mean={float(errs.mean()):.3f} "
          f"p99={float(jnp.percentile(errs, 99)):.3f}")

    # ---------------- hits scatter (G^3) ----------------
    cell = jnp.asarray(rng.randint(0, g, (n, q, 3)), jnp.int32)

    @jax.jit
    def hits_scatter(cell, ok):
        flat = (cell[..., 0] * g + cell[..., 1]) * g + cell[..., 2]
        def one(f, v):
            buf = jnp.zeros((g ** 3,), jnp.float32)
            return buf.at[f].max(v.astype(jnp.float32))
        return jax.vmap(one)(flat, ok)

    ref_h = bench("hits: XLA scatter-max", hits_scatter, cell, ok)

    @jax.jit
    def hits_matmul(cell, ok):
        def one(cell, ok):
            yz = cell[:, 1] * g + cell[:, 2]
            ohx = (cell[:, 0][None, :] == jnp.arange(g)[:, None]) & ok[None, :]
            ohyz = yz[:, None] == jnp.arange(g * g)[None, :]
            m = jnp.dot(ohx.astype(jnp.bfloat16), ohyz.astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32)
            return (m > 0.5).astype(jnp.float32).reshape(-1)
        return jax.lax.map(lambda a: one(*a), (cell, ok), batch_size=32)

    out_h = bench("hits: one-hot matmul", hits_matmul, cell, ok)
    print(f"  hits exactness: {bool(jnp.array_equal(out_h, ref_h))}")

    # ---------------- carve depth gather ----------------
    g3 = g ** 3
    depth = jnp.asarray(rng.uniform(1, 50, (n, cam, cam)), jnp.float32)
    gvi = jnp.asarray(rng.randint(0, cam, (n, g3)), jnp.int32)
    gui = jnp.asarray(rng.randint(0, cam, (n, g3)), jnp.int32)

    @jax.jit
    def carve_gather(depth, gvi, gui):
        def one(d, v, u):
            return d[v, u]
        return jax.vmap(one)(depth, gvi, gui)

    ref_c = bench("carve: XLA gather", carve_gather, depth, gvi, gui)

    @jax.jit
    def carve_matmul(depth, gvi, gui):
        def one(d, v, u):
            ohv = (v[:, None] == jnp.arange(cam)[None, :])
            tmp = jnp.dot(ohv.astype(jnp.bfloat16), d.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)   # [g3, cam]
            ohu = u[:, None] == jnp.arange(cam)[None, :]
            return (tmp * ohu).sum(-1)
        return jax.lax.map(lambda a: one(*a), (depth, gvi, gui), batch_size=32)

    out_c = bench("carve: one-hot matmul gather", carve_matmul, depth, gvi, gui)
    err = float(jnp.abs(out_c - ref_c).max())
    print(f"  carve err (bf16 depth): max={err:.4f}")

    # ---------------- per-point zbuf gather (splat visibility) ----------------
    zbuf = jnp.asarray(rng.uniform(1, 50, (n, hw)), jnp.float32)
    flat_q = jnp.asarray(rng.randint(0, hw, (n, q)), jnp.int32)

    @jax.jit
    def vis_gather(zbuf, flat):
        return jax.vmap(lambda b, f: b[f])(zbuf, flat)

    bench("vis: XLA gather zbuf[flat_q]", vis_gather, zbuf, flat_q)

    @jax.jit
    def vis_take(zbuf, flat):
        off = jnp.arange(n)[:, None] * hw
        return jnp.take(zbuf.reshape(-1), (flat + off).reshape(-1)).reshape(n, q)

    bench("vis: flat take", vis_take, zbuf, flat_q)


if __name__ == "__main__":
    main()
