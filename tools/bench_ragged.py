"""Microbenchmarks for the compacted-splat design (VERDICT r1 item 2).

Times, at training scale (N=256 envs x Q=11264 surf slots, ~10% mean
valid):
  1. global valid-first compaction primitives (permutation scatter vs
     argsort vs multi-operand sort)
  2. ragged_dot (mode 1: per-point gather from per-env images) and
     ragged_dot_general (mode 2: per-env one-hot outer-product GEMMs)
     vs the dense vmapped GEMM equivalents.

Usage: python tools/bench_ragged.py
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

N, Q, V, U = 256, 11264, 400, 400
PCAP = 512 * 1024          # global compacted capacity (~17% of N*Q)


def bench(name, fn, *args, iters=10, chain=0):
    """Serial-chained timing: each iteration's scalarized output is folded
    into the float operand at position `chain`, so pipelined dispatch on the
    axon tunnel cannot overlap iterations (see BENCHMARKS.md method notes).
    """
    args = list(args)
    out = jax.block_until_ready(fn(*args))
    leaves = jax.tree_util.tree_leaves(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        s = jax.tree_util.tree_leaves(out)[-1].reshape(-1)[0].astype(jnp.float32)
        args[chain] = args[chain] + s * 1e-38
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:52s} {dt:8.2f} ms", flush=True)
    return dt


def main():
    rng = np.random.default_rng(0)
    # ok pattern: most envs ~8% valid, a few ~90% (fresh-reset top-down)
    frac = np.where(rng.random(N) < 0.04, 0.9, 0.08)
    ok_np = rng.random((N, Q)) < frac[:, None]
    print(f"total valid = {ok_np.sum()} / {N*Q} ({ok_np.mean():.3f}) "
          f"cap={PCAP}", flush=True)
    ok = jnp.asarray(ok_np)
    vi = jnp.asarray(rng.integers(0, V, (N, Q)), jnp.int32)
    ui = jnp.asarray(rng.integers(0, U, (N, Q)), jnp.int32)
    z = jnp.asarray(rng.random((N, Q)), jnp.float32)

    # ---- compaction primitives -------------------------------------
    @jax.jit
    def compact_scatter(z, ok, vi, ui):
        okf = ok.reshape(-1)
        oki = okf.astype(jnp.int32)
        nval = jnp.sum(oki)
        pos = jnp.where(okf, jnp.cumsum(oki) - 1,
                        nval + jnp.cumsum(1 - oki) - 1)
        payload = (vi.reshape(-1) << 16) | ui.reshape(-1)
        pay_c = jnp.zeros((N * Q,), jnp.int32).at[pos].set(payload)
        z_c = jnp.zeros((N * Q,), jnp.float32).at[pos].set(z.reshape(-1))
        gs = jnp.sum(ok, axis=1)
        return pay_c[:PCAP], z_c[:PCAP], gs

    @jax.jit
    def compact_argsort(z, ok, vi, ui):
        okf = ok.reshape(-1)
        idx = jnp.argsort(jnp.where(okf, 0, 1), stable=True)
        payload = (vi.reshape(-1) << 16) | ui.reshape(-1)
        return payload[idx[:PCAP]], z.reshape(-1)[idx[:PCAP]], jnp.sum(ok, 1)

    @jax.jit
    def compact_sort(z, ok, vi, ui):
        okf = ok.reshape(-1)
        key = jnp.where(okf, 0, 1).astype(jnp.int32)
        payload = (vi.reshape(-1) << 16) | ui.reshape(-1)
        _, pay_c, z_c = jax.lax.sort(
            (key, payload, z.reshape(-1)), num_keys=1, is_stable=True)
        return pay_c[:PCAP], z_c[:PCAP], jnp.sum(ok, 1)

    bench("compaction: global permutation scatter", compact_scatter, z, ok, vi, ui)
    bench("compaction: global argsort + gather", compact_argsort, z, ok, vi, ui)
    bench("compaction: lax.sort 3-operand", compact_sort, z, ok, vi, ui)

    # compacted fixture for the ragged benches
    pay_c, z_c, gs = jax.block_until_ready(compact_scatter(z, ok, vi, ui))
    vi_c = (pay_c >> 16).astype(jnp.int32)
    ui_c = (pay_c & 0xFFFF).astype(jnp.int32)
    gs = gs.astype(jnp.int32)

    # ---- mode 2: per-env one-hot outer products --------------------
    from jax.lax import ragged_dot_general, RaggedDotDimensionNumbers

    def onehots(vi_c, ui_c, z_c):
        A = (vi_c[:, None] == jnp.arange(V, dtype=jnp.int32)[None, :]
             ).astype(jnp.bfloat16)
        C = ((ui_c[:, None] == jnp.arange(U, dtype=jnp.int32)[None, :])
             .astype(jnp.bfloat16) * z_c.astype(jnp.bfloat16)[:, None])
        return A, C

    dn2 = RaggedDotDimensionNumbers(
        dot_dimension_numbers=(((0,), (0,)), ((), ())),  # contract p
        lhs_ragged_dimensions=[0],
        rhs_group_dimensions=[],
    )

    @jax.jit
    def mode2(z_c, vi_c, ui_c, gs):
        A, C = onehots(vi_c, ui_c, z_c)
        return ragged_dot_general(
            A, C, gs, dn2, preferred_element_type=jnp.float32)

    try:
        out2 = bench("ragged mode2 [P,V]x[P,U] -> [N,V,U]", mode2,
                     z_c, vi_c, ui_c, gs)
        flops = 2.0 * PCAP * V * U
        print(f"    effective {flops / (out2 * 1e-3) / 1e12:.1f} TFLOP/s "
              f"(vs dense-equivalent work {2.0*N*Q*V*U/1e12:.2f} TFLOP)")
    except Exception as e:
        print("ragged mode2 FAILED:", type(e).__name__, str(e)[:300])

    # ---- mode 1: per-point gather from per-env images --------------
    img = jnp.asarray(rng.random((N, V, U)), jnp.float32).astype(jnp.bfloat16)

    @jax.jit
    def mode1(img, vi_c, ui_c, gs):
        img = img.astype(jnp.bfloat16)
        A = (vi_c[:, None] == jnp.arange(V, dtype=jnp.int32)[None, :]
             ).astype(jnp.bfloat16)
        tmp = jax.lax.ragged_dot(A, img, gs,
                                 preferred_element_type=jnp.float32)  # [P, U]
        ohu = ui_c[:, None] == jnp.arange(U, dtype=jnp.int32)[None, :]
        return jnp.where(ohu, tmp, 0.0).sum(-1)

    try:
        out1 = bench("ragged mode1 gather [P,V]x[N,V,U] -> [P]", mode1,
                     img.astype(jnp.float32), vi_c, ui_c, gs)
    except Exception as e:
        print("ragged mode1 FAILED:", type(e).__name__, str(e)[:300])

    # ---- dense reference: vmapped one-hot GEMM at full Q -----------
    vi_d = vi[:, :, None]

    @jax.jit
    def dense2(z, vi, ui, ok):
        A = (vi[:, :, None] == jnp.arange(V, dtype=jnp.int32)[None, None, :]
             ).astype(jnp.bfloat16)
        C = ((ui[:, :, None] == jnp.arange(U, dtype=jnp.int32)[None, None, :])
             .astype(jnp.bfloat16)
             * (z * ok).astype(jnp.bfloat16)[:, :, None])
        return jnp.einsum("nqv,nqu->nvu", A, C,
                          preferred_element_type=jnp.float32)

    outd = bench("dense vmapped [N,Q,V]x[N,Q,U] -> [N,V,U]", dense2,
                 z, vi, ui, ok)


if __name__ == "__main__":
    main()
