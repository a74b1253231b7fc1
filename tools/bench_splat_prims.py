"""Microbench of candidate primitives for the 400x400 splat redesign.

Serial-chain timing (each iteration's input depends on the previous output)
per the axon-tunnel gotcha in .claude/skills/verify/SKILL.md — free-running
loops under-read through the tunnel.

Candidates measured at the training shape (256 envs, Q=11264, 400x400):
  A. batched lax.sort by (pixel_key, z) w/ payload        -> sort-based zbuf
  B. XLA scatter-min .at[flat].min per env (vmapped)      -> current "scatter"
  C. bf16 one-hot matmul [V,Q]@[Q,U] (the current unit)   -> cost reference
  D. int8 one-hot matmul (same shape, int32 accum)        -> 2x MXU?
  E. segment-min via sorted scan (assoc. scan)            -> sort postprocess
  F. scatter-add of head z into dense image (per env)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

N, Q, H, W = 256, 11264, 400, 400
ITERS = 10


def chain(name, make_fn, init_carry, iters=ITERS):
    """Time fn: carry -> carry with data dependence between iterations."""
    fn = jax.jit(make_fn)
    carry = fn(init_carry)
    jax.block_until_ready(carry)
    carry = fn(carry)
    jax.block_until_ready(carry)
    t0 = time.perf_counter()
    for _ in range(iters):
        carry = fn(carry)
    jax.block_until_ready(carry)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:55s} {dt:9.2f} ms", flush=True)
    return dt


def main():
    rng = np.random.RandomState(0)
    vi = jnp.asarray(rng.randint(0, H, (N, Q)), jnp.int32)
    ui = jnp.asarray(rng.randint(0, W, (N, Q)), jnp.int32)
    z = jnp.asarray(rng.uniform(1.0, 20.0, (N, Q)), jnp.float32)
    print(f"N={N} Q={Q} img={H}x{W}", flush=True)

    # A. batched two-key sort (pixel, z) + payload index
    pix = vi * W + ui

    def sort_step(c):
        zz = z + c * 1e-6
        idx = jnp.broadcast_to(jnp.arange(Q, dtype=jnp.int32)[None], (N, Q))
        sp, sz, si = jax.lax.sort((pix, zz, idx), dimension=1, num_keys=2)
        return c + 1 + sz[:, 0].sum() * 1e-12

    chain("A  lax.sort [256,11264] 2 keys + payload", sort_step, jnp.float32(0))

    # A2. single fused key sort (pixel*2^13 | zq13) + payload
    def sort1_step(c):
        zq = jnp.clip(((z + c * 1e-6) * 409.0), 0, 8191).astype(jnp.int32)
        key = pix * 8192 + zq
        idx = jnp.broadcast_to(jnp.arange(Q, dtype=jnp.int32)[None], (N, Q))
        sk, si = jax.lax.sort((key, idx), dimension=1, num_keys=1)
        return c + 1 + sk[:, 0].astype(jnp.float32).sum() * 1e-12

    chain("A2 lax.sort single int32 key + payload", sort1_step, jnp.float32(0))

    # B. XLA scatter-min into dense image, vmapped over envs
    def scat_step(c):
        def one(vi_e, ui_e, z_e):
            flat = vi_e * W + ui_e
            img = jnp.full((H * W,), 50.0, jnp.float32)
            return img.at[flat].min(z_e + c * 1e-6)
        img = jax.vmap(one)(vi, ui, z)
        return c + 1 + img[:, 0].sum() * 1e-12

    chain("B  XLA scatter-min dense [400x400] vmapped", scat_step, jnp.float32(0))

    # C. bf16 one-hot matmul [V,Q]@[Q,U] (one radix pass), vmapped
    def mm_step(c):
        def one(vi_e, ui_e, z_e):
            ohv = (vi_e[:, None] == jnp.arange(H, dtype=jnp.int32)[None]).astype(jnp.bfloat16)
            ohu = (ui_e[:, None] == jnp.arange(W, dtype=jnp.int32)[None]).astype(jnp.bfloat16)
            w_ = jnp.exp2(-jnp.floor(jnp.clip((z_e + c * 1e-6) / 2, 0, 9)) * 12)
            m = jnp.dot(ohv.T * w_.astype(jnp.bfloat16)[None, :], ohu,
                        preferred_element_type=jnp.float32)
            return m
        m = jax.vmap(one)(vi, ui, z)
        return c + 1 + m[:, 0, 0].sum() * 1e-12

    chain("C  bf16 onehot matmul [400,11264]@[11264,400]", mm_step, jnp.float32(0))

    # D. int8 one-hot matmul, int32 accumulation
    def mm8_step(c):
        ci = c.astype(jnp.int32)
        def one(vi_e, ui_e):
            ohv = (vi_e[:, None] == (jnp.arange(H, dtype=jnp.int32)[None] + ci * 0)).astype(jnp.int8)
            ohu = (ui_e[:, None] == jnp.arange(W, dtype=jnp.int32)[None]).astype(jnp.int8)
            m = jax.lax.dot_general(ohv.T, ohu, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.int32)
            return m
        m = jax.vmap(one)(vi, ui)
        return c + 1 + m[:, 0, 0].sum().astype(jnp.float32) * 1e-12

    chain("D  int8 onehot matmul same shape (int32 acc)", mm8_step, jnp.float32(0))

    # D2. int8 gather shape: [Q,V]@[V,U] int8 image
    img8 = jnp.asarray(rng.randint(0, 100, (N, H, W)), jnp.int8)

    def g8_step(c):
        ci = c.astype(jnp.int32)
        def one(vi_e, img_e):
            ohv = (vi_e[:, None] == (jnp.arange(H, dtype=jnp.int32)[None] + ci * 0)).astype(jnp.int8)
            t = jax.lax.dot_general(ohv, img_e, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.int32)
            return t
        t = jax.vmap(one)(vi, img8)
        return c + 1 + t[:, 0, 0].sum().astype(jnp.float32) * 1e-12

    chain("D2 int8 gather matmul [11264,400]@[400,400]", g8_step, jnp.float32(0))

    # E. associative-scan segment-min over sorted order (postprocess cost)
    def seg_step2(c):
        zz = z + c * 1e-6
        sp, sz = jax.lax.sort((pix, zz), dimension=1, num_keys=2)
        start = jnp.concatenate(
            [jnp.ones((N, 1), bool), sp[:, 1:] != sp[:, :-1]], axis=1)

        def comb(a, b):
            (za, fa), (zb, fb) = a, b
            return (jnp.where(fb, zb, jnp.minimum(za, zb)), fa | fb)
        segmin, _ = jax.lax.associative_scan(comb, (sz, start), axis=1)
        return c + 1 + segmin[:, 0].sum() * 1e-12

    chain("E  sort + seg-head propagate (assoc scan)", seg_step2, jnp.float32(0))

    # F. scatter of <=Q head values into dense image (unique indices)
    def headscat_step(c):
        def one(pix_e, z_e):
            img = jnp.full((H * W,), 50.0, jnp.float32)
            return img.at[pix_e].set(z_e + c * 1e-6, mode="drop",
                                     unique_indices=False)
        img = jax.vmap(one)(pix, z)
        return c + 1 + img[:, 0].sum() * 1e-12

    chain("F  XLA scatter-set dense (non-combining)", headscat_step, jnp.float32(0))


if __name__ == "__main__":
    main()
