"""Serial-chained live decomposition of the rollout at training scale.

The op-level timers (tools/profile_ops.py) read ~2x high on the axon
tunnel and measure ops outside their fusion context; this probe instead
times full 128-step lax.scan programs whose carry threads the data
dependency, so every number is an honest on-device wall time:

  A. scan(env.step) with constant actions        -> env cost alone
  B. scan(policy -> sample -> env.step)          -> + policy/sample
  C. rollout.collect (B + [T,N,obs] stacking)    -> + batch emission
  D. C with obs_dtype=bfloat16                   -> stacking dtype lever

Per-step deltas locate the live rollout milliseconds.  Run on the real
TPU: python tools/probe_rollout_split.py [num_envs] [cam]
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
    print(f"{name:44s} {dt*1e3:9.1f} ms  ({dt/T*1e3:6.3f} ms/step)",
          flush=True)
    return dt


def main():
    num_envs = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    cam = int(sys.argv[2]) if len(sys.argv) > 2 else 128

    from gennbv_tpu.algo import rollout
    from gennbv_tpu.config import Config, apply_overrides
    from gennbv_tpu.algo.runner import Runner
    from gennbv_tpu.env import make_scenes
    from gennbv_tpu.models import distributions

    cfg = apply_overrides(Config(), (
        f"env.num_envs={num_envs}",
        f"env.camera.height={cam}", f"env.camera.width={cam}",
        f"env.scene.num_scenes={num_envs}",
        "runner.save_freq=0",
    ))
    scenes = make_scenes(cfg.env.scene, cfg.env.renderer.resolution)
    r = Runner(cfg, scenes=scenes)
    env_state, obs = r.setup()
    env = r.env
    model = r.model
    variables = {"params": r.train_state.params,
                 "batch_stats": r.train_state.batch_stats}
    env_step = rollout.unjitted_step(env)
    acts0 = jnp.zeros((num_envs, 6), jnp.int32)

    @jax.jit
    def scan_env_only(env_state):
        def body(carry, _):
            carry, out = env_step(carry, acts0)
            return carry, out.reward.sum()
        return jax.lax.scan(body, env_state, None, length=T)

    @jax.jit
    def scan_env_policy(env_state, obs, rng):
        def body(carry, rng_t):
            env_state, obs = carry
            out = model.apply(variables, obs, train=False)
            actions = distributions.sample(out.logits, rng_t)
            env_state, step_out = env_step(env_state, actions)
            return (env_state, step_out.obs), step_out.reward.sum()
        return jax.lax.scan(body, (env_state, obs), jax.random.split(rng, T))

    def collect(env_state, obs, rng, dt):
        return rollout.collect(env, model, variables, env_state, obs, rng,
                               T, cfg.ppo.gamma, dt)

    collect_f32 = jax.jit(lambda s, o, r_: collect(s, o, r_, jnp.float32))
    collect_bf16 = jax.jit(lambda s, o, r_: collect(s, o, r_, jnp.bfloat16))

    rng = jax.random.PRNGKey(0)
    a = timeit("A scan(env.step only)", scan_env_only, env_state)
    b = timeit("B scan(policy+sample+env.step)", scan_env_policy,
               env_state, obs, rng)
    c = timeit("C rollout.collect (f32 batch)", collect_f32,
               env_state, obs, rng)
    d = timeit("D rollout.collect (bf16 batch)", collect_bf16,
               env_state, obs, rng)
    print(f"\nper-step: env {a/T*1e3:.3f} ms | policy+sample "
          f"{(b-a)/T*1e3:.3f} ms | batch emission {(c-b)/T*1e3:.3f} ms | "
          f"bf16 saves {(c-d)/T*1e3:.3f} ms")


if __name__ == "__main__":
    main()
