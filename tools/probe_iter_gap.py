"""Locate the ~0.21 s gap between the full jitted _train_iteration and the
sum of its phase-split parts (bench.py rollout_phase + update_phase) at the
tuned 128^2 config.

Hypotheses probed, each as its own jitted program, serial-chained and
warmed per BENCHMARKS method notes:
  A. full _train_iter (donated, stats + packed metrics)   — the 1.206 s
  B. rollout+GAE returning stats (no DCE of episode aggregation)
  C. rollout+GAE discarding stats (bench.py's rollout_phase) — the 0.906 s
  D. update phase alone                                     — the 0.088 s
  E. A but with the packed-metrics math removed (returns upd.approx_kl)
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp

from bench import _make_runner, _phase_fns


def timeit(name, fn, args, iters=4, keep=lambda o: o):
    out = fn(*args)
    jax.block_until_ready(keep(out))
    t0 = time.perf_counter()
    o = out
    for _ in range(iters):
        o = fn(*args[:1] + tuple(o[1:len(args)]) if False else args)
    jax.block_until_ready(keep(o))
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:58s} {dt*1e3:9.1f} ms", flush=True)
    return dt


def main():
    runner = _make_runner(camera=128)
    env_state, obs = runner.setup()
    ts = runner.train_state
    rng = runner.rng

    from gennbv_tpu.algo import gae, rollout

    cfg = runner.cfg.ppo

    def roll_keep_stats(ts, env_state, obs, rng):
        r_roll, rng = jax.random.split(rng)
        variables = {"params": ts.params, "batch_stats": ts.batch_stats}
        env_state, obs, batch, stats = rollout.collect(
            runner.env, runner.model, variables, env_state, obs, r_roll,
            cfg.n_steps, cfg.gamma, runner.obs_dtype,
        )
        adv, ret = gae.compute_gae(
            batch.rewards, batch.values, batch.dones.astype(jnp.float32),
            batch.last_values, cfg.gamma, cfg.gae_lambda,
        )
        # force every stats leaf live
        s = sum(jnp.sum(x) for x in jax.tree.leaves(stats))
        return env_state, obs, batch, adv, ret, rng, s

    roll_stats_fn = jax.jit(roll_keep_stats)
    rollout_fn, update_fn = _phase_fns(runner)

    # ---- A: full train iter (exactly what bench times)
    def run_full(ts, env_state, obs, rng):
        return runner._train_iter(ts, env_state, obs, rng)

    # warm + time A manually (donation: must rethread outputs)
    ts_a, st_a, obs_a, rng_a, m = runner._train_iter(ts, env_state, obs, rng)
    jax.block_until_ready(m)
    t0 = time.perf_counter()
    for _ in range(4):
        ts_a, st_a, obs_a, rng_a, m = runner._train_iter(ts_a, st_a, obs_a, rng_a)
    jax.block_until_ready(m)
    print(f"{'A full _train_iter':58s} {(time.perf_counter()-t0)/4*1e3:9.1f} ms",
          flush=True)

    # fresh state for the rest (A donated its buffers)
    env_state, obs = runner.setup()

    # ---- B: rollout keeping stats
    st_b, obs_b, batch, adv, ret, rng_b, s = roll_stats_fn(ts, env_state, obs, rng)
    jax.block_until_ready(s)
    t0 = time.perf_counter()
    for _ in range(4):
        st_b, obs_b, batch, adv, ret, rng_b, s = roll_stats_fn(
            ts, st_b, obs_b, rng_b)
    jax.block_until_ready(s)
    print(f"{'B rollout+GAE keep stats':58s} {(time.perf_counter()-t0)/4*1e3:9.1f} ms",
          flush=True)

    # ---- C: bench's rollout_phase (stats DCE'd)
    st_c, obs_c, batch, adv, ret, rng_c = rollout_fn(ts, env_state, obs, rng)
    jax.block_until_ready(adv)
    t0 = time.perf_counter()
    for _ in range(4):
        st_c, obs_c, batch, adv, ret, rng_c = rollout_fn(ts, st_c, obs_c, rng_c)
    jax.block_until_ready(adv)
    print(f"{'C rollout+GAE stats DCEd (bench phase)':58s} {(time.perf_counter()-t0)/4*1e3:9.1f} ms",
          flush=True)

    # ---- D: update phase
    ts_d, kl, rng_d = update_fn(ts, batch, adv, ret, rng)
    jax.block_until_ready(kl)
    t0 = time.perf_counter()
    for _ in range(4):
        ts_d, kl, rng_d = update_fn(ts_d, batch, adv, ret, rng_d)
    jax.block_until_ready(kl)
    print(f"{'D update phase':58s} {(time.perf_counter()-t0)/4*1e3:9.1f} ms",
          flush=True)


if __name__ == "__main__":
    main()
