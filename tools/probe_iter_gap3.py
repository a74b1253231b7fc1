"""Part 3: the composed TWO-JIT loop (rollout-jit then update-jit chained
per iteration, metrics packed, realistic donation), vs the one-jit
_train_iter — the candidate Runner restructure, measured live before
landing it.  Also re-checks the 400^2 sensor (part-2 found no gap there:
rollout 4.919 + update 0.288 ~= full 5.223).
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp

from bench import _make_runner


def build_split(runner):
    from gennbv_tpu.algo import gae, ppo, rollout

    cfg = runner.cfg.ppo

    def rollout_iter(ts, env_state, obs, rng):
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
        n_done = jnp.maximum(stats.num_dones.sum(), 1.0)
        roll_m = jnp.stack([
            stats.ep_reward.sum() / n_done,
            stats.ep_length.sum() / n_done,
            (stats.coverage * stats.num_dones).sum() / n_done,
            stats.collision.sum() / n_done,
            stats.num_dones.sum(),
            batch.rewards.mean(),
        ]).astype(jnp.float32)
        return env_state, obs, batch, adv, ret, roll_m, rng

    def update_iter(ts, batch, adv, ret, roll_m, rng):
        r_upd, rng = jax.random.split(rng)
        t, n = batch.rewards.shape
        flat = lambda x: x.reshape((t * n,) + x.shape[2:])
        ts, upd = ppo.update(
            runner.model, runner.tx, cfg, ts,
            flat(batch.obs), flat(batch.actions), flat(batch.log_probs),
            flat(batch.values), flat(adv), flat(ret), r_upd,
            num_envs=n,
        )
        packed = jnp.concatenate([roll_m, jnp.stack([
            upd.policy_loss, upd.value_loss, upd.entropy_loss,
            upd.approx_kl, upd.clip_fraction, upd.n_minibatches_done,
            upd.explained_variance]).astype(jnp.float32)])
        return ts, packed, rng

    # donate env_state+obs into rollout; batch/adv/ret die inside update
    return (jax.jit(rollout_iter, donate_argnums=(1, 2)),
            jax.jit(update_iter, donate_argnums=(1, 2, 3)))


def run(camera):
    runner = _make_runner(camera=camera)
    roll_fn, upd_fn = build_split(runner)
    env_state, obs = runner.setup()
    ts = runner.train_state
    rng = runner.rng

    def one_iter(ts, env_state, obs, rng):
        env_state, obs, batch, adv, ret, roll_m, rng = roll_fn(
            ts, env_state, obs, rng)
        ts, packed, rng = upd_fn(ts, batch, adv, ret, roll_m, rng)
        return ts, env_state, obs, rng, packed

    ts, env_state, obs, rng, packed = one_iter(ts, env_state, obs, rng)
    jax.block_until_ready(packed)
    iters = 6
    t0 = time.perf_counter()
    for _ in range(iters):
        ts, env_state, obs, rng, packed = one_iter(ts, env_state, obs, rng)
    jax.block_until_ready(packed)
    dt = (time.perf_counter() - t0) / iters
    n = runner.cfg.env.num_envs * runner.cfg.ppo.n_steps
    print(f"H composed two-jit loop cam{camera}: {dt*1e3:9.1f} ms/iter "
          f"= {n/dt:,.0f} steps/s", flush=True)


if __name__ == "__main__":
    run(128)
    run(400)
