"""Part 2 of the iteration-gap probe: the gap (full jit 1207 ms vs split
phases 908+88=996 ms) survives stats retention, so test the remaining
differences between bench's phase split and Runner._train_iteration:

  E. ONE jit of rollout+GAE+update, NO metrics math, NO donation
  F. E + the packed-metrics math (still no donation)
  G. F + donate_argnums=(1,2)  == _train_iteration exactly
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


def main():
    runner = _make_runner(camera=128)
    ts0 = runner.train_state
    from gennbv_tpu.algo import gae, ppo, rollout

    cfg = runner.cfg.ppo

    def combined(ts, env_state, obs, rng, with_metrics):
        r_roll, r_upd, rng = jax.random.split(rng, 3)
        variables = {"params": ts.params, "batch_stats": ts.batch_stats}
        env_state, obs, batch, stats = rollout.collect(
            runner.env, runner.model, variables, env_state, obs, r_roll,
            cfg.n_steps, cfg.gamma, runner.obs_dtype,
        )
        adv, ret = gae.compute_gae(
            batch.rewards, batch.values, batch.dones.astype(jnp.float32),
            batch.last_values, cfg.gamma, cfg.gae_lambda,
        )
        t, n = batch.rewards.shape
        flat = lambda x: x.reshape((t * n,) + x.shape[2:])
        ts, upd = ppo.update(
            runner.model, runner.tx, cfg, ts,
            flat(batch.obs), flat(batch.actions), flat(batch.log_probs),
            flat(batch.values), flat(adv), flat(ret), r_upd,
            num_envs=n,
        )
        if not with_metrics:
            return ts, env_state, obs, rng, upd.approx_kl
        n_done = jnp.maximum(stats.num_dones.sum(), 1.0)
        vals = [stats.ep_reward.sum() / n_done, stats.ep_length.sum() / n_done,
                (stats.coverage * stats.num_dones).sum() / n_done,
                stats.collision.sum() / n_done, stats.num_dones.sum(),
                batch.rewards.mean(), upd.policy_loss, upd.value_loss,
                upd.entropy_loss, upd.approx_kl, upd.clip_fraction,
                upd.n_minibatches_done, upd.explained_variance]
        packed = jnp.stack([v.astype(jnp.float32) for v in vals])
        return ts, env_state, obs, rng, packed

    variants = (
        ("E one-jit no metrics, no donation",
         jax.jit(lambda ts, s, o, r: combined(ts, s, o, r, False))),
        ("F one-jit + metrics, no donation",
         jax.jit(lambda ts, s, o, r: combined(ts, s, o, r, True))),
        ("G one-jit + metrics + donate (== _train_iter)",
         jax.jit(lambda ts, s, o, r: combined(ts, s, o, r, True),
                 donate_argnums=(1, 2))),
    )
    for name, fn in variants:
        env_state, obs = runner.setup()
        rng = runner.rng
        ts, st, ob, rng, out = fn(ts0, env_state, obs, rng)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(4):
            ts, st, ob, rng, out = fn(ts, st, ob, rng)
        jax.block_until_ready(out)
        print(f"{name:58s} {(time.perf_counter()-t0)/4*1e3:9.1f} ms",
              flush=True)


if __name__ == "__main__":
    main()
