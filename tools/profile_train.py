"""Incremental timing of the training pipeline on the current backend.

Prints wall-clock for scene build, env.step compile/exec, rollout collect,
PPO update, and the fused train iteration — to locate compile or runtime
hot spots (bench.py = the fused iteration at the same config).

Usage: python tools/profile_train.py [num_envs] [cam] [res]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp


def t(msg, t0):
    dt = time.perf_counter() - t0
    print(f"[{dt:8.2f}s] {msg}", flush=True)
    return time.perf_counter()


def main():
    num_envs = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    cam = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    res = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    t0 = time.perf_counter()
    print(f"devices={jax.devices()} num_envs={num_envs} cam={cam} res={res}",
          flush=True)

    from gennbv_tpu.config import (CameraConfig, Config, EnvConfig, PPOConfig,
                                   RendererConfig, RunnerConfig, SceneConfig)
    from gennbv_tpu.algo import gae, ppo, rollout
    from gennbv_tpu.algo.runner import Runner

    cfg = Config(
        env=EnvConfig(
            num_envs=num_envs,
            camera=CameraConfig(height=cam, width=cam),
            renderer=RendererConfig(resolution=res),
            scene=SceneConfig(num_scenes=num_envs, seed=0),
        ),
        ppo=PPOConfig(n_steps=128, batch_size=128, n_epochs=5),
        runner=RunnerConfig(seed=0, save_freq=0),
    )
    t1 = t("imports", t0)
    runner = Runner(cfg)
    t1 = t(f"Runner init (scene build; surf P={runner.scenes.surf_pts.shape})", t1)

    env = runner.env
    state = env.init_state(num_envs)
    actions = jnp.broadcast_to(env.init_action, (num_envs, 6))
    state, out = env.step(state, actions)
    jax.block_until_ready(out.obs)
    t1 = t("env.step compile+exec #1", t1)
    for _ in range(3):
        state, out = env.step(state, actions)
    jax.block_until_ready(out.obs)
    t1 = t("env.step x3 steady-state", t1)

    variables = runner.variables()
    r = jax.random.PRNGKey(0)
    coll = jax.jit(lambda vs, st, ob, rr: rollout.collect(
        env, runner.model, vs, st, ob, rr, cfg.ppo.n_steps, cfg.ppo.gamma,
        jnp.float32))
    env_state, obs, batch, stats = coll(variables, state, out.obs, r)
    jax.block_until_ready(batch.rewards)
    t1 = t("rollout.collect (128 steps) compile+exec #1", t1)
    env_state, obs, batch, stats = coll(variables, env_state, obs, r)
    jax.block_until_ready(batch.rewards)
    t1 = t("rollout.collect steady-state", t1)

    adv, ret = gae.compute_gae(batch.rewards, batch.values,
                               batch.dones.astype(jnp.float32),
                               batch.last_values, cfg.ppo.gamma,
                               cfg.ppo.gae_lambda)
    tt, n = batch.rewards.shape
    m = tt * n
    flat = lambda x: x.reshape((m,) + x.shape[2:])
    ts = runner.train_state
    upd = jax.jit(lambda ts_, o, a, lp, v, ad, re, rr: ppo.update(
        runner.model, runner.tx, cfg.ppo, ts_, o, a, lp, v, ad, re, rr))
    ts2, um = upd(ts, flat(batch.obs), flat(batch.actions),
                  flat(batch.log_probs), flat(batch.values), flat(adv),
                  flat(ret), r)
    jax.block_until_ready(um.policy_loss)
    t1 = t("ppo.update (5 epochs x 256 mb) compile+exec #1", t1)
    ts2, um = upd(ts, flat(batch.obs), flat(batch.actions),
                  flat(batch.log_probs), flat(batch.values), flat(adv),
                  flat(ret), r)
    jax.block_until_ready(um.policy_loss)
    t1 = t("ppo.update steady-state", t1)

    env_state2, obs2 = runner.setup()
    ts3, env_state2, obs2, rng, metrics = runner._train_iter(
        runner.train_state, env_state2, obs2, runner.rng)
    jax.block_until_ready(metrics)
    t1 = t("fused train iter compile+exec #1", t1)
    for _ in range(3):
        ts3, env_state2, obs2, rng, metrics = runner._train_iter(
            ts3, env_state2, obs2, rng)
    jax.block_until_ready(metrics)
    dt = time.perf_counter() - t1
    sps = 3 * cfg.ppo.n_steps * num_envs / dt
    t(f"fused train iter x3 steady-state -> {sps:,.0f} env-steps/s", t1)


if __name__ == "__main__":
    main()
