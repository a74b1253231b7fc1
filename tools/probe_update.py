"""Characterize the PPO update phase (VERDICT r3 item 6 / r4 item 7).

The update runs 1,280 sequential minibatches (5 epochs x 256 mb of 128)
per iteration — 0.115-0.140 s of the 1.21 s iteration at the production
config — and has never had a probe.  This tool answers where the time
goes and whether the phase is at its memory floor:

1. **Analytic floor**: per-minibatch HBM traffic decomposition — the Adam
   step alone must read+write params/m/v (~6x params bytes), the backward
   writes grads (1x), the minibatch gather reads obs rows.  At 1,280
   steps/iter this is the serialization-bound floor.
2. **Measured A/B** (same interleaved-block methodology as
   tools/bench_ab_live.py, single process):
   - `sel`:  the shipped form — tx.update runs unconditionally, then three
     full-tree jnp.where(keep, new, old) selects (params, batch_stats,
     opt_state) keep or discard it (algo/ppo.py mb_step).
   - `cond`: bitwise-identical restructure — keep is decided first and a
     lax.cond executes tx.update+apply only on the taken branch, removing
     the three tree-sized selects (~3x params+opt bytes/step) from the
     keep=True steady state.
   - `nokl`: target_kl=None (no cond/select machinery at all) — the upper
     bound on what removing the KL early-stop costs; diagnostic only, the
     reference semantics require the early stop.
3. **Minibatch-size sweep** (diagnostic only — changes semantics): how
   much of the time is per-step serialization vs real FLOPs/bytes.

Run on an idle TPU host (single-core host: no concurrent CPU work).

Usage: python tools/probe_update.py [--iters 30] [--out reports/r5_probe_update.log]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(ROOT, ".jax_cache"))


def tree_bytes(tree) -> int:
    import jax
    return sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(tree))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30,
                    help="timed update calls per variant block")
    ap.add_argument("--blocks", type=int, default=3)
    ap.add_argument("--out", type=str, default=None)
    ap.add_argument("--sweep", action="store_true",
                    help="also run the (semantics-changing) batch-size sweep")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from gennbv_tpu.algo import gae, ppo, rollout
    from gennbv_tpu.config import (CameraConfig, Config, EnvConfig, PPOConfig,
                                   RendererConfig, RunnerConfig, SceneConfig)
    from gennbv_tpu.algo.runner import Runner

    lines = []

    def emit(obj):
        s = json.dumps(obj)
        print(s, flush=True)
        lines.append(s)

    cfg = Config(
        env=EnvConfig(
            num_envs=256,
            camera=CameraConfig(height=128, width=128),
            renderer=RendererConfig(resolution=64),
            scene=SceneConfig(num_scenes=256, seed=0),
        ),
        ppo=PPOConfig(n_steps=128, batch_size=128, n_epochs=5),
        runner=RunnerConfig(seed=0, save_freq=0),
    )
    runner = Runner(cfg)
    env_state, obs = runner.setup()
    ts = runner.train_state
    rng = runner.rng

    # one REAL rollout so the update sees production data (KL magnitudes,
    # advantage distribution)
    pcfg = cfg.ppo
    r_roll, rng = jax.random.split(rng)
    variables = {"params": ts.params, "batch_stats": ts.batch_stats}
    env_state, obs, batch, _ = jax.jit(
        lambda v, s, o, r: rollout.collect(
            runner.env, runner.model, v, s, o, r, pcfg.n_steps, pcfg.gamma,
            runner.obs_dtype)
    )(variables, env_state, obs, r_roll)
    adv, ret = jax.jit(
        lambda b: gae.compute_gae(
            b.rewards, b.values, b.dones.astype(jnp.float32), b.last_values,
            pcfg.gamma, pcfg.gae_lambda)
    )(batch)
    t_len, n = batch.rewards.shape
    flat = lambda x: x.reshape((t_len * n,) + x.shape[2:])
    f_obs, f_act, f_lp, f_val = (flat(batch.obs), flat(batch.actions),
                                 flat(batch.log_probs), flat(batch.values))
    f_adv, f_ret = flat(adv), flat(ret)
    jax.block_until_ready(f_obs)

    # ---- analytic floor ---------------------------------------------------
    import numpy as np
    p_bytes = tree_bytes(ts.params)
    o_bytes = tree_bytes(ts.opt_state)
    n_mb = pcfg.n_epochs * (pcfg.n_steps * cfg.env.num_envs // pcfg.batch_size)
    obs_row = f_obs.shape[1] * f_obs.dtype.itemsize
    per_mb = {
        # fwd reads params; bwd writes grads (1x params)
        "fwd_bwd_params": 2 * p_bytes,
        # adam: read m,v + params, write m,v + params
        "adam": 2 * o_bytes + 2 * p_bytes,
        # the shipped keep-select: read (new, old) write one — for params,
        # batch_stats (~0) and opt_state trees
        "keep_select": 3 * (p_bytes + o_bytes) // 2,  # ~1.5x(p+o) r+w net
        "mb_gather": pcfg.batch_size * obs_row,
    }
    hbm_gbps = 819.0  # v5e
    floor_s = sum(per_mb.values()) / (hbm_gbps * 1e9)
    emit({"probe": "analytic", "params_bytes": p_bytes,
          "opt_state_bytes": o_bytes, "n_minibatches": n_mb,
          "per_mb_bytes": per_mb,
          "per_mb_floor_us": round(floor_s * 1e6, 2),
          "update_floor_ms_with_select": round(floor_s * n_mb * 1e3, 2),
          "update_floor_ms_no_select": round(
              (sum(per_mb.values()) - per_mb["keep_select"])
              / (hbm_gbps * 1e9) * n_mb * 1e3, 2)})

    # ---- variants ----------------------------------------------------------
    # rollout arrays are passed as ARGUMENTS, not closed over: closure
    # capture turns the 1.2 GB flattened rollout into jit constants, which
    # blows the axon remote-compile request limit (observed: 2.2 GB
    # captured-constants warning, compile never returned)
    data = (f_obs, f_act, f_lp, f_val, f_adv, f_ret)

    def make_update(apply_mode: str, target_kl):
        c = PPOConfig(n_steps=pcfg.n_steps, batch_size=pcfg.batch_size,
                      n_epochs=pcfg.n_epochs, target_kl=target_kl,
                      apply_mode=apply_mode)

        def f(ts, rng, data):
            r, rng = jax.random.split(rng)
            new_ts, m = ppo.update(
                runner.model, runner.tx, c, ts, *data, r, num_envs=n)
            return new_ts, m.approx_kl, rng

        return jax.jit(f)

    variants = {
        "sel": make_update("select", pcfg.target_kl),
        "cond": make_update("cond", pcfg.target_kl),
        "nokl": make_update("select", None),
    }

    # compile all, then interleave blocks (bench_ab_live methodology)
    states = {}
    for name, f in variants.items():
        ts_v, kl, rng_v = f(ts, rng, data)
        jax.block_until_ready(kl)
        states[name] = (ts_v, rng_v)
        emit({"probe": "compiled", "variant": name})

    results = {name: [] for name in variants}
    for b in range(args.blocks):
        for name, f in variants.items():
            ts_v, rng_v = states[name]
            kl = None
            t0 = time.perf_counter()
            for _ in range(args.iters):
                ts_v, kl, rng_v = f(ts_v, rng_v, data)
            jax.block_until_ready(kl)
            dt = (time.perf_counter() - t0) / args.iters
            states[name] = (ts_v, rng_v)
            results[name].append(dt)
            emit({"probe": "block", "variant": name, "block": b,
                  "update_seconds": round(dt, 5)})

    med = {k: sorted(v)[len(v) // 2] for k, v in results.items()}
    emit({"probe": "summary",
          "median_update_s": {k: round(v, 5) for k, v in med.items()},
          "per_mb_us": {k: round(v / n_mb * 1e6, 2) for k, v in med.items()},
          "cond_vs_sel": round(med["sel"] / med["cond"], 4),
          "nokl_vs_sel": round(med["sel"] / med["nokl"], 4)})

    # ---- batch-size sweep (diagnostic; changes semantics) ------------------
    if args.sweep:
        for bs in (256, 512, 1024):
            c = PPOConfig(n_steps=pcfg.n_steps, batch_size=bs,
                          n_epochs=pcfg.n_epochs, target_kl=pcfg.target_kl)
            f = jax.jit(lambda ts, rng, data, c=c: ppo.update(
                runner.model, runner.tx, c, ts, *data, rng, num_envs=n)[0])
            ts_v = f(ts, rng, data)
            jax.block_until_ready(jax.tree.leaves(ts_v.params)[0])
            t0 = time.perf_counter()
            for _ in range(args.iters):
                ts_v = f(ts_v, rng, data)
            jax.block_until_ready(jax.tree.leaves(ts_v.params)[0])
            dt = (time.perf_counter() - t0) / args.iters
            emit({"probe": "sweep", "batch_size": bs,
                  "update_seconds": round(dt, 5)})

    if args.out:
        with open(os.path.join(ROOT, args.out), "w") as fh:
            fh.write("\n".join(lines) + "\n")


if __name__ == "__main__":
    main()
