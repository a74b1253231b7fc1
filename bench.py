"""End-to-end PPO throughput benchmark at the reference training scale.

Measures env-steps/sec of the FULL training iteration — on-device depth
rendering, occupancy mapping, reward, GAE, and the 5-epoch minibatched PPO
update — at 256 vectorized envs (the reference's single-A100 env count,
gennbv/train/train_gennbv.py:117) with the tuned 128x128 camera, plus a
secondary measurement at the reference's own 400x400 training camera
(config_gennbv_train.py:23-35) so the deployment-sensor number is
driver-captured, not self-reported.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "env_steps_per_sec",
     "vs_baseline": N, "phases": {...}, "camera400": {...}}

Per-phase fields (VERDICT r2 item 4): the iteration is re-run split into its
two phases — rollout+GAE (128 sequential env steps: render, map, reward,
policy forward) and the 5-epoch minibatched PPO update — each timed and
cost-analyzed separately, plus a standalone env.step row.  The `bound` label
is "latency" when both MFU and HBM utilization are <5%: neither roofline
wall is near, the program is serialization-bound (sequential env steps /
minibatches of small ops), and the honest story is idle-hardware headroom,
not a bandwidth limit.

`--mesh N` (VERDICT r2 item 9): compiles the full training iteration over an
N-device virtual CPU mesh and reports the compiled HLO's collective traffic
(all-reduce/all-gather/… byte counts per iteration), so the expected ICI
traffic of a real multi-chip run is known before hardware exists.

The reference publishes no steps/sec figure (SURVEY §6, BASELINE.md); the
baseline constant below is an engineering estimate of the reference pipeline
at the same scale: Isaac Gym renders 256 cameras at 400x400 per step plus a
256-iteration per-env Python loop launching a PyCUDA kernel each
(env_train_gennbv.py:295-314) — order 200 env-steps/s on an A100-class GPU.
vs_baseline should be read against that estimate until the reference is
measured directly.
"""
from __future__ import annotations

import argparse
import json
import os
import re
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   ".jax_cache"))

REFERENCE_EST_STEPS_PER_SEC = 200.0

# minimum remaining wall-clock (s) worth starting the 400^2 leg with; below
# this the leg is skipped outright (its compile alone runs minutes on the
# tunneled backend)
MIN_400_BUDGET = 60.0

# Peak specs by device kind, for the roofline/MFU fields.  bf16 matmul peak
# and HBM bandwidth; MFU is conventionally reported against the bf16 peak
# (the dominant ops here — splat/carve one-hot matmuls, encoder convs, PPO
# GEMMs — all run bf16 on the MXU).
_PEAKS = {
    # device_kind substring -> (bf16 TFLOP/s, HBM GB/s)
    "v5 lite": (197.0, 819.0),   # v5e
    "v5e": (197.0, 819.0),
    "v4": (275.0, 1228.0),
    "v5p": (459.0, 2765.0),
    "v6": (918.0, 1640.0),       # v6e (Trillium)
}

_DTYPE_BYTES = {
    "pred": 1, "s8": 1, "u8": 1, "s16": 2, "u16": 2, "bf16": 2, "f16": 2,
    "s32": 4, "u32": 4, "f32": 4, "s64": 8, "u64": 8, "f64": 8, "c64": 8,
}

_COLLECTIVES = ("all-reduce", "all-gather", "reduce-scatter",
                "collective-permute", "all-to-all")


def _device_peaks(dev) -> tuple[float, float]:
    kind = getattr(dev, "device_kind", "").lower()
    for key, peaks in _PEAKS.items():
        if key in kind:
            return peaks
    return (197.0, 819.0)  # default to v5e


def _cost(compiled) -> tuple[float, float]:
    """(flops, bytes accessed) from XLA's static cost analysis."""
    cost = compiled.cost_analysis()
    if isinstance(cost, list):  # older jax returns [dict]
        cost = cost[0]
    return float(cost.get("flops", 0.0)), float(cost.get("bytes accessed", 0.0))


def roofline(compiled, calls_per_sec: float, dev) -> dict:
    """MFU + HBM-utilization fields from XLA's compiled cost analysis.

    `flops` and `bytes accessed` are XLA's static per-call estimates
    (algebraic flops; bytes = HBM touched assuming no cache reuse), so the
    utilizations are lower bounds on how busy the respective unit is.  The
    `bound` field names the nearest roofline wall — or "latency" when BOTH
    utilizations are <5%, i.e. the program is dominated by serialization
    (sequential steps/minibatches of small ops) rather than either wall.
    """
    try:
        flops, bytes_acc = _cost(compiled)
    except Exception:
        return {"mfu": -1.0}
    peak_tflops, peak_gbps = _device_peaks(dev)
    mfu = flops * calls_per_sec / (peak_tflops * 1e12)
    hbm_util = bytes_acc * calls_per_sec / (peak_gbps * 1e9)
    if max(mfu, hbm_util) < 0.05:
        bound = "latency"
    elif hbm_util > mfu:
        bound = "bandwidth"
    else:
        bound = "compute"
    return {
        "mfu": round(mfu, 4),
        "hbm_util": round(hbm_util, 4),
        "tflops_per_iter": round(flops / 1e12, 4),
        "gbytes_per_iter": round(bytes_acc / 1e9, 4),
        "bound": bound,
    }


def collective_bytes(hlo_text: str) -> dict:
    """Per-kind byte counts of the collectives in a compiled HLO module.

    Parses op result shapes (incl. tuple results) from lines of the form
    `%x = f32[256,128]{1,0} all-reduce(...)`; bytes = result-shape bytes,
    i.e. the payload each collective moves per call (lower bound on wire
    traffic; algorithm factors like ring 2(n-1)/n are topology-dependent).
    """
    out = {k: {"count": 0, "bytes": 0} for k in _COLLECTIVES}
    shape_re = re.compile(r"(\w+)\[([\d,]*)\]")
    for line in hlo_text.splitlines():
        m = re.search(r"=\s*(\([^)]*\)|\S+)\s+(%?[\w-]+)\(", line)
        if not m:
            continue
        op = m.group(2).lstrip("%")
        if "-done" in op:   # async pairs: count the -start, skip the -done
            continue
        # fusions wrapping a collective keep the name, e.g. all-reduce.3
        kind = next((k for k in _COLLECTIVES if op.startswith(k)), None)
        if kind is None:
            continue
        nbytes = 0
        for dt, dims in shape_re.findall(m.group(1)):
            if dt not in _DTYPE_BYTES:
                continue
            n = 1
            for d in dims.split(","):
                if d:
                    n *= int(d)
            nbytes += n * _DTYPE_BYTES[dt]
        out[kind]["count"] += 1
        out[kind]["bytes"] += nbytes
    return {k: v for k, v in out.items() if v["count"]}


def _make_runner(camera: int, num_envs: int = 256, num_devices: int = 0,
                 resolution: int = 64, n_steps: int = 128,
                 batch_size: int = 128):
    from gennbv_tpu.config import (CameraConfig, Config, EnvConfig, PPOConfig,
                                   RendererConfig, RunnerConfig, SceneConfig)
    from gennbv_tpu.algo.runner import Runner

    cfg = Config(
        env=EnvConfig(
            num_envs=num_envs,
            camera=CameraConfig(height=camera, width=camera),
            renderer=RendererConfig(resolution=resolution),
            scene=SceneConfig(num_scenes=num_envs, seed=0),
        ),
        ppo=PPOConfig(n_steps=n_steps, batch_size=batch_size, n_epochs=5),
        runner=RunnerConfig(seed=0, save_freq=0, num_devices=num_devices),
    )
    return Runner(cfg)


def _phase_fns(runner):
    """The training iteration split at its one real phase boundary —
    mirrors Runner._train_iteration exactly (the rollout batch is
    materialized in HBM either way; the split adds no extra traffic)."""
    import jax
    import jax.numpy as jnp
    from gennbv_tpu.algo import gae, ppo, rollout

    cfg = runner.cfg.ppo

    def rollout_phase(ts, env_state, obs, rng):
        r_roll, rng = jax.random.split(rng)
        variables = {"params": ts.params, "batch_stats": ts.batch_stats}
        env_state, obs, batch, _stats = rollout.collect(
            runner.env, runner.model, variables, env_state, obs, r_roll,
            cfg.n_steps, cfg.gamma, runner.obs_dtype,
        )
        adv, ret = gae.compute_gae(
            batch.rewards, batch.values, batch.dones.astype(jnp.float32),
            batch.last_values, cfg.gamma, cfg.gae_lambda,
        )
        return env_state, obs, batch, adv, ret, rng

    def update_phase(ts, batch, adv, ret, rng):
        r_upd, rng = jax.random.split(rng)
        t, n = batch.rewards.shape
        flat = lambda x: x.reshape((t * n,) + x.shape[2:])
        ts, upd = ppo.update(
            runner.model, runner.tx, cfg, ts,
            flat(batch.obs), flat(batch.actions), flat(batch.log_probs),
            flat(batch.values), flat(adv), flat(ret), r_upd,
            num_envs=n,
        )
        return ts, upd.approx_kl, rng

    # no donation: the post-loop .lower() calls re-inspect the live args
    return jax.jit(rollout_phase), jax.jit(update_phase)


def bench_config(camera: int, iters: int, phases: bool = True,
                 **runner_kw) -> dict:
    """Full-iteration steps/sec at the given square camera, with optional
    per-phase breakdown.  All timing loops serially chain device state
    (each call consumes the previous call's output) and are preceded by a
    warmup call — both required on a tunneled PJRT backend (see
    BENCHMARKS.md method notes)."""
    import jax

    runner = _make_runner(camera, **runner_kw)
    num_envs = runner.cfg.env.num_envs
    n_steps = runner.cfg.ppo.n_steps
    env_state, obs = runner.setup()
    ts = runner.train_state
    rng = runner.rng
    dev = jax.devices()[0]

    # warmup / compile
    ts, env_state, obs, rng, metrics = runner._train_iter(ts, env_state, obs, rng)
    jax.block_until_ready(metrics)

    t0 = time.perf_counter()
    for _ in range(iters):
        ts, env_state, obs, rng, metrics = runner._train_iter(ts, env_state, obs, rng)
    jax.block_until_ready(metrics)
    dt = time.perf_counter() - t0

    steps_per_sec = iters * n_steps * num_envs / dt

    # MFU/roofline of the timed program: same jit cache entry as the timed
    # calls, so cost analysis describes exactly what ran.
    compiled = runner._train_iter.lower(ts, env_state, obs, rng).compile()
    out = {
        "value": round(steps_per_sec, 2),
        "camera": camera,
        "iter_seconds": round(dt / iters, 4),
        **roofline(compiled, iters / dt, dev),
    }
    if not phases:
        return out

    # ---- per-phase: rollout+GAE vs PPO update ----
    rollout_fn, update_fn = _phase_fns(runner)
    env_state, obs2, batch, adv, ret, rng = rollout_fn(ts, env_state, obs, rng)
    jax.block_until_ready(adv)
    t0 = time.perf_counter()
    obs_r = obs2
    for _ in range(iters):
        env_state, obs_r, batch, adv, ret, rng = rollout_fn(ts, env_state, obs_r, rng)
    jax.block_until_ready(adv)
    dt_roll = (time.perf_counter() - t0) / iters

    ts2, kl, rng = update_fn(ts, batch, adv, ret, rng)
    jax.block_until_ready(kl)
    t0 = time.perf_counter()
    for _ in range(iters):
        ts2, kl, rng = update_fn(ts2, batch, adv, ret, rng)
    jax.block_until_ready(kl)
    dt_upd = (time.perf_counter() - t0) / iters

    rc = rollout_fn.lower(ts, env_state, obs, rng).compile()
    uc = update_fn.lower(ts, batch, adv, ret, rng).compile()
    phases_out = {
        "rollout": {"seconds": round(dt_roll, 4),
                    **roofline(rc, 1.0 / dt_roll, dev)},
        "update": {"seconds": round(dt_upd, 4),
                   **roofline(uc, 1.0 / dt_upd, dev)},
    }

    # ---- env.step standalone (the op the rollout serializes 128x) ----
    import jax.numpy as jnp
    from gennbv_tpu.utils.jitutil import unjitted_step
    step_fn = jax.jit(unjitted_step(runner.env))
    actions = jnp.tile(
        jnp.asarray([[40, 40, 25, 0, 6, 6]], jnp.int32), (num_envs, 1))
    st, so = step_fn(env_state, actions)
    jax.block_until_ready(so.reward)
    t0 = time.perf_counter()
    for _ in range(4 * iters):
        st, so = step_fn(st, actions)
    jax.block_until_ready(so.reward)
    dt_step = (time.perf_counter() - t0) / (4 * iters)
    sc = step_fn.lower(st, actions).compile()
    phases_out["env_step"] = {
        "seconds": round(dt_step, 5),
        **roofline(sc, 1.0 / dt_step, dev),
    }
    out["phases"] = phases_out
    return out


def mesh_report(n_devices: int) -> dict:
    """Compile the full training iteration over an N-device mesh and report
    the compiled collectives (VERDICT r2 item 9).  Caller must have forced
    the CPU platform BEFORE jax backend init when no real N-device mesh
    exists (main() does).

    Uses a reduced env config (the CPU-mesh compile of the full 256-env
    400^2 program takes tens of minutes on this host): the dominant
    collective — the per-minibatch gradient all-reduce — is MODEL-sized
    (~params bytes x minibatch count), independent of env count/camera,
    so the reported traffic transfers to the production config up to the
    tiny per-iteration metric psums."""
    import jax

    runner = _make_runner(camera=64, num_envs=4 * n_devices,
                          resolution=32, n_steps=8,
                          batch_size=2 * n_devices)
    env_state, obs = runner.setup()
    compiled = runner._train_iter.lower(
        runner.train_state, env_state, obs, runner.rng).compile()
    coll = collective_bytes(compiled.as_text())
    total = sum(v["bytes"] for v in coll.values())
    # static HLO counts each in-scan collective ONCE; dynamically the
    # minibatch scan executes its gradient all-reduce n_mb times per
    # iteration, so the dominant per-iteration wire traffic is ~params
    # bytes x minibatch count (up to the scan's KL early stop)
    n_mb = runner.cfg.ppo.n_epochs * (
        runner.cfg.ppo.n_steps * runner.cfg.env.num_envs
        // runner.cfg.ppo.batch_size)
    params_bytes = sum(
        x.size * x.dtype.itemsize
        for x in jax.tree.leaves(runner.train_state.params))
    return {
        "metric": f"compiled collective traffic, {n_devices}-device env-sharded mesh",
        "n_devices": n_devices,
        "collectives": coll,
        "collective_bytes_static": total,
        "minibatches_per_iter": n_mb,
        "params_bytes": params_bytes,
        "est_grad_allreduce_bytes_per_iter": params_bytes * n_mb,
        "note": "static HLO instances; in-scan collectives execute once "
                "per minibatch — per-iteration grad traffic ~= params_bytes"
                " * minibatches_per_iter",
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mesh", type=int, default=0,
                    help="compile over an N-device virtual CPU mesh and "
                         "report collective byte counts instead of timing")
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--skip-400", action="store_true",
                    help="skip the secondary 400x400 measurement")
    ap.add_argument("--budget-400", type=float, default=1500.0,
                    help="total wall-clock budget (s) by which the 400x400 "
                         "leg must finish; the leg is skipped or aborted "
                         "past it (driver kill limit is 1800s)")
    ap.add_argument("--smoke", action="store_true",
                    help="tiny shapes on the current backend (CI check of "
                         "the bench harness itself, not a measurement)")
    args = ap.parse_args()

    if args.smoke:
        res = bench_config(camera=16, iters=2, phases=True, num_envs=8,
                           resolution=16, n_steps=4, batch_size=16)
        print(json.dumps({"metric": "smoke", **res}))
        return

    if args.mesh:
        # force the virtual CPU mesh before any backend touch (the axon
        # sitecustomize pre-registers the real TPU; see tests/conftest.py)
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count={args.mesh}"
            ).strip()
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax
        jax.config.update("jax_platforms", "cpu")
        print(json.dumps(mesh_report(args.mesh)))
        return

    emit(bench_config, args)


def emit(bench_fn, args, out=None):
    """Measure and print, timeout-proof (VERDICT r4 item 2).

    The headline 128^2 JSON line is printed AND FLUSHED the moment it is
    measured, BEFORE the optional 400^2 leg starts, so an external
    wall-clock kill during the (compile-heavy, tunnel-sensitive) 400^2 leg
    can never again lose a measurement the chip already produced
    (BENCH_r04.json: rc=124, parsed null).  When the 400^2 leg completes,
    the full merged line is printed as a SECOND line — a parser taking
    either the first or the last JSON line on stdout gets a valid headline.
    The 400^2 leg additionally runs under an internal time budget
    (SIGALRM): if it exceeds the budget it degrades to
    {"camera400": {"skipped": ...}} instead of hanging into the kill.
    """
    import signal
    import sys

    out = out or sys.stdout
    t_start = time.perf_counter()
    res = bench_fn(camera=128, iters=args.iters)
    line = {
        "metric": "PPO end-to-end env-steps/sec, 256 envs (render+map+update)",
        "value": res.pop("value"),
        "unit": "env_steps_per_sec",
    }
    line["vs_baseline"] = round(line["value"] / REFERENCE_EST_STEPS_PER_SEC, 3)
    line.update(res)
    print(json.dumps(line), file=out, flush=True)  # headline: safe on disk

    if args.skip_400:
        return

    # the reference's own training sensor, as a driver-captured second
    # config; failure or slowness must not cost the headline above
    budget = args.budget_400 - (time.perf_counter() - t_start)
    if budget < MIN_400_BUDGET:
        line["camera400"] = {"skipped": f"time budget ({budget:.0f}s left)"}
        print(json.dumps(line), file=out, flush=True)
        return

    class _Timeout(Exception):
        pass

    def _alarm(signum, frame):
        raise _Timeout()

    use_alarm = hasattr(signal, "SIGALRM")
    if use_alarm:
        prev = signal.signal(signal.SIGALRM, _alarm)
        signal.alarm(max(1, int(budget)))  # alarm(0) would disarm
    try:
        r400 = bench_fn(camera=400, iters=2, phases=True)
        r400["vs_baseline"] = round(
            r400["value"] / REFERENCE_EST_STEPS_PER_SEC, 3)
        line["camera400"] = r400
    except _Timeout:
        line["camera400"] = {"skipped": f"time budget ({args.budget_400}s)"}
    except Exception as e:  # pragma: no cover
        line["camera400"] = {"error": repr(e)}
    finally:
        if use_alarm:
            signal.alarm(0)
            signal.signal(signal.SIGALRM, prev)

    print(json.dumps(line), file=out, flush=True)


if __name__ == "__main__":
    main()
