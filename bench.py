"""End-to-end PPO throughput benchmark at the reference training scale.

Measures env-steps/sec of the FULL training iteration — on-device depth
rendering, occupancy mapping, reward, GAE, and the 5-epoch minibatched PPO
update — at 256 vectorized envs (the reference's single-A100 env count,
gennbv/train/train_gennbv.py:117) with the tuned 128x128 camera (the
reference trains at 400x400; see BENCHMARKS.md for both configurations —
the policy-visible observation is identical at either resolution).

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "env_steps_per_sec", "vs_baseline": N}

The reference publishes no steps/sec figure (SURVEY §6, BASELINE.md); the
baseline constant below is an engineering estimate of the reference pipeline
at the same scale: Isaac Gym renders 256 cameras at 400x400 per step plus a
256-iteration per-env Python loop launching a PyCUDA kernel each
(env_train_gennbv.py:295-314) — order 200 env-steps/s on an A100-class GPU.
vs_baseline should be read against that estimate until the reference is
measured directly.
"""
from __future__ import annotations

import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   ".jax_cache"))

import jax

REFERENCE_EST_STEPS_PER_SEC = 200.0

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


def _device_peaks(dev) -> tuple[float, float]:
    kind = getattr(dev, "device_kind", "").lower()
    for key, peaks in _PEAKS.items():
        if key in kind:
            return peaks
    return (197.0, 819.0)  # default to v5e


def roofline(compiled, calls_per_sec: float, dev) -> dict:
    """MFU + HBM-utilization fields from XLA's compiled cost analysis.

    `flops` and `bytes accessed` are XLA's static per-call estimates
    (algebraic flops; bytes = HBM touched assuming no cache reuse), so the
    utilizations are lower bounds on how busy the respective unit is.  The
    `bound` field says which roofline wall the program sits closer to.
    """
    try:
        cost = compiled.cost_analysis()
        if isinstance(cost, list):  # older jax returns [dict]
            cost = cost[0]
        flops = float(cost.get("flops", 0.0))
        bytes_acc = float(cost.get("bytes accessed", 0.0))
    except Exception:
        return {"mfu": -1.0}
    peak_tflops, peak_gbps = _device_peaks(dev)
    mfu = flops * calls_per_sec / (peak_tflops * 1e12)
    hbm_util = bytes_acc * calls_per_sec / (peak_gbps * 1e9)
    return {
        "mfu": round(mfu, 4),
        "hbm_util": round(hbm_util, 4),
        "tflops_per_iter": round(flops / 1e12, 4),
        "gbytes_per_iter": round(bytes_acc / 1e9, 4),
        "bound": "bandwidth" if hbm_util > mfu else "compute",
    }


def main():
    from gennbv_tpu.config import (CameraConfig, Config, EnvConfig, PPOConfig,
                                   RendererConfig, RunnerConfig, SceneConfig)
    from gennbv_tpu.algo.runner import Runner

    num_envs = 256
    cfg = Config(
        env=EnvConfig(
            num_envs=num_envs,
            camera=CameraConfig(height=128, width=128),
            renderer=RendererConfig(resolution=64),
            scene=SceneConfig(num_scenes=num_envs, seed=0),
        ),
        ppo=PPOConfig(n_steps=128, batch_size=128, n_epochs=5),
        runner=RunnerConfig(seed=0, save_freq=0),
    )
    runner = Runner(cfg)
    env_state, obs = runner.setup()
    ts = runner.train_state
    rng = runner.rng

    # warmup / compile
    ts, env_state, obs, rng, metrics = runner._train_iter(ts, env_state, obs, rng)
    jax.block_until_ready(metrics)

    iters = 3
    t0 = time.perf_counter()
    for _ in range(iters):
        ts, env_state, obs, rng, metrics = runner._train_iter(ts, env_state, obs, rng)
    jax.block_until_ready(metrics)
    dt = time.perf_counter() - t0

    steps_per_sec = iters * cfg.ppo.n_steps * num_envs / dt

    # MFU/roofline of the timed program (VERDICT r1 item 6): same jit cache
    # entry as the timed calls, so cost analysis describes exactly what ran.
    compiled = runner._train_iter.lower(ts, env_state, obs, rng).compile()
    extra = roofline(compiled, iters / dt, jax.devices()[0])

    print(json.dumps({
        "metric": "PPO end-to-end env-steps/sec, 256 envs (render+map+update)",
        "value": round(steps_per_sec, 2),
        "unit": "env_steps_per_sec",
        "vs_baseline": round(steps_per_sec / REFERENCE_EST_STEPS_PER_SEC, 3),
        **extra,
    }))


if __name__ == "__main__":
    main()
