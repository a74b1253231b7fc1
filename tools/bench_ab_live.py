"""Interleaved A/B live-throughput comparison of two renderer configs.

Between-process fps comparisons on the axon tunnel are confounded by
host-load and session conditions (round 3: two IDENTICAL dense-400 runs
read 6,386 vs 4,899 steps/s when the second overlapped CPU work).  This
tool compiles BOTH configurations in ONE process and alternates blocks of
full training iterations A,B,A,B,... so every block shares process/tunnel
conditions; the per-variant medians are then directly comparable.

Usage:
  python tools/bench_ab_live.py --cam 400 --blocks 3 --iters 4 \
      --a env.renderer.band_split=0 --b env.renderer.band_split=8

Prints one JSON line with per-block seconds and per-variant median fps.
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cam", type=int, default=400)
    ap.add_argument("--num_envs", type=int, default=256)
    ap.add_argument("--blocks", type=int, default=3,
                    help="A/B block pairs after warmup")
    ap.add_argument("--iters", type=int, default=4, help="iterations per block")
    ap.add_argument("--a", action="append", default=[], metavar="KEY=VAL")
    ap.add_argument("--b", action="append", default=[], metavar="KEY=VAL")
    args = ap.parse_args()

    import jax

    from gennbv_tpu.config import Config, apply_overrides
    from gennbv_tpu.algo.runner import Runner
    from gennbv_tpu.env import make_scenes

    base = Config()
    base = apply_overrides(base, (
        f"env.num_envs={args.num_envs}",
        f"env.camera.height={args.cam}", f"env.camera.width={args.cam}",
        f"env.scene.num_scenes={args.num_envs}",
        "runner.save_freq=0",
    ))
    cfg_a = apply_overrides(base, tuple(args.a))
    cfg_b = apply_overrides(base, tuple(args.b))
    # one SceneSet shared by both variants (same seed/geometry)
    scenes = make_scenes(cfg_a.env.scene, cfg_a.env.renderer.resolution)

    def setup(cfg):
        r = Runner(cfg, scenes=scenes)
        env_state, obs = r.setup()
        return {"r": r, "ts": r.train_state, "st": env_state, "obs": obs,
                "rng": r.rng}

    sides = {"A": setup(cfg_a), "B": setup(cfg_b)}

    def block(side, n):
        s = sides[side]
        t0 = time.perf_counter()
        for _ in range(n):
            s["ts"], s["st"], s["obs"], s["rng"], m = s["r"]._train_iter(
                s["ts"], s["st"], s["obs"], s["rng"])
        jax.block_until_ready(m)
        return time.perf_counter() - t0

    # compile + warmup both (discard)
    for side in ("A", "B"):
        dt = block(side, 1)
        print(f"warmup {side}: {dt:.1f}s (compile)", flush=True)

    steps = args.iters * args.num_envs * base.ppo.n_steps
    results = {"A": [], "B": []}
    for i in range(args.blocks):
        for side in ("A", "B"):
            dt = block(side, args.iters)
            fps = steps / dt
            results[side].append(round(fps, 1))
            print(f"block {i} {side}: {fps:,.0f} steps/s", flush=True)

    med = {k: sorted(v)[len(v) // 2] for k, v in results.items()}
    print(json.dumps({
        "metric": f"interleaved A/B live fps, cam={args.cam}, {args.num_envs} envs",
        "a_overrides": args.a, "b_overrides": args.b,
        "blocks": results, "median_fps": med,
        "b_over_a": round(med["B"] / med["A"], 4),
    }))


if __name__ == "__main__":
    main()
