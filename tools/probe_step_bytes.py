"""Per-buffer HBM accounting of the compiled batched env.step.

Compiles the 256-env step at a given sensor (CPU or TPU — byte counts
are backend-layout-approximate but the ranking is what matters), then
ranks the HLO instructions by output-buffer size and sums XLA's
cost-analysis bytes.  Used in round 3 to find the [N, Q, G^2] one-hot
materialization behind the 128^2 bandwidth wall (ops/pallas_scatter.py).

Usage: python tools/probe_step_bytes.py [--cam 128] [--num_envs 256]
       [--set env.renderer.scatter_impl=pallas ...]
"""
from __future__ import annotations

import argparse
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(ROOT, ".jax_cache"))

DTYPE_BYTES = {"f64": 8, "f32": 4, "s32": 4, "u32": 4, "bf16": 2, "f16": 2,
               "s16": 2, "u16": 2, "s8": 1, "u8": 1, "pred": 1}

SHAPE_RE = re.compile(r"\b(f64|f32|s32|u32|bf16|f16|s16|u16|s8|u8|pred)"
                      r"\[([0-9,]*)\]")


def buf_bytes(shape_str: str) -> int:
    total = 0
    for dt, dims in SHAPE_RE.findall(shape_str):
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * DTYPE_BYTES[dt]
    return total


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cam", type=int, default=128)
    ap.add_argument("--num_envs", type=int, default=256)
    ap.add_argument("--top", type=int, default=15)
    ap.add_argument("--set", action="append", default=[], metavar="KEY=VAL")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from gennbv_tpu.config import Config, apply_overrides
    from gennbv_tpu.env import ReconEnv, make_scenes

    cfg = Config()
    cfg = apply_overrides(cfg, (
        f"env.num_envs={args.num_envs}",
        f"env.camera.height={args.cam}", f"env.camera.width={args.cam}",
        f"env.scene.num_scenes={args.num_envs}",
    ) + tuple(args.set))
    scenes = make_scenes(cfg.env.scene, cfg.env.renderer.resolution)
    env = ReconEnv(cfg.env, scenes)
    state, _ = env.reset(cfg.env.num_envs)
    acts = jnp.zeros((cfg.env.num_envs, 6), jnp.int32)

    step = jax.jit(env.step)
    lowered = step.lower(state, acts)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    print(f"cost_analysis: flops={ca.get('flops', 0):.3e} "
          f"bytes={ca.get('bytes accessed', 0):.3e}")

    # rank instructions by output-buffer size (top-level + fusion roots)
    rows = []
    for line in compiled.as_text().splitlines():
        line = line.strip()
        m = re.match(r"(?:ROOT )?%?([\w.\-]+) = (\(?[^)]*?\)?) (\w+)\(", line)
        if not m:
            continue
        name, shape_str, op = m.groups()
        b = buf_bytes(shape_str)
        if b > 0:
            rows.append((b, op, name, shape_str[:90]))
    rows.sort(reverse=True)
    seen = set()
    shown = 0
    print(f"\ntop-{args.top} output buffers (dedup by shape+op):")
    for b, op, name, shape in rows:
        key = (op, shape)
        if key in seen:
            continue
        seen.add(key)
        print(f"  {b/1e9:8.3f} GB  {op:<12} {name:<28} {shape}")
        shown += 1
        if shown >= args.top:
            break


if __name__ == "__main__":
    main()
