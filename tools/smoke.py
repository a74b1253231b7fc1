"""One-command verifier: CPU-mesh training CLI + multichip dryrun (+ TPU bench).

Runs the three driver-facing surfaces as subprocesses (the axon
sitecustomize hook pre-imports jax, so platform env vars must be set before
each python process starts — this script never imports jax itself):

  1. train CLI, 2 iterations on the virtual 8-device CPU mesh
  2. __graft_entry__.dryrun_multichip(8) on the CPU mesh
  3. (--tpu) bench.py on the real chip — skip when another process owns the
     tunnel (only one may)

Usage: python tools/smoke.py [--tpu]
Exit code 0 = all surfaces pass.
"""
from __future__ import annotations

import argparse
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

def cpu_env() -> dict:
    """CPU-mesh env overrides, appending to (not clobbering) XLA_FLAGS."""
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        flags = (flags + " --xla_force_host_platform_device_count=8").strip()
    return {
        "PALLAS_AXON_POOL_IPS": "",
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": flags,
    }


def run(name: str, cmd: list[str], env_extra: dict | None = None,
        timeout: int = 900) -> bool:
    env = dict(os.environ)
    env.update(env_extra or {})
    print(f"--- {name}: {' '.join(cmd)}", flush=True)
    try:
        proc = subprocess.run(cmd, cwd=ROOT, env=env, timeout=timeout,
                              capture_output=True, text=True)
    except subprocess.TimeoutExpired:
        print(f"FAIL {name}: timeout after {timeout}s", flush=True)
        return False
    tail = "\n".join((proc.stdout + proc.stderr).strip().splitlines()[-6:])
    if proc.returncode != 0:
        print(f"FAIL {name} (exit {proc.returncode}):\n{tail}", flush=True)
        return False
    print(f"OK   {name}\n{tail}\n", flush=True)
    return True


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tpu", action="store_true",
                    help="also run bench.py on the real chip")
    args = ap.parse_args()

    ok = run("train-cli (CPU mesh)", [
        sys.executable, "-m", "gennbv_tpu.train.train_gennbv",
        "--num_envs", "8", "--max_iterations", "2",
        "--set", "env.camera.height=16", "--set", "env.camera.width=16",
        "--set", "env.renderer.resolution=16",
        "--set", "env.scene.num_scenes=4",
        "--set", "ppo.n_steps=4", "--set", "ppo.batch_size=16",
    ], cpu_env())
    ok &= run("dryrun_multichip(8)", [
        sys.executable, "-c",
        "import __graft_entry__ as g; g.dryrun_multichip(8)",
    ], cpu_env())
    if args.tpu:
        ok &= run("bench.py (real TPU)", [sys.executable, "bench.py"],
                  {"JAX_COMPILATION_CACHE_DIR": os.path.join(ROOT, ".jax_cache")},
                  timeout=3600)
    print("SMOKE", "PASS" if ok else "FAIL", flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
