"""Training with periodic held-out-scene evaluation
(reference: gennbv/train/train_eval_gennbv.py — 256 train envs + 50 eval envs
in a SubprocVecEnv worker; here the eval batch is just a second jitted env on
the same mesh, SURVEY §2.7).
"""
from __future__ import annotations

import dataclasses

from gennbv_tpu import spec
from gennbv_tpu.config import apply_overrides
from gennbv_tpu.env import make_scenes
from gennbv_tpu.train.train_gennbv import build_argparser, config_from_args


def main(argv=None):
    p = build_argparser()
    p.add_argument("--eval_seed", type=int, default=100)
    p.add_argument("--eval_dataset", type=str, default=None,
                   help="scene dataset for the held-out eval batch (default: "
                        "the training dataset — correct for procedural "
                        "generators, where the eval seed yields unseen "
                        "scenes, but a converted-mesh directory needs its "
                        "own held-out directory: the reference's batch-12 "
                        "setA split, env_eval_gennbv.py:16-50)")
    args = p.parse_args(argv)
    cfg = config_from_args(args)
    if cfg.runner.eval_freq == 0:
        # reference eval_freq = 500000 / num_envs env-steps ~= every 15 iters
        cfg = apply_overrides(cfg, ("runner.eval_freq=15",))

    from gennbv_tpu.algo.runner import Runner

    # held-out eval scenes: one per eval env, different generator seed
    # (or a separate converted-mesh directory via --eval_dataset)
    eval_scene_cfg = dataclasses.replace(
        cfg.env.scene, num_scenes=spec.EVAL_NUM_ENVS, seed=args.eval_seed,
        **({"dataset": args.eval_dataset} if args.eval_dataset else {})
    )
    eval_scenes = make_scenes(eval_scene_cfg, cfg.env.renderer.resolution)

    runner = Runner(cfg, eval_scenes=eval_scenes)
    if args.resume:
        step = runner.restore(args.resume)
        print(f"resumed from {args.resume} at step {step}")
    elif args.resume_params:
        runner.restore(args.resume_params, params_only=True)
        print(f"warm-started params from {args.resume_params}")
    try:
        metrics = runner.train(cfg.ppo.total_iters)
        print("final:", {k: round(v, 4) for k, v in metrics.items()})
    finally:
        runner.close()


if __name__ == "__main__":
    main()
