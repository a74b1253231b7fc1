"""Training entry point (reference: gennbv/train/train_gennbv.py).

    python -m gennbv_tpu.train.train_gennbv --num_envs 256 --max_iterations 1000

Any config field can be overridden with `--set a.b.c=value`.
"""
from __future__ import annotations

import argparse
import dataclasses

from gennbv_tpu.config import Config, apply_overrides


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--num_envs", type=int, default=None)
    p.add_argument("--max_iterations", type=int, default=None)
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--max_episode_length", type=int, default=None)
    p.add_argument("--num_scenes", type=int, default=None)
    p.add_argument("--learning_rate", type=float, default=None)
    p.add_argument("--log_dir", type=str, default=None)
    p.add_argument("--exp_name", type=str, default=None)
    p.add_argument("--wandb", action="store_true")
    p.add_argument("--eval_freq", type=int, default=None,
                   help="iterations between in-training evals (train_eval entry)")
    p.add_argument("--set", action="append", default=[], metavar="KEY=VAL",
                   help="dotted-path config override, e.g. env.camera.height=400")
    p.add_argument("--resume", type=str, default=None, metavar="MODELS_DIR",
                   help="resume from the latest rl_model_*_steps checkpoint "
                        "in this directory (reference: --resume/get_load_path, "
                        "legged_gym/utils/helpers.py:108-131)")
    p.add_argument("--resume_params", type=str, default=None,
                   metavar="MODELS_DIR",
                   help="warm-start {params, batch_stats} only from the "
                        "latest checkpoint; fresh optimizer + step counter "
                        "(fine-tune mode; reference: model.set_parameters, "
                        "gennbv/train/train_gennbv.py:218-220)")
    return p


def config_from_args(args) -> Config:
    cfg = Config()
    if args.num_envs is not None:
        cfg = apply_overrides(cfg, (f"env.num_envs={args.num_envs}",))
    if args.max_iterations is not None:
        cfg = apply_overrides(cfg, (f"ppo.total_iters={args.max_iterations}",))
    if args.seed is not None:
        cfg = apply_overrides(cfg, (f"runner.seed={args.seed}",))
    if args.max_episode_length is not None:
        cfg = apply_overrides(cfg, (f"env.max_episode_length={args.max_episode_length}",))
    if args.num_scenes is not None:
        cfg = apply_overrides(cfg, (f"env.scene.num_scenes={args.num_scenes}",))
    if args.learning_rate is not None:
        cfg = apply_overrides(cfg, (f"ppo.learning_rate={args.learning_rate}",))
    if args.log_dir is not None:
        cfg = apply_overrides(cfg, (f"runner.log_dir={args.log_dir}",))
    if args.exp_name is not None:
        cfg = apply_overrides(cfg, (f"runner.experiment_name={args.exp_name}",))
    if args.eval_freq is not None:
        cfg = apply_overrides(cfg, (f"runner.eval_freq={args.eval_freq}",))
    if args.wandb:
        cfg = apply_overrides(cfg, ("runner.wandb=true",))
    cfg = apply_overrides(cfg, tuple(args.set))
    return cfg


def main(argv=None):
    args = build_argparser().parse_args(argv)
    cfg = config_from_args(args)

    from gennbv_tpu.algo.runner import Runner

    runner = Runner(cfg)
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
