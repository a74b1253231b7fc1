"""Train the flagship next-best-view policy (tiny config for CPU demo).

Production settings are the defaults (`python -m gennbv_tpu.train.train_gennbv`
with no flags = the reference's 256-env configuration); this example shrinks
everything so it finishes in ~1 minute on CPU.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gennbv_tpu.algo.runner import Runner
from gennbv_tpu.config import (CameraConfig, Config, EnvConfig, PPOConfig,
                               RendererConfig, RunnerConfig, SceneConfig)

cfg = Config(
    env=EnvConfig(
        num_envs=8,
        camera=CameraConfig(height=16, width=16),
        renderer=RendererConfig(resolution=16),
        scene=SceneConfig(num_scenes=4, seed=0),
        max_episode_length=8,
    ),
    ppo=PPOConfig(n_steps=8, batch_size=16, n_epochs=2, total_iters=3),
    runner=RunnerConfig(seed=0, save_freq=0),
)

runner = Runner(cfg)
metrics = runner.train(cfg.ppo.total_iters, log=False)
print(f"final coverage: {metrics['rollout/final_coverage']:.3f}  "
      f"reward: {metrics['rollout/episode_reward']:.2f}")
runner.close()
