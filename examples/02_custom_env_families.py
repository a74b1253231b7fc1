"""Train every algorithm family on a custom functional env.

Shows the env protocol (reset/step pytrees; see utils/env_checker.py) and
one-liner training with: PPO (adaptive-KL, rsl_rl-style), A2C, SAC, TD3,
DDPG, DQN, recurrent PPO, and HER — the full family the reference ships
via its SB3 fork, re-designed for TPU.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from gennbv_tpu.algo import ppo_continuous as ppoc
from gennbv_tpu.algo.dqn import DQNConfig, DQNRunner
from gennbv_tpu.algo.her import HERConfig, HERRunner
from gennbv_tpu.algo.off_policy import OffPolicyConfig, OffPolicyRunner
from gennbv_tpu.algo.on_policy_runner import OnPolicyRunner, OnPolicyRunnerConfig
from gennbv_tpu.algo.ppo_recurrent import RecurrentOnPolicyRunner
from gennbv_tpu.env.synthetic import (GoalPointEnv, IdentityEnvMultiDiscrete,
                                      PointGoalEnv)
from gennbv_tpu.utils.env_checker import check_env

env = PointGoalEnv(dim=2, ep_length=16)
check_env(env)  # validate the functional contract first

# --- on-policy (rsl_rl family): PPO with adaptive-KL learning rate
ppo = OnPolicyRunner(env, ppoc.ContinuousPPOConfig(learning_rate=1e-3),
                     OnPolicyRunnerConfig(num_steps_per_env=16),
                     num_envs=32, seed=0, actor_hidden=(32, 32),
                     critic_hidden=(32, 32))
print("ppo:", ppo.learn(5))

# --- A2C is the degenerate PPO (TF-style RMSprop)
a2c = OnPolicyRunner(env, ppoc.a2c_config(), OnPolicyRunnerConfig(num_steps_per_env=5),
                     num_envs=32, seed=0, actor_hidden=(32, 32), critic_hidden=(32, 32))
print("a2c:", a2c.learn(20))

# --- off-policy: SAC / TD3 / DDPG share one runner
sac = OffPolicyRunner(env, OffPolicyConfig(algo="sac", learning_starts=256,
                                           buffer_capacity=4096),
                      num_envs=16, seed=0)
print("sac mean reward:", sac.learn(200, chunk=50))

# --- DQN on a discrete task
dqn = DQNRunner(IdentityEnvMultiDiscrete(nvec=(4,), ep_length=8),
                DQNConfig(learning_starts=128, buffer_capacity=2048),
                num_envs=16, seed=0)
print("dqn mean reward:", dqn.learn(300, chunk=100))

# --- recurrent PPO (LSTM, BPTT) for memory tasks
rec = RecurrentOnPolicyRunner(env, ppoc.ContinuousPPOConfig(),
                              num_steps_per_env=8, num_envs=16, seed=0,
                              rnn_hidden=16, actor_hidden=(16,), critic_hidden=(16,))
print("recurrent ppo:", rec.learn(3))

# --- HER for sparse goal-conditioned tasks
her = HERRunner(GoalPointEnv(dim=2, ep_length=8),
                OffPolicyConfig(algo="sac", learning_starts=512,
                                buffer_capacity=8192),
                HERConfig(future_fraction=0.8), num_envs=16,
                capacity_episodes=512, seed=0)
her.learn(10)
print("her: trained", int(her.buffer.size), "episodes buffered")
