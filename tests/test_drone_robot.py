"""Physics drone (the legged_gym robot-layer re-creation): dynamics sanity,
env contract, auto-reset, reward registry, and PPO learnability.

Reference behaviors covered: PD/decimation control step
(legged_gym/env/base/drone_robot.py:91-117), reward registry scale x dt
(:660-691,874-884), randomized resets (:456-480), impulse pushes (:483),
command resampling (:388-413), termination + timeout semantics.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gennbv_tpu.env.drone_robot import (DroneCommands, DroneDomainRand,
                                        DroneRobot, DroneRobotConfig,
                                        DroneState)
from gennbv_tpu.utils.env_checker import check_env


def _quiet_cfg(**kw):
    """No domain rand / pushes / obs noise: deterministic physics for tests."""
    return DroneRobotConfig(
        domain_rand=DroneDomainRand(randomize_mass=False, push_robots=False),
        **kw,
    )


def _hover_state(env, n=4):
    """A clean hover state: level, at rest, rotors at hover speed."""
    a = env.cfg.asset
    return DroneState(
        pos=jnp.zeros((n, 3)).at[:, 2].set(env.cfg.init_height),
        quat=jnp.tile(jnp.array([0.0, 0.0, 0.0, 1.0]), (n, 1)),
        lin_vel=jnp.zeros((n, 3)),
        ang_vel=jnp.zeros((n, 3)),
        rotor_vel=jnp.full((n, 4), a.hover_rotor),
        commands=jnp.zeros((n, 4)),
        last_action=jnp.zeros((n, 4)),
        last_torque=jnp.zeros((n, 4)),
        added_mass=jnp.zeros(n),
        episode_len=jnp.zeros(n, jnp.int32),
        ep_reward=jnp.zeros(n),
        rng=jax.random.PRNGKey(7),
    )


def test_env_contract():
    check_env(DroneRobot(_quiet_cfg()), num_envs=4, steps=8)


def test_hover_equilibrium():
    """Zero action = rotors servo to hover speed: the drone must stay put
    (thrust mixing + gravity cancel exactly at 4 k w_h^2 = m g)."""
    env = DroneRobot(_quiet_cfg())
    state = _hover_state(env)
    step = jax.jit(env.step)
    for _ in range(50):
        state, out = step(state, jnp.zeros((4, 4)))
    np.testing.assert_allclose(np.asarray(state.pos[:, 2]),
                               env.cfg.init_height, atol=1e-3)
    assert float(jnp.abs(state.lin_vel).max()) < 1e-3
    assert float(jnp.abs(state.ang_vel).max()) < 1e-3


def test_collective_thrust_climbs():
    """Uniform positive action spins all rotors up -> net upward force."""
    env = DroneRobot(_quiet_cfg())
    state = _hover_state(env)
    step = jax.jit(env.step)
    for _ in range(10):
        state, _ = step(state, jnp.full((4, 4), 0.5))
    assert float(state.lin_vel[:, 2].min()) > 0.1
    assert float(state.pos[:, 2].min()) > env.cfg.init_height
    # pure collective thrust produces no rotation
    assert float(jnp.abs(state.ang_vel).max()) < 1e-4


def test_yaw_torque_sign():
    """Speeding up the CCW pair (rotors 0, 2) adds +z drag torque."""
    env = DroneRobot(_quiet_cfg())
    state = _hover_state(env)
    act = jnp.tile(jnp.array([0.2, -0.2, 0.2, -0.2]), (4, 1))
    state, _ = jax.jit(env.step)(state, act)
    assert float(state.ang_vel[:, 2].min()) > 0.0
    # symmetric pair speeds: no net pitch/roll torque
    assert float(jnp.abs(state.ang_vel[:, :2]).max()) < 1e-5


def test_crash_terminates_and_resets():
    env = DroneRobot(_quiet_cfg())
    state = _hover_state(env)
    # bury the drone below ground: crash -> done -> auto-reset near spawn
    state = state._replace(pos=state.pos.at[:, 2].set(-0.1),
                           episode_len=jnp.full(4, 5, jnp.int32),
                           ep_reward=jnp.full(4, 3.0))
    state, out = jax.jit(env.step)(state, jnp.zeros((4, 4)))
    assert bool(out.done.all()) and not bool(out.time_out.any())
    # termination penalty applied on the crash step (scale x dt, negative)
    assert float(out.reward.max()) < 0.0
    # fresh spawn: near init height, episode counters cleared
    np.testing.assert_allclose(np.asarray(state.pos[:, 2]),
                               env.cfg.init_height, atol=1e-6)
    assert int(state.episode_len.max()) == 0
    assert float(jnp.abs(state.ep_reward).max()) == 0.0


def test_timeout_flags():
    env = DroneRobot(_quiet_cfg(max_episode_length_s=0.1))  # 5 control steps
    rng = jax.random.PRNGKey(0)
    state, _ = env.reset(4, rng)
    step = jax.jit(env.step)
    douts = []
    for _ in range(env.max_episode_length):
        state, out = step(state, jnp.zeros((4, 4)))
        douts.append(out)
    last = douts[-1]
    assert bool(last.time_out.all()) and bool(last.done.all())
    # no env flagged done before its clock ran out (hover is stable)
    assert not any(bool(o.done.any()) for o in douts[:-1])


def test_reward_registry_scales_by_dt():
    """Nonzero scales resolve to _reward_<name> and are multiplied by the
    CONTROL dt (drone_robot.py:874-884); termination is kept out of the
    per-step list (applied on crash only, legged_robot.py:679 semantics)."""
    cfg = _quiet_cfg(reward_scales={"alive": 2.0, "termination": -5.0,
                                    "orientation": 0.0})
    env = DroneRobot(cfg)
    names = [n for n, _, _ in env.reward_fns]
    assert names == ["alive"]
    _, scale, _ = env.reward_fns[0]
    assert scale == pytest.approx(2.0 * env.dt)
    assert env.termination_scale == pytest.approx(-5.0 * env.dt)
    # with only `alive` active, a hover step earns exactly scale
    state = _hover_state(env)
    _, out = jax.jit(env.step)(state, jnp.zeros((4, 4)))
    np.testing.assert_allclose(np.asarray(out.reward), 2.0 * env.dt, rtol=1e-6)


def test_command_resampling_and_push():
    cfg = DroneRobotConfig(
        domain_rand=DroneDomainRand(randomize_mass=False, push_robots=True,
                                    push_interval_s=0.04, max_push_vel_xy=3.0),
        commands=DroneCommands(resampling_time_s=0.04),
    )
    env = DroneRobot(cfg)
    assert env.push_interval == 2 and env.resample_interval == 2
    state = _hover_state(env)
    cmd0 = state.commands
    step = jax.jit(env.step)
    state, _ = step(state, jnp.zeros((4, 4)))          # len=1: no events
    assert bool(jnp.all(state.commands == cmd0))
    vel_before = state.lin_vel[:, :2]
    state, _ = step(state, jnp.zeros((4, 4)))          # len=2: push + resample
    assert not bool(jnp.all(state.commands == cmd0))
    assert not bool(jnp.all(jnp.isclose(state.lin_vel[:, :2], vel_before)))


def test_registry_task():
    from gennbv_tpu import registry
    env, dcfg = registry.make_env("drone_velocity", None)
    assert isinstance(env, DroneRobot)
    assert isinstance(dcfg, DroneRobotConfig)
    assert "drone_velocity" in registry.task_names()


def _det_eval(runner, env, steps=80, n=32):
    policy = runner.get_inference_policy()
    state, out = env.reset(n, jax.random.PRNGKey(42))
    step = jax.jit(env.step)
    tot = 0.0
    for _ in range(steps):
        state, out = step(state, policy(out.obs))
        tot += float(out.reward.mean())
    return tot / steps


@pytest.mark.slow
def test_ppo_learnability():
    """The continuous stack (OnPolicyRunner + adaptive-KL Gaussian PPO)
    improves velocity-tracking reward on the physics drone from scratch."""
    from gennbv_tpu.algo import ppo_continuous as ppoc
    from gennbv_tpu.algo.on_policy_runner import (OnPolicyRunner,
                                                  OnPolicyRunnerConfig)

    cfg = _quiet_cfg(max_episode_length_s=2.0)
    env = DroneRobot(cfg)
    runner = OnPolicyRunner(
        env, ppoc.ContinuousPPOConfig(learning_rate=3e-4),
        OnPolicyRunnerConfig(num_steps_per_env=24),
        num_envs=64, seed=3, actor_hidden=(64, 64), critic_hidden=(64, 64))
    runner.learn(1)
    r0 = _det_eval(runner, env)
    runner.learn(80)
    r1 = _det_eval(runner, env)
    assert np.isfinite(r0) and np.isfinite(r1)
    # measured: r0 ~ -0.019, r1 ~ -0.001 on this seed/config
    assert r1 > r0 + 0.005, (r0, r1)
