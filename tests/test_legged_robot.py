"""Physics quadruped (the LeggedRobot half of the legged_gym robot layer):
dynamics sanity, env contract, curricula, robot zoo, and PPO learnability.

Reference behaviors covered: PD position control under decimation
(legged_gym/env/base/legged_robot.py:91-117,414-438), the legged reward
registry (scale x dt, :660-691), heading-mode commands (:367-370), feet
air time (:1034-1047), contact-driven termination (:160-167), terrain +
command curricula (:486-520).
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gennbv_tpu.env.legged_robot import (LeggedCommands, LeggedDomainRand,
                                         LeggedRobot, LeggedRobotConfig,
                                         LeggedTerrain, anymal_b_config,
                                         anymal_c_config, cassie_config)
from gennbv_tpu.utils.env_checker import check_env


def _quiet_cfg(**kw):
    """No pushes / friction rand / noise: deterministic physics."""
    return LeggedRobotConfig(
        domain_rand=LeggedDomainRand(randomize_friction=False,
                                     push_robots=False),
        commands=LeggedCommands(heading_command=False),
        **kw,
    )


def _standing_state(env, n=4):
    """Default pose at spawn height over flat ground, zero velocities."""
    state, _ = env.reset(n, jax.random.PRNGKey(0))
    q0 = jnp.tile(env.default_q.reshape(-1), (n, 1))
    pos = jnp.zeros((n, 3)).at[:, 2].set(env.stand_height)
    foot_hip, _ = env._feet_and_jac(q0)
    feet = pos[:, None, :] + env.hip_pos[None] + foot_hip  # identity quat
    return state._replace(
        pos=pos,
        quat=jnp.tile(jnp.array([0.0, 0.0, 0.0, 1.0]), (n, 1)),
        lin_vel=jnp.zeros((n, 3)), ang_vel=jnp.zeros((n, 3)),
        q=q0, qd=jnp.zeros((n, env.nj)), foot_anchor=feet[..., :2],
        commands=jnp.zeros((n, 4)), episode_len=jnp.zeros(n, jnp.int32))


def test_env_contract():
    check_env(LeggedRobot(_quiet_cfg()), num_envs=4, steps=8)


def _stiff_stand_cfg(**kw):
    """Stance-test gains.  At the A1 training gains (Kp=20) the PASSIVE
    zero-action stance is not an attractor — leg sag walks the trunk off
    the support polygon in ~1 s (the reference's PhysX robot wobbles and
    falls under zero actions too; its smoke test asserts nothing,
    legged_gym/tests/test_env.py:42-52 — the POLICY stabilizes stance).
    A stiffer servo makes the stance statically stable, which is what
    validates the contact + stiction + J^T F load path here."""
    import dataclasses as dc
    cfg = _quiet_cfg(**kw)
    return dc.replace(cfg, control=dc.replace(cfg.control, stiffness=60.0,
                                              damping=2.0))


def test_stands_under_gravity():
    """Zero actions at stance gains: the robot settles into a stable
    stance (feet carry the trunk through J^T F + PD) for 4 s of sim."""
    env = LeggedRobot(_stiff_stand_cfg())
    state = _standing_state(env)
    step = jax.jit(env.step)
    for _ in range(200):                       # 4 s
        state, out = step(state, jnp.zeros((4, env.nj)))
        assert not bool(out.done.any()), "fell while standing"
    h = np.asarray(state.pos[:, 2])
    # settled: above the termination clearance, below spawn (gravity sag)
    assert (h > env.cfg.asset.base_clearance + 0.05).all(), h
    assert (h < env.stand_height + 0.05).all(), h
    # supported: total normal force carries the robot's weight
    fz = np.asarray(state.contact_forces[..., 2])
    total = fz.sum(axis=1)
    mg = env.cfg.asset.mass * 9.81
    np.testing.assert_allclose(total, mg, rtol=0.4)


def test_fall_terminates_and_resets():
    env = LeggedRobot(_quiet_cfg())
    state = _standing_state(env)
    # roll the trunk past the tilt limit mid-air: crash -> auto-reset
    q_rolled = jnp.tile(jnp.array([np.sin(0.75), 0.0, 0.0, np.cos(0.75)]),
                        (4, 1))   # 1.5 rad roll
    state = state._replace(quat=q_rolled,
                           episode_len=jnp.full(4, 5, jnp.int32))
    state, out = jax.jit(env.step)(state, jnp.zeros((4, env.nj)))
    assert bool(out.done.all()) and not bool(out.time_out.any())
    assert int(state.episode_len.max()) == 0   # fresh spawn


def test_reward_registry_scales_by_dt():
    cfg = _quiet_cfg(reward_scales={"alive": 2.0, "termination": -5.0,
                                    "orientation": 0.0})
    env = LeggedRobot(cfg)
    names = [n for n, _, _ in env.reward_fns]
    assert names == ["alive"]
    _, scale, _ = env.reward_fns[0]
    assert scale == pytest.approx(2.0 * env.dt)
    assert env.termination_scale == pytest.approx(-5.0 * env.dt)


def test_heading_command_servo():
    """heading_command=True recomputes the yaw-rate command from heading
    error each step (legged_robot.py:367-370)."""
    cfg = LeggedRobotConfig(
        domain_rand=LeggedDomainRand(randomize_friction=False,
                                     push_robots=False),
        commands=LeggedCommands(heading_command=True))
    env = LeggedRobot(cfg)
    state = _standing_state(env)
    # facing +x (identity quat), heading target pi/2 -> positive yaw cmd
    state = state._replace(
        commands=jnp.zeros((4, 4)).at[:, 3].set(jnp.pi / 2))
    state, _ = jax.jit(env.step)(state, jnp.zeros((4, env.nj)))
    yaw_cmd = np.asarray(state.commands[:, 2])
    np.testing.assert_allclose(yaw_cmd, np.pi / 4 * 0 + np.clip(
        0.5 * np.pi / 2, -1, 1), atol=0.2)
    assert (yaw_cmd > 0.2).all()


def test_feet_air_time_accrues():
    """Feet held off the ground accrue air time; planting them pays out
    (air - 0.5) on first contact when a command is active."""
    env = LeggedRobot(_quiet_cfg())
    state = _standing_state(env)
    # float the trunk high: no contact
    state = state._replace(pos=state.pos.at[:, 2].set(1.0),
                           commands=jnp.zeros((4, 4)).at[:, 0].set(0.8))
    step = jax.jit(env.step)
    state, _ = step(state, jnp.zeros((4, env.nj)))
    assert float(state.feet_air_time.min()) > 0.0
    assert not bool(state.last_contacts.any())


def test_terrain_rough_amplitude_and_determinism():
    cfg = _quiet_cfg(terrain=LeggedTerrain(mesh_type="rough",
                                           max_amplitude=0.1,
                                           num_levels=10))
    env = LeggedRobot(cfg)
    x = jnp.linspace(-3, 3, 64)
    y = jnp.linspace(-3, 3, 64)
    lvl0 = jnp.zeros(64, jnp.int32)
    lvl9 = jnp.full(64, 9, jnp.int32)
    h0 = env.terrain_height(x, y, lvl0)
    h0b = env.terrain_height(x, y, lvl0)
    h9 = env.terrain_height(x, y, lvl9)
    np.testing.assert_array_equal(np.asarray(h0), np.asarray(h0b))
    assert float(h9.max()) <= 0.1 + 1e-6
    assert float(h9.max()) > float(h0.max())   # amplitude grows with level
    assert float(h0.max()) <= 0.1 * (1 / 10) + 1e-6


def test_terrain_curriculum_promotes():
    cfg = _quiet_cfg(terrain=LeggedTerrain(mesh_type="rough",
                                           curriculum=True,
                                           terrain_length=1.0))
    env = LeggedRobot(cfg)
    state = _standing_state(env)
    # pretend the env walked 1.2 m and times out this step
    state = state._replace(
        walked=jnp.full((4, 2), 1.2 / np.sqrt(2)),
        terrain_level=jnp.zeros(4, jnp.int32),
        episode_len=jnp.full(4, env.max_episode_length - 1, jnp.int32))
    state, out = jax.jit(env.step)(state, jnp.zeros((4, env.nj)))
    assert bool(out.time_out.all())
    assert (np.asarray(state.terrain_level) == 1).all()


def test_robot_zoo_configs():
    for make, nj in [(anymal_b_config, 12), (anymal_c_config, 12),
                     (cassie_config, 6)]:
        cfg = make(domain_rand=LeggedDomainRand(randomize_friction=False,
                                                push_robots=False))
        env = LeggedRobot(cfg)
        assert env.nj == nj
        assert env.obs_dim == 12 + 3 * nj
        state, out = env.reset(2, jax.random.PRNGKey(1))
        state, out = jax.jit(env.step)(state, jnp.zeros((2, env.nj)))
        assert out.obs.shape == (2, env.obs_dim)
        assert bool(jnp.isfinite(out.obs).all())


def test_measure_heights_obs():
    cfg = _quiet_cfg(terrain=LeggedTerrain(mesh_type="rough",
                                           measure_heights=True))
    env = LeggedRobot(cfg)
    assert env.obs_dim == 12 + 36 + 187
    state, out = env.reset(2, jax.random.PRNGKey(2))
    assert out.obs.shape == (2, env.obs_dim)
    assert bool(jnp.isfinite(out.obs).all())


def test_registry_task():
    from gennbv_tpu import registry
    env, cfg = registry.make_env("a1_velocity", None)
    assert isinstance(env, LeggedRobot)
    assert env.nj == 12
    assert "a1_velocity" in registry.task_names()


def _det_eval(runner, env, steps=120, n=64):
    """Deterministic-policy eval: (mean step reward, mean done rate)."""
    policy = runner.get_inference_policy()
    state, out = env.reset(n, jax.random.PRNGKey(42))
    step = jax.jit(env.step)
    tot, dones = 0.0, 0.0
    for _ in range(steps):
        state, out = step(state, policy(out.obs))
        tot += float(out.reward.mean())
        dones += float(out.done.mean())
    return tot / steps, dones / steps


@pytest.mark.slow
def test_ppo_learnability():
    """The continuous stack (OnPolicyRunner + adaptive-KL Gaussian PPO)
    learns active stand stabilization on the quadruped from scratch.

    Scope note: full velocity-tracking locomotion needs ~10^8 env steps in
    the reference (legged_gym README trains 1.5k iters x 4096 envs); a CI
    budget of ~10^5 steps can only learn the dense, fast-timescale part of
    the task — keep the trunk up at the training gains (Kp=20), where the
    PASSIVE stance is unstable (see test_stands_under_gravity's note).  So
    the task here is stand-keeping under dense penalties with zero velocity
    commands, and the learning signal asserted is the one that improves
    monotonically from the first iterations: the crash rate of the
    deterministic policy (measured over 64 envs x 120 steps = 7680
    env-steps, ~80 crash events under the iteration-1 policy)."""
    from gennbv_tpu.algo import ppo_continuous as ppoc
    from gennbv_tpu.algo.on_policy_runner import (OnPolicyRunner,
                                                  OnPolicyRunnerConfig)

    cfg = LeggedRobotConfig(
        domain_rand=LeggedDomainRand(randomize_friction=False,
                                     push_robots=False),
        commands=LeggedCommands(heading_command=False,
                                lin_vel_x=(0.0, 0.0), lin_vel_y=(0.0, 0.0),
                                ang_vel_yaw=(0.0, 0.0)),
        max_episode_length_s=4.0,
        only_positive_rewards=False,
        reward_scales={
            "alive": 5.0,
            "orientation": -5.0,
            "base_height": -50.0,
            "lin_vel_z": -2.0,
            "ang_vel_xy": -0.1,
            "torques": -1e-4,
            "action_rate": -0.01,
            "termination": -10.0,
        },
    )
    env = LeggedRobot(cfg)
    runner = OnPolicyRunner(
        env, ppoc.ContinuousPPOConfig(learning_rate=3e-4),
        OnPolicyRunnerConfig(num_steps_per_env=24),
        num_envs=64, seed=3, actor_hidden=(64, 64), critic_hidden=(64, 64))
    runner.learn(1)
    r0, d0 = _det_eval(runner, env)
    runner.learn(80)
    r1, d1 = _det_eval(runner, env)
    assert np.isfinite(r0) and np.isfinite(r1)
    assert d0 > 0.002, d0      # the task is non-trivial at iteration 1
    assert d1 <= 0.5 * d0, (d0, d1)   # crash rate at least halved
    assert r1 > 0.8 * r0, (r0, r1)    # reward did not collapse
