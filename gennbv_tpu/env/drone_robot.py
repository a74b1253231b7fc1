"""Physics drone: the TPU-native re-creation of the legged_gym robot layer.

The reference's `DroneRobot` (legged_gym/env/base/drone_robot.py:49) is a
torque-controlled robot env on Isaac Gym: PD control under decimation
(`step`/`_compute_torques`, drone_robot.py:91-117,414-438), a reward
registry that resolves `_reward_<name>` methods for every nonzero scale and
multiplies each scale by dt at prep time (`_prepare_reward_function`,
drone_robot.py:660-691, `_parse_cfg`:874-884), randomized resets
(`_reset_root_states`:456 — base vel in ±0.5, xy jitter), impulse pushes
(`_push_robots`:483), command resampling (`_resample_commands`:388), obs
noise (`_get_noise_scale_vec`:532) and mass domain randomization
(`_process_rigid_body_props`:352).  On the GenNBV path the physics is
overridden away by teleportation, so round 1 dropped this layer; this
module re-creates it as a LIVE, standalone-trainable velocity-tracking
task.

TPU-first design: instead of emulating Isaac's DOF tensors, the drone is a
real quadrotor — per-rotor first-order speed dynamics, thrust/drag-torque
X-mixing, and quaternion rigid-body integration — stepped `decimation`
times per control step inside `lax.scan`.  Everything is a pure function of
(state, action, PRNGKey): no sim handle, no host round-trips, fully
batchable with vmap and shardable along the env axis like every other env
here.  It satisfies the same jit-steppable VecEnv contract
(utils/env_checker.py) as ReconEnv, so the rsl_rl-family learners
(algo/ppo_continuous.py, algo/on_policy_runner.py) drive it unchanged.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from gennbv_tpu.utils import math as um


# ----------------------------------------------------------------------
@dataclasses.dataclass(frozen=True)
class DroneAsset:
    """Quadrotor physical constants (crazyflie-2-like scale; the reference
    loads resources/robots/drone/cf2x.urdf, config_gennbv_train.py:38)."""
    mass: float = 0.027                 # kg
    inertia: Tuple[float, float, float] = (1.4e-5, 1.4e-5, 2.17e-5)  # kg m^2
    arm_length: float = 0.0397          # m (rotor to center, X config)
    # thrust/drag coefficients in rad/s units, sized so max collective
    # thrust ~= 2.3x weight (hover at ~1734 rad/s, 67% of rotor_max)
    k_thrust: float = 2.2e-8            # N / (rad/s)^2 per rotor
    k_torque: float = 5.5e-10           # N m / (rad/s)^2 (yaw drag, ~2.5% kf)
    rotor_max: float = 2600.0           # rad/s
    rotor_tau: float = 0.017            # s, first-order rotor time constant
    drag: float = 9.2e-7                # N / (m/s) linear body drag
    gravity: float = -9.81

    @property
    def hover_rotor(self) -> float:
        """Rotor speed at hover: 4 k w^2 = m g."""
        return float((self.mass * -self.gravity / (4 * self.k_thrust)) ** 0.5)


@dataclasses.dataclass(frozen=True)
class DroneControl:
    """PD control config (legged_robot_config control section; control
    types at drone_robot.py:414-438)."""
    control_type: str = "V"        # "P" rotor-pos | "V" rotor-speed | "T" raw
    action_scale: float = 0.35     # fraction of rotor_max per unit action
    decimation: int = 4            # physics substeps per control step
    stiffness: float = 8.0         # p gain
    damping: float = 0.15          # d gain


@dataclasses.dataclass(frozen=True)
class DroneDomainRand:
    """drone_robot.py:299-383,483."""
    randomize_mass: bool = True
    added_mass_range: Tuple[float, float] = (-0.005, 0.005)   # kg
    push_robots: bool = True
    push_interval_s: float = 7.0
    max_push_vel_xy: float = 0.5


@dataclasses.dataclass(frozen=True)
class DroneCommands:
    """Velocity-command curriculum ranges (_resample_commands,
    drone_robot.py:388-413): [vx, vy, vz, yaw_rate]."""
    resampling_time_s: float = 5.0
    lin_vel_xy: Tuple[float, float] = (-1.0, 1.0)
    lin_vel_z: Tuple[float, float] = (-0.5, 0.5)
    ang_vel_yaw: Tuple[float, float] = (-1.0, 1.0)
    min_norm: float = 0.2          # small commands snap to zero (:412)


@dataclasses.dataclass(frozen=True)
class DroneRobotConfig:
    sim_dt: float = 0.005
    max_episode_length_s: float = 20.0
    clip_actions: float = 100.0    # normalization section defaults
    clip_observations: float = 100.0
    # reward scales: nonzero entries are resolved to _reward_<name> methods
    # and multiplied by the CONTROL dt at prep (drone_robot.py:874-884)
    reward_scales: Optional[Dict[str, float]] = None
    only_positive_rewards: bool = False
    tracking_sigma: float = 0.25
    termination_tilt: float = 1.2  # rad: crash when |tilt| exceeds
    ground_z: float = 0.0
    init_height: float = 1.0
    obs_noise: float = 0.0         # uniform noise amplitude on obs
    asset: DroneAsset = dataclasses.field(default_factory=DroneAsset)
    control: DroneControl = dataclasses.field(default_factory=DroneControl)
    domain_rand: DroneDomainRand = dataclasses.field(
        default_factory=DroneDomainRand)
    commands: DroneCommands = dataclasses.field(default_factory=DroneCommands)

    def resolved_reward_scales(self) -> Dict[str, float]:
        if self.reward_scales is not None:
            return dict(self.reward_scales)
        return {
            "tracking_lin_vel": 1.5,
            "tracking_ang_vel": 0.5,
            "orientation": -2.0,
            "ang_vel_xy": -0.05,
            "action_rate": -0.01,
            "torques": -1e-4,
            "termination": -5.0,
            "alive": 0.05,
        }


class DroneState(NamedTuple):
    pos: jnp.ndarray          # [N, 3]
    quat: jnp.ndarray         # [N, 4] (x, y, z, w) — Isaac convention
    lin_vel: jnp.ndarray      # [N, 3] world
    ang_vel: jnp.ndarray      # [N, 3] body
    rotor_vel: jnp.ndarray    # [N, 4]
    commands: jnp.ndarray     # [N, 4] vx, vy, vz, yaw_rate
    last_action: jnp.ndarray  # [N, 4]
    last_torque: jnp.ndarray  # [N, 4] rotor drive torques (for _reward_torques)
    added_mass: jnp.ndarray   # [N] domain-rand mass offset
    episode_len: jnp.ndarray  # [N] int32
    ep_reward: jnp.ndarray    # [N]
    rng: jax.Array


class DroneStepOut(NamedTuple):
    obs: jnp.ndarray
    reward: jnp.ndarray
    done: jnp.ndarray
    time_out: jnp.ndarray
    episode_reward: jnp.ndarray
    episode_length: jnp.ndarray


_GRAV_VEC = jnp.array([0.0, 0.0, -1.0])


class DroneRobot:
    """Velocity-tracking quadrotor, registered as task 'drone_velocity'.

    obs [N, 17]: body lin vel (3), body ang vel (3), projected gravity (3),
    commands (4), last action (4).  actions [N, 4] in [-clip, clip]."""

    def __init__(self, cfg: DroneRobotConfig = DroneRobotConfig()):
        self.cfg = cfg
        self.dt = cfg.sim_dt * cfg.control.decimation
        self.max_episode_length = int(round(cfg.max_episode_length_s / self.dt))
        self.num_actions = 4
        self.obs_dim = 17
        self.push_interval = max(
            1, int(round(cfg.domain_rand.push_interval_s / self.dt)))
        self.resample_interval = max(
            1, int(round(cfg.commands.resampling_time_s / self.dt)))
        # reward registry: nonzero scales -> bound methods, scale x dt
        # (_prepare_reward_function, drone_robot.py:660-691)
        self.reward_fns = []
        for name, scale in cfg.resolved_reward_scales().items():
            if scale == 0.0:
                continue
            if name == "termination":   # applied on crash, not per step
                continue
            self.reward_fns.append(
                (name, scale * self.dt, getattr(self, f"_reward_{name}")))
        self.termination_scale = (
            cfg.resolved_reward_scales().get("termination", 0.0) * self.dt)

    # -- spawn / reset --------------------------------------------------
    def _sample_commands(self, rng, n):
        c = self.cfg.commands
        kxy, kz, kyaw = jax.random.split(rng, 3)
        xy = jax.random.uniform(kxy, (n, 2), minval=c.lin_vel_xy[0],
                                maxval=c.lin_vel_xy[1])
        z = jax.random.uniform(kz, (n, 1), minval=c.lin_vel_z[0],
                               maxval=c.lin_vel_z[1])
        yaw = jax.random.uniform(kyaw, (n, 1), minval=c.ang_vel_yaw[0],
                                 maxval=c.ang_vel_yaw[1])
        # small commands snap to zero (drone_robot.py:412)
        keep = (jnp.linalg.norm(xy, axis=1, keepdims=True) > c.min_norm)
        return jnp.concatenate([xy * keep, z, yaw], axis=1)

    def _spawn(self, rng, n):
        cfg = self.cfg
        kxy, kv, km, kc = jax.random.split(rng, 4)
        pos = jnp.zeros((n, 3)).at[:, 2].set(cfg.init_height)
        # xy jitter within 1 m, vel in ±0.5 (_reset_root_states:456-480)
        pos = pos.at[:, :2].add(jax.random.uniform(kxy, (n, 2), minval=-1.0,
                                                   maxval=1.0))
        vel = jax.random.uniform(kv, (n, 6), minval=-0.5, maxval=0.5)
        added = jnp.where(
            cfg.domain_rand.randomize_mass,
            jax.random.uniform(km, (n,), minval=cfg.domain_rand.added_mass_range[0],
                               maxval=cfg.domain_rand.added_mass_range[1]),
            jnp.zeros(n))
        quat = jnp.tile(jnp.array([0.0, 0.0, 0.0, 1.0]), (n, 1))
        hover = cfg.asset.hover_rotor
        return dict(
            pos=pos, quat=quat, lin_vel=vel[:, :3], ang_vel=vel[:, 3:],
            rotor_vel=jnp.full((n, 4), hover),
            commands=self._sample_commands(kc, n),
            last_action=jnp.zeros((n, 4)), last_torque=jnp.zeros((n, 4)),
            added_mass=added,
        )

    def reset(self, num_envs: int, rng: jax.Array):
        r_spawn, r_state = jax.random.split(rng)
        f = self._spawn(r_spawn, num_envs)
        state = DroneState(
            episode_len=jnp.zeros(num_envs, jnp.int32),
            ep_reward=jnp.zeros(num_envs), rng=r_state, **f)
        return state, self._out(state, jnp.zeros(num_envs),
                                jnp.zeros(num_envs, bool),
                                jnp.zeros(num_envs, bool), r_state)

    # -- physics --------------------------------------------------------
    def _rotor_target(self, actions):
        a = self.cfg.asset
        c = self.cfg.control
        return jnp.clip(a.hover_rotor + actions * c.action_scale * a.rotor_max,
                        0.0, a.rotor_max)

    def _substep(self, carry, _):
        """One sim_dt of quadrotor dynamics (replaces gym.simulate in the
        decimation loop, drone_robot.py:101-110)."""
        pos, quat, lin_vel, ang_vel, rotor, target, added = carry
        cfg = self.cfg
        a = cfg.asset
        dt = cfg.sim_dt

        # rotor first-order dynamics toward PD target (control types P/V
        # collapse to a speed servo on a rotor; T drives speed directly).
        # `drive` is the applied speed increment; its rotor_max-normalized
        # form is the torque proxy _reward_torques penalizes
        # (drone_robot.py:982-985 penalizes N·m torques of similar scale)
        drive = (target - rotor) / a.rotor_tau * dt
        rotor = jnp.clip(rotor + drive, 0.0, a.rotor_max)

        # X-config mixing: rotors at ±45°; signs (ccw, cw, ccw, cw)
        f = a.k_thrust * rotor ** 2                       # [N, 4]
        thrust = f.sum(-1)
        L = a.arm_length / jnp.sqrt(2.0)
        tau_x = L * (f[:, 0] + f[:, 3] - f[:, 1] - f[:, 2])
        tau_y = L * (f[:, 2] + f[:, 3] - f[:, 0] - f[:, 1])
        tau_z = a.k_torque * (rotor[:, 0] ** 2 - rotor[:, 1] ** 2
                              + rotor[:, 2] ** 2 - rotor[:, 3] ** 2)
        tau = jnp.stack([tau_x, tau_y, tau_z], -1)        # body frame

        mass = a.mass + added[:, None]
        body_z = um.quat_apply(quat, jnp.broadcast_to(
            jnp.array([0.0, 0.0, 1.0]), pos.shape))
        acc = (thrust[:, None] * body_z - a.drag * lin_vel) / mass
        acc = acc + jnp.array([0.0, 0.0, a.gravity])

        inertia = jnp.array(a.inertia)
        ang_acc = (tau - jnp.cross(ang_vel, ang_vel * inertia)) / inertia

        # semi-implicit Euler + quaternion exp-map increment
        lin_vel = lin_vel + acc * dt
        ang_vel = ang_vel + ang_acc * dt
        pos = pos + lin_vel * dt
        half = 0.5 * ang_vel * dt
        dq = jnp.concatenate([half, jnp.ones_like(half[:, :1])], -1)
        quat = um.quat_mul(quat, dq)
        quat = quat / jnp.linalg.norm(quat, axis=-1, keepdims=True)
        return (pos, quat, lin_vel, ang_vel, rotor, target, added), \
            drive / a.rotor_max

    # -- rewards (drone_robot.py:965-1094 — the drone-relevant subset).
    # Each takes (state, body_vel, body_ang_vel, rotor_drive, actions)
    def _reward_tracking_lin_vel(self, s, body_vel, body_ang, drive, act):
        err = jnp.sum((s.commands[:, :3] - body_vel) ** 2, -1)
        return jnp.exp(-err / self.cfg.tracking_sigma)

    def _reward_tracking_ang_vel(self, s, body_vel, body_ang, drive, act):
        err = (s.commands[:, 3] - body_ang[:, 2]) ** 2
        return jnp.exp(-err / self.cfg.tracking_sigma)

    def _reward_orientation(self, s, body_vel, body_ang, drive, act):
        g = um.quat_apply(um.quat_conjugate(s.quat), jnp.broadcast_to(
            _GRAV_VEC, s.pos.shape))
        return jnp.sum(g[:, :2] ** 2, -1)

    def _reward_ang_vel_xy(self, s, body_vel, body_ang, drive, act):
        return jnp.sum(body_ang[:, :2] ** 2, -1)

    def _reward_action_rate(self, s, body_vel, body_ang, drive, act):
        return jnp.sum((s.last_action - act) ** 2, -1)

    def _reward_torques(self, s, body_vel, body_ang, drive, act):
        return jnp.sum(drive ** 2, -1)

    def _reward_alive(self, s, body_vel, body_ang, drive, act):
        return jnp.ones(s.pos.shape[0])

    # -- control step ---------------------------------------------------
    @partial(jax.jit, static_argnums=0)
    def step(self, state: DroneState, actions: jnp.ndarray):
        cfg = self.cfg
        actions = jnp.clip(actions, -cfg.clip_actions, cfg.clip_actions)
        target = self._rotor_target(actions)

        carry = (state.pos, state.quat, state.lin_vel, state.ang_vel,
                 state.rotor_vel, target, state.added_mass)
        carry, torques = jax.lax.scan(
            self._substep, carry, None, length=cfg.control.decimation)
        pos, quat, lin_vel, ang_vel, rotor, _, added = carry
        torque = torques[-1]

        episode_len = state.episode_len + 1
        rng, k_push, k_cmd, k_noise, r_next = jax.random.split(state.rng, 5)

        # impulse pushes (_push_robots:483): overwrite xy vel periodically
        if cfg.domain_rand.push_robots:
            do_push = (episode_len % self.push_interval == 0)
            push = jax.random.uniform(
                k_push, (pos.shape[0], 2),
                minval=-cfg.domain_rand.max_push_vel_xy,
                maxval=cfg.domain_rand.max_push_vel_xy)
            lin_vel = lin_vel.at[:, :2].set(
                jnp.where(do_push[:, None], push, lin_vel[:, :2]))

        # command resampling (_resample_commands cadence, :380-386)
        new_cmd = self._sample_commands(k_cmd, pos.shape[0])
        do_res = (episode_len % self.resample_interval == 0)
        commands = jnp.where(do_res[:, None], new_cmd, state.commands)

        inter = DroneState(pos, quat, lin_vel, ang_vel, rotor, commands,
                           state.last_action, torque, added, episode_len,
                           state.ep_reward, rng)

        body_vel = um.quat_apply(um.quat_conjugate(quat), lin_vel)
        body_ang = ang_vel

        reward = jnp.zeros(pos.shape[0])
        for _, scale, fn in self.reward_fns:
            reward = reward + scale * fn(inter, body_vel, body_ang, torque,
                                         actions)

        # termination: crash = ground strike or extreme tilt
        g = um.quat_apply(um.quat_conjugate(quat), jnp.broadcast_to(
            _GRAV_VEC, pos.shape))
        tilt = jnp.arccos(jnp.clip(-g[:, 2], -1.0, 1.0))
        crash = (pos[:, 2] <= cfg.ground_z) | (tilt > cfg.termination_tilt)
        time_out = episode_len >= self.max_episode_length
        done = crash | time_out
        reward = reward + crash.astype(jnp.float32) * self.termination_scale
        if cfg.only_positive_rewards:   # legged_robot.py clip semantics
            reward = jnp.maximum(reward, 0.0)

        ep_reward = state.ep_reward + reward
        out = self._out(
            inter._replace(last_action=actions, ep_reward=ep_reward),
            reward, done, time_out, k_noise)

        # auto-reset
        fresh = self._spawn(r_next, pos.shape[0])
        def mask(new, reset_val):
            shape = (pos.shape[0],) + (1,) * (new.ndim - 1)
            return jnp.where(done.reshape(shape), reset_val, new)
        new_state = DroneState(
            pos=mask(pos, fresh["pos"]), quat=mask(quat, fresh["quat"]),
            lin_vel=mask(lin_vel, fresh["lin_vel"]),
            ang_vel=mask(ang_vel, fresh["ang_vel"]),
            rotor_vel=mask(rotor, fresh["rotor_vel"]),
            commands=mask(commands, fresh["commands"]),
            last_action=mask(actions, fresh["last_action"]),
            last_torque=mask(torque, fresh["last_torque"]),
            added_mass=mask(added, fresh["added_mass"]),
            episode_len=jnp.where(done, 0, episode_len),
            ep_reward=jnp.where(done, 0.0, ep_reward),
            rng=r_next,
        )
        return new_state, out

    def _out(self, s: DroneState, reward, done, time_out, noise_key):
        body_vel = um.quat_apply(um.quat_conjugate(s.quat), s.lin_vel)
        g = um.quat_apply(um.quat_conjugate(s.quat), jnp.broadcast_to(
            _GRAV_VEC, s.pos.shape))
        obs = jnp.concatenate(
            [body_vel, s.ang_vel, g, s.commands, s.last_action], -1)
        if self.cfg.obs_noise > 0.0:   # noise vector (_get_noise_scale_vec)
            obs = obs + jax.random.uniform(
                noise_key, obs.shape, minval=-self.cfg.obs_noise,
                maxval=self.cfg.obs_noise)
        obs = jnp.clip(obs, -self.cfg.clip_observations,
                       self.cfg.clip_observations)
        return DroneStepOut(obs=obs, reward=reward, done=done,
                            time_out=time_out, episode_reward=s.ep_reward,
                            episode_length=s.episode_len.astype(jnp.float32))
