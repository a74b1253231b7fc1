"""Physics quadruped: the LeggedRobot half of the legged_gym robot layer.

The reference's `LeggedRobot` (legged_gym/env/base/legged_robot.py:49) is a
PD-position-controlled articulated robot on Isaac Gym PhysX: 12-DoF torque
step under decimation (`step`/`_compute_torques`, legged_robot.py:91-117,
414-438), a velocity-command task with heading mode (`_resample_commands`/
`_post_physics_step_callback`, :361-399), the canonical legged reward set
(~20 `_reward_*` primitives, :950-1094), terrain + command curricula
(:486-520), friction/mass domain rand and impulse pushes (:299-383,483),
and contact-driven termination (`check_termination`, :160-167).

TPU-native design — there is no PhysX to wrap, so the articulated dynamics
are re-derived as a pure-JAX model chosen to give the same task physics at
a fraction of a full Featherstone solver's cost:

  * the TRUNK is a 6-DoF rigid body (quaternion exp-map integration,
    semi-implicit Euler), exactly like the quadrotor in drone_robot.py;
  * each LEG is a 3-joint chain (hip abduction about x, hip flexion and
    knee about y) with second-order joint dynamics under PD torque and
    reflected inertia — legs are light relative to the trunk, so their
    mass does not enter the trunk inertia, but contact loads DO couple
    both bodies;
  * FEET are point contacts against an analytic terrain height field:
    spring-damper normal force + Coulomb-capped viscous tangential
    friction.  Each contact force is applied to the trunk as a wrench at
    the foot AND reflected into the leg joints through the analytic foot
    Jacobian (tau += J^T F, J from forward-mode autodiff of the FK), so
    stance legs genuinely carry the trunk through their PD servos — the
    robot stands, crouches under load, and collapses if the gains cannot
    hold it.

Everything is a pure function of (state, action, PRNGKey): fully
jit/vmap/shard-compatible, and satisfies the same VecEnv step contract
(utils/env_checker.py) as DroneRobot, so the rsl_rl-family learners
(algo/ppo_continuous.py, algo/on_policy_runner.py) drive it unchanged.

Robot zoo: `a1_config()` / `anymal_b_config()` / `anymal_c_config()` /
`cassie_config()` reproduce the reference's per-robot parameter sets
(legged_gym/env/{a1,anymal_b,anymal_c,cassie}/*_config.py) — masses, leg
geometry, PD gains, default joint targets, torque limits; cassie is the
two-leg instantiation of the same chain model.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from gennbv_tpu.utils import math as um

_GRAV_VEC = jnp.array([0.0, 0.0, -1.0])


# ----------------------------------------------------------------------
@dataclasses.dataclass(frozen=True)
class LeggedAsset:
    """Physical constants (A1 defaults; a1.urdf via
    legged_gym/env/a1/a1_config.py:65-70)."""
    mass: float = 12.0                  # kg (A1 total ~12.45)
    # whole-body inertia (trunk + folded legs): the legs' mass lives here
    # rather than in the chain, so the trunk's rotational response to
    # contact wrenches matches the full robot, not the bare torso
    inertia: Tuple[float, float, float] = (0.07, 0.15, 0.17)  # kg m^2
    num_legs: int = 4
    # hip positions in the trunk frame, legs ordered FL/FR/RL/RR
    hip_x: float = 0.183
    hip_y: float = 0.047
    l_hip: float = 0.08                 # abduction link, along ±y
    l_thigh: float = 0.2
    l_calf: float = 0.2
    joint_inertia: float = 0.035        # reflected inertia per joint, kg m^2
    joint_damping: float = 1.2          # N m s/rad actuator friction — keeps
    # the servo critically damped; PhysX gets this from the URDF's joint
    # damping + implicit integration
    torque_limit: float = 33.5          # N m (A1)
    dof_vel_limit: float = 21.0         # rad/s
    # joint angle limits (abd, hip, knee), left-side convention (a1.urdf)
    q_low: Tuple[float, float, float] = (-0.80, -1.05, -2.70)
    q_high: Tuple[float, float, float] = (0.80, 4.19, -0.92)
    # default joint targets at action=0 (a1_config.py:38-55); abduction
    # sign flips with leg side
    default_abd: float = 0.1
    default_hip_front: float = 0.8
    default_hip_rear: float = 1.0
    default_knee: float = -1.5
    # spawn trunk height over terrain; None = computed from the FK stance
    # (feet at equilibrium contact penetration — a hard drop onto the
    # penalty springs catapults the trunk otherwise)
    init_height: Optional[float] = None
    base_clearance: float = 0.09        # trunk-bottom contact radius
    gravity: float = -9.81


@dataclasses.dataclass(frozen=True)
class LeggedControl:
    """PD drive (a1_config.py:57-63; _compute_torques,
    legged_robot.py:414-438)."""
    control_type: str = "P"            # P position | V velocity | T torque
    stiffness: float = 20.0            # N m / rad
    damping: float = 0.5               # N m s / rad
    action_scale: float = 0.25         # target = scale * action + default
    # 8 x 0.0025 s = the reference's 0.02 s control dt (a1_config.py:62,
    # sim dt 0.005 x 4).  The explicit penalty contacts need the halved
    # substep: at 0.005 the tangential damper sits on the explicit-Euler
    # stability edge and the stance force chatters; at 0.0025 the standing
    # equilibrium is exact (sum f_z == mg to float precision).
    decimation: int = 8


@dataclasses.dataclass(frozen=True)
class LeggedContact:
    """Penalty-contact model constants (replaces the PhysX solver params
    of legged_robot_config.py's sim section).  Chosen OVERDAMPED for the
    robot mass at sim_dt=0.005: explicit penalty springs ring through the
    trunk's rotational modes otherwise (the reference leans on PhysX's
    implicit LCP solver instead)."""
    k_normal: float = 2500.0           # N/m foot spring
    d_normal: float = 250.0            # N s/m foot damper
    # Tangential friction is STICTION-capable: a spring to a per-foot
    # anchor point (planted on touchdown) + damper, Coulomb-capped; when
    # the cap binds, the anchor slides to the capped-force position.
    # Purely viscous friction lets stance feet creep, which walks the
    # support polygon out from under the robot — it topples in ~1 s.
    k_tangent: float = 2500.0          # N/m anchor spring
    d_tangent: float = 100.0           # N s/m tangential damper
    foot_radius: float = 0.02
    max_force_mg: float = 4.0          # per-foot |F_n| cap, in units of the
    # robot's weight — PhysX's max_depenetration_velocity analogue; explicit
    # penalty impacts otherwise inject unbounded energy at the substep rate


@dataclasses.dataclass(frozen=True)
class LeggedDomainRand:
    """legged_robot.py:299-383,483; config at legged_robot_config.py:126."""
    randomize_friction: bool = True
    friction_range: Tuple[float, float] = (0.5, 1.25)
    randomize_base_mass: bool = False
    added_mass_range: Tuple[float, float] = (-1.0, 1.0)
    push_robots: bool = True
    push_interval_s: float = 15.0
    max_push_vel_xy: float = 1.0


@dataclasses.dataclass(frozen=True)
class LeggedCommands:
    """4 commands: vx, vy, yaw_rate, heading (legged_robot_config.py:71-82).
    In heading mode the yaw-rate command is servo-derived from the heading
    error each step (legged_robot.py:367-370)."""
    resampling_time_s: float = 10.0
    heading_command: bool = True
    lin_vel_x: Tuple[float, float] = (-1.0, 1.0)
    lin_vel_y: Tuple[float, float] = (-1.0, 1.0)
    ang_vel_yaw: Tuple[float, float] = (-1.0, 1.0)
    heading: Tuple[float, float] = (-3.14, 3.14)
    curriculum: bool = False
    max_curriculum: float = 1.0         # |vx| cap under curriculum


@dataclasses.dataclass(frozen=True)
class LeggedTerrain:
    """Procedural height field (legged_gym/utils/terrain.py; config at
    legged_robot_config.py:44-69).  `rough` is hash-based value noise whose
    amplitude scales with the per-env curriculum level (terrain rows)."""
    mesh_type: str = "plane"           # "plane" | "rough"
    horizontal_scale: float = 0.25     # noise cell size, m
    max_amplitude: float = 0.08        # m at the top curriculum level
    num_levels: int = 10               # terrain rows (curriculum levels)
    terrain_length: float = 8.0        # m, the curriculum promotion yardstick
    curriculum: bool = False
    max_init_level: int = 5
    measure_heights: bool = False      # adds the 17x11 height grid to obs
    static_friction: float = 1.0


@dataclasses.dataclass(frozen=True)
class LeggedObsScales:
    """normalization.obs_scales (legged_robot_config.py:192-201)."""
    lin_vel: float = 2.0
    ang_vel: float = 0.25
    dof_pos: float = 1.0
    dof_vel: float = 0.05
    height_measurements: float = 5.0


@dataclasses.dataclass(frozen=True)
class LeggedNoise:
    """noise.noise_scales x noise_level (legged_robot_config.py:203-211;
    vector layout from _get_noise_scale_vec, legged_robot.py:532-556)."""
    add_noise: bool = False
    noise_level: float = 1.0
    lin_vel: float = 0.1
    ang_vel: float = 0.2
    gravity: float = 0.05
    dof_pos: float = 0.01
    dof_vel: float = 1.5
    height_measurements: float = 0.1


@dataclasses.dataclass(frozen=True)
class LeggedRobotConfig:
    sim_dt: float = 0.0025
    max_episode_length_s: float = 20.0
    clip_actions: float = 100.0
    clip_observations: float = 100.0
    # Reward section (legged_robot_config.py:135-190 + a1_config.py:72-79).
    # The vendored fork zeroes the tracking terms (it trained forward-run
    # variants); the canonical locomotion task needs them nonzero, so the
    # default here is upstream legged_gym's tracking set with the fork's
    # penalty values — override `reward_scales` for exact-fork runs.
    reward_scales: Optional[Dict[str, float]] = None
    only_positive_rewards: bool = True  # legged_robot_config.py:184
    tracking_sigma: float = 0.25
    soft_dof_pos_limit: float = 0.9     # a1_config.py:73
    soft_dof_vel_limit: float = 1.0
    soft_torque_limit: float = 1.0
    base_height_target: float = 0.25    # a1_config.py:74
    max_contact_force: float = 100.0
    termination_tilt: float = 1.2       # rad (stand-in for base contact)
    obs_noise: LeggedNoise = dataclasses.field(default_factory=LeggedNoise)
    obs_scales: LeggedObsScales = dataclasses.field(
        default_factory=LeggedObsScales)
    asset: LeggedAsset = dataclasses.field(default_factory=LeggedAsset)
    control: LeggedControl = dataclasses.field(default_factory=LeggedControl)
    contact: LeggedContact = dataclasses.field(default_factory=LeggedContact)
    domain_rand: LeggedDomainRand = dataclasses.field(
        default_factory=LeggedDomainRand)
    commands: LeggedCommands = dataclasses.field(
        default_factory=LeggedCommands)
    terrain: LeggedTerrain = dataclasses.field(default_factory=LeggedTerrain)

    def resolved_reward_scales(self) -> Dict[str, float]:
        if self.reward_scales is not None:
            return dict(self.reward_scales)
        return {
            "tracking_lin_vel": 1.0,
            "tracking_ang_vel": 0.5,
            "lin_vel_z": -2.0,           # legged_robot_config.py:139
            "ang_vel_xy": -0.05,
            "orientation": -0.5,
            "base_height": -1.0,
            "torques": -0.0002,          # a1_config.py:78
            "dof_acc": -2.5e-7,
            "action_rate": -0.01,
            "collision": -0.5,
            "dof_pos_limits": -10.0,     # a1_config.py:79
            "feet_air_time": 1.0,        # legged_robot_config.py:174
            "termination": 0.0,
        }


class LeggedState(NamedTuple):
    pos: jnp.ndarray            # [N, 3] trunk COM, world
    quat: jnp.ndarray           # [N, 4] (x, y, z, w)
    lin_vel: jnp.ndarray        # [N, 3] world
    ang_vel: jnp.ndarray        # [N, 3] body
    q: jnp.ndarray              # [N, nj] joint angles
    qd: jnp.ndarray             # [N, nj] joint velocities
    commands: jnp.ndarray       # [N, 4] vx, vy, yaw_rate, heading
    last_action: jnp.ndarray    # [N, nj]
    last_qd: jnp.ndarray        # [N, nj] (for dof_acc)
    torques: jnp.ndarray        # [N, nj] applied PD torques
    contact_forces: jnp.ndarray  # [N, L, 3] world, at the feet
    foot_anchor: jnp.ndarray    # [N, L, 2] stiction anchor points, world xy
    feet_air_time: jnp.ndarray  # [N, L] seconds
    last_contacts: jnp.ndarray  # [N, L] bool
    knee_contact: jnp.ndarray   # [N, L] bool (penalised body contact)
    friction: jnp.ndarray       # [N] ground friction coefficient
    added_mass: jnp.ndarray     # [N]
    terrain_level: jnp.ndarray  # [N] int32 curriculum row
    cmd_max_x: jnp.ndarray      # [N] command-curriculum |vx| range
    ep_track: jnp.ndarray       # [N] episode sum of the tracking reward
    episode_len: jnp.ndarray    # [N] int32
    ep_reward: jnp.ndarray      # [N]
    walked: jnp.ndarray         # [N, 2] xy displacement since spawn
    rng: jax.Array


class LeggedStepOut(NamedTuple):
    obs: jnp.ndarray
    reward: jnp.ndarray
    done: jnp.ndarray
    time_out: jnp.ndarray
    episode_reward: jnp.ndarray
    episode_length: jnp.ndarray


class RewardCtx(NamedTuple):
    """Per-step quantities the reward primitives read alongside the state."""
    body_vel: jnp.ndarray       # [N, 3] base-frame linear velocity
    body_ang: jnp.ndarray       # [N, 3] base-frame angular velocity
    base_h: jnp.ndarray         # [N] trunk height over local terrain
    actions: jnp.ndarray        # [N, nj] this step's actions
    air_reward: jnp.ndarray     # [N] precomputed feet_air_time term


def _rot_x(a):
    c, s = jnp.cos(a), jnp.sin(a)
    z, o = jnp.zeros_like(a), jnp.ones_like(a)
    return jnp.stack([jnp.stack([o, z, z], -1),
                      jnp.stack([z, c, -s], -1),
                      jnp.stack([z, s, c], -1)], -2)


class LeggedRobot:
    """Velocity-tracking legged robot, registered as task 'a1_velocity'.

    obs [N, 9 + 3 + 3*nj (+187 if measure_heights)]: base lin vel (3),
    base ang vel (3), projected gravity (3), commands (3, scaled),
    dof_pos - default (nj), dof_vel (nj), last action (nj) — the reference
    layout (legged_robot.py:532-556 noise-vector ordering).
    actions [N, nj]: joint-target offsets (control.action_scale)."""

    def __init__(self, cfg: LeggedRobotConfig = LeggedRobotConfig()):
        self.cfg = cfg
        a = cfg.asset
        self.dt = cfg.sim_dt * cfg.control.decimation
        self.max_episode_length = int(round(cfg.max_episode_length_s / self.dt))
        self.num_legs = a.num_legs
        self.nj = 3 * a.num_legs
        self.num_actions = self.nj
        self.obs_dim = 12 + 3 * self.nj + (
            17 * 11 if cfg.terrain.measure_heights else 0)
        self.push_interval = max(
            1, int(round(cfg.domain_rand.push_interval_s / self.dt)))
        self.resample_interval = max(
            1, int(round(cfg.commands.resampling_time_s / self.dt)))

        # leg layout: FL, FR, RL, RR (x forward, y left); bipeds use one
        # left/right pair at the trunk center
        if a.num_legs == 4:
            sx = jnp.array([1.0, 1.0, -1.0, -1.0])
            sy = jnp.array([1.0, -1.0, 1.0, -1.0])
            hip_def = jnp.array([a.default_hip_front, a.default_hip_front,
                                 a.default_hip_rear, a.default_hip_rear])
        elif a.num_legs == 2:
            sx = jnp.array([0.0, 0.0])
            sy = jnp.array([1.0, -1.0])
            hip_def = jnp.full(2, a.default_hip_front)
        else:
            raise ValueError(f"num_legs must be 2 or 4, got {a.num_legs}")
        self.side = sy                                           # [L]
        self.hip_pos = jnp.stack(
            [sx * a.hip_x, sy * a.hip_y, jnp.zeros_like(sx)], -1)  # [L, 3]
        self.default_q = jnp.stack(
            [sy * a.default_abd, hip_def,
             jnp.full(a.num_legs, a.default_knee)], -1)          # [L, 3]
        # abduction limits mirror with leg side (as the URDF mirrors the
        # joint); hip/knee limits are side-symmetric
        q_low = jnp.tile(jnp.array(a.q_low), (a.num_legs, 1))
        q_high = jnp.tile(jnp.array(a.q_high), (a.num_legs, 1))
        q_low = q_low.at[:, 0].set(
            jnp.where(sy > 0, a.q_low[0], -a.q_high[0]))
        q_high = q_high.at[:, 0].set(
            jnp.where(sy > 0, a.q_high[0], -a.q_low[0]))
        self.q_low_flat = q_low.reshape(-1)
        self.q_high_flat = q_high.reshape(-1)

        # reward registry: nonzero scales -> _reward_<name>, scale x dt
        # (_prepare_reward_function, legged_robot.py:660-691); termination
        # is applied on crash only
        self.reward_fns = []
        for name, scale in cfg.resolved_reward_scales().items():
            if scale == 0.0 or name == "termination":
                continue
            self.reward_fns.append(
                (name, scale * self.dt, getattr(self, f"_reward_{name}")))
        self.termination_scale = (
            cfg.resolved_reward_scales().get("termination", 0.0) * self.dt)
        self.tracking_scale = (
            cfg.resolved_reward_scales().get("tracking_lin_vel", 0.0)
            * self.dt)

        # spawn height: feet of the default stance at equilibrium contact
        # penetration (unless the asset pins it explicitly)
        if a.init_height is not None:
            self.stand_height = float(a.init_height)
        else:
            foot_z = jnp.stack([
                self._foot_local(self.default_q[i], self.side[i])[2]
                for i in range(a.num_legs)])
            pen_eq = a.mass * 9.81 / (a.num_legs * cfg.contact.k_normal)
            self.stand_height = float(
                -jnp.min(foot_z) + cfg.contact.foot_radius - pen_eq)

        if cfg.terrain.measure_heights:
            # 1m x 1.6m measurement rectangle (legged_robot_config.py:55-58)
            mx = jnp.linspace(-0.8, 0.8, 17)
            my = jnp.linspace(-0.5, 0.5, 11)
            gx, gy = jnp.meshgrid(mx, my, indexing="ij")
            self.measure_xy = jnp.stack(
                [gx.ravel(), gy.ravel(), jnp.zeros(17 * 11)], -1)  # [187, 3]

    # -- terrain ---------------------------------------------------------
    def terrain_height(self, x, y, level):
        """Analytic height field h(x, y) per env.  `rough` is bilinear
        value noise (deterministic hash) with amplitude linear in the
        curriculum level (terrain rows, legged_gym/utils/terrain.py:39)."""
        t = self.cfg.terrain
        if t.mesh_type == "plane":
            return jnp.zeros_like(x)
        hs = t.horizontal_scale
        amp = t.max_amplitude * (level.astype(jnp.float32) + 1.0) / t.num_levels

        def hash2(ix, iy):
            h = jnp.sin(ix * 127.1 + iy * 311.7) * 43758.5453
            return h - jnp.floor(h)

        gx, gy = x / hs, y / hs
        ix, iy = jnp.floor(gx), jnp.floor(gy)
        fx, fy = gx - ix, gy - iy
        fx = fx * fx * (3.0 - 2.0 * fx)     # smoothstep
        fy = fy * fy * (3.0 - 2.0 * fy)
        h00, h10 = hash2(ix, iy), hash2(ix + 1.0, iy)
        h01, h11 = hash2(ix, iy + 1.0), hash2(ix + 1.0, iy + 1.0)
        h = (h00 * (1 - fx) * (1 - fy) + h10 * fx * (1 - fy)
             + h01 * (1 - fx) * fy + h11 * fx * fy)
        return amp * h

    # -- kinematics ------------------------------------------------------
    def _foot_local(self, q_leg, side):
        """Foot position in the trunk frame relative to the hip.
        q_leg = (abduction about x, hip flexion about y, knee about y);
        flexion 0 = straight down, positive = forward swing."""
        a = self.cfg.asset
        qa, qh, qk = q_leg[0], q_leg[1], q_leg[2]
        x = a.l_thigh * jnp.sin(qh) + a.l_calf * jnp.sin(qh + qk)
        z = -(a.l_thigh * jnp.cos(qh) + a.l_calf * jnp.cos(qh + qk))
        return _rot_x(qa) @ jnp.stack([x, side * a.l_hip, z])

    def _knee_local(self, q_leg, side):
        a = self.cfg.asset
        qa, qh = q_leg[0], q_leg[1]
        return _rot_x(qa) @ jnp.stack(
            [a.l_thigh * jnp.sin(qh), side * a.l_hip,
             -a.l_thigh * jnp.cos(qh)])

    def _feet_and_jac(self, q):
        """[N, nj] -> hip-relative foot positions [N, L, 3] (trunk frame)
        and foot Jacobians d foot / d q [N, L, 3, 3] via forward-mode AD."""
        qL = q.reshape(q.shape[0], self.num_legs, 3)

        def one(q_leg, side):
            return (self._foot_local(q_leg, side),
                    jax.jacfwd(self._foot_local)(q_leg, side))

        f = jax.vmap(jax.vmap(one, in_axes=(0, 0)), in_axes=(0, None))
        return f(qL, self.side)

    # -- spawn / reset ---------------------------------------------------
    def _sample_commands(self, rng, n, cmd_max_x):
        c = self.cfg.commands
        kx, ky, kyaw, kh = jax.random.split(rng, 4)
        vx = jax.random.uniform(kx, (n,), minval=-cmd_max_x, maxval=cmd_max_x)
        vy = jax.random.uniform(ky, (n,), minval=c.lin_vel_y[0],
                                maxval=c.lin_vel_y[1])
        yaw = jax.random.uniform(kyaw, (n,), minval=c.ang_vel_yaw[0],
                                 maxval=c.ang_vel_yaw[1])
        heading = jax.random.uniform(kh, (n,), minval=c.heading[0],
                                     maxval=c.heading[1])
        cmd = jnp.stack([vx, vy, yaw, heading], -1)
        # small commands snap to zero (legged_robot.py:398)
        keep = jnp.linalg.norm(cmd[:, :2], axis=1, keepdims=True) > 0.2
        return cmd.at[:, :2].multiply(keep)

    def _spawn(self, rng, n, terrain_level, cmd_max_x):
        cfg = self.cfg
        a = cfg.asset
        kxy, kyaw, kf, km, kc, kq = jax.random.split(rng, 6)
        xy = jax.random.uniform(kxy, (n, 2), minval=-1.0, maxval=1.0)
        z = self.terrain_height(xy[:, 0], xy[:, 1], terrain_level) \
            + self.stand_height
        pos = jnp.concatenate([xy, z[:, None]], -1)
        yaw = jax.random.uniform(kyaw, (n,), minval=-3.14, maxval=3.14)
        quat = um.quat_from_euler_zyx(jnp.zeros(n), jnp.zeros(n), yaw)
        friction = jnp.where(
            cfg.domain_rand.randomize_friction,
            jax.random.uniform(kf, (n,),
                               minval=cfg.domain_rand.friction_range[0],
                               maxval=cfg.domain_rand.friction_range[1]),
            jnp.full(n, cfg.terrain.static_friction))
        added = jnp.where(
            cfg.domain_rand.randomize_base_mass,
            jax.random.uniform(km, (n,),
                               minval=cfg.domain_rand.added_mass_range[0],
                               maxval=cfg.domain_rand.added_mass_range[1]),
            jnp.zeros(n))
        # dof jitter around the default stance (_reset_dofs,
        # legged_robot.py:439-449 uses 0.5-1.5x; narrowed to 0.8-1.2x here
        # because the penalty-contact model turns a strongly jittered leg
        # into a spawn-time impact spike that PhysX's LCP solver absorbs)
        q0 = jnp.tile(self.default_q.reshape(-1), (n, 1))
        q0 = jnp.clip(q0 * jax.random.uniform(kq, q0.shape, minval=0.8,
                                              maxval=1.2),
                      self.q_low_flat, self.q_high_flat)
        L = self.num_legs
        # plant the stiction anchors under the spawned feet
        foot_hip, _ = self._feet_and_jac(q0)
        feet_w = pos[:, None, :] + um.quat_apply(
            quat[:, None, :], self.hip_pos[None] + foot_hip)
        return dict(
            pos=pos, quat=quat, lin_vel=jnp.zeros((n, 3)),
            ang_vel=jnp.zeros((n, 3)), q=q0, qd=jnp.zeros((n, self.nj)),
            commands=self._sample_commands(kc, n, cmd_max_x),
            last_action=jnp.zeros((n, self.nj)),
            last_qd=jnp.zeros((n, self.nj)),
            torques=jnp.zeros((n, self.nj)),
            contact_forces=jnp.zeros((n, L, 3)),
            foot_anchor=feet_w[..., :2],
            feet_air_time=jnp.zeros((n, L)),
            last_contacts=jnp.zeros((n, L), bool),
            knee_contact=jnp.zeros((n, L), bool),
            friction=friction, added_mass=added, walked=jnp.zeros((n, 2)),
        )

    def reset(self, num_envs: int, rng: jax.Array):
        cfg = self.cfg
        r_lvl, r_spawn, r_state = jax.random.split(rng, 3)
        level = jnp.where(
            cfg.terrain.curriculum,
            jax.random.randint(r_lvl, (num_envs,), 0,
                               cfg.terrain.max_init_level + 1),
            jnp.zeros(num_envs, jnp.int32)).astype(jnp.int32)
        cmd_max = jnp.full(num_envs, float(
            cfg.commands.lin_vel_x[1] if not cfg.commands.curriculum else 0.5))
        f = self._spawn(r_spawn, num_envs, level, cmd_max)
        state = LeggedState(
            terrain_level=level, cmd_max_x=cmd_max,
            ep_track=jnp.zeros(num_envs),
            episode_len=jnp.zeros(num_envs, jnp.int32),
            ep_reward=jnp.zeros(num_envs), rng=r_state, **f)
        return state, self._out(state, jnp.zeros(num_envs),
                                jnp.zeros(num_envs, bool),
                                jnp.zeros(num_envs, bool), r_state)

    # -- physics ---------------------------------------------------------
    def _pd_torque(self, target, q, qd):
        """_compute_torques (legged_robot.py:414-438)."""
        c = self.cfg.control
        a = self.cfg.asset
        if c.control_type == "T":
            tau = target
        elif c.control_type == "V":
            tau = c.stiffness * (target - qd)
        else:
            tau = c.stiffness * (target - q) - c.damping * qd
        return jnp.clip(tau, -a.torque_limit, a.torque_limit)

    def _substep(self, carry, _):
        """One sim_dt: PD torques -> contacts -> trunk + joint integration
        (replaces gym.simulate inside the decimation loop,
        legged_robot.py:101-110)."""
        (pos, quat, lin_vel, ang_vel, q, qd, anchor, target_q, friction,
         added, level) = carry
        cfg = self.cfg
        a, ct = cfg.asset, cfg.contact
        dt = cfg.sim_dt
        n = pos.shape[0]
        L = self.num_legs
        q1 = quat[:, None, :]                       # broadcast over legs

        tau_pd = self._pd_torque(target_q, q, qd)

        foot_hip, jac = self._feet_and_jac(q)       # [N,L,3], [N,L,3,3]
        foot_local = self.hip_pos[None] + foot_hip  # trunk frame
        r_world = um.quat_apply(q1, foot_local)     # COM -> foot, world
        foot_world = pos[:, None, :] + r_world

        # foot velocity: v_com + w x r + R (J qd)
        qdL = qd.reshape(n, L, 3)
        v_joint = jnp.einsum("nlij,nlj->nli", jac, qdL)
        w_world = um.quat_apply(quat, ang_vel)[:, None, :]
        foot_vel = (lin_vel[:, None, :] + jnp.cross(w_world, r_world)
                    + um.quat_apply(q1, v_joint))

        # spring-damper normal + Coulomb-capped viscous tangential friction
        ground = self.terrain_height(
            foot_world[..., 0].reshape(-1), foot_world[..., 1].reshape(-1),
            jnp.repeat(level, L)).reshape(n, L)
        pen = ground + ct.foot_radius - foot_world[..., 2]
        in_contact = pen > 0.0
        fn = jnp.where(
            in_contact,
            jnp.maximum(ct.k_normal * pen - ct.d_normal * foot_vel[..., 2],
                        0.0),
            0.0)
        fn = jnp.minimum(fn, ct.max_force_mg * a.mass * 9.81)
        # anchor-spring friction with Coulomb cap (stiction + slide)
        slip = foot_world[..., :2] - anchor
        ft_raw = -ct.k_tangent * slip - ct.d_tangent * foot_vel[..., :2]
        ft_norm = jnp.linalg.norm(ft_raw, axis=-1, keepdims=True) + 1e-9
        ft_cap = friction[:, None, None] * fn[..., None]
        scale = jnp.minimum(1.0, ft_cap / ft_norm)
        ft = jnp.where(in_contact[..., None], ft_raw * scale, 0.0)
        # sliding feet drag their anchor to the capped-force position;
        # airborne feet re-plant the anchor under themselves
        slid_anchor = foot_world[..., :2] + ft / ct.k_tangent
        anchor = jnp.where(in_contact[..., None],
                           jnp.where(scale < 1.0, slid_anchor, anchor),
                           foot_world[..., :2])
        f_contact = jnp.concatenate([ft, fn[..., None]], -1)  # [N,L,3] world

        # trunk wrench
        mass = a.mass + added[:, None]
        acc = f_contact.sum(1) / mass + jnp.array([0.0, 0.0, a.gravity])
        tau_world = jnp.cross(r_world, f_contact).sum(1)
        tau_body = um.quat_apply(um.quat_conjugate(quat), tau_world)
        inertia = jnp.array(a.inertia)
        ang_acc = (tau_body - jnp.cross(ang_vel, ang_vel * inertia)) / inertia

        # joints: PD + reflected contact load J^T F (F in the trunk frame)
        f_local = um.quat_apply(um.quat_conjugate(q1), f_contact)
        tau_c = jnp.einsum("nlij,nli->nlj", jac, f_local).reshape(n, self.nj)
        qdd = (tau_pd + tau_c - a.joint_damping * qd) / a.joint_inertia

        # semi-implicit Euler + quaternion exp-map increment
        lin_vel = lin_vel + acc * dt
        ang_vel = ang_vel + ang_acc * dt
        qd = jnp.clip(qd + qdd * dt, -a.dof_vel_limit, a.dof_vel_limit)
        pos = pos + lin_vel * dt
        q = jnp.clip(q + qd * dt, self.q_low_flat, self.q_high_flat)
        half = 0.5 * ang_vel * dt
        dq = jnp.concatenate([half, jnp.ones_like(half[:, :1])], -1)
        quat = um.quat_mul(quat, dq)
        quat = quat / jnp.linalg.norm(quat, axis=-1, keepdims=True)

        carry = (pos, quat, lin_vel, ang_vel, q, qd, anchor, target_q,
                 friction, added, level)
        return carry, (tau_pd, f_contact)

    # -- rewards (legged_robot.py:950-1094), each (state, ctx) -> [N] ----
    def _reward_tracking_lin_vel(self, s, ctx):
        err = jnp.sum((s.commands[:, :2] - ctx.body_vel[:, :2]) ** 2, -1)
        return jnp.exp(-err / self.cfg.tracking_sigma)

    def _reward_tracking_ang_vel(self, s, ctx):
        err = (s.commands[:, 2] - ctx.body_ang[:, 2]) ** 2
        return jnp.exp(-err / self.cfg.tracking_sigma)

    def _reward_lin_vel_z(self, s, ctx):
        return ctx.body_vel[:, 2] ** 2

    def _reward_ang_vel_xy(self, s, ctx):
        return jnp.sum(ctx.body_ang[:, :2] ** 2, -1)

    def _reward_orientation(self, s, ctx):
        g = um.quat_apply(um.quat_conjugate(s.quat),
                          jnp.broadcast_to(_GRAV_VEC, s.pos.shape))
        return jnp.sum(g[:, :2] ** 2, -1)

    def _reward_base_height(self, s, ctx):
        return (ctx.base_h - self.cfg.base_height_target) ** 2

    def _reward_torques(self, s, ctx):
        return jnp.sum(s.torques ** 2, -1)

    def _reward_dof_vel(self, s, ctx):
        return jnp.sum(s.qd ** 2, -1)

    def _reward_dof_acc(self, s, ctx):
        return jnp.sum(((s.last_qd - s.qd) / self.dt) ** 2, -1)

    def _reward_action_rate(self, s, ctx):
        return jnp.sum((s.last_action - ctx.actions) ** 2, -1)

    def _reward_collision(self, s, ctx):
        return jnp.sum(s.knee_contact.astype(jnp.float32), -1)

    def _reward_dof_pos_limits(self, s, ctx):
        lo, hi = self.q_low_flat, self.q_high_flat
        mid, rng = 0.5 * (lo + hi), 0.5 * (hi - lo)
        soft = self.cfg.soft_dof_pos_limit
        out = (jnp.clip(mid - rng * soft - s.q, 0.0, None)
               + jnp.clip(s.q - (mid + rng * soft), 0.0, None))
        return jnp.sum(out, -1)

    def _reward_dof_vel_limits(self, s, ctx):
        a = self.cfg.asset
        return jnp.sum(jnp.clip(
            jnp.abs(s.qd) - a.dof_vel_limit * self.cfg.soft_dof_vel_limit,
            0.0, 1.0), -1)

    def _reward_torque_limits(self, s, ctx):
        a = self.cfg.asset
        return jnp.sum(jnp.clip(
            jnp.abs(s.torques) - a.torque_limit * self.cfg.soft_torque_limit,
            0.0, None), -1)

    def _reward_feet_air_time(self, s, ctx):
        return ctx.air_reward

    def _reward_stumble(self, s, ctx):
        f = s.contact_forces
        return jnp.any(
            jnp.linalg.norm(f[..., :2], axis=-1)
            > 5.0 * jnp.abs(f[..., 2]), axis=-1).astype(jnp.float32)

    def _reward_stand_still(self, s, ctx):
        still = jnp.linalg.norm(s.commands[:, :2], axis=1) < 0.1
        dq = self.default_q.reshape(-1)[None]
        return jnp.sum(jnp.abs(s.q - dq), -1) * still

    def _reward_feet_contact_forces(self, s, ctx):
        return jnp.sum(jnp.clip(
            jnp.linalg.norm(s.contact_forces, axis=-1)
            - self.cfg.max_contact_force, 0.0, None), -1)

    def _reward_energy(self, s, ctx):
        return -jnp.abs(jnp.sum(s.torques * s.qd, -1))

    def _reward_alive(self, s, ctx):
        return jnp.ones(s.pos.shape[0])

    # -- control step ----------------------------------------------------
    @partial(jax.jit, static_argnums=0)
    def step(self, state: LeggedState, actions: jnp.ndarray):
        cfg = self.cfg
        a = cfg.asset
        n = state.pos.shape[0]
        L = self.num_legs
        actions = jnp.clip(actions, -cfg.clip_actions, cfg.clip_actions)
        # P control: target = action_scale * action + default
        # (legged_robot.py:414-432); V/T interpret the scaled action raw
        target = cfg.control.action_scale * actions
        if cfg.control.control_type == "P":
            target = target + self.default_q.reshape(-1)[None]

        carry = (state.pos, state.quat, state.lin_vel, state.ang_vel,
                 state.q, state.qd, state.foot_anchor, target,
                 state.friction, state.added_mass, state.terrain_level)
        carry, (taus, fcs) = jax.lax.scan(
            self._substep, carry, None, length=cfg.control.decimation)
        (pos, quat, lin_vel, ang_vel, q, qd, foot_anchor, _, friction,
         added, level) = carry
        torques = taus[-1]
        contact_forces = fcs[-1]

        episode_len = state.episode_len + 1
        rng, k_push, k_cmd, k_noise, r_next = jax.random.split(state.rng, 5)

        # heading-mode yaw command servo (legged_robot.py:367-370)
        commands = state.commands
        if cfg.commands.heading_command:
            fwd = um.quat_apply(quat, jnp.broadcast_to(
                jnp.array([1.0, 0.0, 0.0]), pos.shape))
            heading = jnp.arctan2(fwd[:, 1], fwd[:, 0])
            commands = commands.at[:, 2].set(jnp.clip(
                0.5 * um.wrap_to_pi(commands[:, 3] - heading), -1.0, 1.0))

        # impulse pushes (_push_robots, legged_robot.py:483)
        if cfg.domain_rand.push_robots:
            do_push = (episode_len % self.push_interval == 0)
            push = jax.random.uniform(
                k_push, (n, 2), minval=-cfg.domain_rand.max_push_vel_xy,
                maxval=cfg.domain_rand.max_push_vel_xy)
            lin_vel = lin_vel.at[:, :2].add(
                jnp.where(do_push[:, None], push, 0.0))

        # command resampling
        new_cmd = self._sample_commands(k_cmd, n, state.cmd_max_x)
        do_res = (episode_len % self.resample_interval == 0)
        commands = jnp.where(do_res[:, None], new_cmd, commands)

        # feet air time bookkeeping (legged_robot.py:1034-1047)
        contact = contact_forces[..., 2] > 1.0
        contact_filt = contact | state.last_contacts
        first_contact = (state.feet_air_time > 0.0) & contact_filt
        air = state.feet_air_time + self.dt
        moving = jnp.linalg.norm(commands[:, :2], axis=1) > 0.1
        air_reward = jnp.sum((air - 0.5) * first_contact, -1) * moving
        feet_air_time = air * (~contact_filt)

        # penalised body contacts: knees below terrain (thigh/calf contact
        # stand-in; penalize_contacts_on=['thigh','calf'], a1_config.py:68)
        qL = q.reshape(n, L, 3)
        knee_hip = jax.vmap(jax.vmap(self._knee_local, in_axes=(0, 0)),
                            in_axes=(0, None))(qL, self.side)
        knee_world = pos[:, None, :] + um.quat_apply(
            quat[:, None, :], self.hip_pos[None] + knee_hip)
        knee_ground = self.terrain_height(
            knee_world[..., 0].reshape(-1), knee_world[..., 1].reshape(-1),
            jnp.repeat(level, L)).reshape(n, L)
        knee_contact = knee_world[..., 2] < knee_ground + 0.01

        walked = state.walked + lin_vel[:, :2] * self.dt

        inter = LeggedState(
            pos=pos, quat=quat, lin_vel=lin_vel, ang_vel=ang_vel, q=q,
            qd=qd, commands=commands, last_action=state.last_action,
            last_qd=state.qd, torques=torques,
            contact_forces=contact_forces, foot_anchor=foot_anchor,
            feet_air_time=feet_air_time,
            last_contacts=contact, knee_contact=knee_contact,
            friction=friction, added_mass=added, terrain_level=level,
            cmd_max_x=state.cmd_max_x, ep_track=state.ep_track,
            episode_len=episode_len, ep_reward=state.ep_reward,
            walked=walked, rng=rng)

        body_vel = um.quat_apply(um.quat_conjugate(quat), lin_vel)
        base_h = pos[:, 2] - self.terrain_height(pos[:, 0], pos[:, 1], level)
        ctx = RewardCtx(body_vel=body_vel, body_ang=ang_vel, base_h=base_h,
                        actions=actions, air_reward=air_reward)

        reward = jnp.zeros(n)
        track_term = jnp.zeros(n)
        for name, scale, fn in self.reward_fns:
            term = scale * fn(inter, ctx)
            reward = reward + term
            if name == "tracking_lin_vel":
                track_term = term

        # termination: trunk contact (base too low over terrain) or extreme
        # tilt (terminate_after_contacts_on=['base'], check_termination,
        # legged_robot.py:160-167)
        g = um.quat_apply(um.quat_conjugate(quat),
                          jnp.broadcast_to(_GRAV_VEC, pos.shape))
        tilt = jnp.arccos(jnp.clip(-g[:, 2], -1.0, 1.0))
        crash = (base_h < a.base_clearance) | (tilt > cfg.termination_tilt)
        time_out = episode_len >= self.max_episode_length
        done = crash | time_out
        reward = reward + crash.astype(jnp.float32) * self.termination_scale
        if cfg.only_positive_rewards:   # legged_robot_config.py:184
            reward = jnp.maximum(reward, 0.0)

        ep_reward = state.ep_reward + reward
        ep_track = state.ep_track + track_term
        out_state = inter._replace(last_action=actions, ep_reward=ep_reward)
        out = self._out(out_state, reward, done, time_out, k_noise)

        # curricula, applied to envs that finished this step
        new_level = level
        if cfg.terrain.curriculum:
            # walked past half a terrain row -> promote; covered less than
            # half the commanded distance -> demote
            # (_update_terrain_curriculum, legged_robot.py:486-509)
            dist = jnp.linalg.norm(walked, axis=1)
            cmd_dist = (jnp.linalg.norm(commands[:, :2], axis=1)
                        * cfg.max_episode_length_s)
            up = dist > cfg.terrain.terrain_length / 2.0
            down = dist < 0.5 * cmd_dist
            new_level = jnp.clip(
                level + jnp.where(up, 1, 0) - jnp.where(down & ~up, 1, 0),
                0, cfg.terrain.num_levels - 1)
        new_cmd_max = state.cmd_max_x
        if cfg.commands.curriculum and self.tracking_scale > 0.0:
            # widen |vx| by 0.5 when the episode's tracking return exceeds
            # 80% of its attainable maximum (update_command_curriculum,
            # legged_robot.py:511-520)
            attainable = self.tracking_scale * self.max_episode_length
            good = ep_track > 0.8 * attainable
            new_cmd_max = jnp.clip(state.cmd_max_x + 0.5 * good, 0.0,
                                   cfg.commands.max_curriculum)

        # auto-reset (masked where-select, the framework-wide pattern)
        fresh = self._spawn(r_next, n, jnp.where(done, new_level, level),
                            jnp.where(done, new_cmd_max, state.cmd_max_x))

        def mask(new, reset_val):
            shape = (n,) + (1,) * (new.ndim - 1)
            return jnp.where(done.reshape(shape), reset_val, new)

        new_state = LeggedState(
            pos=mask(pos, fresh["pos"]), quat=mask(quat, fresh["quat"]),
            lin_vel=mask(lin_vel, fresh["lin_vel"]),
            ang_vel=mask(ang_vel, fresh["ang_vel"]),
            q=mask(q, fresh["q"]), qd=mask(qd, fresh["qd"]),
            commands=mask(commands, fresh["commands"]),
            last_action=mask(actions, fresh["last_action"]),
            last_qd=mask(qd, fresh["last_qd"]),
            torques=mask(torques, fresh["torques"]),
            contact_forces=mask(contact_forces, fresh["contact_forces"]),
            foot_anchor=mask(foot_anchor, fresh["foot_anchor"]),
            feet_air_time=mask(feet_air_time, fresh["feet_air_time"]),
            last_contacts=mask(contact, fresh["last_contacts"]),
            knee_contact=mask(knee_contact, fresh["knee_contact"]),
            friction=mask(friction, fresh["friction"]),
            added_mass=mask(added, fresh["added_mass"]),
            terrain_level=jnp.where(done, new_level, level),
            cmd_max_x=jnp.where(done, new_cmd_max, state.cmd_max_x),
            ep_track=jnp.where(done, 0.0, ep_track),
            episode_len=jnp.where(done, 0, episode_len),
            ep_reward=jnp.where(done, 0.0, ep_reward),
            walked=mask(walked, fresh["walked"]),
            rng=r_next)
        return new_state, out

    def _out(self, s: LeggedState, reward, done, time_out, noise_key):
        cfg = self.cfg
        sc = cfg.obs_scales
        body_vel = um.quat_apply(um.quat_conjugate(s.quat), s.lin_vel)
        g = um.quat_apply(um.quat_conjugate(s.quat),
                          jnp.broadcast_to(_GRAV_VEC, s.pos.shape))
        default = self.default_q.reshape(-1)[None]
        cmd_scale = jnp.array([sc.lin_vel, sc.lin_vel, sc.ang_vel])
        parts = [body_vel * sc.lin_vel,
                 s.ang_vel * sc.ang_vel,
                 g,
                 s.commands[:, :3] * cmd_scale,
                 (s.q - default) * sc.dof_pos,
                 s.qd * sc.dof_vel,
                 s.last_action]
        noise_scales = [cfg.obs_noise.lin_vel * sc.lin_vel,
                        cfg.obs_noise.ang_vel * sc.ang_vel,
                        cfg.obs_noise.gravity,
                        0.0,
                        cfg.obs_noise.dof_pos * sc.dof_pos,
                        cfg.obs_noise.dof_vel * sc.dof_vel,
                        0.0]
        if cfg.terrain.measure_heights:
            # 187 heights around the base, yaw-aligned (legged_robot.py:
            # 546,601-612): clip(z - 0.5 - h, -1, 1) x scale
            n = s.pos.shape[0]
            pts = um.quat_apply_yaw(
                s.quat[:, None, :],
                jnp.broadcast_to(self.measure_xy[None],
                                 (n,) + self.measure_xy.shape))
            px = pts[..., 0] + s.pos[:, None, 0]
            py = pts[..., 1] + s.pos[:, None, 1]
            h = self.terrain_height(
                px.reshape(-1), py.reshape(-1),
                jnp.repeat(s.terrain_level, px.shape[1])).reshape(px.shape)
            parts.append(jnp.clip(s.pos[:, None, 2] - 0.5 - h, -1.0, 1.0)
                         * sc.height_measurements)
            noise_scales.append(cfg.obs_noise.height_measurements
                                * sc.height_measurements)
        obs = jnp.concatenate(parts, -1)
        if cfg.obs_noise.add_noise:
            vec = jnp.concatenate([
                jnp.full(p.shape[-1], ns * cfg.obs_noise.noise_level)
                for p, ns in zip(parts, noise_scales)])
            obs = obs + vec * jax.random.uniform(
                noise_key, obs.shape, minval=-1.0, maxval=1.0)
        obs = jnp.clip(obs, -cfg.clip_observations, cfg.clip_observations)
        return LeggedStepOut(obs=obs, reward=reward, done=done,
                             time_out=time_out, episode_reward=s.ep_reward,
                             episode_length=s.episode_len.astype(jnp.float32))


# ----------------------------------------------------------------------
# Robot zoo (legged_gym/env/{a1,anymal_b,anymal_c,cassie}/*_config.py)
def a1_config(**kw) -> LeggedRobotConfig:
    """Unitree A1 (a1_config.py) — the GenNBV config chain's inheritance
    root (gennbv/env/config_legged.py:5)."""
    return LeggedRobotConfig(**kw)


def anymal_c_config(**kw) -> LeggedRobotConfig:
    """ANYmal C (anymal_c/*_config.py): 50 kg, longer legs, stronger
    actuators, stiffer PD."""
    asset = LeggedAsset(
        mass=50.0, inertia=(0.65, 1.5, 1.6),
        hip_x=0.3, hip_y=0.104, l_hip=0.11, l_thigh=0.285, l_calf=0.33,
        joint_inertia=0.12, torque_limit=80.0, dof_vel_limit=8.5,
        default_abd=0.0, default_hip_front=0.4, default_hip_rear=-0.4,
        default_knee=-0.8, base_clearance=0.25,
        q_low=(-0.6, -1.6, -2.6), q_high=(0.6, 1.6, -0.1))
    control = LeggedControl(stiffness=80.0, damping=2.0, action_scale=0.5)
    contact = LeggedContact(k_normal=10000.0, d_normal=900.0,
                            k_tangent=900.0)
    return LeggedRobotConfig(asset=asset, control=control, contact=contact,
                             base_height_target=0.5, **kw)


def anymal_b_config(**kw) -> LeggedRobotConfig:
    """ANYmal B (anymal_b_config.py): the C model at the B generation's
    mass."""
    cfg = anymal_c_config(**kw)
    return dataclasses.replace(
        cfg, asset=dataclasses.replace(cfg.asset, mass=40.0))


def cassie_config(**kw) -> LeggedRobotConfig:
    """Agility Cassie (cassie/cassie_config.py): the biped instantiation —
    2 legs, taller stance, heavier per-leg actuation."""
    asset = LeggedAsset(
        mass=33.0, inertia=(0.8, 0.9, 0.4), num_legs=2,
        hip_x=0.0, hip_y=0.13, l_hip=0.07, l_thigh=0.5, l_calf=0.45,
        joint_inertia=0.2, torque_limit=112.0, dof_vel_limit=12.0,
        default_abd=0.0, default_hip_front=0.4, default_hip_rear=0.4,
        default_knee=-0.8, base_clearance=0.3,
        q_low=(-0.4, -1.2, -2.2), q_high=(0.4, 1.4, -0.2))
    control = LeggedControl(stiffness=100.0, damping=3.0, action_scale=0.5)
    contact = LeggedContact(k_normal=8000.0, d_normal=700.0,
                            k_tangent=700.0)
    return LeggedRobotConfig(asset=asset, control=control, contact=contact,
                             base_height_target=0.85,
                             termination_tilt=0.8, **kw)
