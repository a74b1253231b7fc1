"""Task registry: name -> (env constructor, config factory).

Keeps the reference's task-name semantics (legged_gym/utils/task_registry.py;
`train_gennbv` / `eval_gennbv` registered at gennbv/__init__.py:6-7) without
the class-registry machinery: a task is a function from Config to a ready
ReconEnv (+ its scene set).
"""
from __future__ import annotations

from typing import Callable, Dict, Tuple

from gennbv_tpu.config import Config, EnvConfig, eval_env_config

_REGISTRY: Dict[str, Callable] = {}


def register(name: str, factory: Callable) -> None:
    _REGISTRY[name] = factory


def make_env(name: str, cfg: Config):
    """Returns (env, env_cfg) like task_registry.make_env (task_registry.py:66)."""
    if name not in _REGISTRY:
        raise KeyError(f"unknown task {name!r}; registered: {sorted(_REGISTRY)}")
    return _REGISTRY[name](cfg)


def task_names():
    return sorted(_REGISTRY)


def _make_train(cfg: Config):
    from gennbv_tpu.env import ReconEnv, make_scenes
    scenes = make_scenes(cfg.env.scene, cfg.env.renderer.resolution)
    return ReconEnv(cfg.env, scenes), cfg.env


def _make_eval(cfg: Config):
    import dataclasses
    from gennbv_tpu import spec
    from gennbv_tpu.env import ReconEnv, make_scenes
    env_cfg = eval_env_config(cfg.env)
    scene_cfg = dataclasses.replace(
        cfg.env.scene, num_scenes=spec.EVAL_NUM_ENVS, seed=cfg.env.scene.seed + 100
    )
    scenes = make_scenes(scene_cfg, cfg.env.renderer.resolution)
    return ReconEnv(env_cfg, scenes), env_cfg


def _make_drone(cfg: Config = None):
    """Physics quadrotor velocity-tracking task (the legged_gym robot layer
    re-created TPU-native; legged_gym/env/base/drone_robot.py:49).  Driven by
    the continuous rsl_rl-family stack (OnPolicyRunner + Gaussian PPO); takes
    its own DroneRobotConfig rather than the ReconEnv Config tree, matching
    the reference registry where each task binds its own cfg class."""
    from gennbv_tpu.env.drone_robot import DroneRobot, DroneRobotConfig
    dcfg = DroneRobotConfig()
    return DroneRobot(dcfg), dcfg


def _make_legged(robot: str):
    def factory(cfg: Config = None):
        """Physics legged robot velocity task (legged_gym/env/base/
        legged_robot.py:49 re-created TPU-native; robot parameter sets
        from legged_gym/env/{a1,anymal_b,anymal_c,cassie}/)."""
        from gennbv_tpu.env import legged_robot as lr
        make = {"a1": lr.a1_config, "anymal_b": lr.anymal_b_config,
                "anymal_c": lr.anymal_c_config,
                "cassie": lr.cassie_config}[robot]
        lcfg = make()
        return lr.LeggedRobot(lcfg), lcfg
    return factory


register("train_gennbv", _make_train)
register("eval_gennbv", _make_eval)
register("drone_velocity", _make_drone)
for _robot in ("a1", "anymal_b", "anymal_c", "cassie"):
    register(f"{_robot}_velocity", _make_legged(_robot))
