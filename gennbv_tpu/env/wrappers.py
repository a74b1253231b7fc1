"""Composable functional env wrappers — the vec_env family
(stable_baselines3/common/vec_env/*, SURVEY §2.4), re-designed for the
jit-steppable env protocol.

Each wrapper follows the same contract as the env it wraps
(`reset(num_envs[, rng])`, `step(state, actions)`) with its own state
carried inside a :class:`WrapState` pytree — so wrapped envs remain pure,
scan-able, and pass ``utils.env_checker.check_env``.

| SB3 vec_env            | Here                 |
|------------------------|----------------------|
| VecNormalize           | NormalizeWrapper     |
| VecFrameStack          | FrameStackWrapper    |
| VecMonitor             | MonitorWrapper       |
| VecCheckNan            | CheckNanWrapper      |
| (gym ClipAction)       | ClipActionWrapper    |
| noise-scale vector     | ObsNoiseWrapper      |

Obs-flattening (EnvWrapperGenNBVTrain/Eval) has no counterpart because
ReconEnv emits the flat obs layout natively (spec.py).
"""
from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from gennbv_tpu.utils import normalizer as norm_lib
from gennbv_tpu.utils.jitutil import unjitted_step


class WrapState(NamedTuple):
    inner: Any
    extra: Any


class _Wrapper:
    """Base: forwards protocol attributes of the wrapped env."""

    def __init__(self, env):
        self.env = env

    def __getattr__(self, name):
        return getattr(self.env, name)

    def _reset_inner(self, num_envs, rng):
        import inspect
        params = inspect.signature(self.env.reset).parameters
        if rng is not None and ("rng" in params or "key" in params):
            return self.env.reset(num_envs, rng)
        return self.env.reset(num_envs)


class NormalizeWrapper(_Wrapper):
    """VecNormalize: running-stats obs normalization + optional reward
    normalization by the std of the discounted return estimate
    (vec_normalize.py semantics), fully on-device."""

    def __init__(self, env, norm_obs: bool = True, norm_reward: bool = True,
                 clip_obs: float = 10.0, clip_reward: float = 10.0,
                 gamma: float = 0.99):
        super().__init__(env)
        self.norm_obs = norm_obs
        self.norm_reward = norm_reward
        self.clip_obs = clip_obs
        self.clip_reward = clip_reward
        self.gamma = gamma

    def reset(self, num_envs: int, rng=None):
        state, out = self._reset_inner(num_envs, rng)
        extra = {
            "obs": norm_lib.init(out.obs.shape[-1]),
            "ret": norm_lib.init(1),
            "returns": jnp.zeros(num_envs, jnp.float32),
        }
        extra["obs"] = norm_lib.update(extra["obs"], out.obs)
        obs = norm_lib.normalize(extra["obs"], out.obs, self.clip_obs) \
            if self.norm_obs else out.obs
        return WrapState(state, extra), out._replace(obs=obs)

    def step(self, ws: WrapState, actions):
        state, out = unjitted_step(self.env)(ws.inner, actions)
        extra = dict(ws.extra)
        extra["obs"] = norm_lib.update(extra["obs"], out.obs)
        obs = norm_lib.normalize(extra["obs"], out.obs, self.clip_obs) \
            if self.norm_obs else out.obs
        returns = extra["returns"] * self.gamma + out.reward
        extra["ret"] = norm_lib.update(extra["ret"], returns[:, None])
        extra["returns"] = jnp.where(out.done, 0.0, returns)
        reward = out.reward
        if self.norm_reward:
            reward = jnp.clip(
                out.reward / jnp.sqrt(extra["ret"].var[0] + 1e-8),
                -self.clip_reward, self.clip_reward,
            )
        return WrapState(state, extra), out._replace(obs=obs, reward=reward)


class FrameStackWrapper(_Wrapper):
    """VecFrameStack: obs = concat of the last k observations (oldest
    first); reset/done fills the stack with the current frame."""

    def __init__(self, env, k: int = 4):
        super().__init__(env)
        self.k = k
        self.obs_dim = env.obs_dim * k

    def _stack(self, frames):
        n = frames.shape[0]
        return frames.transpose(0, 1, 2).reshape(n, -1) if frames.ndim == 3 else frames

    def reset(self, num_envs: int, rng=None):
        state, out = self._reset_inner(num_envs, rng)
        frames = jnp.tile(out.obs[:, None, :], (1, self.k, 1))
        return WrapState(state, frames), out._replace(
            obs=frames.reshape(num_envs, -1))

    def step(self, ws: WrapState, actions):
        state, out = unjitted_step(self.env)(ws.inner, actions)
        frames = jnp.concatenate(
            [ws.extra[:, 1:], out.obs[:, None, :]], axis=1)
        # done: restart the stack from the post-reset frame
        frames = jnp.where(
            out.done[:, None, None],
            jnp.tile(out.obs[:, None, :], (1, self.k, 1)),
            frames,
        )
        n = frames.shape[0]
        return WrapState(state, frames), out._replace(obs=frames.reshape(n, -1))


class MonitorWrapper(_Wrapper):
    """VecMonitor: per-env episode return/length accounting surfaced at
    terminal steps (0 elsewhere) as extra fields ``ep_return``/``ep_len``
    appended to the step output tuple."""

    class Output(NamedTuple):
        obs: jnp.ndarray
        reward: jnp.ndarray
        done: jnp.ndarray
        time_out: jnp.ndarray
        ep_return: jnp.ndarray
        ep_len: jnp.ndarray

    def reset(self, num_envs: int, rng=None):
        state, out = self._reset_inner(num_envs, rng)
        extra = {"ret": jnp.zeros(num_envs), "len": jnp.zeros(num_envs, jnp.int32)}
        z = jnp.zeros(num_envs)
        return WrapState(state, extra), self.Output(
            out.obs, out.reward, out.done, out.time_out, z, z)

    def step(self, ws: WrapState, actions):
        state, out = unjitted_step(self.env)(ws.inner, actions)
        ret = ws.extra["ret"] + out.reward
        ln = ws.extra["len"] + 1
        d = out.done
        extra = {"ret": jnp.where(d, 0.0, ret),
                 "len": jnp.where(d, 0, ln)}
        return WrapState(state, extra), self.Output(
            out.obs, out.reward, out.done, out.time_out,
            ret * d, ln.astype(jnp.float32) * d)


class CheckNanWrapper(_Wrapper):
    """VecCheckNan: appends an ``invalid`` flag (any non-finite obs/reward
    this step).  Functional stand-in for the reference's raise-on-NaN —
    under jit one cannot raise, so callers assert on the flag host-side."""

    class Output(NamedTuple):
        obs: jnp.ndarray
        reward: jnp.ndarray
        done: jnp.ndarray
        time_out: jnp.ndarray
        invalid: jnp.ndarray

    def reset(self, num_envs: int, rng=None):
        state, out = self._reset_inner(num_envs, rng)
        return WrapState(state, ()), self.Output(
            out.obs, out.reward, out.done, out.time_out,
            ~jnp.all(jnp.isfinite(out.obs), axis=-1))

    def step(self, ws: WrapState, actions):
        state, out = unjitted_step(self.env)(ws.inner, actions)
        invalid = ~jnp.all(jnp.isfinite(out.obs), axis=-1) | ~jnp.isfinite(out.reward)
        return WrapState(state, ()), self.Output(
            out.obs, out.reward, out.done, out.time_out, invalid)


class ObsNoiseWrapper(_Wrapper):
    """Additive observation noise: ``obs += uniform(-1, 1) * noise_vec``.

    The reference's noise-scale vector (drone_robot.py:532-553,
    LeggedRobotCfg.noise): per-component scales times a global noise_level,
    defined by the framework and left OFF on the GenNBV path — provided
    here as a wrapper any robot task can opt into.  `noise_vec` may be a
    scalar or per-component [obs_dim] array."""

    def __init__(self, env, noise_vec, noise_level: float = 1.0):
        super().__init__(env)
        self.noise_vec = jnp.asarray(noise_vec, jnp.float32) * noise_level

    def reset(self, num_envs: int, rng=None):
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        r_env, r_noise, r_carry = jax.random.split(rng, 3)
        state, out = self._reset_inner(num_envs, r_env)
        obs = out.obs + self.noise_vec * jax.random.uniform(
            r_noise, out.obs.shape, minval=-1.0, maxval=1.0)
        return WrapState(state, r_carry), out._replace(obs=obs)

    def step(self, ws: WrapState, actions):
        state, out = unjitted_step(self.env)(ws.inner, actions)
        r_noise, r_carry = jax.random.split(ws.extra)
        obs = out.obs + self.noise_vec * jax.random.uniform(
            r_noise, out.obs.shape, minval=-1.0, maxval=1.0)
        return WrapState(state, r_carry), out._replace(obs=obs)


class ClipActionWrapper(_Wrapper):
    """Clip continuous actions to [lo, hi] before the env sees them."""

    def __init__(self, env, lo: float = -1.0, hi: float = 1.0):
        super().__init__(env)
        self.lo = lo
        self.hi = hi

    def reset(self, num_envs: int, rng=None):
        state, out = self._reset_inner(num_envs, rng)
        return WrapState(state, ()), out

    def step(self, ws: WrapState, actions):
        state, out = unjitted_step(self.env)(ws.inner, jnp.clip(actions, self.lo, self.hi))
        return WrapState(state, ()), out
