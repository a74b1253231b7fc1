"""Training runner: the single loop replacing the reference's
SB3 learn() / rsl_rl OnPolicyRunner pair (SURVEY §3.1, §3.5).

Each iteration is ONE jitted function — rollout scan (128 env steps), GAE,
and the full 5-epoch minibatched PPO update — executed over the device mesh
with env-axis sharding.  Only scalar metrics return to host.
"""
from __future__ import annotations

import dataclasses
import json
import os
import time
from collections import deque
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from gennbv_tpu import spec
from gennbv_tpu.algo import evaluation, gae, ppo, rollout
from gennbv_tpu.config import (Config, config_to_dict, eval_env_config,
                               resolve_renderer_impls, with_camera)
from gennbv_tpu.env import ReconEnv, make_scenes
from gennbv_tpu.models import init_policy
from gennbv_tpu.parallel import mesh as mesh_lib
from gennbv_tpu.utils import profiling
from gennbv_tpu.utils.checkpoint import CheckpointManager
from gennbv_tpu.utils.logger import Logger


# fixed order of the per-iteration scalar metrics packed into one device
# array by _train_iteration (one host fetch instead of one per key)
_METRIC_KEYS = (
    "rollout/rew_surface_coverage",
    "rollout/rew_short_path",
    "rollout/rew_termination",
    "rollout/episode_reward",
    "rollout/episode_length",
    "rollout/final_coverage",
    "rollout/collision_rate",
    "rollout/num_episodes",
    "rollout/mean_reward_per_step",
    "train/policy_gradient_loss",
    "train/value_loss",
    "train/entropy_loss",
    "train/approx_kl",
    "train/clip_fraction",
    "train/n_minibatches",
    "train/explained_variance",
    "train/learning_rate",
)


def _opt_update_count(opt_state) -> jnp.ndarray:
    """Adam's applied-update count from the optimizer state (first 'count'
    leaf).  This is the schedule index: KL early stop discards the whole
    candidate opt_state (ppo.update), so skipped minibatches do not advance
    it — iteration-based estimates of the LR would drift."""
    counts = [
        leaf for path, leaf in jax.tree_util.tree_leaves_with_path(opt_state)
        if any(getattr(k, "name", None) == "count" for k in path)
    ]
    return counts[0] if counts else jnp.asarray(0, jnp.int32)


class Runner:
    def __init__(self, cfg: Config, scenes=None, eval_scenes=None,
                 log_dir: Optional[str] = None, depth_source=None,
                 eval_depth_source=None):
        """depth_source: pluggable depth feed (env/depth_sources.py) for
        renderer.mode "replay"/"callback"."""
        # device mesh FIRST: the renderer's "auto" impl policies are
        # mesh-aware (a pallas_call has no GSPMD partitioning rule — on a
        # >1-device mesh XLA would all-gather its per-env image operands
        # every step, breaking the shard-local rollout; config.py
        # gather_impl_for).  env axis sharded; params replicated (pure DP)
        # or feature-sharded over a 'model' axis (TP, runner.model_axis > 1)
        if cfg.runner.model_axis > 1:
            assert cfg.runner.num_slices == 1, \
                "model_axis and num_slices are mutually exclusive"
            self.mesh = mesh_lib.make_mesh_tp(
                cfg.runner.model_axis, cfg.runner.num_devices)
        elif cfg.runner.num_slices > 1:
            self.mesh = mesh_lib.make_multislice_mesh(
                cfg.runner.num_slices, cfg.runner.num_devices)
        else:
            self.mesh = mesh_lib.make_mesh(cfg.runner.num_devices)
        n_dev = len(self.mesh.devices.flatten())
        self.multi_device = n_dev > 1
        if self.multi_device:
            # pin the resolved gather/scatter impls into the env config so
            # the envs (and anything reading cfg from the run log) see the
            # mesh-aware decision; on >1 devices "auto" is height-
            # independent ("mxu"), so one resolution covers the eval
            # camera too.  (ReconEnv re-resolves against jax.device_count()
            # at build as a backstop — config.resolve_renderer_impls.)
            cfg = dataclasses.replace(
                cfg, env=resolve_renderer_impls(cfg.env, n_dev))

        self.cfg = cfg
        rng = jax.random.PRNGKey(cfg.runner.seed)
        self.rng, model_rng = jax.random.split(rng)

        self.scenes = scenes if scenes is not None else make_scenes(
            cfg.env.scene, cfg.env.renderer.resolution
        )
        self.env = ReconEnv(cfg.env, self.scenes, depth_source)
        self.eval_env = None
        if eval_scenes is not None:
            ev_cfg = eval_env_config(cfg.env)
            if cfg.runner.eval_camera:
                if cfg.env.renderer.mode in ("replay", "callback"):
                    raise ValueError(
                        "runner.eval_camera is incompatible with renderer "
                        f"mode {cfg.env.renderer.mode!r}: the external depth "
                        "feed is recorded at the training camera resolution")
                ev_cfg = with_camera(ev_cfg, cfg.runner.eval_camera)
            self.eval_env = ReconEnv(ev_cfg, eval_scenes, eval_depth_source)

        self.model, variables = init_policy(cfg.model, model_rng, self.env.obs_dim)
        self.tx = ppo.make_optimizer(cfg.ppo, cfg.env.num_envs)
        self.train_state = ppo.PPOTrainState(
            params=variables["params"],
            batch_stats=variables["batch_stats"],
            opt_state=self.tx.init(variables["params"]),
        )

        self.log_dir = log_dir or os.path.join(
            cfg.runner.log_dir,
            f"{cfg.runner.experiment_name}_{time.strftime('%Y%m%d_%H%M%S')}",
        )
        self.logger: Optional[Logger] = None
        self.ckpt: Optional[CheckpointManager] = None

        self.obs_dtype = jnp.bfloat16 if cfg.runner.obs_dtype == "bfloat16" else jnp.float32
        # donate env_state + obs (the large rollout-side buffers).  ts is NOT
        # donated: train() pipelines iterations by fetching iteration k's
        # metrics only after dispatching k+1, and the delayed eval/checkpoint
        # step still needs iteration k's params — donation would invalidate
        # them.  The cost is one extra ~80 MB params+opt_state allocation.
        self._train_iter = jax.jit(self._train_iteration, donate_argnums=(1, 2))

        # rolling 100-episode stats (env_train_base.py:629-639)
        self._rew_buffer: deque = deque(maxlen=100)
        self._len_buffer: deque = deque(maxlen=100)
        self.global_step = 0
        self.iteration = 0
        self._best_metric = -float("inf")
        self._best_eval = -float("inf")

    # ------------------------------------------------------------------
    def _train_iteration(self, ts: ppo.PPOTrainState, env_state, obs, rng):
        cfg = self.cfg.ppo
        r_roll, r_upd, rng = jax.random.split(rng, 3)
        variables = {"params": ts.params, "batch_stats": ts.batch_stats}

        env_state, obs, batch, stats = rollout.collect(
            self.env, self.model, variables, env_state, obs, r_roll,
            cfg.n_steps, cfg.gamma, self.obs_dtype,
        )
        adv, ret = gae.compute_gae(
            batch.rewards, batch.values, batch.dones.astype(jnp.float32),
            batch.last_values, cfg.gamma, cfg.gae_lambda,
        )

        t, n = batch.rewards.shape
        m = t * n
        flat = lambda x: x.reshape((m,) + x.shape[2:])
        ts, upd = ppo.update(
            self.model, self.tx, cfg, ts,
            flat(batch.obs), flat(batch.actions), flat(batch.log_probs),
            flat(batch.values), flat(adv), flat(ret), r_upd,
            num_envs=n,
        )

        # rollout metric aggregation (reference extras["episode"] keys).
        # Returned as ONE stacked [K] array: device_get on a dict of K
        # scalar DeviceArrays fetches leaf-by-leaf — K tunnel round-trips
        # per iteration on axon-style remote PJRT; one array is one fetch.
        n_done = jnp.maximum(stats.num_dones.sum(), 1.0)
        els = spec.EPISODE_LENGTH_S
        metrics = {
            "rollout/rew_surface_coverage": stats.ep_rew_coverage.sum() / n_done / els,
            "rollout/rew_short_path": stats.ep_rew_short_path.sum() / n_done / els,
            "rollout/rew_termination": stats.ep_rew_termination.sum() / n_done / els,
            "rollout/episode_reward": stats.ep_reward.sum() / n_done,
            "rollout/episode_length": stats.ep_length.sum() / n_done,
            "rollout/final_coverage": (stats.coverage * stats.num_dones).sum() / n_done,
            "rollout/collision_rate": stats.collision.sum() / n_done,
            "rollout/num_episodes": stats.num_dones.sum(),
            "rollout/mean_reward_per_step": batch.rewards.mean(),
            "train/policy_gradient_loss": upd.policy_loss,
            "train/value_loss": upd.value_loss,
            "train/entropy_loss": upd.entropy_loss,
            "train/approx_kl": upd.approx_kl,
            "train/clip_fraction": upd.clip_fraction,
            "train/n_minibatches": upd.n_minibatches_done,
            "train/explained_variance": upd.explained_variance,
        }
        # SB3 logs train/learning_rate each update; evaluate the schedule at
        # Adam's actual count (make_optimizer's linear_schedule total)
        if cfg.lr_schedule == "linear":
            total_updates = cfg.n_epochs * max(cfg.total_iters, 1) * max(
                (cfg.n_steps * self.cfg.env.num_envs) // max(cfg.batch_size, 1), 1)
            frac = jnp.clip(
                _opt_update_count(ts.opt_state).astype(jnp.float32)
                / total_updates, 0.0, 1.0)
            metrics["train/learning_rate"] = cfg.learning_rate * (1.0 - frac)
        else:
            metrics["train/learning_rate"] = jnp.asarray(
                cfg.learning_rate, jnp.float32)
        packed = jnp.stack(
            [metrics[k].astype(jnp.float32) for k in _METRIC_KEYS])
        return ts, env_state, obs, rng, packed

    # ------------------------------------------------------------------
    def setup(self):
        """Reset env; stagger initial episode lengths like the reference
        (base_class_grid_obs.py:471-475)."""
        n = self.cfg.env.num_envs
        env_state, out = self.env.reset(n)
        self.rng, r = jax.random.split(self.rng)
        staggered = jax.random.randint(
            r, (n,), 1, self.cfg.env.max_episode_length
        ).astype(jnp.int32)
        env_state = env_state._replace(episode_len=staggered)
        obs = out.obs
        if self.multi_device:
            env_state = mesh_lib.shard_env_tree(env_state, self.mesh)
            obs = jax.device_put(obs, mesh_lib.env_sharding(self.mesh))
            if mesh_lib.MODEL_AXIS in self.mesh.axis_names:
                self.train_state = mesh_lib.shard_params_tp(
                    self.train_state, self.mesh)
            else:
                self.train_state = mesh_lib.replicate_tree(
                    self.train_state, self.mesh)
        return env_state, obs

    def train(self, num_iterations: Optional[int] = None, log: bool = True):
        cfg = self.cfg
        num_iterations = num_iterations or cfg.ppo.total_iters
        if log and self.logger is None:
            self.logger = Logger(
                self.log_dir, config=config_to_dict(cfg), use_wandb=cfg.runner.wandb,
                run_name=cfg.runner.experiment_name,
            )
            self.ckpt = CheckpointManager(os.path.join(self.log_dir, "models"))

        env_state, obs = self.setup()
        ts = self.train_state
        steps_per_iter = cfg.ppo.n_steps * cfg.env.num_envs
        last_metrics = {}

        # num_iterations is a TOTAL (reference total_timesteps semantics):
        # a resumed run (restore() set self.iteration) does the remainder,
        # keeping the LR schedule and iteration-indexed logging aligned
        #
        # The loop is PIPELINED: iteration k's metrics are fetched only
        # after iteration k+1 has been dispatched, so the device never idles
        # on the host fetch + logging.  On a tunneled PJRT backend the
        # blocking per-iteration device_get costs seconds of device idle
        # (measured 1.36 -> 5.28 s/iter); async dispatch hides it entirely.
        # `pending` holds (packed metrics, the iteration's ts for
        # eval/checkpointing, iteration, global_step, dispatch time).
        # queue depth: how many iterations may be in flight before their
        # metric fetch.  The tunnel round-trip (~1 s on axon) must fit in
        # depth * iter_time to be fully hidden.
        depth = max(1, cfg.runner.pipeline_depth)
        pending = deque()
        self._last_process_t = None
        for it in range(max(num_iterations - self.iteration, 0)):
            t0 = time.time()
            profiling_this = bool(cfg.runner.profile_dir) and it == 1
            # profile the 2nd iteration (post-compile) when requested; a
            # profiled iteration is fetched synchronously inside the trace
            # so execution (not just dispatch) lands in the profile
            with profiling.trace(
                cfg.runner.profile_dir if profiling_this else None
            ):
                ts, env_state, obs, self.rng, packed = self._train_iter(
                    ts, env_state, obs, self.rng
                )
                if profiling_this:
                    jax.block_until_ready(packed)
            self.global_step += steps_per_iter
            self.iteration += 1
            pending.append((packed, ts, self.iteration, self.global_step, t0))
            if len(pending) > depth:
                last_metrics = self._process_iter(*pending.popleft())
        while pending:
            last_metrics = self._process_iter(*pending.popleft())

        self.train_state = ts
        self._final_env_state = env_state
        self._final_obs = obs
        return last_metrics

    def _process_iter(self, packed, ts, iteration, global_step, t0):
        """Host-side post-processing of one finished iteration: the single
        packed metric fetch, rolling stats, periodic eval, logging and
        checkpointing.  Runs while the NEXT iteration executes on device."""
        cfg = self.cfg
        steps_per_iter = cfg.ppo.n_steps * cfg.env.num_envs
        # ONE host transfer for all metrics: device_get on a dict of
        # scalars fetches leaf-by-leaf (one tunnel round-trip each)
        vals = np.asarray(jax.device_get(packed))
        metrics = {k: float(v) for k, v in zip(_METRIC_KEYS, vals)}
        # with the pipelined queue, per-iteration wall time = spacing
        # between successive fetch completions (the t0 span would count the
        # whole in-flight queue); the first processed iteration falls back
        # to its own span so compile time is visible
        now = time.time()
        dt_iter = (now - self._last_process_t
                   if self._last_process_t is not None else now - t0)
        self._last_process_t = now

        metrics["time/fps"] = steps_per_iter / dt_iter
        metrics["time/iter_seconds"] = dt_iter
        metrics["global_step"] = global_step

        # rolling episode stats for best-ckpt selection
        n_ep = metrics.get("rollout/num_episodes", 0.0)
        if n_ep > 0:
            self._rew_buffer.append(metrics["rollout/episode_reward"])
            self._len_buffer.append(metrics["rollout/episode_length"])
        if self._rew_buffer:
            metrics["rollout/episode_reward_rolling"] = float(
                np.mean(self._rew_buffer)
            )

        if self.eval_env is not None and cfg.runner.eval_freq > 0 and (
            iteration % cfg.runner.eval_freq == 0
        ):
            t_eval = time.time()
            # chamfer accuracy defaults OFF during in-train evals (the
            # point accumulation + host NN loop cost ~70 s per eval, 4x
            # the iteration itself at the tuned camera); post_run
            # reports it for the final checkpoints
            res = evaluation.evaluate(
                self.eval_env, self.model,
                {"params": ts.params, "batch_stats": ts.batch_stats},
                compute_accuracy=cfg.runner.eval_accuracy,
            )
            metrics["time/eval_seconds"] = time.time() - t_eval
            metrics.update({
                "eval/mean_reward": res.mean_reward,
                "eval/mean_AUC": res.mean_auc,
                "eval/mean_ep_length": res.mean_ep_length,
                "eval/final_coverage": res.mean_final_coverage,
                # comparability diagnostics: how much the uncounted
                # init view already covers, and the direct
                # coverage-curve integral (see EvalResult)
                "eval/init_coverage": res.mean_init_coverage,
                "eval/coverage_curve_AUC": res.mean_curve_auc,
            })
            if np.isfinite(res.mean_accuracy_cm):
                metrics["eval/mean_accuracy"] = res.mean_accuracy_cm
                # representation-honesty decomposition (EvalResult)
                metrics["eval/accuracy_scan2gt"] = res.accuracy_scan2gt
                metrics["eval/accuracy_gt2scan"] = res.accuracy_gt2scan
                metrics["eval/accuracy_gt2scan_seen"] = (
                    res.accuracy_gt2scan_seen)
                metrics["eval/gt_unseen_frac"] = res.gt_unseen_frac
                metrics["eval/accuracy_floor_gt_sampling"] = (
                    res.accuracy_floor_gt_sampling)
            # best-by-held-out-eval checkpoint (the reference's
            # EvalCallback best_model, callbacks.py:685-693) — the
            # model to ship when train-scene reward overfits
            if self.ckpt is not None and (
                res.mean_final_coverage > self._best_eval
            ):
                self._best_eval = res.mean_final_coverage
                self.ckpt.save_best("eval_coverage", ts)
                self._save_runner_state()

        if self.logger is not None:
            self.logger.log(metrics, iteration)
            if iteration % cfg.runner.log_interval == 0:
                self.logger.print_table(metrics, iteration)
        if self.ckpt is not None and cfg.runner.save_freq > 0 and (
            iteration % cfg.runner.save_freq == 0
        ):
            self.ckpt.save_step(global_step, ts)
            self._save_runner_state()
        roll = metrics.get("rollout/episode_reward_rolling", -float("inf"))
        if self.ckpt is not None and roll > self._best_metric:
            self._best_metric = roll
            self.ckpt.save_best(cfg.runner.best_metric, ts)
            self._save_runner_state()

        return metrics

    # ------------------------------------------------------------------
    def _save_runner_state(self):
        """Persist the best-checkpoint trackers + rolling episode stats next
        to the checkpoints, so a resumed run cannot clobber a better
        rl_model_best_* with its first (worse) post-resume candidate."""
        if self.ckpt is None:
            return
        state = {
            "best_metric": self._best_metric,
            "best_eval": self._best_eval,
            "rew_buffer": list(self._rew_buffer),
            "len_buffer": list(self._len_buffer),
            "global_step": self.global_step,
        }
        path = os.path.join(self.ckpt.ckpt_dir, "runner_state.json")
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(state, f)
        os.replace(tmp, path)

    def restore(self, models_dir: str, params_only: bool = False) -> int:
        """Resume {params, batch_stats, opt_state} from the latest
        rl_model_<steps>_steps checkpoint in `models_dir` (the reference's
        --resume + get_load_path, helpers.py:108-131).  Returns the
        restored global step.  Env/mapping state is NOT checkpointed —
        episodes restart, matching the reference (SURVEY §5.4).

        `params_only=True` warm-starts just {params, batch_stats} and keeps
        the freshly-built optimizer state and step counter — for fine-tuning
        under a different objective or LR schedule, where the saved
        opt_state tree (e.g. a linear-schedule count) is wrong or
        structurally incompatible (the reference's model.set_parameters
        hook, train_gennbv.py:218-220, has the same policy-weights-only
        semantics)."""
        mgr = CheckpointManager(models_dir)
        step = mgr.latest_step()
        if step is None:
            raise FileNotFoundError(
                f"no rl_model_*_steps checkpoints in {models_dir}")
        if params_only:
            raw = mgr.restore_policy(f"rl_model_{step}_steps")
            like = lambda new, old: jax.device_put(  # noqa: E731
                jnp.asarray(new, dtype=old.dtype), old.sharding)
            self.train_state = self.train_state._replace(
                params=jax.tree.map(like, raw["params"],
                                    self.train_state.params),
                batch_stats=jax.tree.map(like, raw["batch_stats"],
                                         self.train_state.batch_stats),
            )
            return 0
        self.train_state = mgr.restore(f"rl_model_{step}_steps", self.train_state)
        self.global_step = step
        self.iteration = step // (self.cfg.ppo.n_steps * self.cfg.env.num_envs)
        # best-tracker + rolling-stat state (absent in pre-round-2 runs:
        # fall back to the old restart-at--inf behaviour)
        rs_path = os.path.join(models_dir, "runner_state.json")
        if os.path.exists(rs_path):
            with open(rs_path) as f:
                rs = json.load(f)
            self._best_metric = rs.get("best_metric", -float("inf"))
            self._best_eval = rs.get("best_eval", -float("inf"))
            self._rew_buffer.extend(rs.get("rew_buffer", []))
            self._len_buffer.extend(rs.get("len_buffer", []))
        return step

    def variables(self):
        return {"params": self.train_state.params,
                "batch_stats": self.train_state.batch_stats}

    def close(self):
        if self.logger is not None:
            self.logger.close()
