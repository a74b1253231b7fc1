"""Single dataclass config tree.

Replaces the reference's four-layer class-config system
(legged_robot_config.py -> a1_config.py -> config_legged.py ->
config_gennbv_train.py) and the ~460-line per-field CLI override
(legged_gym/utils/helpers.py:134-613) with one frozen tree + a generic
dotted-path CLI override (`--set env.camera_height=100`).
"""
from __future__ import annotations

import dataclasses
import typing
from dataclasses import dataclass, field
from typing import Any, Optional, Tuple

from gennbv_tpu import spec


@dataclass
class CameraConfig:
    height: int = spec.CAMERA_HEIGHT
    width: int = spec.CAMERA_WIDTH
    horizontal_fov_deg: float = spec.HORIZONTAL_FOV_DEG
    z_offset: float = spec.CAMERA_Z_OFFSET
    depth_max: float = spec.DEPTH_MAX


@dataclass
class RendererConfig:
    """TPU depth renderer (replaces Isaac Gym's rasterizer, SURVEY 2.6 N2).

    mode "splat" (default): surface-voxel splatting z-buffer (ops/splat.py) —
    O(Q) memory ops per env, the TPU-native hot path.
    mode "dda": per-pixel voxel DDA ray-marching (ops/render.py) — exact
    first-hit semantics, ~100x more memory traffic; used for validation.
    """
    mode: str = "splat"
    resolution: int = 64          # render-grid voxels per axis (R)
    footprint: int = 1            # splat radius in pixels (1 -> 3x3)
    # z-buffer builder: "mxu" = radix-min via MXU matmuls (ops/mxu.py,
    # ~6x faster, 100-level quantized); "scatter" = exact XLA scatter-min
    zbuf_impl: str = "mxu"
    # survivor-compaction cap as a fraction of the surf capacity Q
    # (splat.splat_depth_batch): a coarse cell-min cull bounds which points
    # can affect the pooled z-buffer/visibility, survivors are front-packed
    # and the fine GEMMs contract over cap*Q instead of Q — bit-identical
    # output, with a dense fallback when any env overflows the cap.  None
    # disables.  Pays off at large sensors (400x400) where the splat is
    # MXU-compute-bound; at 128x128 the GEMMs are small enough already.
    compact_cap_frac: Optional[float] = None
    # row-banded splat (splat._zbuf_vis_banded_one): partition points by
    # image row band and contract each band's radix/gather GEMMs over a
    # per-band cap instead of the full surf capacity — FLOP cut = Q/cap
    # (band count sets the cap granularity), bit-identical output, dense
    # fallback when any band overflows.  Takes precedence over
    # compact_cap_frac.  None/0 = OFF (the default).  Round-3 live
    # measurement at the reference 400x400 sensor, back-to-back 256-env
    # training runs (reports/r3_fps_{dense400_a,banded400}): dense 6,386
    # steps/s vs banded 4,274 — the op-level 3.1x FLOP cut does NOT
    # survive composition into the training step.  The banded form pays a
    # per-env 3-operand sort, a band-count overflow predicate, B dynamic-
    # slice band extractions and a scatter-back sort per step, and its
    # per-band GEMMs have M = rows/B = 50 (< the 128-lane MXU tile, so
    # ~60% of each fine GEMM is padding) — together these exceed the GEMM
    # FLOPs saved.  Kept as an explicit opt-in for much taller sensors
    # where M/B stays >= 128.
    band_split: Optional[int] = None
    # merge the splat's visibility gather and the carve's z-test gather
    # into ONE [Q+G^3, H] x [H, W] one-hot GEMM on the dense mxu path
    # (splat.splat_vis_carve) — bit-identical; measured per-sensor with
    # tools/bench_ab_live.py (see BENCHMARKS round 3)
    merge_vis_carve: bool = False
    # per-point image gather implementation for the visibility / carve /
    # radix-digit gathers: "mxu" = one-hot GEMM with an HBM [P, W]
    # intermediate (ops/mxu.py); "pallas" = VMEM-resident-image kernel
    # (ops/pallas_gather.py) — bit-identical, no HBM intermediate.
    # "auto" (default) picks per sensor from the round-3 interleaved live
    # A/B (tools/bench_ab_live.py): at 128^2 the batched env.step is
    # BANDWIDTH-bound on the gather intermediates and pallas wins 1.14x
    # (23,912 -> 27,176 steps/s); at 400^2 the step is compute-bound on
    # the radix GEMMs and the kernel's serial per-chunk dots lose 0.97x
    # (6,284 -> 6,076).  auto = pallas below 256 rows, mxu at/above.
    gather_impl: str = "auto"
    # per-band cap as a fraction of Q (rounded up to a lane multiple).
    # tools/probe_band_occupancy.py: the training pose distribution's
    # batch-max band occupancy at B=8 is 0.40 (p90) / 0.46 (max) of Q, so
    # 0.5 keeps the fast path on ~100% of steps; lower caps trade FLOPs
    # against dense-fallback steps and measured slower (tools/bench_banded).
    # B=16's nominal 4x FLOP cut also measured slower: 25-row band GEMMs
    # pad the MXU M-dim away (56 vs 68-73 ms at 400^2).
    band_cap_frac: float = 0.5

    def band_split_for(self, height: int) -> Optional[int]:
        """Effective band count at a given sensor height.  Banding is an
        explicit opt-in (default OFF — it measured a 33% live regression
        at 400^2, see band_split above).  An explicit band count that
        doesn't divide the height is rejected here (None -> dense) rather
        than silently downstream, so callers like recon_env's init-cache
        path see the same decision as the splat itself."""
        if not self.band_split:
            return None
        return self.band_split if height % self.band_split == 0 else None

    def gather_impl_for(self, height: int, n_devices: int = 1) -> str:
        """Effective gather implementation at a given sensor height (the
        "auto" policy documented at gather_impl).  Mesh-aware: a
        pallas_call has no GSPMD partitioning rule, so on a >1-device mesh
        XLA must all-gather its per-env image operands EVERY env step —
        breaking the shard-local rollout property (round-3 verdict weak
        #1, tests/test_runner.py::test_update_has_no_rollout_allgather).
        auto therefore resolves to the GSPMD-shardable "mxu" form whenever
        the env axis spans more than one device; the runner pins the
        resolved impl into the env config at mesh-build time."""
        if self.gather_impl not in ("auto", "mxu", "pallas"):
            raise ValueError(f"renderer.gather_impl={self.gather_impl!r}: "
                             "expected 'auto', 'mxu' or 'pallas'")
        if self.gather_impl != "auto":
            return self.gather_impl
        return "pallas" if height < 256 and n_devices == 1 else "mxu"

    # hit-grid scatter implementation (ops/voxel.py scatter_hits):
    # "mxu" = one-hot GEMM (the [Q, G^2] operand looked HBM-material in
    # the HLO text but is fused/overlapped in practice); "pallas" =
    # VMEM-resident one-hot chunks (ops/pallas_scatter.py), bit-identical.
    # Round-3 interleaved live A/B at 128^2
    # (reports/r3_ab_scatter_mxu_vs_pallas_128.log): 27,173 vs 27,178
    # steps/s — a DEAD HEAT (1.0002x), so the default stays "mxu" and the
    # kernel is an explicit opt-in.  The measurement is the point: the
    # naive HLO-text buffer ranking overstates what XLA materializes.
    scatter_impl: str = "mxu"

    def scatter_impl_for(self, height: int, n_devices: int = 1) -> str:
        """Effective hit-scatter implementation at a given sensor height.
        Mesh-aware for the same reason as gather_impl_for: pallas_call
        cannot be partitioned by GSPMD, so auto only picks it on a
        single-device mesh."""
        if self.scatter_impl not in ("auto", "mxu", "pallas"):
            raise ValueError(f"renderer.scatter_impl={self.scatter_impl!r}: "
                             "expected 'auto', 'mxu' or 'pallas'")
        if self.scatter_impl != "auto":
            return self.scatter_impl
        return "pallas" if height < 256 and n_devices == 1 else "mxu"


@dataclass
class SceneConfig:
    num_scenes: int = 256
    grid_size: int = spec.GRID_SIZE
    # world box of the mapped region; x,y in [-extent/2, extent/2], z in [0, extent_z]
    extent_xy: float = 10.0
    extent_z: float = 6.0
    # "procedural" (houses) | "objects" (primitive compositions, the
    # OmniObject3D-style zero-shot family) | "convex" (single cavity-free
    # primitives — the chamfer-floor probe family, env/scene.py _gen_object)
    # | "terrain" | dataset dir path
    dataset: str = "procedural"
    # procedural generator difficulty: "standard" | "hard" (adds courtyards,
    # tunnels, overhangs — concave structure invisible from orbit views)
    difficulty: str = "standard"
    seed: int = 0


@dataclass
class RewardConfig:
    """Pre-dt reward scales (config_gennbv_train.py:13-20); effective
    per-step scale = scale * dt (drone_robot.py:874-884)."""
    surface_coverage: float = 1000.0
    short_path: float = 5.0
    termination: float = 50.0
    only_positive: bool = True
    dt: float = spec.DT


@dataclass
class EnvConfig:
    num_envs: int = spec.PPO_NUM_ENVS
    max_episode_length: int = spec.MAX_EPISODE_LENGTH_TRAIN
    coverage_done_threshold: Optional[float] = spec.COVERAGE_DONE_THRESHOLD_TRAIN
    reward: RewardConfig = field(default_factory=RewardConfig)
    pose_buf_len: int = spec.POSE_BUF_LEN
    rgb_k: int = spec.RGB_K
    rgb_h: int = spec.RGB_H
    rgb_w: int = spec.RGB_W
    # "ztest" = projective z-test carving (TPU-native default);
    # "bresenham" = exact reference semantics (utils.py:24-227)
    carve_mode: str = "ztest"
    # collision test: occupied render voxel within this world radius of the pose
    collision_radius: float = 0.25
    camera: CameraConfig = field(default_factory=CameraConfig)
    renderer: RendererConfig = field(default_factory=RendererConfig)
    scene: SceneConfig = field(default_factory=SceneConfig)


def with_camera(env_cfg: EnvConfig, resolution: int) -> EnvConfig:
    """env_cfg with a square camera of the given resolution (the shared
    sensor-override used by runner.eval_camera and post_run --eval_cam)."""
    return dataclasses.replace(
        env_cfg, camera=dataclasses.replace(
            env_cfg.camera, height=resolution, width=resolution))


def resolve_renderer_impls(env_cfg: EnvConfig, n_devices: int) -> EnvConfig:
    """Pin the mesh-aware "auto" renderer impls into an env config.

    The shared resolution entry point for EVERY env-construction path
    (Runner pins at mesh build; ReconEnv pins at its own build against
    jax.device_count()), so code constructing a ReconEnv directly from a
    fresh config on a multi-device host cannot silently resolve
    auto->pallas and reintroduce the per-step all-gather regression
    (tests/test_runner.py::test_update_has_no_rollout_allgather).
    Non-"auto" values pass through unchanged."""
    rend = env_cfg.renderer
    if rend.gather_impl != "auto" and rend.scatter_impl != "auto":
        return env_cfg
    rend = dataclasses.replace(
        rend,
        gather_impl=rend.gather_impl_for(env_cfg.camera.height, n_devices),
        scatter_impl=rend.scatter_impl_for(env_cfg.camera.height, n_devices),
    )
    return dataclasses.replace(env_cfg, renderer=rend)


def eval_env_config(train_cfg: EnvConfig) -> EnvConfig:
    """The eval-env variant (config_gennbv_eval.py:6-14 +
    env_eval_gennbv check_termination): 30-step episodes, only the
    surface-coverage reward at scale 50, no positive clipping, no
    coverage-threshold termination."""
    return dataclasses.replace(
        train_cfg,
        num_envs=spec.EVAL_NUM_ENVS,
        max_episode_length=spec.MAX_EPISODE_LENGTH_EVAL,
        coverage_done_threshold=None,
        reward=RewardConfig(
            surface_coverage=50.0, short_path=0.0, termination=0.0,
            only_positive=False,
        ),
    )


@dataclass
class ModelConfig:
    pose_mlp_hidden: int = 256
    posenc_freqs: int = 2
    grid_channels: int = 16
    fused_dim: int = 256
    # keep the dead state_rgb input dead, as in the reference (hybrid_encoder.py:83)
    use_state_rgb: bool = False


@dataclass
class PPOConfig:
    n_steps: int = spec.PPO_N_STEPS
    batch_size: int = spec.PPO_BATCH_SIZE
    n_epochs: int = spec.PPO_N_EPOCHS
    learning_rate: float = spec.PPO_LR
    gamma: float = spec.PPO_GAMMA
    gae_lambda: float = spec.PPO_GAE_LAMBDA
    clip_range: float = spec.PPO_CLIP_RANGE
    clip_range_vf: Optional[float] = spec.PPO_CLIP_RANGE_VF
    vf_coef: float = spec.PPO_VF_COEF
    ent_coef: float = spec.PPO_ENT_COEF
    target_kl: Optional[float] = spec.PPO_TARGET_KL
    max_grad_norm: float = spec.PPO_MAX_GRAD_NORM
    adam_eps: float = spec.PPO_ADAM_EPS
    normalize_advantage: bool = True
    # reference multiplies the pg term by 10 (ppo_grid_obs.py:253); parity default on
    policy_loss_mult: float = spec.PPO_POLICY_LOSS_MULT
    # "constant" (reference default) | "linear" anneal to 0 (SB3 schedules)
    lr_schedule: str = "constant"
    total_iters: int = spec.PPO_TOTAL_ITERS
    # entropy floor (None = off, reference parity): when set, an extra hinge
    # bonus ent_floor_coef * relu(ent_floor - mean_entropy) engages only
    # below the floor, countering late-training entropy collapse (round-1:
    # entropy hit -4.4 by iter 2000 and exploration plateaued)
    ent_floor: Optional[float] = None
    ent_floor_coef: float = 0.1
    # how the minibatch scan applies/discards an update under the KL early
    # stop: "select" = run tx.update unconditionally then keep-or-discard
    # via three tree-sized jnp.where selects (the original form); "cond" =
    # decide keep first and lax.cond the optimizer apply, executing only
    # the taken branch — bitwise-identical training trajectory
    # (tests/test_ppo.py::test_apply_mode_parity) minus the select's
    # ~3x(params+opt_state) HBM round-trip per minibatch.  Measured with
    # tools/probe_update.py (see BENCHMARKS.md update-phase section).
    apply_mode: str = "select"
    # logical env groups for minibatch sampling: minibatches are drawn
    # balanced across this many fixed env groups (one permutation each), so
    # gathers stay shard-local on any device count that divides it and the
    # training trajectory is device-count-invariant (algo/ppo.py
    # _minibatch_shards).  Adapts downward when it doesn't divide
    # num_envs/batch_size.
    minibatch_shards: int = 8


@dataclass
class RunnerConfig:
    seed: int = 1
    log_dir: str = "runs"
    experiment_name: str = "gennbv_tpu"
    save_freq: int = 100            # iterations between checkpoints
    log_interval: int = 1
    eval_freq: int = 0              # iterations between evals; 0 = no in-train eval
    # evaluate under this camera resolution regardless of the training
    # camera (0 = same as training). Coverage is counted from what the
    # sensor sees, so when training at a cheap camera, keep checkpoint
    # selection honest by evaluating at the deployment sensor
    # (BENCHMARKS.md: 128-trained policy scores 0.9157@128 vs 0.9924@400)
    eval_camera: int = 0
    # compute the chamfer accuracy metric during in-train evals (costs ~70s
    # per eval at the tuned camera; post_run reports it regardless)
    eval_accuracy: bool = False
    eval_n_episodes: int = spec.EVAL_N_EPISODES
    best_metric: str = "episode_reward"   # gennbv/callback.py:25-70
    wandb: bool = False
    # sharding: number of devices along the env axis; 0 = use all local devices
    num_devices: int = 0
    # multi-slice: >1 builds a 2-D ('slice','env') mesh so the gradient
    # all-reduce goes hierarchically over ICI then DCN (parallel/mesh.py)
    num_slices: int = 1
    # tensor parallelism: >1 builds a 2-D ('env','model') mesh and shards
    # the policy's feature dimensions over the minor (contiguous-ICI) axis
    # (parallel/mesh.py::make_mesh_tp / shard_params_tp)
    model_axis: int = 1
    # write a jax.profiler trace of iteration 2 to this dir ("" = off)
    profile_dir: str = ""
    # training-loop pipelining: how many dispatched iterations may be in
    # flight before their single packed metric fetch is forced.  On a
    # tunneled PJRT backend the fetch round-trip is ~1 s; depth 2 hides it
    # behind two executing iterations (measured 5.28 -> 1.4 s/iter).
    # Logging/eval/checkpointing lag by `pipeline_depth` iterations.
    pipeline_depth: int = 2
    obs_dtype: str = "float32"      # rollout obs storage dtype ("bfloat16" halves HBM)


@dataclass
class Config:
    env: EnvConfig = field(default_factory=EnvConfig)
    model: ModelConfig = field(default_factory=ModelConfig)
    ppo: PPOConfig = field(default_factory=PPOConfig)
    runner: RunnerConfig = field(default_factory=RunnerConfig)


def _is_optional_field(node: Any, name: str) -> bool:
    """True when the dataclass field is Optional-typed (Union[..., None]).
    Annotations are strings under `from __future__ import annotations`, so
    resolve them through typing.get_type_hints."""
    try:
        hints = typing.get_type_hints(type(node))
    except Exception:
        return False
    t = hints.get(name)
    return (typing.get_origin(t) is typing.Union
            and type(None) in typing.get_args(t))


def _coerce(value: str, old: Any, optional: bool = False) -> Any:
    if value.lower() in ("none", "null"):
        # only Optional-typed fields accept None: silently None-ing e.g.
        # env.num_envs=none would fail far downstream (or never error),
        # since dataclass overrides are not type-validated
        if not optional:
            raise ValueError(
                f"cannot set a non-Optional config field to {value!r}")
        return None
    if old is None:
        try:
            return int(value)
        except ValueError:
            try:
                return float(value)
            except ValueError:
                return value
    if isinstance(old, bool):
        return value.lower() in ("1", "true", "yes", "on")
    return type(old)(value)


def apply_overrides(cfg: Config, overrides: Tuple[str, ...]) -> Config:
    """Apply `a.b.c=value` overrides, returning a new Config."""
    for item in overrides:
        path, _, value = item.partition("=")
        keys = path.strip().split(".")
        # walk down, rebuilding dataclasses immutably from the leaf up
        def set_in(node, keys):
            if len(keys) == 1:
                old = getattr(node, keys[0])
                new = _coerce(value, old, _is_optional_field(node, keys[0]))
                return dataclasses.replace(node, **{keys[0]: new})
            child = getattr(node, keys[0])
            return dataclasses.replace(node, **{keys[0]: set_in(child, keys[1:])})
        cfg = set_in(cfg, keys)
    return cfg


def config_to_dict(cfg: Any) -> Any:
    if dataclasses.is_dataclass(cfg):
        return {f.name: config_to_dict(getattr(cfg, f.name)) for f in dataclasses.fields(cfg)}
    return cfg
