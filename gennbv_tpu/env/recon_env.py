"""The GenNBV task environment as a pure, jit-steppable state transition.

Replaces the reference's four-layer env stack (BaseTask -> DroneRobot ->
DroneVisualInputEnv -> Env_Train_GenNBV, SURVEY §1 L4-L6) with one
functional core: ``step(state, action) -> (state', StepOutput)``.  The whole
step — discrete-pose decode, depth rendering, back-projection, occupancy
mapping, reward, termination, auto-reset — is batched over envs and runs
on-device, so a rollout is a single ``lax.scan``.

Reference-semantics notes (all behaviours preserved):
- teleport env: the action IS the next camera pose (env_train_gennbv.py:1-3)
- fresh envs (episode_len == 0) have their action forced to init_action
  (env_train_gennbv.py:249-253)
- obs returned at a terminal step is the PRE-reset observation; state
  buffers reset afterwards (get_step_return, env_train_gennbv.py:359-375)
- rewards: surface-coverage delta + short-path penalty, positive-clipped,
  then termination bonus added after the clip (env_train_base.py:377-398)
- termination: collision | timeout | coverage > 0.99
  (env_train_gennbv.py:438-457)
- collision is a voxel-occupancy test at the target pose instead of PhysX
  contact forces (SURVEY §7 hard part #4)
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from gennbv_tpu import spec
from gennbv_tpu.config import EnvConfig, resolve_renderer_impls
from gennbv_tpu.env import scene as scene_lib
from gennbv_tpu.ops import backproject, camera, carve, render, splat, voxel


class EnvState(NamedTuple):
    pose_buf: jnp.ndarray      # [N, L, 6] chronological pose history
    rgb_buf: jnp.ndarray       # [N, K, h, w] grayscale history
    prob_grid: jnp.ndarray     # [N, G, G, G]
    scanned_gt: jnp.ndarray    # [N, G, G, G]
    tri_grid: jnp.ndarray      # [N, G, G, G]
    coverage: jnp.ndarray      # [N]
    episode_len: jnp.ndarray   # [N] int32
    scene_id: jnp.ndarray      # [N] int32
    # episode accounting (reference: episode_sums / cur_reward_sum,
    # env_train_base.py:629-639, env_train_gennbv.py:425-428)
    ep_rew_coverage: jnp.ndarray   # [N]
    ep_rew_short_path: jnp.ndarray  # [N]
    ep_rew_termination: jnp.ndarray  # [N]
    ep_reward: jnp.ndarray     # [N]


class StepOutput(NamedTuple):
    obs: jnp.ndarray           # [N, OBS_DIM] flat (state ++ grid ++ state_rgb)
    reward: jnp.ndarray        # [N]
    done: jnp.ndarray          # [N] bool
    time_out: jnp.ndarray      # [N] bool
    coverage: jnp.ndarray      # [N] coverage ratio after this step
    collision: jnp.ndarray     # [N] bool
    # per-episode sums of terminated envs (0 elsewhere), for logging
    ep_reward: jnp.ndarray
    ep_length: jnp.ndarray
    ep_rew_coverage: jnp.ndarray
    ep_rew_short_path: jnp.ndarray
    ep_rew_termination: jnp.ndarray


class ReconEnv:
    """Batched GenNBV environment over a SceneSet.

    All methods are pure; `step`/`reset` are jit-compatible and close over
    static config + scene tensors only.
    """

    def __init__(self, cfg: EnvConfig, scenes: scene_lib.SceneSet,
                 depth_source=None):
        """depth_source: required for renderer.mode "replay"/"callback"
        (env/depth_sources.py) — the pluggable Isaac Gym camera replacement;
        ignored for the built-in "splat"/"dda" renderers."""
        # pin the mesh-aware "auto" renderer impls against the actual host
        # device count (config.resolve_renderer_impls): a ReconEnv built
        # directly from a fresh config on a multi-device host must not
        # resolve auto->pallas — a pallas_call has no GSPMD partitioning
        # rule, so the sharded rollout would all-gather its image operands
        # every step.  Runner pins earlier against its mesh size; non-auto
        # values pass through, so the two resolutions compose.
        cfg = resolve_renderer_impls(cfg, jax.device_count())
        self.cfg = cfg
        self.scenes = scenes
        self.depth_source = depth_source
        if cfg.renderer.mode in ("replay", "callback"):
            assert depth_source is not None, \
                f"renderer.mode={cfg.renderer.mode!r} needs a depth_source"
        cam = cfg.camera
        self.cam_rays = jnp.asarray(
            camera.camera_rays(cam.height, cam.width, cam.horizontal_fov_deg)
        )
        self.intrinsics = jnp.asarray(
            camera.intrinsics(cam.height, cam.width, cam.horizontal_fov_deg)
        )
        self.action_unit = jnp.asarray(spec.ACTION_UNIT, jnp.float32)
        self.pose_low = jnp.asarray(spec.CLIP_POSE_LOW, jnp.float32)
        self.nvec = jnp.asarray(spec.NVEC, jnp.int32)
        self.init_action = jnp.asarray(spec.INIT_ACTION, jnp.int32)
        self.init_pose = jnp.asarray(spec.INIT_POSE_BUF, jnp.float32)
        g = scenes.grid_size
        self.num_actions = spec.ACTION_DIM
        self.obs_dim = (
            cfg.pose_buf_len * spec.ACTION_DIM + g ** 3 + cfg.rgb_k * cfg.rgb_h * cfg.rgb_w
        )
        # Per-scene cache for the FORCED INIT VIEW (the deterministic
        # top-down pose every freshly-reset env takes, spec.INIT_ACTION):
        # those views see most of the scene (~0.9 Q valid), defeating every
        # per-env-adaptive splat path (survivor caps, Pallas chunk
        # skipping) on nearly every step — one fresh env per batch is
        # enough.  The splat's DOWNSTREAM products (hit grid, carve mask,
        # grayscale obs; ~8 MB for 256 scenes) are computed once per scene
        # at construction and substituted for fresh envs; caching the raw
        # z-buffer ([S, H*W] f32, 164 MB at 400^2) instead blows the axon
        # remote-compile request limit when it becomes a jit constant.
        self._init_cache = None
        if cfg.renderer.mode == "splat" and self._use_splat_batch:
            self._init_cache = self._build_init_step_cache()

    @property
    def _use_splat_batch(self) -> bool:
        """Batched splat path (init-view cache + skip_env): on for survivor
        compaction, and for the Pallas kernel — its per-env valid-chunk
        skipping only pays off when the ~0.9-valid forced init views are
        served from the cache instead."""
        cfg = self.cfg
        return (cfg.renderer.compact_cap_frac is not None
                or cfg.renderer.band_split_for(cfg.camera.height) is not None
                or cfg.renderer.zbuf_impl == "pallas")

    def _build_init_step_cache(self):
        """Run the dense splat + hits/carve for the forced init view of
        every scene: (hit_grid [S, G^3] bool, traversed [S, G^3] bool,
        gray [S, rgb_h, rgb_w] f32)."""
        cfg = self.cfg
        s = self.scenes.num_scenes
        pose = self.init_action.astype(jnp.float32) * self.action_unit \
            + self.pose_low
        poses = jnp.broadcast_to(pose, (s, spec.ACTION_DIM))
        sid = jnp.arange(s, dtype=jnp.int32)

        @jax.jit
        def build():
            r_c2w, t_c2w = jax.vmap(
                lambda p: camera.pose_to_c2w(p, cfg.camera.z_offset))(poses)
            veps = jnp.mean(
                (self.scenes.box_hi - self.scenes.box_lo)
                / self.scenes.grid_res, axis=-1)
            zbuf, _, vis = splat.splat_depth_batch(
                self.scenes.surf_pts, self.scenes.surf_mask, self.intrinsics,
                r_c2w, t_c2w, cfg.camera.height, cfg.camera.width,
                cfg.camera.depth_max, veps, cfg.renderer.footprint,
                cfg.renderer.zbuf_impl, None,
                gather_impl=cfg.renderer.gather_impl_for(cfg.camera.height),
            )
            hit, trav = jax.vmap(self._hits_carve_one)(
                sid, r_c2w, t_c2w, zbuf, vis)
            gray = camera.depth_to_grayscale(
                zbuf.reshape(s, cfg.camera.height, cfg.camera.width),
                cfg.camera.depth_max, cfg.rgb_h, cfg.rgb_w)
            return hit > 0.5, trav > 0.5, gray

        return jax.block_until_ready(build())

    # ------------------------------------------------------------------
    def init_state(self, num_envs: int, scene_id: Optional[jnp.ndarray] = None) -> EnvState:
        cfg = self.cfg
        g = self.scenes.grid_size
        if scene_id is None:
            # env -> scene mapping: env_idx % num_scene (env_train_gennbv.py:87-90)
            scene_id = jnp.arange(num_envs, dtype=jnp.int32) % self.scenes.num_scenes
        zeros_g = jnp.zeros((num_envs, g, g, g), jnp.float32)
        return EnvState(
            pose_buf=jnp.broadcast_to(
                self.init_pose, (num_envs, cfg.pose_buf_len, spec.ACTION_DIM)
            ).astype(jnp.float32),
            rgb_buf=jnp.zeros((num_envs, cfg.rgb_k, cfg.rgb_h, cfg.rgb_w), jnp.float32),
            prob_grid=zeros_g,
            scanned_gt=zeros_g,
            tri_grid=zeros_g,
            coverage=jnp.zeros(num_envs, jnp.float32),
            episode_len=jnp.zeros(num_envs, jnp.int32),
            scene_id=scene_id,
            ep_rew_coverage=jnp.zeros(num_envs, jnp.float32),
            ep_rew_short_path=jnp.zeros(num_envs, jnp.float32),
            ep_rew_termination=jnp.zeros(num_envs, jnp.float32),
            ep_reward=jnp.zeros(num_envs, jnp.float32),
        )

    def reset(self, num_envs: int, scene_id: Optional[jnp.ndarray] = None):
        """Reference reset: clear all envs, then execute the forced initial
        top-down action once and return its observation
        (env_train_gennbv.py:229-244)."""
        state = self.init_state(num_envs, scene_id)
        actions = jnp.broadcast_to(self.init_action, (num_envs, spec.ACTION_DIM))
        state, out = self.step(state, actions)
        return state, out

    # ------------------------------------------------------------------
    def _splat_step_one(self, scene_id, pose, prob_grid, scanned_gt):
        """Fused render + mapping for one env via surface splatting
        (ops/splat.py) — the TPU-native hot path.  The visible surface
        voxels ARE the mapping hits; no per-pixel back-projection needed."""
        cfg = self.cfg
        g = self.scenes.grid_size
        h, w = cfg.camera.height, cfg.camera.width
        range_gt = self.scenes.range_gt[scene_id]
        vsize = self.scenes.voxel_size[scene_id]
        grid_gt = self.scenes.grid_gt[scene_id]
        n_valid = self.scenes.num_valid_voxel[scene_id]
        surf_pts = self.scenes.surf_pts[scene_id]
        surf_mask = self.scenes.surf_mask[scene_id]
        render_vsize = (self.scenes.box_hi[scene_id] - self.scenes.box_lo[scene_id]) \
            / self.scenes.grid_res

        r_c2w, t_c2w = camera.pose_to_c2w(pose, cfg.camera.z_offset)
        if cfg.renderer.zbuf_impl == "mxu" and cfg.renderer.merge_vis_carve:
            # merged-gather fast path: the splat's visibility test and the
            # carve's z-test share ONE [Q+G^3, H] x [H, W] image gather
            # (splat.splat_vis_carve) — bit-identical to the split form,
            # one image pass fewer (measured on the 128^2 hot path)
            centers = scene_lib.voxel_centers(range_gt, vsize, g)
            margin = 0.5 * jnp.mean(vsize)
            zbuf, visible, free = splat.splat_vis_carve(
                surf_pts, surf_mask, centers, self.intrinsics, r_c2w, t_c2w,
                h, w, cfg.camera.depth_max, jnp.mean(render_vsize), margin,
                cfg.renderer.footprint,
                gather_impl=cfg.renderer.gather_impl_for(cfg.camera.height),
            )
            idx, in_bounds = voxel.points_to_voxel_idx(
                surf_pts, visible, range_gt, vsize)
            hit_grid = voxel.scatter_hits(
                g, idx, in_bounds,
                impl=cfg.renderer.scatter_impl_for(cfg.camera.height))
            traversed = free.reshape(g, g, g)
            prob_grid, tri, scanned_gt, ratio = self._apply_mapping_one(
                scene_id, hit_grid, traversed, prob_grid, scanned_gt)
            return zbuf, prob_grid, tri, scanned_gt, ratio
        zbuf, fg, visible = splat.splat_depth(
            surf_pts, surf_mask, self.intrinsics, r_c2w, t_c2w,
            h, w, cfg.camera.depth_max, jnp.mean(render_vsize),
            cfg.renderer.footprint, cfg.renderer.zbuf_impl,
            gather_impl=cfg.renderer.gather_impl_for(cfg.camera.height),
        )
        return self._post_splat_one(scene_id, r_c2w, t_c2w, zbuf, visible,
                                    prob_grid, scanned_gt)

    def _post_splat_one(self, scene_id, r_c2w, t_c2w, zbuf, visible,
                        prob_grid, scanned_gt):
        """Mapping update from a rendered z-buffer + per-surf-point
        visibility: hits, carving, coverage (one env)."""
        hit_grid, traversed = self._hits_carve_one(
            scene_id, r_c2w, t_c2w, zbuf, visible)
        prob_grid, tri, scanned_gt, ratio = self._apply_mapping_one(
            scene_id, hit_grid, traversed, prob_grid, scanned_gt)
        return zbuf, prob_grid, tri, scanned_gt, ratio

    def _hits_carve_one(self, scene_id, r_c2w, t_c2w, zbuf, visible):
        """Visible surf points -> hit grid; z-test carve mask (one env)."""
        cfg = self.cfg
        g = self.scenes.grid_size
        h, w = cfg.camera.height, cfg.camera.width
        range_gt = self.scenes.range_gt[scene_id]
        vsize = self.scenes.voxel_size[scene_id]
        surf_pts = self.scenes.surf_pts[scene_id]

        idx, in_bounds = voxel.points_to_voxel_idx(surf_pts, visible, range_gt, vsize)
        hit_grid = voxel.scatter_hits(
            g, idx, in_bounds,
            impl=cfg.renderer.scatter_impl_for(cfg.camera.height))

        centers = scene_lib.voxel_centers(range_gt, vsize, g)
        margin = 0.5 * jnp.mean(vsize)
        traversed = carve.carve_ztest(
            centers, zbuf.reshape(h, w), None,
            self.intrinsics, r_c2w, t_c2w, margin,
            depth_max=cfg.camera.depth_max,
            gather_impl=cfg.renderer.gather_impl_for(cfg.camera.height),
        ).reshape(g, g, g)
        return hit_grid, traversed

    def _apply_mapping_one(self, scene_id, hit_grid, traversed,
                           prob_grid, scanned_gt):
        grid_gt = self.scenes.grid_gt[scene_id]
        n_valid = self.scenes.num_valid_voxel[scene_id]
        prob_grid = carve.update_prob_grid(prob_grid, hit_grid, traversed)
        tri = voxel.tri_cls(prob_grid)
        scanned_gt, ratio = voxel.coverage_update(scanned_gt, hit_grid, grid_gt, n_valid)
        return prob_grid, tri, scanned_gt, ratio

    def _splat_step_batch(self, scene_id, poses, fresh, prob_grid, scanned_gt):
        """Batched splat for the per-env-adaptive paths (survivor
        compaction / Pallas chunk skipping), then the mapping update.
        Freshly-reset envs (the forced init view) have all their points
        masked out of the splat (skip_env) and their hit/carve/grayscale
        products substituted from the per-scene cache — bit-compatible
        with vmap(_splat_step_one) up to the documented 1-ulp decode
        tolerance.  Returns (gray, prob_grid, tri, scanned_gt, ratio)."""
        cfg = self.cfg
        h, w = cfg.camera.height, cfg.camera.width
        n = scene_id.shape[0]
        surf_pts = self.scenes.surf_pts[scene_id]          # [N, Q, 3]
        surf_mask = self.scenes.surf_mask[scene_id]
        render_vsize = (self.scenes.box_hi[scene_id] - self.scenes.box_lo[scene_id]) \
            / self.scenes.grid_res
        q = surf_pts.shape[1]
        cap = None
        if cfg.renderer.compact_cap_frac is not None:
            cap = int(-(-cfg.renderer.compact_cap_frac * q // 128) * 128)
        band_split = cfg.renderer.band_split_for(h)
        band_cap = None
        if band_split is not None:
            band_cap = int(-(-cfg.renderer.band_cap_frac * q // 128) * 128)

        r_c2w, t_c2w = jax.vmap(
            lambda p: camera.pose_to_c2w(p, cfg.camera.z_offset))(poses)
        zbuf, _, visible = splat.splat_depth_batch(
            surf_pts, surf_mask, self.intrinsics, r_c2w, t_c2w,
            h, w, cfg.camera.depth_max, jnp.mean(render_vsize, axis=-1),
            cfg.renderer.footprint, cfg.renderer.zbuf_impl, cap,
            skip_env=fresh,
            band_split=band_split, band_cap=band_cap,
            gather_impl=cfg.renderer.gather_impl_for(h),
        )
        hit, trav = jax.vmap(self._hits_carve_one)(
            scene_id, r_c2w, t_c2w, zbuf, visible)
        gray = camera.depth_to_grayscale(
            zbuf.reshape(n, h, w), cfg.camera.depth_max, cfg.rgb_h, cfg.rgb_w)

        c_hit, c_trav, c_gray = self._init_cache
        f1 = fresh[:, None, None, None]
        hit = jnp.where(f1, c_hit[scene_id].astype(hit.dtype), hit)
        trav = jnp.where(f1, c_trav[scene_id].astype(trav.dtype), trav)
        gray = jnp.where(fresh[:, None, None], c_gray[scene_id], gray)

        prob_grid, tri, scanned_gt, ratio = jax.vmap(self._apply_mapping_one)(
            scene_id, hit, trav, prob_grid, scanned_gt)
        return gray, prob_grid, tri, scanned_gt, ratio

    def _render_one(self, scene_id, pose):
        """Depth + fg for one env (vmapped in step)."""
        cfg = self.cfg
        occ = self.scenes.render_occ[scene_id]
        lo = self.scenes.box_lo[scene_id]
        hi = self.scenes.box_hi[scene_id]
        r_c2w, t_c2w = camera.pose_to_c2w(pose, cfg.camera.z_offset)
        depth, fg = render.render_depth(
            occ, lo, hi, self.cam_rays, r_c2w, t_c2w,
            self.scenes.grid_res, 3 * self.scenes.grid_res, cfg.camera.depth_max,
        )
        return depth, fg, r_c2w, t_c2w

    def _mapping_one(self, scene_id, pose, depth, fg, r_c2w, t_c2w, prob_grid, scanned_gt):
        """Occupancy-mapping update for one env: the batched replacement of
        the reference's per-env loop (env_train_gennbv.py:295-314)."""
        cfg = self.cfg
        g = self.scenes.grid_size
        range_gt = self.scenes.range_gt[scene_id]
        vsize = self.scenes.voxel_size[scene_id]
        grid_gt = self.scenes.grid_gt[scene_id]
        n_valid = self.scenes.num_valid_voxel[scene_id]

        pts, valid = backproject.backproject(depth, fg, self.cam_rays, r_c2w, t_c2w)
        idx, in_bounds = voxel.points_to_voxel_idx(pts, valid, range_gt, vsize)
        hit_grid = voxel.scatter_hits(
            g, idx, in_bounds,
            impl=cfg.renderer.scatter_impl_for(cfg.camera.height))

        if cfg.carve_mode == "bresenham":
            cam_voxel = voxel.pose_to_voxel_idx(pose[:3], range_gt, vsize)
            traversed = carve.carve_bresenham(hit_grid, cam_voxel, g)
        else:
            centers = scene_lib.voxel_centers(range_gt, vsize, g)
            margin = 0.5 * jnp.mean(vsize)
            h, w = cfg.camera.height, cfg.camera.width
            traversed = carve.carve_ztest(
                centers, depth.reshape(h, w), fg.reshape(h, w),
                self.intrinsics, r_c2w, t_c2w, margin,
            ).reshape(g, g, g)

        prob_grid = carve.update_prob_grid(prob_grid, hit_grid, traversed)
        tri = voxel.tri_cls(prob_grid)
        scanned_gt, ratio = voxel.coverage_update(scanned_gt, hit_grid, grid_gt, n_valid)
        return prob_grid, tri, scanned_gt, ratio

    def _collision_one(self, scene_id, pose):
        return render.check_collision(
            self.scenes.render_occ[scene_id],
            self.scenes.box_lo[scene_id],
            self.scenes.box_hi[scene_id],
            pose[:3],
            self.cfg.collision_radius,
            self.scenes.grid_res,
        )

    def _collision_batch(self, scene_id, poses):
        return render.check_collision_batch(
            self.scenes.render_occ, self.scenes.box_lo, self.scenes.box_hi,
            scene_id, poses[:, :3], self.cfg.collision_radius,
            self.scenes.grid_res,
        )

    # ------------------------------------------------------------------
    @partial(jax.jit, static_argnums=0)
    def step(self, state: EnvState, actions: jnp.ndarray):
        """actions: [N, 6] discrete pose indices."""
        cfg = self.cfg
        n = state.episode_len.shape[0]

        # clip + force init action on freshly-reset envs
        actions = jnp.clip(actions.astype(jnp.int32), 0, self.nvec - 1)
        fresh = (state.episode_len == 0)[:, None]
        actions = jnp.where(fresh, self.init_action[None, :], actions)
        poses = actions.astype(jnp.float32) * self.action_unit + self.pose_low

        episode_len = state.episode_len + 1

        # render + map (vmapped over envs)
        gray = None
        if cfg.renderer.mode == "splat":
            if self._use_splat_batch:
                gray, prob_grid, tri, scanned_gt, ratio = self._splat_step_batch(
                    state.scene_id, poses, fresh[:, 0], state.prob_grid,
                    state.scanned_gt
                )
            else:
                depth, prob_grid, tri, scanned_gt, ratio = jax.vmap(self._splat_step_one)(
                    state.scene_id, poses, state.prob_grid, state.scanned_gt
                )
        else:
            if cfg.renderer.mode == "dda":
                depth, fg, r_c2w, t_c2w = jax.vmap(self._render_one)(
                    state.scene_id, poses)
            else:  # "replay" | "callback": pluggable external depth feed
                depth, fg = self.depth_source.render_batch(state.scene_id, poses)
                r_c2w, t_c2w = jax.vmap(
                    lambda p: camera.pose_to_c2w(p, cfg.camera.z_offset)
                )(poses)
            prob_grid, tri, scanned_gt, ratio = jax.vmap(self._mapping_one)(
                state.scene_id, poses, depth, fg, r_c2w, t_c2w,
                state.prob_grid, state.scanned_gt,
            )
        collision = self._collision_batch(state.scene_id, poses)

        # observation buffers
        pose_buf = jnp.concatenate([state.pose_buf[:, 1:], poses[:, None, :]], axis=1)
        if gray is None:
            gray = camera.depth_to_grayscale(
                depth.reshape(n, cfg.camera.height, cfg.camera.width),
                cfg.camera.depth_max, cfg.rgb_h, cfg.rgb_w,
            )
        rgb_buf = jnp.concatenate([state.rgb_buf[:, 1:], gray[:, None]], axis=1)

        # rewards (scale * dt semantics, config.RewardConfig)
        rc = cfg.reward
        r_cov = (ratio - state.coverage) * (rc.surface_coverage * rc.dt)
        extra = jnp.clip(
            episode_len - spec.SHORT_PATH_FREE_STEPS, 0, spec.SHORT_PATH_MAX_EXTRA
        ).astype(jnp.float32)
        r_sp = -extra * (rc.short_path * rc.dt)
        rew = r_cov + r_sp
        if rc.only_positive:
            rew = jnp.maximum(rew, 0.0)

        # termination
        time_out = episode_len >= cfg.max_episode_length
        done = collision | time_out
        if cfg.coverage_done_threshold is not None:
            done = done | (ratio > cfg.coverage_done_threshold)
        r_term = (done & ~time_out).astype(jnp.float32) * (rc.termination * rc.dt)
        rew = rew + r_term

        # episode accounting (pre-reset values surfaced where done)
        ep_rew_cov = state.ep_rew_coverage + r_cov
        ep_rew_sp = state.ep_rew_short_path + r_sp
        ep_rew_term = state.ep_rew_termination + r_term
        ep_reward = state.ep_reward + rew
        d_f = done.astype(jnp.float32)

        # observation: PRE-reset (built from the updated buffers)
        obs = jnp.concatenate(
            [
                pose_buf.reshape(n, -1),
                tri.reshape(n, -1),
                rgb_buf.reshape(n, -1),
            ],
            axis=-1,
        )

        # auto-reset terminated envs
        def mask(new, reset_val, d=done):
            shape = (n,) + (1,) * (new.ndim - 1)
            return jnp.where(d.reshape(shape), reset_val, new)

        g = self.scenes.grid_size
        zeros_g = jnp.zeros((n, g, g, g), jnp.float32)
        new_state = EnvState(
            pose_buf=mask(pose_buf, self.init_pose[None, None, :]),
            rgb_buf=mask(rgb_buf, 0.0),
            prob_grid=mask(prob_grid, zeros_g),
            scanned_gt=mask(scanned_gt, zeros_g),
            tri_grid=mask(tri, zeros_g),
            coverage=mask(ratio, 0.0),
            episode_len=jnp.where(done, 0, episode_len),
            scene_id=state.scene_id,
            ep_rew_coverage=mask(ep_rew_cov, 0.0),
            ep_rew_short_path=mask(ep_rew_sp, 0.0),
            ep_rew_termination=mask(ep_rew_term, 0.0),
            ep_reward=mask(ep_reward, 0.0),
        )

        out = StepOutput(
            obs=obs,
            reward=rew,
            done=done,
            time_out=time_out,
            coverage=ratio,
            collision=collision,
            ep_reward=ep_reward * d_f,
            ep_length=episode_len.astype(jnp.float32) * d_f,
            ep_rew_coverage=ep_rew_cov * d_f,
            ep_rew_short_path=ep_rew_sp * d_f,
            ep_rew_termination=ep_rew_term * d_f,
        )
        return new_state, out
