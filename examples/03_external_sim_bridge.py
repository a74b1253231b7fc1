"""Feed the NBV env from an external depth source.

Two modes (env/depth_sources.py):
- a recorded replay bank (train/test against captured frames);
- a live host-callback bridge (plug in any external simulator/renderer:
  the host function gets (scene_ids, poses) and returns depth frames).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

from gennbv_tpu import spec
from gennbv_tpu.config import CameraConfig, EnvConfig, RendererConfig, SceneConfig
from gennbv_tpu.env import ReconEnv, make_scenes
from gennbv_tpu.env.depth_sources import (CallbackDepthSource,
                                          ReplayDepthSource,
                                          record_replay_bank)

cfg = EnvConfig(num_envs=4,
                camera=CameraConfig(height=16, width=16),
                renderer=RendererConfig(resolution=16, mode="replay"),
                scene=SceneConfig(num_scenes=2, seed=0),
                max_episode_length=6)
scenes = make_scenes(cfg.scene, cfg.renderer.resolution)

# --- record a bank with the built-in DDA renderer (stand-in for captured
# frames from a real sensor or an external simulator)
rng = np.random.RandomState(0)
acts = rng.randint(0, np.array(spec.NVEC), size=(20, 6))
poses = (acts * np.array(spec.ACTION_UNIT) + np.array(spec.CLIP_POSE_LOW)).astype(np.float32)
init = (np.array(spec.INIT_ACTION) * np.array(spec.ACTION_UNIT)
        + np.array(spec.CLIP_POSE_LOW)).astype(np.float32)
bank = record_replay_bank(scenes, cfg.camera, np.concatenate([init[None], poses]))

env = ReconEnv(cfg, scenes, ReplayDepthSource(bank))
state, out = env.reset(4)
state, out = env.step(state, jnp.asarray(acts[:4], jnp.int32) % env.nvec)
print("replay-fed coverage:", np.asarray(out.coverage).round(3))

# --- live bridge: any host function returning [N, H*W] float32 depth
frames, bposes = np.asarray(bank.frames), np.asarray(bank.poses)
W = np.array([1, 1, 1, 0, 0.76, 0.76], np.float32)

def my_simulator(scene_ids, q_poses):
    d2 = (((q_poses[:, None, :] - bposes[scene_ids]) * W) ** 2).sum(-1)
    return frames[scene_ids, d2.argmin(-1)]

import dataclasses
cb_cfg = dataclasses.replace(cfg, renderer=RendererConfig(resolution=16, mode="callback"))
env_cb = ReconEnv(cb_cfg, scenes,
                  CallbackDepthSource(my_simulator, 16, 16, cfg.camera.depth_max))
state, out = env_cb.reset(4)
print("callback-fed obs finite:", bool(jnp.isfinite(out.obs).all()))
