"""Regenerate the committed golden fixtures (tests/goldens/).

Run after an INTENTIONAL numerics change, then review the diff:
    JAX_PLATFORMS=cpu python tools/make_goldens.py
The golden pins the full mapping pipeline (render -> zbuf -> visibility ->
hits -> carve -> coverage -> reward -> obs) on a deterministic tiny config,
so unintended numeric drift fails tests/test_goldens.py.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np
import jax

# env vars alone are too late here: a sitecustomize hook pre-imports jax with
# JAX_PLATFORMS=axon, so the platform must be forced via jax.config (same as
# tests/conftest.py) or goldens silently pin TPU numerics
jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu"

import jax.numpy as jnp


def build():
    from gennbv_tpu.config import (CameraConfig, EnvConfig, RendererConfig,
                                   SceneConfig)
    from gennbv_tpu.env import ReconEnv, make_scenes

    cfg = EnvConfig(
        num_envs=4,
        camera=CameraConfig(height=24, width=24),
        renderer=RendererConfig(resolution=24),
        scene=SceneConfig(num_scenes=2, seed=7),
        max_episode_length=6,
    )
    env = ReconEnv(cfg, make_scenes(cfg.scene, cfg.renderer.resolution))
    state, out = env.reset(4)
    # deterministic scripted actions (orbit-ish)
    acts = np.array([
        [50, 30, 20, 0, 6, 3],
        [20, 60, 15, 0, 4, 9],
        [70, 40, 30, 0, 8, 0],
    ], np.int32)
    obs_list, rew_list, cov_list = [np.asarray(out.obs)], [], []
    for a in acts:
        state, out = env.step(state, jnp.tile(jnp.asarray(a)[None], (4, 1)))
        obs_list.append(np.asarray(out.obs))
        rew_list.append(np.asarray(out.reward))
        cov_list.append(np.asarray(out.coverage))
    return {
        "obs": np.stack(obs_list),
        "rewards": np.stack(rew_list),
        "coverage": np.stack(cov_list),
        "prob_grid": np.asarray(state.prob_grid),
        "actions": acts,
    }


if __name__ == "__main__":
    out = build()
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests", "goldens", "mapping_golden.npz")
    np.savez_compressed(path, **out)
    print(f"wrote {path}: " + ", ".join(
        f"{k}{v.shape}" for k, v in out.items()))
