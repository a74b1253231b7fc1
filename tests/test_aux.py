"""Tests for auxiliary components: env_checker, terrain scenes, play/export."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gennbv_tpu.config import (CameraConfig, EnvConfig, ModelConfig,
                               RendererConfig, SceneConfig)
from gennbv_tpu.env import ReconEnv, make_scenes
from gennbv_tpu.env.synthetic import IdentityEnvMultiDiscrete, PointGoalEnv
from gennbv_tpu.env.terrain import TERRAIN_TYPES, generate_terrain
from gennbv_tpu.utils.env_checker import check_env


def _tiny_env_cfg(**kw):
    return EnvConfig(
        num_envs=kw.pop("num_envs", 4),
        camera=CameraConfig(height=16, width=16),
        renderer=RendererConfig(resolution=16),
        scene=kw.pop("scene", SceneConfig(num_scenes=2, seed=0)),
        max_episode_length=kw.pop("max_episode_length", 5),
        **kw,
    )


def test_check_env_passes_on_all_envs():
    check_env(IdentityEnvMultiDiscrete(nvec=(3, 4), ep_length=4))
    check_env(PointGoalEnv(dim=2, ep_length=4))
    cfg = _tiny_env_cfg()
    check_env(ReconEnv(cfg, make_scenes(cfg.scene, cfg.renderer.resolution)))


def test_check_env_catches_violation():
    from gennbv_tpu.env.synthetic import SynthOutput

    class BadEnv:
        num_actions = 2
        obs_dim = 3

        def reset(self, n, rng=None):
            return (jnp.zeros(n),), SynthOutput(
                jnp.zeros((n, 3)), jnp.zeros(n),
                jnp.zeros(n, bool), jnp.zeros(n, bool))

        def step(self, state, actions):
            n = actions.shape[0]
            return state, SynthOutput(
                jnp.full((n, 3), jnp.nan),   # violation
                jnp.zeros(n), jnp.zeros(n, bool), jnp.zeros(n, bool))

    with pytest.raises(AssertionError, match="non-finite obs"):
        check_env(BadEnv())


def test_terrain_sceneset_all_kinds():
    cfg = SceneConfig(num_scenes=2 * len(TERRAIN_TYPES), seed=0,
                      extent_xy=8.0, extent_z=4.0)
    scenes = generate_terrain(cfg, grid_res=16)
    assert scenes.num_scenes == 2 * len(TERRAIN_TYPES)
    occ = np.array(scenes.render_occ).reshape(-1, 16, 16, 16)
    # every terrain has ground occupancy and some relief; none is solid
    assert (occ[:, :, :, 0] == 1).all()
    frac = occ.mean(axis=(1, 2, 3))
    assert (frac > 0.03).all() and (frac < 0.9).all(), frac
    # curriculum: later rows of the same kind have >= relief (stairs kind)
    k = TERRAIN_TYPES.index("stairs")
    relief0 = occ[k].sum()
    relief1 = occ[k + len(TERRAIN_TYPES)].sum()
    assert relief1 >= relief0
    # GT surfaces are nonempty and consistent with valid-voxel counts
    assert (np.array(scenes.num_valid_voxel) > 0).all()


def test_terrain_env_steps():
    """Terrain scenes run through the full env step (dataset='terrain')."""
    cfg = _tiny_env_cfg(scene=SceneConfig(num_scenes=2, seed=0, dataset="terrain",
                                          extent_xy=8.0, extent_z=4.0))
    env = ReconEnv(cfg, make_scenes(cfg.scene, cfg.renderer.resolution))
    state, out = env.reset(4)
    assert bool(jnp.all(jnp.isfinite(out.obs)))
    # coverage accumulates on terrain too
    a = jnp.tile(env.init_action[None, :], (4, 1)).astype(jnp.int32)
    state, out = env.step(state, (a + jnp.array([5, 5, -10, 0, 0, 3])) % env.nvec)
    assert float(out.coverage.max()) > 0.0


def test_export_policy_roundtrip(tmp_path):
    from gennbv_tpu.models import init_policy, distributions
    from gennbv_tpu.train.play import export_policy, load_exported_policy

    obs_dim = 600 + 8000 + 8192
    model, variables = init_policy(ModelConfig(), jax.random.PRNGKey(0), obs_dim)
    path = str(tmp_path / "policy.stablehlo")
    nbytes = export_policy(model, variables, obs_dim, path, batch=2)
    assert nbytes > 1000 and os.path.getsize(path) == nbytes

    run = load_exported_policy(path)
    obs = jax.random.normal(jax.random.PRNGKey(1), (2, obs_dim))
    acts = run(obs)
    expected = distributions.mode(model.apply(variables, obs, train=False).logits)
    np.testing.assert_array_equal(np.asarray(acts), np.asarray(expected))


def test_save_ply(tmp_path):
    from gennbv_tpu.train.play import save_ply
    pts = np.array([[0.0, 1.0, 2.0], [3.0, 4.0, 5.0]])
    p = str(tmp_path / "x.ply")
    save_ply(p, pts)
    txt = open(p).read()
    assert "element vertex 2" in txt and "3.0000 4.0000 5.0000" in txt


def test_episode_video_recorder(tmp_path):
    import numpy as np
    from gennbv_tpu.utils.episode_video import EpisodeVideoRecorder

    rec = EpisodeVideoRecorder(depth_max=10.0, scale=2)
    rng = np.random.RandomState(0)
    for t in range(5):
        rec.add(rng.uniform(0, 10, (16, 16)), rng.rand(8, 8, 8) > 0.5)
    p = str(tmp_path / "ep.gif")
    rec.write(p, fps=2)
    from PIL import Image
    im = Image.open(p)
    assert im.n_frames == 5
    assert im.size[0] == 2 * im.size[1]  # depth panel + coverage panel

    # empty recorder -> clear error
    import pytest
    with pytest.raises(ValueError, match="no frames"):
        EpisodeVideoRecorder(10.0).write(str(tmp_path / "x.gif"))


def test_objects_sceneset_zero_shot_family():
    """dataset='objects' (primitive compositions, the OmniObject3D-style
    zero-shot family) shares conventions with the house generator and runs
    through the full env step unchanged."""
    from gennbv_tpu.env.scene import generate_procedural

    cfg = SceneConfig(num_scenes=8, seed=0, dataset="objects")
    scenes = generate_procedural(cfg, grid_res=24)
    occ = np.array(scenes.render_occ).reshape(-1, 24, 24, 24)
    frac = occ.mean(axis=(1, 2, 3))
    assert (frac > 0.005).all() and (frac < 0.6).all(), frac
    assert (np.array(scenes.num_valid_voxel) > 0).all()

    env_cfg = _tiny_env_cfg(scene=cfg)
    env = ReconEnv(env_cfg, make_scenes(cfg, env_cfg.renderer.resolution))
    state, out = env.reset(4)
    assert bool(jnp.all(jnp.isfinite(out.obs)))
    assert float(out.coverage.max()) > 0.0


def test_convex_sceneset_floor_probe_family():
    """dataset='convex' (single cavity-free primitives — the chamfer-floor
    probe family): every scene is nonempty, has NO interior cavities
    (all free space is flood-reachable from the box boundary, so no GT
    surface hides inside an unreachable void), and runs through the full
    env step unchanged."""
    from gennbv_tpu.env.scene import generate_procedural

    r = 24
    cfg = SceneConfig(num_scenes=8, seed=0, dataset="convex")
    scenes = generate_procedural(cfg, grid_res=r)
    occ = np.array(scenes.render_occ).reshape(-1, r, r, r)
    frac = occ.mean(axis=(1, 2, 3))
    assert (frac > 0.003).all() and (frac < 0.6).all(), frac

    for s in range(occ.shape[0]):
        free = occ[s] == 0
        reach = np.zeros_like(free)
        # seed: free voxels on the box boundary (above-ground sides + top)
        reach[0], reach[-1] = free[0], free[-1]
        reach[:, 0], reach[:, -1] = free[:, 0], free[:, -1]
        reach[:, :, -1] = free[:, :, -1]
        for _ in range(3 * r):  # 6-connected flood fill to fixpoint
            grown = reach.copy()
            grown[1:] |= reach[:-1]
            grown[:-1] |= reach[1:]
            grown[:, 1:] |= reach[:, :-1]
            grown[:, :-1] |= reach[:, 1:]
            grown[:, :, 1:] |= reach[:, :, :-1]
            grown[:, :, :-1] |= reach[:, :, 1:]
            grown &= free
            if (grown == reach).all():
                break
            reach = grown
        assert (reach == free).all(), f"scene {s} has an interior cavity"

    env_cfg = _tiny_env_cfg(scene=cfg)
    env = ReconEnv(env_cfg, make_scenes(cfg, env_cfg.renderer.resolution))
    state, out = env.reset(4)
    assert bool(jnp.all(jnp.isfinite(out.obs)))
    assert float(out.coverage.max()) > 0.0


def test_export_recurrent_policy_roundtrip(tmp_path):
    """Recurrent StableHLO export carries the hidden state in the signature
    (PolicyExporterLSTM counterpart) and matches the live model."""
    from gennbv_tpu.models.actor_critic import RecurrentActorCritic
    from gennbv_tpu.train.play import (export_recurrent_policy,
                                       load_exported_policy)

    model = RecurrentActorCritic(num_actions=3, rnn_hidden=16,
                                 actor_hidden=(16,), critic_hidden=(16,))
    obs = jnp.zeros((2, 5))
    h0 = model.initial_state(2)
    params = model.init(jax.random.PRNGKey(0), obs, h0)["params"]

    path = str(tmp_path / "rec_policy.stablehlo")
    n = export_recurrent_policy(model, params, obs_dim=5, path=path, batch=2)
    assert n > 0
    fn = load_exported_policy(path)

    rng = jax.random.PRNGKey(1)
    obs1 = jax.random.normal(rng, (2, 5))
    h0_leaves = jax.tree.leaves(h0)
    mean_e, *h_e = fn(obs1, *h0_leaves)
    out_l, h_l = model.apply({"params": params}, obs1, h0)
    np.testing.assert_allclose(np.asarray(mean_e), np.asarray(out_l.mean),
                               rtol=1e-5, atol=1e-6)
    # second step through the exported hidden state stays consistent
    mean_e2, *_ = fn(obs1, *h_e)
    out_l2, _ = model.apply({"params": params}, obs1, h_l)
    np.testing.assert_allclose(np.asarray(mean_e2), np.asarray(out_l2.mean),
                               rtol=1e-5, atol=1e-6)
