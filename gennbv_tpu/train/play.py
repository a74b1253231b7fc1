"""Policy playback + export (reference: legged_gym/scripts/play.py and
export_policy_as_jit, legged_gym/utils/helpers.py:728-767).

Loads a checkpoint, rolls the deterministic policy for one eval protocol
(50 envs x 30 steps), prints coverage/AUC, optionally writes:
- the reconstruction of env 0 as a PLY point cloud (counterpart of the
  reference's save_pcd / open3d debug IO, gennbv/utils.py:363-367);
- the policy as a serialized StableHLO artifact via jax.export — the
  TPU-native counterpart of TorchScript export: a self-contained compiled
  function loadable with jax.export.deserialize in any JAX process without
  the framework's Python code.

    python -m gennbv_tpu.train.play --ckpt runs/<exp>/models/rl_model_best_episode_reward \
        --export policy.stablehlo --ply recon.ply
"""
from __future__ import annotations

import argparse
import os

import numpy as np


def export_policy(model, variables, obs_dim: int, path: str, batch: int = 50):
    """Serialize the deterministic inference function to StableHLO bytes."""
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    from gennbv_tpu.models import distributions

    def infer(obs):
        out = model.apply(variables, obs, train=False)
        return distributions.mode(out.logits)

    exported = jexport.export(jax.jit(infer))(
        jax.ShapeDtypeStruct((batch, obs_dim), jnp.float32)
    )
    blob = exported.serialize()
    with open(path, "wb") as f:
        f.write(blob)
    return len(blob)


def export_recurrent_policy(model, params, obs_dim: int, path: str,
                            batch: int = 1):
    """Serialize a recurrent actor (models.RecurrentActorCritic) to
    StableHLO with the hidden state in the signature:
    ``(obs, hidden) -> (action_mean, hidden')`` — the counterpart of the
    reference's PolicyExporterLSTM (helpers.py:741-767), which exports the
    LSTM with explicit hidden/cell tensors for the same reason."""
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    # the hidden state crosses the export boundary as plain arrays (jax.export
    # cannot serialize framework-private pytree node types)
    h0 = model.initial_state(batch)
    h_leaves, h_treedef = jax.tree.flatten(h0)

    def infer(obs, *hidden_leaves):
        hidden = jax.tree.unflatten(h_treedef, hidden_leaves)
        out, hidden = model.apply({"params": params}, obs, hidden)
        return (out.mean, *jax.tree.leaves(hidden))

    h_specs = [jax.ShapeDtypeStruct(x.shape, x.dtype) for x in h_leaves]
    exported = jexport.export(jax.jit(infer))(
        jax.ShapeDtypeStruct((batch, obs_dim), jnp.float32), *h_specs
    )
    blob = exported.serialize()
    with open(path, "wb") as f:
        f.write(blob)
    return len(blob)


def load_exported_policy(path: str):
    """Deserialize a policy written by export_policy / export_recurrent_policy;
    returns a callable."""
    from jax import export as jexport

    with open(path, "rb") as f:
        exported = jexport.deserialize(bytearray(f.read()))
    return exported.call


def save_ply(path: str, pts: np.ndarray):
    """Minimal ASCII PLY writer (replaces open3d, SURVEY §2.6 N6)."""
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {len(pts)}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        f.write("end_header\n")
        for p in pts:
            f.write(f"{p[0]:.4f} {p[1]:.4f} {p[2]:.4f}\n")


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--ckpt", type=str, default=None,
                   help="orbax checkpoint dir (rl_model_* under runs/<exp>/models)")
    p.add_argument("--export", type=str, default=None,
                   help="write the deterministic policy as StableHLO to this path")
    p.add_argument("--ply", type=str, default=None,
                   help="write env 0's reconstruction point cloud to this path")
    p.add_argument("--gif", type=str, default=None,
                   help="record env 0's episode (depth view + coverage map) "
                        "as an animated GIF (vec_video_recorder analogue)")
    p.add_argument("--obj", type=str, default=None,
                   help="write env 0's reconstruction as a quad-mesh OBJ "
                        "(native C++ mesher)")
    p.add_argument("--num_envs", type=int, default=None)
    p.add_argument("--set", action="append", default=[], metavar="KEY=VAL")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from gennbv_tpu.algo import evaluation
    from gennbv_tpu.config import Config, apply_overrides, eval_env_config
    from gennbv_tpu.env import ReconEnv, make_scenes
    from gennbv_tpu.models import distributions, init_policy
    from gennbv_tpu.utils.checkpoint import CheckpointManager

    cfg = apply_overrides(Config(), tuple(args.set))
    env_cfg = eval_env_config(cfg.env)
    if args.num_envs:
        env_cfg = apply_overrides(
            Config(env=env_cfg), (f"env.num_envs={args.num_envs}",)
        ).env
    scenes = make_scenes(
        # held-out scenes: different seed than training, like the reference's
        # batch-12 eval split (env_eval_gennbv.py:18-50)
        type(env_cfg.scene)(**{**env_cfg.scene.__dict__,
                               "num_scenes": env_cfg.num_envs,
                               "seed": env_cfg.scene.seed + 1000}),
        env_cfg.renderer.resolution,
    )
    env = ReconEnv(env_cfg, scenes)
    model, variables = init_policy(cfg.model, jax.random.PRNGKey(0), env.obs_dim)

    if args.ckpt:
        mgr = CheckpointManager(os.path.dirname(os.path.abspath(args.ckpt)))
        variables = mgr.restore_policy(os.path.basename(args.ckpt))
        print(f"loaded checkpoint {args.ckpt}")

    res = evaluation.evaluate(env, model, variables)
    print(f"eval: coverage={res.mean_final_coverage:.4f} AUC={res.mean_auc:.4f} "
          f"reward={res.mean_reward:.3f} ep_len={res.mean_ep_length:.1f} "
          f"accuracy={res.mean_accuracy_cm:.3f}cm")

    if args.export:
        n = export_policy(model, variables, env.obs_dim, args.export,
                          batch=env_cfg.num_envs)
        print(f"exported StableHLO policy ({n} bytes) -> {args.export}")

    if args.ply or args.gif or args.obj:
        # deterministic rollout of env 0, recording depth + coverage
        from gennbv_tpu.utils.episode_video import EpisodeVideoRecorder
        rec = EpisodeVideoRecorder(env_cfg.camera.depth_max)
        rh, rw = env_cfg.rgb_h, env_cfg.rgb_w
        state, out = env.reset(env_cfg.num_envs)
        for _ in range(env_cfg.max_episode_length):
            out_m = model.apply(variables, out.obs, train=False)
            actions = distributions.mode(out_m.logits)
            state, out = env.step(state, actions)
            if args.gif:
                # latest shaded-depth history frame of env 0 (obs rgb slice
                # is in [0, 255] where bright = near; recover pseudo-depth)
                gray = np.array(out.obs[0, -rh * rw:]).reshape(rh, rw)
                depth = (1.0 - gray / 255.0) * env_cfg.camera.depth_max
                rec.add(depth, np.array(state.scanned_gt[0]))
        if args.gif:
            rec.write(args.gif)
            print(f"wrote {len(rec)}-frame episode gif -> {args.gif}")
        if args.obj:
            from gennbv_tpu.utils.native import mesh_voxels_to_obj
            grid = np.array(state.scanned_gt[0])
            sid = int(np.array(state.scene_id[0]))
            rng = np.array(env.scenes.range_gt[sid])
            vs = np.array(env.scenes.voxel_size[sid])
            origin = rng[[1, 3, 5]] - 0.5 * vs  # voxel lower corners
            n = mesh_voxels_to_obj(grid, origin, vs, args.obj)
            print(f"wrote {n}-quad reconstruction mesh -> {args.obj}")
        if args.ply:
            grid = np.array(state.scanned_gt[0])
            sid = int(np.array(state.scene_id[0]))
            rng = np.array(env.scenes.range_gt[sid])
            vs = np.array(env.scenes.voxel_size[sid])
            idx = np.argwhere(grid > 0.5)
            # range_gt layout: (x_max, x_min, y_max, y_min, z_max, z_min)
            pts = (idx + 0.5) * vs[None, :] + rng[None, [1, 3, 5]]
            save_ply(args.ply, pts)
            print(f"wrote {len(pts)} scanned voxels -> {args.ply}")


if __name__ == "__main__":
    main()
