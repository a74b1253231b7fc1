"""Golden tests for the geometry/mapping ops against independent numpy
re-derivations of the reference semantics (SURVEY §4: the reference ships no
test suite; the mapping pipeline is pure tensor math and is golden-tested
here without any simulator)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gennbv_tpu import spec
from gennbv_tpu.ops import backproject, camera, carve, chamfer, render, voxel


# ---------------------------------------------------------------------------
# numpy reference: 3D Bresenham with the CUDA kernel's exact branch structure
# (gennbv/utils.py:48-167)
# ---------------------------------------------------------------------------
def bresenham3d_np(src, tgt, map_size, max_pts):
    x, y, z = map(int, src)
    x1, y1, z1 = map(int, tgt)
    dx, dy, dz = abs(x1 - x), abs(y1 - y), abs(z1 - z)
    sx = 1 if x < x1 else -1
    sy = 1 if y < y1 else -1
    sz = 1 if z < z1 else -1
    pts = []

    def emit(x, y, z):
        if 0 <= x < map_size and 0 <= y < map_size and 0 <= z < map_size:
            if len(pts) < max_pts:
                pts.append((x, y, z))

    dm = max(dx, dy, dz)
    if dm == dx:
        p1, p2 = 2 * dy - dx, 2 * dz - dx
        emit(x, y, z)
        for _ in range(dx):
            if len(pts) >= max_pts:
                break
            if p1 >= 0:
                y += sy
                p1 -= 2 * dx
            if p2 >= 0:
                z += sz
                p2 -= 2 * dx
            x += sx
            p1 += 2 * dy
            p2 += 2 * dz
            emit(x, y, z)
    elif dm == dy:
        p1, p2 = 2 * dx - dy, 2 * dz - dy
        emit(x, y, z)
        for _ in range(dy):
            if len(pts) >= max_pts:
                break
            if p1 >= 0:
                x += sx
                p1 -= 2 * dy
            if p2 >= 0:
                z += sz
                p2 -= 2 * dy
            y += sy
            p1 += 2 * dx
            p2 += 2 * dz
            emit(x, y, z)
    else:
        p1, p2 = 2 * dx - dz, 2 * dy - dz
        emit(x, y, z)
        for _ in range(dz):
            if len(pts) >= max_pts:
                break
            if p1 >= 0:
                x += sx
                p1 -= 2 * dz
            if p2 >= 0:
                y += sy
                p2 -= 2 * dz
            z += sz
            p1 += 2 * dx
            p2 += 2 * dy
            emit(x, y, z)
    return pts


class TestBresenham:
    def test_matches_reference_semantics(self):
        g = 20
        rng = np.random.RandomState(0)
        src = np.array([25, -3, 10])  # out-of-grid source, like a high camera
        targets = rng.randint(0, g, size=(64, 3))
        valid = np.ones(64, dtype=bool)

        got = np.array(
            carve.bresenham_traversed(
                jnp.asarray(src, jnp.int32), jnp.asarray(targets, jnp.int32),
                jnp.asarray(valid), g,
            )
        )
        want = np.zeros((g, g, g), dtype=np.float32)
        for t in targets:
            for p in bresenham3d_np(src, t, g, 3 * g):
                want[p] = 1.0
        np.testing.assert_array_equal(got, want)

    def test_in_grid_sources(self):
        g = 12
        rng = np.random.RandomState(1)
        for _ in range(5):
            src = rng.randint(0, g, size=3)
            targets = rng.randint(0, g, size=(16, 3))
            got = np.array(
                carve.bresenham_traversed(
                    jnp.asarray(src, jnp.int32), jnp.asarray(targets, jnp.int32),
                    jnp.ones(16, dtype=bool), g,
                )
            )
            want = np.zeros((g, g, g), dtype=np.float32)
            for t in targets:
                for p in bresenham3d_np(src, t, g, 3 * g):
                    want[p] = 1.0
            np.testing.assert_array_equal(got, want)

    def test_invalid_targets_ignored(self):
        g = 8
        src = np.array([0, 0, 0])
        targets = np.array([[7, 7, 7], [3, 0, 0]])
        valid = np.array([False, True])
        got = np.array(
            carve.bresenham_traversed(
                jnp.asarray(src, jnp.int32), jnp.asarray(targets, jnp.int32),
                jnp.asarray(valid), g,
            )
        )
        want = np.zeros((g, g, g), dtype=np.float32)
        for p in bresenham3d_np(src, targets[1], g, 3 * g):
            want[p] = 1.0
        np.testing.assert_array_equal(got, want)


class TestVoxel:
    def test_points_to_idx_reference_formula(self):
        """Mirror of scanned_pts_to_idx_3D (utils.py:242-267)."""
        g = spec.GRID_SIZE
        rng = np.random.RandomState(2)
        v = np.array([0.5, 0.5, 0.3], dtype=np.float32)
        # reference ranges: x,y symmetric, z in [z_range, 0]
        half = (g - 1) / 2.0
        range_gt = np.array(
            [half * v[0], -half * v[0], half * v[1], -half * v[1], (g - 1) * v[2], 0.0],
            dtype=np.float32,
        )
        pts = rng.uniform(-7, 7, size=(256, 3)).astype(np.float32)
        idx, inb = voxel.points_to_voxel_idx(
            jnp.asarray(pts), jnp.ones(256, bool), jnp.asarray(range_gt), jnp.asarray(v)
        )
        idx, inb = np.array(idx), np.array(inb)

        xyz_max = range_gt[[0, 2, 4]] + 0.5 * v
        xyz_min = range_gt[[1, 3, 5]] - 0.5 * v
        want_idx = np.floor((pts - xyz_min) / v).astype(np.int64)
        want_mask = np.all((xyz_max > pts) & (pts > xyz_min), axis=-1)
        np.testing.assert_array_equal(inb, want_mask)
        np.testing.assert_array_equal(idx[want_mask], np.clip(want_idx[want_mask], 0, g - 1))
        assert idx.min() >= 0 and idx.max() < g  # always scatter-safe

    def test_pose_to_idx(self):
        v = jnp.array([0.5, 0.5, 0.5])
        range_gt = jnp.array([4.75, -4.75, 4.75, -4.75, 9.5, 0.0])
        pos = jnp.array([0.0, 0.0, 10.1])
        idx = voxel.pose_to_voxel_idx(pos, range_gt, v)
        # x: floor((0 - (-5.0))/0.5) = 10 ; z: floor((10.1+0.25)/0.5) = 20 (out of grid, unclipped)
        np.testing.assert_array_equal(np.array(idx), [10, 10, 20])

    def test_tri_cls(self):
        prob = jnp.array([-0.05, 0.0, 0.3, 0.6, 1.0])
        out = np.array(voxel.tri_cls(prob))
        np.testing.assert_array_equal(out, [-1.0, 0.0, 0.0, 1.0, 1.0])

    def test_coverage_update(self):
        g = 4
        scanned = jnp.zeros((g, g, g))
        gt = jnp.zeros((g, g, g)).at[0, 0, 0].set(1.0).at[1, 1, 1].set(1.0)
        hits = jnp.zeros((g, g, g)).at[0, 0, 0].set(1.0).at[2, 2, 2].set(1.0)
        scanned, ratio = voxel.coverage_update(scanned, hits, gt, jnp.asarray(2.0))
        assert float(ratio) == pytest.approx(0.5)
        # idempotent accumulation
        scanned, ratio = voxel.coverage_update(scanned, hits, gt, jnp.asarray(2.0))
        assert float(ratio) == pytest.approx(0.5)


class TestCameraBackprojectRender:
    def test_c2w_init_pose_looks_down(self):
        pose = jnp.asarray(spec.INIT_POSE_BUF)
        r, t = camera.pose_to_c2w(pose)
        fwd = np.array(r)[:, 2]
        np.testing.assert_allclose(fwd, [0.0, 0.0, -1.0], atol=1e-6)
        np.testing.assert_allclose(np.array(t), [0.0, 0.0, 10.2], atol=1e-6)

    def test_render_backproject_roundtrip(self):
        """Render a box scene, backproject the depth, check the points lie on
        the box surface — the self-consistency contract between the renderer
        and the mapping pipeline."""
        res = 32
        box_lo = np.array([-4.0, -4.0, 0.0], dtype=np.float32)
        box_hi = np.array([4.0, 4.0, 8.0], dtype=np.float32)
        occ = np.zeros((res, res, res), dtype=np.uint8)
        occ[12:20, 12:20, 0:8] = 1  # box x,y in [-1,1], z in [0,2]
        h = w = 48
        rays = camera.camera_rays(h, w, 90.0)
        pose = jnp.array([0.0, 0.0, 6.0, 0.0, np.pi / 2, 0.0])
        r_c2w, t_c2w = camera.pose_to_c2w(pose)
        depth, hit = render.render_depth(
            jnp.asarray(occ.reshape(-1)), jnp.asarray(box_lo), jnp.asarray(box_hi),
            jnp.asarray(rays), r_c2w, t_c2w, res, 3 * res, 50.0,
        )
        depth, hit = np.array(depth), np.array(hit)
        assert hit.any(), "camera above a box looking down must hit"
        # nadir pixel depth: camera at z=6.1 (offset), box top at z=2 -> 4.1
        center_px = (h // 2) * w + w // 2
        assert abs(depth[center_px] - 4.1) < 0.3

        pts, valid = backproject.backproject(
            jnp.asarray(depth), jnp.asarray(hit), jnp.asarray(rays), r_c2w, t_c2w
        )
        pts, valid = np.array(pts), np.array(valid)
        p = pts[valid]
        vox = 8.0 / res
        # every point on the box surface (within one voxel tolerance)
        assert (p[:, 2] <= 2.0 + 2 * vox).all() and (p[:, 2] >= -2 * vox).all()
        assert (np.abs(p[:, :2]) <= 1.0 + 2 * vox).all()
        # top-face points have z ~ box top
        top = p[p[:, 2] > 1.5]
        assert len(top) > 0

    def test_collision_check(self):
        res = 16
        box_lo = jnp.array([-2.0, -2.0, 0.0])
        box_hi = jnp.array([2.0, 2.0, 4.0])
        occ = np.zeros((res, res, res), dtype=np.uint8)
        occ[8, 8, 4] = 1  # voxel at x,y ~ [0,0.25], z ~ [1.0,1.25]
        occ_f = jnp.asarray(occ.reshape(-1))
        inside = render.check_collision(occ_f, box_lo, box_hi, jnp.array([0.1, 0.1, 1.1]), 0.25, res)
        outside = render.check_collision(occ_f, box_lo, box_hi, jnp.array([1.5, 1.5, 3.0]), 0.25, res)
        assert bool(inside) and not bool(outside)


class TestCarve:
    def _setup_cam(self):
        h = w = 32
        rays = camera.camera_rays(h, w, 90.0)
        k = camera.intrinsics(h, w, 90.0)
        pose = jnp.array([0.0, 0.0, 6.0, 0.0, np.pi / 2, 0.0])
        r_c2w, t_c2w = camera.pose_to_c2w(pose)
        return h, w, rays, k, r_c2w, t_c2w

    def test_ztest_carves_frustum_above_surface(self):
        h, w, rays, k, r_c2w, t_c2w = self._setup_cam()
        g = 10
        # flat surface at z = 1 occupying the full image
        depth = jnp.full((h, w), 5.1, dtype=jnp.float32)  # cam at 6.1 looking down
        fg = jnp.ones((h, w), dtype=bool)
        vox = 1.0
        centers_1d = (jnp.arange(g) - (g - 1) / 2.0) * vox
        cz = jnp.arange(g) * vox  # z centers 0..9
        xx, yy, zz = jnp.meshgrid(centers_1d, centers_1d, cz, indexing="ij")
        centers = jnp.stack([xx, yy, zz], axis=-1).reshape(-1, 3)
        free = np.array(
            carve.carve_ztest(centers, depth, fg, jnp.asarray(k), r_c2w, t_c2w,
                              jnp.asarray(0.5 * vox))
        ).reshape(g, g, g)
        # straight under the camera: voxels with z center in (1.5, 6.1) free,
        # z <= 1 not carved (at/behind surface)
        center_col = free[5, 5, :]
        assert center_col[3] == 1.0 and center_col[5] == 1.0
        assert center_col[0] == 0.0 and center_col[1] == 0.0
        # voxels above the camera are never carved
        assert free[:, :, 7:].sum() == 0

    def test_ztest_respects_fg_mask(self):
        h, w, rays, k, r_c2w, t_c2w = self._setup_cam()
        g = 6
        depth = jnp.full((h, w), 5.0, dtype=jnp.float32)
        fg = jnp.zeros((h, w), dtype=bool)
        centers = jnp.zeros((g ** 3, 3))
        free = carve.carve_ztest(centers, depth, fg, jnp.asarray(k), r_c2w, t_c2w,
                                 jnp.asarray(0.1))
        assert float(jnp.sum(free)) == 0.0

    def test_update_prob_grid_semantics(self):
        g = 4
        prob = jnp.zeros((g, g, g))
        hit = jnp.zeros((g, g, g)).at[1, 1, 1].set(1.0)
        trav = jnp.ones((g, g, g))
        out = np.array(carve.update_prob_grid(prob, hit, trav))
        assert out[1, 1, 1] == 1.0            # occupied write wins
        assert out[0, 0, 0] == pytest.approx(-0.05)
        # repeated: traversed decrements stack, hits stay pinned
        out2 = np.array(carve.update_prob_grid(jnp.asarray(out), hit, trav))
        assert out2[0, 0, 0] == pytest.approx(-0.10)
        assert out2[1, 1, 1] == 1.0


class TestChamfer:
    def test_zero_for_identical_clouds(self):
        rng = np.random.RandomState(3)
        pts = rng.uniform(-1, 1, size=(100, 3)).astype(np.float32)
        d = chamfer.chamfer_distance(
            jnp.asarray(pts), jnp.ones(100, bool), jnp.asarray(pts), jnp.ones(100, bool)
        )
        assert float(d) == pytest.approx(0.0, abs=1e-6)

    def test_known_offset(self):
        a = np.zeros((4, 3), dtype=np.float32)
        b = np.zeros((4, 3), dtype=np.float32)
        b[:, 0] = 0.1
        d = chamfer.chamfer_distance(
            jnp.asarray(a), jnp.ones(4, bool), jnp.asarray(b), jnp.ones(4, bool)
        )
        assert float(d) == pytest.approx(0.02, rel=1e-4)  # 0.1^2 both directions

    def test_masking(self):
        a = np.zeros((4, 3), dtype=np.float32)
        b = np.array([[0, 0, 0], [5, 5, 5]], dtype=np.float32)
        mask_b = np.array([True, False])
        d = chamfer.chamfer_distance(
            jnp.asarray(a), jnp.ones(4, bool), jnp.asarray(b), jnp.asarray(mask_b)
        )
        assert float(d) == pytest.approx(0.0, abs=1e-6)

    def test_dedupe(self):
        pts = np.array([[0.001, 0, 0], [0.004, 0, 0], [1, 0, 0]])
        out = chamfer.dedupe_round_cm(pts)
        assert out.shape[0] == 2


def test_polar_and_direction_pose_decodes():
    """Latent reference pose modes (env_train_base.py:686-706): polar
    position and direction-vector heading."""
    from gennbv_tpu.ops import camera as cam

    # polar: r=2 along +x; r=1 straight up
    out = cam.polar_to_cartesian(jnp.asarray([[2.0, 0.0, 0.0],
                                              [1.0, 0.3, jnp.pi / 2]]))
    np.testing.assert_allclose(np.asarray(out[0]), [2, 0, 0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(out[1]), [0, 0, 1], atol=1e-6)

    # direction vector: +x forward -> pitch 0, yaw == 0 mod 2pi (the
    # reference's dy<=0 branch yields 2pi here, env_train_base.py:700-703)
    rpy = cam.direction_to_rpy(jnp.asarray([[1.0, 0.0, 0.0]]))
    np.testing.assert_allclose(float(rpy[0, 1]), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.sin(float(rpy[0, 2])), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.cos(float(rpy[0, 2])), 1.0, atol=1e-6)
    # looking 45deg down along +y: d = (0, c, -c)
    c = float(np.cos(np.pi / 4))
    rpy = cam.direction_to_rpy(jnp.asarray([[0.0, c, -c]]))
    np.testing.assert_allclose(np.asarray(rpy[0]),
                               [0, np.pi / 4, np.pi / 2], atol=1e-5)
    # consistency with pose_to_c2w: decoded rpy reproduces the direction
    d = jnp.asarray([[0.3, -0.5, 0.2]])
    rpy = cam.direction_to_rpy(d)
    pose = jnp.concatenate([jnp.zeros((1, 3)), rpy], axis=-1)
    r, _ = cam.pose_to_c2w(pose[0])
    fwd = np.asarray(r[:, 2])  # optical axis (body +x) in world
    dn = np.asarray(d[0] / jnp.linalg.norm(d[0]))
    np.testing.assert_allclose(fwd, dn, atol=1e-5)


class TestPallasGather:
    """ops/pallas_gather.py must be bit-identical to
    mxu.gather_image(exact=False) — same bf16 single-plane semantics,
    VMEM-resident image instead of an HBM [P, W] intermediate."""

    def test_matches_mxu_gather(self):
        import numpy as np

        from gennbv_tpu.ops import mxu, pallas_gather

        rng = np.random.default_rng(0)
        for h, w, q in ((16, 16, 40), (48, 64, 700), (128, 128, 1100)):
            img = jnp.asarray(rng.uniform(0.1, 30.0, (h, w)), jnp.float32)
            vi = jnp.asarray(rng.integers(0, h, q), jnp.int32)
            ui = jnp.asarray(rng.integers(0, w, q), jnp.int32)
            a = mxu.gather_image(img, vi, ui, exact=False)
            b = pallas_gather.gather_image(img, vi, ui)
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
            # reference values: bf16-rounded exact lookups
            ref = np.asarray(img)[np.asarray(vi), np.asarray(ui)].astype(
                jnp.bfloat16).astype(np.float32)
            np.testing.assert_array_equal(np.asarray(b), ref)

    def test_vmapped_matches(self):
        import numpy as np

        from gennbv_tpu.ops import mxu, pallas_gather

        rng = np.random.default_rng(1)
        n, h, w, q = 3, 32, 48, 530   # q > CHUNK exercises padding
        img = jnp.asarray(rng.uniform(0.0, 9.0, (n, h, w)), jnp.float32)
        vi = jnp.asarray(rng.integers(0, h, (n, q)), jnp.int32)
        ui = jnp.asarray(rng.integers(0, w, (n, q)), jnp.int32)
        a = jax.vmap(lambda i, v, u: mxu.gather_image(i, v, u, exact=False))(
            img, vi, ui)
        b = jax.vmap(pallas_gather.gather_image)(img, vi, ui)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_env_step_gather_impl_matches(self):
        import dataclasses

        import numpy as np

        from gennbv_tpu.config import (CameraConfig, EnvConfig,
                                       RendererConfig, SceneConfig)
        from gennbv_tpu.env import ReconEnv, make_scenes

        cfg = EnvConfig(
            num_envs=4,
            camera=CameraConfig(height=48, width=48),
            renderer=RendererConfig(resolution=24, gather_impl="mxu"),
            scene=SceneConfig(num_scenes=4, seed=3),
        )
        scenes = make_scenes(cfg.scene, cfg.renderer.resolution)
        envs = [ReconEnv(dataclasses.replace(
                    cfg, renderer=dataclasses.replace(cfg.renderer,
                                                      gather_impl=gi)),
                         scenes)
                for gi in ("mxu", "pallas")]
        states, outs = zip(*(e.reset(4) for e in envs))
        states = list(states)
        for o in outs[1:]:
            np.testing.assert_array_equal(np.array(outs[0].obs),
                                          np.array(o.obs))
        rng = np.random.default_rng(0)
        for _ in range(3):
            acts = jnp.asarray(rng.integers(0, np.asarray(envs[0].nvec),
                                            (4, 6)), jnp.int32)
            outs = []
            for i, e in enumerate(envs):
                states[i], out = e.step(states[i], acts)
                outs.append(out)
            for o in outs[1:]:
                np.testing.assert_array_equal(np.array(outs[0].obs),
                                              np.array(o.obs))
                np.testing.assert_array_equal(np.array(outs[0].reward),
                                              np.array(o.reward))

class TestPallasScatter:
    """ops/pallas_scatter.py must be bit-identical to
    mxu.scatter_cells_any — same 0/1 any-hit grid, VMEM-resident one-hots
    instead of the HBM [Q, G^2] operand."""

    def test_matches_mxu_scatter(self):
        import numpy as np

        from gennbv_tpu.ops import mxu, pallas_scatter

        rng = np.random.default_rng(0)
        for g, q in ((4, 40), (20, 700), (20, 5000)):
            idx = jnp.asarray(rng.integers(0, g, (q, 3)), jnp.int32)
            valid = jnp.asarray(rng.random(q) < 0.7)
            a = mxu.scatter_cells_any(idx, valid, g)
            b = pallas_scatter.scatter_cells_any(idx, valid, g)
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
            # reference: plain numpy any-hit
            ref = np.zeros((g, g, g), np.float32)
            ii = np.asarray(idx)[np.asarray(valid)]
            ref[ii[:, 0], ii[:, 1], ii[:, 2]] = 1.0
            np.testing.assert_array_equal(np.asarray(b), ref)

    def test_all_invalid_and_vmapped(self):
        import numpy as np

        from gennbv_tpu.ops import pallas_scatter

        rng = np.random.default_rng(1)
        # q > ROWS*CHUNK (4096) so the vmapped kernel runs MULTIPLE grid
        # steps per env, exercising the program_id(0)==0 zero-init and the
        # += accumulation under the batching rule's program_id remapping —
        # the interaction production hits (Q~11k)
        n, g, q = 3, 20, 5000
        idx = jnp.asarray(rng.integers(0, g, (n, q, 3)), jnp.int32)
        valid = jnp.asarray(rng.random((n, q)) < 0.5)
        valid = valid.at[2].set(False)          # one env all-invalid
        out = jax.vmap(lambda i, v: pallas_scatter.scatter_cells_any(i, v, g))(
            idx, valid)
        assert np.asarray(out[2]).sum() == 0.0
        for e in range(n):
            ref = np.zeros((g, g, g), np.float32)
            ii = np.asarray(idx[e])[np.asarray(valid[e])]
            if len(ii):
                ref[ii[:, 0], ii[:, 1], ii[:, 2]] = 1.0
            np.testing.assert_array_equal(np.asarray(out[e]), ref)

    def test_env_step_scatter_impl_matches(self):
        import dataclasses

        import numpy as np

        from gennbv_tpu.config import (CameraConfig, EnvConfig,
                                       RendererConfig, SceneConfig)
        from gennbv_tpu.env import ReconEnv, make_scenes

        cfg = EnvConfig(
            num_envs=4,
            camera=CameraConfig(height=48, width=48),
            renderer=RendererConfig(resolution=24, scatter_impl="mxu"),
            scene=SceneConfig(num_scenes=4, seed=3),
        )
        cfg_p = dataclasses.replace(
            cfg, renderer=dataclasses.replace(cfg.renderer,
                                              scatter_impl="pallas"))
        scenes = make_scenes(cfg.scene, cfg.renderer.resolution)
        env_a, env_p = ReconEnv(cfg, scenes), ReconEnv(cfg_p, scenes)
        state_a, out_a = env_a.reset(4)
        state_p, out_p = env_p.reset(4)
        np.testing.assert_array_equal(np.array(out_a.obs), np.array(out_p.obs))
        rng = np.random.default_rng(0)
        for _ in range(3):
            acts = jnp.asarray(rng.integers(0, np.asarray(env_a.nvec), (4, 6)),
                               jnp.int32)
            state_a, out_a = env_a.step(state_a, acts)
            state_p, out_p = env_p.step(state_p, acts)
            np.testing.assert_array_equal(np.array(out_a.obs),
                                          np.array(out_p.obs))
            np.testing.assert_array_equal(np.array(out_a.reward),
                                          np.array(out_p.reward))
