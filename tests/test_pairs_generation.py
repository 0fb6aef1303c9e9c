"""Pairs-list generation tests: synthetic COLMAP export -> pairs.txt ->
parse back -> the emitted relative pose must reproject keypoints exactly."""

import numpy as np
import jax.numpy as jnp

from openglue_tpu.data.megadepth import parse_pairs_line
from openglue_tpu.data.pairs_generation import (
    generate_pairs,
    points3d_overlap,
    quaternion_to_rotation,
)
from openglue_tpu.geometry.transforms import reproject_3d


def write_colmap_scene(sparse_dir, images):
    """images: list of (name, qwxyz, T, point_ids)."""
    sparse_dir.mkdir(parents=True, exist_ok=True)
    (sparse_dir / "cameras.txt").write_text(
        "# Camera list\n1 PINHOLE 640 480 500 500 320 240\n"
    )
    lines = ["# Image list", "#", "#", "#"]
    for i, (name, q, T, pids) in enumerate(images):
        lines.append(
            f"{i + 1} {q[0]} {q[1]} {q[2]} {q[3]} {T[0]} {T[1]} {T[2]} 1 {name}"
        )
        pts = " ".join(f"{10.0 * j} {5.0 * j} {pid}" for j, pid in enumerate(pids))
        lines.append(pts)
    (sparse_dir / "images.txt").write_text("\n".join(lines) + "\n")


def test_quaternion_identity_and_known_rotation():
    np.testing.assert_allclose(quaternion_to_rotation(1, 0, 0, 0), np.eye(3), atol=1e-12)
    # 90 deg about z: q = (cos45, 0, 0, sin45)
    c = np.cos(np.pi / 4)
    R = quaternion_to_rotation(c, 0, 0, c)
    np.testing.assert_allclose(R @ [1, 0, 0], [0, 1, 0], atol=1e-12)


def test_overlap_metric():
    assert points3d_overlap({"1", "2", "3"}, {"2", "3", "4", "5"}) == 2 / 3
    assert points3d_overlap(set(), {"1"}) == 0.0


def test_generate_and_reproject(tmp_path):
    c = np.cos(np.pi / 16)
    s = np.sin(np.pi / 16)
    images = [
        ("a.jpg", (1, 0, 0, 0), (0, 0, 0), [f"p{i}" for i in range(20)]),
        ("b.jpg", (c, 0, s, 0), (0.4, 0.1, 0.05),
         [f"p{i}" for i in range(10, 20)] + [f"r{i}" for i in range(10)]),  # overlap 0.5
        ("c.jpg", (1, 0, 0, 0), (5, 5, 5), ["q1", "q2"]),  # no overlap
    ]
    sparse = tmp_path / "sparse-txt"
    write_colmap_scene(sparse, images)
    n = generate_pairs(sparse, sparse / "pairs.txt", overlap_interval=(0.1, 0.9))
    lines = (sparse / "pairs.txt").read_text().splitlines()
    assert n == len(lines) == 1  # only (a, b); c overlaps nothing

    rec = parse_pairs_line(lines[0], scene="s")
    assert rec.img0 == "a.jpg" and rec.img1 == "b.jpg"
    assert 0.1 <= rec.overlap <= 0.9

    # verify the relative pose: world point -> both cameras -> reproject_3d
    # from camera a into camera b must agree with direct projection
    rng = np.random.default_rng(0)
    pts_world = np.stack(
        [rng.uniform(-1, 1, 8), rng.uniform(-1, 1, 8), rng.uniform(4, 8, 8)], axis=1
    )
    R_a = quaternion_to_rotation(1, 0, 0, 0)
    T_a = np.zeros(3)
    R_b = quaternion_to_rotation(c, 0, s, 0)
    T_b = np.array([0.4, 0.1, 0.05])

    def project(K, R, T, P):
        cam = (R @ P.T).T + T
        uv = (K @ cam.T).T
        return uv[:, :2] / uv[:, 2:3], cam[:, 2]

    K = rec.K0
    kpts_a, depth_a = project(K, R_a, T_a, pts_world)
    kpts_b, _ = project(K, R_b, T_b, pts_world)

    projected, valid = reproject_3d(
        jnp.asarray(kpts_a[None], jnp.float32),
        jnp.asarray(rec.K0[None]),
        jnp.asarray(rec.K1[None]),
        jnp.asarray(rec.T[None]),
        jnp.asarray(rec.R[None]),
        jnp.asarray(depth_a[None].astype(np.float32)),
    )
    assert bool(valid.all())
    np.testing.assert_allclose(np.asarray(projected[0]), kpts_b, atol=1e-2)
