"""Synthetic homography-warp pair generator.

A dependency-free, fixed-seed stand-in for the reference's warped-image
datasets (reference data/oxford_paris_dataset.py:27-66 warps an image by a
random 4-corner perspective; reference data/megadepth_dataset.py:16-52 is the
same idea). Here we skip pixels entirely and synthesize the *keypoint graphs*
directly: keypoints in image0, a random homography, the warped keypoints in
image1 (plus distractors), and descriptors that are noisy copies across the
pair — so a matcher can learn the assignment and tests/benches need no image
data on disk.

Everything is generated under jax.random with static shapes, so batches can be
produced on-device inside jit (no host input pipeline in the loop).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from openglue_tpu.core.types import KeypointSet, PairBatch, Transformation


def random_homography(
    rng: jax.Array,
    batch: int,
    image_size: Tuple[int, int] = (960, 720),
    max_corner_offset: float = 100.0,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """Random perspective transforms via 4-corner offsets (the
    reference's warp parameterization, oxford_paris_dataset.py:36-44).

    Returns [B, 3, 3] homographies mapping image0 pixel coords to image1.
    """
    w, h = image_size
    src = jnp.asarray([[0.0, 0.0], [w, 0.0], [w, h], [0.0, h]], dtype)
    offsets = jax.random.uniform(
        rng, (batch, 4, 2), dtype, -max_corner_offset, max_corner_offset
    )
    dst = src[None] + offsets
    return _solve_homography(jnp.broadcast_to(src, (batch, 4, 2)), dst)


def _solve_homography(src: jnp.ndarray, dst: jnp.ndarray) -> jnp.ndarray:
    """DLT for the 4-point case: solve A h = b with h9 = 1. src/dst: [B, 4, 2]."""
    batch = src.shape[0]
    x, y = src[..., 0], src[..., 1]
    u, v = dst[..., 0], dst[..., 1]
    zeros = jnp.zeros_like(x)
    ones = jnp.ones_like(x)
    rows_u = jnp.stack([x, y, ones, zeros, zeros, zeros, -u * x, -u * y], axis=-1)
    rows_v = jnp.stack([zeros, zeros, zeros, x, y, ones, -v * x, -v * y], axis=-1)
    A = jnp.concatenate([rows_u, rows_v], axis=1)  # [B, 8, 8]
    b = jnp.concatenate([u, v], axis=1)[..., None]  # [B, 8, 1]
    h = jnp.linalg.solve(A, b)[..., 0]  # [B, 8]
    h = jnp.concatenate([h, jnp.ones((batch, 1), h.dtype)], axis=1)
    return h.reshape(batch, 3, 3)


@dataclasses.dataclass(frozen=True)
class SyntheticHomographyPairs:
    """Generator of PairBatch samples related by random homographies.

    num_keypoints keypoints are sampled uniformly in image0; a fraction
    ``covisible_fraction`` of image1's keypoints are their warps perturbed by
    ``jitter`` pixels (a learnable correspondence), the rest are independent
    distractors. Descriptors of corresponding keypoints agree up to
    ``descriptor_noise``.
    """

    num_keypoints: int = 512
    descriptor_dim: int = 256
    image_size: Tuple[int, int] = (960, 720)
    covisible_fraction: float = 0.7
    jitter: float = 1.0
    descriptor_noise: float = 0.1
    max_corner_offset: float = 100.0
    side_info_dim: int = 1

    def sample(self, rng: jax.Array, batch: int) -> PairBatch:
        w, h = self.image_size
        n = self.num_keypoints
        d = self.descriptor_dim
        (k_h, k_kp0, k_kp1, k_jit, k_desc, k_noise0, k_noise1, k_resp0, k_resp1) = (
            jax.random.split(rng, 9)
        )

        H = random_homography(k_h, batch, self.image_size, self.max_corner_offset)

        kpts0 = jax.random.uniform(
            k_kp0, (batch, n, 2), jnp.float32,
            jnp.zeros((2,)), jnp.asarray([w - 1.0, h - 1.0]),
        )
        ones = jnp.ones((batch, n, 1))
        warped = jnp.einsum("bij,bnj->bni", H, jnp.concatenate([kpts0, ones], -1))
        warped = warped[..., :2] / (warped[..., 2:3] + 1e-8)
        warped = warped + self.jitter * jax.random.normal(k_jit, (batch, n, 2))

        distractors = jax.random.uniform(
            k_kp1, (batch, n, 2), jnp.float32,
            jnp.zeros((2,)), jnp.asarray([w - 1.0, h - 1.0]),
        )
        # In-bounds warps in the covisible prefix are true correspondences.
        num_covisible = int(self.covisible_fraction * n)
        covis = (jnp.arange(n) < num_covisible)[None, :, None]
        in_bounds = (
            (warped[..., 0] >= 0) & (warped[..., 0] <= w - 1)
            & (warped[..., 1] >= 0) & (warped[..., 1] <= h - 1)
        )[..., None]
        kpts1 = jnp.where(covis & in_bounds, warped, distractors)

        desc_shared = jax.random.normal(k_desc, (batch, n, d))
        desc0 = desc_shared + self.descriptor_noise * jax.random.normal(k_noise0, (batch, n, d))
        desc1_match = desc_shared + self.descriptor_noise * jax.random.normal(
            k_noise1, (batch, n, d)
        )
        desc1_distract = jnp.roll(desc_shared, 1, axis=1) + self.descriptor_noise * (
            jax.random.normal(k_noise1, (batch, n, d))
        )
        desc1 = jnp.where(covis & in_bounds, desc1_match, desc1_distract)
        desc0 = desc0 / jnp.linalg.norm(desc0, axis=-1, keepdims=True)
        desc1 = desc1 / jnp.linalg.norm(desc1, axis=-1, keepdims=True)

        resp0 = jax.random.uniform(k_resp0, (batch, n))
        resp1 = jax.random.uniform(k_resp1, (batch, n))
        pad = jnp.zeros((batch, n, self.side_info_dim - 1))
        side0 = jnp.concatenate([resp0[..., None], pad], axis=-1)
        side1 = jnp.concatenate([resp1[..., None], pad], axis=-1)

        mask = jnp.ones((batch, n), dtype=bool)
        image_size = jnp.broadcast_to(jnp.asarray([w, h], jnp.float32), (batch, 2))

        return PairBatch(
            side0=KeypointSet(kpts0, desc0, side0, mask, image_size),
            side1=KeypointSet(kpts1, desc1, side1, mask, image_size),
            transformation=Transformation(kind="perspective", H=H),
        )


@dataclasses.dataclass(frozen=True)
class SyntheticReprojectionPairs:
    """Two-view 3D pairs with depth + relative pose — the cached-MegaDepth
    batch shape (3d_reprojection transformation, per-keypoint depth) without
    any dataset on disk. Enables end-to-end training with the epipolar /
    pose-AUC metrics on synthetic data.

    3D points are sampled in a box in front of camera 0; camera 1 differs by a
    random small rotation + translation. Keypoints are the two projections
    (with pixel jitter); a ``covisible_fraction`` prefix corresponds, the rest
    of image 1 is distractors. Descriptors are noisy shares as in
    SyntheticHomographyPairs.
    """

    num_keypoints: int = 512
    descriptor_dim: int = 256
    image_size: Tuple[int, int] = (960, 720)
    focal: float = 800.0
    covisible_fraction: float = 0.7
    jitter: float = 1.0
    descriptor_noise: float = 0.1
    max_rotation: float = 0.2  # radians
    max_translation: float = 0.5
    depth_range: Tuple[float, float] = (4.0, 10.0)
    side_info_dim: int = 1

    def _intrinsics(self) -> jnp.ndarray:
        w, h = self.image_size
        return jnp.asarray(
            [[self.focal, 0.0, w / 2], [0.0, self.focal, h / 2], [0.0, 0.0, 1.0]]
        )

    def sample(self, rng: jax.Array, batch: int) -> PairBatch:
        w, h = self.image_size
        n = self.num_keypoints
        d = self.descriptor_dim
        keys = jax.random.split(rng, 10)
        (k_pts, k_rot, k_t, k_jit, k_desc, k_n0, k_n1, k_r0, k_r1, k_extra) = keys

        K = self._intrinsics()
        zmin, zmax = self.depth_range
        # 3D points covering the camera-0 frustum
        depth = jax.random.uniform(k_pts, (batch, n, 1), minval=zmin, maxval=zmax)
        uv = jax.random.uniform(
            k_extra, (batch, n, 2), minval=jnp.zeros(2),
            maxval=jnp.asarray([w - 1.0, h - 1.0]),
        )
        ones = jnp.ones((batch, n, 1))
        rays = jnp.einsum("ij,bnj->bni", jnp.linalg.inv(K), jnp.concatenate([uv, ones], -1))
        points = rays * depth  # camera-0 coords

        # random relative pose (axis-angle via small-angle rotations)
        angles = jax.random.uniform(
            k_rot, (batch, 3), minval=-self.max_rotation, maxval=self.max_rotation
        )

        def rot_matrix(a):
            cx, sx = jnp.cos(a[0]), jnp.sin(a[0])
            cy, sy = jnp.cos(a[1]), jnp.sin(a[1])
            cz, sz = jnp.cos(a[2]), jnp.sin(a[2])
            Rx = jnp.asarray([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
            Ry = jnp.asarray([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
            Rz = jnp.asarray([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
            return Rz @ Ry @ Rx

        R = jax.vmap(rot_matrix)(angles)
        T = jax.random.uniform(
            k_t, (batch, 3), minval=-self.max_translation, maxval=self.max_translation
        )

        points1 = jnp.einsum("bij,bnj->bni", R, points) + T[:, None, :]
        proj1 = jnp.einsum("ij,bnj->bni", K, points1)
        kpts1_true = proj1[..., :2] / (proj1[..., 2:3] + 1e-8)
        depth1_true = points1[..., 2]
        kpts1_true = kpts1_true + self.jitter * jax.random.normal(k_jit, (batch, n, 2))

        num_covisible = int(self.covisible_fraction * n)
        covis = (jnp.arange(n) < num_covisible)[None, :, None]
        in_bounds = (
            (kpts1_true[..., 0] >= 0) & (kpts1_true[..., 0] <= w - 1)
            & (kpts1_true[..., 1] >= 0) & (kpts1_true[..., 1] <= h - 1)
            & (depth1_true > 0.1)
        )[..., None]
        distract_uv = jnp.roll(uv, 3, axis=1)
        kpts1 = jnp.where(covis & in_bounds, kpts1_true, distract_uv)
        # distractor "observed" depth: a plausible positive value (their true
        # correspondence is elsewhere, so GT labels them via thresholds)
        depth1 = jnp.where(
            (covis & in_bounds)[..., 0], depth1_true, jnp.roll(depth[..., 0], 3, axis=1)
        )

        desc_shared = jax.random.normal(k_desc, (batch, n, d))
        desc0 = desc_shared + self.descriptor_noise * jax.random.normal(k_n0, (batch, n, d))
        desc1_m = desc_shared + self.descriptor_noise * jax.random.normal(k_n1, (batch, n, d))
        desc1_d = jnp.roll(desc_shared, 3, axis=1) + self.descriptor_noise * (
            jax.random.normal(k_n1, (batch, n, d))
        )
        desc1 = jnp.where(covis & in_bounds, desc1_m, desc1_d)
        desc0 = desc0 / jnp.linalg.norm(desc0, axis=-1, keepdims=True)
        desc1 = desc1 / jnp.linalg.norm(desc1, axis=-1, keepdims=True)

        resp0 = jax.random.uniform(k_r0, (batch, n))
        resp1 = jax.random.uniform(k_r1, (batch, n))
        pad = jnp.zeros((batch, n, self.side_info_dim - 1))
        side0 = jnp.concatenate([resp0[..., None], pad], axis=-1)
        side1 = jnp.concatenate([resp1[..., None], pad], axis=-1)

        mask = jnp.ones((batch, n), dtype=bool)
        image_size = jnp.broadcast_to(jnp.asarray([w, h], jnp.float32), (batch, 2))
        K_b = jnp.broadcast_to(K, (batch, 3, 3))

        return PairBatch(
            side0=KeypointSet(uv, desc0, side0, mask, image_size),
            side1=KeypointSet(kpts1, desc1, side1, mask, image_size),
            transformation=Transformation(
                kind="3d_reprojection",
                K0=K_b, K1=K_b, R=R, T=T,
                depth0=depth[..., 0], depth1=depth1,
            ),
        )


def random_pair_batch(
    rng: jax.Array,
    batch: int = 2,
    num_keypoints: int = 512,
    descriptor_dim: int = 256,
    side_info_dim: int = 1,
    image_size: Tuple[int, int] = (960, 720),
) -> PairBatch:
    """One-call convenience wrapper used by tests, the graft entry and bench."""
    gen = SyntheticHomographyPairs(
        num_keypoints=num_keypoints,
        descriptor_dim=descriptor_dim,
        side_info_dim=side_info_dim,
        image_size=image_size,
    )
    return gen.sample(rng, batch)
