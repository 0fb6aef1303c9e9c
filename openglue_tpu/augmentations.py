"""Device-side photometric augmentations (reference utils/augmentations.py:
'weak_color_aug' = kornia RandomEqualize/RandomSharpness/RandomSolarize p=0.25
each + GaussianNoise p=0.5).

TPU-first: augmentations are pure jnp functions of (rng, images) that run
INSIDE the jitted train step — no host-side image processing in the loop. All
are photometric (no geometric component), so the intrinsics-composition hook
of the reference (matching_module.py:55-69) is the identity here; a geometric
augmentation would return its 3x3 transform to be composed into K.

images: [B, H, W] grayscale in [0, 1].
"""

from __future__ import annotations

from typing import Callable, Dict

import jax
import jax.numpy as jnp


def _per_image_bernoulli(rng, batch, p):
    return jax.random.uniform(rng, (batch,)) < p


def random_equalize(rng: jax.Array, images: jnp.ndarray, p: float = 0.25) -> jnp.ndarray:
    """Histogram equalization per image with probability p (256 fixed bins)."""
    batch = images.shape[0]
    apply = _per_image_bernoulli(rng, batch, p)

    def equalize_one(img):
        x = jnp.clip(img * 255.0, 0, 255)
        hist = jnp.zeros((256,)).at[x.astype(jnp.int32).reshape(-1)].add(1.0)
        cdf = jnp.cumsum(hist)
        cdf_min = cdf[jnp.argmax(hist > 0)]
        denom = jnp.maximum(cdf[-1] - cdf_min, 1.0)
        lut = jnp.clip((cdf - cdf_min) / denom, 0.0, 1.0)
        return lut[x.astype(jnp.int32)]

    eq = jax.vmap(equalize_one)(images)
    return jnp.where(apply[:, None, None], eq, images)


def random_sharpness(
    rng: jax.Array, images: jnp.ndarray, p: float = 0.25, strength: float = 0.5
) -> jnp.ndarray:
    """Blend with an unsharp-masked version with probability p."""
    batch = images.shape[0]
    k_apply, k_factor = jax.random.split(rng)
    apply = _per_image_bernoulli(k_apply, batch, p)
    factor = jax.random.uniform(k_factor, (batch,), minval=0.0, maxval=strength)

    kernel = jnp.asarray([[1.0, 1.0, 1.0], [1.0, 5.0, 1.0], [1.0, 1.0, 1.0]]) / 13.0
    blurred = jax.lax.conv_general_dilated(
        images[:, None], kernel[None, None], (1, 1), "SAME"
    )[:, 0]
    # interior-only like kornia sharpness (borders keep original)
    inner = jnp.zeros_like(images, dtype=bool).at[:, 1:-1, 1:-1].set(True)
    sharp = images + factor[:, None, None] * (images - blurred)
    sharp = jnp.clip(jnp.where(inner, sharp, images), 0.0, 1.0)
    return jnp.where(apply[:, None, None], sharp, images)


def random_solarize(
    rng: jax.Array, images: jnp.ndarray, p: float = 0.25, threshold: float = 0.5
) -> jnp.ndarray:
    """Invert pixels above threshold with probability p."""
    batch = images.shape[0]
    apply = _per_image_bernoulli(rng, batch, p)
    sol = jnp.where(images >= threshold, 1.0 - images, images)
    return jnp.where(apply[:, None, None], sol, images)


def gaussian_noise(
    rng: jax.Array, images: jnp.ndarray, p: float = 0.5, std: float = 0.05
) -> jnp.ndarray:
    batch = images.shape[0]
    k_apply, k_noise = jax.random.split(rng)
    apply = _per_image_bernoulli(k_apply, batch, p)
    noisy = jnp.clip(images + std * jax.random.normal(k_noise, images.shape), 0.0, 1.0)
    return jnp.where(apply[:, None, None], noisy, images)


def weak_color_aug(rng: jax.Array, images: jnp.ndarray) -> jnp.ndarray:
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    images = random_equalize(k1, images)
    images = random_sharpness(k2, images)
    images = random_solarize(k3, images)
    images = gaussian_noise(k4, images)
    return images


def no_aug(rng: jax.Array, images: jnp.ndarray) -> jnp.ndarray:
    return images


AUGMENTATIONS: Dict[str, Callable] = {
    "none": no_aug,
    "weak_color_aug": weak_color_aug,
}


def get_augmentation_transform(name: str) -> Callable:
    """Registry lookup (reference utils/augmentations.py:6-18)."""
    if name not in AUGMENTATIONS:
        raise ValueError(f"Unknown augmentation {name!r}; choose from {sorted(AUGMENTATIONS)}")
    return AUGMENTATIONS[name]
