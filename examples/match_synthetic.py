"""End-to-end demo on synthetic data (no downloads, any backend).

Trains a small matcher on generated homography keypoint pairs, then decodes
matches and reports precision against the ground-truth homography.

Run: python examples/match_synthetic.py [--steps 300]
"""

import argparse
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from openglue_tpu.data.synthetic import SyntheticHomographyPairs
from openglue_tpu.models.superglue import SuperGlue, SuperGlueConfig
from openglue_tpu.train import LossConfig, create_train_state, make_eval_step, make_train_step
from openglue_tpu.train.step import superglue_inputs


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=300)
    parser.add_argument("--kpts", type=int, default=256)
    args = parser.parse_args()

    cfg = SuperGlueConfig(
        descriptor_dim=128, pe_hidden_layers_sizes=(32, 64), num_stages=3,
        num_heads=4, otp_num_iters=10, residual=True,
    )
    model = SuperGlue(cfg)
    gen = SyntheticHomographyPairs(
        num_keypoints=args.kpts, descriptor_dim=128, jitter=0.5, descriptor_noise=0.05
    )
    batch = gen.sample(jax.random.key(0), 4)
    variables = model.init(jax.random.key(1), **superglue_inputs(batch))
    state = create_train_state(model.apply, variables, learning_rate=1e-3)

    step = make_train_step(LossConfig(positive_threshold=3.0, negative_threshold=5.0))

    @partial(jax.jit, static_argnums=2)
    def train_n(state, batch, n):
        def body(carry, _):
            s, m = step(carry[0], batch)
            return (s, m["total_loss"]), m["total_loss"]
        (s, _), losses = jax.lax.scan(body, (state, jnp.zeros(())), None, length=n)
        return s, losses

    state, losses = train_n(state, batch, args.steps)
    losses = np.asarray(losses)
    print(f"loss: {losses[0]:.3f} -> {losses[-1]:.3f} after {args.steps} steps")

    eval_step = jax.jit(make_eval_step(0.2))
    out = eval_step(state, batch)
    m0 = np.asarray(out["matches0"])
    kpts0 = np.asarray(batch.side0.keypoints)
    kpts1 = np.asarray(batch.side1.keypoints)
    H = np.asarray(batch.transformation.H)

    correct = total = 0
    for b in range(m0.shape[0]):
        for i, j in enumerate(m0[b]):
            if j < 0:
                continue
            p = H[b] @ np.array([*kpts0[b, i], 1.0])
            total += 1
            correct += np.linalg.norm(p[:2] / p[2] - kpts1[b, j]) < 3.0
    print(f"decoded {total} matches, precision@3px = {correct / max(total, 1):.3f}")


if __name__ == "__main__":
    main()
