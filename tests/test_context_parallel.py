"""Context-parallel tests on the 8-device CPU mesh: ring attention and
row-sharded Sinkhorn (shard_map) must match their single-device references;
the GSPMD keypoint-sharded train step must match the unsharded step."""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from openglue_tpu.ops import attention as attn_ref
from openglue_tpu.ops import sinkhorn as sink_ref
from openglue_tpu.parallel import make_mesh
from openglue_tpu.parallel.ring import ring_softmax_attention, sharded_log_sinkhorn

shard_map = jax.shard_map


@pytest.fixture(scope="module")
def mesh8():
    return make_mesh({"model": 8})


def rand(key, *shape):
    return jax.random.normal(jax.random.key(key), shape, jnp.float32)


class TestRingAttention:
    def test_self_attention_matches_reference(self, mesh8):
        B, H, N, Dh = 2, 4, 64, 16
        q, k, v = rand(0, B, H, N, Dh), rand(1, B, H, N, Dh), rand(2, B, H, N, Dh)
        mask = jnp.arange(N)[None, :] < jnp.asarray([50, N])[:, None]
        ref, _ = attn_ref.softmax_attention(q, k, v, mask)

        fn = shard_map(
            partial(ring_softmax_attention, axis_name="model"),
            mesh=mesh8,
            in_specs=(P(None, None, "model"), P(None, None, "model"),
                      P(None, None, "model"), P(None, "model")),
            out_specs=P(None, None, "model"),
        )
        out = jax.jit(fn)(q, k, v, mask)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def test_cross_attention_different_lengths(self, mesh8):
        # bipartite: 64 queries against 128 keys (the cross-attention shape)
        B, H, N, M, Dh = 2, 4, 64, 128, 16
        q, k, v = rand(0, B, H, N, Dh), rand(1, B, H, M, Dh), rand(2, B, H, M, Dh)
        mask = jnp.arange(M)[None, :] < jnp.asarray([100, M])[:, None]
        ref, _ = attn_ref.softmax_attention(q, k, v, mask)

        fn = shard_map(
            partial(ring_softmax_attention, axis_name="model"),
            mesh=mesh8,
            in_specs=(P(None, None, "model"), P(None, None, "model"),
                      P(None, None, "model"), P(None, "model")),
            out_specs=P(None, None, "model"),
        )
        out = jax.jit(fn)(q, k, v, mask)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def test_fully_masked_matches_reference_uniform(self, mesh8):
        # all keys masked: softmax over uniform -1e9 logits = uniform average;
        # the ring path must reproduce the reference's behavior exactly
        # (padded query rows are masked downstream anyway)
        B, H, N, Dh = 1, 2, 32, 8
        q, k, v = rand(0, B, H, N, Dh), rand(1, B, H, N, Dh), rand(2, B, H, N, Dh)
        mask = jnp.zeros((B, N), dtype=bool)
        ref, _ = attn_ref.softmax_attention(q, k, v, mask)
        fn = shard_map(
            partial(ring_softmax_attention, axis_name="model"),
            mesh=mesh8,
            in_specs=(P(None, None, "model"),) * 3 + (P(None, "model"),),
            out_specs=P(None, None, "model"),
        )
        out = jax.jit(fn)(q, k, v, mask)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


class TestShardedSinkhorn:
    def test_matches_reference(self, mesh8):
        B, N, M = 2, 64, 48
        scores = rand(0, B, N, M)
        dustbin = jnp.asarray(0.8)
        num_iters = 15
        ref = sink_ref.log_optimal_transport(scores, dustbin, num_iters=num_iters)

        # assemble the sharded-row inputs exactly as the reference marginals
        # (sinkhorn.py:85-94): inner rows sharded, dustbin row separate
        norm = -jnp.log(jnp.asarray(N + M, jnp.float32))
        S_aug = sink_ref.augment_scores(scores, dustbin)
        S_inner = S_aug[:, :N, :]  # [B, N, M+1]
        S_dust = S_aug[:, N:, :]  # [B, 1, M+1]
        log_a_inner = jnp.full((B, N), norm)
        log_a_dust = jnp.full((B,), norm + jnp.log(jnp.asarray(M, jnp.float32)))
        log_b = jnp.full((B, M + 1), norm)
        log_b = log_b.at[:, -1].add(jnp.log(jnp.asarray(N, jnp.float32)))

        fn = shard_map(
            partial(sharded_log_sinkhorn, axis_name="model", num_iters=num_iters),
            mesh=mesh8,
            in_specs=(P(None, "model", None), P(None, None, None),
                      P(None, "model"), P(None), P(None, None)),
            out_specs=(P(None, "model", None), P(None, None, None)),
        )
        log_P_inner, log_P_dust = jax.jit(fn)(
            S_inner, S_dust, log_a_inner, log_a_dust, log_b
        )
        log_P = jnp.concatenate([log_P_inner, log_P_dust], axis=1) - norm
        np.testing.assert_allclose(np.asarray(log_P), np.asarray(ref), atol=1e-5)


class TestGSPMDContextParallel:
    def test_cp_train_step_matches_single_device(self):
        from openglue_tpu.data.synthetic import SyntheticHomographyPairs
        from openglue_tpu.models.superglue import SuperGlue, SuperGlueConfig
        from openglue_tpu.parallel.context_parallel import (
            shard_pair_batch_cp,
            shard_train_step_cp,
        )
        from openglue_tpu.train import LossConfig, create_train_state, make_train_step
        from openglue_tpu.train.step import superglue_inputs

        mesh = make_mesh({"data": 2, "model": 4})
        cfg = SuperGlueConfig(
            descriptor_dim=32, pe_hidden_layers_sizes=(16,), num_stages=2,
            num_heads=4, otp_num_iters=8, residual=True,
        )
        model = SuperGlue(cfg)
        gen = SyntheticHomographyPairs(num_keypoints=64, descriptor_dim=32)
        batch = gen.sample(jax.random.key(0), 4)
        variables = model.init(jax.random.key(1), **superglue_inputs(batch))
        state = create_train_state(model.apply, variables, learning_rate=1e-3)
        step = make_train_step(LossConfig(positive_threshold=3.0, negative_threshold=5.0))

        _, ref_metrics = jax.jit(step)(state, batch)

        cp_step = shard_train_step_cp(step, mesh, batch)
        sharded = shard_pair_batch_cp(batch, mesh)
        new_state, cp_metrics = cp_step(state, sharded)

        np.testing.assert_allclose(
            float(cp_metrics["total_loss"]), float(ref_metrics["total_loss"]), rtol=1e-5
        )
        np.testing.assert_allclose(
            float(cp_metrics["grad_norm"]), float(ref_metrics["grad_norm"]), rtol=1e-4
        )
        assert int(new_state.step) == 1


class TestRingInModel:
    def test_superglue_ring_axis_matches_baseline(self):
        """Full SuperGlue with hand-scheduled ring attention (shard_map nested
        in the jitted CP model) must match the unsharded forward."""
        from openglue_tpu.data.synthetic import SyntheticHomographyPairs
        from openglue_tpu.models.superglue import SuperGlue, SuperGlueConfig
        from openglue_tpu.parallel.context_parallel import shard_pair_batch_cp
        from openglue_tpu.train.step import superglue_inputs

        mesh = make_mesh({"model": 8})
        base_kwargs = dict(
            descriptor_dim=32, pe_hidden_layers_sizes=(16,), num_stages=2,
            num_heads=4, otp_num_iters=8, residual=True,
        )
        model_ref = SuperGlue(SuperGlueConfig(**base_kwargs))
        model_ring = SuperGlue(SuperGlueConfig(**base_kwargs, ring_axis="model"))

        gen = SyntheticHomographyPairs(num_keypoints=64, descriptor_dim=32)
        batch = gen.sample(jax.random.key(0), 2)
        variables = model_ref.init(jax.random.key(1), **superglue_inputs(batch))
        ref = jax.jit(lambda v, b: model_ref.apply(v, **superglue_inputs(b))["scores"])(
            variables, batch
        )

        # instrument: the ring schedule must actually be traced (a silent
        # GSPMD fallback would make this test vacuous)
        import openglue_tpu.parallel.ring as ring_mod

        calls = [0]
        orig = ring_mod.ring_softmax_attention

        def spy(*a, **k):
            calls[0] += 1
            return orig(*a, **k)

        ring_mod.ring_softmax_attention = spy
        try:
            sharded = shard_pair_batch_cp(batch, mesh)
            with jax.set_mesh(mesh):
                out = jax.jit(
                    lambda v, b: model_ring.apply(v, **superglue_inputs(b))["scores"]
                )(variables, sharded)
        finally:
            ring_mod.ring_softmax_attention = orig
        assert calls[0] == 8, "ring attention not engaged for the 2x(self+cross) layers"
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)


@pytest.mark.parametrize("attention", ["linear", "favor_relu"])
def test_cp_forward_other_attention_variants(attention):
    """Keypoint-axis CP must cover the O(N) attention variants too (GSPMD
    partitions the feature-map einsums; SURVEY §5: all variants in sharded
    form)."""
    from openglue_tpu.data.synthetic import SyntheticHomographyPairs
    from openglue_tpu.models.superglue import SuperGlue, SuperGlueConfig
    from openglue_tpu.parallel.context_parallel import shard_pair_batch_cp
    from openglue_tpu.train.step import superglue_inputs

    mesh = make_mesh({"model": 8})
    cfg = SuperGlueConfig(
        descriptor_dim=32, pe_hidden_layers_sizes=(16,), num_stages=2,
        num_heads=4, attention=attention, otp_num_iters=8, residual=True,
    )
    model = SuperGlue(cfg)
    gen = SyntheticHomographyPairs(num_keypoints=64, descriptor_dim=32)
    batch = gen.sample(jax.random.key(0), 2)
    variables = model.init(jax.random.key(1), **superglue_inputs(batch))
    ref = jax.jit(lambda v, b: model.apply(v, **superglue_inputs(b))["scores"])(
        variables, batch
    )
    sharded = shard_pair_batch_cp(batch, mesh)
    out = jax.jit(lambda v, b: model.apply(v, **superglue_inputs(b))["scores"])(
        variables, sharded
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)


class TestRingAttentionPallas:
    """Ring schedule with each block computed by the Pallas LSE kernel
    (interpret mode on the CPU mesh) and merged by online-logsumexp."""

    def test_self_attention_matches_reference(self, mesh8):
        B, H, N, Dh = 2, 4, 64, 16
        q, k, v = rand(0, B, H, N, Dh), rand(1, B, H, N, Dh), rand(2, B, H, N, Dh)
        mask = jnp.arange(N)[None, :] < jnp.asarray([50, N])[:, None]
        ref, _ = attn_ref.softmax_attention(q, k, v, mask)

        fn = shard_map(
            partial(ring_softmax_attention, axis_name="model", use_pallas=True),
            mesh=mesh8,
            in_specs=(P(None, None, "model"), P(None, None, "model"),
                      P(None, None, "model"), P(None, "model")),
            out_specs=P(None, None, "model"),
            check_vma=False,  # pallas interpret mode vs the vma checker
        )
        out = jax.jit(fn)(q, k, v, mask)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def test_gradients_match_xla_ring(self, mesh8):
        B, H, N, Dh = 1, 2, 32, 16
        q, k, v = rand(0, B, H, N, Dh), rand(1, B, H, N, Dh), rand(2, B, H, N, Dh)
        mask = jnp.arange(N)[None, :] < 27

        def make_loss(use_pallas):
            fn = shard_map(
                partial(
                    ring_softmax_attention, axis_name="model", use_pallas=use_pallas
                ),
                mesh=mesh8,
                in_specs=(P(None, None, "model"), P(None, None, "model"),
                          P(None, None, "model"), P(None, "model")),
                out_specs=P(None, None, "model"),
                check_vma=not use_pallas,
            )
            return lambda q, k, v: jnp.sum(fn(q, k, v, mask) ** 2)

        gk = jax.grad(make_loss(True), argnums=(0, 1, 2))(q, k, v)
        gr = jax.grad(make_loss(False), argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(gk, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)

    def test_lse_kernel_matches_reference(self):
        from openglue_tpu.ops.pallas.attention_kernel import (
            masked_softmax_attention_with_lse,
        )

        q, k, v = rand(0, 2, 4, 96, 64), rand(1, 2, 4, 80, 64), rand(2, 2, 4, 80, 64)
        mask = jnp.arange(80)[None, :] < jnp.asarray([55, 80])[:, None]
        ref_out, ref_lse = attn_ref.softmax_attention_with_lse(q, k, v, mask)
        out, lse = masked_softmax_attention_with_lse(q, k, v, mask, block_q=32)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out), atol=2e-5)
        np.testing.assert_allclose(np.asarray(lse), np.asarray(ref_lse), atol=2e-5)
