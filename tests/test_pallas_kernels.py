"""Pallas kernels vs XLA reference implementations (interpret mode on CPU).

Every kernel must match its einsum/logsumexp reference (SURVEY.md §2: each
Pallas kernel keeps a reference fallback) in forward values and gradients.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openglue_tpu.ops import attention as attn_ref
from openglue_tpu.ops import sinkhorn as sink_ref
from openglue_tpu.ops.pallas import attention_kernel, sinkhorn_kernel


def rand(key, *shape):
    return jax.random.normal(jax.random.key(key), shape, jnp.float32)


class TestAttentionKernel:
    def test_matches_reference_no_mask(self):
        q, k, v = rand(0, 2, 4, 96, 64), rand(1, 2, 4, 80, 64), rand(2, 2, 4, 80, 64)
        ref, _ = attn_ref.softmax_attention(q, k, v)
        out = attention_kernel.masked_softmax_attention(q, k, v, block_q=32)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def test_matches_reference_with_mask(self):
        q, k, v = rand(0, 2, 4, 64, 64), rand(1, 2, 4, 64, 64), rand(2, 2, 4, 64, 64)
        mask = jnp.arange(64)[None, :] < jnp.asarray([40, 64])[:, None]
        ref, _ = attn_ref.softmax_attention(q, k, v, mask)
        out = attention_kernel.masked_softmax_attention(q, k, v, mask, block_q=32)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def test_unaligned_shapes(self):
        q, k, v = rand(0, 1, 2, 50, 64), rand(1, 1, 2, 37, 64), rand(2, 1, 2, 37, 64)
        ref, _ = attn_ref.softmax_attention(q, k, v)
        out = attention_kernel.masked_softmax_attention(q, k, v, block_q=32)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def test_gradients_match_reference(self):
        q, k, v = rand(0, 1, 2, 32, 64), rand(1, 1, 2, 32, 64), rand(2, 1, 2, 32, 64)
        mask = jnp.arange(32)[None, :] < 25

        def loss_kernel(q, k, v):
            return jnp.sum(
                attention_kernel.masked_softmax_attention(q, k, v, mask, block_q=16) ** 2
            )

        def loss_ref(q, k, v):
            return jnp.sum(attn_ref.softmax_attention(q, k, v, mask)[0] ** 2)

        gk = jax.grad(loss_kernel, argnums=(0, 1, 2))(q, k, v)
        gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(gk, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


class TestSinkhornKernel:
    def test_matches_reference_no_mask(self):
        scores = rand(0, 3, 60, 70)
        dustbin = jnp.asarray(1.3)
        ref = sink_ref.log_optimal_transport(scores, dustbin, num_iters=15)
        out = sinkhorn_kernel.log_optimal_transport(scores, dustbin, num_iters=15)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    def test_matches_reference_with_masks(self):
        scores = rand(0, 2, 40, 50)
        dustbin = jnp.asarray(0.7)
        mask0 = jnp.arange(40)[None, :] < jnp.asarray([30, 40])[:, None]
        mask1 = jnp.arange(50)[None, :] < jnp.asarray([50, 20])[:, None]
        ref = sink_ref.log_optimal_transport(
            scores, dustbin, num_iters=15, mask0=mask0, mask1=mask1
        )
        out = sinkhorn_kernel.log_optimal_transport(
            scores, dustbin, num_iters=15, mask0=mask0, mask1=mask1
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    def test_transport_mass_conserved(self):
        scores = rand(0, 2, 33, 47)
        out = sinkhorn_kernel.log_optimal_transport(scores, jnp.asarray(1.0), num_iters=40)
        mass = np.asarray(jnp.sum(jnp.exp(out), axis=(1, 2)))
        np.testing.assert_allclose(mass, 33 + 47, rtol=1e-4)

    def test_gradients_match_reference(self):
        scores = rand(0, 2, 24, 30)
        dustbin = jnp.asarray(1.0)

        def loss_kernel(s, d):
            return jnp.sum(sinkhorn_kernel.log_optimal_transport(s, d, num_iters=10) ** 2)

        def loss_ref(s, d):
            return jnp.sum(sink_ref.log_optimal_transport(s, d, num_iters=10) ** 2)

        gk = jax.grad(loss_kernel, argnums=(0, 1))(scores, dustbin)
        gr = jax.grad(loss_ref, argnums=(0, 1))(scores, dustbin)
        for a, b in zip(gk, gr):
            # rtol covers the large-magnitude dustbin scalar (f32 summation
            # order differs between the adjoint kernel and XLA autodiff)
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-4)

    def test_vmem_dispatch_boundary(self):
        # N=2048 exceeds VMEM -> blocked streaming kernel; N=1024 fits.
        assert not sinkhorn_kernel.fits_vmem(2049, 2049)
        assert sinkhorn_kernel.fits_vmem(1025, 1025)

    def test_blocked_kernel_matches_reference(self):
        # exercise the HBM-streaming variant directly at a small size
        scores = rand(0, 2, 60, 70)
        dustbin = jnp.asarray(1.1)
        ref = sink_ref.log_optimal_transport(scores, dustbin, num_iters=12)

        S_aug = sink_ref.augment_scores(scores, dustbin)
        n, m = 60, 70
        norm = -jnp.log(jnp.asarray(n + m, jnp.float32))
        log_a = jnp.full((n + 1,), norm).at[-1].add(jnp.log(jnp.asarray(m, jnp.float32)))
        log_b = jnp.full((m + 1,), norm).at[-1].add(jnp.log(jnp.asarray(n, jnp.float32)))
        log_a = jnp.broadcast_to(log_a, (2, n + 1))
        log_b = jnp.broadcast_to(log_b, (2, m + 1))
        out = sinkhorn_kernel._log_sinkhorn_blocked(
            log_a, log_b, S_aug, num_iters=12, reg=1.0, interpret=True, r_blk=16,
            k_dtype=jnp.float32,  # exact algebraic parity; bf16-K default below
        ) - norm
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

        # the bf16-K DMA-halving default: log_P perturbation stays below the
        # 20-iteration truncation error (docstring bound ~1e-2 nats) and the
        # decode argmax structure is preserved
        out_bf16 = sinkhorn_kernel._log_sinkhorn_blocked(
            log_a, log_b, S_aug, num_iters=12, reg=1.0, interpret=True, r_blk=16
        ) - norm
        np.testing.assert_allclose(np.asarray(out_bf16), np.asarray(ref), atol=0.05)
        agree = (
            np.argmax(np.asarray(out_bf16), axis=2) == np.argmax(np.asarray(ref), axis=2)
        ).mean()
        assert agree >= 0.99

    def test_blocked_kernel_masked(self):
        """Dead rows/columns (masked keypoints) through the streaming kernel:
        the scale-domain form turns a dead row into an all-ones K row with
        zero marginal — its potential must still match the XLA reference."""
        scores = rand(5, 2, 40, 52)
        dustbin = jnp.asarray(0.7)
        mask0 = jnp.arange(40)[None, :] < jnp.asarray([40, 25])[:, None]
        mask1 = jnp.arange(52)[None, :] < jnp.asarray([37, 52])[:, None]
        ref = sink_ref.log_optimal_transport(
            scores, dustbin, num_iters=10, mask0=mask0, mask1=mask1
        )

        S_inner, S_dust, log_a_inner, log_a_dust, log_b, norm = (
            sink_ref.build_masked_otp_inputs(scores, dustbin, 1.0, mask0, mask1)
        )
        S_aug = jnp.concatenate([S_inner, S_dust], axis=1)
        log_a = jnp.concatenate([log_a_inner, log_a_dust[:, None]], axis=1)
        out = sinkhorn_kernel._log_sinkhorn_blocked(
            log_a, log_b, S_aug, num_iters=10, reg=1.0, interpret=True, r_blk=8,
            k_dtype=jnp.float32,
        ) - norm[:, None, None]
        valid = (
            jnp.concatenate([mask0, jnp.ones((2, 1), bool)], 1)[:, :, None]
            & jnp.concatenate([mask1, jnp.ones((2, 1), bool)], 1)[:, None, :]
        )
        np.testing.assert_allclose(
            np.asarray(jnp.where(valid, out, 0.0)),
            np.asarray(jnp.where(valid, ref, 0.0)),
            atol=1e-5,
        )

    def test_blocked_sinkhorn_extreme_dynamic_range(self):
        """Public log_optimal_transport dispatch at a genuinely >VMEM shape
        with adversarial score dynamic range (scores x30, reg < 1: ~500-nat
        spread after /reg). Pins down the domain where the row-stabilized
        scale-domain streaming kernel is trusted: K entries >88 nats below
        their row max flush to zero in f32 and the column accumulation is
        unstabilized, but the exact column-stabilized XLA final
        half-iteration restores reference log_P (see the
        _blocked_scale_kernel docstring's dynamic-range note)."""
        import numpy as _np

        rng = _np.random.default_rng(0)
        m, n = 1400, 1350  # beyond fits_vmem -> blocked streaming kernel
        assert not sinkhorn_kernel.fits_vmem(m + 1, n + 1)
        scores = jnp.asarray(rng.standard_normal((1, m, n)), jnp.float32) * 30.0
        mask0 = jnp.asarray(rng.random((1, m)) > 0.1)
        mask1 = jnp.asarray(rng.random((1, n)) > 0.1)
        dustbin = jnp.float32(1.0)
        out_k = sinkhorn_kernel.log_optimal_transport(
            scores, dustbin, num_iters=20, reg=0.5, mask0=mask0, mask1=mask1
        )
        out_r = sink_ref.log_optimal_transport(
            scores, dustbin, num_iters=20, reg=0.5, mask0=mask0, mask1=mask1
        )
        pv = mask0[:, :, None] & mask1[:, None, :]
        # the public dispatch ships bf16 K storage (DMA roofline): allow its
        # ~1e-2-nat perturbation on top of the stabilization semantics this
        # test pins; everything must stay finite and reference-close even at
        # a ~500-nat spread
        diff = np.asarray(out_k[:, :m, :n][pv]) - np.asarray(out_r[:, :m, :n][pv])
        assert np.isfinite(np.asarray(out_k)).all()
        np.testing.assert_allclose(diff, np.zeros_like(diff), atol=0.08)


class TestPallasModelPath:
    def test_superglue_forward_use_pallas_matches_xla(self):
        from openglue_tpu.data.synthetic import SyntheticHomographyPairs
        from openglue_tpu.models.superglue import SuperGlue, SuperGlueConfig
        from openglue_tpu.train.step import superglue_inputs

        gen = SyntheticHomographyPairs(num_keypoints=48, descriptor_dim=64)
        batch = gen.sample(jax.random.key(0), 2)
        kwargs = dict(
            descriptor_dim=64,
            pe_hidden_layers_sizes=(32,),
            num_stages=2,
            num_heads=4,
            otp_num_iters=8,
            residual=True,
        )
        m_ref = SuperGlue(SuperGlueConfig(**kwargs, use_pallas=False))
        m_pal = SuperGlue(SuperGlueConfig(**kwargs, use_pallas=True))
        variables = m_ref.init(jax.random.key(1), **superglue_inputs(batch))
        out_ref = m_ref.apply(variables, **superglue_inputs(batch))
        out_pal = m_pal.apply(variables, **superglue_inputs(batch))
        np.testing.assert_allclose(
            np.asarray(out_pal["scores"]), np.asarray(out_ref["scores"]), atol=5e-4
        )


class TestAttentionBackwardKernel:
    def test_bwd_fits_vmem_boundary(self):
        assert attention_kernel._bwd_fits_vmem(1024, 1024, 64)
        assert not attention_kernel._bwd_fits_vmem(2048, 2048, 64)

    def test_unaligned_backward_matches_reference(self):
        q, k, v = rand(0, 1, 2, 50, 64), rand(1, 1, 2, 37, 64), rand(2, 1, 2, 37, 64)
        mask = jnp.arange(37)[None, :] < 30

        def loss_kernel(q, k, v):
            return jnp.sum(
                attention_kernel.masked_softmax_attention(q, k, v, mask, block_q=16) ** 2
            )

        def loss_ref(q, k, v):
            return jnp.sum(attn_ref.softmax_attention(q, k, v, mask)[0] ** 2)

        gk = jax.grad(loss_kernel, argnums=(0, 1, 2))(q, k, v)
        gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(gk, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


class TestSinkhornBackwardKernel:
    def test_masked_gradients_match_reference(self):
        """Loss over VALID entries only (every real loss reads only those; a
        loss touching masked -1e9 logits has garbage-magnitude gradients in
        the reference too)."""
        scores = rand(0, 2, 24, 30)
        dustbin = jnp.asarray(0.8)
        mask0 = jnp.arange(24)[None, :] < jnp.asarray([18, 24])[:, None]
        mask1 = jnp.arange(30)[None, :] < jnp.asarray([30, 22])[:, None]
        vr = jnp.concatenate([mask0, jnp.ones((2, 1), bool)], 1)
        vc = jnp.concatenate([mask1, jnp.ones((2, 1), bool)], 1)
        valid = vr[:, :, None] & vc[:, None, :]

        def make_loss(fn):
            def loss(s, d):
                out = fn(s, d, num_iters=10, mask0=mask0, mask1=mask1)
                return jnp.sum(jnp.where(valid, out, 0.0) ** 2)
            return loss

        gk = jax.grad(make_loss(sinkhorn_kernel.log_optimal_transport), argnums=(0, 1))(
            scores, dustbin
        )
        gr = jax.grad(make_loss(sink_ref.log_optimal_transport), argnums=(0, 1))(
            scores, dustbin
        )
        for a, b in zip(gk, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-4)

    def test_single_iteration_gradients(self):
        # edge case: T=1 (the unrolled first adjoint step IS the whole loop)
        scores = rand(1, 1, 16, 20)
        dustbin = jnp.asarray(1.0)

        def loss_kernel(s):
            return jnp.sum(sinkhorn_kernel.log_optimal_transport(s, dustbin, num_iters=1) ** 2)

        def loss_ref(s):
            return jnp.sum(sink_ref.log_optimal_transport(s, dustbin, num_iters=1) ** 2)

        np.testing.assert_allclose(
            np.asarray(jax.grad(loss_kernel)(scores)),
            np.asarray(jax.grad(loss_ref)(scores)),
            rtol=1e-5, atol=1e-4,
        )


class TestFusedGNNLayer:
    """Whole-layer fused kernel (ops/pallas/gnn_layer_kernel.py) vs its XLA
    reference and vs the composed flax module path."""

    @staticmethod
    def _weights(dim, seed=0, dtype=jnp.float32):
        from openglue_tpu.ops.pallas.gnn_layer_kernel import PropagationWeights

        ks = jax.random.split(jax.random.key(seed), 14)
        # ~1/sqrt(fan_in) scale keeps activations O(1) so f32 rounding stays
        # within the absolute tolerances below
        mk = lambda i, *s: jax.random.normal(ks[i], s, jnp.float32) / np.sqrt(s[-2] if len(s) > 1 else 1.0)
        return PropagationWeights(
            wq=mk(0, dim, dim).astype(dtype), bq=mk(1, 1, dim),
            wk=mk(2, dim, dim).astype(dtype), bk=mk(3, 1, dim),
            wv=mk(4, dim, dim).astype(dtype), bv=mk(5, 1, dim),
            wo=mk(6, dim, dim).astype(dtype), bo=mk(7, 1, dim),
            w1=mk(8, 2 * dim, 2 * dim).astype(dtype), b1=mk(9, 1, 2 * dim),
            a1=1.0 + 0.1 * mk(10, 1, 2 * dim), c1=0.1 * mk(11, 1, 2 * dim),
            w2=mk(12, 2 * dim, dim).astype(dtype), b2=mk(13, 1, dim),
        )

    def test_matches_xla_reference_with_mask(self):
        from openglue_tpu.ops.pallas import gnn_layer_kernel as glk

        dim, heads = 128, 4
        x_q, x_kv = rand(1, 2, 96, dim), rand(2, 2, 80, dim)
        mask = jnp.arange(80)[None, :] < jnp.asarray([60, 80])[:, None]
        w = self._weights(dim)
        ref = glk.xla_reference_layer(x_q, x_kv, mask, w, heads, False)
        out = glk.fused_attention_propagation(
            x_q, x_kv, mask, w, num_heads=heads, block_q=32
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5)

    def test_matches_xla_reference_offset_unaligned(self):
        from openglue_tpu.ops.pallas import gnn_layer_kernel as glk

        dim, heads = 128, 2
        x_q, x_kv = rand(3, 1, 50, dim), rand(4, 1, 37, dim)
        w = self._weights(dim, seed=5)
        ref = glk.xla_reference_layer(x_q, x_kv, None, w, heads, True)
        out = glk.fused_attention_propagation(
            x_q, x_kv, None, w, num_heads=heads, use_offset=True, block_q=32
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5)

    def test_gradients_match_reference(self):
        from openglue_tpu.ops.pallas import gnn_layer_kernel as glk

        dim, heads = 128, 4
        x_q, x_kv = rand(1, 1, 40, dim), rand(2, 1, 40, dim)
        mask = jnp.arange(40)[None, :] < 33
        w = self._weights(dim, seed=7)

        def loss_kernel(x_q, x_kv, w):
            return jnp.sum(
                glk.fused_attention_propagation(
                    x_q, x_kv, mask, w, num_heads=heads, block_q=16
                )
                ** 2
            )

        def loss_ref(x_q, x_kv, w):
            return jnp.sum(glk.xla_reference_layer(x_q, x_kv, mask, w, heads, False) ** 2)

        gk = jax.grad(loss_kernel, argnums=(0, 1, 2))(x_q, x_kv, w)
        gr = jax.grad(loss_ref, argnums=(0, 1, 2))(x_q, x_kv, w)
        for a, b in zip(jax.tree_util.tree_leaves(gk), jax.tree_util.tree_leaves(gr)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)

    def test_module_fused_path_matches_composed(self):
        """AttentionalPropagation(use_pallas=True) in eval at N>=512 takes the
        fused kernel and must match the composed module bit-for-tolerance,
        including non-trivial running BN stats."""
        from openglue_tpu.models.gnn import AttentionalPropagation

        dim, heads, n = 64, 4, 512
        x_q, x_kv = rand(1, 2, n, dim), rand(2, 2, n, dim)
        kv_mask = jnp.arange(n)[None, :] < jnp.asarray([400, n])[:, None]
        q_mask = jnp.ones((2, n), bool)

        ref_mod = AttentionalPropagation(embed_dim=dim, num_heads=heads)
        variables = ref_mod.init(jax.random.key(0), x_q, x_kv, q_mask, kv_mask)
        # non-trivial running stats so the BN fold is actually exercised
        stats = variables["batch_stats"]
        stats = jax.tree_util.tree_map(
            lambda v: v + 0.3 * jax.random.normal(jax.random.key(9), v.shape) ** 2, stats
        )
        variables = {**variables, "batch_stats": stats}

        ref = ref_mod.apply(variables, x_q, x_kv, q_mask, kv_mask)
        fused_mod = AttentionalPropagation(
            embed_dim=dim, num_heads=heads, use_pallas=True
        )
        out = fused_mod.apply(variables, x_q, x_kv, q_mask, kv_mask)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-5)

    def test_small_shapes_skip_fused_path(self):
        """Below PALLAS_MIN_KEYPOINTS the module must fall back to the
        composed path (dispatch: use_pallas=True is never a regression)."""
        from openglue_tpu.models.gnn import AttentionalPropagation

        dim, n = 64, 64
        x_q = rand(1, 2, n, dim)
        mod = AttentionalPropagation(embed_dim=dim, num_heads=4, use_pallas=True)
        variables = mod.init(jax.random.key(0), x_q, x_q)
        assert mod._fused_layer.__wrapped__ is not None  # sanity: method exists
        out = mod.apply(variables, x_q, x_q)
        ref = AttentionalPropagation(embed_dim=dim, num_heads=4).apply(
            variables, x_q, x_q
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


class TestModelPallasDispatch:
    """Full SuperGlue forward with use_pallas=True (eval): at N>=512 the fused
    GNN-layer + Sinkhorn kernels engage and must match the XLA model."""

    def _model(self, use_pallas):
        from openglue_tpu.models.superglue import SuperGlue, SuperGlueConfig

        cfg = SuperGlueConfig(
            descriptor_dim=64,
            pe_hidden_layers_sizes=(32,),
            side_info_size=1,
            num_stages=2,
            num_heads=4,
            attention="softmax",
            otp_num_iters=8,
            residual=True,
            use_pallas=use_pallas,
        )
        return SuperGlue(cfg)

    @pytest.mark.slow
    def test_eval_forward_parity_at_dispatch_scale(self):
        from openglue_tpu.data.synthetic import SyntheticHomographyPairs
        from openglue_tpu.train.step import superglue_inputs

        gen = SyntheticHomographyPairs(num_keypoints=512, descriptor_dim=64)
        batch = gen.sample(jax.random.key(0), 2)
        inputs = superglue_inputs(batch, train=False)

        ref_model = self._model(False)
        variables = ref_model.init(jax.random.key(1), **inputs)
        ref = ref_model.apply(variables, **inputs)["scores"]
        out = self._model(True).apply(variables, **inputs)["scores"]
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)


class TestSinkhornAdjointFactors:
    """Rank-2T adjoint factorization (dM = g - exp(M - rmax) o (P^T Q)):
    the kernel path that serves the flagship N=1024 training backward."""

    def test_gate_admits_flagship_and_rejects_eval_scale(self):
        from openglue_tpu.ops.pallas.sinkhorn_kernel import _bwd_fits_vmem

        assert _bwd_fits_vmem(1025, 1025)  # N=1024 flagship trains fused
        assert not _bwd_fits_vmem(2049, 2049)  # N=2048 falls back to XLA replay

    def test_masked_gradients_match_reference_midscale(self):
        scores = rand(0, 2, 200, 250)
        dustbin = jnp.asarray(0.8)
        mask0 = jnp.arange(200)[None, :] < jnp.asarray([160, 200])[:, None]
        mask1 = jnp.arange(250)[None, :] < jnp.asarray([250, 90])[:, None]

        def loss_kernel(s, d):
            out = sinkhorn_kernel.log_optimal_transport(
                s, d, num_iters=12, mask0=mask0, mask1=mask1
            )
            vr = jnp.pad(mask0, ((0, 0), (0, 1)), constant_values=True)
            vc = jnp.pad(mask1, ((0, 0), (0, 1)), constant_values=True)
            pad = vr[:, :, None] & vc[:, None, :]
            return jnp.sum(jnp.where(pad, out, 0.0) ** 2)

        def loss_ref(s, d):
            out = sink_ref.log_optimal_transport(
                s, d, num_iters=12, mask0=mask0, mask1=mask1
            )
            vr = jnp.pad(mask0, ((0, 0), (0, 1)), constant_values=True)
            vc = jnp.pad(mask1, ((0, 0), (0, 1)), constant_values=True)
            pad = vr[:, :, None] & vc[:, None, :]
            return jnp.sum(jnp.where(pad, out, 0.0) ** 2)

        gk = jax.grad(loss_kernel, argnums=(0, 1))(scores, dustbin)
        gr = jax.grad(loss_ref, argnums=(0, 1))(scores, dustbin)
        for a, b in zip(gk, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4)


class TestFusedLinearAttentionLayer:
    """Linear (ELU+1) attention branch of the fused layer kernel."""

    def test_matches_xla_reference_with_mask(self):
        from openglue_tpu.ops.pallas import gnn_layer_kernel as glk

        dim, heads = 128, 4
        x_q, x_kv = rand(1, 2, 96, dim), rand(2, 2, 80, dim)
        mask = jnp.arange(80)[None, :] < jnp.asarray([60, 80])[:, None]
        w = TestFusedGNNLayer._weights(dim, seed=3)
        ref = glk.xla_reference_layer(x_q, x_kv, mask, w, heads, False, "linear")
        out = glk.fused_attention_propagation(
            x_q, x_kv, mask, w, num_heads=heads, block_q=32, attention_kind="linear"
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5)

    def test_reference_matches_composed_module(self):
        """The fused-layer XLA reference must agree with the real composed
        AttentionalPropagation(attention='linear') so the kernel oracle is
        anchored to the module semantics."""
        from openglue_tpu.models.gnn import AttentionalPropagation
        from openglue_tpu.ops.pallas import gnn_layer_kernel as glk

        dim, heads, n = 64, 4, 48
        x_q, x_kv = rand(1, 2, n, dim), rand(2, 2, n, dim)
        kv_mask = jnp.arange(n)[None, :] < jnp.asarray([30, n])[:, None]
        mod = AttentionalPropagation(embed_dim=dim, num_heads=heads, attention="linear")
        variables = mod.init(jax.random.key(0), x_q, x_kv, None, kv_mask)
        ref = mod.apply(variables, x_q, x_kv, None, kv_mask)
        w = glk.fold_propagation_weights(
            variables["params"], variables["batch_stats"], jnp.float32
        )
        out = glk.xla_reference_layer(x_q, x_kv, kv_mask, w, heads, False, "linear")
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def test_module_fused_path_matches_composed(self):
        from openglue_tpu.models.gnn import AttentionalPropagation

        dim, heads, n = 64, 4, 512
        x_q, x_kv = rand(1, 2, n, dim), rand(2, 2, n, dim)
        kv_mask = jnp.arange(n)[None, :] < jnp.asarray([384, n])[:, None]
        ref_mod = AttentionalPropagation(embed_dim=dim, num_heads=heads, attention="linear")
        variables = ref_mod.init(jax.random.key(0), x_q, x_kv, None, kv_mask)
        ref = ref_mod.apply(variables, x_q, x_kv, None, kv_mask)
        out = AttentionalPropagation(
            embed_dim=dim, num_heads=heads, attention="linear", use_pallas=True
        ).apply(variables, x_q, x_kv, None, kv_mask)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-5)

    def test_gradients_match_reference(self):
        from openglue_tpu.ops.pallas import gnn_layer_kernel as glk

        dim, heads = 128, 4
        x_q, x_kv = rand(1, 1, 40, dim), rand(2, 1, 40, dim)
        mask = jnp.arange(40)[None, :] < 33
        w = TestFusedGNNLayer._weights(dim, seed=11)

        def loss_kernel(x_q, x_kv, w):
            return jnp.sum(
                glk.fused_attention_propagation(
                    x_q, x_kv, mask, w, num_heads=heads, block_q=16,
                    attention_kind="linear",
                ) ** 2
            )

        def loss_ref(x_q, x_kv, w):
            return jnp.sum(
                glk.xla_reference_layer(x_q, x_kv, mask, w, heads, False, "linear") ** 2
            )

        gk = jax.grad(loss_kernel, argnums=(0, 1, 2))(x_q, x_kv, w)
        gr = jax.grad(loss_ref, argnums=(0, 1, 2))(x_q, x_kv, w)
        for a, b in zip(jax.tree_util.tree_leaves(gk), jax.tree_util.tree_leaves(gr)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


class TestInt8FusedGNNLayer:
    """int8-MXU fused layer (ops/pallas/gnn_layer_int8.py): kernel vs its own
    quantized XLA oracle (same math, tight), quantized vs f32 layer (error
    bound), and model-level decode agreement (the serving-quality guard)."""

    @staticmethod
    def _qweights(dim, seed=0):
        from openglue_tpu.ops.pallas import gnn_layer_int8 as gli8

        w = TestFusedGNNLayer._weights(dim, seed=seed)
        return w, gli8.quantize_propagation_weights(w)

    def test_matches_quantized_xla_oracle(self):
        from openglue_tpu.ops.pallas import gnn_layer_int8 as gli8

        dim, heads = 128, 4
        x_q, x_kv = rand(1, 2, 96, dim), rand(2, 2, 80, dim)
        mask = jnp.arange(80)[None, :] < jnp.asarray([60, 80])[:, None]
        _, qw = self._qweights(dim)
        ref = gli8.xla_reference_layer_int8(x_q, x_kv, mask, qw, heads)
        out = gli8.fused_attention_propagation_int8(
            x_q, x_kv, mask, qw, num_heads=heads, block_q=32
        )
        # same quantized math, but bf16 attention rounding differs between
        # interpret and XLA, flipping independent int8 rounding decisions —
        # compare in norm, not pointwise
        rel = np.linalg.norm(np.asarray(out) - np.asarray(ref)) / np.linalg.norm(
            np.asarray(ref)
        )
        assert rel < 0.015, f"kernel-vs-oracle relative error {rel:.4f}"

    def test_quantization_error_bounded_vs_f32(self):
        from openglue_tpu.ops.pallas import gnn_layer_kernel as glk
        from openglue_tpu.ops.pallas import gnn_layer_int8 as gli8

        dim, heads = 128, 4
        x_q = rand(1, 2, 96, dim)
        w, qw = self._qweights(dim, seed=3)
        ref = glk.xla_reference_layer(x_q, x_q, None, w, heads, False)
        out = gli8.fused_attention_propagation_int8(
            x_q, x_q, None, qw, num_heads=heads, block_q=32
        )
        rel = np.linalg.norm(np.asarray(out) - np.asarray(ref)) / np.linalg.norm(
            np.asarray(ref)
        )
        assert rel < 0.03, f"int8 relative error {rel:.4f}"

    def test_offset_variant(self):
        from openglue_tpu.ops.pallas import gnn_layer_int8 as gli8

        dim, heads = 128, 2
        x_q, x_kv = rand(3, 1, 50, dim), rand(4, 1, 37, dim)
        _, qw = self._qweights(dim, seed=5)
        ref = gli8.xla_reference_layer_int8(x_q, x_kv, None, qw, heads, use_offset=True)
        out = gli8.fused_attention_propagation_int8(
            x_q, x_kv, None, qw, num_heads=heads, use_offset=True, block_q=32
        )
        rel = np.linalg.norm(np.asarray(out) - np.asarray(ref)) / np.linalg.norm(
            np.asarray(ref)
        )
        assert rel < 0.015, f"kernel-vs-oracle relative error {rel:.4f}"

    def test_module_int8_path_close_to_composed(self):
        from openglue_tpu.models.gnn import AttentionalPropagation

        dim, heads, n = 64, 4, 512
        x_q, x_kv = rand(1, 2, n, dim), rand(2, 2, n, dim)
        kv_mask = jnp.arange(n)[None, :] < jnp.asarray([400, n])[:, None]
        q_mask = jnp.ones((2, n), bool)
        ref_mod = AttentionalPropagation(embed_dim=dim, num_heads=heads)
        variables = ref_mod.init(jax.random.key(0), x_q, x_kv, q_mask, kv_mask)
        ref = ref_mod.apply(variables, x_q, x_kv, q_mask, kv_mask)
        out = AttentionalPropagation(
            embed_dim=dim, num_heads=heads, use_pallas=True, quantize="int8"
        ).apply(variables, x_q, x_kv, q_mask, kv_mask)
        rel = np.linalg.norm(np.asarray(out) - np.asarray(ref)) / np.linalg.norm(
            np.asarray(ref)
        )
        assert rel < 0.03, f"int8 module relative error {rel:.4f}"

    @pytest.mark.slow
    def test_model_decode_agreement(self):
        """Matches decoded from the int8 serving path must agree with the f32
        path on the overwhelming majority of keypoints."""
        from openglue_tpu.data.synthetic import SyntheticHomographyPairs
        from openglue_tpu.models.matching import decode_matches
        from openglue_tpu.models.superglue import SuperGlue, SuperGlueConfig
        from openglue_tpu.train.step import superglue_inputs

        def model(quantize):
            return SuperGlue(
                SuperGlueConfig(
                    descriptor_dim=64,
                    pe_hidden_layers_sizes=(32,),
                    side_info_size=1,
                    num_stages=2,
                    num_heads=4,
                    otp_num_iters=8,
                    residual=True,
                    use_pallas=True,
                    quantize=quantize,
                )
            )

        gen = SyntheticHomographyPairs(num_keypoints=512, descriptor_dim=64)
        batch = gen.sample(jax.random.key(0), 2)
        inputs = superglue_inputs(batch, train=False)
        variables = model(None).init(jax.random.key(1), **inputs)

        def matches(quantize):
            scores = model(quantize).apply(variables, **inputs)["scores"]
            return decode_matches(
                scores, mask0=batch.side0.mask, mask1=batch.side1.mask
            )["matches0"]

        m_ref, m_int8 = matches(None), matches("int8")
        agreement = float(jnp.mean(m_ref == m_int8))
        assert agreement >= 0.97, f"decode agreement {agreement:.4f}"

    def test_static_scales_match_xla_static_oracle(self):
        """Static-scale PTQ kernel vs the XLA reference in static mode —
        identical quantized math given the same [5] activation scales."""
        from openglue_tpu.ops.pallas import gnn_layer_int8 as gli8

        dim, heads = 128, 4
        x_q, x_kv = rand(1, 2, 96, dim), rand(2, 2, 80, dim)
        mask = jnp.arange(80)[None, :] < jnp.asarray([60, 80])[:, None]
        _, qw = self._qweights(dim)
        absmax = gli8.reference_activation_absmax(x_q, x_kv, mask, qw, heads)
        scales = absmax * (1.1 / 127.0) + 1e-12
        ref = gli8.xla_reference_layer_int8(
            x_q, x_kv, mask, qw, heads, act_scales=scales
        )
        out = gli8.fused_attention_propagation_int8(
            x_q, x_kv, mask, qw, num_heads=heads, block_q=32, act_scales=scales
        )
        rel = np.linalg.norm(np.asarray(out) - np.asarray(ref)) / np.linalg.norm(
            np.asarray(ref)
        )
        assert rel < 0.015, f"static kernel-vs-oracle relative error {rel:.4f}"

    def test_static_scales_error_bounded_vs_f32(self):
        """Per-tensor static quantization is coarser than per-row dynamic —
        bound its error against the f32 layer too."""
        from openglue_tpu.ops.pallas import gnn_layer_kernel as glk
        from openglue_tpu.ops.pallas import gnn_layer_int8 as gli8

        dim, heads = 128, 4
        x_q = rand(1, 2, 96, dim)
        w, qw = self._qweights(dim, seed=3)
        absmax = gli8.reference_activation_absmax(x_q, x_q, None, qw, heads)
        scales = absmax * (1.1 / 127.0) + 1e-12
        ref = glk.xla_reference_layer(x_q, x_q, None, w, heads, False)
        out = gli8.fused_attention_propagation_int8(
            x_q, x_q, None, qw, num_heads=heads, block_q=32, act_scales=scales
        )
        rel = np.linalg.norm(np.asarray(out) - np.asarray(ref)) / np.linalg.norm(
            np.asarray(ref)
        )
        assert rel < 0.05, f"static int8 relative error {rel:.4f}"

    def test_quant_attention_matches_xla_oracle(self):
        """int8-attention mode (qk^T and P.V on the int8 MXU, per-tensor
        q/k/v scales, constant-scale probabilities): kernel vs the XLA oracle
        running the same quantized math."""
        from openglue_tpu.ops.pallas import gnn_layer_int8 as gli8

        dim, heads = 128, 4
        x_q, x_kv = rand(1, 2, 96, dim), rand(2, 2, 80, dim)
        mask = jnp.arange(80)[None, :] < jnp.asarray([60, 80])[:, None]
        _, qw = self._qweights(dim)
        ref = gli8.xla_reference_layer_int8(
            x_q, x_kv, mask, qw, heads, quant_attention=True
        )
        out = gli8.fused_attention_propagation_int8(
            x_q, x_kv, mask, qw, num_heads=heads, block_q=32,
            quant_attention=True,
        )
        rel = np.linalg.norm(np.asarray(out) - np.asarray(ref)) / np.linalg.norm(
            np.asarray(ref)
        )
        # the kernel quantizes q PER QUERY BLOCK (block-local absmax) while
        # the oracle uses the global absmax — small scale differences flip
        # independent rounding decisions; compare in norm
        assert rel < 0.02, f"attn-quant kernel-vs-oracle relative error {rel:.4f}"

    def test_quant_attention_static_matches_oracle(self):
        """Static [8]-site scales: kernel and oracle use identical scalar
        scales everywhere, so the quantized math matches tightly."""
        from openglue_tpu.ops.pallas import gnn_layer_int8 as gli8

        dim, heads = 128, 4
        x_q, x_kv = rand(1, 2, 96, dim), rand(2, 2, 80, dim)
        mask = jnp.arange(80)[None, :] < jnp.asarray([60, 80])[:, None]
        _, qw = self._qweights(dim)
        absmax = gli8.reference_activation_absmax(
            x_q, x_kv, mask, qw, heads, quant_attention=True
        )
        assert absmax.shape == (8,)
        scales = absmax * (1.1 / 127.0) + 1e-12
        ref = gli8.xla_reference_layer_int8(
            x_q, x_kv, mask, qw, heads, act_scales=scales, quant_attention=True
        )
        out = gli8.fused_attention_propagation_int8(
            x_q, x_kv, mask, qw, num_heads=heads, block_q=32,
            act_scales=scales, quant_attention=True,
        )
        rel = np.linalg.norm(np.asarray(out) - np.asarray(ref)) / np.linalg.norm(
            np.asarray(ref)
        )
        assert rel < 0.015, f"static attn-quant kernel-vs-oracle error {rel:.4f}"

    def test_quant_attention_error_bounded_vs_f32(self):
        """Quantizing the attention operands adds logit noise on top of the
        dense-chain quantization — bound the total against the f32 layer."""
        from openglue_tpu.ops.pallas import gnn_layer_kernel as glk
        from openglue_tpu.ops.pallas import gnn_layer_int8 as gli8

        dim, heads = 128, 4
        x_q = rand(1, 2, 96, dim)
        w, qw = self._qweights(dim, seed=3)
        ref = glk.xla_reference_layer(x_q, x_q, None, w, heads, False)
        out = gli8.fused_attention_propagation_int8(
            x_q, x_q, None, qw, num_heads=heads, block_q=32,
            quant_attention=True,
        )
        rel = np.linalg.norm(np.asarray(out) - np.asarray(ref)) / np.linalg.norm(
            np.asarray(ref)
        )
        assert rel < 0.05, f"attn-quant int8 relative error {rel:.4f}"

    @pytest.mark.slow
    def test_model_int8_attn_decode_agreement(self):
        """End-to-end int8_static_attn flow (the fastest eval-scale serving
        path): calibrate -> serve -> decode agreement vs f32 (the serving
        quality guard, same bar as the dense-only int8 path)."""
        from openglue_tpu.data.synthetic import SyntheticHomographyPairs
        from openglue_tpu.models.matching import decode_matches
        from openglue_tpu.models.superglue import SuperGlue, SuperGlueConfig
        from openglue_tpu.train.step import superglue_inputs

        def model(quantize):
            return SuperGlue(
                SuperGlueConfig(
                    descriptor_dim=64,
                    pe_hidden_layers_sizes=(32,),
                    side_info_size=1,
                    num_stages=2,
                    num_heads=4,
                    otp_num_iters=8,
                    residual=True,
                    use_pallas=True,
                    quantize=quantize,
                )
            )

        gen = SyntheticHomographyPairs(num_keypoints=512, descriptor_dim=64)
        batch = gen.sample(jax.random.key(0), 2)
        inputs = superglue_inputs(batch, train=False)
        variables = model(None).init(jax.random.key(1), **inputs)

        def matches(variables, quantize):
            scores = model(quantize).apply(variables, **inputs)["scores"]
            return decode_matches(
                scores, mask0=batch.side0.mask, mask1=batch.side1.mask
            )["matches0"]

        m_ref = matches(variables, None)
        # dynamic attention quantization
        m_dyn = matches(variables, "int8_attn")
        assert float(jnp.mean(m_ref == m_dyn)) >= 0.97
        # static: calibrate ([8] sites), then serve
        _, calib = model("int8_static_attn").apply(
            variables, **inputs, mutable=["int8_calib"]
        )
        calib = dict(calib)
        assert all(
            a.shape == (8,) for a in jax.tree_util.tree_leaves(calib)
        ), "attn-quant calibration must record all 8 sites"
        m_static = matches({**variables, **calib}, "int8_static_attn")
        agreement = float(jnp.mean(m_ref == m_static))
        assert agreement >= 0.97, f"static attn-quant decode agreement {agreement:.4f}"

    @pytest.mark.slow
    def test_model_int8_static_calibrate_then_decode_agreement(self):
        """End-to-end static-scale PTQ flow: calibrate (mutable int8_calib
        apply) -> serve with static scales -> decode agreement vs f32."""
        from openglue_tpu.data.synthetic import SyntheticHomographyPairs
        from openglue_tpu.models.matching import decode_matches
        from openglue_tpu.models.superglue import SuperGlue, SuperGlueConfig
        from openglue_tpu.train.step import superglue_inputs

        def model(quantize):
            return SuperGlue(
                SuperGlueConfig(
                    descriptor_dim=64,
                    pe_hidden_layers_sizes=(32,),
                    side_info_size=1,
                    num_stages=2,
                    num_heads=4,
                    otp_num_iters=8,
                    residual=True,
                    use_pallas=True,
                    quantize=quantize,
                )
            )

        gen = SyntheticHomographyPairs(num_keypoints=512, descriptor_dim=64)
        batch = gen.sample(jax.random.key(0), 2)
        inputs = superglue_inputs(batch, train=False)
        variables = model(None).init(jax.random.key(1), **inputs)

        # calibration pass: records per-layer activation absmaxes
        _, calib = model("int8_static").apply(
            variables, **inputs, mutable=["int8_calib"]
        )
        calibrated = {**variables, **dict(calib)}
        leaves = jax.tree_util.tree_leaves(calib["int8_calib"])
        assert leaves and all(bool((l > 0).all()) for l in leaves)

        def matches(quantize, v):
            scores = model(quantize).apply(v, **inputs)["scores"]
            return decode_matches(
                scores, mask0=batch.side0.mask, mask1=batch.side1.mask
            )["matches0"]

        m_ref = matches(None, variables)
        m_static = matches("int8_static", calibrated)
        agreement = float(jnp.mean(m_ref == m_static))
        assert agreement >= 0.97, f"static decode agreement {agreement:.4f}"

    def test_attn_quant_with_short_scales_raises(self):
        """A 5-site calibration vector served under quant_attention would
        turn the attention sites into ~1e-12 scales (silently wrong outputs)
        — both the kernel entry and the XLA oracle must refuse it."""
        from openglue_tpu.ops.pallas import gnn_layer_int8 as gli8

        dim, heads = 128, 4
        x_q = rand(1, 2, 96, dim)
        _, qw = self._qweights(dim)
        scales5 = jnp.full((5,), 0.01, jnp.float32)
        with pytest.raises(ValueError, match="8 calibrated activation sites"):
            gli8.fused_attention_propagation_int8(
                x_q, x_q, None, qw, num_heads=heads, block_q=32,
                act_scales=scales5, quant_attention=True,
            )
        with pytest.raises(ValueError, match="8 calibrated activation sites"):
            gli8.xla_reference_layer_int8(
                x_q, x_q, None, qw, heads, act_scales=scales5,
                quant_attention=True,
            )

    def test_module_mismatched_calib_shape_raises(self):
        """Checkpoint calibrated under int8_static (5 sites) then served with
        the config flipped to int8_static_attn must raise, not silently zero
        the attention message."""
        from openglue_tpu.models.gnn import AttentionalPropagation

        dim, heads, n = 64, 4, 512
        x_q = rand(1, 2, n, dim)
        q_mask = jnp.ones((2, n), bool)
        mod = lambda q: AttentionalPropagation(
            embed_dim=dim, num_heads=heads, use_pallas=True, quantize=q
        )
        variables = mod(None).init(jax.random.key(0), x_q, x_q, q_mask, q_mask)
        _, calib = mod("int8_static").apply(
            variables, x_q, x_q, q_mask, q_mask, mutable=["int8_calib"]
        )
        calibrated = {**variables, **dict(calib)}
        with pytest.raises(ValueError, match="re-run calibration"):
            mod("int8_static_attn").apply(calibrated, x_q, x_q, q_mask, q_mask)


class TestQuantizeFallbackWarns:
    """quantize modes that cannot serve int8 must warn loudly at trace time
    instead of silently keeping the bf16 path (VERDICT round-4 weak #5)."""

    @staticmethod
    def _run(attention, use_pallas, quantize="int8_static"):
        import warnings as _w

        from openglue_tpu.data.synthetic import SyntheticHomographyPairs
        from openglue_tpu.models.superglue import SuperGlue, SuperGlueConfig
        from openglue_tpu.train.step import superglue_inputs

        model = SuperGlue(
            SuperGlueConfig(
                descriptor_dim=64,
                pe_hidden_layers_sizes=(32,),
                side_info_size=1,
                num_stages=1,
                num_heads=4,
                otp_num_iters=4,
                attention=attention,
                use_pallas=use_pallas,
                quantize=quantize,
            )
        )
        gen = SyntheticHomographyPairs(num_keypoints=64, descriptor_dim=64)
        batch = gen.sample(jax.random.key(0), 1)
        inputs = superglue_inputs(batch, train=False)
        with _w.catch_warnings(record=True) as caught:
            _w.simplefilter("always")
            model.init(jax.random.key(1), **inputs)
        return [w for w in caught if "int8 serving path" in str(w.message)]

    def test_warns_without_pallas(self):
        assert self._run("softmax", use_pallas=False)

    def test_warns_for_non_softmax_attention(self):
        assert self._run("linear", use_pallas=True)

    def test_silent_when_servable(self):
        assert not self._run("softmax", use_pallas=True)


class TestFusedFAVORLayer:
    """FAVOR-relu / FAVOR-softmax through the fused whole-layer kernel
    (ops/pallas/gnn_layer_kernel.py feature-map branch) — completes SURVEY §5
    "all variants in single-chip (Pallas) form"."""

    @staticmethod
    def _setup(dim=128, heads=4, seed=0):
        from openglue_tpu.ops.attention import sample_orthogonal_random_matrix

        w = TestFusedGNNLayer._weights(dim, seed=seed)
        dh = dim // heads
        proj = sample_orthogonal_random_matrix(jax.random.key(100 + seed), 2 * dh, dh)
        return w, proj

    @pytest.mark.parametrize("kind", ["favor_relu", "favor_softmax"])
    def test_matches_xla_reference_with_mask(self, kind):
        from openglue_tpu.ops.pallas import gnn_layer_kernel as glk

        dim, heads = 128, 4
        x_q, x_kv = rand(1, 2, 96, dim), rand(2, 2, 80, dim)
        mask = jnp.arange(80)[None, :] < jnp.asarray([60, 80])[:, None]
        w, proj = self._setup(dim, heads)
        ref = glk.xla_reference_layer(x_q, x_kv, mask, w, heads, False, kind, proj)
        out = glk.fused_attention_propagation(
            x_q, x_kv, mask, w, num_heads=heads, block_q=32,
            attention_kind=kind, projection=proj,
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5)

    @pytest.mark.parametrize("kind", ["favor_relu", "favor_softmax"])
    def test_grads_match_composed(self, kind):
        from openglue_tpu.ops.pallas import gnn_layer_kernel as glk

        dim, heads = 64, 2
        x_q = rand(7, 1, 40, dim)
        x_kv = rand(8, 1, 33, dim)
        w, proj = self._setup(dim, heads, seed=2)

        def loss_kernel(a, b, c):
            out = glk.fused_attention_propagation(
                a, b, None, c, num_heads=heads, block_q=32,
                attention_kind=kind, projection=proj,
            )
            return jnp.sum(out**2)

        def loss_ref(a, b, c):
            out = glk.xla_reference_layer(a, b, None, c, heads, False, kind, proj)
            return jnp.sum(out**2)

        gk = jax.grad(loss_kernel, argnums=(0, 1, 2))(x_q, x_kv, w)
        gr = jax.grad(loss_ref, argnums=(0, 1, 2))(x_q, x_kv, w)
        for a, b in zip(jax.tree_util.tree_leaves(gk), jax.tree_util.tree_leaves(gr)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)

    @pytest.mark.parametrize("kind", ["favor_relu", "favor_softmax"])
    def test_module_fused_matches_composed(self, kind, monkeypatch):
        from openglue_tpu.models.gnn import AttentionalPropagation
        from openglue_tpu.ops.pallas import force_fused_dispatch
        from openglue_tpu.ops.pallas import gnn_layer_kernel as glk

        # force_fused_dispatch bypasses the measured dispatch gates (fused
        # FAVOR-relu only engages above N=1024, FAVOR-softmax routes to the
        # composed path at every size) so the module -> kernel wiring
        # (projection extraction, weight folding) is GENUINELY exercised for
        # both variants rather than silently comparing composed vs composed.
        dim, heads, n = 64, 4, 640
        x_q, x_kv = rand(1, 2, n, dim), rand(2, 2, n, dim)
        kv_mask = jnp.arange(n)[None, :] < jnp.asarray([500, n])[:, None]
        q_mask = jnp.ones((2, n), bool)
        mod = AttentionalPropagation(embed_dim=dim, num_heads=heads, attention=kind)
        variables = mod.init(jax.random.key(0), x_q, x_kv, q_mask, kv_mask)
        ref = mod.apply(variables, x_q, x_kv, q_mask, kv_mask)
        calls = []
        real_fused = glk.fused_attention_propagation
        monkeypatch.setattr(
            glk, "fused_attention_propagation",
            lambda *a, **k: calls.append(k.get("attention_kind")) or real_fused(*a, **k),
        )
        force_fused_dispatch(True)
        try:
            out = AttentionalPropagation(
                embed_dim=dim, num_heads=heads, attention=kind, use_pallas=True
            ).apply(variables, x_q, x_kv, q_mask, kv_mask)
        finally:
            force_fused_dispatch(False)
        assert calls == [kind], "fused kernel path was not taken"
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-5)


class TestFusedMessageKernel:
    """Train-path fused attention half (fused_attention_message): forward vs
    the XLA reference, the FUSED BACKWARD kernel vs XLA autodiff (inputs AND
    all eight projection weights), and the train-mode module wiring."""

    @staticmethod
    def _weights(dim, seed=0, dtype=jnp.float32):
        from openglue_tpu.ops.pallas.gnn_layer_kernel import MessageWeights

        ks = jax.random.split(jax.random.key(seed), 8)
        mk = lambda i, *s: (
            jax.random.normal(ks[i], s, jnp.float32)
            / np.sqrt(s[-2] if len(s) > 1 else 1.0)
        )
        return MessageWeights(
            wq=mk(0, dim, dim).astype(dtype), bq=mk(1, 1, dim),
            wk=mk(2, dim, dim).astype(dtype), bk=mk(3, 1, dim),
            wv=mk(4, dim, dim).astype(dtype), bv=mk(5, 1, dim),
            wo=mk(6, dim, dim).astype(dtype), bo=mk(7, 1, dim),
        )

    def test_forward_matches_xla_reference(self):
        from openglue_tpu.ops.pallas import gnn_layer_kernel as glk

        dim, heads = 128, 4
        x_q, x_kv = rand(1, 2, 96, dim), rand(2, 2, 80, dim)
        mask = jnp.arange(80)[None, :] < jnp.asarray([60, 80])[:, None]
        w = self._weights(dim)
        ref = glk.xla_reference_message(x_q, x_kv, mask, w, heads)
        out = glk.fused_attention_message(x_q, x_kv, mask, w, heads, block_q=32)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5)

    @pytest.mark.parametrize("masked", [False, True])
    def test_fused_backward_matches_xla(self, masked):
        from openglue_tpu.ops.pallas import gnn_layer_kernel as glk

        dim, heads = 64, 4
        n, m = 72, 56  # unaligned + multiple query blocks
        x_q, x_kv = rand(7, 2, n, dim), rand(8, 2, m, dim)
        mask = (
            jnp.arange(m)[None, :] < jnp.asarray([40, m])[:, None] if masked else None
        )
        w = self._weights(dim, seed=2)

        def loss_kernel(a, b, c):
            out = glk.fused_attention_message(a, b, mask, c, heads, block_q=32)
            return jnp.sum(out * jnp.cos(out))  # non-trivial cotangent

        def loss_ref(a, b, c):
            out = glk.xla_reference_message(a, b, mask, c, heads)
            return jnp.sum(out * jnp.cos(out))

        gk = jax.grad(loss_kernel, argnums=(0, 1, 2))(x_q, x_kv, w)
        gr = jax.grad(loss_ref, argnums=(0, 1, 2))(x_q, x_kv, w)
        for a, b in zip(jax.tree_util.tree_leaves(gk), jax.tree_util.tree_leaves(gr)):
            # rtol covers f32 summation-order noise on large weight grads
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-6, atol=3e-4
            )

    def test_fused_backward_large_key_set(self):
        """M > 1024 crosses the backward's VMEM clamp (block 128): at M=2048
        block 256 overran the 16 MB scoped VMEM by 920 KB on TPU (round-5
        online pretraining fault). Grad parity across the boundary."""
        from openglue_tpu.ops.pallas import gnn_layer_kernel as glk

        dim, heads = 32, 2
        n, m = 64, 1040  # just past the clamp boundary
        x_q, x_kv = rand(11, 1, n, dim), rand(12, 1, m, dim)
        mask = jnp.arange(m)[None, :] < jnp.asarray([1000])[:, None]
        w = self._weights(dim, seed=4)

        def loss_kernel(a, b, c):
            return jnp.sum(glk.fused_attention_message(a, b, mask, c, heads))

        def loss_ref(a, b, c):
            return jnp.sum(glk.xla_reference_message(a, b, mask, c, heads))

        gk = jax.grad(loss_kernel, argnums=(0, 1, 2))(x_q, x_kv, w)
        gr = jax.grad(loss_ref, argnums=(0, 1, 2))(x_q, x_kv, w)
        for a, b in zip(jax.tree_util.tree_leaves(gk), jax.tree_util.tree_leaves(gr)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-6, atol=3e-4
            )

    @pytest.mark.parametrize("route", ["message", "train_half"])
    def test_module_train_step_parity(self, route, monkeypatch):
        """AttentionalPropagation with train=True routes through the fused
        message kernel — or, with OPENGLUE_TRAIN_HALF, the round-4 fused
        train-half kernel (use_pallas + forced dispatch): outputs, input and
        param gradients AND the mutated BatchNorm batch_stats must match the
        composed path."""
        from openglue_tpu.models.gnn import AttentionalPropagation
        from openglue_tpu.ops.pallas import force_fused_dispatch

        if route == "train_half":
            monkeypatch.setenv("OPENGLUE_TRAIN_HALF", "1")

        dim, heads, n = 64, 4, 96
        x_q, x_kv = rand(1, 2, n, dim), rand(2, 2, n, dim)
        kv_mask = jnp.arange(n)[None, :] < jnp.asarray([70, n])[:, None]
        q_mask = jnp.arange(n)[None, :] < jnp.asarray([n, 80])[:, None]
        mod = AttentionalPropagation(embed_dim=dim, num_heads=heads)
        variables = mod.init(jax.random.key(0), x_q, x_kv, q_mask, kv_mask, True)
        fused_mod = AttentionalPropagation(
            embed_dim=dim, num_heads=heads, use_pallas=True
        )

        def run(module, v, xq):
            def loss(params, xq):
                out, mut = module.apply(
                    {**v, "params": params}, xq, x_kv, q_mask, kv_mask, True,
                    mutable=["batch_stats"],
                )
                return jnp.sum(out * jnp.cos(out)), mut

            (val, mut), grads = jax.value_and_grad(loss, argnums=(0, 1), has_aux=True)(
                v["params"], xq
            )
            return val, mut, grads

        val_c, mut_c, g_c = run(mod, variables, x_q)
        force_fused_dispatch(True)
        try:
            val_f, mut_f, g_f = run(fused_mod, variables, x_q)
        finally:
            force_fused_dispatch(False)

        np.testing.assert_allclose(float(val_f), float(val_c), rtol=1e-5)
        for a, b in zip(
            jax.tree_util.tree_leaves(mut_f), jax.tree_util.tree_leaves(mut_c)
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
        for a, b in zip(
            jax.tree_util.tree_leaves(g_f), jax.tree_util.tree_leaves(g_c)
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-4)


class TestFusedTrainHalf:
    """Round-4 train-path kernel (fused_train_layer_half): attention message
    + FFN dense_0+ReLU in one kernel, z out. Forward vs the XLA reference and
    the custom_vjp (XLA prologue + fused attention backward) vs autodiff."""

    @pytest.mark.parametrize("use_offset", [False, True])
    def test_forward_matches_xla_reference(self, use_offset):
        from openglue_tpu.ops.pallas import gnn_layer_kernel as glk

        dim, heads = 128, 4
        x_q, x_kv = rand(11, 2, 96, dim), rand(12, 2, 80, dim)
        mask = jnp.arange(80)[None, :] < jnp.asarray([60, 80])[:, None]
        w = TestFusedMessageKernel._weights(dim, seed=3)
        k1, k2 = jax.random.split(jax.random.key(13))
        w1 = jax.random.normal(k1, (2 * dim, 2 * dim)) / np.sqrt(2 * dim)
        b1 = jax.random.normal(k2, (1, 2 * dim)) * 0.1
        ref = glk.xla_reference_train_half(
            x_q, x_kv, mask, w, w1, b1, heads, use_offset
        )
        out = glk.fused_train_layer_half(
            x_q, x_kv, mask, w, w1, b1, heads, use_offset, block_q=32
        )
        assert out.shape == (2, 96, 2 * dim)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5)

    @pytest.mark.parametrize("masked", [False, True])
    def test_backward_matches_xla(self, masked):
        from openglue_tpu.ops.pallas import gnn_layer_kernel as glk

        dim, heads = 64, 4
        n, m = 72, 56  # unaligned + multiple query blocks
        x_q, x_kv = rand(17, 2, n, dim), rand(18, 2, m, dim)
        mask = (
            jnp.arange(m)[None, :] < jnp.asarray([40, m])[:, None] if masked else None
        )
        w = TestFusedMessageKernel._weights(dim, seed=5)
        k1, k2 = jax.random.split(jax.random.key(19))
        w1 = jax.random.normal(k1, (2 * dim, 2 * dim)) / np.sqrt(2 * dim)
        b1 = jax.random.normal(k2, (1, 2 * dim)) * 0.1

        def loss_kernel(a, b, c, d, e):
            z = glk.fused_train_layer_half(a, b, mask, c, d, e, heads, block_q=32)
            return jnp.sum(z * jnp.cos(z))

        def loss_ref(a, b, c, d, e):
            z = glk.xla_reference_train_half(a, b, mask, c, d, e, heads)
            return jnp.sum(z * jnp.cos(z))

        gk = jax.grad(loss_kernel, argnums=(0, 1, 2, 3, 4))(x_q, x_kv, w, w1, b1)
        gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(x_q, x_kv, w, w1, b1)
        for a, b in zip(jax.tree_util.tree_leaves(gk), jax.tree_util.tree_leaves(gr)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-6, atol=3e-4
            )


class TestRematComposesWithPallas:
    """jax.checkpoint around a layer whose Pallas custom_vjp takes the mask as
    a primal argument (regression: a closed-over traced mask escaped the
    checkpoint trace -> UnexpectedTracerError in remat training)."""

    def test_grad_through_remat_pallas_layer(self):
        from openglue_tpu.models.gnn import AttentionalPropagation
        from flax import linen as nn

        dim, heads, n = 64, 4, 512
        x = rand(1, 2, n, dim)
        mask = jnp.arange(n)[None, :] < jnp.asarray([400, n])[:, None]
        mod = AttentionalPropagation(embed_dim=dim, num_heads=heads)
        variables = mod.init(jax.random.key(0), x, x, mask, mask, True)

        remat_mod = nn.remat(AttentionalPropagation, static_argnums=(5,))(
            embed_dim=dim, num_heads=heads, use_pallas=True
        )

        def loss(v, xx):
            out, _ = remat_mod.apply(
                v, xx, xx, mask, mask, True, mutable=["batch_stats"]
            )
            return jnp.sum(out.astype(jnp.float32) ** 2)

        g = jax.jit(jax.grad(loss, argnums=(0, 1)))(variables, x)
        for leaf in jax.tree_util.tree_leaves(g):
            assert np.all(np.isfinite(np.asarray(leaf)))
