import numpy as np
import jax
import jax.numpy as jnp
import pytest

from openglue_tpu.ops import attention as A

from tests.torch_ref import import_reference, reference_available


def _rand(rng, *shape):
    return rng.normal(size=shape).astype(np.float32)


def _to_torch_layout(x):
    """[B,H,N,Dh] -> torch reference layout [B,H,Dh,N]."""
    return np.swapaxes(x, 2, 3)


@pytest.mark.skipif(not reference_available(), reason="reference unavailable")
class TestAgainstTorchReference:
    def setup_method(self):
        import_reference()

    def test_softmax_attention(self):
        import torch
        from models.superglue.attention import softmax_attention as torch_softmax

        rng = np.random.default_rng(0)
        q, k, v = _rand(rng, 2, 4, 10, 16), _rand(rng, 2, 4, 14, 16), _rand(rng, 2, 4, 14, 16)
        ours, attn = A.softmax_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
        theirs, _ = torch_softmax(
            torch.from_numpy(_to_torch_layout(q)),
            torch.from_numpy(_to_torch_layout(k)),
            torch.from_numpy(_to_torch_layout(v)),
        )
        np.testing.assert_allclose(
            np.asarray(ours), _to_torch_layout(theirs.numpy()), rtol=1e-5, atol=1e-5
        )

    def test_linear_attention_elu(self):
        import torch
        from models.superglue.attention import linear_attention_elu as torch_linear

        rng = np.random.default_rng(1)
        q, k, v = _rand(rng, 2, 4, 10, 16), _rand(rng, 2, 4, 14, 16), _rand(rng, 2, 4, 14, 16)
        ours, _ = A.linear_attention_elu(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
        theirs, _ = torch_linear(
            torch.from_numpy(_to_torch_layout(q)),
            torch.from_numpy(_to_torch_layout(k)),
            torch.from_numpy(_to_torch_layout(v)),
        )
        np.testing.assert_allclose(
            np.asarray(ours), _to_torch_layout(theirs.numpy()), rtol=1e-4, atol=1e-5
        )

    def test_favor_relu_single_head(self):
        """The reference FAVOR only works when head_dim == embed_dim (its
        projection is sized on the full embed dim, attention.py:16); compare in
        that regime with an identical projection matrix."""
        import torch
        from models.superglue.attention import GeneralizedFavorAttention

        rng = np.random.default_rng(2)
        d = 32
        q, k, v = _rand(rng, 2, 1, 10, d), _rand(rng, 2, 1, 14, d), _rand(rng, 2, 1, 14, d)

        module = GeneralizedFavorAttention(
            embed_dim=d, kernel_func=torch.nn.ReLU(), num_orthogonal_features=2 * d, eps=1e-8
        )
        projection = module.projection_matrix.numpy()

        with torch.no_grad():
            theirs, _ = module(
                torch.from_numpy(_to_torch_layout(q)),
                torch.from_numpy(_to_torch_layout(k)),
                torch.from_numpy(_to_torch_layout(v)),
            )

        qf = A.favor_features_relu(jnp.asarray(q), jnp.asarray(projection), eps=1e-8)
        kf = A.favor_features_relu(jnp.asarray(k), jnp.asarray(projection), eps=1e-8)
        ours, _ = A.linear_attention(qf, kf, jnp.asarray(v))
        np.testing.assert_allclose(
            np.asarray(ours), _to_torch_layout(theirs.numpy()), rtol=1e-4, atol=1e-5
        )

    def test_favor_softmax_single_head(self):
        import torch
        from models.superglue.attention import SoftmaxFavorAttention

        rng = np.random.default_rng(3)
        d = 32
        q, k, v = _rand(rng, 2, 1, 10, d), _rand(rng, 2, 1, 14, d), _rand(rng, 2, 1, 14, d)

        module = SoftmaxFavorAttention(embed_dim=d, num_orthogonal_features=2 * d, eps=1e-8)
        projection = module.projection_matrix.numpy()
        with torch.no_grad():
            theirs, _ = module(
                torch.from_numpy(_to_torch_layout(q)),
                torch.from_numpy(_to_torch_layout(k)),
                torch.from_numpy(_to_torch_layout(v)),
            )

        qf = A.favor_features_softmax(jnp.asarray(q), jnp.asarray(projection), is_query=True, eps=1e-8)
        kf = A.favor_features_softmax(jnp.asarray(k), jnp.asarray(projection), is_query=False, eps=1e-8)
        ours, _ = A.linear_attention(qf, kf, jnp.asarray(v))
        np.testing.assert_allclose(
            np.asarray(ours), _to_torch_layout(theirs.numpy()), rtol=1e-4, atol=1e-5
        )


class TestMasking:
    def test_masked_softmax_equals_trimmed(self):
        rng = np.random.default_rng(4)
        q = _rand(rng, 2, 4, 10, 16)
        k = _rand(rng, 2, 4, 14, 16)
        v = _rand(rng, 2, 4, 14, 16)
        valid = 9
        mask = np.zeros((2, 14), dtype=bool)
        mask[:, :valid] = True

        masked, _ = A.softmax_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(mask))
        trimmed, _ = A.softmax_attention(jnp.asarray(q), jnp.asarray(k[:, :, :valid]), jnp.asarray(v[:, :, :valid]))
        np.testing.assert_allclose(np.asarray(masked), np.asarray(trimmed), rtol=1e-5, atol=1e-6)

    def test_masked_linear_equals_trimmed(self):
        rng = np.random.default_rng(5)
        q = _rand(rng, 2, 4, 10, 16)
        k = _rand(rng, 2, 4, 14, 16)
        v = _rand(rng, 2, 4, 14, 16)
        valid = 9
        mask = np.zeros((2, 14), dtype=bool)
        mask[:, :valid] = True

        masked, _ = A.linear_attention_elu(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(mask))
        trimmed, _ = A.linear_attention_elu(jnp.asarray(q), jnp.asarray(k[:, :, :valid]), jnp.asarray(v[:, :, :valid]))
        np.testing.assert_allclose(np.asarray(masked), np.asarray(trimmed), rtol=1e-4, atol=1e-5)

    def test_masked_favor_softmax_equals_trimmed(self):
        rng = np.random.default_rng(6)
        d = 16
        q = _rand(rng, 2, 2, 10, d)
        k = _rand(rng, 2, 2, 14, d)
        v = _rand(rng, 2, 2, 14, d)
        proj = np.asarray(A.sample_orthogonal_random_matrix(jax.random.key(0), 2 * d, d))
        valid = 9
        mask = np.zeros((2, 14), dtype=bool)
        mask[:, :valid] = True

        qf = A.favor_features_softmax(jnp.asarray(q), jnp.asarray(proj), is_query=True)
        kf = A.favor_features_softmax(jnp.asarray(k), jnp.asarray(proj), is_query=False, kv_mask=jnp.asarray(mask))
        masked, _ = A.linear_attention(qf, kf, jnp.asarray(v), jnp.asarray(mask))

        kf_t = A.favor_features_softmax(jnp.asarray(k[:, :, :valid]), jnp.asarray(proj), is_query=False)
        trimmed, _ = A.linear_attention(qf, kf_t, jnp.asarray(v[:, :, :valid]))
        np.testing.assert_allclose(np.asarray(masked), np.asarray(trimmed), rtol=1e-4, atol=1e-5)


def test_orthogonal_random_matrix_properties():
    d, k = 32, 64
    proj = np.asarray(A.sample_orthogonal_random_matrix(jax.random.key(1), k, d))
    assert proj.shape == (k, d)
    # Rows within each d-block are orthogonal
    block = proj[:d]
    norms = np.linalg.norm(block, axis=1, keepdims=True)
    gram = (block / norms) @ (block / norms).T
    np.testing.assert_allclose(gram, np.eye(d), atol=1e-5)
    # Norms should look chi(d)-distributed: mean ~ sqrt(d)
    assert abs(np.mean(np.linalg.norm(proj, axis=1)) - np.sqrt(d)) < 2.0


class TestFavorMultiHeadOracles:
    """Multi-head FAVOR correctness against oracles the torch reference
    cannot provide (it crashes for heads > 1, ops/attention.py:14-17):

    * favor_softmax: with many orthogonal features the estimator must
      approximate EXACT softmax attention (the published Performer claim);
    * favor_relu: the O(N) aggregation must equal the dense relu-kernel
      attention matrix computed explicitly.
    """

    def test_favor_softmax_multihead_approximates_exact_softmax(self):
        rng = np.random.default_rng(0)
        B, H, N, M, d = 2, 4, 24, 20, 32
        q = _rand(rng, B, H, N, d) * 0.5
        k = _rand(rng, B, H, M, d) * 0.5
        v = _rand(rng, B, H, M, d)

        ref, _ = A.softmax_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))

        num_features = 8192  # estimator std ~ 1/sqrt(F)
        proj = A.sample_orthogonal_random_matrix(jax.random.key(3), num_features, d)
        qf = A.favor_features_softmax(jnp.asarray(q), proj, is_query=True)
        kf = A.favor_features_softmax(jnp.asarray(k), proj, is_query=False)
        out, _ = A.linear_attention(qf, kf, jnp.asarray(v))

        diff = np.abs(np.asarray(out) - np.asarray(ref))
        assert diff.mean() < 0.02, f"mean deviation {diff.mean()} from exact softmax"
        assert diff.max() < 0.2, f"max deviation {diff.max()} from exact softmax"
        corr = np.corrcoef(np.asarray(out).ravel(), np.asarray(ref).ravel())[0, 1]
        assert corr > 0.995

    def test_favor_relu_multihead_matches_dense_kernel(self):
        rng = np.random.default_rng(1)
        B, H, N, M, d = 2, 4, 16, 18, 32
        q = _rand(rng, B, H, N, d)
        k = _rand(rng, B, H, M, d)
        v = _rand(rng, B, H, M, d)
        mask = np.zeros((B, M), dtype=bool)
        mask[:, :13] = True

        proj = A.sample_orthogonal_random_matrix(jax.random.key(5), 2 * d, d)
        qf = A.favor_features_relu(jnp.asarray(q), proj)
        kf = A.favor_features_relu(jnp.asarray(k), proj)
        out, _ = A.linear_attention(qf, kf, jnp.asarray(v), jnp.asarray(mask))

        # dense oracle: materialize the [N, M] kernel matrix per head
        kf_masked = np.asarray(kf) * mask[:, None, :, None]
        Kmat = np.einsum("bhnf,bhmf->bhnm", np.asarray(qf), kf_masked)
        attn = Kmat / Kmat.sum(axis=-1, keepdims=True)
        ref = np.einsum("bhnm,bhmd->bhnd", attn, np.asarray(v))
        np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)


def test_favor_num_features_flows_through_model():
    """SuperGlueConfig.favor_num_features (the --favor-features sweep axis,
    reference attention.py:99-118 num_features) sizes the drawn projection
    and the model still runs end to end."""
    import jax

    from openglue_tpu.data.synthetic import SyntheticHomographyPairs
    from openglue_tpu.models.superglue import SuperGlue, SuperGlueConfig
    from openglue_tpu.train.step import superglue_inputs

    cfg = SuperGlueConfig(
        descriptor_dim=32, pe_hidden_layers_sizes=(16,), num_stages=1,
        otp_num_iters=4, attention="favor_softmax", favor_num_features=48,
    )
    model = SuperGlue(cfg)
    gen = SyntheticHomographyPairs(num_keypoints=32, descriptor_dim=32)
    batch = gen.sample(jax.random.key(0), 2)
    variables = model.init(jax.random.key(1), **superglue_inputs(batch))
    projections = jax.tree_util.tree_leaves(variables["favor_projections"])
    assert projections and all(p.shape[0] == 48 for p in projections), [
        p.shape for p in projections
    ]
    out = jax.jit(
        lambda v, b: model.apply(v, **superglue_inputs(b, train=False))
    )(variables, batch)
    assert out["scores"].shape == (2, 33, 33)
