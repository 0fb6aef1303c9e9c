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
