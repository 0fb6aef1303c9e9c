import numpy as np
import jax.numpy as jnp
import pytest

from openglue_tpu.ops.sinkhorn import log_optimal_transport, log_sinkhorn

from tests.torch_ref import import_reference, reference_available


def test_log_sinkhorn_matches_reference_torch():
    if not reference_available():
        pytest.skip("reference unavailable")
    import_reference()
    import torch
    from models.superglue.optimal_transport import log_otp_solver

    rng = np.random.default_rng(0)
    B, R, C = 3, 9, 13
    M = rng.normal(size=(B, R, C)).astype(np.float32)
    log_a = rng.normal(size=(B, R)).astype(np.float32)
    log_b = rng.normal(size=(B, C)).astype(np.float32)

    ours = log_sinkhorn(jnp.asarray(log_a), jnp.asarray(log_b), jnp.asarray(M), num_iters=20, reg=1.0)
    theirs = log_otp_solver(
        torch.from_numpy(log_a), torch.from_numpy(log_b), torch.from_numpy(M), num_iters=20, reg=1.0
    ).numpy()
    np.testing.assert_allclose(np.asarray(ours), theirs, rtol=1e-5, atol=1e-5)


def test_unmasked_transport_marginals():
    rng = np.random.default_rng(1)
    B, m, n = 2, 12, 17
    S = jnp.asarray(rng.normal(size=(B, m, n)).astype(np.float32))
    log_P = log_optimal_transport(S, jnp.asarray(1.0), num_iters=100, reg=1.0)
    P = np.exp(np.asarray(log_P))
    # After the final +log(n+m) rescale the total mass is n+m
    np.testing.assert_allclose(P.sum(axis=(1, 2)), n + m, rtol=1e-3)
    # Row marginals: each real keypoint row sums to 1, dustbin row to n.
    # (The solver ends on a column normalization, so rows are approximate.)
    np.testing.assert_allclose(P[:, :m].sum(axis=2), 1.0, rtol=5e-2)
    np.testing.assert_allclose(P[:, :, :n].sum(axis=1), 1.0, rtol=1e-5)
    np.testing.assert_allclose(P[:, :, n].sum(axis=1), m, rtol=5e-2)


def test_masked_equals_trimmed():
    """Masked Sinkhorn over padded inputs == unmasked over the valid sub-problem."""
    rng = np.random.default_rng(2)
    B, m, n = 2, 16, 20
    valid_m, valid_n = 10, 13
    S_full = rng.normal(size=(B, m, n)).astype(np.float32)

    mask0 = np.zeros((B, m), dtype=bool)
    mask0[:, :valid_m] = True
    mask1 = np.zeros((B, n), dtype=bool)
    mask1[:, :valid_n] = True

    log_P_masked = log_optimal_transport(
        jnp.asarray(S_full), jnp.asarray(1.0), num_iters=50, reg=1.0,
        mask0=jnp.asarray(mask0), mask1=jnp.asarray(mask1),
    )
    log_P_trim = log_optimal_transport(
        jnp.asarray(S_full[:, :valid_m, :valid_n]), jnp.asarray(1.0), num_iters=50, reg=1.0
    )

    got = np.asarray(log_P_masked)
    want = np.asarray(log_P_trim)
    # valid block
    np.testing.assert_allclose(got[:, :valid_m, :valid_n], want[:, :valid_m, :valid_n], rtol=1e-4, atol=1e-4)
    # dustbin row/col over valid entries
    np.testing.assert_allclose(got[:, m, :valid_n], want[:, valid_m, :valid_n], rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(got[:, :valid_m, n], want[:, :valid_m, valid_n], rtol=1e-4, atol=1e-4)
    # padded entries carry (numerically) zero probability
    assert np.exp(got[:, valid_m:m, :]).max() < 1e-20
    assert np.exp(got[:, :, valid_n:n]).max() < 1e-20


def test_gradients_flow():
    import jax

    rng = np.random.default_rng(3)
    S = jnp.asarray(rng.normal(size=(1, 8, 8)).astype(np.float32))

    def loss(S):
        return -log_optimal_transport(S, jnp.asarray(1.0), num_iters=20)[0, 0, 0]

    g = jax.grad(loss)(S)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).max() > 0
