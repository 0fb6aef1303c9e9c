"""Golden-parity tests: full SuperGlue forward vs the PyTorch reference with
converted weights (SURVEY.md §4 / BASELINE.md 'per-layer activations allclose')."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from openglue_tpu.compat.torch_weights import superglue_params_from_torch
from openglue_tpu.models.matching import decode_matches
from openglue_tpu.models.superglue import SuperGlue, SuperGlueConfig

from tests.torch_ref import import_reference, reference_available

pytestmark = pytest.mark.skipif(not reference_available(), reason="reference unavailable")

D = 64


def _torch_config(attention="softmax", residual=True, encoder="FeedForwardNet"):
    return {
        "descriptor_dim": D,
        "positional_encoding": {
            "output_size": D,
            "side_info_size": 3,
            "encoder_name": encoder,
            "hidden_layers_sizes": [32, 64],
        },
        "attention_gnn": {"num_stages": 3, "embed_dim": D, "num_heads": 4, "attention": attention},
        "dustbin_score_init": 1.0,
        "otp": {"num_iters": 20, "reg": 1.0},
        "residual": residual,
    }


def _jax_config(attention="softmax", residual=True, encoder="FeedForwardNet"):
    return SuperGlueConfig(
        descriptor_dim=D,
        pe_hidden_layers_sizes=(32, 64),
        pe_encoder_name=encoder,
        side_info_size=3,
        num_stages=3,
        num_heads=4,
        attention=attention,
        dustbin_score_init=1.0,
        otp_num_iters=20,
        otp_reg=1.0,
        residual=residual,
    )


def _make_inputs(seed=0, batch=2, n=24, m=31):
    rng = np.random.default_rng(seed)
    return {
        "kpts0": (rng.random((batch, n, 2)) * [300, 200]).astype(np.float32),
        "kpts1": (rng.random((batch, m, 2)) * [300, 200]).astype(np.float32),
        "desc0": rng.normal(size=(batch, n, D)).astype(np.float32),
        "desc1": rng.normal(size=(batch, m, D)).astype(np.float32),
        "side0": rng.random((batch, n, 3)).astype(np.float32),
        "side1": rng.random((batch, m, 3)).astype(np.float32),
    }


def _torch_forward(torch_model, inputs, train=False):
    import torch

    data = {
        "keypoints0": torch.from_numpy(inputs["kpts0"]),
        "keypoints1": torch.from_numpy(inputs["kpts1"]),
        "local_descriptors0": torch.from_numpy(inputs["desc0"]),
        "local_descriptors1": torch.from_numpy(inputs["desc1"]),
        "side_info0": torch.from_numpy(inputs["side0"]),
        "side_info1": torch.from_numpy(inputs["side1"]),
        "image0_size": [300, 200],
        "image1_size": [300, 200],
    }
    torch_model.train(train)
    with torch.no_grad():
        out = torch_model(data)
    return {k: v.numpy() for k, v in out.items()}


def _jax_forward(config, variables, inputs, train=False):
    model = SuperGlue(config)
    size = jnp.asarray([300, 200], jnp.float32)
    kwargs = dict(
        kpts0=jnp.asarray(inputs["kpts0"]),
        kpts1=jnp.asarray(inputs["kpts1"]),
        desc0=jnp.asarray(inputs["desc0"]),
        desc1=jnp.asarray(inputs["desc1"]),
        side_info0=jnp.asarray(inputs["side0"]),
        side_info1=jnp.asarray(inputs["side1"]),
        image_size0=size,
        image_size1=size,
        train=train,
    )
    if train:
        out, _ = model.apply(variables, **kwargs, mutable=["batch_stats"])
    else:
        out = model.apply(variables, **kwargs)
    return {k: np.asarray(v) for k, v in out.items()}


def _build_pair(attention="softmax", residual=True, encoder="FeedForwardNet", seed=0):
    import_reference()
    import torch
    from models.superglue.superglue import SuperGlue as TorchSuperGlue

    torch.manual_seed(seed)
    torch_model = TorchSuperGlue(_torch_config(attention, residual, encoder)).eval()
    config = _jax_config(attention, residual, encoder)
    variables = superglue_params_from_torch(torch_model.state_dict(), config)
    variables = jax.tree.map(jnp.asarray, variables)
    return torch_model, config, variables


@pytest.mark.parametrize("attention", ["softmax", "linear"])
def test_eval_forward_parity(attention):
    torch_model, config, variables = _build_pair(attention=attention)
    inputs = _make_inputs()
    theirs = _torch_forward(torch_model, inputs, train=False)
    ours = _jax_forward(config, variables, inputs, train=False)

    # torch context descriptors are [B, D, N]; ours are [B, N, D]
    np.testing.assert_allclose(
        ours["context_descriptors0"], theirs["context_descriptors0"].transpose(0, 2, 1),
        rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_allclose(
        ours["context_descriptors1"], theirs["context_descriptors1"].transpose(0, 2, 1),
        rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_allclose(ours["scores"], theirs["scores"], rtol=1e-4, atol=1e-4)


def test_eval_forward_parity_siren_no_residual():
    torch_model, config, variables = _build_pair(residual=False, encoder="FeedForwardNetSiren")
    inputs = _make_inputs(seed=5)
    theirs = _torch_forward(torch_model, inputs, train=False)
    ours = _jax_forward(config, variables, inputs, train=False)
    np.testing.assert_allclose(ours["scores"], theirs["scores"], rtol=1e-4, atol=1e-4)


def test_train_mode_forward_parity():
    """Training mode uses batch statistics in the BatchNorms — parity of the
    normalized activations (running-stat update rules differ only in
    biased/unbiased bookkeeping, checked separately)."""
    torch_model, config, variables = _build_pair(seed=3)
    inputs = _make_inputs(seed=7)
    theirs = _torch_forward(torch_model, inputs, train=True)
    ours = _jax_forward(config, variables, inputs, train=True)
    np.testing.assert_allclose(ours["scores"], theirs["scores"], rtol=1e-4, atol=1e-4)


def test_match_decode_parity():
    """decode_matches vs the reference's mutual-NN decode (matching_module.py:149-187)."""
    import torch
    from utils.misc import arange_like

    torch_model, config, variables = _build_pair(seed=11)
    inputs = _make_inputs(seed=11)
    ours_scores = _jax_forward(config, variables, inputs)["scores"]

    decoded = decode_matches(jnp.asarray(ours_scores), match_threshold=0.2)

    scores = torch.from_numpy(ours_scores)
    max0, max1 = scores[:, :-1, :-1].max(2), scores[:, :-1, :-1].max(1)
    indices0, indices1 = max0.indices, max1.indices
    mutual0 = arange_like(indices0, 1)[None] == indices1.gather(1, indices0)
    zero = scores.new_tensor(0)
    mscores0 = torch.where(mutual0, max0.values.exp(), zero)
    valid0 = mutual0 & (mscores0 > 0.2)
    ref_matches0 = torch.where(valid0, indices0, indices0.new_tensor(-1))

    np.testing.assert_array_equal(np.asarray(decoded["matches0"]), ref_matches0.numpy())
    np.testing.assert_allclose(
        np.asarray(decoded["matching_scores0"]), mscores0.numpy(), rtol=1e-5, atol=1e-6
    )


def test_masked_forward_equals_trimmed():
    """The masked path on padded inputs must reproduce the unpadded forward —
    this is the TPU static-shape guarantee the reference lacks."""
    _, config, variables = _build_pair(seed=13)
    inputs = _make_inputs(seed=13, n=24, m=31)

    pad_n, pad_m = 8, 5
    padded = {
        "kpts0": np.pad(inputs["kpts0"], ((0, 0), (0, pad_n), (0, 0))),
        "kpts1": np.pad(inputs["kpts1"], ((0, 0), (0, pad_m), (0, 0))),
        "desc0": np.pad(inputs["desc0"], ((0, 0), (0, pad_n), (0, 0))),
        "desc1": np.pad(inputs["desc1"], ((0, 0), (0, pad_m), (0, 0))),
        "side0": np.pad(inputs["side0"], ((0, 0), (0, pad_n), (0, 0))),
        "side1": np.pad(inputs["side1"], ((0, 0), (0, pad_m), (0, 0))),
    }
    mask0 = np.zeros((2, 24 + pad_n), dtype=bool)
    mask0[:, :24] = True
    mask1 = np.zeros((2, 31 + pad_m), dtype=bool)
    mask1[:, :31] = True

    model = SuperGlue(config)
    size = jnp.asarray([300, 200], jnp.float32)

    def forward(ins, m0=None, m1=None):
        return model.apply(
            variables,
            kpts0=jnp.asarray(ins["kpts0"]),
            kpts1=jnp.asarray(ins["kpts1"]),
            desc0=jnp.asarray(ins["desc0"]),
            desc1=jnp.asarray(ins["desc1"]),
            side_info0=jnp.asarray(ins["side0"]),
            side_info1=jnp.asarray(ins["side1"]),
            image_size0=size,
            image_size1=size,
            mask0=m0,
            mask1=m1,
        )

    plain = forward(inputs)
    masked = forward(padded, jnp.asarray(mask0), jnp.asarray(mask1))

    np.testing.assert_allclose(
        np.asarray(masked["context_descriptors0"])[:, :24],
        np.asarray(plain["context_descriptors0"]),
        rtol=1e-4, atol=1e-5,
    )
    got = np.asarray(masked["scores"])
    want = np.asarray(plain["scores"])
    np.testing.assert_allclose(got[:, :24, :31], want[:, :24, :31], rtol=1e-3, atol=1e-4)
    # dustbin row/col live at the END of the padded matrix
    np.testing.assert_allclose(got[:, -1, :31], want[:, -1, :31], rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(got[:, :24, -1], want[:, :24, -1], rtol=1e-3, atol=1e-4)


def test_per_layer_activation_parity():
    """Per-layer allclose (BASELINE.md target): PE output and every GNN
    self/cross layer output captured via torch hooks vs flax
    capture_intermediates. Torch layout is [B, D, N]; ours [B, N, D]."""
    import torch

    torch_model, config, variables = _build_pair()
    inputs = _make_inputs()

    captured = {}

    def hook(name):
        def fn(_module, _inputs, output):
            captured[name] = output
        return fn

    torch_model.positional_encoding.register_forward_hook(hook("pe"))
    for i, layer in enumerate(torch_model.attention_gnn.layers):
        layer.register_forward_hook(hook(f"layer_{i}"))
    _torch_forward(torch_model, inputs)

    model = SuperGlue(config)
    size = jnp.asarray([300, 200], jnp.float32)
    _, state = model.apply(
        variables,
        kpts0=jnp.asarray(inputs["kpts0"]),
        kpts1=jnp.asarray(inputs["kpts1"]),
        desc0=jnp.asarray(inputs["desc0"]),
        desc1=jnp.asarray(inputs["desc1"]),
        side_info0=jnp.asarray(inputs["side0"]),
        side_info1=jnp.asarray(inputs["side1"]),
        image_size0=size,
        image_size1=size,
        mutable=["intermediates"],
        capture_intermediates=True,
    )
    inter = state["intermediates"]

    # positional encoding (torch [B, D, N]); the torch hook retains only the
    # last call, which is image1's — compare that one
    pe_calls = inter["positional_encoding"]["__call__"]
    np.testing.assert_allclose(
        np.asarray(pe_calls[1]),
        captured["pe"].numpy().transpose(0, 2, 1),
        atol=1e-5,
    )

    gnn = inter["attention_gnn"]
    for stage in range(config.num_stages):
        for offset, kind in ((0, "self"), (1, "cross")):
            torch_out = captured[f"layer_{2 * stage + offset}"]
            ours_calls = gnn[f"{kind}_{stage}"]["__call__"]
            for img in (0, 1):
                np.testing.assert_allclose(
                    np.asarray(ours_calls[img]),
                    torch_out[img].numpy().transpose(0, 2, 1),
                    atol=5e-4,
                    err_msg=f"{kind}_{stage} image{img}",
                )


def test_chain_dtype_bf16_close_to_f32_chain():
    """chain_dtype=bfloat16 (GNN residual chain carried in bf16 — halves the
    per-layer HBM traffic on TPU) must stay close to the f32-chain forward
    and keep the transport-mass invariant."""
    import dataclasses

    _, config, variables = _build_pair(seed=21)
    inputs = _make_inputs(seed=21)

    ref = _jax_forward(config, variables, inputs)
    bf = _jax_forward(
        dataclasses.replace(config, chain_dtype=jnp.bfloat16), variables, inputs
    )

    # log-assignment scores drift by bf16 rounding accumulated over the chain
    np.testing.assert_allclose(bf["scores"], ref["scores"], atol=0.15)
    mass = np.exp(bf["scores"]).sum(axis=(1, 2))
    n_plus_m = inputs["kpts0"].shape[1] + inputs["kpts1"].shape[1]
    np.testing.assert_allclose(mass, n_plus_m, rtol=1e-3)
    # decoded matches agree (the decode thresholds are far from bf16 noise)
    ref_m = decode_matches(jnp.asarray(ref["scores"]))
    bf_m = decode_matches(jnp.asarray(bf["scores"]))
    agree = np.mean(np.asarray(ref_m["matches0"]) == np.asarray(bf_m["matches0"]))
    assert agree > 0.95, f"match agreement {agree}"
