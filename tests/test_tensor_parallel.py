"""Tensor-parallel tests: TP param shardings preserve the forward exactly and
actually shard the attention/FFN weights over the mesh."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from openglue_tpu.data.synthetic import SyntheticHomographyPairs
from openglue_tpu.models.superglue import SuperGlue, SuperGlueConfig
from openglue_tpu.parallel import make_mesh
from openglue_tpu.parallel.tensor_parallel import matcher_param_pspecs, shard_params_tp
from openglue_tpu.train.step import superglue_inputs


def build():
    cfg = SuperGlueConfig(
        descriptor_dim=64, pe_hidden_layers_sizes=(32,), num_stages=2,
        num_heads=4, otp_num_iters=8, residual=True,
    )
    model = SuperGlue(cfg)
    gen = SyntheticHomographyPairs(num_keypoints=64, descriptor_dim=64)
    batch = gen.sample(jax.random.key(0), 2)
    variables = model.init(jax.random.key(1), **superglue_inputs(batch))
    return model, variables, batch


def test_pspecs_shapes_and_rules():
    model, variables, _ = build()
    specs = matcher_param_pspecs(variables["params"])
    flat = dict(
        (jax.tree_util.keystr(k), v)
        for k, v in jax.tree_util.tree_flatten_with_path(specs)[0]
    )
    qk = next(k for k in flat if "q_proj" in k and "kernel" in k)
    assert flat[qk] == P(None, "model")
    ok = next(k for k in flat if "out_proj" in k and "kernel" in k)
    assert flat[ok] == P("model", None)
    d0 = next(k for k in flat if "ffn" in k and "dense_0" in k and "kernel" in k)
    assert flat[d0] == P(None, "model")
    d1 = next(k for k in flat if "ffn" in k and "dense_1" in k and "kernel" in k)
    assert flat[d1] == P("model", None)
    pe = next(k for k in flat if "positional_encoding" in k and "kernel" in k)
    assert flat[pe] == P()


def test_tp_forward_matches_replicated():
    model, variables, batch = build()
    ref = jax.jit(lambda v, b: model.apply(v, **superglue_inputs(b))["scores"])(
        variables, batch
    )

    mesh = make_mesh({"model": 8})
    tp_params = shard_params_tp(variables["params"], mesh)
    tp_variables = {**variables, "params": tp_params}
    out = jax.jit(lambda v, b: model.apply(v, **superglue_inputs(b))["scores"])(
        tp_variables, batch
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
    # weights really sharded
    leaf = tp_params["attention_gnn"]["self_0"]["mha"]["q_proj"]["kernel"]
    assert len(leaf.sharding.device_set) == 8
