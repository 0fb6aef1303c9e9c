"""Numerical-safety utility tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import checkify

from openglue_tpu.debugging import assert_all_finite, checked, find_nonfinite


def test_checked_catches_nan():
    def bad(x):
        return jnp.log(x)  # nan for negative input

    fn = checked(jax.jit(bad))
    assert np.isclose(float(fn(jnp.asarray(1.0))), 0.0)
    with pytest.raises(Exception, match="nan"):
        fn(jnp.asarray(-1.0))


def test_assert_all_finite_inside_checkify():
    def fn(tree):
        assert_all_finite(tree, "tree")
        return tree["a"] * 2

    wrapped = checked(fn, errors=checkify.user_checks)
    out = wrapped({"a": jnp.ones(3)})
    np.testing.assert_allclose(np.asarray(out), 2.0)
    with pytest.raises(Exception, match="non-finite"):
        wrapped({"a": jnp.asarray([1.0, jnp.nan, 2.0])})


def test_find_nonfinite_report():
    tree = {
        "good": jnp.ones(4),
        "bad": jnp.asarray([1.0, jnp.nan, jnp.inf, 2.0]),
        "ints": jnp.arange(3),
    }
    report = find_nonfinite(tree)
    assert list(report) == ["['bad']"]
    assert report["['bad']"] == {"nan": 1, "inf": 1, "size": 4}


def test_checked_train_step_runs_clean():
    from openglue_tpu.data.synthetic import SyntheticHomographyPairs
    from openglue_tpu.models.superglue import SuperGlue, SuperGlueConfig
    from openglue_tpu.train import LossConfig, create_train_state, make_train_step
    from openglue_tpu.train.step import superglue_inputs

    cfg = SuperGlueConfig(descriptor_dim=32, pe_hidden_layers_sizes=(16,),
                          num_stages=1, otp_num_iters=4)
    model = SuperGlue(cfg)
    gen = SyntheticHomographyPairs(num_keypoints=32, descriptor_dim=32)
    batch = gen.sample(jax.random.key(0), 2)
    variables = model.init(jax.random.key(1), **superglue_inputs(batch))
    state = create_train_state(model.apply, variables)
    step = checked(make_train_step(LossConfig(positive_threshold=3.0)),
                   errors=checkify.float_checks)
    state2, metrics = step(state, batch)
    assert np.isfinite(float(metrics["total_loss"]))
