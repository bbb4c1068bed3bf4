"""Finite-difference checker tests.

Port of the reference's CentralDifference.Gradient/Hessian checks
(reference: src/test/verify.cc:213-246): all four accuracy orders agree with
analytic derivatives, and the checkers validate autodiff output."""

import jax.numpy as jnp
import numpy as np
import pytest

from cppnumericalsolvers_tpu import Objective
from cppnumericalsolvers_tpu.models import rosenbrock
from cppnumericalsolvers_tpu.utils import (
    compute_finite_gradient,
    compute_finite_hessian,
    is_gradient_correct,
    is_hessian_correct,
)

X0 = jnp.array([1.3, -0.7], dtype=jnp.float64)


@pytest.mark.parametrize("accuracy", [0, 1, 2, 3])
def test_finite_gradient_matches_analytic(accuracy):
    obj = rosenbrock()
    expected = np.asarray(obj.gradient(X0))
    actual = np.asarray(compute_finite_gradient(obj.fn, X0, accuracy))
    np.testing.assert_allclose(actual, expected, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("accuracy", [0, 1])
def test_finite_hessian_matches_analytic(accuracy):
    obj = rosenbrock()
    expected = np.asarray(obj.hessian(X0))
    actual = np.asarray(compute_finite_hessian(obj.fn, X0, accuracy))
    np.testing.assert_allclose(actual, expected, rtol=1e-2, atol=1e-2)


def test_is_gradient_correct_accepts_autodiff():
    assert is_gradient_correct(rosenbrock(), X0)


def test_is_hessian_correct_accepts_autodiff():
    assert is_hessian_correct(rosenbrock(), X0)


def test_is_gradient_correct_rejects_wrong_gradient():
    # An objective lying about its gradient via custom "mode" mismatch: we
    # emulate the reference's negative check by comparing a wrong analytic
    # gradient against the finite difference of a different function.
    wrong = Objective(lambda x: jnp.sum(x**2), mode="first")
    fd = compute_finite_gradient(lambda x: jnp.sum(x**3), X0, 3)
    analytic = wrong.gradient(X0)
    scale = jnp.maximum(jnp.maximum(jnp.abs(fd), jnp.abs(analytic)), 1.0)
    assert not bool(jnp.all(jnp.abs(fd - analytic) <= 1e-2 * scale))
