"""Unit tests for the cstep trial-interval update.

Port of the reference's scalar-kernel test layer
(reference: src/test/cstep_test.cc) — each interpolation case validated
against closed-form quadratic/cubic models, the [stpmin, stpmax] clamp, the
0.66 safeguard, and rejection of non-descent input.
"""

import jax.numpy as jnp
import pytest

from cppnumericalsolvers_tpu.linesearch import cstep


def call_cstep(stx, fx, dx, sty, fy, dy, stp, fp, dp, brackt, stpmin, stpmax):
    return cstep(
        jnp.float64(stx), jnp.float64(fx), jnp.float64(dx),
        jnp.float64(sty), jnp.float64(fy), jnp.float64(dy),
        jnp.float64(stp), jnp.float64(fp), jnp.float64(dp),
        jnp.bool_(brackt), jnp.float64(stpmin), jnp.float64(stpmax),
    )


class TestCase1:
    def test_quadratic_model_recovers_minimizer(self):
        # phi(a) = 0.5 a^2 - a, minimum at a*=1; phi(0)=0, phi'(0)=-1,
        # phi(3)=1.5, phi'(3)=+2 (cstep_test.cc:54-72).
        r = call_cstep(0.0, 0.0, -1.0, 0.0, 0.0, 0.0, 3.0, 1.5, 2.0,
                       False, 0.0, 10.0)
        assert int(r.info) == 1
        assert bool(r.brackt)
        assert abs(float(r.stp) - 1.0) < 1e-12
        assert float(r.stx) == 0.0
        assert float(r.sty) == 3.0
        assert float(r.fy) == 1.5
        assert float(r.dy) == 2.0


class TestCase2:
    def test_derivative_sign_flip_brackets_and_hits_minimizer(self):
        # phi(a) = 0.5 (a-2)^2, a*=2 (cstep_test.cc:81-100).
        r = call_cstep(0.0, 2.0, -2.0, 0.0, 0.0, 0.0, 3.0, 0.5, 1.0,
                       False, 0.0, 10.0)
        assert int(r.info) == 2
        assert bool(r.brackt)
        assert abs(float(r.stp) - 2.0) < 1e-12
        assert float(r.stx) == 3.0
        assert float(r.fx) == 0.5
        assert float(r.dx) == 1.0
        assert float(r.sty) == 0.0
        assert float(r.fy) == 2.0
        assert float(r.dy) == -2.0


class TestCase3:
    def test_not_bracketed_advances_toward_minimizer(self):
        # phi(a) = 0.5 (a-4)^2, a*=4 (cstep_test.cc:109-127).
        r = call_cstep(0.0, 8.0, -4.0, 0.0, 0.0, 0.0, 1.0, 4.5, -3.0,
                       False, 0.0, 20.0)
        assert int(r.info) == 3
        assert not bool(r.brackt)
        assert float(r.stp) > 1.0
        assert float(r.stp) <= 20.0
        assert float(r.stx) == 1.0
        assert float(r.fx) == 4.5
        assert float(r.dx) == -3.0


class TestCase4:
    def test_not_bracketed_extrapolates_to_max(self):
        # phi(a) = 5 - a - 0.01 a^3 (cstep_test.cc:138-151).
        r = call_cstep(0.0, 5.0, -1.0, 0.0, 0.0, 0.0, 1.0, 3.99, -1.03,
                       False, 0.0, 50.0)
        assert int(r.info) == 4
        assert not bool(r.brackt)
        assert float(r.stp) == 50.0


class TestClamp:
    def test_result_always_inside_stpmin_stpmax(self):
        r = call_cstep(0.0, 0.0, -1.0, 0.0, 0.0, 0.0, 3.0, 1.5, 2.0,
                       False, 0.1, 0.75)
        assert float(r.stp) >= 0.1
        assert float(r.stp) <= 0.75


class TestSafeguard:
    def test_keeps_new_trial_inside_inner_two_thirds(self):
        # Bracketed Case-1 input whose raw cubic suggestion sits near sty;
        # the 0.66 rule must cap it (cstep_test.cc:175-191).
        r = call_cstep(0.0, 0.0, -1.0, 1.0, 0.5, 1.5, 0.99, 0.49, 1.4,
                       True, 0.0, 2.0)
        assert int(r.info) == 1
        assert bool(r.brackt)
        assert float(r.stp) >= 0.0
        assert float(r.stp) <= 0.66 + 1e-12


class TestInvariants:
    def test_rejects_non_descent_input(self):
        # dx * (stp - stx) > 0 must be flagged: info == 0 signals the C++
        # early error return (cstep_test.cc:196-204).
        r = call_cstep(0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 1.0, 0.5, 0.5,
                       False, 0.0, 10.0)
        assert int(r.info) == 0
        # State must be untouched on the error path.
        assert float(r.stp) == 1.0
        assert float(r.stx) == 0.0
