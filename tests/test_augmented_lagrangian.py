"""Augmented-Lagrangian suite: penalty helpers, composite assembly, KKT
recovery, penalty schedule, and non-convex escape discipline.

Port of the reference's layered constrained-solver tests
(reference: src/test/augmented_lagrangian_test.cc).  Named tolerances only
(":51-74): no test writes a bare numeric literal."""

import math

import jax.numpy as jnp
import pytest

from cppnumericalsolvers_tpu import (
    ConstrainedProblem,
    MultiplierState,
    Objective,
    Status,
    augmented_lagrangian_value,
)
from cppnumericalsolvers_tpu.core.penalty import (
    quadratic_equality_penalty,
    quadratic_inequality_penalty_ge,
    quadratic_inequality_penalty_lt,
)
from cppnumericalsolvers_tpu.solvers import AugmentedLagrangian, Lbfgs, Lbfgsb

# Named tolerances (augmented_lagrangian_test.cc:51-74).
PENALTY_EVALUATION_TOLERANCE = 1e-12
KKT_PRIMAL_TOLERANCE = 1e-3
KKT_DUAL_TOLERANCE = 1e-2
FEASIBILITY_TOLERANCE = 1e-5


def linear_1d(a, b):
    """f(x) = a + b*x[0] (the Linear1D fixture, :78-95)."""
    return Objective(lambda x: a + b * x[0], mode="first")


def vec1(v):
    return jnp.array([v], dtype=jnp.float64)


def vec2(a, b):
    return jnp.array([a, b], dtype=jnp.float64)


half_squared_norm = Objective(lambda x: 0.5 * jnp.sum(x * x), mode="first")


def x0_minus_target(t):
    return Objective(lambda x: x[0] - t, mode="first")


# =========================================================================
# Section A: penalty helpers vs closed form (:279-374)
# =========================================================================


class TestQuadraticEqualityPenalty:
    def test_zero_at_feasible_point(self):
        # c(x) = x0 - 2 => penalty 0.5 c^2 = 0 at x0 = 2.
        p = quadratic_equality_penalty(linear_1d(-2.0, 1.0))
        assert float(p.fn(vec1(2.0))) == pytest.approx(
            0.0, abs=PENALTY_EVALUATION_TOLERANCE
        )

    def test_symmetric_in_residual_sign(self):
        p = quadratic_equality_penalty(linear_1d(-2.0, 1.0))
        # residual +3 and -3 both give 4.5.
        assert float(p.fn(vec1(5.0))) == pytest.approx(
            4.5, abs=PENALTY_EVALUATION_TOLERANCE
        )
        assert float(p.fn(vec1(-1.0))) == pytest.approx(
            4.5, abs=PENALTY_EVALUATION_TOLERANCE
        )

    def test_gradient_matches_chain_rule(self):
        # d/dx 0.5 (x-2)^2 = (x-2); at x=5: value 4.5, grad 3.
        p = quadratic_equality_penalty(linear_1d(-2.0, 1.0))
        value, grad = p.value_and_grad(vec1(5.0))
        assert float(value) == pytest.approx(4.5, abs=PENALTY_EVALUATION_TOLERANCE)
        assert float(grad[0]) == pytest.approx(3.0, abs=PENALTY_EVALUATION_TOLERANCE)


class TestQuadraticInequalityPenaltyGe:
    def test_zero_when_constraint_satisfied(self):
        p = quadratic_inequality_penalty_ge(linear_1d(0.0, 1.0))
        assert float(p.fn(vec1(0.0))) == pytest.approx(
            0.0, abs=PENALTY_EVALUATION_TOLERANCE
        )
        assert float(p.fn(vec1(5.0))) == pytest.approx(
            0.0, abs=PENALTY_EVALUATION_TOLERANCE
        )

    def test_fires_on_negative_residual(self):
        p = quadratic_inequality_penalty_ge(linear_1d(0.0, 1.0))
        assert float(p.fn(vec1(-3.0))) == pytest.approx(
            4.5, abs=PENALTY_EVALUATION_TOLERANCE
        )

    def test_gradient_zero_when_satisfied(self):
        p = quadratic_inequality_penalty_ge(linear_1d(0.0, 1.0))
        value, grad = p.value_and_grad(vec1(5.0))
        assert float(value) == pytest.approx(0.0, abs=PENALTY_EVALUATION_TOLERANCE)
        assert float(grad[0]) == pytest.approx(0.0, abs=PENALTY_EVALUATION_TOLERANCE)

    def test_gradient_matches_chain_rule_on_violation(self):
        # 0.5 min(0, x)^2 at x=-3: value 4.5, grad = x = -3.
        p = quadratic_inequality_penalty_ge(linear_1d(0.0, 1.0))
        value, grad = p.value_and_grad(vec1(-3.0))
        assert float(value) == pytest.approx(4.5, abs=PENALTY_EVALUATION_TOLERANCE)
        assert float(grad[0]) == pytest.approx(
            -3.0, abs=PENALTY_EVALUATION_TOLERANCE
        )


class TestQuadraticInequalityPenaltyLt:
    def test_zero_when_c_nonpositive(self):
        p = quadratic_inequality_penalty_lt(linear_1d(0.0, 1.0))
        assert float(p.fn(vec1(-5.0))) == pytest.approx(
            0.0, abs=PENALTY_EVALUATION_TOLERANCE
        )
        assert float(p.fn(vec1(0.0))) == pytest.approx(
            0.0, abs=PENALTY_EVALUATION_TOLERANCE
        )

    def test_fires_on_positive_residual(self):
        p = quadratic_inequality_penalty_lt(linear_1d(0.0, 1.0))
        assert float(p.fn(vec1(3.0))) == pytest.approx(
            4.5, abs=PENALTY_EVALUATION_TOLERANCE
        )


# =========================================================================
# Section B: composite assembly (:376-475)
# =========================================================================


class TestToAugmentedLagrangian:
    def test_equality_only_matches_closed_form(self):
        # L = 0.5|x|^2 + lambda c + 0.5 rho c^2 with lambda=2, rho=3 at
        # x=(3,4), c=2: 12.5 + 4 + 6 = 22.5 (:397-414).
        problem = ConstrainedProblem(
            half_squared_norm, (x0_minus_target(1.0),)
        )
        mult = MultiplierState(
            equality=jnp.array([2.0]), inequality=jnp.zeros((0,))
        )
        value = augmented_lagrangian_value(problem, vec2(3.0, 4.0), mult, 3.0)
        assert float(value) == pytest.approx(
            22.5, abs=PENALTY_EVALUATION_TOLERANCE
        )

    def test_inequality_phr_on_inactive_side(self):
        # mu=7, rho=4, c=2.5 (satisfied): PHR = (1/8)(0 - 49) = -6.125;
        # L = 4.5 - 6.125 = -1.625 (:431-448).
        problem = ConstrainedProblem(
            half_squared_norm, (), (x0_minus_target(0.5),)
        )
        mult = MultiplierState(
            equality=jnp.zeros((0,)), inequality=jnp.array([7.0])
        )
        value = augmented_lagrangian_value(problem, vec2(3.0, 0.0), mult, 4.0)
        assert float(value) == pytest.approx(
            -1.625, abs=PENALTY_EVALUATION_TOLERANCE
        )

    def test_inequality_phr_on_active_side(self):
        # x=(0,0): c=-0.5, mu - rho c = 9: PHR = (1/8)(81-49) = 4 (:459-475).
        problem = ConstrainedProblem(
            half_squared_norm, (), (x0_minus_target(0.5),)
        )
        mult = MultiplierState(
            equality=jnp.zeros((0,)), inequality=jnp.array([7.0])
        )
        value = augmented_lagrangian_value(problem, vec2(0.0, 0.0), mult, 4.0)
        assert float(value) == pytest.approx(
            4.0, abs=PENALTY_EVALUATION_TOLERANCE
        )


# =========================================================================
# Section C: outer-loop KKT (:480-792)
# =========================================================================


class TestAugmentedLagrangianKKT:
    def test_equality_only_quadratic(self):
        # min 0.5|x|^2 s.t. x0 = 1 => x* = (1, 0), lambda* = -1 (:480-520).
        problem = ConstrainedProblem(
            half_squared_norm, (x0_minus_target(1.0),)
        )
        solver = AugmentedLagrangian(inner_solver=Lbfgs())
        res = solver.minimize(problem, vec2(5.0, 5.0), penalty=1.0)
        assert float(res.state.x[0]) == pytest.approx(
            1.0, abs=KKT_PRIMAL_TOLERANCE
        )
        assert float(res.state.x[1]) == pytest.approx(
            0.0, abs=KKT_PRIMAL_TOLERANCE
        )
        assert abs(float(res.state.x[0]) - 1.0) <= FEASIBILITY_TOLERANCE
        assert float(res.state.multipliers.equality[0]) == pytest.approx(
            -1.0, abs=KKT_DUAL_TOLERANCE
        )

    def test_inequality_active_recovers_multiplier(self):
        # min 0.5((x0-2)^2 + x1^2) s.t. 1 - x0 >= 0 => x*=(1,0), mu*=1
        # (:522-572).
        objective = Objective(
            lambda x: 0.5 * ((x[0] - 2.0) ** 2 + x[1] ** 2), mode="first"
        )
        inequality = Objective(lambda x: 1.0 - x[0], mode="first")
        problem = ConstrainedProblem(objective, (), (inequality,))
        solver = AugmentedLagrangian(inner_solver=Lbfgs())
        res = solver.minimize(problem, vec2(5.0, 5.0), penalty=1.0)
        assert float(res.state.x[0]) == pytest.approx(
            1.0, abs=KKT_PRIMAL_TOLERANCE
        )
        assert float(res.state.x[1]) == pytest.approx(
            0.0, abs=KKT_PRIMAL_TOLERANCE
        )
        assert 1.0 - float(res.state.x[0]) >= -FEASIBILITY_TOLERANCE
        mu = float(res.state.multipliers.inequality[0])
        assert mu >= -KKT_DUAL_TOLERANCE
        assert mu == pytest.approx(1.0, abs=KKT_DUAL_TOLERANCE)

    def test_both_equality_and_inequality_active(self):
        # min (x0-1)^2 + (x1-2)^2 s.t. x0 = 0.5, 2-(x0+x1) >= 0
        # => x* = (0.5, 1.5) (:574-615; constrained_simple.cc).
        objective = Objective(
            lambda x: (x[0] - 1.0) ** 2 + (x[1] - 2.0) ** 2, mode="first"
        )
        equality = x0_minus_target(0.5)
        inequality = Objective(lambda x: 2.0 - (x[0] + x[1]), mode="first")
        problem = ConstrainedProblem(objective, (equality,), (inequality,))
        solver = AugmentedLagrangian(inner_solver=Lbfgs())
        res = solver.minimize(problem, vec2(1.0, 1.0), penalty=1.0)
        assert float(res.state.x[0]) == pytest.approx(
            0.5, abs=KKT_PRIMAL_TOLERANCE
        )
        assert float(res.state.x[1]) == pytest.approx(
            1.5, abs=KKT_PRIMAL_TOLERANCE
        )
        assert abs(float(res.state.x[0]) - 0.5) <= FEASIBILITY_TOLERANCE
        ineq_val = 2.0 - (float(res.state.x[0]) + float(res.state.x[1]))
        assert ineq_val >= -FEASIBILITY_TOLERANCE
        assert (
            float(res.state.multipliers.inequality[0]) >= -KKT_DUAL_TOLERANCE
        )


class TestAugmentedLagrangianOuter:
    def test_feasible_start_converges_immediately(self):
        # Trivially feasible equality 0 = 0: first outer iteration sees
        # max_violation = 0 and finishes (:617-654).
        zero_constraint = Objective(lambda x: 0.0 * x[0], mode="first")
        problem = ConstrainedProblem(half_squared_norm, (zero_constraint,))
        solver = AugmentedLagrangian(inner_solver=Lbfgs())
        res = solver.minimize(problem, vec2(0.0, 0.0), penalty=1.0)
        assert float(res.state.x[0]) == pytest.approx(
            0.0, abs=KKT_PRIMAL_TOLERANCE
        )
        assert int(res.progress.status) == int(Status.FINISHED)
        assert int(res.progress.num_iterations) <= 5

    def test_no_constraints_is_unconstrained(self):
        problem = ConstrainedProblem(half_squared_norm)
        solver = AugmentedLagrangian(inner_solver=Lbfgs())
        res = solver.minimize(problem, vec2(5.0, 5.0), penalty=1.0)
        assert float(res.state.x[0]) == pytest.approx(
            0.0, abs=KKT_PRIMAL_TOLERANCE
        )
        assert float(res.state.x[1]) == pytest.approx(
            0.0, abs=KKT_PRIMAL_TOLERANCE
        )
        assert int(res.progress.status) == int(Status.FINISHED)

    def test_penalty_holds_flat_on_feasible_problem(self):
        # Conditional schedule must never fire when violation is zero
        # (:694-718).
        zero_constraint = Objective(lambda x: 0.0 * x[0], mode="first")
        problem = ConstrainedProblem(half_squared_norm, (zero_constraint,))
        solver = AugmentedLagrangian(inner_solver=Lbfgs())
        res = solver.minimize(problem, vec2(0.0, 0.0), penalty=1.0)
        assert float(res.state.penalty) == 1.0

    def test_penalty_growth_can_be_disabled(self):
        # growth factor 1 freezes rho on an infeasible start (:728-753).
        problem = ConstrainedProblem(
            half_squared_norm, (x0_minus_target(1.0),)
        )
        solver = AugmentedLagrangian(
            inner_solver=Lbfgs(), penalty_growth_factor=1.0
        )
        res = solver.minimize(problem, vec2(5.0, 5.0), penalty=1.0)
        assert float(res.state.penalty) == 1.0

    def test_penalty_grows_only_while_violation_lags(self):
        # rho bounded by 1e4 and >= 1 after an infeasible start (:766-792).
        problem = ConstrainedProblem(
            half_squared_norm, (x0_minus_target(1.0),)
        )
        solver = AugmentedLagrangian(inner_solver=Lbfgs())
        res = solver.minimize(problem, vec2(5.0, 5.0), penalty=1.0)
        assert float(res.state.penalty) <= 1e4
        assert float(res.state.penalty) >= 1.0

    def test_kkt_stationarity_reported_on_finished_state(self):
        # max_lagrangian_gradient on the returned state must be small when
        # Finished (:1144-1181).
        problem = ConstrainedProblem(
            half_squared_norm, (x0_minus_target(1.0),)
        )
        solver = AugmentedLagrangian(inner_solver=Lbfgs())
        res = solver.minimize(problem, vec2(5.0, 5.0), penalty=1.0)
        assert int(res.progress.status) == int(Status.FINISHED)
        assert float(res.state.max_lagrangian_gradient) <= 1e-2


# =========================================================================
# Section D: non-convex escape discipline (:898-1280)
# =========================================================================

NONCONVEX_TRAP_PRIMAL_TOLERANCE = 1e-1
NONCONVEX_TRAP_OBJECTIVE_TOLERANCE = 0.5


class TestAugmentedLagrangianNonConvex:
    def test_hs024_triangle_escapes_spurious_origin(self):
        # HS024: cubic objective with triangular constraints; spurious
        # feasible KKT at the origin; true optimum (3, sqrt(3)), f* = -1
        # (:922-1062).
        sqrt3 = math.sqrt(3.0)
        scale = 1.0 / (27.0 * sqrt3)
        objective = Objective(
            lambda x: ((x[0] - 3.0) ** 2 - 9.0) * x[1] ** 3 * scale,
            mode="first",
        )
        g0 = Objective(lambda x: x[0] / sqrt3 - x[1], mode="first")
        g1 = Objective(lambda x: x[0] + sqrt3 * x[1], mode="first")
        g2 = Objective(lambda x: 6.0 - x[0] - sqrt3 * x[1], mode="first")
        problem = ConstrainedProblem(objective, (), (g0, g1, g2))

        inner = Lbfgsb(lower=(0.0, 0.0), upper=(1e20, 1e20))
        solver = AugmentedLagrangian(inner_solver=inner)
        res = solver.minimize(problem, vec2(1.0, 0.5), penalty=0.0)

        f_final = float(objective.fn(res.state.x))
        assert float(res.state.x[0]) == pytest.approx(
            3.0, abs=NONCONVEX_TRAP_PRIMAL_TOLERANCE
        )
        assert float(res.state.x[1]) == pytest.approx(
            sqrt3, abs=NONCONVEX_TRAP_PRIMAL_TOLERANCE
        )
        assert f_final == pytest.approx(
            -1.0, abs=NONCONVEX_TRAP_OBJECTIVE_TOLERANCE
        )

    def test_hs029_ellipse_escapes_origin(self):
        # min -x0*x1 on 48 - x0^2 - 2 x1^2 >= 0: optimum (2 sqrt 6,
        # 2 sqrt 3), f* = -12 sqrt 2; spurious KKT at the origin
        # (:1064-1142).
        objective = Objective(lambda x: -x[0] * x[1], mode="first")
        ellipse = Objective(
            lambda x: 48.0 - x[0] ** 2 - 2.0 * x[1] ** 2, mode="first"
        )
        problem = ConstrainedProblem(objective, (), (ellipse,))
        solver = AugmentedLagrangian(inner_solver=Lbfgs())
        res = solver.minimize(problem, vec2(1.0, 1.0), penalty=0.0)

        x0_star = 2.0 * math.sqrt(6.0)
        x1_star = 2.0 * math.sqrt(3.0)
        f_star = -12.0 * math.sqrt(2.0)
        assert float(res.state.x[0]) == pytest.approx(x0_star, abs=2e-1)
        assert float(res.state.x[1]) == pytest.approx(x1_star, abs=2e-1)
        assert float(objective.fn(res.state.x)) == pytest.approx(
            f_star, abs=5e-1
        )

    def test_box_pinned_optimum_stops_on_kkt(self):
        # HS016-class: optimum pinned to the inner box at (0.5, 0.25);
        # requires the projected-gradient KKT measure (:1183-1280).
        objective = Objective(
            lambda x: (x[0] - 1.0) ** 2
            + 100.0 * (x[0] ** 2 - x[1]) ** 2,
            mode="first",
        )
        i0 = Objective(lambda x: x[0] ** 2 + x[1], mode="first")
        i1 = Objective(lambda x: x[0] + x[1] ** 2, mode="first")
        problem = ConstrainedProblem(objective, (), (i0, i1))
        inner = Lbfgsb(lower=(-0.5, -1e20), upper=(0.5, 1.0))
        solver = AugmentedLagrangian(inner_solver=inner)
        res = solver.minimize(problem, vec2(-2.0, 1.0), penalty=0.0)

        assert int(res.progress.status) == int(Status.FINISHED)
        assert int(res.progress.num_iterations) < 20
        assert float(res.state.x[0]) == pytest.approx(0.5, abs=1e-4)
        assert float(res.state.x[1]) == pytest.approx(0.25, abs=1e-4)
