"""Objective composition tour.

Analog of the reference's src/examples/debug.cc:1-302 (the expression-
template tour).  In the TPU-native framework, expression templates dissolve
into Python arithmetic on traced objectives — derivatives propagate through
``jax.grad`` automatically — so this tour shows composition, mode
propagation, the min/max-zero clamps, and the penalty/AL composite builders
evaluated at hand-checkable points.
"""

import os

import jax

# Tiny 2-D demos run on the CPU backend by default (the TPU value story is
# the batched/sharded path — see bench.py and examples/pod_scale.py).  Set
# EXAMPLES_PLATFORM=tpu to force the accelerator.
jax.config.update("jax_platforms", os.environ.get("EXAMPLES_PLATFORM", "cpu"))
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402

from cppnumericalsolvers_tpu import (  # noqa: E402
    ConstrainedProblem,
    MultiplierState,
    augmented_lagrangian_value,
    constant,
    max_zero,
    min_zero,
    objective,
    to_penalty,
)


def main():
    x = jnp.array([1.0, 2.0])

    # -- arithmetic on objectives (function_expressions.h:401-518 analog) ---
    f = objective(lambda v: v[0] ** 2 + v[1] ** 2, mode="second")
    g = objective(lambda v: v[0] * v[1], mode="second")

    combo = 2.0 * f + g - constant(3.0)
    print("f(x) =", float(f.fn(x)))  # 5
    print("g(x) =", float(g.fn(x)))  # 2
    print("(2f + g - 3)(x) =", float(combo.fn(x)))  # 9
    print("grad:", combo.gradient(x))  # [2*2x0 + x1, 2*2x1 + x0] = [6, 9]
    print("hessian:\n", combo.hessian(x))

    prod = f * g  # product rule propagates through autodiff
    print("(f*g)(x) =", float(prod.fn(x)), " grad:", prod.gradient(x))

    # Mode is the min of the operands (function_expressions.h:74-88):
    h_first = objective(lambda v: jnp.sum(jnp.abs(v) ** 1.5), mode="first")
    print("mode of second*first product:", (f * h_first).mode)

    # -- one-sided clamps (function_expressions.h:317-399) ------------------
    c = objective(lambda v: v[0] - 1.5, mode="second")
    print("min(0, c)(x) =", float(min_zero(c).fn(x)))  # min(0, -0.5) = -0.5
    print("max(0, c)(x) =", float(max_zero(c).fn(x)))  # 0
    print("d/dx max(0,c) at active side:", max_zero(c).gradient(jnp.array([2.0, 0.0])))

    # -- penalty / augmented-Lagrangian composites (function_penalty.h) -----
    problem = ConstrainedProblem(
        objective=f,
        equality_constraints=(objective(lambda v: v[0] + v[1] - 2.0, mode="second"),),
        inequality_constraints=(objective(lambda v: v[0] - 0.5, mode="second"),),
    )
    rho = 10.0
    penalty_val = to_penalty(problem, rho).fn(x)
    print("pure-penalty composite at x:", float(penalty_val))

    multipliers = MultiplierState(
        equality=jnp.array([0.5]), inequality=jnp.array([1.0])
    )
    lagr = augmented_lagrangian_value(problem, x, multipliers, rho)
    # Hand-check: f=5, eq c=1 -> +lambda*c + rho/2 c^2 = .5 + 5;
    # ineq g=0.5, mu-rho*g = 1-5 < 0 -> PHR inactive side: -mu^2/(2 rho)
    print("augmented Lagrangian at x:", float(lagr), "(expect 10.45)")


if __name__ == "__main__":
    main()
