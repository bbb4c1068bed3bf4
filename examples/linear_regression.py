"""Box-constrained least squares, float32 — solved two ways.

Analog of the reference's src/examples/linear_regression.cc:1-102: the same
bound-constrained least-squares problem solved (a) with native L-BFGS-B box
handling and (b) with the augmented-Lagrangian loop over four bound
inequalities.  float32 throughout — the dtype that matters on TPU (the
reference runs this example in float to prove the scalar-type genericity;
here f32 exercises the rescaled stopping tolerances).
"""

import os

import jax

jax.config.update("jax_platforms", os.environ.get("EXAMPLES_PLATFORM", "cpu"))

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from cppnumericalsolvers_tpu import ConstrainedProblem, objective  # noqa: E402
from cppnumericalsolvers_tpu.solvers import (  # noqa: E402
    AugmentedLagrangian,
    Lbfgs,
    Lbfgsb,
)


def main():
    rng = np.random.default_rng(0)
    n_samples, n_features = 64, 2
    a = rng.normal(size=(n_samples, n_features)).astype(np.float32)
    w_true = np.array([1.8, -0.7], np.float32)
    y = a @ w_true + 0.05 * rng.normal(size=n_samples).astype(np.float32)

    a_j = jnp.asarray(a)
    y_j = jnp.asarray(y)

    # Least squares on the MXU: residual matmul dominates.
    ls = objective(
        lambda w: jnp.sum((a_j @ w - y_j) ** 2) / n_samples, mode="first"
    )

    # Unconstrained fit first.
    from cppnumericalsolvers_tpu import minimize

    w_free = minimize(ls, jnp.zeros(2, jnp.float32), Lbfgs()).state.x
    print("unconstrained  w =", np.round(np.asarray(w_free), 4))

    # Box [0, 1] x [0, 1]: the true w is outside, so bounds pin coordinates.
    lower, upper = 0.0, 1.0

    # (a) native L-BFGS-B.
    r_box = minimize(ls, jnp.full(2, 0.5, jnp.float32), Lbfgsb(lower=lower, upper=upper))
    w_box = np.asarray(r_box.state.x)
    print("lbfgsb box     w =", np.round(w_box, 4))

    # (b) augmented Lagrangian with 4 bound inequalities  w-l >= 0, u-w >= 0.
    problem = ConstrainedProblem(
        objective=ls,
        inequality_constraints=(
            objective(lambda w: w[0] - lower, mode="first"),
            objective(lambda w: w[1] - lower, mode="first"),
            objective(lambda w: upper - w[0], mode="first"),
            objective(lambda w: upper - w[1], mode="first"),
        ),
    )
    al = AugmentedLagrangian(inner_solver=Lbfgs())
    r_al = al.minimize(problem, jnp.full(2, 0.5, jnp.float32))
    w_al = np.asarray(r_al.state.x)
    print("al box         w =", np.round(w_al, 4))

    assert np.all(w_box >= lower - 1e-4) and np.all(w_box <= upper + 1e-4)
    assert np.allclose(w_box, w_al, atol=5e-3), (w_box, w_al)
    print("both box solvers agree; bound-pinned coordinates:",
          np.where((w_box < lower + 1e-3) | (w_box > upper - 1e-3))[0].tolist())


if __name__ == "__main__":
    main()
