"""Support-vector machine, four formulations — the end-to-end demo workload.

Analog of the reference's SVM example family (src/examples/svm_primal_lbfgs
.cc:1-121, svm_primal_al.cc:1-201, svm_dual_lbfgsb.cc:1-117, svm_dual_al.cc
:1-151).  The reference embeds a 100x4 Iris subset (iris_data.h:1-215); here
a deterministic synthetic 2-class Gaussian dataset plays that role so the
example carries no vendored data.

1. primal-lbfgs : min 0.5|w|^2 + C sum max(0, 1 - y f(x))^2      (smooth,
                  unconstrained — plain L-BFGS)
2. primal-al    : min 0.5|w|^2 + C sum xi^2
                  s.t. y_i f(x_i) >= 1 - xi_i   (AL, d+1+n variables)
3. dual-lbfgsb  : box-constrained dual 0 <= alpha <= C with the equality
                  sum alpha y = 0 dropped (no-bias dual) — native L-BFGS-B
4. dual-al      : full dual = AL outside (equality) + L-BFGS-B inside (box)

All four must find (near-)identical separating hyperplanes.
"""

import os

import jax

jax.config.update("jax_platforms", os.environ.get("EXAMPLES_PLATFORM", "cpu"))
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from cppnumericalsolvers_tpu import (  # noqa: E402
    ConstrainedProblem,
    minimize,
    objective,
)
from cppnumericalsolvers_tpu.solvers import (  # noqa: E402
    AugmentedLagrangian,
    Lbfgs,
    Lbfgsb,
)

C = 1.0


def make_data(n_per_class=50, d=4, seed=0):
    rng = np.random.default_rng(seed)
    mean = np.zeros(d)
    mean[0], mean[1] = 2.0, 1.0
    xa = rng.normal(size=(n_per_class, d)) + mean
    xb = rng.normal(size=(n_per_class, d)) - mean
    x = np.vstack([xa, xb])
    y = np.concatenate([np.ones(n_per_class), -np.ones(n_per_class)])
    return jnp.asarray(x), jnp.asarray(y)


def accuracy(w, b, x, y):
    pred = jnp.sign(x @ w + b)
    return float(jnp.mean(pred == y))


def main():
    x, y = make_data()
    n, d = x.shape

    # -- 1. smooth primal (squared hinge), plain L-BFGS ---------------------
    def primal_obj(wb):
        w, b = wb[:d], wb[d]
        margins = y * (x @ w + b)
        hinge = jnp.maximum(0.0, 1.0 - margins)
        return 0.5 * jnp.vdot(w, w) + C * jnp.sum(hinge**2)

    r1 = minimize(objective(primal_obj, mode="first"), jnp.zeros(d + 1), Lbfgs())
    w1, b1 = r1.state.x[:d], r1.state.x[d]
    print(f"primal-lbfgs : acc = {accuracy(w1, b1, x, y):.3f}  "
          f"f = {float(r1.state.value):.4f}  nfev = {int(r1.state.nfev)}")

    # -- 2. constrained primal via AL (d + 1 + n variables) -----------------
    def primal_c_obj(z):
        w, xi = z[:d], z[d + 1 :]
        return 0.5 * jnp.vdot(w, w) + C * jnp.sum(xi**2)

    def margin_constraint(i):
        # y_i (w.x_i + b) - 1 + xi_i >= 0
        return objective(
            lambda z, i=i: y[i] * (x[i] @ z[:d] + z[d]) - 1.0 + z[d + 1 + i],
            mode="first",
        )

    problem = ConstrainedProblem(
        objective=objective(primal_c_obj, mode="first"),
        inequality_constraints=tuple(margin_constraint(i) for i in range(n)),
    )
    al = AugmentedLagrangian(inner_solver=Lbfgs())
    r2 = al.minimize(problem, jnp.zeros(d + 1 + n))
    w2, b2 = r2.state.x[:d], r2.state.x[d]
    print(f"primal-al    : acc = {accuracy(w2, b2, x, y):.3f}  "
          f"violation = {float(r2.state.max_violation):.2e}")

    # -- 3. no-bias dual with box via native L-BFGS-B -----------------------
    gram = (y[:, None] * x) @ (y[:, None] * x).T

    def dual_obj(alpha):  # minimize the negated dual
        return 0.5 * alpha @ gram @ alpha - jnp.sum(alpha)

    r3 = minimize(
        objective(dual_obj, mode="first"),
        jnp.full(n, 0.5),
        Lbfgsb(lower=0.0, upper=C),
    )
    alpha3 = r3.state.x
    w3 = (alpha3 * y) @ x
    # recover b from a free support vector (0 < alpha < C)
    sv = np.where((np.asarray(alpha3) > 1e-4) & (np.asarray(alpha3) < C - 1e-4))[0]
    b3 = float(jnp.mean(y[sv] - x[sv] @ w3)) if len(sv) else 0.0
    print(f"dual-lbfgsb  : acc = {accuracy(w3, b3, x, y):.3f}  "
          f"support vectors = {int((np.asarray(alpha3) > 1e-4).sum())}")

    # -- 4. full dual: AL (equality sum alpha y = 0) + L-BFGS-B (box) -------
    dual_problem = ConstrainedProblem(
        objective=objective(dual_obj, mode="first"),
        equality_constraints=(
            objective(lambda a: jnp.vdot(a, y), mode="first"),
        ),
    )
    al_dual = AugmentedLagrangian(inner_solver=Lbfgsb(lower=0.0, upper=C))
    r4 = al_dual.minimize(dual_problem, jnp.full(n, 0.5))
    alpha4 = r4.state.x
    w4 = (alpha4 * y) @ x
    sv4 = np.where((np.asarray(alpha4) > 1e-4) & (np.asarray(alpha4) < C - 1e-4))[0]
    b4 = float(jnp.mean(y[sv4] - x[sv4] @ w4)) if len(sv4) else 0.0
    print(f"dual-al      : acc = {accuracy(w4, b4, x, y):.3f}  "
          f"eq violation = {float(jnp.abs(jnp.vdot(alpha4, y))):.2e}")

    for tag, acc in [
        ("primal-lbfgs", accuracy(w1, b1, x, y)),
        ("primal-al", accuracy(w2, b2, x, y)),
        ("dual-lbfgsb", accuracy(w3, b3, x, y)),
        ("dual-al", accuracy(w4, b4, x, y)),
    ]:
        assert acc >= 0.95, (tag, acc)
    print("all four formulations separate the data (acc >= 0.95)")


if __name__ == "__main__":
    main()
