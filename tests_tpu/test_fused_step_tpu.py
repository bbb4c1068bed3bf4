"""Real-TPU Mosaic lowering of the fused prologue/epilogue kernels
(ops/fused_step.py) against their XLA single-instance oracles, plus the
end-to-end fused solve on the chip.

tests/test_fused_step.py covers the same kernels only in interpret mode;
these run the real lowering (the epilogue's progress ladder is all
i32/bool vector-mask logic — exactly the class of code where a Mosaic
legalization quirk silently corrupts stopping decisions).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cppnumericalsolvers_tpu.ops.fused_step import (
    _epilogue_xla_single,
    _prologue_xla_single,
    epilogue_pallas_batched,
    prologue_pallas_batched,
)

requires_tpu = pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="needs a real TPU chip"
)


@requires_tpu
@pytest.mark.parametrize("b,m,n", [(16, 5, 12), (64, 10, 33), (128, 10, 256)])
def test_prologue_real_lowering_matches_oracle(b, m, n):
    rng = np.random.default_rng(b + n)
    f32 = np.float32
    x = jnp.asarray(rng.standard_normal((b, n)).astype(f32))
    g = jnp.asarray(rng.standard_normal((b, n)).astype(f32))
    s = jnp.asarray(rng.standard_normal((b, m, n)).astype(f32) * 0.1)
    y = jnp.asarray(s + 0.3 * rng.standard_normal((b, m, n)).astype(f32) * 0.1)
    count = jnp.asarray(rng.integers(0, m + 1, (b,)).astype(np.int32))
    gamma = jnp.asarray((0.5 + rng.random(b)).astype(f32))
    sn = jnp.asarray(rng.standard_normal((b, n)).astype(f32) * 0.1)
    yn = jnp.asarray(sn + 0.3 * rng.standard_normal((b, n)).astype(f32) * 0.1)
    valid = jnp.asarray(rng.integers(0, 2, (b,)).astype(bool))
    done = jnp.asarray(rng.integers(0, 2, (b,)).astype(bool))

    got = prologue_pallas_batched(
        x, g, s, y, count, gamma, sn, yn, valid, done, interpret=False
    )
    want = jax.jit(jax.vmap(_prologue_xla_single))(
        x, g, s, y, count, gamma, sn, yn, valid, done
    )
    names = ["ls_dir", "alpha", "dginit", "s_mem", "y_mem", "count", "gamma"]
    for nm, w, o in zip(names, want, got):
        np.testing.assert_allclose(
            np.asarray(o), np.asarray(w), rtol=2e-4, atol=2e-5, err_msg=nm
        )
    # Exact integer/count semantics and done-lane freezing.
    np.testing.assert_array_equal(np.asarray(got[5]), np.asarray(want[5]))
    dn = np.asarray(done)
    np.testing.assert_array_equal(
        np.asarray(got[3])[dn], np.asarray(s)[dn]
    )


@requires_tpu
def test_epilogue_real_lowering_matches_oracle():
    from cppnumericalsolvers_tpu.core.objective import FunctionState
    from cppnumericalsolvers_tpu.core.progress import (
        default_stopping,
        init_progress,
    )

    rng = np.random.default_rng(7)
    b, n = 64, 24
    f32 = np.float32
    state = FunctionState(
        x=jnp.asarray(rng.standard_normal((b, n)).astype(f32)),
        value=jnp.asarray(rng.standard_normal((b,)).astype(f32)),
        gradient=jnp.asarray(rng.standard_normal((b, n)).astype(f32)),
        nfev=jnp.asarray(rng.integers(1, 50, (b,)).astype(np.int32)),
    )
    x_ls = state.x + jnp.asarray(0.1 * rng.standard_normal((b, n)).astype(f32))
    f_ls = state.value - jnp.asarray(
        np.abs(rng.standard_normal(b)).astype(f32)
    )
    # Adversarial lanes: NaN result, exact stall, tiny gradient (fires the
    # relative gradient-norm stop), huge num_iterations (fires the limit).
    f_ls = f_ls.at[3].set(jnp.nan)
    x_ls = x_ls.at[5].set(state.x[5])
    g_ls = jnp.asarray(rng.standard_normal((b, n)).astype(f32))
    g_ls = g_ls.at[7].set(jnp.zeros((n,), f32))
    ls_nfev = jnp.asarray(rng.integers(1, 10, (b,)).astype(np.int32))
    count = jnp.asarray(rng.integers(0, 10, (b,)).astype(np.int32))
    sp = jnp.asarray(rng.standard_normal((b, n)).astype(f32))
    yp = jnp.asarray(rng.standard_normal((b, n)).astype(f32))
    pv = jnp.asarray(rng.integers(0, 2, (b,)).astype(bool))
    done = jnp.asarray(rng.integers(0, 2, (b,)).astype(bool))
    progress = jax.vmap(lambda _: init_progress(jnp.float32))(jnp.arange(b))
    progress = progress._replace(
        num_iterations=jnp.asarray(
            rng.integers(0, 9, (b,)).astype(np.int32)
        ).at[9].set(20000),
        past_ring=jnp.asarray(rng.standard_normal((b, 8)).astype(f32)),
        past_pos=jnp.asarray(rng.integers(0, 3, (b,)).astype(np.int32)),
        x_delta_violations=jnp.asarray(
            rng.integers(0, 2, (b,)).astype(np.int32)
        ),
    )
    crit = default_stopping(jnp.float32)

    got = epilogue_pallas_batched(
        state, x_ls, f_ls, g_ls, ls_nfev, count, sp, yp, pv, done, progress,
        crit, interpret=False,
    )
    want = jax.jit(
        jax.vmap(
            lambda st, xl, fl, gl, ln, c, s_, y_, p, d, pr: (
                _epilogue_xla_single(
                    st, xl, fl, gl, ln, c, s_, y_, p, d, pr, crit
                )
            )
        )
    )(state, x_ls, f_ls, g_ls, ls_nfev, count, sp, yp, pv, done, progress)

    # All integer fields (statuses, counters, nfev) must match EXACTLY —
    # these are the stopping decisions.
    for name in ("num_iterations", "x_delta_violations",
                 "f_delta_violations", "status", "past_pos"):
        np.testing.assert_array_equal(
            np.asarray(getattr(got[5], name)),
            np.asarray(getattr(want[5], name)),
            err_msg=name,
        )
    np.testing.assert_array_equal(
        np.asarray(got[0].nfev), np.asarray(want[0].nfev)
    )
    np.testing.assert_array_equal(np.asarray(got[4]), np.asarray(want[4]))
    # Float fields to f32 tolerance.
    for g_, w_, nm in (
        (got[0].x, want[0].x, "x"),
        (got[0].value, want[0].value, "value"),
        (got[1], want[1], "s_pend"),
        (got[2], want[2], "y_pend"),
        (got[5].x_delta, want[5].x_delta, "x_delta"),
        (got[5].gradient_norm, want[5].gradient_norm, "grad_norm"),
        (got[5].past_ring, want[5].past_ring, "ring"),
    ):
        np.testing.assert_allclose(
            np.asarray(g_), np.asarray(w_), rtol=1e-6, atol=1e-6, err_msg=nm
        )


@requires_tpu
def test_fused_solve_end_to_end_on_chip():
    """Whole fused solve on the chip: converges and reports sane metrics."""
    import cppnumericalsolvers_tpu as cns
    from cppnumericalsolvers_tpu.solvers import Lbfgs

    def rosen(x):
        return jnp.sum(
            100.0 * (x[1::2] - x[0::2] ** 2) ** 2 + (1.0 - x[0::2]) ** 2
        )

    obj = cns.objective(rosen, mode="first")
    x0 = jnp.asarray(
        np.random.default_rng(0).uniform(-2, 2, (128, 16)).astype(np.float32)
    )
    r = cns.minimize_batched(obj, x0, Lbfgs())
    vals = np.asarray(r.state.value)
    assert (vals < 1e-2).mean() > 0.95, vals.max()
    assert np.all(np.asarray(r.progress.num_iterations) > 0)
