"""L-BFGS two-loop recursion — the framework's hottest op, as a fused
batched Pallas TPU kernel with an XLA fallback.

Reference algorithm: include/cppoptlib/solver/lbfgs.h:141-196 (backward pass,
H0 centering, forward pass).  TPU-first redesign choices:

* **Chronological history layout.**  The reference keeps a circular (s, y)
  buffer with a rotating start pointer (lbfgs.h:157-162) to avoid memcpy on
  append.  Under a vmapped batch each lane's pointer diverges, which would
  turn every history access into a per-lane gather — poison for VMEM tiling.
  We instead store history chronologically (index 0 = oldest, count-1 =
  newest) and pay a cheap contiguous roll on append: slot order is then
  uniform across lanes and the kernel is gather-free.
* **One VMEM residency.**  The XLA path reads the (m, n) buffers from HBM
  twice (backward + forward pass).  The Pallas kernel loads a (TB, m, n)
  block into VMEM once and runs both passes from VMEM — the op is
  bandwidth-bound, so this halves HBM traffic.
* **Per-lane masking, no divergence.**  ``i < count`` and the
  ``|s.y| >= eps`` usability guard (lbfgs.h:165-167) become vector masks;
  every lane executes the same static m-trip loops.

The public entry ``two_loop_direction`` is a ``jax.custom_batching
.custom_vmap``: un-batched calls lower to the XLA scan; a vmapped call (the
batched solve path) swaps in the fused Pallas kernel on TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

__all__ = [
    "two_loop_direction",
    "two_loop_direction_xla",
    "two_loop_direction_batched",
    "two_loop_pallas_batched",
    "push_history_xla",
    "lbfgs_push_and_direction",
    "push_two_loop_pallas_batched",
]


def two_loop_direction_xla(
    gradient: jax.Array,
    s_memory: jax.Array,
    y_memory: jax.Array,
    mem_count: jax.Array,
    gamma,
    precond_diagonal: jax.Array | None = None,
) -> jax.Array:
    """Single-instance two-loop recursion (chronological history layout).

    ``s_memory``/``y_memory`` are (m, n) with rows 0..count-1 valid, oldest
    first.  Mirrors lbfgs.h:141-196 with fixed trip count + masks.
    """
    m = s_memory.shape[0]
    dtype = gradient.dtype
    eps = jnp.finfo(dtype).eps

    q0 = gradient
    alphas0 = jnp.zeros((m,), dtype)

    def backward(j, carry):
        q, alphas = carry
        i = mem_count - 1 - j  # newest -> oldest
        active = i >= 0
        idx = jnp.maximum(i, 0)
        s_i = s_memory[idx]
        y_i = y_memory[idx]
        denom = jnp.vdot(s_i, y_i)
        usable = jnp.logical_and(active, jnp.abs(denom) >= eps)
        rho = jnp.where(usable, 1.0 / denom, 0.0)
        alpha_i = rho * jnp.vdot(s_i, q)
        q = jnp.where(usable, q - alpha_i * y_i, q)
        alphas = alphas.at[idx].set(jnp.where(usable, alpha_i, alphas[idx]))
        return q, alphas

    q, alphas = lax.fori_loop(0, m, backward, (q0, alphas0))

    if precond_diagonal is not None:
        q = precond_diagonal * q
    else:
        q = q * gamma

    def forward(i, q):
        active = i < mem_count
        idx = jnp.where(active, i, 0)
        s_i = s_memory[idx]
        y_i = y_memory[idx]
        denom = jnp.vdot(s_i, y_i)
        usable = jnp.logical_and(active, jnp.abs(denom) >= eps)
        rho = jnp.where(usable, 1.0 / denom, 0.0)
        beta = rho * jnp.vdot(y_i, q)
        return jnp.where(usable, q + s_i * (alphas[idx] - beta), q)

    q = lax.fori_loop(0, m, forward, q)
    return q


# ---------------------------------------------------------------------------
# Batched Pallas kernel
# ---------------------------------------------------------------------------

_LANE = 128  # TPU lane width
_SUBLANE = 8  # f32 sublane tile
# Hard tile cap.  v5e tile sweeps (fused kernel, per-call device time via
# scan contrast): at n=32 throughput improves with tile size well past the
# round-1 cap — round-4 sweep at (B=1024, n=32): tile 512 125.0 us, tile
# 1024 **86.1 us**, tile 2048 95.5 us — the 2m-step serial reduction chain
# amortizes over more lanes per program until the fatter blocks start
# thrashing VMEM.  At n>=256 the VMEM budget below binds first, so the cap
# only matters in the small-n regime.
_TILE_B = 1024
# Physical VMEM per core by device kind (bytes).  Every production TPU since
# v4 carries 128 MiB; the per-kernel scoped cap below requests half of it.
# Unknown/older kinds (v2/v3: 16 MiB) fall back to the Mosaic default cap so
# the kernel degrades to smaller tiles instead of failing to compile
# (advisor round-2: don't hard-require v5e's VMEM on other generations).
_PHYSICAL_VMEM = {
    "TPU v4": 128 << 20,
    "TPU v5 lite": 128 << 20,
    "TPU v5e": 128 << 20,
    "TPU v5": 128 << 20,
    "TPU v5p": 128 << 20,
    "TPU v6 lite": 128 << 20,
    "TPU v6e": 128 << 20,
    "TPU7x": 128 << 20,
}


def _vmem_limit_bytes(default_fraction: float = 0.75) -> int | None:
    """Per-kernel scoped-VMEM cap for the current device, or None to keep
    the compiler default (16 MiB) on kinds with unknown physical VMEM."""
    try:
        kind = jax.devices()[0].device_kind
    except Exception:  # uninitialised backend — stay conservative
        return None
    phys = _PHYSICAL_VMEM.get(kind)
    if phys is None:
        return None
    return int(phys * default_fraction)


def _scoped_vmem_budget(n: int) -> int:
    """Block-tile budget consistent with the scoped cap.  Callers pass
    PHYSICAL per-lane block bytes (:func:`_phys_cols`/:func:`_phys_rows`) —
    VMEM tiles pad the last two dims to (8k, 128), which at (m=10, n=32) is
    a 6.5x multiplier that the round-1..3 logical accounting missed
    (observed as a 66 MiB scoped OOM at (B=8192, n=32) under the 64 MiB
    cap once double-buffering kicked in at grid > 1).

    Two regimes, from the round-4 v5e tile sweeps:

    * n <= 64 (latency-bound): 40% of the scoped limit — fat tiles amortize
      the serial reduction chain (tile 1024 beats 512 by 1.45x at n=32) and
      the only ceiling is double-buffered VMEM.
    * n > 64 (bandwidth-bound): ~10 MiB — reproduces the measured-best
      small tiles (128 @ n=256, 32 @ n=1024, 8 @ n=4096); fatter tiles were
      re-measured SLOWER under the raised cap (tile 128 @ n=1024: 440 us vs
      tile 32's 415; tile 32 @ n=4096: 454 vs tile 8's 423) — coarser
      blocks pipeline DMA/compute worse when bandwidth already binds.
    """
    limit = _vmem_limit_bytes()
    if limit is None:
        limit = 16 << 20  # Mosaic default scoped cap
    if n <= 64:
        return int(limit * 0.4)
    return min(int(limit * 0.4), 10 << 20)


def _phys_cols(n: int) -> int:
    """Lane (minor-dim) footprint of a VMEM tile: padded to 128."""
    return _round_up(n, 128)


def _phys_rows(m: int) -> int:
    """Sublane (second-minor) footprint of a VMEM tile: padded to 8 (f32)."""
    return _round_up(m, _SUBLANE)


def _round_up(x: int, mult: int) -> int:
    return -(-x // mult) * mult


def _pick_tile_b(b: int, bytes_per_lane: int, budget: int) -> int:
    """Largest sublane-multiple tile that (a) fits the VMEM block budget and
    (b) DIVIDES the sublane-rounded batch.

    (b) is the one that matters: a tile that doesn't divide the batch forces
    a zero-padded copy of the whole (B, m, n) history in HBM before and a
    slice after the kernel — measured on v5e at (B=1024, n=1024) this is a
    3x throughput cliff (tile 32: 433 GB/s; tile 48, which pads 1024→1056:
    146 GB/s).  Every power-of-two batch therefore gets a power-of-two tile;
    odd batches fall back toward 8 (round_up(b,8) always has an 8-divisor).

    Caveat (advisor round-2): a batch with no rich divisor structure (e.g.
    B=1016 = 8·127) lands on tile 8 and, at small n where throughput climbs
    with tile size, runs several times below the best power-of-two batch.
    Padding to a non-dividing tile is not the cure — the padded history copy
    costs more bandwidth than the kernel saves (the measured cliff above);
    at large n tile 8 already runs at full kernel bandwidth (436 GB/s at
    n=4096).  Contract, documented in the README perf notes: pick batch
    sizes with a power-of-two factor (ideally a multiple of 128) for
    small-n workloads.
    """
    b8 = _round_up(b, _SUBLANE)
    cap = min(_TILE_B, max(_SUBLANE, budget // max(bytes_per_lane, 1)))
    tb = _SUBLANE
    t = _SUBLANE
    while t <= cap and t <= b8:
        if b8 % t == 0:
            tb = t
        t += _SUBLANE
    return tb


def _pltpu_compiler_params(pltpu, vmem_limit_bytes: int | None):
    """CompilerParams across jax versions (TPUCompilerParams pre-0.8).
    ``None`` keeps the compiler's default scoped-VMEM cap."""
    cls = getattr(pltpu, "CompilerParams", None) or getattr(
        pltpu, "TPUCompilerParams"
    )
    if vmem_limit_bytes is None:
        return cls()
    return cls(vmem_limit_bytes=vmem_limit_bytes)


def _two_loop_kernel(g_ref, s_ref, y_ref, gamma_ref, count_ref, out_ref):
    """One (TB, m, n) block: both passes entirely in VMEM.

    All lanes run the same static m-trip loops; per-lane activity is the
    vector mask ``i < count``.  n is zero-padded to a lane multiple, which
    leaves every dot product unchanged.
    """
    m = s_ref.shape[1]
    g = g_ref[:]  # (TB, n)
    dtype = g.dtype
    eps = jnp.finfo(dtype).eps
    count = count_ref[:]  # (TB, 1) int32
    gamma = gamma_ref[:]  # (TB, 1)

    alphas = [None] * m
    denoms = [None] * m
    usables = [None] * m
    # Backward pass iterates physical rows r = m-1..0.  With chronological
    # storage, a lane with count c holds rows 0..c-1 and its j-th-newest row
    # is r = c-1-j; masked-out rows (r >= count) contribute no-ops, so the
    # reverse-physical sweep applies every lane's rows in exactly
    # newest->oldest order even though counts differ across lanes.
    q = g
    for r in range(m - 1, -1, -1):
        s_r = s_ref[:, r, :]  # (TB, n)
        y_r = y_ref[:, r, :]
        active = count > r  # (TB, 1): row r exists for this lane
        denom = jnp.sum(s_r * y_r, axis=-1, keepdims=True)  # (TB, 1)
        usable = jnp.logical_and(active, jnp.abs(denom) >= eps)
        rho = jnp.where(usable, 1.0 / denom, 0.0)
        alpha = rho * jnp.sum(s_r * q, axis=-1, keepdims=True)
        q = jnp.where(usable, q - alpha * y_r, q)
        alphas[r] = alpha
        denoms[r] = denom
        usables[r] = usable

    q = q * gamma

    # Forward pass: oldest -> newest (physical order).
    for r in range(m):
        s_r = s_ref[:, r, :]
        y_r = y_ref[:, r, :]
        usable = usables[r]
        rho = jnp.where(usable, 1.0 / denoms[r], 0.0)
        beta = rho * jnp.sum(y_r * q, axis=-1, keepdims=True)
        q = jnp.where(usable, q + s_r * (alphas[r] - beta), q)

    out_ref[:] = q


@functools.partial(jax.jit, static_argnames=("interpret",))
def two_loop_pallas_batched(
    gradient: jax.Array,  # (B, n)
    s_memory: jax.Array,  # (B, m, n)
    y_memory: jax.Array,  # (B, m, n)
    mem_count: jax.Array,  # (B,) int32
    gamma: jax.Array,  # (B,)
    interpret: bool = False,
) -> jax.Array:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, n = gradient.shape
    m = s_memory.shape[1]
    dtype = gradient.dtype

    # Lane-dim padding only to the sublane quantum (8), NOT to the 128-lane
    # width: Mosaic masks partial lanes internally, and materialising a
    # zero-padded (B, m, 128k) copy of the history in HBM costs more
    # bandwidth than the whole kernel (measured 7.4x slowdown at n=32 from
    # padding to 128 — the padded copies alone exceeded the kernel's dense
    # traffic).  Zero lanes leave every dot product unchanged.
    n_pad = _round_up(n, _SUBLANE)
    # ~2 MB block budget (S + Y input blocks): with double-buffered
    # pipelining plus XLA sometimes homing the padded result tensor in VMEM,
    # a 4 MB cap was observed to overflow the 16 MB scoped limit at
    # (B=1024, n=1024).  Tile must divide the batch — see _pick_tile_b.
    bytes_per_lane = 2 * m * n_pad * jnp.dtype(dtype).itemsize
    tb = _pick_tile_b(b, bytes_per_lane, 2 << 20)
    b_pad = _round_up(b, tb)

    if n_pad == n:
        g, s, y = gradient, s_memory, y_memory
    else:
        g = jnp.zeros((b, n_pad), dtype).at[:, :n].set(gradient)
        s = jnp.zeros((b, m, n_pad), dtype).at[:, :, :n].set(s_memory)
        y = jnp.zeros((b, m, n_pad), dtype).at[:, :, :n].set(y_memory)
    if b_pad != b:
        g = jnp.zeros((b_pad, n_pad), dtype).at[:b].set(g)
        s = jnp.zeros((b_pad, m, n_pad), dtype).at[:b].set(s)
        y = jnp.zeros((b_pad, m, n_pad), dtype).at[:b].set(y)
    cnt = (
        jnp.zeros((b_pad, 1), jnp.int32)
        .at[:b, 0]
        .set(mem_count.astype(jnp.int32))
    )
    gam = jnp.zeros((b_pad, 1), dtype).at[:b, 0].set(gamma.astype(dtype))

    # Index maps return explicit i32 blocks: under jax_enable_x64 a Python
    # `0` traces as an i64 constant, which Mosaic cannot legalize.  numpy
    # scalars stay untraced constants (index maps may not capture tracers).
    zero = np.int32(0)
    grid = (b_pad // tb,)
    out = pl.pallas_call(
        _two_loop_kernel,
        out_shape=jax.ShapeDtypeStruct((b_pad, n_pad), dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tb, n_pad), lambda i: (i, zero), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (tb, m, n_pad), lambda i: (i, zero, zero), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (tb, m, n_pad), lambda i: (i, zero, zero), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((tb, 1), lambda i: (i, zero), memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, 1), lambda i: (i, zero), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (tb, n_pad), lambda i: (i, zero), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(g, s, y, gam, cnt)
    return out[:b, :n]


def two_loop_direction_batched(
    gradient, s_memory, y_memory, mem_count, gamma
) -> jax.Array:
    """Batched two-loop: Pallas on TPU, vmapped XLA elsewhere."""
    if jax.default_backend() == "tpu" and gradient.dtype != jnp.float64:
        return two_loop_pallas_batched(
            gradient, s_memory, y_memory, mem_count, gamma
        )
    return jax.vmap(
        lambda g, s, y, c, ga: two_loop_direction_xla(g, s, y, c, ga, None)
    )(gradient, s_memory, y_memory, mem_count, gamma)


# Public op: un-batched calls run the XLA scan; a vmapped call (the batched
# solve) swaps in the fused batched kernel.
@jax.custom_batching.custom_vmap
def two_loop_direction(gradient, s_memory, y_memory, mem_count, gamma):
    return two_loop_direction_xla(
        gradient, s_memory, y_memory, mem_count, gamma, None
    )


@two_loop_direction.def_vmap
def _two_loop_vmap_rule(axis_size, in_batched, gradient, s, y, count, gamma):
    # Broadcast any un-batched operand along the new leading axis (happens
    # when e.g. all lanes share one stopping config-derived scalar).
    ops = [
        x if batched else jnp.broadcast_to(x, (axis_size,) + jnp.shape(x))
        for x, batched in zip((gradient, s, y, count, gamma), in_batched)
    ]
    out = two_loop_direction_batched(*ops)
    return out, True


# ---------------------------------------------------------------------------
# Fused history-push + two-loop (the full L-BFGS direction step)
# ---------------------------------------------------------------------------
#
# The reference updates the (s, y) history right after the line search
# (lbfgs.h:253-298) and runs the two-loop at the top of the next iteration
# (lbfgs.h:141-196).  Expressed naively in XLA the push alone costs several
# full HBM passes over the (B, m, n) buffers per iteration (roll + dynamic
# row write + two masked selects, each materialised), and the two-loop pays
# another read.  Relocating the push to the start of the following step makes
# push + two-loop one kernel: the history is read from HBM once, updated and
# consumed entirely in VMEM, and written back once — the minimum possible
# traffic for an op that must persist its history.  Algorithmically nothing
# moves: the push still happens after the previous step's invalid-descent /
# stall resets and before the next direction is computed, in exactly the
# reference's event order.


def push_history_xla(s_memory, y_memory, mem_count, gamma, s_new, y_new, valid):
    """Single-instance curvature-gated chronological append + gamma update.

    Mirrors lbfgs.h:253-298: accept the pair iff ``s.y > eps |s||y|`` (and the
    producing line search returned finite values — ``valid``); when the buffer
    is full shift out the oldest row; update the H0 scaling gamma (N&W 7.20)
    under the reference's finite/magnitude guards.
    """
    m = s_memory.shape[0]
    dtype = s_memory.dtype
    eps = jnp.finfo(dtype).eps

    sy = jnp.vdot(s_new, y_new)
    threshold = eps * jnp.linalg.norm(s_new) * jnp.linalg.norm(y_new)
    accept = jnp.logical_and(valid, sy > threshold)
    full = mem_count >= m
    slot = jnp.minimum(mem_count, m - 1)

    def push(buf, row):
        shifted = jnp.where(full, jnp.roll(buf, -1, axis=0), buf)
        return jnp.where(accept, shifted.at[slot].set(row), buf)

    s_out = push(s_memory, s_new)
    y_out = push(y_memory, y_new)
    count_out = jnp.where(
        jnp.logical_and(accept, ~full), mem_count + 1, mem_count
    )

    fallback = jnp.asarray(1e7, dtype)
    y2 = jnp.vdot(y_new, y_new)
    temp = sy / jnp.where(y2 > eps, y2, 1.0)
    ok = jnp.logical_and(
        jnp.logical_and(valid, y2 > eps),
        jnp.logical_and(jnp.isfinite(temp), jnp.abs(temp) <= fallback),
    )
    gamma_out = jnp.where(ok, jnp.maximum(temp, eps), gamma)
    return s_out, y_out, count_out, gamma_out


def _push_two_loop_core(
    g, count, gamma, valid, s_new, y_new,
    s_ref, y_ref, s_out_ref, y_out_ref,
    compact: bool = False,
    flat_n: int | None = None,
):
    """Shared VMEM-resident body: curvature-gated history push streamed into
    the output refs, then both two-loop passes on the updated history.
    ``g``/``s_new``/``y_new`` are loaded (TB, n) values; ``count``/``gamma``/
    ``valid`` are (TB, 1).  Returns ``(q, new_count, new_gamma)``.

    ``compact`` (static) selects the Gram-matrix formulation
    (:func:`_two_loop_compact`) that replaces the 2m-step serial reduction
    chain with independent reductions — the small-n regime's issue-rate fix;
    the sequential form stays the large-n default (its 2m reductions move
    less VMEM data than the Gram triangle, and at large n the kernel is
    bandwidth-bound, not latency-bound).

    ``flat_n`` (static) says the history refs are FLAT (TB, m*n) blocks with
    row r at lanes [r*n, (r+1)*n) — the layout used when n % 128 == 0: a
    (TB, m, n) block tiles its last two dims to (16, n) in VMEM, and the
    m=10 -> 16 sublane padding makes every history DMA scatter at ~60%
    efficiency (measured: the i/o share of the kernel ran at ~130 GB/s at
    (1024, 32)); the flat block has no middle dim to pad and its row slices
    are lane-aligned (n a multiple of 128), so both the DMA and the slices
    are free.

    Used by the fused push+two-loop kernel and by the full L-BFGS prologue
    kernel (ops/fused_step.py) which additionally folds the direction-
    validity fallback and line-search setup into the same residency."""
    if flat_n is None:
        m = s_ref.shape[1]

        def row(ref, r):
            return ref[:, r, :]

        def set_row(ref, r, v):
            ref[:, r, :] = v
    else:
        m = s_ref.shape[1] // flat_n

        def row(ref, r):
            return ref[:, r * flat_n:(r + 1) * flat_n]

        def set_row(ref, r, v):
            ref[:, r * flat_n:(r + 1) * flat_n] = v

    dtype = g.dtype
    eps = jnp.finfo(dtype).eps

    sy = jnp.sum(s_new * y_new, axis=-1, keepdims=True)
    s2 = jnp.sum(s_new * s_new, axis=-1, keepdims=True)
    y2 = jnp.sum(y_new * y_new, axis=-1, keepdims=True)
    threshold = eps * jnp.sqrt(s2) * jnp.sqrt(y2)
    accept = jnp.logical_and(valid, sy > threshold)
    full = count >= m
    slot = jnp.minimum(count, m - 1)
    new_count = jnp.where(
        jnp.logical_and(accept, jnp.logical_not(full)), count + 1, count
    )

    temp = sy / jnp.where(y2 > eps, y2, 1.0)
    gamma_ok = jnp.logical_and(
        jnp.logical_and(valid, y2 > eps),
        jnp.logical_and(jnp.isfinite(temp), jnp.abs(temp) <= 1e7),
    )
    new_gamma = jnp.where(gamma_ok, jnp.maximum(temp, eps), gamma)

    # Chronological append without gathers: per physical row r the updated
    # value is (a) s_new where this lane writes row r, (b) the shifted-down
    # next row where the lane is full (roll by one), (c) the old row
    # otherwise.  All VPU selects on VMEM-resident tiles.  Rows are streamed
    # straight into the output refs — keeping all m updated rows live as
    # values on top of the in+out blocks overflows the 16 MB scoped VMEM at
    # large n (observed at (tb=8, m=10, n=4096)); the two-loop passes below
    # re-read them from the (VMEM-resident) output blocks instead.
    accept_full = jnp.logical_and(accept, full)
    for r in range(m):
        if r < m - 1:
            base_s = jnp.where(accept_full, row(s_ref, r + 1), row(s_ref, r))
            base_y = jnp.where(accept_full, row(y_ref, r + 1), row(y_ref, r))
        else:
            base_s, base_y = row(s_ref, r), row(y_ref, r)
        write = jnp.logical_and(accept, slot == r)
        set_row(s_out_ref, r, jnp.where(write, s_new, base_s))
        set_row(y_out_ref, r, jnp.where(write, y_new, base_y))

    if compact:
        s_rows = [row(s_out_ref, r) for r in range(m)]
        y_rows = [row(y_out_ref, r) for r in range(m)]
        q = _two_loop_compact(g, new_gamma, new_count, s_rows, y_rows)
        return q, new_count, new_gamma

    # Two-loop recursion on the UPDATED history (see _two_loop_kernel for the
    # masking rationale).
    alphas = [None] * m
    denoms = [None] * m
    usables = [None] * m
    q = g
    for r in range(m - 1, -1, -1):
        s_r = row(s_out_ref, r)
        y_r = row(y_out_ref, r)
        active = new_count > r
        denom = jnp.sum(s_r * y_r, axis=-1, keepdims=True)
        usable = jnp.logical_and(active, jnp.abs(denom) >= eps)
        rho = jnp.where(usable, 1.0 / denom, 0.0)
        alpha = rho * jnp.sum(s_r * q, axis=-1, keepdims=True)
        q = jnp.where(usable, q - alpha * y_r, q)
        alphas[r], denoms[r], usables[r] = alpha, denom, usable

    q = q * new_gamma

    for r in range(m):
        s_r = row(s_out_ref, r)
        y_r = row(y_out_ref, r)
        usable = usables[r]
        rho = jnp.where(usable, 1.0 / denoms[r], 0.0)
        beta = rho * jnp.sum(y_r * q, axis=-1, keepdims=True)
        q = jnp.where(usable, q + s_r * (alphas[r] - beta), q)

    return q, new_count, new_gamma


def _two_loop_compact(g, gamma, new_count, s_rows, y_rows):
    """Compact-form two-loop: Gram-matrix reductions up front, serial
    recurrences on (TB, 1) scalars only.

    The classic two-loop (above) is a chain of 2m *serially dependent*
    (TB, n) row-reductions — at small n each reduction moves too little data
    to hide its latency, and the chain binds the kernel on VPU/DMA issue
    rate ~20x below the HBM roofline (ROOFLINE.md round 3, (1024, 32)).
    This form exposes the parallelism instead: expand the recursion so every
    O(n) reduction is independent —

        alpha_r = rho_r (s_r.g  - sum_{k>r} alpha_k s_r.y_k)     (backward)
        q_m     = g - sum_r alpha_r y_r
        beta_r  = rho_r (gamma y_r.q_m + sum_{k<r} c_k y_k.s_r)  (forward)
        r_out   = gamma q_m + sum_r c_r s_r,   c_r = alpha_r - beta_r

    The O(n) work (the strictly-upper Gram triangle s_a.y_b, the diagonal,
    S.g, Y.q_m, and two weighted row-sums) is m(m-1)/2 + 4m independent
    VPU reductions the pipeline can overlap; the only serial chains left are
    the m-step alpha/beta recurrences on (TB, 1) scalars.  Identical
    arithmetic to the sequential form up to reduction order (parity-tested
    both backends).  ``s_rows``/``y_rows`` are the m UPDATED history rows as
    loaded values.  Returns the direction ``r_out``.
    """
    m = len(s_rows)
    dtype = g.dtype
    eps = jnp.finfo(dtype).eps

    def rdot(a, b):
        return jnp.sum(a * b, axis=-1, keepdims=True)

    diag = [rdot(s_rows[r], y_rows[r]) for r in range(m)]
    usable = [
        jnp.logical_and(new_count > r, jnp.abs(diag[r]) >= eps)
        for r in range(m)
    ]
    rho = [
        jnp.where(usable[r], 1.0 / jnp.where(usable[r], diag[r], 1.0), 0.0)
        for r in range(m)
    ]
    sg = [rdot(s_rows[r], g) for r in range(m)]
    # Strictly-upper Gram triangle: SY[a][b] = s_a . y_b for a < b serves the
    # backward pass directly and the forward pass transposed (y_b . s_a).
    sy = {}
    for a in range(m):
        for b_ in range(a + 1, m):
            sy[(a, b_)] = rdot(s_rows[a], y_rows[b_])

    alphas = [None] * m
    for r in range(m - 1, -1, -1):
        acc = sg[r]
        for k in range(r + 1, m):
            acc = acc - alphas[k] * sy[(r, k)]
        alphas[r] = rho[r] * acc

    q = g
    for r in range(m):
        q = q - jnp.where(usable[r], alphas[r], 0.0) * y_rows[r]

    u = [rdot(y_rows[r], q) for r in range(m)]
    cs = [None] * m
    for r in range(m):
        acc = gamma * u[r]
        for k in range(r):
            acc = acc + cs[k] * sy[(k, r)]
        cs[r] = alphas[r] - rho[r] * acc

    out = q * gamma
    for r in range(m):
        out = out + jnp.where(usable[r], cs[r], 0.0) * s_rows[r]
    return out


# Static threshold for the compact (Gram-matrix) two-loop form
# (_two_loop_compact).  Round-4 v5e sweep at (B=1024, n=32), standalone
# push+two-loop kernel: compact 93.6 us vs sequential 125.0 us at tile 512 —
# but the *tile-1024 sequential* form wins outright (86.1 us; compact at
# tile 1024 regresses to 157.6 us, its extra Gram-triangle VMEM temps
# thrash at fat tiles), and end-to-end the compact prologue measured slower
# (230 vs 206 us/iter).  The compact form is therefore DISABLED by default
# and kept (parity-tested in interpret mode) as the documented negative
# result + the starting point if a future chip shifts the issue-rate/
# bandwidth balance.
COMPACT_N_MAX = 0


def _push_two_loop_kernel(
    g_ref, s_ref, y_ref, count_ref, gamma_ref, snew_ref, ynew_ref, valid_ref,
    d_ref, s_out_ref, y_out_ref, count_out_ref, gamma_out_ref,
    *, compact=False, flat_n=None,
):
    """One (TB, m, n) — or flat (TB, m*n) — block: history push, then both
    two-loop passes, all in a single VMEM residency.  Per-lane divergence
    (accept / slot / count) is vector masks; every lane runs the same
    static m-trip loops."""
    q, new_count, new_gamma = _push_two_loop_core(
        g_ref[:], count_ref[:], gamma_ref[:], valid_ref[:] != 0,
        snew_ref[:], ynew_ref[:], s_ref, y_ref, s_out_ref, y_out_ref,
        compact=compact, flat_n=flat_n,
    )
    d_ref[:] = q
    count_out_ref[:] = new_count
    gamma_out_ref[:] = new_gamma


@functools.partial(jax.jit, static_argnames=("interpret", "compact"))
def push_two_loop_pallas_batched(
    gradient: jax.Array,  # (B, n)
    s_memory: jax.Array,  # (B, m, n)
    y_memory: jax.Array,  # (B, m, n)
    mem_count: jax.Array,  # (B,) int32
    gamma: jax.Array,  # (B,)
    s_new: jax.Array,  # (B, n)
    y_new: jax.Array,  # (B, n)
    valid: jax.Array,  # (B,) bool
    interpret: bool = False,
    compact: bool | None = None,  # None = auto (n <= COMPACT_N_MAX)
):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, n = gradient.shape
    m = s_memory.shape[1]
    dtype = gradient.dtype

    # Same padding policy as two_loop_pallas_batched (sublane quantum only).
    # The block budget accounts for S/Y appearing as both input AND output
    # blocks (4 (m, n) blocks per lane); the tile must divide the batch
    # (_pick_tile_b).  v5e sweep: this reproduces the best-of-sweep tile at
    # every measured shape — 32 @ n=1024 (433 GB/s), 8 @ n=4096 (436),
    # 128 @ n=256 (249), 512 @ n=32 (80, latency-bound).
    n_pad = _round_up(n, _SUBLANE)
    itemsize = jnp.dtype(dtype).itemsize
    # Physical (tile-padded) per-lane bytes: 4 (m, n) history blocks
    # (s/y in+out) + 4 n-vector blocks (g, s_new, y_new, d out).
    bytes_per_lane = (
        4 * _phys_rows(m) * _phys_cols(n_pad) + 4 * _phys_cols(n_pad)
    ) * itemsize
    tb = _pick_tile_b(b, bytes_per_lane, _scoped_vmem_budget(n))
    b_pad = _round_up(b, tb)

    if n_pad == n:
        g, s, y, sn, yn = gradient, s_memory, y_memory, s_new, y_new
    else:
        g = jnp.zeros((b, n_pad), dtype).at[:, :n].set(gradient)
        s = jnp.zeros((b, m, n_pad), dtype).at[:, :, :n].set(s_memory)
        y = jnp.zeros((b, m, n_pad), dtype).at[:, :, :n].set(y_memory)
        sn = jnp.zeros((b, n_pad), dtype).at[:, :n].set(s_new)
        yn = jnp.zeros((b, n_pad), dtype).at[:, :n].set(y_new)
    if b_pad != b:
        g = jnp.zeros((b_pad, n_pad), dtype).at[:b].set(g)
        s = jnp.zeros((b_pad, m, n_pad), dtype).at[:b].set(s)
        y = jnp.zeros((b_pad, m, n_pad), dtype).at[:b].set(y)
        sn = jnp.zeros((b_pad, n_pad), dtype).at[:b].set(sn)
        yn = jnp.zeros((b_pad, n_pad), dtype).at[:b].set(yn)
    cnt = (
        jnp.zeros((b_pad, 1), jnp.int32)
        .at[:b, 0]
        .set(mem_count.astype(jnp.int32))
    )
    gam = jnp.zeros((b_pad, 1), dtype).at[:b, 0].set(gamma.astype(dtype))
    # Pad lanes carry valid=0 so they stay inert no-ops.
    vld = (
        jnp.zeros((b_pad, 1), jnp.int32)
        .at[:b, 0]
        .set(valid.astype(jnp.int32))
    )

    zero = np.int32(0)
    grid = (b_pad // tb,)
    vec = lambda i: (i, zero)  # noqa: E731
    mat = lambda i: (i, zero, zero)  # noqa: E731
    if compact is None:
        compact = n <= COMPACT_N_MAX
    # Flat history layout when the row width is lane-aligned: a (tb, m, n)
    # block pads m=10 -> 16 sublanes in VMEM and every history DMA scatters
    # at ~60% efficiency; the bitcast-free (tb, m*n) view has no middle dim
    # and its row slices are free (see _push_two_loop_core's flat_n note).
    # Gate by measurement (v5e standalone kernel): flat wins 1.76x at
    # n=256 (180 -> 102 us) but LOSES ~1.8x at n>=1024 (424 -> 771 us at
    # (1024,1024)) — very wide lane-dim blocks (tb, 10240+) lower poorly.
    flat = n_pad % 128 == 0 and n_pad <= 256
    flat_n = n_pad if flat else None
    if flat:
        s = s.reshape(b_pad, m * n_pad)
        y = y.reshape(b_pad, m * n_pad)
        hist_shape = (b_pad, m * n_pad)
        hspec = pl.BlockSpec((tb, m * n_pad), vec, memory_space=pltpu.VMEM)
    else:
        hist_shape = (b_pad, m, n_pad)
        hspec = pl.BlockSpec((tb, m, n_pad), mat, memory_space=pltpu.VMEM)
    d, s_out, y_out, cnt_out, gam_out = pl.pallas_call(
        functools.partial(
            _push_two_loop_kernel, compact=compact, flat_n=flat_n
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b_pad, n_pad), dtype),
            jax.ShapeDtypeStruct(hist_shape, dtype),
            jax.ShapeDtypeStruct(hist_shape, dtype),
            jax.ShapeDtypeStruct((b_pad, 1), jnp.int32),
            jax.ShapeDtypeStruct((b_pad, 1), dtype),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tb, n_pad), vec, memory_space=pltpu.VMEM),
            hspec,
            hspec,
            pl.BlockSpec((tb, 1), vec, memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, 1), vec, memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, n_pad), vec, memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, n_pad), vec, memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, 1), vec, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tb, n_pad), vec, memory_space=pltpu.VMEM),
            hspec,
            hspec,
            pl.BlockSpec((tb, 1), vec, memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, 1), vec, memory_space=pltpu.VMEM),
        ),
        # Donate the padded history buffers into the outputs: the op's HBM
        # traffic is exactly one read + one write of the history.
        input_output_aliases={1: 1, 2: 2},
        # In+out S/Y blocks double-buffered plus unrolled-loop temporaries
        # exceed the compiler's default 16 MiB scoped-VMEM cap at large n
        # even at the minimum 8-lane tile (observed 16.54M at n=4096);
        # production TPUs carry 128 MiB physical VMEM, so raise the
        # per-kernel cap (see _vmem_limit_bytes) instead of spilling to a
        # slower lowering; unknown kinds keep the default cap with a
        # matching smaller tile budget.
        compiler_params=_pltpu_compiler_params(pltpu, _vmem_limit_bytes()),
        interpret=interpret,
    )(g, s, y, cnt, gam, sn, yn, vld)
    if flat:
        s_out = s_out.reshape(b_pad, m, n_pad)
        y_out = y_out.reshape(b_pad, m, n_pad)
    return (
        d[:b, :n],
        s_out[:b, :, :n],
        y_out[:b, :, :n],
        cnt_out[:b, 0],
        gam_out[:b, 0].astype(gamma.dtype),
    )


def _push_two_loop_batched(
    gradient, s_memory, y_memory, mem_count, gamma, s_new, y_new, valid
):
    if jax.default_backend() == "tpu" and gradient.dtype != jnp.float64:
        return push_two_loop_pallas_batched(
            gradient, s_memory, y_memory, mem_count, gamma, s_new, y_new, valid
        )

    def one(g, s, y, c, ga, sn, yn, v):
        s2, y2, c2, ga2 = push_history_xla(s, y, c, ga, sn, yn, v)
        d = two_loop_direction_xla(g, s2, y2, c2, ga2, None)
        return d, s2, y2, c2, ga2

    return jax.vmap(one)(
        gradient, s_memory, y_memory, mem_count, gamma, s_new, y_new, valid
    )


# Public fused op: un-batched calls compose the XLA pieces; a vmapped call
# (the batched solve path) lowers to the single fused Pallas kernel on TPU.
@jax.custom_batching.custom_vmap
def lbfgs_push_and_direction(
    gradient, s_memory, y_memory, mem_count, gamma, s_new, y_new, valid
):
    s2, y2, c2, ga2 = push_history_xla(
        s_memory, y_memory, mem_count, gamma, s_new, y_new, valid
    )
    d = two_loop_direction_xla(gradient, s2, y2, c2, ga2, None)
    return d, s2, y2, c2, ga2


@lbfgs_push_and_direction.def_vmap
def _push_two_loop_vmap_rule(
    axis_size, in_batched, gradient, s, y, count, gamma, s_new, y_new, valid
):
    ops = [
        x if batched else jnp.broadcast_to(x, (axis_size,) + jnp.shape(x))
        for x, batched in zip(
            (gradient, s, y, count, gamma, s_new, y_new, valid), in_batched
        )
    ]
    out = _push_two_loop_batched(*ops)
    return out, (True,) * 5
