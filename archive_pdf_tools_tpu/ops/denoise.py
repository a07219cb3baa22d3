"""Fast mask despeckle, TPU-native.

Re-derivation of ``optimiser.pyx:436-472`` (fast_mask_denoise): scanning
the mask interior in row-major order, a set pixel survives iff its
(2n+1)^2 neighbourhood — in the *partially updated* mask — contains at
least ``mincnt`` other set pixels.  The call site uses (mincnt=4, n=2)
(``mrc.py:388``).

The sequential semantics decompose per pixel into
  cnt = TOP (final rows y-n..y-1)  +  BOT (original rows y+1..y+n)
      + CUR (original row y, cols x+1..x+n)
      + popcount(last n updated bits of this row)  + 1 (self)
so within a row the only recurrence is through the last n produced bits.
We encode each pixel as a transition on that 2^n-state machine, pack the
whole table into one int32 (n-bit fields), and compose tables with
``lax.associative_scan`` using only shifts/ands — giving the exact
sequential result with log-depth parallelism.  Rows are an outer
``lax.scan`` carrying the last n final rows.

``fast_mask_denoise(..., exact=False)`` is a single-pass Jacobi
approximation (neighbourhood counts on the unmodified mask) for when
throughput matters more than bit parity.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp

from .window import box_sum_2d, sliding_sum


def _interior(h, w, n):
    m = np.zeros((h, w), dtype=bool)
    m[n:h - n, n:w - n] = True
    return m


@functools.partial(jax.jit, static_argnames=('mincnt', 'n_size'))
def fast_mask_denoise_jacobi(mask, mincnt, n_size):
    """One-pass despeckle using original-neighbourhood counts (approximate)."""
    n = int(n_size)
    h, w = mask.shape[-2], mask.shape[-1]
    mi = mask.astype(jnp.int32)
    cnt = box_sum_2d(mi, (-n, n + 1), (-n, n + 1)) - 1
    interior = jnp.asarray(_interior(h, w, n))
    keep = jnp.logical_or(~interior, cnt >= mincnt)
    return jnp.logical_and(mask, keep)


@functools.partial(jax.jit, static_argnames=('mincnt', 'n_size'))
def fast_mask_denoise_exact(mask, mincnt, n_size):
    """Bit-exact sequential despeckle. mask: bool (B, H, W), n_size <= 3."""
    n = int(n_size)
    assert 1 <= n <= 3, 'exact path packs 2^n n-bit fields into int32'
    nstates = 1 << n
    mf = nstates - 1
    b, h, w = mask.shape
    mi = mask.astype(jnp.int32)

    # precomputed original-mask contributions
    bot = box_sum_2d(mi, (1, n + 1), (-n, n + 1))          # rows below
    cur = sliding_sum(mi, 1, n + 1, axis=-1)               # right of self

    col_interior = jnp.asarray(
        (np.arange(w) >= n) & (np.arange(w) < w - n))

    def rows(a):
        return jnp.moveaxis(a, 1, 0)                        # (H, B, W)

    scan_xs = (rows(mi), rows(bot), rows(cur),
               jnp.arange(h, dtype=jnp.int32))
    ring0 = jnp.zeros((n, b, w), jnp.int32)
    colsum0 = jnp.zeros((b, w), jnp.int32)

    pc = np.array([bin(s).count('1') for s in range(nstates)], dtype=np.int32)

    def step(carry, xs):
        ring, colsum = carry
        m_row, bot_row, cur_row, y = xs
        top = sliding_sum(colsum, -n, n + 1, axis=-1)       # finished rows
        tau = mincnt - top - bot_row - cur_row              # pc(s) >= tau

        row_interior = jnp.logical_and(y >= n, y < h - n)
        forced = jnp.logical_or(m_row == 0,
                                jnp.logical_or(~col_interior[None, :],
                                               ~row_interior))
        # packed transition table: field s holds next state (s<<1 | u) & mf
        table = jnp.zeros_like(m_row)
        for s in range(nstates):
            u = jnp.where(forced, m_row, (pc[s] >= tau).astype(jnp.int32))
            nxt = ((s << 1) | u) & mf
            table = table | (nxt << (n * s))

        def compose(a, bb):
            out = jnp.zeros_like(a)
            for s in range(nstates):
                a_s = (a >> (n * s)) & mf
                b_at = (bb >> (n * a_s)) & mf
                out = out | (b_at << (n * s))
            return out

        prefix = jax.lax.associative_scan(compose, table, axis=-1)
        state = prefix & mf                                  # applied to s0=0
        out_row = state & 1

        slot = y % n
        oldest = jax.lax.dynamic_index_in_dim(ring, slot, 0, keepdims=False)
        colsum = colsum + out_row - oldest
        ring = jax.lax.dynamic_update_index_in_dim(ring, out_row, slot, 0)
        return (ring, colsum), out_row

    _, out_rows = jax.lax.scan(step, (ring0, colsum0), scan_xs)
    return jnp.moveaxis(out_rows, 0, 1).astype(bool)


def fast_mask_denoise(mask, mincnt=4, n_size=2, exact=True):
    """Drop-in for the reference call (``mrc.py:388``), batched (B, H, W)."""
    if exact and n_size <= 3:
        return fast_mask_denoise_exact(mask, mincnt, n_size)
    return fast_mask_denoise_jacobi(mask, mincnt, n_size)
