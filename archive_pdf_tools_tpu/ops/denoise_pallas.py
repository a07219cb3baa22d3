"""Fused Pallas TPU kernel for the exact sequential mask despeckle.

Same bit-exact semantics as ops.denoise.fast_mask_denoise_exact (see
there for the derivation from ``optimiser.pyx:436-472``), restructured
as one streamed row walk: grid (H + n,) with n warmup steps priming the
below-window column sums; VMEM scratch holds the last n produced rows
(TOP contributions, via a ring) and the original-row column sums of the
lookahead window (BOT).  The in-row recurrence over the last n produced
bits runs as a lane-parallel prefix composition of packed 2^n-state
transition tables (pure shift/mask arithmetic, log2(W) doubling steps).
Layout (H, B, W): rows lead the grid, batch on sublanes, width on lanes.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .optimise_pallas import _window_sum_lanes, _shift_left_zero


def _compose(a, b, nbits, nstates, mf):
    """Packed-table composition: out[s] = b[a[s]] for n-bit fields.
    (A constant-shift + select-chain variant measured 13% slower than
    the vector-variable shift on v5e.)"""
    out = jnp.zeros_like(a)
    for s in range(nstates):
        a_s = (a >> (nbits * s)) & mf
        b_at = (b >> (nbits * a_s)) & mf
        out = out | (b_at << (nbits * s))
    return out


def _prefix_compose(tables, width, nbits, nstates, mf, identity):
    """P_x = T_0 o ... o T_x along the lane axis via doubling."""
    lanes = jax.lax.broadcasted_iota(jnp.int32, tables.shape,
                                     tables.ndim - 1)
    p = tables
    k = 1
    while k < width:
        shifted = jnp.where(lanes >= k,
                            jnp.roll(p, k, axis=p.ndim - 1), identity)
        p = _compose(shifted, p, nbits, nstates, mf)
        k *= 2
    return p


def _make_kernel(n, mincnt, h, w, wp, nstates, mf, identity):
    rn = n + 1   # original row stays live from BOT-add to its own turn

    def kernel(msk_a_ref, out_ref, botcol, topcol, ring, in_ring):
        s = pl.program_id(0)
        y = s - n

        @pl.when(s == 0)
        def _():
            botcol[...] = jnp.zeros_like(botcol)
            topcol[...] = jnp.zeros_like(topcol)
            ring[...] = jnp.zeros_like(ring)

        # BOT add: original row s enters the lookahead window [y+1, y+n];
        # the raw row goes into a VMEM ring for its own turn n steps on
        @pl.when(s < h)
        def _():
            in_ring[pl.ds(s % rn, 1)] = msk_a_ref[...]
            botcol[...] = botcol[...] + msk_a_ref[0].astype(jnp.int32)

        @pl.when(y >= 0)
        def _():
            m_row = in_ring[pl.ds(y % rn, 1)][0].astype(jnp.int32)
            # BOT remove: row y leaves the below-window
            botcol[...] = botcol[...] - m_row

            # horizontal [x-n, x+n] windows of top/bot column sums
            # (direct windowed sums: zero outside [0, w) clamps for
            # free; wp >= w + n keeps the left shift in-range)
            def win(colv):
                return _shift_left_zero(
                    _window_sum_lanes(colv, 2 * n + 1), n, wp)

            top = win(topcol[...])
            bot = win(botcol[...])
            # CUR: original row y, cols [x+1, x+n]
            cur = _shift_left_zero(_window_sum_lanes(m_row, n), n, wp)

            tau = mincnt - top - bot - cur

            lanes = jax.lax.broadcasted_iota(jnp.int32, m_row.shape, 1)
            border = jnp.logical_or(
                jnp.logical_or(lanes < n, lanes >= w - n),
                jnp.logical_or(y < n, y >= h - n))
            forced = jnp.logical_or(m_row == 0, border)

            # Each pixel's transition is one of n+2 constant tables
            # (u(st) = popcount(st) >= tau, with tau clipped to
            # [0, n+1]); forced pixels use the constant-u tables.
            # Selecting among compile-time packed tables is cheaper
            # than building the table per state.
            def packed(ufn):
                t = 0
                for st in range(nstates):
                    t |= (((st << 1) | (1 if ufn(st) else 0)) & mf) \
                        << (n * st)
                return t

            t_by_tau = [packed(lambda st, tt=tt: bin(st).count('1') >= tt)
                        for tt in range(n + 2)]
            tau_c = jnp.clip(tau, 0, n + 1)
            table = jnp.full_like(m_row, t_by_tau[n + 1])
            for tt in range(n, -1, -1):
                table = jnp.where(tau_c == tt, t_by_tau[tt], table)
            table = jnp.where(
                forced,
                jnp.where(m_row > 0, t_by_tau[0], t_by_tau[n + 1]),
                table)

            prefix = _prefix_compose(table, wp, n, nstates, mf, identity)
            out_row = prefix & mf & 1    # newest bit of state from s0=0

            out_ref[0] = out_row.astype(jnp.uint8)

            slot = y % n
            oldest = ring[pl.ds(slot, 1)][0]
            topcol[...] = topcol[...] + out_row - oldest
            ring[pl.ds(slot, 1)] = out_row[None]

    return kernel


@functools.partial(jax.jit, static_argnames=('mincnt', 'n_size', 'interpret'))
def fast_mask_denoise_pallas(mask, mincnt=4, n_size=2, interpret=False):
    """Drop-in for fast_mask_denoise_exact; bool (B, H, W) in/out."""
    n = int(n_size)
    assert 1 <= n <= 3
    nstates = 1 << n
    mf = nstates - 1
    identity = 0
    for st in range(nstates):
        identity |= st << (n * st)

    b, h, w = mask.shape
    wp = -(-(w + n) // 128) * 128  # headroom for the windowed-sum shift
    mi = jnp.transpose(mask.astype(jnp.uint8), (1, 0, 2))   # (H, B, W)
    if wp != w:
        mi = jnp.pad(mi, ((0, 0), (0, 0), (0, wp - w)))

    add_row = lambda s: jnp.minimum(s, h - 1)
    out_row = lambda s: jnp.maximum(s - n, 0)

    def spec(f):
        return pl.BlockSpec((1, b, wp), lambda s: (f(s), 0, 0))

    out = pl.pallas_call(
        _make_kernel(n, mincnt, h, w, wp, nstates, mf, identity),
        grid=(h + n,),
        in_specs=[spec(add_row)],
        out_specs=pl.BlockSpec((1, b, wp), lambda s: (out_row(s), 0, 0)),
        out_shape=jax.ShapeDtypeStruct((h, b, wp), jnp.uint8),
        scratch_shapes=[
            pltpu.VMEM((b, wp), jnp.int32),       # botcol
            pltpu.VMEM((b, wp), jnp.int32),       # topcol
            pltpu.VMEM((n, b, wp), jnp.int32),    # ring (produced rows)
            pltpu.VMEM((n + 1, b, wp), jnp.uint8),  # original rows
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(mi,)

    return jnp.transpose(out, (1, 0, 2))[:, :, :w].astype(bool)
