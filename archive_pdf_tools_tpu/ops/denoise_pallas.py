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


# ---- bit-plane in-row prefix (n=2 only) ---------------------------------
#
# The in-row FSM has 4 states (a, b) = (out[x-1], out[x]); a segment's
# composed map M is stored as 8 one-bit-per-COLUMN planes P[st], Q[st]
# (the map's output state is (p, q)), packed 32 columns per int32 lane.
# Composition M12 = M2 o M1 is then 4 mux-by-minterm selects — ~80
# whole-word ops on arrays 32x smaller than the per-column packed-table
# form, vs 28 ops on the wide arrays (measured ~5x fewer vreg-ops per
# row).  Packing rides the MXU: bits -> words is a matmul against
# 2^(i%32) selection matrices (split in 16-bit halves so f32 sums stay
# exact), unpack is the transpose broadcast + per-lane bit extract.
# Algebra validated bit-exactly against the serial recurrence (and the
# packed-table kernel) on randomized rows before landing.

_ID_P = (0, 0, 1, 1)    # identity map: p(a, b) = a
_ID_Q = (0, 1, 0, 1)    #               q(a, b) = b


def _bp_compose(P1, Q1, P2, Q2):
    """M12 = M2 after M1; P*/Q* are 4-tuples of packed-word arrays."""
    P12 = []
    Q12 = []
    for st in range(4):
        p1 = P1[st]
        q1 = Q1[st]
        np1 = ~p1
        nq1 = ~q1
        m00 = np1 & nq1
        m01 = np1 & q1
        m10 = p1 & nq1
        m11 = p1 & q1
        Q12.append((m00 & Q2[0]) | (m01 & Q2[1]) | (m10 & Q2[2])
                   | (m11 & Q2[3]))
        P12.append((m00 & P2[0]) | (m01 & P2[1]) | (m10 & P2[2])
                   | (m11 & P2[3]))
    return P12, Q12


def _bp_row_prefix(q0, q1, q2, wlo_ref, whi_ref, scat_ref, wp):
    """Per-column inclusive-prefix evaluation at state 0 for one row.

    q0/q1/q2: (B, Wp) int32 0/1 planes ([tau<=0], [tau<=1], [tau<=2]
    with forced rules applied).  Returns the (B, Wp) int32 out row."""
    f32 = jnp.float32
    i32 = jnp.int32
    nw = wp // 32

    def pack(q):
        qf = q.astype(f32)
        lo = jax.lax.dot_general(qf, wlo_ref[...], (((1,), (0,)),
                                                    ((), ())),
                                 preferred_element_type=f32)
        hi = jax.lax.dot_general(qf, whi_ref[...], (((1,), (0,)),
                                                    ((), ())),
                                 preferred_element_type=f32)
        return lo.astype(i32) | (hi.astype(i32) << 16)

    w0 = pack(q0)
    w1 = pack(q1)
    w2 = pack(q2)
    ones = jnp.full_like(w0, -1)
    zeros = jnp.zeros_like(w0)
    P = [zeros, ones, zeros, ones]      # atomic p(a, b) = b
    Q = [w0, w1, w1, w2]

    # in-word inclusive prefix: 5 doubling steps, identity fill
    for k in (1, 2, 4, 8, 16):
        mask = (1 << k) - 1
        Ps = [(P[st] << k) | (mask if _ID_P[st] else 0)
              for st in range(4)]
        Qs = [(Q[st] << k) | (mask if _ID_Q[st] else 0)
              for st in range(4)]
        P, Q = _bp_compose(Ps, Qs, P, Q)

    # per-word totals (bit 31) -> cross-word inclusive prefix
    TP = [(P[st] >> 31) & 1 for st in range(4)]
    TQ = [(Q[st] >> 31) & 1 for st in range(4)]
    lanes_w = jax.lax.broadcasted_iota(i32, TP[0].shape,
                                       TP[0].ndim - 1)
    k = 1
    while k < nw:
        TPs = [jnp.where(lanes_w >= k,
                         jnp.roll(TP[st], k, axis=-1), _ID_P[st])
               for st in range(4)]
        TQs = [jnp.where(lanes_w >= k,
                         jnp.roll(TQ[st], k, axis=-1), _ID_Q[st])
               for st in range(4)]
        TP, TQ = _bp_compose(TPs, TQs, TP, TQ)
        k *= 2

    # exclusive prefix at state 0 -> per-word start state (sa, sb)
    sa = jnp.where(lanes_w >= 1, jnp.roll(TP[0], 1, axis=-1), 0)
    sb = jnp.where(lanes_w >= 1, jnp.roll(TQ[0], 1, axis=-1), 0)
    ma = -sa                         # 0/1 -> all-zeros / all-ones
    mb = -sb
    out_w = (~ma & ~mb & Q[0]) | (~ma & mb & Q[1]) | (ma & ~mb & Q[2]) \
        | (ma & mb & Q[3])

    # unpack: broadcast each word's four BYTES to its 32 lanes, then
    # extract this lane's bit.  Bytes, not 16-bit halves: the real
    # chip's default-precision MXU truncates f32 operands to bf16
    # (integers exact only up to 2^8), so values > 255 through the
    # broadcast matmul silently corrupt — measured on v5e 2026-08-18;
    # interpret mode (pure f32) cannot catch this.
    def bcast(byte_vals):
        return jax.lax.dot_general(byte_vals.astype(f32), scat_ref[...],
                                   (((1,), (0,)), ((), ())),
                                   preferred_element_type=f32).astype(i32)

    b0 = bcast(out_w & 0xFF)
    b1 = bcast((out_w >> 8) & 0xFF)
    b2 = bcast((out_w >> 16) & 0xFF)
    b3 = bcast((out_w >> 24) & 0xFF)
    lanes = jax.lax.broadcasted_iota(i32, b0.shape, b0.ndim - 1)
    bsel = (lanes % 32) >> 3
    byte = jnp.where(bsel == 0, b0,
                     jnp.where(bsel == 1, b1,
                               jnp.where(bsel == 2, b2, b3)))
    return (byte >> (lanes % 8)) & 1


def _bp_matrices(wp):
    """Host-side constant matrices: pack (Wp, Wp//32) x2 and the
    word->lanes scatter (Wp//32, Wp), f32."""
    import numpy as np
    nw = wp // 32
    i = np.arange(wp)
    wlo = np.zeros((wp, nw), np.float32)
    whi = np.zeros((wp, nw), np.float32)
    bit = i % 32
    sel = bit < 16
    wlo[i[sel], (i // 32)[sel]] = (2.0 ** bit[sel])
    whi[i[~sel], (i // 32)[~sel]] = (2.0 ** (bit[~sel] - 16))
    scat = np.zeros((nw, wp), np.float32)
    scat[i // 32, i] = 1.0
    return wlo, whi, scat


def _make_kernel(n, mincnt, h, w, wp, nstates, mf, identity,
                 bitplane=False):
    rn = n + 1   # original row stays live from BOT-add to its own turn

    def kernel(msk_a_ref, *rest):
        if bitplane:
            wlo_ref, whi_ref, scat_ref = rest[:3]
            out_ref, botcol, topcol, ring, in_ring = rest[3:]
        else:
            wlo_ref = whi_ref = scat_ref = None
            out_ref, botcol, topcol, ring, in_ring = rest
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

            if bitplane:
                # [tau <= t] planes with the forced rules folded in
                keep = jnp.logical_and(border, m_row > 0)
                free = jnp.logical_and(jnp.logical_not(border),
                                       m_row > 0)
                q0 = jnp.where(keep | (free & (tau <= 0)), 1, 0)
                q1 = jnp.where(keep | (free & (tau <= 1)), 1, 0)
                q2 = jnp.where(keep | (free & (tau <= 2)), 1, 0)
                out_row = _bp_row_prefix(q0, q1, q2, wlo_ref, whi_ref,
                                         scat_ref, wp)
            else:
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

                t_by_tau = [packed(lambda st, tt=tt:
                                   bin(st).count('1') >= tt)
                            for tt in range(n + 2)]
                tau_c = jnp.clip(tau, 0, n + 1)
                table = jnp.full_like(m_row, t_by_tau[n + 1])
                for tt in range(n, -1, -1):
                    table = jnp.where(tau_c == tt, t_by_tau[tt], table)
                table = jnp.where(
                    forced,
                    jnp.where(m_row > 0, t_by_tau[0], t_by_tau[n + 1]),
                    table)

                prefix = _prefix_compose(table, wp, n, nstates, mf,
                                         identity)
                out_row = prefix & mf & 1   # newest state bit from s0=0

            out_ref[0] = out_row.astype(jnp.uint8)

            slot = y % n
            oldest = ring[pl.ds(slot, 1)][0]
            topcol[...] = topcol[...] + out_row - oldest
            ring[pl.ds(slot, 1)] = out_row[None]

    return kernel


def _use_bitplane(n):
    # default 'bitplane' since the 2026-08-18 chip A/Bs: standalone
    # 101.8 vs 114.9 ms (-11%), fused 196.8 vs 191.0 pages/s
    # (tools/despeckle_ab.py / tools/fused_ab.py, interleaved).
    # APT_DESPECKLE=tables opts back into the packed-table prefix;
    # interpret-mode bit-exactness is test-covered for both.
    import os
    return n == 2 and os.environ.get('APT_DESPECKLE', 'bitplane') \
        == 'bitplane'


@functools.partial(jax.jit, static_argnames=('mincnt', 'n_size',
                                             'interpret', 'bitplane'))
def fast_mask_denoise_pallas(mask, mincnt=4, n_size=2, interpret=False,
                             bitplane=None):
    """Drop-in for fast_mask_denoise_exact; bool (B, H, W) in/out.

    bitplane: use the MXU-packed bit-plane in-row prefix (n=2 only).
    Default: packed tables, unless APT_DESPECKLE=bitplane (read at
    trace time — set it before the first call, not mid-process)."""
    n = int(n_size)
    assert 1 <= n <= 3
    if bitplane is None:
        bitplane = _use_bitplane(n)
    bitplane = bool(bitplane) and n == 2
    nstates = 1 << n
    mf = nstates - 1
    identity = 0
    for st in range(nstates):
        identity |= st << (n * st)

    b, h, w = mask.shape
    # lane headroom for the windowed-sum shift; the bit-plane pack
    # needs a whole number of 32-column words (128-multiples are)
    wp = -(-(w + n) // 128) * 128
    mi = jnp.transpose(mask.astype(jnp.uint8), (1, 0, 2))   # (H, B, W)
    if wp != w:
        mi = jnp.pad(mi, ((0, 0), (0, 0), (0, wp - w)))

    add_row = lambda s: jnp.minimum(s, h - 1)
    out_row = lambda s: jnp.maximum(s - n, 0)

    def spec(f):
        return pl.BlockSpec((1, b, wp), lambda s: (f(s), 0, 0))

    extra_in = []
    extra_specs = []
    if bitplane:
        nw = wp // 32
        wlo, whi, scat = _bp_matrices(wp)
        extra_in = [jnp.asarray(wlo), jnp.asarray(whi),
                    jnp.asarray(scat)]
        extra_specs = [
            pl.BlockSpec((wp, nw), lambda s: (0, 0)),
            pl.BlockSpec((wp, nw), lambda s: (0, 0)),
            pl.BlockSpec((nw, wp), lambda s: (0, 0)),
        ]

    out = pl.pallas_call(
        _make_kernel(n, mincnt, h, w, wp, nstates, mf, identity,
                     bitplane=bitplane),
        grid=(h + n,),
        in_specs=[spec(add_row)] + extra_specs,
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
    )(mi, *extra_in)

    return jnp.transpose(out, (1, 0, 2))[:, :, :w].astype(bool)
