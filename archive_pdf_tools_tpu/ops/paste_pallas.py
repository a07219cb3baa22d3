"""Pallas kernel: ordered paste of selected line crops into page masks.

Replaces the ``lax.scan`` formulation of
``mrc/decompose.py:paste_selected_crops`` (reference semantics
``mrc.py:265-266``: line crops overwrite the page map in document
order, last line wins) with one kernel pass:

  the grid walks PG-line groups, all lines of a group on the same page;
  the output block is the WHOLE page column (revisited across that
  page's groups, zeroed on the page's first group), so each line is a
  read-modify-write of an 8-row-aligned VMEM slab — no serial
  full-buffer scan, no scatter.  Crop buffers stream in as blocks
  indexed by a scalar-prefetched line id.  Unvisited pages keep the
  zeros of the aliased input buffer.

The host groups lines with ``build_paste_plan``: selected lines only,
grouped by page (document order within a page is preserved, which is
the only order that matters — lines of different pages cannot overlap).

Crop rows are 8-aligned in page coordinates (``lines_pallas``): crop
row k of line j holds page row (t_j & ~7) + k, so the slab write starts
on a sublane tile boundary.
"""

import functools
import os

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# lines per grid step (sequential sub-pastes, same page).  The measured
# default is PG=4 with separate plain/inverse crop streams; the
# APT_PASTE=combined8 opt-in (read at import) switches to PG=8 with both
# polarities of a line riding ONE input stream — half the per-step DMA
# issues for the same bytes (chip A/B pending, TODO.md).
_COMBINED = os.environ.get('APT_PASTE', '') == 'combined8'
PG = 8 if _COMBINED else 4


def build_paste_plan(boxes, pages, selector, bsz, pg=PG):
    """Host-side grouping of selected lines for ``paste_crops_pallas``.

    boxes: (4, n) int32 rows t, b, l, r; pages: (n,); selector: (n,)
    0=skip / 1=plain / 2=inverse.  Within each page, line order is
    preserved (document order).  Returns a dict of int32 numpy arrays:
    per-entry ``li, t, b, l, r, sel`` of static length
    round_up(n + bsz*(pg-1), pg) and per-group ``gpage, gfirst``.
    """
    boxes = np.asarray(boxes)
    pages = np.asarray(pages)
    sel = np.asarray(selector)
    n = boxes.shape[1]
    cap = -(-(n + bsz * (pg - 1)) // pg) * pg

    per_page = {}
    order = []
    for i in range(n):
        if sel[i] > 0:
            p = int(pages[i])
            if p not in per_page:
                per_page[p] = []
                order.append(p)
            per_page[p].append(i)

    li = np.zeros(cap, np.int32)
    ent = np.zeros((4, cap), np.int32)
    esel = np.zeros(cap, np.int32)
    gpage = np.zeros(cap // pg, np.int32)
    gfirst = np.zeros(cap // pg, np.int32)

    pos = 0
    for p in order:
        ids = per_page[p]
        g0 = pos // pg
        gfirst[g0] = 1
        for i in ids:
            li[pos] = i
            ent[:, pos] = boxes[:, i]
            esel[pos] = sel[i]
            pos += 1
        while pos % pg:
            pos += 1                      # sel=0 padding, same group page
        gpage[g0:pos // pg] = p
    # trailing groups: keep the last visited page (re-flushes its block
    # unchanged); if nothing was selected, zero page 0's block instead
    last = order[-1] if order else 0
    gpage[pos // pg:] = last
    if not order:
        gfirst[0] = 1
    return {'li': li, 't': ent[0], 'b': ent[1], 'l': ent[2], 'r': ent[3],
            'sel': esel, 'gpage': gpage, 'gfirst': gfirst}


def _make_kernel(mh8, hp8, wpp, pg, combined):
    def kernel(li_ref, t_ref, b_ref, l_ref, r_ref, sel_ref,
               gpage_ref, gfirst_ref, *refs):
        if combined:
            crop_refs = refs[0:pg]        # (1, 2, mh8, 8, wpp) each:
            out_ref = refs[pg + 1]        # both polarities, one stream;
        else:                             # refs[pg] is the aliased init
            ct_refs = refs[0:pg]
            ci_refs = refs[pg:2 * pg]
            out_ref = refs[2 * pg + 1]    # refs[2*pg] is the aliased init
        g = pl.program_id(0)

        @pl.when(gfirst_ref[g] == 1)
        def _():
            out_ref[...] = jnp.zeros_like(out_ref)

        shape = (mh8, 8, wpp)
        r3 = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
        r2 = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
        rows = r3 * 8 + r2
        lanes = jax.lax.broadcasted_iota(jnp.int32, shape, 2)

        for j in range(pg):
            idx = g * pg + j
            tt = t_ref[idx]
            bb = b_ref[idx]
            ll = l_ref[idx]
            rr = r_ref[idx]
            sel = sel_ref[idx]
            off = tt % 8
            tal8 = tt // 8

            ok = jnp.logical_and(
                jnp.logical_and(rows >= off, rows < off + (bb - tt)),
                jnp.logical_and(jnp.logical_and(lanes >= ll, lanes < rr),
                                sel > 0))
            if combined:
                chosen = jnp.where(sel == 1, crop_refs[j][0, 0],
                                   crop_refs[j][0, 1])
            else:
                chosen = jnp.where(sel == 1, ct_refs[j][0], ci_refs[j][0])
            cur = out_ref[0, pl.ds(tal8, mh8)]
            out_ref[0, pl.ds(tal8, mh8)] = jnp.where(ok, chosen, cur)

    return kernel


@functools.partial(jax.jit, static_argnames=('interpret', 'combined'))
def paste_crops_pallas(crops_t, crops_i, li, t, b, l, r, sel,
                       gpage, gfirst, global_mask, interpret=False,
                       combined=None):
    """crops_*: (n, max_h, Wp) uint8 8-aligned line crops; plan arrays
    from ``build_paste_plan``; global_mask: bool (B, H, W).  Returns
    bool (B, H, W): pasted crops (document order, last wins) OR the
    global mask.  ``pg`` is inferred from the plan; ``combined``
    selects the one-stream-both-polarities layout (default: the
    module's APT_PASTE import-time choice)."""
    if combined is None:
        combined = _COMBINED
    bsz, h, w = global_mask.shape
    n, max_h, wpp = crops_t.shape
    assert max_h % 8 == 0
    mh8 = max_h // 8
    hp8 = -(-(h + max_h) // 8)
    cap = li.shape[0]
    assert cap % gpage.shape[0] == 0
    pg = cap // gpage.shape[0]

    ct4 = crops_t.reshape(n, mh8, 8, wpp)
    ci4 = crops_i.reshape(n, mh8, 8, wpp)
    init = jnp.zeros((bsz, hp8, 8, wpp), jnp.uint8)

    if combined:
        # both polarities of a line ride ONE input stream: half the
        # per-step DMA issues of separate ct/ci streams (same bytes)
        crops = jnp.stack((ct4, ci4), axis=1)

        def crop_spec(j):
            def index_map(g, li_ref, *_scal):
                return (li_ref[g * pg + j], 0, 0, 0, 0)
            return pl.BlockSpec((1, 2, mh8, 8, wpp), index_map)

        n_streams = pg
        crop_args = [crops] * pg
    else:
        def crop_spec(j):
            jj = j % pg                  # same line feeds both polarities
            def index_map(g, li_ref, *_scal):
                return (li_ref[g * pg + jj], 0, 0, 0)
            return pl.BlockSpec((1, mh8, 8, wpp), index_map)

        n_streams = 2 * pg
        crop_args = [ct4] * pg + [ci4] * pg

    def out_map(g, li_ref, t_ref, b_ref, l_ref, r_ref, sel_ref,
                gpage_ref, gfirst_ref):
        return (gpage_ref[g], 0, 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=8,
        grid=(cap // pg,),
        in_specs=[crop_spec(j) for j in range(n_streams)]
        + [pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, hp8, 8, wpp), out_map),
    )

    out = pl.pallas_call(
        _make_kernel(mh8, hp8, wpp, pg, combined),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((bsz, hp8, 8, wpp), jnp.uint8),
        # alias the zeros buffer (last non-scalar input) to the output:
        # pages never visited by the grid keep their zero content
        input_output_aliases={8 + n_streams: 0},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(li, t, b, l, r, sel, gpage, gfirst, *crop_args, init)

    hocr = out.reshape(bsz, hp8 * 8, wpp)[:, :h, :w].astype(bool)
    return jnp.logical_or(hocr, global_mask)
