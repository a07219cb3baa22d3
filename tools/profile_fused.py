#!/usr/bin/env python3
"""Trace the FUSED mrc_full_step_pallas on the real chip and print the
per-kernel device-time breakdown from the xplane trace.

Standalone per-stage timings (tools/profile_step.py) each carry ~50 ms
dispatch/sync overhead through this box's tunnel and have repeatedly
failed to predict fused-step movement; this tool reads the actual
device timeline of the fused jit instead.  Inputs/config mirror
bench.py exactly (BENCH_BATCH / BENCH_MODE / BENCH_DPI respected).
Requires tensorflow + tensorboard_plugin_profile (present in this
image) to parse the trace.

Usage: python tools/profile_fused.py [iters]
"""

import glob
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/tmp/jax_cache_apt')

import numpy as np


def build_bench_step():
    """Same inputs and step config as bench.py's headline."""
    import jax
    from archive_pdf_tools_tpu.mrc.step import mrc_full_step_pallas
    from archive_pdf_tools_tpu.ops.paste_pallas import build_paste_plan
    from archive_pdf_tools_tpu.mrc.decompose import (pick_blur_radius,
                                                     gray_601)

    batch = int(os.environ.get('BENCH_BATCH', '64'))
    rgb = os.environ.get('BENCH_MODE', 'gray') == 'rgb'
    dpi = int(os.environ.get('BENCH_DPI', '400'))
    h, w = (3300, 2550) if dpi == 400 else (dpi * 33 // 4, dpi * 51 // 8)
    window = dpi // 4 + (1 - (dpi // 4) % 2)
    noise_sigma = 8 if dpi == 400 else 18
    lines_per_page = 40
    n_seg = -(-(batch * lines_per_page + 1) // 64) * 64

    rng = np.random.default_rng(0)
    images = np.full((batch, h, w), 235, np.uint8)
    for b in range(batch):
        ys = rng.integers(20, h - 60, size=400)
        xs = rng.integers(20, w - 400, size=400)
        for y, x in zip(ys, xs):
            images[b, y:y + 8, x:x + int(rng.integers(80, 380))] = 40
    noise = rng.normal(0, noise_sigma, (batch, h, w))
    images = np.clip(images.astype(np.float32) + noise, 0, 255) \
        .astype(np.uint8)
    if rgb:
        images = np.stack([images,
                           (images * 0.92).astype(np.uint8),
                           (images * 0.80).astype(np.uint8)], axis=-1)

    boxes = np.zeros((4, n_seg), np.int32)
    boxes[1, 0] = 1
    boxes[3, 0] = 1
    pages_vec = np.zeros((n_seg,), np.int32)
    lid = 0
    for b in range(batch):
        for i in range(lines_per_page):
            lid += 1
            t = 30 + i * (h - 80) // lines_per_page
            boxes[:, lid] = (t, t + 50, 40, w - 40)
            pages_vec[lid] = b
    selector = np.zeros(n_seg, np.int32)
    selector[1:lid + 1] = 1

    dev = jax.device_put
    args = tuple(dev(a) for a in (images, boxes, pages_vec, selector))
    plan = build_paste_plan(boxes, pages_vec, selector, batch)
    plan_dev = tuple(dev(plan[k]) for k in
                     ('li', 't', 'b', 'l', 'r', 'sel', 'gpage', 'gfirst'))
    radius = pick_blur_radius(gray_601(args[0]) if rgb else args[0])

    def step():
        out = mrc_full_step_pallas(*args, window=window,
                                   rgb=rgb, denoise='fast',
                                   max_line_h=64, blur_radius=radius,
                                   paste_plan=plan_dev)
        jax.block_until_ready(out)
        _ = np.asarray(out[0][:, -1, -1])
        return out

    return step, batch


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    import jax

    step, batch = build_bench_step()
    step()  # compile + warmup
    t0 = time.perf_counter()
    step()
    warm = time.perf_counter() - t0
    print(f'warm step: {warm*1e3:.1f} ms -> {batch/warm:.1f} pages/s')

    trace_dir = os.environ.get('APT_TRACE_DIR', '/tmp/apt_trace')
    os.makedirs(trace_dir, exist_ok=True)
    with jax.profiler.trace(trace_dir):
        for _ in range(iters):
            step()
    report(trace_dir, iters)


def report(trace_dir, iters):
    paths = sorted(glob.glob(os.path.join(
        trace_dir, '**', '*.xplane.pb'), recursive=True),
        key=os.path.getmtime)
    if not paths:
        print('no xplane.pb found under', trace_dir)
        return
    path = paths[-1]
    os.environ.setdefault('TF_CPP_MIN_LOG_LEVEL', '3')
    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    xs = xplane_pb2.XSpace()
    with open(path, 'rb') as f:
        xs.ParseFromString(f.read())
    for plane in xs.planes:
        if 'TPU' not in plane.name and 'Device' not in plane.name:
            continue
        meta = {m.id: m.name for m in plane.event_metadata.values()}
        per_line = {}
        for line in plane.lines:
            agg = {}
            for ev in line.events:
                name = meta.get(ev.metadata_id, str(ev.metadata_id))
                d = agg.setdefault(name, [0, 0.0])
                d[0] += 1
                d[1] += ev.duration_ps / 1e9   # ms
            if agg:
                per_line[line.name] = agg
        # prefer the XLA-op line (finest kernel-level granularity)
        for lname, agg in per_line.items():
            total = sum(v[1] for v in agg.values())
            print(f'\n== plane {plane.name} / line "{lname}": '
                  f'{total/iters:.1f} ms/iter, {len(agg)} op names ==')
            for name, (n, ms) in sorted(agg.items(),
                                        key=lambda kv: -kv[1][1])[:40]:
                print(f'  {ms/iters:8.2f} ms  x{max(1, n//iters):<5d}'
                      f' {name[:110]}')


if __name__ == '__main__':
    main()
