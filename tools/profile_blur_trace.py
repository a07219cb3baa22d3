#!/usr/bin/env python3
"""jax.profiler trace of the blur+threshold kernel (TODO Perf #1,
VERDICT r4 #8: open since r2 — attribute the kernel's wall time to
DMA vs grid fixed cost vs compute BEFORE guessing further).

Runs the fused global-threshold kernel standalone under
jax.profiler.trace and aggregates the perfetto trace events by name:
Mosaic kernel ranges, DMA/copy ops, and infeed/outfeed.  The trace
.json.gz is parsed directly — no tensorboard needed.

Usage: python tools/profile_blur_trace.py [batch] [iters]
"""
import glob
import gzip
import json
import os
import sys
from collections import defaultdict

os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/tmp/jax_cache_apt')
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))

import numpy as np


def main():
    import jax
    from archive_pdf_tools_tpu.mrc import decompose as D
    from archive_pdf_tools_tpu.mrc.decompose import pick_blur_radius

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    h, w = 3300, 2550
    window = 101

    rng = np.random.default_rng(0)
    images = np.full((batch, h, w), 235, np.uint8)
    for b in range(batch):
        ys = rng.integers(20, h - 60, size=400)
        xs = rng.integers(20, w - 400, size=400)
        for y, x in zip(ys, xs):
            images[b, y:y + 8, x:x + int(rng.integers(80, 380))] = 40
    images = np.clip(images.astype(np.float32)
                     + rng.normal(0, 8, (batch, h, w)),
                     0, 255).astype(np.uint8)

    gray = jax.device_put(images)
    radius = pick_blur_radius(gray)
    print('batch=%d radius=%d' % (batch, radius), flush=True)

    f = jax.jit(lambda g: D.global_threshold_fused_static(
        g, window, radius))
    out = f(gray)           # compile + warm
    jax.block_until_ready(out)
    _ = np.asarray(out[0][:, -1, -1])

    trace_dir = '/tmp/apt_blur_trace'
    os.system('rm -rf %s' % trace_dir)
    with jax.profiler.trace(trace_dir):
        for _i in range(iters):
            out = f(gray)
            jax.block_until_ready(out)
            _ = np.asarray(out[0][:, -1, -1])

    files = glob.glob(os.path.join(
        trace_dir, 'plugins', 'profile', '*', '*.trace.json.gz'))
    if not files:
        print('NO TRACE FILE produced (axon profiler unsupported?)')
        print('dir contents:', list(os.walk(trace_dir)))
        return 1
    with gzip.open(files[0], 'rt') as fp:
        trace = json.load(fp)

    # aggregate complete events by (pid-name, event-name)
    pids = {p['pid']: p['args'].get('name', str(p['pid']))
            for p in trace['traceEvents']
            if p.get('ph') == 'M' and p.get('name') == 'process_name'}
    agg = defaultdict(lambda: [0.0, 0])
    for ev in trace['traceEvents']:
        if ev.get('ph') != 'X':
            continue
        pid = pids.get(ev.get('pid'), '?')
        name = ev.get('name', '?')
        agg[(pid, name)][0] += ev.get('dur', 0) / 1e3   # us -> ms
        agg[(pid, name)][1] += 1

    rows = sorted(agg.items(), key=lambda kv: -kv[1][0])
    print('%-28s %-46s %9s %6s' % ('lane', 'event', 'total_ms', 'n'))
    for (pid, name), (ms, n) in rows[:30]:
        print('%-28s %-46s %9.2f %6d' % (pid[:28], name[:46], ms, n))
    print('--- all device-lane events ---')
    for (pid, name), (ms, n) in rows:
        if 'TPU' in pid:
            print('%-28s %-46s %9.2f %6d' % (pid[:28], name[:46], ms, n))
    dev_total = sum(ms for (pid, _), (ms, _n) in agg.items()
                    if 'TPU' in pid or 'device' in pid.lower())
    print('device-lane total %.2f ms over %d iters' % (dev_total, iters))
    return 0


if __name__ == '__main__':
    sys.exit(main())
