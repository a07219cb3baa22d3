"""Multi-host page-range sharding (SURVEY.md §5 distributed notes).

Pages are embarrassingly parallel, so the multi-host story is
work-partitioning, not collective communication: each host takes a
contiguous page range, runs the full recode pass 2 on its own chips
(page-batch DP via parallel/sharded.py within the host), and drops
per-page artifacts (mask/fg/bg + meta sidecars — the same files the
``--resume`` checkpoint mechanism uses).  A final assembly step on one
host merges the union of artifact directories into the output PDF by
page index.  DCN never carries image data; only the artifact gather
(filesystem or object store) crosses hosts.

The reference has no distributed mode at all (SURVEY.md §2.5); this is
new capability.
"""

import math
import os
import shutil


def init_distributed(coordinator=None, num_processes=None, process_id=None):
    """Initialize jax.distributed from explicit args or the standard env
    variables (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES /
    JAX_PROCESS_ID).  No-op when single-process."""
    import jax
    coordinator = coordinator or os.environ.get('JAX_COORDINATOR_ADDRESS')
    if coordinator is None:
        return False
    num_processes = int(num_processes
                        or os.environ.get('JAX_NUM_PROCESSES', '1'))
    process_id = int(process_id or os.environ.get('JAX_PROCESS_ID', '0'))
    if num_processes <= 1:
        return False
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)
    return True


def assign_page_range(n_pages, n_hosts, host_id):
    """Contiguous [start, stop) page range for this host.  Contiguous
    (not strided) so each host's batches keep same-shape pages from the
    same book region together, and artifact directories stay dense."""
    if not 0 <= host_id < n_hosts:
        raise ValueError('host_id %d out of range for %d hosts'
                         % (host_id, n_hosts))
    per = math.ceil(n_pages / n_hosts)
    start = min(host_id * per, n_pages)
    stop = min(start + per, n_pages)
    return start, stop


def host_stop_after(n_pages, n_hosts, host_id):
    """Map a page range onto recode()'s skip/stop knobs: returns
    (skip_pages list, stop_after) reproducing assign_page_range inside
    the unmodified pipeline."""
    start, stop = assign_page_range(n_pages, n_hosts, host_id)
    return list(range(0, start)), stop - start


def gather_artifacts(host_dirs, merged_dir):
    """Merge per-host artifact directories into one directory for the
    final assembly host to consume with
    ``recode(..., resume=True, out_dir=merged_dir)``.

    host_dirs: list of ``dir`` or ``(dir, page_offset)``.  Each host's
    artifacts (``%.6d_{mask.*,bg.jp2,fg.jp2,meta.json}``) are keyed by
    that host's *local* builder page index (its pass 1 skipped earlier
    pages), so pass each host's global range start as page_offset to
    renumber into the merged global index space.  Later directories win
    on collisions (reruns)."""
    os.makedirs(merged_dir, exist_ok=True)
    n = 0
    for entry in host_dirs:
        d, offset = entry if isinstance(entry, tuple) else (entry, 0)
        if not os.path.isdir(d):
            continue
        for name in sorted(os.listdir(d)):
            src = os.path.join(d, name)
            if not os.path.isfile(src) or '_' not in name:
                continue
            idx_s, rest = name.split('_', 1)
            try:
                idx = int(idx_s)
            except ValueError:
                continue
            dst = os.path.join(merged_dir, '%.6d_%s' % (idx + offset, rest))
            shutil.copy2(src, dst)
            n += 1
    return n
