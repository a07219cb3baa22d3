"""The --reporter protocol: JSON payloads piped to the reporter
command's stdin at the text / compress / save stages, with the
reference's shapes (reference recode.py:228 'text_pages',
:508 'compress_pages' + 'page_time_breakdown', :528 'time_to_save';
our pipeline/recode.py + pipeline/timing.py:Reporter)."""

import json
import os
import sys

from archive_pdf_tools_tpu.pipeline.recode import recode
from tests.fixtures import make_book

SINK = r'''
import sys
with open(sys.argv[1], 'a') as fp:
    fp.write(sys.stdin.read() + '\n')
'''


def test_reporter_payload_shapes(tmp_path):
    glob_pat, hocr, _pages = make_book(tmp_path, n_pages=2, w=320,
                                       h=440, dpi=100)
    sink_py = tmp_path / 'sink.py'
    sink_py.write_text(SINK)
    log = tmp_path / 'reports.jsonl'
    res = recode(from_imagestack=glob_pat, hocr_file=str(hocr),
                 out_pdf=str(tmp_path / 'out.pdf'), dpi=100,
                 reporter=[sys.executable, str(sink_py), str(log)],
                 report_every=1)
    assert res['errors'] == set()
    assert os.path.exists(log)
    payloads = [json.loads(ln) for ln in
                log.read_text().splitlines() if ln.strip()]
    kinds = [next(iter(p)) for p in payloads]
    assert 'text_pages' in kinds
    assert 'compress_pages' in kinds
    assert kinds[-1] == 'time_to_save'
    tp = payloads[kinds.index('text_pages')]['text_pages']
    assert tp['count'] == 2 and isinstance(tp['time-per'], int)
    cp = payloads[kinds.index('compress_pages')]
    assert isinstance(cp['compress_pages']['time-per'], int)
    # the per-page timing breakdown rides along (reference :508-519)
    assert 'page_time_breakdown' in cp
    assert all(isinstance(v, int)
               for v in cp['page_time_breakdown'].values())
    # batched pipeline: reports fire per batch once >= report_every
    # pages accumulated; the counts must cover every page exactly once
    total = sum(p['compress_pages']['count'] for p in payloads
                if 'compress_pages' in p)
    assert total == 2
    ts = payloads[-1]['time_to_save']
    assert isinstance(ts['time'], int)
