"""Line-capacity overflow handling (VERDICT r2 weak #7).

Pre-r3, ``decompose_masks`` silently dropped lines past the 16,384-line
capacity and ``n_lines`` could outrun the crop buffers (latent
IndexError in ``select_lines``).  Now the page batch is split into
sub-batches under the cap; a single degenerate page grows capacity
instead.  Reference scale: ``mrc.py`` has no batch dimension at all, so
the cap is a new-build concern (SURVEY.md §2.5 size-bucket handling).
"""

import numpy as np

from archive_pdf_tools_tpu.mrc import api as A

from tests.test_decompose import synth_page, synth_word_data


def test_round_lines_caps_then_grows():
    assert A._round_lines(50) == 64
    assert A._round_lines(16383) == 16384
    # a single page over the cap grows capacity in 1024 steps rather
    # than dropping lines
    assert A._round_lines(16384) > 16384
    assert A._round_lines(20000) % 1024 == 0
    assert A._round_lines(20000) >= 20001


def test_batch_split_bit_identical(monkeypatch):
    imgs = [synth_page(160, 240, seed=s, noise=15) for s in range(4)]
    wds = [synth_word_data(160, 240, seed=s) for s in range(4)]
    base, _ = A.decompose_masks(imgs, wds, dpi=100)
    base = np.asarray(base)

    # each page carries ~4 lines; cap 8 forces a multi-way split, the
    # exact path a >16k-line newspaper batch takes at full scale
    monkeypatch.setattr(A, 'MAX_LINE_CAPACITY', 8)
    split, _ = A.decompose_masks(imgs, wds, dpi=100)
    split = np.asarray(split)
    assert split.shape == base.shape
    assert (split == base).all()


def test_no_lines_dropped_under_forced_cap(monkeypatch):
    # single-page batch cannot split: capacity must grow so every line
    # is still thresholded (guard must not truncate)
    img = synth_page(200, 300, seed=1, noise=10)
    wd = synth_word_data(200, 300, n_lines=6, seed=1)
    base, _ = A.decompose_masks([img], [wd], dpi=100)
    monkeypatch.setattr(A, 'MAX_LINE_CAPACITY', 2)
    got, _ = A.decompose_masks([img], [wd], dpi=100)
    assert (np.asarray(got) == np.asarray(base)).all()
