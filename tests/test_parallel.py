"""Page-batch data parallelism over the virtual 8-device CPU mesh."""

import numpy as np
import jax
from jax.sharding import NamedSharding, PartitionSpec as P

from archive_pdf_tools_tpu.parallel.mesh import page_mesh, shard_pages, \
    replicate
from archive_pdf_tools_tpu.mrc.step import mrc_full_step
from __graft_entry__ import _example_inputs


class TestPageMesh:
    def test_mesh_shapes(self):
        mesh = page_mesh(8)
        assert mesh.devices.shape == (8,)
        assert mesh.axis_names == ('pages',)

    def test_sharded_step_matches_single_device(self):
        b, h, w = 8, 96, 160
        images, line_id, boxes, use_plain, use_inv = _example_inputs(b, h, w)

        # single device result
        ref = mrc_full_step(images, line_id, boxes, use_plain, use_inv,
                            window=15, n_seg=64)
        ref_mask = np.asarray(ref[0])
        ref_fg = np.asarray(ref[1])

        mesh = page_mesh(8)
        with mesh:
            imgs_s, lid_s = shard_pages(mesh, images, line_id)
            bx, up, ui = replicate(mesh, boxes, use_plain, use_inv)
            out = mrc_full_step(imgs_s, lid_s, bx, up, ui,
                                window=15, n_seg=64)
            jax.block_until_ready(out)

        assert (np.asarray(out[0]) == ref_mask).all()
        assert (np.asarray(out[1]) == ref_fg).all()

    def test_dryrun_entry(self):
        import __graft_entry__
        fn, args = __graft_entry__.entry()
        out = fn(*args)
        jax.block_until_ready(out)
        assert out[0].shape == (2, 256, 384)


class TestMultiHost:
    def test_range_assignment_covers_all_pages(self):
        from archive_pdf_tools_tpu.parallel.multihost import \
            assign_page_range
        for n_pages in (1, 7, 8, 9, 100):
            for n_hosts in (1, 2, 3, 8):
                seen = []
                for hid in range(n_hosts):
                    a, b = assign_page_range(n_pages, n_hosts, hid)
                    seen.extend(range(a, b))
                assert seen == list(range(n_pages)), (n_pages, n_hosts)

    def test_host_stop_after(self):
        from archive_pdf_tools_tpu.parallel.multihost import \
            host_stop_after
        skip, stop = host_stop_after(10, 3, 1)
        assert skip == [0, 1, 2, 3] and stop == 4
        skip, stop = host_stop_after(10, 3, 2)
        assert skip == list(range(8)) and stop == 2

    def test_gather_artifacts_renumbers(self, tmp_path):
        from archive_pdf_tools_tpu.parallel.multihost import \
            gather_artifacts
        d0 = tmp_path / 'h0'
        d1 = tmp_path / 'h1'
        d0.mkdir()
        d1.mkdir()
        (d0 / '000000_mask.jbig2').write_bytes(b'a')
        (d0 / '000001_meta.json').write_bytes(b'b')
        (d1 / '000000_mask.jbig2').write_bytes(b'c')
        merged = tmp_path / 'all'
        n = gather_artifacts([str(d0), (str(d1), 2)], str(merged))
        assert n == 3
        assert (merged / '000000_mask.jbig2').read_bytes() == b'a'
        assert (merged / '000002_mask.jbig2').read_bytes() == b'c'

    def test_two_host_split_recode_matches_single(self, tmp_path):
        """Each 'host' recodes its page range into its own artifact dir;
        the assembly host gathers + resumes and must reproduce the
        single-host masks."""
        from archive_pdf_tools_tpu.parallel.multihost import (
            assign_page_range, host_stop_after, gather_artifacts)
        from archive_pdf_tools_tpu.pipeline.recode import recode
        from archive_pdf_tools_tpu.pdf.reader import PdfReader
        from archive_pdf_tools_tpu.codecs.jbig2 import decode_jbig2
        from tests.fixtures import make_book
        from tests.test_recode_e2e import J2K_BG, J2K_FG

        stack, hocr, _ = make_book(tmp_path, n_pages=2)
        kw = dict(from_imagestack=stack, hocr_file=hocr, dpi=100,
                  jbig2=True, bg_compression_flags=[J2K_BG],
                  fg_compression_flags=[J2K_FG])

        single = str(tmp_path / 'single.pdf')
        recode(out_pdf=single, **kw)

        n_hosts, dirs = 2, []
        for hid in range(n_hosts):
            skip, count = host_stop_after(2, n_hosts, hid)
            d = str(tmp_path / ('host%d' % hid))
            # recode() replicates the reference's stop_after off-by-one
            # (recode.py:602-604 decrements once), so pass count + 1
            recode(out_pdf=str(tmp_path / ('h%d.pdf' % hid)), out_dir=d,
                   skip_pages=skip, stop_after=count + 1, **kw)
            dirs.append((d, assign_page_range(2, n_hosts, hid)[0]))
        merged = str(tmp_path / 'merged')
        gather_artifacts(dirs, merged)
        final = str(tmp_path / 'final.pdf')
        recode(out_pdf=final, out_dir=merged, resume=True, **kw)

        def masks(path):
            r = PdfReader(path)
            out = []
            for p in range(r.page_count()):
                for _, _, s in r.page_images(p):
                    sm = r.resolve(s.dict.get('SMask'))
                    if sm is not None:
                        w = int(r.resolve(sm.dict['Width']))
                        h = int(r.resolve(sm.dict['Height']))
                        out.append(decode_jbig2(sm.raw, w, h))
            return out

        ms, mf = masks(single), masks(final)
        assert len(ms) == len(mf) == 2
        for a, b in zip(ms, mf):
            assert (a == b).all()


class TestShardMapPallas:
    def test_optimise_kernel_under_shard_map(self):
        from jax import shard_map
        from archive_pdf_tools_tpu.ops.optimise_pallas import optimise_pallas
        from archive_pdf_tools_tpu.ops import golden
        mesh = page_mesh(8)
        rng = np.random.default_rng(0)
        img = rng.integers(0, 256, (8, 60, 130), dtype=np.uint8)
        mask = rng.random((8, 60, 130)) < 0.15
        fn = shard_map(lambda m, i: optimise_pallas(m, i, 3, interpret=True),
                       mesh=mesh, in_specs=(P('pages'), P('pages')),
                       out_specs=P('pages'), check_vma=False)
        with mesh:
            out = np.asarray(fn(mask, img))
        for i in range(8):
            assert (golden.optimise_ref(mask[i], img[i], 3) == out[i]).all()

    def test_split_lines_per_shard(self):
        from archive_pdf_tools_tpu.parallel.sharded import \
            split_lines_per_shard
        boxes = np.zeros((4, 5), np.int32)
        boxes[:, 1] = (0, 10, 0, 50)   # page 0
        boxes[:, 2] = (5, 15, 0, 50)   # page 2
        boxes[:, 3] = (7, 17, 0, 50)   # page 5
        pages = np.array([0, 0, 2, 5, 0], np.int32)
        sel = np.array([0, 1, 2, 1, 0], np.int32)
        ob, op, osel = split_lines_per_shard(boxes, pages, sel,
                                             batch=8, n_shards=4)
        # page 0 -> shard 0 local 0; page 2 -> shard 1 local 0;
        # page 5 -> shard 2 local 1
        assert (ob[0][:, 1] == boxes[:, 1]).all() and op[0][1] == 0
        assert (ob[1][:, 1] == boxes[:, 2]).all() and op[1][1] == 0
        assert (ob[2][:, 1] == boxes[:, 3]).all() and op[2][1] == 1
        assert osel[0][1] == 1 and osel[1][1] == 2 and osel[2][1] == 1
