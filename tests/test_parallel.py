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


class TestShardMapPallas:
    def test_optimise_kernel_under_shard_map(self):
        from jax.experimental.shard_map import shard_map
        from archive_pdf_tools_tpu.ops.optimise_pallas import optimise_pallas
        from archive_pdf_tools_tpu.ops import golden
        mesh = page_mesh(8)
        rng = np.random.default_rng(0)
        img = rng.integers(0, 256, (8, 60, 130), dtype=np.uint8)
        mask = rng.random((8, 60, 130)) < 0.15
        fn = shard_map(lambda m, i: optimise_pallas(m, i, 3, interpret=True),
                       mesh=mesh, in_specs=(P('pages'), P('pages')),
                       out_specs=P('pages'), check_rep=False)
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
