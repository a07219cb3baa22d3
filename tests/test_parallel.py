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
