"""Multi-device sharding tests on the virtual 8-device CPU mesh: the sharded
DPE step must produce identical results to the single-device step."""

import numpy as np
import jax
import pytest

from navlab_dpe_sdr_tpu.parallel import mesh as pmesh


@pytest.fixture(scope="module")
def entry_args():
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge
    from navlab_dpe_sdr_tpu.models.grid import uniform_grid
    grid = uniform_grid(n=8, pos_spacing=5.0, vel_spacing=0.5)
    args, meta = ge._example_args(c=8, s=5000, grid=grid)
    return args, meta, grid


def test_sharded_matches_single_device(entry_args):
    from navlab_dpe_sdr_tpu.ops import dpe_real as dr
    args, meta, grid = entry_args

    single = dr.dpe_device_step_real(*args, **meta)
    single = [np.asarray(x) for x in jax.tree.leaves(single)]

    assert len(jax.devices()) >= 8, "conftest should provide 8 CPU devices"
    m = pmesh.make_mesh(n_grid=4, n_chan=2)
    step = pmesh.sharded_dpe_step_real(m, **meta)
    with m:
        out = step(*args)
        jax.block_until_ready(out)
    sharded = [np.asarray(x) for x in jax.tree.leaves(out)]

    for s, sh in zip(single, sharded):
        np.testing.assert_allclose(s, sh, rtol=1e-4, atol=1e-2)


def test_grid_axis_mesh_shapes():
    m = pmesh.make_mesh()  # all devices on grid axis
    assert m.devices.size == len(jax.devices())
    m2 = pmesh.make_mesh(n_chan=2)
    assert m2.devices.shape[0] == 2


def test_sharded_grid_placement(entry_args):
    args, meta, grid = entry_args
    m = pmesh.make_mesh(n_grid=8, n_chan=1)
    d_enu, dt_m, dv_enu, dtdot = pmesh.shard_grid(
        m, (grid.d_enu.astype(np.float32), grid.dt_m.astype(np.float32),
            grid.dv_enu.astype(np.float32), grid.dtdot.astype(np.float32)))
    # each device holds 1/8 of the grid axis
    shard_sizes = {sh.data.shape[0] for sh in d_enu.addressable_shards}
    assert max(shard_sizes) <= -(-grid.d_enu.shape[0] // 8) + 1
