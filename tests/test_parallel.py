import jax
import jax.numpy as jnp
import numpy as np
import pytest

from repas_tpu.parallel import (batch_stats_psum, frames_mesh,
                                fuse_views_allgather, shard_batch,
                                sharded_frame_pipeline)


@pytest.fixture(scope="module")
def mesh():
    n = min(len(jax.devices()), 8)
    if n < 2:
        pytest.skip("needs multi-device (virtual CPU mesh)")
    return frames_mesh(n)


def test_sharded_pipeline_matches_single(mesh):
    n = mesh.devices.size
    x = jnp.arange(n * 6, dtype=jnp.float32).reshape(n, 6)
    f = lambda a: jnp.sin(a) * 2.0 + jnp.sum(a, axis=-1, keepdims=True)
    xs = shard_batch(x, mesh)
    with mesh:
        out = sharded_frame_pipeline(f, mesh)(xs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(f(x)), atol=1e-6)


def test_fuse_views_allgather(mesh):
    n = mesh.devices.size
    pts = jnp.arange(n * 4 * 3, dtype=jnp.float32).reshape(n, 4, 3)
    valid = jnp.ones((n, 4), bool)
    with mesh:
        fused, mask = fuse_views_allgather(mesh)(
            shard_batch(pts, mesh), shard_batch(valid, mesh))
    assert fused.shape == (n * 4, 3)
    np.testing.assert_allclose(np.asarray(fused),
                               np.asarray(pts).reshape(-1, 3))
    assert np.asarray(mask).all()


def test_batch_stats_psum(mesh):
    n = mesh.devices.size
    v = jnp.arange(n, dtype=jnp.float32)
    m = jnp.ones(n, bool).at[0].set(False)
    with mesh:
        mean, cnt = batch_stats_psum(mesh)(shard_batch(v, mesh),
                                           shard_batch(m, mesh))
    expect = np.arange(n)[1:].mean()
    np.testing.assert_allclose(float(mean), expect, atol=1e-6)
    assert int(cnt) == n - 1


def test_graft_entry_dryrun():
    import __graft_entry__ as ge

    n = min(len(jax.devices()), 4)
    if n < 2:
        pytest.skip("needs multi-device")
    ge.dryrun_multichip(n)
