"""Pallas kernels under a multi-device data mesh.

GSPMD cannot partition a pallas_call (opaque custom call): with a
batch-sharded input it all-gathers the batch and every device
redundantly computes ALL of it (measured before the fix: 10 all-gathers,
output replicated). The kernel wrappers therefore run their grids under
``jax.shard_map`` over the registered production mesh's data axis
(kernels/swin_block.shard_grid_over_data). These tests gate:

* the forward stays data-sharded end to end (no activation all-gather);
* the result is bit-identical to the unsharded kernel path;
* gradients through the differentiable train kernel match the unsharded
  run — shard_map's transpose must psum the replicated parameters'
  cotangents (the DP gradient all-reduce), which check_vma=False does
  NOT verify statically;
* indivisible batches fall back to the plain call and stay correct.
"""

import re

import numpy as np
import pytest


@pytest.fixture()
def rng():
    return np.random.default_rng(0)


@pytest.fixture()
def mesh8():
    import jax
    from jax.sharding import Mesh

    from rdst_tpu.parallel.mesh import set_active_mesh

    mesh = Mesh(np.array(jax.devices()).reshape(8), ("data",))
    prev = set_active_mesh(None)
    yield mesh
    set_active_mesh(prev)


def _layer_and_data(rng, b=8, drop_path=()):
    import jax.numpy as jnp

    from rdst_tpu.nn.swin import BasicLayer

    h, w, c, nh, ws = 16, 16, 12, 3, 8
    layer = BasicLayer(dim=c, depth=2, num_heads=nh, window_size=ws,
                       mlp_ratio=2.0, build_resolution=(h, w),
                       drop_path=drop_path, dtype=jnp.bfloat16)
    x = jnp.asarray(rng.normal(0, 1, (b, h * w, c)), jnp.float32)
    return layer, x, (h, w)


class TestShardedKernelForward:
    def test_forward_stays_sharded_and_matches(self, rng, mesh8,
                                               monkeypatch):
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        from rdst_tpu.parallel.mesh import set_active_mesh

        monkeypatch.setenv("RDST_TPU_PALLAS", "pair")
        monkeypatch.setenv("RDST_TPU_PALLAS_INTERPRET", "1")
        layer, x, x_size = _layer_and_data(rng)
        params = layer.init(jax.random.PRNGKey(0), x, x_size)
        shardings = (NamedSharding(mesh8, P()),
                     NamedSharding(mesh8, P("data")))

        # NB: distinct closures per jit — jax caches the jaxpr per
        # function object, and the mesh registry is read at trace time
        y_un = np.asarray(
            jax.jit(lambda p, x: layer.apply(p, x, x_size, True))(params, x),
            np.float32)

        set_active_mesh(mesh8)
        f = jax.jit(lambda p, x: layer.apply(p, x, x_size, True),
                    in_shardings=shardings)
        y = f(params, x)
        assert y.sharding.spec == P("data")
        txt = f.lower(params, x).compile().as_text()
        assert len(re.findall(r"all-gather", txt)) == 0
        assert np.array_equal(np.asarray(y, np.float32), y_un)

    def test_indivisible_batch_falls_back(self, rng, mesh8, monkeypatch):
        import jax

        from rdst_tpu.parallel.mesh import set_active_mesh

        monkeypatch.setenv("RDST_TPU_PALLAS", "pair")
        monkeypatch.setenv("RDST_TPU_PALLAS_INTERPRET", "1")
        layer, x, x_size = _layer_and_data(rng, b=6)  # 6 % 8 != 0
        params = layer.init(jax.random.PRNGKey(0), x, x_size)

        y_un = np.asarray(
            jax.jit(lambda p, x: layer.apply(p, x, x_size, True))(params, x),
            np.float32)
        set_active_mesh(mesh8)
        y = np.asarray(
            jax.jit(lambda p, x: layer.apply(p, x, x_size, True))(params, x),
            np.float32)
        assert np.array_equal(y, y_un)

    def test_rdstb_kernel_shards(self, rng, mesh8, monkeypatch):
        """The whole-RDSTB mega-kernel path through a real generator
        stays data-sharded too (mesh registered -> shard_map engages at
        the fused_rdstb boundary)."""
        import jax
        import jax.numpy as jnp
        from jax.sharding import NamedSharding, PartitionSpec as P

        from rdst_tpu.config import ParametersLoader
        from rdst_tpu.models.registry import build_generator
        from rdst_tpu.parallel.mesh import set_active_mesh

        monkeypatch.setenv("RDST_TPU_PALLAS", "rdstb")
        monkeypatch.setenv("RDST_TPU_PALLAS_INTERPRET", "1")
        paras = ParametersLoader("config_files/rdst_tiny_oasis_x4.ini")
        model = build_generator(paras, dtype=jnp.bfloat16)
        x = jnp.asarray(rng.normal(0.5, 0.2, (8, 16, 16, 1)), jnp.float32)
        params = jax.jit(model.init)(jax.random.PRNGKey(0), x)

        y_un = np.asarray(
            jax.jit(lambda p, x: model.apply(p, x))(params, x), np.float32)
        set_active_mesh(mesh8)
        f = jax.jit(lambda p, x: model.apply(p, x), in_shardings=(
            NamedSharding(mesh8, P()), NamedSharding(mesh8, P("data"))))
        y = f(params, x)
        assert np.array_equal(np.asarray(y, np.float32), y_un)


class TestShardedTrainKernelGrads:
    def test_grads_match_unsharded(self, rng, mesh8, monkeypatch):
        """DP-sharded grads through the custom-VJP train kernel ==
        unsharded grads: shard_map's transpose psums the replicated
        params' cotangents over the data axis."""
        import jax
        import jax.numpy as jnp
        from jax.sharding import NamedSharding, PartitionSpec as P

        from rdst_tpu.parallel.mesh import set_active_mesh

        monkeypatch.setenv("RDST_TPU_PALLAS", "0")
        monkeypatch.setenv("RDST_TPU_PALLAS_TRAIN", "pair")
        monkeypatch.setenv("RDST_TPU_PALLAS_INTERPRET", "1")
        # drop_path 0.1 = the flagship recipe: the DropPath factor
        # columns are batch-major rows and must ride the SHARDED
        # operand pytree (regression: a replicated spec handed each
        # device the global rows and the local reshape crashed)
        layer, x, x_size = _layer_and_data(rng, drop_path=(0.1, 0.1))
        params = layer.init(jax.random.PRNGKey(0), x, x_size)

        def loss(p, x):
            y = layer.apply(p, x, x_size, False,
                            rngs={"droppath": jax.random.PRNGKey(7)})
            return jnp.mean(y.astype(jnp.float32) ** 2)

        g_un = jax.jit(jax.grad(lambda p, x: loss(p, x)))(params, x)
        set_active_mesh(mesh8)
        g_sh = jax.jit(jax.grad(lambda p, x: loss(p, x)), in_shardings=(
            NamedSharding(mesh8, P()), NamedSharding(mesh8, P("data"))))(
            params, x)
        for a, b in zip(jax.tree_util.tree_leaves(g_un),
                        jax.tree_util.tree_leaves(g_sh)):
            a = np.asarray(a, np.float32)
            b = np.asarray(b, np.float32)
            # psum reassociates the f32 grad accumulation; bf16-noise
            # scale differences only (observed 0.5% worst-leaf with the
            # DropPath factor columns in play)
            denom = max(1e-6, float(np.abs(a).max()))
            assert float(np.abs(a - b).max()) / denom < 1e-2
