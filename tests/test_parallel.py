"""Data-parallel sharding consistency on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from medical_image_generation_tpu.diffusion.schedule import NoiseSchedule
from medical_image_generation_tpu.models.diffusion_unet import DiffusionUNet
from medical_image_generation_tpu.parallel.mesh import (
    batch_sharding,
    get_mesh,
    pad_batch_to_devices,
    replicated_sharding,
)


def tiny_unet():
    return DiffusionUNet(
        spatial_dims=2, in_channels=2, out_channels=2,
        num_channels=(8, 16, 16), attention_levels=(False, True, True),
        num_head_channels=(0, 8, 8), num_res_blocks=1, norm_num_groups=4,
        strides=((1, 1), (2, 2), (2, 2)),
        kernel_sizes=((3, 3), (3, 3), (3, 3)),
        paddings=((1, 1), (1, 1), (1, 1)),
        use_checkpointing=False, dtype=jnp.float32,
    )


class TestMesh:
    def test_mesh_shape(self):
        mesh = get_mesh()
        assert mesh.shape["data"] * mesh.shape["model"] == len(jax.devices())

    def test_pad_batch(self):
        mesh = get_mesh()
        n = mesh.shape["data"]
        batch = np.ones((2, 4, 4, 1), np.float32)
        padded = pad_batch_to_devices(batch, mesh)
        assert padded.shape[0] % n == 0
        # filler rows are copies of real rows
        assert np.all(np.isin(padded, batch))

    def test_model_parallel_axis(self):
        mesh = get_mesh(model_parallel=2)
        assert mesh.shape["model"] == 2
        assert mesh.shape["data"] == len(jax.devices()) // 2

    def test_put_batch_single_host(self):
        from medical_image_generation_tpu.parallel.mesh import put_batch

        mesh = get_mesh()
        batch = np.arange(2 * 4, dtype=np.float32).reshape(2, 4)
        out = put_batch(batch, mesh)
        assert out.shape[0] % mesh.shape["data"] == 0
        np.testing.assert_allclose(np.asarray(out)[:2], batch)

    def test_put_batch_dict(self):
        from medical_image_generation_tpu.parallel.mesh import put_batch

        mesh = get_mesh()
        batch = {"image": np.ones((2, 4), np.float32),
                 "class": np.zeros((2,), np.int32)}
        out = put_batch(batch, mesh)
        assert set(out) == {"image", "class"}
        assert out["image"].shape[0] == out["class"].shape[0]

    def test_maybe_initialize_distributed_noop_without_env(self, monkeypatch):
        from medical_image_generation_tpu.parallel.mesh import (
            maybe_initialize_distributed,
        )

        monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
        monkeypatch.delenv("MEDIMGEN_COORDINATOR_ADDRESS", raising=False)
        maybe_initialize_distributed()  # must not raise or init anything

    def test_maybe_initialize_skips_when_client_present(self, monkeypatch):
        """ADVICE round-2 (medium): the already-initialized check must not
        touch the XLA backend (jax.process_count() would), and must detect a
        live distributed client without calling initialize() again."""
        from jax._src import distributed as jdist

        from medical_image_generation_tpu.parallel.mesh import (
            maybe_initialize_distributed,
        )

        monkeypatch.setenv("MEDIMGEN_COORDINATOR_ADDRESS", "localhost:1234")
        monkeypatch.setattr(jdist.global_state, "client", object(), raising=False)
        called = []
        monkeypatch.setattr(
            jax.distributed, "initialize", lambda *a, **k: called.append(1)
        )
        maybe_initialize_distributed()
        assert not called


class TestDataParallelConsistency:
    def test_sharded_loss_matches_single_device(self):
        """The jitted loss over an 8-device 'data'-sharded batch must equal
        the single-device computation (XLA inserts the mean all-reduce)."""
        model = tiny_unet()
        x = jax.random.normal(jax.random.PRNGKey(0), (8, 16, 16, 2))
        t = jnp.arange(8) * 100
        variables = model.init(jax.random.PRNGKey(1), x[:1], t[:1])

        def loss_fn(params, x, t):
            pred = model.apply({"params": params}, x, t)
            return jnp.mean((pred - x) ** 2)

        # single device
        ref = float(jax.jit(loss_fn)(variables["params"], x, t))

        mesh = get_mesh()
        rep = replicated_sharding(mesh)
        bsh = batch_sharding(mesh)
        params = jax.device_put(variables["params"], rep)
        xs = jax.device_put(x, bsh)
        ts = jax.device_put(t, bsh)
        sharded = float(
            jax.jit(loss_fn, in_shardings=(rep, bsh, bsh), out_shardings=rep)(
                params, xs, ts
            )
        )
        assert sharded == pytest.approx(ref, rel=1e-5)

    def test_sharded_grads_match_single_device(self):
        model = tiny_unet()
        x = jax.random.normal(jax.random.PRNGKey(2), (8, 16, 16, 2))
        t = jnp.zeros((8,), jnp.int32)
        variables = model.init(jax.random.PRNGKey(3), x[:1], t[:1])

        def loss_fn(params, x, t):
            pred = model.apply({"params": params}, x, t)
            return jnp.mean((pred - x) ** 2)

        g_ref = jax.jit(jax.grad(loss_fn))(variables["params"], x, t)

        mesh = get_mesh()
        rep, bsh = replicated_sharding(mesh), batch_sharding(mesh)
        g_sh = jax.jit(
            jax.grad(loss_fn), in_shardings=(rep, bsh, bsh), out_shardings=rep
        )(jax.device_put(variables["params"], rep), jax.device_put(x, bsh),
          jax.device_put(t, bsh))

        ref_leaves = jax.tree_util.tree_leaves(g_ref)
        sh_leaves = jax.tree_util.tree_leaves(g_sh)
        for a, b in zip(ref_leaves, sh_leaves):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def _perturb(variables, seed=0):
    """Kick params off the zero-init output conv so differences are visible."""
    rng = np.random.default_rng(seed)
    return jax.tree_util.tree_map(
        lambda p: p + 0.01 * rng.normal(size=p.shape).astype(p.dtype), variables
    )


class TestControlNetHooks:
    def test_additional_residuals_change_output(self):
        model = tiny_unet()
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 16, 2))
        t = jnp.zeros((1,), jnp.int32)
        variables = _perturb(model.init(jax.random.PRNGKey(1), x, t))
        base = model.apply(variables, x, t)

        # shapes of the collected skips: run once to discover via tracing
        # conv_in + (res per level) + downsamples
        # level channels (8,16,16) on 16x16 -> skips at 16,8,4 resolutions
        residuals = [
            jnp.ones((1, 16, 16, 8)),   # conv_in
            jnp.ones((1, 16, 16, 8)),   # level0 res
            jnp.ones((1, 8, 8, 8)),     # down0
            jnp.ones((1, 8, 8, 16)),    # level1 res
            jnp.ones((1, 4, 4, 16)),    # down1
            jnp.ones((1, 4, 4, 16)),    # level2 res
        ]
        out = model.apply(
            variables, x, t, down_block_additional_residuals=residuals
        )
        assert not np.allclose(np.asarray(base), np.asarray(out))

    def test_mid_residual(self):
        model = tiny_unet()
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 16, 2))
        t = jnp.zeros((1,), jnp.int32)
        variables = _perturb(model.init(jax.random.PRNGKey(1), x, t))
        base = model.apply(variables, x, t)
        out = model.apply(
            variables, x, t,
            mid_block_additional_residual=jnp.ones((1, 4, 4, 16)),
        )
        assert not np.allclose(np.asarray(base), np.asarray(out))


class TestTensorParallel:
    def test_tp_loss_matches_replicated(self):
        """Megatron-partitioned UNet params must produce the same loss as the
        replicated layout (GSPMD inserts the collectives)."""
        from medical_image_generation_tpu.parallel.sharding import (
            unet_param_shardings,
        )

        model = tiny_unet()
        x = jax.random.normal(jax.random.PRNGKey(0), (8, 16, 16, 2))
        t = jnp.zeros((8,), jnp.int32)
        variables = model.init(jax.random.PRNGKey(1), x[:1], t[:1])

        def loss_fn(params, x, t):
            pred = model.apply({"params": params}, x, t)
            return jnp.mean((pred - x) ** 2)

        ref = float(jax.jit(loss_fn)(variables["params"], x, t))

        mesh = get_mesh(model_parallel=2)
        param_sh = unet_param_shardings(variables["params"], mesh)
        bsh = batch_sharding(mesh)
        rep = replicated_sharding(mesh)
        params = jax.device_put(variables["params"], param_sh)
        got = float(
            jax.jit(loss_fn, in_shardings=(param_sh, bsh, bsh), out_shardings=rep)(
                params, jax.device_put(x, bsh), jax.device_put(t, bsh)
            )
        )
        assert got == pytest.approx(ref, rel=1e-5)

    def test_sharding_specs_partition_attention_and_resblocks(self):
        from jax.sharding import PartitionSpec as P

        from medical_image_generation_tpu.parallel.sharding import (
            unet_param_shardings,
        )

        model = tiny_unet()
        x = jnp.zeros((1, 16, 16, 2))
        t = jnp.zeros((1,), jnp.int32)
        variables = model.init(jax.random.PRNGKey(0), x, t)
        mesh = get_mesh(model_parallel=2)
        shardings = unet_param_shardings(variables["params"], mesh)
        flat = jax.tree_util.tree_leaves_with_path(shardings)
        specs = {
            "/".join(str(getattr(p, "key", p)) for p in path): s.spec
            for path, s in flat
        }
        # at least one column-parallel and one row-parallel leaf exists
        has_col = any("model" in str(s[-1:]) for s in specs.values() if len(s) > 0)
        has_row = any(
            len(s) >= 2 and s[-2] == "model" for s in specs.values()
        )
        assert has_col and has_row


class TestMultiHostBatchContract:
    """The loaders build each process's data_axis_rows slice of a GLOBAL
    batch schedule; put_batch assembles the slices. Single-process tests
    cover the pure coordinate math (the multi-process paths run on pods)."""

    def test_owned_data_coords_disjoint(self):
        from medical_image_generation_tpu.parallel.mesh import (
            _owned_data_coords,
        )

        grid = np.array([[0, 0], [0, 0], [1, 1], [1, 1]])
        assert _owned_data_coords(grid, 0) == [0, 1]
        assert _owned_data_coords(grid, 1) == [2, 3]

    def test_owned_data_coords_model_spans_processes(self):
        from medical_image_generation_tpu.parallel.mesh import (
            _owned_data_coords,
        )

        # TP across hosts: each data row is co-owned by two processes —
        # both must supply identical rows for that coordinate
        grid = np.array([[0, 0, 1, 1], [2, 2, 3, 3]])
        assert _owned_data_coords(grid, 0) == [0]
        assert _owned_data_coords(grid, 1) == [0]
        assert _owned_data_coords(grid, 3) == [1]

    def test_owned_data_coords_fully_replicated_batch(self):
        from medical_image_generation_tpu.parallel.mesh import (
            _owned_data_coords,
        )

        grid = np.array([[0, 0, 0, 0, 1, 1, 1, 1]])  # data axis of 1
        assert _owned_data_coords(grid, 0) == [0]
        assert _owned_data_coords(grid, 1) == [0]

    def test_data_axis_rows_single_process_full_slice(self):
        from medical_image_generation_tpu.parallel.mesh import data_axis_rows

        mesh = get_mesh()
        n = mesh.shape["data"]
        assert data_axis_rows(mesh, 2 * n) == (0, 2 * n)

    def test_data_axis_rows_rejects_indivisible_batch(self):
        from medical_image_generation_tpu.parallel.mesh import data_axis_rows

        mesh = get_mesh()
        n = mesh.shape["data"]
        if n > 1:
            with pytest.raises(ValueError):
                data_axis_rows(mesh, n + 1)


class _StubPatchDataset:
    """Minimal PatchDataset stand-in: a 'patch' encodes (pos, idx, rng draw)
    so tests can check exactly which global rows a sliced loader built."""

    def __init__(self, n=8, batch_size=4):
        self.ids = [f"p{i}" for i in range(n)]
        self.batch_size = batch_size
        self.class_map = None

    def __len__(self):
        return len(self.ids)

    def sample_patch(self, pos, idx, rng):
        return np.array([pos, idx, rng.integers(0, 1 << 30)], np.int64)


class TestLoaderRowSlice:
    def test_sliced_loader_builds_exact_global_rows(self):
        """A row-sliced loader must reproduce rows [off, off+cnt) of the full
        loader's batches bit-exactly: same schedule, same per-row RNG keyed
        on the GLOBAL position — this is what makes co-owners of a
        replicated data coordinate agree without communication."""
        from medical_image_generation_tpu.data.loader import PrefetchLoader

        full = PrefetchLoader(_StubPatchDataset(), 3, shuffle=True,
                              num_threads=2, seed=7)
        part = PrefetchLoader(_StubPatchDataset(), 3, shuffle=True,
                              num_threads=2, seed=7, row_slice=(1, 2))
        full_batches = list(full)
        part_batches = list(part)
        assert len(full_batches) == len(part_batches) == 3
        for fb, pb in zip(full_batches, part_batches):
            assert fb.shape[0] == 4 and pb.shape[0] == 2
            np.testing.assert_array_equal(fb[1:3], pb)

    def test_oversampling_position_is_global(self):
        """sample_patch must see the GLOBAL batch position (forced-fg
        oversampling keys on position within the global batch)."""
        from medical_image_generation_tpu.data.loader import PrefetchLoader

        part = PrefetchLoader(_StubPatchDataset(), 1, shuffle=False,
                              num_threads=1, seed=3, row_slice=(2, 2))
        (batch,) = list(part)
        np.testing.assert_array_equal(batch[:, 0], [2, 3])
