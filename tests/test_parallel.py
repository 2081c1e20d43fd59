"""Spatial sharding + mesh tests on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from anatomix_tpu.models.unet import (
    UnetConfig,
    build_plan,
    init_params,
    unet_apply,
)
from anatomix_tpu.parallel import (
    data_mesh,
    space_mesh,
    spatial_sharded_unet,
)
from anatomix_tpu.parallel.spatial import receptive_field


def test_meshes():
    m = data_mesh(n=4)
    assert m.shape == {"data": 4}
    m2 = space_mesh(data=2, space=4)
    assert m2.shape == {"data": 2, "space": 4}


@pytest.mark.parametrize("norm", ["batch", "instance"])
def test_spatial_sharded_unet_matches_unsharded(rng, norm):
    """Halo-exchanged spatially-sharded forward == unsharded forward."""
    cfg = UnetConfig(
        dimension=3, input_nc=1, output_nc=4, num_downs=2, ngf=4, norm=norm,
    )
    plan = build_plan(cfg)
    params = init_params(plan, jax.random.PRNGKey(0))
    params = jax.tree_util.tree_map(jnp.asarray, params)
    # randomize BN running stats so eval mode is non-trivial
    if norm == "batch":
        for sub in params.values():
            if "mean" in sub:
                r = np.random.default_rng(0)
                sub["mean"] = jnp.asarray(
                    r.standard_normal(sub["mean"].shape[0]).astype(
                        np.float32) * 0.1)
                sub["var"] = jnp.asarray(
                    (r.random(sub["var"].shape[0]) + 0.5).astype(np.float32))

    mesh = space_mesh(data=1, space=4)
    # D = 32: 4 shards × 8, divisible by 2^2
    vol = jnp.asarray(
        rng.standard_normal((1, 32, 16, 16, 1)).astype(np.float32)
    )
    ref = np.asarray(unet_apply(plan, params, vol))
    # drop the unused 'data' axis view: build a 1-axis space mesh
    from jax.sharding import Mesh

    smesh = Mesh(np.array(jax.devices()[:4]), ("space",))
    run = spatial_sharded_unet(plan, params, smesh)
    got = np.asarray(run(vol))
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-3)


def test_spatial_sharded_rejects_bad_divisibility():
    cfg = UnetConfig(
        dimension=3, input_nc=1, output_nc=4, num_downs=2, ngf=4,
    )
    plan = build_plan(cfg)
    params = init_params(plan, jax.random.PRNGKey(0))
    from jax.sharding import Mesh

    smesh = Mesh(np.array(jax.devices()[:4]), ("space",))
    run = spatial_sharded_unet(plan, params, smesh)
    with pytest.raises(ValueError, match="divisible"):
        run(jnp.zeros((1, 20, 16, 16, 1)))


def test_receptive_field():
    plan = build_plan(
        UnetConfig(dimension=3, input_nc=1, output_nc=16, num_downs=4,
                   ngf=16)
    )
    rf = receptive_field(plan)
    assert rf > 100  # the 6M UNet sees far: tiling with small halos is lossy


def test_multihost_helpers_single_process():
    """Multi-host utilities degrade gracefully to single-process: init is a
    no-op, the global mesh covers all devices, and global_batch_from_local
    produces correctly 'data'-sharded arrays a mesh-jitted sum accepts."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from anatomix_tpu.parallel import (
        global_batch_from_local,
        global_data_mesh,
        initialize_distributed,
    )

    assert initialize_distributed() is False  # no coordinator configured
    mesh = global_data_mesh()
    assert mesh.shape == {"data": len(jax.devices())}

    local = {
        "views": np.arange(8 * 4, dtype=np.float32).reshape(8, 4),
        "segs": np.ones((8, 2), np.int32),
    }
    batch = global_batch_from_local(mesh, local)
    assert batch["views"].sharding == NamedSharding(mesh, P("data"))
    assert batch["views"].shape == (8, 4)
    f = jax.jit(
        lambda b: jnp.sum(b["views"]) + jnp.sum(b["segs"]),
        in_shardings=(NamedSharding(mesh, P("data")),),
    )
    assert float(f(batch)) == float(local["views"].sum() + 16)

    # per-host PRNG fold-in is deterministic for process 0
    from anatomix_tpu.parallel.multihost import fold_in_process

    k = fold_in_process(jax.random.PRNGKey(3))
    np.testing.assert_array_equal(
        np.asarray(k), np.asarray(jax.random.fold_in(jax.random.PRNGKey(3), 0))
    )


def test_extractor_full_spatially_sharded(rng):
    """make_feature_extractor(strategy='full', mesh with 'space' axis) runs
    the halo-exchanged sharded forward and matches the unsharded one."""
    from jax.sharding import Mesh

    from anatomix_tpu.extract import make_feature_extractor

    cfg = UnetConfig(
        dimension=3, input_nc=1, output_nc=4, num_downs=2, ngf=4,
    )
    plan = build_plan(cfg)
    params = init_params(plan, jax.random.PRNGKey(0))
    vol = jnp.asarray(
        rng.standard_normal((1, 32, 16, 16, 1)).astype(np.float32)
    )
    ref = np.asarray(
        make_feature_extractor(plan, params, strategy="full")(vol)
    )
    smesh = Mesh(np.array(jax.devices()[:4]), ("space",))
    got = np.asarray(
        make_feature_extractor(
            plan, params, strategy="full", mesh=smesh
        )(vol)
    )
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-3)
