"""Data-parallel sharding tests on the 8-virtual-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fmvfi_tpu.parallel.dp import data_parallel, data_parallel_apply
from fmvfi_tpu.parallel.mesh import batch_sharding, make_mesh, replicate, shard_batch
from fmvfi_tpu.train.trainer import make_adacof_trainer


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8


@pytest.mark.slow
def test_dp_train_step_matches_single_device():
    """The sharded step must produce the same params as the local step."""
    mesh = make_mesh()
    rng = np.random.default_rng(0)
    h = w = 32
    b = 8
    f1 = jnp.asarray(rng.uniform(0, 1, (b, h, w, 3)).astype(np.float32))
    mid = jnp.asarray(rng.uniform(0, 1, (b, h, w, 3)).astype(np.float32))
    f2 = jnp.asarray(rng.uniform(0, 1, (b, h, w, 3)).astype(np.float32))
    batch = (f1, mid, f2)

    state0, step = make_adacof_trainer(jax.random.key(1), h, w, kernel_size=3)

    # single device
    s_local, m_local = jax.jit(step)(state0, batch)

    # data parallel
    pstep = data_parallel(step, mesh)
    state_r = replicate(mesh, state0)
    batch_s = shard_batch(mesh, batch)
    s_dp, m_dp = pstep(state_r, batch_s)

    np.testing.assert_allclose(
        float(m_local["loss"]), float(m_dp["loss"]), rtol=1e-5
    )
    l1 = jax.tree.leaves(s_local.params)
    l2 = jax.tree.leaves(s_dp.params)
    for a, b_ in zip(l1, l2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-5)


def test_dp_inference_sharded_batch():
    mesh = make_mesh()
    from fmvfi_tpu.models.adacof import AdaCoFNet

    model = AdaCoFNet(kernel_size=3)
    z = jnp.zeros((8, 32, 32, 3))
    variables = model.init(jax.random.key(0), z, z)

    def infer(weights, a, b):
        return model.apply(weights, a, b).blended

    fn = data_parallel_apply(infer, mesh)
    out = fn(replicate(mesh, variables), shard_batch(mesh, z), shard_batch(mesh, z))
    assert out.shape == (8, 32, 32, 3)
    # output really is sharded over the batch axis
    assert len(out.sharding.device_set) == 8


def test_spatial_sharded_adacof_matches_unsharded():
    """H-axis sharding via XLA SPMD (halo exchange inserted automatically)
    must reproduce single-device results."""
    from fmvfi_tpu.models.adacof import AdaCoFNet
    from fmvfi_tpu.parallel.spatial import spatial_apply

    mesh = make_mesh()
    rng = np.random.default_rng(3)
    h, w = 64, 64  # H=64 sharded 8 ways
    f1 = jnp.asarray(rng.uniform(0, 1, (1, h, w, 3)).astype(np.float32))
    f2 = jnp.asarray(rng.uniform(0, 1, (1, h, w, 3)).astype(np.float32))
    model = AdaCoFNet(kernel_size=3)
    variables = model.init(jax.random.key(0), f1, f2)

    def infer(weights, a, b):
        return model.apply(weights, a, b).blended

    ref = jax.jit(infer)(variables, f1, f2)
    sharded = spatial_apply(infer, mesh)(variables, f1, f2)
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(ref), atol=2e-5)
    assert len(sharded.sharding.device_set) == 8


@pytest.mark.xfail(
    reason="XLA CPU fft_thunk rejects the transposed layouts SPMD produces "
    "(LayoutUtil::IsMonotonicWithDim0Major RET_CHECK); TPU-only path",
    strict=False,
)
@pytest.mark.slow
def test_spatial_sharded_phase_interpolate():
    """The FFT-heavy phase pipeline also partitions correctly."""
    from fmvfi_tpu.models.phase_net import PhaseNetCore, normalize_inputs
    from fmvfi_tpu.ops import decomp as dec_ops
    from fmvfi_tpu.ops.pyramid import decompose, make_filters, max_pyr_height
    from fmvfi_tpu.parallel.spatial import spatial_apply
    from fmvfi_tpu.pipeline.interpolate import phase_interpolate

    mesh = make_mesh()
    rng = np.random.default_rng(4)
    h = w = 64
    filters = make_filters(h, w, max_pyr_height(h, w))
    vals = decompose(jnp.zeros((3, h, w)), filters)
    low, phases, amps = dec_ops.concat_for_net([vals, vals])
    lown, pn, an, _ = normalize_inputs(low, phases, amps)
    pv = PhaseNetCore(num_img=2).init(jax.random.key(0), lown, pn, an)

    f1 = jnp.asarray(rng.uniform(0, 1, (1, h, w, 3)).astype(np.float32))
    f2 = jnp.asarray(rng.uniform(0, 1, (1, h, w, 3)).astype(np.float32))

    def infer(weights, a, b):
        return phase_interpolate(weights, a, b)

    ref = jax.jit(infer)(pv, f1, f2)
    sharded = spatial_apply(infer, mesh)(pv, f1, f2)
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(ref), atol=5e-5)


@pytest.mark.slow
def test_2d_data_spatial_fusion_matches_single_device():
    """Full fusion inference on a 2-D (data=4 x spatial=2) mesh: conv
    subgraphs H-sharded (XLA halo exchange), FFT sections shard_mapped over
    the batch axis with ordinary local FFTs (replicated across the spatial
    axis) — see pipeline.interpolate._shmap_batch."""
    from fmvfi_tpu.models.adacof import AdaCoFNet
    from fmvfi_tpu.models.fusion_net import FusionNet
    from fmvfi_tpu.models.phase_net import PhaseNetCore, normalize_inputs
    from fmvfi_tpu.ops import decomp as dec_ops
    from fmvfi_tpu.ops.pyramid import decompose, make_filters, max_pyr_height
    from fmvfi_tpu.parallel.spatial import fusion_spatial_apply
    from fmvfi_tpu.pipeline.interpolate import FusionWeights, fusion_interpolate

    h = w = 64
    key = jax.random.key(0)
    filters = make_filters(h, w, max_pyr_height(h, w))
    vals = decompose(jnp.zeros((3, h, w)), filters)
    low, phases, amps = dec_ops.concat_for_net([vals, vals])
    lown, pn, an, _ = normalize_inputs(low, phases, amps)
    pv = PhaseNetCore(num_img=2).init(key, lown, pn, an)
    z = jnp.zeros((1, h, w, 3))
    av = AdaCoFNet(kernel_size=5, dilation=1).init(key, z, z)
    fv = FusionNet().init(key, z, z, z, jnp.zeros((1, h, w, 6)), z)
    weights = FusionWeights(pv, av, fv)

    mesh = make_mesh(8, ("data", "spatial"), (4, 2))
    rng = np.random.default_rng(7)
    f1 = jnp.asarray(rng.uniform(0, 1, (4, h, w, 3)).astype(np.float32))
    f2 = jnp.asarray(rng.uniform(0, 1, (4, h, w, 3)).astype(np.float32))

    ref = jax.jit(lambda w_, a, b: fusion_interpolate(w_, a, b))(weights, f1, f2)
    out = fusion_spatial_apply(weights, mesh)(f1, f2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-4)
    assert len(out.sharding.device_set) == 8


def test_multihost_helpers_single_process():
    from fmvfi_tpu.parallel.distributed import (
        global_batch_array,
        initialize,
        local_batch_slice,
    )

    initialize()  # no-op in a single-process environment
    assert local_batch_slice(8) == (0, 8)
    mesh = make_mesh()
    arr = np.arange(8 * 4, dtype=np.float32).reshape(8, 4)
    g = global_batch_array(mesh, arr)
    assert g.shape == (8, 4)
    np.testing.assert_allclose(np.asarray(g), arr)
    assert len(g.sharding.device_set) == 8


@pytest.mark.slow
def test_2d_phase_interpolate_matches_single_device():
    """phase_interpolate under the 2-D mesh (shard_mapped FFT sections)."""
    from fmvfi_tpu.models.phase_net import PhaseNetCore, normalize_inputs
    from fmvfi_tpu.ops import decomp as dec_ops
    from fmvfi_tpu.ops.pyramid import decompose, make_filters, max_pyr_height
    from fmvfi_tpu.pipeline.interpolate import phase_interpolate
    from jax.sharding import NamedSharding, PartitionSpec as P

    h = w = 64
    key = jax.random.key(0)
    filters = make_filters(h, w, max_pyr_height(h, w))
    vals = decompose(jnp.zeros((3, h, w)), filters)
    low, phases, amps = dec_ops.concat_for_net([vals, vals])
    lown, pn, an, _ = normalize_inputs(low, phases, amps)
    pv = PhaseNetCore(num_img=2).init(key, lown, pn, an)

    mesh = make_mesh(8, ("data", "spatial"), (4, 2))
    rng = np.random.default_rng(9)
    f1 = jnp.asarray(rng.uniform(0, 1, (4, h, w, 3)).astype(np.float32))
    f2 = jnp.asarray(rng.uniform(0, 1, (4, h, w, 3)).astype(np.float32))

    ref = jax.jit(lambda v, a, b: phase_interpolate(v, a, b))(pv, f1, f2)
    sh = NamedSharding(mesh, P("data", "spatial", None, None))
    rep = NamedSharding(mesh, P())
    fn = jax.jit(
        lambda v, a, b: phase_interpolate(v, a, b, spatial_mesh=mesh),
        in_shardings=(rep, sh, sh),
        out_shardings=sh,
    )
    out = fn(
        jax.device_put(pv, rep), jax.device_put(f1, sh), jax.device_put(f2, sh)
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-4)


@pytest.mark.slow
def test_multiprocess_dp_matches_single():
    """VERIFIED multi-process capability (not just API): launch 2 REAL
    processes, each with one CPU device, joined via
    jax.distributed.initialize through parallel.distributed.initialize;
    each loads only its local_batch_slice, assembles the global batch with
    global_batch_array, and runs one data-parallel AdaCoF step.  Both ranks'
    loss and parameter checksum must agree with the single-process step on
    the same global batch.  (The reference has no distributed anything —
    SURVEY §2.7.)"""
    import os
    import re
    import subprocess
    import sys

    worker = os.path.join(os.path.dirname(__file__), "_mp_worker.py")
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(worker))
    port = 19731 + (os.getpid() % 500)
    coord = f"localhost:{port}"
    procs = [
        subprocess.Popen(
            [sys.executable, worker, coord, str(r)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
        )
        for r in (0, 1)
    ]
    # generous timeout: two cold JAX imports + a compile each, and the suite
    # may be sharing the host with other compiles
    outs = [p.communicate(timeout=900)[0] for p in procs]
    results = {}
    for r, out in enumerate(outs):
        assert procs[r].returncode == 0, f"rank {r} failed:\n{out}"
        m = re.search(r"RESULT rank=(\d) loss=([\d.]+) ck=([\d.]+)", out)
        assert m, f"rank {r} printed no RESULT:\n{out}"
        results[r] = (float(m.group(2)), float(m.group(3)))
    assert results[0] == results[1], results

    # single-process oracle: same deterministic data/key, full global batch
    rng = np.random.default_rng(0)
    full = rng.uniform(0, 1, (3, 8, 32, 32, 3)).astype(np.float32)
    batch = tuple(jnp.asarray(full[i]) for i in range(3))
    state0, step = make_adacof_trainer(jax.random.key(1), 32, 32, kernel_size=3)
    state, metrics = jax.jit(step)(state0, batch)
    ck = float(
        sum(jnp.sum(jnp.abs(x)) for x in jax.tree.leaves(state.params))
    )
    np.testing.assert_allclose(results[0][0], float(metrics["loss"]), rtol=2e-5)
    np.testing.assert_allclose(results[0][1], ck, rtol=2e-5)


@pytest.mark.slow
def test_fusion_spatial_train_step_matches_single_device():
    """2-D (data=4 x spatial=2) fusion TRAIN step: forward AND backward run
    batch+height sharded (halo exchanges in both directions, SPMD-inserted
    gradient reduction); loss and updated params must match the
    single-device step."""
    from fmvfi_tpu.models.adacof import AdaCoFNet
    from fmvfi_tpu.models.phase_net import PhaseNetCore, normalize_inputs
    from fmvfi_tpu.ops import decomp as dec_ops
    from fmvfi_tpu.ops.pyramid import decompose, make_filters, max_pyr_height
    from fmvfi_tpu.parallel.spatial import fusion_spatial_trainer
    from fmvfi_tpu.train.trainer import make_fusion_trainer

    h = w = 64
    key = jax.random.key(0)
    filters = make_filters(h, w, max_pyr_height(h, w))
    vals = decompose(jnp.zeros((3, h, w)), filters)
    low, phases, amps = dec_ops.concat_for_net([vals, vals])
    lown, pn, an, _ = normalize_inputs(low, phases, amps)
    pv = PhaseNetCore(num_img=2).init(key, lown, pn, an)
    z = jnp.zeros((1, h, w, 3))
    av = AdaCoFNet(kernel_size=5, dilation=1).init(key, z, z)

    rng = np.random.default_rng(11)
    batch = tuple(
        jnp.asarray(rng.uniform(0, 1, (4, h, w, 3)).astype(np.float32))
        for _ in range(3)
    )

    state0, step0 = make_fusion_trainer(key, h, w, pv, av)
    ref_state, ref_m = jax.jit(step0)(state0, batch)

    mesh = make_mesh(8, ("data", "spatial"), (4, 2))
    state1, step1 = fusion_spatial_trainer(key, h, w, pv, av, mesh)
    new_state, m = step1(state1, batch)

    np.testing.assert_allclose(
        float(m["loss"]), float(ref_m["loss"]), rtol=1e-5
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(new_state.params),
        jax.tree_util.tree_leaves(ref_state.params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


@pytest.mark.slow
def test_adacof_spatial_train_step_matches_single_device():
    """2-D (data=4 x spatial=2) AdaCoF TRAIN step == single-device step
    (XLA-gather warp under height sharding; Charb+smoothness loss)."""
    from fmvfi_tpu.parallel.spatial import adacof_spatial_trainer

    h = w = 64
    key = jax.random.key(0)
    rng = np.random.default_rng(13)
    batch = tuple(
        jnp.asarray(rng.uniform(0, 1, (4, h, w, 3)).astype(np.float32))
        for _ in range(3)
    )

    state0, step0 = make_adacof_trainer(key, h, w, use_pallas=False)
    ref_state, ref_m = jax.jit(step0)(state0, batch)

    mesh = make_mesh(8, ("data", "spatial"), (4, 2))
    state1, step1 = adacof_spatial_trainer(key, h, w, mesh)
    new_state, m = step1(state1, batch)

    np.testing.assert_allclose(
        float(m["loss"]), float(ref_m["loss"]), rtol=1e-5
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(new_state.params),
        jax.tree_util.tree_leaves(ref_state.params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


@pytest.mark.slow
def test_halo_exchange_warp_matches_single_device():
    """adacof_warp_tm_sharded (explicit ppermute halo exchange + per-device
    fast warp) must be bit-equal to the single-device clipped warp — forward
    AND field gradients — including global-border clamping and offsets
    beyond the clamp."""
    from fmvfi_tpu.ops.adacof import pad_replicate
    from fmvfi_tpu.ops.adacof_pallas import adacof_warp_fast_tm
    from fmvfi_tpu.parallel.spatial import adacof_warp_tm_sharded

    F, d = 5, 1
    kp = ((F - 1) * d) // 2
    B, H, W, C = 4, 32, 24, 3
    r = np.random.default_rng(0)
    x = jnp.asarray(r.random((B, H, W, C), dtype=np.float32))
    fld = lambda s: jnp.asarray(r.normal(0, s, (F * F, B, H, W)).astype(np.float32))
    w = jax.nn.softmax(fld(1.0), axis=0)
    a, b = fld(9.0), fld(9.0)  # tails beyond R=5 exercise clamp parity

    for shape, R in [((4, 2), 12), ((2, 4), 5)]:
        mesh = make_mesh(8, ("data", "spatial"), shape)
        ref = adacof_warp_fast_tm(pad_replicate(x, kp), w, a, b, d, max_offset=R)
        got = adacof_warp_tm_sharded(x, w, a, b, d, mesh, max_offset=R)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    mesh = make_mesh(8, ("data", "spatial"), (4, 2))
    g_sh = jax.grad(
        lambda *f: jnp.sum(
            adacof_warp_tm_sharded(x, *f, d, mesh, max_offset=12) ** 2
        ),
        argnums=(0, 1, 2),
    )(w, a, b)
    g_rf = jax.grad(
        lambda *f: jnp.sum(
            adacof_warp_fast_tm(pad_replicate(x, kp), *f, d, max_offset=12) ** 2
        ),
        argnums=(0, 1, 2),
    )(w, a, b)
    for gs, gr in zip(g_sh, g_rf):
        np.testing.assert_array_equal(np.asarray(gs), np.asarray(gr))

    with pytest.raises(ValueError):  # halo > local shard height
        adacof_warp_tm_sharded(x, w, a, b, d, make_mesh(8, ("data", "spatial"), (2, 4)), max_offset=12)


@pytest.mark.slow
def test_adacof_model_routes_sharded_warp():
    """Under a 2-D mesh AdaCoFNet routes the warp through the halo-exchange
    shard_map (H large enough) and matches the single-device model."""
    from fmvfi_tpu.models.adacof import AdaCoFNet
    from fmvfi_tpu.parallel.spatial import data_spatial_sharding

    mesh = make_mesh(8, ("data", "spatial"), (4, 2))
    rng = np.random.default_rng(5)
    f1 = jnp.asarray(rng.uniform(0, 1, (4, 64, 32, 3)).astype(np.float32))
    f2 = jnp.asarray(rng.uniform(0, 1, (4, 64, 32, 3)).astype(np.float32))
    single = AdaCoFNet(kernel_size=5)
    variables = single.init(jax.random.key(0), f1, f2)
    # 32-row shards can't host the default 48-px halo; request a clamp they
    # can (the sharded path must use the SAME clamp as single-device, never
    # a silently tightened one)
    assert (
        AdaCoFNet(
            kernel_size=5, spatial_mesh=mesh, max_offset=24
        )._sharded_max_offset(64, 8)
        == 24
    ), "test shapes must actually engage the sharded route"
    assert (
        AdaCoFNet(kernel_size=5, spatial_mesh=mesh)._sharded_max_offset(64, 8)
        == 0
    ), "default 48-px clamp must fall back to the gather on 32-row shards"

    ref = jax.jit(lambda v, a, b: single.apply(v, a, b).blended)(
        variables, f1, f2
    )
    meshed = AdaCoFNet(
        kernel_size=5, use_pallas=False, spatial_mesh=mesh, max_offset=24
    )
    sh = data_spatial_sharding(mesh)
    rep = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())
    got = jax.jit(
        lambda v, a, b: meshed.apply(v, a, b).blended,
        in_shardings=(rep, sh, sh),
        out_shardings=sh,
    )(
        jax.device_put(variables, rep),
        jax.device_put(f1, sh),
        jax.device_put(f2, sh),
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)
    assert len(got.sharding.device_set) == 8
