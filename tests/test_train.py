import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerfjax.config import ConfigNode, with_defaults
from nerfjax.data import RayDataset, prefetch_to_device
from nerfjax.parallel import make_mesh
from nerfjax.train import (
    TrainSettings,
    build_fields,
    init_params,
    loss_fn,
    make_optimizer,
    make_schedule,
    make_train_step,
    train,
)
from tests.synthetic import make_ray_npz


def _tiny_cfg(tmp_path, **over):
    base = {
        "scene_name": "tiny",
        "output_dir": str(tmp_path / "out"),
        "checkpoint_dir": str(tmp_path / "out/ckpt"),
        "rays_file": str(tmp_path / "tiny_ray_data.npz"),
        "batch_size": 256,
        "num_epochs": 1,
        "lr": 5e-3,
        "ngp": False,
        "hidden_dim": 32,
        "pos_L": 4,
        "dir_L": 2,
        "N_samples": 16,
        "N_importance": 16,
        "white_bg": False,
        "precision": "fp32",
        "occupancy_grid": False,
    }
    base.update(over)
    return with_defaults(ConfigNode(base))


def test_onecycle_schedule_matches_torch_shape():
    s = TrainSettings(lr=1e-3, total_steps=1000)
    sched = make_schedule(s)
    lr0 = float(sched(0))
    lr_peak = float(sched(100))  # pct_start=0.1 -> peak at step 100
    lr_end = float(sched(999))
    assert lr0 == pytest.approx(1e-3, rel=0.05)  # initial = max_lr/div = lr
    assert lr_peak == pytest.approx(1e-2, rel=0.05)  # peak = 10*lr
    assert lr_end < 2e-5  # final ~= initial/100
    assert lr_peak > lr0 > lr_end


def test_dataset_batches_static_shapes(tmp_path):
    npz = tmp_path / "tiny_ray_data.npz"
    make_ray_npz(npz, n_rays=1000)
    ds = RayDataset(npz, verbose=False)
    assert len(ds) == 1000
    batches = list(ds.epoch_batches(batch_size=256, seed=0))
    assert len(batches) == 3  # drop_last
    for b in batches:
        assert b["rays_o"].shape == (256, 3)
        assert b["rgb"].shape == (256, 3)
        assert b["t_near"].shape == (256,)
    # different seeds shuffle differently
    b2 = next(iter(ds.epoch_batches(batch_size=256, seed=1)))
    assert not np.allclose(batches[0]["rays_o"], b2["rays_o"])


@pytest.mark.slow
def test_train_step_decreases_loss_vanilla(tmp_path):
    npz = tmp_path / "tiny_ray_data.npz"
    make_ray_npz(npz, n_rays=4096)
    cfg = _tiny_cfg(tmp_path)
    ds = RayDataset(cfg.rays_file, verbose=False)
    mesh = make_mesh()

    settings = TrainSettings.from_cfg(cfg, total_steps=200)
    fc, ff, _ = build_fields(cfg)
    params = init_params(cfg, jax.random.PRNGKey(0))
    tx = make_optimizer(settings)
    opt_state = tx.init(params)
    from nerfjax.parallel import replicate

    params = replicate(params, mesh)
    opt_state = replicate(opt_state, mesh)
    step = replicate(jnp.zeros((), jnp.int32), mesh)
    key = replicate(jax.random.PRNGKey(1), mesh)

    from nerfjax.train import init_occupancy

    grid = replicate(init_occupancy(settings), mesh)
    step_fn = make_train_step(settings, fc, ff, tx, mesh)

    losses = []
    for epoch in range(16):
        for batch in prefetch_to_device(ds.epoch_batches(256, seed=epoch), mesh):
            params, opt_state, step, grid, metrics = step_fn(
                params, opt_state, step, grid, key, batch
            )
            losses.append(float(metrics["loss_total"]))

    assert np.isfinite(losses).all()
    early = np.mean(losses[:5])
    late = np.mean(losses[-5:])
    assert late < early * 0.5, f"loss did not halve: {early} -> {late}"


@pytest.mark.slow
def test_train_step_ngp_bf16(tmp_path):
    """NGP shared-model mode with bf16 compute runs and improves."""
    npz = tmp_path / "tiny_ray_data.npz"
    make_ray_npz(npz, n_rays=2048)
    cfg = _tiny_cfg(
        tmp_path, ngp=True, nerf_type="small", precision="bf16", lr=1e-2
    )
    ds = RayDataset(cfg.rays_file, verbose=False)
    mesh = make_mesh()
    settings = TrainSettings.from_cfg(cfg, total_steps=100)
    fc, ff, shared = build_fields(cfg)
    assert shared
    params = init_params(cfg, jax.random.PRNGKey(0))
    assert set(params) == {"model"}
    tx = make_optimizer(settings)
    from nerfjax.parallel import replicate

    opt_state = replicate(tx.init(params), mesh)
    params = replicate(params, mesh)
    step = replicate(jnp.zeros((), jnp.int32), mesh)
    key = replicate(jax.random.PRNGKey(1), mesh)
    from nerfjax.train import init_occupancy
    grid = replicate(init_occupancy(settings), mesh)
    step_fn = make_train_step(settings, fc, ff, tx, mesh)

    losses = []
    for epoch in range(8):
        for batch in prefetch_to_device(ds.epoch_batches(256, seed=epoch), mesh):
            params, opt_state, step, grid, m = step_fn(params, opt_state, step, grid, key, batch)
            losses.append(float(m["loss_total"]))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-4:]) < np.mean(losses[:4])


def test_batch_actually_sharded(tmp_path):
    """The ray batch must land dim-0-sharded across all 8 virtual devices."""
    mesh = make_mesh()
    n_dev = len(jax.devices())
    assert n_dev == 8, "conftest should provide 8 virtual CPU devices"
    from nerfjax.parallel import shard_batch

    batch = {"rays_o": np.zeros((256, 3), np.float32)}
    sharded = shard_batch(batch, mesh)
    shards = sharded["rays_o"].addressable_shards
    assert len(shards) == 8
    assert shards[0].data.shape == (32, 3)


def test_full_train_loop_and_checkpoints(tmp_path):
    """train(cfg) end to end: checkpoints written with the reference layout,
    resume continues from the saved epoch."""
    from nerfjax import checkpoint as ckpt
    from nerfjax import pth

    npz = tmp_path / "tiny_ray_data.npz"
    make_ray_npz(npz, n_rays=1024)
    cfg = _tiny_cfg(tmp_path, num_epochs=2, batch_size=256)
    result = train(cfg, log_every=1000)
    assert np.isfinite(result["metrics"]["loss_total"])

    ckpt_dir = tmp_path / "out/ckpt"
    files = sorted(p.name for p in ckpt_dir.iterdir())
    assert "nerf_final.pth" in files
    assert "nerf_epoch_000002.pth" in files

    obj = pth.load(ckpt_dir / "nerf_final.pth")
    assert set(obj) == {
        "iteration",
        "nerf_coarse_state_dict",
        "nerf_fine_state_dict",
        "optimizer_state_dict",
    }
    assert obj["iteration"] == 2
    assert "pos_layers.0.weight" in obj["nerf_coarse_state_dict"]
    # torch Linear layout [out, in]
    assert obj["nerf_coarse_state_dict"]["pos_layers.0.weight"].shape[0] == 32

    # resume from epoch 2: runs epochs 3..4
    cfg2 = _tiny_cfg(tmp_path, num_epochs=4, batch_size=256)
    train(cfg2, resume=True, log_every=1000)
    obj2 = pth.load(ckpt_dir / "nerf_final.pth")
    assert obj2["iteration"] == 4


def test_table_sharded_train_step_matches_replicated():
    """shard_hash_table=True (tensor-parallel hash table) must produce
    bit-identical results to the replicated path on the 8-device mesh, with
    the updated table actually sharded along its entry axis."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from nerfjax.config import ConfigNode, with_defaults
    from nerfjax.parallel import make_mesh, replicate, shard_batch
    from nerfjax.train import (
        TrainSettings,
        build_fields,
        init_occupancy,
        init_params,
        make_optimizer,
        make_train_step,
        table_shardings,
    )

    mesh = make_mesh()
    cfg = with_defaults(
        ConfigNode(
            {
                "scene_name": "tp",
                "ngp": True,
                "nerf_type": "small",
                "N_samples": 4,
                "N_importance": 4,
                "precision": "bf16",
                "occupancy_grid": False,
            }
        )
    )
    B = 32
    settings = TrainSettings.from_cfg(cfg, total_steps=100)
    fc, ff, _ = build_fields(cfg)
    params0 = jax.device_get(init_params(cfg, jax.random.PRNGKey(0)))
    tx = make_optimizer(settings)
    opt0 = jax.device_get(tx.init(params0))

    rng = np.random.default_rng(0)
    o = rng.normal(size=(B, 3)).astype(np.float32)
    o = o / np.linalg.norm(o, axis=-1, keepdims=True) * 2.5
    d = -o / np.linalg.norm(o, axis=-1, keepdims=True)
    batch = shard_batch(
        {
            "rays_o": o,
            "rays_d": d.astype(np.float32),
            "rgb": rng.uniform(size=(B, 3)).astype(np.float32),
            "t_near": np.full((B,), 1.5, np.float32),
            "t_far": np.full((B,), 3.5, np.float32),
        },
        mesh,
    )

    def run(shard, grad_corners=8):
        s = dataclasses.replace(settings, shard_hash_table=shard)
        if grad_corners != 8:
            fck, ffk = (dataclasses.replace(fc, grad_corners=grad_corners),) * 2
        else:
            fck, ffk = fc, ff
        params = jax.tree_util.tree_map(jnp.asarray, params0)
        opt_state = jax.tree_util.tree_map(jnp.asarray, opt0)
        if shard:
            psh, osh = table_shardings(mesh, params, tx)
            params = jax.tree_util.tree_map(jax.device_put, params, psh)
            opt_state = jax.tree_util.tree_map(jax.device_put, opt_state, osh)
        else:
            params = replicate(params, mesh)
            opt_state = replicate(opt_state, mesh)
        step = replicate(jnp.zeros((), jnp.int32), mesh)
        occ = replicate(init_occupancy(s), mesh)
        key = replicate(jax.random.PRNGKey(1), mesh)
        ts = make_train_step(s, fck, ffk, tx, mesh, param_template=params)
        p, _, _, _, m = ts(params, opt_state, step, occ, key, batch)
        return float(m["loss_total"]), np.asarray(p["model"]["table"]), p

    l_rep, t_rep, _ = run(False)
    l_tp, t_tp, p_tp = run(True)
    assert l_rep == l_tp
    np.testing.assert_array_equal(t_rep, t_tp)
    spec = p_tp["model"]["table"].sharding.spec
    assert tuple(spec) == (None, "data"), spec

    # the stochastic backward composes with the sharded table too
    l_rep_s, t_rep_s, _ = run(False, grad_corners=2)
    l_tp_s, t_tp_s, _ = run(True, grad_corners=2)
    assert l_rep_s == l_tp_s
    np.testing.assert_array_equal(t_rep_s, t_tp_s)


def test_single_pass_requires_ngp():
    import pytest

    from nerfjax.config import ConfigNode, with_defaults
    from nerfjax.train import TrainSettings

    cfg = with_defaults(
        ConfigNode({"scene_name": "x", "ngp": False, "single_pass": True})
    )
    with pytest.raises(ValueError, match="single_pass"):
        TrainSettings.from_cfg(cfg, total_steps=100)


def test_single_pass_requires_occupancy():
    from nerfjax.train import TrainSettings

    cfg = with_defaults(
        ConfigNode(
            {
                "scene_name": "x",
                "ngp": True,
                "single_pass": True,
                "occupancy_grid": False,
            }
        )
    )
    with pytest.raises(ValueError, match="occupancy_grid"):
        TrainSettings.from_cfg(cfg, total_steps=100)


def test_onecycle_lr_host_matches_optax():
    from nerfjax.train import onecycle_lr_host

    for total in (10, 100, 1000, 12345):
        s = TrainSettings(lr=5e-4, total_steps=total)
        sched = make_schedule(s)
        counts = sorted(
            {0, 1, total // 10 - 1, total // 10, total // 10 + 1,
             total // 2, total - 1, total, total + 5}
        )
        for c in counts:
            got = onecycle_lr_host(s, c)
            want = float(sched(c))
            # optax evaluates its cosine in float32; allow that rounding
            assert got == pytest.approx(want, rel=1e-4, abs=1e-9), (
                total, c, got, want)
    # constant-schedule branches
    s = TrainSettings(lr=5e-4, total_steps=5)
    assert onecycle_lr_host(s, 3) == pytest.approx(float(make_schedule(s)(3)))
    s = TrainSettings(lr=5e-4, total_steps=100, onecycle=False)
    assert onecycle_lr_host(s, 42) == pytest.approx(5e-4)


def test_table_shardings_match_by_path_not_shape():
    """A decoy leaf with the same [2, T] shape as the hash table must stay
    replicated; only path-keyed 'table' leaves (and their optimizer moments)
    shard along the mesh axis."""
    import optax

    from nerfjax.train import table_shardings

    mesh = make_mesh()
    table = jnp.zeros((2, 64), jnp.float32)
    params = {
        "model": {
            "table": table,
            "decoy_same_shape": jnp.ones((2, 64), jnp.float32),
            "w": jnp.zeros((4, 4), jnp.float32),
        }
    }
    tx = optax.adamw(1e-3)
    psh, oshard = table_shardings(mesh, params, tx)
    from nerfjax.parallel import replicated_sharding

    repl = replicated_sharding(mesh)
    assert psh["model"]["decoy_same_shape"] == repl
    assert psh["model"]["w"] == repl
    assert psh["model"]["table"] != repl
    # optimizer moments follow the same path rule
    leaves, _ = jax.tree_util.tree_flatten_with_path(oshard)
    saw_table_moment = saw_decoy_moment = False
    for path, sh in leaves:
        keys = [getattr(p, "key", getattr(p, "name", None)) for p in path]
        if "table" in keys:
            assert sh != repl
            saw_table_moment = True
        elif "decoy_same_shape" in keys:
            assert sh == repl
            saw_decoy_moment = True
    assert saw_table_moment and saw_decoy_moment


def test_extreme_level_knobs_fail_loudly():
    from nerfjax.train import build_fields

    def cfg_of(**kw):
        return with_defaults(ConfigNode({"scene_name": "x", "ngp": True, **kw}))

    with pytest.raises(ValueError, match="hash_n_levels"):
        build_fields(cfg_of(hash_n_levels=0))
    # promoting every level to dense leaves no hashed level
    with pytest.raises(ValueError, match="no hashed levels"):
        build_fields(cfg_of(nerf_type="small", hash_n_levels=12,
                            hash_extra_dense_levels=12))
    # a promoted res^3 table past the per-level cap is an OOM trap
    with pytest.raises(ValueError, match="OOMs"):
        build_fields(cfg_of(nerf_type="large", hash_n_levels=16,
                            hash_extra_dense_levels=6))
    # the measured-useful configs stay valid (small/medium ed2 = the
    # parity-protocol arms; large 12L+ed2 = the tuned headline)
    for nt in ("small", "medium", "large"):
        build_fields(cfg_of(nerf_type=nt, hash_n_levels=12,
                            hash_extra_dense_levels=2))


def test_table_sharded_2d_mesh_matches_replicated():
    """DP x TP 2-D mesh (round-3 verdict #8): on make_mesh(shape=(2,4)) the
    hash table must shard along the `model` axis only while rays shard
    along `data`, and one train step must be bit-identical to the 1-D
    replicated path."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from nerfjax.config import ConfigNode, with_defaults
    from nerfjax.parallel import MODEL_AXIS, make_mesh, replicate, shard_batch
    from nerfjax.train import (
        TrainSettings,
        build_fields,
        init_occupancy,
        init_params,
        make_optimizer,
        make_train_step,
        table_shardings,
    )

    cfg = with_defaults(
        ConfigNode(
            {
                "scene_name": "tp2d",
                "ngp": True,
                "nerf_type": "small",
                "N_samples": 4,
                "N_importance": 4,
                "precision": "bf16",
                "occupancy_grid": False,
            }
        )
    )
    B = 32
    settings = TrainSettings.from_cfg(cfg, total_steps=100)
    fc, ff, _ = build_fields(cfg)
    params0 = jax.device_get(init_params(cfg, jax.random.PRNGKey(0)))
    tx = make_optimizer(settings)
    opt0 = jax.device_get(tx.init(params0))

    rng = np.random.default_rng(0)
    o = rng.normal(size=(B, 3)).astype(np.float32)
    o = o / np.linalg.norm(o, axis=-1, keepdims=True) * 2.5
    d = -o / np.linalg.norm(o, axis=-1, keepdims=True)
    raw = {
        "rays_o": o,
        "rays_d": d.astype(np.float32),
        "rgb": rng.uniform(size=(B, 3)).astype(np.float32),
        "t_near": np.full((B,), 1.5, np.float32),
        "t_far": np.full((B,), 3.5, np.float32),
    }

    def run(mesh, shard):
        s = dataclasses.replace(settings, shard_hash_table=shard)
        batch = shard_batch(raw, mesh)
        params = jax.tree_util.tree_map(jnp.asarray, params0)
        opt_state = jax.tree_util.tree_map(jnp.asarray, opt0)
        if shard:
            psh, osh = table_shardings(mesh, params, tx)
            params = jax.tree_util.tree_map(jax.device_put, params, psh)
            opt_state = jax.tree_util.tree_map(jax.device_put, opt_state, osh)
        else:
            params = replicate(params, mesh)
            opt_state = replicate(opt_state, mesh)
        step = replicate(jnp.zeros((), jnp.int32), mesh)
        occ = replicate(init_occupancy(s), mesh)
        key = replicate(jax.random.PRNGKey(1), mesh)
        ts = make_train_step(s, fc, ff, tx, mesh, param_template=params)
        p, _, _, _, m = ts(params, opt_state, step, occ, key, batch)
        return float(m["loss_total"]), p

    mesh1d = make_mesh()
    mesh2d = make_mesh(shape=(2, 4))
    assert mesh2d.axis_names == ("data", MODEL_AXIS)

    # Bit-equality control: the SAME 2-D mesh with a replicated table —
    # only the table sharding differs, so TP must not change numerics.
    # (The 1-D mesh is NOT a bit-equality control: 8 data shards vs 2
    # reassociate the loss/grad reductions differently at float precision.)
    l_rep, p_rep = run(mesh2d, shard=False)
    l_2d, p_2d = run(mesh2d, shard=True)
    assert l_rep == l_2d
    np.testing.assert_array_equal(
        np.asarray(p_rep["model"]["table"]), np.asarray(p_2d["model"]["table"])
    )
    # and the 1-D path agrees to float tolerance (same math, different
    # reduction grouping)
    l_1d, p_1d = run(mesh1d, shard=False)
    assert abs(l_1d - l_2d) < 1e-5
    np.testing.assert_allclose(
        np.asarray(p_1d["model"]["table"]),
        np.asarray(p_2d["model"]["table"]),
        atol=1e-5,
    )
    # the table leaf is genuinely split along the model axis (4-way), not data
    tbl = p_2d["model"]["table"]
    spec = tbl.sharding.spec
    assert spec[1] == MODEL_AXIS, spec
    shard_shape = tbl.sharding.shard_shape(tbl.shape)
    assert shard_shape[1] == tbl.shape[1] // 4


def test_make_mesh_shape_validation():
    import pytest as _pytest

    from nerfjax.parallel import make_mesh

    with _pytest.raises(ValueError, match="devices"):
        make_mesh(shape=(3, 4))  # 12 != 8 virtual devices


def test_occ_grid_checkpointed_and_restored_on_resume(tmp_path):
    """Occupancy runs checkpoint the EMA grid as a side-band record and
    resume restores it instead of re-warming from all-ones (round-5: resume
    fidelity — the grid previously restarted fully-occupied)."""
    from nerfjax import checkpoint as ckpt

    npz = tmp_path / "tiny_ray_data.npz"
    make_ray_npz(npz, n_rays=1024)
    cfg = _tiny_cfg(
        tmp_path, num_epochs=2, batch_size=256,
        ngp=True, nerf_type="small",
        occupancy_grid=True, occ_resolution=16, occ_update_every=1,
        single_pass=True, N_samples=8, N_importance=8,
    )
    train(cfg, log_every=1000)

    final = tmp_path / "out/ckpt" / "nerf_final.pth"
    g = ckpt.load_occ_grid(final)
    assert g is not None and g.shape == (16**3,) and g.dtype == np.float32
    # the EMA has decayed away from the all-ones warmup
    assert not np.allclose(g, 1.0)

    # non-occupancy checkpoints carry no grid record
    cfg_v = _tiny_cfg(tmp_path, checkpoint_dir=str(tmp_path / "ckpt_v"))
    train(cfg_v, log_every=1000)
    assert ckpt.load_occ_grid(tmp_path / "ckpt_v" / "nerf_final.pth") is None

    # resume restores the saved grid (observable: the resumed run's first
    # checkpoint still carries a decayed grid, not a re-warmed one; an
    # all-ones restart would need update_every*P steps to decay back)
    cfg2 = _tiny_cfg(
        tmp_path, num_epochs=4, batch_size=256,
        ngp=True, nerf_type="small",
        occupancy_grid=True, occ_resolution=16, occ_update_every=1,
        single_pass=True, N_samples=8, N_importance=8,
    )
    train(cfg2, resume=True, log_every=1000)
    g2 = ckpt.load_occ_grid(final)
    assert g2 is not None and not np.allclose(g2, 1.0)
