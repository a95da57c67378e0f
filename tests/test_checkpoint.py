import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerfjax import checkpoint as ckpt
from nerfjax import pth
from nerfjax.config import ConfigNode, with_defaults
from nerfjax.fields.ngp import InstantNGP
from nerfjax.fields.vanilla import VanillaNeRF


def test_vanilla_state_dict_roundtrip():
    model = VanillaNeRF(pos_L=4, dir_L=2, hidden_dim=32)
    params = model.init(jax.random.PRNGKey(0))
    sd = ckpt.vanilla_to_state_dict(model, params)
    # reference names present
    for name in (
        "pos_encoding.freq_bands",
        "pos_layers.0.weight",
        "pos_layers.6.bias",
        "skip_layers.0.weight",
        "density_layer.weight",
        "feature_layer.bias",
        "color_layer.0.weight",
        "color_layer.2.bias",
    ):
        assert name in sd, name
    # freq bands = 2^k * pi
    np.testing.assert_allclose(
        sd["pos_encoding.freq_bands"], (2.0 ** np.arange(4)) * np.pi, rtol=1e-6
    )
    back = ckpt.vanilla_from_state_dict(model, sd)
    pos = jax.random.uniform(jax.random.PRNGKey(1), (9, 3), minval=-1, maxval=1)
    view = pos / jnp.linalg.norm(pos, axis=-1, keepdims=True)
    r0, s0 = model.apply(params, pos, view)
    r1, s1 = model.apply(back, pos, view)
    np.testing.assert_allclose(np.asarray(r0), np.asarray(r1), atol=1e-6)
    np.testing.assert_allclose(np.asarray(s0), np.asarray(s1), atol=1e-6)


def test_ngp_state_dict_roundtrip():
    model = InstantNGP("small")
    params = model.init(jax.random.PRNGKey(0))
    sd = ckpt.ngp_to_state_dict(model, params)
    assert set(sd) == {
        "pos_encoding.params",
        "dir_encoding.params",
        "dmlp.params",
        "cmlp.params",
    }
    assert sd["dir_encoding.params"].size == 0
    back = ckpt.ngp_from_state_dict(model, sd)
    pos = jax.random.uniform(jax.random.PRNGKey(1), (16, 3), minval=-1, maxval=1)
    view = pos / jnp.linalg.norm(pos, axis=-1, keepdims=True)
    r0, s0 = model.apply(params, pos, view)
    r1, s1 = model.apply(back, pos, view)
    np.testing.assert_allclose(np.asarray(r0), np.asarray(r1), atol=1e-6)


def test_ngp_state_dict_tcnn_padded_cmlp():
    """A tcnn-style blob pads the 3-wide output layer to 16 rows."""
    model = InstantNGP("small")
    params = model.init(jax.random.PRNGKey(0))
    sd = ckpt.ngp_to_state_dict(model, params)
    # pad cmlp final layer rows 3 -> 16 with zeros, like tcnn
    dims = [(32, 64), (64, 64), (64, 3)]
    blob = sd["cmlp.params"]
    w0 = blob[: 64 * 32].reshape(64, 32)
    w1 = blob[64 * 32 : 64 * 32 + 64 * 64].reshape(64, 64)
    w2 = blob[64 * 32 + 64 * 64 :].reshape(3, 64)
    w2_padded = np.concatenate([w2, np.zeros((13, 64), np.float32)])
    sd_padded = dict(sd)
    sd_padded["cmlp.params"] = np.concatenate(
        [w0.reshape(-1), w1.reshape(-1), w2_padded.reshape(-1)]
    )
    back = ckpt.ngp_from_state_dict(model, sd_padded)
    np.testing.assert_allclose(
        np.asarray(back["cmlp"][2]["w"]), np.asarray(params["cmlp"][2]["w"]), atol=1e-7
    )


def test_latest_checkpoint(tmp_path):
    assert ckpt.latest_checkpoint(tmp_path / "nope") is None
    d = tmp_path / "ckpt"
    d.mkdir()
    (d / "nerf_epoch_000002.pth").write_bytes(b"x")
    (d / "nerf_epoch_000010.pth").write_bytes(b"x")
    (d / "nerf_final.pth").write_bytes(b"x")
    assert ckpt.latest_checkpoint(d).name == "nerf_epoch_000010.pth"


def test_torch_loads_full_checkpoint(tmp_path):
    """The published checkpoint must open with torch.load exactly like a
    reference-produced one (SURVEY.md §7 contract 5)."""
    torch = pytest.importorskip("torch")
    from nerfjax.train import init_params, make_optimizer, TrainSettings

    cfg = with_defaults(
        ConfigNode({"scene_name": "t", "ngp": False, "hidden_dim": 32, "pos_L": 4, "dir_L": 2})
    )
    params = init_params(cfg, jax.random.PRNGKey(0))
    tx = make_optimizer(TrainSettings(total_steps=10))
    opt_state = tx.init(params)
    p = tmp_path / "nerf_final.pth"
    ckpt.save_train_state(p, cfg, params, opt_state, epoch=4)

    obj = torch.load(p, map_location="cpu", weights_only=False)
    assert obj["iteration"] == 4
    sd = obj["nerf_fine_state_dict"]
    w = sd["pos_layers.0.weight"]
    assert w.shape == (32, 27)  # [out, in] torch layout, pos_L=4 -> 27
    assert w.dtype == torch.float32
    assert "state" in obj["optimizer_state_dict"]
    assert "param_groups" in obj["optimizer_state_dict"]


def test_load_field_params_fine(tmp_path):
    from nerfjax.train import init_params, make_optimizer, TrainSettings

    cfg = with_defaults(ConfigNode({"scene_name": "t", "ngp": True, "nerf_type": "small"}))
    params = init_params(cfg, jax.random.PRNGKey(0))
    tx = make_optimizer(TrainSettings(total_steps=10))
    p = tmp_path / "nerf_final.pth"
    ckpt.save_train_state(p, cfg, params, tx.init(params), epoch=1)

    restored = ckpt.load_field_params(p, cfg, which="fine")
    model = InstantNGP("small")
    pos = jax.random.uniform(jax.random.PRNGKey(1), (8, 3), minval=-1, maxval=1)
    view = pos / jnp.linalg.norm(pos, axis=-1, keepdims=True)
    r0, _ = model.apply(params["model"], pos, view)
    r1, _ = model.apply(restored["model"], pos, view)
    np.testing.assert_allclose(np.asarray(r0), np.asarray(r1), atol=1e-6)


def test_ngp_loads_tcnn_packed_checkpoint():
    """Hand-constructed state dict following tiny-cuda-nn's documented packing
    (fp16 params; hash table entry-major [total, F]; MLP blobs row-major
    [out, in] with the encoding fan-in LEVEL-MAJOR interleaved; final cmlp
    output zero-padded to 16 rows). A numpy simulation of the tcnn-side
    forward must match nerfjax's forward through ngp_from_state_dict.
    Reference packing: scripts/instantngp.py:23-64."""
    from nerfjax.fields.encodings import sh4_encode
    from nerfjax.fields.ngp import hashgrid_indices_and_weights

    model = InstantNGP("small", n_levels=4)
    spec = model.spec
    L, F = spec.n_levels, spec.n_features
    enc_dim = spec.output_dim
    total = spec.total_table_size
    rng = np.random.default_rng(0)

    # fp16 blobs exactly as tcnn publishes them.
    table_f16 = rng.normal(scale=1e-2, size=(total, F)).astype(np.float16)
    d1 = rng.normal(scale=0.3, size=(64, enc_dim)).astype(np.float16)
    d2 = rng.normal(scale=0.3, size=(16, 64)).astype(np.float16)
    c1 = rng.normal(scale=0.3, size=(64, 32)).astype(np.float16)
    c2 = rng.normal(scale=0.3, size=(64, 64)).astype(np.float16)
    c3 = np.zeros((16, 64), np.float16)  # padded 3 -> 16 rows
    c3[:3] = rng.normal(scale=0.3, size=(3, 64)).astype(np.float16)
    sd = {
        "pos_encoding.params": table_f16.reshape(-1),
        "dir_encoding.params": np.zeros((0,), np.float16),
        "dmlp.params": np.concatenate([d1.reshape(-1), d2.reshape(-1)]),
        "cmlp.params": np.concatenate(
            [c1.reshape(-1), c2.reshape(-1), c3.reshape(-1)]
        ),
    }

    pos = rng.uniform(-1, 1, size=(17, 3)).astype(np.float32)
    view = rng.normal(size=(17, 3)).astype(np.float32)
    view /= np.linalg.norm(view, axis=-1, keepdims=True)

    # --- numpy simulation of the tcnn-side forward -------------------------
    x01 = np.clip((pos + 1.0) * 0.5, 0.0, 1.0)
    idx, w = hashgrid_indices_and_weights(spec, jnp.asarray(x01))
    g = table_f16.astype(np.float32)[np.asarray(idx)]  # [N, L*8, F]
    lvl = (g * np.asarray(w)[..., None]).reshape(len(pos), L, 8, F).sum(axis=2)
    enc = lvl.reshape(len(pos), L * F)  # level-major interleave (tcnn)
    relu = lambda a: np.maximum(a, 0.0)
    feat = relu(relu(enc @ d1.astype(np.float32).T) @ d2.astype(np.float32).T)
    sigma_ref = feat[:, :1]
    sh = np.asarray(sh4_encode(jnp.asarray(view)), np.float32)
    h = np.concatenate([feat, sh], axis=-1)
    h = relu(h @ c1.astype(np.float32).T)
    h = relu(h @ c2.astype(np.float32).T)
    rgb_ref = 1.0 / (1.0 + np.exp(-(h @ c3.astype(np.float32).T[:, :3])))

    # --- nerfjax load + forward --------------------------------------------
    params = ckpt.ngp_from_state_dict(model, sd)
    rgb, sigma = model.apply(params, jnp.asarray(pos), jnp.asarray(view))
    np.testing.assert_allclose(np.asarray(sigma), sigma_ref, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(rgb), rgb_ref, rtol=2e-4, atol=2e-5)

    # And the export direction round-trips through the tcnn packing exactly.
    sd2 = ckpt.ngp_to_state_dict(model, params)
    params2 = ckpt.ngp_from_state_dict(model, sd2)
    rgb2, sigma2 = model.apply(params2, jnp.asarray(pos), jnp.asarray(view))
    np.testing.assert_allclose(np.asarray(rgb2), np.asarray(rgb), atol=1e-6)
    np.testing.assert_allclose(np.asarray(sigma2), np.asarray(sigma), atol=1e-6)


def test_ngp_state_dict_roundtrip_tuned_spec():
    """The tuned op point changes the model shape (12 levels, promoted
    dense levels) — the state-dict mapping must round-trip it too, since
    extraction/eval rebuild the model from the SAME cfg via build_fields."""
    model = InstantNGP("small", n_levels=12, extra_dense_levels=2)
    params = model.init(jax.random.PRNGKey(0))
    sd = ckpt.ngp_to_state_dict(model, params)
    back = ckpt.ngp_from_state_dict(model, sd)
    pos = jax.random.uniform(jax.random.PRNGKey(1), (16, 3), minval=-1, maxval=1)
    view = pos / jnp.linalg.norm(pos, axis=-1, keepdims=True)
    r0, s0 = model.apply(params, pos, view)
    r1, s1 = model.apply(back, pos, view)
    np.testing.assert_allclose(np.asarray(r0), np.asarray(r1), atol=1e-6)
    np.testing.assert_allclose(np.asarray(s0), np.asarray(s1), atol=1e-6)


def test_load_field_params_from_tcnn_fp16_checkpoint_file(tmp_path):
    """Layout-golden interop at the FILE level (round-3 verdict #7): a
    reference-shaped checkpoint whose state dicts are tcnn `params` blobs
    exactly as a CUDA run would publish them — fp16 torch tensors, hash
    table entry-major [total, F], MLP blobs row-major [out, in] with the
    encoding fan-in level-major interleaved, cmlp output zero-padded to 16
    rows — written by real torch.save (reference scripts/train.py:343-351
    layout), then opened through checkpoint.load_field_params. The decoded
    field must compute the same function as ngp_from_state_dict applied to
    the same blobs directly, closing the zip/pickle/HalfStorage chain the
    in-memory test cannot."""
    torch = pytest.importorskip("torch")
    from nerfjax.config import ConfigNode, with_defaults

    model = InstantNGP("small", n_levels=4)
    spec = model.spec
    L, F = spec.n_levels, spec.n_features
    enc_dim = spec.output_dim
    total = spec.total_table_size
    rng = np.random.default_rng(7)

    table_f16 = rng.normal(scale=1e-2, size=(total, F)).astype(np.float16)
    d1 = rng.normal(scale=0.3, size=(64, enc_dim)).astype(np.float16)
    d2 = rng.normal(scale=0.3, size=(16, 64)).astype(np.float16)
    c1 = rng.normal(scale=0.3, size=(64, 32)).astype(np.float16)
    c2 = rng.normal(scale=0.3, size=(64, 64)).astype(np.float16)
    c3 = np.zeros((16, 64), np.float16)
    c3[:3] = rng.normal(scale=0.3, size=(3, 64)).astype(np.float16)
    sd_np = {
        "pos_encoding.params": table_f16.reshape(-1),
        "dir_encoding.params": np.zeros((0,), np.float16),
        "dmlp.params": np.concatenate([d1.reshape(-1), d2.reshape(-1)]),
        "cmlp.params": np.concatenate(
            [c1.reshape(-1), c2.reshape(-1), c3.reshape(-1)]
        ),
    }
    sd_torch = {k: torch.from_numpy(v.copy()) for k, v in sd_np.items()}
    assert all(v.dtype == torch.float16 for v in sd_torch.values())
    path = tmp_path / "nerf_final.pth"
    torch.save(
        {
            "iteration": 12345,
            "nerf_coarse_state_dict": sd_torch,  # NGP: coarse is fine (train.py:220)
            "nerf_fine_state_dict": sd_torch,
            "optimizer_state_dict": {"state": {}, "param_groups": []},
        },
        path,
    )

    cfg = with_defaults(
        ConfigNode(
            {"scene_name": "t", "ngp": True, "nerf_type": "small", "hash_n_levels": 4}
        )
    )
    loaded = ckpt.load_field_params(path, cfg, which="fine")
    direct = ckpt.ngp_from_state_dict(model, sd_np)

    pos = jnp.asarray(rng.uniform(-1, 1, size=(23, 3)).astype(np.float32))
    view = rng.normal(size=(23, 3)).astype(np.float32)
    view = jnp.asarray(view / np.linalg.norm(view, axis=-1, keepdims=True))
    r0, s0 = model.apply(direct, pos, view)
    r1, s1 = model.apply(loaded["model"], pos, view)
    np.testing.assert_array_equal(np.asarray(r0), np.asarray(r1))
    np.testing.assert_array_equal(np.asarray(s0), np.asarray(s1))
