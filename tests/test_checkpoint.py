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
