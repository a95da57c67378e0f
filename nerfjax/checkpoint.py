"""Checkpointing: reference-compatible .pth files + real resume.

File contract (reference: scripts/train.py:343-351): a torch-pickle dict
  {iteration: int,
   nerf_coarse_state_dict: {name: tensor},
   nerf_fine_state_dict:   {name: tensor},
   optimizer_state_dict:   {state: {...}, param_groups: [...]}}
written every 2 epochs as nerf_epoch_{E:06d}.pth plus nerf_final.pth.
For NGP the coarse and fine state dicts are the same shared model
(reference: scripts/train.py:219-222).

State-dict name mapping:
  * Vanilla (reference scripts/model.py:99-137): pos_layers.{0,2,4,6}.weight/
    bias, skip_layers.{0,2,4,6}.weight/bias, density_layer.*, feature_layer.*,
    color_layer.{0,2}.*, plus the pos/dir_encoding.freq_bands buffers.
    torch Linear weights are [out,in]; ours are [in,out] — transposed here.
  * NGP (reference scripts/instantngp.py:23-64): tcnn packs each module into
    a flat `params` blob. Documented nerfjax mapping: pos_encoding.params =
    hash table [total,F] row-major flattened (entry-major = tcnn layout);
    dmlp.params / cmlp.params = concatenated row-major [out,in] weight
    matrices in layer order (tcnn layout), with tcnn's zero-padding of the
    3-wide cmlp output to 16 rows tolerated on read, and fp16 blobs accepted.
    tcnn's encoding output is LEVEL-MAJOR interleaved while the nerfjax
    runtime is plane-major; the fan-in axis of the first dmlp layer is
    permuted on export/import (_enc_col_perm) so both ecosystems compute the
    same function from the same published blob.

The reference has NO resume path (loaders only restore the fine model,
scripts/extract_vol.py:40-54). nerfjax adds exact resume: the optax state is
stored losslessly as a side-band record in the same zip (ignored by torch).
"""

from __future__ import annotations

import re
from pathlib import Path
from typing import Any

import jax
import numpy as np

from nerfjax import pth
from nerfjax.config import ConfigNode
from nerfjax.fields.ngp import InstantNGP
from nerfjax.fields.vanilla import VanillaNeRF
from nerfjax.train import build_fields

# ---------------------------------------------------------------------------
# Vanilla <-> torch state dict
# ---------------------------------------------------------------------------

_VANILLA_SEQ = {"pos_layers": (0, 2, 4, 6), "skip_layers": (0, 2, 4, 6)}


def vanilla_to_state_dict(model: VanillaNeRF, params: dict) -> dict[str, np.ndarray]:
    sd: dict[str, np.ndarray] = {}
    sd["pos_encoding.freq_bands"] = (
        2.0 ** np.arange(model.pos_L, dtype=np.float32) * np.pi
    ).astype(np.float32)
    sd["dir_encoding.freq_bands"] = (
        2.0 ** np.arange(model.dir_L, dtype=np.float32) * np.pi
    ).astype(np.float32)
    for group, idxs in _VANILLA_SEQ.items():
        for i, torch_i in enumerate(idxs):
            p = params[group][i]
            sd[f"{group}.{torch_i}.weight"] = np.asarray(p["w"]).T.copy()
            sd[f"{group}.{torch_i}.bias"] = np.asarray(p["b"]).copy()
    sd["density_layer.weight"] = np.asarray(params["density"]["w"]).T.copy()
    sd["density_layer.bias"] = np.asarray(params["density"]["b"]).copy()
    sd["feature_layer.weight"] = np.asarray(params["feature"]["w"]).T.copy()
    sd["feature_layer.bias"] = np.asarray(params["feature"]["b"]).copy()
    for i, torch_i in enumerate((0, 2)):
        p = params["color_layers"][i]
        sd[f"color_layer.{torch_i}.weight"] = np.asarray(p["w"]).T.copy()
        sd[f"color_layer.{torch_i}.bias"] = np.asarray(p["b"]).copy()
    return sd


def vanilla_from_state_dict(model: VanillaNeRF, sd: dict[str, np.ndarray]) -> dict:
    import jax.numpy as jnp

    def lin(prefix: str) -> dict:
        return {
            "w": jnp.asarray(np.asarray(sd[f"{prefix}.weight"]).T, jnp.float32),
            "b": jnp.asarray(sd[f"{prefix}.bias"], jnp.float32),
        }

    return {
        "pos_layers": [lin(f"pos_layers.{i}") for i in _VANILLA_SEQ["pos_layers"]],
        "skip_layers": [lin(f"skip_layers.{i}") for i in _VANILLA_SEQ["skip_layers"]],
        "density": lin("density_layer"),
        "feature": lin("feature_layer"),
        "color_layers": [lin(f"color_layer.{i}") for i in (0, 2)],
    }


# ---------------------------------------------------------------------------
# NGP <-> tcnn-shaped state dict
# ---------------------------------------------------------------------------


def _mlp_dims(model: InstantNGP) -> dict[str, list[tuple[int, int]]]:
    enc = model.spec.output_dim
    return {
        "dmlp": [(enc, model.hidden), (model.hidden, model.geo_feat_dim)],
        "cmlp": [
            (model.geo_feat_dim + 16, model.hidden),
            (model.hidden, model.hidden),
            (model.hidden, 3),
        ],
    }


def _enc_col_perm(spec) -> np.ndarray:
    """Column permutation between tcnn's level-major interleaved encoding
    output (col = level*F + feature, tiny-cuda-nn hash grid layout) and the
    nerfjax runtime's plane-major layout (col = feature*L + level).

    Returns perm with perm[tcnn_col] = nerfjax_col. The inverse direction is
    np.argsort(perm). Applied to the fan-in axis of the FIRST density-MLP
    layer on state-dict export/import so cross-ecosystem NGP checkpoints
    (reference/tcnn <-> nerfjax) compute the same function.
    """
    L, F = spec.n_levels, spec.n_features
    lvl = np.repeat(np.arange(L), F)
    feat = np.tile(np.arange(F), L)
    return feat * L + lvl


def ngp_to_state_dict(model: InstantNGP, params: dict) -> dict[str, np.ndarray]:
    sd: dict[str, np.ndarray] = {}
    # runtime layout is [F, total] feature planes; the published blob is
    # entry-major [total, F] flattened (tcnn layout).
    sd["pos_encoding.params"] = (
        np.asarray(params["table"], np.float32).T.reshape(-1).copy()
    )
    sd["dir_encoding.params"] = np.zeros((0,), np.float32)  # SH has no params
    perm = _enc_col_perm(model.spec)
    for name in ("dmlp", "cmlp"):
        blobs = []
        for li, layer in enumerate(params[name]):
            w = np.asarray(layer["w"], np.float32).T  # [out, in]
            if name == "dmlp" and li == 0:
                # fan-in is the encoding: publish in tcnn's level-major order.
                w = w[:, perm]
            blobs.append(w.reshape(-1))
        sd[f"{name}.params"] = np.concatenate(blobs)
    return sd


def ngp_from_state_dict(model: InstantNGP, sd: dict[str, np.ndarray]) -> dict:
    import jax.numpy as jnp

    spec = model.spec
    table = (
        np.asarray(sd["pos_encoding.params"], np.float32)
        .reshape(spec.total_table_size, spec.n_features)
        .T.copy()
    )
    params: dict[str, Any] = {"table": jnp.asarray(table)}
    inv_perm = np.argsort(_enc_col_perm(spec))
    for name, dims in _mlp_dims(model).items():
        blob = np.asarray(sd[f"{name}.params"], np.float32)
        layers = []
        off = 0
        for li, (fan_in, fan_out) in enumerate(dims):
            # tcnn pads output widths to 16; tolerate a padded final layer.
            padded_out = fan_out
            need = fan_out * fan_in
            remaining = blob.size - off
            if li == len(dims) - 1 and remaining > need:
                padded_out = -(-fan_out // 16) * 16
                need = padded_out * fan_in
            w = blob[off : off + need].reshape(padded_out, fan_in)[:fan_out]
            if name == "dmlp" and li == 0:
                # published fan-in order is tcnn level-major; runtime wants
                # plane-major (see _enc_col_perm).
                w = w[:, inv_perm]
            layers.append({"w": jnp.asarray(w.T.copy())})
            off += need
        params[name] = layers
    return params


# ---------------------------------------------------------------------------
# Train-state save / restore
# ---------------------------------------------------------------------------


def params_to_state_dicts(cfg: ConfigNode, params: dict) -> tuple[dict, dict]:
    fc, ff, shared = build_fields(cfg)
    if shared:
        sd = ngp_to_state_dict(fc, params["model"])
        return sd, sd
    return (
        vanilla_to_state_dict(fc, params["coarse"]),
        vanilla_to_state_dict(ff, params["fine"]),
    )


def params_from_state_dicts(cfg: ConfigNode, coarse_sd: dict, fine_sd: dict) -> dict:
    fc, ff, shared = build_fields(cfg)
    if shared:
        return {"model": ngp_from_state_dict(ff, fine_sd)}
    return {
        "coarse": vanilla_from_state_dict(fc, coarse_sd),
        "fine": vanilla_from_state_dict(ff, fine_sd),
    }


def _optimizer_state_dict(opt_state, lr: float) -> dict:
    """torch-AdamW-shaped optimizer summary (interop; exact state is the
    side-band optax record)."""
    import optax

    adam = None
    for s in jax.tree_util.tree_leaves(
        opt_state, is_leaf=lambda x: isinstance(x, optax.ScaleByAdamState)
    ):
        if isinstance(s, optax.ScaleByAdamState):
            adam = s
            break
    state: dict[int, dict] = {}
    if adam is not None:
        mu = jax.tree_util.tree_leaves(adam.mu)
        nu = jax.tree_util.tree_leaves(adam.nu)
        count = int(np.asarray(jax.device_get(adam.count)))
        for i, (m, v) in enumerate(zip(mu, nu)):
            state[i] = {
                "step": count,
                "exp_avg": np.asarray(jax.device_get(m), np.float32),
                "exp_avg_sq": np.asarray(jax.device_get(v), np.float32),
            }
    return {
        "state": state,
        "param_groups": [
            {
                "lr": float(lr),
                "betas": (0.9, 0.999),
                "eps": 1e-8,
                "weight_decay": 1e-6,
                "params": list(range(len(state))),
            }
        ],
    }


def save_train_state(
    path: str | Path, cfg: ConfigNode, params, opt_state, epoch: int,
    occ_grid=None,
) -> None:
    import io

    from flax import serialization

    params_host = jax.device_get(params)
    coarse_sd, fine_sd = params_to_state_dicts(cfg, params_host)
    obj = {
        "iteration": int(epoch),
        "nerf_coarse_state_dict": coarse_sd,
        "nerf_fine_state_dict": fine_sd,
        "optimizer_state_dict": _optimizer_state_dict(
            jax.device_get(opt_state), float(cfg.get("lr", 5e-4))
        ),
    }
    extra = {
        "optax_state.msgpack": serialization.to_bytes(jax.device_get(opt_state)),
        "params.msgpack": serialization.to_bytes(params_host),
    }
    if occ_grid is not None:
        # side-band npy record: resume restores the occupancy EMA instead of
        # re-warming from all-ones (which over-samples empty space for the
        # first update_every steps after a resume)
        buf = io.BytesIO()
        np.save(buf, np.asarray(jax.device_get(occ_grid)))
        extra["occ_grid.npy"] = buf.getvalue()
    pth.save(obj, path, extra_records=extra)


def restore_train_state(path: str | Path, cfg: ConfigNode, params_template, opt_state_template):
    """Exact resume: params + optax state + epoch from a nerfjax checkpoint.

    Falls back to the torch-interop state dicts for params when the side-band
    record is absent (e.g. a reference-produced checkpoint).
    """
    from flax import serialization

    obj = pth.load(path)
    epoch = int(obj.get("iteration", 0))

    raw_params = pth.load_extra_record(path, "params.msgpack")
    if raw_params is not None:
        params = serialization.from_bytes(params_template, raw_params)
    else:
        params = params_from_state_dicts(
            cfg, obj["nerf_coarse_state_dict"], obj["nerf_fine_state_dict"]
        )

    raw_opt = pth.load_extra_record(path, "optax_state.msgpack")
    if raw_opt is not None:
        opt_state = serialization.from_bytes(opt_state_template, raw_opt)
    else:
        opt_state = opt_state_template
    return params, opt_state, epoch


def load_occ_grid(path: str | Path) -> np.ndarray | None:
    """Occupancy-grid EMA saved alongside a nerfjax checkpoint, or None
    (absent on reference-produced or pre-round-5 checkpoints)."""
    import io

    raw = pth.load_extra_record(path, "occ_grid.npy")
    if raw is None:
        return None
    return np.load(io.BytesIO(raw))


def load_field_params(path: str | Path, cfg: ConfigNode, which: str = "fine") -> dict:
    """Load just the field params for extraction/rendering
    (reference: scripts/extract_vol.py:40-54 restores only the fine model)."""
    obj = pth.load(path)
    key = f"nerf_{which}_state_dict"
    if key not in obj:
        raise KeyError(f"{key} not found in checkpoint {path}")
    fc, ff, shared = build_fields(cfg)
    model = ff if which == "fine" else fc
    if shared:
        return {"model": ngp_from_state_dict(model, obj[key])}
    return {which: vanilla_from_state_dict(model, obj[key])}


_CKPT_RE = re.compile(r"nerf_epoch_(\d+)\.pth$")


def latest_checkpoint(checkpoint_dir: str | Path) -> Path | None:
    checkpoint_dir = Path(checkpoint_dir)
    if not checkpoint_dir.exists():
        return None
    best, best_epoch = None, -1
    for p in checkpoint_dir.iterdir():
        m = _CKPT_RE.search(p.name)
        if m and int(m.group(1)) > best_epoch:
            best, best_epoch = p, int(m.group(1))
    return best
