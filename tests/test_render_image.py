"""Train on the synthetic image scene, then held-out-frame PSNR must beat an
untrained model by a wide margin — end-to-end quality signal."""

import numpy as np
import pytest

from nerfjax.config import ConfigNode, with_defaults
from nerfjax.train import build_fields, init_params, train
from nerfjax.render_image import eval_psnr, render_image
from tests.synthetic import make_image_scene

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def trained_scene(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("ri")
    tj = make_image_scene(tmp_path / "imgs", "ri", n_frames=6, H=24, W=24)

    import json

    cfg = with_defaults(
        ConfigNode(
            {
                "scene_name": "ri",
                "output_dir": str(tmp_path / "out"),
                "checkpoint_dir": str(tmp_path / "out/ckpt"),
                "transforms_json": str(tj),
                "rays_file": str(tmp_path / "ri_rays.npz"),
                "batch_size": 512,
                "num_epochs": 60,
                "lr": 1e-2,
                "ngp": True,
                "nerf_type": "small",
                "N_samples": 24,
                "N_importance": 24,
                "precision": "fp32",
                "occupancy_grid": True,
                "occ_resolution": 16,
                "occ_update_every": 8,
            }
        )
    )
    from nerfjax.rays import precompute_rays_for_scene, save_ray_data

    save_ray_data(precompute_rays_for_scene(tj), cfg.rays_file)
    result = train(cfg, log_every=10_000)
    return cfg, tj, result["params"]


def test_render_image_shapes(trained_scene):
    import json

    cfg, tj, params = trained_scene
    meta = json.loads(open(tj).read())
    field, _, _ = build_fields(cfg)
    import jax.numpy as jnp

    img = render_image(
        field,
        params["model"],
        np.array(meta["K"], np.float32),
        np.array(meta["frames"][0]["transform_matrix"], np.float32),
        meta["h"],
        meta["w"],
        n_samples=24,
        n_importance=24,
        chunk_rays=512,
        dtype=jnp.float32,
    )
    assert img.shape == (24, 24, 3)
    assert np.isfinite(img).all()
    assert 0 <= img.min() and img.max() <= 1


def test_trained_psnr_beats_untrained(trained_scene):
    import jax
    import jax.numpy as jnp

    cfg, tj, params = trained_scene
    field, _, _ = build_fields(cfg)
    trained = eval_psnr(
        field, params["model"], tj, n_frames=2, n_samples=24, n_importance=24,
        dtype=jnp.float32, verbose=False,
    )
    fresh = init_params(cfg, jax.random.PRNGKey(123))
    untrained = eval_psnr(
        field, fresh["model"], tj, n_frames=2, n_samples=24, n_importance=24,
        dtype=jnp.float32, verbose=False,
    )
    assert trained["psnr_mean"] > untrained["psnr_mean"] + 4.0, (
        trained["psnr_mean"], untrained["psnr_mean"],
    )
    assert trained["psnr_mean"] > 18.0, trained["psnr_mean"]
