import numpy as np

from nerfjax.data import RayDataset, prefetch_to_device
from nerfjax.logging_utils import Logger
from nerfjax.parallel import make_mesh
from tests.synthetic import make_ray_npz


def test_prefetch_keeps_order_and_sharding(tmp_path):
    make_ray_npz(tmp_path / "r.npz", n_rays=1024)
    ds = RayDataset(tmp_path / "r.npz", verbose=False)
    mesh = make_mesh()
    host_batches = list(ds.epoch_batches(256, seed=3))
    dev_batches = list(prefetch_to_device(ds.epoch_batches(256, seed=3), mesh))
    assert len(dev_batches) == len(host_batches)
    for hb, db in zip(host_batches, dev_batches):
        np.testing.assert_allclose(np.asarray(db["rays_o"]), hb["rays_o"])
        assert len(db["rays_o"].addressable_shards) == 8


def test_memmap_dataset(tmp_path):
    make_ray_npz(tmp_path / "r.npz", n_rays=512)
    ds = RayDataset(tmp_path / "r.npz", use_memmap=True, verbose=False)
    assert len(ds) == 512
    b = next(iter(ds.epoch_batches(128, seed=0)))
    assert b["rgb"].shape == (128, 3)


def test_logger_writes_tb_events(tmp_path):
    logger = Logger(tmp_path / "logs")
    logger.scalars(100, {"Loss/Total": 0.5, "PSNR": 20.0})
    logger.close()
    events = list((tmp_path / "logs").glob("events.out.tfevents*"))
    assert events and events[0].stat().st_size > 0
