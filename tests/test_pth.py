"""Torch-zip .pth format: round-trip with ourselves AND cross-compat with
real torch (available in the test image; nerfjax itself never imports it)."""

import numpy as np
import pytest

from nerfjax import pth


def _sample_obj():
    return {
        "iteration": 4,
        "nested": {
            "w": np.arange(12, dtype=np.float32).reshape(3, 4),
            "b": np.array([1.5, -2.5], dtype=np.float32),
            "flag": True,
            "none": None,
            "name": "hello",
        },
        "ints": [1, 2, 3_000_000_000],
        "floats": [0.25, -1e10],
        "u8": np.array([[0, 255], [7, 9]], dtype=np.uint8),
        "i64": np.array([1, -(2**40)], dtype=np.int64),
        "scalar": np.float32(2.5),
    }


def _assert_same(a, b):
    if isinstance(a, dict):
        assert set(a) == set(b)
        for k in a:
            _assert_same(a[k], b[k])
    elif isinstance(a, (list, tuple)):
        assert len(a) == len(b)
        for x, y in zip(a, b):
            _assert_same(x, y)
    elif isinstance(a, np.ndarray):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    elif isinstance(a, float):
        assert a == pytest.approx(b)
    else:
        assert a == b or (np.isscalar(a) and float(a) == float(b))


def test_roundtrip_self(tmp_path):
    p = tmp_path / "x.pth"
    obj = _sample_obj()
    pth.save(obj, p)
    back = pth.load(p)
    _assert_same(obj, back)


def test_torch_can_load_ours(tmp_path):
    torch = pytest.importorskip("torch")
    p = tmp_path / "x.pth"
    obj = _sample_obj()
    pth.save(obj, p)
    loaded = torch.load(p, map_location="cpu", weights_only=False)
    assert loaded["iteration"] == 4
    np.testing.assert_array_equal(
        loaded["nested"]["w"].numpy(), obj["nested"]["w"]
    )
    np.testing.assert_array_equal(loaded["u8"].numpy(), obj["u8"])
    np.testing.assert_array_equal(loaded["i64"].numpy(), obj["i64"])
    assert loaded["nested"]["flag"] is True
    assert loaded["nested"]["none"] is None
    assert loaded["nested"]["name"] == "hello"
    assert loaded["ints"] == [1, 2, 3_000_000_000]


def test_we_can_load_torch(tmp_path):
    torch = pytest.importorskip("torch")
    p = tmp_path / "t.pth"
    obj = {
        "iteration": 7,
        "sd": {
            "layer.weight": torch.arange(6, dtype=torch.float32).reshape(2, 3),
            "layer.bias": torch.tensor([1.0, 2.0]),
        },
        "meta": {"resolution": 64, "bounds": [-1.0, 1.0]},
        "occ": torch.ones(4, 4, dtype=torch.uint8),
    }
    torch.save(obj, p)
    back = pth.load(p)
    assert back["iteration"] == 7
    np.testing.assert_array_equal(
        back["sd"]["layer.weight"], np.arange(6, dtype=np.float32).reshape(2, 3)
    )
    np.testing.assert_array_equal(back["occ"], np.ones((4, 4), np.uint8))
    assert back["meta"]["bounds"] == [-1.0, 1.0]


def test_we_can_load_noncontiguous_torch_tensor(tmp_path):
    torch = pytest.importorskip("torch")
    p = tmp_path / "t.pth"
    base = torch.arange(12, dtype=torch.float32).reshape(3, 4)
    torch.save({"t": base.t()}, p)  # transposed view: non-trivial strides
    back = pth.load(p)
    np.testing.assert_array_equal(
        back["t"], np.arange(12, dtype=np.float32).reshape(3, 4).T
    )


def test_extra_records_survive_and_torch_ignores(tmp_path):
    torch = pytest.importorskip("torch")
    p = tmp_path / "x.pth"
    pth.save({"a": 1}, p, extra_records={"blob.bin": b"\x00\x01binary"})
    assert pth.load_extra_record(p, "blob.bin") == b"\x00\x01binary"
    assert pth.load_extra_record(p, "missing.bin") is None
    assert torch.load(p, weights_only=False)["a"] == 1


def test_rebuild_tensor_bounds_checked():
    """Corrupt size/stride/offset from the pickle stream must be rejected
    before as_strided, not read out-of-bounds (ADVICE r1)."""
    import pickle

    storage = np.arange(8, dtype=np.float32)
    for offset, size, stride in [
        (0, (4, 4), (4, 1)),   # extent 16 > numel 8
        (-1, (2,), (1,)),      # negative offset
        (6, (4,), (1,)),       # offset pushes extent past the end
        (0, (2,), (-1,)),      # negative stride
        (8, (), ()),           # scalar past the end
        (0, (2,), (1, 1)),     # rank mismatch
    ]:
        with pytest.raises(pickle.UnpicklingError):
            pth._rebuild_tensor(storage, offset, size, stride)
    # Legitimate strided views and zero-size tensors still load.
    out = pth._rebuild_tensor(storage, 2, (2, 3), (3, 1))
    np.testing.assert_array_equal(
        out, np.array([[2, 3, 4], [5, 6, 7]], np.float32)
    )
    assert pth._rebuild_tensor(storage, 0, (0, 3), (3, 1)).shape == (0, 3)


def test_reads_state_dict_with_metadata_attribute():
    """torch pickles nn.Module.state_dict() as an OrderedDict carrying a
    `_metadata` ATTRIBUTE, applied via a BUILD opcode — the reader must
    absorb it (a plain-dict stand-in has no __dict__ and crashes)."""
    torch = pytest.importorskip("torch")
    import torch.nn as nn

    from nerfjax import pth

    m = nn.Sequential(nn.Linear(4, 3), nn.ReLU(), nn.Linear(3, 2))
    sd = m.state_dict()
    assert getattr(sd, "_metadata", None) is not None  # the BUILD trigger
    import tempfile, os
    with tempfile.TemporaryDirectory() as td:
        p = os.path.join(td, "m.pth")
        torch.save({"state": sd, "iteration": 7}, p)
        obj = pth.load(p)
    assert obj["iteration"] == 7
    import numpy as np
    np.testing.assert_allclose(
        obj["state"]["0.weight"], sd["0.weight"].numpy(), atol=0
    )


def test_mmap_load_matches_eager_self(tmp_path):
    """mmap=True returns the same values as the eager path on our own files
    (lazy read-only views over the stored blobs; round-3 verdict #6)."""
    p = tmp_path / "x.pth"
    obj = _sample_obj()
    pth.save(obj, p)
    eager = pth.load(p)
    lazy = pth.load(p, mmap=True)
    _assert_same(eager, lazy)
    # the big arrays really are file-backed views, not copies: read-only,
    # with a memmap somewhere in the base chain (as_strided interposes a
    # DummyArray wrapper)
    w = lazy["nested"]["w"]
    assert not w.flags.writeable
    base = w
    seen_mm = False
    while base is not None:
        if isinstance(base, np.memmap):
            seen_mm = True
            break
        base = getattr(base, "base", None)
        if base is not None and not isinstance(base, np.ndarray):
            base = getattr(base, "base", None)  # DummyArray holds the memmap in .base
    assert seen_mm or not w.flags.owndata


def test_mmap_load_matches_eager_torch_file(tmp_path):
    """torch.save also writes ZIP_STORED members, so torch-written
    checkpoints take the mmap fast path too."""
    torch = pytest.importorskip("torch")
    p = tmp_path / "t.pth"
    base = torch.arange(12, dtype=torch.float32).reshape(3, 4)
    torch.save({"t": base.t(), "occ": torch.ones(4, 4, dtype=torch.uint8)}, p)
    lazy = pth.load(p, mmap=True)
    np.testing.assert_array_equal(
        lazy["t"], np.arange(12, dtype=np.float32).reshape(3, 4).T
    )
    np.testing.assert_array_equal(lazy["occ"], np.ones((4, 4), np.uint8))


def test_mmap_falls_back_on_compressed_members(tmp_path):
    """A DEFLATE-compressed storage cannot be mapped in place; mmap=True
    must silently fall back to the eager copy path for that member."""
    import zipfile

    p = tmp_path / "x.pth"
    pth.save({"a": np.arange(100, dtype=np.float32)}, p)
    q = tmp_path / "x_deflated.pth"
    with zipfile.ZipFile(p) as zin, zipfile.ZipFile(
        q, "w", compression=zipfile.ZIP_DEFLATED
    ) as zout:
        for name in zin.namelist():
            zout.writestr(name, zin.read(name))
    lazy = pth.load(q, mmap=True)
    np.testing.assert_array_equal(lazy["a"], np.arange(100, dtype=np.float32))
