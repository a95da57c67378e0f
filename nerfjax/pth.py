"""Torch-free reader/writer for PyTorch's zipfile ``.pth`` serialization.

The published checkpoint/volume contract of the pipeline is torch-pickle
files (reference: scripts/train.py:343-351 checkpoints; scripts/extract_vol.py
:195-202 volume.pth; scripts/post_process_vol.py:11-15 volume_sliced.pth).
This module implements that container format directly — a ZIP archive with
``archive/data.pkl`` (a pickle whose tensors are persistent-id references)
plus raw little-endian storage blobs under ``archive/data/<n>`` — so nerfjax
can produce files `torch.load` opens and read files `torch.save` wrote,
without importing torch at runtime.

Supported object graph: dict / list / tuple / str / int / float / bool /
None / numpy arrays (written as tensors) / numpy scalars. Tensors round-trip
as numpy arrays.
"""

from __future__ import annotations

import io
import pickle
import struct
import zipfile
from pathlib import Path
from typing import Any

import numpy as np

ARCHIVE_PREFIX = "archive"

# numpy dtype <-> torch storage class name
_DTYPE_TO_STORAGE = {
    np.dtype("float32"): "FloatStorage",
    np.dtype("float64"): "DoubleStorage",
    np.dtype("float16"): "HalfStorage",
    np.dtype("int64"): "LongStorage",
    np.dtype("int32"): "IntStorage",
    np.dtype("int16"): "ShortStorage",
    np.dtype("int8"): "CharStorage",
    np.dtype("uint8"): "ByteStorage",
    np.dtype("bool"): "BoolStorage",
}
_STORAGE_TO_DTYPE = {v: k for k, v in _DTYPE_TO_STORAGE.items()}

try:  # bfloat16 via ml_dtypes (ships with jax)
    import ml_dtypes

    _BF16 = np.dtype(ml_dtypes.bfloat16)
    _DTYPE_TO_STORAGE[_BF16] = "BFloat16Storage"
    _STORAGE_TO_DTYPE["BFloat16Storage"] = _BF16
except Exception:  # pragma: no cover
    _BF16 = None


# ---------------------------------------------------------------------------
# Writer: a minimal pickler emitting protocol-2 opcodes directly. Writing raw
# opcodes sidesteps pickle's save_global identity checks, letting us emit
# references to torch classes (torch.FloatStorage, torch._utils.
# _rebuild_tensor_v2) without torch being importable.
# ---------------------------------------------------------------------------

_PROTO = b"\x80\x02"
_STOP = b"."
_MARK = b"("
_EMPTY_DICT = b"}"
_EMPTY_LIST = b"]"
_EMPTY_TUPLE = b")"
_SETITEMS = b"u"
_APPENDS = b"e"
_TUPLE = b"t"
_TUPLE1 = b"\x85"
_TUPLE2 = b"\x86"
_TUPLE3 = b"\x87"
_NONE = b"N"
_TRUE = b"\x88"
_FALSE = b"\x89"
_BININT = b"J"
_LONG1 = b"\x8a"
_BINFLOAT = b"G"
_BINUNICODE = b"X"
_REDUCE = b"R"
_BINPERSID = b"Q"
_BINPUT = b"q"
_LONG_BINPUT = b"r"


class _TensorRef:
    """Marks a numpy array for tensor encoding with its storage key."""

    __slots__ = ("arr", "key")

    def __init__(self, arr: np.ndarray, key: int):
        self.arr = arr
        self.key = key


class _MiniPickler:
    def __init__(self, out: io.BytesIO):
        self.out = out
        self._memo_n = 0

    def _put(self) -> None:
        # Memoize to keep the pickle VM's expectations simple (torch's
        # unpickler doesn't require it, but real picklers always PUT after
        # container construction; harmless and cheap).
        n = self._memo_n
        self._memo_n += 1
        if n < 256:
            self.out.write(_BINPUT + bytes([n]))
        else:
            self.out.write(_LONG_BINPUT + struct.pack("<I", n))

    def global_ref(self, module: str, name: str) -> None:
        self.out.write(b"c" + module.encode() + b"\n" + name.encode() + b"\n")
        self._put()

    def save(self, obj: Any) -> None:
        w = self.out.write
        if obj is None:
            w(_NONE)
        elif obj is True:
            w(_TRUE)
        elif obj is False:
            w(_FALSE)
        elif isinstance(obj, int):
            if -(2**31) <= obj < 2**31:
                w(_BININT + struct.pack("<i", obj))
            else:
                data = obj.to_bytes((obj.bit_length() // 8) + 1, "little", signed=True)
                w(_LONG1 + bytes([len(data)]) + data)
        elif isinstance(obj, float):
            w(_BINFLOAT + struct.pack(">d", obj))
        elif isinstance(obj, str):
            enc = obj.encode("utf-8")
            w(_BINUNICODE + struct.pack("<I", len(enc)) + enc)
            self._put()
        elif isinstance(obj, np.integer):
            self.save(int(obj))
        elif isinstance(obj, np.floating):
            self.save(float(obj))
        elif isinstance(obj, np.bool_):
            self.save(bool(obj))
        elif isinstance(obj, _TensorRef):
            self._save_tensor(obj)
        elif isinstance(obj, dict):
            w(_EMPTY_DICT)
            self._put()
            if obj:
                w(_MARK)
                for k, v in obj.items():
                    self.save(k)
                    self.save(v)
                w(_SETITEMS)
        elif isinstance(obj, (list,)):
            w(_EMPTY_LIST)
            self._put()
            if obj:
                w(_MARK)
                for v in obj:
                    self.save(v)
                w(_APPENDS)
        elif isinstance(obj, tuple):
            if len(obj) == 0:
                w(_EMPTY_TUPLE)
            elif len(obj) <= 3:
                for v in obj:
                    self.save(v)
                w([_TUPLE1, _TUPLE2, _TUPLE3][len(obj) - 1])
            else:
                w(_MARK)
                for v in obj:
                    self.save(v)
                w(_TUPLE)
            self._put()
        else:
            raise TypeError(f"pth writer: unsupported type {type(obj)}")

    def _save_tensor(self, ref: _TensorRef) -> None:
        arr = ref.arr
        storage_cls = _DTYPE_TO_STORAGE.get(arr.dtype)
        if storage_cls is None:
            raise TypeError(f"pth writer: unsupported tensor dtype {arr.dtype}")
        w = self.out.write
        # torch._utils._rebuild_tensor_v2(storage, offset, size, stride,
        #                                 requires_grad, backward_hooks)
        self.global_ref("torch._utils", "_rebuild_tensor_v2")
        w(_MARK)
        # persistent id: ('storage', <StorageClass>, key, 'cpu', numel)
        w(_MARK)
        self.save("storage")
        self.global_ref("torch", storage_cls)
        self.save(str(ref.key))
        self.save("cpu")
        self.save(int(arr.size))
        w(_TUPLE)
        self._put()
        w(_BINPERSID)
        self.save(0)  # storage offset
        self.save(tuple(int(s) for s in arr.shape))
        # contiguous row-major strides in elements
        strides = []
        acc = 1
        for s in reversed(arr.shape):
            strides.append(acc)
            acc *= int(s)
        self.save(tuple(reversed(strides)))
        self.save(False)  # requires_grad
        self.global_ref("collections", "OrderedDict")
        w(_EMPTY_TUPLE)
        w(_REDUCE)
        self._put()
        w(_TUPLE)
        self._put()
        w(_REDUCE)
        self._put()


def _collect_tensors(obj: Any, out: list[np.ndarray]) -> Any:
    """Replace numpy arrays with _TensorRef placeholders, collecting storages."""
    if isinstance(obj, np.ndarray):
        arr = np.ascontiguousarray(obj)
        out.append(arr)
        return _TensorRef(arr, len(out) - 1)
    if isinstance(obj, dict):
        return {k: _collect_tensors(v, out) for k, v in obj.items()}
    if isinstance(obj, list):
        return [_collect_tensors(v, out) for v in obj]
    if isinstance(obj, tuple):
        return tuple(_collect_tensors(v, out) for v in obj)
    return obj


def save(obj: Any, path: str | Path, extra_records: dict[str, bytes] | None = None) -> None:
    """Write ``obj`` as a torch-zip .pth file.

    numpy arrays become torch tensors on load; jax arrays should be converted
    to numpy by the caller (checkpoint.py does). ``extra_records`` lets
    callers stash side-band bytes (e.g. exact optax state) in the same zip —
    torch.load ignores unknown records.
    """
    storages: list[np.ndarray] = []
    graph = _collect_tensors(obj, storages)

    buf = io.BytesIO()
    buf.write(_PROTO)
    _MiniPickler(buf).save(graph)
    buf.write(_STOP)

    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    with zipfile.ZipFile(path, "w", compression=zipfile.ZIP_STORED) as z:
        z.writestr(f"{ARCHIVE_PREFIX}/data.pkl", buf.getvalue())
        z.writestr(f"{ARCHIVE_PREFIX}/byteorder", "little")
        for i, arr in enumerate(storages):
            z.writestr(f"{ARCHIVE_PREFIX}/data/{i}", arr.tobytes())
        z.writestr(f"{ARCHIVE_PREFIX}/version", "3\n")
        for name, blob in (extra_records or {}).items():
            z.writestr(f"{ARCHIVE_PREFIX}/extra/{name}", blob)


# ---------------------------------------------------------------------------
# Reader
# ---------------------------------------------------------------------------


class _StorageStub:
    def __init__(self, name: str):
        self.name = name


class _AttrDict(dict):
    """dict that additionally absorbs pickle BUILD state (e.g. the
    `_metadata` attribute torch sets on state_dict OrderedDicts); the
    attributes land in the instance __dict__ and are ignored downstream."""


class _Unpickler(pickle.Unpickler):
    def __init__(self, file, read_storage):
        super().__init__(file)
        self._read_storage = read_storage

    def find_class(self, module: str, name: str):
        if module == "torch._utils" and name in (
            "_rebuild_tensor_v2",
            "_rebuild_tensor",
        ):
            return _rebuild_tensor
        if module == "torch" and name.endswith("Storage"):
            return _StorageStub(name)
        if module == "torch" and name == "Size":
            return tuple
        if module == "collections" and name == "OrderedDict":
            # _AttrDict, not dict: torch state_dicts carry a `_metadata`
            # attribute that the pickle stream applies with a BUILD opcode,
            # and BUILD needs an instance __dict__ (plain dict has none).
            return _AttrDict
        if module in ("torch._utils",) and name == "_rebuild_parameter":
            return lambda data, requires_grad, hooks: data
        raise pickle.UnpicklingError(
            f"pth reader: refusing to load global {module}.{name}"
        )

    def persistent_load(self, pid):
        typename = pid[0]
        if typename != "storage":
            raise pickle.UnpicklingError(f"unknown persistent id {pid!r}")
        storage_type, key, _location, numel = pid[1], pid[2], pid[3], pid[4]
        name = storage_type.name if isinstance(storage_type, _StorageStub) else str(
            storage_type
        )
        dtype = _STORAGE_TO_DTYPE.get(name)
        if dtype is None:
            raise pickle.UnpicklingError(f"unsupported storage type {name}")
        return self._read_storage(str(key), dtype, int(numel))


def _rebuild_tensor(storage, offset, size, stride, *args):
    # size/stride/offset come straight from the (untrusted) pickle stream;
    # bound-check them before as_strided or a corrupt file could read
    # arbitrary process memory into the returned array.
    arr = storage
    lazy = isinstance(arr, np.memmap)  # mmap fast path: defer the read
    numel = arr.shape[0]
    offset = int(offset)
    size = tuple(int(s) for s in size)
    stride = tuple(int(s) for s in stride)
    if offset < 0:
        raise pickle.UnpicklingError(f"pth reader: negative storage offset {offset}")
    if len(size) == 0:
        if offset >= numel:
            raise pickle.UnpicklingError(
                f"pth reader: scalar offset {offset} >= storage numel {numel}"
            )
        return arr[offset].copy().reshape(())
    if len(stride) != len(size) or any(s < 0 for s in size) or any(
        st < 0 for st in stride
    ):
        raise pickle.UnpicklingError(
            f"pth reader: invalid tensor layout size={size} stride={stride}"
        )
    if 0 in size:
        return np.empty(size, dtype=arr.dtype)
    last = offset + sum((s - 1) * st for s, st in zip(size, stride))
    if last >= numel:
        raise pickle.UnpicklingError(
            f"pth reader: tensor extent {last + 1} exceeds storage numel {numel}"
        )
    itemsize = arr.dtype.itemsize
    view = np.lib.stride_tricks.as_strided(
        arr[offset:], shape=size, strides=tuple(s * itemsize for s in stride)
    )
    # Lazy storages stay views over the file mapping (read-only; pages are
    # faulted in on first touch). Eager storages are copied so the result
    # owns its memory.
    return view if lazy else view.copy()


_LOCAL_HDR = struct.Struct("<4sHHHHHIIIHH")  # ZIP local file header (30 bytes)


def _stored_member_offset(path: Path, info: zipfile.ZipInfo) -> int | None:
    """Absolute file offset of a ZIP_STORED member's raw bytes, or None.

    The member's data is a verbatim byte range of the archive, so a
    storage can be mapped in place instead of routed through zipfile's
    chunked read + CRC pass — that Python-level pass is what made a
    537 MB volume.pth take ~18 s to open (docs/PERF.md "viewer logic at
    extraction scale"). The local header is re-parsed because its
    name/extra lengths can differ from the central directory's.
    """
    if info.compress_type != zipfile.ZIP_STORED:
        return None
    with open(path, "rb") as f:
        f.seek(info.header_offset)
        hdr = f.read(_LOCAL_HDR.size)
    if len(hdr) != _LOCAL_HDR.size:
        return None
    fields = _LOCAL_HDR.unpack(hdr)
    if fields[0] != b"PK\x03\x04":
        return None
    name_len, extra_len = fields[9], fields[10]
    return info.header_offset + _LOCAL_HDR.size + name_len + extra_len


def load(path: str | Path, mmap: bool = False) -> Any:
    """Read a torch-zip .pth file into plain python + numpy objects.

    ``mmap=True`` maps uncompressed (ZIP_STORED — what both this writer
    and ``torch.save`` emit) storages directly from the file instead of
    copying them through zipfile: tensors come back as read-only views
    over an ``np.memmap`` whose pages load lazily on first access, and the
    per-member CRC check is skipped. Callers that mutate the returned
    arrays or need them to outlive filesystem changes must use the
    default eager path.
    """
    path = Path(path)
    with zipfile.ZipFile(path, "r") as z:
        names = z.namelist()
        pkl_name = next(n for n in names if n.endswith("/data.pkl"))
        prefix = pkl_name[: -len("/data.pkl")]
        file_size = path.stat().st_size

        def read_storage(key: str, dtype: np.dtype, numel: int) -> np.ndarray:
            member = f"{prefix}/data/{key}"
            if mmap:
                info = z.getinfo(member)
                off = _stored_member_offset(path, info)
                nbytes = numel * dtype.itemsize
                if off is not None and off + nbytes <= file_size:
                    return np.memmap(path, dtype=dtype, mode="r",
                                     offset=off, shape=(numel,))
                # compressed / truncated member: fall through to the copy path
            raw = z.read(member)
            return np.frombuffer(raw, dtype=dtype, count=numel).copy()

        with z.open(pkl_name) as f:
            data = f.read()
        return _Unpickler(io.BytesIO(data), read_storage).load()


def load_extra_record(path: str | Path, name: str) -> bytes | None:
    """Read a side-band record written by save(extra_records=...)."""
    with zipfile.ZipFile(path, "r") as z:
        names = z.namelist()
        pkl_name = next(n for n in names if n.endswith("/data.pkl"))
        prefix = pkl_name[: -len("/data.pkl")]
        rec = f"{prefix}/extra/{name}"
        if rec in names:
            return z.read(rec)
    return None
