"""Torch-free reader for PyTorch checkpoint files.

The reference ships five ESPNet fold checkpoints saved by torch 1.1
(``models/espnet_fold1..5.pth`` in jinseikenai/glomeruli_segmentation) in the
*legacy* serialization format: a stream of pickles followed by raw storage
bytes.  This module parses both that legacy format and the zipfile format
used by torch >= 1.6, returning plain numpy arrays — no torch import, so the
TPU framework has zero torch dependency on its compute path.

Reference behaviour being replicated: ``torch.load`` at
``module/espnet/test/VisualizeResults_iou.py:272-279`` and
``module/espnet/train/main.py:360-370``.
"""
from __future__ import annotations

import io
import pickle
import struct
import zipfile
from collections import OrderedDict
from typing import Any, BinaryIO, Dict

import numpy as np

_LEGACY_MAGIC = 0x1950A86A20F9469CFC6C

# torch storage class name -> numpy dtype
_STORAGE_DTYPES = {
    "FloatStorage": np.dtype("<f4"),
    "DoubleStorage": np.dtype("<f8"),
    "HalfStorage": np.dtype("<f2"),
    "LongStorage": np.dtype("<i8"),
    "IntStorage": np.dtype("<i4"),
    "ShortStorage": np.dtype("<i2"),
    "CharStorage": np.dtype("<i1"),
    "ByteStorage": np.dtype("<u1"),
    "BoolStorage": np.dtype("?"),
    "BFloat16Storage": np.dtype("<u2"),  # raw bits; caller may view as ml_dtypes.bfloat16
}


# Non-torch globals legitimately found in checkpoint pickles (numpy
# scalars/arrays inside optimizer state or stats dicts).  Everything else
# is rejected — see _Unpickler.find_class.
_SAFE_GLOBALS = frozenset([
    ("collections", "OrderedDict"),
    ("numpy", "ndarray"),
    ("numpy", "dtype"),
    ("numpy.core.multiarray", "_reconstruct"),
    ("numpy.core.multiarray", "scalar"),
    ("numpy._core.multiarray", "_reconstruct"),
    ("numpy._core.multiarray", "scalar"),
    ("_codecs", "encode"),
])


class _StorageType:
    """Stand-in for ``torch.FloatStorage`` etc. encountered in the pickle."""

    def __init__(self, name: str):
        self.name = name
        self.dtype = _STORAGE_DTYPES.get(name)

    def __repr__(self):
        return f"_StorageType({self.name})"


class _Storage:
    """A typed, lazily-filled flat buffer."""

    def __init__(self, key: str, dtype: np.dtype, numel: int | None):
        self.key = key
        self.dtype = dtype
        self.numel = numel
        self.data: np.ndarray | None = None


def _rebuild_tensor(storage: _Storage, storage_offset, size, stride):
    return _LazyTensor(storage, storage_offset, tuple(size), tuple(stride))


def _rebuild_tensor_v2(storage: _Storage, storage_offset, size, stride,
                       requires_grad=False, backward_hooks=None, metadata=None):
    return _LazyTensor(storage, storage_offset, tuple(size), tuple(stride))


class _LazyTensor:
    def __init__(self, storage: _Storage, offset: int, size: tuple, stride: tuple):
        self.storage = storage
        self.offset = offset
        self.size = size
        self.stride = stride

    def materialize(self) -> np.ndarray:
        buf = self.storage.data
        if buf is None:
            raise ValueError(f"storage {self.storage.key} has no data")
        if not self.size:
            return buf[self.offset].copy()
        itemsize = buf.dtype.itemsize
        arr = np.lib.stride_tricks.as_strided(
            buf[self.offset:],
            shape=self.size,
            strides=tuple(s * itemsize for s in self.stride),
        )
        return np.ascontiguousarray(arr)


class _Unpickler(pickle.Unpickler):
    """Unpickler that understands torch persistent ids and rebuild helpers."""

    def __init__(self, file: BinaryIO, storages: Dict[str, _Storage]):
        super().__init__(file, encoding="latin1")
        self.storages = storages

    def find_class(self, module: str, name: str):
        if name in _STORAGE_DTYPES:
            return _StorageType(name)
        if module == "torch._utils":
            if name == "_rebuild_tensor_v2":
                return _rebuild_tensor_v2
            if name == "_rebuild_tensor":
                return _rebuild_tensor
            if name == "_rebuild_parameter":
                return lambda data, requires_grad=True, hooks=None: data
        if module == "collections" and name == "OrderedDict":
            return OrderedDict
        if module == "torch" and name == "Size":
            return tuple
        if module.startswith("torch"):
            # Any other torch object (device, dtype markers, ...) -> opaque stub.
            return _OpaqueStub(module, name)
        if (module, name) in _SAFE_GLOBALS:
            import importlib

            return getattr(importlib.import_module(module), name)
        # checkpoints are untrusted downloads: never fall through to the
        # default unpickler, which imports (and can execute) anything —
        # the torch `weights_only=True` stance
        raise pickle.UnpicklingError(
            f"refusing to unpickle {module}.{name}: only tensor/container "
            "types are allowed in checkpoint files")

    def persistent_load(self, saved_id):
        typename = saved_id[0]
        if isinstance(typename, bytes):
            typename = typename.decode("ascii")
        if typename != "storage":
            raise pickle.UnpicklingError(f"unknown persistent id type: {typename!r}")
        storage_type, key, _location, numel = saved_id[1:5]
        if isinstance(key, bytes):
            key = key.decode("ascii")
        key = str(key)
        if key not in self.storages:
            dtype = storage_type.dtype if isinstance(storage_type, _StorageType) else None
            if dtype is None:
                raise pickle.UnpicklingError(f"unsupported storage type {storage_type}")
            self.storages[key] = _Storage(key, dtype, numel)
        return self.storages[key]


class _OpaqueStub:
    def __init__(self, module, name):
        self.module, self.name = module, name

    def __call__(self, *args, **kwargs):
        return self

    def __repr__(self):
        return f"<stub {self.module}.{self.name}>"


def _materialize(obj: Any) -> Any:
    if isinstance(obj, _LazyTensor):
        return obj.materialize()
    if isinstance(obj, (dict, OrderedDict)):
        return type(obj)((k, _materialize(v)) for k, v in obj.items())
    if isinstance(obj, list):
        return [_materialize(v) for v in obj]
    if isinstance(obj, tuple):
        return tuple(_materialize(v) for v in obj)
    return obj


def _load_legacy(f: BinaryIO) -> Any:
    storages: Dict[str, _Storage] = {}
    # EVERY pickle section goes through the restricted unpickler — the
    # magic/protocol/sysinfo prelude is attacker-controlled bytes too
    load = lambda: _Unpickler(f, storages).load()  # noqa: E731
    magic = load()
    if magic != _LEGACY_MAGIC:
        raise ValueError("not a legacy torch checkpoint (bad magic)")
    _protocol_version = load()
    _sys_info = load()

    result = load()

    # Trailing section: the list of storage keys in write order, then for each
    # key an int64 element count followed by the raw little-endian data.
    key_order = load()
    for key in key_order:
        if isinstance(key, bytes):
            key = key.decode("ascii")
        key = str(key)
        storage = storages[key]
        (numel,) = struct.unpack("<q", f.read(8))
        if numel < 0 or numel > (1 << 31):
            raise ValueError(f"implausible storage element count {numel}")
        raw = f.read(numel * storage.dtype.itemsize)
        storage.data = np.frombuffer(raw, dtype=storage.dtype).copy()
    return _materialize(result)


def _load_zip(path_or_file) -> Any:
    with zipfile.ZipFile(path_or_file) as zf:
        names = zf.namelist()
        pkl_name = next(n for n in names if n.endswith("data.pkl"))
        prefix = pkl_name[: -len("data.pkl")]
        storages: Dict[str, _Storage] = {}
        unpickler = _Unpickler(io.BytesIO(zf.read(pkl_name)), storages)
        result = unpickler.load()
        for key, storage in storages.items():
            raw = zf.read(f"{prefix}data/{key}")
            storage.data = np.frombuffer(raw, dtype=storage.dtype).copy()
    return _materialize(result)


class _TensorPlaceholder:
    """Pickled as torch._utils._rebuild_tensor_v2(...) so torch.load works."""

    def __init__(self, key: str, shape, stride):
        self.key = key
        self.shape = tuple(shape)
        self.stride = tuple(stride)


_SAVE_DTYPES = {
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


class _StorageRefForSave:
    """Marker carrying the pickled persistent-id payload for one storage."""

    def __init__(self, storage_class, key: str, numel: int):
        self.storage_class = storage_class
        self.key = key
        self.numel = numel


class _RebuildProxy:
    """Pickles as ``torch._utils._rebuild_tensor_v2(storage, 0, size,
    stride, False, None)`` so stock ``torch.load`` reconstructs a tensor."""

    def __init__(self, rebuild_fn, storage_ref, size, stride):
        self.rebuild_fn = rebuild_fn
        self.storage_ref = storage_ref
        self.size = size
        self.stride = stride

    def __reduce__(self):
        return (self.rebuild_fn, (self.storage_ref, 0, self.size,
                                  self.stride, False, None))


class _SavePickler(pickle.Pickler):
    def persistent_id(self, obj):
        if isinstance(obj, _StorageRefForSave):
            return ("storage", obj.storage_class, obj.key, "cpu", obj.numel,
                    None)
        return None


def save_torch_legacy(obj: Any, path: str) -> None:
    """Write ``obj`` (dicts/lists of numpy arrays and scalars) as a legacy
    torch checkpoint loadable with stock ``torch.load`` — used to export
    trained models in the reference's ``model_{epoch}.pth`` format
    (``main.py:426-427``).  Requires torch importable at save time (for the
    global names embedded in the pickle); the baked-in CPU torch suffices.
    """
    import torch
    import torch._utils

    rebuild_fn = torch._utils._rebuild_tensor_v2
    storages: "OrderedDict[str, np.ndarray]" = OrderedDict()
    counter = [0]

    def convert(o):
        if isinstance(o, np.ndarray):
            key = str(counter[0])
            counter[0] += 1
            arr = np.ascontiguousarray(o)
            storages[key] = arr
            storage_name = _SAVE_DTYPES.get(arr.dtype)
            if storage_name is None:
                raise TypeError(f"unsupported dtype {arr.dtype}")
            ref = _StorageRefForSave(getattr(torch, storage_name), key,
                                     arr.size)
            if arr.ndim == 0:
                size, stride = (), ()
            else:
                size = arr.shape
                stride = tuple(s // arr.itemsize for s in arr.strides)
            return _RebuildProxy(rebuild_fn, ref, size, stride)
        if isinstance(o, (dict, OrderedDict)):
            return type(o)((k, convert(v)) for k, v in o.items())
        if isinstance(o, list):
            return [convert(v) for v in o]
        if isinstance(o, tuple):
            return tuple(convert(v) for v in o)
        if isinstance(o, (np.integer,)):
            return int(o)
        if isinstance(o, (np.floating,)):
            return float(o)
        return o

    converted = convert(obj)
    with open(path, "wb") as f:
        pickle.dump(_LEGACY_MAGIC, f, protocol=2)
        pickle.dump(1001, f, protocol=2)
        pickle.dump({"protocol_version": 1001, "little_endian": True,
                     "type_sizes": {"short": 2, "int": 4, "long": 4}}, f,
                    protocol=2)
        pickler = _SavePickler(f, protocol=2)
        pickler.dump(converted)
        pickle.dump(list(storages.keys()), f, protocol=2)
        for key, arr in storages.items():
            f.write(struct.pack("<q", arr.size))
            f.write(arr.tobytes())


def load_torch_pickle(path: str) -> Any:
    """Load a ``.pth``/``.pth.tar`` checkpoint as numpy arrays.

    Supports both the legacy (torch<=1.5) streaming format used by the
    shipped fold checkpoints and the zipfile format of torch>=1.6.
    """
    with open(path, "rb") as f:
        head = f.read(4)
    if head[:2] == b"PK":
        return _load_zip(path)
    with open(path, "rb") as f:
        return _load_legacy(f)
