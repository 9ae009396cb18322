"""Minimal pure-Python reader/writer for the torch.save zip format,
restricted to the dict-of-tensors subset.

The format is public and documented by the PyTorch serialization
source (torch/serialization.py, PyTorchStreamWriter): a STORED (not
compressed) zip holding ``<prefix>/data.pkl`` (a protocol-2 pickle
whose tensors are ``torch._utils._rebuild_tensor_v2`` calls over
persistent-id storage references), one ``<prefix>/data/<key>`` raw
little-endian buffer per storage, and ``<prefix>/version`` (``3``).
torch.load resolves records by suffix, so the prefix is free; zip
alignment padding is an mmap optimization, not a load requirement.

Why this exists (VERDICT r8 next #6): the ``.pt`` graph sink
(plans/features.save_graphs_pt) is import-guarded because torch is
not an engine dependency — in environments without torch the sink's
round-trip was asserted only where torch exists (a permanent suite
skip in this container).  This module makes the artifact testable —
and writable — without the dependency:

- ``write_pt_tensor_dict``: emit a dict of numpy arrays (+ string /
  int metadata) as a torch-loadable ``.pt``.  The pickle stream is
  emitted opcode-by-opcode (GLOBAL/BINPERSID/REDUCE...) because the
  stdlib pickler refuses to serialize globals it cannot import —
  the whole point is that torch is absent.
- ``read_pt_tensor_dict``: load such a file (ours or a real
  torch-saved dict-of-tensors) back into numpy via a restricted
  Unpickler — storage classes and ``_rebuild_tensor_v2`` are mapped
  to numpy-backed stubs, ``persistent_load`` reads the raw storage
  records.  No arbitrary-code unpickling: ``find_class`` whitelists
  exactly the globals the subset needs and refuses everything else.

Float tensors are float32 (torch.FloatStorage), integer tensors
int64 (torch.LongStorage) — the two dtypes the graph sink emits.
Only contiguous row-major tensors are written; the reader asserts
the stride it reads matches.
"""

from __future__ import annotations

import io
import pickle
import struct
import zipfile

import numpy as np

_MARK = b"("
_EMPTY_DICT = b"}"
_SETITEMS = b"u"
_TUPLE = b"t"
_EMPTY_TUPLE = b")"
_REDUCE = b"R"
_BINPERSID = b"Q"
_NEWFALSE = b"\x89"
_STOP = b"."
_PROTO2 = b"\x80\x02"

_DTYPES = {
    "FloatStorage": np.dtype("<f4"),
    "DoubleStorage": np.dtype("<f8"),
    "LongStorage": np.dtype("<i8"),
    "IntStorage": np.dtype("<i4"),
}
_STORAGE_FOR = {
    np.dtype("float32"): "FloatStorage",
    np.dtype("float64"): "DoubleStorage",
    np.dtype("int64"): "LongStorage",
    np.dtype("int32"): "IntStorage",
}


def _global(module: str, name: str) -> bytes:
    return b"c" + module.encode() + b"\n" + name.encode() + b"\n"


def _unicode(s: str) -> bytes:
    b = s.encode("utf-8")
    return b"X" + struct.pack("<I", len(b)) + b


def _int(n: int) -> bytes:
    if 0 <= n < 256:
        return b"K" + bytes([n])
    if -(2**31) <= n < 2**31:
        return b"J" + struct.pack("<i", n)
    # LONG1 (arbitrary precision) for 64-bit sizes
    data = n.to_bytes((n.bit_length() + 8) // 8, "little", signed=True)
    return b"\x8a" + bytes([len(data)]) + data


def _int_tuple(t: tuple[int, ...]) -> bytes:
    return _MARK + b"".join(_int(i) for i in t) + _TUPLE


def _tensor(key: int, arr: np.ndarray) -> bytes:
    """_rebuild_tensor_v2(storage_persid, 0, size, stride, False,
    OrderedDict()) — the exact reduce torch.save emits for a plain
    contiguous tensor."""
    storage = _STORAGE_FOR[arr.dtype.newbyteorder("=")]
    persid = (
        _MARK
        + _unicode("storage")
        + _global("torch", storage)
        + _unicode(str(key))
        + _unicode("cpu")
        + _int(arr.size)
        + _TUPLE
        + _BINPERSID
    )
    stride = tuple(
        int(np.prod(arr.shape[i + 1 :], dtype=np.int64))
        for i in range(arr.ndim)
    )
    return (
        _global("torch._utils", "_rebuild_tensor_v2")
        + _MARK
        + persid
        + _int(0)
        + _int_tuple(arr.shape)
        + _int_tuple(stride)
        + _NEWFALSE
        + _global("collections", "OrderedDict")
        + _EMPTY_TUPLE
        + _REDUCE
        + _TUPLE
        + _REDUCE
    )


def write_pt_tensor_dict(
    path: str, tensors: dict[str, np.ndarray], meta: dict | None = None
) -> None:
    """Write ``{name: array}`` (+ optional string/int ``meta``
    entries) as a torch-loadable ``.pt``.  Arrays must be contiguous
    and of a supported dtype; float64 inputs are the caller's choice
    to narrow first (the graph sink writes float32/int64, matching
    torch's defaults for ``torch.tensor(..., dtype=float/long)``)."""
    body = _PROTO2 + _EMPTY_DICT + _MARK
    storages: list[np.ndarray] = []
    for name, arr in tensors.items():
        arr = np.ascontiguousarray(arr)
        if arr.dtype.newbyteorder("=") not in _STORAGE_FOR:
            raise TypeError(f"unsupported dtype {arr.dtype} for {name!r}")
        body += _unicode(name) + _tensor(len(storages), arr)
        storages.append(arr)
    for name, val in (meta or {}).items():
        body += _unicode(name)
        if isinstance(val, str):
            body += _unicode(val)
        elif isinstance(val, (int, np.integer)):
            body += _int(int(val))
        else:
            raise TypeError(f"unsupported meta type {type(val)} for {name!r}")
    body += _SETITEMS + _STOP
    with zipfile.ZipFile(path, "w", zipfile.ZIP_STORED) as z:
        z.writestr("archive/data.pkl", body)
        for key, arr in enumerate(storages):
            z.writestr(
                f"archive/data/{key}",
                np.ascontiguousarray(arr).astype(
                    arr.dtype.newbyteorder("<"), copy=False
                ).tobytes(),
            )
        z.writestr("archive/version", b"3\n")


class _Storage:
    def __init__(self, data: bytes, dtype: np.dtype):
        self.data = data
        self.dtype = dtype


def _rebuild(storage, offset, size, stride, *_rest):
    want = tuple(
        int(np.prod(size[i + 1 :], dtype=np.int64)) for i in range(len(size))
    )
    if tuple(stride) != want:
        raise NotImplementedError(f"non-contiguous stride {stride}")
    flat = np.frombuffer(storage.data, dtype=storage.dtype)
    n = int(np.prod(size, dtype=np.int64))
    return flat[offset : offset + n].reshape(tuple(size)).copy()


def read_pt_tensor_dict(path: str) -> dict:
    """Load a dict-of-tensors ``.pt`` back into numpy — a RESTRICTED
    unpickler (whitelisted globals only), usable both on files this
    module wrote and on real ``torch.save({name: tensor})``
    artifacts."""
    with zipfile.ZipFile(path) as z:
        names = z.namelist()
        pkl = next(n for n in names if n.endswith("/data.pkl"))
        prefix = pkl[: -len("data.pkl")]
        records = {
            n[len(prefix) + len("data/") :]: z.read(n)
            for n in names
            if n.startswith(prefix + "data/")
        }
        payload = z.read(pkl)

    class _Unpickler(pickle.Unpickler):
        def find_class(self, module, name):
            if (module, name) == ("torch._utils", "_rebuild_tensor_v2"):
                return _rebuild
            if module == "torch" and name in _DTYPES:
                return _DTYPES[name]
            if (module, name) == ("collections", "OrderedDict"):
                from collections import OrderedDict

                return OrderedDict
            raise pickle.UnpicklingError(
                f"refusing non-whitelisted global {module}.{name}"
            )

        def persistent_load(self, pid):
            tag, dtype, key, _location, _numel = pid
            if tag != "storage":
                raise pickle.UnpicklingError(f"unknown persistent id {tag!r}")
            rec = records.get(str(key))
            if rec is None:
                # same loud, typed failure as a non-whitelisted
                # global — a bare KeyError here reads like a reader
                # bug, not the truncated/corrupt archive it is
                raise pickle.UnpicklingError(
                    f"missing storage record data/{key} "
                    "(truncated or corrupt archive)"
                )
            return _Storage(rec, dtype)

    return _Unpickler(io.BytesIO(payload)).load()
