"""PyTorch checkpoint interop WITHOUT a torch runtime dependency.

The reference ships/loads three checkpoint flavours (SURVEY.md section 2.2):

* zip-format ``.pth`` files from ``torch.save`` (reference train.py:110,118,
  282-283,291; loaded at model_stages.py:253),
* the backbone ImageNet pretrain ``STDCNet813M_73.91.tar`` read via the
  ``"state_dict"`` key (reference stdcnet.py:146-153),
* all merged with *non-strict dict-update* semantics (stdcnet.py:149-153,
  model_stages.py:253-258) and possibly carrying ``module.`` DataParallel
  prefixes (train.py:282-283 saves the wrapped model).

This module implements, in pure Python (zipfile + pickle + numpy):

* ``read_torch_checkpoint(path)``  -> {key: np.ndarray} for both the zip and
  the legacy sequential-pickle formats,
* ``write_torch_checkpoint(path, state)`` -> a zip-format ``.pth`` readable
  by ``torch.load`` (incl. weights_only=True), via a hand-rolled pickle
  emitter (we cannot use pickle.Pickler to reference torch classes without
  importing torch),
* torch<->flax key/layout mapping (OIHW->HWIO transposes, BN weight->scale,
  running stats -> batch_stats collection, DataParallel prefix stripping),
* ``load_into_variables``: the reference's non-strict merge.
"""

from __future__ import annotations

import io
import pickle
import struct
import tarfile
import zipfile
from typing import Any, Dict, Optional, Tuple

import numpy as np

try:  # bundled with jax; provides the bfloat16 numpy dtype
    import ml_dtypes

    _BFLOAT16 = np.dtype(ml_dtypes.bfloat16)
except Exception:  # pragma: no cover
    _BFLOAT16 = None

_STORAGE_DTYPES = {
    "FloatStorage": np.dtype(np.float32),
    "DoubleStorage": np.dtype(np.float64),
    "HalfStorage": np.dtype(np.float16),
    "LongStorage": np.dtype(np.int64),
    "IntStorage": np.dtype(np.int32),
    "ShortStorage": np.dtype(np.int16),
    "CharStorage": np.dtype(np.int8),
    "ByteStorage": np.dtype(np.uint8),
    "BoolStorage": np.dtype(np.bool_),
}
if _BFLOAT16 is not None:
    _STORAGE_DTYPES["BFloat16Storage"] = _BFLOAT16

_NP_TO_STORAGE = {
    np.dtype(np.float32): ("FloatStorage", "torch.FloatStorage"),
    np.dtype(np.float64): ("DoubleStorage", "torch.DoubleStorage"),
    np.dtype(np.float16): ("HalfStorage", "torch.HalfStorage"),
    np.dtype(np.int64): ("LongStorage", "torch.LongStorage"),
    np.dtype(np.int32): ("IntStorage", "torch.IntStorage"),
    np.dtype(np.uint8): ("ByteStorage", "torch.ByteStorage"),
    np.dtype(np.bool_): ("BoolStorage", "torch.BoolStorage"),
}


class _StorageType:
    """Marker standing in for torch.XxxStorage classes during unpickling."""

    def __init__(self, name: str):
        self.name = name

    @property
    def dtype(self) -> np.dtype:
        if self.name not in _STORAGE_DTYPES:
            raise ValueError(f"unsupported torch storage type {self.name}")
        return _STORAGE_DTYPES[self.name]


class _LazyStorage:
    """A torch storage: dtype + a byte-reader closure."""

    def __init__(self, dtype: np.dtype, numel: Optional[int], read_bytes):
        self.dtype = dtype
        self.numel = numel
        self._read_bytes = read_bytes
        self._data: Optional[np.ndarray] = None

    def data(self) -> np.ndarray:
        if self._data is None:
            raw = self._read_bytes()
            itemsize = np.dtype(self.dtype).itemsize
            if self.numel is not None and len(raw) != self.numel * itemsize:
                # a short/overlong payload means the metadata and the
                # storage disagree — fail loudly instead of letting
                # as_strided read out of bounds into garbage weights
                raise ValueError(
                    f"torch storage payload is {len(raw)} bytes but the "
                    f"checkpoint metadata promises {self.numel} x "
                    f"{itemsize}-byte elements — corrupt checkpoint")
            self._data = np.frombuffer(raw, dtype=self.dtype)
        return self._data


class _PendingTensor:
    """Tensor rebuild deferred until storage bytes are available (the legacy
    format stores tensor metadata before storage payloads)."""

    def __init__(self, storage, storage_offset, size, stride):
        self.storage = storage
        self.storage_offset = storage_offset
        self.size = size
        self.stride = stride

    def materialize(self) -> np.ndarray:
        flat = self.storage.data()
        if not self.size:
            if not 0 <= self.storage_offset < len(flat):
                raise ValueError(
                    f"scalar tensor offset {self.storage_offset} outside "
                    f"its {len(flat)}-element storage — corrupt checkpoint")
            return flat[self.storage_offset].copy()
        if 0 in self.size:
            return np.empty(tuple(self.size), flat.dtype)
        # bounds-check the strided extent BEFORE as_strided: numpy does no
        # checking and would read adjacent memory into the weights
        lo = hi = self.storage_offset
        for n, s in zip(self.size, self.stride):
            if s >= 0:
                hi += (n - 1) * s
            else:
                lo += (n - 1) * s
        if lo < 0 or hi >= len(flat):
            raise ValueError(
                f"tensor size={self.size} stride={self.stride} offset="
                f"{self.storage_offset} spans [{lo}, {hi}] outside its "
                f"{len(flat)}-element storage — corrupt checkpoint")
        itemsize = flat.dtype.itemsize
        strides = tuple(s * itemsize for s in self.stride)
        base = flat[self.storage_offset:]
        arr = np.lib.stride_tricks.as_strided(base, shape=tuple(self.size),
                                              strides=strides)
        return np.ascontiguousarray(arr)


def _materialize_tree(obj):
    if isinstance(obj, _PendingTensor):
        return obj.materialize()
    if isinstance(obj, dict):
        return {k: _materialize_tree(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        t = [_materialize_tree(v) for v in obj]
        return type(obj)(t) if isinstance(obj, tuple) else t
    return obj


def _rebuild_tensor(storage: _LazyStorage, storage_offset, size, stride,
                    *unused) -> _PendingTensor:
    return _PendingTensor(storage, storage_offset, size, stride)


def _rebuild_tensor_v2(storage, storage_offset, size, stride,
                       requires_grad=False, backward_hooks=None,
                       metadata=None) -> _PendingTensor:
    return _PendingTensor(storage, storage_offset, size, stride)


def _rebuild_parameter(data, requires_grad=True, backward_hooks=None):
    return data


class _AttrDict(dict):
    """dict accepting attribute state (torch state_dicts carry _metadata)."""


class _Skipped:
    """Stand-in for unpicklable torch-internal objects we don't need."""

    def __init__(self, *a, **k):
        pass

    def __call__(self, *a, **k):
        return self

    def __setstate__(self, state):
        pass


class _TorchUnpickler(pickle.Unpickler):
    def __init__(self, file, storage_loader):
        super().__init__(file, encoding="latin1")
        self._storage_loader = storage_loader

    def find_class(self, module: str, name: str):
        if name.endswith("Storage"):
            return _StorageType(name)
        if module == "torch._utils":
            return {
                "_rebuild_tensor_v2": _rebuild_tensor_v2,
                "_rebuild_tensor": _rebuild_tensor,
                "_rebuild_parameter": _rebuild_parameter,
            }.get(name, _Skipped)
        if module == "collections" and name == "OrderedDict":
            return _AttrDict
        if module.startswith("torch"):
            return _Skipped
        if module == "numpy.core.multiarray" and name == "scalar":
            import numpy.core.multiarray as m

            return m.scalar
        if module == "numpy" and name == "dtype":
            return np.dtype
        return super().find_class(module, name)

    def persistent_load(self, pid):
        # zip format: ('storage', StorageType, key, location, numel)
        # legacy:     ('storage', StorageType, root_key, location, numel,
        #              view_metadata)
        if isinstance(pid, tuple) and pid and pid[0] == "storage":
            storage_type, key, _location, numel = pid[1:5]
            dtype = storage_type.dtype
            storage = self._storage_loader(str(key), dtype, numel)
            if len(pid) > 5 and pid[5]:
                view_key, offset, view_size = pid[5]
                parent = storage

                class _View:
                    dtype = parent.dtype

                    def data(self):
                        return parent.data()[offset:offset + view_size]

                return _View()
            return storage
        raise pickle.UnpicklingError(f"unsupported persistent id {pid!r}")


def _read_zip_checkpoint(path: str) -> Any:
    zf = zipfile.ZipFile(path)
    names = zf.namelist()
    # exact-basename match: endswith("data.pkl") would also select e.g.
    # "metadata.pkl" and derive a bogus storage prefix from it
    pkl_name = next(
        (n for n in names if n.split("/")[-1] == "data.pkl"), None)
    if pkl_name is None:
        raise ValueError(
            f"{path}: zip archive has no data.pkl member — not a torch "
            f"zip checkpoint (members: {names[:5]}...)")
    prefix = pkl_name[: -len("data.pkl")]

    def storage_loader(key, dtype, numel):
        member = f"{prefix}data/{key}"

        def read_bytes():
            with zf.open(member) as f:
                return f.read()

        return _LazyStorage(dtype, numel, read_bytes)

    with zf.open(pkl_name) as f:
        obj = _TorchUnpickler(io.BytesIO(f.read()), storage_loader).load()
    return _materialize_tree(obj)


_LEGACY_MAGIC = 0x1950A86A20F9469CFC6C


class _NotLegacyFormat(ValueError):
    """File is not the legacy sequential-pickle format (vs being a
    CORRUPT legacy file, which raises plain ValueError and propagates)."""


def _read_legacy_checkpoint(path: str) -> Any:
    """torch.save(..., _use_new_zipfile_serialization=False) format:
    4 sequential pickles (magic, protocol, sys_info, object) followed by the
    pickled list of storage keys and each storage's raw bytes prefixed with
    an int64 element count."""
    with open(path, "rb") as f:
        data = f.read()
    buf = io.BytesIO(data)

    # format GATE: failures up to the magic check mean "this file is not
    # the legacy format at all" (fall through to the other readers);
    # anything after is a REAL decode error and must propagate — the old
    # blanket `except Exception` reported genuine corruption (truncated
    # storages, unsupported dtypes) as "unrecognized format"
    try:
        magic = pickle.load(buf)
    except Exception as e:
        raise _NotLegacyFormat(f"no leading pickle: {e}") from e
    if magic != _LEGACY_MAGIC:
        raise _NotLegacyFormat("not a legacy torch checkpoint")
    _protocol = pickle.load(buf)
    _sys_info = pickle.load(buf)

    storages: Dict[str, _LazyStorage] = {}
    pending: Dict[str, Tuple[np.dtype, Optional[int]]] = {}

    def storage_loader(key, dtype, numel):
        if key not in storages:
            storages[key] = _LazyStorage(dtype, numel, lambda: b"")
            pending[key] = (dtype, numel)
        return storages[key]

    obj = _TorchUnpickler(buf, storage_loader).load()

    storage_keys = pickle.load(buf)
    for key in storage_keys:
        key = str(key)
        dtype = storages[key].dtype
        (numel,) = struct.unpack("<q", buf.read(8))
        raw = buf.read(numel * dtype.itemsize)
        if len(raw) != numel * dtype.itemsize:
            raise ValueError(
                f"legacy checkpoint truncated: storage {key} promises "
                f"{numel} elements but only {len(raw)} bytes remain")
        storages[key]._data = np.frombuffer(raw, dtype=dtype)
    return _materialize_tree(obj)


def read_torch_checkpoint(path: str) -> Any:
    """Read a ``torch.save`` artifact (.pth/.tar/.pt) into numpy arrays.

    Tries zip format, then legacy sequential-pickle, then (ancient) tarfile.
    """
    if zipfile.is_zipfile(path):
        return _read_zip_checkpoint(path)
    try:
        return _read_legacy_checkpoint(path)
    except _NotLegacyFormat:
        pass
    if tarfile.is_tarfile(path):  # pre-0.4 tar format: best-effort
        raise NotImplementedError(
            "pre-0.4 torch tar checkpoints are not supported; re-save with a "
            "newer torch")
    raise ValueError(f"unrecognized torch checkpoint format: {path}")


# --------------------------------------------------------------------------
# Writer: hand-rolled pickle emitter (protocol 2) so the output references
# torch classes by name without importing torch.
# --------------------------------------------------------------------------


class _PickleWriter:
    def __init__(self):
        self.out = bytearray()
        self.out += b"\x80\x02"  # PROTO 2
        self._memo_count = 0

    def _put_memo(self):
        # LONG_BINPUT
        self.out += b"r" + struct.pack("<I", self._memo_count)
        self._memo_count += 1

    def global_ref(self, module: str, name: str):
        self.out += b"c" + module.encode() + b"\n" + name.encode() + b"\n"
        self._put_memo()

    def string(self, s: str):
        b = s.encode("utf-8")
        self.out += b"X" + struct.pack("<I", len(b)) + b
        self._put_memo()

    def integer(self, v: int):
        if 0 <= v < 256:
            self.out += b"K" + struct.pack("<B", v)
        elif 0 <= v < 65536:
            self.out += b"M" + struct.pack("<H", v)
        else:
            self.out += b"J" + struct.pack("<i", v)

    def boolean(self, v: bool):
        self.out += b"\x88" if v else b"\x89"

    def none(self):
        self.out += b"N"

    def mark(self):
        self.out += b"("

    def tuple_from_mark(self):
        self.out += b"t"
        self._put_memo()

    def tuple2(self):
        self.out += b"\x86"
        self._put_memo()

    def empty_dict(self):
        self.out += b"}"
        self._put_memo()

    def setitems(self):
        self.out += b"u"

    def reduce(self):
        self.out += b"R"
        self._put_memo()

    def persid_tuple(self):
        # BINPERSID: pops the id object off the stack
        self.out += b"Q"

    def stop(self):
        self.out += b"."


def _emit_tensor(w: _PickleWriter, name_key: str, arr: np.ndarray,
                 storage_key: str):
    """Emit torch._utils._rebuild_tensor_v2(storage, 0, size, stride, False,
    OrderedDict())."""
    storage_name, _ = _NP_TO_STORAGE[arr.dtype]
    w.global_ref("torch._utils", "_rebuild_tensor_v2")
    w.mark()
    # persistent id tuple ('storage', torch.XStorage, key, 'cpu', numel)
    w.mark()
    w.string("storage")
    w.global_ref("torch", storage_name)
    w.string(storage_key)
    w.string("cpu")
    w.integer(int(arr.size))
    w.tuple_from_mark()
    w.persid_tuple()
    # storage_offset
    w.integer(0)
    # size
    w.mark()
    for s in arr.shape:
        w.integer(int(s))
    w.tuple_from_mark()
    # stride (contiguous)
    stride = []
    acc = 1
    for s in reversed(arr.shape):
        stride.append(acc)
        acc *= int(s)
    stride.reverse()
    w.mark()
    for s in stride:
        w.integer(s)
    w.tuple_from_mark()
    # requires_grad
    w.boolean(False)
    # backward_hooks: collections.OrderedDict()
    w.global_ref("collections", "OrderedDict")
    w.mark()
    w.tuple_from_mark()
    w.reduce()
    # close args tuple + REDUCE
    w.tuple_from_mark()
    w.reduce()


def write_torch_checkpoint(path: str, state: Dict[str, np.ndarray]) -> None:
    """Write {key: array} as a zip-format .pth loadable by torch.load
    (including weights_only=True)."""
    arrays = {}
    for k, v in state.items():
        arr = np.ascontiguousarray(np.asarray(v))
        if arr.dtype == np.dtype(np.float64):
            arr = arr.astype(np.float32)
        if arr.dtype not in _NP_TO_STORAGE:
            if _BFLOAT16 is not None and arr.dtype == _BFLOAT16:
                arr = arr.astype(np.float32)
            else:
                raise ValueError(f"cannot export dtype {arr.dtype} for {k}")
        arrays[k] = arr

    w = _PickleWriter()
    w.empty_dict()
    w.mark()
    for i, (k, arr) in enumerate(arrays.items()):
        w.string(k)
        _emit_tensor(w, k, arr, storage_key=str(i))
    w.setitems()
    w.stop()

    with zipfile.ZipFile(path, "w", zipfile.ZIP_STORED) as zf:
        zf.writestr("archive/data.pkl", bytes(w.out))
        zf.writestr("archive/byteorder", "little")
        zf.writestr("archive/version", "3\n")
        for i, arr in enumerate(arrays.values()):
            zf.writestr(f"archive/data/{i}", arr.tobytes())


# --------------------------------------------------------------------------
# torch <-> flax mapping
# --------------------------------------------------------------------------

#: torch stage-view duplicates of backbone features (reference
#: stdcnet.py:134-138 registers x2..x32 Sequential views of the same modules)
_DUPLICATE_VIEWS = ("x2", "x4", "x8", "x16", "x32")


def strip_module_prefix(key: str) -> str:
    while key.startswith("module."):
        key = key[len("module."):]
    return key


def torch_key_to_flax(key: str, ndim: int):
    """Map a torch state_dict key to (collection, path tuple) or None to skip.

    Returns a transpose spec as third element ('conv'|'linear'|None).
    """
    key = strip_module_prefix(key)
    parts = key.split(".")
    merged = []
    for p in parts:
        if p.isdigit() and merged:
            merged[-1] = f"{merged[-1]}_{p}"
        else:
            merged.append(p)
    # drop duplicate stage views anywhere in the path (backbone.x2.* or x2.*)
    for i, token in enumerate(merged[:-1]):
        base = token.split("_")[0]
        if base in _DUPLICATE_VIEWS:
            return None
    leaf = merged[-1]
    path = tuple(merged[:-1])
    if leaf == "num_batches_tracked":
        return None
    if leaf == "running_mean":
        return ("batch_stats", path + ("mean",), None)
    if leaf == "running_var":
        return ("batch_stats", path + ("var",), None)
    if leaf == "weight":
        if ndim == 4:
            return ("params", path + ("kernel",), "conv")
        if ndim == 2:
            return ("params", path + ("kernel",), "linear")
        return ("params", path + ("scale",), None)
    if leaf == "bias":
        return ("params", path + ("bias",), None)
    return ("params", path + (leaf,), None)


def _to_flax_array(arr: np.ndarray, transpose: Optional[str]) -> np.ndarray:
    if transpose == "conv":
        # OIHW -> HWIO (works for grouped/depthwise too: (O, I/g, kh, kw)
        # -> (kh, kw, I/g, O))
        return np.transpose(arr, (2, 3, 1, 0))
    if transpose == "linear":
        return np.transpose(arr, (1, 0))
    return arr


def _from_flax_array(arr: np.ndarray, transpose: Optional[str]) -> np.ndarray:
    if transpose == "conv":
        return np.transpose(arr, (3, 2, 0, 1))
    if transpose == "linear":
        return np.transpose(arr, (1, 0))
    return arr


def flax_path_to_torch(collection: str, path: Tuple[str, ...], ndim: int):
    """Inverse mapping for export; returns (torch_key, transpose)."""
    *mods, leaf = path
    toks = []
    for m in mods:
        segs = m.split("_")
        # re-split trailing integer suffixes back into torch list indices
        base = []
        idx = []
        for s in segs:
            if s.isdigit():
                idx.append(s)
            else:
                if idx:
                    base.append("_".join(idx))  # should not happen
                    idx = []
                base.append(s)
        name = "_".join(base) if base else ""
        toks.append(".".join([name] + idx) if idx else name)
    prefix = ".".join(t for t in toks if t)
    if collection == "batch_stats":
        leaf_t = {"mean": "running_mean", "var": "running_var"}[leaf]
        return (f"{prefix}.{leaf_t}" if prefix else leaf_t), None
    if leaf == "kernel":
        transpose = "conv" if ndim == 4 else "linear"
        return (f"{prefix}.weight" if prefix else "weight"), transpose
    if leaf == "scale":
        return (f"{prefix}.weight" if prefix else "weight"), None
    return (f"{prefix}.{leaf}" if prefix else leaf), None


def variables_to_torch_state(variables) -> Dict[str, np.ndarray]:
    """Flatten flax variables into a torch-style state dict (numpy)."""
    import flax

    out: Dict[str, np.ndarray] = {}
    for collection in ("params", "batch_stats"):
        if collection not in variables:
            continue
        flat = flax.traverse_util.flatten_dict(variables[collection])
        for path, value in flat.items():
            arr = np.asarray(value, dtype=np.float32)
            key, transpose = flax_path_to_torch(collection, path, arr.ndim)
            out[key] = _from_flax_array(arr, transpose)
    return out


def load_into_variables(variables, torch_state: Dict[str, Any],
                        strict: bool = False):
    """Non-strict dict-update merge of a torch state dict into flax variables
    (reference stdcnet.py:149-153 / model_stages.py:253-258 semantics: keys
    we don't have are ignored; keys the checkpoint doesn't have keep their
    init values).

    Returns (new_variables, report dict).
    """
    import flax
    import jax.numpy as jnp

    flat = {
        c: dict(flax.traverse_util.flatten_dict(variables[c]))
        for c in variables
    }
    loaded, skipped, missing_in_model, mismatched = [], [], [], []

    for key, value in torch_state.items():
        arr = np.asarray(value)
        spec = torch_key_to_flax(key, arr.ndim)
        if spec is None:
            skipped.append(key)
            continue
        collection, path, transpose = spec
        if collection not in flat or path not in flat[collection]:
            missing_in_model.append(key)
            continue
        mapped = _to_flax_array(arr, transpose)
        target = flat[collection][path]
        if tuple(mapped.shape) != tuple(target.shape):
            mismatched.append((key, mapped.shape, tuple(target.shape)))
            continue
        flat[collection][path] = jnp.asarray(
            np.ascontiguousarray(mapped), dtype=target.dtype)
        loaded.append(key)

    report = {
        "loaded": loaded,
        "skipped_duplicates": skipped,
        "not_in_model": missing_in_model,
        "shape_mismatch": mismatched,
    }
    if strict and (missing_in_model or mismatched):
        raise ValueError(f"strict load failed: {report}")

    new_vars = {
        c: flax.traverse_util.unflatten_dict(flat[c]) for c in flat
    }
    return new_vars, report


def load_pretrained(variables, path: str, strict: bool = False):
    """Load a reference checkpoint file into flax variables.

    Mirrors the reference's dispatch: ``.tar`` backbone checkpoints store the
    weights under a ``state_dict`` key (reference stdcnet.py:147); ``.pth``
    files are the state dict directly (model_stages.py:253).
    """
    obj = read_torch_checkpoint(path)
    if (isinstance(obj, dict) and "state_dict" in obj
            and isinstance(obj["state_dict"], dict)):
        obj = obj["state_dict"]
    if not isinstance(obj, dict):
        raise ValueError(f"checkpoint {path} did not contain a state dict")
    return load_into_variables(variables, obj, strict=strict)
