"""Native runtime components (C++ via ctypes).

Compiled on first import with g++ -O3 and cached next to the sources; any
failure (no compiler, read-only FS) falls back silently to the NumPy
implementations so the framework never hard-depends on the toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile

import numpy as np

__all__ = ["fast_collate", "NATIVE_AVAILABLE"]

_SRC_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB = None


def _build_library():
    src = os.path.join(_SRC_DIR, "collate.cpp")
    lib_path = os.path.join(_SRC_DIR, "_jodo_native.so")
    if os.path.exists(lib_path) and os.path.getmtime(lib_path) >= os.path.getmtime(src):
        return lib_path
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-o", lib_path, src]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
    except Exception:
        # retry without -march=native, then into tmp if the tree is read-only
        try:
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-o", lib_path, src],
                check=True, capture_output=True, timeout=120,
            )
        except Exception:
            tmp = os.path.join(tempfile.gettempdir(), "_jodo_native.so")
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-o", tmp, src],
                check=True, capture_output=True, timeout=120,
            )
            return tmp
    return lib_path


def _load():
    global _LIB
    if _LIB is not None:
        return _LIB
    lib = ctypes.CDLL(_build_library())
    p = ctypes.POINTER
    lib.collate_graphs.argtypes = [
        p(ctypes.c_int64), ctypes.c_int64,
        p(ctypes.c_int64), p(ctypes.c_int16), p(ctypes.c_int16),
        p(ctypes.c_float),
        p(ctypes.c_int64), p(ctypes.c_int32), p(ctypes.c_int32), p(ctypes.c_int16),
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int64,
        p(ctypes.c_float), p(ctypes.c_float), p(ctypes.c_float),
        p(ctypes.c_float), p(ctypes.c_float), p(ctypes.c_float),
    ]
    lib.collate_graphs.restype = None
    _LIB = lib
    return lib


try:
    _load()
    NATIVE_AVAILABLE = True
except Exception:
    NATIVE_AVAILABLE = False


def _ptr(arr, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def fast_collate(
    data,
    indices,
    pad_n: int,
    num_atom_types: int,
    compress_edge: bool = True,
    include_aromatic: bool = False,
    bond_types: int = 4,
    property_values=None,
):
    """Drop-in replacement for jodo_tpu.data.core.collate_batch."""
    if not NATIVE_AVAILABLE:
        from ..data.core import collate_batch

        return collate_batch(data, indices, pad_n, num_atom_types,
                             compress_edge, include_aromatic, bond_types,
                             property_values)

    lib = _load()
    indices = np.ascontiguousarray(np.asarray(indices, np.int64))
    b = len(indices)
    sizes = data.n_nodes[indices]
    if sizes.max(initial=0) > pad_n:
        raise ValueError(
            f"molecule with {int(sizes.max())} atoms exceeds pad_n={pad_n}"
        )
    edge_ch = (2 + int(include_aromatic)) if compress_edge else (bond_types - 1)

    one_hot = np.zeros((b, pad_n, num_atom_types), np.float32)
    positions = np.zeros((b, pad_n, 3), np.float32)
    fc = np.zeros((b, pad_n, 1), np.float32)
    edge_feat = np.zeros((b, pad_n, pad_n, edge_ch), np.float32)
    node_mask = np.zeros((b, pad_n), np.float32)
    edge_mask = np.zeros((b, pad_n, pad_n), np.float32)

    atom_offsets = np.ascontiguousarray(data.atom_offsets, np.int64)
    atom_type = np.ascontiguousarray(data.atom_type, np.int16)
    formal_charge = np.ascontiguousarray(data.formal_charge, np.int16)
    bond_offsets = np.ascontiguousarray(data.bond_offsets, np.int64)
    bond_src = np.ascontiguousarray(data.bond_src, np.int32)
    bond_dst = np.ascontiguousarray(data.bond_dst, np.int32)
    bond_type = np.ascontiguousarray(data.bond_type, np.int16)
    pos = (
        np.ascontiguousarray(data.pos, np.float32)
        if data.pos is not None
        else None
    )

    lib.collate_graphs(
        _ptr(indices, ctypes.c_int64), b,
        _ptr(atom_offsets, ctypes.c_int64),
        _ptr(atom_type, ctypes.c_int16),
        _ptr(formal_charge, ctypes.c_int16),
        _ptr(pos, ctypes.c_float) if pos is not None else None,
        _ptr(bond_offsets, ctypes.c_int64),
        _ptr(bond_src, ctypes.c_int32),
        _ptr(bond_dst, ctypes.c_int32),
        _ptr(bond_type, ctypes.c_int16),
        pad_n, num_atom_types, edge_ch,
        int(compress_edge), int(include_aromatic), bond_types,
        _ptr(one_hot, ctypes.c_float), _ptr(positions, ctypes.c_float),
        _ptr(fc, ctypes.c_float), _ptr(edge_feat, ctypes.c_float),
        _ptr(node_mask, ctypes.c_float), _ptr(edge_mask, ctypes.c_float),
    )

    batch = dict(
        positions=positions,
        atom_one_hot=one_hot,
        formal_charges=fc,
        edge_one_hot=edge_feat,
        node_mask=node_mask,
        edge_mask=edge_mask,
    )
    if property_values is not None:
        batch["context"] = np.asarray(
            property_values[indices], np.float32
        ).reshape(b, -1)
    return batch
