"""ctypes bindings for the native host-runtime library.

The compute path is JAX/XLA on device; the host-side integer-heavy
runtime (slot allocation, free-row scans, observation partitioning,
redundancy scoring) is C++ in native/map_store.cpp — the counterpart
of the reference's C++ Memory/runtime layer.  The library is built on
first use via the Makefile (g++ is baked into the image); every entry
point has a NumPy fallback so the framework still works where no
compiler exists.
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_LIB = None
_TRIED = False
_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), "native")


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    so = os.path.join(_NATIVE_DIR, "libygz_native.so")
    try:
        if not os.path.exists(so) or (
            os.path.getmtime(so)
            < os.path.getmtime(os.path.join(_NATIVE_DIR, "map_store.cpp"))
        ):
            subprocess.run(
                ["make", "-s", "-C", _NATIVE_DIR], check=True,
                capture_output=True,
            )
        lib = ctypes.CDLL(so)
        i32p = ctypes.POINTER(ctypes.c_int32)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        f32p = ctypes.POINTER(ctypes.c_float)
        lib.ms_alloc_kf_slot.restype = ctypes.c_int32
        lib.ms_alloc_kf_slot.argtypes = [
            u8p, i32p, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, i32p
        ]
        lib.ms_free_rows.restype = ctypes.c_int32
        lib.ms_free_rows.argtypes = [u8p, ctypes.c_int32, ctypes.c_int32, i32p]
        lib.ms_partition_obs.restype = ctypes.c_int32
        lib.ms_partition_obs.argtypes = [
            i32p, i32p, f32p, u8p, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int32, i32p, i32p, f32p, u8p,
        ]
        lib.ms_kf_redundancy.restype = None
        lib.ms_kf_redundancy.argtypes = [
            i32p, u8p, i32p, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int32, f32p,
        ]
        lib.ms_kf_redundancy_scale.restype = None
        lib.ms_kf_redundancy_scale.argtypes = [
            i32p, u8p, i32p, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int32, f32p,
        ]
        _LIB = lib
    except Exception:
        _LIB = None
    return _LIB


def _p(a, t):
    return a.ctypes.data_as(t)


def available() -> bool:
    return _load() is not None


def alloc_kf_slot(used: np.ndarray, cov: np.ndarray, ref_slot: int,
                  newest_slot: int) -> tuple[int, bool]:
    """(slot, evicted) — native or NumPy fallback."""
    lib = _load()
    used = np.ascontiguousarray(used, np.uint8)
    K = used.shape[0]
    if lib is not None:
        cov = np.ascontiguousarray(cov, np.int32)
        ev = np.zeros(1, np.int32)
        s = lib.ms_alloc_kf_slot(
            _p(used, ctypes.POINTER(ctypes.c_uint8)),
            _p(cov, ctypes.POINTER(ctypes.c_int32)),
            K, ref_slot, newest_slot,
            _p(ev, ctypes.POINTER(ctypes.c_int32)),
        )
        return int(s), bool(ev[0])
    free = np.where(used == 0)[0]
    if len(free):
        return int(free[0]), False
    cands = [
        s for s in range(K)
        if used[s] and s != ref_slot and s != newest_slot
    ]
    w = [cov[ref_slot, s] for s in cands]
    return int(cands[int(np.argmin(w))]), True


def free_rows(valid: np.ndarray, want: int) -> np.ndarray:
    lib = _load()
    valid = np.ascontiguousarray(valid, np.uint8)
    if lib is not None:
        out = np.zeros(want, np.int32)
        n = lib.ms_free_rows(
            _p(valid, ctypes.POINTER(ctypes.c_uint8)),
            valid.shape[0], want,
            _p(out, ctypes.POINTER(ctypes.c_int32)),
        )
        return out[:n]
    return np.where(valid == 0)[0][:want].astype(np.int32)


def partition_obs(kf_idx, pt_idx, px, mask, L: int, n_shards: int):
    """Native observation partitioner; returns (out_kf, out_pt, out_px,
    out_mask, o_shard) with shapes [n_shards * o_shard, ...]."""
    lib = _load()
    kf_idx = np.ascontiguousarray(kf_idx, np.int32)
    pt_idx = np.ascontiguousarray(pt_idx, np.int32)
    px = np.ascontiguousarray(px, np.float32)
    mask = np.ascontiguousarray(mask, np.uint8)
    O = kf_idx.shape[0]
    if lib is None:
        return None
    i32p = ctypes.POINTER(ctypes.c_int32)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    f32p = ctypes.POINTER(ctypes.c_float)
    o_shard = int(lib.ms_partition_obs(
        _p(kf_idx, i32p), _p(pt_idx, i32p), _p(px, f32p), _p(mask, u8p),
        O, L, n_shards, 0, None, None, None, None,
    ))
    n = n_shards * o_shard
    out_kf = np.zeros(n, np.int32)
    out_pt = np.zeros(n, np.int32)
    out_px = np.zeros((n, 2), np.float32)
    out_mask = np.zeros(n, np.uint8)
    lib.ms_partition_obs(
        _p(kf_idx, i32p), _p(pt_idx, i32p), _p(px, f32p), _p(mask, u8p),
        O, L, n_shards, o_shard,
        _p(out_kf, i32p), _p(out_pt, i32p), _p(out_px, f32p),
        _p(out_mask, u8p),
    )
    return out_kf, out_pt, out_px, out_mask.astype(bool), o_shard


def kf_redundancy(feat_point, feat_valid, pt_obs, min_obs: int = 4):
    lib = _load()
    feat_point = np.ascontiguousarray(feat_point, np.int32)
    feat_valid = np.ascontiguousarray(feat_valid, np.uint8)
    pt_obs = np.ascontiguousarray(pt_obs, np.int32)
    K, F = feat_point.shape
    L = pt_obs.shape[0]
    if lib is not None:
        out = np.zeros(K, np.float32)
        lib.ms_kf_redundancy(
            _p(feat_point.reshape(-1), ctypes.POINTER(ctypes.c_int32)),
            _p(feat_valid.reshape(-1), ctypes.POINTER(ctypes.c_uint8)),
            _p(pt_obs, ctypes.POINTER(ctypes.c_int32)),
            K, F, L, min_obs,
            _p(out, ctypes.POINTER(ctypes.c_float)),
        )
        return out
    linked = (feat_valid > 0) & (feat_point >= 0) & (feat_point < L)
    p = np.clip(feat_point, 0, L - 1)
    red = linked & (pt_obs[p] >= min_obs)
    n = np.maximum(linked.sum(1), 1)
    return (red.sum(1) / n).astype(np.float32)


def kf_redundancy_scale(feat_point, feat_valid, feat_level,
                        L: int, min_obs: int = 4):
    """Scale-aware redundancy scores: an observation only counts as
    redundant when >= min_obs keyframes see the landmark at pyramid
    level <= its own level + 1.  This is an ORB-SLAM2-style
    refinement beyond the reference's KeyFrameCulling, which uses a
    flat th_obs=3 observation count with no level check
    (LocalMapping.cpp:592-607)."""
    lib = _load()
    feat_point = np.ascontiguousarray(feat_point, np.int32)
    feat_valid = np.ascontiguousarray(feat_valid, np.uint8)
    feat_level = np.ascontiguousarray(feat_level, np.int32)
    K, F = feat_point.shape
    if lib is not None:
        out = np.zeros(K, np.float32)
        i32p = ctypes.POINTER(ctypes.c_int32)
        lib.ms_kf_redundancy_scale(
            _p(feat_point.reshape(-1), i32p),
            _p(feat_valid.reshape(-1), ctypes.POINTER(ctypes.c_uint8)),
            _p(feat_level.reshape(-1), i32p),
            K, F, L, min_obs,
            _p(out, ctypes.POINTER(ctypes.c_float)),
        )
        return out
    # NumPy fallback: per-(landmark, level) histogram + prefix.
    MAXLVL = 8
    linked = (feat_valid > 0) & (feat_point >= 0) & (feat_point < L)
    p = np.clip(feat_point, 0, L - 1)
    lvl = np.clip(feat_level, 0, MAXLVL - 1)
    counts = np.zeros((L, MAXLVL), np.int32)
    np.add.at(counts, (p[linked], lvl[linked]), 1)
    cum = np.cumsum(counts, axis=1)
    l_slack = np.clip(lvl + 1, 0, MAXLVL - 1)
    red = linked & (cum[p, l_slack] >= min_obs)
    n = np.maximum(linked.sum(1), 1)
    return (red.sum(1) / n).astype(np.float32)
