"""ctypes binding for the native decode core (hvt/data/_native/decode.cc).

Compiled on first use with the system toolchain (g++ + libjpeg) into
``_native/libhvtdecode.so``; every call releases the GIL and fans out over a
C++ thread pool. Falls back cleanly when the toolchain or libjpeg is absent —
the loader then uses the PIL path (hvt/data/transforms.py).

Disable explicitly with HVT_NATIVE=0.
"""

from __future__ import annotations

import ctypes
import os
import pathlib
import subprocess
import threading
from typing import Optional, Sequence

import numpy as np

_NATIVE_DIR = pathlib.Path(__file__).parent / "_native"
_SO_PATH = _NATIVE_DIR / "libhvtdecode.so"
_SRC_PATH = _NATIVE_DIR / "decode.cc"

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_failed = False


def _build() -> bool:
    cmd = [
        "g++", "-O3", "-fPIC", "-shared", "-std=c++17", "-pthread",
        str(_SRC_PATH), "-o", str(_SO_PATH), "-ljpeg",
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=180)
        return True
    except (subprocess.CalledProcessError, FileNotFoundError, subprocess.TimeoutExpired) as e:
        msg = getattr(e, "stderr", b"")
        print(f"[hvt.native] build failed ({e}); falling back to PIL decode. {msg!r}")
        return False


def _bind(lib: ctypes.CDLL) -> bool:
    """Attach signatures; False when a symbol is missing (a stale .so built
    from an older decode.cc — the caller rebuilds)."""
    try:
        lib.hvt_load_batch.restype = ctypes.c_int
        lib.hvt_load_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),  # paths
            ctypes.POINTER(ctypes.c_uint64),  # seeds
            ctypes.c_int,  # n
            ctypes.c_int,  # is_train
            ctypes.c_int,  # resize_size
            ctypes.c_int,  # out_size
            ctypes.c_double, ctypes.c_double,  # scale
            ctypes.c_double, ctypes.c_double,  # ratio
            ctypes.c_int,  # n_threads
            ctypes.POINTER(ctypes.c_uint8),  # out
        ]
        lib.hvt_decode_eval_buffer.restype = ctypes.c_int
        lib.hvt_decode_eval_buffer.argtypes = [
            ctypes.c_char_p,  # data
            ctypes.c_size_t,  # len
            ctypes.c_int,  # resize_size
            ctypes.c_int,  # out_size
            ctypes.POINTER(ctypes.c_uint8),  # out
        ]
    except AttributeError as e:
        print(f"[hvt.native] stale library (missing symbol: {e}); rebuilding")
        return False
    return True


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _failed
    if _lib is not None or _failed:
        return _lib
    with _lock:
        if _lib is not None or _failed:
            return _lib
        if os.environ.get("HVT_NATIVE", "1") == "0":
            _failed = True
            return None
        if not _SO_PATH.exists() or _SO_PATH.stat().st_mtime < _SRC_PATH.stat().st_mtime:
            if not _build():
                _failed = True
                return None
        for attempt in range(2):
            try:
                lib = ctypes.CDLL(str(_SO_PATH))
            except OSError as e:
                print(f"[hvt.native] load failed: {e}")
                lib = None
            if lib is not None and _bind(lib):
                _lib = lib
                return _lib
            # Stale or unloadable artifact (e.g. from a checkout whose
            # mtimes defeat the staleness check): rebuild once, then give
            # up cleanly (PIL fallback) rather than crash the data path.
            if attempt == 0 and not _build():
                break
        _failed = True
        return None


def available() -> bool:
    return _load() is not None


def load_batch(
    paths: Sequence[str],
    seeds: Optional[Sequence[int]],
    *,
    is_train: bool,
    resize_size: int,
    out_size: int,
    scale: tuple[float, float] = (0.08, 1.0),
    ratio: tuple[float, float] = (0.75, 4.0 / 3.0),
    num_threads: int = 8,
) -> tuple[np.ndarray, int]:
    """Decode a batch → (uint8 (N, S, S, 3), num_failures). Failed slots are
    zero-filled (and counted) rather than raising — matching the loader's
    padded-batch masking philosophy."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native decoder unavailable")

    n = len(paths)
    out = np.empty((n, out_size, out_size, 3), dtype=np.uint8)
    c_paths = (ctypes.c_char_p * n)(*[os.fsencode(p) for p in paths])
    if seeds is None:
        seeds = [0] * n
    c_seeds = (ctypes.c_uint64 * n)(*[int(s) & (2**64 - 1) for s in seeds])

    failures = lib.hvt_load_batch(
        c_paths,
        c_seeds,
        n,
        int(is_train),
        int(resize_size),
        int(out_size),
        float(scale[0]), float(scale[1]),
        float(ratio[0]), float(ratio[1]),
        int(num_threads),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return out, int(failures)


def decode_eval(data: bytes, *, resize_size: int, out_size: int
                ) -> Optional[np.ndarray]:
    """In-memory eval decode for the serving path: request bytes → uint8
    (S, S, 3), same law as the loader's native eval route (virtual
    shorter-side resize → center crop → single bilinear resample). The
    ctypes call releases the GIL, so concurrent server threads decode in
    parallel on a multi-core host. Returns None on decode failure or when
    the native core is unavailable (callers fall back to PIL)."""
    lib = _load()
    if lib is None:
        return None
    out = np.empty((out_size, out_size, 3), dtype=np.uint8)
    rc = lib.hvt_decode_eval_buffer(
        data,
        len(data),
        int(resize_size),
        int(out_size),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return out if rc == 0 else None
