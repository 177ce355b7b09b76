"""Optional C acceleration for the Smith-Waterman inner loop.

The reference pins a thin C alignment kernel (``sciencebeam-alignment``,
requirements.txt:7) under python orchestration; this module mirrors that
design: a ~30-line C function compiled once per machine with the system gcc
(cached as a shared object), loaded via ctypes, releasing the GIL during the
DP.  When no compiler is available (e.g. a locked-down executor image), the
vectorized numpy path in ``align.py`` is used — identical results, ~5x
slower on the DP.

The compile cache lives under the repo (``.native_cache/``, gitignored); at
cluster scale the .so would be baked into the executor image or shipped as an
archive alongside the --py-files zip.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile
from typing import Optional

import numpy as np

_C_SOURCE = r"""
#include <stddef.h>
#include <stdint.h>
#include <stdlib.h>
#include <emmintrin.h>

/* Smith-Waterman score matrix: h is (m+1) x (n+1) int32 row-major,
   row 0 / col 0 pre-zeroed.  Scoring: match +2, mismatch -1, gap -2. */
void sw_matrix(const uint32_t* a, int n, const uint32_t* b, int m, int32_t* h) {
    for (int j = 1; j <= m; j++) {
        const int32_t* prev = h + (size_t)(j - 1) * (n + 1);
        int32_t* cur = h + (size_t)j * (n + 1);
        uint32_t bj = b[j - 1];
        int32_t left = 0;
        cur[0] = 0;
        for (int i = 1; i <= n; i++) {
            int32_t best = prev[i - 1] + (a[i - 1] == bj ? 2 : -1);
            int32_t up = prev[i] - 2;
            if (up > best) best = up;
            int32_t lft = left - 2;
            if (lft > best) best = lft;
            if (best < 0) best = 0;
            cur[i] = best;
            left = best;
        }
    }
}

/* int16 variant with the best cell tracked during generation: halves the
   memory traffic and saves the full re-scan — valid while 2*min(n,m) stays
   below INT16_MAX (checked by the caller). */
void sw_matrix16(const uint32_t* a, int n, const uint32_t* b, int m,
                 int16_t* h, int32_t* out) {
    int16_t best = 0; int bi = 0; int bj = 0;
    for (int j = 1; j <= m; j++) {
        const int16_t* prev = h + (size_t)(j - 1) * (n + 1);
        int16_t* cur = h + (size_t)j * (n + 1);
        uint32_t bj_code = b[j - 1];
        int16_t left = 0;
        cur[0] = 0;
        for (int i = 1; i <= n; i++) {
            int16_t v = prev[i - 1] + (a[i - 1] == bj_code ? 2 : -1);
            int16_t up = prev[i] - 2;
            if (up > v) v = up;
            int16_t lft = left - 2;
            if (lft > v) v = lft;
            if (v < 0) v = 0;
            cur[i] = v;
            left = v;
            /* first max in a-major order: prefer larger v; on ties prefer
               smaller i, then smaller j */
            if (v > best || (v == best && v > 0 && i < bi)) {
                best = v; bi = i; bj = j;
            }
        }
    }
    out[0] = bi; out[1] = bj; out[2] = best;
}

/* Traceback from cell (a=i, b=j) while the score is positive, preferring
   diagonal, then up (a-gap), then left (b-gap); writes difflib-style blocks
   (ai, bi, size) ascending into `blocks` (capacity 3*(n+m) int32) and
   returns the block count. */
int sw_traceback16(const uint32_t* a, const uint32_t* b, const int16_t* h,
                   int n, int m, int i, int j, int32_t* blocks) {
    /* collect matched diagonal positions in reverse into the tail of the
       buffer, then merge into blocks from the front */
    int cap = n + m;
    int32_t* pairs = blocks + cap;  /* reuse: pairs area holds 2*count ints */
    int count = 0;
    while (i > 0 && j > 0) {
        int16_t score = h[(size_t)j * (n + 1) + i];
        if (score <= 0) break;
        int16_t sub = (a[i - 1] == b[j - 1]) ? 2 : -1;
        if (score == h[(size_t)(j - 1) * (n + 1) + (i - 1)] + sub) {
            if (sub == 2) {
                pairs[2 * count] = i - 1;
                pairs[2 * count + 1] = j - 1;
                count++;
            }
            i--; j--;
        } else if (score == h[(size_t)(j - 1) * (n + 1) + i] - 2) {
            j--;
        } else if (score == h[(size_t)j * (n + 1) + (i - 1)] - 2) {
            i--;
        } else {
            break;
        }
    }
    /* pairs are in reverse order; build ascending blocks */
    int n_blocks = 0;
    for (int k = count - 1; k >= 0; k--) {
        int ai = pairs[2 * k];
        int bi = pairs[2 * k + 1];
        if (n_blocks > 0
            && blocks[3 * (n_blocks - 1)] + blocks[3 * (n_blocks - 1) + 2] == ai
            && blocks[3 * (n_blocks - 1) + 1] + blocks[3 * (n_blocks - 1) + 2] == bi) {
            blocks[3 * (n_blocks - 1) + 2]++;
        } else {
            blocks[3 * n_blocks] = ai;
            blocks[3 * n_blocks + 1] = bi;
            blocks[3 * n_blocks + 2] = 1;
            n_blocks++;
        }
    }
    return n_blocks;
}

/* Copy one DP row to the stored matrix with non-temporal (streaming)
   stores: the bytes bypass the cache hierarchy entirely, so a large matrix
   neither evicts the hot row buffers nor occupies shared-LLC capacity that
   sibling cores need.  Head/tail handled scalar for alignment. */
static void nt_copy_row(int16_t* dst, const int16_t* src, int count) {
    int i = 0;
    while (i < count && (((uintptr_t)(dst + i)) & 15)) { dst[i] = src[i]; i++; }
    for (; i + 8 <= count; i += 8) {
        __m128i v = _mm_loadu_si128((const __m128i*)(src + i));
        _mm_stream_si128((__m128i*)(dst + i), v);
    }
    for (; i < count; i++) dst[i] = src[i];
}

/* Cache-invisible int16 DP: identical recurrence and best-cell tie-breaks
   to sw_matrix16, but the recurrence runs over two small ping-pong row
   buffers (rowbuf, capacity 2*(n+1), stays L1/L2-hot at any matrix size)
   and each finished row is streamed to `h` with non-temporal stores.  The
   stored matrix is byte-identical to sw_matrix16's; only the traffic
   pattern differs.  For matrices larger than the private L2 this removes
   the RFO read of every matrix line AND the LLC pollution that thrashes
   sibling cores at high core counts — the one genuinely scale-relevant
   footprint in the alignment path (see scripts/profile_dp_footprint.py). */
void sw_matrix16_nt(const uint32_t* a, int n, const uint32_t* b, int m,
                    int16_t* h, int16_t* rowbuf, int32_t* out) {
    int16_t best = 0; int bi = 0; int bj = 0;
    int16_t* prev = rowbuf;
    int16_t* cur = rowbuf + (n + 1);
    for (int i = 0; i <= n; i++) prev[i] = 0;
    nt_copy_row(h, prev, n + 1);
    for (int j = 1; j <= m; j++) {
        uint32_t bj_code = b[j - 1];
        int16_t left = 0;
        cur[0] = 0;
        for (int i = 1; i <= n; i++) {
            int16_t v = prev[i - 1] + (a[i - 1] == bj_code ? 2 : -1);
            int16_t up = prev[i] - 2;
            if (up > v) v = up;
            int16_t lft = left - 2;
            if (lft > v) v = lft;
            if (v < 0) v = 0;
            cur[i] = v;
            left = v;
            if (v > best || (v == best && v > 0 && i < bi)) {
                best = v; bi = i; bj = j;
            }
        }
        nt_copy_row(h + (size_t)j * (n + 1), cur, n + 1);
        int16_t* t = prev; prev = cur; cur = t;
    }
    _mm_sfence();
    out[0] = bi; out[1] = bj; out[2] = best;
}

/* Fused alignment over the streaming DP (large-matrix path): same contract
   as sw_align16; the traceback touches only the ~path cells of the stored
   matrix, so the DRAM reads it incurs are negligible next to the avoided
   RFO+LLC traffic of the generation. */
int sw_align16_nt(const uint32_t* a, int n, const uint32_t* b, int m,
                  int16_t* h, int16_t* rowbuf, int32_t* blocks) {
    int32_t out[3];
    sw_matrix16_nt(a, n, b, m, h, rowbuf, out);
    int n_blocks = 0;
    if (out[2] > 0) {
        n_blocks = sw_traceback16(a, b, h, n, m, out[0], out[1], blocks);
    }
    return n_blocks;
}

/* Fused alignment: matrix16 + best cell + traceback in ONE call.  The DP
   matrix lives in caller-provided scratch (a grow-only buffer reused across
   calls: per-call malloc of the larger matrices crosses the mmap threshold
   and the resulting page faults / TLB shootdowns serialize at high
   process counts).  Returns the block count written to `blocks`. */
int sw_align16(const uint32_t* a, int n, const uint32_t* b, int m,
               int16_t* h, int32_t* blocks) {
    for (int i = 0; i <= n; i++) h[i] = 0;
    for (int j = 1; j <= m; j++) h[(size_t)j * (n + 1)] = 0;
    int32_t out[3];
    sw_matrix16(a, n, b, m, h, out);
    int n_blocks = 0;
    if (out[2] > 0) {
        n_blocks = sw_traceback16(a, b, h, n, m, out[0], out[1], blocks);
    }
    return n_blocks;
}

/* First maximum cell in a-major order (smallest a, then smallest b). */
void sw_best(const int32_t* h, int n, int m, int32_t* out) {
    int32_t best = 0; int bi = 0; int bj = 0;
    for (int j = 0; j <= m; j++) {
        const int32_t* row = h + (size_t)j * (n + 1);
        for (int i = 0; i <= n; i++) {
            int32_t v = row[i];
            if (v > best || (v == best && v > 0 && (i < bi || (i == bi && j < bj)))) {
                best = v; bi = i; bj = j;
            }
        }
    }
    out[0] = bi; out[1] = bj; out[2] = best;
}
"""

_CACHE_DIR = os.environ.get(
    "SPARK_GRAFT_NATIVE_CACHE",
    os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), ".native_cache"),
)

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _cache_dir_candidates():
    yield _CACHE_DIR
    # When the package ships inside a --py-files zip, __file__-derived paths
    # point INSIDE the archive and makedirs fails; without this fallback the
    # C kernel would silently degrade to the ~5x slower numpy DP on every
    # executor.  A per-user tempdir cache keeps the compile one-time per node.
    yield os.path.join(
        tempfile.gettempdir(), "sciencebeam_spark_native_%d" % os.getuid()
    )


def _compile() -> Optional[str]:
    digest = hashlib.sha1(_C_SOURCE.encode()).hexdigest()[:16]
    for cache_dir in _cache_dir_candidates():
        so_path = os.path.join(cache_dir, "swkernel_%s.so" % digest)
        if os.path.exists(so_path):
            return so_path
        try:
            os.makedirs(cache_dir, exist_ok=True)
            with tempfile.NamedTemporaryFile(
                "w", suffix=".c", dir=cache_dir, delete=False
            ) as fh:
                fh.write(_C_SOURCE)
                c_path = fh.name
            tmp_so = so_path + ".tmp.%d" % os.getpid()
            subprocess.run(
                ["gcc", "-O3", "-shared", "-fPIC", "-o", tmp_so, c_path],
                check=True,
                capture_output=True,
                timeout=60,
            )
            os.replace(tmp_so, so_path)  # atomic vs concurrent workers
            os.unlink(c_path)
            return so_path
        except Exception:
            continue
    return None


def get_native_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    so_path = _compile()
    if not so_path:
        return None
    try:
        lib = ctypes.CDLL(so_path)
        lib.sw_matrix.argtypes = [
            ctypes.POINTER(ctypes.c_uint32),
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint32),
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.sw_matrix.restype = None
        lib.sw_best.argtypes = [
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.sw_best.restype = None
        lib.sw_matrix16.argtypes = [
            ctypes.POINTER(ctypes.c_uint32),
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint32),
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_int16),
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.sw_matrix16.restype = None
        lib.sw_traceback16.argtypes = [
            ctypes.POINTER(ctypes.c_uint32),
            ctypes.POINTER(ctypes.c_uint32),
            ctypes.POINTER(ctypes.c_int16),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.sw_traceback16.restype = ctypes.c_int
        lib.sw_align16.argtypes = [
            ctypes.POINTER(ctypes.c_uint32),
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint32),
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_int16),
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.sw_align16.restype = ctypes.c_int
        # hot-path handle with ndpointer argtypes: numpy arrays pass
        # directly (pointer extraction happens in C), skipping the four
        # per-call ctypes cast objects of the hand-rolled signature —
        # measurable at the flagship's ~40 short alignments per document.
        # CDLL.__getitem__ returns a fresh uncached function object, so the
        # same symbol carries both signatures.
        align16_np = lib["sw_align16"]
        align16_np.argtypes = [
            np.ctypeslib.ndpointer(dtype=np.uint32, flags="C_CONTIGUOUS"),
            ctypes.c_int,
            np.ctypeslib.ndpointer(dtype=np.uint32, flags="C_CONTIGUOUS"),
            ctypes.c_int,
            np.ctypeslib.ndpointer(dtype=np.int16, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(dtype=np.int32, flags="C_CONTIGUOUS"),
        ]
        align16_np.restype = ctypes.c_int
        lib.sw_align16_np = align16_np
        lib.sw_align16_nt.argtypes = [
            ctypes.POINTER(ctypes.c_uint32),
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint32),
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_int16),
            ctypes.POINTER(ctypes.c_int16),
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.sw_align16_nt.restype = ctypes.c_int
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def native_sw_matrix_and_best(
    a_codes: np.ndarray, b_codes: np.ndarray
) -> Optional[tuple]:
    """C path returning (h, (i, j, score)): int16 fused-best variant when the
    score range allows (halves memory traffic), int32 two-pass otherwise.
    None when the native lib is unavailable."""
    lib = get_native_lib()
    if lib is None:
        return None
    n = a_codes.shape[0]
    m = b_codes.shape[0]
    if n == 0 or m == 0:
        return np.zeros((m + 1, n + 1), dtype=np.int16), (0, 0, 0)
    if 2 * min(n, m) < 32000:
        # only row 0 / col 0 need zeroing; the C loop writes every other cell
        h16 = np.empty((m + 1, n + 1), dtype=np.int16)
        h16[0, :] = 0
        h16[:, 0] = 0
        out = np.zeros(3, dtype=np.int32)
        a_contig = np.ascontiguousarray(a_codes, dtype=np.uint32)
        b_contig = np.ascontiguousarray(b_codes, dtype=np.uint32)
        lib.sw_matrix16(
            a_contig.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
            n,
            b_contig.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
            m,
            h16.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        )
        return h16, (int(out[0]), int(out[1]), int(out[2]))
    h = native_sw_matrix(a_codes, b_codes)
    assert h is not None
    best = native_pick_max(h)
    return h, best


def native_sw_matrix(a_codes: np.ndarray, b_codes: np.ndarray) -> Optional[np.ndarray]:
    """C-path score matrix; None when the native lib is unavailable."""
    lib = get_native_lib()
    if lib is None:
        return None
    n = a_codes.shape[0]
    m = b_codes.shape[0]
    h = np.zeros((m + 1, n + 1), dtype=np.int32)
    if n and m:
        a_contig = np.ascontiguousarray(a_codes, dtype=np.uint32)
        b_contig = np.ascontiguousarray(b_codes, dtype=np.uint32)
        lib.sw_matrix(
            a_contig.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
            n,
            b_contig.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
            m,
            h.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        )
    return h


def native_traceback16(
    a_codes: np.ndarray, b_codes: np.ndarray, h16: np.ndarray, i: int, j: int
):
    """C traceback over an int16 matrix; None when unavailable or when the
    matrix is not int16 (the int32 fallback paths keep the python walk)."""
    lib = get_native_lib()
    if lib is None or h16.dtype != np.int16:
        return None
    n = a_codes.shape[0]
    m = b_codes.shape[0]
    # blocks area (3 per block, <= n+m blocks) + pairs scratch (2 per match)
    buffer = np.empty(3 * (n + m) + 2 * (n + m) + 8, dtype=np.int32)
    a_contig = np.ascontiguousarray(a_codes, dtype=np.uint32)
    b_contig = np.ascontiguousarray(b_codes, dtype=np.uint32)
    n_blocks = lib.sw_traceback16(
        a_contig.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        b_contig.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        np.ascontiguousarray(h16).ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
        n,
        m,
        i,
        j,
        buffer.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return [
        (int(buffer[3 * k]), int(buffer[3 * k + 1]), int(buffer[3 * k + 2]))
        for k in range(n_blocks)
    ]


def native_pick_max(h: np.ndarray) -> Optional[tuple]:
    lib = get_native_lib()
    if lib is None:
        return None
    m_plus, n_plus = h.shape
    out = np.zeros(3, dtype=np.int32)
    lib.sw_best(
        np.ascontiguousarray(h).ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        n_plus - 1,
        m_plus - 1,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return int(out[0]), int(out[1]), int(out[2])


_blocks_scratch: Optional[np.ndarray] = None
_matrix_scratch: Optional[np.ndarray] = None
_rowbuf_scratch: Optional[np.ndarray] = None

# Above this matrix size the cache-invisible streaming DP takes over.
# Measured on this box (scripts/profile_dp_footprint.py + bench_dp_nt.py,
# quiet window): flagship matrices are <=45 KB (L1-resident — the cached
# path is optimal and r2's L3-thrash theory does NOT apply to the bench
# workload); production-length needles cross L2 at ~500 chars and a
# 16-core LLC share at ~1000 chars, yet the cached path still scales
# 0.87-0.91 at 4->32 workers here (260 MB L3, ample DRAM bandwidth) while
# NT costs 1-10% single-core and wins ~5% aggregate only at the largest
# sizes.  Default 16 MB: NT engages only where the matrix exceeds any
# plausible per-core LLC share — on bandwidth/LLC-constrained production
# executors (1-3 MB LLC/core is typical) the no-RFO, zero-LLC-occupancy
# behavior is the right one; tune with SPARK_GRAFT_SW_NT_THRESHOLD.
_NT_THRESHOLD_BYTES = int(
    os.environ.get("SPARK_GRAFT_SW_NT_THRESHOLD", str(1 << 24))
)


def native_match_blocks(a_codes: np.ndarray, b_codes: np.ndarray):
    """Fused C path: matrix + best cell + traceback in ONE FFI call; the DP
    matrix is C-internal scratch and never crosses into Python.  Returns the
    difflib-style blocks (without terminator), or None when the native lib
    is unavailable / the int16 score range would overflow (caller falls back
    to the two-call or numpy paths).

    The blocks buffer is reused across calls (python workers are
    single-threaded; the buffer only grows)."""
    global _blocks_scratch
    lib = get_native_lib()
    if lib is None:
        return None
    n = a_codes.shape[0]
    m = b_codes.shape[0]
    if n == 0 or m == 0:
        return []
    if 2 * min(n, m) >= 32000:
        return None
    global _matrix_scratch
    need = 5 * (n + m) + 8
    if _blocks_scratch is None or _blocks_scratch.shape[0] < need:
        _blocks_scratch = np.empty(max(need, 4096), dtype=np.int32)
    buffer = _blocks_scratch
    cells = (n + 1) * (m + 1)
    if _matrix_scratch is None or _matrix_scratch.shape[0] < cells:
        _matrix_scratch = np.empty(max(cells, 1 << 16), dtype=np.int16)
    matrix = _matrix_scratch
    a_contig = (
        a_codes
        if a_codes.flags.c_contiguous and a_codes.dtype == np.uint32
        else np.ascontiguousarray(a_codes, dtype=np.uint32)
    )
    b_contig = (
        b_codes
        if b_codes.flags.c_contiguous and b_codes.dtype == np.uint32
        else np.ascontiguousarray(b_codes, dtype=np.uint32)
    )
    if cells * 2 <= _NT_THRESHOLD_BYTES:
        # common case first: ndpointer signature, no per-call casts
        n_blocks = lib.sw_align16_np(a_contig, n, b_contig, m, matrix, buffer)
        return [
            (int(buffer[3 * k]), int(buffer[3 * k + 1]), int(buffer[3 * k + 2]))
            for k in range(n_blocks)
        ]
    # large matrix: cache-invisible streaming DP (byte-identical values)
    global _rowbuf_scratch
    row_need = 2 * (n + 1)
    if _rowbuf_scratch is None or _rowbuf_scratch.shape[0] < row_need:
        _rowbuf_scratch = np.empty(max(row_need, 4096), dtype=np.int16)
    n_blocks = lib.sw_align16_nt(
        a_contig.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        n,
        b_contig.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        m,
        matrix.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
        _rowbuf_scratch.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
        buffer.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return [
        (int(buffer[3 * k]), int(buffer[3 * k + 1]), int(buffer[3 * k + 2]))
        for k in range(n_blocks)
    ]
