#!/bin/bash
# ASAN/UBSAN check of the native graph builder (SURVEY §5: sanitizer jobs
# for C++ host components).  Builds an instrumented .so and runs the
# exerciser under both sanitizers.
set -e
cd "$(dirname "$0")"
g++ -O1 -g -fsanitize=address,undefined -fno-omit-frame-pointer \
    -shared -fPIC graph_builder.cpp -o _graph_builder_asan.so
cat > /tmp/_san_check.py <<'PY'
import ctypes, numpy as np
lib = ctypes.CDLL("./_graph_builder_asan.so")
i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
lib.tgt_coo_to_csx.argtypes = [i64p, i64p, ctypes.c_int64, ctypes.c_int64,
                               ctypes.c_int64, ctypes.c_int, i64p, i64p, i64p]
rng = np.random.default_rng(0)
for E, n in ((0, 5), (1, 1), (1000, 64), (50000, 999)):
    row = rng.integers(0, n, max(E,1))[:E].astype(np.int64)
    col = rng.integers(0, n, max(E,1))[:E].astype(np.int64)
    ptrs = np.empty(n + 1, np.int64); idx = np.empty(E, np.int64); perm = np.empty(E, np.int64)
    lib.tgt_coo_to_csx(row, col, E, n, n, 1, ptrs, idx, perm)
    assert ptrs[-1] == E
print("sanitizer check OK")
PY
# leak check off: CPython itself leaks at exit; ASan still catches
# overflows/UAF/UB in the library under test
ASAN_OPTIONS=detect_leaks=0 LD_PRELOAD=$(g++ -print-file-name=libasan.so) python3 /tmp/_san_check.py
rm -f _graph_builder_asan.so
