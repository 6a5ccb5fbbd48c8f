"""`tree -t`: the host dnj batch scan parallelized over worker
threads (reference minQ_thread, dnj.c:505-605) — output must be
byte-identical at any thread count (the reference's own guarantee,
nj.c:492-510)."""

import numpy as np
import pytest

from ccphylo_tpu.io.qseqs import Name
from ccphylo_tpu.tree.exact import build_tree


def _names(n):
    out = []
    for i in range(n):
        nm = Name(b"", 4 if i < 32 else 32)
        nm.grow_for(9)
        nm.data = b"T%07d" % i
        out.append(nm)
    return out


@pytest.mark.parametrize("seed", [1, 2])
def test_threaded_scan_identical(seed):
    """n large enough that the threaded path actually engages (the
    chunked pass requires row index >= 1024)."""
    rng = np.random.RandomState(seed)
    n = 1400
    flat = rng.randint(0, 97, n * (n - 1) // 2).astype(np.float64)
    t1 = build_tree(flat.copy(), n, _names(n), "dnj", threads=1)
    t4 = build_tree(flat.copy(), n, _names(n), "dnj", threads=4)
    assert t1 == t4


def test_threads_with_missing_cells():
    rng = np.random.RandomState(7)
    n = 1200
    flat = rng.randint(0, 50, n * (n - 1) // 2).astype(np.float64)
    miss = rng.random(flat.shape) < 0.1
    flat[miss] = -1.0
    t1 = build_tree(flat.copy(), n, _names(n), "dnj", threads=1)
    t2 = build_tree(flat.copy(), n, _names(n), "dnj", threads=2)
    assert t1 == t2
