"""Mesh-sharded NJ/UPGMA engine: device-count invariance and
oracle-equality of unrooted topology + branch lengths.

The sharded engine targets scale and uses canonical first-wins
tie-breaks (not the reference's chains), so comparisons are on the
unrooted split set — identical away from exact criterion ties, which
the test matrices avoid (wide-range integers for NJ where Q
accumulates sums; uniform floats for UPGMA where the criterion reads
raw cells)."""

import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from ccphylo_tpu.io.qseqs import Name
from ccphylo_tpu.parallel.sharded_nj import (build_tree_sharded,
                                             sharded_join_records)


def _splits(newick: bytes):
    """Unrooted bipartition set with rounded edge lengths."""
    s = newick.decode().rstrip().rstrip(";")
    pos = 0
    out = {}

    def node():
        nonlocal pos
        if s[pos] == "(":
            pos += 1
            kids = [node()]
            while s[pos] == ",":
                pos += 1
                kids.append(node())
            assert s[pos] == ")"
            pos += 1
            leaves = frozenset().union(*kids)
        else:
            start = pos
            while pos < len(s) and s[pos] not in ":,()":
                pos += 1
            leaves = frozenset([s[start:pos]])
        ln = None
        if pos < len(s) and s[pos] == ":":
            pos += 1
            start = pos
            while pos < len(s) and s[pos] not in ",()":
                pos += 1
            ln = round(float(s[start:pos]), 4)
        if ln is not None:
            out.setdefault(leaves, []).append(ln)
        return leaves

    node()
    allv = frozenset().union(*out.keys())
    norm = {}
    for k, v in out.items():
        kk = min((k, allv - k), key=lambda x: (len(x), sorted(x)))
        norm.setdefault(kk, []).extend(v)
    return {k: sorted(v) for k, v in norm.items()}


def _mesh(ndev: int) -> Mesh:
    return Mesh(np.array(jax.devices()[:ndev]), ("d",))


def _rand_square(seed: int, n: int, integer: bool) -> np.ndarray:
    rng = np.random.RandomState(seed)
    if integer:
        M = rng.randint(1, 2000, size=(n, n)).astype(np.float64)
    else:
        M = rng.uniform(1, 100, size=(n, n)).round(4)
    D = np.triu(M, 1)
    return D + D.T


def _write_phy(path, D, n, integer):
    fmt = (lambda v: b"%d" % int(v)) if integer else \
        (lambda v: b"%.4f" % v)
    lines = [b"%10d" % n, b"s0"]
    for i in range(1, n):
        lines.append(b"s%d\t" % i
                     + b"\t".join(fmt(D[i, j]) for j in range(i)))
    path.write_bytes(b"\n".join(lines) + b"\n")


@pytest.mark.parametrize("method,integer,seed,n",
                         [("nj", True, 3, 23), ("nj", True, 7, 40),
                          ("nj", True, 11, 64),
                          ("upgma", False, 3, 23),
                          ("upgma", False, 7, 40),
                          ("upgma", False, 11, 64)])
def test_sharded_vs_oracle(oracle, tmp_path, method, integer, seed, n):
    D = _rand_square(seed, n, integer)
    phy = tmp_path / "d.phy"
    _write_phy(phy, D, n, integer)
    ref = subprocess.run([str(oracle), "tree", "-i", str(phy),
                          "-m", method],
                         capture_output=True).stdout.strip()
    assert ref
    names = [Name(b"s%d" % i, 10) for i in range(n)]
    ours = build_tree_sharded(D, n, names, _mesh(8), method=method,
                              dtype=jnp.float64) + b";"
    sr, so = _splits(ref), _splits(ours)
    assert set(sr) == set(so)
    for k in sr:
        assert np.allclose(sr[k], so[k], atol=1e-3), (k, sr[k], so[k])


@pytest.mark.parametrize("method", ["nj", "upgma"])
@pytest.mark.parametrize("ndev", [1, 2, 8])
def test_device_count_invariance(method, ndev):
    D = _rand_square(5, 33, method == "nj")
    base = sharded_join_records(D, 33, _mesh(8), method=method,
                                dtype=jnp.float64)
    got = sharded_join_records(D, 33, _mesh(ndev), method=method,
                               dtype=jnp.float64)
    for x, y in zip(base, got):
        assert np.allclose(x, y)


def test_f32_runs_and_agrees_on_topology():
    n = 40
    D = _rand_square(9, n, True)
    r64 = sharded_join_records(D, n, _mesh(8), dtype=jnp.float64)
    r32 = sharded_join_records(D, n, _mesh(8), dtype=jnp.float32)
    assert (r64[0] == r32[0]).all() and (r64[1] == r32[1]).all()
    assert np.allclose(r64[2], r32[2], rtol=1e-4)
