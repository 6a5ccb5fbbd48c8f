"""JAX engine tests (CPU backend, virtual 8-device mesh)."""

import gzip
import re

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ccphylo_tpu.io.phylip import PhylipStream
from ccphylo_tpu.io.qseqs import Name
from ccphylo_tpu.tree.exact import build_tree
from ccphylo_tpu.tree.jax_engine import build_tree_jax
from ccphylo_tpu.ops import pack2bit, snp
from ccphylo_tpu.ops.snp_jax import (snp_matrix, snp_matrix_pairwise,
                                     u64_to_u32, inc32_to_pairmask,
                                     sharded_snp_matrix)


def _strip_lengths(s: bytes) -> bytes:
    return re.sub(rb":[0-9.\-e]+", b"", s)


def _load_test_phy(test_phy):
    data = gzip.decompress(test_phy.read_bytes())
    return PhylipStream(data).load()


def _canonical(newick: bytes):
    """Order-insensitive tree form: parse and sort children recursively,
    rounding branch lengths."""
    s = newick.decode()
    pos = 0

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
            label = ""
        else:
            start = pos
            while pos < len(s) and s[pos] not in ":,()":
                pos += 1
            label = s[start:pos]
            kids = []
        length = None
        if pos < len(s) and s[pos] == ":":
            pos += 1
            start = pos
            while pos < len(s) and s[pos] not in ",()":
                pos += 1
            length = round(float(s[start:pos]), 6)
        return (label, length, tuple(sorted(kids, key=repr)))

    return node()


def test_dnj_matches_exact_on_test_phy(test_phy):
    """Float matrices: the guaranteed 3-way Q tie at the final join
    resolves on summation-order ulps, so compare canonical topologies."""
    n, flat, names, _ = _load_test_phy(test_phy)
    na = [Name(nm.data, nm.cap) for nm in names]
    nb = [Name(nm.data, nm.cap) for nm in names]
    exact = build_tree(flat.copy(), n, na, "dnj")
    jaxt = build_tree_jax(flat.copy(), n, nb, dtype=jnp.float64)
    assert _canonical(jaxt) == _canonical(exact)


@pytest.mark.parametrize("scan", ["seq", "batch"])
@pytest.mark.parametrize("n", [5, 16, 33, 100, 183])
def test_dnj_byte_exact_on_integer_matrices(n, scan):
    """Integer distances (the SNP pipeline's output) make every f64 sum
    exact, so the device engine's trajectory — including all tie-breaks —
    must match the reference cell-for-cell.  Both scan modes are
    trajectory-exact: batch's prefix-min gating revalidates exactly the
    rows minQpair would (dnj.c:43-128)."""
    rng = np.random.RandomState(n)
    flat = rng.randint(0, 500, n * (n - 1) // 2).astype(np.float64)
    names = [Name(b"t%03d" % i, 32) for i in range(n)]
    nb = [Name(nm.data, nm.cap) for nm in names]
    exact = build_tree(flat.copy(), n, names, "dnj")
    jaxt = build_tree_jax(flat.copy(), n, nb, dtype=jnp.float64,
                          scan=scan)
    assert jaxt == exact


@pytest.mark.parametrize("scan", ["seq", "batch"])
def test_dnj_tie_heavy_small_range(scan, n=160):
    """Small integer range -> Q ties at nearly every join; the device
    scans must still reproduce the C trajectory byte-for-byte."""
    rng = np.random.RandomState(97)
    flat = rng.randint(0, 25, n * (n - 1) // 2).astype(np.float64)
    names = [Name(b"t%03d" % i, 32) for i in range(n)]
    nb = [Name(nm.data, nm.cap) for nm in names]
    exact = build_tree(flat.copy(), n, names, "dnj")
    jaxt = build_tree_jax(flat.copy(), n, nb, dtype=jnp.float64,
                          scan=scan)
    assert jaxt == exact


def test_dnj_missing_data_early_stop():
    """Unjoinable leftovers close with limbless joins (nj.c:1594-1602)."""
    n = 8
    rng = np.random.RandomState(1)
    flat = rng.randint(1, 50, n * (n - 1) // 2).astype(np.float64)
    # disconnect nodes 6,7 from everything
    import itertools
    k = 0
    for i in range(n):
        for j in range(i):
            if i >= 6 or j >= 6:
                flat[k] = -1.0
            k += 1
    names = [Name(b"t%d" % i, 32) for i in range(n)]
    nb = [Name(x.data, x.cap) for x in names]
    exact = build_tree(flat.copy(), n, names, "dnj")
    jaxt = build_tree_jax(flat.copy(), n, nb, dtype=jnp.float64)
    assert jaxt == exact


@pytest.mark.parametrize("scan", ["seq", "batch"])
def test_dnj_random_missing_byte_exact(scan, n=72):
    """12% random missing cells: exercises updateD's one-sided
    fallbacks, the non-advancing sD/N walker (both-missing cells), and
    the out-of-row garbage read of nj.c:1022 — all reproduced by
    _update_d_exact, so f64 device bytes must equal the host engine."""
    rng = np.random.RandomState(31)
    flat = rng.randint(1, 60, n * (n - 1) // 2).astype(np.float64)
    flat[rng.rand(len(flat)) < 0.12] = -1.0
    names = [Name(b"t%03d" % i, 32) for i in range(n)]
    nb = [Name(x.data, x.cap) for x in names]
    exact = build_tree(flat.copy(), n, names, "dnj")
    jaxt = build_tree_jax(flat.copy(), n, nb, dtype=jnp.float64,
                          scan=scan)
    assert jaxt == exact


def test_dnj_f32_runs(test_phy):
    """f32 device runs produce a valid complete tree."""
    n, flat, names, _ = _load_test_phy(test_phy)
    nb = [Name(nm.data, nm.cap) for nm in names]
    jaxt = build_tree_jax(flat.copy(), n, nb, dtype=jnp.float32)
    assert jaxt.count(b"(") == jaxt.count(b")")
    assert jaxt.count(b",") == n - 1


def _random_packed(rng, n, L):
    codes = rng.randint(0, 4, size=(n, L)).astype(np.uint8)
    ns = rng.rand(n, L) < 0.05
    codes[ns] = 4
    seqs64 = []
    for i in range(n):
        w, _ = pack2bit.pack_2bit(codes[i])
        seqs64.append(w)
    return codes, np.stack(seqs64)


def test_snp_matrix_matches_host_kernel():
    rng = np.random.RandomState(3)
    n, L = 12, 700
    codes, seqs64 = _random_packed(rng, n, L)
    inc = pack2bit.init_inc_pos(L)
    for i in range(n):
        pack2bit.get_inc_pos(inc, codes[i], codes[0], 0, "default")
    host = snp.pairwise_shared(seqs64, inc)
    seqs32 = np.stack([u64_to_u32(s) for s in seqs64])
    pm = inc32_to_pairmask(inc)
    dev = np.asarray(snp_matrix(jnp.asarray(seqs32), jnp.asarray(pm)))
    np.testing.assert_array_equal(dev, host)


def test_snp_matrix_pairwise_matches_host():
    rng = np.random.RandomState(4)
    n, L = 8, 500
    codes, seqs64 = _random_packed(rng, n, L)
    incs = []
    for i in range(n):
        inc = pack2bit.init_inc_pos(L)
        pack2bit.get_inc_pos(inc, codes[i], codes[i], 0, "default")
        incs.append(inc)
    seqs32 = np.stack([u64_to_u32(s) for s in seqs64])
    incm = np.stack([inc32_to_pairmask(ic) for ic in incs])
    D, N = snp_matrix_pairwise(jnp.asarray(seqs32), jnp.asarray(incm))
    D, N = np.asarray(D), np.asarray(N)
    for i in range(n):
        for j in range(i):
            pinc = snp.mask_proxi(incs[i], incs[j], seqs64[i], seqs64[j],
                                  L, 0)
            d, nn = snp.fsacmpair(seqs64[i], seqs64[j], pinc)
            assert D[i, j] == d and N[i, j] == nn, (i, j)


def test_sharded_snp_matrix_8dev():
    """Row-sharded all-pairs kernel over the virtual 8-device mesh."""
    from jax.sharding import Mesh
    devs = np.array(jax.devices("cpu")[:8])
    assert len(devs) == 8, "expected 8 virtual CPU devices"
    mesh = Mesh(devs, ("d",))
    rng = np.random.RandomState(5)
    n, L = 16, 320
    codes, seqs64 = _random_packed(rng, n, L)
    inc = pack2bit.init_inc_pos(L)
    host = snp.pairwise_shared(seqs64, inc)
    seqs32 = np.stack([u64_to_u32(s) for s in seqs64])
    pm = inc32_to_pairmask(inc)
    dev = sharded_snp_matrix(seqs32, pm, mesh)
    np.testing.assert_array_equal(dev, host)


@pytest.mark.parametrize("seed", range(4))
def test_quantized_device_matches_exact_s(seed):
    """u16 ByteScale storage + f64 compute reproduces the exact -s
    engine's bytes (same quantization constants: load 0.5, update 0.25,
    unquantized sD bookkeeping)."""
    from ccphylo_tpu.tree.jax_engine import build_tree_jax_q
    n = 60
    rng = np.random.RandomState(seed)
    flat = rng.uniform(0.01, 60.0, n * (n - 1) // 2)
    bs = 1000.0
    na = [Name(b"t%03d" % i, 32) for i in range(n)]
    nb = [Name(b"t%03d" % i, 32) for i in range(n)]
    exact = build_tree(flat.copy(), n, na, "dnj", dtype="s",
                       bytescale=bs)
    q = build_tree_jax_q(flat.copy(), n, nb, bytescale=bs,
                         store_dtype=jnp.uint16,
                         compute_dtype=jnp.float64)
    assert q == exact


def test_quantized_device_u8_matches_exact_b():
    from ccphylo_tpu.tree.jax_engine import build_tree_jax_q
    n = 48
    rng = np.random.RandomState(11)
    flat = rng.uniform(0.1, 12.0, n * (n - 1) // 2)
    bs = 16.0
    na = [Name(b"t%03d" % i, 32) for i in range(n)]
    nb = [Name(b"t%03d" % i, 32) for i in range(n)]
    exact = build_tree(flat.copy(), n, na, "dnj", dtype="b",
                       bytescale=bs)
    q = build_tree_jax_q(flat.copy(), n, nb, bytescale=bs,
                         store_dtype=jnp.uint8,
                         compute_dtype=jnp.float64)
    assert q == exact


def test_quantized_device_f32_runs():
    from ccphylo_tpu.tree.jax_engine import build_tree_jax_q
    n = 100
    rng = np.random.RandomState(2)
    flat = rng.uniform(0.01, 60.0, n * (n - 1) // 2)
    nb = [Name(b"t%03d" % i, 32) for i in range(n)]
    t = build_tree_jax_q(flat, n, nb, bytescale=1000.0)
    assert t.count(b",") == n - 1 and t.startswith(b"(")
