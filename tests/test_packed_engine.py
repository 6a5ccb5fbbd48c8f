"""Blocked u32-packed quantized DNJ (tree/packed_engine.py).

The packed engine must be semantically identical to the unpacked
quantized engine (tree/jax_engine.dnj_joins_q) — same scan, tie rules,
and quantization constants — so their join records are compared
bitwise; byte parity with the host exact -b engine under f64 compute
mirrors test_jax_engine's quantized tests.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ccphylo_tpu.io.qseqs import Name
from ccphylo_tpu.tree.exact import build_tree
from ccphylo_tpu.tree.jax_engine import dnj_joins_q, _pad
from ccphylo_tpu.tree.packed_engine import (_pad_packed,
                                            build_tree_jax_packed,
                                            dnj_joins_packed,
                                            pack_blocks)


def _random_q(rng, n, lo=0.1, hi=12.0, bs=16.0):
    flat = rng.uniform(lo, hi, n * (n - 1) // 2)
    qv = np.clip(np.floor(flat * bs + 0.5), 0, 255).astype(np.uint8)
    return flat, qv, bs


def _square(qv, n, npad):
    Dq = np.zeros((npad, npad), np.uint8)
    iu = np.tril_indices(n, -1)
    Dq[(iu[0], iu[1])] = qv
    Dq[(iu[1], iu[0])] = qv
    return Dq


@pytest.mark.parametrize("n,nb", [(100, 2), (600, 4), (257, 8)])
def test_packed_matches_unpacked_records(n, nb):
    """Bit-identical join records vs dnj_joins_q (same f32 compute) —
    integer-quantized data is tie-dense, so this checks every tie
    rule survives the packing."""
    rng = np.random.RandomState(n)
    _, qv, bs = _random_q(rng, n)

    npad_u = _pad(n)
    Dq_u = _square(qv, n, npad_u)
    Iu, Ju, LIu, LJu, dlu, _ = dnj_joins_q(
        jnp.asarray(Dq_u), jnp.int32(n), jnp.asarray(bs, jnp.float32),
        store_dtype=jnp.uint8, compute_dtype=jnp.float32)

    npad_p = _pad_packed(n, nb)
    blocks = pack_blocks(_square(qv, n, npad_p), nb)
    Ip, Jp, LIp, LJp, dlp, _ = dnj_joins_packed(
        blocks, jnp.int32(n), jnp.asarray(bs, jnp.float32),
        compute_dtype=jnp.float32)

    k = n - 2
    np.testing.assert_array_equal(np.asarray(Iu)[:k], np.asarray(Ip)[:k])
    np.testing.assert_array_equal(np.asarray(Ju)[:k], np.asarray(Jp)[:k])
    np.testing.assert_array_equal(np.asarray(LIu)[:k],
                                  np.asarray(LIp)[:k])
    np.testing.assert_array_equal(np.asarray(LJu)[:k],
                                  np.asarray(LJp)[:k])
    assert float(dlu) == float(dlp)


@pytest.mark.parametrize("seed", range(3))
def test_packed_matches_exact_b(seed):
    """u8 packed storage + f64 compute reproduces the host exact -b
    engine's Newick bytes."""
    n = 48
    rng = np.random.RandomState(seed)
    flat = rng.uniform(0.1, 12.0, n * (n - 1) // 2)
    bs = 16.0
    na = [Name(b"t%03d" % i, 32) for i in range(n)]
    nb_names = [Name(b"t%03d" % i, 32) for i in range(n)]
    exact = build_tree(flat.copy(), n, na, "dnj", dtype="b",
                       bytescale=bs)
    packed = build_tree_jax_packed(flat.copy(), n, nb_names,
                                   bytescale=bs, nb=2,
                                   compute_dtype=jnp.float64)
    assert packed == exact


def test_packed_tiny_integer_ties():
    """Integer SNP-like matrix (ties everywhere): packed == unpacked."""
    rng = np.random.RandomState(7)
    n, nb = 120, 4
    qv = rng.randint(0, 6, n * (n - 1) // 2).astype(np.uint8)
    bs = 1.0
    npad_u = _pad(n)
    Iu, Ju, *_ = dnj_joins_q(
        jnp.asarray(_square(qv, n, npad_u)), jnp.int32(n),
        jnp.asarray(bs, jnp.float32), store_dtype=jnp.uint8,
        compute_dtype=jnp.float32)
    blocks = pack_blocks(_square(qv, n, _pad_packed(n, nb)), nb)
    Ip, Jp, *_ = dnj_joins_packed(blocks, jnp.int32(n),
                                  jnp.asarray(bs, jnp.float32),
                                  compute_dtype=jnp.float32)
    k = n - 2
    np.testing.assert_array_equal(np.asarray(Iu)[:k], np.asarray(Ip)[:k])
    np.testing.assert_array_equal(np.asarray(Ju)[:k], np.asarray(Jp)[:k])
