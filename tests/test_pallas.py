"""Pallas SNP-expansion kernel parity vs the XLA one-hot path.

On the CPU test backend the kernel runs in the Pallas interpreter
(small shapes only); on TPU the compiled kernel takes over.  Either
way the integer counts must match ops/snp_jax bit-for-bit.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from ccphylo_tpu.ops import snp_jax, snp_pallas  # noqa: E402


@pytest.fixture(scope="module")
def data():
    n, W = 128, 512  # 8192 bases — small enough for interpret mode
    key = jax.random.PRNGKey(3)
    seqs = jax.random.bits(key, (n, W), jnp.uint32)
    pm = jax.random.bits(jax.random.fold_in(key, 1), (W,), jnp.uint32) \
        & jnp.uint32(0x55555555)
    incs = jax.random.bits(jax.random.fold_in(key, 2), (n, W),
                           jnp.uint32) & jnp.uint32(0x55555555)
    return seqs, pm, incs


def test_shared_counts_match(data):
    seqs, pm, _ = data
    a = np.asarray(snp_jax.snp_matrix(seqs, pm, wchunk=512))
    b = np.asarray(snp_pallas.snp_matrix(seqs, pm, wchunk=512))
    np.testing.assert_array_equal(a, b)


def test_pairwise_counts_match(data):
    seqs, _, incs = data
    d1, n1 = snp_jax.snp_matrix_pairwise(seqs, incs, wchunk=512)
    d2, n2 = snp_pallas.snp_matrix_pairwise(seqs, incs, wchunk=512)
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))
    np.testing.assert_array_equal(np.asarray(n1), np.asarray(n2))


def test_row_padding(data):
    """Sample counts that don't divide the tile height are padded."""
    seqs, pm, _ = data
    s = seqs[:100]
    a = np.asarray(snp_jax.snp_matrix(s, pm, wchunk=512))
    b = np.asarray(snp_pallas.snp_matrix(s, pm, wchunk=512))
    assert b.shape == (100, 100)
    np.testing.assert_array_equal(a, b)
