"""Compile-cache shape bucketing: padded sizes snap to canonical
buckets above 16384 rows (packed_engine._bucket512), and join records
are invariant to the amount of zero padding — so bucketing changes
compile-cache behavior only, never results."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from ccphylo_tpu.tree import packed_engine as pe  # noqa: E402


def test_bucket_sizes(monkeypatch):
    monkeypatch.delenv("CCPHYLO_TPU_BUCKET", raising=False)
    # <= 16384: untouched (fast compiles; keeps small-run shapes lean)
    for b in (512, 1024, 8192, 16384):
        assert pe._bucket512(b) == b
    # above: eighth-steps of powers of two
    assert pe._bucket512(16896) == 18432
    assert pe._bucket512(18432) == 18432
    assert pe._bucket512(33280) == 36864
    assert pe._bucket512(100352) == 106496
    assert pe._bucket512(131072) == 131072
    # worst-case row overhead stays under 12.5%
    for n in range(17000, 400000, 7919):
        base = -(-n // 512) * 512
        assert base <= pe._bucket512(base) < base * 1.125 + 512


def test_bucket_env_off(monkeypatch):
    monkeypatch.setenv("CCPHYLO_TPU_BUCKET", "0")
    assert pe._bucket512(100352) == 100352
    assert pe._pad_packed(100000) == 100352


def test_records_invariant_to_padding():
    """The same n=100 matrix embedded in npad=512 vs npad=1024 buffers
    yields bit-identical join records (padding rows are inactive by
    the m_t masks)."""
    rng = np.random.RandomState(21)
    n = 100
    qv = rng.randint(0, 200, n * (n - 1) // 2).astype(np.uint8)

    def run(npad):
        Dq = np.zeros((npad, npad), np.uint8)
        iu = np.tril_indices(n, -1)
        Dq[(iu[0], iu[1])] = qv
        Dq[(iu[1], iu[0])] = qv
        return pe.dnj_joins_packed(pe.pack_words(Dq), jnp.int32(n))

    r512 = run(512)
    r1024 = run(1024)
    k = n - 2
    for a, b in zip(r512[:5], r1024[:5]):
        np.testing.assert_array_equal(np.asarray(a)[:k],
                                      np.asarray(b)[:k])
    assert int(r512[5]) == int(r1024[5])  # d_last2
