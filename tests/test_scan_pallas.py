"""qrow_mins (Pallas batch-scan kernel) parity vs the jnp batch-scan
expression in tree/packed_engine.py.

On the CPU test backend the kernel runs in the Pallas interpreter; on
TPU the compiled kernel is additionally smoke-tested by
benchmarks/tpu_smoke.py before a round ends (VERDICT r4 item 1: the
round-4 kernel was interpret-green but failed TPU lowering).
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from ccphylo_tpu.ops.scan_pallas import qrow_mins  # noqa: E402

IBIG = 2 ** 31 - 1


def _reference(rows, co, words, sd2):
    """The packed engine's jnp formulation (packed_engine.py bbody)."""
    n, W = words.shape
    idx = np.arange(n, dtype=np.int32)
    r = np.asarray(rows, np.int64)
    cells = np.zeros((len(r), n), np.int64)
    w = np.asarray(words, np.uint64)[r]
    for b in range(4):
        cells[:, b::4] = (w >> (8 * b)) & 0xFF
    q = co * cells - np.asarray(sd2, np.int64)[r][:, None] \
        - np.asarray(sd2, np.int64)[None, :]
    ok = idx[None, :] < r[:, None]
    q = np.where(ok, q, IBIG)
    rmin = q.min(axis=1)
    rarg = np.where(q == rmin[:, None], idx[None, :], -1).max(axis=1)
    return rmin.astype(np.int32), np.maximum(rarg, 0).astype(np.int32)


def _run(rows, co, words, sd2):
    return qrow_mins(jnp.asarray(rows, jnp.int32), jnp.int32(co),
                     jnp.asarray(words), jnp.asarray(sd2, jnp.int32),
                     interpret=jax.default_backend() != "tpu")


def test_qrow_mins_parity():
    rng = np.random.default_rng(7)
    n, K = 512, 16
    W = n // 4
    words = rng.integers(0, 2 ** 32, (n, W), dtype=np.uint32)
    sd2 = rng.integers(0, 1 << 20, n, dtype=np.int32)
    rows = rng.integers(1, n, K, dtype=np.int32)
    co = 2 * (n - 2)
    rmin, rarg = _run(rows, co, words, sd2)
    emin, earg = _reference(rows, co, words, sd2)
    np.testing.assert_array_equal(np.asarray(rmin), emin)
    np.testing.assert_array_equal(np.asarray(rarg), earg)


def test_qrow_mins_ties_last_wins():
    """Identical cells + identical sd2 => every column ties; the
    engine's rule picks the LARGEST column index < r."""
    n, K = 512, 8
    W = n // 4
    words = np.full((n, W), 0x05050505, np.uint32)  # all cells = 5
    sd2 = np.zeros(n, np.int32)
    rows = np.asarray([1, 2, 3, 100, 255, 256, 511, 8], np.int32)
    co = 10
    rmin, rarg = _run(rows, co, words, sd2)
    np.testing.assert_array_equal(np.asarray(rarg), rows - 1)
    np.testing.assert_array_equal(np.asarray(rmin),
                                  np.full(K, 50, np.int32))


def test_qrow_mins_padding_rows():
    """Padding entries (row 0) produce garbage that callers mask; they
    must not corrupt valid lanes."""
    rng = np.random.default_rng(11)
    n, K = 512, 8
    W = n // 4
    words = rng.integers(0, 2 ** 32, (n, W), dtype=np.uint32)
    sd2 = rng.integers(0, 1 << 16, n, dtype=np.int32)
    rows = np.asarray([0, 37, 0, 511, 0, 256, 2, 0], np.int32)
    co = 2 * (n - 2)
    rmin, rarg = _run(rows, co, words, sd2)
    emin, earg = _reference(rows, co, words, sd2)
    valid = rows >= 1
    np.testing.assert_array_equal(np.asarray(rmin)[valid], emin[valid])
    np.testing.assert_array_equal(np.asarray(rarg)[valid], earg[valid])


def test_qrow_mins_repeated_rows():
    rng = np.random.default_rng(13)
    n, K = 512, 8
    W = n // 4
    words = rng.integers(0, 2 ** 32, (n, W), dtype=np.uint32)
    sd2 = rng.integers(0, 1 << 16, n, dtype=np.int32)
    rows = np.asarray([300, 300, 300, 7, 7, 511, 511, 1], np.int32)
    co = 2 * (n - 2)
    rmin, rarg = _run(rows, co, words, sd2)
    emin, earg = _reference(rows, co, words, sd2)
    np.testing.assert_array_equal(np.asarray(rmin), emin)
    np.testing.assert_array_equal(np.asarray(rarg), earg)


def test_engine_pallas_scan_matches_jnp(monkeypatch):
    """dnj_joins_packed records are bit-identical between the two scan
    implementations (interpret mode on CPU)."""
    import jax.numpy as jnp
    import ccphylo_tpu.ops.scan_pallas as sp
    from ccphylo_tpu.tree import packed_engine as pe

    rng = np.random.RandomState(5)
    n = 100
    npad = pe._pad_packed(n)
    qv = rng.randint(0, 200, n * (n - 1) // 2).astype(np.uint8)
    Dq = np.zeros((npad, npad), np.uint8)
    iu = np.tril_indices(n, -1)
    Dq[(iu[0], iu[1])] = qv
    Dq[(iu[1], iu[0])] = qv

    real_qrow = sp.qrow_mins

    def interp_qrow(rows, co, words, sd2):
        return real_qrow(rows, co, words, sd2, interpret=True)

    monkeypatch.setattr(sp, "qrow_mins", interp_qrow)
    monkeypatch.setenv("CCPHYLO_TPU_SCAN", "jnp")
    rj = pe.dnj_joins_packed(pe.pack_words(Dq.copy()), jnp.int32(n))
    monkeypatch.setenv("CCPHYLO_TPU_SCAN", "pallas")
    rp = pe.dnj_joins_packed(pe.pack_words(Dq.copy()), jnp.int32(n))
    for a, b in zip(rj[:6], rp[:6]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
