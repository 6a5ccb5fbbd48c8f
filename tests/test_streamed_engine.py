"""Host-streamed (beyond-HBM) DNJ engine vs the host exact engine.

The streamed engine's records must be bit-identical to the in-HBM
packed engine — and therefore to the oracle-anchored host exact engine
(tree/exact.py) — at ANY cache size: residency only decides when a row
is read, never what it contains.  Two configurations:

* metric data with X < n: exercises cache misses, segment aborts,
  evictions, ring churn, and host refresh (measured ~80 aborts /
  ~3.5k row uploads at n=600, X=384).
* tie-dense hash data with X = n: every row resident, but column
  maintenance still flows exclusively through the patch ring +
  write-backs (the adversarial tie data from the scale parity chain).
"""

import numpy as np
import pytest

import jax.numpy as jnp


def _host_records(Dq: np.ndarray, n: int):
    """Join records from the byte-parity host engine on the quantized
    matrix (loadPhy -b semantics: cells already u8)."""
    from ccphylo_tpu.tree import exact as ex
    iu = np.tril_indices(n, -1)
    flat = Dq[:n, :n][iu].astype(np.float64)
    stt = ex.TreeState(flat, n, "b", 1.0)
    cfg = ex.METHODS["dnj"]
    cfg["init"](stt)
    qpair, update, pop = cfg["qpair"], cfg["update"], cfg["pop"]
    mi0, _ = ex.min_q(stt)
    j = mi0
    I, J = [], []
    while stt.n != 2:
        i, j2 = qpair(stt, j)
        if i == 0 and j2 == 0:
            break
        I.append(i)
        J.append(j2)
        Li, Lj = ex.limb_length(i, j2, stt.sD, stt.N,
                                ex._d_ij(stt, i, j2), False)
        mi = update(stt, i, j2, Li, Lj)
        mj = pop(stt, i)
        if mj == stt.n:
            j = mi
        elif mi == stt.n:
            j = mj
        else:
            j = ex.min_pos(stt.Q, mi, mj)
    return np.array(I, np.int32), np.array(J, np.int32)


def _metric_matrix(npad, seed=7):
    rng = np.random.RandomState(seed)
    x = rng.uniform(0, 1, npad)
    Dq = np.minimum(np.round(np.abs(x[:, None] - x[None, :]) * 180) + 3,
                    255).astype(np.uint8)
    np.fill_diagonal(Dq, 0)
    return Dq


def _hash_matrix(npad, mod=97):
    from benchmarks.synth import cell_hash_np
    ii, jj = np.meshgrid(np.arange(npad, dtype=np.uint32),
                         np.arange(npad, dtype=np.uint32), indexing="ij")
    return cell_hash_np(ii, jj, mod)


@pytest.mark.parametrize("data,X,F", [("metric", 384, 48),
                                      ("hash", 600, 64)])
def test_streamed_records_match_host_exact(data, X, F):
    from ccphylo_tpu.tree.streamed_engine import (_pad512,
                                                  dnj_joins_streamed)
    n = 600
    npad = _pad512(n)
    Dq = (_metric_matrix(npad) if data == "metric"
          else _hash_matrix(npad))
    Dq[n:, :] = 0
    Dq[:, n:] = 0
    I_ref, J_ref = _host_records(Dq, n)

    I, J, DIJ2, SDI2, SDJ2, dl2 = dnj_joins_streamed(
        Dq.copy(), n, X=X, F=F)
    eng = dnj_joins_streamed.last
    k = n - 2
    assert np.array_equal(np.asarray(I)[:k], I_ref)
    assert np.array_equal(np.asarray(J)[:k], J_ref)
    if data == "metric":
        # the small cache must actually have been exercised
        assert eng.aborts > 5
        assert eng.uploaded_rows > n


def test_streamed_livelock_guard():
    """A cache smaller than the per-join working set must raise the
    documented error, not hang."""
    from ccphylo_tpu.tree.streamed_engine import (_pad512,
                                                  dnj_joins_streamed)
    n = 600
    npad = _pad512(n)
    Dq = _hash_matrix(npad)
    Dq[n:, :] = 0
    Dq[:, n:] = 0
    with pytest.raises(RuntimeError, match="livelock"):
        dnj_joins_streamed(Dq, n, X=64, F=16)


@pytest.mark.parametrize("n,m", [(512, 500), (1024, 1024), (512, 2),
                                 (512, 3)])
def test_native_host_init_parity(n, m):
    """init_hnj_u8 (native single-pass) must be bit-exact vs the numpy
    formulation — sums, Q, the prefmin P tie rule, and the seed row —
    on tie-dense u8 data with padded rows and m < n."""
    from ccphylo_tpu.native import get_lib
    from ccphylo_tpu.tree.streamed_engine import (_host_init,
                                                  _host_init_np)
    if get_lib() is None:
        pytest.skip("native library unavailable")
    rng = np.random.RandomState(n + m)
    Dq = rng.randint(0, 7, (n, n)).astype(np.uint8)  # dense ties
    Dq = np.minimum(Dq, Dq.T)
    np.fill_diagonal(Dq, 0)
    Dq[m:, :] = 0
    Dq[:, m:] = 0
    sD2_a, Q_a, P_a, seed_a = _host_init(Dq, m)
    sD2_b, Q_b, P_b, seed_b = _host_init_np(Dq, m)
    np.testing.assert_array_equal(sD2_a, sD2_b)
    np.testing.assert_array_equal(Q_a, Q_b)
    np.testing.assert_array_equal(P_a, P_b)
    assert seed_a == seed_b
