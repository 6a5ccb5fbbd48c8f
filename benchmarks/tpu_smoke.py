#!/usr/bin/env python
"""On-hardware smoke gate: run every default device path at tiny n on
the real TPU and verify integer parity where an independent oracle is
cheap.  Round-4 lesson (VERDICT r4 item 1): interpret-mode green is
NOT hardware green — two Pallas kernels that passed CPU tests failed
Mosaic lowering on the chip.  Never end a round without this script
exiting 0.

Stages (each compiled and executed on the chip):
  snp_pallas   shared + pairwise SNP kernels vs ops/snp_jax (the
               driver-benchmarked known-good path)
  scan_pallas  qrow_mins vs a numpy evaluation of the engine's Q-scan
  packed       dnj_joins_packed DEFAULT path completes; jnp and pallas
               scans produce bit-identical records
  streamed     dnj_joins_streamed records == packed records
  device-dnj   tree/jax_engine.dnj_joins completes
  sharded      parallel/sharded_dnj on a 1-device mesh completes
  hclust       tree/hclust_engine upgma completes

Usage: python benchmarks/tpu_smoke.py  (rc 0 = all required stages
green; 'pallas-scan' parity is also REQUIRED so a broken opt-in kernel
cannot ship silently).
"""

import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np

from ccphylo_tpu.utils.jaxconfig import configure_jax

configure_jax()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

IBIG = 2 ** 31 - 1
RESULTS = []


def stage(name):
    def deco(fn):
        def run():
            t0 = time.perf_counter()
            try:
                fn()
                dt = time.perf_counter() - t0
                print(f"[smoke] {name}: OK ({dt:.1f}s)", flush=True)
                RESULTS.append((name, True))
            except Exception:
                dt = time.perf_counter() - t0
                print(f"[smoke] {name}: FAIL ({dt:.1f}s)", flush=True)
                traceback.print_exc()
                RESULTS.append((name, False))
        return run
    return deco


@stage("snp_pallas")
def smoke_snp():
    from ccphylo_tpu.ops import snp_jax, snp_pallas
    key = jax.random.PRNGKey(3)
    n, W = 128, 512
    seqs = jax.random.bits(key, (n, W), jnp.uint32)
    pm = jax.random.bits(jax.random.fold_in(key, 1), (W,),
                         jnp.uint32) & jnp.uint32(0x55555555)
    incs = jax.random.bits(jax.random.fold_in(key, 2), (n, W),
                           jnp.uint32) & jnp.uint32(0x55555555)
    a = np.asarray(snp_jax.snp_matrix(seqs, pm, wchunk=512))
    b = np.asarray(snp_pallas.snp_matrix(seqs, pm, wchunk=512))
    np.testing.assert_array_equal(a, b)
    d1, n1 = snp_jax.snp_matrix_pairwise(seqs, incs, wchunk=512)
    d2, n2 = snp_pallas.snp_matrix_pairwise(seqs, incs, wchunk=512)
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))
    np.testing.assert_array_equal(np.asarray(n1), np.asarray(n2))


@stage("scan_pallas")
def smoke_scan():
    from ccphylo_tpu.ops.scan_pallas import qrow_mins
    rng = np.random.default_rng(7)
    n, K = 512, 16
    W = n // 4
    words = rng.integers(0, 2 ** 32, (n, W), dtype=np.uint32)
    sd2 = rng.integers(0, 1 << 20, n, dtype=np.int32)
    rows = rng.integers(1, n, K, dtype=np.int32)
    co = 2 * (n - 2)
    rmin, rarg = qrow_mins(jnp.asarray(rows), jnp.int32(co),
                           jnp.asarray(words), jnp.asarray(sd2))
    # numpy oracle
    idx = np.arange(n)
    cells = np.zeros((K, n), np.int64)
    w = np.asarray(words, np.uint64)[rows]
    for b in range(4):
        cells[:, b::4] = (w >> (8 * b)) & 0xFF
    q = co * cells - sd2.astype(np.int64)[rows][:, None] \
        - sd2.astype(np.int64)[None, :]
    q = np.where(idx[None, :] < rows[:, None], q, IBIG)
    emin = q.min(axis=1)
    earg = np.where(q == emin[:, None], idx[None, :], -1).max(axis=1)
    np.testing.assert_array_equal(np.asarray(rmin), emin)
    np.testing.assert_array_equal(np.asarray(rarg), earg)


def _tiny_packed():
    from ccphylo_tpu.tree import packed_engine as pe
    rng = np.random.RandomState(5)
    n = 200
    npad = pe._pad_packed(n)
    qv = rng.randint(0, 200, n * (n - 1) // 2).astype(np.uint8)
    Dq = np.zeros((npad, npad), np.uint8)
    iu = np.tril_indices(n, -1)
    Dq[(iu[0], iu[1])] = qv
    Dq[(iu[1], iu[0])] = qv
    return pe, n, Dq


@stage("packed")
def smoke_packed():
    pe, n, Dq = _tiny_packed()
    # the default path (whatever auto resolves to) must complete
    os.environ.pop("CCPHYLO_TPU_SCAN", None)
    rd = pe.dnj_joins_packed(pe.pack_words(Dq.copy()), jnp.int32(n))
    os.environ["CCPHYLO_TPU_SCAN"] = "jnp"
    rj = pe.dnj_joins_packed(pe.pack_words(Dq.copy()), jnp.int32(n))
    os.environ.pop("CCPHYLO_TPU_SCAN", None)
    for a, b in zip(rd[:6], rj[:6]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    smoke_packed.records = tuple(np.asarray(x) for x in rj[:6])


@stage("pallas-scan")
def smoke_packed_pallas():
    pe, n, Dq = _tiny_packed()
    os.environ["CCPHYLO_TPU_SCAN"] = "pallas"
    try:
        rp = pe.dnj_joins_packed(pe.pack_words(Dq.copy()),
                                 jnp.int32(n))
    finally:
        os.environ.pop("CCPHYLO_TPU_SCAN", None)
    for a, b in zip(smoke_packed.records, rp[:6]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@stage("streamed")
def smoke_streamed():
    from ccphylo_tpu.tree import packed_engine as pe
    from ccphylo_tpu.tree.streamed_engine import dnj_joins_streamed
    rng = np.random.RandomState(9)
    n = 512  # streamed engine requires n % 512 == 0
    qv = rng.randint(0, 200, n * (n - 1) // 2).astype(np.uint8)
    Dq = np.zeros((n, n), np.uint8)
    iu = np.tril_indices(n, -1)
    Dq[(iu[0], iu[1])] = qv
    Dq[(iu[1], iu[0])] = qv
    rs = dnj_joins_streamed(Dq.copy(), n, X=384, F=64, kbatch=32)
    os.environ["CCPHYLO_TPU_SCAN"] = "jnp"
    try:
        rp = pe.dnj_joins_packed(pe.pack_words(Dq.copy()),
                                 jnp.int32(n))
    finally:
        os.environ.pop("CCPHYLO_TPU_SCAN", None)
    for a, b in zip(rs[:6], rp[:6]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@stage("device-dnj")
def smoke_device_dnj():
    from ccphylo_tpu.tree import jax_engine
    rng = np.random.RandomState(11)
    n = 128
    D = np.abs(rng.randn(n, n)).astype(np.float32)
    D = np.tril(D, -1)
    D = D + D.T
    I, J, *_ = jax_engine.dnj_joins(jnp.asarray(D), jnp.int32(n))
    assert np.asarray(I).shape[0] >= n - 2


@stage("sharded")
def smoke_sharded():
    from jax.sharding import Mesh
    from ccphylo_tpu.parallel.sharded_dnj import sharded_dnj_records
    rng = np.random.RandomState(13)
    n = 64
    D = np.abs(rng.randn(n, n)).astype(np.float32)
    D = np.tril(D, -1)
    D = D + D.T
    mesh = Mesh(np.array(jax.devices()[:1]), ("d",))
    I, J, LI, LJ, dl = sharded_dnj_records(D, n, mesh)
    assert I.shape[0] == n - 2


@stage("hclust")
def smoke_hclust():
    from ccphylo_tpu.tree import hclust_engine
    rng = np.random.RandomState(17)
    n = 128
    D = np.abs(rng.randn(n, n)).astype(np.float64)
    D = np.tril(D, -1)
    D = D + D.T
    hclust_engine.hclust_joins(jnp.asarray(D), jnp.int32(n), "upgma")


def main():
    backend = jax.default_backend()
    print(f"[smoke] backend = {backend}, devices = {jax.devices()}",
          flush=True)
    if backend != "tpu":
        print("[smoke] WARNING: not on TPU — this run does NOT gate "
              "hardware health", flush=True)
    for fn in (smoke_snp, smoke_scan, smoke_packed,
               smoke_packed_pallas, smoke_streamed, smoke_device_dnj,
               smoke_sharded, smoke_hclust):
        fn()
    bad = [n for n, ok in RESULTS if not ok]
    print(f"[smoke] {len(RESULTS) - len(bad)}/{len(RESULTS)} stages "
          f"green" + (f"; FAILED: {', '.join(bad)}" if bad else ""),
          flush=True)
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
