"""Device (JAX) all-pairs count-matrix distances — the `dist` .mat path.

The reference computes `.mat` distances per pair by re-streaming files
(cmpMats, matcmp.c:448-494) — IO-bound by design.  Here all included
samples' count matrices live as one (k, L, 6) tensor and every pair's
per-position metric reduces on the VPU, chunked over positions
(genome axis = lane axis; position chunks stream host->device, so the
kernel works on matrices far larger than HBM).

Implemented metric: cos (the default, coscmp matcmp.c:420-446):

    res(p) = 1 - a.b / (|a||b|)   over the 5 non-N channels,
    clamped at 0; position excluded when either vector is all-zero or
    either total < minDepth.

Exactness: inclusion gates (depth, zero-vector, position < length) are
integer-exact; the metric value and the per-pair sum are computed in
float32 on device with float64 accumulation of chunk partials on the
host, so sums can differ from the C's sequential float64 by ~1e-6
relative — this path is opt-in (CCPHYLO_TPU_DIST=device) and NOT
byte-parity; the host engine (ops/veccmp.cmp_mats) remains the
default.

Returns the same (dist, rows_inc) contract as cmp_mats for every pair,
including the -1.0/-2.0 sentinels and `norm` scaling, so the CLI's
message/exit behavior is unchanged.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

PCHUNK = 8192  # positions per streamed chunk (~10 MB at k=100)


@functools.partial(jax.jit, static_argnames=("min_depth",))
def _cos_chunk(counts, totals, plens, min_depth):
    """One position chunk: counts (k, P, 6) int32, totals (k, P) int32,
    plens (k,) int32 = remaining valid positions per sample.

    Returns (sums (k, k) f32, incs (k, k) int32) for this chunk, over
    pairs gated per position on depth/zero-vector/length."""
    k, P, _ = counts.shape
    a = counts[:, :, :5].astype(jnp.float32)        # (k, P, 5)
    q = (a * a).sum(axis=2)                          # (k, P)
    nz = (counts[:, :, :5] > 0).any(axis=2)          # exact zero gate
    pos = jnp.arange(P, dtype=jnp.int32)
    inlen = pos[None, :] < plens[:, None]
    deep = (totals >= min_depth) & inlen
    okv = deep & nz                                   # per-sample gate

    # d(i,j,p) = sum_c a(i,p,c) * a(j,p,c): batched matmul over p
    d = jnp.einsum("ipc,jpc->ijp", a, a,
                   preferred_element_type=jnp.float32)
    rs = jax.lax.rsqrt(jnp.where(q > 0, q, 1.0))
    res = 1.0 - d * rs[:, None, :] * rs[None, :, :]
    res = jnp.maximum(res, 0.0)
    use = okv[:, None, :] & okv[None, :, :]
    sums = jnp.where(use, res, 0.0).sum(axis=2)
    incs = use.sum(axis=2, dtype=jnp.int32)
    return sums, incs


def cos_pair_table(counts_list, totals_list, min_depth: int):
    """All-pairs (sum, rows_inc) over stripped samples.

    counts_list[i]: (L_i, 6) uint16; totals_list[i]: (L_i,) int64.
    Positions beyond min(L_i, L_j) are excluded per pair (cmpMats
    truncates at sample2's length; the longer-than-sample1 case is the
    caller's -1 sentinel).  Returns (S float64 (k, k), R int64 (k, k)).
    """
    k = len(counts_list)
    lens = np.array([len(c) for c in counts_list], np.int32)
    Lmax = int(lens.max()) if k else 0
    S = np.zeros((k, k), np.float64)
    R = np.zeros((k, k), np.int64)
    for p0 in range(0, Lmax, PCHUNK):
        P = min(PCHUNK, Lmax - p0)
        cc = np.zeros((k, P, 6), np.int32)
        tt = np.zeros((k, P), np.int32)
        for i in range(k):
            hi = min(len(counts_list[i]), p0 + P)
            if hi > p0:
                cc[i, :hi - p0] = counts_list[i][p0:hi]
                tt[i, :hi - p0] = totals_list[i][p0:hi]
        plens = np.clip(lens - p0, 0, P).astype(np.int32)
        s, r = _cos_chunk(jnp.asarray(cc), jnp.asarray(tt),
                          jnp.asarray(plens), min_depth)
        S += np.asarray(s, np.float64)
        R += np.asarray(r, np.int64)
    return S, R


def cmp_mats_from_table(S, R, i, j, len_i, len_j, n_nucs_j, norm,
                        min_depth, min_length, min_cov):
    """cmpMats' gate/sentinel logic (matcmp.c:448-494) from the batched
    table — same (dist, rows_inc) results as ops/veccmp.cmp_mats up to
    the documented float32 summation difference."""
    if len_j > len_i:
        return -1.0, 0  # caller maps to the 'longer than' sentinel
    rows_inc = int(R[i, j])
    if n_nucs_j < min_length or n_nucs_j < min_cov * len_j:
        return -2.0, rows_inc
    if rows_inc < min_length or rows_inc < min_cov * len_j:
        return -1.0, 0
    dist = float(S[i, j])
    return (dist / rows_inc * norm if norm else dist), rows_inc
