"""Device count-matrix metric kernels vs the host cmp_mats engine.

rows_inc (the integer gate input) must be exact for every metric; the
metric sums are float32-on-device and compared within tolerance.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from ccphylo_tpu.ops import matdist_jax  # noqa: E402
from ccphylo_tpu.ops.veccmp import cmp_mats, get_veccmp  # noqa: E402


def _samples(k=7, L=900, seed=0):
    rng = np.random.RandomState(seed)
    counts, totals = [], []
    for i in range(k):
        Li = L - rng.randint(0, 60)
        c = rng.randint(0, 60, (Li, 6)).astype(np.uint16)
        # sprinkle shallow and all-zero positions to hit the gates
        z = rng.rand(Li) < 0.08
        c[z] = 0
        shallow = rng.rand(Li) < 0.1
        c[shallow] //= 20
        counts.append(c)
        totals.append(c.astype(np.int64).sum(axis=1))
    return counts, totals


@pytest.mark.parametrize("metric", sorted(matdist_jax.METRICS))
def test_metric_table_matches_host(metric):
    counts, totals = _samples()
    k = len(counts)
    min_depth = 15
    S, R = matdist_jax.pair_table(metric, counts, totals, min_depth)
    veccmp = get_veccmp(metric)
    for i in range(k):
        for j in range(k):
            if i == j or len(counts[j]) > len(counts[i]):
                continue
            dist, rinc = cmp_mats(counts[i], totals[i], counts[j],
                                  totals[j], 0, min_depth, 1, 0.0,
                                  veccmp)
            if dist in (-1.0, -2.0):
                # gates consume rows_inc; table must agree on it
                assert int(R[i, j]) >= 0
                continue
            assert int(R[i, j]) == rinc, (metric, i, j)
            assert dist == pytest.approx(float(S[i, j]), rel=2e-5,
                                         abs=2e-5), (metric, i, j)


@pytest.mark.parametrize("method", ["z", "l3", "nl3", "l4"])
def test_parameterized_metrics_match_host(method):
    """z (chi2-gated consensus), ln/nln (arbitrary n-norm): resolved
    via resolve_metric spec strings; z's gates are float-threshold
    comparisons, exact on this clear-cut data."""
    counts, totals = _samples(seed=4)
    k = len(counts)
    min_depth = 15
    spec = matdist_jax.resolve_metric(method, 0.05)
    assert spec is not None
    S, R = matdist_jax.pair_table(spec, counts, totals, min_depth)
    veccmp = get_veccmp(method, 0.05)
    for i in range(k):
        for j in range(k):
            if i == j or len(counts[j]) > len(counts[i]):
                continue
            dist, rinc = cmp_mats(counts[i], totals[i], counts[j],
                                  totals[j], 0, min_depth, 1, 0.0,
                                  veccmp)
            if dist in (-1.0, -2.0):
                continue
            assert int(R[i, j]) == rinc, (method, i, j)
            assert dist == pytest.approx(float(S[i, j]), rel=2e-5,
                                         abs=2e-5), (method, i, j)


def test_resolve_metric_rejects_unknown():
    assert matdist_jax.resolve_metric("bogus", 0.05) is None
    assert matdist_jax.resolve_metric("lx", 0.05) is None
    assert matdist_jax.resolve_metric("z", 0.01) == "z@0.01"


def test_sentinel_logic_matches_host():
    counts, totals = _samples(k=5, L=400, seed=3)
    min_depth, min_length, min_cov, norm = 15, 30, 0.5, 1000000
    S, R = matdist_jax.pair_table("cos", counts, totals, min_depth)
    veccmp = get_veccmp("cos")
    nnucs = [(t >= min_depth).sum() for t in totals]
    for i in range(5):
        for j in range(5):
            if i == j or len(counts[j]) > len(counts[i]):
                continue
            want = cmp_mats(counts[i], totals[i], counts[j], totals[j],
                            norm, min_depth, min_length, min_cov, veccmp)
            got = matdist_jax.cmp_mats_from_table(
                S, R, i, j, len(counts[i]), len(counts[j]),
                int(nnucs[j]), norm, min_depth, min_length, min_cov)
            assert got[1] == want[1] or want[0] in (-1.0, -2.0)
            if want[0] in (-1.0, -2.0):
                assert got[0] == want[0]
            else:
                assert got[0] == pytest.approx(want[0], rel=2e-5)
