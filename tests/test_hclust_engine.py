"""Device heuristic/UPGMA-family engines vs the host exact engine.

tree/hclust_engine.py runs upgma/ff/cf/hnj/nj/mn join loops on device.
With float64 compute on the CPU backend, integer (SNP-like) distances
make every sum exact, so the join records — and therefore the Newick
bytes — must match the host engine (tree/exact.py, itself oracle-tested
against the reference binary) exactly, tie rules included.
"""

import io
import subprocess
import sys

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from .conftest import REPO  # noqa: E402
from ccphylo_tpu.io.phylip import print_phy  # noqa: E402
from ccphylo_tpu.io.qseqs import Name  # noqa: E402
from ccphylo_tpu.tree.exact import build_tree  # noqa: E402

METHODS = ["upgma", "ff", "cf", "hnj", "nj", "mn"]


def _names(n):
    return [Name(b"t%04d" % i, 48) for i in range(n)]


def _device_tree(flat, n, method, flag=0, names=None):
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    from ccphylo_tpu.tree.hclust_engine import build_tree_hclust
    return build_tree_hclust(flat.copy(), n,
                             names if names is not None else _names(n),
                             method=method, flag=flag,
                             dtype=jnp.float64)


def _int_matrix(n, seed, lo=0, hi=500):
    rng = np.random.RandomState(seed)
    return rng.randint(lo, hi, n * (n - 1) // 2).astype(np.float64)


@pytest.mark.parametrize("method", METHODS)
def test_tie_dense_parity(method):
    """Small-range integers force constant tie-breaking decisions."""
    n = 97
    flat = _int_matrix(n, 7, 0, 25)
    host = build_tree(flat.copy(), n, _names(n), method=method)
    dev = _device_tree(flat, n, method)
    assert dev == host


@pytest.mark.parametrize("method", METHODS)
def test_wide_range_parity(method):
    n = 160
    flat = _int_matrix(n, 11, 0, 10_000)
    host = build_tree(flat.copy(), n, _names(n), method=method)
    dev = _device_tree(flat, n, method)
    assert dev == host


@pytest.mark.parametrize("method", ["upgma", "hnj", "nj"])
def test_neg_limbs_flag(method):
    n = 80
    flat = _int_matrix(n, 3, 0, 60)
    host = build_tree(flat.copy(), n, _names(n), method=method, flag=2)
    dev = _device_tree(flat, n, method, flag=2)
    assert dev == host


@pytest.mark.parametrize("method", METHODS)
@pytest.mark.parametrize("drop", [0.02, 0.12])
def test_missing_cells_parity(method, drop):
    """Sparse -1 (missing) cells: one-sided updateD fallbacks, the
    non-advancing sD/N walker targets (both-missing cells), the
    out-of-row garbage read of nj.c:1022, and the FF row rebuild's
    no-validity-check quirk.  The 12% rate makes both-missing pairs and
    column-part only_j cells frequent."""
    n = 64
    flat = _int_matrix(n, 19, 1, 40)
    rng = np.random.RandomState(5)
    sel = rng.rand(len(flat)) < drop
    flat[sel] = -1.0
    host = build_tree(flat.copy(), n, _names(n), method=method)
    dev = _device_tree(flat, n, method)
    assert dev == host


def test_float_data_sumless_methods_byte_exact(test_phy):
    """On real float data (test.phy.gz), methods whose picks avoid
    sums entirely (raw-distance caches: upgma, cf; max-Q scan: mn)
    must still match the host engine byte-for-byte."""
    import gzip

    from ccphylo_tpu.io.phylip import PhylipStream

    data = gzip.decompress(test_phy.read_bytes())
    n, flat, names, _ = PhylipStream(data).load()
    for method in ("upgma", "cf", "mn"):
        na = [Name(nm.data, nm.cap) for nm in names]
        nb = [Name(nm.data, nm.cap) for nm in names]
        host = build_tree(flat.copy(), n, na, method=method)
        dev = _device_tree(np.asarray(flat), n, method, names=nb)
        assert dev == host, method


def test_cli_device_routing(tmp_path):
    """CCPHYLO_TPU_ENGINE=device64 routes every family method through
    the device engine with byte parity at the CLI level."""
    n = 90
    flat = _int_matrix(n, 23, 0, 200)
    buf = io.BytesIO()
    print_phy(buf, n, flat, _names(n))
    phy = tmp_path / "m.phy"
    phy.write_bytes(buf.getvalue())

    def run(extra_env, method):
        env = {"PYTHONPATH": str(REPO), "PATH": "/usr/bin:/bin",
               "JAX_PLATFORMS": "cpu"}
        env.update(extra_env)
        res = subprocess.run(
            [sys.executable, "-m", "ccphylo_tpu", "tree", "-m", method,
             "-i", str(phy)], capture_output=True, cwd=tmp_path,
            timeout=600, env=env)
        assert res.returncode == 0, res.stderr.decode(errors="replace")
        return res.stdout

    for method in ("upgma", "cf", "hnj", "mn"):
        host = run({}, method)
        dev = run({"CCPHYLO_TPU_ENGINE": "device64"}, method)
        assert dev == host, method
