"""Parity tests: native C++ runtime kernels vs the pure-Python paths.

Every native function must produce byte-identical results to the Python
implementation it accelerates (which is itself oracle-tested); these
tests fuzz both paths against each other.
"""

import io
import os
import random

import numpy as np
import pytest

from ccphylo_tpu import native
from ccphylo_tpu.io import phylip
from ccphylo_tpu.io.qseqs import Name


pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library unavailable")


def _python_stream(data, **kw):
    """A PhylipStream forced down the Python row loop."""
    st = phylip.PhylipStream(data, **kw)
    st._load_native = lambda *a, **k: None
    return st


def _rand_phy(rng, n, *, ints=False, full=False, quotes=False,
              header=False, blanks=False):
    lines = []
    if header:
        lines.append(b"#tmpl_" + str(n).encode())
    lines.append(b"%10d" % n)
    for i in range(n):
        nm = f"s{i}_{rng.randint(0, 999)}"
        if quotes and rng.random() < 0.5:
            nm = f'"{nm}"'
        row = [nm.encode()]
        ncell = (n - 1) if full else i
        for j in range(ncell):
            if ints and rng.random() < 0.3:
                row.append(str(rng.randint(0, 50)).encode())
            else:
                row.append(f"{rng.random() * 10:.9f}".encode())
            if blanks and rng.random() < 0.1:
                row.append(b"")  # empty field, skipped by the parser
        lines.append(b"\t".join(row))
    return b"\n".join(lines) + b"\n"


@pytest.mark.parametrize("seed", range(8))
def test_phy_body_fuzz(seed):
    rng = random.Random(seed)
    n = rng.randint(2, 40)
    data = _rand_phy(rng, n,
                     ints=seed % 2 == 0,
                     full=seed % 3 == 0,
                     quotes=seed % 4 == 1,
                     header=seed % 2 == 1,
                     blanks=True)
    a = phylip.PhylipStream(data).load()
    b = _python_stream(data).load()
    assert a[0] == b[0]
    np.testing.assert_array_equal(a[1], b[1])
    assert [bytes(x) for x in a[2][:n]] == [bytes(x) for x in b[2][:n]]
    assert a[3] == b[3]


def test_phy_body_multimatrix_and_name_capacity():
    rng = random.Random(99)
    data = _rand_phy(rng, 5) + _rand_phy(rng, 8, header=True)
    sa = phylip.PhylipStream(data)
    sb = _python_stream(data)
    for _ in range(2):
        a, b = sa.load(), sb.load()
        assert a[0] == b[0]
        np.testing.assert_array_equal(a[1], b[1])
        names_a = [(bytes(x), x.cap) for x in a[2][:a[0]]]
        names_b = [(bytes(x), x.cap) for x in b[2][:b[0]]]
        assert names_a == names_b
    assert sa.load() is None and sb.load() is None
    assert sa.pos == sb.pos


def test_phy_body_quote_mode():
    rng = random.Random(3)
    data = _rand_phy(rng, 6)
    a = phylip.PhylipStream(data, quotes=b'"').load()
    b = _python_stream(data, quotes=b'"').load()
    assert [bytes(x) for x in a[2][:6]] == [bytes(x) for x in b[2][:6]]


def test_phy_body_error_fallback():
    # malformed distance: native returns an error, stream falls back to
    # the Python loop and raises the reference-text exception
    data = b"%10d\nA\nB\tnotanumber\n" % 2
    with pytest.raises(phylip.PhylipParseError):
        phylip.PhylipStream(data).load()


@pytest.mark.parametrize("precision", [0, 1, 9, 17])
def test_fmt_cells_fuzz(precision):
    rng = np.random.RandomState(precision)
    vals = np.concatenate([
        rng.uniform(-1e6, 1e6, 200),
        rng.randint(-1000, 1000, 100).astype(np.float64),
        np.array([0.0, -0.0, 1e-12, 2.0**62, -2.0**62, 2.0**63,
                  -2.0**63, 1e300, 0.5, 1.5]),
    ])
    got = phylip._fmt_cells(vals, precision)
    want = b"".join(phylip._fmt_value(float(d), precision) for d in vals)
    assert got == want


def test_print_phy_native_matches_python(monkeypatch):
    rng = random.Random(5)
    n = 12
    flat = np.random.RandomState(5).uniform(0, 9, n * (n - 1) // 2)
    flat[::4] = np.floor(flat[::4])
    names = [Name(f"n{i}".encode(), 32) for i in range(n)]
    out_a = io.BytesIO()
    phylip.print_phy(out_a, n, flat, names)
    out_b = io.BytesIO()
    monkeypatch.setattr(phylip.native, "get_lib", lambda: None)
    phylip.print_phy(out_b, n, flat, names)
    assert out_a.getvalue() == out_b.getvalue()


def test_print_full_phy_native_matches_python(monkeypatch):
    n = 9
    flat = np.random.RandomState(7).uniform(0, 9, n * (n - 1) // 2)
    names = [Name(f"n{i}".encode(), 32) for i in range(n)]
    out_a = io.BytesIO()
    phylip.print_full_phy(out_a, n, flat, names)
    out_b = io.BytesIO()
    monkeypatch.setattr(phylip.native, "get_lib", lambda: None)
    phylip.print_full_phy(out_b, n, flat, names)
    assert out_a.getvalue() == out_b.getvalue()


def test_mat_rows_parity():
    from ccphylo_tpu.io import kma
    rng = random.Random(11)
    lines = []
    for _ in range(500):
        ref = rng.choice("ACGT-")
        vals = [rng.randint(0, 70000) for _ in range(6)]
        lines.append(ref.encode() + b"\t"
                     + b"\t".join(str(v).encode() for v in vals))
    block = b"\n".join(lines) + b"\n"
    a = kma._parse_rows_native(block)
    assert a is not None
    import numpy as _np

    def py(block):
        orig = kma._parse_rows_native
        kma._parse_rows_native = lambda b: None
        try:
            return kma._parse_rows(block)
        finally:
            kma._parse_rows_native = orig

    b = py(block)
    _np.testing.assert_array_equal(a[0], b[0])
    _np.testing.assert_array_equal(a[1], b[1])
    _np.testing.assert_array_equal(a[2], b[2])
    # blank line terminates the entry in both paths
    block2 = block + b"\nA\t1\t2\t3\t4\t5\t6\n"
    a2 = kma._parse_rows(block2)
    b2 = py(block2)
    assert len(a2[0]) == len(b2[0]) == 500


def test_nonwhitespace_separator_name_parity():
    """A non-whitespace separator joins the name (loadPhy copies the
    terminator before the isspace chomp, phy.c:409-435)."""
    data = b"%10d\nA,\nB,1.5\nC,2.5,3.5\n" % 3
    a = phylip.PhylipStream(data, sep=b",").load()
    b = _python_stream(data, sep=b",").load()
    names_a = [bytes(x) for x in a[2][:3]]
    assert names_a == [bytes(x) for x in b[2][:3]]
    assert names_a == [b"A,", b"B,", b"C,"]
    np.testing.assert_array_equal(a[1], b[1])


def test_fmt_cells_nonfinite_falls_back():
    """inf/nan cells raise identically with and without the native lib
    (Python int(inf) raises OverflowError in the int-print check)."""
    vals = np.array([1.0, np.inf])
    with pytest.raises(OverflowError):
        phylip._fmt_cells(vals, 9)
    with pytest.raises(ValueError):
        phylip._fmt_cells(np.array([np.nan]), 9)


def test_mat_rows_empty_field_falls_back():
    """An empty count field raises ValueError on both paths (int(b''))."""
    from ccphylo_tpu.io import kma
    block = b"C\t\t10\t0\t0\t0\t0\n"
    assert kma._parse_rows_native(block) is None
    with pytest.raises(ValueError):
        kma._parse_rows(block)
