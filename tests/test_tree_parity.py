"""Golden parity: tree subcommand output must be byte-identical to the
reference binary on its bundled 183-taxon matrix for every method, output
flag, and matrix dtype."""

import gzip

import numpy as np
import pytest

from .conftest import run_oracle, run_ours

METHODS = ["nj", "upgma", "cf", "ff", "mn", "hnj", "dnj"]


@pytest.mark.parametrize("method", METHODS)
@pytest.mark.parametrize("flag", [0, 1, 2, 3])
def test_method_flag_parity(oracle, test_phy, method, flag):
    args = ["tree", "-m", method, "-f", str(flag), "-i", str(test_phy)]
    assert run_ours(args) == run_oracle(oracle, args)


@pytest.mark.parametrize("method", ["nj", "upgma", "hnj", "dnj"])
@pytest.mark.parametrize("dt", [["-p"], ["-s"], ["-b"],
                                ["-s", "1e2"], ["-b", "64"]])
def test_dtype_parity(oracle, test_phy, method, dt):
    args = ["tree", "-m", method] + dt + ["-i", str(test_phy)]
    assert run_ours(args) == run_oracle(oracle, args)


# the reference aborts for precision >= 12 (formNode's fixed 32-byte
# slack overflows); compare only within its working range
@pytest.mark.parametrize("precision", [0, 3, 6, 11])
def test_precision_parity(oracle, test_phy, precision):
    args = ["tree", "-x", str(precision), "-i", str(test_phy)]
    assert run_ours(args) == run_oracle(oracle, args)


def test_multi_matrix_stream(oracle, test_phy, tmp_path):
    """Multiple matrices in one stream -> one Newick line each; name
    buffers are reused across matrices (phy.c:361-379)."""
    phy = gzip.decompress(test_phy.read_bytes())
    small = b"         4\na\nb\t1\nc\t2\t1\nd\t3\t2\t1\n"
    stream = small + phy + small
    p = tmp_path / "multi.phy"
    p.write_bytes(stream)
    args = ["tree", "-i", str(p)]
    assert run_ours(args) == run_oracle(oracle, args)


def test_comment_header(oracle, tmp_path):
    """'#template' comments re-emitted as '>template' (tree.c:101-103)."""
    m = b"#temp1\n         3\nx\ny\t0.5\nz\t0.25\t0.125\n"
    p = tmp_path / "h.phy"
    p.write_bytes(m)
    args = ["tree", "-i", str(p)]
    assert run_ours(args) == run_oracle(oracle, args)


def test_two_taxa(oracle, tmp_path):
    p = tmp_path / "two.phy"
    p.write_bytes(b"         2\na\nb\t0.5\n")
    args = ["tree", "-i", str(p)]
    assert run_ours(args) == run_oracle(oracle, args)


def test_missing_distances(oracle, tmp_path):
    """Negative cells are missing pairs; engines must skip them and close
    unresolvable nodes with limbless joins (nj.c:1594-1602)."""
    rng = np.random.RandomState(7)
    n = 12
    rows = []
    names = []
    for i in range(n):
        names.append(b"t%d" % i)
        vals = rng.rand(i) * 2
        miss = rng.rand(i) < 0.2
        vals[miss] = -1.0
        rows.append(b"t%d" % i + b"".join(
            b"\t%.6f" % v if v >= 0 else b"\t-1" for v in vals))
    phy = b"%10d\n" % n + b"\n".join(rows) + b"\n"
    p = tmp_path / "miss.phy"
    p.write_bytes(phy)
    for m in ["nj", "dnj", "hnj", "upgma"]:
        args = ["tree", "-m", m, "-i", str(p)]
        assert run_ours(args) == run_oracle(oracle, args), m


@pytest.mark.parametrize("n", [3, 4, 5, 8, 17, 33])
def test_random_sizes(oracle, tmp_path, n):
    rng = np.random.RandomState(n)
    rows = []
    for i in range(n):
        vals = rng.rand(i)
        rows.append(b"s%03d" % i + b"".join(b"\t%.8f" % v for v in vals))
    phy = b"%10d\n" % n + b"\n".join(rows) + b"\n"
    p = tmp_path / "r.phy"
    p.write_bytes(phy)
    for m in ["nj", "dnj", "hnj", "upgma", "cf", "ff", "mn"]:
        args = ["tree", "-m", m, "-i", str(p)]
        assert run_ours(args) == run_oracle(oracle, args), (m, n)


def test_integer_distances(oracle, tmp_path):
    """Integer-valued distances exercise the %d print rule downstream."""
    p = tmp_path / "int.phy"
    p.write_bytes(b"         4\na\nb\t4\nc\t8\t6\nd\t2\t4\t4\n")
    for m in ["nj", "dnj", "upgma"]:
        args = ["tree", "-m", m, "-i", str(p)]
        assert run_ours(args) == run_oracle(oracle, args)


def test_stdin_input(oracle, test_phy):
    data = test_phy.read_bytes()
    assert run_ours(["tree"], stdin=data) == run_oracle(
        oracle, ["tree"], stdin=data)


def test_mmap_matrix(oracle, tmp_path):
    """-H backs the matrix with an unlinked temp file; output is
    unchanged (ltdMatrixMinit, matrix.c:116)."""
    rng = __import__("numpy").random.RandomState(4)
    n = 12
    rows = []
    for i in range(n):
        rows.append(b"s%03d" % i
                    + b"".join(b"\t%.6f" % v for v in rng.rand(i)))
    p = tmp_path / "m.phy"
    p.write_bytes(b"%10d\n" % n + b"\n".join(rows) + b"\n")
    for m in ["dnj", "upgma"]:
        args = ["tree", "-m", m, "-H", "-T", str(tmp_path), "-i", str(p)]
        assert run_ours(args) == run_oracle(oracle, args)


def test_min_q_pair_batch_equals_seq():
    """The batched minQpair must follow min_q_pair_seq's trajectory
    bit-for-bit on tie-dense integer data, including the Q/P cache
    state it leaves behind."""
    import numpy as np
    from ccphylo_tpu.tree import exact as ex

    n = 700
    rng = np.random.RandomState(42)
    flat = rng.randint(0, 25, n * (n - 1) // 2).astype(np.float64)

    def records(qpair):
        st = ex.TreeState(flat.copy(), n, "b", 1.0)
        ex.METHODS["dnj"]["init"](st)
        update = ex.METHODS["dnj"]["update"]
        pop = ex.METHODS["dnj"]["pop"]
        j = ex.min_q(st)[0]
        out = []
        while st.n != 2:
            i, j2 = qpair(st, j)
            if i == 0 and j2 == 0:
                break
            out.append((i, j2))
            Li, Lj = ex.limb_length(i, j2, st.sD, st.N,
                                    ex._d_ij(st, i, j2), False)
            mi = update(st, i, j2, Li, Lj)
            mj = pop(st, i)
            if mj == st.n:
                j = mi
            elif mi == st.n:
                j = mj
            else:
                j = ex.min_pos(st.Q, mi, mj)
        return out, st.Q.copy(), st.P.copy()

    ra, qa, pa = records(ex.min_q_pair_seq)
    rb, qb, pb = records(ex.min_q_pair)
    assert ra == rb
    np.testing.assert_array_equal(qa, qb)
    np.testing.assert_array_equal(pa, pb)
