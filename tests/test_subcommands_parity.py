"""Golden parity for fullphy/phycmp/dbscan/union/merge/nwck2phy/rarify/
tsv2phy against the reference binary."""

import gzip
import subprocess
import sys

import numpy as np
import pytest

from .conftest import REPO


def _run(cmd, cwd, timeout=300):
    res = subprocess.run(cmd, capture_output=True, cwd=cwd,
                         timeout=timeout,
                         env={"PYTHONPATH": str(REPO),
                              "PATH": "/usr/bin:/bin"})
    return res


def _both(oracle, args, cwd):
    r = _run([str(oracle)] + args, cwd)
    o = _run([sys.executable, "-m", "ccphylo_tpu"] + args, cwd)
    assert r.returncode == o.returncode, (r.stderr, o.stderr)
    return r.stdout, o.stdout


@pytest.fixture(scope="module")
def work(tmp_path_factory, test_phy):
    d = tmp_path_factory.mktemp("sub")
    (d / "test.phy").write_bytes(gzip.decompress(test_phy.read_bytes()))
    # perturbed copy for phycmp
    rng = np.random.RandomState(0)
    lines = (d / "test.phy").read_bytes().decode().strip().split("\n")
    out = [lines[0]]
    for ln in lines[1:]:
        parts = ln.split("\t")
        vals = [f"{float(v) * rng.uniform(0.9, 1.1):.6f}"
                for v in parts[1:]]
        out.append("\t".join([parts[0]] + vals))
    (d / "pert.phy").write_text("\n".join(out) + "\n")
    # res files
    rng = np.random.RandomState(5)
    header = (b"#Template\tScore\tExpected\tTemplate_length\t"
              b"Template_Identity\tTemplate_Coverage\tQuery_Identity\t"
              b"Query_Coverage\tDepth\tq_value\tp_value\n")
    tpls = [b"tplA", b"tplB", b"tplC", b"tplD gene1", b"tplE"]
    for s in range(4):
        rows = [header]
        for t in tpls:
            if rng.rand() < 0.75:
                cov = rng.uniform(20, 100)
                rows.append(b"%s\t%d\t%d\t%d\t%.2f\t%.2f\t%.2f\t%.2f\t"
                            b"%.2f\t%.1f\t1.0e-10\n"
                            % (t, rng.randint(100, 10**5),
                               rng.randint(1, 100),
                               rng.randint(500, 5000),
                               rng.uniform(80, 100), cov,
                               rng.uniform(80, 100), cov,
                               rng.uniform(0.5, 60),
                               rng.uniform(10, 1000)))
        (d / f"r{s}.res").write_bytes(b"".join(rows))
    # tsv
    rng = np.random.RandomState(2)
    rows = ["\t".join(f"c{i}" for i in range(6))]
    for _ in range(10):
        rows.append("\t".join(f"{v:.3f}" for v in rng.rand(6) * 50))
    (d / "t.tsv").write_text("\n".join(rows) + "\n")
    return d


@pytest.mark.parametrize("extra", [[], ["-f", "0"], ["-x", "3"],
                                   ["-s", "1e2"], ["-p"]])
def test_fullphy(oracle, work, extra):
    r, o = _both(oracle, ["fullphy", "-i", "test.phy"] + extra, work)
    assert o == r


@pytest.mark.parametrize("extra", [["-f", "127"], ["-f", "127", "-s", "1e2"],
                                   ["-f", "127", "-b", "8"],
                                   ["-f", "127", "-p"]])
def test_phycmp(oracle, work, extra):
    r, o = _both(oracle, ["phycmp", "-i", "test.phy", "pert.phy"]
                 + extra, work)
    assert o == r


@pytest.mark.parametrize("extra", [[], ["-e", "0.05"],
                                   ["-e", "0.02", "-N", "3"],
                                   ["-s", "1e2"]])
def test_dbscan(oracle, work, extra):
    r, o = _both(oracle, ["dbscan", "-i", "test.phy"] + extra, work)
    assert o == r


@pytest.mark.parametrize("extra", [[], ["-E", "15"], ["-C", "30"],
                                   ["-L", "2000"]])
def test_union(oracle, work, extra):
    r, o = _both(oracle, ["union", "-i", "r0.res", "r1.res", "r2.res",
                          "r3.res"] + extra, work)
    assert o == r


@pytest.mark.parametrize("extra", [[], ["-f", "5"], ["-x", "3"],
                                   ["-s", "1e2"], ["-b", "16"], ["-p"]])
def test_nwck2phy(oracle, work, extra):
    tree = _run([str(oracle), "tree", "-i", "test.phy"], work).stdout
    (work / "t.nwck").write_bytes(
        tree + b"(A:0.1,(B:0.2,C:0.3):0.05,D:0.4);\n>t2(X:1,Y:2);\n")
    r, o = _both(oracle, ["nwck2phy", "-i", "t.nwck"] + extra, work)
    assert o == r


def test_merge(oracle, work):
    # build a multi-matrix stream by concatenating two small matrices
    # with overlapping names
    m1 = b"         3\na\nb\t1.5\nc\t2.25\t0.75\n"
    m2 = b"         3\nb\nc\t2.5\nd\t1.25\t3.5\n"
    n1 = b"         3\na\nb\t100\nc\t200\t300\n"
    n2 = b"         3\nb\nc\t50\nd\t150\t250\n"
    (work / "m.phy").write_bytes(m1 + m2)
    (work / "m.num").write_bytes(n1 + n2)
    _run([str(oracle), "merge", "-i", "m.phy", "-w", "m.num",
          "-o", "ref.phy", "-n", "ref.num"], work)
    _run([sys.executable, "-m", "ccphylo_tpu", "merge", "-i", "m.phy",
          "-w", "m.num", "-o", "out.phy", "-n", "out.num"], work)
    assert (work / "out.phy").read_bytes() == (work / "ref.phy").read_bytes()
    assert (work / "out.num").read_bytes() == (work / "ref.num").read_bytes()
    r, o = _both(oracle, ["merge", "-i", "m.phy"], work)
    assert o == r


@pytest.mark.parametrize("extra", [["-A", "1000", "-R", "100"],
                                   ["-A", "7", "-R", "3"]])
def test_rarify(oracle, work, extra):
    mat = (b"#tpl1\n"
           b"A\t30\t1\t0\t2\t0\t0\n"
           b"C\t0\t25\t0\t0\t1\t0\n"
           b"-\t0\t0\t0\t0\t0\t12\n"
           b"T\t0\t0\t1\t40\t0\t0\n\n")
    (work / "s.mat").write_bytes(mat)
    r, o = _both(oracle, ["rarify", "-i", "s.mat"] + extra, work)
    assert o == r


@pytest.mark.parametrize("extra", [[], ["-d", "bc"], ["-d", "l1"],
                                   ["-d", "l2"], ["-d", "linf"],
                                   ["-d", "p"], ["-d", "chi2"],
                                   ["-d", "l3"], ["-p"], ["-s", "1e2"],
                                   ["-b", "16"], ["-p", "-d", "l2"]])
def test_tsv2phy(oracle, work, extra):
    r, o = _both(oracle, ["tsv2phy", "-i", "t.tsv"] + extra, work)
    assert o == r
