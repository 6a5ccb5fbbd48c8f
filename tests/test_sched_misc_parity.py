"""Golden parity for makespan / seq2fasta / union -B, plus a
regression test for tsv2nwck (whose reference binary never terminates
— see tsv2nwck_cmd.py docstring)."""

import subprocess
import sys

import numpy as np
import pytest

from .conftest import ORACLE_DIR, REPO


def _run(cmd, cwd, timeout=300, stdin=b""):
    return subprocess.run(cmd, input=stdin, capture_output=True, cwd=cwd,
                          timeout=timeout,
                          env={"PYTHONPATH": str(REPO),
                               "PATH": "/usr/bin:/bin"})


def _both(oracle, args, cwd):
    r = _run([str(oracle)] + args, cwd)
    o = _run([sys.executable, "-m", "ccphylo_tpu"] + args, cwd)
    assert r.returncode == o.returncode, (r.stderr, o.stderr)
    return r, o


def _write_kma_db(d, name, seqs, names):
    """Emit .length.b/.seq.b/.name in KMA index layout (template 0 is
    a placeholder; base j of a template sits at bits 62-2j of its u64
    words — seq2fasta.c:29-94)."""
    code = {65: 0, 67: 1, 71: 2, 84: 3}
    db_size = len(seqs) + 1
    lengths = np.zeros(db_size, np.int32)
    lengths[0] = 0  # slot 0 is overwritten with db_size on load
    words_all = []
    for i, s in enumerate(seqs, 1):
        lengths[i] = len(s)
        nwords = (len(s) >> 5) + 1
        w = np.zeros(nwords, np.uint64)
        for j, b in enumerate(s):
            w[j >> 5] |= np.uint64(code[b]) << np.uint64(62 - 2 * (j & 31))
        words_all.append(w)
    with open(d / f"{name}.length.b", "wb") as fh:
        # file = DB_size, then DB_size ints (slot 0 a placeholder that
        # getLengths overwrites with DB_size — seq2fasta.c:38-44)
        np.int32(db_size).tofile(fh)
        lengths.tofile(fh)
    with open(d / f"{name}.seq.b", "wb") as fh:
        for w in words_all:
            w.tofile(fh)
    (d / f"{name}.name").write_bytes(b"\n".join(names) + b"\n")


@pytest.fixture(scope="module")
def work(tmp_path_factory):
    d = tmp_path_factory.mktemp("sched")
    rng = np.random.RandomState(11)
    # jobs tsv: id, size, cluster, class-weight, class-number
    rows = [b"#id\tsize\tcluster\tw\tcls"]
    for i in range(60):
        rows.append(b"%d\t%d\t%d\t%.2f\t%d"
                    % (i, rng.randint(1, 50), rng.randint(0, 12),
                       rng.uniform(0.5, 9.0), rng.randint(0, 3)))
    (d / "jobs.tsv").write_bytes(b"\n".join(rows) + b"\n")
    # res files sharing template names with the db below
    header = (b"#Template\tScore\tExpected\tTemplate_length\t"
              b"Template_Identity\tTemplate_Coverage\tQuery_Identity\t"
              b"Query_Coverage\tDepth\tq_value\tp_value\n")
    tpls = [b"tplA", b"tplB", b"tplC", b"tplD", b"tplE"]
    rng = np.random.RandomState(7)
    for s in range(4):
        out = [header]
        for t in tpls:
            if rng.rand() < 0.7:
                cov = rng.uniform(20, 100)
                out.append(b"%s\t%d\t%d\t%d\t%.2f\t%.2f\t%.2f\t%.2f\t"
                           b"%.2f\t%.1f\t1.0e-10\n"
                           % (t, rng.randint(100, 10**5),
                              rng.randint(1, 100),
                              rng.randint(500, 5000),
                              rng.uniform(80, 100), cov,
                              rng.uniform(80, 100), cov,
                              rng.uniform(0.5, 60),
                              rng.uniform(10, 1000)))
        (d / f"r{s}.res").write_bytes(b"".join(out))
    seqs = []
    for t in tpls:
        n = int(rng.randint(40, 120))
        seqs.append(bytes(rng.choice(list(b"ACGT"), n).tolist()))
    _write_kma_db(d, "db", seqs, tpls)
    return d


MK_COMBOS = [
    [],
    ["-m", "DFF"], ["-m", "DBE"], ["-m", "DFE"],
    ["-t", "DBEB"], ["-t", "None"],
    ["-w", "log2"], ["-w", "pow1.5"], ["-w", "expe"],
    ["-l", "3"], ["-l", "2.0,1.0,1.5"],
    ["-c", "4,5", "-l", "3"],          # multivariate weights
    ["-c", "5", "-l", "3"],            # class-number column
    # NOTE: "-c 4,5" with the default 5 machines never terminates in
    # the reference (its MV trade loop cycles) — ours faithfully
    # cycles too, so MV combos here pin the machine count.
    ["-c", "4,5", "-m", "DBE", "-l", "3"],
    ["-c", "4,5", "-t", "DBEB", "-l", "3"],
]


@pytest.mark.parametrize("extra", MK_COMBOS)
def test_makespan(oracle, work, extra):
    r, o = _both(oracle, ["makespan", "-i", "jobs.tsv"] + extra, work)
    assert o.stdout == r.stdout
    assert o.stderr == r.stderr  # trades + stats report


def test_makespan_split_outputs(oracle, work):
    _run([str(oracle), "makespan", "-i", "jobs.tsv", "-o", "rj.tsv",
          "-O", "rm.tsv"], work)
    _run([sys.executable, "-m", "ccphylo_tpu", "makespan", "-i",
          "jobs.tsv", "-o", "oj.tsv", "-O", "om.tsv"], work)
    assert (work / "oj.tsv").read_bytes() == (work / "rj.tsv").read_bytes()
    assert (work / "om.tsv").read_bytes() == (work / "rm.tsv").read_bytes()


@pytest.fixture(scope="module")
def s2f_oracle(oracle):
    """seq2fasta has no dispatch in the reference main.c; link its
    entry point from the oracle's static lib."""
    shim = ORACLE_DIR / "s2f_shim.c"
    binary = ORACLE_DIR / "s2f_ref"
    if not binary.exists():
        shim.write_text(
            "int seq2fasta_main(int argc, char *argv[]);\n"
            "int main(int argc, char *argv[]) "
            "{ return seq2fasta_main(argc, argv); }\n")
        r = subprocess.run(
            ["gcc", "-O2", "-o", str(binary), str(shim),
             str(ORACLE_DIR / "libccphylo.a"), "-lm", "-lpthread", "-lz"],
            capture_output=True)
        if r.returncode:
            pytest.skip("cannot link seq2fasta oracle")
    return binary


@pytest.mark.parametrize("extra", [[], ["-seqs", "2,4"], ["-seqs", "1"]])
def test_seq2fasta(s2f_oracle, work, extra):
    r = _run([str(s2f_oracle), "-t_db", "db"] + extra, work)
    o = _run([sys.executable, "-m", "ccphylo_tpu", "seq2fasta",
              "-t_db", "db"] + extra, work)
    assert o.returncode == r.returncode
    assert o.stdout == r.stdout


@pytest.mark.parametrize("extra", [[], ["-E", "15"]])
def test_union_db_order(oracle, work, extra):
    """union -B without -o writes a literal file named "-": the
    reference's stdout sentinel in that path is "--" (union.c:111)."""
    dash = work / "-"
    r = _run([str(oracle), "union", "-i", "r0.res", "r1.res", "r2.res",
              "r3.res", "-B", "db"] + extra, work)
    assert r.stdout == b""
    ref_bytes = dash.read_bytes()
    dash.unlink()
    o = _run([sys.executable, "-m", "ccphylo_tpu", "union", "-i",
              "r0.res", "r1.res", "r2.res", "r3.res", "-B", "db"]
             + extra, work)
    assert o.returncode == r.returncode
    assert o.stdout == b""
    assert dash.read_bytes() == ref_bytes
    dash.unlink()


@pytest.mark.parametrize("extra", [[], ["-E", "15"]])
def test_union_db_order_o(oracle, work, extra):
    _run([str(oracle), "union", "-i", "r0.res", "r1.res", "r2.res",
          "r3.res", "-B", "db", "-o", "rb.tsv"] + extra, work)
    _run([sys.executable, "-m", "ccphylo_tpu", "union", "-i", "r0.res",
          "r1.res", "r2.res", "r3.res", "-B", "db", "-o", "ob.tsv"]
         + extra, work)
    assert (work / "ob.tsv").read_bytes() == (work / "rb.tsv").read_bytes()


def test_union_ref_fasta(oracle, work):
    _run([str(oracle), "union", "-i", "r0.res", "r1.res", "r2.res",
          "r3.res", "-B", "db", "-r", "ref.fsa", "-o", "ru.tsv"], work)
    ref_fsa = (work / "ref.fsa").read_bytes()
    (work / "ref.fsa").unlink()
    _run([sys.executable, "-m", "ccphylo_tpu", "union", "-i", "r0.res",
          "r1.res", "r2.res", "r3.res", "-B", "db", "-r", "ref.fsa",
          "-o", "ou.tsv"], work)
    assert (work / "ou.tsv").read_bytes() == (work / "ru.tsv").read_bytes()
    assert (work / "ref.fsa").read_bytes() == ref_fsa


def test_tsv2nwck_regression(work):
    """The reference's tsv2nwck never terminates on any input (its
    updateQP never requeues joined rows), so there is no oracle to
    diff against; pin our implementation's output instead."""
    tsv = (b"a\tb\tc\n"
           b"1.0\t2.0\t3.0\n"
           b"1.1\t2.1\t3.1\n"
           b"9.0\t1.0\t0.5\n"
           b"1.05\t2.05\t3.05\n")
    (work / "nn.tsv").write_bytes(tsv)
    o = _run([sys.executable, "-m", "ccphylo_tpu", "tsv2nwck", "-i",
              "nn.tsv"], work)
    assert o.returncode == 0
    out = o.stdout
    assert out.endswith(b";\n")
    # all four leaf labels present, deterministic
    for leaf in (b"0", b"1", b"2", b"3"):
        assert leaf in out
    o2 = _run([sys.executable, "-m", "ccphylo_tpu", "tsv2nwck", "-i",
               "nn.tsv"], work)
    assert o2.stdout == out
