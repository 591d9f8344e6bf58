"""Aux subsystems: checkpoint/resume, throughput meter, CLI extensions."""

import os

import numpy as np
import pytest

from ngsdist_tpu import cli, runner
from ngsdist_tpu.config import Params
from ngsdist_tpu.utils import checkpoint as ckpt
from ngsdist_tpu.utils.profiling import Throughput


def _write_gt(path, rng, S, N):
    import gzip

    g = rng.integers(-1, 3, size=(S, N))
    with gzip.open(path, "wt") as fh:
        for s in range(S):
            fh.write("\t".join(str(int(x)) for x in g[s]) + "\n")


def _pars(data, out, **kw):
    base = dict(in_geno=data, n_ind=8, n_sites=60, out=out, seed=11,
                n_boot_rep=3, boot_block_size=5, verbose=0)
    base.update(kw)
    return Params(**base)


@pytest.fixture()
def gt_file(tmp_path):
    path = str(tmp_path / "gt.geno.gz")
    _write_gt(path, np.random.default_rng(0), 60, 8)
    return path


def test_checkpoint_resume_identical_output(gt_file, tmp_path):
    out_full = str(tmp_path / "full.dist")
    runner.run(_pars(gt_file, out_full), engine="exact")
    assert not os.path.exists(ckpt.state_path(out_full))  # cleared on success

    # Simulate an interrupted run: write only the first 2 matrices.
    out_part = str(tmp_path / "part.dist")
    pars = _pars(gt_file, out_part)
    with open(out_part, "w") as fh:
        mats = runner.run(_pars(gt_file, str(tmp_path / "x.dist")), engine="exact")
        from ngsdist_tpu.io import writers
        from ngsdist_tpu.io.readers import default_labels

        for m in mats[:2]:
            writers.write_dist_matrix(fh, default_labels(8), m)
    ckpt.save(out_part, pars, 2, engine="exact")

    runner.run(_pars(gt_file, out_part), engine="exact", resume=True)
    assert open(out_part).read() == open(out_full).read()


def test_checkpoint_fingerprint_mismatch_ignored(gt_file, tmp_path):
    out = str(tmp_path / "o.dist")
    pars = _pars(gt_file, out)
    open(out, "w").write("stale")
    ckpt.save(out, _pars(gt_file, out, seed=999), 2)  # different fingerprint
    assert ckpt.load(out, pars) is None


def test_resume_refuses_engine_switch(gt_file, tmp_path):
    """Interrupt a jax-engine run, `--resume --engine exact`: the
    fingerprint embeds the numeric environment (resolved engine +
    jax backend platform + x64), so the mismatched sidecar is ignored
    and the output is REWRITTEN from replicate 0 — never mixed-precision
    matrices appended to the old file (VERDICT r2 weak item 4; append
    semantics /root/reference/ngsDist.cpp:282-287)."""
    out = str(tmp_path / "o.dist")
    pars = _pars(gt_file, out)
    sentinel = "JAX-PRECISION-MATRICES\n"
    open(out, "w").write(sentinel)
    ckpt.save(out, pars, 2, engine="jax")  # interrupted jax-engine run
    # the exact engine sees no resumable state...
    assert ckpt.load(out, pars, engine="exact") is None
    # ...and a jax resume under the same backend config does
    assert ckpt.load(out, pars, engine="jax") == 2
    runner.run(_pars(gt_file, out), engine="exact", resume=True)
    content = open(out).read()
    assert sentinel not in content  # restarted from scratch, not appended
    n_mats = content.count("\n") // 9  # 8 label rows + count line per matrix
    assert n_mats == 4  # full dataset + 3 replicates, all recomputed


def test_throughput_meter():
    m = Throughput(n_pairs=10)
    m.update(100)
    m.update(100)
    assert m.updates == 2000
    assert m.replicates == 2
    assert m.rate > 0


def test_cli_ext_flags_parse():
    pars, extras = cli.parse_args(
        ["--geno", "x.gz", "--n_ind", "4", "--n_sites", "10", "--out", "y",
         "--engine", "exact", "--resume", "--throughput", "--devices", "2"]
    )
    assert extras["engine"] == "exact"
    assert extras["resume"] is True
    assert extras["throughput"] is True
    assert extras["devices"] == "2"
    assert pars.n_ind == 4


def test_cli_throughput_runs(gt_file, tmp_path, capsys):
    out = str(tmp_path / "t.dist")
    rc = cli.main(
        ["--geno", gt_file, "--n_ind", "8", "--n_sites", "60", "--out", out,
         "--verbose", "0", "--engine", "exact", "--throughput"]
    )
    assert rc == 0
    err = capsys.readouterr().err
    assert "Throughput:" in err


def test_read_pos_dist():
    from ngsdist_tpu.io.readers import read_pos_dist

    rows = [["chr1", "100"], ["chr1", "150"], ["chr2", "10"], ["chr2", "11"]]
    d = read_pos_dist(rows, 4)
    assert d[0] == 100.0  # first site: distance from prev_pos=0 (reference)
    assert d[1] == 50.0
    assert d[2] == np.inf  # chromosome change
    assert d[3] == 1.0


def test_read_pos_dist_invalid_distance():
    from ngsdist_tpu.config import NgsDistError
    from ngsdist_tpu.io.readers import read_pos_dist

    with pytest.raises(NgsDistError):
        read_pos_dist([["c", "5"], ["c", "5"]], 2)  # distance 0 < 1


def test_read_pos_dist_prevalidation():
    """Reference order (read_data.cpp:165-218): EXACTLY n_sites kept
    rows with >= 2 columns are required BEFORE any row is scanned — a
    bad-distance row must not be reached when the count is wrong."""
    from ngsdist_tpu.config import NgsDistError
    from ngsdist_tpu.io.readers import read_pos_dist

    with pytest.raises(NgsDistError, match="wrong number of lines"):
        read_pos_dist([["c", "5"], ["c", "5"], ["c", "5"]], 2)
    with pytest.raises(NgsDistError, match="wrong number of lines"):
        read_pos_dist([["c", "5"]], 2)
    with pytest.raises(NgsDistError, match="wrong POS file format"):
        read_pos_dist([["c"], ["c"]], 2)


def _subproc_env():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in [repo] + os.environ.get("PYTHONPATH", "").split(os.pathsep)
        if p)
    return env


def test_stdin_binary_routes_through_native_reader(tmp_path):
    """`--geno -` (stdin is always BINARY, config.finalize like the
    reference) takes the same native threaded parse as files
    (nd_read_geno gzdopen's fd 0, reference gen_func.cpp:208-223): the
    CLI run with the input piped on stdin must be byte-identical to
    the file-path run."""
    import subprocess
    import sys as _sys

    rng = np.random.default_rng(23)
    gp = rng.dirichlet(np.ones(3), size=(80, 7))
    path = str(tmp_path / "gp.bin")
    gp.tofile(path)
    outs = {}
    for mode in ("file", "stdin"):
        out = str(tmp_path / f"{mode}.dist")
        args = ["--geno", path if mode == "file" else "-", "--probs",
                "--n_ind", "7", "--n_sites", "80", "--seed", "1",
                "--engine", "exact", "--out", out]
        proc = subprocess.run(
            [_sys.executable, "-m", "ngsdist_tpu"] + args,
            input=open(path, "rb").read() if mode == "stdin" else None,
            capture_output=True, env=_subproc_env(), timeout=300,
        )
        assert proc.returncode == 0, proc.stderr[-1500:]
        outs[mode] = open(out, "rb").read()
    assert outs["file"] == outs["stdin"]


def test_stdin_text_native_reader_api(tmp_path):
    """readers.read_geno('-', text) from a REAL pipe parses natively
    (fd-0 check) and matches the file read bit-for-bit."""
    import subprocess
    import sys as _sys

    rng = np.random.default_rng(29)
    gp = rng.dirichlet(np.ones(3), size=(40, 5))
    path = str(tmp_path / "gp.geno")
    with open(path, "w") as fh:
        for s in range(40):
            fh.write("\t".join(f"{x:.8f}" for x in gp[s].reshape(-1)) + "\n")
    npy = str(tmp_path / "got.npy")
    code = (
        "import sys, numpy as np\n"
        "from ngsdist_tpu.io import readers\n"
        "g = readers.read_geno('-', False, True, False, 5, 40)\n"
        f"np.save({npy!r}, g)\n"
    )
    proc = subprocess.run(
        [_sys.executable, "-c", code], input=open(path, "rb").read(),
        capture_output=True, env=_subproc_env(), timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-1500:]
    from ngsdist_tpu.io import readers

    want = readers.read_geno(path, False, True, False, 5, 40)
    np.testing.assert_array_equal(np.load(npy), want)


def test_read_pos_dist_header_is_reference_hang(capsys):
    """A position column that strtod-parses to 0 makes the reference
    re-scan the same buffer slot forever (read_data.cpp:188-195);
    reproduced as a clean fatal AFTER the reference's skip banner."""
    from ngsdist_tpu.config import NgsDistError
    from ngsdist_tpu.io.readers import read_pos_dist

    with pytest.raises(NgsDistError, match="never terminates"):
        read_pos_dist([["chr", "pos"], ["chr1", "100"]], 2)
    assert "> Header found! Skipping line..." in capsys.readouterr().err


def test_verbose3_pair_report(gt_file, tmp_path, capsys):
    out = str(tmp_path / "v3.dist")
    pars = _pars(gt_file, out, verbose=3, n_boot_rep=0)
    runner.run(pars, engine="jax")
    err = capsys.readouterr().err
    assert "valid sites" in err and "(ind 0)" in err


def test_signals_graceful_stop(gt_file, tmp_path):
    import os
    import signal as _sig

    from ngsdist_tpu.utils import signals

    signals.arm()
    try:
        os.kill(os.getpid(), _sig.SIGTERM)
        assert signals.stop_requested()
        # run() finishing current matrix then stopping, leaving a resumable ckpt
        out = str(tmp_path / "sig.dist")
        pars = _pars(gt_file, out)
        mats = runner.run(pars, engine="exact")
        assert len(mats) == 1  # stopped after the first matrix
        assert os.path.exists(ckpt.state_path(out))
        signals.disarm()
        # resume completes the stream identically to an uninterrupted run
        runner.run(_pars(gt_file, out), engine="exact", resume=True)
        full = str(tmp_path / "sigfull.dist")
        runner.run(_pars(gt_file, full), engine="exact")
        assert open(out).read() == open(full).read()
    finally:
        signals.disarm()


def test_cli_multihost_flags_parse():
    pars, extras = cli.parse_args(
        ["--geno", "x.gz", "--n_ind", "4", "--n_sites", "10", "--out", "y",
         "--coordinator", "10.0.0.1:1234", "--num_processes", "4",
         "--process_id", "2"]
    )
    assert extras["coordinator"] == "10.0.0.1:1234"
    assert extras["num_processes"] == "4"
    assert extras["process_id"] == "2"
    # reference prefixes unaffected by the new ext names
    pars2, _ = cli.parse_args(["--geno", "g", "--n_ind", "2", "--n_sites", "3",
                               "--out", "o", "--pos", "p.txt"])
    assert pars2.in_pos == "p.txt"
