"""Per-host shard reading and global sharded array assembly."""

import gzip

import numpy as np
import pytest

import jax

from ngsdist_tpu.config import Params
from ngsdist_tpu.core.preprocess import preprocess
from ngsdist_tpu.io import readers
from ngsdist_tpu.parallel import mesh as pm
from ngsdist_tpu.parallel import multihost as mh


@pytest.fixture(scope="module")
def mesh8():
    return pm.make_mesh(n_devices=8)


def _write_beagle(path, rng, S, N):
    with gzip.open(path, "wt") as fh:
        fh.write("marker\tallele1\tallele2\t" + "\t".join(
            f"Ind{i}" for i in range(N) for _ in range(3)) + "\n")
        for s in range(S):
            gl = rng.dirichlet(np.ones(3), size=N).reshape(-1)
            fh.write(f"m_{s}\t0\t1\t" + "\t".join(f"{x:.6f}" for x in gl) + "\n")


def test_site_range_binary(tmp_path):
    rng = np.random.default_rng(0)
    S, N = 50, 4
    gp = rng.dirichlet(np.ones(3), size=(S, N))
    path = str(tmp_path / "gp.bin")
    gp.tofile(path)
    full = readers.read_geno(path, True, True, False, N, S, native=False)
    part = readers.read_geno(path, True, True, False, N, S, site_range=(17, 42))
    np.testing.assert_array_equal(part, full[17:42])


def test_site_range_text_with_header(tmp_path):
    rng = np.random.default_rng(1)
    S, N = 30, 5
    path = str(tmp_path / "gl.beagle.gz")
    _write_beagle(path, rng, S, N)
    full = readers.read_geno(path, False, True, False, N, S, native=False)
    part = readers.read_geno(path, False, True, False, N, S, site_range=(10, 25))
    np.testing.assert_array_equal(part, full[10:25])


def test_load_global_probs_single_process(mesh8, tmp_path):
    rng = np.random.default_rng(2)
    S, N = 43, 4  # ragged
    gp = rng.dirichlet(np.ones(3), size=(S, N))
    path = str(tmp_path / "gp.bin")
    gp.tofile(path)
    pars = Params(in_geno=path, in_bin=True, in_probs=True,
                  n_ind=N, n_sites=S, out="x", seed=1)
    arr, s_pad = mh.load_global_probs(pars, mesh8)
    assert s_pad % 8 == 0 and s_pad >= S
    host = np.asarray(arr)
    expect = preprocess(
        readers.read_geno(path, True, True, False, N, S, native=False),
        False, 0.0, 0.0,
    )
    np.testing.assert_allclose(host[:S], expect, atol=0)
    assert np.all(host[S:] == 0.0)


def test_host_site_range_covers_all(mesh8):
    start, stop = mh.host_site_range(80, mesh8)
    assert (start, stop) == (0, 80)  # single process owns everything
