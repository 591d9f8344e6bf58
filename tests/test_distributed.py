"""True multi-process distributed equivalence (2 processes, CPU, gloo).

Spawns two worker processes that `jax.distributed.initialize` against a
local coordinator, each reads its own site shard of a binary GP file
(io/readers.py site_range via parallel/multihost.py), assembles the
global sharded array, and runs the mesh engine; the psum-merged result
must match a single-process run to reduction-order rounding.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = r"""
import os, sys
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import numpy as np

pid, nproc, port, workdir = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4]
jax.distributed.initialize(coordinator_address="127.0.0.1:" + port,
                           num_processes=nproc, process_id=pid)
sys.path.insert(0, {repo!r})
import jax.numpy as jnp
from ngsdist_tpu.config import Params, default_score_matrix
from ngsdist_tpu.parallel import mesh as pm
from ngsdist_tpu.parallel import multihost as mh
from ngsdist_tpu.parallel.mesh import _indep_sharded, shard_sites

mesh = pm.make_mesh()
pars = Params(in_geno=os.path.join(workdir, "gp.bin"), in_bin=True,
              in_probs=True, n_ind=6, n_sites=37, out="x", seed=1)
arr, s_pad = mh.load_global_probs(pars, mesh)
mask = np.zeros((s_pad,)); mask[:pars.n_sites] = 1.0
m = shard_sites(mask, mesh)
raw, cnt = _indep_sharded(arr, m, m, jnp.asarray(default_score_matrix()), True, mesh)
if pid == 0:
    np.save(os.path.join(workdir, "raw_mh.npy"), np.asarray(raw.addressable_data(0)))
print("OK", pid)
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_psum_matches_single(tmp_path):
    rng = np.random.default_rng(7)
    gp = rng.dirichlet(np.ones(3), size=(37, 6))
    gp.tofile(str(tmp_path / "gp.bin"))

    worker = str(tmp_path / "worker.py")
    with open(worker, "w") as fh:
        fh.write(_WORKER.format(repo=REPO))
    port = str(_free_port())

    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(pid), "2", port, str(tmp_path)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env, text=True,
        )
        for pid in range(2)
    ]
    outs = [p.communicate(timeout=240)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out
    raw_mh = np.load(str(tmp_path / "raw_mh.npy"))

    import jax.numpy as jnp

    from ngsdist_tpu.config import default_score_matrix
    from ngsdist_tpu.core.distance import indep_suffstats

    raw1, _ = indep_suffstats(jnp.asarray(gp), jnp.asarray(default_score_matrix()), True)
    np.testing.assert_allclose(raw_mh, np.asarray(raw1), rtol=0, atol=1e-12)
