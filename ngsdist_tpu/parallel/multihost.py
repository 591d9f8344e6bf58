"""Multi-host orchestration: per-host shard reading + global sharded arrays.

The reference is strictly single-node (SURVEY.md §2.3).  Here, N hosts
each read their own contiguous site range of the genotype file
(io/readers.py site_range), assemble the global [n_sites, n_ind, 3]
array from process-local shards, and run the mesh engine
(parallel/mesh.py) whose psum merges partial statistics over ICI/DCN.

Single-process meshes take the same path (the local shard is simply the
whole site axis), so this module is exercised by the test suite without
multiple processes; `bring_up` wires `jax.distributed.initialize` for
real multi-host runs.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import Params
from ..core.preprocess import preprocess
from ..io import readers
from .mesh import AXIS, _round_up


def bring_up(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize the multi-host runtime (no-op if already initialized
    or single-process with no coordinator given)."""
    if coordinator_address is None:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def host_site_range(n_sites_pad: int, mesh: Mesh) -> Tuple[int, int]:
    """This process's contiguous site range under the mesh's sites axis.

    The padded site count divides evenly over devices; a host owns the
    union of its local devices' shards, which is contiguous for a 1-D
    mesh enumerated in process order.
    """
    n_dev = mesh.devices.size
    per_dev = n_sites_pad // n_dev
    local = [d for d in mesh.devices.flat if d.process_index == jax.process_index()]
    if not local:
        return 0, 0
    idx = sorted(np.where([d.process_index == jax.process_index()
                           for d in mesh.devices.flat])[0])
    return idx[0] * per_dev, (idx[-1] + 1) * per_dev


def load_global_probs(pars: Params, mesh: Mesh, granule: int = 1):
    """Read this host's site shard and assemble the global sharded
    [S_pad, n_ind, 3] normal-space probability array.

    granule: per-device shard length multiple (site tiles / block size).
    Returns (global_array, s_pad).
    """
    n_dev = mesh.devices.size
    s_loc = _round_up(_round_up(pars.n_sites, n_dev) // n_dev, granule)
    s_pad = s_loc * n_dev

    start, stop = host_site_range(s_pad, mesh)
    read_stop = min(stop, pars.n_sites)
    read_start = min(start, pars.n_sites)
    if read_stop > read_start:
        geno_log = readers.read_geno(
            pars.in_geno, pars.in_bin, pars.in_probs, pars.in_logscale,
            pars.n_ind, pars.n_sites, site_range=(read_start, read_stop),
        )
        local = preprocess(geno_log, pars.call_geno, pars.N_thresh, pars.call_thresh)
    else:
        local = np.zeros((0, pars.n_ind, 3))
    pad = (stop - start) - local.shape[0]
    if pad > 0:  # zero padding: inert sites (see parallel/mesh.py)
        local = np.concatenate(
            [local, np.zeros((pad,) + local.shape[1:], local.dtype)], axis=0
        )

    sharding = NamedSharding(mesh, P(AXIS, None, None))
    arr = jax.make_array_from_process_local_data(
        sharding, np.ascontiguousarray(local), (s_pad, pars.n_ind, 3)
    )
    return arr, s_pad


def plan_granule(pars: Params) -> int:
    """Per-device shard-length multiple for load_global_probs so that
    every sharded_suffstats variant a run needs is satisfiable: block
    alignment for bootstrap partials, plus a composite factor so the EM
    tile divisor search finds a healthy tile."""
    g = pars.boot_block_size if pars.n_boot_rep else 1
    if not pars.indep_geno:
        g = int(np.lcm(g, 256))
    return g


def run_distributed(pars: Params, coordinator: Optional[str] = None,
                    num_processes: Optional[int] = None,
                    process_id: Optional[int] = None):
    """Full multi-host pipeline (BASELINE.json scale-out config): every
    process reads its own site shard, the mesh engine psum-merges
    sufficient statistics over all devices of all processes, and process
    0 streams the phylip matrices to pars.out.

    Single-process invocations run the same code over the local devices.
    Returns the matrices on process 0, [] elsewhere.
    """
    import jax

    from ..core import bootstrap as bt
    from ..core import models
    from ..core.distance import _iter_replicates_extended, _iter_replicates_sharded
    from ..io import readers, writers
    from .mesh import make_mesh

    bring_up(coordinator, num_processes, process_id)
    pars.validate()
    pars.finalize()
    # Models 3-6 run the sharded extended path (the reference aborts on
    # them, ngsDist.cpp:387-398; the jax engine implements them) — every
    # process reads the small POS file whole for the allele codes.
    alleles = None
    if pars.evol_model >= 3:
        from ..core.submodels import encode_alleles

        if not pars.in_pos:
            from ..config import NgsDistError

            raise NgsDistError(
                "main", "evolutionary models need allele info in the POS file!"
            )
        pos_rows = readers.read_pos(pars.in_pos, pars.in_pos_header, pars.n_sites)
        alleles = encode_alleles(pos_rows)
    else:
        models.check_model_supported(pars.evol_model)
    if jax.process_index() == 0:
        import sys

        for msg in pars.messages:
            print(msg, file=sys.stderr)

    mesh = make_mesh()
    arr, _s_pad = load_global_probs(pars, mesh, granule=plan_granule(pars))

    n_trunc, maps = bt.site_maps(
        pars.seed, pars.n_boot_rep, pars.n_sites, pars.boot_block_size
    )

    is_writer = jax.process_index() == 0
    labels = None
    out_fh = None
    if is_writer:
        labels = (
            readers.read_labels(pars.in_labels, pars.in_labels_header, pars.n_ind)
            if pars.in_labels else readers.default_labels(pars.n_ind)
        )
        out_fh = open(pars.out, "w")
    if pars.evol_model >= 3:
        stream = _iter_replicates_extended(
            pars, arr, maps, n_trunc, alleles, mesh=mesh
        )
    else:
        stream = _iter_replicates_sharded(pars, arr, maps, n_trunc, mesh)
    matrices = []
    try:
        for m in stream:
            if is_writer:
                writers.write_dist_matrix(out_fh, labels, m)
                out_fh.flush()
                matrices.append(m)
    finally:
        if out_fh is not None:
            out_fh.close()
    return matrices
