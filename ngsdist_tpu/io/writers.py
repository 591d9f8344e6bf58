"""Distance-matrix output writer.

One phylip-style matrix per replicate appended to a single stream: a
leading blank line, the individual count, then one `label\\tv1\\t...\\tvn`
row per individual with values formatted exactly as C's printf %.10f
(including inf/nan spellings), matching /root/reference/ngsDist.cpp:282-287
and the join() formatter at shared/gen_func.cpp:479-496.
"""

from __future__ import annotations

import math
from typing import IO, List, Sequence

import numpy as np


def fmt_c_double(v: float) -> str:
    """Format a double the way glibc printf("%.10f") does."""
    if math.isnan(v):
        return "-nan" if math.copysign(1.0, v) < 0 else "nan"
    if math.isinf(v):
        return "-inf" if v < 0 else "inf"
    return f"{v:.10f}"


def write_dist_matrix(fh: IO[str], labels: Sequence[str], matrix: np.ndarray) -> None:
    n = len(labels)
    fh.write(f"\n{n}\n")
    for i in range(n):
        row = "\t".join(fmt_c_double(float(v)) for v in matrix[i])
        fh.write(f"{labels[i]}\t{row}\n")


def format_dist_matrices(labels: Sequence[str], matrices: List[np.ndarray]) -> str:
    out: List[str] = []
    for m in matrices:
        n = len(labels)
        out.append(f"\n{n}\n")
        for i in range(n):
            row = "\t".join(fmt_c_double(float(v)) for v in m[i])
            out.append(f"{labels[i]}\t{row}\n")
    return "".join(out)
