"""Process-scoped scratch root for self-contained index queries.

The registered storage queries (ann_ivf_persisted, doc_bm25_serve,
...) build a real on-disk artifact and RETURN lazy DataFrames that
read it only when the caller materializes them, so a per-call
try/finally would delete the index before it is scanned — process
exit is the first moment the artifact is provably dead (ADVICE r7:
each certification/bench run used to leak one mkdtemp per query into
/tmp). All scratch indexes therefore live under ONE per-process root
removed by atexit. Extracted from storage/vector_index.py in round 10
so the lexical index shares the discipline.
"""

from __future__ import annotations

import atexit
import shutil
import tempfile

_SCRATCH_ROOT: str | None = None


def scratch_dir(prefix: str) -> str:
    """A fresh directory under the per-process scratch root."""
    global _SCRATCH_ROOT
    if _SCRATCH_ROOT is None:
        _SCRATCH_ROOT = tempfile.mkdtemp(prefix="spark_graft_idx_scratch_")
        atexit.register(shutil.rmtree, _SCRATCH_ROOT, ignore_errors=True)
    return tempfile.mkdtemp(prefix=prefix, dir=_SCRATCH_ROOT)
