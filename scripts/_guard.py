"""Shared write-refusal guard for every script that writes parquet.

Round-11 incident: a mispointed ``SPARK_GRAFT_SF1_DIR`` let make_sf1.py
overwrite the driver's read-only ``/root/testdata`` corpus (root ignores
the read-only mode bits). Every generator/bench script that writes
parquet now routes its output path through :func:`assert_not_testdata`
before the first byte is written.

The ONLY sanctioned exception is the explicit, judge-ordered fixture
repair (scripts/repair_sf001_events.py), which must pass the
``allow_repair`` token AND the dedicated CLI flag.
"""
from __future__ import annotations

import os

_PROTECTED = "/root/testdata"


def assert_not_testdata(path: str, *, allow_repair: bool = False) -> str:
    """Refuse any output path inside the driver's read-only testdata.

    Returns the path unchanged when safe, so call sites can wrap their
    output-dir resolution in one expression. Symlinks are resolved first —
    a link into the corpus is just as destructive as the direct path.
    """
    real = os.path.realpath(path)
    if real == _PROTECTED or real.startswith(_PROTECTED + os.sep):
        if allow_repair and os.environ.get("SPARK_GRAFT_ALLOW_TESTDATA_REPAIR") == "1":
            return path
        raise SystemExit(
            f"refusing to write into {path!r}: /root/testdata is the "
            "driver's read-only corpus (round-11 incident guard); point "
            "the output env var elsewhere"
        )
    return path
