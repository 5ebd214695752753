"""The zero-'No Partition Defined' pin as real CI (r9 verdict #2).

The r9 reconciliation took the full drive's WindowExec warning count from
931 to 0, but the regression guard was a NOTES sentence — nothing failed
if an unpartitioned window slipped back in. tools/check_oracle.py now
carries StderrWarningGate (a process-wide fd-2 tee that counts warning
lines during the drive and exits nonzero on any). These tests prove the
instrument itself: the counter sees raw fd-2 writes, and — in a
subprocess, because the gate must own fd 2 BEFORE the JVM child inherits
it, exactly as check_oracle.main() installs it before get_spark — a
DELIBERATE unpartitioned window trips it through the real JVM log path
while the sanctioned idiom (util.one_partition) stays silent.
"""

from __future__ import annotations

import os
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from check_oracle import StderrWarningGate  # noqa: E402

_REPO = Path(__file__).resolve().parent.parent


def test_gate_counts_fd2_lines():
    gate = StderrWarningGate()
    try:
        os.write(2, b"26/01/01 WARN WindowExec: No Partition Defined for"
                    b" Window operation!\n")
        os.write(2, b"an unrelated warning line\n")
        os.write(2, b"WARN WindowExec: No Partition Defined again\n")
        time.sleep(0.3)
    finally:
        n = gate.close()
    assert n == 2


_SUBPROC = r"""
import sys
sys.path.insert(0, "{repo}")
sys.path.insert(0, "{repo}/tools")
from check_oracle import StderrWarningGate
gate = StderrWarningGate()          # BEFORE the JVM: the child inherits
                                    # the gate's pipe as its stderr
from pyspark.sql import SparkSession, functions as F
from pyspark.sql.window import Window
spark = (SparkSession.builder.master("local[2]")
         .config("spark.sql.shuffle.partitions", "4")
         .config("spark.ui.enabled", "false").getOrCreate())
df = spark.range(100).toDF("x")

# sanctioned idiom first: must stay at zero
from melt_spark.functions.util import one_partition
w_ok = Window.partitionBy(one_partition(F.col("x"))).orderBy("x")
df.limit(50).withColumn("rn", F.row_number().over(w_ok)) \
    .write.format("noop").mode("overwrite").save()
import time; time.sleep(0.5)
silent = gate.count

# the deliberate tripwire: a partition-less window through the JVM
w_bad = Window.orderBy("x")
df.withColumn("rn", F.row_number().over(w_bad)) \
    .write.format("noop").mode("overwrite").save()
tripped = gate.settle()
print(f"GATE silent={{silent}} tripped={{tripped}}")
"""


def test_jvm_trip_and_one_partition_silence():
    """One subprocess pays the JVM startup once and proves BOTH halves of
    the contract: one_partition windows log nothing; a partition-less
    window raises the count through the real log4j->fd2 path."""
    out = subprocess.run(
        [sys.executable, "-c", _SUBPROC.format(repo=_REPO)],
        capture_output=True, text=True, timeout=300, cwd=str(_REPO))
    marker = [ln for ln in out.stdout.splitlines()
              if ln.startswith("GATE ")]
    assert marker, f"no GATE line; stderr tail: {out.stderr[-2000:]}"
    fields = dict(kv.split("=") for kv in marker[0].split()[1:])
    assert fields["silent"] == "0", marker[0]
    assert int(fields["tripped"]) >= 1, marker[0]
