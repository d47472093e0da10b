"""Driver-contract emulation: `__spark_entry__` must work for a
harness that imports it with a VANILLA SparkSession from a cwd other
than the repo — in particular, Arrow-kernel queries whose closures
reference package modules must still deserialize on Python workers
(the entry contract ships the package via addPyFile)."""

import subprocess
import sys

SCRIPT = """
import sys
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[4]")
         .config("spark.sql.shuffle.partitions", "4")
         .config("spark.ui.enabled", "false").getOrCreate())
import __spark_entry__ as e
qs = e.queries()
# one closure-by-reference kernel (mapInArrow) + the flagship
n1 = len(qs["q_arrow_batch_norms"](spark, "/root/testdata/sf0.001").collect())
n2 = len(e.entry(spark).collect())
print(f"CONTRACT_OK {n1} {n2}")
"""


def test_entry_contract_from_foreign_cwd(tmp_path):
    out = subprocess.run([sys.executable, "-c", SCRIPT], cwd=str(tmp_path),
                         capture_output=True, text=True, timeout=300)
    assert "CONTRACT_OK" in out.stdout, (out.stdout[-2000:], out.stderr[-2000:])
    tail = out.stdout.strip().splitlines()[-1].split()
    assert int(tail[1]) > 0 and int(tail[2]) == 6
