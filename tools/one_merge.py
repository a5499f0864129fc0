"""Run one fused CDC merge over a feed dir; print wall seconds. Used by
bench experiments (fresh JVM per invocation so driver JVM flags apply).

env: CORES, FEED (dir with data/), GC (extraJavaOptions), MEM, CODEC, REPS
"""

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mysql_secure_agent_spark.session import get_spark
from mysql_secure_agent_spark.schemas import CHANGELOG_SCHEMA
from pyspark.sql import functions as F, Window as W

cores = int(os.environ.get("CORES", "32"))
feed = os.environ["FEED"]
gc = os.environ.get("GC", "")
mem = os.environ.get("MEM", "16g")
codec = os.environ.get("CODEC", "zstd")
reps = int(os.environ.get("REPS", "3"))
NB = int(os.environ.get("NB", "32"))

os.environ["SPARK_DRIVER_MEMORY"] = mem
spark = get_spark(
    app_name="one_merge",
    cores=cores,
    shuffle_partitions=2 * cores,
    extra_conf={
        "spark.ui.showConsoleProgress": "false",
        "spark.sql.files.maxPartitionBytes": "16m",
        "spark.local.dir": "/dev/shm/cdcbench/sparklocal",
        "spark.driver.extraJavaOptions": gc,
        "spark.sql.parquet.compression.codec": codec,
    },
)
keys = ["conv_id", "turn_idx"]
walls = []
for i in range(reps):
    df = (
        spark.read.schema(CHANGELOG_SCHEMA)
        .parquet(os.path.join(feed, "data"))
        .withColumn("_deleted", F.col("op") == "D")
        .drop("op", "binlog_file", "binlog_pos")
        .repartition(NB, *keys)
    )
    w = W.partitionBy(*keys).orderBy(F.col("source_lsn").desc())
    out_df = (
        df.withColumn("_rn", F.row_number().over(w))
        .filter("_rn = 1")
        .drop("_rn")
        .withColumn("_bucket", F.pmod(F.hash(*keys), F.lit(NB)))
    )
    out = f"/dev/shm/cdcbench/one_merge_out"
    shutil.rmtree(out, ignore_errors=True)
    t0 = time.time()
    out_df.write.partitionBy("_bucket").parquet(out)
    walls.append(round(time.time() - t0, 2))
    shutil.rmtree(out, ignore_errors=True)
print(f"RESULT cores={cores} mem={mem} codec={codec} gc='{gc}': {walls} min={min(walls)}")
spark.stop()
