"""Phase-timed CDC profiling in a fresh process (same knobs as cdc_run).

Decomposes one end-to-end merge run into cumulative phases so the
parallelism-independent component is measurable instead of guessed:

  scan        read feed -> noop sink (no shuffle)
  shuffle     + repartition(n_buckets, key_cols) -> noop
  dedup       + window last-image-wins -> noop
  normalize   + Arrow normalize UDF -> noop
  merge       full LakeTable.merge (write + commit), direct (no streaming)
  stream      full run_stream (streaming wrapper on top of merge)

env: CDC_CORES, CDC_FEED, CDC_WORK, CDC_MEM, CDC_BUCKETS, CDC_MFPT.
Prints one JSON line with per-phase seconds.
"""

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

cores = int(os.environ["CDC_CORES"])
feed = os.environ["CDC_FEED"]
work = os.environ.get("CDC_WORK", "/tmp/cdc_prof")
mem = os.environ.get("CDC_MEM", "12g")
nb = int(os.environ.get("CDC_BUCKETS", "128"))
mfpt = int(os.environ.get("CDC_MFPT", "64"))

os.environ["SPARK_DRIVER_MEMORY"] = mem

from mysql_secure_agent_spark.session import get_spark
from mysql_secure_agent_spark.lake.table import LakeTable
from mysql_secure_agent_spark.streaming.pipeline import CdcPipeline
from mysql_secure_agent_spark.operators.dedup_changelog import last_image_wins
from mysql_secure_agent_spark.functions.normalize import normalize_text_udf
from mysql_secure_agent_spark.schemas import PRIMARY_KEY, TRANSCRIPT_SCHEMA, CHANGELOG_SCHEMA
from pyspark.sql import functions as F

spark = get_spark(
    app_name=f"prof_{cores}",
    cores=cores,
    shuffle_partitions=2 * cores,
    extra_conf={
        "spark.ui.showConsoleProgress": "false",
        "spark.sql.files.maxPartitionBytes": "16m",
        "spark.local.dir": os.path.join(work, "sparklocal"),
        "spark.driver.extraJavaOptions": f"-Xms{mem} -XX:+AlwaysPreTouch",
        "spark.sql.parquet.compression.codec": "snappy",
        "spark.sql.execution.arrow.maxRecordsPerBatch": "65536",
    },
)

# warmup identical to cdc_run
from mysql_secure_agent_spark.sources.changelog_spark import write_feed_spark

wfeed = os.path.join(work, "warmfeed")
if not os.path.exists(wfeed):
    write_feed_spark(spark, wfeed, n_events=400_000, n_convs=20_000, n_files=4)
wt = os.path.join(work, f"warmtbl{cores}")
wc = os.path.join(work, f"warmck{cores}")
shutil.rmtree(wt, ignore_errors=True)
shutil.rmtree(wc, ignore_errors=True)
wtbl = LakeTable.create(wt, TRANSCRIPT_SCHEMA, PRIMARY_KEY, n_buckets=nb, overwrite=True)
CdcPipeline(wtbl, wfeed, normalize=True, dedup_strategy="window").run_stream(spark, wc)
shutil.rmtree(wt, ignore_errors=True)
shutil.rmtree(wc, ignore_errors=True)

timings = {}


def t(name, fn):
    t0 = time.time()
    fn()
    timings[name] = round(time.time() - t0, 2)
    print(f"## {name}: {timings[name]}s", file=sys.stderr)


def read_feed():
    return spark.read.schema(CHANGELOG_SCHEMA).parquet(os.path.join(feed, "data"))


def noop(df):
    df.write.format("noop").mode("overwrite").save()


proj = None


def _projected(df):
    # mirror merge()'s projection
    cols = [(f.name, f.dataType.simpleString()) for f in TRANSCRIPT_SCHEMA.fields]
    return df.select(
        *[F.col(c).cast(dt).alias(c) for c, dt in cols],
        F.col("source_lsn").cast("long").alias("source_lsn"),
        (F.col("op") == F.lit("D")).alias("_deleted"),
    )


t("scan", lambda: noop(read_feed()))
t("shuffle", lambda: noop(_projected(read_feed()).repartition(nb, *PRIMARY_KEY)))
t(
    "dedup",
    lambda: noop(
        last_image_wins(
            _projected(read_feed()).repartition(nb, *PRIMARY_KEY),
            key_cols=PRIMARY_KEY,
            order_col="source_lsn",
            strategy="window",
        )
    ),
)
t(
    "normalize",
    lambda: noop(
        last_image_wins(
            _projected(read_feed()).repartition(nb, *PRIMARY_KEY),
            key_cols=PRIMARY_KEY,
            order_col="source_lsn",
            strategy="window",
        ).withColumn("text", normalize_text_udf(F.col("text")))
    ),
)


def direct_merge():
    tbl_dir = os.path.join(work, f"ptbl{cores}")
    shutil.rmtree(tbl_dir, ignore_errors=True)
    table = LakeTable.create(tbl_dir, TRANSCRIPT_SCHEMA, PRIMARY_KEY, n_buckets=nb, overwrite=True)
    pipe = CdcPipeline(table, feed, normalize=True, dedup_strategy="window")
    pipe.apply_batch(spark, read_feed(), "prof")
    shutil.rmtree(tbl_dir, ignore_errors=True)


t("merge_direct", direct_merge)


def stream_run():
    tbl_dir = os.path.join(work, f"stbl{cores}")
    ck_dir = os.path.join(work, f"sck{cores}")
    shutil.rmtree(tbl_dir, ignore_errors=True)
    shutil.rmtree(ck_dir, ignore_errors=True)
    table = LakeTable.create(tbl_dir, TRANSCRIPT_SCHEMA, PRIMARY_KEY, n_buckets=nb, overwrite=True)
    pipe = CdcPipeline(table, feed, normalize=True, dedup_strategy="window")
    pipe.run_stream(spark, ck_dir, max_files_per_trigger=mfpt)
    shutil.rmtree(tbl_dir, ignore_errors=True)
    shutil.rmtree(ck_dir, ignore_errors=True)


t("stream", stream_run)
spark.stop()
print(json.dumps({"cores": cores, "phases": timings}))
