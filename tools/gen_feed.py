"""Generate the bench CDC feed in an ISOLATED subprocess.

bench.py used to generate the feed on an in-process SparkSession and
``spark.stop()`` it — but a stopped session's JVM lives until the *python*
process exits (py4j gateway), and an instrumented run showed that lingering
24 GiB JVM burning a full core for the entire scaling phase right next to
the taskset-pinned measurement JVMs. Running generation here means the JVM
exits with this process and the measurement host is actually quiet.

env: CDC_FEED (output dir), CDC_EVENTS, CDC_GEN_CORES, CDC_WORK, CDC_MEM.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

feed_dir = os.environ["CDC_FEED"]
n_events = int(os.environ["CDC_EVENTS"])
cores = int(os.environ.get("CDC_GEN_CORES", "32"))
work = os.environ.get("CDC_WORK", "/tmp/cdc_bench")
os.environ["SPARK_DRIVER_MEMORY"] = os.environ.get("CDC_MEM", "24g")

from mysql_secure_agent_spark.session import get_spark
from mysql_secure_agent_spark.sources.changelog_spark import write_feed_spark

spark = get_spark(
    app_name=f"gen-feed-{cores}",
    cores=cores,
    shuffle_partitions=2 * cores,
    extra_conf={
        "spark.ui.showConsoleProgress": "false",
        "spark.local.dir": os.path.join(work, "sparklocal"),
    },
)
write_feed_spark(
    spark,
    feed_dir,
    n_events=n_events,
    n_convs=max(200, n_events // 50),
    n_files=64,
    zipf_s=1.2,
    seed=42,
    strict_ops=False,  # shuffle-free generation at 10^8 scale
)
spark.stop()
