"""Python worker daemon with preloaded scientific stack.

PySpark's worker daemon forks a new worker per task slot; each forked worker
then imports pandas/pyarrow/numpy lazily on its first Arrow batch — ~1-2 s of
CPU per worker, paid simultaneously by every slot when a pandas-UDF stage
first runs (tens of seconds of apparent stall at 32+ slots, re-paid per
Structured Streaming query because foreachBatch clones the session).

Importing the heavy modules HERE — in the daemon, before any fork — lets
every forked worker inherit the already-initialized modules through
copy-on-write memory. Worker cold start drops to fork()+handshake.

Enable with: spark.python.daemon.module=mysql_secure_agent_spark.py_daemon
(set by session.get_spark by default).
"""

# Preload before the daemon starts forking workers.
import numpy  # noqa: F401
import pandas  # noqa: F401
import pyarrow  # noqa: F401
import pyarrow.parquet  # noqa: F401

from pyspark.daemon import manager

if __name__ == "__main__":
    manager()
