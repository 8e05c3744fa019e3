"""Session-level shuffle tuning shared by bench.py, the CLI, and tests.

These settings exist to make a small ``local[N]`` session behave the way
a large cluster already behaves, instead of taking the small-job code
paths that are wrong for this engine's workloads:

``spark.shuffle.sort.bypassMergeThreshold = 1``
    With R reducers at or below the threshold (default 200), Spark's
    bypass-merge shuffle writer opens R separate partition files PER MAP
    TASK, appends row-at-a-time, then re-merges them into the final
    segment file — M×R file creates/opens/fsyncs per shuffle.  On a
    1000-executor job reducer counts are in the thousands, so the bypass
    writer never engages; a local 32-partition session sits squarely
    under the threshold and pays ~200-300 ms of syscall overhead per map
    task (measured here: a trivial 100k-row repartition+groupBy costs
    19.7 executor-task-seconds with the bypass writer, 2.4 without).
    Forcing the serialized sort writer (one sorted spill file + index
    per map task, any R) makes local plan costs track at-scale costs.

``spark.sql.adaptive.coalescePartitions.parallelismFirst = false``
    The default (true) tells AQE to ignore the 64 MB advisory partition
    size and fan post-shuffle reads out to defaultParallelism, so a
    500 KB shuffle is read by 32 tasks each paying fixed task overhead
    for ~16 KB of data.  At 100 TB this setting is a no-op (partitions
    are far above the advisory size); locally it collapses KB-scale
    exchanges to a single right-sized task.  Spark's own config doc
    recommends false.

``spark.local.dir = /dev/shm/... (opportunistic)``
    Shuffle scratch goes to the fastest local storage available — the
    standard production layout (NVMe/tmpfs scratch, durable data on the
    warehouse filesystem).  Only applied when the ramdisk exists and is
    writable; harmless to the correctness path either way, since
    spark.local.dir holds only shuffle/spill scratch, never table data.
"""

from __future__ import annotations

import os
import tempfile

__all__ = ["local_shuffle_confs"]


def local_shuffle_confs(scratch_root: str = "/dev/shm") -> dict[str, str]:
    """Config dict for ``SparkSession.builder.config(map=...)`` (or a
    ``for k, v in ...: builder.config(k, v)`` loop on older PySpark)."""
    confs = {
        "spark.shuffle.sort.bypassMergeThreshold": "1",
        "spark.sql.adaptive.coalescePartitions.parallelismFirst": "false",
        # with parallelismFirst off, the advisory size IS the post-shuffle
        # partition size.  64 MB (the default) on a 32-core local box
        # leaves a 500 MB sf1 shuffle on 8 cores and pushed one suite
        # into disk spill; 8 MB keeps KB-scale exchanges on 1-2 tasks
        # while giving MB-scale shuffles full-width parallelism and
        # per-task memory headroom.  (At cluster scale this knob is
        # workload-tuned anyway; partition counts there are thousands
        # either way.)
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8m",
        # persisted intra-query intermediates (text_ops' shared span
        # frame, perplexity's bigram-count frame) otherwise pin their
        # pre-AQE shuffle partitioning: InMemoryRelation compiles with
        # AQE disabled by default, so a KB-scale cached frame is stored
        # AND re-read as shuffle.partitions tasks, paying full-width
        # fixed task cost per consumer (r15: 3 consumer stages × 32
        # tasks on a 3 MB cached frame).  Letting AQE re-partition the
        # cached plan output applies the same size-based coalescing to
        # cached frames as to every other exchange.
        "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning": "true",
        # N concurrent Python workers × multi-threaded BLAS oversubscribes
        # the box and swings measured task time 2-4× run-to-run on
        # numpy-heavy stages (found by the r10 scaling soak, where the
        # pins first landed); one BLAS thread per worker matches how a
        # real cluster pins executor cores
        "spark.executorEnv.OPENBLAS_NUM_THREADS": "1",
        "spark.executorEnv.OMP_NUM_THREADS": "1",
        "spark.executorEnv.MKL_NUM_THREADS": "1",
    }
    try:
        if os.path.isdir(scratch_root) and os.access(scratch_root, os.W_OK):
            d = tempfile.mkdtemp(prefix="spark-scratch-", dir=scratch_root)
            confs["spark.local.dir"] = d
    except OSError:
        pass
    return confs
