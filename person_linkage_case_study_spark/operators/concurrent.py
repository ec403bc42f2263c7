"""Concurrent driver-job submission (guide §2.6).

Spark's scheduler happily runs several jobs at once inside one
application; actions are only sequential because driver code calls them
sequentially. Pipelines whose construction triggers several INDEPENDENT
eager jobs (cache population, bounded dictionary collects, broadcast
builds) serialize pure driver latency for no reason — submitting them
from 2-3 threads lets each job's tasks back-fill executors freed by the
other's tail.

``pyspark.InheritableThread`` (not a plain thread pool) because pinned
thread mode (the default since 3.2) maps each Python thread to its own
JVM thread: InheritableThread inherits the parent's JVM thread-locals
(job group, descriptions) and deletes the paired JVM thread when the
Python thread exits, so repeated invocations do not leak JVM threads.
"""

from __future__ import annotations

from typing import Callable

from pyspark import InheritableThread
from pyspark.sql import SparkSession


def run_concurrent(
    spark: SparkSession,
    thunks: list[Callable],
    labels: list[str] | None = None,
):
    """Run independent driver thunks (each may submit Spark jobs) in
    parallel threads and return their results in order.

    The FIRST exception raised by any thunk re-raises in the caller
    after every thread has been joined (never orphaning a running job).
    ``labels`` set per-thread job descriptions (thread-local, so each
    concurrent job is labelled correctly in the UI — guide §2.6).

    Callers must ensure the thunks touch DISJOINT uncached state: two
    thunks first-touching the SAME unpopulated persisted frame would
    compute it twice (populate shared parents with one eager job before
    fanning out).
    """
    n = len(thunks)
    results: list = [None] * n
    errors: list = [None] * n

    def _wrap(i: int, fn: Callable, label: str | None) -> Callable:
        def run() -> None:
            sc = spark.sparkContext
            if label is not None:
                sc.setJobDescription(label)
            try:
                results[i] = fn()
            except BaseException as e:  # re-raised in the caller below
                errors[i] = e
            finally:
                if label is not None:
                    sc.setJobDescription(None)

        return run

    if n == 1:  # nothing to overlap — skip the thread machinery
        return [thunks[0]()]
    threads = [
        InheritableThread(target=_wrap(i, fn, labels[i] if labels else None))
        for i, fn in enumerate(thunks)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    for e in errors:
        if e is not None:
            raise e
    return results
