"""_tasks API: list / cancel running operations (tasks/TaskManager.java,
CancellableTask) via Spark job-group cancellation."""
import time

from pyspark.sql import functions as F

from opensearch_spark.common.tasks import TaskManager


def _slow_fn(spark, seconds=30):
    """A genuinely running Spark job: per-partition sleep via mapInPandas
    (cooperatively interruptible at task boundaries)."""
    def body():
        df = spark.range(64, numPartitions=32)

        def slow(it):
            import time as _t
            for pdf in it:
                _t.sleep(seconds / 32)
                yield pdf

        return df.mapInPandas(slow, "id long").agg(
            F.sum("id").alias("s")).collect()

    return body


def test_cancel_running_task(spark):
    tm = TaskManager(spark)
    task = tm.submit("indices:data/read/search", _slow_fn(spark, 60),
                     "slow agg")
    # visible as running in the task list
    for _ in range(100):
        if any(i["id"] == task.id and i["status"] == "running"
               for i in tm.list()):
            break
        time.sleep(0.05)
    assert tm.cancel(task.id) is True
    assert task.wait(timeout=30), "cancelled task did not terminate"
    assert task.status == "cancelled"
    assert task.error is not None


def test_completed_task_not_cancellable(spark):
    tm = TaskManager(spark)
    task = tm.submit("indices:data/read/search",
                     lambda: spark.range(10).count(), "fast count")
    assert task.wait(timeout=60)
    assert task.status == "done" and task.result == 10
    assert tm.cancel(task.id) is False  # reference: completed → no-op
    info = [i for i in tm.list() if i["id"] == task.id][0]
    assert info["status"] == "done"


def test_failed_task_recorded(spark):
    tm = TaskManager(spark)

    def boom():
        raise ValueError("bad request")

    task = tm.submit("indices:data/read/search", boom)
    assert task.wait(timeout=10)
    assert task.status == "failed"
    assert isinstance(task.error, ValueError)


def test_failure_mentioning_cancelled_is_still_a_failure(spark):
    """A genuine error whose MESSAGE contains 'cancelled' must be
    recorded as failed with the real exception, not misclassified as a
    user cancellation."""
    from opensearch_spark.common.tasks import TaskManager

    tm = TaskManager(spark)
    def boom():
        raise ValueError("upload cancelled by remote peer")
    t = tm.submit("indices:data/write", boom)
    assert t.wait(30)
    assert t.status == "failed"
    assert isinstance(t.error, ValueError)
    assert "remote peer" in str(t.error)


def test_finished_tasks_pruned_bounded(spark):
    from opensearch_spark.common.tasks import TaskManager

    tm = TaskManager(spark)
    tm.KEEP_FINISHED = 5
    tasks = [tm.submit("a", lambda: 1) for _ in range(12)]
    for t in tasks:
        assert t.wait(30)
    tm.submit("a", lambda: 1).wait(30)
    finished = [i for i in tm.list() if i["status"] == "done"]
    assert len(finished) <= 6  # 5 retained + the one just submitted
