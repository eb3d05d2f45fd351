"""Task management: list and cancel running operations (`_tasks` API).

Reference surface: ``server/.../tasks/TaskManager.java`` +
``CancellableTask`` (cooperative cancellation checkpoints) and the
``_tasks`` / ``_tasks/{id}/_cancel`` admin actions
(``action/admin/cluster/node/tasks``).

Spark-first mapping: every submitted operation runs in its own Spark **job
group** (``setJobGroup(..., interruptOnCancel=True)``) on a dedicated
``pyspark.InheritableThread``; cancel = ``sc.cancelJobGroup`` — Spark's
cooperative job cancellation, the exact analog of the reference's
CancellableTask checkpoints (running stages are interrupted at task
boundaries, queued stages never start). The driver thread observes the
SparkException and the task record flips to ``cancelled``.
"""
from __future__ import annotations

import itertools
import threading
import time


class TaskCancelledException(RuntimeError):
    pass


_ids = itertools.count(1)


class Task:
    def __init__(self, task_id: int, action: str, description: str):
        self.id = task_id
        self.action = action
        self.description = description
        self.start = time.monotonic()
        self.status = "running"    # running | done | failed | cancelled
        self.result = None
        self.error: BaseException | None = None
        self._done = threading.Event()
        #: guards status TRANSITIONS — without it cancel() can observe
        #: 'running', lose the race to the completing worker, and then
        #: stamp 'cancelling' over 'done' permanently (the task is never
        #: pruned and a second cancel returns False)
        self._slock = threading.Lock()

    def info(self) -> dict:
        return {"id": self.id, "action": self.action,
                "description": self.description,
                "running_time_s": round(time.monotonic() - self.start, 3),
                "cancellable": True, "status": self.status}

    def wait(self, timeout: float | None = None) -> bool:
        return self._done.wait(timeout)


class TaskManager:
    #: finished (done/failed/cancelled) tasks retained for `GET _tasks`
    #: inspection; older ones are pruned on submit so a long-lived driver
    #: never accumulates unbounded task records (the reference's
    #: TaskManager unregisters on completion; we keep a bounded tail
    #: because results/errors are part of this API's response surface)
    KEEP_FINISHED = 1000

    def __init__(self, spark):
        self.spark = spark
        self._tasks: dict[int, Task] = {}
        self._lock = threading.Lock()

    def _prune_locked(self) -> None:
        finished = [t for t in self._tasks.values()
                    if t.status not in ("running", "cancelling")]
        excess = len(finished) - self.KEEP_FINISHED
        if excess > 0:
            for t in sorted(finished, key=lambda t: t.id)[:excess]:
                del self._tasks[t.id]

    def submit(self, action: str, fn, description: str = "") -> Task:
        """Run ``fn()`` under its own cancellable job group."""
        from pyspark import InheritableThread

        task = Task(next(_ids), action, description)
        with self._lock:
            self._prune_locked()
            self._tasks[task.id] = task
        gid = f"task-{task.id}"
        sc = self.spark.sparkContext

        def run():
            sc.setJobGroup(gid, f"{action} {description}",
                           interruptOnCancel=True)
            try:
                task.result = fn()
                with task._slock:
                    # 'running' OR 'cancelling': the work completed
                    # before cancellation landed — the reference reports
                    # such tasks as completed, not cancelled
                    task.status = "done"
            except BaseException as e:  # noqa: BLE001 - recorded, not lost
                # only an exception observed AFTER cancel() flipped the
                # status is a cancellation; matching on the message text
                # would misreport a genuine failure that merely mentions
                # 'cancelled' (e.g. a remote peer's error) as a user cancel
                with task._slock:
                    if task.status == "cancelling":
                        task.status = "cancelled"
                        err = TaskCancelledException(
                            f"task {task.id} cancelled")
                        # chain the observed exception: a genuine failure
                        # that merely RACED the cancel must stay
                        # diagnosable, not be discarded (round-4 review)
                        err.__cause__ = e
                        task.error = err
                    else:
                        task.status = "failed"
                        task.error = e
            finally:
                task._done.set()

        # InheritableThread propagates the job-group local property in
        # pinned-thread mode (plain threading.Thread would not)
        t = InheritableThread(target=run)
        t.daemon = True
        task._thread = t
        t.start()
        return task

    def list(self) -> list[dict]:
        """`GET _tasks` — every registered task, running first."""
        with self._lock:
            infos = [t.info() for t in self._tasks.values()]
        return sorted(infos, key=lambda i: (i["status"] != "running",
                                            i["id"]))

    def get(self, task_id: int) -> Task:
        return self._tasks[task_id]

    def cancel(self, task_id: int, grace_s: float = 60.0) -> bool:
        """`POST _tasks/{id}/_cancel` — cooperative: running Spark stages
        are interrupted, the task flips to cancelled once its thread
        observes the SparkException. Cancellation is PERSISTENT like the
        reference's CancellableTask flag: ``cancelJobGroup`` only hits
        jobs active at call time, so a canceller thread re-issues it
        until the task TERMINATES — after ``grace_s`` it backs off from
        the tight 0.2 s loop to one re-issue per 2 s, but never lapses
        while the task is alive (a fn doing long driver-side work before
        its first Spark job previously outlived the canceller and ran to
        completion after a True cancel — round-4 review). Returns False
        for finished tasks (the reference responds 'task is not
        cancellable / completed')."""
        task = self._tasks.get(task_id)
        if task is None:
            return False
        with task._slock:  # atomic check-and-flip vs the worker's finish
            if task.status != "running":
                return False
            task.status = "cancelling"
        sc = self.spark.sparkContext
        gid = f"task-{task.id}"

        def canceller():
            deadline = time.monotonic() + grace_s
            while not task._done.is_set():
                sc.cancelJobGroup(gid)
                task._done.wait(
                    0.2 if time.monotonic() < deadline else 2.0)

        t = threading.Thread(target=canceller, daemon=True)
        t.start()
        return True
