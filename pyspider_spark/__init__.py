"""pyspider_spark — a from-scratch, PySpark-native re-implementation of the
computational semantics of binux/pyspider (URL frontier, priority scheduling,
politeness, dedup, link extraction, result accumulation) as iterated
DataFrame jobs over snapshot tables.

Reference semantics studied (NOT ported) from /root/reference:
  - pyspider/scheduler/task_queue.py   (ordering, merge-on-put, lease)
  - pyspider/scheduler/scheduler.py    (fair select, retry, age/itag, pause)
  - pyspider/scheduler/token_bucket.py (politeness)
  - pyspider/libs/url.py, base_handler.py (canonicalization, taskid)
  - pyspider/fetcher/tornado_fetcher.py (fetch result shape, robots, errors)

Design: pyspider's 4 processes + 5 queues + 3 in-memory heaps collapse into
one iterated DataFrame DAG over a partitioned `frontier` table; "which queue
a task is in" is a predicate, heap-pop order is a window rank, queue handoff
is a table snapshot commit. See SURVEY.md §7.
"""

__version__ = "0.1.0"

from pyspider_spark.session import get_spark  # noqa: F401
