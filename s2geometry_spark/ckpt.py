"""Eager localCheckpoint rotation with explicit release.

Iterative DataFrame operators (connected components' star rounds,
vectorize_tiles' quartet merges) must cut lineage every round —
without a checkpoint the plan nests one join deeper per iteration and
the planner blows up on long chains. ``DataFrame.localCheckpoint``
is the right tool (executor-local, no HDFS dir needed) but exposes NO
unpersist handle, so each round's materialized copy of the state would
pile up in executor storage for the session lifetime (a round-2 review
measured max_iters full vertex-label copies on long-diameter graphs).

The workaround — shared here so a PySpark upgrade fails loudly in ONE
place (round-3 verdict hygiene item) — is to diff the SparkContext's
persistent-RDD map around the eager checkpoint call and unpersist the
previous round's RDD ids once the new round has materialized and every
reader of the old state has run.

Private-API contract (pinned by tests/test_ckpt.py): this touches
``sc._jsc.getPersistentRDDs()``, a JVM map of id -> JavaRDD with
``.keys()`` / ``.get(id)`` / per-RDD ``.unpersist()``. Verified on
PySpark 4.1; the version-guard test exercises the exact call chain so
an upgrade that changes it breaks the suite at the helper, not deep
inside an operator loop.

Correctness requirement: the diff trick assumes no OTHER thread is
creating persistent RDDs between the two snapshots — true for these
operators, which run their rounds serially on the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


class CheckpointRotator:
    """Tracks the RDD ids behind each eager localCheckpoint so previous
    rounds can be freed.

    Usage (iterative operator)::

        rot = CheckpointRotator(df.sparkSession.sparkContext)
        cur = rot.checkpoint(seed_df)          # round 0
        for _ in range(max_rounds):
            cur = rot.checkpoint(step(cur))    # reads previous round
            ... run anything that still reads the previous round ...
            rot.release_previous()             # free all but the newest
        return cur                             # newest stays cached:
                                               # it backs the result

    Error paths call release_all() so nothing is stranded.
    """

    def __init__(self, sc):
        self._sc = sc
        self._sets: list[set] = []  # RDD-id sets, oldest -> newest

    def _persistent_ids(self) -> set:
        return set(self._sc._jsc.getPersistentRDDs().keys())

    def checkpoint(self, df: DataFrame) -> DataFrame:
        """Eager localCheckpoint; records the RDD ids it pinned."""
        before = self._persistent_ids()
        out = df.localCheckpoint(eager=True)
        self._sets.append(self._persistent_ids() - before)
        return out

    def _unpersist(self, ids: set) -> None:
        jmap = self._sc._jsc.getPersistentRDDs()
        for rid in ids:
            if rid in jmap:
                jmap[rid].unpersist()

    def release_previous(self) -> None:
        """Free every tracked checkpoint EXCEPT the newest (which the
        next round — or the returned result — still reads)."""
        if not self._sets:
            return
        newest = self._sets.pop()
        for ids in self._sets:
            self._unpersist(ids)
        self._sets = [newest]

    def release_all(self) -> None:
        """Free everything, newest included (abort/error paths, or when
        the final checkpoint does not escape to the caller)."""
        for ids in self._sets:
            self._unpersist(ids)
        self._sets = []
