"""Lifecycle management for persisted intermediate relations.

Several operators (``near_dup_pairs``, ``minhash_lsh_candidates``,
``jaccard_pairs``, ``curate``) persist an intermediate relation that
their plan reads more than once — the shingle table, the LSH band
table — because an un-persisted second read replays the expensive
tokenize+md5 subtree.  A bare ``df.persist()`` with no matching
``unpersist`` leaks executor cache in a long-lived session: each
invocation pins another copy until LRU eviction.

``PersistScope`` closes the leak with two usage modes:

- **Caller-owned** (a service/session that calls operators many
  times): pass a scope in; the operator registers every persisted
  intermediate on it and returns a fully LAZY result.  The caller
  releases the scope (context manager or ``release()``) once the
  results are consumed::

      with PersistScope() as scope:
          pairs = near_dup_pairs(docs, scope=scope)
          pairs.write.parquet(out)
      # all intermediate caches freed here

- **Self-managed default** (``scope=None``): the operator persists
  into a private scope, eagerly materializes its (small,
  pairs-sized) result via ``localCheckpoint`` and releases the
  intermediates before returning.  After the call the only pinned
  storage is the result itself, which the ContextCleaner frees when
  the caller drops the DataFrame.  The cost of the default is
  eagerness (the job runs at call time, like any materialize) —
  callers composing larger lazy pipelines pass a scope instead.

At cluster scale the same role is played by materializing the
intermediate to a table (parquet, bucketed); ``PersistScope`` is the
in-session equivalent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


class PersistScope:
    """Tracks persisted DataFrames and releases them together.

    Re-entrant as a context manager; ``release()`` is idempotent.
    """

    def __init__(self) -> None:
        self._dfs: list[DataFrame] = []

    def persist(self, df: DataFrame) -> DataFrame:
        """Persist ``df`` (Spark's default storage level) and track it
        for release."""
        df = df.persist()
        self._dfs.append(df)
        return df

    @property
    def tracked(self) -> int:
        return len(self._dfs)

    def release(self, blocking: bool = True) -> None:
        """Unpersist every tracked DataFrame.  ``blocking=True`` waits
        for the blocks to be dropped (deterministic for tests);
        services freeing caches opportunistically can pass False.

        A stopped session is tolerated (its caches died with it);
        any other unpersist failure re-raises — swallowing it would
        silently reintroduce the leak this class exists to prevent.
        Every tracked DataFrame is attempted even when one fails (an
        early raise would leave the rest pinned — the partial-leak the
        class exists to close); the first live-session failure is
        re-raised after the sweep completes."""
        dfs, self._dfs = self._dfs, []
        first_failure: Exception | None = None
        for df in dfs:
            try:
                df.unpersist(blocking=blocking)
            except Exception as exc:
                sc = getattr(df.sparkSession, "_sc", None)
                jsc = getattr(sc, "_jsc", None) if sc is not None else None
                if jsc is not None and first_failure is None:
                    first_failure = exc  # session alive: a real failure
        if first_failure is not None:
            raise first_failure

    def __enter__(self) -> "PersistScope":
        return self

    def __exit__(self, *exc) -> None:
        self.release()


def materialize_release(df: DataFrame, scope: PersistScope) -> DataFrame:
    """The self-managed ending: eagerly materialize ``df`` with
    ``localCheckpoint`` (truncates lineage, so the result no longer
    depends on the scope's caches), then release the scope.  Skips the
    checkpoint when the scope tracked nothing (the plan never read a
    cache, so laziness costs nothing).

    ``localCheckpoint`` stores the result on the executors (lost on
    executor failure — acceptable for an interactive/default path;
    jobs needing fault-tolerant lineage should pass a caller-owned
    scope and keep the plan lazy)."""
    if scope.tracked == 0:
        return df
    out = df.localCheckpoint(eager=True)
    scope.release()
    return out
