"""Single-writer lease for the persisted stores (band index, docs
store, groups store, vector index).

Why this exists: every mutating verb on a persisted store assumes it
is alone.  ``recenter_vector_index`` / ``compact_* --reshard`` read a
snapshot, rewrite it into ``<store>.compacting``, and swap the whole
directory — an append landing between the read and the swap is
SILENTLY DESTROYED by the swap (not an error: the appended rows
simply aren't in the compacted copy that replaces the live dir).
The repo's own CLIs set the trap: ingest advisories tell the user to
run ``compact`` / ``recenter``, which they will run while a streaming
ingest loop is live.  Crash-window recovery (``_recover_compact_swap``)
handles a DEAD writer; this module handles a CONCURRENT one.

Contract (stated here, enforced by every mutating verb):

* **Single writer per store root.**  Every verb that mutates a store
  (ingest/append/build, compact, reshard, recenter, rebuild,
  groups-update) takes an exclusive lease on the store root before
  touching it and releases it on exit.  A second mutator — any verb,
  any process — REFUSES loudly, naming the holder (pid, host, verb,
  age), instead of interleaving.  The streaming twins take the lease
  once per run (at stream start, released when the query terminates),
  so their per-batch inner verbs re-enter rather than re-acquire.
* **Readers are not locked.**  Probes/loads never block and never
  take the lease; they rely on the stores' existing read-time
  guarantees (atomic whole-dir swaps, at-least-once append residue
  tolerated or compact-repaired).
* **Lease placement.**  The lease is the SIBLING file
  ``<store>.lock`` — deliberately outside the store directory, so the
  whole-dir compact/recenter swaps (which rename the store root
  itself) never move, drop, or copy the lease, and parquet listers
  never see it.
* **Stale leases.**  A crashed writer leaves its lease behind.  A
  lease is stale — and is taken over atomically — when (a) it was
  minted on THIS host and its pid is no longer alive, or (b) it is
  older than ``stale_after_s`` (default 1 h; covers foreign-host
  leases where the pid cannot be probed).  Takeover races resolve by
  ``os.rename`` atomicity: exactly one contender wins the rename of
  the stale lease to a tombstone and retries the O_EXCL create.
  Two takeover-safety rules close the check-then-act windows:
  (1) after winning the rename, the contender RE-READS the tombstone
  and, if its (pid, ts) is not the stale holder it judged, restores
  it via ``os.link`` (atomic, fails-if-exists) — a freshly minted
  successor lease is never evicted by a contender acting on a stale
  observation; (2) ``release()`` re-reads the live lockfile and
  unlinks only its own mint — a writer that stalled past
  ``stale_after_s`` and was taken over never deletes its successor's
  lease when it finally resumes.  Residual window: if a THIRD
  contender mints in the microseconds between a mistaken eviction
  and its link-restore, the restore loses and the evicted holder
  runs unleased until it finishes (its release is a no-op); this
  needs a triple race inside one syscall window and is accepted for
  the LOCAL/POSIX rendition.
* **Re-entry scope (process-level, deliberately).**  Re-entry is
  keyed by store path PER PROCESS, not per thread or per call tree:
  Structured Streaming delivers foreachBatch on a different thread
  than the one that started the query, so the streaming twins' inner
  per-batch verbs must re-enter the run-scoped lease whichever
  thread they land on.  The corollary is stated honestly: two
  UNRELATED concurrent verbs in the SAME driver process (a compact
  launched from another thread while a stream runs) deepen the lease
  and interleave rather than refuse — cross-PROCESS writers are the
  contract; same-process callers are presumed one coordinated
  program.  The unlink happens when the depth reaches zero,
  whichever lease object's release gets there (out-of-order
  releases don't leak the lockfile).
* **Local-filesystem scope.**  Like the swap machinery beside it
  (dedup.py ``_swap_compacted``), this is the LOCAL/POSIX rendition;
  at production scale the stores are transactional tables and the
  single-writer property comes from the table format's commit
  protocol (optimistic concurrency / lock service), not a lockfile.

Reference parity note: the reference pipeline
(/root/reference/README.md) is batch scripts run by one operator and
has no concurrent-writer story; this is part of the beyond-reference
operational surface.
"""

from __future__ import annotations

import json
import os
import socket
import threading
import time
from contextlib import ExitStack, contextmanager

__all__ = [
    "StoreLockedError",
    "store_write_lock",
    "store_write_locks",
    "acquire_store_write_lock",
    "locked_store_verb",
    "StoreLease",
    "lock_file_for",
    "read_lock_holder",
]

#: age past which ANY lease (including a foreign-host one whose pid we
#: cannot probe) is presumed abandoned and may be taken over.  Long
#: enough that no legitimate local-mode verb outlives it; a cluster
#: deployment pushing multi-hour compactions should raise it.
DEFAULT_STALE_AFTER_S = 3600.0

# process-local re-entry registry: abspath(store) -> {"depth", "lock_file",
# "mint"}.  Process-level (not thread-level) on purpose: Structured
# Streaming delivers foreachBatch on a different thread than the one
# that started the query, and the streaming twins hold the lease across
# batches — the inner per-batch verbs must RE-ENTER the run-scoped
# lease, whichever thread they land on.  "mint" pins the (pid, ts) this
# process wrote into the lockfile so release can prove ownership before
# unlinking (a successor that took over our stale lease is never
# deleted by our late release).
_HELD: dict[str, dict] = {}
_HELD_GUARD = threading.Lock()


class StoreLockedError(ValueError):
    """Another writer holds the store lease.  ValueError subclass so
    the CLIs' existing refusal handlers print it as a loud refusal
    rather than a traceback."""


def lock_file_for(store_path: str) -> str:
    """The sibling lease path for a store root (normalized)."""
    return os.path.abspath(store_path).rstrip("/") + ".lock"


def _read_payload(lock_path: str) -> dict | None:
    """Best-effort read of a lease payload at an explicit path (None
    when absent or unreadable mid-write)."""
    try:
        with open(lock_path, "r", encoding="utf-8") as f:
            return json.load(f)
    except (FileNotFoundError, json.JSONDecodeError, OSError):
        return None


def read_lock_holder(store_path: str) -> dict | None:
    """Best-effort read of the current lease payload (None when the
    store is unlocked or the payload is unreadable mid-write)."""
    return _read_payload(lock_file_for(store_path))


def _same_mint(a: dict | None, b: dict | None) -> bool:
    """Two lease payloads describe the SAME mint iff (pid, ts) match —
    ts is the float minted at acquire time, unique per mint in
    practice (and pid disambiguates the rest)."""
    if a is None or b is None:
        return False
    return a.get("pid") == b.get("pid") and a.get("ts") == b.get("ts")


def _pid_alive(pid: int) -> bool:
    try:
        os.kill(pid, 0)
    except ProcessLookupError:
        return False
    except (PermissionError, OSError):
        return True  # exists, not ours to signal
    return True


def _lease_age_s(lock_file: str, holder: dict | None) -> float:
    ts = None
    if isinstance(holder, dict):
        ts = holder.get("ts")
    if not isinstance(ts, (int, float)):
        try:
            ts = os.path.getmtime(lock_file)
        except OSError:
            return 0.0
    return max(0.0, time.time() - float(ts))


def _is_stale(lock_file: str, holder: dict | None, stale_after_s: float) -> bool:
    age = _lease_age_s(lock_file, holder)
    if holder is not None and holder.get("host") == socket.gethostname():
        pid = holder.get("pid")
        if isinstance(pid, int) and not _pid_alive(pid):
            return True  # same host, writer dead: stale regardless of age
    # foreign host / unreadable payload: only age can prove abandonment
    return age > stale_after_s


class StoreLease:
    """A held exclusive write lease.  ``release()`` is idempotent.
    Whichever lease object's release drops the process re-entry depth
    to zero performs the unlink (out-of-order release of an outer
    lease while an inner re-entered one is live does NOT leak the
    lockfile), and the unlink is OWNERSHIP-CHECKED: the live payload
    must be this process's own mint, so a successor that legitimately
    took over a stale lease is never deleted by a late release."""

    def __init__(self, store_path: str, lock_file: str, reentered: bool):
        self.store_path = store_path
        self.lock_file = lock_file
        self._reentered = reentered
        self._released = False

    def release(self) -> None:
        if self._released:
            return
        self._released = True
        key = os.path.abspath(self.store_path)
        with _HELD_GUARD:
            ent = _HELD.get(key)
            if ent is None:
                return
            ent["depth"] -= 1
            if ent["depth"] > 0:
                return
            _HELD.pop(key, None)
            lock_file, mint = ent["lock_file"], ent["mint"]
        current = _read_payload(lock_file)
        if current is not None and not _same_mint(current, mint):
            # a contender judged our lease stale (we stalled past
            # stale_after_s) and minted its own: the lockfile is the
            # SUCCESSOR's live lease — deleting it would silently
            # reopen the single-writer window for a third verb
            return
        try:
            os.unlink(lock_file)
        except FileNotFoundError:
            pass


def acquire_store_write_lock(
    store_path: str,
    verb: str,
    *,
    stale_after_s: float = DEFAULT_STALE_AFTER_S,
) -> StoreLease:
    """Take the exclusive write lease for ``store_path`` (O_CREAT |
    O_EXCL on the sibling ``<store>.lock``), or raise
    ``StoreLockedError`` naming the holder.  Re-entrant within this
    process: a verb running under an already-held lease (the
    streaming twins' per-batch inner calls, ingest's nested
    groups-store update) deepens it instead of refusing."""
    key = os.path.abspath(store_path)
    lock_file = lock_file_for(store_path)
    with _HELD_GUARD:
        ent = _HELD.get(key)
        if ent is not None:
            ent["depth"] += 1
            return StoreLease(store_path, lock_file, reentered=True)

    parent = os.path.dirname(lock_file)
    if parent:
        os.makedirs(parent, exist_ok=True)
    mint = {
        "pid": os.getpid(),
        "host": socket.gethostname(),
        "verb": verb,
        "acquired_at": time.strftime("%Y-%m-%dT%H:%M:%S%z"),
        "ts": time.time(),
    }
    payload = json.dumps(mint).encode("utf-8")

    for _ in range(64):  # bounded: each retry either creates or evicts
        try:
            fd = os.open(lock_file, os.O_CREAT | os.O_EXCL | os.O_WRONLY, 0o644)
        except FileExistsError:
            holder = read_lock_holder(store_path)
            if holder is None and not os.path.exists(lock_file):
                # lost a race with a RELEASING holder: the file
                # vanished between O_EXCL and the holder read.  One
                # more O_EXCL attempt will succeed — retrying here is
                # strictly better than refusing with a pid='?' ghost
                continue
            if _is_stale(lock_file, holder, stale_after_s):
                # atomic takeover: one contender wins the rename, the
                # rest lose with FileNotFoundError and retry against
                # whatever lease the winner mints
                tomb = f"{lock_file}.stale.{os.getpid()}.{threading.get_ident()}"
                try:
                    os.rename(lock_file, tomb)
                except (FileNotFoundError, OSError):
                    continue
                evicted = _read_payload(tomb)
                if evicted is not None and not _same_mint(evicted, holder):
                    # check-then-rename TOCTOU: between our staleness
                    # judgment and the rename, another contender
                    # completed ITS takeover and minted a fresh lease —
                    # what we grabbed is that valid successor, not the
                    # stale holder.  Restore it atomically (link fails
                    # if a third contender already minted; then the
                    # restored lease loses — documented residual) and
                    # re-evaluate against the live state.
                    try:
                        os.link(tomb, lock_file)
                    except (FileExistsError, OSError):
                        pass
                    try:
                        os.unlink(tomb)
                    except FileNotFoundError:
                        pass
                    continue
                try:
                    os.unlink(tomb)
                except FileNotFoundError:
                    pass
                continue
            if holder is None and not os.path.exists(lock_file):
                continue  # vanished mid-check: same lost-release race
            who = holder or {}
            age = _lease_age_s(lock_file, holder)
            raise StoreLockedError(
                f"store {store_path!r} is write-locked by "
                f"verb={who.get('verb', '?')!r} pid={who.get('pid', '?')} "
                f"host={who.get('host', '?')!r} (held {age:.0f}s, since "
                f"{who.get('acquired_at', '?')}): refusing to mutate "
                "concurrently — a compact/recenter/reshard swap would "
                "silently destroy this write (single-writer contract, "
                "operators/store_lock.py). Wait for the holder to "
                f"finish, or remove {lock_file_for(store_path)!r} if it "
                "is known dead."
            )
        else:
            try:
                os.write(fd, payload)
            finally:
                os.close(fd)
            with _HELD_GUARD:
                _HELD[key] = {
                    "depth": 1,
                    "lock_file": lock_file,
                    "mint": {"pid": mint["pid"], "ts": mint["ts"]},
                }
            return StoreLease(store_path, lock_file, reentered=False)
    raise StoreLockedError(
        f"store {store_path!r}: could not win the write lease after "
        "repeated stale-lease evictions (livelocked contenders?)"
    )


@contextmanager
def store_write_lock(
    store_path: str,
    verb: str,
    *,
    stale_after_s: float = DEFAULT_STALE_AFTER_S,
):
    """Context-managed ``acquire_store_write_lock``."""
    lease = acquire_store_write_lock(
        store_path, verb, stale_after_s=stale_after_s
    )
    try:
        yield lease
    finally:
        lease.release()


@contextmanager
def store_write_locks(
    paths: list[str | None],
    verb: str,
    *,
    stale_after_s: float = DEFAULT_STALE_AFTER_S,
):
    """Lease several store roots for one multi-store verb (e.g.
    verified ingest mutates band + docs + groups).  Nones are skipped;
    paths are acquired in sorted-abspath order so two multi-store
    verbs can never deadlock-by-ordering (they refuse, but refusing on
    the FIRST contended store keeps the failure prompt)."""
    todo = sorted(
        {os.path.abspath(p) for p in paths if p},
    )
    with ExitStack() as stack:
        leases = [
            stack.enter_context(
                store_write_lock(p, verb, stale_after_s=stale_after_s)
            )
            for p in todo
        ]
        yield leases


def locked_store_verb(*path_params: str, verb: str | None = None):
    """Decorator form for the mutating verbs: take the single-writer
    lease on every store root named by ``path_params`` (parameter
    NAMES of the wrapped function; None-valued ones — optional stores
    — are skipped) for the duration of the call.  Re-entry semantics
    come from ``store_write_locks``, so a decorated verb calling
    another decorated verb on the same store (ingest → groups update,
    streaming batch under a run-scoped lease) deepens the lease
    instead of refusing against itself."""
    import functools
    import inspect

    def deco(fn):
        sig = inspect.signature(fn)
        label = verb or fn.__name__

        @functools.wraps(fn)
        def wrapper(*args, **kwargs):
            ba = sig.bind(*args, **kwargs)
            ba.apply_defaults()
            paths = [ba.arguments.get(p) for p in path_params]
            with store_write_locks(paths, label):
                return fn(*args, **kwargs)

        return wrapper

    return deco
