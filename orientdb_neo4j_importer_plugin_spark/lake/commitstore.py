"""Storage seam for the snapshot commit protocol.

``SnapshotTable._write_snapshot`` serializes multi-writer commits with
three primitives — an exclusive CLAIM of the next version number (put an
immutable version object if absent), a FENCED pointer ADVANCE (compare-
and-swap the current-version pointer from parent to child), and a short
MUTEX around {claim, orphan reclaim, swap}. This module puts those
primitives behind one interface so the protocol is portable to any store
that offers conditional writes:

* ``LocalFSCommitStore`` (default, fully tested here): hard-link
  put-if-absent, inode identity as the fencing token, flock critical
  section. Exactly the protocol the multi-process suites exercise.
* ``ObjectStoreCommitStore`` (tested against a local conditional-object
  simulation): the same protocol over {put-if-absent, put-if-match,
  versioned head} — S3 ``If-None-Match:*`` / ``If-Match: <etag>``, GCS
  ``ifGenerationMatch=0`` / ``=<gen>``, ABS ``If-None-Match`` — with a
  TTL lease standing in for flock. Binding it to a real bucket is a
  ~20-line client adapter (see ``ObjectClient``); untestable in this
  environment (no object store, no cloud SDKs), so the shipped client is
  ``DirObjectClient``, a faithful local simulation of the conditional
  semantics used by the cross-writer tests.

Reference analogue: the reference serializes all writes through a
single-thread executor (``ONeo4jImporterHandler.java:35``); here
serialization is optimistic and store-mediated so ANY number of writers
on different machines converge.
"""

from __future__ import annotations

import contextlib
import hashlib
import os
import time
import uuid
from typing import Protocol


class CommitStoreError(Exception):
    """Store-level failure that is NOT a lost race (races are reported as
    None/False returns, not exceptions)."""


class CommitStore(Protocol):
    """Serialization primitives for the snapshot commit protocol.

    Tokens are opaque identities of the object a ``claim_version`` wrote
    (local FS: inode; object store: etag/generation). The ONLY operations
    that must be atomic are ``claim_version`` (create-if-absent) and
    ``swap_pointer`` (value CAS); everything else is reads.
    """

    def read_pointer(self, path: str) -> int | None:
        """Current pointer value, or None if the pointer doesn't exist."""
        ...

    def claim_version(self, path: str, content: str) -> object | None:
        """Atomically create `path` with `content` iff absent. Returns an
        opaque identity token for OUR object, or None if `path` exists."""
        ...

    def claim_is_ours(self, path: str, token: object) -> bool:
        """Fencing recheck: does `path` still hold the object `token`
        identifies (it was neither reclaimed nor replaced)?"""
        ...

    def claim_age(self, path: str) -> float | None:
        """Seconds since the claim at `path` was written, or None if the
        store cannot (or will not) date it — a None claim is NEVER
        treated as orphaned."""
        ...

    def delete_claim(self, path: str) -> None:
        """Remove a claim object (orphan reclaim). Missing path is a no-op."""
        ...

    def swap_pointer(self, path: str, version: int, expected: int | None) -> bool:
        """Compare-and-swap the pointer: advance to `version` iff its
        current value is `expected` (None = pointer must not exist yet).
        False on value mismatch — the caller lost a race."""
        ...

    @contextlib.contextmanager
    def mutex(self, scope: str, timeout: float = 10.0):
        """Critical section around {claim, reclaim, swap} for tables under
        `scope`. May raise TimeoutError when the section cannot be entered."""
        ...


# ---------------------------------------------------------------------------
# Local filesystem (default)
# ---------------------------------------------------------------------------


class LocalFSCommitStore:
    """The original protocol, verbatim: hard-link claims (exclusive
    create), inode fencing tokens, flock mutex (kernel-released on crash,
    so no stale-lock heuristics and no break-TOCTOU)."""

    def read_pointer(self, path: str) -> int | None:
        try:
            with open(path) as fh:
                return int(fh.read().strip())
        except FileNotFoundError:
            return None

    def claim_version(self, path: str, content: str) -> int | None:
        tmp = path + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as fh:
            fh.write(content)
        try:
            os.link(tmp, path)
        except FileExistsError:
            return None
        finally:
            token = os.stat(tmp).st_ino
            os.remove(tmp)
        return token

    def claim_is_ours(self, path: str, token: object) -> bool:
        try:
            return os.stat(path).st_ino == token
        except FileNotFoundError:
            return False

    def claim_age(self, path: str) -> float | None:
        try:
            return time.time() - os.path.getmtime(path)
        except FileNotFoundError:
            return None

    def delete_claim(self, path: str) -> None:
        try:
            os.remove(path)
        except FileNotFoundError:
            pass

    def swap_pointer(self, path: str, version: int, expected: int | None) -> bool:
        # caller holds mutex(); the read-compare-replace is race-free there
        if self.read_pointer(path) != expected:
            return False
        tmp = path + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as fh:
            fh.write(str(version))
        os.replace(tmp, path)  # atomic swap = the commit
        return True

    @contextlib.contextmanager
    def mutex(self, scope: str, timeout: float = 10.0):
        """Microsecond-critical-section mutex around {version claim, pointer
        swap, orphan reclaim}. Held only across a handful of metadata file
        ops (never data IO).

        Kernel-mediated advisory lock (flock): released automatically when
        the holder's fd closes — including a process crash — so there are
        NO stale-lock heuristics, and a merely-stalled holder can never
        have the lock broken out from under it mid-section (any file-based
        break-after-timeout scheme reintroduces a TOCTOU between the
        staleness check and the break). Waiters that exhaust `timeout`
        raise TimeoutError: failing a commit is safe, breaking mutual
        exclusion is not."""
        import fcntl

        lock = os.path.join(scope, "_swap.lock")
        fd = os.open(lock, os.O_CREAT | os.O_RDWR)
        t0 = time.time()
        try:
            while True:
                try:
                    fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
                    break
                except (BlockingIOError, InterruptedError):
                    if time.time() - t0 > timeout:
                        raise TimeoutError("pointer mutex timeout") from None
                    time.sleep(0.005)
            yield
        finally:
            os.close(fd)  # releases the flock


# ---------------------------------------------------------------------------
# Conditional object store
# ---------------------------------------------------------------------------


class ObjectClient(Protocol):
    """Minimal conditional-object API an object store must provide.

    Real-store bindings (env-blocked here: no bucket, no SDK) map 1:1:

    =================  ============================  =========================
    method             S3                            GCS
    =================  ============================  =========================
    put_if_absent      PUT If-None-Match:*           insert ifGenerationMatch=0
    put_if_match       PUT If-Match:<etag>           insert ifGenerationMatch=g
    head               HEAD (ETag, Last-Modified)    objects.get (generation)
    get / delete       GET / DELETE                  get / delete
    =================  ============================  =========================
    """

    def put_if_absent(self, key: str, content: str) -> str | None:
        """Create iff absent; returns the new object's etag, else None."""
        ...

    def put_if_match(self, key: str, content: str, etag: str | None) -> str | None:
        """Replace iff the current etag matches (None = iff absent);
        returns the new etag, else None."""
        ...

    def head(self, key: str) -> tuple[str, float] | None:
        """(etag, last-modified epoch) or None if absent."""
        ...

    def get(self, key: str) -> str | None:
        ...

    def delete(self, key: str) -> None:
        ...

    def delete_if_match(self, key: str, etag: str) -> bool:
        """Delete iff the current etag matches (S3 DELETE If-Match / GCS
        delete ifGenerationMatch); False on mismatch or absence."""
        ...


class ObjectStoreCommitStore:
    """The commit protocol over conditional object writes.

    * claim  = ``put_if_absent`` of the immutable version object; the
      fencing token is its etag.
    * swap   = value-checked ``put_if_match`` on the pointer object — the
      CAS both enforces the expected parent AND fences duplicate swaps
      (a stale writer's swap carries a stale pointer etag and fails).
    * mutex  = TTL lease object (``put_if_absent`` a lock key; expired
      lock keys are broken). Unlike flock, breaking a lease is a TIMING
      assumption — a writer pausing longer than `lease_ttl` inside the
      critical section could race a reclaim. Therefore orphan reclaim is
      DISABLED by default here (``reclaim_orphans=False``): an unexpired
      claim is then never deleted, the pointer CAS rejects duplicate
      swaps, and correctness needs no timing assumption at all — a
      crashed writer's orphan claim blocks that one version number until
      an operator removes it (or reclaim is explicitly enabled with a
      TTL safely above any plausible GC/VM pause).
    """

    def __init__(
        self,
        client: ObjectClient,
        lease_ttl: float = 30.0,
        reclaim_orphans: bool = False,
    ):
        self.client = client
        self.lease_ttl = lease_ttl
        self.reclaim_orphans = reclaim_orphans

    def read_pointer(self, path: str) -> int | None:
        got = self.client.get(path)
        return int(got.strip()) if got is not None else None

    def claim_version(self, path: str, content: str) -> str | None:
        return self.client.put_if_absent(path, content)

    def claim_is_ours(self, path: str, token: object) -> bool:
        got = self.client.head(path)
        return got is not None and got[0] == token

    def claim_age(self, path: str) -> float | None:
        if not self.reclaim_orphans:
            return None  # undatable => never treated as orphaned
        got = self.client.head(path)
        return time.time() - got[1] if got is not None else None

    def delete_claim(self, path: str) -> None:
        self.client.delete(path)

    def swap_pointer(self, path: str, version: int, expected: int | None) -> bool:
        got = self.client.head(path)
        if expected is None:
            if got is not None:
                return False
            return self.client.put_if_absent(path, str(version)) is not None
        cur = self.client.get(path)
        if cur is None or int(cur.strip()) != expected:
            return False
        etag = got[0] if got is not None else None
        return self.client.put_if_match(path, str(version), etag) is not None

    @contextlib.contextmanager
    def mutex(self, scope: str, timeout: float = 10.0):
        lock = scope.rstrip("/") + "/_swap.lease"
        me = uuid.uuid4().hex
        t0 = time.time()
        my_etag: str | None = None
        while True:
            got = self.client.put_if_absent(lock, me)
            if got is not None:
                my_etag = got
                break
            held = self.client.head(lock)
            if held is not None and time.time() - held[1] > self.lease_ttl:
                # expired lease: break it by CONDITIONALLY REPLACING it
                # with our own (put_if_match on the etag observed at the
                # staleness check). Exactly one of N concurrent breakers
                # wins the CAS and owns a FRESH lease; an unconditional
                # delete here would let a loser delete the winner's fresh
                # lease and both enter the critical section.
                got = self.client.put_if_match(lock, me, held[0])
                if got is not None:
                    my_etag = got
                    break
                continue  # someone else broke/renewed it first: re-check
            if time.time() - t0 > timeout:
                raise TimeoutError("commit lease timeout") from None
            time.sleep(0.005)
        try:
            yield
        finally:
            # conditional release: only OUR lease object (a breaker may
            # have replaced it after our own lease expired mid-section)
            if my_etag is not None:
                self.client.delete_if_match(lock, my_etag)


class DirObjectClient:
    """A directory-backed simulation of a conditional object store, used
    to test ``ObjectStoreCommitStore``'s protocol logic cross-process.

    Keys ARE filesystem paths and contents are stored verbatim at them —
    so a ``SnapshotTable`` whose commits go through this client is still
    readable by every direct metadata reader (snapshot_at, cdf planner,
    DuckDB twins). The conditional semantics a real store implements
    server-side are simulated with one server-wide flock; etags are
    content+nonce md5 hashes kept in `<path>.etag` sidecars (a plain file
    without a sidecar gets a content-derived etag, deterministically)."""

    def __init__(self, lock_dir: str):
        os.makedirs(lock_dir, exist_ok=True)
        self._lock_path = os.path.join(lock_dir, "_objsrv.lock")

    @contextlib.contextmanager
    def _srv(self):
        import fcntl

        fd = os.open(self._lock_path, os.O_CREAT | os.O_RDWR)
        try:
            fcntl.flock(fd, fcntl.LOCK_EX)
            yield
        finally:
            os.close(fd)

    @staticmethod
    def _etag_of(path: str) -> str | None:
        try:
            with open(path + ".etag") as fh:
                return fh.read().strip()
        except FileNotFoundError:
            pass
        try:
            with open(path, "rb") as fh:
                return hashlib.md5(fh.read()).hexdigest()
        except FileNotFoundError:
            return None

    def _write(self, path: str, content: str) -> str:
        nonce = uuid.uuid4().hex
        etag = hashlib.md5((nonce + content).encode()).hexdigest()
        tmp = path + f".tmp-{nonce}"
        with open(tmp, "w") as fh:
            fh.write(content)
        os.replace(tmp, path)
        with open(path + ".etag.tmp", "w") as fh:
            fh.write(etag)
        os.replace(path + ".etag.tmp", path + ".etag")
        return etag

    def put_if_absent(self, key: str, content: str) -> str | None:
        with self._srv():
            if os.path.exists(key):
                return None
            return self._write(key, content)

    def put_if_match(self, key: str, content: str, etag: str | None) -> str | None:
        with self._srv():
            if self._etag_of(key) != etag:
                return None
            return self._write(key, content)

    def head(self, key: str) -> tuple[str, float] | None:
        with self._srv():
            etag = self._etag_of(key)
            if etag is None:
                return None
            try:
                return etag, os.path.getmtime(key)
            except FileNotFoundError:
                return None

    def get(self, key: str) -> str | None:
        with self._srv():
            try:
                with open(key) as fh:
                    return fh.read()
            except FileNotFoundError:
                return None

    def delete(self, key: str) -> None:
        with self._srv():
            for p in (key, key + ".etag"):
                try:
                    os.remove(p)
                except FileNotFoundError:
                    pass

    def delete_if_match(self, key: str, etag: str) -> bool:
        with self._srv():
            if self._etag_of(key) != etag:
                return False
            for p in (key, key + ".etag"):
                try:
                    os.remove(p)
                except FileNotFoundError:
                    pass
            return True
