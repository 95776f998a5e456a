"""Swappable storage primitives behind the Iceberg-lite snapshot publish.

``pages._publish_snapshot`` is a compare-and-swap commit protocol
(reference util/cache.js:50-128 caches by content hash; real Iceberg
does optimistic CAS on the table pointer). It needs exactly three
storage behaviors, and WHICH calls implement them differs per store —
so they live behind this interface, with the local-FS implementation as
the default the sandbox runs, and the object-store mapping documented:

| primitive          | local FS (default)           | S3                                  | HDFS                               |
|--------------------|------------------------------|-------------------------------------|------------------------------------|
| create_exclusive   | open(O_CREAT|O_EXCL) + token | PUT with `If-None-Match: *`         | create(path, overwrite=false)      |
| atomic_swap        | rename(2) via os.replace     | single-key PUT (readers see old or  | rename (atomic in the NameNode)    |
|                    |                              | new object, never a torn one); the  |                                    |
|                    |                              | POINTER update additionally sends   |                                    |
|                    |                              | `If-Match: <etag read at parent     |                                    |
|                    |                              | check>` so the CAS itself is server-|                                    |
|                    |                              | side, closing the read-check-write  |                                    |
|                    |                              | window the local lock covers        |                                    |
| steal_stale        | claim file + rename + verify | DELETE with `If-Match: <etag>`      | rename to a graveyard name         |
|                    | (single winner; see below)   | (atomic conditional delete — no ABA)|                                    |
| release            | token-verified remove        | DELETE with `If-Match`              | token-verified delete              |

Single-winner contract for ``steal_stale(path, observed_token)``: when N
writers concurrently try to steal the same observed lock instance, AT
MOST ONE returns True; none may ever delete a lock instance other than
the observed one. The local implementation enforces this with an
O_EXCL *claim file* keyed by the observed token (exactly one stealer
per instance proceeds past it), then rename-to-graveyard + token verify
(the renamed file is re-read; on mismatch — the observed lock was
released and a fresh one acquired between the caller's read and the
rename — the fresh lock is restored with link(2), which fails rather
than clobber if a third writer acquired meanwhile).

Residual windows, stated honestly: pure POSIX has no compare-and-delete,
so between the claim and the rename a release+reacquire can slip in; the
verify+restore shrinks the damage to a microsecond link(2) race whose
failure raises ``StealRestoreError`` — which FLAGS the bad interleave at
the stealer so its caller retries from a clean read, but does not undo
an admission that already happened on the displaced writers' side; a
stealer crashing between rename and restore likewise strands the
displaced fresh lock until its TTL. release()'s read-token-then-remove
pair is similarly non-atomic (see its comment). These are properties of
POSIX, not of the protocol: the S3 backend has NO such window — `DELETE
If-Match` is the
atomic conditional delete this interface is shaped around; HDFS gets the
same via namenode-atomic rename. The single-winner property is tested
against the INTERFACE (fault-injecting shim, duplicate stealers, delayed
swaps) in tests/test_commit_backend.py, not against filesystem timing.
"""

from __future__ import annotations

import os
import threading
import time


# a steal claim outliving this is a crashed stealer (live claims exist
# for the rename+verify+remove window, i.e. milliseconds)
ORPHAN_CLAIM_TTL_SEC = 60.0


class StealRestoreError(RuntimeError):
    """steal_stale renamed a fresh lock away (ABA interleave) and could
    not restore it because a third writer already re-acquired the path.
    Mutual exclusion is in doubt: fail the commit loudly so the caller
    retries from a clean read instead of publishing over a live writer."""


class CommitBackend:
    """Interface; see module docstring for the per-store mapping."""

    def create_exclusive(self, path: str, token: str) -> bool:
        """Atomically create `path` holding `token`. False if it exists."""
        raise NotImplementedError

    def read_token(self, path: str) -> str | None:
        """Current lock token, or None if the lock vanished."""
        raise NotImplementedError

    def age_sec(self, path: str) -> float | None:
        """Seconds since the lock was created, or None if it vanished."""
        raise NotImplementedError

    def steal_stale(self, path: str, observed_token: str) -> bool:
        """Remove the SPECIFIC observed lock instance. Single winner."""
        raise NotImplementedError

    def release(self, path: str, token: str) -> bool:
        """Remove the lock iff it still holds `token` (never a stealer's
        fresh lock). True if this call removed it."""
        raise NotImplementedError

    def atomic_swap(self, tmp_path: str, dst_path: str) -> None:
        """Publish tmp at dst; readers see old or new, never torn."""
        raise NotImplementedError


class LocalFSBackend(CommitBackend):
    def create_exclusive(self, path: str, token: str) -> bool:
        try:
            fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            return False
        try:
            os.write(fd, token.encode())
        finally:
            os.close(fd)
        return True

    def read_token(self, path: str) -> str | None:
        try:
            with open(path) as f:
                return f.read().strip()
        except FileNotFoundError:
            return None

    def age_sec(self, path: str) -> float | None:
        try:
            return time.time() - os.path.getmtime(path)
        except FileNotFoundError:
            return None

    def steal_stale(self, path: str, observed_token: str) -> bool:
        # one claim per observed instance: O_EXCL admits exactly one
        # stealer for THIS token; losers return False and re-poll. The
        # claim is keyed by the token so a LATER stale instance gets its
        # own claim rather than being blocked by a crashed stealer's
        # leftover (the leftover is also removed in the finally).
        claim = f"{path}.claim-{observed_token or 'empty'}"
        try:
            fd = os.open(claim, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            os.close(fd)
        except FileExistsError:
            # a live stealer holds the claim for microseconds (rename +
            # verify + remove); a claim this old is a stealer that died
            # between creating it and its finally-remove. Without healing
            # it, THIS token's instance can never be stolen and every
            # waiter times out forever. Removing it re-opens O_EXCL to
            # exactly one new claimant; racing the owner's own remove is
            # benign (FileNotFoundError ignored). S3 mapping: a lifecycle
            # TTL on claim objects, or DELETE + conditional re-PUT.
            try:
                if time.time() - os.path.getmtime(claim) > ORPHAN_CLAIM_TTL_SEC:
                    os.remove(claim)
            except FileNotFoundError:
                pass
            return False
        try:
            grave = f"{path}.stale-{observed_token or 'empty'}"
            try:
                os.rename(path, grave)
            except FileNotFoundError:
                return False  # owner released (or won't-happen 2nd stealer)
            if (self.read_token(grave) or "") != observed_token:
                # ABA: observed lock released and a FRESH one acquired
                # between the caller's read and our rename — restore it.
                # link(2) fails instead of clobbering if a third writer
                # re-acquired the path during this window.
                try:
                    os.link(grave, path)
                except FileExistsError:
                    raise StealRestoreError(
                        f"displaced a fresh lock at {path} and the path was "
                        "re-acquired before restore; retry from a clean read"
                    )
                os.remove(grave)
                return False
            os.remove(grave)
            return True
        finally:
            try:
                os.remove(claim)
            except FileNotFoundError:
                pass

    def release(self, path: str, token: str) -> bool:
        # token check: if OUR lock was stolen (we stalled past the TTL
        # mid-publish), the file at `path` is the stealer's fresh lock —
        # removing it would re-admit a third writer (the exact bug this
        # method exists to prevent). The read->remove pair is not atomic;
        # the window requires a second steal of a lock we already held
        # past the TTL, within microseconds — S3's DELETE If-Match closes
        # it server-side.
        if self.read_token(path) != token:
            return False
        try:
            os.remove(path)
        except FileNotFoundError:
            return False
        return True

    def atomic_swap(self, tmp_path: str, dst_path: str) -> None:
        os.replace(tmp_path, dst_path)


class MemoryConditionalPutBackend(CommitBackend):
    """The S3 column of the mapping table, as an executable contract:
    a simulated object store whose conditional operations are
    server-side atomic. Lock objects live in one mutex-guarded dict;
    every conditional op evaluates its condition AND applies its effect
    under the mutex — exactly the atomicity S3 gives `PUT
    If-None-Match: *` (create_exclusive) and `DELETE If-Match`
    (steal_stale / release). The condition keys on the object's content
    token, which matches S3 where the ETag of a simple PUT is the MD5
    of the body: conditioning on the observed token IS conditioning on
    the etag of the observed instance.

    Consequences the property suite verifies against BOTH backends
    (tests/test_commit_backend.py parameterizes every contract test):
    steal_stale and release are each ONE compare-and-delete, so this
    backend has no claim file, no graveyard, no restore window and no
    ``StealRestoreError`` path — the POSIX residual windows documented
    above simply do not exist here. A future real S3Backend drops into
    the same suite with zero new test logic.

    atomic_swap stays on the filesystem: snapshot JSON bodies are
    written by the publisher as real files and read back by pollers,
    and a single-key PUT's old-or-new visibility is what os.replace
    provides locally — only the LOCK primitives, where POSIX and the
    conditional store genuinely differ, are modeled in memory."""

    def __init__(self) -> None:
        self._mu = threading.Lock()
        # path -> (token, put_time); the token doubles as the etag
        self._objs: dict[str, tuple[str, float]] = {}

    def create_exclusive(self, path: str, token: str) -> bool:
        with self._mu:  # PUT If-None-Match: *
            if path in self._objs:
                return False
            self._objs[path] = (token, time.time())
            return True

    def read_token(self, path: str) -> str | None:
        with self._mu:
            o = self._objs.get(path)
            return None if o is None else o[0]

    def age_sec(self, path: str) -> float | None:
        with self._mu:
            o = self._objs.get(path)
            return None if o is None else time.time() - o[1]

    def _conditional_delete(self, path: str, token: str) -> bool:
        with self._mu:  # DELETE If-Match: <etag of the observed instance>
            o = self._objs.get(path)
            if o is None or o[0] != token:
                return False
            del self._objs[path]
            return True

    def steal_stale(self, path: str, observed_token: str) -> bool:
        return self._conditional_delete(path, observed_token)

    def release(self, path: str, token: str) -> bool:
        return self._conditional_delete(path, token)

    def atomic_swap(self, tmp_path: str, dst_path: str) -> None:
        os.replace(tmp_path, dst_path)
