"""Client for `KVService` — the caller side of the reference's
JSON-payload Get RPC (`proto/proto/octopuspb.proto:12-20`: request and
response are each one JSON string; this client speaks the same payloads
over a plain socket). Stdlib-only; one persistent connection, requests
line-at-a-time, lazily re-established after any transport error so a
timed-out request's late reply can never be read as the NEXT request's
response (the stale connection is discarded, not drained).

``binary_keys=True`` targets a binary-key store: keys are base64-encoded
in requests and decoded from replies, matching the server's wire rule.
"""

from __future__ import annotations

import base64
import json
import socket

_ENTRY_FIELDS = ("value", "version", "expires_at")


class ChangeFeed(list):
    """One poll's change rows, carrying the snapshot seq the poll was
    pinned to as ``.as_of``. Compares equal to a plain list of the same
    rows. A checkpointing consumer MUST advance with ``feed.as_of`` (the
    interval actually shipped), never with a fresh ``snapshot()`` taken
    after the poll — writes landing in (as_of, fresh-snapshot] were not
    part of the poll and would be skipped forever.

    ``.epoch`` is the serving store's writer generation (fencing stamp):
    pass it to ``KVStore.apply_changes(source_epoch=feed.epoch)`` so a
    feed polled from a deposed primary is refused instead of applied.
    When the source promotes MID-poll the highest stamp seen wins (the
    poll is still as_of-pinned, so its rows predate the promotion)."""

    as_of: int | None = None
    epoch: int | None = None


def _debase(entry: dict) -> dict:
    out = {f: entry.get(f) for f in _ENTRY_FIELDS}
    if out["value"] is not None:
        out["value"] = base64.b64decode(out["value"])
    return out


class KVClient:
    def __init__(self, host: str, port: int, timeout: float = 60.0,
                 binary_keys: bool = False):
        self._addr = (host, port)
        self._timeout = timeout
        self._binary = binary_keys
        self._sock = None
        self._rfile = None
        self._connect()

    def _connect(self) -> None:
        self._sock = socket.create_connection(self._addr, timeout=self._timeout)
        self._rfile = self._sock.makefile("rb")

    def _teardown(self) -> None:
        try:
            if self._rfile is not None:
                self._rfile.close()
        except OSError:
            pass
        try:
            if self._sock is not None:
                self._sock.close()
        except OSError:
            pass
        self._rfile = self._sock = None

    def _enc_key(self, k):
        if k is None or not self._binary:
            return k
        return base64.b64encode(bytes(k)).decode("ascii")

    def _dec_key(self, k):
        return base64.b64decode(k) if self._binary else k

    def _call(self, req: dict) -> dict:
        if self._sock is None:
            self._connect()
        try:
            self._sock.sendall((json.dumps(req) + "\n").encode("utf-8"))
            line = self._rfile.readline()
        except Exception:
            # Timeout or transport fault: the connection's request/reply
            # pairing is now unknowable — drop it so the next call starts
            # on a fresh socket instead of reading a stale reply.
            self._teardown()
            raise
        if not line:
            self._teardown()
            raise ConnectionError("service closed the connection")
        reply = json.loads(line)
        if not reply.get("ok"):
            raise RuntimeError(f"service error: {reply.get('error')}")
        return reply

    def get(self, key, cf: str | None = None) -> dict | None:
        """{"value": bytes|None, "version": int, "expires_at": int} or
        None when the key is absent/tombstoned/expired. ``cf`` scopes the
        read to a column family (keys in user space both ways)."""
        req: dict = {"op": "get", "key": self._enc_key(key)}
        if cf is not None:
            req["cf"] = cf
        reply = self._call(req)
        return _debase(reply) if reply["found"] else None

    def mget(self, keys: list, cf: str | None = None) -> dict:
        req: dict = {"op": "mget", "keys": [self._enc_key(k) for k in keys]}
        if cf is not None:
            req["cf"] = cf
        reply = self._call(req)
        return {self._dec_key(k): _debase(e) for k, e in reply["entries"].items()}

    def scan(
        self,
        start=None,
        end=None,
        prefix=None,
        limit: int | None = None,
        page_size: int | None = None,
        cf: str | None = None,
    ) -> list:
        """Ordered range scan. With ``limit`` set, one request capped at
        that many rows against the live pinned view (the pre-paging
        contract). Without it, the FULL range streams back transparently
        key-paged — and SNAPSHOT-CONSISTENT: the client pins a snapshot
        seq first and every page reads as_of that seq, so a concurrent
        writer can never tear the stitched result (rows that never
        coexisted). ``limit`` and ``page_size`` are mutually exclusive."""
        if limit is not None and page_size is not None:
            raise ValueError(
                "pass either limit (single capped request) or page_size "
                "(paged full range), not both"
            )
        if page_size is not None and page_size < 1:
            raise ValueError(f"page_size must be >= 1, got {page_size}")
        base: dict = {
            "op": "scan",
            "start": self._enc_key(start),
            "end": self._enc_key(end),
            "prefix": self._enc_key(prefix),
        }
        if cf is not None:
            base["cf"] = cf
        if limit is not None:
            reply = self._call({**base, "limit": limit})
            return [
                {**_debase(r), "key": self._dec_key(r["key"])}
                for r in reply["rows"]
            ]
        base["as_of"] = self.snapshot()  # one consistent read point
        out: list = []
        after = None
        while True:
            req = dict(base)
            if page_size is not None:
                req["limit"] = page_size
            if after is not None:
                req["after_key"] = after
            reply = self._call(req)
            out.extend(
                {**_debase(r), "key": self._dec_key(r["key"])}
                for r in reply["rows"]
            )
            if not reply.get("more"):
                return out
            after = reply["rows"][-1]["key"]  # wire-encoded, pass back as-is

    def info(self) -> dict:
        return self._call({"op": "info"})["info"]

    def stats(self) -> dict:
        """Service-side request counters, rate-limiter drops, and the
        bounded slow-query log (never rate-limited itself)."""
        return self._call({"op": "stats"})

    # ------------------------------------------------- remote CDC consumer
    def snapshot(self) -> int:
        """The service store's current snapshot seq."""
        return int(self._call({"op": "snapshot"})["seq"])

    def hold(self, holder: str, seq: int | None = None) -> int:
        """Register/advance a named snapshot hold on the remote store —
        the consumer checkpoint that keeps range tombstones and boundary
        versions alive until this consumer has caught up."""
        req = {"op": "hold", "holder": holder}
        if seq is not None:
            req["seq"] = int(seq)
        return int(self._call(req)["seq"])

    def release(self, holder: str) -> None:
        self._call({"op": "release", "holder": holder})

    def changes(
        self,
        since: int,
        page_size: int | None = None,
        as_of: int | None = None,
        cf: str | None = None,
    ) -> list:
        """The complete changefeed from ``since``, transparently paged on
        the (key, version, change) compound cursor (the server caps rows
        per request and signals ``more``; this loops until the feed is
        exhausted, so a range delete covering more keys than one page can
        never be silently truncated, and a merge-store key carrying
        several events — one upsert/delete plus its surviving operands —
        can never lose the events a page boundary cuts through). Each
        row: {"key", "change", "value": bytes|None, "expires_at",
        "version"}, ordered by (key, version).

        SNAPSHOT-CONSISTENT: the poll is pinned to one upper seq — the
        passed ``as_of``, else a ``snapshot()`` taken at call time — and
        every page reads the closed interval (since, as_of], so a write
        landing below the page cursor mid-poll cannot tear the stitched
        feed (it simply isn't part of this poll; the next poll from the
        advanced checkpoint ships it).

        Returns a ``ChangeFeed`` (a list) whose ``.as_of`` is the pin the
        poll used — ALWAYS advance a consumer checkpoint to ``feed.as_of``
        and poll next from there. A fresh ``snapshot()`` taken after the
        poll is NOT a safe resume point: writes in (as_of, snapshot] were
        excluded from this poll and would be skipped forever."""
        if page_size is not None and page_size < 1:
            raise ValueError(f"page_size must be >= 1, got {page_size}")
        if as_of is None:
            as_of = self.snapshot()  # one consistent read point per poll
        out = ChangeFeed()
        out.as_of = int(as_of)
        after = None  # (key, version, change) compound cursor — a merge
        # store ships several events per key, so bare-key paging would
        # skip a boundary key's remaining events (server pages on the
        # same triple)
        while True:
            req: dict = {"op": "changes", "since": int(since), "as_of": int(as_of)}
            if cf is not None:
                req["cf"] = cf  # family-scoped feed; keys ship ENCODED
            if page_size is not None:
                req["limit"] = int(page_size)
            if after is not None:
                req["after_key"] = after[0]
                req["after_version"] = after[1]
                req["after_change"] = after[2]
            reply = self._call(req)
            ep = reply.get("epoch")
            if ep is not None:
                out.epoch = max(int(ep), out.epoch or 0)
            for r in reply["rows"]:
                v = r.get("value")
                out.append(
                    {
                        "key": self._dec_key(r["key"]),
                        "change": r["change"],
                        "value": None if v is None else base64.b64decode(v),
                        "expires_at": r["expires_at"],
                        "version": r["version"],
                    }
                )
            if not reply.get("more"):
                return out
            last = reply["rows"][-1]  # key stays wire-encoded, pass back as-is
            after = (last["key"], last["version"], last["change"])

    def ping(self) -> bool:
        return bool(self._call({"op": "ping"}).get("pong"))

    def close(self) -> None:
        self._teardown()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False
