"""Client for `KVService` — the caller side of the reference's
JSON-payload Get RPC (`proto/proto/octopuspb.proto:12-20`: request and
response are each one JSON string; this client speaks the same payloads
over a plain socket). Stdlib-only; one persistent connection, requests
pipelined line-at-a-time."""

from __future__ import annotations

import base64
import json
import socket


def _debase(entry: dict) -> dict:
    out = dict(entry)
    if out.get("value") is not None:
        out["value"] = base64.b64decode(out["value"])
    return out


class KVClient:
    def __init__(self, host: str, port: int, timeout: float = 60.0):
        self._sock = socket.create_connection((host, port), timeout=timeout)
        self._rfile = self._sock.makefile("rb")

    def _call(self, req: dict) -> dict:
        self._sock.sendall((json.dumps(req) + "\n").encode("utf-8"))
        line = self._rfile.readline()
        if not line:
            raise ConnectionError("service closed the connection")
        reply = json.loads(line)
        if not reply.get("ok"):
            raise RuntimeError(f"service error: {reply.get('error')}")
        return reply

    def get(self, key) -> dict | None:
        """{"value": bytes|None, "version": int, "expires_at": int} or
        None when the key is absent/tombstoned/expired."""
        reply = self._call({"op": "get", "key": key})
        return _debase(reply) if reply["found"] else None

    def mget(self, keys: list) -> dict:
        reply = self._call({"op": "mget", "keys": list(keys)})
        return {k: _debase(e) for k, e in reply["entries"].items()}

    def scan(self, start=None, end=None, prefix=None, limit: int | None = None) -> list:
        req = {"op": "scan", "start": start, "end": end, "prefix": prefix}
        if limit is not None:
            req["limit"] = limit
        return [_debase(r) for r in self._call(req)["rows"]]

    def info(self) -> dict:
        return self._call({"op": "info"})["info"]

    def ping(self) -> bool:
        return bool(self._call({"op": "ping"}).get("pong"))

    def close(self) -> None:
        try:
            self._rfile.close()
        finally:
            self._sock.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False
