"""S11: etcd config source (reference: /root/reference/lib/Loong/Config/Etcd.pm:18-30).

The reference keeps an alternative config store in etcd v2: ``get(key)``
reads ``http://<uri>/v2/keys/<key>`` and JSON-decodes ``node.value``;
``set(key, val)`` PUTs ``value=<json>`` as a form. This module rebuilds
that surface for a Spark driver:

* :class:`EtcdClient` — the same two-call v2 wire protocol over urllib.
  The sandbox has no network (and no etcd), so every call is gated: a
  connection failure raises a clean :class:`ConfigSourceUnavailable`
  instead of a raw socket traceback. On a real cluster this is the
  driver-side config fetch that runs once before the job is planned —
  config never flows through executors, so nothing here needs to be
  distributed.
* :class:`FileConfigStore` — byte-compatible get/set semantics over a
  local directory (one JSON file per key). This is the tested path, and
  also the deployment answer SURVEY §2.1 S11 recommends ("plain config
  files"): the same loader code serves both backends.
* :class:`MemoryConfigStore` — dict-backed, for unit tests.
* :func:`load_crawl_config` — overlay a stored JSON dict onto
  :class:`~loong_spark.config.CrawlConfig` defaults, rejecting unknown
  keys so a typo'd knob fails loudly (the reference would silently
  ignore it — Config.pm merges hashes blindly).

The reference's ``update`` is an empty sub (Etcd.pm:32-33) — declared,
never implemented. We mirror the *intent* (read-modify-write) with a
real implementation since it costs three lines.
"""

from __future__ import annotations

import dataclasses
import json
import re
import urllib.error
import urllib.parse
import urllib.request
from pathlib import Path

from .config import CrawlConfig

_KEY_RE = re.compile(r"[A-Za-z0-9_.\-/]+\Z")


class ConfigSourceUnavailable(RuntimeError):
    """The config backend cannot be reached (no network / no etcd)."""


class KeyMissing(KeyError):
    """The requested config key does not exist in the store."""


def _check_key(key: str) -> str:
    # keys are strictly relative: a leading '/' would make pathlib's
    # Path(root) / key REPLACE the root (writes escape the store dir)
    if not _KEY_RE.fullmatch(key) or ".." in key or key.startswith("/"):
        raise ValueError(f"invalid config key: {key!r}")
    return key


class EtcdClient:
    """etcd v2 ``keys`` API client (Etcd.pm:9-30 semantics).

    get/set/update carry JSON values; the v2 node wrapper
    (``{"node": {"value": ...}}``) is unwrapped exactly as the
    reference's ``->json('/node/value')`` does.
    """

    API_VERSION = "v2"

    def __init__(self, uri: str = "127.0.0.1:2379", timeout_s: float = 5.0):
        self.uri = uri
        self.timeout_s = timeout_s

    def _url(self, key: str) -> str:
        return f"http://{self.uri}/{self.API_VERSION}/keys/{_check_key(key)}"

    def _request(self, req: urllib.request.Request):
        try:
            with urllib.request.urlopen(req, timeout=self.timeout_s) as resp:
                return json.loads(resp.read().decode("utf-8"))
        except urllib.error.HTTPError as e:
            if e.code == 404:
                raise KeyMissing(req.full_url) from None
            raise ConfigSourceUnavailable(f"etcd at {self.uri}: HTTP {e.code}") from e
        except (urllib.error.URLError, OSError, TimeoutError) as e:
            raise ConfigSourceUnavailable(
                f"etcd at {self.uri} unreachable ({e}); use FileConfigStore "
                "or plain config files in this environment"
            ) from e

    def get(self, key: str):
        body = self._request(urllib.request.Request(self._url(key)))
        return json.loads(body["node"]["value"])

    def set(self, key: str, val) -> dict:
        data = urllib.parse.urlencode({"value": json.dumps(val)}).encode()
        req = urllib.request.Request(self._url(key), data=data, method="PUT")
        return self._request(req)

    def update(self, key: str, fn) -> dict:
        """Read-modify-write (the reference declares but never implements
        this, Etcd.pm:32-33). Not atomic — v2 CAS (prevIndex) would make
        it so; single-driver config writes don't need it."""
        return self.set(key, fn(self.get(key)))


class FileConfigStore:
    """get/set-compatible store over a directory of ``<key>.json`` files.

    Same value semantics as :class:`EtcdClient` (values are JSON), so
    ``load_crawl_config`` works against either backend unchanged. Keys
    may contain ``/`` — they become subdirectories, like etcd's key
    hierarchy.
    """

    def __init__(self, root: str | Path):
        self.root = Path(root)
        self.root.mkdir(parents=True, exist_ok=True)

    def _path(self, key: str) -> Path:
        return self.root / (_check_key(key) + ".json")

    def get(self, key: str):
        p = self._path(key)
        if not p.exists():
            raise KeyMissing(key)
        return json.loads(p.read_text(encoding="utf-8"))

    def set(self, key: str, val) -> dict:
        p = self._path(key)
        p.parent.mkdir(parents=True, exist_ok=True)
        tmp = p.with_suffix(".json.tmp")
        tmp.write_text(json.dumps(val, sort_keys=True), encoding="utf-8")
        tmp.replace(p)  # atomic on POSIX — readers never see a torn value
        return {"node": {"key": key}}

    def update(self, key: str, fn) -> dict:
        return self.set(key, fn(self.get(key)))


class MemoryConfigStore:
    """Dict-backed store for unit tests; same interface."""

    def __init__(self, data: dict | None = None):
        self._data = dict(data or {})

    def get(self, key: str):
        if _check_key(key) not in self._data:
            raise KeyMissing(key)
        return json.loads(json.dumps(self._data[key]))

    def set(self, key: str, val) -> dict:
        self._data[_check_key(key)] = json.loads(json.dumps(val))
        return {"node": {"key": key}}

    def update(self, key: str, fn) -> dict:
        return self.set(key, fn(self.get(key)))


_CFG_FIELDS = {f.name for f in dataclasses.fields(CrawlConfig)}


def load_crawl_config(store, key: str = "loong/crawl", base: CrawlConfig | None = None) -> CrawlConfig:
    """Build a :class:`CrawlConfig` from the stored JSON dict at ``key``,
    overlaying ``base`` (defaults when None — re-runs on an existing
    warehouse pass the persisted config.json knobs here so the store only
    overrides what it sets). Unknown keys raise (a typo'd knob must not
    be silently dropped); a missing key returns ``base`` unchanged,
    matching the reference's fall-through to the INI tree
    (Config.pm:40-59)."""
    if base is None:
        base = CrawlConfig()
    try:
        raw = store.get(key)
    except KeyMissing:
        return base
    if not isinstance(raw, dict):
        raise ValueError(f"config at {key!r} must be a JSON object, got {type(raw).__name__}")
    unknown = set(raw) - _CFG_FIELDS
    if unknown:
        raise ValueError(f"unknown CrawlConfig keys from {key!r}: {sorted(unknown)}")
    return dataclasses.replace(base, **raw)
