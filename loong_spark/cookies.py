"""U4: per-host cookie jar with expiry-triggered regeneration
(reference: /root/reference/lib/Loong/Mojo/UserAgent/CookieJar.pm:19-62,
t/gen_cookie.pl).

Reference semantics, verified line by line:

* one cache file per host under ``~/.cookie/<ihost>`` holding
  ``{cookies: [...pool...], expire: <epoch>}`` (CookieJar.pm:22-28);
* a missing/empty file triggers regeneration via an external script
  with a 7-day TTL (CookieJar.pm:33-35, :49-52);
* each request picks ONE cookie from the pool at random
  (``rand_cookie``, CookieJar.pm:59-62);
* a jar past its ``expire`` stamp regenerates before the pick
  (CookieJar.pm:40-41); a record with no ``expire`` is a hard error
  (CookieJar.pm:39).

Spark-first rebuild:

* :class:`CookieJar` is DRIVER-side state — like the politeness table,
  the set of live hosts per batch is small (≤ frontier hosts), so the
  jar loads/refreshes on the driver and ships to executors as one
  broadcastable ``{host: [cookies...]}`` dict. No per-row Python.
* The per-request pick is a JVM column expression
  (:func:`cookie_col`): ``xxhash64(request key) % pool size``, the
  same determinism-for-RNG swap the UA pool made (sites.py:186-195) —
  retries and speculative tasks must pick the same cookie or the
  request stream isn't reproducible.
* Regeneration is a caller-supplied ``generator(host) -> list[str]``
  standing in for the reference's ``perl gen_cookie.pl`` side effect
  (a real deployment plugs a login-flow callable here; the sandbox has
  no network, so tests use deterministic fakes).
"""

from __future__ import annotations

import json
import re
import time
from pathlib import Path
from typing import Callable, Iterable

from pyspark.sql import Column
from pyspark.sql import functions as F

#: reference TTL: ``3600*24*7`` (CookieJar.pm:50)
DEFAULT_TTL_S = 7 * 24 * 3600

#: hosts safe to use as jar filenames: canonical lowercase host tokens
#: (no '/', no path separators; '.'-only names are rejected separately)
_SAFE_HOST_RE = re.compile(r"[a-z0-9.\-:@_]+\Z")


class CookieGenerationFailed(RuntimeError):
    """The generator produced no cookies (CookieJar.pm:55-56's croak)."""


class CookieJar:
    """Per-host cookie cache: one JSON file per host under ``root``."""

    def __init__(
        self,
        root: str | Path,
        generator: Callable[[str], list[str]],
        ttl_s: int = DEFAULT_TTL_S,
        now: Callable[[], float] = time.time,
    ):
        self.root = Path(root)
        self.root.mkdir(parents=True, exist_ok=True)
        self.generator = generator
        self.ttl_s = ttl_s
        self.now = now

    def _path(self, host: str) -> Path:
        # hosts become FILENAMES, and canon admits remote-content-shaped
        # hosts like '..' (href "http://../x" resolves with host '..') —
        # which would make _regenerate's tmp.replace() target the jar
        # directory itself. Reject anything that isn't a plain canonical
        # host token before it touches the filesystem.
        if not _SAFE_HOST_RE.fullmatch(host) or host.strip(".") == "":
            raise ValueError(f"invalid cookie-jar host: {host!r}")
        return self.root / host

    def _load(self, host: str) -> dict | None:
        p = self._path(host)
        if not p.exists():
            return None
        try:
            rec = json.loads(p.read_text(encoding="utf-8"))
        except (ValueError, OSError):
            return None
        if not rec or not rec.get("cookies"):
            return None
        if "expire" not in rec:
            # CookieJar.pm:39 croaks on a record with no expiry
            raise CookieGenerationFailed(f"cookie record for {host} has no expire stamp")
        return rec

    def _regenerate(self, host: str) -> dict:
        cookies = list(self.generator(host))
        if not cookies:
            raise CookieGenerationFailed(f"generator produced no cookies for {host}")
        rec = {"cookies": cookies, "expire": int(self.now()) + self.ttl_s}
        p = self._path(host)
        tmp = p.with_name(p.name + ".tmp")
        tmp.write_text(json.dumps(rec), encoding="utf-8")
        tmp.replace(p)
        return rec

    def pool_for(self, host: str) -> list[str]:
        """The live cookie pool for ``host``, regenerating when the file
        is missing/empty (CookieJar.pm:33-35) or expired (:40-41)."""
        rec = self._load(host)
        if rec is None or self.now() >= rec["expire"]:
            rec = self._regenerate(host)
        return rec["cookies"]

    def snapshot(self, hosts: Iterable[str]) -> dict[str, list[str]]:
        """Load/refresh every host's pool driver-side. O(live hosts) —
        the same cardinality as the politeness table, fine to broadcast.
        Filesystem-unsafe hosts (remote-content shapes like '..') are
        SKIPPED — the request goes out with no Cookie header, same as a
        jar miss — rather than crashing the batch."""
        out: dict[str, list[str]] = {}
        for h in sorted(set(hosts)):
            try:
                out[h] = self.pool_for(h)
            except ValueError:
                continue  # unsafe filename — no jar entry for this host
        return out


def demo_cookie_generator(host: str) -> list[str]:
    """Deterministic stand-in for the reference's ``perl gen_cookie.pl``
    login-flow side effect (t/gen_cookie.pl): a 4-cookie pool derived
    from the host name. Used by the CLI demo and the resume path (the
    real generator is a caller-supplied login callable)."""
    return [f"session={host}-{i}" for i in range(4)]


def cookie_col(host: Column, key: Column, snapshot: dict[str, list[str]]) -> Column:
    """Deterministic per-request cookie pick from a driver snapshot.

    Builds a literal ``map<host, array<cookie>>`` (Catalyst folds it into
    the plan; at politeness-table cardinality this is a few KB) and
    indexes it with ``xxhash64(key) % len(pool)`` — the reproducible
    stand-in for ``rand_cookie`` (CookieJar.pm:59-62). Hosts absent from
    the snapshot get NULL (no Cookie header), matching a jar miss.
    """
    if not snapshot:
        return F.lit(None).cast("string")
    empty = sorted(h for h, cs in snapshot.items() if not cs)
    if empty:
        # an empty pool would make the pmod index divide by zero — NULL
        # with ANSI off, a whole-batch runtime error with ANSI on. A host
        # with no cookies must be OMITTED from the snapshot (→ NULL pick).
        raise ValueError(f"cookie snapshot has empty pool(s) for host(s): {empty}")
    entries: list[Column] = []
    for h in sorted(snapshot):
        entries.append(F.lit(h))
        entries.append(F.array(*[F.lit(c) for c in snapshot[h]]))
    pools = F.create_map(*entries)
    pool = pools[host]
    idx = (F.pmod(F.xxhash64(key), F.size(pool)) + 1).cast("int")
    return F.element_at(pool, idx)


def proxy_col(
    host: Column, key: Column, pools: dict[str, list[str]] | None
) -> Column:
    """S4 proxy rotation (reference ``ua.proxy``: per-site config applied
    at /root/reference/lib/Loong/Crawler.pm:50-52 and logged at :282).

    ``pools`` maps host → proxy endpoints, with ``"*"`` as the default
    pool for hosts that have no entry (a site with no ``ua.proxy`` knob
    and no default gets NULL — direct connection, the reference's
    unset-config case). The per-request pick is
    ``xxhash64(key) % pool size`` — the same deterministic hash-for-RNG
    swap as the UA pool (U3) and cookie pick (U4), so retries and
    speculative tasks send identical headers. Pure JVM: the pools fold
    into the plan as a literal map (config-file cardinality)."""
    if not pools:
        return F.lit(None).cast("string")
    empty = sorted(h for h, ps in pools.items() if not ps)
    if empty:
        # same divide-by-zero hazard as cookie_col: an empty list is a
        # config error (omit the host, or omit "*", for direct-connect)
        raise ValueError(f"proxy_pools has empty pool(s) for: {empty}")
    entries: list[Column] = []
    for h in sorted(k for k in pools if k != "*"):
        entries.append(F.lit(h))
        entries.append(F.array(*[F.lit(p) for p in pools[h]]))
    default = (
        F.array(*[F.lit(p) for p in pools["*"]])
        if pools.get("*")
        else F.lit(None).cast("array<string>")
    )
    pool = default
    if entries:
        pool = F.coalesce(F.create_map(*entries)[host], default)
    idx = (F.pmod(F.xxhash64(key), F.size(pool)) + 1).cast("int")
    return F.when(pool.isNotNull(), F.element_at(pool, idx)).otherwise(
        F.lit(None).cast("string")
    )


def prepare_http(
    df,
    snapshot: dict[str, list[str]] | None = None,
    ua_kind: str = "web",
    proxy_pools: dict[str, list[str]] | None = None,
):
    """S4 request assembly (Crawler.pm:267-297 ``prepare_http``): attach
    the rotating ``ua`` pick, the per-host ``cookie`` pick (when a jar
    snapshot is supplied), and the per-host ``proxy`` pick (when pools
    are configured) as plain columns. Pure JVM projection — the fetch
    stage (simulated join or mapInPandas HTTP) reads them as headers.
    Expects ``host`` and ``url`` columns."""
    from .sites import ua_pool_col

    out = df.withColumn("ua", ua_pool_col(F.col("url"), ua_kind))
    cookie = (
        cookie_col(F.col("host"), F.col("url"), snapshot)
        if snapshot
        else F.lit(None).cast("string")
    )
    return out.withColumn("cookie", cookie).withColumn(
        "proxy", proxy_col(F.col("host"), F.col("url"), proxy_pools)
    )
