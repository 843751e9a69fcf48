"""Pure-Python robots.txt parser — the oracle twin of robots.parse_robots.

Same semantics, zero Spark: the crawl oracle (oracle.py) calls this when
robots rules arrive mid-crawl, so the pipeline's JVM-side parse and the
executable spec agree byte-for-byte. Parity is pytest-enforced
(tests/test_robots.py::test_pure_parser_parity).

Group selection follows RFC 9309 §2.2.1 (and the de-facto standard): when
any section names the crawler's exact agent, ONLY exact-agent sections
apply; ``*`` sections are the fallback otherwise. Crawl-delay takes the
MAX over the applicable sections (honor the strictest wait).
"""

from __future__ import annotations

import re

_KEYS = {"user-agent", "allow", "disallow", "crawl-delay"}

#: exactly the whitespace Java's regex ``\s`` strips — the Spark parser
#: trims with ``\s`` so the twins must agree on the set (Python's bare
#: .strip() would also eat unicode spaces like NBSP and diverge)
_WS = " \t\n\r\x0b\x0c"


def _directives(txt: str) -> list[tuple[str, str]]:
    """(key, value) per directive line: UTF-8 BOM dropped, CRLF and LF
    line endings accepted, comments stripped, blanks and unknown keys
    dropped — mirrors the Spark parser's line filter."""
    out = []
    for raw in re.split(r"\r?\n", txt.lstrip("\ufeff")):
        line = re.sub(r"#.*$", "", raw).strip(_WS)
        if not line or ":" not in line:
            continue
        key, _, value = line.partition(":")
        key = key.strip(_WS).lower()
        if key in _KEYS:
            out.append((key, value.strip(_WS)))
    return out


def parse_robots_text(txt: str, agent: str = "loong") -> dict | None:
    """robots.txt text → {'disallow': [...], 'allow': [...],
    'crawl_delay': float|None}, or None when no section applies.
    Consecutive User-agent lines share one rule block."""
    sections: list[dict] = []
    cur: dict | None = None
    prev_ua = False
    for key, value in _directives(txt):
        if key == "user-agent":
            if not prev_ua:
                cur = {"uas": set(), "disallow": [], "allow": [], "crawl_delay": None}
                sections.append(cur)
            cur["uas"].add(value.lower())
            prev_ua = True
            continue
        prev_ua = False
        if cur is None:  # rules before any User-agent line bind nowhere
            continue
        if key == "crawl-delay":
            try:
                d = float(value)
            except ValueError:
                d = None
            if d is not None:
                cur["crawl_delay"] = d if cur["crawl_delay"] is None else max(cur["crawl_delay"], d)
        elif value != "":  # empty-value Disallow ("allow all") contributes nothing
            cur[key].append(value)

    agent = agent.lower()
    exact = [s for s in sections if agent in s["uas"]]
    applicable = exact or [s for s in sections if "*" in s["uas"]]
    if not applicable:
        return None
    delays = [s["crawl_delay"] for s in applicable if s["crawl_delay"] is not None]
    return {
        "disallow": sorted({r for s in applicable for r in s["disallow"]}),
        "allow": sorted({r for s in applicable for r in s["allow"]}),
        "crawl_delay": max(delays) if delays else None,
    }


def delay_from_robots(
    crawl_delay: float | None, default_interval_s: float, min_interval_s: float = 1.0
) -> int:
    """The scheduler's integer batch-tick delay from a parsed crawl-delay —
    the pure twin of robots.politeness_from_robots + floor-to-int:
    greatest(coalesce(crawl_delay, default), min) floored."""
    iv = default_interval_s if crawl_delay is None else crawl_delay
    return int(max(iv, min_interval_s))
