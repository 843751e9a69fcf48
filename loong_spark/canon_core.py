"""Pure-Python URL canonicalization core — the single source of truth.

Both the Spark pandas-UDF path (``loong_spark.canon``) and the pure-Python
scheduler oracle (``loong_spark.oracle``) import these functions, so the
per-row invariant ("Spark output == oracle output") cannot drift.

Semantics mirror the reference crawler's ``resolve_href``
(/root/reference/lib/Loong/Scraper.pm:87-100) and host helpers
(/root/reference/lib/Loong/Scraper.pm:59-66, lib/Loong/Utils.pm:32-37,
lib/Loong/Crawler.pm:190), re-specified here as documented, deterministic
behavior (the reference's unescaped-dot regex bugs are intentionally NOT
replicated — see SURVEY.md §7 "Explicit non-goals"):

* strip surrounding whitespace
* drop ``#fragment``
* scheme-qualified hrefs pass through (after fragment strip)
* scheme-relative ``//host/path`` adopts the base's scheme
* root-relative ``/path`` resolves against the base's origin
* relative paths resolve against the base's directory, with ``.`` and
  ``..`` segments collapsed (``..`` at the root is dropped, as browsers do)
* an empty href (or fragment-only href) resolves to the base without its
  fragment
* host comparison is case-insensitive (hosts are lowercased)

No I/O, no randomness: everything here is a pure function.
"""

from __future__ import annotations

import hashlib
import re
from functools import lru_cache

_SCHEMES = ("http://", "https://")


def url_md5(url: str) -> str:
    """md5 hex of the canonical URL (reference: ``url_md5 = md5_hex(url)``,
    /root/reference/lib/Loong/Crawler.pm:190)."""
    return hashlib.md5(url.encode("utf-8")).hexdigest()


def split_url(url: str) -> tuple[str, str, str]:
    """Return (scheme, host, path_and_query) — tiny, loop-free splitter.
    Scheme match is case-insensitive; scheme and host are lowercased."""
    low = url.lower()
    for scheme in _SCHEMES:
        if low.startswith(scheme):
            rest = url[len(scheme):]
            slash = rest.find("/")
            if slash < 0:
                return scheme[:-3], rest.lower(), "/"
            return scheme[:-3], rest[:slash].lower(), rest[slash:]
    return "", "", url


def extract_host(url: str) -> str:
    """Lowercased host of an absolute URL, '' otherwise."""
    return split_url(url)[1]


def trim_domain(host: str) -> str:
    """Strip a leading ``www.`` label (reference intent of ``trim_domain``,
    /root/reference/lib/Loong/Utils.pm:32-37, with the dot escaped)."""
    return host[4:] if host.startswith("www.") else host


#: multi-part public suffixes (embedded subset of the public-suffix
#: list covering the common ccTLD second-level registries; production
#: swaps in the full PSL as a data file without changing the logic)
MULTI_PART_SUFFIXES = frozenset({
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "net.uk",
    "com.au", "net.au", "org.au", "edu.au", "gov.au", "id.au",
    "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp",
    "co.kr", "or.kr", "re.kr", "go.kr",
    "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn", "ac.cn",
    "com.br", "net.br", "org.br", "gov.br", "edu.br",
    "com.mx", "org.mx", "gob.mx", "edu.mx",
    "co.in", "net.in", "org.in", "gen.in", "firm.in",
    "co.nz", "net.nz", "org.nz", "govt.nz", "ac.nz",
    "com.sg", "net.sg", "org.sg", "edu.sg", "gov.sg",
    "com.tw", "net.tw", "org.tw", "edu.tw", "gov.tw",
    "com.hk", "net.hk", "org.hk", "edu.hk", "gov.hk",
    "com.ar", "net.ar", "org.ar", "com.tr", "net.tr", "org.tr",
    "co.za", "net.za", "org.za", "web.za", "ac.za", "gov.za",
})

_IPV4_RE = re.compile(r"^\d{1,3}(\.\d{1,3}){3}$")


def registrable_domain(host: str) -> str:
    """eTLD+1 of a host (port stripped): the crawl-fairness grouping key
    — per-HOST caps can't stop a subdomain flood (10^6 ``*.blogspot.
    com`` hosts each get their own cap), per-registrable-DOMAIN caps
    can. 'a.b.example.co.uk' → 'example.co.uk'; IPv4 literals and bare
    one/two-label hosts are their own domain. The pure twin of
    canon.registrable_domain_col (parity pytest-enforced)."""
    h = host.split(":", 1)[0]
    if _IPV4_RE.fullmatch(h):
        return h
    parts = h.split(".")
    if len(parts) <= 2:
        return h
    if ".".join(parts[-2:]) in MULTI_PART_SUFFIXES:
        return ".".join(parts[-3:])
    return ".".join(parts[-2:])


def _collapse_segments(path: str) -> str:
    """Collapse ``.``/``..`` segments of an absolute path ('/a/./b/../c')."""
    out: list[str] = []
    trailing_slash = path.endswith("/")
    for seg in path.split("/"):
        if seg == "" or seg == ".":
            continue
        if seg == "..":
            if out:
                out.pop()
        else:
            out.append(seg)
    collapsed = "/" + "/".join(out)
    if trailing_slash and not collapsed.endswith("/"):
        collapsed += "/"
    return collapsed


def resolve_href(base: str, href: str) -> str:
    """Resolve ``href`` found on page ``base`` into a canonical absolute URL.

    Returns '' for hrefs that cannot become crawlable http(s) URLs
    (javascript:, mailto:, data:, unknown schemes).
    Reference semantics: /root/reference/lib/Loong/Scraper.pm:87-100.
    """
    href = href.strip()
    frag = href.find("#")
    if frag >= 0:
        href = href[:frag]

    if href == "":
        base_frag = base.find("#")
        if base_frag >= 0:
            base = base[:base_frag]
        # the base is normalized like any absolute href: canonicalize
        # output must NEVER carry dot segments (or mixed-case
        # scheme/host), even when the caller hands a non-canonical base
        if base.lower().startswith(_SCHEMES):
            scheme, host, path = split_url(base)
            if not host:
                return ""
            return f"{scheme}://{host}{_collapse_segments(path) if path else '/'}"
        return base

    low = href.lower()
    if low.startswith(_SCHEMES):
        scheme, host, path = split_url(href)
        if not host:  # 'http://' / 'http:///x' — no authority, uncrawlable
            return ""
        return f"{scheme}://{host}{_collapse_segments(path) if path else '/'}"
    # non-http schemes are not crawlable
    if ":" in href.split("/", 1)[0] and not href.startswith("//"):
        return ""

    b_scheme, b_host, b_path = split_url(base)
    if not b_scheme:
        return ""

    if href.startswith("//"):
        _, host2, path2 = split_url("http://" + href[2:])
        if not host2:  # '//' with no authority — uncrawlable
            return ""
        return f"{b_scheme}://{host2}{_collapse_segments(path2)}"
    if href.startswith("/"):
        return f"{b_scheme}://{b_host}{_collapse_segments(href)}"

    # relative: resolve against the base's directory
    q = b_path.find("?")
    dir_path = b_path[:q] if q >= 0 else b_path
    dir_path = dir_path[: dir_path.rfind("/") + 1]  # keep trailing slash
    return f"{b_scheme}://{b_host}{_collapse_segments(dir_path + href)}"


@lru_cache(maxsize=4096)
def _robots_rule_re(rule: str) -> "re.Pattern[str]":
    """Compiled matcher for one robots rule path per RFC 9309 §2.2.3:
    ``*`` matches any character sequence (including empty), a TRAILING
    ``$`` anchors the end of the path, every other character is literal
    (a non-trailing ``$`` included). The pure twin of
    frontier.robots_rule_regex — parity pytest-enforced."""
    anchored = rule.endswith("$")
    body = rule[:-1] if anchored else rule
    pat = ".*".join(re.escape(seg) for seg in body.split("*"))
    return re.compile("^" + pat + ("$" if anchored else ""))


def robots_rule_matches(path: str, rule: str) -> bool:
    """One rule against one path. Plain rules (no ``*``, no trailing
    ``$``) stay on the prefix fast path — identical semantics to the
    regex, just cheaper."""
    if "*" not in rule and not rule.endswith("$"):
        return path.startswith(rule)
    return _robots_rule_re(rule).match(path) is not None


def robots_match(path: str, disallow: list[str] | None, allow: list[str] | None) -> bool:
    """True if ``path`` is ALLOWED. Most-specific-match-wins between
    allow and disallow rules, with RFC 9309 wildcard support (``*`` any
    sequence, trailing ``$`` end anchor). Specificity is the RULE LENGTH
    in characters (wildcards included) — exactly what Google's reference
    parser uses (LongestMatchRobotsMatchStrategy::MatchAllow returns
    pattern.length()); ties go to allow. The reference crawler has no
    robots support (verified repo-wide); this is a north-rule addition
    (SURVEY.md §7)."""
    best_allow = max((len(p) for p in (allow or []) if robots_rule_matches(path, p)), default=-1)
    best_disallow = max(
        (len(p) for p in (disallow or []) if robots_rule_matches(path, p)), default=-1
    )
    return best_allow >= best_disallow


def canonicalize(base: str, href: str) -> str:
    """Full per-link canonicalization: resolve + normalize. '' = drop."""
    return resolve_href(base, href)
