"""Deterministic synthetic web graph + interleaved-docs corpus (FIXTURES.md).

Every page is a pure function of ``(seed, page_id)`` — hash-derived, no
RNG state — so the pure-Python oracle, the Spark pipeline tests, and the
distributed bench generator all see byte-identical content without ever
materializing the graph twice.

Replaces the reference's live-site fetches
(/root/reference/lib/Loong/Crawler.pm:179, t/crawler.t) with a hermetic
corpus. Host skew is Zipf-distributed to exercise hot-host salting.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass, field
from functools import lru_cache

from .canon_core import url_md5
from .config import HostPolicy
from .parse_core import render_body

_WORDS = (
    "frontier crawl host queue seed fetch parse link span media page "
    "politeness robots depth priority shard bloom hash batch commit"
).split()

#: charset-specific vocabulary so non-utf8 pages contain bytes that
#: actually differ between encodings (exercises the P4 sniff+decode)
_WORDS_GBK = "爬虫 队列 页面 链接 主机 优先级".split()
_WORDS_LATIN1 = "café zürich señor naïve élan".split()


def _h(*parts) -> int:
    """Stable 64-bit hash of the parts (md5-based; platform-independent)."""
    s = ":".join(str(p) for p in parts)
    return int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "big")


@dataclass(frozen=True)
class GraphParams:
    n_hosts: int = 5
    n_pages: int = 50  # total pages INCLUDING the n_hosts root pages
    n_seeds: int = 2
    zipf_s: float = 1.2
    max_links: int = 6
    seed: int = 42
    #: include per-host /robots.txt pages (200 + rules text for hosts
    #: with a robots policy, 404 otherwise) — the cfg.fetch_robots
    #: in-crawl robots fixtures
    robots_pages: bool = False
    #: include per-host sitemap pages and advertise them via `Sitemap:`
    #: robots lines — the cfg.fetch_sitemaps fixtures: odd hosts serve a
    #: two-level sitemapindex, even hosts a flat urlset; entries cover
    #: whitespace-padded locs, lastmod/priority fields, a cross-host
    #: loc, a dangling loc (fetch-fails → retry path), and overlap with
    #: link-reachable pages (dedup path)
    sitemap_pages: bool = False


@lru_cache(maxsize=16)
def _zipf_cdf(p: "GraphParams") -> tuple[float, ...]:
    w = [1.0 / (r + 1) ** p.zipf_s for r in range(p.n_hosts)]
    tot = sum(w)
    acc, out = 0.0, []
    for x in w:
        acc += x / tot
        out.append(acc)
    return tuple(out)


def host_of(p: GraphParams, pid: int) -> int:
    """Host index for a page id: roots map 1:1, others Zipf-skewed."""
    if pid < p.n_hosts:
        return pid
    u = (_h(p.seed, "host", pid) % (1 << 32)) / float(1 << 32)
    cdf = _zipf_cdf(p)
    lo, hi = 0, len(cdf) - 1
    while lo < hi:
        mid = (lo + hi) // 2
        if u <= cdf[mid]:
            hi = mid
        else:
            lo = mid + 1
    return lo


def page_path(p: GraphParams, pid: int) -> str:
    if pid < p.n_hosts:
        return "/"
    r = _h(p.seed, "path", pid) % 10
    if r < 5:
        return f"/p/{pid}"
    if r < 7:
        return f"/d/{r}/{pid}"
    if r < 9:
        return f"/x/{pid}"          # robots-disallowed on some hosts
    return f"/x/ok/{pid}"           # robots allow-override

def page_url(p: GraphParams, pid: int) -> str:
    return f"http://h{host_of(p, pid)}.example{page_path(p, pid)}"


def page_status(p: GraphParams, pid: int) -> int:
    if pid < p.n_hosts:
        return 200  # seeds always fetchable
    r = _h(p.seed, "status", pid) % 100
    if r < 92:
        return 200
    if r < 94:
        return 301
    if r < 97:
        return 404
    return 500


def page_charset(p: GraphParams, pid: int) -> tuple[str, str]:
    """(charset, declare) per page. Mostly utf-8; a gbk / latin-1
    minority exercises the P4 sniff (SURVEY.md §2.3 P4). Non-utf8 pages
    always declare their charset ('header' = Content-Type param,
    'meta' = <meta charset> tag); utf-8 pages sometimes declare nothing
    (the sniff's fallback)."""
    if pid < p.n_hosts:
        return "utf-8", "none"
    r = _h(p.seed, "charset", pid) % 10
    cs = "gbk" if r == 8 else ("latin-1" if r == 9 else "utf-8")
    d = _h(p.seed, "csdecl", pid) % 2
    if cs == "utf-8":
        return cs, ("none", "header")[d]
    return cs, ("header", "meta")[d]


def page_content_type(p: GraphParams, pid: int) -> str:
    if pid >= p.n_hosts and _h(p.seed, "ctype", pid) % 100 < 3:
        return "image/jpeg"
    cs, declare = page_charset(p, pid)
    if declare == "header":
        return f"text/html; charset={cs}"
    return "text/html"


def page_empty_kind(p: GraphParams, pid: int) -> str:
    """'' (normal) | 'body' (F3: zero-byte body) | 'parse' (F7: body
    parses to zero data spans). Both are non-retry failures
    (/root/reference/lib/Loong/Crawler.pm:238-251). Non-HTML pages can
    be empty-BODIED too: the reference fails any response with no body
    BEFORE the content-type gate (Crawler.pm:238-240), so the fixture
    must emit that case."""
    if pid < p.n_hosts:
        return ""
    r = _h(p.seed, "empty", pid) % 100
    if not page_content_type(p, pid).startswith("text/html"):
        return "body" if r < 20 else ""
    if r < 2:
        return "body"
    if r < 4:
        return "parse"
    return ""


def page_spans(p: GraphParams, pid: int) -> list[dict]:
    """Interleaved text+media span sequence (kind, text, media_ref, offset).
    Non-utf8 pages mix in charset-specific words so the decode path is
    actually load-bearing. Empty pages (F3/F7) have no spans."""
    if page_empty_kind(p, pid):
        return []
    cs, _ = page_charset(p, pid)
    extra = {"gbk": _WORDS_GBK, "latin-1": _WORDS_LATIN1}.get(cs)
    n = 1 + _h(p.seed, "nspans", pid) % 6
    spans = []
    for i in range(n):
        if _h(p.seed, "skind", pid, i) % 3 == 0:
            spans.append(
                {
                    "kind": "media",
                    "text": "",
                    "media_ref": f"media://h{host_of(p, pid)}/img{_h(p.seed, 'img', pid, i) % 1000}.jpg",
                    "offset": i,
                }
            )
        else:
            w = [_WORDS[_h(p.seed, "w", pid, i, j) % len(_WORDS)] for j in range(3 + i % 4)]
            if extra is not None:
                w.append(extra[_h(p.seed, "xw", pid, i) % len(extra)])
            spans.append({"kind": "text", "text": " ".join(w), "media_ref": "", "offset": i})
    return spans


def _render_href(p: GraphParams, src_pid: int, dst_pid: int, k: int) -> str:
    """Render a link to dst as it would appear in src's HTML: absolute,
    relative (./, ../, bare), fragment-bearing, or whitespace-padded —
    exercises resolve_href (/root/reference/lib/Loong/Scraper.pm:87-100)."""
    dst_url = page_url(p, dst_pid)
    same_host = host_of(p, src_pid) == host_of(p, dst_pid)
    form = _h(p.seed, "form", src_pid, dst_pid, k) % 8
    if not same_host or form < 3:
        href = dst_url
    else:
        dst_path = page_path(p, dst_pid)
        src_path = page_path(p, src_pid)
        src_dir = src_path[: src_path.rfind("/") + 1]
        depth_up = max(src_dir.count("/") - 1, 0)
        if form == 3:
            href = "../" * depth_up + dst_path.lstrip("/")
        elif form == 4 and src_dir == dst_path[: dst_path.rfind("/") + 1]:
            href = dst_path[dst_path.rfind("/") + 1 :]  # bare filename
        elif form == 5:
            href = "./" + "../" * depth_up + dst_path.lstrip("/")
        else:
            href = dst_path  # root-relative
    if _h(p.seed, "frag", src_pid, dst_pid, k) % 4 == 0:
        href += f"#sec{k}"
    if _h(p.seed, "pad", src_pid, dst_pid, k) % 5 == 0:
        href = f"  {href} "
    return href


def page_out_links(p: GraphParams, pid: int) -> list[str]:
    """Raw hrefs. Includes deliberate duplicates (dedup pressure mirroring
    t/filter.t:5-12) and junk schemes (dropped by canonicalization)."""
    if page_empty_kind(p, pid) == "body":
        return []  # F3: a zero-byte body has no links either
    n = _h(p.seed, "nlinks", pid) % (p.max_links + 1)
    if pid < p.n_hosts:
        n = max(n, 3)  # roots always link out so crawls go somewhere
    hrefs = []
    targets = []
    for k in range(n):
        r = _h(p.seed, "ltarget", pid, k)
        if r % 10 == 0 and targets:
            dst = targets[r % len(targets)]  # duplicate of an earlier link
        elif r % 17 == 0:
            hrefs.append("javascript:void(0)" if r % 2 else "mailto:a@b.c")
            continue
        elif r % 3 == 0:
            dst = host_of(p, pid) if pid >= p.n_hosts else (r % p.n_hosts)  # up-link to a root
        else:
            dst = p.n_hosts + r % max(p.n_pages - p.n_hosts, 1)
        targets.append(dst)
        hrefs.append(_render_href(p, pid, dst, k))
    return hrefs


def page_body(p: GraphParams, pid: int) -> bytes:
    """Raw page bytes for the parse-mode graph: spans+links rendered to
    HTML and encoded in the page's charset (parse_core.render_body).
    Non-html pages get opaque bytes (never parsed — F2 gate)."""
    if page_empty_kind(p, pid) == "body":
        return b""  # F3 fixture: 200 OK, no content (html OR not)
    if not page_content_type(p, pid).startswith("text/html"):
        return b"\xff\xd8\xfe" + str(pid).encode()
    cs, declare = page_charset(p, pid)
    return render_body(page_spans(p, pid), page_out_links(p, pid), cs, declare)


def robots_url_of(host: str) -> str:
    return f"http://{host}/robots.txt"


def robots_txt_of(p: GraphParams, k: int) -> str | None:
    """robots.txt text for host k, derived from the SAME policy table
    politeness_of() builds — so a fetch_robots crawl converges to the
    static-politeness rules. Hosts with path rules serve a full file;
    of the rest, a deterministic third serve nothing (None → 404, the
    stay-on-defaults path) and the others a Crawl-delay-only file."""
    pol = politeness_of(p)[f"h{k}.example"]
    # sitemap_pages: the robots file ADVERTISES the host's sitemap (the
    # sitemaps-protocol discovery path) — appended, so rule parsing is
    # byte-identical with the flag off
    sm = f"Sitemap: http://h{k}.example/sitemap.xml\n" if p.sitemap_pages else ""
    if not pol.robots_disallow and not pol.robots_allow:
        if _h(p.seed, "norobots", k) % 3 == 0:
            return None
        return f"# synthetic robots\nUser-agent: *\nCrawl-delay: {pol.delay_s}\n{sm}"
    return (
        "# synthetic robots\nUser-agent: *\n"
        + "".join(f"Disallow: {r}\n" for r in pol.robots_disallow)
        + "".join(f"Allow: {r}\n" for r in pol.robots_allow)
        + f"Crawl-delay: {pol.delay_s}\n"
        + sm
    )


def gen_robots_page(p: GraphParams, k: int) -> dict:
    """/robots.txt as a WEB_GRAPH row: 200 + the rules text as a single
    text span (span mode's body stand-in) for policied hosts, 404 with
    no body otherwise."""
    host = f"h{k}.example"
    url = robots_url_of(host)
    txt = robots_txt_of(p, k)
    return {
        "url": url,
        "url_hash": url_md5(url),
        "host": host,
        "status": 200 if txt is not None else 404,
        "content_type": "text/plain",
        "body_spans": (
            [{"kind": "text", "text": txt, "media_ref": "", "offset": 0}]
            if txt is not None
            else []
        ),
        "out_links": [],
    }


def sitemap_url_of(host: str, part: int | None = None) -> str:
    return (
        f"http://{host}/sitemap.xml"
        if part is None
        else f"http://{host}/sitemap-{part}.xml"
    )


def _sitemap_listed_pids(p: GraphParams, k: int) -> list[int]:
    """Deterministic subset of host k's pages its sitemap lists — some
    overlap the link graph (dedup path), some are sitemap-only orphans
    (the discovery value a real sitemap provides)."""
    return [
        pid
        for pid in range(p.n_pages)
        if host_of(p, pid) == k and _h(p.seed, "smlist", pid) % 2 == 0
    ]


def _urlset_xml(p: GraphParams, k: int, pids: list[int], extras=()) -> str:
    """urlset XML: whitespace-padded locs + lastmod/priority fields
    exercise the parser's trim and the rich parse_sitemap extraction."""
    rows = []
    for pid in pids:
        lastmod = (
            f"2026-0{1 + _h(p.seed, 'smmod', pid) % 9}-"
            f"{1 + _h(p.seed, 'smday', pid) % 28:02d}"
        )
        prio = (1 + _h(p.seed, "smprio", pid) % 10) / 10
        rows.append(
            f"  <url><loc>  {page_url(p, pid)}  </loc>"
            f"<lastmod>{lastmod}</lastmod><priority>{prio}</priority></url>"
        )
    rows += [f"  <url><loc>{loc}</loc></url>" for loc in extras]
    return (
        '<?xml version="1.0" encoding="UTF-8"?>\n'
        '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">\n'
        + "\n".join(rows)
        + "\n</urlset>\n"
    )


def sitemap_docs_of(p: GraphParams, k: int) -> list[tuple[str, str, str]]:
    """(url, xml, content_type) rows for host k's sitemap tree: even
    hosts a flat urlset, odd hosts a sitemapindex over 1-2 child
    urlsets; extras add a cross-host loc (k%5) and a dangling loc that
    404s into the retry path (k%7). Only advertised hosts (those whose
    robots file exists to carry the Sitemap line) serve one."""
    if not p.sitemap_pages or robots_txt_of(p, k) is None:
        return []
    host = f"h{k}.example"
    ct = "application/xml" if k % 2 == 0 else "text/xml; charset=UTF-8"
    pids = _sitemap_listed_pids(p, k)
    extras = []
    if k % 5 == 0 and p.n_hosts > 1:
        extras.append(page_url(p, (k + 1) % p.n_hosts))
    if k % 7 == 0:
        extras.append(f"http://{host}/ghost-{k}")
    if k % 2 == 0:
        return [(sitemap_url_of(host), _urlset_xml(p, k, pids, extras), ct)]
    parts = [pids[0::2], pids[1::2]] if k % 4 == 3 else [pids]
    children = [sitemap_url_of(host, i) for i in range(len(parts))]
    idx = (
        '<?xml version="1.0" encoding="UTF-8"?>\n'
        '<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">\n'
        + "\n".join(f"  <sitemap><loc>{c}</loc></sitemap>" for c in children)
        + "\n</sitemapindex>\n"
    )
    out = [(sitemap_url_of(host), idx, ct)]
    for i, (c, part) in enumerate(zip(children, parts)):
        out.append((c, _urlset_xml(p, k, part, extras if i == 0 else ()), ct))
    return out


def gen_sitemap_pages(p: GraphParams, k: int) -> list[dict]:
    """Host k's sitemap tree as WEB_GRAPH span-mode rows (the XML text
    rides a single text span, like gen_robots_page's rules text)."""
    out = []
    for url, xml, ct in sitemap_docs_of(p, k):
        out.append(
            {
                "url": url,
                "url_hash": url_md5(url),
                "host": f"h{k}.example",
                "status": 200,
                "content_type": ct,
                "body_spans": [
                    {"kind": "text", "text": xml, "media_ref": "", "offset": 0}
                ],
                "out_links": [],
            }
        )
    return out


def gen_page(p: GraphParams, pid: int) -> dict:
    url = page_url(p, pid)
    return {
        "url": url,
        "url_hash": url_md5(url),
        "host": f"h{host_of(p, pid)}.example",
        "status": page_status(p, pid),
        "content_type": page_content_type(p, pid),
        "body_spans": page_spans(p, pid),
        "out_links": page_out_links(p, pid),
    }


@lru_cache(maxsize=4)
def build_graph(p: GraphParams) -> dict[str, dict]:
    """url → page dict for the whole (small) fixture graph."""
    graph: dict[str, dict] = {}
    for pid in range(p.n_pages):
        pg = gen_page(p, pid)
        graph[pg["url"]] = pg
    if p.robots_pages:
        for k in range(p.n_hosts):
            pg = gen_robots_page(p, k)
            graph[pg["url"]] = pg
    if p.sitemap_pages:
        for k in range(p.n_hosts):
            for pg in gen_sitemap_pages(p, k):
                graph[pg["url"]] = pg
    return graph


def seeds_of(p: GraphParams) -> list[str]:
    """Seed list = root pages of the first n_seeds hosts (mirrors the
    comma-split `entry.home` multi-seed list,
    /root/reference/lib/Loong/Crawler.pm:94-104)."""
    return [page_url(p, k) for k in range(p.n_seeds)]


def politeness_of(p: GraphParams) -> dict[str, HostPolicy]:
    """Per-host policy table. Some hosts robots-disallow /x/ with an
    /x/ok/ allow-override (north-rule robots addition, SURVEY.md §7)."""
    out = {}
    for k in range(p.n_hosts):
        host = f"h{k}.example"
        has_robots = _h(p.seed, "robots", k) % 3 == 0
        out[host] = HostPolicy(
            host=host,
            delay_s=1 + _h(p.seed, "delay", k) % 3,
            max_active=(2, 4, 8, 20)[_h(p.seed, "maxact", k) % 4],
            robots_disallow=["/x/"] if has_robots else [],
            robots_allow=["/x/ok/"] if has_robots else [],
        )
    return out


# -- canned fixtures (FIXTURES.md §7) --------------------------------------
TINY = GraphParams(n_hosts=5, n_pages=50, n_seeds=2)
SMALL = GraphParams(n_hosts=50, n_pages=5000, n_seeds=10)
SKEWED = GraphParams(n_hosts=20, n_pages=10000, n_seeds=5, zipf_s=1.5)


def graph_rows_for_spark(p: GraphParams) -> list[dict]:
    """Materialize the graph as rows matching schemas.WEB_GRAPH."""
    return list(build_graph(p).values())


def graph_rows_html_for_spark(p: GraphParams) -> list[dict]:
    """Materialize the graph as rows matching schemas.WEB_GRAPH_HTML —
    raw charset-encoded BYTES bodies instead of pre-parsed spans/links
    (the pipeline's parse mode decodes + parses them back)."""
    out = []
    for pid in range(p.n_pages):
        url = page_url(p, pid)
        out.append(
            {
                "url": url,
                "url_hash": url_md5(url),
                "host": f"h{host_of(p, pid)}.example",
                "status": page_status(p, pid),
                "content_type": page_content_type(p, pid),
                "body": page_body(p, pid),
            }
        )
    if p.robots_pages:
        for k in range(p.n_hosts):
            pg = gen_robots_page(p, k)
            txt = robots_txt_of(p, k)
            out.append(
                {
                    "url": pg["url"],
                    "url_hash": pg["url_hash"],
                    "host": pg["host"],
                    "status": pg["status"],
                    "content_type": pg["content_type"],
                    "body": txt.encode("utf-8") if txt is not None else b"",
                }
            )
    if p.sitemap_pages:
        for k in range(p.n_hosts):
            for url, xml, ct in sitemap_docs_of(p, k):
                out.append(
                    {
                        "url": url,
                        "url_hash": url_md5(url),
                        "host": f"h{k}.example",
                        "status": 200,
                        "content_type": ct,
                        "body": xml.encode("utf-8"),
                    }
                )
    return out
