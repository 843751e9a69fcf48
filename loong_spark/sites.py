"""Site-specific transform library (U2's per-site parse payloads).

The reference ships per-site scraper classes whose interesting logic is
three string-transform families; each is re-expressed here as PURE
column expressions (whole-stage-codegen JVM ops — no Python in the hot
path, no UDF):

* P9  — obfuscated image-URL cipher decode
        (/root/reference/lib/Loong/Scraper/Hhssee.pm:131-166
         decode_comic_image; :168-205 parse_photo). The cipher packs a
        per-string key: s = [body][10-char key k][separator f][filler
        ending in a letter x whose alphabet position xi gives the filler
        length]. Decode: replace key-char i of k in body with digit i,
        split on f, each piece is a char code.
* P10 — JS-embedded HTML unwrap: document.write("…") payload extract +
        backslash-unescape, then re-parse
        (/root/reference/lib/Loong/Scraper/Jrs.pm:29-31).
* P11 — form/query URL synthesis from scraped key/value pairs
        (so.addVariable('k','v') → getfile.php?VID=…&seccode=…) and the
        file=… redirect hop
        (/root/reference/lib/Loong/Scraper/91porn.pm:40-72).

A pure-Python twin of the cipher (`decode_comic_image_py`) mirrors the
reference semantics 1:1 for property tests — same pattern as
canon/canon_core.

Scale: every transform is a scalar projection — no shuffle, no Python;
at 100 TB these ride the parse/scan stage for free.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

ALPHABET = "abcdefghijklmnopqrstuvwxyz"


# --------------------------------------------------------------------------
# P9: comic image-URL cipher
# --------------------------------------------------------------------------

def decode_comic_image_py(s: str) -> str:
    """Reference-faithful Python port of Hhssee.pm:131-166 (the oracle
    twin for the column expression below).

    Layout: body | k (10 chars) | f (1 char) | filler (xi chars, last =
    letter x at alphabet position xi)."""
    x = s[-1]
    xi = ALPHABET.index(x) + 1
    sk = s[len(s) - xi - 12 : len(s) - xi - 1]  # 11 chars
    body = s[: len(s) - xi - 12]
    k, f = sk[:-1], sk[-1]
    out = []
    for ch in body:
        i = k.find(ch)
        out.append(str(i) if i >= 0 else ch)
    decoded = "".join(out)
    return "".join(chr(int(p)) for p in decoded.split(f))


def decode_comic_image_col(s: Column) -> Column:
    """P9 cipher decode as one JVM projection. Key and separator are
    DATA (per-row), so fixed-literal translate() doesn't apply — each
    body char instead runs a 10-way when-chain against the key (digit i
    iff c == k[i]), the per-row separator maps to a FIXED marker so the
    split pattern stays literal, and chr() turns the code pieces back
    into characters. All string/higher-order array built-ins —
    codegen-eligible, no UDF, no shuffle."""
    L = F.length(s)
    xi = F.ascii(s.substr(L, F.lit(1))) - 96  # alphabet position of final letter
    sk = s.substr(L - xi - 11, F.lit(11))
    body = s.substr(F.lit(1), F.greatest(L - xi - 12, F.lit(0)))
    k = F.substring(sk, 1, 10)
    f = F.substring(sk, 11, 1)

    def subst(c: Column) -> Column:
        out = F.when(c == f, F.lit("\x01"))  # separator → fixed marker
        for i in range(10):
            out = out.when(c == F.substring(k, i + 1, 1), F.lit(str(i)))
        return out.otherwise(c)

    digits = F.array_join(F.transform(F.split(body, ""), subst), "")
    decoded = F.array_join(
        F.transform(F.split(digits, "\x01"), lambda p: F.char(p.cast("int"))), ""
    )
    return F.when(body == "", F.lit("")).otherwise(decoded)


def encode_comic_image_col(plain: Column, k: str = "ghijklmnop", f: str = "q") -> Column:
    """Inverse cipher with a FIXED key (fixture/builder side — the
    reference only ever decodes; encode exists so synthetic corpora can
    plant decodable strings). char codes joined by f, digits mapped to
    key chars, then key + separator + filler; filler is xi+1 chars whose
    last letter 'a' (alphabet position xi=1) encodes its own length."""
    assert len(k) == 10 and len(f) == 1 and f not in k
    codes = F.array_join(
        F.transform(F.split(plain, ""), lambda c: F.ascii(c).cast("string")), f
    )
    return F.concat(F.translate(codes, "0123456789", k), F.lit(k + f + "_a"))


def photo_url_col(page_url: Column, hd_domain_value: Column, img_name: Column) -> Column:
    """P9 companion (Hhssee.pm:168-205 parse_photo): pick the CDN domain
    — hd_domain_value is a '|'-separated list; the index comes from the
    page URL's bare `=N` query param (default 0; a single-entry list
    always wins) — and join it with the deciphered image name."""
    domains = F.split(hd_domain_value, "\\|")
    idx = F.coalesce(
        F.nullif(F.regexp_extract(page_url, r"(^|\?|&)=([^&]*)(\s|&|$)", 2), F.lit("")),
        F.lit("0"),
    ).cast("int")
    domain = F.regexp_replace(
        F.when(F.size(domains) == 1, domains[0]).otherwise(F.element_at(domains, idx + 1)),
        "/$",
        "",
    )
    return F.concat_ws("/", domain, decode_comic_image_col(img_name))


# --------------------------------------------------------------------------
# P10: document.write unwrap
# --------------------------------------------------------------------------

def unwrap_document_write_col(js: Column) -> Column:
    """Jrs.pm:29-31: first ("…") argument payload (dot-matches-newline,
    non-greedy), backslashes stripped. The result is HTML ready for a
    second parse pass (feed back through rules.parse_pages)."""
    payload = F.regexp_extract(js, r'(?s)\("(.*?)"\)', 1)
    return F.regexp_replace(payload, r"\\", "")


# --------------------------------------------------------------------------
# P11: form/query URL synthesis
# --------------------------------------------------------------------------

def addvariable_map_col(html: Column) -> Column:
    """map<string,string> of every so.addVariable('k','v') occurrence
    (91porn.pm:46-50's %matched hash)."""
    pat = F.lit(r"so\.addVariable\('(.+?)','(.+?)'\)")
    keys = F.regexp_extract_all(html, pat, F.lit(1))
    vals = F.regexp_extract_all(html, pat, F.lit(2))
    return F.map_from_arrays(keys, vals)


def getfile_url_col(base: Column, html: Column) -> Column:
    """91porn.pm:51-57: base + /getfile.php?VID=<file>&mp4=<mp4>
    &seccode=<seccode>&max_vid=<max_vid> from the addVariable map."""
    m = addvariable_map_col(html)
    return F.concat(
        base,
        F.lit("/getfile.php?VID="), m["file"],
        F.lit("&mp4="), m["mp4"],
        F.lit("&seccode="), m["seccode"],
        F.lit("&max_vid="), m["max_vid"],
    )


def file_redirect_col(html: Column) -> Column:
    """91porn.pm:63-72: the getfile response's `file=…` value,
    percent-unescaped; NULL when absent (caller drops)."""
    return F.nullif(F.url_decode(F.regexp_extract(html, r"file=(\S+)", 1)), F.lit(""))


# --------------------------------------------------------------------------
# U3: user-agent pool sampler (lib/Loong/Mojo/UserAgent/Pool.pm:7-29)
# --------------------------------------------------------------------------

#: tagged UA pool. The reference carries ~150 strings in __DATA__; the
#: semantics that matter are (a) tagged web/mobile subsets and (b) a
#: per-request pick. Strings here are generic stand-ins, NOT copied.
UA_POOL = {
    "web": [
        "Mozilla/5.0 (X11; Linux x86_64) AppleWebKit/537.36 Chrome/120.0 Safari/537.36",
        "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 Chrome/119.0 Safari/537.36",
        "Mozilla/5.0 (Macintosh; Intel Mac OS X 10_15_7) Gecko/20100101 Firefox/121.0",
        "Mozilla/5.0 (Windows NT 10.0; rv:120.0) Gecko/20100101 Firefox/120.0",
    ],
    "mobile": [
        "Mozilla/5.0 (iPhone; CPU iPhone OS 17_0 like Mac OS X) Version/17.0 Mobile Safari/604.1",
        "Mozilla/5.0 (Linux; Android 14; Pixel 8) Chrome/120.0 Mobile Safari/537.36",
        "Mozilla/5.0 (iPad; CPU OS 17_0 like Mac OS X) Version/17.0 Mobile Safari/604.1",
    ],
}


def ua_pool_col(key: Column, kind: str = "web") -> Column:
    """Deterministic per-request UA pick: hash the request key (url/seq)
    into the tagged pool. The reference samples randomly per request
    (Pool.pm:20-29); a distributed engine wants the pick reproducible
    across retries/speculative tasks, so the hash replaces the RNG —
    same uniform spread, stable per URL."""
    pool = UA_POOL[kind]
    arr = F.array(*[F.lit(u) for u in pool])
    return F.element_at(arr, (F.pmod(F.xxhash64(key), F.lit(len(pool))) + 1).cast("int"))


# --------------------------------------------------------------------------
# P6: CN-label → EN-column term maps (lib/Loong/Scraper/Hupu.pm:6-39)
# --------------------------------------------------------------------------

#: stat-label terms (Hupu.pm $nba_terms)
NBA_TERMS = {
    "平均得分": "PPG", "场均失分": "LPG", "平均出手数": "FGA",
    "平均命中率": "FGP", "平均3分得分": "3PM", "平均3分出手数": "3PA",
    "平均3分命中率": "3PP", "平均罚球出手数": "FTA",
    "平均罚球命中次数": "FTM", "平均罚球命中率": "FTP",
    "平均防守篮板": "DEFR", "平均进攻篮板": "OFFR", "平均篮板球数": "RPG",
    "平均助攻": "APG", "平均抢断": "SPG", "平均盖帽": "BPG",
    "平均失误": "TPG", "平均犯规": "FPG", "平均时间": "MIN",
}

#: player-profile terms (Hupu.pm $player_terms)
PLAYER_TERMS = {
    "身高": "height", "位置": "pos", "体重": "weight", "生日": "birthday",
    "球队": "zh_team", "学校": "school", "选秀": "draft", "国籍": "country",
    "本赛季薪金": "salary", "合同": "contract",
}


def term_lookup_col(label: Column, terms: dict[str, str]) -> Column:
    """CN label → EN column name via a literal map folded into the plan
    (NULL for unknown labels — the reference's hash miss). A literal
    map + element_at stays in codegen; no join, no shuffle."""
    pairs: list[Column] = []
    for cn, en in terms.items():
        pairs.extend([F.lit(cn), F.lit(en)])
    return F.element_at(F.create_map(*pairs), label)


# --------------------------------------------------------------------------
# P7: date normalization (lib/Loong/Scraper/Hhssee.pm:74-77)
# --------------------------------------------------------------------------

def normalize_date_col(text: Column) -> Column:
    """First `Y/M/D` triple in the text → zero-padded 'YYYY-MM-DD'
    (reference: regex capture + sprintf '%.4d-%.2d-%.2d'). NULL when no
    triple matches."""
    y = F.regexp_extract(text, r"(\d+)/(\d+)/(\d+)", 1)
    m = F.regexp_extract(text, r"(\d+)/(\d+)/(\d+)", 2)
    d = F.regexp_extract(text, r"(\d+)/(\d+)/(\d+)", 3)
    return F.when(
        y != "",
        F.format_string("%04d-%02d-%02d", y.cast("int"), m.cast("int"), d.cast("int")),
    )


# --------------------------------------------------------------------------
# U2: site-route registry — dispatch + per-route extraction in one plan
# --------------------------------------------------------------------------

def site_routes():
    """The per-site route table (reference: one scraper class per site,
    lib/Loong/Crawler.pm:211-230 load_class + each class's ``get``
    routes). Declaration order = dispatch priority (pinned F5
    semantics). Each entry: (Rule, next-URL builder | None)."""
    from .rules import Rule

    return [
        # $ctx->{base} = scheme://host of the page URL (91porn.pm:52)
        (Rule(r"view_video\.php\?viewkey=", "video_page"),
         lambda url, body: getfile_url_col(
             F.regexp_extract(url, r"^(https?://[^/]+)", 1), body
         )),
        (Rule(r"getfile\.php\?", "getfile_redirect"),
         lambda url, body: file_redirect_col(body)),
        (Rule(r"/comic/", "comic_photo"),
         lambda url, body: photo_url_col(
             url,
             F.regexp_extract(body, r'id="hdDomain"\s+value="([^"]*)"', 1),
             F.regexp_extract(body, r'<img[^>]*id="img\d+"[^>]*name="([^"]*)"', 1),
         )),
        (Rule(r"\.js($|\?)", "js_wrapped"), None),  # unwrap → second parse pass
    ]


def site_dispatch(
    pages, url_col: str = "url", body_col: str = "body"
) -> "DataFrame":  # noqa: F821
    """One projection: route each page (F5 chain, first match wins) and
    evaluate ONLY its route's extractor via a when-chain — unmatched
    routes' expressions never run for a row, Catalyst prunes the rest.
    Output: (url, route, next_url, unwrapped_html). No shuffle, no
    Python; at 100 TB this rides the parse scan."""
    from .rules import route_match_col

    routes = site_routes()
    url, body = F.col(url_col), F.col(body_col)
    rid = route_match_col(url, [r for r, _ in routes])
    nxt = F.lit(None).cast("string")
    for i in reversed(range(len(routes))):
        _, builder = routes[i]
        if builder is not None:
            nxt = F.when(rid == i, builder(url, body)).otherwise(nxt)
    name = F.lit(None).cast("string")
    for i in reversed(range(len(routes))):
        name = F.when(rid == i, F.lit(routes[i][0].name)).otherwise(name)
    unwrapped = F.when(
        name == "js_wrapped", unwrap_document_write_col(body)
    ).otherwise(F.lit(None).cast("string"))
    return pages.select(
        url.alias("url"),
        name.alias("route"),
        nxt.alias("next_url"),
        unwrapped.alias("unwrapped_html"),
    )
