"""Hypothesis property tests over the pure-Python cores (no Spark —
these run in milliseconds and shrink counterexamples).

Invariants:
* canonicalize: output is '' or an absolute http(s) URL with no
  fragment and no dot segments; idempotent (canon of a canonical URL
  against any base returns itself); host extraction round-trips.
* cipher (sites P9): decode ∘ encode = identity for any plain text,
  10-char key, separator, and filler letter.
* parse_core: render → parse round-trips spans (kind/text/order) and
  links; charset sniff honors header over meta over default, and
  decode_body(render_body(...)) restores the text for every declared
  charset.
"""

import string

from hypothesis import example, given, settings
from hypothesis import strategies as st

from loong_spark.canon_core import canonicalize, extract_host, resolve_href
from loong_spark.parse_core import decode_body, parse_html, render_body, render_html
from loong_spark.sites import ALPHABET, decode_comic_image_py

# -- canonicalization -------------------------------------------------------

_host = st.from_regex(r"[a-z][a-z0-9-]{0,10}(\.[a-z]{2,5}){1,2}", fullmatch=True)
_path = st.from_regex(r"(/[a-zA-Z0-9._~-]{0,8}){0,4}/?", fullmatch=True)
_href = st.one_of(
    st.from_regex(r"https?://[a-z0-9.-]{1,20}(/[a-zA-Z0-9._~-]{0,8}){0,3}", fullmatch=True),
    _path,                                   # relative / absolute-path
    st.from_regex(r"(\.\./){0,3}[a-zA-Z0-9_-]{0,8}", fullmatch=True),
    st.from_regex(r"#[a-zA-Z0-9]{0,8}", fullmatch=True),
    st.from_regex(r"(javascript|mailto|ftp):[a-zA-Z0-9@./]{0,10}", fullmatch=True),
    st.just(""),
)


@given(host=_host, path=_path, href=_href)
@settings(max_examples=300, deadline=None)
@example(
    host='a.aa',
    path='/./',
    href='',
).via('discovered failure')
def test_canonicalize_invariants(host, path, href):
    base = f"http://{host}{path or '/'}"
    out = canonicalize(base, href)
    if out == "":
        return
    assert out.startswith("http://") or out.startswith("https://")
    assert "#" not in out
    # dot segments never survive in the PATH (the authority may legally
    # contain dots)
    rest = out.split("://", 1)[1]
    out_path = rest[rest.find("/"):] if "/" in rest else ""
    assert "/./" not in out_path and "/../" not in out_path
    # fragment-strip of a canonical URL is a no-op
    assert canonicalize(out, "") == out
    # idempotence of the RESOLVER: re-canonicalizing a resolved URL (as
    # an href, or as a base with an empty href) returns it unchanged —
    # the empty-href branch normalizes the base like any absolute href
    assert canonicalize(base, out) == out
    # host extraction is a prefix of the URL's authority
    h = extract_host(out)
    assert h and rest.startswith(h)


@given(host=_host, segs=st.lists(st.sampled_from(["a", "b", "..", "."]), max_size=6))
@settings(max_examples=200, deadline=None)
def test_resolve_href_dot_segments_never_escape(host, segs):
    """Dot segments can never climb above the root."""
    base = f"http://{host}/x/y"
    out = resolve_href(base, "/".join(segs))
    if out:
        rest = out.split("://", 1)[1]
        assert ".." not in rest.split("/")[1:]


# -- site cipher ------------------------------------------------------------

_key = st.lists(
    st.sampled_from(string.ascii_uppercase + "!@#$%^&*"),
    min_size=11, max_size=11, unique=True,
)


@given(
    plain=st.text(
        alphabet=string.ascii_lowercase + string.digits + ":/._-", min_size=1, max_size=50
    ),
    key=_key,
    x=st.sampled_from(ALPHABET),
)
@settings(max_examples=300, deadline=None)
def test_cipher_roundtrip(plain, key, x):
    from tests.test_sites import encode_py

    k, f = "".join(key[:10]), key[10]
    assert decode_comic_image_py(encode_py(plain, k, f, x)) == plain


# -- parse core -------------------------------------------------------------

_span = st.fixed_dictionaries(
    {
        "kind": st.sampled_from(["text", "media"]),
        "text": st.text(alphabet=string.ascii_letters + string.digits, min_size=1, max_size=20),
    }
)
_links = st.lists(
    st.from_regex(r"(https?://[a-z]{1,8}\.example/p/\d{1,4}|/rel/[a-z0-9]{1,6})", fullmatch=True),
    max_size=5,
)


@given(spans=st.lists(_span, min_size=1, max_size=6), links=_links)
@settings(max_examples=200, deadline=None)
def test_render_parse_roundtrip(spans, links):
    spans = [
        {
            "kind": s["kind"],
            "text": s["text"] if s["kind"] == "text" else "",
            "media_ref": f"media://m/{i}" if s["kind"] == "media" else None,
            "offset": i,
        }
        for i, s in enumerate(spans)
    ]
    html = render_html(spans, links)
    rows = parse_html("http://h.example/p", html)
    got_spans = sorted(
        (r for r in rows if r["out_kind"] == "span"), key=lambda r: r["offset"]
    )
    assert [(r["kind"], r["text"], r["media_ref"] or None) for r in got_spans] == [
        (s["kind"], s["text"], s["media_ref"]) for s in spans
    ]
    got_links = [r["href"] for r in sorted(
        (r for r in rows if r["out_kind"] == "link"), key=lambda r: r["link_idx"]
    )]
    assert got_links == links


@given(
    text=st.text(alphabet=string.ascii_letters + " àéüñ中文", min_size=1, max_size=30),
    charset=st.sampled_from(["utf-8", "gbk", "latin-1"]),
    declare=st.sampled_from(["header", "meta"]),
)
@settings(max_examples=200, deadline=None)
def test_charset_roundtrip(text, charset, declare):
    """Declared-charset bytes decode back to the original text (chars
    unencodable in the target charset are skipped by the fixture)."""
    try:
        text.encode(charset)
    except UnicodeEncodeError:
        return  # charset can't express the text — not a valid page fixture
    spans = [{"kind": "text", "text": text, "media_ref": None, "offset": 0}]
    body = render_body(spans, [], charset=charset, declare=declare)
    ctype = f"text/html; charset={charset}" if declare == "header" else "text/html"
    decoded = decode_body(ctype, body)
    assert text in decoded


# -- seq bit-packing (pipeline total order) ----------------------------------

from loong_spark.pipeline import SEQ_BATCH_MAX, SEQ_LINK_BITS, SEQ_RANK_BITS


def _pack_seq(batch: int, rank: int, idx: int) -> int:
    return (batch << 40) | (rank << SEQ_LINK_BITS) | idx


_seq_tuple = st.tuples(
    st.integers(0, SEQ_BATCH_MAX - 1),
    st.integers(0, (1 << SEQ_RANK_BITS) - 1),
    st.integers(0, (1 << SEQ_LINK_BITS) - 1),
)


@given(a=_seq_tuple, b=_seq_tuple)
@settings(max_examples=500, deadline=None)
@example(a=(SEQ_BATCH_MAX - 1, (1 << 20) - 1, (1 << 20) - 1), b=(0, 0, 0))
@example(a=(0, 1, 0), b=(0, 0, (1 << 20) - 1))  # rank beats max link_idx
def test_seq_packing_is_order_isomorphic(a, b):
    """Within the guarded field bounds, packed-seq order == lexicographic
    (batch_id, parent_rank, link_idx) order, and the packed value never
    reaches the robots bit 61 — the invariants the construction-time and
    in-expression guards (pipeline.SEQ_*) protect."""
    pa, pb = _pack_seq(*a), _pack_seq(*b)
    assert (pa < pb) == (a < b)
    assert (pa == pb) == (a == b)
    assert 0 <= pa < (1 << 61)  # robots rows (bit 61 set) stay unique
