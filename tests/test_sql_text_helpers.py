"""Property tests for the statement-text helpers added in r13:
_strip_comments (one-pass, literal-preserving, nesting-aware) and
Engine._mv_code_view (length-preserving literal blanking).

The generator builds text from typed segments and constructs the
EXPECTED output alongside — an oracle by construction, so the
properties hold for every interleaving of literals, comments and code
(the cross-pairing class of memory blind-spot #7)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from olympia_spark.engine import Engine, _normalize, _strip_comments

# code characters that can never open a literal or a comment
_CODE = st.text(
    alphabet="abcXYZ019 _,.()=<>+\n\t;", min_size=0, max_size=12)

# literal body pieces: plain chars (no quote/backslash), a '' doubling,
# a backslash-escaped quote, and comment-LOOKING content that must
# survive verbatim inside literals
_SQ_PIECE = st.one_of(
    st.text(alphabet="abc -*/(", min_size=0, max_size=6),
    st.just("''"), st.just("\\'"), st.just("--x"), st.just("/*y*/"),
    st.just('"'), st.just("`"))
_DQ_PIECE = st.one_of(
    st.text(alphabet="abc -*/(", min_size=0, max_size=6),
    st.just('\\"'), st.just("--x"), st.just("/*y*/"), st.just("'"),
    st.just("`"))


@st.composite
def _segment(draw):
    kind = draw(st.sampled_from(
        ["code", "sq", "dq", "bt", "line", "block"]))
    if kind == "code":
        t = draw(_CODE)
        return t, t
    if kind == "sq":
        body = "".join(draw(st.lists(_SQ_PIECE, max_size=4)))
        t = f"'{body}'"
        return t, t
    if kind == "dq":
        body = "".join(draw(st.lists(_DQ_PIECE, max_size=4)))
        t = f'"{body}"'
        return t, t
    if kind == "bt":
        body = draw(st.text(alphabet="abc -*/('\"", max_size=6))
        t = f"`{body}`"
        return t, t
    if kind == "line":
        # always newline-terminated here: an unterminated line comment
        # correctly swallows every LATER segment to EOF, which the
        # per-segment oracle cannot express (covered by the explicit
        # EOF example below)
        body = draw(st.text(alphabet="abc '\"`*/(", max_size=8))
        return "--" + body + "\n", " \n"
    # block comment, possibly nested, quotes allowed inside
    inner = draw(st.text(alphabet="abc '\"`-(", max_size=6))
    depth = draw(st.integers(min_value=1, max_value=3))
    t = "/*" * depth + inner + "*/" * depth
    return t, " "


@given(st.lists(_segment(), max_size=10))
@settings(max_examples=300, deadline=None)
def test_strip_comments_matches_constructed_oracle(segs):
    text = "".join(t for t, _e in segs)
    expected = "".join(e for _t, e in segs)
    assert _strip_comments(text) == expected


@given(st.lists(_segment(), max_size=10))
@settings(max_examples=150, deadline=None)
def test_strip_comments_idempotent(segs):
    text = "".join(t for t, _e in segs)
    once = _strip_comments(text)
    assert _strip_comments(once) == once


@given(st.lists(_segment(), max_size=8))
@settings(max_examples=150, deadline=None)
def test_code_view_is_length_preserving_and_blanks_literals(segs):
    # the code view contract only covers backslash/backtick-free text
    # (its callers refuse those up front), so filter them here
    text = "".join(t for t, _e in segs).replace("\\", "").replace("`", "")
    view = Engine._mv_code_view(text)
    assert len(view) == len(text)
    # every non-blanked position matches the original
    assert all(v == " " or v == c for v, c in zip(view, text))
    # quote chars survive (they delimit), parens inside literals do not
    quote = None
    for c, v in zip(text, view):
        if quote:
            if c == quote:
                assert v == c
                quote = None
            else:
                assert v == " "
        elif c in "'\"":
            assert v == c
            quote = c
        else:
            assert v == c


def test_line_comment_at_eof_swallows_to_end():
    assert _strip_comments("SELECT a -- b 'lit' /* c */") == "SELECT a  "


def test_normalize_examples():
    assert _normalize("SELECT a -- c\nFROM t") == "SELECT a FROM t"
    assert _normalize("SELECT k /* o /* i */ t */, v FROM t") \
        == "SELECT k , v FROM t"
    assert _normalize("SELECT '--lit' FROM t -- real") \
        == "SELECT '--lit' FROM t"
    assert _normalize("SELECT 'don''t -- keep' FROM t") \
        == "SELECT 'don''t -- keep' FROM t"
    assert _normalize("SELECT /*+ BROADCAST(t) */ a FROM t") \
        == "SELECT a FROM t"


def test_whitespace_inside_escaped_literals_survives_normalize():
    """r13 review pass 4 (reproduced): the old collapse pass used its
    own (escape-blind) literal grammar — a backslash-escaped quote
    closed the literal early and runs of spaces INSIDE the real
    literal collapsed in executed statement text. The scanner now owns
    both comment removal and the collapse under one grammar."""
    assert _normalize(r"SELECT 'a\' -- b   c' AS x") \
        == r"SELECT 'a\' -- b   c' AS x"
    assert _normalize("SELECT `an   ident` ,   b FROM t") \
        == "SELECT `an   ident` , b FROM t"
    assert _normalize('INSERT INTO t VALUES (\'C:\\dir\\\', "x   y")') \
        == 'INSERT INTO t VALUES (\'C:\\dir\\\', "x   y")'
