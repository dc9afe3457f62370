"""Property tests for the XPath-subset engine: parser/renderer round-trip
over randomly generated ASTs, and total robustness of validation/matching
on arbitrary input strings."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from sparkcrawl.xpath import (
    Step,
    Test,
    is_valid_xpath,
    match_document,
    parse_xpath,
)

names = st.from_regex(r"[A-Za-z_][A-Za-z0-9_]{0,8}", fullmatch=True).filter(
    lambda s: s not in ("text", "contains")
)
# string literals: anything without a double quote
literals = st.text(
    alphabet=st.characters(
        blacklist_characters='"', min_codepoint=32, max_codepoint=126
    ),
    max_size=12,
)


def _tests(depth: int):
    base = st.one_of(
        st.builds(lambda v: Test("text_eq", value=v), literals),
        st.builds(lambda v: Test("contains", value=v), literals),
        st.builds(lambda n, v: Test("attr", name=n, value=v), names, literals),
    )
    if depth <= 0:
        return base
    return st.one_of(
        base,
        st.builds(lambda s: Test("step", step=s), _steps(depth - 1)),
    )


def _steps(depth: int):
    children = (
        st.none() if depth <= 0 else st.one_of(st.none(), _steps(depth - 1))
    )
    return st.builds(
        lambda n, ts, c: Step(n, tuple(ts), c),
        names,
        st.lists(_tests(depth - 1), max_size=2),
        children,
    )


def render(step: Step) -> str:
    out = "/" + _render_step(step)
    return out


def _render_step(step: Step) -> str:
    s = step.name
    for t in step.tests:
        if t.kind == "text_eq":
            s += f'[text()="{t.value}"]'
        elif t.kind == "contains":
            s += f'[contains(text(),"{t.value}")]'
        elif t.kind == "attr":
            s += f'[@{t.name}="{t.value}"]'
        else:
            s += f"[{_render_step(t.step)}]"
    if step.child is not None:
        s += "/" + _render_step(step.child)
    return s


@settings(max_examples=200, deadline=None)
@given(_steps(2))
def test_render_parse_roundtrip(ast):
    expr = render(ast)
    parsed = parse_xpath(expr)
    assert parsed == ast, expr


@settings(max_examples=300, deadline=None)
@given(st.text(max_size=40))
def test_validation_total(s):
    # never throws, always returns a bool
    assert is_valid_xpath(s) in (True, False)


@settings(max_examples=100, deadline=None)
@given(st.text(max_size=40), st.text(max_size=80))
def test_match_total(expr, doc):
    # matching arbitrary (expr, doc) never throws
    assert match_document(expr, doc) in (True, False)


html_names = st.from_regex(r"[A-Za-z][A-Za-z0-9_]{0,8}", fullmatch=True).filter(
    lambda s: s not in ("text", "contains")
)  # html.parser only lexes letter-initial tags


def _html_steps(depth: int):
    children = (
        st.none() if depth <= 0 else st.one_of(st.none(), _html_steps(depth - 1))
    )
    return st.builds(lambda n, c: Step(n, (), c), html_names, children)


@settings(max_examples=100, deadline=None)
@given(_html_steps(2))
def test_root_step_always_matches_own_doc(ast):
    # a doc synthesized to satisfy a test-free chain must match it
    def strip(s: Step) -> Step:
        return Step(s.name, (), None if s.child is None else strip(s.child))

    bare = strip(ast)

    def render_doc(s: Step) -> str:
        inner = "" if s.child is None else render_doc(s.child)
        return f"<{s.name}>{inner}</{s.name}>"

    # html.parser lowercases tag names; compare against a lowercased chain
    def lower(s: Step) -> Step:
        return Step(
            s.name.lower(), (), None if s.child is None else lower(s.child)
        )

    assert match_document(render(lower(bare)), render_doc(bare))
