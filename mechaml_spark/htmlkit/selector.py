"""CSS-subset selector engine (Lambdasoup-tested surface only).

Supported grammar — exactly the surface exercised by the reference's
test suite (test/test.ml:209-225, 569-588, 596-616) plus what the
examples use (``[src$=.png]``, examples/download_images.ml:34):

  simple:    tag, ``*``, ``.class``, ``#id``, ``[attr]``, ``[attr=v]``,
             ``[attr^=v]``, ``[attr$=v]``, ``[attr*=v]``, ``[attr~=v]``
  compound:  concatenation of the above (``form.cls[attr=v]``)
  combinators: descendant (whitespace), child ``>``, adjacent
             sibling ``+``, general sibling ``~``

Attribute values may be bare (``[id=form-one]``, ``[src$=.png]``) or
quoted.  Anything outside this grammar raises ``SelectorError`` —
untested reference selector features are an explicit out-of-contract
boundary (SURVEY.md §7 "hard parts").

``tag_selector`` replicates the reference's selector normalization
(src/page.ml:63-67): ``"" -> default``; leading ``*`` -> as-is;
leading identifier char ([a-z0-9_-], case-insensitive) -> as-is;
anything else -> ``default + selector``.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from mechaml_spark.htmlkit.parser import Element


class SelectorError(ValueError):
    pass


def is_identifier_char(c: str) -> bool:
    c = c.lower()
    return ("a" <= c <= "z") or ("0" <= c <= "9") or c in "-_"


def tag_selector(default_tag: str, selector: str) -> str:
    if selector == "":
        return default_tag
    if selector[0] == "*":
        return selector
    if is_identifier_char(selector[0]):
        return selector
    return default_tag + selector


@dataclass
class Compound:
    tag: str | None = None  # None or '*' both mean "any tag"
    id: str | None = None
    classes: list[str] = field(default_factory=list)
    attrs: list[tuple[str, str, str]] = field(default_factory=list)
    # (name, op, value); op in {'present','=','^=','$=','*=','~='}

    def matches(self, el: Element) -> bool:
        if self.tag and self.tag != "*" and el.tag != self.tag:
            return False
        if self.id is not None and el.attrs.get("id") != self.id:
            return False
        if self.classes:
            have = (el.attrs.get("class") or "").split()
            if any(c not in have for c in self.classes):
                return False
        for name, op, value in self.attrs:
            actual = el.attrs.get(name)
            if actual is None:
                return False
            if op == "present":
                continue
            if op == "=" and actual != value:
                return False
            if op == "^=" and not actual.startswith(value):
                return False
            if op == "$=" and not actual.endswith(value):
                return False
            if op == "*=" and value not in actual:
                return False
            if op == "~=" and value not in actual.split():
                return False
        return True


_TOKEN = re.compile(
    r"""
    (?P<ws>\s+)
  | (?P<comb>[>+~])
  | (?P<star>\*)
  | (?P<hash>\#[\w-]+)
  | (?P<cls>\.[\w-]+)
  | (?P<tag>[\w-]+)
  | (?P<attr>\[\s*(?P<aname>[\w-]+)\s*
       (?:(?P<aop>[\^\$\*~]?=)\s*
          (?P<aval>"[^"]*"|'[^']*'|[^\]]*)
       )?\s*\])
    """,
    re.VERBOSE,
)

# parsed selector = [(combinator, Compound)], combinator of the FIRST
# entry is None; for later entries one of ' ', '>', '+', '~'
Parsed = list[tuple[str | None, Compound]]


def parse_selector(css: str) -> Parsed:
    css = css.strip()
    if not css:
        raise SelectorError("empty selector")
    if "," in css:
        raise SelectorError(f"selector groups unsupported: {css!r}")
    items: list[tuple[str | None, Compound]] = []
    cur: Compound | None = None
    next_comb: str | None = None  # explicit combinator awaiting a compound
    saw_ws = False
    pos = 0
    while pos < len(css):
        m = _TOKEN.match(css, pos)
        if not m:
            raise SelectorError(f"bad selector syntax at {css[pos:]!r}")
        pos = m.end()
        if m.group("ws"):
            saw_ws = True
            continue
        if m.group("comb"):
            if cur is None and not items:
                raise SelectorError(f"combinator with no left side: {css!r}")
            if next_comb is not None:
                raise SelectorError(f"double combinator: {css!r}")
            if cur is not None:
                items.append((cur_comb, cur))  # noqa: F821 - set when cur was opened
                cur = None
            next_comb = m.group("comb")
            saw_ws = False
            continue
        # a simple-selector token begins or extends a compound
        if cur is not None and saw_ws:
            items.append((cur_comb, cur))
            cur = None
        if cur is None:
            cur_comb = next_comb if next_comb else (" " if items else None)
            next_comb = None
            cur = Compound()
        saw_ws = False
        if m.group("star"):
            cur.tag = "*"
        elif m.group("hash"):
            cur.id = m.group("hash")[1:]
        elif m.group("cls"):
            cur.classes.append(m.group("cls")[1:])
        elif m.group("tag"):
            if cur.tag is not None or cur.id or cur.classes or cur.attrs:
                raise SelectorError(f"tag must lead a compound: {css!r}")
            cur.tag = m.group("tag")
        else:  # attr
            name = m.group("aname")
            op = m.group("aop")
            val = m.group("aval")
            if op is None:
                cur.attrs.append((name, "present", ""))
            else:
                if val and val[0] in "\"'" and val[-1] == val[0] and len(val) >= 2:
                    val = val[1:-1]
                cur.attrs.append((name, op, val.strip() if val else ""))
    if cur is None:
        raise SelectorError(f"dangling combinator: {css!r}")
    items.append((cur_comb, cur))
    return items


def match_element(parsed: Parsed, el: Element) -> bool:
    """True when ``el`` matches the rightmost compound with all
    combinators satisfied walking left."""

    def walk(i: int, node: Element) -> bool:
        comb, comp = parsed[i]
        if not comp.matches(node):
            return False
        if i == 0:
            return True
        left_comb = comb  # combinator linking parsed[i-1] to parsed[i]
        if left_comb == ">":
            p = node.parent
            return p is not None and p.tag != "#document" and walk(i - 1, p)
        if left_comb == " ":
            p = node.parent
            while p is not None and p.tag != "#document":
                if walk(i - 1, p):
                    return True
                p = p.parent
            return False
        if left_comb == "+":
            s = node.prev_elt
            return s is not None and walk(i - 1, s)
        if left_comb == "~":
            s = node.prev_elt
            while s is not None:
                if walk(i - 1, s):
                    return True
                s = s.prev_elt
            return False
        raise SelectorError(f"unknown combinator {left_comb!r}")

    return walk(len(parsed) - 1, el)


def compile_selector(css: str):
    """Compile to a pure-Python predicate ``Element -> bool``."""
    parsed = parse_selector(css)
    return lambda el: match_element(parsed, el)


def select(root: Element, css: str) -> list[Element]:
    """All elements under ``root`` matching ``css``, document order."""
    pred = compile_selector(css)
    return [el for el in root.iter_subtree() if el.tag != "#document" and pred(el)]
