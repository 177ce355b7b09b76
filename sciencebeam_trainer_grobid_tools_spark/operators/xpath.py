"""Minimal XPath 1.0 subset evaluator over stdlib ``xml.etree`` Elements.

The reference delegates XPath evaluation to lxml
(/root/reference/sciencebeam_trainer_grobid_tools/annotation/target_annotation.py:59-62,
``parent.xpath(s)``), and its shipped ``config/xml-mapping.conf`` uses
constructs stdlib ElementTree cannot evaluate::

    contrib[not(@contrib-type) or @contrib-type="author"]/name
    kwd[@kwd-group-type='author-keywords' or not(@kwd-group-type)]
    back//sec[not(ancestor::ack)]/p[not(ancestor::ack)]
    ./*[not(self::list-item)]
    .//string-name[not(ancestor::person-group)]
    (//sec | //ack)/p

lxml is not available in this environment, so this module implements the
required subset directly:

- location paths: relative and absolute, ``//`` (descendant-or-self
  shorthand), ``.``, ``..``, ``*`` name test
- unions at any nesting, including parenthesized group prefixes
- axes: child (default), ``self::``, ``parent::``, ``ancestor::``,
  ``ancestor-or-self::``, ``descendant::``, ``descendant-or-self::``
- predicates: ``[@a]``, ``[@a="v"]``, ``[@a!="v"]``, ``[path]``,
  ``[path="v"]`` (string-value comparison), ``[not(expr)]``,
  ``and`` / ``or``, and numeric position ``[N]``

Results are de-duplicated and returned in document order, matching lxml's
``.xpath()`` nodeset semantics.  Parsed expressions are cached; evaluation
state (parent pointers + document positions) lives in :class:`XPathContext`,
built once per document.
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET
from functools import lru_cache
from typing import Dict, Iterable, List, Optional, Sequence, Tuple, Union


class XPathSyntaxError(ValueError):
    pass


# ---------------------------------------------------------------------------
# tokenizer

_TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+)
  | (?P<dslash>//)
  | (?P<slash>/)
  | (?P<ddot>\.\.)
  | (?P<dot>\.)
  | (?P<lbrack>\[) | (?P<rbrack>\])
  | (?P<lparen>\() | (?P<rparen>\))
  | (?P<axis>::)
  | (?P<at>@)
  | (?P<neq>!=) | (?P<eq>=)
  | (?P<pipe>\|)
  | (?P<star>\*)
  | (?P<string>"[^"]*"|'[^']*')
  | (?P<number>\d+)
  | (?P<name>[A-Za-z_][\w\-]*)
    """,
    re.VERBOSE,
)


def _tokenize(xpath: str) -> List[Tuple[str, str]]:
    tokens: List[Tuple[str, str]] = []
    pos = 0
    while pos < len(xpath):
        m = _TOKEN_RE.match(xpath, pos)
        if not m:
            raise XPathSyntaxError("cannot tokenize %r at offset %d" % (xpath, pos))
        pos = m.end()
        kind = m.lastgroup
        if kind == "ws":
            continue
        tokens.append((kind, m.group()))
    return tokens


# ---------------------------------------------------------------------------
# AST

class _Step:
    __slots__ = ("descend", "axis", "name", "preds")

    def __init__(self, descend: bool, axis: str, name: str, preds: List):
        self.descend = descend  # preceded by '//' (descendant-or-self expansion)
        self.axis = axis        # child|self|parent|ancestor|ancestor-or-self|descendant|descendant-or-self
        self.name = name        # tag name, '*', or 'node()'
        self.preds = preds


class _Path:
    __slots__ = ("start", "steps", "group")

    def __init__(self, start: str, steps: List[_Step], group: Optional["_Union"] = None):
        self.start = start      # 'context' | 'document' | 'group'
        self.steps = steps
        self.group = group


class _Union:
    __slots__ = ("paths",)

    def __init__(self, paths: List[_Path]):
        self.paths = paths


# predicate expression nodes: ('or', a, b) ('and', a, b) ('not', e)
# ('attr', name) ('attr-cmp', name, op, value) ('num', n)
# ('path', _Union) ('path-cmp', _Union, op, value) ('literal', s)


class _Parser:
    def __init__(self, tokens: List[Tuple[str, str]], source: str):
        self.tokens = tokens
        self.i = 0
        self.source = source

    def peek(self, offset: int = 0) -> Optional[Tuple[str, str]]:
        j = self.i + offset
        return self.tokens[j] if j < len(self.tokens) else None

    def next(self) -> Tuple[str, str]:
        tok = self.peek()
        if tok is None:
            raise XPathSyntaxError("unexpected end of %r" % self.source)
        self.i += 1
        return tok

    def expect(self, kind: str) -> Tuple[str, str]:
        tok = self.next()
        if tok[0] != kind:
            raise XPathSyntaxError(
                "expected %s but found %r in %r" % (kind, tok[1], self.source)
            )
        return tok

    # ---- paths ----

    def parse_union(self) -> _Union:
        paths = [self.parse_path()]
        while self.peek() and self.peek()[0] == "pipe":
            self.next()
            paths.append(self.parse_path())
        return _Union(paths)

    def parse_path(self) -> _Path:
        tok = self.peek()
        if tok is None:
            raise XPathSyntaxError("empty path in %r" % self.source)
        if tok[0] == "lparen":
            self.next()
            group = self.parse_union()
            self.expect("rparen")
            steps = self._parse_following_steps()
            return _Path("group", steps, group)
        descend = False
        if tok[0] == "dslash":
            self.next()
            start = "document"
            descend = True
        elif tok[0] == "slash":
            self.next()
            start = "document"
        else:
            start = "context"
        steps = [self.parse_step(descend)]
        steps.extend(self._parse_following_steps())
        return _Path(start, steps)

    def _parse_following_steps(self) -> List[_Step]:
        steps: List[_Step] = []
        while True:
            tok = self.peek()
            if tok is None or tok[0] not in ("slash", "dslash"):
                return steps
            self.next()
            steps.append(self.parse_step(descend=(tok[0] == "dslash")))

    def parse_step(self, descend: bool) -> _Step:
        tok = self.next()
        if tok[0] == "dot":
            return _Step(descend, "self", "node()", self._parse_predicates())
        if tok[0] == "ddot":
            return _Step(descend, "parent", "node()", self._parse_predicates())
        axis = "child"
        if tok[0] == "name" and self.peek() and self.peek()[0] == "axis":
            axis = tok[1]
            if axis not in (
                "child", "self", "parent", "ancestor", "ancestor-or-self",
                "descendant", "descendant-or-self",
            ):
                raise XPathSyntaxError("unsupported axis %r in %r" % (axis, self.source))
            self.next()
            tok = self.next()
        if tok[0] == "star":
            name = "*"
        elif tok[0] == "name":
            name = tok[1]
            if self.peek() and self.peek()[0] == "lparen":
                # node test like node(); only node() supported
                self.next()
                self.expect("rparen")
                if name != "node":
                    raise XPathSyntaxError(
                        "unsupported node test %s() in %r" % (name, self.source)
                    )
                name = "node()"
        else:
            raise XPathSyntaxError(
                "expected name test but found %r in %r" % (tok[1], self.source)
            )
        return _Step(descend, axis, name, self._parse_predicates())

    def _parse_predicates(self) -> List:
        preds: List = []
        while self.peek() and self.peek()[0] == "lbrack":
            self.next()
            preds.append(self.parse_or_expr())
            self.expect("rbrack")
        return preds

    # ---- predicate expressions ----

    def parse_or_expr(self):
        left = self.parse_and_expr()
        while self.peek() and self.peek() == ("name", "or"):
            self.next()
            left = ("or", left, self.parse_and_expr())
        return left

    def parse_and_expr(self):
        left = self.parse_unary_expr()
        while self.peek() and self.peek() == ("name", "and"):
            self.next()
            left = ("and", left, self.parse_unary_expr())
        return left

    def parse_unary_expr(self):
        tok = self.peek()
        if tok == ("name", "not") and self.peek(1) and self.peek(1)[0] == "lparen":
            self.next()
            self.next()
            inner = self.parse_or_expr()
            self.expect("rparen")
            return ("not", inner)
        return self.parse_comparison()

    def parse_comparison(self):
        left = self.parse_value()
        tok = self.peek()
        if tok and tok[0] in ("eq", "neq"):
            op = "=" if tok[0] == "eq" else "!="
            self.next()
            right = self.parse_value()
            if right[0] != "literal":
                raise XPathSyntaxError(
                    "only literal right-hand comparisons supported in %r" % self.source
                )
            if left[0] == "attr":
                return ("attr-cmp", left[1], op, right[1])
            if left[0] == "path":
                return ("path-cmp", left[1], op, right[1])
            raise XPathSyntaxError("unsupported comparison in %r" % self.source)
        return left

    def parse_value(self):
        tok = self.peek()
        if tok is None:
            raise XPathSyntaxError("unexpected end of predicate in %r" % self.source)
        if tok[0] == "at":
            self.next()
            name = self.next()
            if name[0] not in ("name", "star"):
                raise XPathSyntaxError("bad attribute name in %r" % self.source)
            return ("attr", name[1])
        if tok[0] == "string":
            self.next()
            return ("literal", tok[1][1:-1])
        if tok[0] == "number":
            self.next()
            return ("num", int(tok[1]))
        # a relative location path used as an existence test
        return ("path", self.parse_union())


@lru_cache(maxsize=4096)
def parse_xpath(xpath: str) -> _Union:
    parser = _Parser(_tokenize(xpath), xpath)
    ast = parser.parse_union()
    if parser.peek() is not None:
        raise XPathSyntaxError(
            "trailing tokens %r in %r" % (parser.peek()[1], xpath)
        )
    return ast


@lru_cache(maxsize=4096)
def _is_et_fast_path(xpath: str) -> bool:
    """True when the xpath lies in ElementTree's ``findall`` subset with
    IDENTICAL semantics: one relative path, child-axis steps only, at most
    one ``//`` (so results are unique and in document order), predicates
    limited to ``[@a]``, ``[@a='v']`` and positional ``[n]``.

    Such paths — the overwhelming majority of real mapping configs — are
    delegated to ``Element.findall`` (the optimized stdlib ElementPath walk,
    ~1.5x faster per document than the generic evaluator); everything else
    (``or``/``and``/``not()``, ancestor axes, unions, nested-path
    comparisons) takes the full evaluator."""
    try:
        union = parse_xpath(xpath)
    except XPathSyntaxError:
        return False
    if len(union.paths) != 1:
        return False
    path = union.paths[0]
    if path.start != "context" or path.group is not None or not path.steps:
        return False
    steps = path.steps
    # leading '.' ('./x', './/x') parses as a bare self step — ET-compatible
    if (
        steps[0].axis == "self"
        and steps[0].name == "node()"
        and not steps[0].descend
        and not steps[0].preds
    ):
        steps = steps[1:]
    if not steps:
        return False
    descends = 0
    for step in steps:
        if step.axis != "child" or step.name == "node()":
            return False
        if step.descend:
            descends += 1
        for pred in step.preds:
            kind = pred[0]
            if kind == "attr" or kind == "num":
                continue
            if kind == "attr-cmp" and pred[2] == "=":
                continue
            return False
    return descends <= 1


@lru_cache(maxsize=4096)
def _et_fast_union_fragments(xpath: str):
    """For a ``a | b | c`` union whose every branch is ET-fast, return the
    branch strings (evaluated via ``findall`` each, then deduped and
    document-ordered — lxml union semantics).  None when not applicable.
    The split only fires at bracket depth 0 outside quotes."""
    if "|" not in xpath:
        return None
    fragments: List[str] = []
    depth = 0
    quote = None
    start = 0
    for i, ch in enumerate(xpath):
        if quote:
            if ch == quote:
                quote = None
        elif ch in "'\"":
            quote = ch
        elif ch == "[":
            depth += 1
        elif ch == "]":
            depth -= 1
        elif ch == "|" and depth == 0:
            fragments.append(xpath[start:i].strip())
            start = i + 1
    fragments.append(xpath[start:].strip())
    if len(fragments) < 2:
        return None
    if all(_is_et_fast_path(fragment) for fragment in fragments):
        return tuple(fragments)
    return None


# ---------------------------------------------------------------------------
# evaluation

_DOCUMENT = "<document>"  # sentinel for the virtual document node above root


class XPathContext:
    """Per-document evaluation state: parent pointers + document order.

    Equivalent role to lxml's internal tree bookkeeping; built once per
    parsed XML document and reused across every xpath evaluated on it.
    """

    def __init__(self, root: ET.Element):
        self.root = root
        self.parent: Dict[int, Union[ET.Element, str, None]] = {id(root): _DOCUMENT}
        self.pos: Dict[int, int] = {}
        for i, node in enumerate(root.iter()):
            self.pos[id(node)] = i
            for child in node:
                self.parent[id(child)] = node

    # -- axis helpers (DOCUMENT-aware) --

    def _children(self, node) -> Iterable:
        if node is _DOCUMENT:
            return (self.root,)
        return list(node)

    def _descendants_or_self(self, node) -> Iterable:
        if node is _DOCUMENT:
            yield _DOCUMENT
            yield from self.root.iter()
        else:
            yield from node.iter()

    def _parent_of(self, node):
        if node is _DOCUMENT:
            return None
        return self.parent.get(id(node))

    def _ancestors(self, node) -> Iterable:
        cur = self._parent_of(node)
        while cur is not None:
            yield cur
            cur = self._parent_of(cur)

    def parent_of(self, node: ET.Element) -> Optional[ET.Element]:
        """Element parent (None for the root element)."""
        p = self.parent.get(id(node))
        return None if p is _DOCUMENT or p is None else p

    def doc_position(self, node: ET.Element) -> Optional[int]:
        return self.pos.get(id(node))

    # -- public API --

    def findall(self, node: ET.Element, xpath: str) -> List[ET.Element]:
        """Evaluate ``xpath`` with ``node`` as the context node.

        Returns unique elements in document order (lxml nodeset semantics).
        """
        if _is_et_fast_path(xpath):
            return node.findall(xpath)
        fragments = _et_fast_union_fragments(xpath)
        if fragments is not None:
            out: List[ET.Element] = []
            for fragment in fragments:
                out.extend(node.findall(fragment))
            # union semantics: unique nodes in document order
            return self._order(out)
        result = self._eval_union(parse_xpath(xpath), (node,))
        return [n for n in result if n is not _DOCUMENT]

    def findall_multi(self, node: ET.Element, xpaths: Sequence[str]) -> List[ET.Element]:
        """Union over several xpath strings, in the reference's
        ``match_xpaths`` style (concatenated per-xpath results, like
        ``chain(*[parent.xpath(s) for s in xpaths])`` — duplicates across
        different xpaths are preserved, as in lxml)."""
        out: List[ET.Element] = []
        for xpath in xpaths:
            out.extend(self.findall(node, xpath))
        return out

    # -- internals --

    def _order(self, nodes: Iterable) -> List:
        seen = set()
        unique = []
        for n in nodes:
            if id(n) not in seen:
                seen.add(id(n))
                unique.append(n)
        return sorted(
            unique,
            key=lambda n: -1 if n is _DOCUMENT else self.pos.get(id(n), -1),
        )

    def _eval_union(self, union: _Union, context: Sequence) -> List:
        out: List = []
        for path in union.paths:
            out.extend(self._eval_path(path, context))
        if len(union.paths) > 1:
            out = self._order(out)
        return out

    def _eval_path(self, path: _Path, context: Sequence) -> List:
        if path.start == "document":
            nodes: List = [_DOCUMENT]
        elif path.start == "group":
            nodes = self._eval_union(path.group, context)
        else:
            nodes = list(context)
        for step in path.steps:
            nodes = self._eval_step(step, nodes)
            if not nodes:
                break
        return nodes

    def _match_name(self, node, name: str) -> bool:
        if name == "node()":
            return True
        if node is _DOCUMENT:
            return False
        if not isinstance(node.tag, str):  # comments / PIs
            return False
        if name == "*":
            return True
        return node.tag == name

    def _axis_nodes(self, step: _Step, node) -> Iterable:
        axis = step.axis
        if axis == "child":
            return self._children(node)
        if axis == "self":
            return (node,)
        if axis == "parent":
            p = self._parent_of(node)
            return (p,) if p is not None else ()
        if axis == "ancestor":
            return self._ancestors(node)
        if axis == "ancestor-or-self":
            def gen():
                yield node
                yield from self._ancestors(node)
            return gen()
        if axis == "descendant":
            def gen_desc():
                it = self._descendants_or_self(node)
                next(it, None)  # drop self
                yield from it
            return gen_desc()
        if axis == "descendant-or-self":
            return self._descendants_or_self(node)
        raise XPathSyntaxError("unsupported axis %r" % axis)

    def _eval_step(self, step: _Step, context: Sequence) -> List:
        if step.descend:
            # a//b  ==  a / descendant-or-self::node() / child::b
            expanded: List = []
            for node in context:
                expanded.extend(self._descendants_or_self(node))
            context = self._dedup(expanded)
        out: List = []
        for node in context:
            matched = [
                n for n in self._axis_nodes(step, node) if self._match_name(n, step.name)
            ]
            for pred in step.preds:
                matched = self._apply_predicate(pred, matched)
            out.extend(matched)
        return self._order(out)

    @staticmethod
    def _dedup(nodes: Iterable) -> List:
        seen = set()
        out = []
        for n in nodes:
            if id(n) not in seen:
                seen.add(id(n))
                out.append(n)
        return out

    def _apply_predicate(self, pred, nodes: List) -> List:
        if pred[0] == "num":
            k = pred[1]
            return [nodes[k - 1]] if 1 <= k <= len(nodes) else []
        return [n for n in nodes if self._eval_bool(pred, n)]

    def _string_value(self, node) -> str:
        if node is _DOCUMENT:
            node = self.root
        return "".join(node.itertext())

    def _eval_bool(self, expr, node) -> bool:
        kind = expr[0]
        if kind == "or":
            return self._eval_bool(expr[1], node) or self._eval_bool(expr[2], node)
        if kind == "and":
            return self._eval_bool(expr[1], node) and self._eval_bool(expr[2], node)
        if kind == "not":
            return not self._eval_bool(expr[1], node)
        if kind == "attr":
            if node is _DOCUMENT:
                return False
            if expr[1] == "*":
                return bool(node.attrib)
            return node.get(expr[1]) is not None
        if kind == "attr-cmp":
            if node is _DOCUMENT:
                return False
            value = node.get(expr[1])
            if value is None:
                return False
            return (value == expr[3]) if expr[2] == "=" else (value != expr[3])
        if kind == "path":
            return bool(self._eval_union(expr[1], (node,)))
        if kind == "path-cmp":
            matches = self._eval_union(expr[1], (node,))
            if expr[2] == "=":
                return any(self._string_value(m) == expr[3] for m in matches)
            return any(self._string_value(m) != expr[3] for m in matches)
        if kind == "num":
            raise XPathSyntaxError("positional predicate in boolean context")
        if kind == "literal":
            return bool(expr[1])
        raise XPathSyntaxError("unsupported predicate %r" % (expr,))
