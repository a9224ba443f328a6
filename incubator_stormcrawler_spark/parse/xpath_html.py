"""HTML XPathFilter — core/.../parse/filter/XPathFilter.java:55 semantics
on real-world (non-well-formed) HTML, without external deps.

The reference compiles javax.xml XPath against the JSoup DocumentFragment
and supports three eval modes: default NODESET (stripped text content per
node), ``string(...)`` (first value, stripped), ``serialize(...)``
(XHTML-serialized nodes). lxml is not in this container, so this module
brings its own tolerant DOM (stdlib html.parser; void/implied tags
handled) and evaluates the practical XPath subset the reference's own
config files use (test.parsefilters.json):

  //TAG      //*          /html/body/div        (child + descendant axes)
  [@attr="v"]  [@attr='v']  [@attr]  [n]        (attribute + position preds)
  //META[@name="keywords"]/@content             (attribute selection)
  string(//TITLE)   serialize(//SCRIPT)         (eval functions)

Tag matching is case-insensitive (the reference's IdentityHtmlMapper DOM
is uppercase; html.parser lowercases — both spellings work).
"""

from __future__ import annotations

import re
from html import escape
from html.parser import HTMLParser

from pyspark.sql import DataFrame

VOID_TAGS = {
    "area", "base", "br", "col", "embed", "hr", "img", "input", "link",
    "meta", "param", "source", "track", "wbr",
}
# tags auto-closed by an opening sibling of the same kind (minimal set)
_IMPLIED_CLOSE = {"li", "tr", "td", "th", "option", "p", "dt", "dd"}
# block-level tags that implicitly close an open <p> (HTML5 §4.4.1)
_P_CLOSED_BY = {
    "address", "article", "aside", "blockquote", "details", "div", "dl",
    "fieldset", "figcaption", "figure", "footer", "form", "h1", "h2", "h3",
    "h4", "h5", "h6", "header", "hr", "main", "nav", "ol", "p", "pre",
    "section", "table", "ul",
}


class DomNode:
    __slots__ = ("tag", "attrs", "children", "parent")

    def __init__(self, tag: str, attrs=None, parent=None):
        self.tag = tag  # "#text" for text nodes (text stored in attrs["#"])
        self.attrs = attrs or {}
        self.children: list[DomNode] = []
        self.parent = parent

    # -- text + serialization ----------------------------------------------

    def text_content(self) -> str:
        if self.tag == "#text":
            return self.attrs.get("#", "")
        return "".join(c.text_content() for c in self.children)

    def serialize(self) -> str:
        if self.tag == "#text":
            return escape(self.attrs.get("#", ""), quote=False)
        attrs = "".join(
            f' {k}="{escape(v or "", quote=True)}"'
            for k, v in self.attrs.items()
        )
        inner = "".join(c.serialize() for c in self.children)
        if self.tag in VOID_TAGS and not inner:
            return f"<{self.tag}{attrs}/>"
        return f"<{self.tag}{attrs}>{inner}</{self.tag}>"

    def iter_descendants(self):
        for c in self.children:
            if c.tag != "#text":
                yield c
                yield from c.iter_descendants()


class _DomBuilder(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = DomNode("#document")
        self.stack = [self.root]

    def handle_starttag(self, tag, attrs):
        cur = self.stack[-1]
        if cur.tag == "p" and tag in _P_CLOSED_BY and len(self.stack) > 1:
            self.stack.pop()
            cur = self.stack[-1]
        if tag in _IMPLIED_CLOSE and cur.tag == tag:
            self.stack.pop()
            cur = self.stack[-1]
        node = DomNode(tag, dict(attrs), cur)
        cur.children.append(node)
        if tag not in VOID_TAGS:
            self.stack.append(node)

    def handle_startendtag(self, tag, attrs):
        cur = self.stack[-1]
        cur.children.append(DomNode(tag, dict(attrs), cur))

    def handle_endtag(self, tag):
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                return
        # unmatched close tag: ignore (tolerant parsing)

    def handle_data(self, data):
        if data:
            cur = self.stack[-1]
            cur.children.append(DomNode("#text", {"#": data}, cur))


def parse_html_dom(content: bytes | str) -> DomNode:
    if isinstance(content, (bytes, bytearray)):
        content = bytes(content).decode("utf-8", "replace")
    b = _DomBuilder()
    b.feed(content)
    b.close()
    return b.root


# -- XPath subset evaluation ------------------------------------------------

_STEP_RE = re.compile(
    r"(//|/)"  # axis
    r"(@?[A-Za-z0-9_*#-]+)"  # tag, * or @attr
    r"((?:\[[^\]]*\])*)"  # predicates
)
_PRED_RE = re.compile(
    r"\[\s*(?:@([A-Za-z0-9_-]+)\s*=\s*(\"[^\"]*\"|'[^']*')"  # [@a="v"]
    r"|@([A-Za-z0-9_-]+)"  # [@a]
    r"|(\d+))\s*\]"  # [n]
)


class XPathError(ValueError):
    pass


def _apply_predicates(nodes: list[DomNode], preds: str) -> list[DomNode]:
    for m in _PRED_RE.finditer(preds):
        eq_attr, eq_val, has_attr, pos = m.groups()
        if eq_attr is not None:
            want = eq_val[1:-1]
            nodes = [n for n in nodes if n.attrs.get(eq_attr) == want]
        elif has_attr is not None:
            nodes = [n for n in nodes if has_attr in n.attrs]
        elif pos is not None:
            i = int(pos)
            nodes = [nodes[i - 1]] if 1 <= i <= len(nodes) else []
    return nodes


def _select(root: DomNode, path: str):
    """Evaluate a path; returns (nodes, attr_values_or_None)."""
    path = path.strip()
    if not path.startswith("/"):
        path = "//" + path  # bare 'TAG[...]' behaves like a descendant probe
    pos = 0
    ctx: list[DomNode] = [root]
    attr_result: list[str] | None = None
    for m in _STEP_RE.finditer(path):
        if m.start() != pos:
            raise XPathError(f"unsupported xpath syntax at {path[pos:]!r}")
        pos = m.end()
        if attr_result is not None:
            raise XPathError("/@attr must be the final step")
        axis, name, preds = m.groups()
        if name.startswith("@"):
            attr = name[1:]
            vals = [n.attrs[attr] or "" for n in ctx if attr in n.attrs]
            attr_result = vals
            continue
        lname = name.lower()
        out: list[DomNode] = []
        seen: set[int] = set()
        for node in ctx:
            pool = (
                node.iter_descendants()
                if axis == "//"
                else (c for c in node.children if c.tag != "#text")
            )
            matched = [
                d for d in pool if lname == "*" or d.tag == lname
            ]
            # position predicates apply per context node (XPath semantics)
            for d in _apply_predicates(matched, preds):
                if id(d) not in seen:
                    seen.add(id(d))
                    out.append(d)
        ctx = out
    if pos != len(path):
        raise XPathError(f"unsupported xpath syntax at {path[pos:]!r}")
    return ctx, attr_result


def evaluate_xpath(root: DomNode, expression: str) -> list[str]:
    """Evaluate one XPathFilter expression → list of string values,
    mirroring LabelledExpression.evaluate (XPathFilter.java:98-152):
    NODESET → stripped text per node; string(...) → first value stripped;
    serialize(...) → XHTML per node."""
    expression = expression.strip()
    mode = "NODESET"
    if expression.startswith("string(") and expression.endswith(")"):
        mode, expression = "STRING", expression[7:-1]
    elif expression.startswith("serialize(") and expression.endswith(")"):
        mode, expression = "SERIALIZE", expression[10:-1]
    nodes, attr_vals = _select(root, expression)
    if attr_vals is not None:
        values = attr_vals
        if mode == "STRING":
            return [values[0].strip()] if values else [""]
        return values
    if mode == "STRING":
        return [nodes[0].text_content().strip()] if nodes else [""]
    if mode == "SERIALIZE":
        return [n.serialize() for n in nodes]
    return [n.text_content().strip() for n in nodes]


# -- Spark stage ------------------------------------------------------------

def xpath_extract_html(
    docs: DataFrame,
    expressions: dict[str, str],
    content_col: str = "content",
) -> DataFrame:
    """XPathFilter over real HTML: adds one ``array<string>`` column per
    labelled expression. One tolerant DOM build per row feeds ALL
    expressions (the reference compiles every expression against the same
    DocumentFragment); Arrow-batched ``mapInPandas`` keeps it off the
    per-row Python path."""
    import pandas as pd

    keys = list(expressions)
    schema = "url string, " + ", ".join(f"`{k}` array<string>" for k in keys)

    def run(batches):
        for pdf in batches:
            rows = []
            for row in pdf.itertuples(index=False):
                content = row.content
                dom = parse_html_dom(
                    bytes(content) if content is not None else b""
                )
                rec = {"url": row.url}
                for k in keys:
                    try:
                        rec[k] = evaluate_xpath(dom, expressions[k])
                    except XPathError:
                        rec[k] = []
                rows.append(rec)
            yield pd.DataFrame(rows, columns=["url"] + keys)

    out = docs.select("url", content_col).mapInPandas(run, schema=schema)
    return docs.join(out, "url")
