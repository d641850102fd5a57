"""JSONiq-subset tokenizer + recursive-descent parser.

AST is a tree of small dataclasses; the compiler
(sirix_spark/jsoniq/compiler.py) lowers it to DataFrame operations.
Shapes mirror the reference corpus
(JsonIntegrationTest.java / JsonSessionDBStore-compiled FLWOR).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field


class JsoniqSyntaxError(ValueError):
    pass


# ---------------------------------------------------------------- tokens
_TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+)
  | (?P<comment>\(:.*?:\))
  | (?P<string>'(?:[^'\\]|\\.)*'|"(?:[^"\\]|\\.)*")
  | (?P<number>\d+(?:\.\d+)?(?:[eE][+-]?\d+)?)
  | (?P<var>\$\$|\$[A-Za-z_][\w-]*)
  | (?P<qname>[A-Za-z_][\w-]*:[A-Za-z_][\w.-]*)
  | (?P<name>[A-Za-z_][\w-]*)
  | (?P<op>:=|::|\[\?|=>>|!=|<=|>=|<<|>>|\[\]|//|[.,:;(){}\[\]=<>@+*/|?-])
  | (?P<other>.)
    """,
    re.VERBOSE | re.DOTALL,
)

KEYWORDS = {
    "for", "let", "where", "group", "by", "order", "return", "in", "at",
    "ascending", "descending", "if", "then", "else", "and", "or", "not",
    "eq", "ne", "lt", "le", "gt", "ge", "div", "idiv", "mod", "to",
    "insert", "delete", "replace", "rename", "append", "json", "value",
    "of", "with", "into", "as", "position", "some", "every", "satisfies",
    "instance", "true", "false", "null",
}


@dataclass
class Token:
    kind: str  # string | number | var | qname | name | op | kw | eof
    text: str
    pos: int


def tokenize(src: str) -> list[Token]:
    out, i = [], 0
    while i < len(src):
        m = _TOKEN_RE.match(src, i)
        if not m:
            raise JsoniqSyntaxError(f"unexpected character {src[i]!r} at {i}")
        i = m.end()
        kind = m.lastgroup
        if kind in ("ws", "comment"):
            continue
        text = m.group()
        if kind == "name" and text in KEYWORDS:
            kind = "kw"
        out.append(Token(kind, text, m.start()))
    out.append(Token("eof", "", len(src)))
    return out


# ------------------------------------------------------------------ AST
@dataclass
class Lit:
    value: object  # str | float | int | bool | None


@dataclass
class TryCatch:
    body: object
    fallback: object


@dataclass
class Var:
    name: str  # without the $; "$$" stays "$$"


@dataclass
class Path:
    base: object
    steps: list = field(default_factory=list)
    # step forms: ("field", name) ("unbox",) ("index", Expr)
    #             ("slice", Expr|None, Expr|None) ("pred", Expr)
    #             ("descend", name)   # =>> recursive field lookup
    #             ("xstep", axis, test, preds)  # XPath step over XML
    #               axis ∈ child descendant descendant-or-self self
    #                      parent ancestor ancestor-or-self attribute
    #                      following-sibling preceding-sibling
    #                      following preceding
    #               test ∈ ("name", n) ("wildcard",) ("text",)
    #                      ("node",) ("comment",)
    #               preds: ("pos", int) ("poslast",)
    #                      ("exists", [xsteps]) ("cmp", [xsteps], op, v)


@dataclass
class Call:
    name: str  # qname or plain
    args: list = field(default_factory=list)


@dataclass
class ElemCtor:
    """Direct XML element constructor `<name a="{e}">{e2}</name>`.
    attrs: (name, parts) pairs; content: parts. A part is a literal
    str (already XML text) or an AST expression (enclosed `{…}`)."""

    name: str
    attrs: list = field(default_factory=list)
    content: list = field(default_factory=list)


@dataclass
class Unary:
    op: str
    operand: object


@dataclass
class Binop:
    op: str
    left: object
    right: object


@dataclass
class SetOp:
    """XPath 2.0 node-set operator: union (or '|'), intersect,
    except. Operands must evaluate to XML node sequences; results
    are in document order with duplicates eliminated (spec 3.3.3)."""
    op: str
    left: object
    right: object


@dataclass
class IfExpr:
    cond: object
    then: object
    orelse: object


@dataclass
class ObjectCtor:
    # entries: ("pair", key_expr, value_expr) | ("merge", expr)
    entries: list = field(default_factory=list)


@dataclass
class ArrayCtor:
    items: list = field(default_factory=list)


@dataclass
class SeqCtor:
    items: list = field(default_factory=list)


@dataclass
class ForClause:
    var: str
    pos_var: str | None
    source: object


@dataclass
class LetClause:
    var: str
    value: object


@dataclass
class GroupKey:
    var: str
    value: object | None  # None = group by existing binding


@dataclass
class OrderKey:
    value: object
    descending: bool = False


@dataclass
class WindowClause:
    """XQuery 3.0 window clause (tumbling/sliding) — subset: start/end
    conditions may bind the current item ($var) and its position
    (`at $pos`); previous/next bindings are not supported."""

    var: str
    mode: str  # tumbling | sliding
    source: object
    s_cur: str | None = None
    s_pos: str | None = None
    s_cond: object = None
    e_cur: str | None = None
    e_pos: str | None = None
    e_cond: object = None
    only_end: bool = False


@dataclass
class Flwor:
    clauses: list = field(default_factory=list)  # For/Let interleaved
    where: object | None = None
    group_by: list = field(default_factory=list)
    # let/for clauses written AFTER `group by` — they see the grouped
    # tuple stream (non-key variables as sequences): `group by $d let
    # $t := sum($e.sal) order by $t`
    post_group: list = field(default_factory=list)
    order_by: list = field(default_factory=list)
    ret: object = None


@dataclass
class Lambda:
    """Inline function expression: function($a, $b) { expr } —
    XQuery 3.0 InlineFunctionExpr (higher-order function subset)."""

    params: list[str] = field(default_factory=list)
    body: object = None


@dataclass
class Quantified:
    kind: str  # some | every
    var: str
    source: object
    predicate: object


@dataclass
class FunDecl:
    name: str  # e.g. "local:discount"
    params: list[str] = field(default_factory=list)
    body: object = None


@dataclass
class Main:
    """A query with a prolog of function declarations."""

    decls: list = field(default_factory=list)
    body: object = None


@dataclass
class UpdateExpr:
    kind: str  # insert | delete | replace | rename | append
    target: object
    value: object | None = None  # insert/replace/append payload, rename name
    position: object | None = None  # insert ... at position N


# --------------------------------------------------------------- parser
class _Parser:
    def __init__(self, tokens: list[Token], src: str = ""):
        self.toks = tokens
        self.src = src  # raw text, for direct-constructor scanning
        self.i = 0

    # -- token helpers
    @property
    def cur(self) -> Token:
        return self.toks[self.i]

    def at(self, kind: str, text: str | None = None) -> bool:
        t = self.cur
        return t.kind == kind and (text is None or t.text == text)

    def eat(self, kind: str, text: str | None = None) -> Token:
        if not self.at(kind, text):
            raise JsoniqSyntaxError(
                f"expected {text or kind} at {self.cur.pos}, got {self.cur.text!r}"
            )
        t = self.cur
        self.i += 1
        return t

    def opt(self, kind: str, text: str | None = None) -> bool:
        if self.at(kind, text):
            self.i += 1
            return True
        return False

    # -- entry
    def parse(self):
        # prolog: `declare function local:f($x[, …]) { expr };`*
        # (user-defined functions, XQuery 3.1 subset — type
        # annotations `as xs:T` are parsed and ignored, the model is
        # structurally typed)
        # version prolog: `xquery version "1.0";`
        if self.at("name", "xquery") and self.toks[self.i + 1].text == "version":
            self.i += 2
            self.eat("string")
            self.opt("op", ";")
        decls = self._prolog()
        expr = self.expr()
        self.eat("eof")
        return Main(decls, expr) if decls else expr

    def _prolog(self) -> list:
        """Prolog declarations: `declare function` / inert
        `declare namespace`, plus `import module namespace p = "uri"
        at "lib.xq";` (XQuery 3.1 §4.12 — round 10, the last Brackit
        construct previously fail-closed). Imported library modules
        resolve via their at-hints (relative paths against
        $SIRIX_JSONIQ_MODULE_PATH, default cwd); their functions
        register under BOTH the importer's prefix and the module's
        own (so the module's internal cross-calls keep working),
        reusing the existing UDF machinery unchanged."""
        decls = []
        while self.at("name", "declare") or self.at("name", "import"):
            if self.at("name", "import"):
                self.i += 1
                self.eat("name", "module")
                self.eat("name", "namespace")
                pfx = self.eat("name").text
                self.eat("op", "=")
                uri = _unquote(self.eat("string").text)
                locs = []
                if self.opt("kw", "at"):
                    locs.append(_unquote(self.eat("string").text))
                    while self.opt("op", ","):
                        locs.append(_unquote(self.eat("string").text))
                if not locs:
                    raise JsoniqSyntaxError(
                        "import module: a location hint (at \"…\") is "
                        "required — there is no URI resolver"
                    )
                for loc in locs:
                    decls.extend(_load_module(loc, uri, pfx))
                self.opt("op", ";")
                continue
            self.i += 1
            if self.at("name", "namespace"):
                # `declare namespace p = "uri";` — prefixes are kept
                # verbatim in qnames; the binding itself is inert here
                self.i += 1
                self.eat("name")
                self.eat("op", "=")
                self.eat("string")
                self.opt("op", ";")
                continue
            self.eat("name", "function")
            if self.cur.kind not in ("qname", "name"):
                raise JsoniqSyntaxError(f"bad function name at {self.cur.pos}")
            name = self.eat(self.cur.kind).text
            self.eat("op", "(")
            params = []
            if not self.at("op", ")"):
                while True:
                    params.append(self.eat("var").text[1:])
                    self._skip_type_annotation()
                    if not self.opt("op", ","):
                        break
            self.eat("op", ")")
            self._skip_type_annotation()
            self.eat("op", "{")
            body = self.expr()
            self.eat("op", "}")
            self.opt("op", ";")
            decls.append(FunDecl(name, params, body))
        return decls

    def _skip_type_annotation(self):
        if self.at("kw", "as"):
            self.i += 1
            if self.cur.kind not in ("qname", "name"):
                raise JsoniqSyntaxError(f"bad type annotation at {self.cur.pos}")
            self.i += 1
            if self.opt("op", "("):
                self.eat("op", ")")
            # occurrence indicator (?, *, +)
            if self.cur.kind == "op" and self.cur.text in ("*", "+", "?"):
                self.i += 1

    def expr(self):
        if self.at("kw", "for") or self.at("kw", "let"):
            return self.flwor()
        if self.at("kw", "if"):
            return self.if_expr()
        if (
            self.cur.kind == "kw"
            and self.cur.text in ("insert", "delete", "replace", "rename", "append")
            and not self.toks[self.i + 1].text == "("
        ):
            # `replace json value of …` (update) vs `replace($s,…,…)`
            # (fn:replace) — a following '(' disambiguates.
            return self.update_expr()
        if self.at("kw", "some") or self.at("kw", "every"):
            return self.quantified()
        if (
            self.cur.kind == "name"
            and (
                (self.cur.text in ("switch", "typeswitch")
                 and self.toks[self.i + 1].text == "(")
                or (self.cur.text in ("ordered", "unordered")
                    and self.toks[self.i + 1].text == "{")
            )
        ):
            return self.expr_single()
        return self.or_expr()

    # -- FLWOR
    def flwor(self) -> Flwor:
        # XQuery 3.x intermediate clauses: for/let/where/group/order in
        # any order before `return` (the corpus interleaves them, e.g.
        # `for … order by … let … return`). Multiple `where`s AND
        # together; late `let`s bind after the sort (order-preserving,
        # so the Flwor shape with a single clause list stays valid).
        f = Flwor()
        while True:
            if self.opt("kw", "for"):
                if (
                    self.cur.kind == "name"
                    and self.cur.text in ("tumbling", "sliding")
                    and self.toks[self.i + 1].kind == "name"
                    and self.toks[self.i + 1].text == "window"
                ):
                    (f.post_group if f.group_by else f.clauses).append(
                        self._window_clause()
                    )
                    continue
                # comma-separated bindings desugar to consecutive for
                # clauses: `for $a in X, $b in Y` ≡ `for $a in X for
                # $b in Y` (XQuery ForClause grammar)
                while True:
                    var = self.eat("var").text[1:]
                    pos_var = None
                    if self.opt("kw", "at"):
                        pos_var = self.eat("var").text[1:]
                    self.eat("kw", "in")
                    (f.post_group if f.group_by else f.clauses).append(
                        ForClause(var, pos_var, self.expr_single())
                    )
                    if not self.opt("op", ","):
                        break
            elif self.opt("kw", "let"):
                var = self.eat("var").text[1:]
                self.eat("op", ":=")
                (f.post_group if f.group_by else f.clauses).append(
                    LetClause(var, self.expr_single())
                )
            elif self.opt("kw", "where"):
                # quantified expr allowed bare in where (ExprSingle);
                # inside a conjunction, parenthesize: `$a eq 1 and (some …)`
                if self.at("kw", "some") or self.at("kw", "every"):
                    cond = self.quantified()
                else:
                    cond = self.or_expr()
                f.where = cond if f.where is None else Binop("and", f.where, cond)
            elif self.at("kw", "group"):
                self.eat("kw", "group")
                self.eat("kw", "by")
                while True:
                    v = self.eat("var").text[1:]
                    val = None
                    if self.opt("op", ":="):
                        val = self.or_expr()
                    f.group_by.append(GroupKey(v, val))
                    if not self.opt("op", ","):
                        break
            elif self.at("kw", "order"):
                self.eat("kw", "order")
                self.eat("kw", "by")
                while True:
                    k = OrderKey(self.or_expr())
                    if self.opt("kw", "descending"):
                        k.descending = True
                    else:
                        self.opt("kw", "ascending")
                    f.order_by.append(k)
                    if not self.opt("op", ","):
                        break
            else:
                break
        self.eat("kw", "return")
        f.ret = self.expr_single()
        return f

    def _window_clause(self) -> WindowClause:
        """`for tumbling|sliding window $w in Expr start [$s] [at $sp]
        when Expr [[only] end [$e] [at $ep] when Expr]`."""
        mode = self.eat("name").text
        self.eat("name", "window")
        var = self.eat("var").text[1:]
        self.eat("kw", "in")
        source = self.expr_single()
        self.eat("name", "start")
        wc = WindowClause(var, mode, source)
        wc.s_cur, wc.s_pos = self._window_vars()
        self.eat("name", "when")
        wc.s_cond = self.expr_single()
        if self.cur.kind == "name" and self.cur.text in ("only", "end"):
            if self.at("name", "only"):
                self.i += 1
                wc.only_end = True
            self.eat("name", "end")
            wc.e_cur, wc.e_pos = self._window_vars()
            self.eat("name", "when")
            wc.e_cond = self.expr_single()
        elif wc.only_end:
            raise JsoniqSyntaxError("`only` requires an end condition")
        return wc

    def _window_vars(self) -> tuple[str | None, str | None]:
        cur = pos = None
        if self.at("var"):
            cur = self.eat("var").text[1:]
        if self.at("kw", "at"):
            self.i += 1
            pos = self.eat("var").text[1:]
        if self.cur.kind == "name" and self.cur.text in ("previous", "next"):
            raise JsoniqSyntaxError(
                "window previous/next bindings unsupported"
            )
        return cur, pos

    def quantified(self) -> Quantified:
        # multi-binding quantifiers (`some $a in A, $b in B satisfies
        # P`) desugar to nesting: some $a in A satisfies some $b in B
        # satisfies P (equivalent per XQuery 3.1 §3.15)
        kind = self.eat("kw").text
        binds = []
        while True:
            var = self.eat("var").text[1:]
            self.eat("kw", "in")
            binds.append((var, self.expr_single()))
            if not self.opt("op", ","):
                break
        self.eat("kw", "satisfies")
        node = self.or_expr()
        for var, source in reversed(binds):
            node = Quantified(kind, var, source, node)
        return node

    # -- updates (JSONiq update syntax, JsonNodeTrx parity)
    def update_expr(self) -> UpdateExpr:
        kw = self.eat("kw").text
        if kw in ("insert", "append"):
            self.eat("kw", "json")
            value = self.expr_single()
            self.eat("kw", "into")
            target = self.expr_single()
            position = None
            if self.opt("kw", "at"):
                self.eat("kw", "position")
                position = self.expr_single()
            return UpdateExpr(kw, target, value, position)
        if kw == "delete":
            self.eat("kw", "json")
            return UpdateExpr("delete", self.expr_single())
        if kw == "replace":
            self.eat("kw", "json")
            self.eat("kw", "value")
            self.eat("kw", "of")
            target = self.expr_single()
            self.eat("kw", "with")
            return UpdateExpr("replace", target, self.expr_single())
        if kw == "rename":
            self.eat("kw", "json")
            target = self.expr_single()
            self.eat("kw", "as")
            return UpdateExpr("rename", target, self.expr_single())
        raise JsoniqSyntaxError(f"unsupported update {kw!r}")

    # -- expression ladder
    def expr_single(self):
        # ExprSingle per XQuery: FLWOR, quantified, if, update, or
        # an or-expr — so `let $x := for … return $i` parses with the
        # inner FLWOR ending at its (ExprSingle) return value.
        if self.at("kw", "for") or self.at("kw", "let"):
            return self.flwor()
        if self.at("kw", "some") or self.at("kw", "every"):
            return self.quantified()
        if (
            self.cur.kind == "kw"
            and self.cur.text in ("insert", "delete", "replace", "rename", "append")
            and not self.toks[self.i + 1].text == "("
        ):
            return self.update_expr()
        if self.at("kw", "if"):
            return self.if_expr()
        if (
            self.cur.kind == "name"
            and self.cur.text in ("switch", "typeswitch")
            and self.toks[self.i + 1].text == "("
        ):
            return self.switch_expr(self.cur.text == "typeswitch")
        if (
            self.cur.kind == "name"
            and self.cur.text in ("ordered", "unordered")
            and self.toks[self.i + 1].text == "{"
        ):
            # ordering-mode expressions (XQuery 3.1 §3.15): this
            # engine always produces results in document order, so
            # both modes are the identity (Brackit likewise treats
            # the declaration as a hint)
            self.i += 1
            self.eat("op", "{")
            e = self.expr()
            self.eat("op", "}")
            return e
        return self.or_expr()

    # -- switch / typeswitch (XQuery 3.1 §3.12 / §3.16), desugared at
    # parse time onto the existing machinery: the operand binds ONCE
    # via an internal let; switch case matching is fn:deep-equal (the
    # spec's own definition of case comparison, minus the
    # empty-matches-empty corner — an empty operand falls through to
    # default, per fn:deep-equal's engine contract); typeswitch case
    # sequence-types compile to the instance-of / instance-of-xs
    # calls the round-5 sequence-type surface already implements.
    def switch_expr(self, is_type: bool):
        kw = self.eat("name").text
        self.eat("op", "(")
        operand = self.expr()
        self.eat("op", ")")
        self._ds_n = getattr(self, "_ds_n", 0) + 1
        sw = f"__{kw}{self._ds_n}"
        v = Var(sw)
        branches: list[tuple[object, object, str | None]] = []
        while self.cur.kind == "name" and self.cur.text == "case":
            self.i += 1
            bind = None
            if is_type:
                if self.at("var"):
                    bind = self.eat("var").text[1:]
                    self.eat("kw", "as")
                cond = self._seqtype_cond(v)
                while self.opt("op", "|"):
                    cond = Binop("or", cond, self._seqtype_cond(v))
            else:
                # one or more `case <operand>` sharing one return
                cond = Call("fn:deep-equal", [v, self.expr_single()])
                while self.cur.kind == "name" and self.cur.text == "case":
                    self.i += 1
                    cond = Binop(
                        "or", cond,
                        Call("fn:deep-equal", [v, self.expr_single()]),
                    )
            self.eat("kw", "return")
            branches.append((cond, self.expr_single(), bind))
        if not (self.cur.kind == "name" and self.cur.text == "default"):
            raise JsoniqSyntaxError(
                f"{kw}: expected 'default' at {self.cur.pos}"
            )
        self.i += 1
        bind_d = None
        if is_type and self.at("var"):
            bind_d = self.eat("var").text[1:]
        self.eat("kw", "return")

        def wrap(bind: str | None, res):
            if bind is None:
                return res
            return Flwor(clauses=[LetClause(bind, v)], ret=res)

        out = wrap(bind_d, self.expr_single())
        for cond, res, bind in reversed(branches):
            out = IfExpr(cond, wrap(bind, res), out)
        return Flwor(clauses=[LetClause(sw, operand)], ret=out)

    def _seqtype_cond(self, v: "Var"):
        """One typeswitch case sequence-type → a boolean condition
        over the bound operand. Subset: xs:TYPE [? + *], the JSONiq/
        XDM kind tests object()/array()/string()/number()/boolean()/
        null()/item(), and empty-sequence()."""
        if self.cur.kind == "qname" and self.cur.text.startswith("xs:"):
            ty = self.eat("qname").text
            occ = ""
            if self.cur.kind == "op" and self.cur.text in ("?", "+", "*"):
                occ = self.eat("op").text
            return Call("instance-of-xs", [v, Lit(ty), Lit(occ)])
        if self.cur.kind not in ("name", "kw"):
            raise JsoniqSyntaxError(
                f"typeswitch: bad sequence type at {self.cur.pos}"
            )
        ty = self.eat(self.cur.kind).text
        self.eat("op", "(")
        self.eat("op", ")")
        return Call("instance-of", [v, Lit(ty)])

    def if_expr(self) -> IfExpr:
        self.eat("kw", "if")
        self.eat("op", "(")
        cond = self.or_expr()
        self.eat("op", ")")
        self.eat("kw", "then")
        then = self.expr_single()
        self.eat("kw", "else")
        return IfExpr(cond, then, self.expr_single())

    def or_expr(self):
        left = self.and_expr()
        while self.opt("kw", "or"):
            left = Binop("or", left, self.and_expr())
        return left

    def and_expr(self):
        left = self.cmp_expr()
        while self.opt("kw", "and"):
            left = Binop("and", left, self.cmp_expr())
        return left

    _CMP_KW = {"eq", "ne", "lt", "le", "gt", "ge"}
    _CMP_OP = {"=", "!=", "<", "<=", ">", ">=", "<<", ">>"}

    def cmp_expr(self):
        left = self.range_expr()
        t = self.cur
        if t.kind == "kw" and t.text in self._CMP_KW:
            self.i += 1
            return Binop(t.text, left, self.range_expr())
        if t.kind == "op" and t.text in self._CMP_OP:
            self.i += 1
            sym = {
                "=": "eq", "!=": "ne", "<": "lt", "<=": "le",
                ">": "gt", ">=": "ge",
                # node-order comparisons (XQuery 3.1 §3.7.3)
                "<<": "<<", ">>": ">>",
            }
            return Binop(sym[t.text], left, self.range_expr())
        if t.kind == "kw" and t.text == "instance":
            # `instance of object()` (JSONiq kind test) or
            # `instance of xs:TYPE [? + *]` (XQuery sequence type)
            self.i += 1
            self.eat("kw", "of")
            if self.cur.kind == "qname" and self.cur.text.startswith("xs:"):
                ty = self.eat("qname").text
                occ = ""
                if self.cur.kind == "op" and self.cur.text in ("?", "+", "*"):
                    occ = self.eat("op").text
                return Call("instance-of-xs", [left, Lit(ty), Lit(occ)])
            ty = self.eat("name").text
            self.eat("op", "(")
            self.eat("op", ")")
            return Call("instance-of", [left, Lit(ty)])
        if t.kind == "name" and t.text == "castable":
            # `castable as xs:TYPE` (XQuery 3.1 §3.19.3)
            self.i += 1
            self.eat("kw", "as")
            ty = self.eat("qname").text
            return Call("castable-as", [left, Lit(ty)])
        return left

    def range_expr(self):
        left = self.add_expr()
        if self.opt("kw", "to"):
            return Call("fn:range", [left, self.add_expr()])
        return left

    def add_expr(self):
        left = self.mul_expr()
        while self.cur.kind == "op" and self.cur.text in ("+", "-"):
            op = self.eat("op").text
            left = Binop(op, left, self.mul_expr())
        return left

    def mul_expr(self):
        left = self.union_expr()
        while (self.cur.kind == "op" and self.cur.text == "*") or (
            self.cur.kind == "kw" and self.cur.text in ("div", "idiv", "mod")
        ):
            op = self.cur.text
            self.i += 1
            left = Binop(op, left, self.union_expr())
        return left

    # XQuery 3.1 precedence: MultiplicativeExpr > UnionExpr >
    # IntersectExceptExpr > UnaryExpr. 'union'/'intersect'/'except'
    # are plain names matched only in operator position (the spec's
    # operator lexical state), so element names stay unaffected.
    def union_expr(self):
        left = self.intersect_except_expr()
        while self.at("op", "|") or (
            self.cur.kind == "name" and self.cur.text == "union"
        ):
            self.i += 1
            left = SetOp("union", left, self.intersect_except_expr())
        return left

    def intersect_except_expr(self):
        left = self.unary_expr()
        while self.cur.kind == "name" and self.cur.text in ("intersect", "except"):
            op = self.eat("name").text
            left = SetOp(op, left, self.unary_expr())
        return left

    def unary_expr(self):
        if self.at("op", "-"):
            self.i += 1
            return Unary("-", self.unary_expr())
        if self.at("kw", "not"):
            # `not(...)` is also a function call; treat keyword+paren as call
            self.i += 1
            self.eat("op", "(")
            arg = self.expr()
            self.eat("op", ")")
            return Call("not", [arg])
        return self.postfix_expr()

    def postfix_expr(self):
        node = self.primary()
        steps = []
        while True:
            if self.at("op", "."):
                self.i += 1
                if self.cur.kind in ("name", "kw"):
                    steps.append(("field", self.eat(self.cur.kind).text))
                elif self.cur.kind == "string":
                    steps.append(("field", _unquote(self.eat("string").text)))
                elif self.cur.kind == "var":
                    steps.append(("field_var", self.eat("var").text[1:]))
                else:
                    raise JsoniqSyntaxError(f"bad field at {self.cur.pos}")
            elif self.at("op", "=>>"):
                self.i += 1
                steps.append(("descend", self.eat("name").text))
            elif self.at("op", "[]"):
                self.i += 1
                steps.append(("unbox",))
            elif self.at("op", "/") or self.at("op", "//"):
                dbl = self.cur.text == "//"
                self.i += 1
                steps.extend(self._xpath_step(dbl))
            elif self.at("op", "[?"):
                self.i += 1
                pred = self.or_expr()
                self.eat("op", "]")
                steps.append(("pred", pred))
            elif self.at("op", "["):
                self.i += 1
                if self.opt("op", "]"):
                    steps.append(("unbox",))
                    continue
                lo = None if self.at("op", ":") else self.or_expr()
                if self.opt("op", ":"):
                    hi = None if self.at("op", "]") else self.or_expr()
                    steps.append(("slice", lo, hi))
                else:
                    steps.append(("index", lo))
                self.eat("op", "]")
            else:
                break
        return Path(node, steps) if steps else node

    _AXES = {
        "child", "descendant", "descendant-or-self", "self", "parent",
        "ancestor", "ancestor-or-self", "attribute",
        "following-sibling", "preceding-sibling", "following", "preceding",
    }

    def _xpath_step(self, dbl: bool) -> list:
        """One XPath step after '/' or '//' → list of xstep tuples.
        '//' lowers to the spec's expansion
        /descendant-or-self::node()/ so positional predicates keep
        per-parent semantics (//b[2] = the 2nd b child of EACH
        parent, not the 2nd b overall)."""
        out = []
        if dbl:
            out.append(("xstep", "descendant-or-self", ("node",), []))
        if self.at("op", "."):
            # '.' / '..' abbreviations (XPath spec 3.2: self::node(),
            # parent::node(); '..' lexes as two '.' ops)
            self.i += 1
            if self.opt("op", "."):
                out.append(("xstep", "parent", ("node",), []))
            else:
                out.append(("xstep", "self", ("node",), []))
            return out
        axis = "child"
        if (
            self.cur.kind in ("name", "kw")
            and self.cur.text in self._AXES
            and self.toks[self.i + 1].kind == "op"
            and self.toks[self.i + 1].text == "::"
        ):
            axis = self.eat(self.cur.kind).text
            self.eat("op", "::")
        test = self._xpath_nodetest(axis)
        if test[0] == "attr":
            axis = "attribute"
            test = ("name", test[1]) if test[1] != "*" else ("wildcard",)
        preds = []
        while self.at("op", "["):
            self.i += 1
            preds.append(self._xpath_pred())
            self.eat("op", "]")
        out.append(("xstep", axis, test, preds))
        return out

    def _xpath_nodetest(self, axis: str) -> tuple:
        if self.opt("op", "@"):
            if self.opt("op", "*"):
                return ("attr", "*")
            return ("attr", self.eat(self.cur.kind).text)
        if self.opt("op", "*"):
            return ("wildcard",)
        if self.cur.kind in ("name", "kw", "qname"):
            txt = self.eat(self.cur.kind).text
            if txt in (
                "text", "node", "comment", "element",
                "processing-instruction",
            ) and self.at("op", "("):
                self.eat("op", "(")
                self.eat("op", ")")
                return (txt,)
            return ("name", txt)
        raise JsoniqSyntaxError(f"bad XPath node test at {self.cur.pos}")

    def _xpath_pred(self) -> tuple:
        """Predicate: and/or chains over the single-predicate forms
        (standard precedence: and binds tighter than or)."""
        p = self._xpath_pred_and()
        while self.at("kw", "or"):
            self.i += 1
            p = ("or", p, self._xpath_pred_and())
        return p

    def _xpath_pred_and(self) -> tuple:
        p = self._xpath_pred_single()
        while self.at("kw", "and"):
            self.i += 1
            p = ("and", p, self._xpath_pred_single())
        return p

    _CMP_OPS = ("=", "!=", "<", "<=", ">", ">=")

    def _xpath_const_additive(self):
        """Constant numeric expression inside a predicate: decimal
        literals with + - * div and parentheses. XPath 2.0 numeric
        literals with '.' are xs:decimal, so 3.2 + 0.02 = 3.22 holds
        exactly (XPathAxisTest.java pins this); Decimal arithmetic
        reproduces it where binary doubles would not."""
        from decimal import Decimal

        def prim():
            if self.opt("op", "("):
                v = self._xpath_const_additive()
                self.eat("op", ")")
                return v
            neg = self.opt("op", "-")
            n = Decimal(self.eat("number").text)
            return -n if neg else n

        v = prim()
        while (self.cur.kind == "op" and self.cur.text in ("+", "-", "*")) or (
            self.cur.kind in ("name", "kw") and self.cur.text == "div"
        ):
            op = self.eat(self.cur.kind).text
            r = prim()
            if op == "+":
                v = v + r
            elif op == "-":
                v = v - r
            elif op == "*":
                v = v * r
            else:
                v = v / r
        return v

    def _xpath_pred_single(self) -> tuple:
        """Predicate subset: integer position, last(), constant
        numeric comparisons, absolute-path existence, a relative
        path (optionally compared to a literal)."""
        if self.cur.kind == "number" or self.at("op", "("):
            save = self.i
            try:
                lhs = self._xpath_const_additive()
                if self.cur.kind == "op" and self.cur.text in self._CMP_OPS:
                    op = self.eat("op").text
                    rhs = self._xpath_const_additive()
                    res = {
                        "=": lhs == rhs, "!=": lhs != rhs,
                        "<": lhs < rhs, "<=": lhs <= rhs,
                        ">": lhs > rhs, ">=": lhs >= rhs,
                    }[op]
                    return ("const", bool(res))
            except JsoniqSyntaxError:
                pass
            self.i = save
        if self.cur.kind == "number":
            n = self.eat("number").text
            if "." in n or "e" in n or "E" in n:
                raise JsoniqSyntaxError(f"non-integer position at {self.cur.pos}")
            return ("pos", int(n))
        if self.at("op", "/") or self.at("op", "//"):
            # absolute path inside a predicate: existence evaluated
            # from the document node (XPath spec 3.2 '/' rooting)
            steps = []
            dbl = self.cur.text == "//"
            self.i += 1
            steps.extend(self._xpath_step(dbl))
            while self.at("op", "/") or self.at("op", "//"):
                dbl = self.cur.text == "//"
                self.i += 1
                steps.extend(self._xpath_step(dbl))
            return ("absexists", steps)
        if (
            self.cur.kind in ("name", "kw")
            and self.cur.text == "last"
            and self.toks[self.i + 1].text == "("
        ):
            self.i += 1
            self.eat("op", "(")
            self.eat("op", ")")
            return ("poslast",)
        rel = self._xpath_relpath()
        if self.cur.kind == "op" and self.cur.text in ("=", "!=", "<", "<=", ">", ">="):
            op = self.eat("op").text
            t = self.cur
            if t.kind == "string":
                self.i += 1
                return ("cmp", rel, op, _unquote(t.text))
            if t.kind == "number":
                self.i += 1
                return ("cmp", rel, op, float(t.text))
            if t.kind == "op" and t.text == "-" and self.toks[self.i + 1].kind == "number":
                self.i += 1
                return ("cmp", rel, op, -float(self.eat("number").text))
            raise JsoniqSyntaxError(f"bad predicate literal at {t.pos}")
        return ("exists", rel)

    def _xpath_relpath(self) -> list:
        """Relative path inside a predicate: step ('/' step)*."""
        steps = self._xpath_step(False)
        while self.at("op", "/") or self.at("op", "//"):
            dbl = self.cur.text == "//"
            self.i += 1
            steps.extend(self._xpath_step(dbl))
        return steps

    # -- direct element constructors (char-level scan over self.src:
    # constructor content is raw XML text the token grammar cannot
    # carry; after the scan the token cursor re-syncs by position)
    def _elem_ctor(self) -> "ElemCtor":
        start = self.cur.pos
        node, end = _scan_elem(self.src, start)
        while self.toks[self.i].pos < end:
            self.i += 1
        return node

    def primary(self):
        t = self.cur
        if (
            t.kind == "op"
            and t.text == "<"
            and self.src
            and self.toks[self.i + 1].kind in ("name", "qname")
            and self.toks[self.i + 1].pos == t.pos + 1
        ):
            return self._elem_ctor()
        if t.kind == "string":
            self.i += 1
            return Lit(_unquote(t.text))
        if t.kind == "number":
            self.i += 1
            txt = t.text
            if "." in txt or "e" in txt.lower():
                f = float(txt)
                import decimal as _dec

                # keep the EXACT decimal when the double image loses
                # digits (19.750000000000000001 must not become
                # 19.75 before the comparison even runs)
                try:
                    exact = _dec.Decimal(txt) == _dec.Decimal(repr(f))
                except _dec.InvalidOperation:
                    exact = True
                return Lit(f if exact else _dec.Decimal(txt))
            return Lit(int(txt))
        if t.kind == "kw" and t.text in ("true", "false", "null"):
            self.i += 1
            if self.opt("op", "("):  # true() / false() / jn:null()
                self.eat("op", ")")
            return Lit({"true": True, "false": False, "null": None}[t.text])
        if t.kind == "var":
            self.i += 1
            return Var(t.text if t.text == "$$" else t.text[1:])
        if (
            t.kind == "name"
            and t.text == "function"
            and self.toks[self.i + 1].kind == "op"
            and self.toks[self.i + 1].text == "("
        ):
            # inline function: function($a[, $b…]) { expr }
            self.i += 1
            self.eat("op", "(")
            params = []
            if not self.at("op", ")"):
                while True:
                    params.append(self.eat("var").text[1:])
                    self._skip_type_annotation()
                    if not self.opt("op", ","):
                        break
            self.eat("op", ")")
            self._skip_type_annotation()
            self.eat("op", "{")
            body = self.expr()
            self.eat("op", "}")
            return Lambda(params, body)
        if (
            t.kind == "name"
            and t.text == "try"
            and self.toks[self.i + 1].kind == "op"
            and self.toks[self.i + 1].text == "{"
        ):
            # try { Expr } catch (*|err-name) { Expr }
            self.i += 1
            self.eat("op", "{")
            body = self.expr()
            self.eat("op", "}")
            kw = self.eat(self.cur.kind)
            if kw.text != "catch":
                raise JsoniqSyntaxError(f"expected catch at {kw.pos}")
            if self.cur.kind == "op" and self.cur.text == "*":
                self.i += 1
            elif self.cur.kind in ("name", "qname"):
                self.i += 1
            self.eat("op", "{")
            fallback = self.expr()
            self.eat("op", "}")
            return TryCatch(body, fallback)
        if t.kind in ("qname", "name") or (
            t.kind == "kw" and self.toks[self.i + 1].text == "("
            and t.text not in ("true", "false", "null", "if", "not", "some", "every")
        ):
            # keyword-named functions (fn:replace, fn:position, …)
            name = t.text
            if self.toks[self.i + 1].kind == "op" and self.toks[self.i + 1].text == "(":
                self.i += 2
                args = []
                if not self.at("op", ")"):
                    while True:
                        args.append(self.expr())
                        if not self.opt("op", ","):
                            break
                self.eat("op", ")")
                return Call(name, args)
            raise JsoniqSyntaxError(
                f"bare name {name!r} at {t.pos} (missing $ or function parens?)"
            )
        if t.kind == "op" and t.text == "{":
            return self.object_ctor()
        if t.kind == "op" and t.text == "[]":
            # `[]` in expression position is an empty array constructor
            # (the tokenizer fuses the unbox op; postfix handles the
            # step case before primary ever sees it)
            self.i += 1
            return ArrayCtor([])
        if t.kind == "op" and t.text == "[":
            self.i += 1
            items = []
            if not self.at("op", "]"):
                while True:
                    items.append(self.expr_single())
                    if not self.opt("op", ","):
                        break
            self.eat("op", "]")
            return ArrayCtor(items)
        if t.kind == "op" and t.text == "(":
            self.i += 1
            if self.opt("op", ")"):
                return SeqCtor([])
            items = [self.expr()]
            while self.opt("op", ","):
                items.append(self.expr())
            self.eat("op", ")")
            return items[0] if len(items) == 1 else SeqCtor(items)
        raise JsoniqSyntaxError(f"unexpected {t.text!r} at {t.pos}")

    def object_ctor(self) -> ObjectCtor:
        self.eat("op", "{")
        entries = []
        if not self.at("op", "}"):
            while True:
                if self.cur.kind == "var":
                    v = self.eat("var").text
                    if self.at("op", ":"):
                        self.i += 1
                        entries.append(("pair", Var(v[1:]), self.expr_single()))
                    else:
                        entries.append(("merge", Var(v[1:])))
                else:
                    if self.cur.kind == "string":
                        key = Lit(_unquote(self.eat("string").text))
                    elif self.cur.kind in ("name", "kw"):
                        key = Lit(self.eat(self.cur.kind).text)
                    else:
                        raise JsoniqSyntaxError(f"bad object key at {self.cur.pos}")
                    self.eat("op", ":")
                    entries.append(("pair", key, self.expr_single()))
                if not self.opt("op", ","):
                    break
        self.eat("op", "}")
        return ObjectCtor(entries)


def _unquote(s: str) -> str:
    body = s[1:-1]
    return re.sub(r"\\(.)", r"\1", body)


_NAME_RE = re.compile(r"[A-Za-z_][\w.-]*(?::[A-Za-z_][\w.-]*)?")


def _scan_enclosed(src: str, i: int) -> tuple[object, int]:
    """`{` at src[i] → (parsed expression, index past the `}`).
    Braces nest (inner constructors / object constructors) and
    string literals shield their contents."""
    assert src[i] == "{"
    depth, j = 1, i + 1
    while j < len(src):
        c = src[j]
        if c in "'\"":
            q = c
            j += 1
            while j < len(src) and src[j] != q:
                j += 2 if src[j] == "\\" else 1
            j += 1
            continue
        if c == "{":
            depth += 1
        elif c == "}":
            depth -= 1
            if depth == 0:
                body = src[i + 1 : j]
                sub = _Parser(tokenize(body), body)
                # enclosed expressions hold an expression SEQUENCE
                # (XQuery `{<id/>{…}, $p}` — bare comma, no parens)
                items = [sub.expr()]
                while sub.opt("op", ","):
                    items.append(sub.expr())
                sub.eat("eof")
                expr = items[0] if len(items) == 1 else SeqCtor(items)
                return expr, j + 1
        j += 1
    raise JsoniqSyntaxError(f"unterminated enclosed expression at {i}")


def _scan_elem(src: str, i: int) -> tuple[ElemCtor, int]:
    """Direct element constructor at src[i] ('<') → (ElemCtor, end).
    XQuery boundary-space default: whitespace-only text runs between
    tags/enclosed expressions are stripped."""
    assert src[i] == "<"
    m = _NAME_RE.match(src, i + 1)
    if not m:
        raise JsoniqSyntaxError(f"bad element constructor at {i}")
    name = m.group()
    j = m.end()
    attrs: list = []
    while True:
        while j < len(src) and src[j].isspace():
            j += 1
        if j >= len(src):
            raise JsoniqSyntaxError(f"unterminated constructor <{name}")
        if src[j] == "/" and src[j : j + 2] == "/>":
            return ElemCtor(name, attrs, []), j + 2
        if src[j] == ">":
            j += 1
            break
        am = _NAME_RE.match(src, j)
        if not am:
            raise JsoniqSyntaxError(f"bad attribute in <{name} at {j}")
        aname = am.group()
        j = am.end()
        while j < len(src) and src[j].isspace():
            j += 1
        if src[j] != "=":
            raise JsoniqSyntaxError(f"expected = in attribute {aname} at {j}")
        j += 1
        while j < len(src) and src[j].isspace():
            j += 1
        q = src[j]
        if q not in "'\"":
            raise JsoniqSyntaxError(f"expected quoted value for {aname} at {j}")
        j += 1
        parts: list = []
        lit = ""
        while j < len(src) and src[j] != q:
            if src[j] == "{":
                if lit:
                    parts.append(lit)
                    lit = ""
                expr, j = _scan_enclosed(src, j)
                parts.append(expr)
            else:
                lit += src[j]
                j += 1
        if j >= len(src):
            raise JsoniqSyntaxError(f"unterminated attribute value at {i}")
        j += 1
        if lit:
            parts.append(lit)
        attrs.append((aname, parts))
    # content
    content: list = []
    lit = ""

    def flush(text: str):
        # strip whitespace-only boundary runs (default boundary-space)
        if text and not text.isspace():
            content.append(text)

    while j < len(src):
        c = src[j]
        if c == "<":
            if src[j : j + 2] == "</":
                flush(lit)
                k = src.index(">", j)
                close = src[j + 2 : k].strip()
                if close != name:
                    raise JsoniqSyntaxError(
                        f"mismatched </{close}> for <{name}> at {j}"
                    )
                return ElemCtor(name, attrs, content), k + 1
            flush(lit)
            lit = ""
            child, j = _scan_elem(src, j)
            content.append(child)
            continue
        if c == "{":
            flush(lit)
            lit = ""
            expr, j = _scan_enclosed(src, j)
            content.append(expr)
            continue
        lit += c
        j += 1
    raise JsoniqSyntaxError(f"unterminated element constructor <{name}>")


def parse(src: str):
    """Parse a JSONiq-subset query string into the AST."""
    return _Parser(tokenize(src), src).parse()


def parse_library_module(src: str) -> tuple[str, str, list]:
    """Parse an XQuery library module (`module namespace p = "uri";`
    + prolog declarations, no body expr) → (prefix, uri, FunDecls)."""
    p = _Parser(tokenize(src), src)
    if p.at("name", "xquery") and p.toks[p.i + 1].text == "version":
        p.i += 2
        p.eat("string")
        p.opt("op", ";")
    p.eat("name", "module")
    p.eat("name", "namespace")
    pfx = p.eat("name").text
    p.eat("op", "=")
    uri = _unquote(p.eat("string").text)
    p.opt("op", ";")
    decls = p._prolog()
    p.eat("eof")
    return pfx, uri, decls


def _load_module(loc: str, uri: str, pfx: str) -> list:
    """Resolve one `import module … at "loc"` hint: read the file
    (relative paths against $SIRIX_JSONIQ_MODULE_PATH, default cwd),
    parse it as a library module, check the target namespace, and
    return its function declarations registered under both the
    importer's prefix and the module's own."""
    import os

    base = os.environ.get("SIRIX_JSONIQ_MODULE_PATH", ".")
    path = loc if os.path.isabs(loc) else os.path.join(base, loc)
    try:
        with open(path, encoding="utf-8") as f:
            src = f.read()
    except OSError as e:
        raise JsoniqSyntaxError(f"import module: cannot read {path}: {e}")
    mod_pfx, mod_uri, decls = parse_library_module(src)
    if mod_uri != uri:
        raise JsoniqSyntaxError(
            f"import module: {path} declares namespace {mod_uri!r}, "
            f"import expects {uri!r}"
        )
    out = []
    for d in decls:
        local = d.name.split(":", 1)[-1]
        out.append(FunDecl(f"{pfx}:{local}", d.params, d.body))
        if mod_pfx != pfx:
            # module-internal cross-calls use the module's own prefix
            out.append(FunDecl(f"{mod_pfx}:{local}", d.params, d.body))
    return out
