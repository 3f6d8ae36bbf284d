"""Recursive-descent SPARQL parser for the SURVEY.md §2.B subset.

Supported: PREFIX, SELECT [DISTINCT] (vars | * | (expr AS ?v) | aggregates
incl. expressions over aggregates), ASK, WHERE { triples with ; and ,
shorthand, blank node property lists [ p o ; ... ], RDF collections
( e1 e2 ), FILTER (incl. EXISTS / NOT EXISTS / regex / IN), OPTIONAL,
UNION, MINUS, BIND, VALUES }, GROUP BY, HAVING, ORDER BY ASC()/DESC(),
LIMIT, OFFSET.

Terms: variables (?x), prefixed names (kept lexically unless their prefix
was declared — the engine's stores use prefixed lexical terms), <iri>,
quoted strings, numbers, true/false.

No rdflib in this environment (verified; SURVEY.md §3) — this is a
self-contained tokenizer + parser, ~450 lines.
"""

from __future__ import annotations

import re

from d_sparq_spark.operators.rdf_patterns import TriplePattern
from d_sparq_spark.plans import ast as A

_TOKEN_RE = re.compile(
    r"""
    (?P<WS>\s+|\#[^\n]*)
  | (?P<IRIREF><[^<>\s]*>)
  | (?P<VAR>[?$][A-Za-z_][A-Za-z0-9_]*)
  | (?P<STRING>"(?:[^"\\]|\\.)*"|'(?:[^'\\]|\\.)*')
  | (?P<LANGTAG>@[A-Za-z][A-Za-z0-9-]*)
  | (?P<NUMBER>[+-]?(?:\d+\.\d*|\.\d+|\d+)(?:[eE][+-]?\d+)?)
  | (?P<PNAME>[A-Za-z_][A-Za-z0-9_-]*:[A-Za-z0-9_](?:[A-Za-z0-9_.-]*[A-Za-z0-9_-])?)
  | (?P<NS>[A-Za-z_][A-Za-z0-9_-]*:)
  | (?P<KEYWORD>[A-Za-z_][A-Za-z0-9_]*)
  | (?P<OP><=|>=|!=|\|\||&&|[=<>!*/+\-(){},.;|^?\[\]])
    """,
    re.VERBOSE,
)

_KEYWORDS = {
    "prefix", "select", "distinct", "reduced", "where", "optional", "union",
    "minus", "filter", "bind", "values", "group", "by", "having", "order",
    "limit", "offset", "asc", "desc", "as", "ask", "not", "exists", "in",
    "undef", "true", "false", "a", "construct", "describe", "service", "silent",
    "count", "sum", "avg", "min", "max", "group_concat", "sample", "separator",
    "insert", "delete", "data",
}

_FUNCS = {
    "regex", "bound", "str", "strlen", "contains", "strstarts", "strends",
    "ucase", "lcase", "concat", "abs", "coalesce", "if", "sameterm", "replace",
    "substr", "strbefore", "strafter", "round", "floor", "ceil",
    "isiri", "isuri", "isblank", "isliteral", "lang", "datatype",
    "langmatches", "strlang", "strdt",
    "md5", "sha1", "sha256", "sha384", "sha512", "encode_for_uri",
    "iri", "uri", "year", "month", "day", "hours", "minutes", "seconds", "tz",
    "timezone",
}

# xsd constructor functions usable as expressions (casts); shared by
# parse_primary and GROUP BY's FunctionCall condition form.
_CAST_FNS = (
    "xsd:double", "xsd:decimal", "xsd:integer", "xsd:float",
    "xsd:int", "xsd:long", "xsd:string", "xsd:boolean",
)

# numeric XSD datatypes: a typed literal of one of these becomes a numeric
# expression literal (value comparison), per SPARQL operator mapping
_NUMERIC_XSD = {
    "xsd:integer", "xsd:int", "xsd:long", "xsd:short", "xsd:byte",
    "xsd:decimal", "xsd:float", "xsd:double",
    "xsd:nonNegativeInteger", "xsd:positiveInteger",
}


class Token:
    __slots__ = ("kind", "text")

    def __init__(self, kind: str, text: str):
        self.kind = kind
        self.text = text

    def __repr__(self):
        return f"{self.kind}({self.text})"


def tokenize(s: str) -> list[Token]:
    out, pos = [], 0
    while pos < len(s):
        m = _TOKEN_RE.match(s, pos)
        if not m:
            raise SyntaxError(f"SPARQL: cannot tokenize at {s[pos:pos+20]!r}")
        pos = m.end()
        kind = m.lastgroup
        if kind == "WS":
            continue
        text = m.group()
        # bare identifiers reach here as KEYWORD tokens; invalid ones are
        # rejected later at the grammar level (xsd:double-style casts
        # arrive as PNAME, so no per-token validation is possible here)
        out.append(Token(kind, text))
    out.append(Token("EOF", ""))
    return out


_ESCAPES = {"n": "\n", "t": "\t", "r": "\r", "b": "\b", "f": "\f",
            '"': '"', "'": "'", "\\": "\\"}


def _unquote(text: str) -> str:
    # single-pass unescape: sequential str.replace corrupts \\n (escaped
    # backslash + n) by rewriting the tail before the guard applies.
    return re.sub(r"\\(.)", lambda m: _ESCAPES.get(m.group(1), m.group(1)), text[1:-1])


class Parser:
    def __init__(self, text: str):
        self.toks = tokenize(text)
        self.i = 0
        self.prefixes: dict[str, str] = {}
        self._fresh = 0  # fresh-variable counter for sequence paths

    def fresh_var(self) -> str:
        self._fresh += 1
        return f"?__p{self._fresh}"

    # ---- token helpers ----
    def peek(self, k: int = 0) -> Token:
        return self.toks[min(self.i + k, len(self.toks) - 1)]

    def next(self) -> Token:
        t = self.toks[self.i]
        self.i += 1
        return t

    def at_kw(self, *words: str) -> bool:
        t = self.peek()
        return t.kind == "KEYWORD" and t.text.lower() in words

    def eat_kw(self, word: str) -> None:
        if not self.at_kw(word):
            raise SyntaxError(f"SPARQL: expected {word.upper()}, got {self.peek()}")
        self.next()

    def at_op(self, op: str) -> bool:
        t = self.peek()
        return t.kind == "OP" and t.text == op

    def eat_op(self, op: str) -> None:
        if not self.at_op(op):
            raise SyntaxError(f"SPARQL: expected {op!r}, got {self.peek()}")
        self.next()

    # ---- entry ----
    def parse(self) -> A.SelectQuery | A.Ask:
        while self.at_kw("prefix"):
            self.next()
            ns = self.next()
            iri = self.next()
            if ns.kind != "NS" or iri.kind != "IRIREF":
                raise SyntaxError("SPARQL: malformed PREFIX")
            self.prefixes[ns.text[:-1]] = iri.text[1:-1]
        if self.at_kw("ask"):
            self.next()
            group = self.parse_group()
            if self.peek().kind != "EOF":
                raise SyntaxError(f"SPARQL: trailing tokens at {self.peek()}")
            return A.Ask(group)
        if self.at_kw("insert", "delete", "with"):
            return self.parse_update()
        if self.at_kw("load", "clear", "drop", "create", "copy", "move", "add"):
            return self.parse_graph_manage()
        if self.at_kw("construct"):
            return self.parse_construct()
        if self.at_kw("describe"):
            self.next()
            terms = [self.parse_term()]
            # solution-modifier keywords end the term list (they are not
            # valid bare-identifier resource names) — otherwise
            # `DESCRIBE x LIMIT 2` swallows LIMIT as a term and the
            # modifiers-need-WHERE error below can never fire
            while self.peek().kind in ("VAR", "IRIREF", "PNAME") or (
                self.peek().kind == "KEYWORD"
                and not self.at_kw(
                    "where", "order", "limit", "offset", "group", "having"
                )
            ):
                terms.append(self.parse_term())
            child = None
            if self.at_kw("where") or self.at_op("{"):
                if self.at_kw("where"):
                    self.next()
                child = self.parse_group()
                # DescribeQuery (grammar [11]) carries a SolutionModifier:
                # ORDER BY/LIMIT/OFFSET select WHICH solutions contribute
                # described resources. (On the encoded engine this shape
                # takes the documented decode-early fallback — value-level
                # wrappers under Describe.) Without a WHERE group the
                # solution sequence is a single empty solution — modifiers
                # would be vacuous; rejected for clarity.
                child = self._apply_construct_modifiers(child, form="DESCRIBE")
            elif self.at_kw("order", "limit", "offset", "group", "having"):
                raise SyntaxError(
                    "SPARQL: DESCRIBE solution modifiers require a WHERE "
                    "group (without one there is no solution sequence to "
                    "order or slice)"
                )
            if self.peek().kind != "EOF":
                raise SyntaxError(f"SPARQL: trailing tokens at {self.peek()}")
            return A.Describe(tuple(terms), child)
        return self.parse_select()

    # ---- SPARQL 1.1 Update subset ----

    def _triple_block(self) -> list:
        """{ triples } — shared by DATA forms and Modify templates."""
        self.eat_op("{")
        out: list = []
        while not self.at_op("}"):
            if self.at_op("."):
                self.next()
                continue
            self.parse_triples_same_subject(out, allow_bnpl=False)
        self.eat_op("}")
        return out

    def _require_plain_template(self, tmpl: list, what: str) -> list:
        """DELETE{}/INSERT{} templates must be plain triple patterns — a
        property path parses fine but has no instantiable template form
        (same check DELETE WHERE applies to its implicit template)."""
        if any(not isinstance(tp, TriplePattern) for tp in tmpl):
            raise SyntaxError(
                f"SPARQL UPDATE: {what} template must contain only plain "
                "triple patterns (no property paths)"
            )
        return tmpl

    def parse_update(self):
        """INSERT DATA {q} | DELETE DATA {q} | [WITH <g>] DELETE WHERE {g}
        | [WITH <g>] [DELETE {qtmpl}] [INSERT {qtmpl}] WHERE {g}, where
        {q}/{qtmpl} blocks may mix plain triples with GRAPH <g> { ... }
        sub-blocks (SPARQL 1.1 Update §3.1). USING/USING NAMED dataset
        clauses are not supported — scope the update with WITH or GRAPH
        blocks instead."""
        with_graph = None
        if self.at_kw("with"):
            self.next()
            g = self.parse_term()
            if isinstance(g, str) and (g.startswith("?") or g.startswith("_:")):
                raise SyntaxError("SPARQL UPDATE: WITH takes a constant graph IRI")
            with_graph = g
        if not self.at_kw("insert", "delete"):
            raise SyntaxError(
                f"SPARQL UPDATE: expected INSERT or DELETE, got {self.peek()}"
            )
        is_insert = self.at_kw("insert")
        self.next()
        if self.at_kw("data"):
            if with_graph is not None:
                # grammar [41]/[38]: WITH belongs to Modify only
                raise SyntaxError(
                    "SPARQL UPDATE: WITH does not combine with DATA forms "
                    "(put the triples in a GRAPH block instead)"
                )
            self.next()
            triples, quads = self._quad_block("DATA")
            all_terms = [
                t for tp in list(triples) + [tp for _, tp in quads]
                for t in (tp.s, tp.p, tp.o)
            ] + [g for g, _ in quads]
            if any(isinstance(t, str) and t.startswith("?") for t in all_terms):
                raise SyntaxError("SPARQL UPDATE: DATA forms take ground triples only")
            if not is_insert and any(
                isinstance(t, str) and t.startswith("_:") for t in all_terms
            ):
                # spec (Update §3.1.2 / grammar [39] QuadData): DELETE DATA
                # must not contain blank nodes — there is no node a label
                # could denote for deletion. INSERT DATA bnodes are legal
                # and mint FRESH nodes (engine.update routes them through
                # the same per-execution minting as Modify templates).
                raise SyntaxError(
                    "SPARQL UPDATE: blank nodes are not permitted in "
                    "DELETE DATA"
                )
            node = (
                A.InsertData(triples, quads)
                if is_insert
                else A.DeleteData(triples, quads)
            )
            if self.peek().kind != "EOF":
                raise SyntaxError(f"SPARQL: trailing tokens at {self.peek()}")
            return node
        if is_insert:
            ins, ins_q = self._quad_block("INSERT")
            self._reject_using()
            self.eat_kw("where")
            group = self.parse_group()
            node = A.Modify(None, ins, group, (), ins_q, with_graph)
        elif self.at_kw("where"):
            self.next()
            group = self.parse_group()
            tmpl, quads = self._delete_where_template(group)
            node = A.Modify(tmpl, None, group, tuple(quads), (), with_graph)
        else:
            del_tmpl, del_q = self._quad_block("DELETE")
            ins_tmpl, ins_q = None, ()
            if self.at_kw("insert"):
                self.next()
                ins_tmpl, ins_q = self._quad_block("INSERT")
            self._reject_using()
            self.eat_kw("where")
            group = self.parse_group()
            node = A.Modify(del_tmpl, ins_tmpl, group, del_q, ins_q, with_graph)
        if self.peek().kind != "EOF":
            raise SyntaxError(f"SPARQL: trailing tokens at {self.peek()}")
        return node

    def _delete_where_template(self, group) -> tuple[list, list]:
        """DELETE WHERE { QuadPattern }: the group doubles as the implicit
        delete template — plain triples plus GRAPH blocks (grammar rule
        [40] QuadPattern; the graph name may be a variable, bound by the
        same pattern). Anything else (paths, filters, OPTIONAL, ...) has
        no deletable template form."""
        def plain(patterns) -> list:
            if any(not isinstance(tp, TriplePattern) for tp in patterns):
                raise SyntaxError(
                    "SPARQL UPDATE: DELETE WHERE takes plain triple "
                    "patterns (property paths have no deletable template "
                    "form)"
                )
            return list(patterns)

        tmpl: list = []
        quads: list = []
        stack = [group]
        while stack:
            n = stack.pop()
            if isinstance(n, A.Join):
                stack.extend((n.left, n.right))
            elif isinstance(n, A.BGP):
                tmpl.extend(plain(n.patterns))
            elif isinstance(n, A.Graph) and isinstance(n.child, A.BGP):
                quads.extend((n.term, tp) for tp in plain(n.child.patterns))
            else:
                raise SyntaxError(
                    "SPARQL UPDATE: DELETE WHERE takes plain triples and "
                    "GRAPH blocks only (filters/OPTIONAL/paths have no "
                    "deletable template form)"
                )
        return tmpl, quads

    def _reject_using(self) -> None:
        if self.at_kw("using"):
            raise SyntaxError(
                "SPARQL UPDATE: USING/USING NAMED dataset clauses are not "
                "supported — scope the update with WITH or GRAPH blocks"
            )

    def _quad_block(self, what: str) -> tuple[list, tuple]:
        """{ triples and GRAPH <g> { triples } sub-blocks } -> (plain
        default-graph template, ((graph, tp), ...) quad template). Both
        halves are held to the plain-template rules (no paths/bnpl)."""
        self.eat_op("{")
        triples: list = []
        quads: list = []
        while not self.at_op("}"):
            if self.at_op("."):
                self.next()
                continue
            if self.at_kw("graph"):
                self.next()
                g = self.parse_term()
                if isinstance(g, str) and g.startswith("_:"):
                    raise SyntaxError(
                        f"SPARQL UPDATE: {what} GRAPH blocks cannot be "
                        "named by a blank node"
                    )
                inner = self._require_plain_template(self._triple_block(), what)
                quads.extend((g, tp) for tp in inner)
                continue
            self.parse_triples_same_subject(triples, allow_bnpl=False)
        self.eat_op("}")
        return self._require_plain_template(triples, what), tuple(quads)

    def parse_graph_manage(self) -> A.GraphManage:
        """Graph management (SPARQL 1.1 Update §3.2): CLEAR/DROP/CREATE
        (GRAPH <iri> | DEFAULT | NAMED | ALL), COPY/MOVE/ADD
        ((GRAPH? <iri> | DEFAULT) TO (GRAPH? <iri> | DEFAULT)), and
        LOAD <doc> [INTO GRAPH <iri>]."""
        op = self.next().text.lower()
        silent = False
        if self.at_kw("silent"):
            silent = True
            self.next()
        if op == "load":
            src = self.parse_term()
            dst = None
            if self.at_kw("into"):
                self.next()
                self.eat_kw("graph")
                dst = self.parse_term()
            node = A.GraphManage("load", src, dst, silent)
        elif op in ("clear", "drop", "create"):
            if self.at_kw("graph"):
                self.next()
                src = self.parse_term()
            elif op != "create" and self.at_kw("default", "named", "all"):
                src = {
                    "default": A.DEFAULT_GRAPH,
                    "named": A.NAMED_GRAPHS,
                    "all": A.ALL_GRAPHS,
                }[self.next().text.lower()]
            else:
                allowed = "GRAPH <iri>" if op == "create" else (
                    "GRAPH <iri> | DEFAULT | NAMED | ALL"
                )
                raise SyntaxError(f"SPARQL UPDATE: {op.upper()} takes {allowed}")
            node = A.GraphManage(op, src, None, silent)
        else:  # copy / move / add
            src = self._graph_or_default()
            self.eat_kw("to")
            dst = self._graph_or_default()
            node = A.GraphManage(op, src, dst, silent)
        if self.peek().kind != "EOF":
            raise SyntaxError(f"SPARQL: trailing tokens at {self.peek()}")
        return node

    def _graph_or_default(self):
        if self.at_kw("default"):
            self.next()
            return A.DEFAULT_GRAPH
        if self.at_kw("graph"):
            self.next()
        return self.parse_term()

    def parse_construct(self) -> A.Construct:
        self.eat_kw("construct")
        if self.at_kw("where"):
            # CONSTRUCT WHERE { triples } shorthand (SPARQL 1.1 §10.2.3):
            # the pattern doubles as the template. The spec restricts the
            # group to a plain triples block — _require_plain_template
            # rejects paths, and parsing via _triple_block (template
            # rules: no bnpl/collections, no FILTER/OPTIONAL keywords —
            # they'd be consumed as terms and raise) enforces the rest.
            self.next()
            tmpl = self._require_plain_template(
                self._triple_block(), "CONSTRUCT WHERE"
            )
            child = self._apply_construct_modifiers(A.BGP(list(tmpl)))
            if self.peek().kind != "EOF":
                raise SyntaxError(f"SPARQL: trailing tokens at {self.peek()}")
            return A.Construct(tmpl, child)
        self.eat_op("{")
        template: list[TriplePattern] = []
        while not self.at_op("}"):
            if self.at_op("."):
                self.next()
                continue
            self.parse_triples_same_subject(template, allow_bnpl=False)
        self.eat_op("}")
        if self.at_kw("where"):
            self.next()
        child = self.parse_group()
        child = self._apply_construct_modifiers(child)
        if self.peek().kind != "EOF":
            raise SyntaxError(f"SPARQL: trailing tokens at {self.peek()}")
        return A.Construct(template, child)

    def _apply_construct_modifiers(self, child, form: str = "CONSTRUCT"):
        """CONSTRUCT solution modifiers (grammar [10] ConstructQuery allows
        a full SolutionModifier): ORDER BY orders the solution sequence,
        LIMIT/OFFSET slices it, BEFORE template instantiation — so
        `CONSTRUCT {...} WHERE {...} ORDER BY ?x LIMIT 10` emits the
        triples of the first 10 solutions, then dedups (a graph is a set).
        GROUP BY/HAVING on CONSTRUCT/DESCRIBE is rejected: grouped
        solutions have no per-solution template instantiation in this
        subset (aggregate in a SELECT subquery instead)."""
        if self.at_kw("group", "having"):
            raise SyntaxError(
                f"SPARQL: GROUP BY/HAVING on {form} is not supported "
                "(aggregate in a SELECT subquery inside WHERE instead)"
            )
        order_keys = self._parse_order_clause()
        offset, limit = self._parse_limit_offset()
        if order_keys:
            child = A.OrderBy(order_keys, child)
        if offset or limit is not None:
            child = A.Slice(offset, limit, child)
        return child

    # ---- SELECT ----
    def parse_select(self, subquery: bool = False) -> A.SelectQuery:
        self.eat_kw("select")
        distinct = False
        if self.at_kw("distinct", "reduced"):
            distinct = True
            self.next()

        select_all = False
        proj_vars: list[str] = []
        proj_exprs: list[tuple[str, object]] = []
        aggs: list[tuple[str, A.Aggregate]] = []
        while True:
            if self.at_op("*"):
                self.next()
                select_all = True
            elif self.peek().kind == "VAR":
                v = self.next().text[1:]
                if v in {n for n, _ in proj_exprs} | {n for n, _ in aggs}:
                    # §19.8 is symmetric: ?v after (expr AS ?v) is the
                    # same duplicate assignment as the reverse order
                    # (review r6 round 2 — it produced a duplicate-named
                    # column frame)
                    raise SyntaxError(f"SPARQL: duplicate SELECT target ?{v}")
                proj_vars.append(v)
            elif self.at_op("("):
                self.next()
                expr = self.parse_expr()
                self.eat_kw("as")
                var = self.next()
                if var.kind != "VAR":
                    raise SyntaxError("SPARQL: expected variable after AS")
                self.eat_op(")")
                name = var.text[1:]
                if name in proj_vars:
                    # §19.8: the AS target must not already be assigned or
                    # selected earlier in the SELECT clause
                    raise SyntaxError(
                        f"SPARQL: duplicate SELECT target ?{name}"
                    )
                if isinstance(expr, A.Aggregate):
                    aggs.append((name, expr))
                else:
                    proj_exprs.append((name, expr))
                proj_vars.append(name)
            else:
                break

        self.eat_kw("where") if self.at_kw("where") else None
        root: object = self.parse_group()

        # §19.8: SELECT (expr AS ?v) must not reassign a variable the
        # WHERE pattern already binds (same rule as BIND / GROUP BY
        # expression targets, r6) — the projection would silently
        # OVERWRITE the pattern binding.
        as_targets = {n for n, _ in proj_exprs} | {n for n, _ in aggs}
        if as_targets:
            clash = sorted(as_targets & A.scope_vars(root))
            if clash:
                raise SyntaxError(
                    "SPARQL: SELECT (... AS ?v) cannot reassign in-scope "
                    "variable(s): " + ", ".join("?" + v for v in clash)
                )

        group_keys: list[str] | None = None
        group_binds: list[tuple[str, object]] = []
        having = None

        if self.at_kw("group"):
            self.next()
            self.eat_kw("by")
            group_keys, group_binds = self._parse_group_conditions()
            # §18.2.1: `(expr AS ?v)` may not reassign a variable already
            # in scope of the group — the Bind would silently OVERWRITE
            # the pattern binding otherwise (review r6). Hidden __gN keys
            # are parser-owned and cannot clash.
            clash = sorted(
                n for n, _ in group_binds
                if not n.startswith("__") and n in A.scope_vars(root)
            )
            if clash:
                raise SyntaxError(
                    "SPARQL: GROUP BY (expr AS ?v) cannot reassign "
                    "in-scope variable(s): "
                    + ", ".join("?" + v for v in clash)
                )
        if self.at_kw("having"):
            self.next()
            having = self.parse_expr()
        order_keys = self._parse_order_clause()
        offset, limit = self._parse_limit_offset()
        if not subquery and self.peek().kind != "EOF":
            raise SyntaxError(f"SPARQL: trailing tokens at {self.peek()}")

        if having is not None and not aggs and group_keys is None:
            raise SyntaxError(
                "SPARQL: HAVING requires GROUP BY or aggregates in the "
                "SELECT list (it filters groups, not solutions — use "
                "FILTER for row-level conditions)"
            )
        if aggs or group_keys is not None or any(
            self._contains_agg(e) for _, e in proj_exprs
        ):
            # Expressions OVER aggregates — (MAX(?a) - MIN(?a) AS ?spread)
            # — lift their nested aggregates into the Group as hidden
            # columns (same device as HAVING), leaving the expression a
            # plain post-Group computation; this also makes a query whose
            # only aggregates are nested count as an aggregate query
            # (implicit single group) per §18.2.4 (review r5).
            proj_exprs = [(n, self._lift_having_aggs(e, aggs)) for n, e in proj_exprs]
            # SPARQL 1.1 §18.2.4.4: in an aggregate query the SELECT list
            # may contain only grouped variables, aggregate expressions,
            # and expressions over those — a bare non-grouped variable (or
            # SELECT *) is a SYNTAX error, not a silent first()/ANY_VALUE
            # (r5 W3C sweep: agg_projection_restriction).
            if select_all:
                raise SyntaxError(
                    "SPARQL: SELECT * cannot be used with GROUP BY/aggregates"
                )
            derived = {n for n, _ in aggs} | {n for n, _ in proj_exprs}
            keys = set(group_keys or [])
            bad = sorted({v for v in proj_vars if v not in derived} - keys)
            for name, e in proj_exprs:
                bad += sorted(A.expr_vars(e) - keys - derived)
            if bad:
                raise SyntaxError(
                    "SPARQL: non-grouped variable(s) in aggregate SELECT "
                    f"list: {', '.join('?' + v for v in sorted(set(bad)))} "
                    "(project only GROUP BY keys and aggregates)"
                )
            if having is not None:
                # spec-form HAVING (COUNT(?x) > 5): aggregates cannot run
                # inside DataFrame.filter — lift each into the Group as a
                # hidden __h column (reused when the SELECT list already
                # computes the same aggregate) and filter on the column.
                having = self._lift_having_aggs(having, aggs)
            # GROUP BY expressions (SPARQL 1.1 GroupCondition: `(expr AS
            # ?v)`, bare `(expr)` / BuiltInCall) extend each solution with
            # the computed value BEFORE grouping (§18.2.4 step 1) — a Bind
            # under the Group; the bound name then grouped like a variable.
            for name, e in group_binds:
                root = A.Bind(e, name, root)
            root = A.Group(keys=group_keys or [], aggs=aggs, child=root)
            if having is not None:
                root = A.Filter(having, root)
        # SPARQL evaluation order (spec §18.2.4): extend with SELECT
        # expressions, ORDER BY (may reference non-projected vars), project,
        # DISTINCT, slice. With DISTINCT, ordering is re-applied after the
        # dedup shuffle (sort keys must then be projected — documented
        # subset restriction).
        for name, e in proj_exprs:
            root = A.Bind(e, name, root)
        if order_keys and not distinct:
            root = A.OrderBy(order_keys, root)
        root = A.Project(
            vars=proj_vars if not select_all else [],
            exprs=[],
            child=root,
        )
        if distinct:
            root = A.Distinct(root)
            if order_keys:
                # documented subset restriction, enforced here as a clear
                # error instead of an unresolved-column failure at plan
                # time: ordering runs after the dedup projection, so sort
                # keys must be projected variables (the spec itself warns
                # DISTINCT+ORDER BY is only meaningful on projected
                # expressions, §15.1).
                if not select_all:
                    used: set[str] = set()
                    for e, _ in order_keys:
                        A.expr_vars(e, used)
                    missing = sorted(used - set(proj_vars))
                    if missing:
                        raise SyntaxError(
                            "SPARQL: ORDER BY with SELECT DISTINCT may only "
                            "reference projected variables; not projected: "
                            + ", ".join("?" + v for v in missing)
                        )
                root = A.OrderBy(order_keys, root)
        if offset or limit is not None:
            root = A.Slice(offset, limit, root)
        return A.SelectQuery(root=root)

    def _contains_agg(self, e) -> bool:
        if isinstance(e, A.Aggregate):
            return True
        if isinstance(e, A.BinOp):
            rights = e.right if isinstance(e.right, (list, tuple)) else [e.right]
            return self._contains_agg(e.left) or any(self._contains_agg(i) for i in rights)
        if isinstance(e, A.UnOp):
            return self._contains_agg(e.operand)
        if isinstance(e, A.FuncCall):
            return any(self._contains_agg(a) for a in e.args)
        return False

    def _lift_having_aggs(self, e, aggs: list):
        """Rewrite aggregates inside a HAVING expression to variable
        references over the Group's output, appending hidden (__h-prefixed,
        never projected) aggregate columns for ones not already selected."""
        if isinstance(e, A.Aggregate):
            for name, a in aggs:
                if a == e:
                    return A.Var(name)
            name = f"__h{len(aggs)}"
            aggs.append((name, e))
            return A.Var(name)
        if isinstance(e, A.BinOp):
            right = (
                tuple(self._lift_having_aggs(i, aggs) for i in e.right)
                if isinstance(e.right, tuple)
                else self._lift_having_aggs(e.right, aggs)
            )
            return A.BinOp(e.op, self._lift_having_aggs(e.left, aggs), right)
        if isinstance(e, A.UnOp):
            return A.UnOp(e.op, self._lift_having_aggs(e.operand, aggs))
        if isinstance(e, A.FuncCall):
            return A.FuncCall(
                e.name, tuple(self._lift_having_aggs(a, aggs) for a in e.args)
            )
        return e

    # ---- group graph pattern ----
    def _parse_group_conditions(self) -> tuple[list[str], list[tuple[str, object]]]:
        """GroupCondition* (SPARQL 1.1 grammar [20]): Var | '(' Expression
        ('AS' Var)? ')' | BuiltInCall | FunctionCall. Expression conditions
        return as (name, expr) binds applied under the Group; an unnamed
        condition gets a hidden __gN key (legal per spec — it shapes the
        groups but is not projectable, matching §18.2.4's sample rule)."""
        keys: list[str] = []
        binds: list[tuple[str, object]] = []
        while True:
            t = self.peek()
            if t.kind == "VAR":
                keys.append(self.next().text[1:])
                continue
            if self.at_op("("):
                self.next()
                e = self.parse_expr()
                if self.at_kw("as"):
                    self.next()
                    var = self.next()
                    if var.kind != "VAR":
                        raise SyntaxError(
                            "SPARQL: expected variable after AS in GROUP BY"
                        )
                    name = var.text[1:]
                else:
                    name = f"__g{len(binds)}"
                self.eat_op(")")
            elif (
                t.kind == "KEYWORD"
                and t.text.lower() in _FUNCS
                and self.peek(1).kind == "OP"
                and self.peek(1).text == "("
            ) or (
                t.kind == "PNAME"
                and t.text.lower() in _CAST_FNS
                and self.peek(1).kind == "OP"
                and self.peek(1).text == "("
            ):
                e = self.parse_primary()
                name = f"__g{len(binds)}"
            else:
                break
            if self._contains_agg(e):
                raise SyntaxError(
                    "SPARQL: aggregates are not allowed in GROUP BY "
                    "expressions (group first, aggregate in SELECT/HAVING)"
                )
            binds.append((name, e))
            keys.append(name)
        if not keys:
            raise SyntaxError("SPARQL: GROUP BY requires at least one condition")
        return keys, binds

    def _parse_order_clause(self) -> list[tuple[object, bool]]:
        """OrderClause? — empty list when the next token is not ORDER."""
        order_keys: list[tuple[object, bool]] = []
        if not self.at_kw("order"):
            return order_keys
        self.next()
        self.eat_kw("by")
        while True:
            if self.at_kw("asc", "desc"):
                asc = self.next().text.lower() == "asc"
                self.eat_op("(")
                e = self.parse_expr()
                self.eat_op(")")
                order_keys.append((e, asc))
            elif self.peek().kind == "VAR":
                order_keys.append((A.Var(self.next().text[1:]), True))
            elif self.at_op("("):
                self.next()
                e = self.parse_expr()
                self.eat_op(")")
                order_keys.append((e, True))
            else:
                break
        return order_keys

    def _parse_limit_offset(self) -> tuple[int, int | None]:
        """LimitOffsetClauses? — LIMIT/OFFSET in either order."""
        offset, limit = 0, None
        for _ in range(2):
            if self.at_kw("limit"):
                self.next()
                limit = self._int_operand("LIMIT")
            elif self.at_kw("offset"):
                self.next()
                offset = self._int_operand("OFFSET")
        return offset, limit

    def _int_operand(self, clause: str) -> int:
        # a non-integer operand must be the same SyntaxError every other
        # malformed-query path raises, not a leaked ValueError (review r4)
        t = self.next()
        import re as _re

        if t.kind != "NUMBER" or not _re.fullmatch(r"[+-]?\d+", t.text):
            raise SyntaxError(f"SPARQL: {clause} requires an integer, got {t.text!r}")
        return int(t.text)

    def parse_group(self):
        self.eat_op("{")
        elements: list[object] = []  # BGP | ('optional',g) | ...
        filters: list[object] = []
        triples: list[TriplePattern] = []

        def flush_triples():
            if triples:
                elements.append(A.BGP(list(triples)))
                triples.clear()

        while not self.at_op("}"):
            if self.at_kw("graph"):
                self.next()
                term = self.parse_term()
                flush_triples()
                elements.append(("graph", term, self.parse_group()))
            elif self.at_kw("service"):
                self.next()
                silent = False
                if self.at_kw("silent"):
                    self.next()
                    silent = True
                term = self.parse_term()
                flush_triples()
                elements.append(("service", term, self.parse_group(), silent))
            elif self.at_kw("optional"):
                self.next()
                flush_triples()
                elements.append(("optional", self.parse_group()))
            elif self.at_kw("minus"):
                self.next()
                flush_triples()
                elements.append(("minus", self.parse_group()))
            elif self.at_kw("filter"):
                self.next()
                filters.append(self.parse_constraint())
            elif self.at_kw("bind"):
                self.next()
                self.eat_op("(")
                e = self.parse_expr()
                self.eat_kw("as")
                v = self.next()
                self.eat_op(")")
                flush_triples()
                elements.append(("bind", e, v.text[1:]))
            elif self.at_kw("values"):
                self.next()
                flush_triples()
                elements.append(("values", *self.parse_values()))
            elif self.at_op("{"):
                flush_triples()

                def group_or_subquery():
                    # '{ SELECT ... }' is a subquery usable anywhere a
                    # group operand is — including either side of UNION
                    # (review r4: a right-side subquery parsed SELECT/WHERE
                    # as triple terms; a left-side one skipped the union
                    # chain and raised on valid SPARQL)
                    if (
                        self.peek(1).kind == "KEYWORD"
                        and self.peek(1).text.lower() == "select"
                    ):
                        self.next()
                        sub = self.parse_select(subquery=True)
                        self.eat_op("}")
                        return sub.root
                    return self.parse_group()

                g = group_or_subquery()
                while self.at_kw("union"):
                    self.next()
                    if not self.at_op("{"):
                        raise SyntaxError(
                            f"SPARQL: UNION must be followed by a group, got {self.peek()}"
                        )
                    g = A.Union(g, group_or_subquery())
                elements.append(("group", g))
            elif self.at_op("."):
                self.next()
            else:
                self.parse_triples_same_subject(triples)
        self.eat_op("}")
        flush_triples()

        # fold elements left-to-right
        node: object | None = None

        def join(left, right):
            return right if left is None else A.Join(left, right)

        for el in elements:
            if isinstance(el, A.BGP):
                node = join(node, el)
            elif el[0] == "group":
                node = join(node, el[1])
            elif el[0] == "optional":
                # §18.2.2.5: peel the OPTIONAL group's top-level FILTERs;
                # those touching any variable the LEFT side may bind
                # become the LeftJoin CONDITION (they must see the MERGED
                # solution — evaluated inside, a left-bound var can read
                # as unbound and kill every right row, review r6; gating
                # on "inside the group's may-bind set" was NOT enough — a
                # var maybe-unbound inside but bound on the left still
                # merges from the left). Filters disjoint from the left's
                # scope are equivalent evaluated in place (fast path).
                # EXISTS filters always stay in place — the walk SKIPS
                # them rather than stopping (stopping made the hoist
                # depend on filter declaration order, review r6 round 2);
                # outer-var-correlated EXISTS-in-OPTIONAL remains a
                # documented subset restriction.
                right = el[1]
                spine: list[object] = []
                inner = right
                while isinstance(inner, A.Filter):
                    spine.append(inner.expr)
                    inner = inner.child
                cond = None
                if spine:
                    lscope = A.scope_vars(node) if node is not None else set()
                    outside = [
                        e for e in spine
                        if not isinstance(e, A.ExistsExpr)
                        and (A.expr_vars(e) & lscope)
                    ]
                    if outside:
                        out_ids = {id(e) for e in outside}
                        for e in reversed(
                            [e for e in spine if id(e) not in out_ids]
                        ):
                            inner = A.Filter(e, inner)
                        cond = outside[0]
                        for e in outside[1:]:
                            cond = A.BinOp("&&", cond, e)
                        right = inner
                node = A.LeftJoin(
                    node if node is not None else A.BGP([]), right, cond
                )
            elif el[0] == "minus":
                node = A.Minus(node if node is not None else A.BGP([]), el[1])
            elif el[0] == "bind":
                # §10.1: BIND's target must not already be in scope of the
                # group up to this point — the withColumn would silently
                # OVERWRITE the pattern binding otherwise (same rule the
                # GROUP BY (expr AS ?v) form enforces, r6)
                if node is not None and el[2] in A.scope_vars(node):
                    raise SyntaxError(
                        f"SPARQL: BIND(... AS ?{el[2]}) reassigns a "
                        "variable already in scope of the group"
                    )
                node = A.Bind(el[1], el[2], node if node is not None else A.BGP([]))
            elif el[0] == "values":
                node = A.Values(el[1], el[2], node)
            elif el[0] == "graph":
                node = join(node, A.Graph(el[1], el[2]))
            elif el[0] == "service":
                node = join(node, A.Service(el[1], el[2], el[3]))
        if node is None:
            node = A.BGP([])
        for f in filters:  # SPARQL: FILTER scopes to the whole group
            node = A.Filter(f, node)
        return node

    # ---- triples ----
    def parse_triples_same_subject(self, out: list, allow_bnpl: bool = True) -> None:
        if self.at_op("[") or (allow_bnpl and self.at_op("(")):
            # blankNodePropertyList as SUBJECT: [ p o ; ... ] (propList) —
            # the trailing property list is OPTIONAL per the grammar
            # (TriplesNode PropertyList). The continuation test must be
            # "next token can START a verb", not "next is .\/}": OPTIONAL/
            # FILTER/GRAPH/... may follow a triples block without a dot,
            # and treating the keyword as a predicate either errors on
            # valid SPARQL or silently emits a bogus constant-predicate
            # pattern (review r5)
            s = self._parse_node(out, allow_bnpl)
            if not self._at_verb_start():
                return
            self._parse_property_list(out, s, allow_bnpl)
            return
        s = self.parse_term()
        self._parse_property_list(out, s, allow_bnpl)

    def _at_verb_start(self) -> bool:
        """Can the next token begin a verb (IRI/PNAME/var/'a'/path
        operators)? Group-level keywords (OPTIONAL, FILTER, ...) and
        structural tokens can't."""
        t = self.peek()
        if t.kind in ("VAR", "PNAME", "IRIREF", "NS"):
            return True
        if t.kind == "KEYWORD" and t.text.lower() == "a":
            return True
        return t.kind == "OP" and t.text in ("^", "!", "(")

    def _parse_property_list(self, out: list, s, allow_bnpl: bool = True) -> None:
        while True:
            p = self.parse_verb()
            while True:
                o = (
                    self._parse_node(out, allow_bnpl)
                    if self.at_op("[") or self.at_op("(")
                    else self.parse_term()
                )
                self._emit_pattern(out, s, p, o)
                if self.at_op(","):
                    self.next()
                    continue
                break
            if self.at_op(";"):
                self.next()
                if self.at_op(".") or self.at_op("}"):
                    break
                continue
            break

    def _collection(self, out: list, allow_bnpl: bool) -> str:
        """'(' object* ')' — RDF collection (SPARQL 1.1 §4.3.3): desugars
        to an rdf:first/rdf:rest chain of fresh non-distinguished
        variables ending in rdf:nil; '()' is the constant rdf:nil. Only
        valid in triple NODE positions (subject/object) — expression and
        path parentheses never reach here."""
        self.eat_op("(")
        if self.at_op(")"):
            self.next()
            return "rdf:nil"
        head = cur = self.fresh_var()
        first = True
        while not self.at_op(")"):
            if not first:
                nxt = self.fresh_var()
                self._emit_pattern(out, cur, "rdf:rest", nxt)
                cur = nxt
            el = self._parse_node(out, allow_bnpl)
            self._emit_pattern(out, cur, "rdf:first", el)
            first = False
        self.next()
        self._emit_pattern(out, cur, "rdf:rest", "rdf:nil")
        return head

    def _parse_node(self, out: list, allow_bnpl: bool):
        """A triple node: term, blank node property list, or collection."""
        if self.at_op("["):
            return self._bnpl(out, allow_bnpl)
        if self.at_op("("):
            if not allow_bnpl:
                raise SyntaxError(
                    "SPARQL: collections are not supported in "
                    "CONSTRUCT/UPDATE templates (fresh-bnode-per-solution "
                    "semantics)"
                )
            return self._collection(out, allow_bnpl)
        return self.parse_term()

    def _bnpl(self, out: list, allow_bnpl: bool) -> str:
        """'[' propertyListNotEmpty? ']' — a blank node in a query pattern
        is a NON-DISTINGUISHED variable (SPARQL 1.1 §4.1.4), so it
        desugars to a parser-fresh variable (the same device as sequence
        paths; SELECT * hides __-prefixed columns). Inner patterns emit
        into the same BGP. Not allowed in CONSTRUCT/UPDATE templates:
        a template bnode means a FRESH bnode per solution, which a shared
        variable (or constant label) cannot express — clear error instead
        of wrong semantics."""
        if not allow_bnpl:
            raise SyntaxError(
                "SPARQL: blank node property lists are not supported in "
                "CONSTRUCT/UPDATE templates (use an explicit variable or "
                "per-solution _:label where supported)"
            )
        self.eat_op("[")
        v = self.fresh_var()
        if self.at_op("]"):
            self.next()
            return v
        self._parse_property_list(out, v, allow_bnpl)
        self.eat_op("]")
        return v

    def _emit_pattern(self, out: list, s, p, o) -> None:
        if isinstance(p, tuple) and p[0] == "seq":
            # p1/p2/... -> chain through fresh variables
            cur = s
            for step in p[1][:-1]:
                v = self.fresh_var()
                self._emit_pattern(out, cur, step, v)
                cur = v
            self._emit_pattern(out, cur, p[1][-1], o)
        elif isinstance(p, tuple) and p[0] == "inv":
            # ^path == path with swapped endpoints (holds for ANY inner path)
            self._emit_pattern(out, o, p[1], s)
        elif isinstance(p, tuple) and p[0] == "alt":
            if all(isinstance(m, str) for m in p[1]):
                out.append(A.PropSetPattern(s, tuple(p[1]), o, negated=False))
            else:  # complex branches -> pre-emit each into its own list
                branches = []
                for member in p[1]:
                    branch: list = []
                    self._emit_pattern(branch, s, member, o)
                    branches.append(tuple(branch))
                out.append(A.AltPath(s, tuple(branches), o))
        elif isinstance(p, tuple) and p[0] == "neg":
            fwd = tuple(m for m in p[1] if isinstance(m, str))
            inv = tuple(m[1] for m in p[1] if isinstance(m, tuple))
            out.append(A.PropSetPattern(s, fwd, o, negated=True, inv_preds=inv))
        elif isinstance(p, tuple) and p[0] in ("+", "*", "?"):
            if isinstance(p[1], str):
                out.append(A.PathPattern(s, p[0], p[1], o))
            else:  # composite inner path: pre-emit its edge-set BGP
                src, dst = self.fresh_var(), self.fresh_var()
                inner: list = []
                self._emit_pattern(inner, src, p[1], dst)
                out.append(
                    A.ClosurePattern(s, p[0], tuple(inner), src[1:], dst[1:], o)
                )
        else:
            out.append(TriplePattern(s, p, o))

    # SPARQL 1.1 path grammar (subset):
    #   Path      := Seq ('|' Seq)*
    #   Seq       := EltOrInv ('/' EltOrInv)*
    #   EltOrInv  := '^'? Elt
    #   Elt       := Primary ('+'|'*'|'?')?
    #   Primary   := IRI | 'a' | '!' (IRI | '(' IRI ('|' IRI)* ')') | '(' Path ')'
    def parse_verb(self):
        verb = self._parse_verb_inner()
        if isinstance(verb, tuple):
            self._reject_path_vars(verb)
        return verb

    def _reject_path_vars(self, node) -> None:
        """The SPARQL path grammar admits only IRIs inside a property path
        (a bare variable predicate is VerbSimple, not a path); a variable
        under a path operator would otherwise silently evaluate as a
        never-matching constant predicate."""
        if isinstance(node, str):
            if node.startswith("?"):
                raise SyntaxError(
                    "SPARQL: variables are not allowed inside property "
                    f"paths ({node} under a path operator)"
                )
            return
        if isinstance(node, tuple):
            for part in node[1] if isinstance(node[1], list) else [node[1]]:
                self._reject_path_vars(part)

    def _parse_verb_inner(self):
        parts = [self._parse_path_seq()]
        while self.at_op("|"):
            self.next()
            parts.append(self._parse_path_seq())
        return parts[0] if len(parts) == 1 else ("alt", parts)

    def _parse_path_seq(self):
        parts = [self._parse_path_elt()]
        while self.at_op("/"):
            self.next()
            parts.append(self._parse_path_elt())
        return parts[0] if len(parts) == 1 else ("seq", parts)

    def _parse_path_elt(self):
        if self.at_op("^"):
            self.next()
            return ("inv", self._parse_path_elt())
        t = self._parse_path_primary()
        for mod in ("+", "*", "?"):
            if self.at_op(mod):
                self.next()
                return (mod, t)
        return t

    def _parse_path_primary(self):
        if self.at_kw("a"):  # rdf:type shorthand
            self.next()
            return "rdf:type"
        if self.at_op("!"):
            self.next()
            members = []
            if self.at_op("("):
                self.next()
                members.append(self._parse_neg_member())
                while self.at_op("|"):
                    self.next()
                    members.append(self._parse_neg_member())
                self.eat_op(")")
            else:
                members.append(self._parse_neg_member())
            return ("neg", members)
        if self.at_op("("):
            self.next()
            inner = self.parse_verb()
            self.eat_op(")")
            return inner
        return self.parse_term()

    def _parse_neg_member(self):
        """PathOneInPropertySet ::= iri | 'a' | '^' (iri | 'a') — the spec
        grammar admits ONLY IRIs (optionally inverted); quoted literals,
        numbers, and variables are syntax errors, enforced here explicitly
        rather than silently treated as never-matching predicates."""
        if self.at_kw("a"):
            self.next()
            return "rdf:type"
        if self.at_op("^"):  # inverse member: matches reverse edges
            self.next()
            inner = self._parse_neg_member()
            if not isinstance(inner, str):
                raise SyntaxError(
                    "SPARQL: '^' in a negated property set must be "
                    "followed by an IRI"
                )
            return ("inv", inner)
        if self.peek().kind in ("STRING", "NUMBER", "VAR"):
            raise SyntaxError(
                "SPARQL: negated property set members must be IRIs "
                f"(got {self.peek().text!r})"
            )
        return self.parse_term()

    def parse_term(self):
        t = self.next()
        if t.kind == "VAR":
            return "?" + t.text[1:]
        if t.kind == "PNAME":
            pfx = t.text.split(":", 1)[0]
            if pfx in self.prefixes:
                return self.prefixes[pfx] + t.text.split(":", 1)[1]
            return t.text  # lexical prefixed form (matches our stores)
        if t.kind == "IRIREF":
            return t.text[1:-1]
        if t.kind == "STRING":
            return self._literal_term(_unquote(t.text))
        if t.kind == "NUMBER":
            return t.text  # lexical form; stores are all-string
        if t.kind == "KEYWORD":
            if t.text.lower() in ("true", "false"):
                return t.text.lower()
            # bare identifier as lexical term (our stores hold plain-string
            # literals like "Person"); strict SPARQL would require an IRI.
            return t.text
        raise SyntaxError(f"SPARQL: unexpected term {t}")

    def _literal_term(self, lex: str) -> str:
        """Canonical term for a quoted literal, folding a following @lang /
        ^^datatype into the store's inline syntax ('"x"@en',
        '"5"^^xsd:int'). Plain literals — including explicit xsd:string,
        per RDF 1.1 — stay as the bare lexical form."""
        if self.peek().kind == "LANGTAG":
            tag = self.next().text[1:]
            return f'"{lex}"@{tag}'
        if self.at_op("^") and self.peek(1).kind == "OP" and self.peek(1).text == "^":
            self.next()
            self.next()
            dt = self.parse_term()
            if not isinstance(dt, str) or dt.startswith("?"):
                raise SyntaxError("SPARQL: datatype of a typed literal must be an IRI")
            if dt == "xsd:string":
                return lex
            return f'"{lex}"^^{dt}'
        return lex

    # ---- VALUES ----
    def parse_values(self):
        varnames: list[str] = []
        rows: list[tuple] = []
        if self.peek().kind == "VAR":
            varnames = [self.next().text[1:]]
            self.eat_op("{")
            while not self.at_op("}"):
                rows.append((self._values_term(),))
            self.next()
        else:
            self.eat_op("(")
            while self.peek().kind == "VAR":
                varnames.append(self.next().text[1:])
            self.eat_op(")")
            self.eat_op("{")
            while self.at_op("("):
                self.next()
                row = []
                while not self.at_op(")"):
                    row.append(self._values_term())
                self.next()
                if len(row) != len(varnames):
                    raise SyntaxError(
                        f"SPARQL: VALUES row has {len(row)} terms for "
                        f"{len(varnames)} variables"
                    )
                rows.append(tuple(row))
            self.eat_op("}")
        return varnames, rows

    def _values_term(self):
        if self.at_kw("undef"):
            self.next()
            return None
        return self.parse_term()

    # ---- expressions ----
    def parse_constraint(self):
        if self.at_kw("exists"):
            self.next()
            return A.ExistsExpr(self.parse_group(), negated=False)
        if self.at_kw("not"):
            self.next()
            self.eat_kw("exists")
            return A.ExistsExpr(self.parse_group(), negated=True)
        if self.at_op("("):
            self.next()
            e = self.parse_expr()
            self.eat_op(")")
            return e
        return self.parse_primary()  # bare function call e.g. FILTER regex(...)

    def parse_expr(self):
        return self.parse_or()

    def parse_or(self):
        left = self.parse_and()
        while self.at_op("||"):
            self.next()
            left = A.BinOp("||", left, self.parse_and())
        return left

    def parse_and(self):
        left = self.parse_rel()
        while self.at_op("&&"):
            self.next()
            left = A.BinOp("&&", left, self.parse_rel())
        return left

    def parse_rel(self):
        left = self.parse_add()
        for op in ("<=", ">=", "!=", "=", "<", ">"):
            if self.at_op(op):
                self.next()
                return A.BinOp(op, left, self.parse_add())
        if self.at_kw("in"):
            self.next()
            self.eat_op("(")
            items = [self.parse_expr()]
            while self.at_op(","):
                self.next()
                items.append(self.parse_expr())
            self.eat_op(")")
            return A.BinOp("IN", left, tuple(items))
        if self.at_kw("not") and self.peek(1).kind == "KEYWORD" and self.peek(1).text.lower() == "in":
            self.next()
            self.next()
            self.eat_op("(")
            items = [self.parse_expr()]
            while self.at_op(","):
                self.next()
                items.append(self.parse_expr())
            self.eat_op(")")
            return A.UnOp("!", A.BinOp("IN", left, tuple(items)))
        return left

    def parse_add(self):
        left = self.parse_mul()
        while True:
            if self.at_op("+") or self.at_op("-"):
                op = self.next().text
                left = A.BinOp(op, left, self.parse_mul())
            elif self.peek().kind == "NUMBER" and self.peek().text[0] in "+-":
                # the tokenizer folds a sign into NUMBER, so '1+1' arrives
                # as NUMBER(1) NUMBER(+1); the SPARQL grammar resolves this
                # with NumericLiteralPositive/Negative in
                # AdditiveExpression — do the same here
                t = self.next().text
                left = A.BinOp(t[0], left, A.Lit(float(t[1:]), is_numeric=True))
            else:
                break
        return left

    def parse_mul(self):
        left = self.parse_unary()
        while self.at_op("*") or self.at_op("/"):
            op = self.next().text
            left = A.BinOp(op, left, self.parse_unary())
        return left

    def parse_unary(self):
        if self.at_op("!"):
            self.next()
            return A.UnOp("!", self.parse_unary())
        if self.at_op("-"):
            self.next()
            return A.UnOp("-", self.parse_unary())
        if self.at_op("+"):
            self.next()
        return self.parse_primary()

    _AGG_NAMES = ("count", "sum", "avg", "min", "max", "group_concat", "sample")

    def parse_primary(self):
        t = self.peek()
        if t.kind == "OP" and t.text == "(":
            self.next()
            e = self.parse_expr()
            self.eat_op(")")
            return e
        if t.kind == "VAR":
            self.next()
            return A.Var(t.text[1:])
        if t.kind == "NUMBER":
            self.next()
            return A.Lit(float(t.text), is_numeric=True)
        if t.kind == "STRING":
            self.next()
            lex = _unquote(t.text)
            if self.at_op("^") and self.peek(1).kind == "OP" and self.peek(1).text == "^":
                # numeric typed literal -> numeric expression (SPARQL value
                # comparison); other datatypes keep the inline term form.
                self.next()
                self.next()
                dt = self.parse_term()
                if dt in _NUMERIC_XSD:
                    return A.Lit(float(lex), is_numeric=True)
                if dt == "xsd:string":
                    return A.Lit(lex)
                return A.Lit(f'"{lex}"^^{dt}')
            if self.peek().kind == "LANGTAG":
                tag = self.next().text[1:]
                return A.Lit(f'"{lex}"@{tag}')
            return A.Lit(lex)
        if t.kind == "KEYWORD":
            low = t.text.lower()
            if low in ("true", "false"):
                self.next()
                return A.Lit(low == "true")
            if low in self._AGG_NAMES:
                return self.parse_aggregate()
            if low in _FUNCS:
                self.next()
                self.eat_op("(")
                args = []
                if not self.at_op(")"):
                    args.append(self.parse_expr())
                    while self.at_op(","):
                        self.next()
                        args.append(self.parse_expr())
                self.eat_op(")")
                return A.FuncCall(low, tuple(args))
            if low == "exists":
                self.next()
                return A.ExistsExpr(self.parse_group(), negated=False)
            if low == "not":
                self.next()
                self.eat_kw("exists")
                return A.ExistsExpr(self.parse_group(), negated=True)
        if (
            t.kind == "PNAME"
            and t.text.lower() in _CAST_FNS
            and self.peek(1).kind == "OP" and self.peek(1).text == "("
        ):
            self.next()
            self.eat_op("(")
            arg = self.parse_expr()
            self.eat_op(")")
            return A.FuncCall(t.text.lower(), (arg,))
        if t.kind in ("PNAME", "IRIREF"):  # IRI as expression constant,
            # e.g. datatype(?x) = xsd:int or STRDT(?s, xsd:int)
            return A.Lit(self.parse_term())
        raise SyntaxError(f"SPARQL: unexpected expression token {t}")

    def parse_aggregate(self):
        name = self.next().text.lower()
        self.eat_op("(")
        distinct = False
        if self.at_kw("distinct"):
            distinct = True
            self.next()
        arg = None
        sep = " "
        if self.at_op("*"):
            self.next()
        else:
            arg = self.parse_expr()
        if self.at_op(";"):  # GROUP_CONCAT(?x; SEPARATOR=",")
            self.next()
            self.eat_kw("separator")
            self.eat_op("=")
            sep_t = self.next()
            sep = _unquote(sep_t.text)
        self.eat_op(")")
        return A.Aggregate(func=name, arg=arg, distinct=distinct, separator=sep)


def parse_sparql(text: str):
    return Parser(text).parse()
