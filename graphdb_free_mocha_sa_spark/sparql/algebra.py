"""SPARQL 1.1 algebra tree (parser output, translator input).

Node names follow the W3C SPARQL 1.1 algebra (§18.2): BGP, Join, LeftJoin,
Filter, Union, Minus, Extend (BIND), Group/Aggregation, OrderBy/Slice/Distinct.
Property paths per §9, update operations per the SPARQL 1.1 Update spec.
Capability parity target: the reference accepts arbitrary SPARQL 1.1 strings
(GraphDBSystemAdapter.java:246 prepareTupleQuery, :228 prepareUpdate).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Union as U

# ---------------------------------------------------------------- terms


@dataclass(frozen=True)
class Var:
    name: str


@dataclass(frozen=True)
class IRI:
    value: str


@dataclass(frozen=True)
class Literal:
    lex: str
    dt: Optional[str] = None      # datatype IRI; None => xsd:string semantics
    lang: Optional[str] = None


@dataclass(frozen=True)
class BNode:
    label: str


Term = U[Var, IRI, Literal, BNode]

# ---------------------------------------------------------------- property paths


@dataclass(frozen=True)
class PLink:
    iri: str


@dataclass(frozen=True)
class PInv:
    path: "Path"


@dataclass(frozen=True)
class PSeq:
    left: "Path"
    right: "Path"


@dataclass(frozen=True)
class PAlt:
    left: "Path"
    right: "Path"


@dataclass(frozen=True)
class PMod:
    path: "Path"
    mod: str                      # '+', '*', '?'


@dataclass(frozen=True)
class PNeg:
    forward: tuple[str, ...]      # !(a|b|^c): forward and inverse excluded sets
    inverse: tuple[str, ...] = ()


Path = U[PLink, PInv, PSeq, PAlt, PMod, PNeg]

# ---------------------------------------------------------------- expressions


@dataclass(frozen=True)
class EVar:
    name: str


@dataclass(frozen=True)
class ELit:
    term: U[IRI, Literal]


@dataclass(frozen=True)
class EBinary:
    op: str                       # || && = != < <= > >= + - * / IN NOTIN
    left: "Expr"
    right: "Expr"


@dataclass(frozen=True)
class EUnary:
    op: str                       # ! + -
    expr: "Expr"


@dataclass(frozen=True)
class EFunc:
    name: str                     # uppercased builtin or full IRI (cast)
    args: tuple["Expr", ...]


@dataclass(frozen=True)
class EIn:
    expr: "Expr"
    items: tuple["Expr", ...]
    negated: bool


@dataclass(frozen=True)
class EExists:
    pattern: "Pattern"
    negated: bool


@dataclass(frozen=True)
class EAgg:
    func: str                     # COUNT SUM MIN MAX AVG SAMPLE GROUP_CONCAT
    expr: Optional["Expr"]        # None => COUNT(*)
    distinct: bool = False
    separator: str = " "


Expr = U[EVar, ELit, EBinary, EUnary, EFunc, EIn, EExists, EAgg]

# ---------------------------------------------------------------- patterns


@dataclass(frozen=True)
class TriplePattern:
    s: Term
    p: U[Term, Path]
    o: Term


@dataclass
class BGP:
    triples: list[TriplePattern]


@dataclass
class Join:
    left: "Pattern"
    right: "Pattern"


@dataclass
class LeftJoin:
    left: "Pattern"
    right: "Pattern"
    expr: Optional[Expr] = None


@dataclass
class Union:
    left: "Pattern"
    right: "Pattern"


@dataclass
class Minus:
    left: "Pattern"
    right: "Pattern"


@dataclass
class Filter:
    expr: Expr
    pattern: "Pattern"


@dataclass
class Extend:
    pattern: "Pattern"
    var: str
    expr: Expr


@dataclass
class ValuesTable:
    variables: list[str]
    rows: list[list[Optional[Term]]]   # None = UNDEF


@dataclass
class GraphPat:
    graph: Term                   # Var or IRI
    pattern: "Pattern"


@dataclass
class SubSelect:
    query: "SelectQuery"


@dataclass(frozen=True)
class Service:
    """SERVICE federation (B20): the inner group is re-sent to a remote
    SPARQL endpoint as text; ``pattern`` keeps the parsed form for variable
    analysis. SILENT failures yield the unit solution. The endpoint may be
    a variable (reference accepts arbitrary SPARQL incl. ``SERVICE ?ep``,
    GraphDBSystemAdapter.java:246 via jena-arq): it must then be bound by
    the upstream pattern and the group executes once per distinct value."""
    endpoint: Term                # IRI or Var
    pattern: "Pattern"
    silent: bool
    query: str


Pattern = U[BGP, Join, LeftJoin, Union, Minus, Filter, Extend, ValuesTable,
            GraphPat, SubSelect]

# ---------------------------------------------------------------- queries


@dataclass
class SelectQuery:
    projections: list[tuple[str, Optional[Expr]]]   # (varname, expr or None); [] => SELECT *
    pattern: Pattern
    distinct: bool = False
    reduced: bool = False
    group_by: list[tuple[Optional[str], Expr]] = field(default_factory=list)
    having: list[Expr] = field(default_factory=list)
    order_by: list[tuple[Expr, bool]] = field(default_factory=list)  # (expr, ascending)
    limit: Optional[int] = None
    offset: Optional[int] = None
    dataset_default: list[str] = field(default_factory=list)  # FROM
    dataset_named: list[str] = field(default_factory=list)    # FROM NAMED
    # query-level trailing VALUES clause (SPARQL 1.1 §10.2 / algebra
    # 18.2.4.2): joined with the solutions AFTER grouping/HAVING
    values_clause: Optional["ValuesTable"] = None


@dataclass
class AskQuery:
    pattern: Pattern
    dataset_default: list[str] = field(default_factory=list)
    dataset_named: list[str] = field(default_factory=list)


@dataclass
class ConstructQuery:
    template: list[TriplePattern]
    pattern: Pattern
    limit: Optional[int] = None
    offset: Optional[int] = None
    order_by: list[tuple[Expr, bool]] = field(default_factory=list)
    dataset_default: list[str] = field(default_factory=list)
    dataset_named: list[str] = field(default_factory=list)


@dataclass
class DescribeQuery:
    terms: list[Term]             # vars or IRIs
    pattern: Optional[Pattern]
    # solution modifiers apply to the WHERE solution sequence (which
    # selects the resources to describe), per the shared grammar
    order_by: list[tuple[Expr, bool]] = field(default_factory=list)
    limit: Optional[int] = None
    offset: Optional[int] = None


Query = U[SelectQuery, AskQuery, ConstructQuery, DescribeQuery]

# ---------------------------------------------------------------- updates


@dataclass
class QuadData:
    """Ground quads: (graph-IRI-or-None, s, p, o) with concrete terms."""
    quads: list[tuple[Optional[str], Term, Term, Term]]


@dataclass
class InsertData:
    data: QuadData


@dataclass
class DeleteData:
    data: QuadData


@dataclass
class Modify:
    """DELETE {tmpl} INSERT {tmpl} WHERE {pattern} (+ WITH/USING)."""
    delete_template: list[tuple[Optional[U[str, Var]], TriplePattern]]
    insert_template: list[tuple[Optional[U[str, Var]], TriplePattern]]
    where: Pattern
    with_graph: Optional[str] = None
    #: USING / USING NAMED dataset for the WHERE pattern (r6): when
    #: present, WITH does not scope the WHERE (SPARQL Update §3.1.3)
    using: tuple = ()
    using_named: tuple = ()


@dataclass
class ClearDrop:
    op: str                       # CLEAR | DROP
    target: str                   # 'DEFAULT' | 'NAMED' | 'ALL' | graph IRI
    silent: bool = False


@dataclass
class CreateGraph:
    graph: str
    silent: bool = False


@dataclass
class LoadOp:
    source: str
    graph: Optional[str] = None
    silent: bool = False


@dataclass
class CopyMoveAdd:
    op: str                       # COPY | MOVE | ADD
    src: Optional[str]            # None = DEFAULT
    dst: Optional[str]
    silent: bool = False


UpdateOp = U[InsertData, DeleteData, Modify, ClearDrop, CreateGraph, LoadOp,
             CopyMoveAdd]
