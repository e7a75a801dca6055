"""W3C conformance corpus — entailment regimes (RDFS / OWL-Horst subset).

Sources: the public rdf-tests sparql11/entailment family (transcribed
from memory — the semantics-defining RDFS cases rdfs01-style
subPropertyOf/subClassOf/domain/range shapes) and the pD* rule set of
ter Horst, "Completeness, decidability and complexity of entailment for
RDF Schema and a semantic extension involving the OWL vocabulary"
(J. Web Semantics 3(2-3), 2005) — the published definition of the
OWL-Horst regime GraphDB's ``owl-horst-optimized`` ruleset implements
(repo-config.ttl:33). Every case runs the query under the engine's
materialized closure (``inference: True``) — this gives B40/B41 a
spec-sourced family instead of only the repo's own naive-chainer
differential (r10 verdict, "What's missing" #1 / next-round #1).

Expected rows are derived BY HAND from the named rule(s); negative
controls pin soundness (rules must not fire backwards).
"""

PFX = "@prefix : <http://example/> .\n" \
      "@prefix rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#> .\n" \
      "@prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .\n" \
      "@prefix owl: <http://www.w3.org/2002/07/owl#> .\n"

QPFX = "PREFIX : <http://example/>\n" \
       "PREFIX rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#>\n" \
       "PREFIX rdfs: <http://www.w3.org/2000/01/rdf-schema#>\n" \
       "PREFIX owl: <http://www.w3.org/2002/07/owl#>\n"

E = "http://example/"

CASES = [
    # ---------------------------------------------------------- RDFS core
    {
        "name": "rdfs-subprop",
        "source": "rdf-tests entailment/rdfs01 (rule rdfs7)",
        "inference": True,
        "data": PFX + ":p rdfs:subPropertyOf :q . :a :p :b .",
        "query": QPFX + "SELECT ?x ?y WHERE { ?x :q ?y }",
        "results": [{"x": f"<{E}a>", "y": f"<{E}b>"}],
    },
    {
        "name": "rdfs-subprop-chain",
        "source": "pD* rules rdfs5+rdfs7 (ter Horst 2005, Table 3)",
        "inference": True,
        "data": PFX + (":p rdfs:subPropertyOf :q . "
                       ":q rdfs:subPropertyOf :r . :a :p :b ."),
        "query": QPFX + "SELECT ?x WHERE { ?x :r :b }",
        "results": [{"x": f"<{E}a>"}],
    },
    {
        "name": "rdfs-subclass-instance",
        "source": "rdf-tests entailment/rdfs-subClassOf shape (rule rdfs9)",
        "inference": True,
        "data": PFX + ":C1 rdfs:subClassOf :C2 . :x rdf:type :C1 .",
        "query": QPFX + "ASK { :x rdf:type :C2 }",
        "ask": True,
    },
    {
        "name": "rdfs-subclass-transitive",
        "source": "pD* rules rdfs11+rdfs9 (ter Horst 2005, Table 3)",
        "inference": True,
        "data": PFX + (":C1 rdfs:subClassOf :C2 . :C2 rdfs:subClassOf :C3 . "
                       ":x rdf:type :C1 ."),
        "query": QPFX + """SELECT ?c WHERE { :x rdf:type ?c } ORDER BY ?c""",
        "ordered": True,
        "results": [{"c": f"<{E}C1>"}, {"c": f"<{E}C2>"},
                    {"c": f"<{E}C3>"}],
    },
    {
        "name": "rdfs-domain",
        "source": "rdf-tests entailment/rdfs-domain shape (rule rdfs2)",
        "inference": True,
        "data": PFX + ":p rdfs:domain :C . :a :p :b .",
        "query": QPFX + "ASK { :a rdf:type :C }",
        "ask": True,
    },
    {
        "name": "rdfs-range",
        "source": "rdf-tests entailment/rdfs-range shape (rule rdfs3)",
        "inference": True,
        "data": PFX + ":p rdfs:range :C . :a :p :b .",
        "query": QPFX + "ASK { :b rdf:type :C }",
        "ask": True,
    },
    {
        "name": "rdfs-range-not-subject",
        "source": "soundness control for rdfs3 (range types the OBJECT)",
        "inference": True,
        "data": PFX + ":p rdfs:range :C . :a :p :b .",
        "query": QPFX + "ASK { :a rdf:type :C }",
        "ask": False,
    },
    {
        "name": "rdfs-domain-through-subprop",
        "source": "pD* composition rdfs7 then rdfs2 (ter Horst 2005)",
        "inference": True,
        "data": PFX + (":p rdfs:subPropertyOf :q . :q rdfs:domain :C . "
                       ":a :p :b ."),
        "query": QPFX + "ASK { :a rdf:type :C }",
        "ask": True,
    },
    {
        "name": "rdfs-domain-not-backwards",
        "source": "soundness control: rdfs2 must not invent edges",
        "inference": True,
        "data": PFX + ":p rdfs:domain :C . :a rdf:type :C .",
        "query": QPFX + "ASK { :a :p ?y }",
        "ask": False,
    },
    # ------------------------------------------------- OWL property rules
    {
        "name": "owl-symmetric",
        "source": "pD* rule rdfp3 (ter Horst 2005, Table 6)",
        "inference": True,
        "data": PFX + ":p rdf:type owl:SymmetricProperty . :a :p :b .",
        "query": QPFX + "ASK { :b :p :a }",
        "ask": True,
    },
    {
        "name": "owl-transitive",
        "source": "pD* rule rdfp4 (ter Horst 2005, Table 6)",
        "inference": True,
        "data": PFX + (":p rdf:type owl:TransitiveProperty . "
                       ":a :p :b . :b :p :c . :c :p :d ."),
        "query": QPFX + "SELECT ?y WHERE { :a :p ?y } ORDER BY ?y",
        "ordered": True,
        "results": [{"y": f"<{E}b>"}, {"y": f"<{E}c>"}, {"y": f"<{E}d>"}],
    },
    {
        "name": "owl-inverseof",
        "source": "pD* rules rdfp8a/b (ter Horst 2005, Table 6)",
        "inference": True,
        "data": PFX + ":p owl:inverseOf :q . :a :p :b . :c :q :d .",
        "query": QPFX + ("SELECT ?x ?y WHERE { ?x :q ?y } ORDER BY ?x"),
        "ordered": True,
        "results": [{"x": f"<{E}b>", "y": f"<{E}a>"},
                    {"x": f"<{E}c>", "y": f"<{E}d>"}],
    },
    {
        "name": "owl-equivalent-class",
        "source": "pD* rules rdfp12a/b/c (equivalentClass as mutual "
                  "subClassOf; ter Horst 2005, Table 6)",
        "inference": True,
        "data": PFX + (":C1 owl:equivalentClass :C2 . "
                       ":x rdf:type :C1 . :y rdf:type :C2 ."),
        "query": QPFX + ("SELECT ?i WHERE { ?i rdf:type :C1 . "
                         "?i rdf:type :C2 } ORDER BY ?i"),
        "ordered": True,
        "results": [{"i": f"<{E}x>"}, {"i": f"<{E}y>"}],
    },
    {
        "name": "owl-equivalent-property",
        "source": "pD* rules rdfp13a/b/c (ter Horst 2005, Table 6)",
        "inference": True,
        "data": PFX + ":p owl:equivalentProperty :q . :a :p :b .",
        "query": QPFX + "ASK { :a :q :b }",
        "ask": True,
    },
    # ------------------------------------------------------------- sameAs
    {
        "name": "owl-sameas-transfer",
        "source": "pD* rules rdfp6/7/11 (sameAs symmetry, transitivity, "
                  "substitution; ter Horst 2005, Table 6)",
        "inference": True,
        "data": PFX + (":a owl:sameAs :b . :b owl:sameAs :c . "
                       ":c :p :v ."),
        "query": QPFX + "SELECT ?o WHERE { :a :p ?o }",
        "results": [{"o": f"<{E}v>"}],
    },
    {
        "name": "owl-sameas-symmetric",
        "source": "pD* rule rdfp6 (ter Horst 2005, Table 6)",
        "inference": True,
        "data": PFX + ":a owl:sameAs :b .",
        "query": QPFX + "ASK { :b owl:sameAs :a }",
        "ask": True,
    },
    {
        "name": "owl-functional-sameas",
        "source": "pD* rule rdfp1 (ter Horst 2005, Table 6)",
        "inference": True,
        "data": PFX + (":p rdf:type owl:FunctionalProperty . "
                       ":x :p :v1 . :x :p :v2 ."),
        "query": QPFX + "ASK { :v1 owl:sameAs :v2 }",
        "ask": True,
    },
    {
        "name": "owl-inverse-functional-sameas",
        "source": "pD* rule rdfp2 (ter Horst 2005, Table 6)",
        "inference": True,
        "data": PFX + (":p rdf:type owl:InverseFunctionalProperty . "
                       ":x1 :p :v . :x2 :p :v ."),
        "query": QPFX + "ASK { :x1 owl:sameAs :x2 }",
        "ask": True,
    },
    # ------------------------------------------------- OWL restrictions
    {
        "name": "owl-hasvalue-both-ways",
        "source": "pD* rules rdfp14a/14bx (ter Horst 2005, Table 6)",
        "inference": True,
        "data": PFX + (":R owl:onProperty :p ; owl:hasValue :v . "
                       ":x rdf:type :R . :y :p :v ."),
        "query": QPFX + ("SELECT ?a WHERE { { :x :p :v . "
                         "BIND(:x AS ?a) } UNION "
                         "{ :y rdf:type :R . BIND(:y AS ?a) } } ORDER BY ?a"),
        "ordered": True,
        "results": [{"a": f"<{E}x>"}, {"a": f"<{E}y>"}],
    },
    {
        "name": "owl-somevaluesfrom",
        "source": "pD* rule rdfp15 (ter Horst 2005, Table 6)",
        "inference": True,
        "data": PFX + (":R owl:onProperty :p ; owl:someValuesFrom :C . "
                       ":y rdf:type :C . :x :p :y ."),
        "query": QPFX + "ASK { :x rdf:type :R }",
        "ask": True,
    },
    {
        "name": "owl-allvaluesfrom",
        "source": "pD* rule rdfp16 (ter Horst 2005, Table 6)",
        "inference": True,
        "data": PFX + (":R owl:onProperty :p ; owl:allValuesFrom :C . "
                       ":x rdf:type :R . :x :p :y ."),
        "query": QPFX + "ASK { :y rdf:type :C }",
        "ask": True,
    },
    {
        "name": "owl-allvaluesfrom-not-backwards",
        "source": "soundness control for rdfp16 (needs the rdf:type :R "
                  "premise)",
        "inference": True,
        "data": PFX + (":R owl:onProperty :p ; owl:allValuesFrom :C . "
                       ":x :p :y ."),
        "query": QPFX + "ASK { :y rdf:type :C }",
        "ask": False,
    },
]

CASES += [
    {
        "name": "owl-restriction-into-subclass",
        "source": "pD* composition rdfp15 then rdfs9 (ter Horst 2005: "
                  "restriction classes compose through subClassOf)",
        "inference": True,
        "data": PFX + (":R owl:onProperty :p ; owl:someValuesFrom :C . "
                       ":R rdfs:subClassOf :Person . "
                       ":y rdf:type :C . :x :p :y ."),
        "query": QPFX + "ASK { :x rdf:type :Person }",
        "ask": True,
    },
    {
        "name": "owl-inverse-then-transitive",
        "source": "pD* composition rdfp8 then rdfp4 (derived edges keep "
                  "chaining; ter Horst 2005)",
        "inference": True,
        "data": PFX + (":p rdf:type owl:TransitiveProperty . "
                       ":q owl:inverseOf :p . "
                       ":a :p :b . :c :q :b . :c :p :d ."),
        "query": QPFX + "ASK { :a :p :d }",
        "ask": True,
    },
    {
        "name": "rdfs-subclass-nothing-is-type-only",
        "source": "soundness control: rdfs9 propagates types, it does "
                  "not merge instances",
        "inference": True,
        "data": PFX + (":C1 rdfs:subClassOf :C2 . "
                       ":x rdf:type :C1 . :y rdf:type :C2 ."),
        "query": QPFX + "ASK { :x owl:sameAs :y }",
        "ask": False,
    },
    {
        "name": "owl-functional-chain-merges-objects",
        "source": "pD* rdfp1 then rdfp11 (the derived sameAs substitutes "
                  "into other facts; ter Horst 2005)",
        "inference": True,
        "data": PFX + (":p rdf:type owl:FunctionalProperty . "
                       ":x :p :v1 . :x :p :v2 . :v1 :q :w ."),
        "query": QPFX + "ASK { :v2 :q :w }",
        "ask": True,
    },
]

CASES += [
    # r11b: more rule COMPOSITIONS (derived facts must feed every other
    # rule) and soundness controls, still within the declared OWL-Horst
    # scope (rdfs2/3/5/7/9/11, rdfp1-4/6-8/12-16)
    {
        "name": "owl-equivalent-then-subclass-chain",
        "source": "pD* rdfp12a then rdfs9/11 (equivalentClass edges join "
                  "the subClassOf hierarchy; ter Horst 2005)",
        "inference": True,
        "data": PFX + (":C1 owl:equivalentClass :C2 . "
                       ":C2 rdfs:subClassOf :C3 . :x rdf:type :C1 ."),
        "query": QPFX + "ASK { :x rdf:type :C3 }",
        "ask": True,
    },
    {
        "name": "owl-symmetric-through-subprop",
        "source": "pD* composition rdfs7 then rdfp3 (the derived :q edge "
                  "is what the symmetry rule flips)",
        "inference": True,
        "data": PFX + (":p rdfs:subPropertyOf :q . "
                       ":q rdf:type owl:SymmetricProperty . :a :p :b ."),
        "query": QPFX + "ASK { :b :q :a }",
        "ask": True,
    },
    {
        "name": "owl-transitive-through-subprop",
        "source": "pD* composition rdfs7 then rdfp4 (ter Horst 2005 "
                  "discusses exactly this interaction for pD*)",
        "inference": True,
        "data": PFX + (":p rdfs:subPropertyOf :q . "
                       ":q rdf:type owl:TransitiveProperty . "
                       ":a :p :b . :b :p :c ."),
        "query": QPFX + "ASK { :a :q :c }",
        "ask": True,
    },
    {
        "name": "owl-ifp-merge-transfers-type",
        "source": "pD* rdfp2 then rdfp11 substitution (the derived sameAs "
                  "carries rdf:type across the merged pair)",
        "inference": True,
        "data": PFX + (":p rdf:type owl:InverseFunctionalProperty . "
                       ":x1 :p :v . :x2 :p :v . :x1 rdf:type :C ."),
        "query": QPFX + "ASK { :x2 rdf:type :C }",
        "ask": True,
    },
    {
        "name": "owl-hasvalue-into-subclass",
        "source": "pD* rdfp14bx then rdfs9 (class membership derived from "
                  "a hasValue restriction propagates up subClassOf)",
        "inference": True,
        "data": PFX + (":R owl:onProperty :p ; owl:hasValue :v . "
                       ":R rdfs:subClassOf :S . :x :p :v ."),
        "query": QPFX + "ASK { :x rdf:type :S }",
        "ask": True,
    },
    {
        "name": "rdfs-range-on-derived-inverse-edge",
        "source": "pD* composition rdfp8a then rdfs3 (rdfs rules must see "
                  "OWL-derived edges)",
        "inference": True,
        "data": PFX + (":p owl:inverseOf :q . :q rdfs:range :C . "
                       ":a :p :b ."),
        "query": QPFX + "ASK { :a rdf:type :C }",
        "ask": True,
    },
    {
        "name": "owl-somevaluesfrom-needs-typed-object",
        "source": "soundness control for rdfp15: without the :y rdf:type "
                  ":C premise the restriction must not classify :x",
        "inference": True,
        "data": PFX + (":R owl:onProperty :p ; owl:someValuesFrom :C . "
                       ":x :p :y ."),
        "query": QPFX + "ASK { :x rdf:type :R }",
        "ask": False,
    },
    {
        "name": "owl-transitive-not-symmetric",
        "source": "soundness control for rdfp4: transitivity must not "
                  "flip edge direction",
        "inference": True,
        "data": PFX + (":p rdf:type owl:TransitiveProperty . :a :p :b ."),
        "query": QPFX + "ASK { :b :p :a }",
        "ask": False,
    },
]
