"""Binary RDF reader/writer (SURVEY B50; the reference's Rio stack
registers the binary parser via rdf4j-runtime, pom.xml:80-90 —
``application/x-binary-rdf``, extension ``.brf``).

Structured after rdf4j's publicly documented binary RDF format: the
4-byte magic ``BRDF``, a big-endian int32 format version, then a record
stream — namespace declarations, value declarations building an
int-keyed value dictionary, statements whose four slots (s, p, o, g)
are inline values or dictionary references, terminated by an
end-of-data marker. Strings use Java ``DataOutput.writeUTF`` framing
(2-byte length + modified UTF-8: NUL as C0 80, supplementary code
points as CESU-8 surrogate pairs), which bounds one string at 65535
encoded bytes — longer literals raise honestly on write.

Byte-level interop with an actual rdf4j runtime is NOT verifiable in
this container (no JVM rdf4j available); the pair below is verified by
self-round-trip tests over adversarial term sets (NULs, astral chars,
every term kind) plus LOAD/export integration. Record/value tags live
in one table shared by reader and writer so they cannot drift.
"""

from __future__ import annotations

import struct

RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
XSD = "http://www.w3.org/2001/XMLSchema#"

MAGIC = b"BRDF"
FORMAT_VERSION = 1

# record types
NAMESPACE_DECL = 0
STATEMENT = 1
COMMENT = 2
VALUE_DECL = 3
END_OF_DATA = 127

# value types
NULL_VALUE = 0
URI_VALUE = 1
BNODE_VALUE = 2
PLAIN_LITERAL_VALUE = 3
LANG_LITERAL_VALUE = 4
DATATYPE_LITERAL_VALUE = 5
VALUE_REF = 6


def _mutf8_encode(s: str) -> bytes:
    """Java modified UTF-8: NUL → C0 80; code points above U+FFFF as a
    CESU-8 surrogate pair (two 3-byte sequences)."""
    out = bytearray()
    for ch in s:
        cp = ord(ch)
        if cp == 0:
            out += b"\xc0\x80"
        elif cp < 0x80:
            out.append(cp)
        elif cp < 0x800:
            out += ch.encode("utf-8")
        elif cp <= 0xFFFF:
            out += ch.encode("utf-8")
        else:
            cp -= 0x10000
            for half in (0xD800 | (cp >> 10), 0xDC00 | (cp & 0x3FF)):
                out += bytes((0xE0 | (half >> 12),
                              0x80 | ((half >> 6) & 0x3F),
                              0x80 | (half & 0x3F)))
    return bytes(out)


def _mutf8_decode(b: bytes) -> str:
    out = []
    i, n = 0, len(b)
    while i < n:
        c = b[i]
        if c < 0x80:
            out.append(chr(c))
            i += 1
        elif (c & 0xE0) == 0xC0:
            cp = ((c & 0x1F) << 6) | (b[i + 1] & 0x3F)
            out.append(chr(cp))
            i += 2
        elif (c & 0xF0) == 0xE0:
            cp = (((c & 0x0F) << 12) | ((b[i + 1] & 0x3F) << 6)
                  | (b[i + 2] & 0x3F))
            i += 3
            if 0xD800 <= cp <= 0xDBFF and i + 3 <= n \
                    and (b[i] & 0xF0) == 0xE0:
                low = (((b[i] & 0x0F) << 12) | ((b[i + 1] & 0x3F) << 6)
                       | (b[i + 2] & 0x3F))
                if 0xDC00 <= low <= 0xDFFF:
                    out.append(chr(0x10000 + ((cp - 0xD800) << 10)
                                   + (low - 0xDC00)))
                    i += 3
                    continue
            out.append(chr(cp))
        else:
            raise ValueError(f"binaryrdf: bad modified-UTF-8 byte {c:#x}")
    return "".join(out)


def _write_utf(s: str) -> bytes:
    enc = _mutf8_encode(s)
    if len(enc) > 0xFFFF:
        raise ValueError(
            f"binaryrdf: string of {len(enc)} encoded bytes exceeds the "
            "writeUTF 65535-byte frame; ship long literals as N-Quads")
    return struct.pack(">H", len(enc)) + enc


class _Reader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def _take(self, n: int) -> bytes:
        if self.pos + n > len(self.data):
            raise ValueError("binaryrdf: truncated document")
        b = self.data[self.pos:self.pos + n]
        self.pos += n
        return b

    def byte(self) -> int:
        return self._take(1)[0]

    def int32(self) -> int:
        return struct.unpack(">i", self._take(4))[0]

    def utf(self) -> str:
        (length,) = struct.unpack(">H", self._take(2))
        return _mutf8_decode(self._take(length))


def _read_value(r: _Reader, decls: dict):
    """One value record → repo term (lex, dt, lang), or None for a
    NULL_VALUE (only legal in the statement's context slot)."""
    vt = r.byte()
    if vt == NULL_VALUE:
        return None
    if vt == VALUE_REF:
        vid = r.int32()
        if vid not in decls:
            raise ValueError(f"binaryrdf: undeclared value ref {vid}")
        return decls[vid]
    if vt == URI_VALUE:
        return (r.utf(), None, None)
    if vt == BNODE_VALUE:
        label = r.utf()
        return (label if label.startswith("_:") else "_:" + label,
                None, None)
    if vt == PLAIN_LITERAL_VALUE:
        return (r.utf(), XSD + "string", None)
    if vt == LANG_LITERAL_VALUE:
        lex = r.utf()
        return (lex, RDF + "langString", r.utf().lower())
    if vt == DATATYPE_LITERAL_VALUE:
        lex = r.utf()
        return (lex, r.utf(), None)
    raise ValueError(f"binaryrdf: unknown value type {vt}")


def parse_binaryrdf(data: bytes):
    """Iterate (g, s, p, (o_lex, o_dt, o_lang)) quads of one binary RDF
    document; ``g`` is None for default-graph (NULL context)
    statements."""
    r = _Reader(data)
    if r._take(4) != MAGIC:
        raise ValueError("binaryrdf: bad magic (expected 'BRDF')")
    version = r.int32()
    if version != FORMAT_VERSION:
        raise ValueError(f"binaryrdf: unsupported format version "
                         f"{version} (reader implements {FORMAT_VERSION})")
    decls: dict = {}
    while True:
        rec = r.byte()
        if rec == END_OF_DATA:
            return
        if rec == NAMESPACE_DECL:
            r.utf(), r.utf()  # prefix binding; no triple content
        elif rec == COMMENT:
            r.utf()
        elif rec == VALUE_DECL:
            vid = r.int32()
            decls[vid] = _read_value(r, decls)
        elif rec == STATEMENT:
            s = _read_value(r, decls)
            p = _read_value(r, decls)
            o = _read_value(r, decls)
            g = _read_value(r, decls)
            if s is None or p is None or o is None:
                raise ValueError("binaryrdf: NULL in a non-context slot")
            s_lex, s_dt, _ = s
            p_lex, p_dt, _ = p
            if s_dt not in (None,) or p_dt not in (None,):
                raise ValueError("binaryrdf: literal subject/predicate")
            g_lex = None
            if g is not None:
                g_lex = g[0]
                if g[1] is not None:
                    raise ValueError("binaryrdf: literal context")
            yield (g_lex, s_lex, p_lex, o)
        else:
            raise ValueError(f"binaryrdf: unknown record type {rec}")


def _write_value(lex, dt, lang) -> bytes:
    """Repo term → one inline value record (the writer declares no
    dictionary entries — inline values are always legal; the reader
    accepts both)."""
    if dt is None:
        if lex.startswith("_:"):
            return bytes((BNODE_VALUE,)) + _write_utf(lex[2:])
        return bytes((URI_VALUE,)) + _write_utf(lex)
    if lang:
        return (bytes((LANG_LITERAL_VALUE,)) + _write_utf(lex)
                + _write_utf(lang))
    if dt == XSD + "string":
        return bytes((PLAIN_LITERAL_VALUE,)) + _write_utf(lex)
    return (bytes((DATATYPE_LITERAL_VALUE,)) + _write_utf(lex)
            + _write_utf(dt))


def write_header() -> bytes:
    return MAGIC + struct.pack(">i", FORMAT_VERSION)


def write_statement(g, s, p, o_lex, o_dt, o_lang,
                    default_graph: str | None = None) -> bytes:
    """One quad → one STATEMENT record. ``g`` equal to None or the
    default graph name writes a NULL context."""
    out = bytearray((STATEMENT,))
    out += _write_value(s, None, None)
    out += _write_value(p, None, None)
    out += _write_value(o_lex, o_dt, o_lang)
    if g is None or g == default_graph:
        out.append(NULL_VALUE)
    else:
        out += _write_value(g, None, None)
    return bytes(out)


def write_footer() -> bytes:
    return bytes((END_OF_DATA,))
