"""Minimal pure-Python PDF layout parser → interleaved spans.

The north rule's extraction tier is "HTML boilerplate strip, PDF/layout
parse, DOM heuristics" over ONE table of interleaved text+media spans.
This module is the PDF leg: it turns a PDF byte blob into the same
``(kind, text, media_ref, offset)`` span sequence the HTML kernel emits
(serializer.py), so PDF documents land in the same Iceberg/parquet table
and every downstream operator (dedup, textqa, similarity, extraction
metrics) works on them unchanged.

No PDF library exists in this environment, so the parser is built from
the file format up (PDF 32000-1:2008): object scanning without an xref
table (linear `N 0 obj … endobj` scan — robust to broken xrefs, which is
also how real-world repair tools walk damaged files) PLUS PDF 1.5+
compressed cross-references (/Type /XRef W-field streams and
/Type /ObjStm object streams — how post-2005 producers store page
dicts, fonts and CMaps), the §7.4 stream-filter chains, standard-
security-handler decryption for empty-user-password files — RC4 V1/V2
(§7.6.3), crypt-filter V4 /V2+/AESV2 (§7.6.2), and AES-256 /AESV3
R5/R6 incl. the Algorithm 2.B hardened hash (ISO 32000-2 §7.6.4.3;
AES itself in cryptokit.py, FIPS-197-vector-pinned),
a content-stream tokenizer (strings with escapes/nesting, hex strings,
arrays, names, numbers, operators), and a small text-state machine
(BT/ET, Tf, Td/TD/Tm/T*, Tj/'/"/TJ) that reconstructs reading order and
line/word breaks from the layout coordinates.

Scope (honestly bounded — each limit documented where enforced):
* FlateDecode and raw streams; other filters (DCT, LZW, ...) are kept as
  opaque media where applicable and skipped for text.
* Simple fonts decode as standard single-byte encodings (latin-1
  superset), with /Encoding /Differences remaps honored through an
  Adobe-Glyph-List subset + uniXXXX names (unknown Differences names
  show as U+FFFD). Composite (Type0/Identity-H) fonts — the dominant encoding
  in real-world corpora — decode their 2-byte CIDs through the embedded
  /ToUnicode CMap (bfchar + both bfrange forms, §9.10.3); CIDs without a
  mapping (or Type0 without a ToUnicode) become U+FFFD, visible rather
  than silently dropped. Embedded-CMap /Encoding programs beyond
  Identity-H (rare: legacy CJK without ToUnicode) are out of scope.
* Page resources: inline ``/Resources <<…>>`` or an indirect reference;
  XObject images resolve through them to media spans at their point of
  use (mirrors the HTML kernel's img spans).

Layout heuristics (the "layout parse" of the north rule):
* a show op whose baseline drops by more than 0.3×font-size starts a new
  line; a drop of more than 1.8×font-size starts a new PARAGRAPH (a new
  text span — mirrors the HTML kernel's one-span-per-block shape);
* within a line, a forward x-gap greater than 0.3×font-size inserts a
  single space (word boundary recovery from kerned TJ arrays);
* pages are processed in document order; each page's blocks in stream
  order (top-down for generated/simple PDFs).
"""

from __future__ import annotations

import functools
import hashlib
import re
import zlib

__all__ = ["pdf_to_spans", "PdfParseError"]


class PdfParseError(Exception):
    """Unparseable PDF container (not a valid header / no objects)."""


_OBJ_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b(.*?)\bendobj", re.DOTALL)
_STREAM_RE = re.compile(rb"stream\r?\n(.*?)\r?\nendstream", re.DOTALL)
_REF_RE = re.compile(rb"(\d+)\s+\d+\s+R")
_NAME_NUM = re.compile(rb"/([A-Za-z0-9_.#-]+)\s+(\d+)\s+\d+\s+R")

# paragraph / line / word-gap thresholds in font-size units (see module
# docstring); tuned on the synthetic corpus, stated once here
_LINE_DROP = 0.3
_PARA_DROP = 1.8
_WORD_GAP = 0.3


def _dict_src(body: bytes) -> bytes:
    """The object's top-level dictionary source (up to the stream)."""
    s = body.find(b"stream")
    return body[:s] if s >= 0 else body


class _Obj:
    __slots__ = ("num", "gen", "dict_src", "stream")

    def __init__(self, num: int, dict_src: bytes, stream: bytes | None,
                 gen: int = 0):
        self.num = num
        self.gen = gen
        self.dict_src = dict_src
        self.stream = stream


# the digit run is atomic-anchored ((?![0-9])) so backtracking can't
# shrink the capture to defeat the indirect-ref lookahead: on
# "/Length 10 0 R" an unanchored (\d+) would retry as "1" and match
# (ADVICE r4 — the endstream probe masked this, but only by accident)
_LENGTH_RE = re.compile(rb"/Length\s+(\d+)(?![0-9])(?!\s+\d+\s+R)")


def _scan_objects(data: bytes) -> dict[int, _Obj]:
    objs: dict[int, _Obj] = {}
    for m in _OBJ_RE.finditer(data):
        num = int(m.group(1))
        gen = int(m.group(2))
        body = m.group(3)
        dict_src = _dict_src(body)
        stream = None
        s = body.find(b"stream")
        if s >= 0:
            # stream body starts after the keyword's EOL (spec: CRLF or LF)
            p = s + 6
            if body[p : p + 2] == b"\r\n":
                p += 2
            elif body[p : p + 1] in (b"\n", b"\r"):
                p += 1
            # prefer a direct /Length slice: the regex delimiter
            # (\r?\nendstream) swallows a payload's trailing 0x0D byte,
            # corrupting ~1/256 of Flate streams — only trust the regex
            # when Length is absent or provably wrong
            lm = _LENGTH_RE.search(dict_src)
            if lm:
                ln = int(lm.group(1))
                if re.match(rb"[\r\n \t]*endstream", body[p + ln : p + ln + 16]):
                    stream = body[p : p + ln]
            if stream is None:
                sm = _STREAM_RE.search(body)
                stream = sm.group(1) if sm else None
        objs[num] = _Obj(num, dict_src, stream, gen)
    return objs


# ---------------------------------------------------------------------------
# stream filters (PDF 32000-1:2008 §7.4): the non-Flate decoders real-world
# corpora hit routinely — ASCIIHex, ASCII85, RunLength, LZW — plus the PNG
# and TIFF predictor transforms on Flate/LZW output. Each decoder raises
# ValueError on malformed input; _decoded_stream converts any failure into
# the opaque/degraded path (never crashes a batch).
# ---------------------------------------------------------------------------

_A85_WS = b" \t\r\n\x0c\x00"


def _asciihex_decode(data: bytes) -> bytes:
    """§7.4.2 ASCIIHexDecode: hex pairs, whitespace ignored, '>' is EOD,
    a dangling final digit is padded with 0."""
    e = data.find(b">")
    if e >= 0:
        data = data[:e]
    hexs = re.sub(rb"\s+", b"", data)
    if len(hexs) % 2:
        hexs += b"0"
    return bytes.fromhex(hexs.decode("ascii"))  # ValueError on junk


def _ascii85_decode(data: bytes) -> bytes:
    """§7.4.3 ASCII85Decode: base-85 groups of 5 chars → 4 bytes, 'z' for
    an all-zero group, '~>' EOD, whitespace ignored. Final partial group
    of n chars yields n-1 bytes (padded with 'u' per the spec)."""
    e = data.find(b"~>")
    if e >= 0:
        data = data[:e]
    if data.startswith(b"<~"):  # optional Adobe framing prefix
        data = data[2:]
    out = bytearray()
    group: list[int] = []
    for b in data:
        if b in _A85_WS:
            continue
        if b == 0x7A:  # 'z'
            if group:
                raise ValueError("ASCII85: z inside a group")
            out += b"\x00\x00\x00\x00"
            continue
        if not (33 <= b <= 117):
            raise ValueError("ASCII85: byte out of range")
        group.append(b - 33)
        if len(group) == 5:
            n = 0
            for g in group:
                n = n * 85 + g
            if n > 0xFFFFFFFF:
                raise ValueError("ASCII85: group overflow")
            out += n.to_bytes(4, "big")
            group = []
    if group:
        k = len(group)
        if k == 1:
            raise ValueError("ASCII85: single trailing char")
        n = 0
        for g in group + [84] * (5 - k):
            n = n * 85 + g
        if n > 0xFFFFFFFF:
            raise ValueError("ASCII85: group overflow")
        out += n.to_bytes(4, "big")[: k - 1]
    return bytes(out)


def _rle_decode(data: bytes) -> bytes:
    """§7.4.5 RunLengthDecode: length byte L ∈ 0..127 copies the next
    L+1 bytes; L ∈ 129..255 repeats the next byte 257-L times; 128 EOD."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        ln = data[i]
        if ln == 128:
            break
        if ln < 128:
            chunk = data[i + 1 : i + 2 + ln]
            if len(chunk) != ln + 1:
                raise ValueError("RLE: truncated literal run")
            out += chunk
            i += 2 + ln
        else:
            if i + 1 >= n:
                raise ValueError("RLE: truncated repeat run")
            out += data[i + 1 : i + 2] * (257 - ln)
            i += 2
    return bytes(out)


def _lzw_decode(data: bytes, early: int = 1) -> bytes:
    """§7.4.4 LZWDecode: TIFF-style LZW, MSB-first bit packing, 9→12-bit
    variable code width, 256 = clear table, 257 = EOD, first dynamic code
    258. `early` is /EarlyChange (default 1: the code width grows one
    code before the table strictly requires it). The width-change rule is
    kept in lockstep with sources/pdf_corpus._lzw_encode (round-trip
    differential-tested) and matches the spec's published 9-bit example
    vector (tests/test_pdf.py)."""
    out = bytearray()
    table: list[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    width = 9
    prev: bytes | None = None
    bitbuf = nbits = 0
    for byte in data:
        bitbuf = (bitbuf << 8) | byte
        nbits += 8
        while nbits >= width:
            code = (bitbuf >> (nbits - width)) & ((1 << width) - 1)
            nbits -= width
            if code == 256:
                table = table[:258]
                width = 9
                prev = None
                continue
            if code == 257:
                return bytes(out)
            if prev is None:
                if code > 255:
                    raise ValueError("LZW: first code after clear not a literal")
                entry = table[code]
            elif code < len(table):
                entry = table[code]
            elif code == len(table):
                entry = prev + prev[:1]  # the KwKwK case
            else:
                raise ValueError("LZW: code out of range")
            out += entry
            if prev is not None and len(table) < 4096:
                table.append(prev + entry[:1])
                if len(table) + early >= (1 << width) and width < 12:
                    width += 1
            prev = entry
    return bytes(out)  # tolerate missing EOD (seen in the wild)


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _png_unpredict(data: bytes, columns: int, colors: int, bpc: int) -> bytes:
    """PNG predictors (§7.4.4.4, /Predictor ≥ 10): every row carries a
    filter-type byte (0 None, 1 Sub, 2 Up, 3 Average, 4 Paeth) followed
    by the filtered row; undo per the PNG spec."""
    rowbytes = (columns * colors * bpc + 7) // 8
    bpp = max(1, (colors * bpc + 7) // 8)
    if rowbytes <= 0 or len(data) % (rowbytes + 1):
        raise ValueError("PNG predictor: bad row geometry")
    out = bytearray()
    prior = bytearray(rowbytes)
    for r in range(0, len(data), rowbytes + 1):
        ft = data[r]
        row = bytearray(data[r + 1 : r + 1 + rowbytes])
        if ft == 1:
            for i in range(bpp, rowbytes):
                row[i] = (row[i] + row[i - bpp]) & 0xFF
        elif ft == 2:
            for i in range(rowbytes):
                row[i] = (row[i] + prior[i]) & 0xFF
        elif ft == 3:
            for i in range(rowbytes):
                left = row[i - bpp] if i >= bpp else 0
                row[i] = (row[i] + (left + prior[i]) // 2) & 0xFF
        elif ft == 4:
            for i in range(rowbytes):
                left = row[i - bpp] if i >= bpp else 0
                ul = prior[i - bpp] if i >= bpp else 0
                row[i] = (row[i] + _paeth(left, prior[i], ul)) & 0xFF
        elif ft != 0:
            raise ValueError(f"PNG predictor: unknown filter type {ft}")
        out += row
        prior = row
    return bytes(out)


def _tiff_unpredict(data: bytes, columns: int, colors: int, bpc: int) -> bytes:
    """TIFF predictor 2 (horizontal differencing), 8-bit components only
    — other depths are rare enough to stay opaque (documented scope)."""
    if bpc != 8:
        raise ValueError("TIFF predictor: only 8-bit components supported")
    rowbytes = columns * colors
    if rowbytes <= 0 or len(data) % rowbytes:
        raise ValueError("TIFF predictor: bad row geometry")
    out = bytearray(data)
    for r in range(0, len(out), rowbytes):
        for i in range(colors, rowbytes):
            out[r + i] = (out[r + i] + out[r + i - colors]) & 0xFF
    return bytes(out)


_FILTER_SPEC_RE = re.compile(rb"/Filter\s*(\[[^\]]*\]|/[A-Za-z0-9]+)")
_PARMS_SPEC_RE = re.compile(
    rb"/(?:DecodeParms|DP)\s*(\[.*?\]|<<.*?>>|null)", re.DOTALL
)
_NAME_TOK_RE = re.compile(rb"/([A-Za-z0-9]+)")
_PARM_ITEM_RE = re.compile(rb"null|<<.*?>>", re.DOTALL)
_INT_PARM = {
    key: re.compile(rb"/" + key + rb"\s+(-?\d+)")
    for key in (b"Predictor", b"Columns", b"Colors", b"BitsPerComponent",
                b"EarlyChange")
}


def _parm_int(parms: bytes, key: bytes, default: int) -> int:
    m = _INT_PARM[key].search(parms)
    return int(m.group(1)) if m else default


def _stream_filters(dict_src: bytes) -> list[tuple[bytes, bytes]] | None:
    """The stream's filter chain as [(name, parms_src)] in application
    order; [] if unfiltered; None if /Filter is present but unparseable.
    Accepts both the single-name and array forms, pairing /DecodeParms
    positionally per the spec."""
    fm = _FILTER_SPEC_RE.search(dict_src)
    if not fm:
        return [] if b"/Filter" not in dict_src else None
    spec = fm.group(1)
    names = _NAME_TOK_RE.findall(spec)
    if not names:
        return None
    pm = _PARMS_SPEC_RE.search(dict_src)
    parms: list[bytes] = []
    if pm:
        pspec = pm.group(1)
        if pspec.startswith(b"["):
            parms = [b"" if p == b"null" else p
                     for p in _PARM_ITEM_RE.findall(pspec)]
        elif pspec != b"null":
            parms = [pspec]
    return [(n, parms[i] if i < len(parms) else b"")
            for i, n in enumerate(names)]


#: filter name → decoder; abbreviated names are inline-image aliases the
#: spec defines (§8.9.7) — harmless to accept on streams too
_FILTER_DECODERS = {
    b"ASCIIHexDecode": _asciihex_decode, b"AHx": _asciihex_decode,
    b"ASCII85Decode": _ascii85_decode, b"A85": _ascii85_decode,
    b"RunLengthDecode": _rle_decode, b"RL": _rle_decode,
}


def _apply_predictor(data: bytes, parms: bytes) -> bytes:
    pred = _parm_int(parms, b"Predictor", 1)
    if pred <= 1:
        return data
    columns = _parm_int(parms, b"Columns", 1)
    colors = _parm_int(parms, b"Colors", 1)
    bpc = _parm_int(parms, b"BitsPerComponent", 8)
    if pred == 2:
        return _tiff_unpredict(data, columns, colors, bpc)
    if 10 <= pred <= 15:
        return _png_unpredict(data, columns, colors, bpc)
    raise ValueError(f"unknown predictor {pred}")


def _decoded_stream(obj: _Obj) -> bytes | None:
    """Run the stream through its full filter chain. Returns None (the
    opaque/degraded path) for image codecs (DCT/JPX/CCITT/JBIG2),
    unparseable filter specs, or any decode failure — a corrupt stream
    costs a degraded page, never the batch."""
    if obj.stream is None:
        return None
    chain = _stream_filters(obj.dict_src)
    if chain is None:
        return None
    data = obj.stream
    try:
        for name, parms in chain:
            if name in (b"FlateDecode", b"Fl"):
                data = _apply_predictor(zlib.decompress(data), parms)
            elif name in (b"LZWDecode", b"LZW"):
                data = _apply_predictor(
                    _lzw_decode(data, early=_parm_int(parms, b"EarlyChange", 1)),
                    parms,
                )
            elif name in _FILTER_DECODERS:
                data = _FILTER_DECODERS[name](data)
            elif name == b"Crypt":
                return None  # encryption: out of scope
            else:
                return None  # image codecs etc.: opaque media
    except Exception:
        return None  # malformed stream: degraded, never a crash
    return data


def _balanced_dict(src: bytes) -> bytes:
    """src starting at '<<' → the balanced << … >> slice (or all of src
    if unbalanced — tolerant of truncated dicts)."""
    depth = 0
    for i in range(0, len(src) - 1):
        if src[i : i + 2] == b"<<":
            depth += 1
        elif src[i : i + 2] == b">>":
            depth -= 1
            if depth == 0:
                return src[: i + 2]
    return src


def _int_key(src: bytes, key: bytes, default: int = 0) -> int:
    """Direct integer value of /key in a dict source (not indirect)."""
    m = re.search(rb"/" + key + rb"\s+(-?\d+)(?![0-9])(?!\s+\d+\s+R)", src)
    return int(m.group(1)) if m else default


def _resolve(objs: dict[int, _Obj], src: bytes, key: bytes) -> bytes:
    """Value source for /key in a dict source; follows ONE indirect ref
    level (enough for /Resources N 0 R — documented scope)."""
    m = re.search(rb"/" + key + rb"\b\s*(.*)", src, re.DOTALL)
    if not m:
        return b""
    rest = m.group(1)
    rm = re.match(rb"(\d+)\s+\d+\s+R", rest)
    if rm:
        ref = objs.get(int(rm.group(1)))
        return ref.dict_src if ref else b""
    if rest.startswith(b"<<"):
        return _balanced_dict(rest)
    return rest.split(b"/", 1)[0]


# ---------------------------------------------------------------------------
# PDF 1.5+ compressed cross-references (§7.5.7 object streams, §7.5.8
# cross-reference streams). The linear object scan discovers only
# top-level `N 0 obj … endobj` bodies; post-2005 producers store most
# dictionary objects (page tree, fonts, ToUnicode refs) INSIDE
# Flate-compressed /Type /ObjStm streams, addressed by /Type /XRef
# streams whose binary rows are W-field-packed (and usually
# PNG-predicted — the §7.4 predictor support above applies). Exploding
# every ObjStm into the object map restores those documents; decoding
# the xref rows tells us which object numbers the file's LATEST revision
# says live compressed (type-2 entries), so a stale top-level copy from
# an incremental update loses to the ObjStm version.
# ---------------------------------------------------------------------------

_W_RE = re.compile(rb"/W\s*\[\s*(\d+)\s+(\d+)\s+(\d+)")
_INDEX_RE = re.compile(rb"/Index\s*\[([^\]]*)\]")
_TYPE_XREF_RE = re.compile(rb"/Type\s*/XRef\b")
_TYPE_OBJSTM_RE = re.compile(rb"/Type\s*/ObjStm\b")

# defensive caps: crafted /Size or /N values must not allocate unbounded
# memory in a worker
_XREF_MAX_ENTRIES = 1 << 20
_OBJSTM_MAX_OBJS = 8192


def _xref_stream_entries(obj: _Obj) -> dict[int, tuple[int, int, int]]:
    """Decode a /Type /XRef stream → {objnum: (type, field2, field3)}.
    Type 1 = offset entry, type 2 = (objstm number, index-in-stream);
    /W gives the byte width of each field (width-0 type defaults to 1),
    /Index the (start, count) subsection pairs (default [0 /Size])."""
    data = _decoded_stream(obj)
    if not data:
        return {}
    wm = _W_RE.search(obj.dict_src)
    if not wm:
        return {}
    w0, w1, w2 = (int(wm.group(k)) for k in (1, 2, 3))
    rowlen = w0 + w1 + w2
    if rowlen <= 0 or rowlen > 32:
        return {}
    im = _INDEX_RE.search(obj.dict_src)
    if im:
        nums = [int(x) for x in re.findall(rb"\d+", im.group(1))]
        index = list(zip(nums[0::2], nums[1::2]))
    else:
        index = [(0, _int_key(obj.dict_src, b"Size", 0))]
    entries: dict[int, tuple[int, int, int]] = {}
    pos = 0
    for start, count in index:
        for k in range(min(count, _XREF_MAX_ENTRIES)):
            row = data[pos : pos + rowlen]
            if len(row) < rowlen:
                return entries  # truncated stream: keep what decoded
            pos += rowlen
            f0 = int.from_bytes(row[:w0], "big") if w0 else 1
            f1 = int.from_bytes(row[w0 : w0 + w1], "big")
            f2 = int.from_bytes(row[w0 + w1 :], "big")
            entries[start + k] = (f0, f1, f2)
            if len(entries) >= _XREF_MAX_ENTRIES:
                return entries
    return entries


def _expand_object_streams(objs: dict[int, _Obj]) -> None:
    """Explode every /Type /ObjStm into the object map (§7.5.7): the
    stream starts with /N (objnum, offset) integer pairs; object bodies
    begin at /First. Compressed objects are always generation 0 and
    carry no streams of their own, so dict_src is the whole slice. A
    number already discovered top-level wins (repair posture) UNLESS an
    xref stream's type-2 entry says the compressed copy is the current
    one (incremental-update semantics)."""
    prefer: set[int] = set()
    for o in objs.values():
        if _TYPE_XREF_RE.search(o.dict_src):
            for num, (t, _f2, _f3) in _xref_stream_entries(o).items():
                if t == 2:
                    prefer.add(num)
    stms = sorted(
        (o for o in objs.values() if _TYPE_OBJSTM_RE.search(o.dict_src)),
        key=lambda o: o.num,  # deterministic across dict orderings
    )
    for o in stms:
        data = _decoded_stream(o)
        if not data:
            continue
        n = min(_int_key(o.dict_src, b"N", 0), _OBJSTM_MAX_OBJS)
        first = _int_key(o.dict_src, b"First", 0)
        if n <= 0 or not (0 < first <= len(data)):
            continue
        pairs = re.findall(rb"(\d+)\s+(\d+)", data[:first])[:n]
        offs = [(int(a), int(b)) for a, b in pairs]
        body_len = len(data) - first
        for k, (num, off) in enumerate(offs):
            if num == o.num or not (0 <= off <= body_len):
                continue  # self-reference / out-of-range guard
            end = offs[k + 1][1] if k + 1 < len(offs) else body_len
            end = max(off, min(end, body_len))
            if num not in objs or num in prefer:
                objs[num] = _Obj(num, data[first + off : first + end], None)


# ---------------------------------------------------------------------------
# standard security handler (§7.6.3): a large share of "encrypted" PDFs
# in the wild are permissions-only — standard handler, EMPTY user
# password. Those are fully recoverable: derive the file key (Algorithm
# 2), verify /U against the empty password (Algorithm 4 for R=2,
# Algorithm 5 for R=3) and RC4 every stream with the per-object key
# (Algorithm 1). Anything else — a real user password, V≥4 AES — stays
# a PERMANENT PdfParseError exactly as before.
# ---------------------------------------------------------------------------

#: the spec's 32-byte password padding string (§7.6.3.3 Table 21 note)
_PAD = bytes((
    0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
    0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
    0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
    0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A,
))


def _rc4(key: bytes, data: bytes) -> bytes:
    """Plain RC4 (KSA + PRGA). Pure-Python is fine at corpus scale; at
    cluster scale each worker decrypts its own Arrow batch of docs."""
    s = list(range(256))
    j = 0
    for i in range(256):
        j = (j + s[i] + key[i % len(key)]) & 0xFF
        s[i], s[j] = s[j], s[i]
    out = bytearray()
    i = j = 0
    for b in data:
        i = (i + 1) & 0xFF
        j = (j + s[i]) & 0xFF
        s[i], s[j] = s[j], s[i]
        out.append(b ^ s[(s[i] + s[j]) & 0xFF])
    return bytes(out)


def _dict_pdf_string(src: bytes, key: bytes) -> bytes:
    """The /key string value of a dict source — literal ( ) form with
    escapes, or hex <…> form (how /O and /U are usually written)."""
    m = re.search(rb"/" + key + rb"\s*([(<])", src)
    if not m:
        return b""
    if m.group(1) == b"(":
        s, _ = _read_string(src, m.end() - 1)
        return s
    j = src.find(b">", m.end())
    h = re.sub(rb"\s", b"", src[m.end() : j if j >= 0 else len(src)])
    if len(h) % 2:
        h += b"0"
    try:
        return bytes.fromhex(h.decode("ascii"))
    except ValueError:
        return b""


_TRAILER_KW_RE = re.compile(rb"trailer\b")
_ENCRYPT_REF_RE = re.compile(rb"/Encrypt\s+(\d+)\s+\d+\s+R")
_ID_FIRST_RE = re.compile(rb"/ID\s*\[\s*<([0-9A-Fa-f]*)>")
_ROOT_REF_RE = re.compile(rb"/Root\s+(\d+)\s+\d+\s+R")


def _trailer_sources(data: bytes, objs: dict[int, _Obj]) -> list[bytes]:
    """Every trailer-dict source in file order: classic `trailer <<…>>`
    dicts AND /Type /XRef stream dicts (which carry the trailer fields
    in 1.5+ files — the r5 tail-scan heuristic missed an /Encrypt that
    sat in an early xref stream dict)."""
    out: list[bytes] = []
    for m in _TRAILER_KW_RE.finditer(data):
        j = data.find(b"<<", m.end())
        if 0 <= j - m.end() <= 64:
            out.append(_balanced_dict(data[j : j + 8192]))
    for num in sorted(objs):
        if _TYPE_XREF_RE.search(objs[num].dict_src):
            out.append(objs[num].dict_src)
    return out


def _trailer_info(
    data: bytes, objs: dict[int, _Obj]
) -> tuple[bytes | None, bytes, int | None]:
    """(resolved /Encrypt dict source | None, first /ID element bytes,
    /Root object number | None) across all trailer sources; the last
    occurrence wins (incremental updates append)."""
    enc_src: bytes | None = None
    fid = b""
    root: int | None = None
    for t in _trailer_sources(data, objs):
        em = _ENCRYPT_REF_RE.search(t)
        if em:
            o = objs.get(int(em.group(1)))
            enc_src = o.dict_src if o else b""
        im = _ID_FIRST_RE.search(t)
        if im:
            try:
                fid = bytes.fromhex(im.group(1).decode("ascii"))
            except ValueError:
                pass
        rm = _ROOT_REF_RE.search(t)
        if rm:
            root = int(rm.group(1))
    if enc_src is None and _ENCRYPT_REF_RE.search(data[-2048:]):
        enc_src = b""  # damaged trailer: still refuse to emit mojibake
    return enc_src, fid, root


@functools.lru_cache(maxsize=256)
def _hash_2b(pwd: bytes, salt: bytes, udata: bytes = b"") -> bytes:
    """ISO 32000-2 Algorithm 2.B hardened hash (R=6): SHA-256 seed, then
    ≥64 rounds of AES-128-CBC-encrypt + modular hash choice; exits when
    round ≥ 64 and the last ciphertext byte ≤ round−32 (the
    interoperable reading: round counts COMPLETED iterations)."""
    from .cryptokit import aes_cbc_encrypt

    k = hashlib.sha256(pwd + salt + udata).digest()
    i = 0
    while True:
        k1 = (pwd + k + udata) * 64
        e = aes_cbc_encrypt(k[:16], k[16:32], k1)
        k = (hashlib.sha256, hashlib.sha384, hashlib.sha512)[
            sum(e[:16]) % 3
        ](e).digest()
        i += 1
        if i >= 64 and e[-1] <= i - 32:
            return k[:32]


def _build_decryptor_v5(enc_src: bytes, r: int):
    """AES-256 (/AESV3) decryptor for the EMPTY user password: R=5's
    plain SHA-256 or R=6's Algorithm 2.B validates against /U[0:32];
    the file key is AES-256-CBC(/UE) under the intermediate key
    (§7.6.4.3.3/4). Per-object: the FILE key directly, IV = first 16
    stream bytes, PKCS#7-unpadded."""
    from .cryptokit import aes_cbc_decrypt, strip_pkcs7

    u = _dict_pdf_string(enc_src, b"U")
    ue = _dict_pdf_string(enc_src, b"UE")
    if len(u) < 48 or len(ue) < 32:
        raise PdfParseError(
            "encrypted document (malformed V5 /U or /UE)"
        )
    vsalt, ksalt = u[32:40], u[40:48]
    if r == 6:
        valid = _hash_2b(b"", vsalt) == u[:32]
        ikey = _hash_2b(b"", ksalt)
    else:
        valid = hashlib.sha256(vsalt).digest() == u[:32]
        ikey = hashlib.sha256(ksalt).digest()
    if not valid:
        raise PdfParseError("encrypted document (user password required)")
    filekey = aes_cbc_decrypt(ikey, b"\x00" * 16, ue[:32])

    def decrypt(num: int, gen: int, data: bytes, _key=filekey) -> bytes:
        if len(data) < 16:
            return b""
        return strip_pkcs7(aes_cbc_decrypt(_key, data[:16], data[16:]))

    return decrypt


_CFM_RE = re.compile(rb"/CFM\s*/([A-Za-z0-9]+)")
_STMF_RE = re.compile(rb"/StmF\s*/([A-Za-z0-9]+)")


def _build_decryptor(enc_src: bytes, file_id: bytes):
    """(num, gen, bytes) → bytes stream decryptor for the standard
    security handler with the EMPTY user password, or PdfParseError
    (permanent) for everything this scope excludes: a missing/garbled
    /Encrypt dict, a non-Standard handler, or a /U that the
    empty-password key fails to reproduce (a real user password).
    Supported modes: V1/V2 RC4 (R2/R3), V4 crypt filters /V2 (RC4) and
    /AESV2 (AES-128-CBC, R4), V5 /AESV3 (AES-256-CBC, R5/R6)."""
    if not enc_src:
        raise PdfParseError("encrypted document (no decryption support)")
    if not re.search(rb"/Filter\s*/Standard\b", enc_src):
        raise PdfParseError(
            "encrypted document (non-standard security handler)"
        )
    v = _int_key(enc_src, b"V", 0)
    r = _int_key(enc_src, b"R", 2)
    length = _int_key(enc_src, b"Length", 40)
    o = _dict_pdf_string(enc_src, b"O")
    u = _dict_pdf_string(enc_src, b"U")
    p = _int_key(enc_src, b"P", -1)
    if v == 5 and r in (5, 6):
        return _build_decryptor_v5(enc_src, r)
    cfm = b"V2"  # V1/V2: plain RC4 (no crypt filters)
    if v == 4:
        if r != 4:
            raise PdfParseError(
                f"encrypted document (unsupported handler V={v} R={r})"
            )
        sm = _STMF_RE.search(enc_src)
        stmf = sm.group(1) if sm else b"Identity"  # spec default
        if stmf == b"Identity":
            return lambda num, gen, data: data  # streams not encrypted
        cm = _CFM_RE.search(enc_src)
        cfm = cm.group(1) if cm else b""
        if cfm not in (b"V2", b"AESV2"):
            raise PdfParseError(
                "encrypted document (unsupported crypt filter "
                + cfm.decode("ascii", "replace") + ")"
            )
    elif v not in (1, 2) or r not in (2, 3):
        raise PdfParseError(
            f"encrypted document (unsupported handler V={v} R={r})"
        )
    if len(o) < 32 or len(u) < 32:
        raise PdfParseError(
            f"encrypted document (unsupported handler V={v} R={r})"
        )
    n = 5 if v == 1 else max(5, min(16, length // 8))
    # Algorithm 2: file key from the (empty → pad string) user password
    seed = _PAD + o[:32] + (p & 0xFFFFFFFF).to_bytes(4, "little") + file_id
    if v == 4 and re.search(rb"/EncryptMetadata\s+false\b", enc_src):
        seed += b"\xff\xff\xff\xff"
    md = hashlib.md5(seed).digest()
    if r >= 3:
        for _ in range(50):
            md = hashlib.md5(md[:n]).digest()
    key = md[:n]
    # Algorithm 4 (R=2) / 5 (R≥3): reproduce /U; mismatch ⇒ real password
    if r == 2:
        ok = _rc4(key, _PAD) == u[:32]
    else:
        ucalc = _rc4(key, hashlib.md5(_PAD + file_id).digest())
        for i in range(1, 20):
            ucalc = _rc4(bytes(b ^ i for b in key), ucalc)
        ok = ucalc == u[:16]
    if not ok:
        raise PdfParseError("encrypted document (user password required)")

    if cfm == b"AESV2":
        from .cryptokit import aes_cbc_decrypt, strip_pkcs7

        def decrypt_aes(num: int, gen: int, data: bytes,
                        _key=key, _n=n) -> bytes:
            # §7.6.2: per-object key = MD5(key + num3 + gen2 + "sAlT"),
            # AES-128-CBC with the stream's first 16 bytes as IV
            objkey = hashlib.md5(
                _key
                + (num & 0xFFFFFF).to_bytes(3, "little")
                + (gen & 0xFFFF).to_bytes(2, "little")
                + b"sAlT"
            ).digest()[: min(_n + 5, 16)]
            if len(data) < 16:
                return b""
            return strip_pkcs7(
                aes_cbc_decrypt(objkey, data[:16], data[16:])
            )

        return decrypt_aes

    def decrypt(num: int, gen: int, data: bytes,
                _key=key, _n=n) -> bytes:
        # Algorithm 1: per-object key = MD5(key + objnum[3 LE] + gen[2 LE])
        objkey = hashlib.md5(
            _key
            + (num & 0xFFFFFF).to_bytes(3, "little")
            + (gen & 0xFFFF).to_bytes(2, "little")
        ).digest()[: min(_n + 5, 16)]
        return _rc4(objkey, data)

    return decrypt


def _decrypt_streams(objs: dict[int, _Obj], decrypt) -> None:
    """RC4 every stream in place with its per-object key — EXCEPT xref
    streams, which the spec never encrypts (§7.5.8.2). Document-level
    strings stay enciphered: the parser never consumes them semantically
    (spans come from content streams, which are decrypted wholesale)."""
    for o in objs.values():
        if o.stream is not None and not _TYPE_XREF_RE.search(o.dict_src):
            o.stream = decrypt(o.num, o.gen, o.stream)


_CATALOG_PAGES_RE = re.compile(rb"/Pages\s+(\d+)\s+\d+\s+R")
_KIDS_RE = re.compile(rb"/Kids\s*\[(.*?)\]", re.DOTALL)


def _page_objects(objs: dict[int, _Obj],
                  root_num: int | None = None) -> list[_Obj]:
    """Document-order pages. The authoritative order is the catalog's
    page tree (/Pages → /Kids arrays, depth-first — §7.7.3.2), starting
    from the trailer's /Root when one resolved (multi-revision files can
    hold several catalogs); object-number order is the fallback for
    damaged files with no walkable tree (the same repair posture as the
    xref-less object scan). Pages a broken tree missed are appended in
    number order so content is never silently dropped."""
    pages_by_num = {
        o.num: o for o in objs.values()
        if re.search(rb"/Type\s*/Page\b", o.dict_src)
    }
    root = None
    cand = objs.get(root_num) if root_num is not None else None
    if cand is not None:
        m = _CATALOG_PAGES_RE.search(cand.dict_src)
        root = objs.get(int(m.group(1))) if m else None
    if root is None:
        for o in objs.values():
            if re.search(rb"/Type\s*/Catalog\b", o.dict_src):
                m = _CATALOG_PAGES_RE.search(o.dict_src)
                root = objs.get(int(m.group(1))) if m else None
                break
    ordered: list[_Obj] = []
    seen: set[int] = set()

    def walk(node: _Obj | None, depth: int) -> None:
        if node is None or depth > 64 or node.num in seen:
            return  # cycle / crafted-depth guard
        seen.add(node.num)
        if node.num in pages_by_num:
            ordered.append(node)
            return
        m = _KIDS_RE.search(node.dict_src)
        if not m:
            return
        for rm in _REF_RE.finditer(m.group(1)):
            walk(objs.get(int(rm.group(1))), depth + 1)

    walk(root, 0)
    if not ordered:
        return [pages_by_num[n] for n in sorted(pages_by_num)]
    missed = sorted(set(pages_by_num) - {p.num for p in ordered})
    return ordered + [pages_by_num[n] for n in missed]


_PARENT_REF_RE = re.compile(rb"/Parent\s+(\d+)\s+\d+\s+R")


def _inherited_attr(objs: dict[int, _Obj], node: _Obj, key: bytes) -> bytes:
    """Resolve /key on a page, falling back up the /Parent chain — the
    spec's inheritable page attributes (§7.7.3.4): a page with no
    /Resources of its own uses its /Pages ancestor's. Cycle/depth
    guarded like the page-tree walk."""
    seen: set[int] = set()
    cur: _Obj | None = node
    for _ in range(64):
        if cur is None or cur.num in seen:
            return b""
        seen.add(cur.num)
        val = _resolve(objs, cur.dict_src, key)
        if val:
            return val
        pm = _PARENT_REF_RE.search(cur.dict_src)
        cur = objs.get(int(pm.group(1))) if pm else None
    return b""


def _page_xobjects(objs: dict[int, _Obj], page: _Obj) -> dict[bytes, int]:
    """name → object number of the page's XObject images."""
    res = _inherited_attr(objs, page, b"Resources")
    xsrc = _resolve(objs, res, b"XObject") if res else b""
    out: dict[bytes, int] = {}
    for m in _NAME_NUM.finditer(xsrc):
        out[m.group(1)] = int(m.group(2))
    return out


_TOUNICODE_RE = re.compile(rb"/ToUnicode\s+(\d+)\s+\d+\s+R")
_BFCHAR_RE = re.compile(rb"beginbfchar(.*?)endbfchar", re.DOTALL)
_BFRANGE_RE = re.compile(rb"beginbfrange(.*?)endbfrange", re.DOTALL)
_BFPAIR_RE = re.compile(rb"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>")
_BFRANGE_ROW_RE = re.compile(
    rb"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>\s*(\[[^\]]*\]|<[0-9A-Fa-f]+>)"
)
_HEXGRP_RE = re.compile(rb"<([0-9A-Fa-f]+)>")

# defensive cap on CMap mappings per font: a crafted bfrange like
# <0000> <FFFFFFFF> must not allocate unbounded memory in a worker
_CMAP_MAX_ENTRIES = 65536


def _utf16_hex(h: bytes) -> str:
    """<dst> hex group of a bf mapping → Unicode string (UTF-16BE code
    units per the spec; tolerant of odd-length groups)."""
    if len(h) % 2:
        h += b"0"
    try:
        return bytes.fromhex(h.decode("ascii")).decode("utf-16-be", "replace")
    except ValueError:
        return "�"


def _parse_cmap(data: bytes) -> dict[int, str]:
    """ToUnicode CMap stream → {CID: unicode}. Handles bfchar pairs and
    bfrange rows in both forms (<lo> <hi> <dstBase> with the final
    UTF-16 code unit incremented per the spec §9.10.3, and
    <lo> <hi> [<d0> <d1> …] explicit arrays)."""
    cmap: dict[int, str] = {}
    for sec in _BFCHAR_RE.findall(data):
        for src, dst in _BFPAIR_RE.findall(sec):
            if len(cmap) >= _CMAP_MAX_ENTRIES:
                return cmap
            cmap[int(src, 16)] = _utf16_hex(dst)
    for sec in _BFRANGE_RE.findall(data):
        for m in _BFRANGE_ROW_RE.finditer(sec):
            lo, hi = int(m.group(1), 16), int(m.group(2), 16)
            hi = min(hi, lo + _CMAP_MAX_ENTRIES)  # bound crafted ranges
            dst = m.group(3)
            if dst.startswith(b"["):
                for k, d in enumerate(_HEXGRP_RE.findall(dst)):
                    if lo + k > hi or len(cmap) >= _CMAP_MAX_ENTRIES:
                        break
                    cmap[lo + k] = _utf16_hex(d)
            else:
                base = bytearray()
                h = dst[1:-1]
                if len(h) % 2:
                    h += b"0"
                try:
                    base = bytearray(bytes.fromhex(h.decode("ascii")))
                except ValueError:
                    continue
                if len(base) < 2:
                    base = bytearray(b"\x00") + base
                for k in range(hi - lo + 1):
                    if len(cmap) >= _CMAP_MAX_ENTRIES:
                        return cmap
                    u = bytearray(base)
                    last = (u[-2] << 8 | u[-1]) + k
                    u[-2], u[-1] = (last >> 8) & 0xFF, last & 0xFF
                    cmap[lo + k] = bytes(u).decode("utf-16-be", "replace")
    return cmap


# ---------------------------------------------------------------------------
# simple-font /Encoding /Differences (§9.6.6.3): custom-encoded fonts
# remap byte codes to named glyphs. The names resolve through a compact
# Adobe-Glyph-List subset (ASCII + Latin-1 accents + the typographic
# names real documents actually use) plus the algorithmic uniXXXX /
# uXXXX[XX] forms. A /Differences name outside the table decodes to
# U+FFFD — visible, not silently mojibake (same posture as unmapped
# CIDs); codes NOT remapped fall back to the base single-byte path.
# ---------------------------------------------------------------------------

_GLYPH_NAMES: dict[str, str] = {}
for _names, _chars in (
    ("space exclam quotedbl numbersign dollar percent ampersand "
     "quotesingle parenleft parenright asterisk plus comma hyphen "
     "period slash", " !\"#$%&'()*+,-./"),
    ("zero one two three four five six seven eight nine colon semicolon "
     "less equal greater question at", "0123456789:;<=>?@"),
    ("bracketleft backslash bracketright asciicircum underscore grave",
     "[\\]^_`"),
    ("braceleft bar braceright asciitilde", "{|}~"),
    ("exclamdown cent sterling currency yen brokenbar section dieresis "
     "copyright ordfeminine guillemotleft logicalnot registered macron "
     "degree plusminus acute mu paragraph periodcentered cedilla "
     "ordmasculine guillemotright onequarter onehalf threequarters "
     "questiondown", "¡¢£¤¥¦§¨©ª«¬®¯°±´µ¶·¸º»¼½¾¿"),
    ("Agrave Aacute Acircumflex Atilde Adieresis Aring AE Ccedilla "
     "Egrave Eacute Ecircumflex Edieresis Igrave Iacute Icircumflex "
     "Idieresis Eth Ntilde Ograve Oacute Ocircumflex Otilde Odieresis "
     "multiply Oslash Ugrave Uacute Ucircumflex Udieresis Yacute Thorn "
     "germandbls", "ÀÁÂÃÄÅÆÇÈÉÊËÌÍÎÏÐÑÒÓÔÕÖ×ØÙÚÛÜÝÞß"),
    ("agrave aacute acircumflex atilde adieresis aring ae ccedilla "
     "egrave eacute ecircumflex edieresis igrave iacute icircumflex "
     "idieresis eth ntilde ograve oacute ocircumflex otilde odieresis "
     "divide oslash ugrave uacute ucircumflex udieresis yacute thorn "
     "ydieresis", "àáâãäåæçèéêëìíîïðñòóôõö÷øùúûüýþÿ"),
    ("endash emdash quoteleft quoteright quotesinglbase quotedblleft "
     "quotedblright quotedblbase dagger daggerdbl bullet ellipsis "
     "perthousand guilsinglleft guilsinglright fraction Euro trademark "
     "minus fi fl florin circumflex tilde breve dotaccent ring "
     "hungarumlaut ogonek caron Lslash lslash OE oe Scaron scaron "
     "Zcaron zcaron Ydieresis dotlessi",
     "–—‘’‚“”„†‡•…‰‹›⁄€™−ﬁﬂƒˆ˜˘˙˚˝˛ˇŁłŒœŠšŽžŸı"),
):
    for _nm, _ch in zip(_names.split(), _chars):
        _GLYPH_NAMES[_nm] = _ch
del _names, _chars, _nm, _ch

_UNI_NAME_RE = re.compile(r"uni([0-9A-Fa-f]{4})\Z")
_U_NAME_RE = re.compile(r"u([0-9A-Fa-f]{4,6})\Z")


def _glyph_char(name: bytes) -> str | None:
    try:
        nm = name.decode("ascii")
    except UnicodeDecodeError:
        return None
    if len(nm) == 1:  # AGL: single-letter names ARE the character
        return nm
    hit = _GLYPH_NAMES.get(nm)
    if hit is not None:
        return hit
    m = _UNI_NAME_RE.match(nm)
    if m:
        return chr(int(m.group(1), 16))
    m = _U_NAME_RE.match(nm)
    if m:
        cp = int(m.group(1), 16)
        if cp <= 0x10FFFF and not 0xD800 <= cp <= 0xDFFF:
            return chr(cp)
    return None


_DIFFERENCES_RE = re.compile(rb"/Differences\s*\[([^\]]*)\]")
_DIFF_TOK_RE = re.compile(rb"(\d+)|/([^\s/\[\]<>()]+)")


def _simple_font_decoder(objs: dict[int, _Obj], fobj: _Obj):
    """Single-byte decoder for a simple font: /Encoding /Differences
    remaps win, everything else falls back to the latin-1-superset base
    path. Returns _decode_text unchanged when there are no Differences
    (the overwhelmingly common case — zero overhead)."""
    enc = _resolve(objs, fobj.dict_src, b"Encoding")
    dm = _DIFFERENCES_RE.search(enc) if enc else None
    if not dm:
        return _decode_text
    table: dict[int, str] = {}
    code = 0
    for tok in _DIFF_TOK_RE.finditer(dm.group(1)):
        if tok.group(1) is not None:
            code = int(tok.group(1))
        else:
            if 0 <= code <= 255:
                ch = _glyph_char(tok.group(2))
                table[code] = ch if ch is not None else "�"
            code += 1
    if not table:
        return _decode_text

    def decode(raw: bytes, _t=table) -> str:
        return "".join(_t.get(b) or chr(b) for b in raw)

    return decode


def _font_decoder(objs: dict[int, _Obj], fobj: _Obj):
    """bytes → str decoder for one font object. Composite (Type0) fonts
    decode 2-byte Identity CIDs through the embedded ToUnicode CMap —
    the dominant encoding in real-world PDF corpora; CIDs without a
    mapping become U+FFFD (visible, not silently dropped). Simple fonts
    use the standard single-byte path, with /Encoding /Differences
    remaps honored (_simple_font_decoder)."""
    if not re.search(rb"/Subtype\s*/Type0\b", fobj.dict_src):
        return _simple_font_decoder(objs, fobj)
    cmap: dict[int, str] = {}
    tm = _TOUNICODE_RE.search(fobj.dict_src)
    if tm:
        cstream = objs.get(int(tm.group(1)))
        data = _decoded_stream(cstream) if cstream is not None else None
        if data:
            cmap = _parse_cmap(data)

    def decode(raw: bytes, _cmap=cmap) -> str:
        out = []
        n = len(raw)
        for j in range(0, n - 1, 2):
            out.append(_cmap.get(raw[j] << 8 | raw[j + 1], "�"))
        if n % 2:
            out.append("�")  # dangling odd byte of a CID string
        return "".join(out)

    return decode


def _page_fonts(objs: dict[int, _Obj], page: _Obj) -> dict[bytes, object]:
    """name → decoder for the page's /Font resources (inherited from the
    /Pages ancestor chain when the page carries none of its own)."""
    res = _inherited_attr(objs, page, b"Resources")
    fsrc = _resolve(objs, res, b"Font") if res else b""
    out: dict[bytes, object] = {}
    for m in _NAME_NUM.finditer(fsrc):
        fobj = objs.get(int(m.group(2)))
        if fobj is not None:
            out[m.group(1)] = _font_decoder(objs, fobj)
    return out


def _page_content(objs: dict[int, _Obj], page: _Obj) -> tuple[bytes, int]:
    """(content bytes, n undecodable content streams). The count feeds
    the per-page degradation diagnostics: a stream that EXISTS but can't
    decode (corrupt deflate, unsupported filter) is data loss the error
    taxonomy must surface, distinct from a page with no content."""
    m = re.search(rb"/Contents\b\s*(.*)", page.dict_src, re.DOTALL)
    if not m:
        return b"", 0
    rest = m.group(1)
    parts: list[bytes] = []
    failed = 0
    am = re.match(rb"\[(.*?)\]", rest, re.DOTALL)
    refs = _REF_RE.finditer(am.group(1)) if am else _REF_RE.finditer(rest)
    for rm in refs:
        o = objs.get(int(rm.group(1)))
        if o is not None:
            dec = _decoded_stream(o)
            if dec:
                parts.append(dec)
            elif o.stream is not None:
                failed += 1
        if not am:
            break  # single ref
    return b"\n".join(parts), failed


# ---------------------------------------------------------------------------
# content-stream tokenizer
# ---------------------------------------------------------------------------

_PDF_ESCAPES = {
    b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\x08", b"f": b"\x0c",
    b"(": b"(", b")": b")", b"\\": b"\\",
}


def _read_string(data: bytes, i: int) -> tuple[bytes, int]:
    """Parse a ( ) string starting at the '('. Handles escapes, octal and
    balanced nested parens per the spec."""
    out = bytearray()
    depth = 1
    i += 1
    n = len(data)
    while i < n and depth:
        c = data[i : i + 1]
        if c == b"\\":
            nxt = data[i + 1 : i + 2]
            # every branch requires a non-empty nxt: a lone backslash at
            # end-of-data must fall through to the bare skip (b"" is "in"
            # any bytes literal, so the octal test would otherwise call
            # int(b"", 8))
            if nxt and nxt in _PDF_ESCAPES:
                out += _PDF_ESCAPES[nxt]
                i += 2
            elif nxt and nxt in b"01234567":
                j = i + 1
                while j < min(i + 4, n) and data[j : j + 1] in b"01234567":
                    j += 1
                out.append(int(data[i + 1 : j], 8) & 0xFF)
                i = j
            elif nxt in (b"\n", b"\r"):
                i += 2  # line continuation
            else:
                i += 1
        elif c == b"(":
            depth += 1
            out += c
            i += 1
        elif c == b")":
            depth -= 1
            if depth:
                out += c
            i += 1
        else:
            out += c
            i += 1
    return bytes(out), i


_NUM_RE = re.compile(rb"[-+]?\d*\.?\d+")
_OP_RE = re.compile(rb"[A-Za-z'\"*]{1,3}")
_NAME_RE = re.compile(rb"/([^\s/<>\[\]()]*)")


def _tokens(data: bytes):
    """Yield ('num', float) | ('str', bytes) | ('name', bytes) |
    ('op', bytes) | ('arr_open'/'arr_close', None)."""
    i, n = 0, len(data)
    while i < n:
        c = data[i : i + 1]
        if c in b" \t\r\n\x00":
            i += 1
        elif c == b"(":
            s, i = _read_string(data, i)
            yield ("str", s)
        elif c == b"<" and data[i + 1 : i + 2] == b"<":
            # inline dict (e.g. BDC property lists): skip balanced
            depth, i = 0, i
            while i < n:
                if data[i : i + 2] == b"<<":
                    depth += 1
                    i += 2
                elif data[i : i + 2] == b">>":
                    depth -= 1
                    i += 2
                    if not depth:
                        break
                else:
                    i += 1
        elif c == b"<":
            j = data.find(b">", i)
            j = n if j < 0 else j
            hexs = re.sub(rb"\s", b"", data[i + 1 : j])
            if len(hexs) % 2:
                hexs += b"0"
            try:
                yield ("str", bytes.fromhex(hexs.decode("ascii")))
            except ValueError:
                pass
            i = j + 1
        elif c == b"[":
            yield ("arr_open", None)
            i += 1
        elif c == b"]":
            yield ("arr_close", None)
            i += 1
        elif c == b"/":
            m = _NAME_RE.match(data, i)
            yield ("name", m.group(1))
            i = m.end()
        else:
            m = _NUM_RE.match(data, i)
            if m:
                yield ("num", float(m.group()))
                i = m.end()
                continue
            m = _OP_RE.match(data, i)
            if m:
                op = m.group()
                if op == b"BI":
                    # inline image (§8.9.7): skip dict + binary payload to
                    # the whitespace-delimited EI so raw image bytes can't
                    # masquerade as operators/strings. Standard heuristic:
                    # EI preceded by whitespace, followed by delimiter/EOF.
                    j = m.end()
                    while True:
                        j = data.find(b"EI", j)
                        if j < 0:
                            i = n  # unterminated: drop the rest
                            break
                        before = data[j - 1 : j]
                        after = data[j + 2 : j + 3]
                        if (before in b" \t\r\n\x00"
                                and (not after or after in b" \t\r\n\x00/[]<>(")):
                            i = j + 2
                            break
                        j += 2
                    continue
                yield ("op", op)
                i = m.end()
            else:
                i += 1  # junk byte: skip


def _decode_text(raw: bytes) -> str:
    """Single-byte standard encodings ≈ latin-1 (module scope); UTF-16BE
    BOM strings (some ToUnicode-less producers) decoded as such."""
    if raw[:2] == b"\xfe\xff":
        try:
            return raw[2:].decode("utf-16-be")
        except UnicodeDecodeError:
            pass
    return raw.decode("latin-1")


# ---------------------------------------------------------------------------
# text-state machine → spans
# ---------------------------------------------------------------------------

class _PageText:
    """Accumulates show-text ops into paragraph blocks using the layout
    thresholds in the module docstring."""

    def __init__(self):
        self.blocks: list[str] = []
        self._cur: list[str] = []
        self._x = self._y = None  # last show position
        self._size = 12.0

    def set_size(self, size: float) -> None:
        if size > 0:
            self._size = size

    def show(self, text: str, x: float, y: float) -> None:
        if not text:
            return
        if self._y is not None:
            drop = self._y - y
            if drop > self._size * _PARA_DROP:
                self._flush()
            elif drop > self._size * _LINE_DROP or drop < -self._size * _LINE_DROP:
                if self._cur and not self._cur[-1].endswith(" "):
                    self._cur.append(" ")  # line break → single space
            elif x - self._x > self._size * _WORD_GAP and self._cur \
                    and not self._cur[-1].endswith(" ") and not text.startswith(" "):
                self._cur.append(" ")
        self._cur.append(text)
        self._x = x + len(text) * self._size * 0.5  # advance estimate
        self._y = y

    def _flush(self) -> None:
        block = "".join(self._cur).strip()
        if block:
            self.blocks.append(block)
        self._cur = []

    def done(self) -> list[str]:
        self._flush()
        return self.blocks


def _run_content(content: bytes, images: dict[bytes, int],
                 page_no: int, spans: list[dict],
                 fonts: dict[bytes, object] | None = None) -> None:
    pt = _PageText()
    stack: list = []   # operand stack
    arr: list | None = None
    # text state: tm = (a,b,c,d,e,f) text matrix; we track e,f (+ leading)
    x = y = 0.0
    lx = ly = 0.0      # line start
    size = 12.0
    leading = 0.0
    fonts = fonts or {}
    decode = _decode_text  # current font's text decoder (Tf switches it)

    def emit_blocks():
        for block in pt.done():
            spans.append({"kind": "text", "text": block,
                          "media_ref": None, "page": page_no})

    for kind, val in _tokens(content):
        if kind == "arr_open":
            arr = []
            continue
        if kind == "arr_close":
            stack.append(arr if arr is not None else [])
            arr = None
            continue
        if arr is not None and kind in ("num", "str", "name"):
            arr.append((kind, val))
            continue
        if kind in ("num", "str", "name"):
            stack.append((kind, val))
            continue

        op = val
        # each operator handled tolerantly: malformed operand stacks
        # (wrong types/arity — rampant in real-world PDFs) skip the op
        # instead of crashing the parse; the finally clears operands
        # exactly like a conforming reader consuming them
        try:
            if op == b"BT":
                x = y = lx = ly = 0.0
            elif op == b"Tf" and len(stack) >= 2 and stack[-1][0] == "num":
                size = stack[-1][1]
                pt.set_size(size)
                if leading == 0.0:
                    leading = size * 1.2
                if stack[-2][0] == "name":
                    decode = fonts.get(stack[-2][1], _decode_text)
            elif op in (b"Td", b"TD") and len(stack) >= 2:
                tx, ty = stack[-2][1], stack[-1][1]
                if op == b"TD":
                    leading = -ty if ty else leading
                lx, ly = lx + tx, ly + ty
                x, y = lx, ly
            elif op == b"Tm" and len(stack) >= 6:
                lx, ly = stack[-2][1], stack[-1][1]
                x, y = lx, ly
                sz = abs(stack[-6][1]) or 1.0
                pt.set_size(sz * size if sz != 1.0 else size)
            elif op == b"TL" and stack:
                leading = stack[-1][1]
            elif op == b"T*":
                ly -= leading or size * 1.2
                lx, x, y = lx, lx, ly
            elif op == b"Tj" and stack and stack[-1][0] == "str":
                pt.show(decode(stack[-1][1]), x, y)
            elif op in (b"'", b'"'):
                ly -= leading or size * 1.2
                x, y = lx, ly
                if stack and stack[-1][0] == "str":
                    pt.show(decode(stack[-1][1]), x, y)
            elif op == b"TJ" and stack and isinstance(stack[-1], list):
                buf = []
                for k2, v2 in stack[-1]:
                    if k2 == "str":
                        buf.append(decode(v2))
                    elif k2 == "num" and v2 < -1000 * _WORD_GAP:
                        # TJ adjustments are thousandths of an em (already
                        # font-size-relative): < -300 ⇒ a word gap
                        buf.append(" ")
                pt.show("".join(buf), x, y)
            elif op == b"Do" and stack and stack[-1][0] == "name":
                objnum = images.get(stack[-1][1])
                if objnum is not None:
                    # image at its point of use: flush text first so the
                    # interleaving order matches the visual order
                    emit_blocks()
                    pt.__init__()
                    spans.append({
                        "kind": "img", "text": None,
                        "media_ref": f"pdfobj:{objnum}", "page": page_no,
                    })
        except Exception:
            pass  # malformed operands: skip the op (see comment above)
        finally:
            if op not in (b"(",):
                stack = []
    emit_blocks()


def pdf_to_spans(pdf_bytes: bytes,
                 diagnostics: list[str] | None = None) -> list[dict]:
    """PDF blob → ordered interleaved spans, same shape as the HTML
    kernel's output: ``[{kind, text, media_ref, offset}]`` with
    kind ∈ {text, img}. Raises PdfParseError for non-PDF input.

    `diagnostics` (optional caller-owned list): appended with one entry
    per page whose content streams exist but could not be decoded —
    PERMANENT per-page degradation (retrying won't help), which the
    Spark ingest surfaces as the `PdfDegraded:` error class
    (pipeline/pdf_ingest.py) distinct from container-level failure."""
    if not pdf_bytes.startswith(b"%PDF-"):
        raise PdfParseError("missing %PDF- header")
    objs = _scan_objects(pdf_bytes)
    if not objs:
        raise PdfParseError("no objects found")
    # encrypted documents (§7.6.3): found via EVERY trailer source —
    # classic trailers AND xref-stream dicts (the r5 tail heuristic
    # missed early xref-stream /Encrypt refs). Standard handler with the
    # empty user password → decrypt in place (permissions-only files are
    # fully recoverable); anything else fails PERMANENTLY (PdfParseError
    # → the ledger never retries) instead of emitting mojibake spans.
    enc_src, file_id, root_num = _trailer_info(pdf_bytes, objs)
    if enc_src is not None:
        _decrypt_streams(objs, _build_decryptor(enc_src, file_id))
    # PDF 1.5+ compressed objects: explode /ObjStm members into the map
    # so page trees / fonts / CMaps stored compressed are visible
    _expand_object_streams(objs)
    spans: list[dict] = []
    for page_no, page in enumerate(_page_objects(objs, root_num)):
        content, failed = _page_content(objs, page)
        if failed and diagnostics is not None:
            diagnostics.append(
                f"page {page_no}: {failed} content stream(s) undecodable"
            )
        if not content:
            continue
        _run_content(content, _page_xobjects(objs, page), page_no, spans,
                     fonts=_page_fonts(objs, page))
    for i, s in enumerate(spans):
        s["offset"] = i
        s.pop("page", None)
    return spans
