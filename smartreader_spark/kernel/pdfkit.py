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
also how real-world repair tools walk damaged files), FlateDecode via
stdlib zlib, a content-stream tokenizer (strings with escapes/nesting,
hex strings, arrays, names, numbers, operators), and a small text-state
machine (BT/ET, Tf, Td/TD/Tm/T*, Tj/'/"/TJ) that reconstructs reading
order and line/word breaks from the layout coordinates.

Scope (honestly bounded — each limit documented where enforced):
* FlateDecode and raw streams; other filters (DCT, LZW, ...) are kept as
  opaque media where applicable and skipped for text.
* Simple fonts decode as standard single-byte encodings (latin-1
  superset). Composite (Type0/Identity-H) fonts — the dominant encoding
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
    __slots__ = ("num", "dict_src", "stream")

    def __init__(self, num: int, dict_src: bytes, stream: bytes | None):
        self.num = num
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
        objs[num] = _Obj(num, dict_src, stream)
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
        # balanced << >> extraction
        depth = 0
        for i in range(0, len(rest) - 1):
            if rest[i : i + 2] == b"<<":
                depth += 1
            elif rest[i : i + 2] == b">>":
                depth -= 1
                if depth == 0:
                    return rest[: i + 2]
        return rest
    return rest.split(b"/", 1)[0]


_CATALOG_PAGES_RE = re.compile(rb"/Pages\s+(\d+)\s+\d+\s+R")
_KIDS_RE = re.compile(rb"/Kids\s*\[(.*?)\]", re.DOTALL)


def _page_objects(objs: dict[int, _Obj]) -> list[_Obj]:
    """Document-order pages. The authoritative order is the catalog's
    page tree (/Pages → /Kids arrays, depth-first — §7.7.3.2); object-
    number order is the fallback for damaged files with no walkable tree
    (the same repair posture as the xref-less object scan). Pages a
    broken tree missed are appended in number order so content is never
    silently dropped."""
    pages_by_num = {
        o.num: o for o in objs.values()
        if re.search(rb"/Type\s*/Page\b", o.dict_src)
    }
    root = None
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


def _page_xobjects(objs: dict[int, _Obj], page: _Obj) -> dict[bytes, int]:
    """name → object number of the page's XObject images."""
    res = _resolve(objs, page.dict_src, b"Resources")
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


def _font_decoder(objs: dict[int, _Obj], fobj: _Obj):
    """bytes → str decoder for one font object. Composite (Type0) fonts
    decode 2-byte Identity CIDs through the embedded ToUnicode CMap —
    the dominant encoding in real-world PDF corpora; CIDs without a
    mapping become U+FFFD (visible, not silently dropped). Simple fonts
    use the standard single-byte path (_decode_text)."""
    if not re.search(rb"/Subtype\s*/Type0\b", fobj.dict_src):
        return _decode_text
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
    """name → decoder for the page's /Font resources."""
    res = _resolve(objs, page.dict_src, b"Resources")
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
    # encrypted documents: a trailer /Encrypt means every stream/string is
    # RC4/AES-enciphered — decoding without the key yields mojibake, so
    # fail PERMANENTLY (PdfParseError → the ledger never retries) instead
    # of emitting garbage spans. Checked in the trailer tail, where the
    # spec puts it, to avoid false hits on content bytes.
    t = pdf_bytes.rfind(b"trailer")
    tail = pdf_bytes[t:] if t >= 0 else pdf_bytes[-2048:]
    if re.search(rb"/Encrypt\s+\d+\s+\d+\s+R", tail):
        raise PdfParseError("encrypted document (no decryption support)")
    objs = _scan_objects(pdf_bytes)
    if not objs:
        raise PdfParseError("no objects found")
    spans: list[dict] = []
    for page_no, page in enumerate(_page_objects(objs)):
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
