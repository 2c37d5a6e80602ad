"""Deterministic synthetic PDF corpus (no external data, no PDF libs).

A from-scratch minimal PDF WRITER — the test/benchmark twin of
kernel/pdfkit.py's parser. Emits spec-valid single-xref PDFs exercising
the constructs the parser supports: multiple pages, FlateDecode and raw
content streams, Td/TD/Tm/T* positioning, Tj / ' / TJ (with kerning
word-gaps), escaped and hex strings, and image XObjects referenced from
page resources (→ interleaved media spans).

Determinism: content derives only from the doc index — same corpus every
run on every machine (the task's "synthesise deterministically at small
scale" requirement for the input table).
"""

from __future__ import annotations

import zlib

_LOREM = [
    "Spark native extraction engines prefer declarative plans",
    "Boilerplate removal needs scoring, not templates",
    "Interleaved spans keep text and media in reading order",
    "Checkpointed lineage makes petabyte jobs resumable",
    "Skewed page sizes straggle naive partitions",
    "Arrow batches amortize the python boundary",
    "Column pruning reaches the parquet scan",
    "Broadcast the small side, shuffle the digest",
]


def _obj(num: int, body: bytes) -> bytes:
    return b"%d 0 obj\n%s\nendobj\n" % (num, body)


# ---------------------------------------------------------------------------
# filter ENCODERS — the writer-side twins of kernel/pdfkit.py's decoders
# (§7.4), so the corpus can exercise every supported /Filter offline.
# Deliberately independent implementations (no kernel import): the round
# trip is a differential test, not a tautology.
# ---------------------------------------------------------------------------


def _asciihex_encode(data: bytes) -> bytes:
    return data.hex().encode("ascii") + b">"


def _ascii85_encode(data: bytes) -> bytes:
    import base64

    return base64.a85encode(data) + b"~>"


def _rle_encode(data: bytes) -> bytes:
    """RunLengthDecode encoder: repeat runs ≥3 become (257-n, byte);
    everything else literal chunks ≤128; 128 is EOD."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        run = 1
        while i + run < n and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 3:
            out.append(257 - run)
            out.append(data[i])
            i += run
        else:
            j = i + 1
            while (
                j < n
                and j - i < 128
                and not (j + 2 < n and data[j] == data[j + 1] == data[j + 2])
            ):
                j += 1
            out.append(j - i - 1)
            out += data[i:j]
            i = j
    out.append(128)
    return bytes(out)


def _lzw_encode(data: bytes, early: int = 1) -> bytes:
    """LZWDecode encoder: 9→12-bit variable codes, MSB-first packing,
    leading clear (256), trailing EOD (257), /EarlyChange=1 width rule in
    lockstep with kernel/pdfkit._lzw_decode (differential round-trip
    tested, plus the spec's published 9-bit example vector)."""
    out = bytearray()
    bitbuf = nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal bitbuf, nbits
        bitbuf = (bitbuf << width) | code
        nbits += width
        while nbits >= 8:
            out.append((bitbuf >> (nbits - 8)) & 0xFF)
            nbits -= 8

    table = {bytes([i]): i for i in range(256)}
    next_code, width = 258, 9
    emit(256, width)
    w = b""
    for b in data:
        wc = w + bytes([b])
        if wc in table:
            w = wc
            continue
        emit(table[w], width)
        if next_code < 4096:
            table[wc] = next_code
            next_code += 1
            if next_code + early - 1 >= (1 << width) and width < 12:
                width += 1
        w = bytes([b])
    if w:
        emit(table[w], width)
    emit(257, width)
    if nbits:
        out.append((bitbuf << (8 - nbits)) & 0xFF)
    return bytes(out)


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


_PNG_COLUMNS = 16


def _png_predict(data: bytes, columns: int = _PNG_COLUMNS) -> bytes:
    """Apply PNG row filters (encode direction), cycling the filter type
    0..4 per row so every unpredict branch executes. Pads the payload to
    a whole row with newlines (harmless content-stream whitespace)."""
    if len(data) % columns:
        data += b"\n" * (columns - len(data) % columns)
    out = bytearray()
    prior = bytes(columns)
    for k, r in enumerate(range(0, len(data), columns)):
        row = data[r : r + columns]
        ft = k % 5
        out.append(ft)
        for i in range(columns):
            left = row[i - 1] if i else 0
            up = prior[i]
            ul = prior[i - 1] if i else 0
            if ft == 0:
                out.append(row[i])
            elif ft == 1:
                out.append((row[i] - left) & 0xFF)
            elif ft == 2:
                out.append((row[i] - up) & 0xFF)
            elif ft == 3:
                out.append((row[i] - (left + up) // 2) & 0xFF)
            else:
                out.append((row[i] - _paeth(left, up, ul)) & 0xFF)
        prior = row
    return bytes(out)


#: per-doc filter variants for the filter page: (label, encoder, dict spec)
_FILTER_VARIANTS: list[tuple[str, object, bytes]] = [
    ("ASCIIHexDecode", _asciihex_encode, b"/Filter /ASCIIHexDecode "),
    ("ASCII85Decode", _ascii85_encode, b"/Filter /ASCII85Decode "),
    ("RunLengthDecode", _rle_encode, b"/Filter /RunLengthDecode "),
    ("LZWDecode", _lzw_encode, b"/Filter /LZWDecode "),
    (
        "FlatePred12",
        lambda d: zlib.compress(_png_predict(d)),
        b"/Filter /FlateDecode /DecodeParms << /Predictor 12 /Columns %d >> "
        % _PNG_COLUMNS,
    ),
    (
        "A85+Flate",
        lambda d: _ascii85_encode(zlib.compress(d)),
        b"/Filter [/ASCII85Decode /FlateDecode] ",
    ),
]


def filter_variant(doc_idx: int) -> str:
    """The filter label doc `doc_idx`'s filter page uses (test hook)."""
    return _FILTER_VARIANTS[doc_idx % len(_FILTER_VARIANTS)][0]


def _filtered_stream_obj(num: int, data: bytes, doc_idx: int) -> bytes:
    label, enc, spec = _FILTER_VARIANTS[doc_idx % len(_FILTER_VARIANTS)]
    payload = enc(data)
    d = b"<< %s/Length %d >>\nstream\n%s\nendstream" % (spec, len(payload), payload)
    return _obj(num, d)


def _stream_obj(num: int, dict_extra: bytes, data: bytes,
                compress: bool) -> bytes:
    if compress:
        data = zlib.compress(data)
        filt = b"/Filter /FlateDecode "
    else:
        filt = b""
    d = b"<< %s%s/Length %d >>\nstream\n%s\nendstream" % (
        filt, dict_extra, len(data), data)
    return _obj(num, d)


def _type0_assets(i: int) -> tuple[str, bytes, bytes]:
    """Deterministic Type0/Identity-H page assets: (expected text,
    ToUnicode CMap program, content stream). The CMap exercises all
    three mapping forms the parser supports (kernel/pdfkit._parse_cmap):
    a dst-base bfrange (digits, final code unit incremented), an
    array-form bfrange, and bfchar pairs — over non-latin-1 characters
    so the decode path is provably the CMap, not a byte fallback."""
    text = (
        f"Unicode page of document {i} — naïve café déjà vu ✓ "
        f"{_LOREM[(i + 3) % len(_LOREM)]}"
    )
    uniq: list[str] = []
    for ch in text:
        if not ch.isdigit() and ch not in uniq:
            uniq.append(ch)
    arr_chars, chr_chars = uniq[:3], uniq[3:]
    cid_of = {ch: 0x0041 + k for k, ch in enumerate(arr_chars)}
    cid_of.update({ch: 0x0100 + k for k, ch in enumerate(chr_chars)})
    cid_of.update({d: 0x0030 + int(d) for d in "0123456789"})

    def u16(ch: str) -> bytes:
        return ch.encode("utf-16-be").hex().encode("ascii")

    cids = b"".join(cid_of[ch].to_bytes(2, "big") for ch in text)
    bfchars = b"\n".join(
        b"<%04x> <%s>" % (cid_of[ch], u16(ch)) for ch in chr_chars
    )
    cmap = (
        b"/CIDInit /ProcSet findresource begin\n12 dict begin\nbegincmap\n"
        b"/CMapName /SynthUni def\n"
        b"1 begincodespacerange\n<0000> <ffff>\nendcodespacerange\n"
        b"1 beginbfrange\n<0030> <0039> <0030>\nendbfrange\n"
        b"1 beginbfrange\n<0041> <0043> ["
        + b" ".join(b"<%s>" % u16(ch) for ch in arr_chars)
        + b"]\nendbfrange\n"
        + b"%d beginbfchar\n" % len(chr_chars) + bfchars
        + b"\nendbfchar\nendcmap\nend\nend"
    )
    content = b"BT /F2 12 Tf 72 720 Td <" + cids.hex().encode("ascii") + b"> Tj ET\n"
    return text, cmap, content


def make_pdf(doc_idx: int) -> bytes:
    """One deterministic PDF: 4 pages; page 1 has a title (Tm), two
    paragraphs (Td/T* lines, TJ kerning on odd docs), an image between
    them (interleaving!); page 2 one paragraph via ' and an escaped +
    hex string; page 3 a Type0/Identity-H paragraph whose 2-byte CIDs
    decode through a Flate-compressed embedded ToUnicode CMap; page 4 a
    paragraph whose content stream is encoded with a per-doc filter
    variant (ASCIIHex / ASCII85 / RunLength / LZW / Flate+PNG-predictor
    / ASCII85∘Flate cascade — kernel/pdfkit §7.4 coverage). Odd doc
    indexes compress page 1's content stream."""
    i = doc_idx
    title = f"Document {i}: {_LOREM[i % len(_LOREM)]}"
    para1_lines = [
        f"{_LOREM[(i + k) % len(_LOREM)]} (doc {i}, line {k + 1}).".encode("latin-1")
        for k in range(3)
    ]
    para2 = f"Closing paragraph of document {i} with an em dash \\351 and (parens).".encode("latin-1")
    # page 1 content: title at y=760 (Tm), para1 at y=700 via Td + T*,
    # image, para2 far lower (paragraph gap)
    c1 = bytearray()
    c1 += b"BT /F1 18 Tf 1 0 0 1 72 760 Tm (" + title.encode("latin-1") + b") Tj ET\n"
    c1 += b"BT /F1 12 Tf 72 700 Td 14 TL\n"
    if i % 2:
        # TJ with a -400 word-gap kern between two halves of line 1
        h1, _, h2 = para1_lines[0].partition(b" ")
        c1 += b"[(" + h1 + b") -400 (" + h2 + b")] TJ T*\n"
    else:
        c1 += b"(" + para1_lines[0] + b") Tj T*\n"
    c1 += b"(" + para1_lines[1] + b") Tj T*\n"
    c1 += b"(" + para1_lines[2] + b") Tj ET\n"
    c1 += b"q 100 0 0 80 72 540 cm /Im1 Do Q\n"
    c1 += b"BT /F1 12 Tf 72 480 Td (" + para2 + b") Tj ET\n"
    # page 2: one paragraph using TD + ' (next-line-show), then hex
    hexline = f"Hex line of doc {i}".encode("latin-1").hex().encode("ascii")
    c2 = (b"BT /F1 12 Tf 72 720 TD (Second page of document %d.) Tj\n"
          b"(Continued on the same block.) '\n"
          b"<" + hexline + b"> ' ET\n") % i

    img_data = bytes([(i * 7 + k) % 256 for k in range(64)])  # opaque
    _, cmap, c3 = _type0_assets(i)
    # page 4: filter-variant paragraph (run-friendly doubled word for RLE)
    filt_text = (
        f"Filter page of document {i} decoded via {filter_variant(i)} "
        f"aaa bbb {_LOREM[(i + 5) % len(_LOREM)]}"
    )
    c4 = b"BT /F1 12 Tf 72 720 Td (" + filt_text.encode("latin-1") + b") Tj ET\n"
    objs = [
        _obj(1, b"<< /Type /Catalog /Pages 2 0 R >>"),
        _obj(2, b"<< /Type /Pages /Kids [3 0 R 4 0 R 13 0 R 15 0 R] /Count 4 >>"),
        _obj(3, b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
                b"/Resources 7 0 R /Contents 5 0 R >>"),
        _obj(4, b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
                b"/Resources << /Font << /F1 9 0 R >> >> /Contents 6 0 R >>"),
        _stream_obj(5, b"", bytes(c1), compress=bool(i % 2)),
        _stream_obj(6, b"", bytes(c2), compress=False),
        _obj(7, b"<< /Font << /F1 9 0 R >> /XObject << /Im1 8 0 R >> >>"),
        _stream_obj(8, b"/Type /XObject /Subtype /Image /Width 8 /Height 8 "
                       b"/ColorSpace /DeviceGray /BitsPerComponent 8 ",
                    img_data, compress=False),
        _obj(9, b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"),
        _obj(10, b"<< /Type /Font /Subtype /Type0 /BaseFont /SynthCID "
                 b"/Encoding /Identity-H /DescendantFonts [11 0 R] "
                 b"/ToUnicode 12 0 R >>"),
        _obj(11, b"<< /Type /Font /Subtype /CIDFontType2 /BaseFont /SynthCID "
                 b"/CIDSystemInfo << /Registry (Adobe) /Ordering (Identity) "
                 b"/Supplement 0 >> >>"),
        _stream_obj(12, b"", cmap, compress=True),
        _obj(13, b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
                 b"/Resources << /Font << /F2 10 0 R >> >> /Contents 14 0 R >>"),
        _stream_obj(14, b"", c3, compress=False),
        _obj(15, b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
                 b"/Resources << /Font << /F1 9 0 R >> >> /Contents 16 0 R >>"),
        _filtered_stream_obj(16, c4, i),
    ]
    out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets = []
    for o in objs:
        offsets.append(len(out))
        out += o
    xref_at = len(out)
    out += b"xref\n0 %d\n0000000000 65535 f \n" % (len(objs) + 1)
    for off in offsets:
        out += b"%010d 00000 n \n" % off
    out += (b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
            % (len(objs) + 1, xref_at))
    return bytes(out)


def pdf_corpus_rows(n_docs: int = 8) -> list[tuple[int, bytes]]:
    """(doc_id, pdf binary) rows — the PDF analog of the fixture corpus."""
    return [(100000 + i, make_pdf(i)) for i in range(n_docs)]
