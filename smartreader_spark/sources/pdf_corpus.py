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
    """One deterministic PDF: 3 pages; page 1 has a title (Tm), two
    paragraphs (Td/T* lines, TJ kerning on odd docs), an image between
    them (interleaving!); page 2 one paragraph via ' and an escaped +
    hex string; page 3 a Type0/Identity-H paragraph whose 2-byte CIDs
    decode through a Flate-compressed embedded ToUnicode CMap. Odd doc
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
    objs = [
        _obj(1, b"<< /Type /Catalog /Pages 2 0 R >>"),
        _obj(2, b"<< /Type /Pages /Kids [3 0 R 4 0 R 13 0 R] /Count 3 >>"),
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
