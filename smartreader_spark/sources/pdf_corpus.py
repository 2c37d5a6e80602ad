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

import functools as _functools
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


def _filtered_payload(data: bytes, doc_idx: int) -> tuple[bytes, bytes]:
    """(dict filter spec, encoded payload) for the per-doc filter page."""
    _label, enc, spec = _FILTER_VARIANTS[doc_idx % len(_FILTER_VARIANTS)]
    return spec, enc(data)


def _flate_payload(data: bytes, extra: bytes,
                   compress: bool) -> tuple[bytes, bytes]:
    if compress:
        return b"/Filter /FlateDecode " + extra, zlib.compress(data)
    return extra, data


# ---------------------------------------------------------------------------
# standard security handler — ENCRYPT side (§7.6.3, Algorithms 1-5 with
# empty owner AND user passwords). The writer-side twin of
# kernel/pdfkit._build_decryptor: the writer runs Algorithm 3 (compute
# /O) + 2 (file key) + 4/5 (compute /U) + 1 (per-object RC4); the parser
# runs 2 + 4/5 (verify) + 1 (decrypt). Deliberately independent RC4/MD5
# plumbing — the round trip is a differential test, not a tautology.
# ---------------------------------------------------------------------------

_W_PAD = bytes.fromhex(
    "28bf4e5e4e758a41640" "04e56fffa01082e2e00b6d0683e802f0ca9fe6453697a"
)


def _rc4_w(key: bytes, data: bytes) -> bytes:
    s = bytearray(range(256))
    j = 0
    klen = len(key)
    for i in range(256):
        j = (j + s[i] + key[i % klen]) % 256
        s[i], s[j] = s[j], s[i]
    out = bytearray(len(data))
    x = y = 0
    for k, b in enumerate(data):
        x = (x + 1) % 256
        y = (y + s[x]) % 256
        s[x], s[y] = s[y], s[x]
        out[k] = b ^ s[(s[x] + s[y]) % 256]
    return bytes(out)


# --- writer-side AES (forward cipher only; independent of kernel/
# cryptokit.py — inverse-via-pow + bitwise affine instead of exp/log
# tables + rotate-accumulate, so the encrypt→decrypt round trip stays a
# differential test) -------------------------------------------------------

def _gmul_w(a: int, b: int) -> int:
    r = 0
    for _ in range(8):
        if b & 1:
            r ^= a
        hi = a & 0x80
        a = (a << 1) & 0xFF
        if hi:
            a ^= 0x1B
        b >>= 1
    return r


def _sbox_w() -> bytes:
    def gpow(c: int, e: int) -> int:
        r = 1
        while e:
            if e & 1:
                r = _gmul_w(r, c)
            c = _gmul_w(c, c)
            e >>= 1
        return r

    sb = bytearray(256)
    for c in range(256):
        b = 0 if c == 0 else gpow(c, 254)  # multiplicative inverse
        s = 0
        for i in range(8):  # bitwise affine: s_i = b_i^b_{i+4}^…^c_i
            bit = ((b >> i) ^ (b >> ((i + 4) % 8)) ^ (b >> ((i + 5) % 8))
                   ^ (b >> ((i + 6) % 8)) ^ (b >> ((i + 7) % 8))
                   ^ (0x63 >> i)) & 1
            s |= bit << i
        sb[c] = s
    return bytes(sb)


_SBOX_W = _sbox_w()


def _ttables_w() -> list[list[int]]:
    """Fused SubBytes+MixColumns tables from the writer's OWN S-box and
    GF multiply (speed layout; the derivation chain stays independent of
    kernel/cryptokit)."""
    tabs: list[list[int]] = [[0] * 256 for _ in range(4)]
    rows = ((2, 1, 1, 3), (3, 2, 1, 1), (1, 3, 2, 1), (1, 1, 3, 2))
    for x in range(256):
        sb = _SBOX_W[x]
        for r in range(4):
            a, b, c, d = rows[r]
            tabs[r][x] = ((_gmul_w(sb, a) << 24) | (_gmul_w(sb, b) << 16)
                          | (_gmul_w(sb, c) << 8) | _gmul_w(sb, d))
    return tabs


_T0_W, _T1_W, _T2_W, _T3_W = _ttables_w()


def _expand_w(key: bytes) -> list[int]:
    """Key schedule → packed 32-bit round-key words."""
    nk = len(key) // 4
    nr = nk + 6
    rcon = 1
    w = [list(key[4 * i : 4 * i + 4]) for i in range(nk)]
    for i in range(nk, 4 * (nr + 1)):
        t = list(w[i - 1])
        if i % nk == 0:
            t = [_SBOX_W[t[1]], _SBOX_W[t[2]], _SBOX_W[t[3]], _SBOX_W[t[0]]]
            t[0] ^= rcon
            rcon = _gmul_w(rcon, 2)
        elif nk == 8 and i % nk == 4:
            t = [_SBOX_W[b] for b in t]
        w.append([a ^ b for a, b in zip(w[i - nk], t)])
    return [(a << 24) | (b << 16) | (c << 8) | d for a, b, c, d in w]


def _enc_block_packed_w(block: bytes, pw: list[int], nr: int) -> bytes:
    s0 = int.from_bytes(block[0:4], "big") ^ pw[0]
    s1 = int.from_bytes(block[4:8], "big") ^ pw[1]
    s2 = int.from_bytes(block[8:12], "big") ^ pw[2]
    s3 = int.from_bytes(block[12:16], "big") ^ pw[3]
    for rnd in range(1, nr):
        k = 4 * rnd
        t0 = (_T0_W[(s0 >> 24) & 0xFF] ^ _T1_W[(s1 >> 16) & 0xFF]
              ^ _T2_W[(s2 >> 8) & 0xFF] ^ _T3_W[s3 & 0xFF] ^ pw[k])
        t1 = (_T0_W[(s1 >> 24) & 0xFF] ^ _T1_W[(s2 >> 16) & 0xFF]
              ^ _T2_W[(s3 >> 8) & 0xFF] ^ _T3_W[s0 & 0xFF] ^ pw[k + 1])
        t2 = (_T0_W[(s2 >> 24) & 0xFF] ^ _T1_W[(s3 >> 16) & 0xFF]
              ^ _T2_W[(s0 >> 8) & 0xFF] ^ _T3_W[s1 & 0xFF] ^ pw[k + 2])
        t3 = (_T0_W[(s3 >> 24) & 0xFF] ^ _T1_W[(s0 >> 16) & 0xFF]
              ^ _T2_W[(s1 >> 8) & 0xFF] ^ _T3_W[s2 & 0xFF] ^ pw[k + 3])
        s0, s1, s2, s3 = t0, t1, t2, t3
    out = bytearray(16)
    src = (s0, s1, s2, s3)
    k = 4 * nr
    for c in range(4):
        w = pw[k + c]
        out[4 * c + 0] = _SBOX_W[(src[c] >> 24) & 0xFF] ^ ((w >> 24) & 0xFF)
        out[4 * c + 1] = (_SBOX_W[(src[(c + 1) % 4] >> 16) & 0xFF]
                          ^ ((w >> 16) & 0xFF))
        out[4 * c + 2] = (_SBOX_W[(src[(c + 2) % 4] >> 8) & 0xFF]
                          ^ ((w >> 8) & 0xFF))
        out[4 * c + 3] = _SBOX_W[src[(c + 3) % 4] & 0xFF] ^ (w & 0xFF)
    return bytes(out)


def _aes_enc_block_w(key: bytes, block: bytes) -> bytes:
    return _enc_block_packed_w(block, _expand_w(key), len(key) // 4 + 6)


try:  # native bulk path (same rationale as kernel/cryptokit: Algorithm
    # 2.B costs ~10k blocks per fresh salt — seconds in pure Python,
    # <1 ms native); the pure core above remains the FIPS-pinned anchor
    from cryptography.hazmat.primitives.ciphers import (
        Cipher as _Cipher_w,
        algorithms as _algorithms_w,
        modes as _modes_w,
    )

    _HAVE_NATIVE_W = True
except ImportError:  # pragma: no cover
    _HAVE_NATIVE_W = False


def _aes_cbc_enc_pure_w(key: bytes, iv: bytes, data: bytes) -> bytes:
    pw = _expand_w(key)  # expand ONCE per call, not per block
    nr = len(key) // 4 + 6
    out = bytearray()
    prev = iv
    for k in range(0, len(data), 16):
        blk = bytes(a ^ b for a, b in zip(data[k : k + 16], prev))
        prev = _enc_block_packed_w(blk, pw, nr)
        out += prev
    return bytes(out)


def _aes_cbc_enc_w(key: bytes, iv: bytes, data: bytes) -> bytes:
    if _HAVE_NATIVE_W:
        enc = _Cipher_w(
            _algorithms_w.AES(key), _modes_w.CBC(iv)
        ).encryptor()
        return enc.update(data) + enc.finalize()
    return _aes_cbc_enc_pure_w(key, iv, data)


def _aes_stream_w(key: bytes, iv: bytes, payload: bytes) -> bytes:
    """PDF AES stream form: IV ‖ CBC(PKCS#7-padded payload)."""
    pad = 16 - len(payload) % 16
    return iv + _aes_cbc_enc_w(key, iv, payload + bytes([pad]) * pad)


def _hash_2b_w(pwd: bytes, salt: bytes, udata: bytes = b"") -> bytes:
    """Writer-side ISO 32000-2 Algorithm 2.B (same termination as the
    reader: exit when completed rounds ≥ 64 and E[-1] ≤ rounds − 32)."""
    import hashlib

    k = hashlib.sha256(pwd + salt + udata).digest()
    i = 0
    while True:
        k1 = (pwd + k + udata) * 64
        e = _aes_cbc_enc_w(k[:16], k[16:32], k1)
        k = (hashlib.sha256, hashlib.sha384, hashlib.sha512)[
            sum(e[:16]) % 3
        ](e).digest()
        i += 1
        if i >= 64 and e[-1] <= i - 32:
            return k[:32]


@_functools.lru_cache(maxsize=64)
def _encryption_assets(i: int, rev: int) -> tuple[bytes, bytes, "object"]:
    """(encrypt dict body, file ID, per-object stream encryptor) for doc
    `i` under revision `rev` (2 = V1/RC4-40, 3 = V2/RC4-128), empty
    owner and user passwords (permissions-only encryption, P = -44)."""
    import hashlib

    length = 40 if rev == 2 else 128
    n = length // 8
    fid = hashlib.md5(b"smartreader-pdf-id-%d" % i).digest()
    p = -44
    # Algorithm 3: /O from the (empty → pad) owner password
    okd = hashlib.md5(_W_PAD).digest()
    if rev >= 3:
        for _ in range(50):
            okd = hashlib.md5(okd).digest()  # full-digest rehash (Alg 3)
    okey = okd[:n]
    o = _rc4_w(okey, _W_PAD)
    if rev >= 3:
        for k in range(1, 20):
            o = _rc4_w(bytes(b ^ k for b in okey), o)
    # Algorithm 2: file key from the (empty → pad) user password
    md = hashlib.md5(
        _W_PAD + o + (p & 0xFFFFFFFF).to_bytes(4, "little") + fid
    ).digest()
    if rev >= 3:
        for _ in range(50):
            md = hashlib.md5(md[:n]).digest()  # first-n rehash (Alg 2)
    key = md[:n]
    # Algorithm 4 (R=2) / 5 (R=3): /U
    if rev == 2:
        u = _rc4_w(key, _W_PAD)
    else:
        u = _rc4_w(key, hashlib.md5(_W_PAD + fid).digest())
        for k in range(1, 20):
            u = _rc4_w(bytes(b ^ k for b in key), u)
        u += b"\x00" * 16  # arbitrary 16-byte pad per Algorithm 5 step f
    body = (
        b"<< /Filter /Standard /V %d /R %d /Length %d /P %d "
        b"/O <%s> /U <%s> >>"
        % (1 if rev == 2 else 2, rev, length, p,
           o.hex().encode("ascii"), u.hex().encode("ascii"))
    )

    def enc_fn(num: int, payload: bytes, _k=key, _n=n) -> bytes:
        return _rc4_w(_objkey_w(_k, _n, num), payload)

    return body, fid, enc_fn


@_functools.lru_cache(maxsize=64)
def _encryption_assets_aesv2(i: int) -> tuple[bytes, bytes, "object"]:
    """V4/R4 crypt-filter encryption (/StdCF /CFM /AESV2, AES-128-CBC),
    empty passwords. /O and /U follow the same Algorithms 3 and 5 as
    R=3 (R=4 reuses them); streams are IV-prefixed PKCS#7 CBC under the
    per-object MD5(key+num+gen+"sAlT") key (§7.6.2)."""
    import hashlib

    n = 16
    fid = hashlib.md5(b"smartreader-pdf-id-%d" % i).digest()
    p = -44
    okd = hashlib.md5(_W_PAD).digest()
    for _ in range(50):
        okd = hashlib.md5(okd).digest()
    okey = okd[:n]
    o = _rc4_w(okey, _W_PAD)
    for k in range(1, 20):
        o = _rc4_w(bytes(b ^ k for b in okey), o)
    md = hashlib.md5(
        _W_PAD + o + (p & 0xFFFFFFFF).to_bytes(4, "little") + fid
    ).digest()
    for _ in range(50):
        md = hashlib.md5(md[:n]).digest()
    key = md[:n]
    u = _rc4_w(key, hashlib.md5(_W_PAD + fid).digest())
    for k in range(1, 20):
        u = _rc4_w(bytes(b ^ k for b in key), u)
    u += b"\x00" * 16
    body = (
        b"<< /Filter /Standard /V 4 /R 4 /Length 128 /P %d "
        b"/CF << /StdCF << /CFM /AESV2 /AuthEvent /DocOpen "
        b"/Length 16 >> >> /StmF /StdCF /StrF /StdCF "
        b"/O <%s> /U <%s> >>"
        % (p, o.hex().encode("ascii"), u.hex().encode("ascii"))
    )

    def enc_fn(num: int, payload: bytes, _k=key, _i=i) -> bytes:
        objkey = hashlib.md5(
            _k + num.to_bytes(3, "little") + b"\x00\x00" + b"sAlT"
        ).digest()[:16]
        iv = hashlib.md5(b"smartreader-aes-iv-%d-%d" % (_i, num)).digest()
        return _aes_stream_w(objkey, iv, payload)

    return body, fid, enc_fn


@_functools.lru_cache(maxsize=64)
def _encryption_assets_aes256(i: int) -> tuple[bytes, bytes, "object"]:
    """V5/R6 (/AESV3, AES-256-CBC) with empty passwords: /U carries
    hash-2.B(validation salt) + salts, /UE the file key wrapped under
    the 2.B key-salt hash; /O//OE the owner twins (udata = /U); /Perms
    the AES-ECB permissions block. Streams: IV-prefixed PKCS#7 CBC
    under the FILE key directly (ISO 32000-2 §7.6.4.3)."""
    import hashlib

    fid = hashlib.md5(b"smartreader-pdf-id-%d" % i).digest()
    p = -44
    fkey = hashlib.sha256(b"smartreader-aes256-filekey-%d" % i).digest()
    vsalt = hashlib.sha256(b"smartreader-vs-%d" % i).digest()[:8]
    ksalt = hashlib.sha256(b"smartreader-ks-%d" % i).digest()[:8]
    u = _hash_2b_w(b"", vsalt) + vsalt + ksalt
    ue = _aes_cbc_enc_w(_hash_2b_w(b"", ksalt), b"\x00" * 16, fkey)
    ovs = hashlib.sha256(b"smartreader-ovs-%d" % i).digest()[:8]
    oks = hashlib.sha256(b"smartreader-oks-%d" % i).digest()[:8]
    o = _hash_2b_w(b"", ovs, u) + ovs + oks
    oe = _aes_cbc_enc_w(_hash_2b_w(b"", oks, u), b"\x00" * 16, fkey)
    perms = _aes_enc_block_w(
        fkey,
        (p & 0xFFFFFFFF).to_bytes(4, "little")
        + b"\xff\xff\xff\xff" + b"T" + b"adb" + b"smtr",
    )
    body = (
        b"<< /Filter /Standard /V 5 /R 6 /Length 256 /P %d "
        b"/CF << /StdCF << /CFM /AESV3 /AuthEvent /DocOpen "
        b"/Length 32 >> >> /StmF /StdCF /StrF /StdCF "
        b"/O <%s> /U <%s> /OE <%s> /UE <%s> /Perms <%s> >>"
        % (p, o.hex().encode("ascii"), u.hex().encode("ascii"),
           oe.hex().encode("ascii"), ue.hex().encode("ascii"),
           perms.hex().encode("ascii"))
    )

    def enc_fn(num: int, payload: bytes, _k=fkey, _i=i) -> bytes:
        iv = hashlib.md5(b"smartreader-aes-iv-%d-%d" % (_i, num)).digest()
        return _aes_stream_w(_k, iv, payload)

    return body, fid, enc_fn


def _objkey_w(key: bytes, n: int, num: int) -> bytes:
    """Algorithm 1 per-object key (generation 0 throughout the corpus)."""
    import hashlib

    return hashlib.md5(
        key + num.to_bytes(3, "little") + b"\x00\x00"
    ).digest()[: min(n + 5, 16)]


#: fixed object numbers of the assembly-level objects (beyond the 1-21
#: content objects): encrypt dict, ObjStm container, xref stream.
#: Contiguous with the content range so the classic table xref stays
#: spec-valid (one `0 N` subsection).
_ENC_NUM, _OBJSTM_NUM, _XREF_NUM = 22, 23, 24


def _emit_classic(dicts: list[tuple[int, bytes]],
                  streams: list[tuple[int, bytes, bytes]],
                  enc: tuple[bytes, bytes, "object"] | None) -> bytes:
    """Classic PDF 1.4 assembly: every object top-level, table xref,
    `trailer` dict (+ /Encrypt + /ID when encrypting)."""
    items = [(num, _obj(num, body)) for num, body in dicts]
    for num, extra, payload in streams:
        if enc is not None:
            payload = enc[2](num, payload)
        items.append((num, _obj(
            num, b"<< %s/Length %d >>\nstream\n%s\nendstream"
            % (extra, len(payload), payload))))
    trailer_extra = b""
    if enc is not None:
        body, fid, _fn = enc
        items.append((_ENC_NUM, _obj(_ENC_NUM, body)))
        fh = fid.hex().encode("ascii")
        trailer_extra = b" /Encrypt %d 0 R /ID [<%s> <%s>]" % (_ENC_NUM, fh, fh)
    items.sort()
    out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets = []
    for _num, ob in items:
        offsets.append(len(out))
        out += ob
    xref_at = len(out)
    out += b"xref\n0 %d\n0000000000 65535 f \n" % (len(items) + 1)
    for off in offsets:
        out += b"%010d 00000 n \n" % off
    out += (b"trailer\n<< /Size %d /Root 1 0 R%s >>\nstartxref\n%d\n%%%%EOF\n"
            % (len(items) + 1, trailer_extra, xref_at))
    return bytes(out)


def _emit_objstm(dicts: list[tuple[int, bytes]],
                 streams: list[tuple[int, bytes, bytes]],
                 enc: tuple[bytes, bytes, "object"] | None) -> bytes:
    """PDF 1.5 compressed-object assembly: every non-stream object packed
    into ONE Flate-compressed /Type /ObjStm; cross references in a
    /Type /XRef stream (W [1 3 2] rows, PNG Predictor-12, type-1 rows for
    top-level objects and type-2 rows for the compressed members); NO
    classic trailer — the xref stream dict carries /Root (+ /Encrypt +
    /ID). When encrypting, the ObjStm stream is RC4'd with its own
    object key (the spec's model: member strings get covered by the
    container) and the xref stream stays plaintext (§7.5.8.2)."""
    header = b" ".join(
        b"%d %d" % (num, off) for (num, _b), off in
        zip(dicts, _objstm_offsets(dicts))
    ) + b"\n"
    payload = header + b"".join(body + b"\n" for _num, body in dicts)
    stm = zlib.compress(payload)
    if enc is not None:
        stm = enc[2](_OBJSTM_NUM, stm)
    objstm_obj = _obj(_OBJSTM_NUM, (
        b"<< /Type /ObjStm /N %d /First %d /Filter /FlateDecode "
        b"/Length %d >>\nstream\n%s\nendstream"
        % (len(dicts), len(header), len(stm), stm)))
    items = [(_OBJSTM_NUM, objstm_obj)]
    for num, extra, data in streams:
        if enc is not None:
            data = enc[2](num, data)
        items.append((num, _obj(
            num, b"<< %s/Length %d >>\nstream\n%s\nendstream"
            % (extra, len(data), data))))
    id_extra = b""
    if enc is not None:
        body, fid, _fn = enc
        items.append((_ENC_NUM, _obj(_ENC_NUM, body)))
        fh = fid.hex().encode("ascii")
        id_extra = b"/Encrypt %d 0 R /ID [<%s> <%s>] " % (_ENC_NUM, fh, fh)
    items.sort()
    out = bytearray(b"%PDF-1.5\n%\xe2\xe3\xcf\xd3\n")
    top_off: dict[int, int] = {}
    for num, ob in items:
        top_off[num] = len(out)
        out += ob
    xref_at = len(out)
    member_idx = {num: k for k, (num, _b) in enumerate(dicts)}
    size = _XREF_NUM + 1
    rows = bytearray()
    for num in range(size):
        if num == 0:
            t, f2, f3 = 0, 0, 65535
        elif num in top_off:
            t, f2, f3 = 1, top_off[num], 0
        elif num in member_idx:
            t, f2, f3 = 2, _OBJSTM_NUM, member_idx[num]
        elif num == _XREF_NUM:
            t, f2, f3 = 1, xref_at, 0
        else:
            t, f2, f3 = 0, 0, 0
        rows += bytes([t]) + f2.to_bytes(3, "big") + f3.to_bytes(2, "big")
    xdata = zlib.compress(_png_predict(bytes(rows), 6))
    out += _obj(_XREF_NUM, (
        b"<< /Type /XRef /Size %d /W [1 3 2] /Index [0 %d] /Root 1 0 R "
        b"%s/Filter /FlateDecode "
        b"/DecodeParms << /Predictor 12 /Columns 6 >> /Length %d >>\n"
        b"stream\n%s\nendstream" % (size, size, id_extra, len(xdata), xdata)))
    out += b"startxref\n%d\n%%%%EOF\n" % xref_at
    return bytes(out)


def _objstm_offsets(dicts: list[tuple[int, bytes]]) -> list[int]:
    """Byte offsets of each member body within the ObjStm's body area
    (after /First). Two-pass because the header length depends on the
    offsets' decimal widths — iterate to the fixed point."""
    offs = [0] * len(dicts)
    while True:
        cur = 0
        new = []
        for _num, body in dicts:
            new.append(cur)
            cur += len(body) + 1
        if new == offs:
            return offs
        offs = new


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


def assembly_variant(doc_idx: int) -> str:
    """How doc `doc_idx` is physically assembled (test hook):
    ``classic`` (PDF 1.4 table xref), ``objstm`` (PDF 1.5 compressed
    objects + xref stream), and the standard-security-handler empty-
    user-password encryption modes ``classic+rc4-40`` /
    ``objstm+rc4-128`` / ``classic+aesv2`` (V4/R4 crypt filter) /
    ``objstm+aes256`` (V5/R6 /AESV3). Period-8 cycle: docs 0,2 classic;
    1,5 objstm; 3 classic+rc4-40; 7 objstm+rc4-128; 4 classic+aesv2;
    6 objstm+aes256."""
    m = doc_idx % 8
    if m == 3:
        return "classic+rc4-40"
    if m == 7:
        return "objstm+rc4-128"
    if m == 4:
        return "classic+aesv2"
    if m == 6:
        return "objstm+aes256"
    if m in (1, 5):
        return "objstm"
    return "classic"


#: Differences page constants shared with the tests: byte codes 65-67
#: remap to named glyphs, 97-99 to uniXXXX/uXXXXXX names (with one
#: deliberately-unknown name → U+FFFD, the visible-failure posture)
_DIFF_ARRAY = (b"/Differences [65 /eacute /Euro /quotedblleft "
               b"97 /alpha /uni0414 /u1F600]")
DIFF_DECODED = "é€“ �Д\U0001f600"  # "ABC abc"


def make_pdf(doc_idx: int, variant: str | None = None) -> bytes:
    """One deterministic PDF: 6 pages; page 1 has a title (Tm), two
    paragraphs (Td/T* lines, TJ kerning on odd docs), an image between
    them (interleaving!); page 2 one paragraph via ' and an escaped +
    hex string; page 3 a Type0/Identity-H paragraph whose 2-byte CIDs
    decode through a Flate-compressed embedded ToUnicode CMap; page 4 a
    paragraph whose content stream is encoded with a per-doc filter
    variant (ASCIIHex / ASCII85 / RunLength / LZW / Flate+PNG-predictor
    / ASCII85∘Flate cascade — kernel/pdfkit §7.4 coverage); page 5 a
    simple font with an /Encoding /Differences remap (named glyphs +
    uniXXXX + an unknown name → U+FFFD); page 6 carries NO /Resources of
    its own — its font and image inherit from the /Pages node (§7.7.3.4).
    Odd doc indexes compress page 1's content stream. The whole object
    set is then assembled per `assembly_variant`: classic table-xref,
    ObjStm + xref-stream, and/or RC4-encrypted (empty user password)."""
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
    # page 5: /F1 label, then the Differences-remapped /FD showing
    # "ABC abc" — which decodes to DIFF_DECODED, provably NOT latin-1
    c5 = (b"BT /F1 12 Tf 72 720 Td (Differences page of document %d: ) Tj "
          b"/FD 12 Tf (ABC abc) Tj ET\n") % i
    # page 6: no /Resources on the page — /F1 and /Im1 resolve through
    # the /Pages ancestor (inherited-attribute path)
    c6 = (b"BT /F1 12 Tf 72 720 Td "
          b"(Inherited resources page of document %d.) Tj ET\n"
          b"q 80 0 0 60 72 600 cm /Im1 Do Q\n"
          b"BT /F1 12 Tf 72 520 Td (Text below the inherited image.) Tj ET\n"
          ) % i

    dicts = [
        (1, b"<< /Type /Catalog /Pages 2 0 R >>"),
        # the /Pages node carries /Resources for page 6 to inherit
        (2, b"<< /Type /Pages "
            b"/Kids [3 0 R 4 0 R 13 0 R 15 0 R 17 0 R 20 0 R] /Count 6 "
            b"/Resources << /Font << /F1 9 0 R >> "
            b"/XObject << /Im1 8 0 R >> >> >>"),
        (3, b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Resources 7 0 R /Contents 5 0 R >>"),
        (4, b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Resources << /Font << /F1 9 0 R >> >> /Contents 6 0 R >>"),
        (7, b"<< /Font << /F1 9 0 R >> /XObject << /Im1 8 0 R >> >>"),
        (9, b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"),
        (10, b"<< /Type /Font /Subtype /Type0 /BaseFont /SynthCID "
             b"/Encoding /Identity-H /DescendantFonts [11 0 R] "
             b"/ToUnicode 12 0 R >>"),
        (11, b"<< /Type /Font /Subtype /CIDFontType2 /BaseFont /SynthCID "
             b"/CIDSystemInfo << /Registry (Adobe) /Ordering (Identity) "
             b"/Supplement 0 >> >>"),
        (13, b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
             b"/Resources << /Font << /F2 10 0 R >> >> /Contents 14 0 R >>"),
        (15, b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
             b"/Resources << /Font << /F1 9 0 R >> >> /Contents 16 0 R >>"),
        (17, b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
             b"/Resources << /Font << /F1 9 0 R /FD 19 0 R >> >> "
             b"/Contents 18 0 R >>"),
        (19, b"<< /Type /Font /Subtype /Type1 /BaseFont /Synthetic "
             b"/Encoding << /Type /Encoding /BaseEncoding /WinAnsiEncoding "
             + _DIFF_ARRAY + b" >> >>"),
        (20, b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
             b"/Contents 21 0 R >>"),
    ]
    filt_spec, filt_payload = _filtered_payload(c4, i)
    streams = [
        (5, *_flate_payload(bytes(c1), b"", compress=bool(i % 2))),
        (6, b"", bytes(c2)),
        (8, b"/Type /XObject /Subtype /Image /Width 8 /Height 8 "
            b"/ColorSpace /DeviceGray /BitsPerComponent 8 ", img_data),
        (12, *_flate_payload(cmap, b"", compress=True)),
        (14, b"", c3),
        (16, filt_spec, filt_payload),
        (18, b"", c5),
        (21, b"", c6),
    ]
    if variant is None:
        variant = assembly_variant(i)
    enc = None
    if "rc4" in variant:
        enc = _encryption_assets(i, rev=2 if variant.endswith("40") else 3)
    elif "aesv2" in variant:
        enc = _encryption_assets_aesv2(i)
    elif "aes256" in variant:
        enc = _encryption_assets_aes256(i)
    if variant.startswith("objstm"):
        return _emit_objstm(dicts, streams, enc)
    return _emit_classic(dicts, streams, enc)


def pdf_corpus_rows(n_docs: int = 8) -> list[tuple[int, bytes]]:
    """(doc_id, pdf binary) rows — the PDF analog of the fixture corpus."""
    return [(100000 + i, make_pdf(i)) for i in range(n_docs)]
