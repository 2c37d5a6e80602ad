"""Pure-Python AES (FIPS-197) + CBC helpers for the PDF standard
security handler's AES modes (§7.6.2 /AESV2, ISO 32000-2 §7.6.4.3
/AESV3). Decrypt is the hot direction (per-object stream decryption);
encrypt exists for the Algorithm 2.B key-derivation loop (which runs
AES-128-CBC *encrypt* inside the hash hardening) and for tests.

Two tiers, dispatched per call:

* the BULK path routes CBC through the ``cryptography`` package
  (OpenSSL, AES-NI) when it is importable — Algorithm 2.B alone
  encrypts ~10k blocks per key derivation, which costs ~0.6 s/doc in
  pure Python vs <1 ms native, and every AES-256 doc derives a fresh
  key (salts are per-document, so nothing amortizes);
* the PURE path (always present, used when the import fails, and
  force-selectable by tests) follows the spec's algebraic form —
  S-box from the GF(2^8) multiplicative inverse + affine transform,
  MixColumns via xtime — with the FIPS-197 Appendix C vectors pinned
  in tests/test_pdf.py (test_aes_fips197_vectors) and a pure-vs-native
  CBC differential (test_aes_native_pure_differential).

No reference analog (SmartReader has no PDF path); cited by
kernel/pdfkit._build_decryptor.
"""

from __future__ import annotations

try:  # optional native AES (OpenSSL); the pure path below is the fallback
    from cryptography.hazmat.primitives.ciphers import (
        Cipher as _Cipher,
        algorithms as _algorithms,
        modes as _modes,
    )

    _HAVE_NATIVE = True
except ImportError:  # pragma: no cover - environment without cryptography
    _HAVE_NATIVE = False

# --- GF(2^8) tables -------------------------------------------------------

def _build_sbox() -> tuple[bytes, bytes]:
    # multiplicative inverse via exp/log tables over generator 3
    exp = [0] * 512
    log = [0] * 256
    x = 1
    for i in range(255):
        exp[i] = x
        log[x] = i
        # multiply by the generator 0x03 = x + 1
        x ^= (x << 1) ^ (0x11B if x & 0x80 else 0)
    for i in range(255, 512):
        exp[i] = exp[i - 255]
    sbox = bytearray(256)
    inv_sbox = bytearray(256)
    for c in range(256):
        inv = 0 if c == 0 else exp[255 - log[c]]
        # affine transform: b ^ rot1(b) ^ rot2(b) ^ rot3(b) ^ rot4(b) ^ 0x63
        b = inv
        s = 0x63
        for k in range(5):
            s ^= b
            b = ((b << 1) | (b >> 7)) & 0xFF
        sbox[c] = s
        inv_sbox[s] = c
    return bytes(sbox), bytes(inv_sbox)


_SBOX, _INV_SBOX = _build_sbox()
_RCON = (0x01, 0x02, 0x04, 0x08, 0x10, 0x20, 0x40, 0x80, 0x1B, 0x36,
         0x6C, 0xD8, 0xAB, 0x4D)


def _xtime(a: int) -> int:
    a <<= 1
    return (a ^ 0x1B) & 0xFF if a & 0x100 else a


def _mul(a: int, b: int) -> int:
    r = 0
    while b:
        if b & 1:
            r ^= a
        a = _xtime(a)
        b >>= 1
    return r


def _expand_key(key: bytes) -> list[list[int]]:
    """Key schedule → list of 4-byte words (FIPS-197 §5.2)."""
    nk = len(key) // 4
    if nk not in (4, 6, 8):
        raise ValueError("AES key must be 16/24/32 bytes")
    nr = nk + 6
    words = [list(key[4 * i : 4 * i + 4]) for i in range(nk)]
    for i in range(nk, 4 * (nr + 1)):
        t = list(words[i - 1])
        if i % nk == 0:
            t = t[1:] + t[:1]                       # RotWord
            t = [_SBOX[b] for b in t]               # SubWord
            t[0] ^= _RCON[i // nk - 1]
        elif nk == 8 and i % nk == 4:
            t = [_SBOX[b] for b in t]               # AES-256 extra SubWord
        words.append([a ^ b for a, b in zip(words[i - nk], t)])
    return words


def _add_round_key(st: list[int], words: list[list[int]], rnd: int) -> None:
    for c in range(4):
        w = words[4 * rnd + c]
        for r in range(4):
            st[4 * c + r] ^= w[r]


# state layout: st[4*c + r] = state column c, row r (column-major, the
# same order bytes arrive in the block)

# T-tables: SubBytes+MixColumns fused per input byte, packed as 32-bit
# ints (byte k of T_r[x] = row-k output contribution). Derived at import
# from the spec-built _SBOX/_mul above — a speed layout, not a second
# source of truth (Algorithm 2.B encrypts ~10k blocks per hash; the
# naive per-byte _mul form cost seconds per hash).
def _build_ttables() -> list[list[int]]:
    tabs: list[list[int]] = [[0] * 256 for _ in range(4)]
    cols = (
        (2, 1, 1, 3),  # contribution of shifted-row-0 byte to rows 0..3
        (3, 2, 1, 1),
        (1, 3, 2, 1),
        (1, 1, 3, 2),
    )
    for x in range(256):
        s = _SBOX[x]
        for r in range(4):
            c0, c1, c2, c3 = cols[r]
            tabs[r][x] = (
                (_mul(s, c0) << 24) | (_mul(s, c1) << 16)
                | (_mul(s, c2) << 8) | _mul(s, c3)
            )
    return tabs


_TE0, _TE1, _TE2, _TE3 = _build_ttables()


def _pack_words(words: list[list[int]]) -> list[int]:
    """Round-key words as 32-bit ints, packed ONCE per key (the block
    loop would otherwise repack per block)."""
    return [(w[0] << 24) | (w[1] << 16) | (w[2] << 8) | w[3] for w in words]


def _cipher_block(block: bytes, pw: list[int], nr: int) -> bytes:
    s0 = ((block[0] << 24) | (block[1] << 16) | (block[2] << 8)
          | block[3]) ^ pw[0]
    s1 = ((block[4] << 24) | (block[5] << 16) | (block[6] << 8)
          | block[7]) ^ pw[1]
    s2 = ((block[8] << 24) | (block[9] << 16) | (block[10] << 8)
          | block[11]) ^ pw[2]
    s3 = ((block[12] << 24) | (block[13] << 16) | (block[14] << 8)
          | block[15]) ^ pw[3]
    for rnd in range(1, nr):
        k = 4 * rnd
        t0 = (_TE0[(s0 >> 24) & 0xFF] ^ _TE1[(s1 >> 16) & 0xFF]
              ^ _TE2[(s2 >> 8) & 0xFF] ^ _TE3[s3 & 0xFF] ^ pw[k])
        t1 = (_TE0[(s1 >> 24) & 0xFF] ^ _TE1[(s2 >> 16) & 0xFF]
              ^ _TE2[(s3 >> 8) & 0xFF] ^ _TE3[s0 & 0xFF] ^ pw[k + 1])
        t2 = (_TE0[(s2 >> 24) & 0xFF] ^ _TE1[(s3 >> 16) & 0xFF]
              ^ _TE2[(s0 >> 8) & 0xFF] ^ _TE3[s1 & 0xFF] ^ pw[k + 2])
        t3 = (_TE0[(s3 >> 24) & 0xFF] ^ _TE1[(s0 >> 16) & 0xFF]
              ^ _TE2[(s1 >> 8) & 0xFF] ^ _TE3[s2 & 0xFF] ^ pw[k + 3])
        s0, s1, s2, s3 = t0, t1, t2, t3
    # final round: SubBytes + ShiftRows + AddRoundKey (no MixColumns)
    out = bytearray(16)
    src = (s0, s1, s2, s3)
    k = 4 * nr
    for c in range(4):
        w = pw[k + c]
        out[4 * c + 0] = _SBOX[(src[c] >> 24) & 0xFF] ^ ((w >> 24) & 0xFF)
        out[4 * c + 1] = (_SBOX[(src[(c + 1) % 4] >> 16) & 0xFF]
                          ^ ((w >> 16) & 0xFF))
        out[4 * c + 2] = (_SBOX[(src[(c + 2) % 4] >> 8) & 0xFF]
                          ^ ((w >> 8) & 0xFF))
        out[4 * c + 3] = _SBOX[src[(c + 3) % 4] & 0xFF] ^ (w & 0xFF)
    return bytes(out)


def _inv_cipher_block(block: bytes, words: list[list[int]], nr: int) -> bytes:
    st = list(block)
    _add_round_key(st, words, nr)
    for rnd in range(nr - 1, -1, -1):
        st = [st[(4 * ((c - r) % 4)) + r]               # InvShiftRows
              for c in range(4) for r in range(4)]
        st = [_INV_SBOX[b] for b in st]                 # InvSubBytes
        _add_round_key(st, words, rnd)
        if rnd > 0:                                     # InvMixColumns
            out = [0] * 16
            for c in range(4):
                a = st[4 * c : 4 * c + 4]
                out[4 * c + 0] = (_mul(a[0], 14) ^ _mul(a[1], 11)
                                  ^ _mul(a[2], 13) ^ _mul(a[3], 9))
                out[4 * c + 1] = (_mul(a[0], 9) ^ _mul(a[1], 14)
                                  ^ _mul(a[2], 11) ^ _mul(a[3], 13))
                out[4 * c + 2] = (_mul(a[0], 13) ^ _mul(a[1], 9)
                                  ^ _mul(a[2], 14) ^ _mul(a[3], 11))
                out[4 * c + 3] = (_mul(a[0], 11) ^ _mul(a[1], 13)
                                  ^ _mul(a[2], 9) ^ _mul(a[3], 14))
            st = out
    return bytes(st)


def aes_encrypt_block(key: bytes, block: bytes) -> bytes:
    pw = _pack_words(_expand_key(key))
    return _cipher_block(block, pw, len(key) // 4 + 6)


def aes_decrypt_block(key: bytes, block: bytes) -> bytes:
    words = _expand_key(key)
    return _inv_cipher_block(block, words, len(key) // 4 + 6)


def aes_cbc_encrypt_pure(key: bytes, iv: bytes, data: bytes) -> bytes:
    """Pure-Python CBC encrypt WITHOUT padding (callers pad; Algorithm
    2.B feeds exact multiples of 16)."""
    if len(data) % 16:
        raise ValueError("aes_cbc_encrypt needs 16-byte-aligned input")
    pw = _pack_words(_expand_key(key))
    nr = len(key) // 4 + 6
    out = bytearray()
    prev = iv
    for i in range(0, len(data), 16):
        blk = bytes(a ^ b for a, b in zip(data[i : i + 16], prev))
        prev = _cipher_block(blk, pw, nr)
        out += prev
    return bytes(out)


def aes_cbc_decrypt_pure(key: bytes, iv: bytes, data: bytes) -> bytes:
    """Pure-Python CBC decrypt WITHOUT unpadding (PDF /UE and /Perms
    entries are unpadded; stream payloads unpad via `strip_pkcs7`)."""
    words = _expand_key(key)
    nr = len(key) // 4 + 6
    out = bytearray()
    prev = iv
    for i in range(0, len(data), 16):
        blk = data[i : i + 16]
        out += bytes(a ^ b for a, b in zip(_inv_cipher_block(blk, words, nr), prev))
        prev = blk
    return bytes(out)


def aes_cbc_encrypt(key: bytes, iv: bytes, data: bytes) -> bytes:
    """CBC encrypt WITHOUT padding — native (OpenSSL) when available,
    else the FIPS-pinned pure path."""
    if len(data) % 16:
        raise ValueError("aes_cbc_encrypt needs 16-byte-aligned input")
    if _HAVE_NATIVE:
        enc = _Cipher(_algorithms.AES(key), _modes.CBC(iv)).encryptor()
        return enc.update(data) + enc.finalize()
    return aes_cbc_encrypt_pure(key, iv, data)


def aes_cbc_decrypt(key: bytes, iv: bytes, data: bytes) -> bytes:
    """CBC decrypt WITHOUT unpadding; ragged tails are truncated the
    way a permissive reader must (drop the undecryptable remainder
    rather than crash)."""
    if len(data) % 16:
        data = data[: len(data) - (len(data) % 16)]
    if _HAVE_NATIVE:
        dec = _Cipher(_algorithms.AES(key), _modes.CBC(iv)).decryptor()
        return dec.update(data) + dec.finalize()
    return aes_cbc_decrypt_pure(key, iv, data)


def strip_pkcs7(data: bytes) -> bytes:
    """Remove RFC-2315 padding; malformed padding returns the input
    unchanged (degraded-not-crashed posture — the content-stream lexer
    tolerates trailing garbage)."""
    if not data:
        return data
    n = data[-1]
    if 1 <= n <= 16 and len(data) >= n and data[-n:] == bytes([n]) * n:
        return data[:-n]
    return data
