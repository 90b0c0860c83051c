"""Standard security handler (ISO 32000-1 §7.6.3): empty-user-password
decryption for crawled PDFs.

A meaningful share of crawled PDFs are "encrypted" with the standard
handler and an EMPTY user password — readable by every viewer, the
encryption only enforcing owner permissions.  A crawl extractor should
read those and reserve the error for genuinely password-protected
documents.  Supported: /R 2-4 with RC4-40..128 (/V 1-2, /V 4 CFM /V2),
AES-128-CBC (/V 4 CFM /AESV2), and AES-256 (/V 5, /R 5-6 per ISO
32000-2 §7.6.4 — both the empty USER and empty OWNER password shapes).
Non-Standard filters raise PdfError — detect-and-skip.

Everything here is derived from the published specs (ISO 32000-1 key
derivation Algorithms 2-5 in §7.6.3.3-4, ISO 32000-2 Algorithms
2.A/2.B/11/12 in §7.6.4, RC4 as in its public description, AES from
FIPS-197 — the key schedule generalizes over Nk for 128/256-bit keys).
AES block decryption is numpy-vectorized across a stream's blocks (CBC
decryption parallelizes; only CBC *encryption* chains), with a scalar
fallback; the writer side (sources/pdfcorpus) uses the sequential
scalar cipher.
"""

from __future__ import annotations

import hashlib
import struct

from .pdfparse import PdfError

__all__ = [
    "StandardSecurityHandler",
    "WriterCrypt",
    "rc4",
    "aes_cbc_decrypt",
    "aes_cbc_encrypt",
]

_PAD = bytes(
    [
        0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
        0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
        0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
        0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A,
    ]
)


def _pad_password(pw: bytes) -> bytes:
    return (pw + _PAD)[:32]


# ---------------------------------------------------------------------------
# RC4
# ---------------------------------------------------------------------------

# Optional C-backed RC4 (the `cryptography` package, which carries its own
# RC4 for legacy formats): ~30x the pure-Python keystream on the decrypt
# hot path.  PDF object keys are 5-16 bytes; the few sizes the backend
# rejects (e.g. 96-bit from /Length 56) take the pure-Python path below —
# same keystream either way, RC4 has exactly one definition.
try:  # pragma: no cover - import shape varies across cryptography versions
    try:
        from cryptography.hazmat.decrepit.ciphers.algorithms import ARC4 as _ARC4
    except ImportError:
        from cryptography.hazmat.primitives.ciphers.algorithms import (
            ARC4 as _ARC4,
        )
    from cryptography.hazmat.primitives.ciphers import Cipher as _Cipher

    _ARC4_KEY_BITS = frozenset(_ARC4.key_sizes)
except ImportError:
    _ARC4 = None
    _ARC4_KEY_BITS = frozenset()


def rc4(key: bytes, data: bytes) -> bytes:
    """RC4 stream cipher (symmetric: encrypt == decrypt)."""
    if _ARC4 is not None and len(key) * 8 in _ARC4_KEY_BITS:
        return _Cipher(_ARC4(key), mode=None).encryptor().update(data)
    S = list(range(256))
    j = 0
    klen = len(key)
    for i in range(256):
        j = (j + S[i] + key[i % klen]) & 0xFF
        S[i], S[j] = S[j], S[i]
    out = bytearray(len(data))
    i = j = 0
    for n, c in enumerate(data):
        i = (i + 1) & 0xFF
        j = (j + S[i]) & 0xFF
        S[i], S[j] = S[j], S[i]
        out[n] = c ^ S[(S[i] + S[j]) & 0xFF]
    return bytes(out)


# ---------------------------------------------------------------------------
# AES-128 (FIPS-197) — tables generated, not transcribed
# ---------------------------------------------------------------------------


def _gmul(a: int, b: int) -> int:
    p = 0
    for _ in range(8):
        if b & 1:
            p ^= a
        hi = a & 0x80
        a = (a << 1) & 0xFF
        if hi:
            a ^= 0x1B
        b >>= 1
    return p


def _build_sbox() -> tuple[bytes, bytes]:
    # multiplicative inverse in GF(2^8) then the affine transform
    inv = [0] * 256
    for x in range(1, 256):
        for y in range(1, 256):
            if _gmul(x, y) == 1:
                inv[x] = y
                break
    sbox = bytearray(256)
    for x in range(256):
        b = inv[x]
        res = 0
        for i in range(8):
            bit = (
                (b >> i)
                ^ (b >> ((i + 4) % 8))
                ^ (b >> ((i + 5) % 8))
                ^ (b >> ((i + 6) % 8))
                ^ (b >> ((i + 7) % 8))
                ^ (0x63 >> i)
            ) & 1
            res |= bit << i
        sbox[x] = res
    inv_sbox = bytearray(256)
    for x in range(256):
        inv_sbox[sbox[x]] = x
    return bytes(sbox), bytes(inv_sbox)


_SBOX, _INV_SBOX = _build_sbox()
_MUL = {
    n: bytes(_gmul(x, n) for x in range(256))
    for n in (2, 3, 9, 11, 13, 14)
}
_RCON = [0x01, 0x02, 0x04, 0x08, 0x10, 0x20, 0x40, 0x80, 0x1B, 0x36]


def _expand_key(key: bytes) -> list[bytes]:
    """Round keys as (Nr+1) × 16-byte blocks — FIPS-197 key schedule for
    AES-128 (Nk=4, Nr=10) and AES-256 (Nk=8, Nr=14)."""
    nk = len(key) // 4
    if nk not in (4, 8):
        raise PdfError(f"bad AES key length {len(key)}")
    nr = nk + 6
    words = [key[i : i + 4] for i in range(0, len(key), 4)]
    while len(words) < 4 * (nr + 1):
        w = words[-1]
        if len(words) % nk == 0:
            rot = bytes(_SBOX[b] for b in w[1:] + w[:1])
            rcon = _RCON[len(words) // nk - 1]
            w = bytes(
                a ^ b ^ (rcon if i == 0 else 0)
                for i, (a, b) in enumerate(zip(words[-nk], rot))
            )
        elif nk == 8 and len(words) % nk == 4:
            sub = bytes(_SBOX[b] for b in w)
            w = bytes(a ^ b for a, b in zip(words[-nk], sub))
        else:
            w = bytes(a ^ b for a, b in zip(words[-nk], w))
        words.append(w)
    return [b"".join(words[i : i + 4]) for i in range(0, 4 * (nr + 1), 4)]


_SHIFT = [0, 5, 10, 15, 4, 9, 14, 3, 8, 13, 2, 7, 12, 1, 6, 11]
_INV_SHIFT = [0, 13, 10, 7, 4, 1, 14, 11, 8, 5, 2, 15, 12, 9, 6, 3]

# packed T-tables for the forward cipher (the writer's CBC encryption is
# the one path that cannot be vectorized across blocks — each block
# chains on the previous ciphertext — so the scalar loop must be tight)
_TE0 = [
    (_MUL[2][_SBOX[x]] << 24)
    | (_SBOX[x] << 16)
    | (_SBOX[x] << 8)
    | _MUL[3][_SBOX[x]]
    for x in range(256)
]
_TE1 = [((t >> 8) | ((t & 0xFF) << 24)) for t in _TE0]
_TE2 = [((t >> 8) | ((t & 0xFF) << 24)) for t in _TE1]
_TE3 = [((t >> 8) | ((t & 0xFF) << 24)) for t in _TE2]


def _rk_words(rk: list[bytes]) -> list[list[int]]:
    return [
        [int.from_bytes(k[i : i + 4], "big") for i in range(0, 16, 4)]
        for k in rk
    ]


def _encrypt_block_words(w0: int, w1: int, w2: int, w3: int, rkw) -> tuple:
    t0, t1, t2, t3 = _TE0, _TE1, _TE2, _TE3
    nr = len(rkw) - 1
    k = rkw[0]
    s0, s1, s2, s3 = w0 ^ k[0], w1 ^ k[1], w2 ^ k[2], w3 ^ k[3]
    for rnd in range(1, nr):
        k = rkw[rnd]
        u0 = (
            t0[s0 >> 24]
            ^ t1[(s1 >> 16) & 0xFF]
            ^ t2[(s2 >> 8) & 0xFF]
            ^ t3[s3 & 0xFF]
            ^ k[0]
        )
        u1 = (
            t0[s1 >> 24]
            ^ t1[(s2 >> 16) & 0xFF]
            ^ t2[(s3 >> 8) & 0xFF]
            ^ t3[s0 & 0xFF]
            ^ k[1]
        )
        u2 = (
            t0[s2 >> 24]
            ^ t1[(s3 >> 16) & 0xFF]
            ^ t2[(s0 >> 8) & 0xFF]
            ^ t3[s1 & 0xFF]
            ^ k[2]
        )
        u3 = (
            t0[s3 >> 24]
            ^ t1[(s0 >> 16) & 0xFF]
            ^ t2[(s1 >> 8) & 0xFF]
            ^ t3[s2 & 0xFF]
            ^ k[3]
        )
        s0, s1, s2, s3 = u0, u1, u2, u3
    sb = _SBOX
    k = rkw[nr]
    r0 = (
        (sb[s0 >> 24] << 24)
        | (sb[(s1 >> 16) & 0xFF] << 16)
        | (sb[(s2 >> 8) & 0xFF] << 8)
        | sb[s3 & 0xFF]
    ) ^ k[0]
    r1 = (
        (sb[s1 >> 24] << 24)
        | (sb[(s2 >> 16) & 0xFF] << 16)
        | (sb[(s3 >> 8) & 0xFF] << 8)
        | sb[s0 & 0xFF]
    ) ^ k[1]
    r2 = (
        (sb[s2 >> 24] << 24)
        | (sb[(s3 >> 16) & 0xFF] << 16)
        | (sb[(s0 >> 8) & 0xFF] << 8)
        | sb[s1 & 0xFF]
    ) ^ k[2]
    r3 = (
        (sb[s3 >> 24] << 24)
        | (sb[(s0 >> 16) & 0xFF] << 16)
        | (sb[(s1 >> 8) & 0xFF] << 8)
        | sb[s2 & 0xFF]
    ) ^ k[3]
    return r0, r1, r2, r3


def _encrypt_block(block: bytes, rk: list[bytes]) -> bytes:
    w = [int.from_bytes(block[i : i + 4], "big") for i in range(0, 16, 4)]
    r = _encrypt_block_words(w[0], w[1], w[2], w[3], _rk_words(rk))
    return b"".join(x.to_bytes(4, "big") for x in r)


def _decrypt_block(block: bytes, rk: list[bytes]) -> bytes:
    nr = len(rk) - 1
    s = bytes(a ^ b for a, b in zip(block, rk[nr]))
    m9, m11, m13, m14 = _MUL[9], _MUL[11], _MUL[13], _MUL[14]
    for rnd in range(nr - 1, 0, -1):
        s = bytes(_INV_SBOX[s[i]] for i in _INV_SHIFT)
        s = bytes(a ^ b for a, b in zip(s, rk[rnd]))
        mixed = bytearray(16)
        for c in range(4):
            a0, a1, a2, a3 = s[4 * c : 4 * c + 4]
            mixed[4 * c] = m14[a0] ^ m11[a1] ^ m13[a2] ^ m9[a3]
            mixed[4 * c + 1] = m9[a0] ^ m14[a1] ^ m11[a2] ^ m13[a3]
            mixed[4 * c + 2] = m13[a0] ^ m9[a1] ^ m14[a2] ^ m11[a3]
            mixed[4 * c + 3] = m11[a0] ^ m13[a1] ^ m9[a2] ^ m14[a3]
        s = bytes(mixed)
    s = bytes(_INV_SBOX[s[i]] for i in _INV_SHIFT)
    return bytes(a ^ b for a, b in zip(s, rk[0]))


def _ecb_decrypt_np(blocks: bytes, rk: list[bytes]):
    """Vectorized inverse cipher over ALL blocks at once (CBC decryption
    parallelizes across blocks — only encryption chains)."""
    import numpy as np

    n = len(blocks) // 16
    s = np.frombuffer(blocks, dtype=np.uint8).reshape(n, 16).copy()
    sbox_inv = np.frombuffer(_INV_SBOX, dtype=np.uint8)
    mul = {k: np.frombuffer(v, dtype=np.uint8) for k, v in _MUL.items()}
    inv_shift = np.array(_INV_SHIFT)
    rks = [np.frombuffer(k, dtype=np.uint8) for k in rk]
    nr = len(rks) - 1
    s ^= rks[nr]
    for rnd in range(nr - 1, 0, -1):
        s = sbox_inv[s[:, inv_shift]]
        s ^= rks[rnd]
        a0, a1, a2, a3 = (s[:, i::4] for i in range(4))
        m9, m11, m13, m14 = mul[9], mul[11], mul[13], mul[14]
        b0 = m14[a0] ^ m11[a1] ^ m13[a2] ^ m9[a3]
        b1 = m9[a0] ^ m14[a1] ^ m11[a2] ^ m13[a3]
        b2 = m13[a0] ^ m9[a1] ^ m14[a2] ^ m11[a3]
        b3 = m11[a0] ^ m13[a1] ^ m9[a2] ^ m14[a3]
        s[:, 0::4], s[:, 1::4], s[:, 2::4], s[:, 3::4] = b0, b1, b2, b3
    s = sbox_inv[s[:, inv_shift]]
    s ^= rks[0]
    return s.reshape(-1).tobytes()


def aes_cbc_decrypt(key: bytes, data: bytes) -> bytes:
    """PDF AESV2 payload: 16-byte IV || ciphertext; PKCS#7 padding
    stripped leniently (hostile padding degrades, never raises)."""
    if len(data) < 32 or len(data) % 16:
        raise PdfError("AESV2 payload not block-aligned")
    iv, ct = data[:16], data[16:]
    if _EVP is not None:
        plain = _evp_cbc_with(_EVP, key, iv, ct, False)
    else:
        rk = _expand_key(key)
        try:
            plain_ecb = _ecb_decrypt_np(ct, rk)
        except ImportError:  # pragma: no cover - numpy always present here
            plain_ecb = b"".join(
                _decrypt_block(ct[i : i + 16], rk)
                for i in range(0, len(ct), 16)
            )
        prev = iv + ct[:-16]
        plain = bytes(a ^ b for a, b in zip(plain_ecb, prev))
    pad = plain[-1]
    if 1 <= pad <= 16:
        plain = plain[:-pad]
    return plain


def aes_cbc_encrypt(key: bytes, iv: bytes, data: bytes) -> bytes:
    """Sequential CBC encryption (writer side): IV || ciphertext with
    PKCS#7 padding.  The IV must be deterministic for a reproducible
    corpus — derive it from content, never from randomness."""
    pad = 16 - (len(data) % 16)
    data = data + bytes([pad]) * pad
    if _EVP is not None:
        return iv + _evp_cbc_with(_EVP, key, iv, data, True)
    rkw = _rk_words(_expand_key(key))
    out = bytearray(iv)
    p0 = int.from_bytes(iv[:4], "big")
    p1 = int.from_bytes(iv[4:8], "big")
    p2 = int.from_bytes(iv[8:12], "big")
    p3 = int.from_bytes(iv[12:16], "big")
    for i in range(0, len(data), 16):
        b = data[i : i + 16]
        p0, p1, p2, p3 = _encrypt_block_words(
            p0 ^ int.from_bytes(b[:4], "big"),
            p1 ^ int.from_bytes(b[4:8], "big"),
            p2 ^ int.from_bytes(b[8:12], "big"),
            p3 ^ int.from_bytes(b[12:16], "big"),
            rkw,
        )
        out += p0.to_bytes(4, "big")
        out += p1.to_bytes(4, "big")
        out += p2.to_bytes(4, "big")
        out += p3.to_bytes(4, "big")
    return bytes(out)


# ---------------------------------------------------------------------------
# OpenSSL EVP acceleration (optional).  The from-scratch FIPS-197 cipher
# above is the reference implementation (pinned against the appendix
# known-answer vectors and used as the fallback); when the platform
# libcrypto that hashlib/ssl already link is loadable, AES-CBC runs
# through EVP instead — the /R 6 Algorithm-2.B password hash is
# spec-mandated ≥64 chained CBC passes, ~0.3 s per derivation in pure
# Python vs ~1 ms with AES-NI.  A differential test pins both paths to
# identical bytes.
# ---------------------------------------------------------------------------


def _load_evp():
    try:
        import ctypes
        import ctypes.util

        name = ctypes.util.find_library("crypto")
        lib = ctypes.CDLL(name or "libcrypto.so")
        lib.EVP_CIPHER_CTX_new.restype = ctypes.c_void_p
        lib.EVP_CIPHER_CTX_free.argtypes = [ctypes.c_void_p]
        for sym in ("EVP_aes_128_cbc", "EVP_aes_256_cbc"):
            getattr(lib, sym).restype = ctypes.c_void_p
        for sym in ("EVP_EncryptInit_ex", "EVP_DecryptInit_ex"):
            getattr(lib, sym).argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_char_p, ctypes.c_char_p,
            ]
        for sym in ("EVP_EncryptUpdate", "EVP_DecryptUpdate"):
            getattr(lib, sym).argtypes = [
                ctypes.c_void_p, ctypes.c_char_p,
                ctypes.POINTER(ctypes.c_int), ctypes.c_char_p, ctypes.c_int,
            ]
        for sym in ("EVP_EncryptFinal_ex", "EVP_DecryptFinal_ex"):
            getattr(lib, sym).argtypes = [
                ctypes.c_void_p, ctypes.c_char_p,
                ctypes.POINTER(ctypes.c_int),
            ]
        lib.EVP_CIPHER_CTX_set_padding.argtypes = [
            ctypes.c_void_p, ctypes.c_int,
        ]
        # smoke-check one round trip before trusting the handle
        probe = _evp_cbc_with(lib, b"k" * 16, b"i" * 16, b"p" * 16, True)
        if (
            _evp_cbc_with(lib, b"k" * 16, b"i" * 16, probe, False)
            != b"p" * 16
        ):
            return None
        return lib
    except Exception:
        return None


def _evp_cbc_with(lib, key: bytes, iv: bytes, data: bytes, encrypt: bool) -> bytes:
    import ctypes

    ctx = lib.EVP_CIPHER_CTX_new()
    if not ctx:
        raise PdfError("EVP context allocation failed")
    try:
        cipher = (
            lib.EVP_aes_128_cbc() if len(key) == 16 else lib.EVP_aes_256_cbc()
        )
        init = lib.EVP_EncryptInit_ex if encrypt else lib.EVP_DecryptInit_ex
        if not init(ctx, cipher, None, key, iv):
            raise PdfError("EVP init failed")
        lib.EVP_CIPHER_CTX_set_padding(ctx, 0)
        out = ctypes.create_string_buffer(len(data) + 16)
        n = ctypes.c_int(0)
        upd = lib.EVP_EncryptUpdate if encrypt else lib.EVP_DecryptUpdate
        if not upd(ctx, out, ctypes.byref(n), data, len(data)):
            raise PdfError("EVP update failed")
        total = n.value
        fin = lib.EVP_EncryptFinal_ex if encrypt else lib.EVP_DecryptFinal_ex
        tail = ctypes.create_string_buffer(16)
        if not fin(ctx, tail, ctypes.byref(n)):
            raise PdfError("EVP final failed")
        return out.raw[:total] + tail.raw[: n.value]
    finally:
        lib.EVP_CIPHER_CTX_free(ctx)


_EVP = _load_evp()


def _cbc_decrypt_nopad(key: bytes, iv: bytes, ct: bytes) -> bytes:
    """Raw CBC decryption, explicit IV, no padding removal — the shape
    ISO 32000-2 uses for /UE //OE (zero IV, exactly two blocks)."""
    if not ct or len(ct) % 16:
        raise PdfError("CBC payload not block-aligned")
    if _EVP is not None:
        return _evp_cbc_with(_EVP, key, iv, ct, False)
    rk = _expand_key(key)
    try:
        plain_ecb = _ecb_decrypt_np(ct, rk)
    except ImportError:  # pragma: no cover - numpy always present here
        plain_ecb = b"".join(
            _decrypt_block(ct[i : i + 16], rk) for i in range(0, len(ct), 16)
        )
    prev = iv + ct[:-16]
    return bytes(a ^ b for a, b in zip(plain_ecb, prev))


def _cbc_encrypt_nopad(key: bytes, iv: bytes, data: bytes) -> bytes:
    """Raw CBC encryption, explicit IV, NO padding and no IV prefix —
    used by Algorithm 2.B's inner AES-128 step and the writer's /UE /OE."""
    if len(data) % 16:
        raise PdfError("CBC plaintext not block-aligned")
    if _EVP is not None:
        return _evp_cbc_with(_EVP, key, iv, data, True)
    rkw = _rk_words(_expand_key(key))
    out = bytearray()
    p0 = int.from_bytes(iv[:4], "big")
    p1 = int.from_bytes(iv[4:8], "big")
    p2 = int.from_bytes(iv[8:12], "big")
    p3 = int.from_bytes(iv[12:16], "big")
    for i in range(0, len(data), 16):
        b = data[i : i + 16]
        p0, p1, p2, p3 = _encrypt_block_words(
            p0 ^ int.from_bytes(b[:4], "big"),
            p1 ^ int.from_bytes(b[4:8], "big"),
            p2 ^ int.from_bytes(b[8:12], "big"),
            p3 ^ int.from_bytes(b[12:16], "big"),
            rkw,
        )
        out += p0.to_bytes(4, "big")
        out += p1.to_bytes(4, "big")
        out += p2.to_bytes(4, "big")
        out += p3.to_bytes(4, "big")
    return bytes(out)


def _ecb_encrypt_block(key: bytes, block: bytes) -> bytes:
    """Single-block ECB encryption (the /Perms entry)."""
    return _encrypt_block(block, _expand_key(key))


# ---------------------------------------------------------------------------
# Key derivation (ISO 32000-1 §7.6.3.3, Algorithms 2-5;
# ISO 32000-2 §7.6.4.3.3-4, Algorithms 2.A/2.B for AES-256)
# ---------------------------------------------------------------------------


def _hash_2b(password: bytes, salt: bytes, udata: bytes) -> bytes:
    """ISO 32000-2 Algorithm 2.B (revision 6 password hash): an
    iterated SHA-256/384/512 + AES-128-CBC mix, ≥64 rounds, data-
    dependent termination.  `udata` is empty for user-password hashes
    and the 48-byte /U string for owner-password hashes."""
    k = hashlib.sha256(password + salt + udata).digest()
    i = 0
    e = b"\x00"
    while i < 64 or e[-1] > i - 32:
        k1 = (password + k + udata) * 64
        e = _cbc_encrypt_nopad(k[:16], k[16:32], k1)
        mod = sum(e[:16]) % 3
        if mod == 0:
            k = hashlib.sha256(e).digest()
        elif mod == 1:
            k = hashlib.sha384(e).digest()
        else:
            k = hashlib.sha512(e).digest()
        i += 1
    return k[:32]


def _hash_r5(password: bytes, salt: bytes, udata: bytes) -> bytes:
    """Revision 5 (the deprecated pre-2.0 AES-256 extension): plain
    SHA-256 over password || salt || udata."""
    return hashlib.sha256(password + salt + udata).digest()


def _pw_hash_v5(password: bytes, salt: bytes, udata: bytes, r: int) -> bytes:
    return (
        _hash_2b(password, salt, udata)
        if r == 6
        else _hash_r5(password, salt, udata)
    )


def _file_key(
    password: bytes,
    o_entry: bytes,
    p: int,
    id0: bytes,
    r: int,
    key_len: int,
    encrypt_metadata: bool = True,
) -> bytes:
    """Algorithm 2: the file encryption key."""
    h = hashlib.md5()
    h.update(_pad_password(password))
    h.update(o_entry[:32])
    h.update(struct.pack("<i", p))
    h.update(id0)
    if r >= 4 and not encrypt_metadata:
        h.update(b"\xff\xff\xff\xff")
    digest = h.digest()
    if r >= 3:
        for _ in range(50):
            digest = hashlib.md5(digest[:key_len]).digest()
    return digest[:key_len]


def _compute_o(owner_pw: bytes, user_pw: bytes, r: int, key_len: int) -> bytes:
    """Algorithm 3: the /O entry."""
    digest = hashlib.md5(_pad_password(owner_pw)).digest()
    if r >= 3:
        for _ in range(50):
            digest = hashlib.md5(digest).digest()
    key = digest[:key_len]
    o = rc4(key, _pad_password(user_pw))
    if r >= 3:
        for i in range(1, 20):
            o = rc4(bytes(b ^ i for b in key), o)
    return o


def _compute_u(file_key: bytes, id0: bytes, r: int) -> bytes:
    """Algorithm 4 (R2) / 5 (R>=3): the /U entry."""
    if r == 2:
        return rc4(file_key, _PAD)
    digest = hashlib.md5(_PAD + id0).digest()
    u = rc4(file_key, digest)
    for i in range(1, 20):
        u = rc4(bytes(b ^ i for b in file_key), u)
    return u + b"\x00" * 16  # padded to 32 bytes, tail arbitrary


def _object_key(file_key: bytes, num: int, gen: int, aes: bool) -> bytes:
    """Algorithm 1's per-object key."""
    h = hashlib.md5()
    h.update(file_key)
    h.update(struct.pack("<I", num)[:3])
    h.update(struct.pack("<I", gen)[:2])
    if aes:
        h.update(b"sAlT")
    return h.digest()[: min(len(file_key) + 5, 16)]


def _enc_int(v, what: str) -> int:
    """Hostile /Encrypt values (a Name where a number belongs) must be
    PdfError — the operator contract is error row, never task failure."""
    if isinstance(v, bool) or not isinstance(v, (int, float)):
        raise PdfError(f"encrypted document (non-numeric /{what})")
    return int(v)


class StandardSecurityHandler:
    """Reader side: verify the EMPTY user (or owner) password and
    decrypt strings / streams.  /R 2-4 (RC4 / AES-128) and /R 5-6
    (AES-256, ISO 32000-2 §7.6.4).  Strings and streams may name
    DIFFERENT crypt filters (/StrF vs /StmF) and each is honoured.
    Raises PdfError for unsupported revisions, non-Standard filters,
    hostile dictionary shapes, or a real (non-empty) password."""

    def __init__(self, enc: dict, id0: bytes, resolve=lambda x: x) -> None:
        filt = str(resolve(enc.get("Filter", "")))
        if filt != "Standard":
            raise PdfError(f"encrypted document (unsupported filter {filt})")
        v = _enc_int(resolve(enc.get("V", 0)), "V")
        r = _enc_int(resolve(enc.get("R", 0)), "R")
        if v == 5:
            if r not in (5, 6):
                raise PdfError(
                    f"encrypted document (unsupported /R {r} /V {v})"
                )
            self._init_v5(enc, r, resolve)
            return
        if r not in (2, 3, 4) or v not in (1, 2, 4):
            raise PdfError(
                f"encrypted document (unsupported /R {r} /V {v})"
            )
        self.v5 = False
        o = resolve(enc.get("O"))
        u = resolve(enc.get("U"))
        if not isinstance(o, bytes) or not isinstance(u, bytes):
            raise PdfError("encrypted document (missing /O or /U)")
        p = _enc_int(resolve(enc.get("P", -1)), "P")
        length_bits = _enc_int(resolve(enc.get("Length", 40)), "Length")
        key_len = 5 if r == 2 else max(5, min(16, length_bits // 8))
        encrypt_metadata = resolve(enc.get("EncryptMetadata", True))
        if v == 4:
            cf = resolve(enc.get("CF")) or {}

            def cfm_for(name: str) -> str:
                if name == "Identity":
                    return "Identity"
                cfd = resolve(cf.get(name)) if isinstance(cf, dict) else None
                if cfd is not None and not isinstance(cfd, dict):
                    raise PdfError("encrypted document (bad crypt filter)")
                if cfd is None:
                    # a named filter that /CF cannot resolve: treating it
                    # as Identity would emit ciphertext as text
                    raise PdfError(
                        f"encrypted document (undefined crypt filter {name})"
                    )
                cfm = str(resolve(cfd.get("CFM", "Identity")))
                if cfm not in ("V2", "AESV2", "Identity"):
                    raise PdfError(
                        f"encrypted document (unsupported CFM {cfm})"
                    )
                return cfm

            # /StrF is resolved SEPARATELY: a document may encrypt
            # streams with AESV2 while leaving strings Identity (or use
            # different methods) — decrypting strings with the stream
            # cipher would produce garbage metadata instead of text
            self._stm_cfm = cfm_for(str(resolve(enc.get("StmF", "Identity"))))
            self._str_cfm = cfm_for(str(resolve(enc.get("StrF", "Identity"))))
            if "AESV2" in (self._stm_cfm, self._str_cfm):
                key_len = 16
        else:
            self._stm_cfm = self._str_cfm = "V2"
        self.identity = self._stm_cfm == "Identity" and self._str_cfm == "Identity"
        self.key = (
            b""
            if self.identity
            else _file_key(
                b"", o, p, id0, r, key_len, bool(encrypt_metadata)
            )
        )
        if not self.identity:
            want_u = _compute_u(self.key, id0, r)
            got = u[:32]
            ok = (
                got[:16] == want_u[:16] if r >= 3 else got == want_u[:32]
            )
            if not ok:
                raise PdfError("encrypted document (password required)")

    def _init_v5(self, enc: dict, r: int, resolve) -> None:
        """AES-256 (ISO 32000-2 §7.6.4): /R 5 (deprecated SHA-256
        extension) and /R 6 (PDF 2.0, Algorithm 2.B hash).  Tries the
        empty USER password first (Algorithm 11), then the empty OWNER
        password (Algorithm 12) — both are 'open for every viewer'
        shapes a crawl extractor must read."""
        self.v5 = True
        self._stm_cfm = self._str_cfm = "AESV3"
        o = resolve(enc.get("O"))
        u = resolve(enc.get("U"))
        ue = resolve(enc.get("UE"))
        oe = resolve(enc.get("OE"))
        if not isinstance(o, bytes) or not isinstance(u, bytes):
            raise PdfError("encrypted document (missing /O or /U)")
        if len(o) < 48 or len(u) < 48:
            raise PdfError("encrypted document (short /O or /U)")
        cf = resolve(enc.get("CF")) or {}

        def cfm_for(name: str) -> str:
            if name == "Identity":
                return "Identity"
            cfd = resolve(cf.get(name)) if isinstance(cf, dict) else None
            if cfd is not None and not isinstance(cfd, dict):
                raise PdfError("encrypted document (bad crypt filter)")
            if cfd is None:
                raise PdfError(
                    f"encrypted document (undefined crypt filter {name})"
                )
            cfm = str(resolve(cfd.get("CFM", "Identity")))
            if cfm not in ("AESV3", "Identity"):
                raise PdfError(
                    f"encrypted document (unsupported CFM {cfm} for /V 5)"
                )
            return cfm

        if "StmF" in enc or "StrF" in enc or "CF" in enc:
            self._stm_cfm = cfm_for(str(resolve(enc.get("StmF", "Identity"))))
            self._str_cfm = cfm_for(str(resolve(enc.get("StrF", "Identity"))))
        self.identity = (
            self._stm_cfm == "Identity" and self._str_cfm == "Identity"
        )
        if self.identity:
            self.key = b""
            return
        u48, o48 = u[:48], o[:48]
        if _pw_hash_v5(b"", u48[32:40], b"", r) == u48[:32]:
            if not isinstance(ue, bytes) or len(ue) < 32:
                raise PdfError("encrypted document (missing /UE)")
            inter = _pw_hash_v5(b"", u48[40:48], b"", r)
            self.key = _cbc_decrypt_nopad(inter, b"\x00" * 16, ue[:32])
        elif _pw_hash_v5(b"", o48[32:40], u48, r) == o48[:32]:
            if not isinstance(oe, bytes) or len(oe) < 32:
                raise PdfError("encrypted document (missing /OE)")
            inter = _pw_hash_v5(b"", o48[40:48], u48, r)
            self.key = _cbc_decrypt_nopad(inter, b"\x00" * 16, oe[:32])
        else:
            raise PdfError("encrypted document (password required)")

    def _apply(self, cfm: str, data: bytes, num: int, gen: int) -> bytes:
        if cfm == "Identity":
            return data
        if cfm == "AESV3":
            # Algorithm 1.A: the 32-byte file key is used directly — no
            # per-object key derivation in /V 5
            return aes_cbc_decrypt(self.key, data)
        key = _object_key(self.key, num, gen, cfm == "AESV2")
        if cfm == "AESV2":
            return aes_cbc_decrypt(key, data)
        return rc4(key, data)

    def decrypt(
        self, data: bytes, num: int, gen: int, string: bool = False
    ) -> bytes:
        if self.identity:
            return data
        return self._apply(
            self._str_cfm if string else self._stm_cfm, data, num, gen
        )


class WriterCrypt:
    """Writer side (deterministic corpus): derive O/U/key once, then
    encrypt strings and streams with per-object keys.  cfm: 'RC4' (V2
    for 128-bit / V1 for 40-bit), 'AESV2' (/R 4), or 'AESV3'
    (/R 6, AES-256 per ISO 32000-2 — every salt and the file key are
    derived from id0, never random, so the corpus is byte-reproducible)."""

    def __init__(
        self,
        id0: bytes,
        owner_pw: bytes = b"owner",
        user_pw: bytes = b"",
        r: int = 3,
        length_bits: int = 128,
        cfm: str = "RC4",
        p: int = -44,
    ) -> None:
        self.r, self.p, self.id0 = r, p, id0
        self.aes = cfm in ("AESV2", "AESV3")
        self.v5 = cfm == "AESV3"
        if self.v5:
            if r not in (5, 6):
                r = 6
            self.r = r
            self.length_bits = 256
            h = hashlib.sha256
            self.key = h(b"fk|" + id0).digest()
            vs_u = h(b"vu|" + id0).digest()[:8]
            ks_u = h(b"ku|" + id0).digest()[:8]
            self.u = _pw_hash_v5(user_pw, vs_u, b"", r) + vs_u + ks_u
            self.ue = _cbc_encrypt_nopad(
                _pw_hash_v5(user_pw, ks_u, b"", r), b"\x00" * 16, self.key
            )
            vs_o = h(b"vo|" + id0).digest()[:8]
            ks_o = h(b"ko|" + id0).digest()[:8]
            self.o = _pw_hash_v5(owner_pw, vs_o, self.u, r) + vs_o + ks_o
            self.oe = _cbc_encrypt_nopad(
                _pw_hash_v5(owner_pw, ks_o, self.u, r), b"\x00" * 16, self.key
            )
            perms_plain = (
                struct.pack("<i", p)
                + b"\xff\xff\xff\xff"
                + b"T"  # EncryptMetadata true
                + b"adb"
                + h(b"pr|" + id0).digest()[:4]
            )
            self.perms = _ecb_encrypt_block(self.key, perms_plain)
            return
        key_len = 16 if self.aes else (5 if r == 2 else length_bits // 8)
        self.length_bits = key_len * 8
        self.o = _compute_o(owner_pw, user_pw, r, key_len)
        self.key = _file_key(user_pw, self.o, p, id0, r, key_len)
        self.u = _compute_u(self.key, id0, r)

    def encrypt(self, data: bytes, num: int, gen: int = 0) -> bytes:
        if self.aes:
            # deterministic IV: content+object keyed (never random — the
            # corpus must be byte-reproducible)
            iv = hashlib.md5(
                b"iv|%d|%d|" % (num, gen) + hashlib.md5(data).digest()
            ).digest()
            key = (
                self.key
                if self.v5
                else _object_key(self.key, num, gen, True)
            )
            return aes_cbc_encrypt(key, iv, data)
        return rc4(_object_key(self.key, num, gen, False), data)

    def encrypt_dict(self) -> dict:
        """The /Encrypt dictionary values for the writer."""
        if self.v5:
            return {
                "Filter": "Standard",
                "V": 5,
                "R": self.r,
                "Length": 256,
                "CF": {
                    "StdCF": {
                        "CFM": "AESV3",
                        "AuthEvent": "DocOpen",
                        "Length": 32,
                    }
                },
                "StmF": "StdCF",
                "StrF": "StdCF",
                "O": self.o,
                "U": self.u,
                "OE": self.oe,
                "UE": self.ue,
                "Perms": self.perms,
                "P": self.p,
            }
        if self.aes:
            return {
                "Filter": "Standard",
                "V": 4,
                "R": 4,
                "Length": 128,
                "CF": {
                    "StdCF": {
                        "CFM": "AESV2",
                        "AuthEvent": "DocOpen",
                        "Length": 16,
                    }
                },
                "StmF": "StdCF",
                "StrF": "StdCF",
                "O": self.o,
                "U": self.u,
                "P": self.p,
            }
        v = 1 if self.length_bits == 40 else 2
        d = {
            "Filter": "Standard",
            "V": v,
            "R": self.r,
            "O": self.o,
            "U": self.u,
            "P": self.p,
        }
        if v == 2:
            d["Length"] = self.length_bits
        return d
