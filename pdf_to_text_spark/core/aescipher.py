"""AES-128/256 (FIPS-197) in pure python + numpy — no external crypto.

Exists to decrypt /V 4 (AESV2) PDF streams (PDF 32000 §7.6.2); the
container ships no crypto library, and the algorithm is a fixed public
standard pinned here to the FIPS-197 appendix test vectors.

Decryption is numpy-VECTORIZED across all blocks of a stream: CBC
decryption parallelizes (ECB-decrypt every block, then XOR with the
shifted ciphertext), so cost is a few table-lookup passes per round
over one array — fast enough that the per-row work stays dominated by
inflate + text interpretation. CBC ENCRYPTION is inherently serial per
stream and only used by the fixture writer.
"""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------------- tables

_SBOX = bytes.fromhex(
    "637c777bf26b6fc53001672bfed7ab76ca82c97dfa5947f0add4a2af9ca472c0"
    "b7fd9326363ff7cc34a5e5f171d8311504c723c31896059a071280e2eb27b275"
    "09832c1a1b6e5aa0523bd6b329e32f8453d100ed20fcb15b6acbbe394a4c58cf"
    "d0efaafb434d338545f9027f503c9fa851a3408f929d38f5bcb6da2110fff3d2"
    "cd0c13ec5f974417c4a77e3d645d197360814fdc222a908846eeb814de5e0bdb"
    "e0323a0a4906245cc2d3ac629195e479e7c8376d8dd54ea96c56f4ea657aae08"
    "ba78252e1ca6b4c6e8dd741f4bbd8b8a703eb5664803f60e613557b986c11d9e"
    "e1f8981169d98e949b1e87e9ce5528df8ca1890dbfe6426841992d0fb054bb16"
)
_INV_SBOX = bytearray(256)
for _i, _v in enumerate(_SBOX):
    _INV_SBOX[_v] = _i
_INV_SBOX = bytes(_INV_SBOX)

_RCON = bytes(
    [0x01, 0x02, 0x04, 0x08, 0x10, 0x20, 0x40, 0x80, 0x1B, 0x36, 0x6C, 0xD8, 0xAB, 0x4D]
)


def _xtime_table() -> np.ndarray:
    t = np.arange(256, dtype=np.uint16) << 1
    return ((t ^ np.where(t & 0x100, 0x11B, 0)) & 0xFF).astype(np.uint8)


_X2 = _xtime_table()
_X3 = _X2 ^ np.arange(256, dtype=np.uint8)


def _gf_mul_table(c: int) -> np.ndarray:
    out = np.zeros(256, dtype=np.uint8)
    for a in range(256):
        r, b, m = 0, a, c
        while m:
            if m & 1:
                r ^= b
            hi = b & 0x80
            b = (b << 1) & 0xFF
            if hi:
                b ^= 0x1B
            m >>= 1
        out[a] = r
    return out


_M9, _M11, _M13, _M14 = (_gf_mul_table(c) for c in (9, 11, 13, 14))
_SBOX_NP = np.frombuffer(_SBOX, dtype=np.uint8)
_INV_SBOX_NP = np.frombuffer(_INV_SBOX, dtype=np.uint8)

# flat layout: position i = row (i%4) of column (i//4), per FIPS-197 §3.4
_SHIFT = np.array([(i % 4) + 4 * (((i // 4) + (i % 4)) % 4) for i in range(16)])
_INV_SHIFT = np.array([(i % 4) + 4 * (((i // 4) - (i % 4)) % 4) for i in range(16)])


def expand_key(key: bytes) -> np.ndarray:
    """Key schedule → (rounds+1, 16) uint8 round keys (Nk=4 or 8)."""
    nk = len(key) // 4
    if nk not in (4, 8):
        raise ValueError("AES key must be 16 or 32 bytes")
    rounds = nk + 6
    w = [list(key[4 * i : 4 * i + 4]) for i in range(nk)]
    for i in range(nk, 4 * (rounds + 1)):
        t = list(w[i - 1])
        if i % nk == 0:
            t = [_SBOX[b] for b in t[1:] + t[:1]]
            t[0] ^= _RCON[i // nk - 1]
        elif nk == 8 and i % nk == 4:
            t = [_SBOX[b] for b in t]
        w.append([a ^ b for a, b in zip(w[i - nk], t)])
    ks = np.array(w, dtype=np.uint8).reshape(rounds + 1, 16)
    return ks


def _encrypt_blocks(blocks: np.ndarray, ks: np.ndarray) -> np.ndarray:
    """ECB-encrypt (n, 16) uint8 blocks."""
    s = blocks ^ ks[0]
    rounds = ks.shape[0] - 1
    for rnd in range(1, rounds):
        s = _SBOX_NP[s][:, _SHIFT]
        a0, a1, a2, a3 = (s[:, i::4] for i in range(4))  # rows across columns
        s = np.empty_like(s)
        s[:, 0::4] = _X2[a0] ^ _X3[a1] ^ a2 ^ a3
        s[:, 1::4] = a0 ^ _X2[a1] ^ _X3[a2] ^ a3
        s[:, 2::4] = a0 ^ a1 ^ _X2[a2] ^ _X3[a3]
        s[:, 3::4] = _X3[a0] ^ a1 ^ a2 ^ _X2[a3]
        s ^= ks[rnd]
    s = _SBOX_NP[s][:, _SHIFT] ^ ks[rounds]
    return s


def _decrypt_blocks(blocks: np.ndarray, ks: np.ndarray) -> np.ndarray:
    """ECB-decrypt (n, 16) uint8 blocks (FIPS-197 §5.3 InvCipher)."""
    rounds = ks.shape[0] - 1
    s = blocks ^ ks[rounds]
    for rnd in range(rounds - 1, 0, -1):
        s = _INV_SBOX_NP[s[:, _INV_SHIFT]] ^ ks[rnd]
        a0, a1, a2, a3 = (s[:, i::4] for i in range(4))
        t = np.empty_like(s)
        t[:, 0::4] = _M14[a0] ^ _M11[a1] ^ _M13[a2] ^ _M9[a3]
        t[:, 1::4] = _M9[a0] ^ _M14[a1] ^ _M11[a2] ^ _M13[a3]
        t[:, 2::4] = _M13[a0] ^ _M9[a1] ^ _M14[a2] ^ _M11[a3]
        t[:, 3::4] = _M11[a0] ^ _M13[a1] ^ _M9[a2] ^ _M14[a3]
        s = t
    return _INV_SBOX_NP[s[:, _INV_SHIFT]] ^ ks[0]


def encrypt_block(key: bytes, block: bytes) -> bytes:
    """Single-block ECB encrypt (test-vector surface)."""
    ks = expand_key(key)
    return _encrypt_blocks(
        np.frombuffer(block, dtype=np.uint8).reshape(1, 16), ks
    ).tobytes()


def decrypt_block(key: bytes, block: bytes) -> bytes:
    ks = expand_key(key)
    return _decrypt_blocks(
        np.frombuffer(block, dtype=np.uint8).reshape(1, 16), ks
    ).tobytes()


def cbc_encrypt(key: bytes, iv: bytes, plaintext: bytes) -> bytes:
    """CBC encrypt with PKCS#7-style padding (the §7.6.2 rule: always
    pad, 1-16 bytes of value = pad length). Serial per stream (T-table
    fast path below) — used by the fixture writer and the 2.B KDF."""
    pad = 16 - len(plaintext) % 16
    return _cbc_encrypt_serial(key, iv, plaintext + bytes([pad]) * pad)


def cbc_decrypt(key: bytes, iv: bytes, ciphertext: bytes) -> bytes:
    """CBC decrypt + padding strip — VECTORIZED: every block is
    ECB-decrypted at once, then XORed with the previous ciphertext
    block (which is already known), so there is no serial chain."""
    if len(ciphertext) % 16 or not ciphertext:
        raise ValueError("AES-CBC ciphertext length not a block multiple")
    ks = expand_key(key)
    ct = np.frombuffer(ciphertext, dtype=np.uint8).reshape(-1, 16)
    plain = _decrypt_blocks(ct, ks)
    prev = np.vstack([np.frombuffer(iv, dtype=np.uint8), ct[:-1]])
    data = (plain ^ prev).tobytes()
    pad = data[-1]
    if not 1 <= pad <= 16:
        raise ValueError("bad AES-CBC padding")
    return data[:-pad]


def cbc_encrypt_nopad(key: bytes, iv: bytes, plaintext: bytes) -> bytes:
    """CBC without padding (exact block multiple) — used for the PDF
    AES-256 /UE //OE key-wrapping entries (§7.6.4.4.8) and the 2.B
    KDF's inner encryption."""
    if len(plaintext) % 16:
        raise ValueError("nopad CBC needs a block multiple")
    return _cbc_encrypt_serial(key, iv, plaintext)


def cbc_decrypt_nopad(key: bytes, iv: bytes, ciphertext: bytes) -> bytes:
    if len(ciphertext) % 16 or not ciphertext:
        raise ValueError("nopad CBC needs a block multiple")
    ks = expand_key(key)
    ct = np.frombuffer(ciphertext, dtype=np.uint8).reshape(-1, 16)
    plain = _decrypt_blocks(ct, ks)
    prev = np.vstack([np.frombuffer(iv, dtype=np.uint8), ct[:-1]])
    return (plain ^ prev).tobytes()


def pdf_hash_2b(password: bytes, salt: bytes, udata: bytes) -> bytes:
    """PDF 2.0 Algorithm 2.B (ISO 32000-2 §7.6.4.3.4): the iterated
    SHA-256/384/512 password hash for /R 6. Shared by generator and
    parser (disclosed: unlike the md5 handlers, this derivation is NOT
    independently re-implemented on the writer side — the algorithm's
    64+ data-dependent rounds make a second implementation line-for-line
    identical; correctness is instead pinned by the AES core's FIPS
    vectors and full roundtrips through real encrypted files)."""
    import hashlib

    k = hashlib.sha256(password + salt + udata).digest()
    i = 0
    while True:
        k1 = (password + k + udata) * 64
        e = cbc_encrypt_nopad(k[:16], k[16:32], k1)
        mod = sum(e[:16]) % 3
        k = [hashlib.sha256, hashlib.sha384, hashlib.sha512][mod](e).digest()
        i += 1
        if i >= 64 and e[-1] <= i - 32:
            return k[:32]


# ------------------------- serial fast path (T-table, pure ints)
#
# The numpy kernels above win on BULK decryption (hundreds of blocks at
# once) but lose badly on serial chains (CBC encrypt, the 2.B KDF): the
# per-call overhead of ~14 tiny-array ops is ~0.8 ms/block. The classic
# four-T-table formulation in plain ints runs a block in ~25 us, which
# is what makes the deliberately-expensive /R 6 KDF usable here.

_T0 = [0] * 256
_T1 = [0] * 256
_T2 = [0] * 256
_T3 = [0] * 256
for _a in range(256):
    _s = _SBOX[_a]
    _s2, _s3 = int(_X2[_s]), int(_X3[_s])
    _w = (_s2 << 24) | (_s << 16) | (_s << 8) | _s3
    _T0[_a] = _w
    _T1[_a] = ((_w >> 8) | (_w << 24)) & 0xFFFFFFFF
    _T2[_a] = ((_w >> 16) | (_w << 16)) & 0xFFFFFFFF
    _T3[_a] = ((_w >> 24) | (_w << 8)) & 0xFFFFFFFF


def _expand_key_words(key: bytes) -> list[int]:
    ks = expand_key(key)  # (rounds+1, 16) bytes
    out = []
    for rk in ks:
        for c in range(4):
            out.append(
                (int(rk[4 * c]) << 24) | (int(rk[4 * c + 1]) << 16)
                | (int(rk[4 * c + 2]) << 8) | int(rk[4 * c + 3])
            )
    return out


def _encrypt_block_int(w: list[int], rounds: int, block16: int) -> int:
    """One block as a 128-bit int (4 big-endian column words)."""
    c0 = ((block16 >> 96) & 0xFFFFFFFF) ^ w[0]
    c1 = ((block16 >> 64) & 0xFFFFFFFF) ^ w[1]
    c2 = ((block16 >> 32) & 0xFFFFFFFF) ^ w[2]
    c3 = (block16 & 0xFFFFFFFF) ^ w[3]
    t0, t1, t2, t3, sb = _T0, _T1, _T2, _T3, _SBOX
    for r in range(1, rounds):
        k = 4 * r
        n0 = t0[c0 >> 24] ^ t1[(c1 >> 16) & 0xFF] ^ t2[(c2 >> 8) & 0xFF] ^ t3[c3 & 0xFF] ^ w[k]
        n1 = t0[c1 >> 24] ^ t1[(c2 >> 16) & 0xFF] ^ t2[(c3 >> 8) & 0xFF] ^ t3[c0 & 0xFF] ^ w[k + 1]
        n2 = t0[c2 >> 24] ^ t1[(c3 >> 16) & 0xFF] ^ t2[(c0 >> 8) & 0xFF] ^ t3[c1 & 0xFF] ^ w[k + 2]
        n3 = t0[c3 >> 24] ^ t1[(c0 >> 16) & 0xFF] ^ t2[(c1 >> 8) & 0xFF] ^ t3[c2 & 0xFF] ^ w[k + 3]
        c0, c1, c2, c3 = n0, n1, n2, n3
    k = 4 * rounds
    f0 = ((sb[c0 >> 24] << 24) | (sb[(c1 >> 16) & 0xFF] << 16)
          | (sb[(c2 >> 8) & 0xFF] << 8) | sb[c3 & 0xFF]) ^ w[k]
    f1 = ((sb[c1 >> 24] << 24) | (sb[(c2 >> 16) & 0xFF] << 16)
          | (sb[(c3 >> 8) & 0xFF] << 8) | sb[c0 & 0xFF]) ^ w[k + 1]
    f2 = ((sb[c2 >> 24] << 24) | (sb[(c3 >> 16) & 0xFF] << 16)
          | (sb[(c0 >> 8) & 0xFF] << 8) | sb[c1 & 0xFF]) ^ w[k + 2]
    f3 = ((sb[c3 >> 24] << 24) | (sb[(c0 >> 16) & 0xFF] << 16)
          | (sb[(c1 >> 8) & 0xFF] << 8) | sb[c2 & 0xFF]) ^ w[k + 3]
    return (f0 << 96) | (f1 << 64) | (f2 << 32) | f3


def _cbc_encrypt_serial(key: bytes, iv: bytes, data: bytes) -> bytes:
    w = _expand_key_words(key)
    rounds = len(w) // 4 - 1
    prev = int.from_bytes(iv, "big")
    out = bytearray()
    for i in range(0, len(data), 16):
        prev = _encrypt_block_int(
            w, rounds, int.from_bytes(data[i : i + 16], "big") ^ prev
        )
        out += prev.to_bytes(16, "big")
    return bytes(out)
