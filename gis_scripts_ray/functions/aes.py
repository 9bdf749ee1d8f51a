"""Pure-numpy AES (FIPS-197) + CBC mode — the crypto primitive that lets
encrypted-PDF text extraction (``stages/pdftext.py``) handle the AESV2 /
AESV3 standard-security-handler variants the same way it already handles
RC4, with no third-party crypto provider in this environment.

Everything here is the PUBLIC specification, re-derived rather than
transcribed:

* the S-box is COMPUTED at import (GF(2^8) inverse via log/antilog
  tables over the AES polynomial 0x11B, then the §5.1.1 affine
  transform) — no 256-entry magic table to mistype;
* the GF multiply tables for MixColumns / InvMixColumns come from the
  same log/antilog construction;
* key expansion is §5.2 verbatim for Nk ∈ {4, 6, 8};
* the cipher is pinned bit-exactly against the FIPS-197 Appendix C
  known-answer vectors (all three key sizes) and the NIST SP 800-38A
  §F.2 AES-CBC vectors in ``tests/test_pdftext.py``.

Layout: a batch of blocks is a ``(n, 16)`` uint8 array in block-byte
order (FIPS state column-major: byte ``i`` is state[i % 4, i // 4]).
ECB encrypt/decrypt are vectorized across ALL blocks of a stream at
once (SubBytes = one fancy-index gather, ShiftRows = a fixed flat
permutation, MixColumns = four table gathers + XOR), so CBC *decrypt* —
the hot path, every encrypted PDF stream — is one vectorized ECB pass
plus a shifted XOR, not a per-block Python loop. CBC *encrypt* is
inherently sequential and only runs in fixture writers and the R6 KDF.
"""

from __future__ import annotations

import numpy as np

# --- GF(2^8) construction (AES polynomial x^8+x^4+x^3+x+1 = 0x11B) ------

_LOG = np.zeros(256, dtype=np.int32)
_EXP = np.zeros(512, dtype=np.uint8)


def _build_field() -> None:
    # generator 3 cycles the full multiplicative group
    x = 1
    for i in range(255):
        _EXP[i] = x
        _LOG[x] = i
        x ^= (x << 1) ^ (0x11B if x & 0x80 else 0)
        x &= 0xFF
    _EXP[255:510] = _EXP[:255]


_build_field()


def _gf_mul(a: int, b: int) -> int:
    if a == 0 or b == 0:
        return 0
    return int(_EXP[_LOG[a] + _LOG[b]])


def _mul_table(c: int) -> np.ndarray:
    return np.array([_gf_mul(c, v) for v in range(256)], dtype=np.uint8)


def _build_sbox() -> "tuple[np.ndarray, np.ndarray]":
    sbox = np.zeros(256, dtype=np.uint8)
    for v in range(256):
        inv = 0 if v == 0 else int(_EXP[255 - _LOG[v]])
        # §5.1.1 affine transform: b ^= rotl(b,1..4) ^ 0x63
        b = inv
        r = b
        for k in (1, 2, 3, 4):
            r ^= ((b << k) | (b >> (8 - k))) & 0xFF
        sbox[v] = r ^ 0x63
    inv_sbox = np.zeros(256, dtype=np.uint8)
    inv_sbox[sbox] = np.arange(256, dtype=np.uint8)
    return sbox, inv_sbox


_SBOX, _INV_SBOX = _build_sbox()
_MUL2, _MUL3 = _mul_table(2), _mul_table(3)
_MUL9, _MUL11, _MUL13, _MUL14 = (
    _mul_table(9), _mul_table(11), _mul_table(13), _mul_table(14),
)

# ShiftRows as a flat permutation on block-byte order: state(r,c) is flat
# c*4+r; after ShiftRows new(r,c) = old(r, (c+r) mod 4).
_SHIFT = np.array(
    [(((c + r) % 4) * 4 + r) for c in range(4) for r in range(4)],
    dtype=np.intp,
)
_INV_SHIFT = np.zeros(16, dtype=np.intp)
_INV_SHIFT[_SHIFT] = np.arange(16, dtype=np.intp)


def key_expansion(key: bytes) -> np.ndarray:
    """§5.2 round keys as a ``(Nr+1, 16)`` uint8 array in block order."""
    nk = len(key) // 4
    if len(key) not in (16, 24, 32):
        raise ValueError(f"aes: bad key length {len(key)}")
    nr = nk + 6
    w = [list(key[4 * i : 4 * i + 4]) for i in range(nk)]
    rcon = 1
    for i in range(nk, 4 * (nr + 1)):
        t = list(w[i - 1])
        if i % nk == 0:
            t = t[1:] + t[:1]
            t = [int(_SBOX[b]) for b in t]
            t[0] ^= rcon
            rcon = _gf_mul(rcon, 2)
        elif nk > 6 and i % nk == 4:
            t = [int(_SBOX[b]) for b in t]
        w.append([a ^ b for a, b in zip(w[i - nk], t)])
    flat = np.array(w, dtype=np.uint8).reshape(nr + 1, 16)
    return flat


def _mix_columns(s: np.ndarray) -> np.ndarray:
    v = s.reshape(-1, 4, 4)  # (n, column, row)
    a0, a1, a2, a3 = v[:, :, 0], v[:, :, 1], v[:, :, 2], v[:, :, 3]
    out = np.empty_like(v)
    out[:, :, 0] = _MUL2[a0] ^ _MUL3[a1] ^ a2 ^ a3
    out[:, :, 1] = a0 ^ _MUL2[a1] ^ _MUL3[a2] ^ a3
    out[:, :, 2] = a0 ^ a1 ^ _MUL2[a2] ^ _MUL3[a3]
    out[:, :, 3] = _MUL3[a0] ^ a1 ^ a2 ^ _MUL2[a3]
    return out.reshape(-1, 16)


def _inv_mix_columns(s: np.ndarray) -> np.ndarray:
    v = s.reshape(-1, 4, 4)
    a0, a1, a2, a3 = v[:, :, 0], v[:, :, 1], v[:, :, 2], v[:, :, 3]
    out = np.empty_like(v)
    out[:, :, 0] = _MUL14[a0] ^ _MUL11[a1] ^ _MUL13[a2] ^ _MUL9[a3]
    out[:, :, 1] = _MUL9[a0] ^ _MUL14[a1] ^ _MUL11[a2] ^ _MUL13[a3]
    out[:, :, 2] = _MUL13[a0] ^ _MUL9[a1] ^ _MUL14[a2] ^ _MUL11[a3]
    out[:, :, 3] = _MUL11[a0] ^ _MUL13[a1] ^ _MUL9[a2] ^ _MUL14[a3]
    return out.reshape(-1, 16)


def ecb_encrypt_blocks(blocks: np.ndarray, round_keys: np.ndarray) -> np.ndarray:
    """Encrypt ``(n, 16)`` uint8 blocks, all blocks vectorized per round."""
    nr = len(round_keys) - 1
    s = blocks ^ round_keys[0]
    for rnd in range(1, nr):
        s = _mix_columns(_SBOX[s][:, _SHIFT]) ^ round_keys[rnd]
    return _SBOX[s][:, _SHIFT] ^ round_keys[nr]


def ecb_decrypt_blocks(blocks: np.ndarray, round_keys: np.ndarray) -> np.ndarray:
    nr = len(round_keys) - 1
    s = blocks ^ round_keys[nr]
    for rnd in range(nr - 1, 0, -1):
        s = _inv_mix_columns(_INV_SBOX[s[:, _INV_SHIFT]] ^ round_keys[rnd])
    return _INV_SBOX[s[:, _INV_SHIFT]] ^ round_keys[0]


def _build_ttables() -> "tuple[list[list[int]], list[int]]":
    """Encryption T-tables (SubBytes+ShiftRows+MixColumns folded into
    four 256-entry word lookups) for the sequential Python-int CBC
    encrypt path — numpy per-single-block overhead is ~100× the actual
    work, and CBC encrypt cannot batch blocks (the R6 KDF runs ~64
    chained CBC passes per hash)."""
    t0 = []
    for x in range(256):
        s = int(_SBOX[x])
        t0.append(
            (int(_MUL2[s]) << 24) | (s << 16) | (s << 8) | int(_MUL3[s])
        )
    ts = [t0]
    for _ in range(3):
        prev = ts[-1]
        ts.append([((w >> 8) | ((w & 0xFF) << 24)) for w in prev])
    return ts, [int(v) for v in _SBOX]


(_T0, _T1, _T2, _T3), _SBOX_PY = _build_ttables()


def _rk_words(round_keys: np.ndarray) -> "list[list[int]]":
    return [
        [int.from_bytes(bytes(rk[4 * c : 4 * c + 4]), "big") for c in range(4)]
        for rk in round_keys
    ]


def _encrypt_block_py(w: "list[int]", rkw: "list[list[int]]") -> "list[int]":
    """One block as four big-endian column words, T-table rounds."""
    nr = len(rkw) - 1
    k = rkw[0]
    w0, w1, w2, w3 = w[0] ^ k[0], w[1] ^ k[1], w[2] ^ k[2], w[3] ^ k[3]
    for rnd in range(1, nr):
        k = rkw[rnd]
        n0 = (
            _T0[w0 >> 24] ^ _T1[(w1 >> 16) & 0xFF]
            ^ _T2[(w2 >> 8) & 0xFF] ^ _T3[w3 & 0xFF] ^ k[0]
        )
        n1 = (
            _T0[w1 >> 24] ^ _T1[(w2 >> 16) & 0xFF]
            ^ _T2[(w3 >> 8) & 0xFF] ^ _T3[w0 & 0xFF] ^ k[1]
        )
        n2 = (
            _T0[w2 >> 24] ^ _T1[(w3 >> 16) & 0xFF]
            ^ _T2[(w0 >> 8) & 0xFF] ^ _T3[w1 & 0xFF] ^ k[2]
        )
        n3 = (
            _T0[w3 >> 24] ^ _T1[(w0 >> 16) & 0xFF]
            ^ _T2[(w1 >> 8) & 0xFF] ^ _T3[w2 & 0xFF] ^ k[3]
        )
        w0, w1, w2, w3 = n0, n1, n2, n3
    k = rkw[nr]
    sb = _SBOX_PY
    n0 = (
        (sb[w0 >> 24] << 24) | (sb[(w1 >> 16) & 0xFF] << 16)
        | (sb[(w2 >> 8) & 0xFF] << 8) | sb[w3 & 0xFF]
    ) ^ k[0]
    n1 = (
        (sb[w1 >> 24] << 24) | (sb[(w2 >> 16) & 0xFF] << 16)
        | (sb[(w3 >> 8) & 0xFF] << 8) | sb[w0 & 0xFF]
    ) ^ k[1]
    n2 = (
        (sb[w2 >> 24] << 24) | (sb[(w3 >> 16) & 0xFF] << 16)
        | (sb[(w0 >> 8) & 0xFF] << 8) | sb[w1 & 0xFF]
    ) ^ k[2]
    n3 = (
        (sb[w3 >> 24] << 24) | (sb[(w0 >> 16) & 0xFF] << 16)
        | (sb[(w1 >> 8) & 0xFF] << 8) | sb[w2 & 0xFF]
    ) ^ k[3]
    return [n0, n1, n2, n3]


def _as_blocks(data: bytes) -> np.ndarray:
    if len(data) % 16:
        raise ValueError(f"aes: data length {len(data)} not a block multiple")
    return np.frombuffer(data, dtype=np.uint8).reshape(-1, 16)


def cbc_decrypt(key: bytes, iv: bytes, data: bytes) -> bytes:
    """Raw CBC decrypt (no padding removal). Vectorized: one ECB pass over
    every block, then XOR with the shifted ciphertext chain."""
    if len(iv) != 16:
        raise ValueError("aes: IV must be 16 bytes")
    if not data:
        return b""
    ct = _as_blocks(data)
    pt = ecb_decrypt_blocks(ct, key_expansion(key))
    prev = np.vstack([np.frombuffer(iv, dtype=np.uint8)[None, :], ct[:-1]])
    return (pt ^ prev).tobytes()


def cbc_encrypt(key: bytes, iv: bytes, data: bytes) -> bytes:
    """Raw CBC encrypt (no padding added). Sequential by construction
    (each block chains into the next), so it runs on the T-table
    Python-int path — used by fixture writers and the AESV3/R6 KDF,
    never a stream-decrypt hot path."""
    if len(iv) != 16:
        raise ValueError("aes: IV must be 16 bytes")
    if len(data) % 16:
        raise ValueError(f"aes: data length {len(data)} not a block multiple")
    rkw = _rk_words(key_expansion(key))
    prev = [int.from_bytes(iv[4 * c : 4 * c + 4], "big") for c in range(4)]
    out = bytearray()
    for off in range(0, len(data), 16):
        blk = data[off : off + 16]
        w = [
            int.from_bytes(blk[4 * c : 4 * c + 4], "big") ^ prev[c]
            for c in range(4)
        ]
        prev = _encrypt_block_py(w, rkw)
        for c in range(4):
            out += prev[c].to_bytes(4, "big")
    return bytes(out)


def pkcs7_pad(data: bytes) -> bytes:
    n = 16 - (len(data) % 16)
    return data + bytes([n]) * n


def pkcs7_unpad(data: bytes) -> bytes:
    if not data or len(data) % 16:
        raise ValueError("aes: bad padded length")
    n = data[-1]
    if not 1 <= n <= 16 or data[-n:] != bytes([n]) * n:
        raise ValueError("aes: bad PKCS#7 padding")
    return data[:-n]
