"""PDF text extraction — the web-corpus "PDF to training text" stage.

The reference pipeline ingests whatever documents the crawl returns;
PDFs are the most common non-HTML text carrier. This module extracts
the text layer from PDFs whose content streams are stored raw or
FlateDecode-compressed (stdlib zlib — the same inflate the PNG decoder
uses), which covers the vast majority of digitally-authored PDFs.
Encrypted documents (standard security handler with an empty user
password — the owner-password-only case that dominates encrypted web
PDFs) decrypt for REAL across EVERY published revision: RC4 V1/R2 and
V2/R3 (stdlib MD5 + the ISO 32000-1 §7.6.3 algorithms + a pure-Python
RC4 pinned against the public RFC 6229 vectors), AESV2 crypt filters
V4/R4 (per-object ``sAlT`` key, CBC + PKCS#7), and AES-256 AESV3
V5/R5-R6 including the hardened R6 iterated KDF (``functions/aes.py``
— a from-first-principles FIPS-197 implementation pinned against the
FIPS-197 Appendix C and NIST SP 800-38A known-answer vectors). What it
is NOT: a renderer (no fonts, no layout, no OCR) — image-only/scanned
PDFs yield empty text; non-Standard handlers and genuinely
password-protected documents raise ``NotImplementedError`` (the
remaining boundary). Malformed structure raises ValueError
(quarantined, never silent — the multimodal decode contract).

Mechanics (ISO 32000 subset):

* object scan: every ``N G obj ... endobj`` region; a ``stream``
  keyword inside carries a body ending at ``endstream``. The object
  dict chooses the filter: no filter (raw) or ``/FlateDecode``; any
  other filter (DCT, LZW, CCITT...) skips the stream — those are
  image/font payloads, not text.
* content scan: a tiny operator scanner over each decoded stream —
  PDF string literals ``( ... )`` with balanced nested parens and the
  full escape table (``\\n \\r \\t \\b \\f \\( \\) \\\\``, octal,
  line-continuation), hex strings ``<...>``, arrays. Text shows from
  ``Tj``, ``'``, ``\"`` and ``TJ`` operators; ``Td``/``TD``/``T*``
  emit newlines so lines stay separated.

Stage: :class:`PdfTextStage` (actor-pool ``map_batches``, the
DecodeStage pattern) emits extracted text + integer features per row;
broken payloads are flagged, never dropped.
"""

from __future__ import annotations

import hashlib
import re
import struct
import zlib

import numpy as np
import pyarrow as pa
import ray.data

from gis_scripts_ray.functions import aes as _aes

_OBJ_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b", re.S)
_STREAM_RE = re.compile(rb"stream(?:\r\n|\n|\r)")


def _pdf_streams(payload: bytes, decrypt=None):
    """Yield (object_dict_bytes, decoded_stream_bytes) for every raw or
    FlateDecode stream in the document; skip streams with other filters
    (images/fonts). ``decrypt(num, gen, raw) -> bytes``, when given, runs
    BEFORE filter decode (encryption wraps the stored bytes)."""
    for m in _OBJ_RE.finditer(payload):
        end = payload.find(b"endobj", m.end())
        if end < 0:
            raise ValueError("pdf: object without endobj")
        body = payload[m.end() : end]
        sm = _STREAM_RE.search(body)
        if sm is None:
            continue
        se = body.rfind(b"endstream")
        if se < 0 or se < sm.end():
            raise ValueError("pdf: stream without endstream")
        head = body[: sm.start()]
        # a DIRECT /Length gives the exact extent (spec path — the EOL-
        # strip heuristic below can eat a real trailing 0x0D of a
        # compressed/encrypted body); indirect "/Length N 0 R" falls back
        lm = re.search(rb"/Length\s+(\d+)(?!\s+\d+\s+R)", head)
        raw = None
        if lm is not None:
            ln = int(lm.group(1))
            cand = body[sm.end() : sm.end() + ln]
            tail = body[sm.end() + ln : se]
            if len(cand) == ln and tail.strip(b"\r\n \t") == b"":
                raw = cand
        if raw is None:
            raw = body[sm.end() : se]
            # trailing EOL before 'endstream' belongs to the marker
            if raw.endswith(b"\r\n"):
                raw = raw[:-2]
            elif raw.endswith(b"\n") or raw.endswith(b"\r"):
                raw = raw[:-1]
        if decrypt is not None:
            raw = decrypt(int(m.group(1)), int(m.group(2)), raw)
        if b"/Filter" not in head:
            yield head, raw
        elif b"/FlateDecode" in head:
            try:
                yield head, zlib.decompress(raw)
            except zlib.error as e:
                raise ValueError(f"pdf: corrupt FlateDecode stream: {e}")
        # other filters: not text-bearing in this subset — skipped


# ---------------------------------------------------------------------------
# standard security handler (ISO 32000-1 §7.6.3, RC4 revisions 2 and 3)
# ---------------------------------------------------------------------------

# the spec's 32-byte password padding constant
_PAD = bytes(
    [
        0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
        0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
        0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
        0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A,
    ]
)


def rc4_crypt(key: bytes, data: bytes) -> bytes:
    """RC4 stream cipher (symmetric: encrypt == decrypt). Sequential by
    construction (each keystream byte depends on the evolving S-box), so
    this is a per-byte Python loop — fine for the stage's row-at-a-time
    payloads; encrypted PDFs are a small corpus fraction and the heavy
    path (inflate, token scan) stays vectorized/stdlib."""
    S = list(range(256))
    j = 0
    klen = len(key)
    for i in range(256):
        j = (j + S[i] + key[i % klen]) & 0xFF
        S[i], S[j] = S[j], S[i]
    out = bytearray(len(data))
    i = j = 0
    for t in range(len(data)):
        i = (i + 1) & 0xFF
        j = (j + S[i]) & 0xFF
        S[i], S[j] = S[j], S[i]
        out[t] = data[t] ^ S[(S[i] + S[j]) & 0xFF]
    return bytes(out)


def _pad_password(pw: bytes) -> bytes:
    return (pw + _PAD)[:32]


def _std_file_key(
    password: bytes,
    o_entry: bytes,
    p: int,
    id0: bytes,
    n: int,
    rev: int,
    encrypt_metadata: bool = True,
) -> bytes:
    """Algorithm 2: the file encryption key (first ``n`` bytes). For
    rev 4 with ``/EncryptMetadata false`` the spec appends 0xFFFFFFFF to
    the digest input."""
    h = hashlib.md5(
        _pad_password(password)
        + o_entry[:32]
        + struct.pack("<i", p)
        + id0
        + (b"" if encrypt_metadata or rev < 4 else b"\xff\xff\xff\xff")
    ).digest()
    if rev >= 3:
        for _ in range(50):
            h = hashlib.md5(h[:n]).digest()
    return h[:n]


def _std_user_check(key: bytes, id0: bytes, rev: int) -> bytes:
    """Algorithm 4 (rev 2) / 5 (rev 3): the /U value proving a password."""
    if rev == 2:
        return rc4_crypt(key, _PAD)
    enc = rc4_crypt(key, hashlib.md5(_PAD + id0).digest())
    for i in range(1, 20):
        enc = rc4_crypt(bytes(b ^ i for b in key), enc)
    return enc  # compare the first 16 bytes only (rev 3)


def _object_key(file_key: bytes, num: int, gen: int, aes: bool = False) -> bytes:
    """Algorithm 1: the per-object key. AESV2 appends the spec's ``sAlT``
    marker bytes to the digest input; AESV3 (/V 5) never calls this — the
    file key is used directly."""
    h = hashlib.md5(
        file_key
        + struct.pack("<I", num)[:3]
        + struct.pack("<I", gen)[:2]
        + (b"sAlT" if aes else b"")
    ).digest()
    return h[: min(len(file_key) + 5, 16)]


def _r6_hash(password: bytes, salt: bytes, udata: bytes = b"") -> bytes:
    """ISO 32000-2 Algorithm 2.B — the hardened SHA-2/AES password hash
    for revision 6 (revision 5, the deprecated Adobe extension, is the
    plain first line). ``udata`` is the 48-byte /U entry when hashing an
    owner password, empty for a user password. The CBC input is the
    64-fold repetition of (pwd + K + udata), always a block multiple."""
    k = hashlib.sha256(password + salt + udata).digest()
    i = 0
    while True:
        k1 = (password + k + udata) * 64
        e = _aes.cbc_encrypt(k[:16], k[16:32], k1)
        k = (
            hashlib.sha256,
            hashlib.sha384,
            hashlib.sha512,
        )[int.from_bytes(e[:16], "big") % 3](e).digest()
        i += 1
        if i >= 64 and e[-1] <= i - 32:
            return k[:32]


def _parse_pdf_string(body: bytes, pos: int) -> "tuple[bytes, int]":
    """A literal or hex string starting at body[pos] (skipping blanks)."""
    while pos < len(body) and body[pos] in b" \t\r\n":
        pos += 1
    if pos >= len(body):
        raise ValueError("pdf: missing string value")
    if body[pos] == 0x28:
        return _scan_string(body, pos)
    if body[pos] == 0x3C:
        return _scan_hex_string(body, pos)
    raise ValueError("pdf: expected a string value")


def _dict_int(body: bytes, name: bytes, default: "int | None" = None) -> int:
    m = re.search(re.escape(name) + rb"\s+(-?\d+)", body)
    if m is None:
        if default is None:
            raise ValueError(f"pdf: missing {name.decode()} in Encrypt dict")
        return default
    return int(m.group(1))


def _build_decryptor(payload: bytes):
    """Resolve the /Encrypt dictionary and return ``decrypt(num, gen,
    raw)`` for the standard security handler with an EMPTY user password
    (the overwhelmingly common owner-password-only case). Covers every
    published revision: RC4 (V1/R2, V2/R3), AESV2 crypt filters (V4/R4),
    and AES-256 AESV3 (V5/R5 and the hardened V5/R6). Raises
    ``NotImplementedError`` for non-Standard handlers and genuinely
    password-protected documents (wrong /U for the empty password) —
    the remaining documented boundary."""
    ref = re.search(rb"/Encrypt\s+(\d+)\s+(\d+)\s+R", payload)
    if ref is None:
        raise ValueError("pdf: /Encrypt without an indirect reference")
    num, gen = int(ref.group(1)), int(ref.group(2))
    body = None
    for m in _OBJ_RE.finditer(payload):
        if int(m.group(1)) == num and int(m.group(2)) == gen:
            end = payload.find(b"endobj", m.end())
            if end < 0:
                raise ValueError("pdf: Encrypt object without endobj")
            body = payload[m.end() : end]
            break
    if body is None:
        raise ValueError("pdf: Encrypt object not found")
    if b"/Standard" not in body:
        raise NotImplementedError("pdf: non-Standard security handler")
    v = _dict_int(body, b"/V", 0)
    rev = _dict_int(body, b"/R")
    if (v, rev) not in ((1, 2), (2, 3), (4, 4), (5, 5), (5, 6)):
        raise NotImplementedError(
            f"pdf: encryption V={v} R={rev} is outside the standard "
            "security handler's published revisions"
        )
    om = re.search(rb"/O\s*(?=[(<])", body)
    um = re.search(rb"/U\s*(?=[(<])", body)
    if om is None or um is None:
        raise ValueError("pdf: Encrypt dict missing /O or /U")
    o_entry, _ = _parse_pdf_string(body, om.end())
    u_entry, _ = _parse_pdf_string(body, um.end())

    if v == 5:
        # AESV3 (AES-256): ISO 32000-2 Algorithms 2.A/8/9 — validate the
        # EMPTY user password against /U, then unwrap the file key from
        # /UE. R5 is the single-SHA-256 Adobe extension, R6 the hardened
        # iterated KDF. The file key is used DIRECTLY per object.
        uem = re.search(rb"/UE\s*(?=[(<])", body)
        if uem is None or len(u_entry) < 48:
            raise ValueError("pdf: V5 Encrypt dict missing /UE or short /U")
        ue_entry, _ = _parse_pdf_string(body, uem.end())
        vsalt, ksalt = u_entry[32:40], u_entry[40:48]
        if rev == 5:
            want = hashlib.sha256(b"" + vsalt).digest()
            ikey = hashlib.sha256(b"" + ksalt).digest()
        else:
            want = _r6_hash(b"", vsalt)
            ikey = _r6_hash(b"", ksalt)
        if want != u_entry[:32]:
            raise NotImplementedError(
                "pdf: password-protected document "
                "(empty user password rejected)"
            )
        file_key = _aes.cbc_decrypt(ikey, b"\x00" * 16, ue_entry[:32])

        def decrypt_v5(onum: int, ogen: int, raw: bytes) -> bytes:
            if len(raw) < 16 or (len(raw) - 16) % 16:
                raise ValueError("pdf: bad AES stream length")
            return _aes.pkcs7_unpad(
                _aes.cbc_decrypt(file_key, raw[:16], raw[16:])
            )

        return decrypt_v5

    use_aes = False
    if v == 4:
        # crypt filters: the stream/string filter named by /StmF (default
        # /Identity) must be a /CF entry whose /CFM is V2 (RC4) or AESV2.
        cfm = re.search(rb"/CFM\s*/(\w+)", body)
        if cfm is None or cfm.group(1) not in (b"V2", b"AESV2"):
            raise NotImplementedError(
                "pdf: V4 crypt filter without a V2/AESV2 /CFM"
            )
        use_aes = cfm.group(1) == b"AESV2"
    p = _dict_int(body, b"/P")
    n = 5 if v == 1 else _dict_int(body, b"/Length", 40 if v == 2 else 128) // 8
    enc_meta = re.search(rb"/EncryptMetadata\s+false", body) is None
    idm = re.search(rb"/ID\s*\[", payload)
    id0 = b""
    if idm is not None:
        id0, _ = _parse_pdf_string(payload, idm.end())
    key = _std_file_key(b"", o_entry, p, id0, n, rev, enc_meta)
    want = _std_user_check(key, id0, rev)
    got = u_entry
    if (want[:16] if rev >= 3 else want) != (got[:16] if rev >= 3 else got):
        raise NotImplementedError(
            "pdf: password-protected document (empty user password rejected)"
        )

    if use_aes:

        def decrypt_aes(onum: int, ogen: int, raw: bytes) -> bytes:
            if len(raw) < 16 or (len(raw) - 16) % 16:
                raise ValueError("pdf: bad AES stream length")
            okey = _object_key(key, onum, ogen, aes=True)
            return _aes.pkcs7_unpad(
                _aes.cbc_decrypt(okey, raw[:16], raw[16:])
            )

        return decrypt_aes

    def decrypt(onum: int, ogen: int, raw: bytes) -> bytes:
        return rc4_crypt(_object_key(key, onum, ogen), raw)

    return decrypt


_ESCAPES = {
    ord("n"): b"\n", ord("r"): b"\r", ord("t"): b"\t",
    ord("b"): b"\x08", ord("f"): b"\x0c",
    ord("("): b"(", ord(")"): b")", ord("\\"): b"\\",
}


def _scan_string(data: bytes, pos: int) -> "tuple[bytes, int]":
    """Parse a PDF literal string starting at the '(' in data[pos];
    returns (bytes, position after the closing paren). Handles balanced
    nested parens, the escape table, octal escapes, and escaped-newline
    continuation."""
    out = bytearray()
    depth = 1
    i = pos + 1
    n = len(data)
    while i < n:
        c = data[i]
        if c == 0x5C:  # backslash
            if i + 1 >= n:
                break
            nxt = data[i + 1]
            if nxt in _ESCAPES:
                out += _ESCAPES[nxt]
                i += 2
            elif 0x30 <= nxt <= 0x37:  # octal, up to 3 digits
                j = i + 1
                val = 0
                while j < n and j < i + 4 and 0x30 <= data[j] <= 0x37:
                    val = val * 8 + (data[j] - 0x30)
                    j += 1
                out.append(val & 0xFF)
                i = j
            elif nxt in (0x0A, 0x0D):  # line continuation
                i += 2
                if nxt == 0x0D and i < n and data[i] == 0x0A:
                    i += 1
            else:  # unknown escape: the char stands for itself
                out.append(nxt)
                i += 2
            continue
        if c == 0x28:  # (
            depth += 1
            out.append(c)
        elif c == 0x29:  # )
            depth -= 1
            if depth == 0:
                return bytes(out), i + 1
            out.append(c)
        else:
            out.append(c)
        i += 1
    raise ValueError("pdf: unterminated string literal")


def _scan_hex_string(data: bytes, pos: int) -> "tuple[bytes, int]":
    end = data.find(b">", pos)
    if end < 0:
        raise ValueError("pdf: unterminated hex string")
    hx = bytes(c for c in data[pos + 1 : end] if not chr(c).isspace())
    if len(hx) % 2:
        hx += b"0"  # odd count: trailing 0 per spec
    try:
        return bytes.fromhex(hx.decode("ascii")), end + 1
    except (UnicodeDecodeError, ValueError):
        raise ValueError("pdf: invalid hex string")


_OP_RE = re.compile(rb"[A-Za-z'\"*]+")


def extract_content_text(stream: bytes) -> str:
    """Extract the text layer from one content stream: strings shown by
    Tj / ' / \" / TJ become text; Td, TD, T* and ' start new lines."""
    out: list[str] = []
    pending: list[bytes] = []  # strings seen since the last operator
    i, n = 0, len(stream)
    while i < n:
        c = stream[i]
        if c == 0x28:  # (
            s, i = _scan_string(stream, i)
            pending.append(s)
        elif c == 0x3C and i + 1 < n and stream[i + 1] != 0x3C:  # < not <<
            s, i = _scan_hex_string(stream, i)
            pending.append(s)
        elif c == 0x3C:  # << dict — skip the marker, contents scan on
            i += 2
        elif (0x41 <= c <= 0x5A) or (0x61 <= c <= 0x7A) or c in (0x27, 0x22, 0x2A):
            m = _OP_RE.match(stream, i)
            op = m.group()
            i = m.end()
            if op in (b"Tj", b"TJ"):
                out.extend(s.decode("latin-1") for s in pending)
            elif op == b"'":
                out.append("\n")
                out.extend(s.decode("latin-1") for s in pending)
            elif op == b'"':
                out.append("\n")
                # " takes two numeric args then the string
                out.extend(s.decode("latin-1") for s in pending)
            elif op in (b"Td", b"TD") or op == b"T*":
                out.append("\n")
            pending.clear()
        else:
            i += 1
    return "".join(out)


def decode_pdf_text(payload: bytes) -> str:
    """Extract the text layer of a PDF (raw or FlateDecode content
    streams). Encrypted documents (standard security handler) with an
    EMPTY user password decrypt for real across every published
    revision — RC4 (V1/R2, V2/R3), AESV2 (V4/R4), AES-256 AESV3
    (V5/R5-R6) — the owner-password-only case that dominates encrypted
    web PDFs. Non-Standard handlers and genuinely password-protected
    documents raise ``NotImplementedError`` (the remaining boundary).
    Malformed structure raises ValueError."""
    if payload is None or not payload.startswith(b"%PDF-"):
        raise ValueError("not a PDF payload")
    decrypt = _build_decryptor(payload) if b"/Encrypt" in payload else None
    parts = [
        extract_content_text(s) for _head, s in _pdf_streams(payload, decrypt)
    ]
    return "".join(parts)


def encode_pdf_text(
    text: str,
    compress: bool = False,
    creator: str = "gis_scripts_ray",
    encrypt_rev: "int | None" = None,
    owner_pw: bytes = b"owner",
) -> bytes:
    """Minimal valid single-page PDF around a text layer — the fixture
    generator and roundtrip partner of :func:`decode_pdf_text`:
    ``decode_pdf_text(encode_pdf_text(t)) == t`` exactly. Positioning
    uses ``Tm`` (no newline in the scanner) and ``T*`` between lines
    (exactly one newline each); parens and backslashes are escaped.
    ``compress=True`` stores the content stream FlateDecode.
    ``encrypt_rev`` = 2 (RC4 40-bit, V1), 3 (RC4 128-bit, V2), 4
    (AES-128 AESV2 crypt filter, V4), 5 or 6 (AES-256 AESV3, V5 —
    rev 6 runs the hardened iterated KDF, deliberately ~1 s/call)
    encrypts the content stream under the standard security handler
    with an empty user password and ``owner_pw`` as the owner password
    — deterministic: /ID, AES IVs and AESV3 salts/file key all derive
    from the content bytes."""
    def esc(line: str) -> bytes:
        b = line.encode("latin-1")
        return b.replace(b"\\", rb"\\").replace(b"(", rb"\(").replace(b")", rb"\)")

    lines = text.split("\n")
    content = (
        b"BT /F1 12 Tf 14 TL 1 0 0 1 72 720 Tm\n"
        + b"(" + esc(lines[0]) + b") Tj\n"
        + b"".join(b"T* (" + esc(l) + b") Tj\n" for l in lines[1:])
        + b"ET\n"
    )
    if compress:
        body = zlib.compress(content)
        filt = b" /Filter /FlateDecode"
    else:
        body, filt = content, b""
    trailer_extra = b""
    enc_obj = None
    if encrypt_rev is not None:
        if encrypt_rev not in (2, 3, 4, 5, 6):
            raise ValueError(
                "encrypt_rev must be 2, 3, 4 (AESV2), 5 or 6 (AESV3)"
            )
        rev = encrypt_rev
        p = -44
        id0 = hashlib.md5(body + b"gis_scripts_ray/id").digest()
        if rev >= 5:
            # AESV3: deterministic salts/key derived from the content so
            # the fixture writer stays byte-reproducible. R5 hashes are
            # single SHA-256 (the deprecated Adobe extension); R6 runs
            # the hardened iterated KDF.
            def kdf(pw: bytes, salt: bytes, udata: bytes = b"") -> bytes:
                if rev == 5:
                    return hashlib.sha256(pw + salt + udata).digest()
                return _r6_hash(pw, salt, udata)

            file_key = hashlib.sha256(body + b"gis/r6-filekey").digest()
            vsalt = hashlib.sha256(body + b"gis/r6-vs").digest()[:8]
            ksalt = hashlib.sha256(body + b"gis/r6-ks").digest()[:8]
            u_entry = kdf(b"", vsalt) + vsalt + ksalt
            ue_entry = _aes.cbc_encrypt(
                kdf(b"", ksalt), b"\x00" * 16, file_key
            )
            ovs = hashlib.sha256(body + b"gis/r6-ovs").digest()[:8]
            oks = hashlib.sha256(body + b"gis/r6-oks").digest()[:8]
            opw = (owner_pw or b"")[:127]
            o_entry = kdf(opw, ovs, u_entry) + ovs + oks
            oe_entry = _aes.cbc_encrypt(
                kdf(opw, oks, u_entry), b"\x00" * 16, file_key
            )
            perms = (
                struct.pack("<i", p) + b"\xff\xff\xff\xff" + b"Tadb"
                + b"gis!"
            )
            perms_enc = _aes.ecb_encrypt_blocks(
                np.frombuffer(perms, dtype=np.uint8).reshape(1, 16),
                _aes.key_expansion(file_key),
            ).tobytes()
            iv = hashlib.md5(id0 + b"gis/aes-iv").digest()
            body = iv + _aes.cbc_encrypt(file_key, iv, _aes.pkcs7_pad(body))
            enc_obj = (
                b"<< /Filter /Standard /V 5 /R " + str(rev).encode()
                + b" /Length 256"
                b" /CF << /StdCF << /CFM /AESV3 /Length 32 >> >>"
                b" /StmF /StdCF /StrF /StdCF"
                + b" /O <" + o_entry.hex().encode() + b">"
                + b" /U <" + u_entry.hex().encode() + b">"
                + b" /OE <" + oe_entry.hex().encode() + b">"
                + b" /UE <" + ue_entry.hex().encode() + b">"
                + b" /Perms <" + perms_enc.hex().encode() + b">"
                + b" /P " + str(p).encode() + b" >>"
            )
        else:
            v, n = {2: (1, 5), 3: (2, 16), 4: (4, 16)}[rev]
            # Algorithm 3: the /O entry from the owner password
            oh = hashlib.md5(_pad_password(owner_pw or b"")).digest()
            if rev >= 3:
                for _ in range(50):
                    oh = hashlib.md5(oh).digest()
            okey = oh[:n]
            o_entry = rc4_crypt(okey, _pad_password(b""))
            if rev >= 3:
                for i in range(1, 20):
                    o_entry = rc4_crypt(bytes(b ^ i for b in okey), o_entry)
            key = _std_file_key(b"", o_entry, p, id0, n, rev)
            u_entry = _std_user_check(key, id0, rev)
            if rev >= 3:
                u_entry = u_entry + b"\x00" * 16  # 32-byte slot, 16 compared
            if rev == 4:
                iv = hashlib.md5(id0 + b"gis/aes-iv").digest()
                okey_aes = _object_key(key, 5, 0, aes=True)  # stream is obj 5
                body = iv + _aes.cbc_encrypt(okey_aes, iv, _aes.pkcs7_pad(body))
            else:
                body = rc4_crypt(_object_key(key, 5, 0), body)  # obj 5
            enc_obj = (
                b"<< /Filter /Standard /V " + str(v).encode()
                + b" /R " + str(rev).encode()
                + (b"" if rev == 2 else b" /Length " + str(n * 8).encode())
                + (
                    b" /CF << /StdCF << /CFM /AESV2 /Length 16 >> >>"
                    b" /StmF /StdCF /StrF /StdCF"
                    if rev == 4
                    else b""
                )
                + b" /O <" + o_entry.hex().encode() + b">"
                + b" /U <" + u_entry.hex().encode() + b">"
                + b" /P " + str(p).encode() + b" >>"
            )
        trailer_extra = (
            b" /Encrypt 6 0 R /ID [<" + id0.hex().encode() + b"> <"
            + id0.hex().encode() + b">]"
        )
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Resources << /Font << /F1 4 0 R >> >> /Contents 5 0 R >>",
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
        b"<< /Length " + str(len(body)).encode() + filt
        + b" >>\nstream\n" + body + b"\nendstream",
    ]
    if enc_obj is not None:
        objs.append(enc_obj)
    out = bytearray(b"%PDF-1.4\n")
    offsets = []
    for k, o in enumerate(objs, 1):
        offsets.append(len(out))
        out += str(k).encode() + b" 0 obj\n" + o + b"\nendobj\n"
    xref = len(out)
    out += b"xref\n0 " + str(len(objs) + 1).encode() + b"\n"
    out += b"0000000000 65535 f \n"
    for off in offsets:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        b"trailer\n<< /Size " + str(len(objs) + 1).encode()
        + b" /Root 1 0 R" + trailer_extra
        + b" >>\nstartxref\n" + str(xref).encode() + b"\n%%EOF\n"
    )
    return bytes(out)


class PdfTextStage:
    """Actor-pool PDF text extraction over a binary column. Output:
    carry columns + ``pdf_text:string``, ``n_chars:int64``,
    ``n_lines:int64``, ``decoded_ok:bool``. Encrypted or malformed
    payloads emit a flagged row with empty text — never dropped."""

    def __init__(self, payload_col: str):
        self.payload_col = payload_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        carry_cols = [c for c in batch.column_names if c != self.payload_col]
        texts, nch, nln, ok = [], [], [], []
        for payload in batch[self.payload_col].to_pylist():
            try:
                t = decode_pdf_text(payload)
                texts.append(t)
                nch.append(len(t))
                nln.append(t.count("\n"))
                ok.append(True)
            except (ValueError, NotImplementedError):
                texts.append("")
                nch.append(0)
                nln.append(0)
                ok.append(False)
        cols = {c: batch[c] for c in carry_cols}
        cols["pdf_text"] = pa.array(texts, pa.string())
        cols["n_chars"] = pa.array(np.array(nch, np.int64), pa.int64())
        cols["n_lines"] = pa.array(np.array(nln, np.int64), pa.int64())
        cols["decoded_ok"] = pa.array(ok, pa.bool_())
        return pa.table(cols)


def pdf_texts(
    ds: ray.data.Dataset,
    payload_col: str = "pdf",
    concurrency: "int | tuple[int, int]" = 4,
    batch_size: int = 256,
) -> ray.data.Dataset:
    """PDF text-extraction stage over a binary column (actor pool; small
    batch_size — payloads are wide rows, the memory-aware sizing rule)."""
    return ds.map_batches(
        PdfTextStage,
        fn_constructor_kwargs={"payload_col": payload_col},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=0.5,
    )
