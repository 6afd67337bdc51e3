"""TAR (POSIX ustar) archive reader — the container corpora actually
ship in (image tarballs, crawl dumps, model checkpoints).

Implemented from the published header layout (POSIX.1-1988 ustar /
pax): 512-byte headers with octal size fields, data rounded up to the
block size, the header checksum verified (sum of header bytes with the
chksum field read as spaces) so random bytes are rejected rather than
misread. GNU long-name ('L') and pax extended-header ('x'/'g') entries
are consumed structurally: 'L' supplies the following member's name;
pax path= overrides win over the ustar name+prefix split. Transparent
gzip unwrap handles the .tar.gz case (stdlib zlib, same dependency
posture as the PNG/PDF legs).

Same contract as the other binary legs: malformed input yields None /
skips cleanly, never raises.
"""

from __future__ import annotations

import zlib

_BLOCK = 512


def _maybe_gunzip(data: bytes) -> bytes:
    if data[:2] == b"\x1f\x8b":
        try:
            return zlib.decompressobj(47).decompress(data)
        except zlib.error:
            return data
    return data


def _octal(field: bytes) -> int | None:
    s = field.split(b"\x00")[0].strip()
    if not s:
        return 0
    # GNU base-256 extension for >8 GiB sizes: high bit set
    if field[0] & 0x80:
        v = 0
        for b in field:
            v = (v << 8) | b
        return v & ~(0x80 << (8 * (len(field) - 1)))
    try:
        return int(s, 8)
    except ValueError:
        return None


def _checksum_ok(hdr: bytes) -> bool:
    stored = _octal(hdr[148:156])
    if stored is None:
        return False
    calc = sum(hdr[:148]) + 8 * 32 + sum(hdr[156:])
    return calc == stored


def _pax_path(payload: bytes) -> str | None:
    """'len key=value\\n' records; the path key overrides the name."""
    pos = 0
    while pos < len(payload):
        sp = payload.find(b" ", pos)
        if sp < 0:
            return None
        try:
            ln = int(payload[pos:sp])
        except ValueError:
            return None
        if ln <= 0 or pos + ln > len(payload):
            return None
        rec = payload[sp + 1 : pos + ln - 1]  # strip trailing \n
        if rec.startswith(b"path="):
            return rec[5:].decode("utf-8", "replace")
        pos += ln
    return None


def iter_tar(data: bytes):
    """Yield (name, typeflag, payload_bytes) for each regular member.
    Directories yield with empty payload; link entries are skipped."""
    data = _maybe_gunzip(data)
    pos = 0
    pending_name: str | None = None
    while pos + _BLOCK <= len(data):
        hdr = data[pos : pos + _BLOCK]
        if hdr == b"\x00" * _BLOCK:
            return  # end-of-archive marker
        if not _checksum_ok(hdr):
            return  # corrupt or not a tar: stop cleanly
        size = _octal(hdr[124:136])
        if size is None:
            return
        typeflag = chr(hdr[156]) if hdr[156] else "0"
        name = hdr[:100].split(b"\x00")[0].decode("utf-8", "replace")
        prefix = hdr[345:500].split(b"\x00")[0].decode("utf-8", "replace")
        if prefix and hdr[257:262] == b"ustar":
            name = prefix + "/" + name
        payload_end = pos + _BLOCK + size
        if payload_end > len(data):
            return  # truncated archive
        payload = data[pos + _BLOCK : payload_end]
        pos = pos + _BLOCK + ((size + _BLOCK - 1) // _BLOCK) * _BLOCK
        if typeflag == "L":  # GNU long name for the NEXT member
            pending_name = payload.split(b"\x00")[0].decode(
                "utf-8", "replace"
            )
            continue
        if typeflag == "x":  # pax extended header for the NEXT member
            p = _pax_path(payload)
            if p is not None:
                pending_name = p
            continue
        if typeflag == "g":  # pax global header: metadata only
            continue
        if pending_name is not None:
            name = pending_name
            pending_name = None
        if typeflag in ("0", "\x00", "5"):
            yield name, typeflag, payload if typeflag != "5" else b""
        # '1'/'2' (links) and other types carry no corpus payload: skip


def tar_entries(data: bytes) -> list[tuple[str, int]] | None:
    """[(name, size)] of regular members; None if not a tar at all."""
    out = [
        (name, len(payload))
        for name, tf, payload in iter_tar(data)
        if tf != "5"
    ]
    if not out:
        # distinguish "empty/invalid" from a valid archive of only dirs
        data2 = _maybe_gunzip(data)
        if len(data2) < _BLOCK or not _checksum_ok(data2[:_BLOCK]):
            return None
    return out


def tar_read(data: bytes, member: str) -> bytes | None:
    for name, tf, payload in iter_tar(data):
        if name == member and tf != "5":
            return payload
    return None


# --- fixture-builder twin ----------------------------------------------------


def tar_build(members: dict[str, bytes], gz: bool = False) -> bytes:
    """Spec-valid ustar writer (the test twin of the reader)."""
    out = bytearray()
    for name, payload in members.items():
        nb = name.encode("utf-8")
        hdr = bytearray(_BLOCK)
        hdr[0 : len(nb)] = nb[:100]
        hdr[100:108] = b"0000644\x00"
        hdr[108:116] = hdr[116:124] = b"0000000\x00"
        hdr[124:136] = f"{len(payload):011o}".encode() + b"\x00"
        hdr[136:148] = b"00000000000\x00"
        hdr[148:156] = b" " * 8
        hdr[156] = ord("0")
        hdr[257:263] = b"ustar\x00"
        hdr[263:265] = b"00"
        chk = sum(hdr)
        hdr[148:156] = f"{chk:06o}".encode() + b"\x00 "
        out += hdr
        out += payload
        pad = (-len(payload)) % _BLOCK
        out += b"\x00" * pad
    out += b"\x00" * (2 * _BLOCK)
    blob = bytes(out)
    if gz:
        c = zlib.compressobj(6, zlib.DEFLATED, 31)
        blob = c.compress(blob) + c.flush()
    return blob
