"""Independent-oracle cross-validation for the archive/office readers.

The r4 suite proved every reader inverts its in-repo writer twin — a
tautology for any shared misreading of APPNOTE/ustar. These tests break
that loop with stdlib ``zipfile``/``tarfile``/``gzip`` (independent,
widely-deployed implementations of the same published specs): fixtures
BUILT by stdlib must read exactly through our readers, and archives
BUILT by our writer twins must read exactly through stdlib. Mirrors the
reference's own eval posture of consuming externally-produced files
(reference evaluate_new_testdata.py:28-44)."""

import gzip
import io
import tarfile
import zipfile

from granulate_char_ocr_spark.functions import tar as tarmod
from granulate_char_ocr_spark.functions import zipdocx

MEMBERS = {
    "a.txt": b"hello interop " * 64,
    "dir/nested/b.bin": bytes(range(256)) * 7,
    "empty.dat": b"",
    "unicode-é中.txt": "café 中文".encode("utf-8"),
}


def _stdlib_zip(compression, comment=b"", zip64=False) -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", compression) as zf:
        for name, payload in MEMBERS.items():
            if zip64:
                with zf.open(name, "w", force_zip64=True) as fh:
                    fh.write(payload)
            else:
                zf.writestr(name, payload)
        if comment:
            zf.comment = comment
    return buf.getvalue()


def test_our_reader_reads_stdlib_stored_and_deflated():
    for compression in (zipfile.ZIP_STORED, zipfile.ZIP_DEFLATED):
        blob = _stdlib_zip(compression)
        assert dict(zipdocx.zip_entries(blob)) == {
            k: len(v) for k, v in MEMBERS.items()
        }
        for name, payload in MEMBERS.items():
            assert zipdocx.zip_read(blob, name) == payload


def test_our_reader_reads_stdlib_with_archive_comment():
    blob = _stdlib_zip(zipfile.ZIP_DEFLATED, comment=b"x" * 300)
    for name, payload in MEMBERS.items():
        assert zipdocx.zip_read(blob, name) == payload


def test_our_reader_reads_stdlib_forced_zip64():
    # force_zip64 saturates the local/central size fields to 0xFFFFFFFF
    # and writes the ZIP64 extra field + EOCD64 record — the exact shape
    # of a >4 GiB crawl bundle, without needing 4 GiB of fixture
    blob = _stdlib_zip(zipfile.ZIP_DEFLATED, zip64=True)
    assert dict(zipdocx.zip_entries(blob)) == {
        k: len(v) for k, v in MEMBERS.items()
    }
    for name, payload in MEMBERS.items():
        assert zipdocx.zip_read(blob, name) == payload


def test_stdlib_reads_our_zip_build():
    for compress in (True, False):
        blob = zipdocx.zip_build(MEMBERS, compress=compress)
        with zipfile.ZipFile(io.BytesIO(blob)) as zf:
            assert zf.testzip() is None  # CRC-clean per stdlib
            assert set(zf.namelist()) == set(MEMBERS)
            for name, payload in MEMBERS.items():
                assert zf.read(name) == payload


def test_stdlib_built_docx_extracts():
    doc = (
        '<?xml version="1.0"?><w:document xmlns:w="http://schemas.openxml'
        'formats.org/wordprocessingml/2006/main"><w:body>'
        "<w:p><w:r><w:t>From stdlib</w:t></w:r></w:p>"
        "<w:p><w:r><w:t>zipfile &amp;lt; writer</w:t></w:r></w:p>"
        "</w:body></w:document>"
    ).encode()
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("[Content_Types].xml", "<Types/>")
        zf.writestr("word/document.xml", doc)
    # escaped entity stays literal: &amp;lt; -> "&lt;" (amp-LAST contract)
    assert zipdocx.docx_text(buf.getvalue()) == "From stdlib\nzipfile &lt; writer"


def _stdlib_tar(fmt, gz=False, names=None) -> bytes:
    buf = io.BytesIO()
    mode = "w:gz" if gz else "w"
    with tarfile.open(fileobj=buf, mode=mode, format=fmt) as tf:
        for name, payload in (names or MEMBERS).items():
            info = tarfile.TarInfo(name)
            info.size = len(payload)
            tf.addfile(info, io.BytesIO(payload))
    return buf.getvalue()


def test_our_reader_reads_stdlib_tar_all_formats():
    for fmt in (tarfile.USTAR_FORMAT, tarfile.GNU_FORMAT, tarfile.PAX_FORMAT):
        blob = _stdlib_tar(fmt)
        assert dict(tarmod.tar_entries(blob)) == {
            k: len(v) for k, v in MEMBERS.items()
        }
        for name, payload in MEMBERS.items():
            assert tarmod.tar_read(blob, name) == payload


def test_our_reader_reads_stdlib_targz():
    blob = _stdlib_tar(tarfile.USTAR_FORMAT, gz=True)
    for name, payload in MEMBERS.items():
        assert tarmod.tar_read(blob, name) == payload


def test_our_reader_reads_stdlib_long_names():
    # >100-char paths exercise GNU 'L' entries / pax path= overrides /
    # the ustar name+prefix split, depending on format
    long_name = "deep/" * 30 + "leaf.txt"
    for fmt in (tarfile.GNU_FORMAT, tarfile.PAX_FORMAT, tarfile.USTAR_FORMAT):
        blob = _stdlib_tar(fmt, names={long_name: b"deep payload"})
        assert tarmod.tar_read(blob, long_name) == b"deep payload"


def test_stdlib_reads_our_tar_build():
    for gz in (False, True):
        blob = tarmod.tar_build(MEMBERS, gz=gz)
        raw = gzip.decompress(blob) if gz else blob
        assert raw[:2] != b"\x1f\x8b" or gz  # gz flag actually gzips
        with tarfile.open(fileobj=io.BytesIO(blob), mode="r:*") as tf:
            got = {m.name: tf.extractfile(m).read()
                   for m in tf.getmembers() if m.isfile()}
        assert got == MEMBERS


def test_stdlib_gzip_reads_our_targz_stream():
    # the transparent gunzip leg (zlib wbits=47) must accept stdlib gzip
    # output including the FNAME header field
    inner = tarmod.tar_build({"x": b"payload"})
    buf = io.BytesIO()
    with gzip.GzipFile(filename="bundle.tar", mode="wb", fileobj=buf) as gf:
        gf.write(inner)
    assert tarmod.tar_read(buf.getvalue(), "x") == b"payload"
