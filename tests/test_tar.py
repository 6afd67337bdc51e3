"""ustar TAR reader (functions/tar.py): round-trip, gzip unwrap,
long names, checksum rejection."""

import numpy as np

from granulate_char_ocr_spark.functions import tar


def test_tar_roundtrip_and_padding():
    members = {
        "a.txt": b"alpha" * 100,
        "dir/b.bin": bytes(range(256)),
        "exact": b"x" * 512,  # size == block: no padding
        "empty": b"",
    }
    blob = tar.tar_build(members)
    assert dict(tar.tar_entries(blob)) == {
        k: len(v) for k, v in members.items()
    }
    for k, v in members.items():
        assert tar.tar_read(blob, k) == v
    assert tar.tar_read(blob, "missing") is None


def test_tar_gzip_unwrap():
    blob = tar.tar_build({"x": b"payload"}, gz=True)
    assert blob[:2] == b"\x1f\x8b"
    assert tar.tar_read(blob, "x") == b"payload"


def test_tar_ustar_prefix_and_gnu_longname():
    # prefix field splits long paths in plain ustar
    blob = bytearray(tar.tar_build({"leaf.txt": b"v"}))
    blob[345:351] = b"deeply"  # write a prefix, then re-checksum
    hdr = bytearray(blob[:512])
    hdr[148:156] = b" " * 8
    chk = sum(hdr)
    blob[148:156] = f"{chk:06o}".encode() + b"\x00 "
    assert tar.tar_entries(bytes(blob)) == [("deeply/leaf.txt", 1)]

    # GNU 'L' entry carries the next member's full name
    longname = "very/long/" + "n" * 120 + ".bin"
    l_entry = tar.tar_build({"././@LongLink": longname.encode() + b"\x00"})
    l_entry = bytearray(l_entry[: len(l_entry) - 1024])  # drop end marker
    l_entry[156] = ord("L")
    hdr = bytearray(l_entry[:512])
    hdr[148:156] = b" " * 8
    l_entry[148:156] = f"{sum(hdr):06o}".encode() + b"\x00 "
    full = bytes(l_entry) + tar.tar_build({"truncated_name": b"DATA"})
    assert tar.tar_entries(full) == [(longname, 4)]
    assert tar.tar_read(full, longname) == b"DATA"


def test_tar_pax_path_override():
    pax = b"30 path=pax/override/name.txt\n"
    assert len(pax) == 30
    x_entry = bytearray(tar.tar_build({"ignored": pax})[:1024])
    x_entry[156] = ord("x")
    hdr = bytearray(x_entry[:512])
    hdr[148:156] = b" " * 8
    x_entry[148:156] = f"{sum(hdr):06o}".encode() + b"\x00 "
    full = bytes(x_entry) + tar.tar_build({"old": b"zz"})
    assert tar.tar_entries(full) == [("pax/override/name.txt", 2)]


def test_tar_rejects_garbage_and_truncation():
    assert tar.tar_entries(b"") is None
    assert tar.tar_entries(b"not a tar " * 100) is None
    rng = np.random.default_rng(9)
    for _ in range(20):
        assert tar.tar_entries(rng.bytes(2048)) is None
    # truncated payload: stop cleanly with what's complete
    blob = tar.tar_build({"a": b"1" * 600, "b": b"2"})
    assert tar.tar_entries(blob[:700]) == []  # a's payload incomplete


def test_archive_members_operator(spark):
    import pandas as pd

    from granulate_char_ocr_spark.functions import zipdocx
    from granulate_char_ocr_spark.operators.docparse import archive_members

    tarball = tar.tar_build({"x/a.txt": b"AA", "b.bin": b"BBB"}, gz=True)
    zipball = zipdocx.zip_build({"c.txt": b"CCCC"})
    docs = spark.createDataFrame(
        pd.DataFrame({
            "doc_id": ["t1", "z1", "n1"],
            "payload": [tarball, zipball, b"neither"],
        })
    )
    rows = archive_members(docs).collect()
    got = {(r["doc_id"], r["member_name"]): (r["member_size"], bytes(r["member"]))
           for r in rows}
    assert got == {
        ("t1", "x/a.txt"): (2, b"AA"),
        ("t1", "b.bin"): (3, b"BBB"),
        ("z1", "c.txt"): (4, b"CCCC"),
    }  # the non-archive row yields no members
