"""WARC source/sink: Common Crawl-layout round-trip, gzip-member
framing, Content-Length-driven splitting, crash-tail tolerance.

The splitter must never scan payload bytes for delimiters — a body
containing ``"WARC/1.0"`` after a blank line is the adversarial case a
delimiter-scanning splitter tears apart (test below plants one).
"""

from __future__ import annotations

import gzip
import os
import zlib

import pytest
from pyspark.sql import functions as F

from python_fastly_log_query_spark.sources.warc import (
    _gunzip_members,
    fetch_warc_records,
    read_warc,
    write_warc,
    write_warc_indexed,
)


def _records_df(spark, payloads: list[bytes]):
    rows = [
        (i, f"https://host{i % 3}.example/p/{i}", p)
        for i, p in enumerate(payloads)
    ]
    return spark.createDataFrame(rows, "seq long, url string, payload binary")


PAYLOADS = [
    b"plain body one",
    b"",  # empty payload is a legal record
    # adversarial: payload embeds a fake record start after a blank line
    b"prefix\r\n\r\nWARC/1.0\r\nWARC-Type: response\r\n\r\nfake",
    "unicode ☃ body".encode("utf-8"),
    b"x" * 5000,
]


def _roundtrip(spark, tmp_path, gzip_members: bool):
    path = str(tmp_path / ("gz" if gzip_members else "plain"))
    stats = write_warc(
        _records_df(spark, PAYLOADS), path, n_files=2,
        gzip_members=gzip_members,
    )
    assert sum(s.n_records for s in stats) == len(PAYLOADS)
    out = read_warc(spark, path).collect()
    assert len(out) == len(PAYLOADS)
    by_url = {r.url: r for r in out}
    for i, p in enumerate(PAYLOADS):
        rec = by_url[f"https://host{i % 3}.example/p/{i}"]
        assert bytes(rec.payload) == p  # byte-exact, incl. adversarial
        assert rec.content_length == len(p)
        assert rec.warc_type == "response"
        assert rec.record_id.startswith("<urn:uuid:")
        assert rec.warc_date == "2026-01-01T00:00:00Z"
    return path, out


def test_roundtrip_gzip_members(spark, tmp_path):
    path, out = _roundtrip(spark, tmp_path, gzip_members=True)
    files = sorted(os.listdir(path))
    assert files == ["part-00000.warc.gz", "part-00001.warc.gz"]
    # Common Crawl layout: ONE gzip member PER RECORD, concatenated —
    # count members by driving zlib through unused_data.
    blob = open(os.path.join(path, files[0]), "rb").read()
    members, rest = 0, blob
    while rest:
        d = zlib.decompressobj(wbits=zlib.MAX_WBITS | 16)
        d.decompress(rest)
        d.flush()
        assert d.eof
        members += 1
        rest = d.unused_data
    n_in_file0 = sum(1 for r in out if r.file.endswith(files[0]))
    assert members == n_in_file0 > 1


def test_roundtrip_plain(spark, tmp_path):
    path, _ = _roundtrip(spark, tmp_path, gzip_members=False)
    blob = open(os.path.join(path, "part-00000.warc"), "rb").read()
    assert blob.startswith(b"WARC/1.0\r\n")


def test_write_is_deterministic(spark, tmp_path):
    """Same frame -> byte-identical files (gzip mtime pinned to 0),
    regardless of input partitioning."""
    df = _records_df(spark, PAYLOADS)
    write_warc(df, str(tmp_path / "a"), n_files=2)
    write_warc(df.repartition(7), str(tmp_path / "b"), n_files=2)
    for f in os.listdir(tmp_path / "a"):
        assert (
            open(tmp_path / "a" / f, "rb").read()
            == open(tmp_path / "b" / f, "rb").read()
        )


def test_lineage_and_rec_index(spark, tmp_path):
    path, out = _roundtrip(spark, tmp_path / "l", gzip_members=True)
    for r in out:
        assert r.file.endswith((".warc", ".warc.gz")) and "part-" in r.file
    per_file: dict = {}
    for r in out:
        per_file.setdefault(r.file, []).append(r.rec_index)
    for idxs in per_file.values():
        assert sorted(idxs) == list(range(len(idxs)))


def test_truncated_tail_dropped_not_fatal(spark, tmp_path):
    """Crash-tail tolerance: a truncated final record is dropped in
    default mode (rows before it survive) and raises in strict mode."""
    path = str(tmp_path / "trunc")
    write_warc(
        _records_df(spark, PAYLOADS), path, n_files=1, gzip_members=False
    )
    fp = os.path.join(path, "part-00000.warc")
    blob = open(fp, "rb").read()
    # append a record whose payload is cut off mid-body
    open(fp, "wb").write(
        blob
        + b"WARC/1.0\r\nWARC-Type: response\r\n"
        + b"WARC-Target-URI: https://x/y\r\nContent-Length: 999\r\n\r\nshort"
    )
    rows = read_warc(spark, path).collect()
    assert len(rows) == len(PAYLOADS)
    with pytest.raises(Exception, match="truncated"):
        read_warc(spark, path, strict=True).collect()


def test_truncated_gzip_member_raises(tmp_path):
    whole = gzip.compress(b"WARC/1.0\r\n\r\n", mtime=0)
    assert _gunzip_members(whole + whole) == b"WARC/1.0\r\n\r\n" * 2
    with pytest.raises(ValueError, match="truncated gzip member"):
        _gunzip_members(whole + whole[:-4])


def test_cdx_index_invariants_and_archive_bytes(spark, tmp_path):
    """The indexed writer produces byte-identical archives to write_warc
    (the index is a pure by-product), and the index tiles each file
    exactly: offsets start at 0, each next offset = previous end, and
    the last end = file size."""
    df = _records_df(spark, PAYLOADS)
    write_warc(df, str(tmp_path / "plain_w"), n_files=2)
    idx = write_warc_indexed(
        df, str(tmp_path / "idx_w"), str(tmp_path / "cdx"), n_files=2
    ).collect()
    for f in os.listdir(tmp_path / "plain_w"):
        assert (
            open(tmp_path / "plain_w" / f, "rb").read()
            == open(tmp_path / "idx_w" / f, "rb").read()
        )
    assert len(idx) == len(PAYLOADS)
    per_file: dict = {}
    for r in idx:
        per_file.setdefault(r.file, []).append((r.offset, r.length))
    for fname, spans in per_file.items():
        spans.sort()
        assert spans[0][0] == 0
        for (o1, l1), (o2, _) in zip(spans, spans[1:]):
            assert o1 + l1 == o2  # members tile with no gap/overlap
        size = os.path.getsize(tmp_path / "idx_w" / fname)
        assert spans[-1][0] + spans[-1][1] == size


def test_cdx_fetch_is_byte_exact_and_range_isolated(spark, tmp_path):
    """fetch_warc_records returns byte-exact payloads for the addressed
    subset — and reads ONLY the addressed ranges: corrupting a member
    that is NOT in the fetch set leaves every fetched record intact (a
    whole-file scan/decode would die on the corrupt neighbor)."""
    df = _records_df(spark, PAYLOADS)
    idx = write_warc_indexed(
        df, str(tmp_path / "arch"), str(tmp_path / "cdx"), n_files=1
    )
    rows = sorted(idx.collect(), key=lambda r: r.seq)
    victim = rows[1]  # will be corrupted; never fetched
    fetch_set = [r for r in rows if r.seq != victim.seq]

    fpath = tmp_path / "arch" / victim.file
    blob = bytearray(open(fpath, "rb").read())
    for i in range(victim.offset, victim.offset + victim.length):
        blob[i] ^= 0xFF
    open(fpath, "wb").write(bytes(blob))

    keep = idx.filter(F.col("seq") != victim.seq)
    out = {r.seq: r for r in fetch_warc_records(
        spark, str(tmp_path / "arch"), keep
    ).collect()}
    assert len(out) == len(fetch_set)
    for i, p in enumerate(PAYLOADS):
        if i == victim.seq:
            continue
        assert bytes(out[i].payload) == p
        assert out[i].url == f"https://host{i % 3}.example/p/{i}"

    # and fetching the corrupted member itself fails loudly, not silently
    with pytest.raises(Exception):
        fetch_warc_records(
            spark, str(tmp_path / "arch"),
            idx.filter(F.col("seq") == victim.seq),
        ).collect()


def test_splitter_is_content_length_driven(spark, tmp_path):
    """The adversarial payload (embedded fake 'WARC/1.0' after CRLFCRLF)
    comes back as ONE record with byte-exact body — already asserted in
    _roundtrip; here we additionally pin that NO phantom record was
    materialized from inside it."""
    path, out = _roundtrip(spark, tmp_path / "adv", gzip_members=True)
    urls = [r.url for r in out]
    assert len(urls) == len(set(urls)) == len(PAYLOADS)
    assert not any(u is None for u in urls)
